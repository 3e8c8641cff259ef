"""Similarity search over an embedding column (``list<float>``).

* :func:`knn_bruteforce` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), every batch does one vectorized matmul and
  emits only its LOCAL top-k per query (the combiner), so the final
  groupby-reduce sees ``num_blocks * k`` rows per query, never the corpus.
* :func:`knn_ivf` — the scale path: :func:`build_ivf_index` writes the
  embeddings ONCE as hive Parquet partitioned by dominant dimension (a
  trivially deterministic coarse quantizer); each probe then reads only
  the union of the queries' top-``n_probe`` bucket partitions, so I/O and
  compute scale with the probed fraction of the corpus, not its size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalized(vectors) -> np.ndarray:
    M = np.asarray(vectors, dtype=np.float64)
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def _collect_queries(emb_ds, query_ids: list[int], source_path=None):
    """Fetch the query vectors WITHOUT streaming the corpus through the
    driver.  With ``source_path`` (the backing Parquet file/dir) the fetch
    is a filtered read — ``vec_id in (...)`` prunes row groups via column
    statistics, so only matching row groups are decoded.  Otherwise a
    distributed semi-join filter whose ``take_all`` moves O(queries) rows."""
    wanted = sorted(set(query_ids))
    got: dict[int, list[float]] = {}
    if source_path is not None:
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            source_path, columns=["vec_id", "embedding"],
            filters=[("vec_id", "in", wanted)],
        )
        got = dict(zip(tbl.column("vec_id").to_pylist(), tbl.column("embedding").to_pylist()))
    else:
        import pyarrow.compute as pc

        def only_queries(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "vec_id" not in batch.column_names:
                return pa.table(
                    {
                        "vec_id": pa.array([], pa.int64()),
                        "embedding": pa.array([], pa.list_(pa.float64())),
                    }
                )
            return batch.filter(pc.is_in(batch.column("vec_id"), pa.array(wanted)))

        for batch in (
            emb_ds.select_columns(["vec_id", "embedding"])
            .map_batches(only_queries, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        ):
            got.update(
                zip(batch.column("vec_id").to_pylist(), batch.column("embedding").to_pylist())
            )
    qids = sorted(got)
    return np.asarray(qids), _normalized([got[q] for q in qids])


def knn_bruteforce(emb_ds, query_ids: list[int], k: int = 10, *, source_path=None):
    """(query_id, neighbor_id, rank) — exact top-k by cosine, self excluded.
    Ties break by ascending neighbor_id (deterministic)."""
    import ray

    qids, Q = _collect_queries(emb_ds, query_ids, source_path)
    qref = ray.put((qids, Q))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, Q_ = ray.get(qref)
        bids = np.asarray(batch.column("vec_id").to_pylist())
        B = _normalized(batch.column("embedding").to_pylist())
        S = Q_ @ B.T  # (n_q, n_batch)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids_)):
            sims = S[qi]
            mask = bids != qids_[qi]
            cand_ids, cand_sims = bids[mask], sims[mask]
            if len(cand_ids) > k:
                # partial top-k inside the batch (the combiner step) with
                # the SAME deterministic tie-break as the final reduce
                # (cosine desc, neighbor_id asc) — plain argpartition could
                # drop the lower-id member of an exact cosine tie, making
                # the result vary with block boundaries
                idx = np.lexsort((cand_ids, -cand_sims))[:k]
                cand_ids, cand_sims = cand_ids[idx], cand_sims[idx]
            out_q.extend([int(qids_[qi])] * len(cand_ids))
            out_n.extend(int(x) for x in cand_ids)
            out_s.extend(float(x) for x in cand_sims)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group.column("cosine").to_pylist(), group.column("neighbor_id").to_pylist()),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        qid = group.column("query_id")[0].as_py()
        return pa.table(
            {
                "query_id": pa.array([qid] * len(rows), pa.int64()),
                "neighbor_id": pa.array([r[1] for r in rows], pa.int64()),
                "rank": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            }
        )

    return (
        emb_ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
    )


def ivf_bucket_batch(batch: pa.Table) -> pa.Table:
    """(vec_id, embedding) batch + ``bucket`` = argmax |v_d| — the
    deterministic coarse quantizer (no trained centroids needed)."""
    M = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
    buckets = np.argmax(np.abs(M), axis=1) if M.size else np.array([], dtype=np.int64)
    return batch.append_column("bucket", pa.array(buckets.astype(np.int32), pa.int32()))


def dataset_fingerprint(emb_ds) -> str:
    """Cheap identity stamp for the dataset an index was built from: row
    count + the sorted backing file list (both metadata-only for Parquet
    sources).  Guards index reuse against a stale ``index_dir`` left over
    from a different corpus — same dir + different data would otherwise
    silently return neighbors from the wrong corpus."""
    import hashlib
    import json

    try:
        files = sorted(emb_ds.input_files())
    except Exception:
        files = []
    key = json.dumps([emb_ds.count(), files])
    return hashlib.sha1(key.encode()).hexdigest()


def build_ivf_index(emb_ds, index_dir: str, fingerprint: str | None = None) -> str:
    """Materialize the bucket-partitioned inverted file: embeddings written
    as hive Parquet ``bucket=<dominant dim>/...`` — the one-time shuffle
    that lets every probe read a strict subset of partitions.  The index
    dir is stamped with the source-dataset fingerprint so a later
    ``knn_ivf`` can detect (and rebuild on) a corpus mismatch."""
    import os

    (
        emb_ds.select_columns(["vec_id", "embedding"])
        .map_batches(ivf_bucket_batch, batch_format="pyarrow")
        .write_parquet(index_dir, partition_cols=["bucket"])
    )
    if fingerprint is None:
        fingerprint = dataset_fingerprint(emb_ds)
    with open(os.path.join(index_dir, "_FINGERPRINT"), "w") as f:
        f.write(fingerprint)
    return index_dir


def ivf_probe_buckets(Q: np.ndarray, n_probe: int) -> dict[int, set[int]]:
    """Per-query-row set of the ``n_probe`` strongest dimensions' buckets."""
    return {i: set(np.argsort(-np.abs(Q[i]))[:n_probe].tolist()) for i in range(len(Q))}


def knn_ivf(
    emb_ds,
    query_ids: list[int],
    k: int = 10,
    n_probe: int = 8,
    index_dir: str | None = None,
    *,
    source_path=None,
):
    """Approximate top-k via a REAL inverted-file layout: vectors are
    bucket-partitioned on disk by dominant dimension
    (:func:`build_ivf_index`), and the probe reads ONLY the union of the
    queries' ``n_probe`` bucket partitions — both I/O and compute scale
    with the probed fraction, not the corpus.

    ``index_dir``: reuse an existing index — but ONLY when its
    ``_FINGERPRINT`` stamp matches the current dataset
    (:func:`dataset_fingerprint`); a stale or foreign index is rebuilt.
    Defaults to a fresh temp dir.  ``source_path``: backing Parquet path
    for the pushed-down query-vector fetch.
    """
    import os
    import shutil
    import tempfile

    import ray
    import ray.data

    qids, Q = _collect_queries(emb_ds, query_ids, source_path)
    probe_sets = ivf_probe_buckets(Q, n_probe)

    if index_dir is None:
        index_dir = tempfile.mkdtemp(prefix="ivf_", dir="/tmp")
    fp = dataset_fingerprint(emb_ds)
    fp_file = os.path.join(index_dir, "_FINGERPRINT")
    have_index = (
        os.path.isdir(index_dir)
        and any(name.startswith("bucket=") for name in os.listdir(index_dir))
        and os.path.isfile(fp_file)
        and open(fp_file).read().strip() == fp
    )
    if not have_index:
        if os.path.isdir(index_dir):
            shutil.rmtree(index_dir, ignore_errors=True)
        build_ivf_index(emb_ds, index_dir, fingerprint=fp)

    union: set[int] = set()
    for s in probe_sets.values():
        union |= s
    # read_parquet with an explicit list expects files, not dirs — expand
    # each probed bucket partition to its data files
    probe_paths = []
    for b in sorted(union):
        part = os.path.join(index_dir, f"bucket={b}")
        if os.path.isdir(part):
            probe_paths.extend(
                os.path.join(part, f) for f in sorted(os.listdir(part)) if f.endswith(".parquet")
            )
    probes_by_qid = {int(q): probe_sets[i] for i, q in enumerate(qids)}
    qref = ray.put((qids, Q, probes_by_qid))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, Q_, probes = ray.get(qref)
        bids = np.asarray(batch.column("vec_id").to_pylist())
        B = _normalized(batch.column("embedding").to_pylist())
        # recomputing argmax per row is cheaper than shipping the partition
        # column through the probe read; it exactly matches the index key
        buckets = np.argmax(np.abs(B), axis=1)
        S = Q_ @ B.T
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids_)):
            probe = probes[int(qids_[qi])]
            mask = np.isin(buckets, np.fromiter(probe, dtype=np.int64)) & (bids != qids_[qi])
            cand_ids, cand_sims = bids[mask], S[qi][mask]
            if len(cand_ids) > k:
                idx = np.lexsort((cand_ids, -cand_sims))[:k]  # deterministic ties
                cand_ids, cand_sims = cand_ids[idx], cand_sims[idx]
            out_q.extend([int(qids_[qi])] * len(cand_ids))
            out_n.extend(int(x) for x in cand_ids)
            out_s.extend(float(x) for x in cand_sims)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group.column("cosine").to_pylist(), group.column("neighbor_id").to_pylist()),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        qid = group.column("query_id")[0].as_py()
        return pa.table(
            {
                "query_id": pa.array([qid] * len(rows), pa.int64()),
                "neighbor_id": pa.array([r[1] for r in rows], pa.int64()),
                "rank": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            }
        )

    probed = ray.data.read_parquet(probe_paths)
    return (
        probed.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
    )
