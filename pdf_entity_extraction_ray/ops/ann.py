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


def _mmr_select(Q: np.ndarray, cand_ids: np.ndarray, C: np.ndarray,
                k: int, lam: float) -> list[tuple[int, float]]:
    """Greedy Maximal Marginal Relevance over ONE query's candidate set
    (Carbonell & Goldstein 1998): repeatedly pick the candidate maximizing
    ``lam * sim(q, d) - (1 - lam) * max_{s in selected} sim(d, s)``,
    ties broken by ascending vec_id.  Shared verbatim by the distributed
    query and the single-process gold writer, so hash equality proves the
    distributed candidate generation + this kernel reproduce the
    single-process reference bit-for-bit.  Returns [(vec_id, score)]."""
    rel = C @ Q  # (n_cand,) cosine to the query (rows pre-normalized)
    n = len(cand_ids)
    if n == 0 or k <= 0:
        return []
    picked: list[int] = []
    out: list[tuple[int, float]] = []
    max_sim = np.full(n, -np.inf)
    avail = np.ones(n, dtype=bool)
    for _ in range(min(k, n)):
        red = np.where(np.isneginf(max_sim), 0.0, max_sim)
        score = lam * rel - (1.0 - lam) * red
        best, best_score = -1, None
        for i in range(n):
            if not avail[i]:
                continue
            s = float(score[i])
            if best_score is None or s > best_score or (
                s == best_score and int(cand_ids[i]) < int(cand_ids[best])
            ):
                best, best_score = i, s
        picked.append(best)
        avail[best] = False
        out.append((int(cand_ids[best]), best_score))
        sims = C @ C[best]
        max_sim = np.maximum(max_sim, sims)
    return out


def mmr_topk(emb_ds, query_ids: list[int], k: int = 10, *, lam: float = 0.7,
             candidates: int = 50, source_path=None):
    """Diversified top-k per query via Maximal Marginal Relevance:
    exact distributed top-``candidates`` by cosine (the
    :func:`knn_bruteforce` combiner plan — per-batch local top-N, one
    small groupby reduce), then the greedy :func:`_mmr_select` kernel on
    the reduced set.  Driver state is O(queries x candidates x dim) —
    the documented bound; the corpus itself never leaves the cluster.

    Emits ``(query_id, vec_id, rank, mmr_milli)`` where ``mmr_milli`` is
    the selection score in exact-floor milli units (the repo's
    float-hash rule)."""
    import pyarrow.compute as pc

    cand = knn_bruteforce(emb_ds, query_ids, k=candidates, source_path=source_path)
    rows: dict[int, list[int]] = {}
    for b in cand.iter_batches(batch_format="pyarrow"):
        for q, nb, r in zip(
            b.column("query_id").to_pylist(),
            b.column("neighbor_id").to_pylist(),
            b.column("rank").to_pylist(),
        ):
            rows.setdefault(q, []).append((r, nb))
    qids, Q = _collect_queries(emb_ds, query_ids, source_path)
    need = sorted({nb for lst in rows.values() for _r, nb in lst})
    nids, N = _collect_queries(emb_ds, need, source_path)
    pos = {int(v): i for i, v in enumerate(nids)}

    out_q, out_v, out_r, out_s = [], [], [], []
    for qi, qid in enumerate(qids):
        lst = sorted(rows.get(int(qid), []))
        cand_ids = np.asarray([nb for _r, nb in lst], dtype=np.int64)
        C = N[[pos[int(nb)] for nb in cand_ids]] if len(cand_ids) else N[:0]
        for rank, (vid, score) in enumerate(
            _mmr_select(Q[qi], cand_ids, C, k, lam), start=1
        ):
            out_q.append(int(qid))
            out_v.append(vid)
            out_r.append(rank)
            out_s.append(int(np.floor(score * 1000.0)))
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "rank": pa.array(out_r, pa.int64()),
                "mmr_milli": pa.array(out_s, pa.int64()),
            }
        )
    )


def write_gold_mmr(sf_dir: str, out_dir: str, query_ids: list[int],
                   k: int = 10, lam: float = 0.7, candidates: int = 50) -> None:
    """Single-process MMR gold: brute-force top-``candidates`` over the
    whole embeddings table in one numpy pass (no Ray), then the SAME
    :func:`_mmr_select` kernel — so the oracle proves the distributed
    combiner/reduce candidate generation is exact."""
    import os

    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    M = _normalized(tbl.column("embedding").to_pylist())
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    qpos = {int(v): i for i, v in enumerate(ids)}

    out_q, out_v, out_r, out_s = [], [], [], []
    for qid in sorted(set(query_ids)):
        qv = M[qpos[qid]]
        sims = M @ qv
        mask = ids != qid
        cids, csims = ids[mask], sims[mask]
        # rank order (cosine desc, id asc) — matches the distributed
        # path's (rank, neighbor) ordering; _mmr_select itself is
        # candidate-ORDER-independent (score/id selection), only the SET
        # must agree
        idx = np.lexsort((cids, -csims))[:candidates]
        cand_ids = cids[idx]
        C = M[[qpos[int(v)] for v in cand_ids]]
        for rank, (vid, score) in enumerate(
            _mmr_select(qv, cand_ids, C, k, lam), start=1
        ):
            out_q.append(qid)
            out_v.append(vid)
            out_r.append(rank)
            out_s.append(int(np.floor(score * 1000.0)))
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "rank": pa.array(out_r, pa.int64()),
                "mmr_milli": pa.array(out_s, pa.int64()),
            }
        ),
        os.path.join(out_dir, "gold_mmr.parquet"),
    )


def ivf_recall(emb_ds, query_ids: list[int], k: int = 10, n_probe: int = 8,
               index_dir: str | None = None, *, source_path=None):
    """Recall@k of the IVF approximate path against the exact brute-force
    path — the standard ANN quality gauge, run as a first-class op so the
    accuracy/cost trade is MEASURED, not asserted.  Both result sets are
    O(queries x k) rows; the expensive parts are the two distributed runs
    (:func:`knn_ivf` reads only probed bucket partitions,
    :func:`knn_bruteforce` streams the corpus once), the comparison is a
    bounded driver-side set intersection.

    Emits ``(query_id, n_hits, recall_ppm)`` with
    ``recall_ppm = 10^6 * hits // k`` (exact integer)."""
    exact: dict[int, set[int]] = {}
    for b in knn_bruteforce(
        emb_ds, query_ids, k, source_path=source_path
    ).iter_batches(batch_format="pyarrow"):
        for q, nb in zip(
            b.column("query_id").to_pylist(), b.column("neighbor_id").to_pylist()
        ):
            exact.setdefault(q, set()).add(nb)
    approx: dict[int, set[int]] = {}
    for b in knn_ivf(
        emb_ds, query_ids, k, n_probe, index_dir, source_path=source_path
    ).iter_batches(batch_format="pyarrow"):
        for q, nb in zip(
            b.column("query_id").to_pylist(), b.column("neighbor_id").to_pylist()
        ):
            approx.setdefault(q, set()).add(nb)
    import ray.data

    qs = sorted(exact)
    hits = [len(exact[q] & approx.get(q, set())) for q in qs]
    return ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(qs, pa.int64()),
                "n_hits": pa.array(hits, pa.int64()),
                "recall_ppm": pa.array(
                    [1_000_000 * h // k for h in hits], pa.int64()
                ),
            }
        )
    )
