"""Product quantization (Jégou et al. 2011, "Product Quantization for
Nearest Neighbor Search") — the memory-bounded ANN path that complements
ops/ann's exact brute-force and IVF variants: vectors compress to ``m``
one-byte codes, queries scan codes with per-subspace lookup tables (ADC),
so a 100-TB embedding table searches from an ``m``-bytes-per-vector code
table instead of the raw floats.

Engine shape:

* **training** (:func:`pq_fit`): ``m`` independent k-means problems — ONE
  pass per Lloyd round computes assignments + partial sums for ALL
  subspaces in the same ``map_batches`` (rows keyed ``(sub, cluster)``);
  the driver folds O(m x n_codes x d/m) floats per round in a
  deterministic order, exactly the ops/kmeans contract.
* **encoding** (:func:`pq_encode`): stateless ``map_batches`` against the
  broadcast codebooks, emitting ``codes: list<int8>``.
* **search** (:func:`knn_pq`): per query, an m x n_codes distance lookup
  table; per batch one fancy-indexing sum over code columns; local top-k
  combiner + groupby final reduce — the knn_bruteforce skeleton with ADC
  distances instead of cosines.

Gold: :func:`pq_reference` is the single-process mirror (same init, same
update, same ADC arithmetic, shared tie-break). Codebook floats can
differ from the distributed fold by ~1e-13 (batch-boundary partial sums)
— the emb_kmeans margin argument: synthetic-embedding assignment margins
are orders of magnitude wider, so codes and ranks are hash-stable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _subspaces(d: int, m: int) -> list[tuple[int, int]]:
    if d % m != 0:
        raise ValueError(f"embedding dim {d} not divisible by m={m}")
    w = d // m
    return [(s * w, (s + 1) * w) for s in range(m)]


def _init_codebooks(emb_ds, m: int, n_codes: int, source_path) -> np.ndarray:
    """(m, n_codes, d/m) init: the sub-vectors of the n_codes smallest
    vec_ids — per subspace the same convention as ops/kmeans."""
    from .ann import _collect_queries

    _, Q = _collect_queries(emb_ds, list(range(n_codes)), source_path)
    X = np.asarray(Q, dtype=np.float64)
    spans = _subspaces(X.shape[1], m)
    return np.stack([X[:, a:b].copy() for a, b in spans])


def pq_fit(
    emb_ds,
    m: int = 8,
    n_codes: int = 16,
    iterations: int = 5,
    *,
    source_path=None,
) -> np.ndarray:
    """Train the (m, n_codes, d/m) codebook tensor: m Lloyd problems per
    round in ONE corpus pass (kind of a batched :func:`ops.kmeans.kmeans_fit`)."""
    books = _init_codebooks(emb_ds, m, n_codes, source_path)

    for _ in range(iterations):
        B = books  # rebind: the closure captures THIS round's tensor

        def partials(batch: pa.Table) -> pa.Table:
            cols = {
                "sub": pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "vec_sum": pa.array([], pa.list_(pa.float64())),
                "n": pa.array([], pa.int64()),
                "first_id": pa.array([], pa.int64()),
            }
            if batch.num_rows == 0 or "embedding" not in batch.column_names:
                return pa.table(cols)
            import pyarrow.compute as pc

            from .ann import _normalized

            # cosine-metric PQ: codes quantize the NORMALIZED vectors, so
            # ADC squared-L2 is 2 - 2*cos — the same ranking metric as
            # knn_bruteforce (raw-vector ADC would rank by candidate norm)
            M = _normalized(batch.column("embedding").to_pylist())
            spans = _subspaces(M.shape[1], len(B))
            first = int(pc.min(batch.column("vec_id")).as_py())
            subs, clus, sums_l, ns = [], [], [], []
            for s, (a, b) in enumerate(spans):
                Xs = M[:, a:b]
                C = B[s]
                d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (Xs @ C.T)
                assign = np.argmin(d2, axis=1)
                sums = np.zeros((len(C), Xs.shape[1]), dtype=np.float64)
                np.add.at(sums, assign, Xs)
                counts = np.bincount(assign, minlength=len(C)).astype(np.int64)
                subs.extend([s] * len(C))
                clus.extend(range(len(C)))
                sums_l.extend(sums.tolist())
                ns.extend(counts.tolist())
            k = len(subs)
            return pa.table(
                {
                    "sub": pa.array(subs, pa.int64()),
                    "cluster": pa.array(clus, pa.int64()),
                    "vec_sum": pa.array(sums_l, pa.list_(pa.float64())),
                    "n": pa.array(ns, pa.int64()),
                    "first_id": pa.array([first] * k, pa.int64()),
                }
            )

        rows = []
        for blk in (
            emb_ds.select_columns(["vec_id", "embedding"])
            .map_batches(partials, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        ):
            rows.extend(
                zip(
                    blk.column("sub").to_pylist(),
                    blk.column("cluster").to_pylist(),
                    blk.column("vec_sum").to_pylist(),
                    blk.column("n").to_pylist(),
                    blk.column("first_id").to_pylist(),
                )
            )
        rows.sort(key=lambda r: (r[0], r[1], r[4]))  # deterministic fold
        sums = np.zeros_like(books)
        counts = np.zeros(books.shape[:2], dtype=np.int64)
        for s, cl, vs, n, _fid in rows:
            sums[s, cl] += np.asarray(vs, dtype=np.float64)
            counts[s, cl] += n
        books = books.copy()
        nonempty = counts > 0
        books[nonempty] = sums[nonempty] / counts[nonempty][:, None]

    return books


def _encode_matrix(M: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) float64 -> (n, m) int8 codes — shared by engine and gold."""
    spans = _subspaces(M.shape[1], len(books))
    codes = np.empty((len(M), len(books)), dtype=np.int8)
    for s, (a, b) in enumerate(spans):
        Xs = M[:, a:b]
        C = books[s]
        d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (Xs @ C.T)
        codes[:, s] = np.argmin(d2, axis=1).astype(np.int8)
    return codes


def pq_encode(emb_ds, books: np.ndarray):
    """(vec_id, codes) — stateless encode against the broadcast codebooks."""
    B = np.asarray(books, dtype=np.float64)

    def encode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "embedding" not in batch.column_names:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "codes": pa.array([], pa.list_(pa.int8())),
                }
            )
        from .ann import _normalized

        codes = _encode_matrix(_normalized(batch.column("embedding").to_pylist()), B)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "codes": pa.array(codes.tolist(), pa.list_(pa.int8())),
            }
        )

    return emb_ds.select_columns(["vec_id", "embedding"]).map_batches(
        encode, batch_format="pyarrow"
    )


def _adc_tables(Q: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n_q, m, n_codes) squared-distance lookup tables."""
    spans = _subspaces(Q.shape[1], len(books))
    lut = np.empty((len(Q), len(books), books.shape[1]), dtype=np.float64)
    for s, (a, b) in enumerate(spans):
        Qs = Q[:, a:b]  # (n_q, w)
        C = books[s]  # (n_codes, w)
        lut[:, s, :] = (
            (Qs * Qs).sum(axis=1)[:, None]
            + (C * C).sum(axis=1)[None, :]
            - 2.0 * (Qs @ C.T)
        )
    return lut


def _adc_distances(lut_q: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """One query's (m, n_codes) LUT x (n, m) codes -> (n,) distances —
    shared by engine and gold so the float sum order is identical."""
    m = codes.shape[1]
    return lut_q[np.arange(m)[None, :], codes.astype(np.int64)].sum(axis=1)


def knn_pq(
    emb_ds,
    query_ids: list[int],
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    iterations: int = 5,
    *,
    source_path=None,
):
    """(query_id, neighbor_id, rank) — approximate top-k by ADC distance
    over PQ codes, self excluded; ties break (distance asc, neighbor_id
    asc).  The query vectors stay exact (asymmetric distance — the paper's
    ADC variant); only the corpus side is quantized."""
    import ray

    from .ann import _collect_queries

    books = pq_fit(emb_ds, m, n_codes, iterations, source_path=source_path)
    qids, Q = _collect_queries(emb_ds, query_ids, source_path)
    lut = _adc_tables(np.asarray(Q, dtype=np.float64), books)
    ref = ray.put((qids, lut, books))

    def local_topk(batch: pa.Table) -> pa.Table:
        cols = {
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "dist": pa.array([], pa.float64()),
        }
        if batch.num_rows == 0 or "embedding" not in batch.column_names:
            return pa.table(cols)
        qids_, lut_, books_ = ray.get(ref)
        from .ann import _normalized

        bids = np.asarray(batch.column("vec_id").to_pylist())
        codes = _encode_matrix(_normalized(batch.column("embedding").to_pylist()), books_)
        out_q, out_n, out_d = [], [], []
        for qi in range(len(qids_)):
            dists = _adc_distances(lut_[qi], codes)
            mask = bids != qids_[qi]
            cand_ids, cand_d = bids[mask], dists[mask]
            if len(cand_ids) > k:
                idx = np.lexsort((cand_ids, cand_d))[:k]
                cand_ids, cand_d = cand_ids[idx], cand_d[idx]
            out_q.extend([int(qids_[qi])] * len(cand_ids))
            out_n.extend(int(x) for x in cand_ids)
            out_d.extend(float(x) for x in cand_d)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "dist": pa.array(out_d, pa.float64()),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group.column("dist").to_pylist(), group.column("neighbor_id").to_pylist()),
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


def _reference_books(
    ids: np.ndarray, X: np.ndarray, m: int, n_codes: int, iterations: int
) -> np.ndarray:
    """Single-process codebook training shared by :func:`pq_reference`
    and :func:`ivfpq_reference` — same init (n_codes smallest vec_ids),
    same per-round Lloyd update as the distributed :func:`pq_fit`."""
    order = np.argsort(ids, kind="stable")
    ids_s, X_s = ids[order], X[order]
    spans_init = np.searchsorted(ids_s, np.arange(n_codes))
    init = X_s[spans_init]
    books = np.stack([init[:, a:b].copy() for a, b in _subspaces(X.shape[1], m)])
    for _ in range(iterations):
        new = books.copy()
        for s, (a, b) in enumerate(_subspaces(X.shape[1], m)):
            Xs = X[:, a:b]
            C = books[s]
            d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (Xs @ C.T)
            assign = np.argmin(d2, axis=1)
            for c in range(n_codes):
                members = Xs[assign == c]
                if len(members):
                    new[s, c] = members.sum(axis=0) / len(members)
        books = new
    return books


def pq_reference(
    vec_ids: np.ndarray,
    M: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    iterations: int = 5,
):
    """Single-process gold mirror: same init (n_codes smallest vec_ids),
    same per-round update, same shared encode/ADC kernels and tie-break.
    Returns (query_id, neighbor_id, rank) row lists."""
    from .ann import _normalized

    ids = np.asarray(vec_ids, dtype=np.int64)
    # the engine trains/encodes/queries on NORMALIZED vectors throughout
    # (cosine-metric PQ); _normalized here matches _collect_queries AND the
    # per-batch normalize bit-for-bit
    X = _normalized(M)
    books = _reference_books(ids, X, m, n_codes, iterations)
    codes = _encode_matrix(X, books)
    qpos = {int(i): p for p, i in enumerate(ids)}
    lut = _adc_tables(X[[qpos[q] for q in sorted(set(query_ids))]], books)
    rows_q, rows_n, rows_r = [], [], []
    for qi, q in enumerate(sorted(set(query_ids))):
        dists = _adc_distances(lut[qi], codes)
        mask = ids != q
        cand_ids, cand_d = ids[mask], dists[mask]
        idx = np.lexsort((cand_ids, cand_d))[:k]
        for r, j in enumerate(idx, 1):
            rows_q.append(int(q))
            rows_n.append(int(cand_ids[j]))
            rows_r.append(r)
    return rows_q, rows_n, rows_r


def write_gold_pq(
    emb_path: str,
    out_dir: str,
    query_ids: list[int],
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    iterations: int = 5,
) -> None:
    """Write the single-process gold (query_id, neighbor_id, rank) parquet
    for the ``emb_knn_pq`` oracle."""
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    M = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    q, n, r = pq_reference(ids, M, query_ids, k, m, n_codes, iterations)
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "query_id": pa.array(q, pa.int64()),
                "neighbor_id": pa.array(n, pa.int64()),
                "rank": pa.array(r, pa.int64()),
            }
        ),
        os.path.join(out_dir, "gold_pq.parquet"),
    )


# ---------------------------------------------------------------------------
# IVF + PQ composition (Jégou et al.'s IVFADC layout, non-residual variant)


def build_ivfpq_index(emb_ds, books: np.ndarray, index_dir: str,
                      fingerprint: str | None = None) -> str:
    """Materialize the inverted file OVER CODES: every vector reduces to
    (vec_id, bucket, codes) where bucket is the deterministic coarse
    quantizer of ops/ann (dominant |dimension| — scale-invariant, so raw
    and normalized vectors bucket identically) and codes are the m-byte
    PQ words.  Hive-partitioned by bucket: a probe reads only its
    partitions AND only m bytes per vector — the two savings compose,
    which is the whole point of the IVFADC layout at 100 TB (the raw
    floats never travel after the one-time build pass).

    Non-residual variant: one global codebook tensor (no per-bucket
    centroid subtraction) — documented simplification; the dominant-dim
    quantizer has no centroid to subtract."""
    import os

    import ray

    from .ann import _normalized, dataset_fingerprint

    bref = ray.put(books)

    def encode_batch(batch: pa.Table) -> pa.Table:
        cols = {
            "vec_id": pa.array([], pa.int64()),
            "bucket": pa.array([], pa.int32()),
            "codes": pa.array([], pa.list_(pa.int8())),
        }
        if batch.num_rows == 0 or "embedding" not in batch.column_names:
            return pa.table(cols)
        B = ray.get(bref)
        raw = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        buckets = np.argmax(np.abs(raw), axis=1).astype(np.int32)
        codes = _encode_matrix(_normalized(batch.column("embedding").to_pylist()), B)
        return pa.table(
            {
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "bucket": pa.array(buckets, pa.int32()),
                "codes": pa.array(codes.astype(np.int8).tolist(), pa.list_(pa.int8())),
            }
        )

    (
        emb_ds.select_columns(["vec_id", "embedding"])
        .map_batches(encode_batch, batch_format="pyarrow")
        .write_parquet(index_dir, partition_cols=["bucket"])
    )
    if fingerprint is None:
        fingerprint = dataset_fingerprint(emb_ds)
    with open(os.path.join(index_dir, "_FINGERPRINT"), "w") as f:
        f.write(fingerprint)
    return index_dir


def knn_ivfpq(
    emb_ds,
    query_ids: list[int],
    k: int = 10,
    n_probe: int = 8,
    m: int = 8,
    n_codes: int = 16,
    iterations: int = 5,
    index_dir: str | None = None,
    *,
    source_path=None,
):
    """(query_id, neighbor_id, rank) — the FAISS-style scale path: coarse
    inverted-file pruning (read only the queries' ``n_probe`` bucket
    partitions) x PQ compression (ADC over m-byte codes, exact query
    side).  Candidates are rows whose stored bucket is in the query's
    probe set, self excluded; ties break (distance asc, neighbor_id asc).

    The index (codes, not floats) persists under ``index_dir`` with the
    same fingerprint-guarded reuse contract as :func:`ops.ann.knn_ivf` —
    a stale or foreign index rebuilds."""
    import os
    import shutil
    import tempfile

    import ray
    import ray.data

    from .ann import _collect_queries, dataset_fingerprint, ivf_probe_buckets

    books = pq_fit(emb_ds, m, n_codes, iterations, source_path=source_path)
    qids, Q = _collect_queries(emb_ds, query_ids, source_path)
    lut = _adc_tables(np.asarray(Q, dtype=np.float64), books)
    probe_sets = ivf_probe_buckets(np.asarray(Q, dtype=np.float64), n_probe)

    if index_dir is None:
        index_dir = tempfile.mkdtemp(prefix="ivfpq_", dir="/tmp")
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
        build_ivfpq_index(emb_ds, books, index_dir, fingerprint=fp)

    union: set[int] = set()
    for s in probe_sets.values():
        union |= s
    probe_paths = []
    for b in sorted(union):
        part = os.path.join(index_dir, f"bucket={b}")
        if os.path.isdir(part):
            probe_paths.extend(
                os.path.join(part, f)
                for f in sorted(os.listdir(part))
                if f.endswith(".parquet")
            )
    probes_by_qid = {int(q): probe_sets[i] for i, q in enumerate(qids)}
    qref = ray.put((qids, lut, probes_by_qid))

    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "dist": pa.array([], pa.float64()),
        }
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "codes" not in batch.column_names:
            return empty
        qids_, lut_, probes = ray.get(qref)
        bids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        codes = np.asarray(batch.column("codes").to_pylist(), dtype=np.int64)
        # hive partition pruning strips the partition column from the
        # probed read; the stored data column is the per-row bucket
        buckets = np.asarray(batch.column("bucket").to_pylist(), dtype=np.int64)
        out_q, out_n, out_d = [], [], []
        for qi in range(len(qids_)):
            q = int(qids_[qi])
            probe = np.fromiter(probes[q], dtype=np.int64)
            mask = np.isin(buckets, probe) & (bids != q)
            if not mask.any():
                continue
            cand_ids = bids[mask]
            cand_d = _adc_distances(lut_[qi], codes[mask])
            if len(cand_ids) > k:
                idx = np.lexsort((cand_ids, cand_d))[:k]
                cand_ids, cand_d = cand_ids[idx], cand_d[idx]
            out_q.extend([q] * len(cand_ids))
            out_n.extend(int(x) for x in cand_ids)
            out_d.extend(float(x) for x in cand_d)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "dist": pa.array(out_d, pa.float64()),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group.column("dist").to_pylist(), group.column("neighbor_id").to_pylist()),
        )[:k]
        qid = group.column("query_id")[0].as_py()
        return pa.table(
            {
                "query_id": pa.array([qid] * len(rows), pa.int64()),
                "neighbor_id": pa.array([r[1] for r in rows], pa.int64()),
                "rank": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            }
        )

    if not probe_paths:
        return ray.data.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        )
    probed = ray.data.read_parquet(probe_paths, columns=["vec_id", "bucket", "codes"])
    return (
        probed.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
    )


def ivfpq_reference(
    vec_ids: np.ndarray,
    M: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    n_probe: int = 8,
    m: int = 8,
    n_codes: int = 16,
    iterations: int = 5,
):
    """Single-process gold mirror of :func:`knn_ivfpq`: same codebooks
    (shared :func:`_reference_books`), same dominant-dim buckets, same
    probe rule, shared encode/ADC kernels and tie-break.  Returns
    (query_id, neighbor_id, rank) row lists."""
    from .ann import _normalized, ivf_probe_buckets

    ids = np.asarray(vec_ids, dtype=np.int64)
    raw = np.asarray(M, dtype=np.float64)
    X = _normalized(M)
    books = _reference_books(ids, X, m, n_codes, iterations)
    codes = _encode_matrix(X, books)
    buckets = np.argmax(np.abs(raw), axis=1)
    qs = sorted(set(query_ids))
    qpos = {int(i): p for p, i in enumerate(ids)}
    Q = X[[qpos[q] for q in qs]]
    lut = _adc_tables(Q, books)
    probe_sets = ivf_probe_buckets(raw[[qpos[q] for q in qs]], n_probe)
    rows_q, rows_n, rows_r = [], [], []
    for qi, q in enumerate(qs):
        probe = np.fromiter(probe_sets[qi], dtype=np.int64)
        mask = np.isin(buckets, probe) & (ids != q)
        cand_ids = ids[mask]
        cand_d = _adc_distances(lut[qi], codes[mask])
        idx = np.lexsort((cand_ids, cand_d))[:k]
        for r, j in enumerate(idx, 1):
            rows_q.append(int(q))
            rows_n.append(int(cand_ids[j]))
            rows_r.append(r)
    return rows_q, rows_n, rows_r


def write_gold_ivfpq(
    emb_path: str,
    out_dir: str,
    query_ids: list[int],
    k: int = 10,
    n_probe: int = 8,
    m: int = 8,
    n_codes: int = 16,
    iterations: int = 5,
) -> None:
    """Write the single-process gold (query_id, neighbor_id, rank) parquet
    for the ``emb_knn_ivfpq`` oracle."""
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    M = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    q, n, r = ivfpq_reference(ids, M, query_ids, k, n_probe, m, n_codes, iterations)
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "query_id": pa.array(q, pa.int64()),
                "neighbor_id": pa.array(n, pa.int64()),
                "rank": pa.array(r, pa.int64()),
            }
        ),
        os.path.join(out_dir, "gold_ivfpq.parquet"),
    )
