"""Distributed k-means over an embedding column — the clustering step
training-data curation pipelines run before cluster-balanced sampling /
diversity filtering (and the trained coarse quantizer an IVF index wants).

Engine shape per Lloyd iteration:

* **assign + partial-sum in one ``map_batches``**: each batch computes
  squared distances to the broadcast centroids with one matmul and emits
  k partial rows (cluster, vector sum, count) — the shuffle/driver never
  sees per-point assignments during training.
* **bounded driver fold**: the driver folds O(k x d x blocks) partial
  floats per iteration (k and d are small constants; the corpus never
  leaves the workers).  Partials are folded in a DETERMINISTIC order
  (sorted by cluster, then each batch's minimum vec_id) so repeated runs
  produce bit-identical centroids regardless of block arrival order.
* centroids re-broadcast by closure capture (k x d floats — kilobytes).

Initialization is deterministic: the vectors of the k smallest vec_ids,
fetched through a row-group-pruned filtered read (the ops/ann pattern) —
no RNG, so the result is a pure function of the input table.

Empty clusters keep their previous centroid (the standard convention).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _init_centroids(emb_ds, k: int, source_path: str | None) -> np.ndarray:
    from .ann import _collect_queries

    _, Q = _collect_queries(emb_ds, list(range(k)), source_path)
    return np.asarray(Q, dtype=np.float64)


def kmeans_fit(
    emb_ds,
    k: int = 8,
    iterations: int = 10,
    *,
    source_path: str | None = None,
) -> np.ndarray:
    """Train centroids with ``iterations`` Lloyd rounds; returns the
    (k, d) float64 centroid matrix."""
    centroids = _init_centroids(emb_ds, k, source_path)

    for _ in range(iterations):
        C = centroids  # rebind so the closure captures THIS round's matrix

        def partials(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "embedding" not in batch.column_names:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "vec_sum": pa.array([], pa.list_(pa.float64())),
                        "n": pa.array([], pa.int64()),
                        "first_id": pa.array([], pa.int64()),
                    }
                )
            M = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
            # argmin ||x-c||^2 == argmin (||c||^2 - 2 x.c) — one matmul
            d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (M @ C.T)
            assign = np.argmin(d2, axis=1)
            sums = np.zeros((len(C), M.shape[1]), dtype=np.float64)
            np.add.at(sums, assign, M)
            counts = np.bincount(assign, minlength=len(C)).astype(np.int64)
            first = int(pc.min(batch.column("vec_id")).as_py())
            return pa.table(
                {
                    "cluster": pa.array(range(len(C)), pa.int64()),
                    "vec_sum": pa.array(sums.tolist(), pa.list_(pa.float64())),
                    "n": pa.array(counts, pa.int64()),
                    "first_id": pa.array([first] * len(C), pa.int64()),
                }
            )

        rows = []
        for b in (
            emb_ds.select_columns(["vec_id", "embedding"])
            .map_batches(partials, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        ):
            rows.extend(
                zip(
                    b.column("cluster").to_pylist(),
                    b.column("vec_sum").to_pylist(),
                    b.column("n").to_pylist(),
                    b.column("first_id").to_pylist(),
                )
            )
        rows.sort(key=lambda r: (r[0], r[3]))  # deterministic fold order
        sums = np.zeros_like(centroids)
        counts = np.zeros(len(centroids), dtype=np.int64)
        for cl, vs, n, _fid in rows:
            sums[cl] += np.asarray(vs, dtype=np.float64)
            counts[cl] += n
        nonempty = counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]

    return centroids


def kmeans_assign(emb_ds, centroids: np.ndarray):
    """(vec_id, embedding) -> (vec_id, cluster) under the given centroids
    (ties break to the lowest cluster id — numpy argmin convention)."""
    C = np.asarray(centroids, dtype=np.float64)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "embedding" not in batch.column_names:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())}
            )
        M = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (M @ C.T)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "cluster": pa.array(np.argmin(d2, axis=1).astype(np.int64), pa.int64()),
            }
        )

    return emb_ds.select_columns(["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow"
    )


def kmeans_reference(
    vec_ids: np.ndarray, M: np.ndarray, k: int = 8, iterations: int = 10
) -> np.ndarray:
    """Single-process reference: same init (k smallest vec_ids), same
    update rule, plain numpy — the gold-table generator."""
    order = np.argsort(vec_ids, kind="stable")
    ids, X = np.asarray(vec_ids)[order], np.asarray(M, dtype=np.float64)[order]
    C = X[np.searchsorted(ids, np.arange(k))].copy()
    for _ in range(iterations):
        d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return C


def kmeans_cluster(emb_ds, k: int = 8, iterations: int = 10, *, source_path=None):
    """Convenience: fit then assign — the ``emb_kmeans`` query entry."""
    return kmeans_assign(emb_ds, kmeans_fit(emb_ds, k, iterations, source_path=source_path))


def emb_dim_stats(emb_ds):
    """Per-dimension mean / population variance of the embedding column —
    the whitening/normalization prep an embedding pipeline runs before
    PCA or cosine work.  Two-stage: each batch reduces to one
    (dim, sum, sumsq, n) row per dimension (64 rows per block, regardless
    of corpus size), a Sum groupby folds them, and a final map emits
    floor-ppm integers (float32 elements cast exactly to float64 on both
    engines; order-noise ~1e-13 vs the 1e-6 grid — the repo-wide ppm
    convention, floor on both sides)."""
    import numpy as np
    import pyarrow as pa

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        cols = {
            "dim": pa.array([], pa.int64()),
            "s": pa.array([], pa.float64()),
            "ss": pa.array([], pa.float64()),
            "n": pa.array([], pa.int64()),
        }
        if batch.num_rows == 0 or "embedding" not in batch.column_names:
            return pa.table(cols)
        mat = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        d = mat.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64), pa.int64()),
                "s": pa.array(mat.sum(axis=0), pa.float64()),
                "ss": pa.array((mat * mat).sum(axis=0), pa.float64()),
                "n": pa.array(np.full(d, mat.shape[0], dtype=np.int64), pa.int64()),
            }
        )

    agg = (
        emb_ds.select_columns(["embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
            Sum("n", alias_name="n"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "s" not in batch.column_names:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "mean_ppm": pa.array([], pa.int64()),
                    "var_ppm": pa.array([], pa.int64()),
                }
            )
        s = np.asarray(batch.column("s").to_pylist(), dtype=np.float64)
        ss = np.asarray(batch.column("ss").to_pylist(), dtype=np.float64)
        n = np.asarray(batch.column("n").to_pylist(), dtype=np.float64)
        mean = s / n
        var = ss / n - mean * mean
        return pa.table(
            {
                "dim": batch.column("dim"),
                "mean_ppm": pa.array(np.floor(mean * 1e6).astype(np.int64), pa.int64()),
                "var_ppm": pa.array(np.floor(var * 1e6).astype(np.int64), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _semdedup_prune(ids: np.ndarray, X: np.ndarray, threshold: float) -> np.ndarray:
    """Shared SemDeDup kernel (engine AND gold call THIS, so the float
    path is bit-identical): vectors sorted by vec_id ascending, L2
    normalized, one gram matmul; row j is a duplicate iff some EARLIER
    row i has cos(i, j) >= threshold.  Returns keep flags aligned to the
    sorted order."""
    order = np.argsort(ids, kind="stable")
    Xs = np.asarray(X, dtype=np.float64)[order]
    norms = np.linalg.norm(Xs, axis=1)
    norms[norms == 0.0] = 1.0  # zero vectors: cos 0 with everything
    Xn = Xs / norms[:, None]
    G = Xn @ Xn.T
    n = len(Xs)
    dup = np.zeros(n, dtype=bool)
    if n > 1:
        hit = np.triu(G >= threshold, k=1)
        dup = hit.any(axis=0)
    keep = np.ones(n, dtype=bool)
    keep[dup] = False
    out = np.empty(n, dtype=bool)
    out[order] = keep
    return out


def semdedup(
    emb_ds, k: int = 8, iterations: int = 10, threshold: float = 0.97, *, source_path=None
):
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster the embedding
    space with k-means, then prune near-duplicate pairs WITHIN each
    cluster by cosine similarity — ``(vec_id, cluster, keep)`` with the
    deterministic keep rule "a vector is dropped iff an earlier-vec_id
    member of its cluster is >= threshold similar".

    Scale shape: the k-means fit never moves the corpus (per-batch
    partial sums, O(k x d) driver state — :func:`kmeans_fit`); the prune
    is embarrassingly parallel per cluster via ``groupby(cluster)``,
    which is the paper's whole point — k is chosen so a cluster's
    pairwise gram matrix fits one worker (cluster_size^2 floats), turning
    an O(n^2) corpus problem into k independent O((n/k)^2) tasks.  The
    per-cluster kernel is shared verbatim with the single-process gold
    (:func:`semdedup_reference`), so keep flags are bit-identical."""

    centroids = kmeans_fit(emb_ds, k, iterations, source_path=source_path)
    C = np.asarray(centroids, dtype=np.float64)

    def assign_with_vec(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "embedding" not in batch.column_names:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float64())),
                }
            )
        M = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (M @ C.T)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "cluster": pa.array(np.argmin(d2, axis=1).astype(np.int64), pa.int64()),
                "embedding": batch.column("embedding"),
            }
        )

    def prune(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "vec_id" not in group.column_names:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "keep": pa.array([], pa.int64()),
                }
            )
        ids = np.asarray(group.column("vec_id").to_pylist(), dtype=np.int64)
        X = np.asarray(group.column("embedding").to_pylist(), dtype=np.float64)
        keep = _semdedup_prune(ids, X, threshold)
        return pa.table(
            {
                "vec_id": group.column("vec_id"),
                "cluster": group.column("cluster"),
                "keep": pa.array(keep.astype(np.int64), pa.int64()),
            }
        )

    return (
        emb_ds.select_columns(["vec_id", "embedding"])
        .map_batches(assign_with_vec, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(prune, batch_format="pyarrow")
    )


def semdedup_reference(
    vec_ids: np.ndarray,
    M: np.ndarray,
    k: int = 8,
    iterations: int = 10,
    threshold: float = 0.97,
):
    """Single-process gold: same init/update as :func:`kmeans_reference`,
    same assignment arithmetic, same shared prune kernel.  Returns
    (vec_id, cluster, keep) arrays sorted by vec_id."""
    ids = np.asarray(vec_ids, dtype=np.int64)
    X = np.asarray(M, dtype=np.float64)
    C = kmeans_reference(ids, X, k, iterations)
    d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
    assign = np.argmin(d2, axis=1).astype(np.int64)
    keep = np.zeros(len(ids), dtype=np.int64)
    for c in np.unique(assign):
        m = assign == c
        keep[m] = _semdedup_prune(ids[m], X[m], threshold).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    return ids[order], assign[order], keep[order]


def write_gold_semdedup(
    emb_path: str,
    out_dir: str,
    k: int = 8,
    iterations: int = 10,
    threshold: float = 0.97,
) -> None:
    """Write the single-process gold (vec_id, cluster, keep) parquet for
    the ``emb_semdedup`` oracle (the pagerank-style gold pattern)."""
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    M = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    vid, cl, keep = semdedup_reference(ids, M, k, iterations, threshold)
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(vid, pa.int64()),
                "cluster": pa.array(cl, pa.int64()),
                "keep": pa.array(keep, pa.int64()),
            }
        ),
        os.path.join(out_dir, "gold_semdedup.parquet"),
    )
