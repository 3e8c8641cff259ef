"""Distributed PCA over an embedding column — the dimensionality-reduction
step curation pipelines run before clustering / visualization / cheap
similarity (and the rotation a PQ codebook is often trained under).

Engine shape (one streaming pass + driver eigendecomposition):

* **moment partials in one ``map_batches``**: each batch emits a single
  row holding ``(count, sum(x), sum(x xᵀ))`` flattened — O(d²) floats per
  block regardless of batch size, so the driver fold is bounded by
  ``blocks * d²`` no matter how large the corpus (d is a small constant).
* **deterministic driver fold**: partials are folded sorted by each
  batch's minimum ``vec_id`` (the ops/kmeans convention) so repeated runs
  produce bit-identical covariance regardless of block arrival order.
* **driver eigh** on the d×d covariance (tiny), then projection is a
  second stateless ``map_batches`` with mean/components captured by
  closure (kilobytes).

Sign convention: each component is flipped so its largest-|coefficient|
entry is positive (ties -> lowest index), making the basis unique up to
the eigengap.  Projections are emitted on a 1e-4 integer grid
(``proj_1e4``) — distributed-vs-single-process float-fold noise is
~1e-12 while the grid is 1e-4, so the integer output is hash-stable
against the single-process reference (:func:`pca_reference`), the
ops/kmeans gold pattern.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _moments(emb_ds):
    """(n, sum_x, sum_xxT) with a deterministic fold order."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "embedding" not in batch.column_names:
            return pa.table(
                {
                    "min_id": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "moments": pa.array([], pa.list_(pa.float64())),
                }
            )
        M = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        ids = batch.column("vec_id").to_pylist()
        s = M.sum(axis=0)
        ss = M.T @ M
        return pa.table(
            {
                "min_id": pa.array([min(ids)], pa.int64()),
                "n": pa.array([M.shape[0]], pa.int64()),
                "moments": pa.array(
                    [np.concatenate([s, ss.ravel()]).tolist()],
                    pa.list_(pa.float64()),
                ),
            }
        )

    rows = []
    for b in (
        emb_ds.select_columns(["vec_id", "embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        for mid, n, mom in zip(
            b.column("min_id").to_pylist(),
            b.column("n").to_pylist(),
            b.column("moments").to_pylist(),
        ):
            rows.append((mid, n, np.asarray(mom, dtype=np.float64)))
    rows.sort(key=lambda r: r[0])  # deterministic fold order
    if not rows:
        return 0, None, None
    d = int((-1 + (1 + 4 * len(rows[0][2])) ** 0.5) / 2)
    n_total = 0
    acc = np.zeros_like(rows[0][2])
    for _, n, mom in rows:
        n_total += n
        acc = acc + mom
    return n_total, acc[:d], acc[d:].reshape(d, d)


def _fix_signs(V: np.ndarray) -> np.ndarray:
    """Flip each column so its largest-|coeff| entry is positive."""
    V = V.copy()
    for j in range(V.shape[1]):
        i = int(np.argmax(np.abs(V[:, j])))
        if V[i, j] < 0:
            V[:, j] = -V[:, j]
    return V


def _eig_components(n: int, s: np.ndarray, ss: np.ndarray, k: int):
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    w, V = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    return mean, _fix_signs(V[:, order])


def pca_fit(emb_ds, n_components: int = 4):
    """(mean, components) — components is d x k, eigenvalue-descending."""
    n, s, ss = _moments(emb_ds)
    if n == 0:
        raise ValueError("pca_fit: empty embeddings dataset")
    return _eig_components(n, s, ss, n_components)


def pca_project(emb_ds, n_components: int = 4):
    """(vec_id, component, proj_1e4) — centered projections of every
    vector onto the top components, on the 1e-4 integer grid."""
    mean, V = pca_fit(emb_ds, n_components)
    k = V.shape[1]

    def project(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "embedding" not in batch.column_names:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "component": pa.array([], pa.int64()),
                    "proj_1e4": pa.array([], pa.int64()),
                }
            )
        M = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        P = (M - mean) @ V  # (n, k)
        grid = np.round(P * 1e4).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, k)),
                "component": pa.array(np.tile(np.arange(k, dtype=np.int64), len(ids))),
                "proj_1e4": pa.array(grid.ravel()),
            }
        )

    return emb_ds.select_columns(["vec_id", "embedding"]).map_batches(
        project, batch_format="pyarrow"
    )


def pca_reference(ids: np.ndarray, M: np.ndarray, n_components: int = 4):
    """Single-process mirror (the gold): same moment formulas, same sign
    convention, same grid."""
    M = np.asarray(M, dtype=np.float64)
    n = M.shape[0]
    mean, V = _eig_components(n, M.sum(axis=0), M.T @ M, n_components)
    P = (M - mean) @ V
    grid = np.round(P * 1e4).astype(np.int64)
    k = V.shape[1]
    return pa.table(
        {
            "vec_id": pa.array(np.repeat(np.asarray(ids, dtype=np.int64), k)),
            "component": pa.array(np.tile(np.arange(k, dtype=np.int64), n)),
            "proj_1e4": pa.array(grid.ravel()),
        }
    )
