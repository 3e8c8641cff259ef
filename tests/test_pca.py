"""Distributed PCA (ops/pca.py): correctness vs the single-process
reference and stability of the integer grid across partitionings."""

import numpy as np
import pyarrow as pa
import ray.data

from pdf_entity_extraction_ray.ops.pca import pca_fit, pca_project, pca_reference


def _make(n=300, d=16, seed=7):
    rng = np.random.RandomState(seed)
    # anisotropic data -> well-separated top eigenvalues
    scales = np.linspace(5.0, 0.1, d)
    M = (rng.randn(n, d) * scales).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(M.tolist(), pa.list_(pa.float32())),
        }
    )
    return ids, np.asarray(M, dtype=np.float64), tbl


def _rows(ds_or_tbl):
    if isinstance(ds_or_tbl, pa.Table):
        t = ds_or_tbl
    else:
        t = pa.concat_tables(
            list(ds_or_tbl.iter_batches(batch_format="pyarrow")),
            promote_options="default",
        )
    return sorted(
        zip(*[t.column(c).to_pylist() for c in ("vec_id", "component", "proj_1e4")])
    )


def test_matches_single_process_reference():
    ids, M, tbl = _make()
    got = _rows(pca_project(ray.data.from_arrow(tbl).repartition(5), 4))
    want = _rows(pca_reference(ids, M, 4))
    assert got == want


def test_partition_invariant():
    _, _, tbl = _make(seed=11)
    a = _rows(pca_project(ray.data.from_arrow(tbl), 3))
    b = _rows(pca_project(ray.data.from_arrow(tbl).repartition(9), 3))
    assert a == b


def test_components_orthonormal_and_variance_ordered():
    _, M, tbl = _make(seed=3)
    mean, V = pca_fit(ray.data.from_arrow(tbl), 4)
    # orthonormal columns
    assert np.allclose(V.T @ V, np.eye(4), atol=1e-10)
    # projections have descending variance
    P = (M - mean) @ V
    var = P.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(3))
    # sign convention: max-|coeff| entry positive
    for j in range(4):
        i = int(np.argmax(np.abs(V[:, j])))
        assert V[i, j] > 0


def test_recovers_planted_direction():
    # 1-D signal along a known direction + small noise: PC1 must align
    rng = np.random.RandomState(0)
    d = 8
    u = np.zeros(d)
    u[2] = 1.0
    t = rng.randn(400) * 10.0
    M = np.outer(t, u) + rng.randn(400, d) * 0.01
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(400, dtype=np.int64)),
            "embedding": pa.array(M.astype(np.float32).tolist(), pa.list_(pa.float32())),
        }
    )
    _, V = pca_fit(ray.data.from_arrow(tbl), 1)
    assert abs(abs(V[:, 0] @ u) - 1.0) < 1e-3
