"""Round-4 eighth-batch ops: IVF+PQ ANN composition, RFM segmentation,
Luby maximal independent set."""
import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------------------
# IVF + PQ


def _emb_table(n=64, d=16, seed=5):
    rng = np.random.RandomState(seed)
    M = rng.randn(n, d)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(M.tolist(), pa.list_(pa.float64())),
        }
    ), M


def test_ivfpq_matches_reference():
    import ray

    from pdf_entity_extraction_ray.ops.pq import ivfpq_reference, knn_ivfpq

    tbl, M = _emb_table()
    ids = np.arange(len(M), dtype=np.int64)
    q, n, r = ivfpq_reference(ids, M, [0, 1, 2], k=5, n_probe=4, m=4, n_codes=8)
    gold = set(zip(q, n, r))
    out = set()
    for b in knn_ivfpq(
        ray.data.from_arrow(tbl), [0, 1, 2], 5, n_probe=4, m=4, n_codes=8
    ).iter_batches(batch_format="pyarrow"):
        out |= set(
            zip(
                b.column("query_id").to_pylist(),
                b.column("neighbor_id").to_pylist(),
                b.column("rank").to_pylist(),
            )
        )
    assert out == gold and len(gold) > 0


def test_ivfpq_full_probe_equals_plain_pq():
    # probing EVERY bucket makes IVF pruning a no-op: ranks must equal
    # the unpartitioned knn_pq with the same codebooks
    import ray

    from pdf_entity_extraction_ray.ops.pq import knn_ivfpq, knn_pq

    tbl, M = _emb_table(n=40, d=8)

    def rows(ds):
        out = set()
        for b in ds.iter_batches(batch_format="pyarrow"):
            out |= set(
                zip(
                    b.column("query_id").to_pylist(),
                    b.column("neighbor_id").to_pylist(),
                    b.column("rank").to_pylist(),
                )
            )
        return out

    a = rows(
        knn_ivfpq(ray.data.from_arrow(tbl), [0, 1], 5, n_probe=8, m=4, n_codes=8)
    )
    b = rows(knn_pq(ray.data.from_arrow(tbl), [0, 1], 5, m=4, n_codes=8))
    assert a == b


def test_ivfpq_index_reuse_and_stale_rebuild(tmp_path):
    import os

    import ray

    from pdf_entity_extraction_ray.ops.pq import knn_ivfpq

    tbl, _ = _emb_table(n=32, d=8, seed=9)
    idx = str(tmp_path / "ivfpq")
    ds = ray.data.from_arrow(tbl)
    knn_ivfpq(ds, [0], 3, n_probe=2, m=4, n_codes=8, index_dir=idx).count()
    stamp = open(os.path.join(idx, "_FINGERPRINT")).read()
    # same dataset: fingerprint unchanged (reused, not rebuilt)
    knn_ivfpq(ds, [1], 3, n_probe=2, m=4, n_codes=8, index_dir=idx).count()
    assert open(os.path.join(idx, "_FINGERPRINT")).read() == stamp
    # different dataset in the same dir: must rebuild (stamp changes)
    tbl2, _ = _emb_table(n=24, d=8, seed=10)
    knn_ivfpq(ray.data.from_arrow(tbl2), [0], 3, n_probe=2, m=4, n_codes=8,
              index_dir=idx).count()
    assert open(os.path.join(idx, "_FINGERPRINT")).read() != stamp


# ---------------------------------------------------------------------------
# RFM


def _rfm_run(rows):
    """rows: (user_id, day, value_or_None, event_type)."""
    import ray

    from pdf_entity_extraction_ray.ops.relational import events_rfm

    DAY_US = 86_400_000_000
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * DAY_US for r in rows], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    out = {}
    for b in events_rfm(ray.data.from_arrow(tbl)).iter_batches(
        batch_format="pyarrow"
    ):
        for row in b.to_pylist():
            out[row["user_id"]] = row
    return out


def test_rfm_metrics_and_scores():
    rows = [
        (1, 10, 5.0, "purchase"),
        (1, 20, 7.5, "purchase"),
        (2, 5, 100.0, "purchase"),
        (3, 30, 1.0, "purchase"),
        (4, 30, 1.0, "view"),  # non-purchase: ignored entirely
    ]
    out = _rfm_run(rows)
    assert set(out) == {1, 2, 3}
    u1 = out[1]
    assert u1["last_day"] == 20 and u1["freq"] == 2
    assert u1["monetary_dollars"] == 12  # 500 + 750 cents -> 12 dollars
    # N=3 users: score(v) = ceil(5 * cum / 3) -> cum 1,2,3 -> 2,4,5
    assert out[2]["r_score"] == 2 and u1["r_score"] == 4 and out[3]["r_score"] == 5
    # freq: users 2,3 tie at 1 (cum 2 -> score 4); user 1 at 2 (cum 3 -> 5)
    assert out[2]["f_score"] == 4 and out[3]["f_score"] == 4 and u1["f_score"] == 5


def test_rfm_null_value_counts_but_adds_nothing():
    rows = [(1, 10, None, "purchase"), (1, 12, 3.0, "purchase")]
    out = _rfm_run(rows)
    assert out[1]["freq"] == 2 and out[1]["monetary_dollars"] == 3


# ---------------------------------------------------------------------------
# maximal independent set


def _mis_run(edge_list, **kw):
    import ray

    from pdf_entity_extraction_ray.ops.graph_stats import maximal_independent_set

    tbl = pa.table(
        {
            "src_id": pa.array([u for u, _ in edge_list], pa.int64()),
            "dst_id": pa.array([v for _, v in edge_list], pa.int64()),
        }
    )
    out = {}
    for b in maximal_independent_set(
        ray.data.from_arrow(tbl), **kw
    ).iter_batches(batch_format="pyarrow"):
        out.update(zip(b.column("node").to_pylist(), b.column("selected").to_pylist()))
    return out


def test_mis_independent_and_maximal_and_matches_gold():
    import random

    from pdf_entity_extraction_ray.ops.graph_stats import mis_reference

    rng = random.Random(13)
    for trial in range(3):
        n = 25
        edges = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(60)})
        edges = [(u, v) for u, v in edges if u != v]
        pairs = sorted({(min(u, v), max(u, v)) for u, v in edges})
        gold = mis_reference(pairs)
        out = _mis_run(edges, num_partitions=4)
        assert out == gold
        assert _mis_run(edges, num_partitions=1) == gold
        sel = {k for k, s in out.items() if s}
        adj = {}
        for u, v in pairs:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        # independence: no two selected adjacent
        assert all(not (adj[u] & sel) for u in sel)
        # maximality: every unselected node has a selected neighbor
        assert all(adj[u] & sel for u in adj if u not in sel)


def test_mis_triangle_selects_exactly_one():
    out = _mis_run([(0, 1), (1, 2), (0, 2)])
    assert sum(out.values()) == 1


def test_mis_empty():
    assert _mis_run([]) == {}



def test_mis_checkpoint_resume_preserves_joined_mask(tmp_path):
    import random

    rng = random.Random(31)
    edges = sorted({(rng.randrange(20), rng.randrange(20)) for _ in range(50)})
    edges = [(u, v) for u, v in edges if u != v]
    ck = str(tmp_path / "mis_ck")
    want = _mis_run(edges)
    # checkpoint EVERY round: resume state always includes a joined mask
    # whose exclusion messages are still pending — replay must stay exact
    got = _mis_run(edges, checkpoint_dir=ck, checkpoint_every=1)
    assert got == want
    assert _mis_run(edges, checkpoint_dir=ck, checkpoint_every=1) == want
