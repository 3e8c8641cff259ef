"""Round-4 ninth-batch ops: Jones-Plassmann coloring, lexical-diversity
stats, SoftDeDup sampling weights."""
import pyarrow as pa


# ---------------------------------------------------------------------------
# greedy coloring


def _coloring_run(edge_list, **kw):
    import ray

    from pdf_entity_extraction_ray.ops.graph_stats import greedy_coloring

    tbl = pa.table(
        {
            "src_id": pa.array([u for u, _ in edge_list], pa.int64()),
            "dst_id": pa.array([v for _, v in edge_list], pa.int64()),
        }
    )
    out = {}
    for b in greedy_coloring(ray.data.from_arrow(tbl), **kw).iter_batches(
        batch_format="pyarrow"
    ):
        out.update(zip(b.column("node").to_pylist(), b.column("color").to_pylist()))
    return out


def test_coloring_proper_and_matches_gold():
    import random

    from pdf_entity_extraction_ray.ops.graph_stats import coloring_reference

    rng = random.Random(17)
    for trial in range(3):
        n = 25
        edges = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(70)})
        edges = [(u, v) for u, v in edges if u != v]
        pairs = sorted({(min(u, v), max(u, v)) for u, v in edges})
        gold = coloring_reference(pairs)
        out = _coloring_run(edges, num_partitions=4)
        assert out == gold
        assert _coloring_run(edges, num_partitions=1) == gold
        # proper: no edge joins two same-colored nodes; all colored
        assert all(c >= 0 for c in out.values())
        assert all(out[u] != out[v] for u, v in pairs)
        # greedy bound: at most max-degree + 1 colors
        deg = {}
        for u, v in pairs:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        assert max(out.values()) <= max(deg.values())


def test_coloring_complete_graph_uses_n_colors():
    import itertools

    edges = list(itertools.combinations(range(5), 2))
    out = _coloring_run(edges)
    assert sorted(out.values()) == [0, 1, 2, 3, 4]


def test_coloring_star_two_colors():
    out = _coloring_run([(0, k) for k in range(1, 6)])
    assert len(set(out.values())) == 2


def test_coloring_empty():
    assert _coloring_run([]) == {}


# ---------------------------------------------------------------------------
# lexical stats


def test_lexical_stats_counts():
    from pdf_entity_extraction_ray.ops.text import lexical_stats_batch

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                ["The the THE cat sat", "one two three", ""], pa.string()
            ),
        }
    )
    rows = {r["doc_id"]: r for r in lexical_stats_batch(batch).to_pylist()}
    # "the" x3 (case-folded) + cat + sat
    assert rows[0]["n_tokens"] == 5
    assert rows[0]["n_distinct"] == 3
    assert rows[0]["n_hapax"] == 2  # cat, sat
    assert rows[1] == {"doc_id": 1, "n_tokens": 3, "n_distinct": 3, "n_hapax": 3}
    assert rows[2] == {"doc_id": 2, "n_tokens": 0, "n_distinct": 0, "n_hapax": 0}


# ---------------------------------------------------------------------------
# SoftDeDup weights


def test_softdedup_weights_cluster_and_singletons():
    import ray

    from pdf_entity_extraction_ray.ops.dedup import softdedup_weights

    dup = "alpha beta gamma delta epsilon zeta eta theta " * 6
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [dup, dup + " tail", "completely different words here entirely",
                 "another unrelated document body text"],
                pa.string(),
            ),
        }
    )
    out = {}
    for b in softdedup_weights(ray.data.from_arrow(docs), 0.7).iter_batches(
        batch_format="pyarrow"
    ):
        out.update(
            zip(b.column("doc_id").to_pylist(), b.column("weight_ppm").to_pylist())
        )
    assert set(out) == {0, 1, 2, 3}
    assert out[0] == out[1] == 500_000  # cluster of 2
    assert out[2] == out[3] == 1_000_000


def test_softdedup_no_clusters_all_one():
    import ray

    from pdf_entity_extraction_ray.ops.dedup import softdedup_weights

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                ["totally unique first document words",
                 "second page shares nothing at all"],
                pa.string(),
            ),
        }
    )
    out = {}
    for b in softdedup_weights(ray.data.from_arrow(docs), 0.7).iter_batches(
        batch_format="pyarrow"
    ):
        out.update(
            zip(b.column("doc_id").to_pylist(), b.column("weight_ppm").to_pylist())
        )
    assert out == {0: 1_000_000, 1: 1_000_000}


# ---------------------------------------------------------------------------
# Q5 six-table join


def _q5_tables():
    region = pa.table(
        {"r_regionkey": pa.array([0, 1], pa.int64()),
         "r_name": pa.array(["ASIA", "EUROPE"], pa.string())}
    )
    nation = pa.table(
        {"n_nationkey": pa.array([10, 11, 20], pa.int32()),
         "n_name": pa.array(["CHINA", "JAPAN", "FRANCE"], pa.string()),
         "n_regionkey": pa.array([0, 0, 1], pa.int64())}
    )
    customer = pa.table(
        {"c_custkey": pa.array([1, 2, 3], pa.int64()),
         "c_nationkey": pa.array([10, 11, 20], pa.int32())}
    )
    supplier = pa.table(
        {"s_suppkey": pa.array([100, 101, 102], pa.int64()),
         "s_nationkey": pa.array([10, 11, 20], pa.int32())}
    )
    orders = pa.table(
        {"o_orderkey": pa.array([1000, 1001, 1002], pa.int64()),
         "o_custkey": pa.array([1, 2, 3], pa.int64())}
    )
    # item 1: cust CHINA + supp CHINA -> local (rev 10000 cents * 95)
    # item 2: cust CHINA + supp JAPAN -> dropped (cross-nation)
    # item 3: cust JAPAN + supp JAPAN -> local
    # item 4: cust FRANCE + supp FRANCE -> local but EUROPE -> dropped
    lineitem = pa.table(
        {"l_orderkey": pa.array([1000, 1000, 1001, 1002], pa.int64()),
         "l_suppkey": pa.array([100, 101, 101, 102], pa.int64()),
         "l_extendedprice": pa.array([100.0, 50.0, 80.0, 70.0], pa.float64()),
         "l_discount": pa.array([0.05, 0.0, 0.1, 0.0], pa.float64())}
    )
    return lineitem, orders, customer, supplier, nation, region


def _q5_run(**kw):
    import ray

    from pdf_entity_extraction_ray.ops.relational import q5_supplier_volume

    tables = [ray.data.from_arrow(t) for t in _q5_tables()]
    out = {}
    for b in q5_supplier_volume(*tables, region="ASIA", **kw).iter_batches(
        batch_format="pyarrow"
    ):
        for r in b.to_pylist():
            out[r["n_name"]] = (r["n_items"], r["revenue_e4"])
    return out


def test_q5_local_supplier_volume_broadcast_path():
    out = _q5_run()
    assert out == {
        "CHINA": (1, 10000 * 95),
        "JAPAN": (1, 8000 * 90),
    }


def test_q5_hash_join_path_matches_broadcast():
    # force the shuffle-join fallback at every size-dispatched level
    assert _q5_run(broadcast_limit_bytes=0, num_partitions=2) == _q5_run()

