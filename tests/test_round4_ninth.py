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
