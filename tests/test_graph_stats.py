"""Graph analytics: degrees (two-stage agg) and BSP PageRank."""

import numpy as np
import pyarrow as pa
import ray.data

from pdf_entity_extraction_ray.ops.graph_stats import node_degrees, pagerank


def test_node_degrees_small():
    edges = pa.table(
        {
            "src_canonical": ["A", "A", "B"],
            "dst_canonical": ["B", "C", "C"],
            "weight": pa.array([2, 1, 5], pa.int64()),
        }
    )
    out = {}
    for b in node_degrees(ray.data.from_arrow(edges)).iter_batches(batch_format="pyarrow"):
        if b.num_rows and "canonical" in b.column_names:
            for r in b.to_pylist():
                out[r["canonical"]] = (r["out_edges"], r["out_weight"], r["in_edges"], r["in_weight"])
    assert out == {
        "A": (2, 3, 0, 0),
        "B": (1, 5, 1, 2),
        "C": (0, 0, 2, 6),
    }


def _numpy_pagerank(edges, nodes, iters=20, d=0.85):
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for u, _ in edges:
        out_deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        new = np.zeros(n)
        dangling = r[out_deg == 0].sum()
        for u, v in edges:
            new[idx[v]] += r[idx[u]] / out_deg[idx[u]]
        r = (1 - d) / n + d * dangling / n + d * new
    return {n_: r[idx[n_]] for n_ in nodes}


def test_pagerank_matches_power_iteration():
    """BSP result == single-process power iteration on a graph with a
    cycle AND a dangling node, to 1e-12."""
    edge_list = [(1, 2), (1, 3), (2, 3), (3, 1), (3, 4)]  # 4 is dangling
    edges = pa.table(
        {
            "src_id": pa.array([u for u, _ in edge_list], pa.int64()),
            "dst_id": pa.array([v for _, v in edge_list], pa.int64()),
        }
    )
    got = {}
    for b in pagerank(ray.data.from_arrow(edges), iterations=20).iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows and "node" in b.column_names:
            got.update(zip(b.column("node").to_pylist(), b.column("rank").to_pylist()))
    expected = _numpy_pagerank(edge_list, [1, 2, 3, 4])
    assert set(got) == set(expected)
    for n_ in expected:
        assert abs(got[n_] - expected[n_]) < 1e-12, n_
    assert abs(sum(got.values()) - 1.0) < 1e-9  # rank mass conserved


def _brute_triangles(edge_list):
    import itertools

    und = {(min(s, d), max(s, d)) for s, d in edge_list if s != d}
    nodes = sorted({x for e in und for x in e})
    cnt = {}
    for x, y, z in itertools.combinations(nodes, 3):
        if {(x, y), (y, z), (x, z)} <= und:
            for n_ in (x, y, z):
                cnt[n_] = cnt.get(n_, 0) + 1
    return cnt


def _tri_ds(edge_list):
    return ray.data.from_arrow(
        pa.table(
            {
                "src_canonical": pa.array([e[0] for e in edge_list], pa.string()),
                "dst_canonical": pa.array([e[1] for e in edge_list], pa.string()),
            }
        )
    )


def test_triangles_k4_plus_pendant():
    """K4 (every node in 3 triangles) + pendant edge + a reverse-duplicate
    edge (must not double-count)."""
    from pdf_entity_extraction_ray.ops.graph_stats import triangle_counts

    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("d", "e"), ("b", "a")]
    got = {r["canonical"]: r["triangles"] for r in triangle_counts(_tri_ds(edges)).take_all()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangles_random_graph_matches_bruteforce():
    """Random multigraph with self-loops and both-direction duplicates:
    degree-oriented wedge counting == O(n^3) brute force."""
    import random

    from pdf_entity_extraction_ray.ops.graph_stats import triangle_counts

    rng = random.Random(7)
    nodes = [f"n{i:02d}" for i in range(30)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(120)]
    got = {r["canonical"]: r["triangles"] for r in triangle_counts(_tri_ds(edges)).take_all()}
    assert got == _brute_triangles(edges)


def test_triangles_hot_apex_skew():
    """A degree-100 hub in a star closes no triangles (no rim edges) and,
    with rim edges added, never becomes a wedge SOURCE: orientation sends
    every hub edge hub->? only when the hub has lower degree, so the
    hub's wedge fan-out stays bounded."""
    from pdf_entity_extraction_ray.ops.graph_stats import triangle_counts

    hub_edges = [("hub", f"rim{i:03d}") for i in range(100)]
    assert triangle_counts(_tri_ds(hub_edges)).count() == 0
    # add a rim cycle: each consecutive rim pair closes one triangle w/ hub
    rim = [(f"rim{i:03d}", f"rim{(i + 1) % 100:03d}") for i in range(100)]
    got = {
        r["canonical"]: r["triangles"]
        for r in triangle_counts(_tri_ds(hub_edges + rim)).take_all()
    }
    assert got["hub"] == 100
    assert all(got[f"rim{i:03d}"] == 2 for i in range(100))


def _core_ds(edge_list):
    return ray.data.from_arrow(
        pa.table(
            {
                "src_id": pa.array([u for u, _ in edge_list], pa.int64()),
                "dst_id": pa.array([v for _, v in edge_list], pa.int64()),
            }
        )
    )


def test_coreness_clique_plus_tail():
    """K4 (core 3) with a path tail (core 1); self-loops and duplicate /
    reverse edges must not change anything."""
    from pdf_entity_extraction_ray.ops.graph_stats import coreness

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
             (4, 5), (5, 6),                                   # tail
             (2, 1), (3, 3), (1, 2)]                           # noise
    got = {r["node"]: r["core"] for r in coreness(_core_ds(edges)).take_all()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 1, 6: 1}


def test_coreness_random_matches_peeling():
    """Iterated h-index BSP == classic peeling on a random multigraph."""
    import random

    from pdf_entity_extraction_ray.ops.graph_stats import coreness
    from pdf_entity_extraction_ray.sources.corpus import kcore_reference

    rng = random.Random(11)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(200)]
    pairs = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    got = {r["node"]: r["core"] for r in coreness(_core_ds(edges)).take_all()}
    assert got == kcore_reference(pairs)
