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
