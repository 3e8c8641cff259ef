"""Strongly connected components (ops/graph_stats.scc_components).

Gold = single-process Tarjan over the same directed edge list; the BSP
trim/color/mark loop must produce the identical partition keyed by min
canonical, at any partition count.
"""
import random

import pyarrow as pa
import pytest
import ray


def _tarjan(edge_list):
    """Iterative Tarjan: directed (u, v) pairs -> {node: frozenset(scc)}."""
    adj = {}
    nodes = set()
    for u, v in edge_list:
        adj.setdefault(u, []).append(v)
        nodes.add(u)
        nodes.add(v)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    sccs = []
    counter = [0]

    for root in nodes:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            node, pi = work[-1]
            if pi == 0:
                index[node] = low[node] = counter[0]
                counter[0] += 1
                stack.append(node)
                on_stack.add(node)
            recurse = False
            succs = adj.get(node, [])
            for i in range(pi, len(succs)):
                w = succs[i]
                if w not in index:
                    work[-1] = (node, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[node] = min(low[node], index[w])
            if recurse:
                continue
            if pi < len(succs):
                pass
            if low[node] == index[node]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == node:
                        break
                sccs.append(frozenset(comp))
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[node])
    return {n: c for c in sccs for n in c}


def _canon(i):
    return f"n{i:04d}"


def _edges_table(edge_list, id_of=None):
    id_of = id_of or (lambda x: x)
    return pa.table(
        {
            "src_id": pa.array([id_of(u) for u, _ in edge_list], pa.int64()),
            "dst_id": pa.array([id_of(v) for _, v in edge_list], pa.int64()),
            "src_canonical": [_canon(u) for u, _ in edge_list],
            "dst_canonical": [_canon(v) for _, v in edge_list],
        }
    )


def _run(edge_list, **kw):
    from pdf_entity_extraction_ray.ops.graph_stats import scc_components

    out = {}
    for b in scc_components(
        ray.data.from_arrow(_edges_table(edge_list, **_pop_ids(kw))), **kw
    ).iter_batches(batch_format="pyarrow"):
        out.update(zip(b.column("canonical").to_pylist(), b.column("scc").to_pylist()))
    return out


def _pop_ids(kw):
    id_of = kw.pop("id_of", None)
    return {"id_of": id_of} if id_of else {}


def _expected(edge_list):
    scc = _tarjan(edge_list)
    return {_canon(n): _canon(min(c)) for n, c in scc.items()}


def test_scc_hand_graph():
    # 3-cycle {0,1,2} -> chain 3 -> 4, plus 2-cycle {5,6} fed by the cycle,
    # plus a self-loop-only node 7 -> 7
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (2, 5), (5, 6), (6, 5), (7, 7)]
    assert _run(edges) == _expected(edges)


def test_scc_ids_anti_ordered_vs_canonical():
    # int ids deliberately REVERSED against canonical order: a min-int-id
    # label shortcut would pick the wrong representative
    edges = [(0, 1), (1, 0), (1, 2)]
    out = _run(edges, id_of=lambda x: 100 - x)
    assert out == {_canon(0): _canon(0), _canon(1): _canon(0), _canon(2): _canon(2)}


def test_scc_long_path_trims():
    # pure chain: every node a singleton; trim must settle it without
    # one-outer-round-per-node coloring
    edges = [(i, i + 1) for i in range(30)]
    assert _run(edges) == _expected(edges)


def test_scc_chain_of_two_cycles_needs_outer_rounds():
    # A_k <-> B_k -> A_{k+1}: condensation is a path of 2-node SCCs, the
    # worst case for coloring (one SCC layer settles per outer round)
    edges = []
    for k in range(5):
        a, b = 2 * k, 2 * k + 1
        edges += [(a, b), (b, a)]
        if k < 4:
            edges.append((b, 2 * (k + 1)))
    assert _run(edges) == _expected(edges)


def test_scc_random_matches_tarjan_and_partition_invariant():
    rng = random.Random(7)
    n = 60
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(220)})
    exp = _expected(edges)
    got1 = _run(edges, num_partitions=1)
    got5 = _run(edges, num_partitions=5)
    assert got1 == exp
    assert got5 == exp


def test_scc_empty_edges():
    from pdf_entity_extraction_ray.ops.graph_stats import scc_components

    empty = pa.table(
        {
            "src_id": pa.array([], pa.int64()),
            "dst_id": pa.array([], pa.int64()),
            "src_canonical": pa.array([], pa.string()),
            "dst_canonical": pa.array([], pa.string()),
        }
    )
    out = scc_components(ray.data.from_arrow(empty))
    assert out.count() == 0


def test_scc_max_outer_raises():
    from pdf_entity_extraction_ray.ops.graph_stats import scc_components

    # two chained 2-cycles need 2 outer rounds; cap at 1 must raise
    edges = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2)]
    with pytest.raises(RuntimeError, match="unsettled"):
        scc_components(
            ray.data.from_arrow(_edges_table(edges)), max_outer=1
        ).materialize()
