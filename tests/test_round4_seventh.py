"""Round-4 seventh-batch ops: label-propagation communities, bounded
weighted shortest paths, market-basket co-purchase pairs.  Graph tests
compare against brute-force single-process golds and assert partition
invariance (the BSP output must be a pure function of the graph)."""
import pyarrow as pa


# ---------------------------------------------------------------------------
# label propagation


def _lpa_run(edge_list, rounds=4, **kw):
    import ray

    from pdf_entity_extraction_ray.ops.graph_stats import label_propagation

    tbl = pa.table(
        {
            "src_id": pa.array([u for u, _ in edge_list], pa.int64()),
            "dst_id": pa.array([v for _, v in edge_list], pa.int64()),
        }
    )
    out = {}
    for b in label_propagation(
        ray.data.from_arrow(tbl), rounds=rounds, **kw
    ).iter_batches(batch_format="pyarrow"):
        out.update(
            zip(b.column("node").to_pylist(), b.column("community").to_pylist())
        )
    return out


def _lpa_gold(edge_list, rounds=4):
    from pdf_entity_extraction_ray.sources.corpus import lpa_reference

    pairs = sorted({(min(u, v), max(u, v)) for u, v in edge_list if u != v})
    return lpa_reference(pairs, rounds=rounds)


def test_lpa_star_adopts_hub_and_hub_adopts_min_leaf():
    # star 0-(1..4): leaves all see only the hub's label 0; the hub sees
    # labels {1,2,3,4}, all count 1, tie -> min = 1.  Round 2: leaves see
    # hub label 1; hub sees {0,0,0,0} -> 0.  Fixed rounds keep this
    # oscillation deterministic.
    edges = [(0, k) for k in (1, 2, 3, 4)]
    out = _lpa_run(edges, rounds=1)
    assert out[1] == out[2] == out[3] == out[4] == 0
    assert out[0] == 1
    out2 = _lpa_run(edges, rounds=2)
    assert out2[0] == 0 and out2[1] == 1


def test_lpa_two_cliques_with_bridge():
    # two triangles joined by one bridge edge: after 4 rounds each clique
    # should carry a label from its own side (communities separate)
    a = [(0, 1), (1, 2), (0, 2)]
    b = [(10, 11), (11, 12), (10, 12)]
    out = _lpa_run(a + b + [(2, 10)])
    gold = _lpa_gold(a + b + [(2, 10)])
    assert out == gold
    assert out[0] == out[1]  # same community inside clique A
    assert out[11] == out[12]


def test_lpa_matches_reference_on_random_graphs_and_partitions():
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = 30
        edges = sorted(
            {
                (rng.randrange(n), rng.randrange(n))
                for _ in range(70)
            }
        )
        edges = [(u, v) for u, v in edges if u != v]
        gold = _lpa_gold(edges)
        assert _lpa_run(edges, num_partitions=1) == gold
        assert _lpa_run(edges, num_partitions=4) == gold


def test_lpa_duplicate_and_reversed_edges_collapse():
    # (0,1) seen 3 times / both directions is ONE neighbor relation
    out = _lpa_run([(0, 1), (1, 0), (0, 1), (1, 2)], rounds=1)
    gold = _lpa_gold([(0, 1), (1, 2)], rounds=1)
    assert out == gold


def test_lpa_empty_graph():
    assert _lpa_run([]) == {}


# ---------------------------------------------------------------------------
# bounded weighted shortest paths


def _sssp_run(rows, seeds, max_hops=4, **kw):
    """rows: (src_id, dst_id) pairs, one per distinct assertion; ids
    double as canonicals via str()."""
    import ray

    from pdf_entity_extraction_ray.ops.graph_stats import sssp_costs

    tbl = pa.table(
        {
            "src_id": pa.array([u for u, _ in rows], pa.int64()),
            "dst_id": pa.array([v for _, v in rows], pa.int64()),
            "src_canonical": pa.array([f"n{u:03d}" for u, _ in rows], pa.string()),
            "dst_canonical": pa.array([f"n{v:03d}" for _, v in rows], pa.string()),
        }
    )
    out = {}
    for b in sssp_costs(
        ray.data.from_arrow(tbl), [f"n{s:03d}" for s in seeds], max_hops=max_hops, **kw
    ).iter_batches(batch_format="pyarrow"):
        out.update(
            zip(b.column("canonical").to_pylist(), b.column("dist").to_pylist())
        )
    return {int(k[1:]): v for k, v in out.items()}


def _sssp_gold(rows, seeds, max_hops=4):
    """Brute-force bounded Bellman-Ford over the pair-multiplicity costs."""
    from collections import Counter

    mult = Counter()
    for u, v in rows:
        if u != v:
            mult[(min(u, v), max(u, v))] += 1
    adj = {}
    for (u, v), n in mult.items():
        w = 1_000_000 // n
        adj.setdefault(u, []).append((v, w))
        adj.setdefault(v, []).append((u, w))
    INF = float("inf")
    dist = {n: (0 if n in seeds else INF) for n in adj}
    for _ in range(max_hops):
        new = dict(dist)
        for n, nbrs in adj.items():
            for m, w in nbrs:
                if dist[m] + w < new[n]:
                    new[n] = dist[m] + w
        dist = new
    return {n: d for n, d in dist.items() if d < INF}


def test_sssp_multiplicity_shortens_edges():
    # 0-1 single assertion (cost 10^6) vs 0-2 triple assertion (cost
    # 333333): hop counts equal, weighted distances differ
    rows = [(0, 1), (0, 2), (0, 2), (2, 0)]
    out = _sssp_run(rows, seeds=[0])
    assert out[0] == 0
    assert out[1] == 1_000_000
    assert out[2] == 333_333


def test_sssp_cheaper_long_path_wins_within_hop_budget():
    # direct 0-3 edge costs 10^6; path 0-1-2-3 over triple-assertion
    # edges costs 3 * 333333 < 10^6 — Bellman-Ford must keep improving
    # after the 1-hop round
    triple = lambda a, b: [(a, b)] * 3
    rows = [(0, 3)] + triple(0, 1) + triple(1, 2) + triple(2, 3)
    out = _sssp_run(rows, seeds=[0])
    assert out[3] == 999_999
    # with a 1-hop budget only the direct edge is reachable
    out1 = _sssp_run(rows, seeds=[0], max_hops=1)
    assert out1[3] == 1_000_000


def test_sssp_matches_brute_force_and_partitions():
    import random

    rng = random.Random(11)
    rows = [(rng.randrange(18), rng.randrange(18)) for _ in range(60)]
    rows = [(u, v) for u, v in rows if u != v]
    seeds = [0, 1]
    gold = _sssp_gold(rows, seeds)
    assert _sssp_run(rows, seeds, num_partitions=1) == gold
    assert _sssp_run(rows, seeds, num_partitions=4) == gold


def test_sssp_unknown_seed_reaches_nothing():
    assert _sssp_run([(0, 1)], seeds=[99]) == {}


# ---------------------------------------------------------------------------
# market-basket co-purchase


def _copurchase_run(rows, **kw):
    import ray

    from pdf_entity_extraction_ray.ops.relational import parts_copurchase

    tbl = pa.table(
        {
            "l_orderkey": pa.array([o for o, _ in rows], pa.int64()),
            "l_partkey": pa.array([p for _, p in rows], pa.int64()),
        }
    )
    out = {}
    for b in parts_copurchase(ray.data.from_arrow(tbl), **kw).iter_batches(
        batch_format="pyarrow"
    ):
        for a, b_, n in zip(
            b.column("part_a").to_pylist(),
            b.column("part_b").to_pylist(),
            b.column("n_orders").to_pylist(),
        ):
            out[(a, b_)] = n
    return out


def test_copurchase_counts_and_threshold():
    rows = [
        (1, 10), (1, 20), (1, 30),          # basket {10,20,30}
        (2, 10), (2, 20),                   # basket {10,20}
        (3, 10), (3, 30),                   # basket {10,30}
        (4, 40),                            # singleton: no pairs
    ]
    out = _copurchase_run(rows, min_orders=2)
    assert out == {(10, 20): 2, (10, 30): 2}
    all_pairs = _copurchase_run(rows, min_orders=1)
    assert all_pairs[(20, 30)] == 1 and len(all_pairs) == 3


def test_copurchase_duplicate_lineitem_is_one_basket_item():
    # part 10 twice in order 1 must not pair with itself or double-count
    rows = [(1, 10), (1, 10), (1, 20), (2, 10), (2, 20)]
    out = _copurchase_run(rows, min_orders=1)
    assert out == {(10, 20): 2}


def test_copurchase_matches_brute_force_across_shards():
    import itertools
    import random

    rng = random.Random(3)
    rows = []
    for order in range(40):
        parts = rng.sample(range(15), rng.randrange(1, 6))
        rows += [(order, p) for p in parts]
    gold = {}
    for order, grp in itertools.groupby(sorted(rows), key=lambda r: r[0]):
        parts = sorted({p for _, p in grp})
        for a, b in itertools.combinations(parts, 2):
            gold[(a, b)] = gold.get((a, b), 0) + 1
    assert _copurchase_run(rows, min_orders=1, shards=8) == gold
    assert _copurchase_run(rows, min_orders=1, shards=1) == gold


# ---------------------------------------------------------------------------
# checkpoint/resume for the new BSP ops


def test_lpa_checkpoint_resume(tmp_path):
    import json
    import random

    rng = random.Random(23)
    edges = sorted({(rng.randrange(20), rng.randrange(20)) for _ in range(50)})
    edges = [(u, v) for u, v in edges if u != v]
    ck = str(tmp_path / "lpa_ck")
    want = _lpa_run(edges, rounds=4)
    got = _lpa_run(edges, rounds=4, checkpoint_dir=ck, checkpoint_every=2)
    assert got == want
    assert json.load(open(f"{ck}/manifest.json"))["round"] == 4
    # rerun with the same dir resumes from round 4 (zero live rounds) and
    # must reproduce the same labels
    assert _lpa_run(edges, rounds=4, checkpoint_dir=ck, checkpoint_every=2) == want


def test_sssp_checkpoint_resume(tmp_path):
    import json
    import random

    rng = random.Random(29)
    rows = [(rng.randrange(15), rng.randrange(15)) for _ in range(40)]
    rows = [(u, v) for u, v in rows if u != v]
    ck = str(tmp_path / "sssp_ck")
    want = _sssp_run(rows, seeds=[0])
    got = _sssp_run(rows, seeds=[0], checkpoint_dir=ck, checkpoint_every=1)
    assert got == want
    assert json.load(open(f"{ck}/manifest.json"))["round"] >= 1
    assert _sssp_run(rows, seeds=[0], checkpoint_dir=ck, checkpoint_every=1) == want


def test_new_bsp_checkpoints_reject_rewired_input(tmp_path):
    # same node/edge COUNTS, different wiring: the content digest in the
    # default fingerprint must force a recompute, not a stale resume
    a = [(0, 1), (1, 2), (2, 3), (3, 4)]
    b = [(0, 2), (2, 4), (4, 1), (1, 3)]
    ck = str(tmp_path / "digest_ck")
    _lpa_run(a, rounds=4, checkpoint_dir=ck, checkpoint_every=1)
    assert _lpa_run(b, rounds=4, checkpoint_dir=ck, checkpoint_every=1) == _lpa_run(
        b, rounds=4
    )
