"""Round-4 sixth-batch ops: Gopher quality rules (and friends added in
this batch).  Each test hand-computes the expected integer columns."""
import pyarrow as pa


def _gopher(texts):
    from pdf_entity_extraction_ray.ops.text import gopher_filter_batch

    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    t = gopher_filter_batch(batch)
    return {r["doc_id"]: r for r in t.to_pylist()}


def test_gopher_word_count_and_stopwords():
    good = "the quick brown fox jumps over that lazy dog again and again " * 5
    out = _gopher([good, "tiny doc with few words", ""])
    g = out[0]
    assert g["ok_words"]  # 60 words
    assert g["ok_stop"]  # the/that/and -> 3 distinct
    assert g["ok_alpha"] and g["ok_mean_len"] and g["keep"]
    s = out[1]
    assert not s["ok_words"] and not s["keep"]  # 5 words < 50
    assert not s["ok_stop"]  # only 'with' -> 1 distinct stop word
    e = out[2]
    assert e["n_words"] == 0 and not e["keep"]


def test_gopher_stopword_distinctness():
    # 'with' repeated 60 times: 60 words but only ONE distinct stop word
    out = _gopher(["with " * 60])
    assert out[0]["n_stop"] == 1
    assert not out[0]["ok_stop"] and not out[0]["keep"]


def test_gopher_symbol_ratio():
    # 10 words, 2 symbols ('#' and '...'): 10*2 >= 10 -> fail
    t = "alpha beta gamma delta epsilon zeta eta theta iota# kappa..."
    out = _gopher([t])
    assert out[0]["n_words"] == 10
    assert not out[0]["ok_symbol"]
    # 1 symbol per 11 words passes (10*1 < 11)
    t2 = "a b c d e f g h i j k#"
    assert _gopher([t2])[0]["ok_symbol"]


def test_gopher_bullet_and_ellipsis_lines():
    # 10 lines, 9 bullets: 10*9 <= 9*10 -> ok (exactly at the bound);
    # 10 bullets: 100 > 90 -> fail
    nine = "\n".join(["- item"] * 9 + ["plain line"])
    ten = "\n".join(["- item"] * 10)
    out = _gopher([nine, ten])
    assert out[0]["ok_bullet"] and not out[1]["ok_bullet"]
    # ellipsis: 4 of 10 lines ending in ... -> 40 > 30 -> fail; 3 of 10 ok
    four = "\n".join(["ends here..."] * 4 + ["plain"] * 6)
    three = "\n".join(["ends here..."] * 3 + ["plain"] * 7)
    out2 = _gopher([four, three])
    assert not out2[0]["ok_ellipsis"] and out2[1]["ok_ellipsis"]


def test_gopher_mean_word_length_and_alpha():
    # fifty 1-char words: mean 1 < 3 -> fail mean_len
    ones = " ".join(["a"] * 50)
    # fifty 12-char words: mean 12 > 10 -> fail
    longs = " ".join(["abcdefghijkl"] * 50)
    # 40 alpha + 10 numeric of 50: 5*40 >= 4*50 -> ok_alpha at the bound
    mixed = " ".join(["word"] * 40 + ["1234"] * 10)
    out = _gopher([ones, longs, mixed])
    assert not out[0]["ok_mean_len"]
    assert not out[1]["ok_mean_len"]
    assert out[2]["ok_alpha"]
    # 39 alpha of 50 fails (195 < 200)
    mixed_bad = " ".join(["word"] * 39 + ["1234"] * 11)
    assert not _gopher([mixed_bad])[0]["ok_alpha"]


def _hits_run(edge_list, **kw):
    import ray

    from pdf_entity_extraction_ray.ops.graph_stats import hits

    tbl = pa.table(
        {
            "src_id": pa.array([u for u, _ in edge_list], pa.int64()),
            "dst_id": pa.array([v for _, v in edge_list], pa.int64()),
        }
    )
    out = {}
    for b in hits(ray.data.from_arrow(tbl), **kw).iter_batches(
        batch_format="pyarrow"
    ):
        for n, h, a in zip(
            b.column("node").to_pylist(),
            b.column("hub").to_pylist(),
            b.column("auth").to_pylist(),
        ):
            out[n] = (round(h * 1e6), round(a * 1e6))
    return out


def test_hits_matches_reference_and_partition_invariant():
    import random

    from pdf_entity_extraction_ray.sources.corpus import hits_reference

    rng = random.Random(11)
    n = 40
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    nodes, hub, auth = hits_reference(edges, iterations=20)
    exp = {
        nd: (round(h * 1e6), round(a * 1e6)) for nd, h, a in zip(nodes, hub, auth)
    }
    assert _hits_run(edges, num_partitions=1) == exp
    assert _hits_run(edges, num_partitions=5) == exp


def test_hits_star_graph():
    # star: 0 -> {1..5}; node 0 is the only hub, 1..5 equal authorities
    edges = [(0, k) for k in range(1, 6)]
    out = _hits_run(edges)
    assert out[0][0] == 1_000_000  # hub ppm of the center
    assert out[0][1] == 0
    import math

    leaf_auth = round(1e6 / math.sqrt(5))
    for k in range(1, 6):
        assert out[k] == (0, leaf_auth)


def test_hits_multigraph_edge_weighting():
    # duplicated edge counts twice (PageRank multigraph parity)
    from pdf_entity_extraction_ray.sources.corpus import hits_reference

    edges = [(0, 1), (0, 1), (2, 1), (2, 3)]
    nodes, hub, auth = hits_reference(edges, iterations=20)
    exp = {
        nd: (round(h * 1e6), round(a * 1e6)) for nd, h, a in zip(nodes, hub, auth)
    }
    assert _hits_run(edges) == exp
    # the doubled edge must make 0 a stronger hub than 2
    assert exp[0][0] > exp[2][0]


def test_blocklist_filter():
    from pdf_entity_extraction_ray.ops.text import blocklist_filter_batch

    texts = [
        "fast table scan",                      # 0 blocked of 3 -> keep
        "slow slow table scan",                 # 2 of 4 = 50% -> drop
        "SLOW " + "word " * 49,                 # 1 of 50 = 2% -> keep (boundary)
        "slow " + "word " * 48,                 # 1 of 49 > 2% -> drop
        "",                                     # empty -> keep
    ]
    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    out = {r["doc_id"]: r for r in blocklist_filter_batch(batch).to_pylist()}
    assert out[0]["keep"] and out[0]["n_blocked"] == 0
    assert not out[1]["keep"] and out[1]["n_blocked"] == 2
    assert out[2]["keep"]  # case-insensitive match, exactly at 2%
    assert not out[3]["keep"]
    assert out[4]["keep"] and out[4]["n_words"] == 0


def test_resource_allocation_matches_bruteforce():
    import itertools
    import random
    from collections import defaultdict

    import ray

    from pdf_entity_extraction_ray.ops.graph_stats import resource_allocation

    rng = random.Random(13)
    n = 25
    und = {
        (min(u, v), max(u, v))
        for u, v in ((rng.randrange(n), rng.randrange(n)) for _ in range(70))
        if u != v
    }
    nbr = defaultdict(set)
    for a, b in und:
        nbr[a].add(b)
        nbr[b].add(a)
    exp = {}
    for a, b in itertools.combinations(sorted(nbr), 2):
        com = nbr[a] & nbr[b]
        if com:
            exp[(f"n{a:02d}", f"n{b:02d}")] = (
                len(com),
                sum(1_000_000 // len(nbr[w]) for w in com),
                int((min(a, b), max(a, b)) in und),
            )
    tbl = pa.table(
        {
            "src_canonical": [f"n{u:02d}" for u, _ in und],
            "dst_canonical": [f"n{v:02d}" for _, v in und],
        }
    )
    got = {}
    for b in resource_allocation(ray.data.from_arrow(tbl)).iter_batches(
        batch_format="pyarrow"
    ):
        for r in b.to_pylist():
            got[(r["a"], r["b"])] = (r["common"], r["ra_micro"], r["is_edge"])
    assert got == exp


def _hyperball_run(edge_list, max_t=4, **kw):
    import ray

    from pdf_entity_extraction_ray.ops.graph_stats import hyperball

    tbl = pa.table(
        {
            "src_id": pa.array([u for u, _ in edge_list], pa.int64()),
            "dst_id": pa.array([v for _, v in edge_list], pa.int64()),
        }
    )
    out = {}
    for b in hyperball(ray.data.from_arrow(tbl), max_t=max_t, **kw).iter_batches(
        batch_format="pyarrow"
    ):
        for r in b.to_pylist():
            out[(r["node"], r["t"])] = r["est_micro"]
    return out


def _hyperball_gold(edge_list, max_t=4, p_bits=8):
    import numpy as np

    from pdf_entity_extraction_ray.ops.sketch import (
        hll_row_estimates,
        hll_single_register,
    )

    uv = set(edge_list)
    nodes = sorted({u for u, _ in uv} | {v for _, v in uv})
    succ = {}
    for u, v in uv:
        succ.setdefault(u, set()).add(v)
    seed = {n: hll_single_register(str(int(n)).encode("utf-8"), p_bits) for n in nodes}
    balls = {n: {n} for n in nodes}
    exp = {}
    m = 1 << p_bits
    for t in range(max_t + 1):
        if t > 0:
            balls = {
                n: set().union(balls[n], *(balls[w] for w in succ.get(n, ())))
                for n in nodes
            }
        regs = np.zeros((len(nodes), m), np.uint8)
        for i, n in enumerate(nodes):
            for x in balls[n]:
                b, rho = seed[x]
                if rho > regs[i, b]:
                    regs[i, b] = rho
        est = np.round(hll_row_estimates(regs, p_bits) * 1e6).astype(np.int64)
        for n, e in zip(nodes, est.tolist()):
            exp[(n, t)] = e
    return exp


def test_hyperball_matches_exact_ball_mirror():
    import random

    rng = random.Random(17)
    n = 50
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(120)})
    exp = _hyperball_gold(edges)
    assert _hyperball_run(edges, num_partitions=1) == exp
    assert _hyperball_run(edges, num_partitions=5) == exp


def test_hyperball_path_saturates_and_fills():
    # path 0 -> 1 -> 2: balls saturate at t=2; t=3,4 repeat the converged
    # estimate via the early-exit fill
    edges = [(0, 1), (1, 2)]
    out = _hyperball_run(edges, max_t=4)
    assert out[(0, 2)] == out[(0, 3)] == out[(0, 4)]
    assert out[(2, 0)] == out[(2, 4)]  # sink never grows
    exp = _hyperball_gold(edges, max_t=4)
    assert out == exp


def _truss_run(edge_list, **kw):
    import ray

    from pdf_entity_extraction_ray.ops.graph_stats import truss_decomposition

    tbl = pa.table(
        {
            "src_id": pa.array([u for u, _ in edge_list], pa.int64()),
            "dst_id": pa.array([v for _, v in edge_list], pa.int64()),
        }
    )
    out = {}
    for b in truss_decomposition(ray.data.from_arrow(tbl), **kw).iter_batches(
        batch_format="pyarrow"
    ):
        for r in b.to_pylist():
            out[(r["u"], r["v"])] = r["truss"]
    return out


def test_truss_reference_on_k4_plus_pendant():
    from pdf_entity_extraction_ray.sources.corpus import truss_reference

    k4 = {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}
    pend = k4 | {(3, 4)}
    t = truss_reference(pend)
    assert all(t[e] == 4 for e in k4)
    assert t[(3, 4)] == 2


def test_truss_bsp_matches_peeling_hand_cases():
    from pdf_entity_extraction_ray.sources.corpus import truss_reference

    # K4 + pendant + separate triangle + isolated edge
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4),
             (5, 6), (6, 7), (5, 7), (8, 9)]
    exp = truss_reference({(min(u, v), max(u, v)) for u, v in edges})
    assert _truss_run(edges) == exp
    assert exp[(5, 6)] == 3 and exp[(8, 9)] == 2


def test_truss_bsp_matches_peeling_random_and_partition_invariant():
    import random

    from pdf_entity_extraction_ray.sources.corpus import truss_reference

    rng = random.Random(23)
    n = 30
    und = {
        (min(u, v), max(u, v))
        for u, v in ((rng.randrange(n), rng.randrange(n)) for _ in range(160))
        if u != v
    }
    exp = truss_reference(und)
    edges = sorted(und)
    assert _truss_run(edges, num_partitions=1) == exp
    assert _truss_run(edges, num_partitions=5) == exp


def test_truss_triangle_free_and_empty():
    # path graph: no triangles, every edge truss 2
    edges = [(0, 1), (1, 2), (2, 3)]
    out = _truss_run(edges)
    assert out == {(0, 1): 2, (1, 2): 2, (2, 3): 2}
    assert _truss_run([]) == {}


def test_condensation_edges():
    import ray

    from pdf_entity_extraction_ray.ops.graph_stats import condensation_edges

    # SCC {A,B} -> SCC {C} -> SCC {D,E}; reciprocal + multi-pred edges
    # must collapse; intra-SCC edges must not appear
    edges = [
        ("A", "B"), ("B", "A"),          # SCC {A,B}, min canonical A
        ("B", "C"), ("A", "C"),          # two edges into C -> one pair
        ("C", "D"),
        ("D", "E"), ("E", "D"),          # SCC {D,E}
    ]
    ids = {c: 1000 - ord(c) for c in "ABCDE"}  # ids anti-ordered
    tbl = pa.table(
        {
            "src_id": pa.array([ids[a] for a, _ in edges], pa.int64()),
            "dst_id": pa.array([ids[b] for _, b in edges], pa.int64()),
            "src_canonical": [a for a, _ in edges],
            "dst_canonical": [b for _, b in edges],
        }
    )
    got = set()
    for b in condensation_edges(ray.data.from_arrow(tbl)).iter_batches(
        batch_format="pyarrow"
    ):
        got.update(
            zip(b.column("scc_src").to_pylist(), b.column("scc_dst").to_pylist())
        )
    assert got == {("A", "C"), ("C", "D")}


def test_shuffle_shard_permutation_properties():
    import ray

    from pdf_entity_extraction_ray.ops.sample import (
        _shard_hash_u64,
        shuffle_shard,
    )

    ids = list(range(200))
    docs = pa.table({"doc_id": pa.array(ids, pa.int64())})
    rows = []
    for b in shuffle_shard(ray.data.from_arrow(docs), 4).iter_batches(
        batch_format="pyarrow"
    ):
        rows.extend(b.to_pylist())
    # every doc exactly once; shard matches the salted hash
    assert sorted(r["doc_id"] for r in rows) == ids
    for r in rows:
        assert r["shard"] == _shard_hash_u64(r["doc_id"]) % 4
    # positions within each shard are 0..k-1 and follow unsigned hash order
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["pos"])
        assert [r["pos"] for r in rs] == list(range(len(rs)))
        hashes = [_shard_hash_u64(r["doc_id"]) for r in rs]
        assert hashes == sorted(hashes)


def test_random_walks_deterministic_and_hash_correct():
    import ray

    from pdf_entity_extraction_ray.ops.graph_stats import (
        _neg_hash_u64,
        random_walks,
    )

    # diamond with a sink: A -> {B, C}, B -> D, C -> D (D is a sink)
    edges = [("A", "B"), ("A", "C"), ("B", "D"), ("C", "D")]
    tbl = pa.table(
        {
            "src_canonical": [a for a, _ in edges],
            "dst_canonical": [b for _, b in edges],
        }
    )
    rows = {}
    for b in random_walks(ray.data.from_arrow(tbl), length=4).iter_batches(
        batch_format="pyarrow"
    ):
        for r in b.to_pylist():
            rows[(r["start"], r["step"])] = r["node"]
    # step 0 = every node
    for n in "ABCD":
        assert rows[(n, 0)] == n
    # A's first hop follows the hash pick over sorted neighbors [B, C]
    pick = _neg_hash_u64("walk:A:1") % 2
    assert rows[("A", 1)] == ["B", "C"][pick]
    # whichever branch, step 2 from A lands on D; D is a sink -> no step 3
    assert rows[("A", 2)] == "D"
    assert ("A", 3) not in rows
    # walks from the sink stop immediately
    assert ("D", 1) not in rows
    # full determinism: second run identical
    rows2 = {}
    for b in random_walks(ray.data.from_arrow(tbl), length=4).iter_batches(
        batch_format="pyarrow"
    ):
        for r in b.to_pylist():
            rows2[(r["start"], r["step"])] = r["node"]
    assert rows == rows2
