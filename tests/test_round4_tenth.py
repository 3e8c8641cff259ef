"""Round-4 tenth-batch ops: gazetteer dictionary tagging, Katz walk
centrality, directed triad census, WARC source/sink roundtrip."""
import itertools
import random

import pyarrow as pa


# ---------------------------------------------------------------------------
# gazetteer dictionary tagging


def _gaz_run(rows, terms):
    import ray

    from pdf_entity_extraction_ray.ops.text import gazetteer_counts

    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([u for u, _ in rows], pa.string()),
                "text": pa.array([t for _, t in rows], pa.string()),
            }
        )
    )
    out = {}
    for b in gazetteer_counts(ds, terms).iter_batches(batch_format="pyarrow"):
        for u, t, n in zip(
            b.column("url").to_pylist(),
            b.column("term").to_pylist(),
            b.column("n").to_pylist(),
        ):
            out[(u, t)] = n
    return out


def test_gazetteer_matches_str_count():
    rows = [
        ("u1", "the Statute cites the Statute and the statute"),
        ("u2", "nothing relevant here"),
        ("u3", "aaa abab ab Ossandón kappa lambda kappa"),
        ("u4", ""),
    ]
    terms = ["Statute", "statute", "ab", "Ossandón", "kappa lambda"]
    out = _gaz_run(rows, terms)
    gold = {
        (u, t): txt.count(t)
        for u, txt in rows
        for t in terms
        if txt.count(t) > 0
    }
    assert out == gold
    # non-overlapping semantics: 'aaa abab ab' has 'ab' at abab(x2-ish)
    assert out[("u3", "ab")] == "aaa abab ab".count("ab") == 3


def test_gazetteer_rejects_bad_lexicons():
    import pytest

    with pytest.raises(ValueError):
        _gaz_run([("u", "x")], [])
    with pytest.raises(ValueError):
        _gaz_run([("u", "x")], ["a", "a"])


# ---------------------------------------------------------------------------
# Katz walk centrality


def _katz_run(edge_list, **kw):
    import ray

    from pdf_entity_extraction_ray.ops.graph_stats import katz_walks

    tbl = pa.table(
        {
            "src_canonical": pa.array([u for u, _ in edge_list], pa.string()),
            "dst_canonical": pa.array([v for _, v in edge_list], pa.string()),
        }
    )
    out = {}
    for b in katz_walks(ray.data.from_arrow(tbl), **kw).iter_batches(
        batch_format="pyarrow"
    ):
        out.update(zip(b.column("node").to_pylist(), b.column("katz").to_pylist()))
    return out


def _katz_gold(edge_list, rounds=4, beta=8):
    E = {(u, v) for u, v in edge_list if u != v}
    nodes = {x for e in E for x in e}
    w = {n: 1 for n in nodes}
    tot = {n: 0 for n in nodes}
    for k in range(1, rounds + 1):
        nw = {n: 0 for n in nodes}
        for s, o in E:
            nw[o] += w[s]
        w = nw
        for n in nodes:
            tot[n] += beta ** (rounds - k) * w[n]
    return tot


def test_katz_matches_reference_on_random_graphs():
    rng = random.Random(11)
    for trial in range(3):
        n = 20
        edges = sorted({(f"n{rng.randrange(n)}", f"n{rng.randrange(n)}") for _ in range(60)})
        # duplicates + self-loops must be ignored (simple-graph semantics)
        noisy = edges + edges[:7] + [("n1", "n1")]
        gold = _katz_gold(noisy)
        assert _katz_run(noisy) == gold
        assert _katz_run(noisy, num_partitions=4) == gold


def test_katz_sinks_score_zero_and_empty_graph():
    out = _katz_run([("a", "b")])
    assert out["b"] > 0 and out["a"] == 0  # a has no inbound walks
    assert _katz_run([("x", "x")]) == {}  # only a self-loop -> empty graph


def test_katz_overflow_raises():
    import pytest

    # a 40-clique: walk counts grow like 39^k and the guard must trip
    # before int64 wraps when scaled by beta^rounds
    nodes = [f"c{i}" for i in range(40)]
    edges = [(u, v) for u in nodes for v in nodes if u != v]
    with pytest.raises(OverflowError):
        _katz_run(edges, rounds=12, beta=64)


# ---------------------------------------------------------------------------
# directed triad (motif) census


def _motif_run(edge_list, **kw):
    import ray

    from pdf_entity_extraction_ray.ops.graph_stats import motif_census

    tbl = pa.table(
        {
            "src_canonical": pa.array([u for u, _ in edge_list], pa.string()),
            "dst_canonical": pa.array([v for _, v in edge_list], pa.string()),
        }
    )
    out = {}
    for b in motif_census(ray.data.from_arrow(tbl), **kw).iter_batches(
        batch_format="pyarrow"
    ):
        for d, rc, cy, n in zip(
            b.column("n_dir").to_pylist(),
            b.column("n_recip").to_pylist(),
            b.column("n_cycles").to_pylist(),
            b.column("n").to_pylist(),
        ):
            out[(d, rc, cy)] = n
    return out


def _motif_gold(edge_list):
    E = {(u, v) for u, v in edge_list if u != v}
    und = {frozenset(e) for e in E}
    nodes = sorted({x for e in E for x in e})

    def flags(x, y):
        lo, hi = sorted((x, y))
        return int((lo, hi) in E), int((hi, lo) in E)

    gold = {}
    for p, q, r in itertools.combinations(nodes, 3):
        if (
            frozenset((p, q)) in und
            and frozenset((p, r)) in und
            and frozenset((q, r)) in und
        ):
            f_pq, r_pq = flags(p, q)
            f_pr, r_pr = flags(p, r)
            f_qr, r_qr = flags(q, r)
            nd = f_pq + r_pq + f_pr + r_pr + f_qr + r_qr
            nr = f_pq * r_pq + f_pr * r_pr + f_qr * r_qr
            nc = f_pq * f_qr * r_pr + r_pq * r_qr * f_pr
            gold[(nd, nr, nc)] = gold.get((nd, nr, nc), 0) + 1
    return gold


def test_motifs_match_brute_force():
    rng = random.Random(23)
    for trial in range(3):
        n = 12
        E = set()
        while len(E) < 45:
            s, d = rng.sample([f"m{i}" for i in range(n)], 2)
            E.add((s, d))
        edges = sorted(E) + sorted(E)[:9]  # duplicates must not matter
        gold = _motif_gold(edges)
        assert _motif_run(edges) == gold
        assert _motif_run(edges, num_partitions=4) == gold


def test_motifs_known_shapes():
    # pure feed-forward triangle
    assert _motif_run([("a", "b"), ("a", "c"), ("b", "c")]) == {(3, 0, 0): 1}
    # pure cycle
    assert _motif_run([("a", "b"), ("b", "c"), ("c", "a")]) == {(3, 0, 1): 1}
    # fully reciprocal triangle: 6 edges, 3 reciprocal pairs, both cycles
    full = [(x, y) for x, y in itertools.permutations("abc", 2)]
    assert _motif_run(full) == {(6, 3, 2): 1}
    # triangle-free graphs (path, matching) -> empty census
    assert _motif_run([("a", "b"), ("b", "c")]) == {}
    assert _motif_run([("a", "b"), ("c", "d")]) == {}


# ---------------------------------------------------------------------------
# WARC roundtrip


def test_warc_roundtrip_bytes_exact(tmp_path):
    import ray

    from pdf_entity_extraction_ray.sources.warc import read_warc, write_warc

    # html with CRLFCRLF inside the payload — must survive because the
    # parser walks Content-Length, never scans for separators
    rows = pa.table(
        {
            "url": pa.array(
                ["https://a.test/1", "https://b.test/2?q=x", "https://c.test/ü"],
                pa.string(),
            ),
            "warc_ts": pa.array(
                [1_500_000_000_000_000, 1_600_000_000_123_456, 1_700_000_000_000_001],
                pa.int64(),
            ).cast(pa.timestamp("us")),
            "html": pa.array(
                [b"<html>\r\n\r\nbody</html>", b"", "unicode \xe9ü".encode()],
                pa.binary(),
            ),
        }
    )
    out = str(tmp_path / "warc")
    n = write_warc(ray.data.from_arrow(rows), out)
    assert n == 3
    back = (
        read_warc(out)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    orig = rows.to_pandas().sort_values("url").reset_index(drop=True)
    assert back[["url", "warc_ts", "html"]].equals(orig)


def test_warc_reader_requires_done_marker(tmp_path):
    import pytest

    from pdf_entity_extraction_ray.sources.warc import read_warc

    with pytest.raises(FileNotFoundError):
        read_warc(str(tmp_path))


def test_warc_write_is_idempotent(tmp_path):
    import os

    import ray

    from pdf_entity_extraction_ray.sources.warc import write_warc

    rows = pa.table(
        {
            "url": pa.array(["https://a.test/1"], pa.string()),
            "warc_ts": pa.array([1], pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array([b"x"], pa.binary()),
        }
    )
    out = str(tmp_path / "warc")
    write_warc(ray.data.from_arrow(rows), out)
    files = sorted(os.listdir(out))
    write_warc(ray.data.from_arrow(rows), out)
    assert sorted(os.listdir(out)) == files  # same content digest, no dupes
