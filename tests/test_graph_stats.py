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


class TestBspCheckpoint:
    """Per-round lineage for the BSP loops: worker-side Parquet value
    checkpoints, resume from the newest matching round, mismatched
    fingerprints ignored."""

    def _edges(self):
        import random

        rng = random.Random(5)
        return [(rng.randrange(60), rng.randrange(60)) for _ in range(240)]

    def test_coreness_checkpoint_resume(self, tmp_path):
        import json

        from pdf_entity_extraction_ray.ops.graph_stats import coreness
        from pdf_entity_extraction_ray.sources.corpus import kcore_reference

        edges = self._edges()
        pairs = {(min(u, v), max(u, v)) for u, v in edges if u != v}
        want = kcore_reference(pairs)
        ck = str(tmp_path / "core_ck")

        # interrupted run: only 2 rounds, checkpoint every round
        partial = {
            r["node"]: r["core"]
            for r in coreness(
                _core_ds(edges), max_iters=2, checkpoint_dir=ck, checkpoint_every=1
            ).take_all()
        }
        m = json.load(open(f"{ck}/manifest.json"))
        assert m["round"] == 2
        assert set(partial) == set(want)  # all nodes present even mid-run

        # resumed run: picks up at round 2 and converges to peeling
        got = {
            r["node"]: r["core"]
            for r in coreness(
                _core_ds(edges), checkpoint_dir=ck, checkpoint_every=5
            ).take_all()
        }
        assert got == want
        assert json.load(open(f"{ck}/manifest.json"))["round"] > 2

    def test_components_checkpoint_resume(self, tmp_path):
        import json

        from pdf_entity_extraction_ray.stages.linking import (
            components_from_int_edges,
        )

        # a long chain (diameter 30) forces many min-label rounds
        chain = [(i, i + 1) for i in range(30)] + [(100, 101)]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([u for u, _ in chain], pa.int64()),
                    "b": pa.array([v for _, v in chain], pa.int64()),
                }
            )
        )
        ck = str(tmp_path / "cc_ck")
        partial = components_from_int_edges(
            ds, max_iters=3, checkpoint_dir=ck, checkpoint_every=1
        ).take_all()
        assert json.load(open(f"{ck}/manifest.json"))["round"] == 3

        got = {
            r["node"]: r["label"]
            for r in components_from_int_edges(
                ds, max_iters=50, checkpoint_dir=ck
            ).take_all()
        }
        assert all(got[n] == 0 for n in range(31))
        assert got[100] == got[101] == 100

    def test_mismatched_fingerprint_ignored(self, tmp_path):
        from pdf_entity_extraction_ray.ops.graph_stats import coreness
        from pdf_entity_extraction_ray.sources.corpus import kcore_reference

        edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
        ck = str(tmp_path / "fp_ck")
        # checkpoint under a DIFFERENT explicit fingerprint
        coreness(
            _core_ds([(7, 8), (8, 9)]), checkpoint_dir=ck,
            checkpoint_fingerprint="other-data",
        ).take_all()
        got = {
            r["node"]: r["core"]
            for r in coreness(
                _core_ds(edges), checkpoint_dir=ck,
                checkpoint_fingerprint="this-data",
            ).take_all()
        }
        pairs = {(min(u, v), max(u, v)) for u, v in edges}
        assert got == kcore_reference(pairs)


def test_pagerank_checkpoint_resume_identical(tmp_path):
    """A PageRank rerun resuming from a mid-run checkpoint produces the
    SAME ranks as an uncheckpointed run (float arrays round-trip through
    Parquet exactly — list<double> is lossless)."""
    import json

    edge_list = [(1, 2), (1, 3), (2, 3), (3, 1), (3, 4)]
    edges = pa.table(
        {
            "src_id": pa.array([u for u, _ in edge_list], pa.int64()),
            "dst_id": pa.array([v for _, v in edge_list], pa.int64()),
        }
    )
    plain = {
        r["node"]: r["rank"]
        for r in pagerank(ray.data.from_arrow(edges), iterations=12).take_all()
    }
    ck = str(tmp_path / "pr_ck")
    # run only 6 of 12 rounds, checkpointing every 3
    partial_ds = pagerank(
        ray.data.from_arrow(edges), iterations=6, checkpoint_dir=ck,
        checkpoint_every=3, checkpoint_fingerprint="pr-test",
    )
    partial_ds.take_all()
    assert json.load(open(f"{ck}/manifest.json"))["round"] == 6
    resumed = {
        r["node"]: r["rank"]
        for r in pagerank(
            ray.data.from_arrow(edges), iterations=12, checkpoint_dir=ck,
            checkpoint_fingerprint="pr-test",
        ).take_all()
    }
    assert resumed == plain  # bit-identical


class TestCooccurrence:
    def test_hand_computed_counts(self):
        import pyarrow as pa
        import ray.data

        from pdf_entity_extraction_ray.ops.graph_stats import cooccurrence_edges

        # segments: (u1,0): {A,B,C}; (u1,1): {A,B}; (u2,0): {B}; B also
        # appears twice in (u1,0) (distinct-per-segment must dedup)
        mentions = pa.table(
            {
                "url": pa.array(["u1", "u1", "u1", "u1", "u1", "u1", "u2"]),
                "seg_id": pa.array([0, 0, 0, 0, 1, 1, 0], pa.int32()),
                "type": pa.array(["PERSON"] * 7),
                "surface": pa.array(["a1", "b1", "c1", "b2", "a1", "b1", "b1"]),
            }
        )
        sm = pa.table(
            {
                "type": pa.array(["PERSON"] * 4),
                "surface": pa.array(["a1", "b1", "b2", "c1"]),
                "node_id": pa.array([1, 2, 2, 3], pa.int64()),
                "canonical": pa.array(["A", "B", "B", "C"]),
            }
        )
        out = cooccurrence_edges(
            ray.data.from_arrow(mentions), ray.data.from_arrow(sm), shards=4
        )
        rows = {
            (r["a"], r["b"]): (r["n_ab"], r["n_a"], r["n_b"]) for r in out.take_all()
        }
        # n_A=2 (u1/0, u1/1), n_B=3, n_C=1
        assert rows == {
            ("A", "B"): (2, 2, 3),
            ("A", "C"): (1, 2, 1),
            ("B", "C"): (1, 3, 1),
        }


class TestEntityTimeline:
    def test_multi_day_counts(self):
        import datetime

        import pyarrow as pa
        import ray.data

        from pdf_entity_extraction_ray.ops.graph_stats import entity_timeline

        day0 = datetime.datetime(2021, 5, 1, 3, 0, 0)
        day1 = datetime.datetime(2021, 5, 2, 23, 59, 0)
        pages = pa.table(
            {
                "url": pa.array(["u1", "u2", "u3"]),
                "warc_ts": pa.array([day0, day0, day1], pa.timestamp("us")),
            }
        )
        mentions = pa.table(
            {
                "url": pa.array(["u1", "u1", "u2", "u3", "u3"]),
                "type": pa.array(["PERSON"] * 5),
                "surface": pa.array(["a1", "a2", "a1", "a1", "b1"]),
            }
        )
        sm = pa.table(
            {
                "type": pa.array(["PERSON"] * 3),
                "surface": pa.array(["a1", "a2", "b1"]),
                "node_id": pa.array([1, 1, 2], pa.int64()),
                "canonical": pa.array(["A", "A", "B"]),
            }
        )
        out = entity_timeline(
            ray.data.from_arrow(mentions),
            ray.data.from_arrow(sm),
            ray.data.from_arrow(pages),
        )
        d0 = int(day0.replace(tzinfo=datetime.timezone.utc).timestamp() // 86400)
        d1 = int(day1.replace(tzinfo=datetime.timezone.utc).timestamp() // 86400)
        rows = {(r["canonical"], r["day"]): r["n_mentions"] for r in out.take_all()}
        # A: 3 mentions on day0 (u1 x2 + u2), 1 on day1 (u3); B: 1 on day1
        assert rows == {("A", d0): 3, ("A", d1): 1, ("B", d1): 1}


class TestCheckpointContentDigest:
    """ADVICE r3: default fingerprints must identify the input by CONTENT,
    not count — a same-count rewired input sharing a checkpoint_dir must
    recompute, never resume stale values."""

    def test_coreness_rewired_same_count_recomputes(self, tmp_path):
        from pdf_entity_extraction_ray.ops.graph_stats import coreness
        from pdf_entity_extraction_ray.sources.corpus import kcore_reference

        ck = str(tmp_path / "digest_ck")
        # graph A: a path over {0..4} (every core = 1); converges + checkpoints
        a = [(0, 1), (1, 2), (2, 3), (3, 4)]
        coreness(_core_ds(a), checkpoint_dir=ck, checkpoint_every=1).take_all()
        # graph B: SAME nodes, SAME edge count, rewired to contain a
        # triangle.  Resuming A's all-1 values would pin 0/1/2 at 1
        # (the h-index update is monotone non-increasing) — wrong.
        b = [(0, 1), (1, 2), (0, 2), (3, 4)]
        got = {
            r["node"]: r["core"]
            for r in coreness(_core_ds(b), checkpoint_dir=ck).take_all()
        }
        assert got == kcore_reference({(min(u, v), max(u, v)) for u, v in b})
        assert got[0] == 2  # the value a stale resume could never reach

    def test_components_rewired_same_count_recomputes(self, tmp_path):
        from pdf_entity_extraction_ray.stages.linking import components_from_int_edges

        def ds_of(edges):
            return ray.data.from_arrow(
                pa.table(
                    {
                        "a": pa.array([u for u, _ in edges], pa.int64()),
                        "b": pa.array([v for _, v in edges], pa.int64()),
                    }
                )
            )

        ck = str(tmp_path / "cc_digest_ck")
        # A: 4-cycle, one component, every label 0
        components_from_int_edges(
            ds_of([(0, 1), (1, 2), (2, 3), (3, 0)]), checkpoint_dir=ck,
            checkpoint_every=1,
        ).take_all()
        # B: same node set {0,1,2,3}, same edge count, but 3 is now its
        # own component — a stale resume would keep it merged at label 0
        got = {
            r["node"]: r["label"]
            for r in components_from_int_edges(
                ds_of([(0, 1), (1, 2), (0, 2), (3, 3)]), checkpoint_dir=ck
            ).take_all()
        }
        assert got[3] == 3
        assert got[0] == got[1] == got[2] == 0

    def test_corrupt_part_file_discards_whole_checkpoint(self, tmp_path):
        """A part file unreadable where the load task runs discards the
        checkpoint transactionally (recompute, not a crash)."""
        import json

        from pdf_entity_extraction_ray.ops.graph_stats import coreness
        from pdf_entity_extraction_ray.sources.corpus import kcore_reference

        ck = str(tmp_path / "corrupt_ck")
        edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
        coreness(_core_ds(edges), checkpoint_dir=ck, checkpoint_every=1).take_all()
        paths = json.load(open(f"{ck}/manifest.json"))["paths"]
        with open(paths[0], "wb") as f:
            f.write(b"not a parquet file")
        got = {
            r["node"]: r["core"]
            for r in coreness(_core_ds(edges), checkpoint_dir=ck).take_all()
        }
        assert got == kcore_reference({(min(u, v), max(u, v)) for u, v in edges})


def test_triangles_empty_wedges_multi_partition():
    """ADVICE r3: a wedge-free graph (perfect matching) must short-circuit
    on the multi-partition path too, not crash Ray's hash join on an
    empty left input."""
    from pdf_entity_extraction_ray.ops.graph_stats import triangle_counts

    edges = pa.table(
        {
            "src_canonical": ["A", "C", "E"],
            "dst_canonical": ["B", "D", "F"],
        }
    )
    out = triangle_counts(ray.data.from_arrow(edges), num_partitions=4)
    assert out.count() == 0


def test_connected_components_canonical_labels():
    """Two components + a self-loop-only node; component = min canonical,
    independent of the (arbitrary) int id ordering."""
    from pdf_entity_extraction_ray.ops.graph_stats import connected_components

    edges = pa.table(
        {
            # ids deliberately ordered AGAINST the canonical order so a
            # min-int-label shortcut would produce the wrong representative
            "src_id": pa.array([9, 5, 3, 7], pa.int64()),
            "dst_id": pa.array([5, 3, 3, 1], pa.int64()),
            "src_canonical": ["Alpha", "Beta", "Gamma", "Delta"],
            "dst_canonical": ["Beta", "Gamma", "Gamma", "Zeta"],
        }
    )
    out = {}
    for b in connected_components(ray.data.from_arrow(edges)).iter_batches(
        batch_format="pyarrow"
    ):
        out.update(
            zip(b.column("canonical").to_pylist(), b.column("component").to_pylist())
        )
    assert out == {
        "Alpha": "Alpha",
        "Beta": "Alpha",
        "Gamma": "Alpha",
        "Delta": "Delta",
        "Zeta": "Delta",
    }


def _brute_common_neighbors(edge_list, min_common=1, max_degree=None):
    import itertools
    from collections import defaultdict

    und = {(min(u, v), max(u, v)) for u, v in edge_list if u != v}
    nbr = defaultdict(set)
    for a, b in und:
        nbr[a].add(b)
        nbr[b].add(a)
    rows = {}
    for apex, ns in nbr.items():
        if max_degree is not None and len(ns) > max_degree:
            continue
        for a, b in itertools.combinations(sorted(ns), 2):
            rows[(a, b)] = rows.get((a, b), 0) + 1
    out = {}
    for (a, b), c in rows.items():
        if c < min_common:
            continue
        da, db = len(nbr[a]), len(nbr[b])
        out[(a, b)] = (c, da, db, (1_000_000 * c) // (da + db - c),
                       1 if (a, b) in und else 0)
    return out


def _cn_rows(ds):
    return {
        (r["a"], r["b"]): (r["common"], r["deg_a"], r["deg_b"],
                           r["jaccard_ppm"], r["is_edge"])
        for r in ds.take_all()
    }


def test_common_neighbors_random_matches_bruteforce():
    """Random multigraph with self-loops and reverse duplicates: wedge
    pair counting == brute-force neighborhood intersection, including the
    exact integer jaccard_ppm and the no-join is_edge marker."""
    import random

    from pdf_entity_extraction_ray.ops.graph_stats import common_neighbors

    rng = random.Random(11)
    nodes = [f"n{i:02d}" for i in range(25)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(90)]
    got = _cn_rows(common_neighbors(_tri_ds(edges)))
    assert got == _brute_common_neighbors(edges)


def test_common_neighbors_min_common_and_max_degree():
    """min_common filters pairs; max_degree skips super-node APEXES (their
    wedges vanish) while the skipped node keeps its own pair rows and its
    true degree wherever it appears as an endpoint."""
    from pdf_entity_extraction_ray.ops.graph_stats import common_neighbors

    hub_edges = [("hub", f"rim{i:02d}") for i in range(12)]
    rim = [("rim00", "rim01"), ("rim00", "rim02"), ("rim01", "rim02")]
    edges = hub_edges + rim
    got = _cn_rows(common_neighbors(_tri_ds(edges), max_degree=5))
    assert got == _brute_common_neighbors(edges, max_degree=5)
    # rim00/rim01 share hub + rim02 without the hub apex contributing
    assert got[("rim00", "rim01")][0] == 1  # only rim02's apex survives
    got2 = _cn_rows(common_neighbors(_tri_ds(edges), min_common=2))
    ref2 = _brute_common_neighbors(edges, min_common=2)
    assert got2 == ref2 and all(v[0] >= 2 for v in got2.values())


def test_common_neighbors_wedge_free_graph():
    """A perfect matching has no wedges at all -> empty result, no crash
    (the empty-join guard path)."""
    from pdf_entity_extraction_ray.ops.graph_stats import common_neighbors

    edges = [(f"a{i}", f"b{i}") for i in range(8)]
    assert common_neighbors(_tri_ds(edges)).count() == 0


class TestLatestAssertions:
    """Temporal-KG snapshot: newest crawled object per (subj, pred)."""

    @staticmethod
    def _run(tri_rows, page_rows):
        from pdf_entity_extraction_ray.ops.graph_stats import latest_assertions

        tri = pa.table(
            {
                "subj_canonical": pa.array([r[0] for r in tri_rows]),
                "pred": pa.array([r[1] for r in tri_rows]),
                "obj_canonical": pa.array([r[2] for r in tri_rows]),
                "url": pa.array([r[3] for r in tri_rows]),
                "seg_id": pa.array([r[4] for r in tri_rows], pa.int64()),
            }
        )
        pages = pa.table(
            {
                "url": pa.array([r[0] for r in page_rows]),
                "warc_ts": pa.array([r[1] for r in page_rows], pa.timestamp("us")),
            }
        )
        out = latest_assertions(
            ray.data.from_arrow(tri), ray.data.from_arrow(pages)
        )
        rows = []
        for b in out.iter_batches(batch_format="pyarrow"):
            if b.num_rows:
                rows.extend(b.to_pylist())
        return {
            (r["subj_canonical"], r["pred"]): (r["obj_canonical"], r["asserted_ts_us"], r["url"])
            for r in rows
        }

    def test_newest_crawl_wins(self):
        got = self._run(
            tri_rows=[
                ("Acme", "located_in", "Lima", "u1", 0),
                ("Acme", "located_in", "Quito", "u2", 0),  # newer crawl
                ("Bob", "works_for", "Acme", "u1", 1),
            ],
            page_rows=[("u1", 1_000_000), ("u2", 2_000_000)],
        )
        assert got[("Acme", "located_in")] == ("Quito", 2_000_000, "u2")
        assert got[("Bob", "works_for")] == ("Acme", 1_000_000, "u1")

    def test_tie_breaks_deterministic_and_split_invariant(self):
        tri = [
            ("S", "p", "B", "u2", 0),  # same ts: url u1 < u2 wins
            ("S", "p", "A", "u1", 5),
            ("S", "p", "Z", "u1", 1),  # same ts+url: seg 1 < 5? no — seg asc
        ]
        pages = [("u1", 7), ("u2", 7)]
        got = self._run(tri, pages)
        # u1 wins over u2; within u1, seg_id 1 < 5 -> obj Z
        assert got[("S", "p")] == ("Z", 7, "u1")

    def test_unjoined_triples_drop(self):
        got = self._run(
            tri_rows=[("X", "p", "Y", "missing", 0), ("A", "p", "B", "u1", 0)],
            page_rows=[("u1", 1)],
        )
        assert set(got) == {("A", "p")}


class TestBfsDepths:
    """Frontier-only BSP multi-source BFS (ops/graph_stats.bfs_depths)."""

    @staticmethod
    def _edges(pairs):
        names = sorted({x for p in pairs for x in p})
        ids = {c: i + 100 for i, c in enumerate(names)}
        return ray.data.from_arrow(
            pa.table(
                {
                    "src_id": pa.array([ids[a] for a, _ in pairs], pa.int64()),
                    "dst_id": pa.array([ids[b] for _, b in pairs], pa.int64()),
                    "src_canonical": pa.array([a for a, _ in pairs], pa.string()),
                    "dst_canonical": pa.array([b for _, b in pairs], pa.string()),
                }
            )
        )

    @staticmethod
    def _depths(ds):
        from pdf_entity_extraction_ray.ops.graph_stats import bfs_depths
        return bfs_depths, ds

    def test_chain_and_unreachable(self):
        from pdf_entity_extraction_ray.ops.graph_stats import bfs_depths

        ds = self._edges([("A", "B"), ("B", "C"), ("C", "D"), ("X", "Y")])
        out = {r["canonical"]: r["depth"] for r in bfs_depths(ds, ["A"]).take_all()}
        assert out == {"A": 0, "B": 1, "C": 2, "D": 3}  # X, Y unreached

    def test_max_depth_cuts_and_multi_source(self):
        from pdf_entity_extraction_ray.ops.graph_stats import bfs_depths

        chain = [(f"n{i}", f"n{i+1}") for i in range(8)]
        ds = self._edges(chain)
        out = {r["canonical"]: r["depth"]
               for r in bfs_depths(ds, ["n0"], max_depth=3).take_all()}
        assert out == {"n0": 0, "n1": 1, "n2": 2, "n3": 3}
        # two seeds meet in the middle; undirected edges walk both ways
        out2 = {r["canonical"]: r["depth"]
                for r in bfs_depths(ds, ["n0", "n8"], max_depth=4).take_all()}
        assert out2["n4"] == 4 and out2["n8"] == 0 and out2["n5"] == 3

    def test_cycle_and_partition_invariance(self):
        from pdf_entity_extraction_ray.ops.graph_stats import bfs_depths

        cyc = [(f"c{i}", f"c{(i+1) % 6}") for i in range(6)]
        ds = self._edges(cyc)
        a = {r["canonical"]: r["depth"]
             for r in bfs_depths(ds, ["c0"], num_partitions=1).take_all()}
        b = {r["canonical"]: r["depth"]
             for r in bfs_depths(ds.repartition(5), ["c0"], num_partitions=7).take_all()}
        assert a == b == {"c0": 0, "c1": 1, "c5": 1, "c2": 2, "c4": 2, "c3": 3}


def test_components_single_partition_explicit():
    """num_partitions=1 ships un-split shard lists (Ray num_returns=1
    does not unwrap); the BSP loop must normalize and still converge."""
    from pdf_entity_extraction_ray.stages.linking import components_from_int_edges

    edges = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([1, 2, 10], pa.int64()),
                "b": pa.array([2, 3, 11], pa.int64()),
            }
        )
    )
    out = {r["node"]: r["label"]
           for r in components_from_int_edges(edges, num_partitions=1).take_all()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_bfs_unknown_seed_returns_empty():
    from pdf_entity_extraction_ray.ops.graph_stats import bfs_depths

    edges = TestBfsDepths._edges([("A", "B")])
    out = bfs_depths(edges, ["NOT_IN_GRAPH"]).take_all()
    assert out == []


class TestPathCounts:
    """Predicate-composition path census (ops/graph_stats.path_counts)."""

    @staticmethod
    def _edges(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "src_canonical": pa.array([r[0] for r in rows], pa.string()),
                    "pred": pa.array([r[1] for r in rows], pa.string()),
                    "dst_canonical": pa.array([r[2] for r in rows], pa.string()),
                }
            )
        )

    def test_matches_selfjoin_bruteforce_through_hub(self):
        import collections

        from pdf_entity_extraction_ray.ops.graph_stats import path_counts

        # hub m: many in-edges x many out-edges (the skew case)
        rows = [(f"s{i}", "works_for", "HUB") for i in range(7)]
        rows += [("HUB", "located_in", f"c{j}") for j in range(5)]
        rows += [("s0", "cites", "s1"), ("s1", "cites", "s2"), ("x", "p", "y")]
        out = {(r["pred_a"], r["pred_b"]): r["n_paths"]
               for r in path_counts(self._edges(rows)).take_all()}
        want = collections.Counter()
        for s1, p1, m1 in rows:
            for s2, p2, m2 in rows:
                if m1 == s2:
                    want[(p1, p2)] += 1
        assert out == dict(want)
        assert out[("works_for", "located_in")] == 35  # 7 x 5 through HUB

    def test_empty_graph(self):
        from pdf_entity_extraction_ray.ops.graph_stats import path_counts

        assert path_counts(self._edges([("a", "p", "b")])).take_all() == []


def test_pagerank_and_coreness_single_partition_explicit():
    """Same P=1 normalization as components/bfs: pagerank's mixed
    node+edge shards and coreness's h-index messages must survive the
    un-split 1-element lists num_returns=1 ships."""
    from pdf_entity_extraction_ray.ops.graph_stats import coreness, pagerank

    edges = pa.table(
        {
            "src_id": pa.array([1, 2, 3, 1], pa.int64()),
            "dst_id": pa.array([2, 3, 1, 3], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(edges)
    pr1 = {r["node"]: r["rank"] for r in pagerank(ds, num_partitions=1).take_all()}
    pr4 = {r["node"]: r["rank"] for r in pagerank(ds, num_partitions=4).take_all()}
    assert set(pr1) == {1, 2, 3}
    for n in pr1:
        assert abs(pr1[n] - pr4[n]) < 1e-12
    c1 = {r["node"]: r["core"] for r in coreness(ds, num_partitions=1).take_all()}
    c4 = {r["node"]: r["core"] for r in coreness(ds, num_partitions=4).take_all()}
    assert c1 == c4 and set(c1) == {1, 2, 3}


def test_predicate_signatures_census():
    from pdf_entity_extraction_ray.ops.graph_stats import predicate_signatures

    tri = pa.table(
        {
            "pred": pa.array(["works_for", "works_for", "located_in", "works_for"]),
            "subj_type": pa.array(["PERSON", "PERSON", "ORG", "ORG"]),
            "obj_type": pa.array(["ORG", "ORG", "GPE", "ORG"]),
        }
    )
    ds = ray.data.from_arrow(tri).repartition(3)
    got = {(r["pred"], r["subj_type"], r["obj_type"]): r["n"]
           for r in predicate_signatures(ds).take_all()}
    assert got == {
        ("works_for", "PERSON", "ORG"): 2,
        ("located_in", "ORG", "GPE"): 1,
        ("works_for", "ORG", "ORG"): 1,
    }


def test_pagerank_empty_edges_short_circuits():
    from pdf_entity_extraction_ray.ops.graph_stats import pagerank

    empty = ray.data.from_arrow(
        pa.table(
            {"src_id": pa.array([], pa.int64()), "dst_id": pa.array([], pa.int64())}
        )
    )
    assert pagerank(empty).take_all() == []


class TestNegativeSamples:
    def _ds(self, rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "src_canonical": pa.array([r[0] for r in rows], pa.string()),
                    "pred": pa.array([r[1] for r in rows], pa.string()),
                    "dst_canonical": pa.array([r[2] for r in rows], pa.string()),
                }
            )
        )

    def test_basic_properties(self):
        from pdf_entity_extraction_ray.ops.graph_stats import negative_samples

        rows = [
            ("a", "works_for", "org1"),
            ("b", "works_for", "org2"),
            ("c", "works_for", "org3"),
            ("a", "located_in", "gpe1"),
            ("b", "located_in", "gpe2"),
        ]
        out = negative_samples(self._ds(rows), pool_size=64).take_all()
        assert len(out) == len(rows)
        works_pool = {"org1", "org2", "org3"}
        gpe_pool = {"gpe1", "gpe2"}
        for r in out:
            assert r["neg_obj"] != r["obj_canonical"]
            # range-respecting: negative comes from the SAME predicate's
            # observed objects
            if r["pred"] == "works_for":
                assert r["neg_obj"] in works_pool
            else:
                assert r["neg_obj"] in gpe_pool

    def test_single_object_pool_dropped(self):
        from pdf_entity_extraction_ray.ops.graph_stats import negative_samples

        rows = [("a", "only_pred", "solo"), ("b", "only_pred", "solo")]
        assert negative_samples(self._ds(rows)).take_all() == []

    def test_deterministic_across_partitionings(self):
        from pdf_entity_extraction_ray.ops.graph_stats import negative_samples

        rows = [(f"s{i}", f"p{i % 3}", f"o{i % 17}") for i in range(60)]
        a = sorted(map(tuple, (
            (r["subj_canonical"], r["pred"], r["obj_canonical"], r["neg_obj"])
            for r in negative_samples(self._ds(rows)).take_all()
        )))
        b = sorted(map(tuple, (
            (r["subj_canonical"], r["pred"], r["obj_canonical"], r["neg_obj"])
            for r in negative_samples(self._ds(rows).repartition(7)).take_all()
        )))
        assert a == b and len(a) == 60

    def test_pool_size_bounds_candidates(self):
        from pdf_entity_extraction_ray.ops.graph_stats import negative_samples

        # 100 distinct objects, pool of 4 -> every negative is one of the
        # 4 smallest-hash objects
        import hashlib

        def h(o):
            return int.from_bytes(
                hashlib.md5(f"pool:{o}".encode()).digest()[:8], "little"
            )

        objs = [f"obj{i}" for i in range(100)]
        pool = sorted(objs, key=lambda o: (h(o), o))[:4]
        rows = [(f"s{i}", "p", objs[i]) for i in range(100)]
        out = negative_samples(self._ds(rows).repartition(5), pool_size=4).take_all()
        assert out and all(r["neg_obj"] in pool for r in out)

    def test_empty_edges(self):
        from pdf_entity_extraction_ray.ops.graph_stats import negative_samples

        assert negative_samples(self._ds([])).take_all() == []


class TestEntitySalience:
    def _tables(self):
        mentions = pa.table(
            {
                "url": pa.array(["u1", "u1", "u1", "u2", "u2"], pa.string()),
                "seg_id": pa.array([2, 3, 2, 2, 4], pa.int32()),
                "type": pa.array(["ORG", "ORG", "PERSON", "ORG", "DATE"], pa.string()),
                "surface": pa.array(["Acme", "Acme Corp", "Bob", "Acme", "2020"], pa.string()),
                "page_start": pa.array([40, 90, 10, 7, 3], pa.int32()),
            }
        )
        sm = pa.table(
            {
                "type": pa.array(["ORG", "ORG", "PERSON"], pa.string()),
                "surface": pa.array(["Acme", "Acme Corp", "Bob"], pa.string()),
                "node_id": pa.array([1, 1, 2], pa.int64()),
                "canonical": pa.array(["Acme Corp", "Acme Corp", "Bob"], pa.string()),
            }
        )
        return ray.data.from_arrow(mentions), ray.data.from_arrow(sm)

    def test_features(self):
        from pdf_entity_extraction_ray.ops.graph_stats import entity_salience

        m, sm = self._tables()
        rows = {
            (r["url"], r["canonical"], r["type"]): (
                r["n_mentions"], r["first_pos"], r["first_seg"]
            )
            for r in entity_salience(m, sm).take_all()
        }
        # two Acme-alias mentions on u1 merge into one canonical row;
        # the DATE mention (not a linked type) is excluded
        assert rows == {
            ("u1", "Acme Corp", "ORG"): (2, 40, 2),
            ("u1", "Bob", "PERSON"): (1, 10, 2),
            ("u2", "Acme Corp", "ORG"): (1, 7, 2),
        }

    def test_partition_invariance(self):
        from pdf_entity_extraction_ray.ops.graph_stats import entity_salience

        m, sm = self._tables()
        a = sorted(map(repr, entity_salience(m, sm).take_all()))
        b = sorted(map(repr, entity_salience(m.repartition(4), sm).take_all()))
        assert a == b


class TestRuleSupport:
    def _ds(self, rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "src_canonical": pa.array([r[0] for r in rows], pa.string()),
                    "pred": pa.array([r[1] for r in rows], pa.string()),
                }
            )
        )

    def test_counts(self):
        from pdf_entity_extraction_ray.ops.graph_stats import rule_support

        # s1: works_for + located_in; s2: works_for + located_in;
        # s3: works_for only -> works_for=>located_in support 2 body 3,
        # located_in=>works_for support 2 body 2
        rows = [
            ("s1", "works_for"), ("s1", "located_in"),
            ("s2", "works_for"), ("s2", "located_in"),
            ("s3", "works_for"),
        ]
        got = {
            (r["pred_body"], r["pred_head"]): (r["support"], r["n_body"])
            for r in rule_support(self._ds(rows)).take_all()
        }
        assert got == {
            ("works_for", "located_in"): (2, 3),
            ("located_in", "works_for"): (2, 2),
        }

    def test_duplicate_edges_counted_once(self):
        from pdf_entity_extraction_ray.ops.graph_stats import rule_support

        # same (s, pred) repeated (multiple objects) must not inflate
        rows = [("s1", "p1"), ("s1", "p1"), ("s1", "p2"), ("s2", "p1")]
        got = {
            (r["pred_body"], r["pred_head"]): (r["support"], r["n_body"])
            for r in rule_support(self._ds(rows).repartition(3)).take_all()
        }
        assert got == {("p1", "p2"): (1, 2), ("p2", "p1"): (1, 1)}

    def test_no_pairs_empty(self):
        from pdf_entity_extraction_ray.ops.graph_stats import rule_support

        rows = [("s1", "p1"), ("s2", "p2")]
        assert rule_support(self._ds(rows)).take_all() == []

    def test_partition_invariance(self):
        from pdf_entity_extraction_ray.ops.graph_stats import rule_support

        rows = [(f"s{i % 10}", f"p{i % 4}") for i in range(80)]
        a = sorted(map(repr, rule_support(self._ds(rows)).take_all()))
        b = sorted(map(repr, rule_support(self._ds(rows).repartition(7)).take_all()))
        assert a == b


class TestPersonalizedPagerank:
    def _edges(self, pairs):
        return ray.data.from_arrow(
            pa.table(
                {
                    "src_id": pa.array([p[0] for p in pairs], pa.int64()),
                    "dst_id": pa.array([p[1] for p in pairs], pa.int64()),
                }
            )
        )

    def test_matches_reference(self):
        from pdf_entity_extraction_ray.ops.graph_stats import pagerank, ppr_reference

        rng = np.random.RandomState(5)
        pairs = list({(int(a), int(b)) for a, b in rng.randint(0, 40, (150, 2)) if a != b})
        seeds = [0, 1, 2]
        got = {
            r["node"]: r["rank"]
            for r in pagerank(self._edges(pairs), iterations=15, seeds=seeds,
                              num_partitions=3).take_all()
        }
        nodes, ranks = ppr_reference(
            [p[0] for p in pairs], [p[1] for p in pairs], seeds, 15
        )
        assert set(got) == set(nodes.tolist())
        for n, r in zip(nodes.tolist(), ranks.tolist()):
            assert abs(got[n] - r) < 1e-9

    def test_restart_mass_concentrates_on_seeds(self):
        from pdf_entity_extraction_ray.ops.graph_stats import pagerank

        # chain 0->1->2->3; seed {0}: rank decays along the chain
        ranks = {
            r["node"]: r["rank"]
            for r in pagerank(
                self._edges([(0, 1), (1, 2), (2, 3)]), iterations=30, seeds=[0]
            ).take_all()
        }
        assert ranks[0] > ranks[1] > ranks[2] > ranks[3] > 0

    def test_unreachable_nodes_rank_zero(self):
        from pdf_entity_extraction_ray.ops.graph_stats import pagerank

        # two disconnected edges; seed on one side only
        ranks = {
            r["node"]: r["rank"]
            for r in pagerank(
                self._edges([(0, 1), (10, 11)]), iterations=10, seeds=[0]
            ).take_all()
        }
        assert ranks[10] == 0.0 and ranks[11] == 0.0
        assert ranks[0] > 0 and ranks[1] > 0

    def test_probability_mass_conserved(self):
        from pdf_entity_extraction_ray.ops.graph_stats import pagerank

        ranks = [
            r["rank"]
            for r in pagerank(
                self._edges([(0, 1), (1, 0), (1, 2)]), iterations=25, seeds=[0, 2]
            ).take_all()
        ]
        assert abs(sum(ranks) - 1.0) < 1e-9

    def test_empty_seed_set_raises(self):
        import pytest

        from pdf_entity_extraction_ray.ops.graph_stats import pagerank

        with pytest.raises(ValueError):
            pagerank(self._edges([(0, 1)]), seeds=[])

    def test_uniform_path_unchanged_by_seeds_param(self):
        from pdf_entity_extraction_ray.ops.graph_stats import pagerank

        pairs = [(0, 1), (1, 2), (2, 0), (2, 3)]
        a = sorted(
            (r["node"], r["rank"]) for r in pagerank(self._edges(pairs)).take_all()
        )
        b = sorted(
            (r["node"], r["rank"])
            for r in pagerank(self._edges(pairs), seeds=None).take_all()
        )
        assert a == b


def test_negative_pool_global_bottom_k_many_blocks():
    """Regression: the pool merge must see the combined partials as ONE
    batch — chunked merging would yield >pool_size pools with duplicate
    objects and partitioning-dependent negatives."""
    import hashlib

    from pdf_entity_extraction_ray.ops.graph_stats import negative_samples

    def h(o):
        return int.from_bytes(hashlib.md5(f"pool:{o}".encode()).digest()[:8], "little")

    objs = [f"obj{i:04d}" for i in range(1500)]
    pool = sorted(objs, key=lambda o: (h(o), o))[:64]
    rows = pa.table(
        {
            "src_canonical": pa.array([f"s{i}" for i in range(1500)], pa.string()),
            "pred": pa.array(["p"] * 1500, pa.string()),
            "dst_canonical": pa.array(objs, pa.string()),
        }
    )
    # 30 blocks * 64 partial rows = 1920 > the 1024 default batch size
    ds = ray.data.from_arrow(rows).repartition(30)
    out = negative_samples(ds, pool_size=64).take_all()
    assert len(out) == 1500
    assert all(r["neg_obj"] in pool for r in out)
    # partitioning must not change a single negative
    out2 = negative_samples(ray.data.from_arrow(rows), pool_size=64).take_all()
    a = sorted((r["subj_canonical"], r["neg_obj"]) for r in out)
    b = sorted((r["subj_canonical"], r["neg_obj"]) for r in out2)
    assert a == b


def test_clustering_coefficients_k4_pendant():
    """K4 + pendant: every K4 node has deg-3 wedges (3) and 3 triangles
    EXCEPT d, whose pendant edge lifts its degree to 4 (6 wedges); the
    pendant leaf itself (deg 1) is excluded."""
    from pdf_entity_extraction_ray.ops.graph_stats import clustering_coefficients

    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("d", "e"), ("b", "a")]
    got = {
        r["canonical"]: (r["triangles"], r["wedges"])
        for r in clustering_coefficients(_tri_ds(edges)).take_all()
    }
    assert got == {"a": (3, 3), "b": (3, 3), "c": (3, 3), "d": (3, 6)}


def test_clustering_coefficients_triangle_free_star():
    """A star has zero triangles but the hub still reports its wedges —
    the deg>=2 nodes with 0 closed wedges must be PRESENT (coefficient
    0), not absent."""
    from pdf_entity_extraction_ray.ops.graph_stats import clustering_coefficients

    edges = [("hub", f"rim{i}") for i in range(5)]
    got = {
        r["canonical"]: (r["triangles"], r["wedges"])
        for r in clustering_coefficients(_tri_ds(edges)).take_all()
    }
    assert got == {"hub": (0, 10)}


def test_reciprocal_edges_directions_and_preds():
    """Reciprocal detection over distinct (src, pred, dst) rows: a<->b
    reciprocal with 2 preds forward / 1 back; a->c one-way (absent);
    self-loops ignored."""
    from pdf_entity_extraction_ray.ops.graph_stats import reciprocal_edges

    edges = pa.table(
        {
            "src_canonical": ["a", "a", "b", "a", "x", "b"],
            "pred": ["knows", "likes", "knows", "knows", "is", "cites"],
            "dst_canonical": ["b", "b", "a", "c", "x", "a"],
        }
    )
    got = {
        (r["a"], r["b"]): (r["n_ab"], r["n_ba"])
        for r in reciprocal_edges(ray.data.from_arrow(edges)).take_all()
    }
    assert got == {("a", "b"): (2, 2)}
