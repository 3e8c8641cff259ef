"""Unit tests for the round-4 fifth-batch ops: per-entity profile cards
(ops/graph_stats.entity_cards), the dangling-reference audit
(ops/graph_stats.dangling_objects), degree-assortativity moments
(ops/graph_stats.assortativity_moments) and the global length-percentile
filter (ops/text.length_percentile_filter)."""

import datetime

import pyarrow as pa
import ray.data


def _collect(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    if batches:
        return pa.concat_tables(batches)
    schema = ds.schema()
    if schema is None:  # fully-empty dataset: no rows, no known schema
        return pa.table({})
    return getattr(schema, "base_schema", schema).empty_table()


def _ts(minute: int):
    return datetime.datetime(2024, 1, 1, 0, minute, tzinfo=datetime.timezone.utc)


def _ts_us(minute: int) -> int:
    return int(_ts(minute).timestamp() * 1_000_000)


# ------------------------------------------------------------ entity cards


class TestEntityCards:
    def _run(self, tri_rows, page_rows):
        from pdf_entity_extraction_ray.ops.graph_stats import entity_cards

        tri = pa.table(
            {
                "subj_canonical": pa.array([r[0] for r in tri_rows], pa.string()),
                "pred": pa.array([r[1] for r in tri_rows], pa.string()),
                "url": pa.array([r[2] for r in tri_rows], pa.string()),
            }
        )
        pages = pa.table(
            {
                "url": pa.array([r[0] for r in page_rows], pa.string()),
                "warc_ts": pa.array(
                    [_ts(r[1]) for r in page_rows], pa.timestamp("us", tz="UTC")
                ),
            }
        )
        out = _collect(
            entity_cards(ray.data.from_arrow(tri), ray.data.from_arrow(pages))
        )
        return {r["subj_canonical"]: r for r in out.to_pylist()}

    def test_counts_timestamps_and_modal_pred(self):
        tri = [
            ("Ada", "works_at", "u1"),
            ("Ada", "works_at", "u2"),
            ("Ada", "born_in", "u2"),
            ("Bob", "works_at", "u3"),
        ]
        pages = [("u1", 1), ("u2", 5), ("u3", 9)]
        cards = self._run(tri, pages)
        ada = cards["Ada"]
        assert ada["n_assertions"] == 3
        assert ada["n_preds"] == 2
        assert ada["first_seen_us"] == _ts_us(1)
        assert ada["last_seen_us"] == _ts_us(5)
        assert ada["top_pred"] == "works_at"
        bob = cards["Bob"]
        assert bob["n_assertions"] == 1 and bob["n_preds"] == 1
        assert bob["first_seen_us"] == bob["last_seen_us"] == _ts_us(9)

    def test_modal_pred_tie_breaks_lexicographically(self):
        tri = [("Ada", "z_pred", "u1"), ("Ada", "a_pred", "u2")]
        cards = self._run(tri, [("u1", 1), ("u2", 2)])
        assert cards["Ada"]["top_pred"] == "a_pred"

    def test_unjoined_urls_drop_out(self):
        # assertion on a url missing from pages contributes nothing
        tri = [("Ada", "p", "u1"), ("Ada", "p", "u_missing")]
        cards = self._run(tri, [("u1", 4)])
        assert cards["Ada"]["n_assertions"] == 1


# ------------------------------------------------------- dangling objects


class TestDanglingObjects:
    def _run(self, rows):
        from pdf_entity_extraction_ray.ops.graph_stats import dangling_objects

        tri = pa.table(
            {
                "subj_canonical": pa.array([r[0] for r in rows], pa.string()),
                "obj_canonical": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        out = _collect(dangling_objects(ray.data.from_arrow(tri)))
        return {r["canonical"]: r["n_refs"] for r in out.to_pylist()}

    def test_objects_that_are_subjects_are_not_dangling(self):
        refs = self._run(
            [("a", "b"), ("b", "c"), ("a", "c"), ("b", "a")]
        )
        # a and b both appear as subjects; only c is dangling, 2 refs
        assert refs == {"c": 2}

    def test_no_dangling_yields_empty(self):
        assert self._run([("a", "b"), ("b", "a")]) == {}

    def test_empty_triples_short_circuit(self):
        assert self._run([]) == {}


# -------------------------------------------------- assortativity moments


class TestAssortativityMoments:
    def _run(self, edges):
        from pdf_entity_extraction_ray.ops.graph_stats import (
            assortativity_moments,
        )

        t = pa.table(
            {
                "src_canonical": pa.array([e[0] for e in edges], pa.string()),
                "dst_canonical": pa.array([e[1] for e in edges], pa.string()),
            }
        )
        rows = _collect(assortativity_moments(ray.data.from_arrow(t))).to_pylist()
        assert len(rows) == 1
        return rows[0]

    def test_path_graph_moments(self):
        # path a-b-c: degrees a=1 b=2 c=1; edges (a,b) and (b,c)
        m = self._run([("a", "b"), ("b", "c")])
        assert m["m_edges"] == 2
        assert m["s1"] == (1 + 2) + (2 + 1)
        assert m["s2"] == (1 + 4) + (4 + 1)
        assert m["s3"] == 2 + 2

    def test_duplicate_reverse_and_self_edges_collapse(self):
        # duplicates, reverse duplicates and self loops reduce to the path
        m = self._run(
            [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("c", "c")]
        )
        assert m["m_edges"] == 2 and m["s3"] == 4

    def test_star_graph_is_disassortative_in_moments(self):
        # star center x with 3 leaves: each edge has (3, 1)
        m = self._run([("x", "a"), ("x", "b"), ("x", "c")])
        assert m["m_edges"] == 3
        assert m["s1"] == 3 * 4
        assert m["s2"] == 3 * 10
        assert m["s3"] == 3 * 3

    def test_empty_graph_single_zero_row(self):
        m = self._run([])
        assert m == {"m_edges": 0, "s1": 0, "s2": 0, "s3": 0}


# ------------------------------------------------- length percentile filter


class TestLengthPercentileFilter:
    def _run(self, texts, lo=5, hi=95):
        from pdf_entity_extraction_ray.ops.text import length_percentile_filter

        docs = pa.table(
            {
                "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        out = _collect(
            length_percentile_filter(ray.data.from_arrow(docs), lo, hi)
        )
        return {r["doc_id"]: r for r in out.to_pylist()}

    def test_tails_are_cut(self):
        # 20 docs with lengths 1..20; p5 -> lo_len=1 (cum 1*100 >= 5*20),
        # p95 -> hi_len=19 (cum 19*100 >= 95*20): only length 20 drops
        texts = ["w " * n for n in range(1, 21)]
        rows = self._run(texts)
        assert rows[20]["keep"] is False
        assert all(rows[i]["keep"] for i in range(1, 20))
        assert rows[7]["n_tokens"] == 7

    def test_integer_percentile_rule_exact(self):
        # 10 docs of length 1 and 10 of length 100 with lo=50:
        # cum(1)=10, 10*100 >= 50*20 -> lo_len=1, everything keeps
        texts = ["a"] * 10 + ["b " * 100] * 10
        rows = self._run(texts, lo=50, hi=100)
        assert all(r["keep"] for r in rows.values())
        # lo=51: cum(1)*100 = 1000 < 51*20=1020 -> lo_len=100, shorts drop
        rows = self._run(texts, lo=51, hi=100)
        assert not any(rows[i]["keep"] for i in range(1, 11))
        assert all(rows[i]["keep"] for i in range(11, 21))


# ----------------------------------------------------- functional conflicts


class TestFunctionalConflicts:
    def _run(self, rows, preds=None):
        from pdf_entity_extraction_ray.ops.graph_stats import (
            functional_conflicts,
        )

        tri = pa.table(
            {
                "subj_canonical": pa.array([r[0] for r in rows], pa.string()),
                "pred": pa.array([r[1] for r in rows], pa.string()),
                "obj_canonical": pa.array([r[2] for r in rows], pa.string()),
            }
        )
        out = _collect(functional_conflicts(ray.data.from_arrow(tri), preds))
        return {(r["subj_canonical"], r["pred"]): r for r in out.to_pylist()}

    def test_conflicting_subject_detected_with_witnesses(self):
        rows = [
            ("Ada", "born_in", "London"),
            ("Ada", "born_in", "Paris"),
            ("Ada", "born_in", "London"),  # duplicate assertion: 1 distinct
            ("Ada", "works_at", "ACME"),
            ("Bob", "born_in", "Rome"),
        ]
        out = self._run(rows)
        assert set(out) == {("Ada", "born_in")}
        c = out[("Ada", "born_in")]
        assert c["n_objs"] == 2
        assert c["obj_min"] == "London" and c["obj_max"] == "Paris"

    def test_pred_whitelist_filters(self):
        rows = [
            ("Ada", "born_in", "London"),
            ("Ada", "born_in", "Paris"),
            ("Ada", "likes", "tea"),
            ("Ada", "likes", "coffee"),
        ]
        out = self._run(rows, preds=["born_in"])
        assert set(out) == {("Ada", "born_in")}

    def test_no_conflicts_empty(self):
        assert self._run([("Ada", "born_in", "London")]) == {}

    def test_empty_triples_conflicts_empty(self):
        assert self._run([]) == {}
