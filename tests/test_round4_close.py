"""Unit tests for the round-4 closing ops: C4-style line cleaning
(ops/text.c4_line_filter_batch), MOSS winnowing pairs
(ops/dedup.winnow_pairs) and the per-entity assertion-trend slope
(ops/graph_stats.mention_trend)."""

import pyarrow as pa
import ray.data


def _collect(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    if batches:
        return pa.concat_tables(batches)
    schema = ds.schema()
    return getattr(schema, "base_schema", schema).empty_table()


# ---------------------------------------------------------------- C4 filter


class TestC4LineFilter:
    def _run(self, docs):
        from pdf_entity_extraction_ray.ops.text import c4_line_filter_batch

        batch = pa.table(
            {
                "doc_id": pa.array(range(1, len(docs) + 1), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        )
        t = c4_line_filter_batch(batch)
        return {r["doc_id"]: r for r in t.to_pylist()}

    def test_rules_match_duckdb_verified_example(self):
        # hand-verified against the DuckDB oracle SQL
        rows = self._run(["a b c d e f. x y. one two three four five{ bad", ""])
        assert rows[1] == {
            "doc_id": 1,
            "n_kept": 1,
            "n_dropped": 2,
            "keep": False,
            "clean_text": "a b c d e f",
        }
        assert rows[2]["n_kept"] == 0 and rows[2]["clean_text"] == ""

    def test_keep_threshold_three_sentences(self):
        good = "alpha beta gamma delta epsilon"
        rows = self._run(
            [
                ". ".join([good] * 3),  # exactly 3 survivors -> keep
                ". ".join([good] * 2 + ["x y"]),  # 2 survivors -> drop
            ]
        )
        assert rows[1]["keep"] is True and rows[1]["n_kept"] == 3
        assert rows[1]["clean_text"] == ". ".join([good] * 3)
        assert rows[2]["keep"] is False and rows[2]["n_kept"] == 2

    def test_brace_cut_is_per_sentence(self):
        good = "alpha beta gamma delta epsilon"
        rows = self._run([f"{good}. {good} {{code}}. {good}"])
        assert rows[1]["n_kept"] == 2 and rows[1]["n_dropped"] == 1


# ------------------------------------------------------------- winnow pairs


def _docs_ds(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


_LONG = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "green bottles hang quietly on the old stone wall near town"
)


class TestWinnowPairs:
    def test_identical_docs_pair_and_outsider_does_not(self):
        from pdf_entity_extraction_ray.ops.dedup import winnow_pairs

        other = (
            "completely different words about rivers mountains valleys "
            "glaciers deserts and the slow erosion of ancient basalt cliffs"
        )
        t = _collect(winnow_pairs(_docs_ds([_LONG, _LONG, other])))
        pairs = {(r["doc_a"], r["doc_b"]): r["shared_fps"] for r in t.to_pylist()}
        assert set(pairs) == {(1, 2)}
        assert pairs[(1, 2)] >= 2  # identical docs share every fingerprint

    def test_max_df_boilerplate_cut(self):
        from pdf_entity_extraction_ray.ops.dedup import winnow_pairs

        # 4 identical docs, max_df=3: every fingerprint bucket holds 4
        # docs -> dropped as boilerplate -> no pairs at all
        t = _collect(winnow_pairs(_docs_ds([_LONG] * 4), max_df=3))
        assert t.num_rows == 0

    def test_min_shared_threshold(self):
        from pdf_entity_extraction_ray.ops.dedup import winnow_pairs

        hi = _collect(
            winnow_pairs(_docs_ds([_LONG, _LONG]), min_shared=10**9)
        )
        assert hi.num_rows == 0

    def test_short_docs_empty_no_crash(self):
        from pdf_entity_extraction_ray.ops.dedup import winnow_pairs

        # below w+k-1 words: no fingerprints anywhere -> empty short-circuit
        t = _collect(winnow_pairs(_docs_ds(["a b c", "a b c"])))
        assert t.num_rows == 0
        assert t.column_names == ["doc_a", "doc_b", "shared_fps"]


# ------------------------------------------------------------ mention trend


def _ts(seconds):
    return pa.array([s * 1_000_000 for s in seconds], pa.timestamp("us"))


class TestMentionTrend:
    def test_exact_integer_slope(self):
        from pdf_entity_extraction_ray.ops.graph_stats import mention_trend

        # A asserted 1x in minute 0, 2x in minute 1, 3x in minute 2:
        # n=3, sx=3, sy=6, sxy=0+2+6=8, sxx=5
        # num = 3*8 - 3*6 = 6 ; den = 3*5 - 9 = 6  (slope exactly +1/min)
        # B seen in a single minute (5 rows) -> dropped (den would be 0)
        pages = ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array(["u0", "u1", "u2", "u3", "ub"], pa.string()),
                    "warc_ts": _ts([0, 60, 75, 120, 0]),
                }
            )
        )
        tri_urls = ["u0", "u1", "u2", "u3", "u3", "u3"] + ["ub"] * 5
        triples = ray.data.from_arrow(
            pa.table(
                {
                    "subj_canonical": pa.array(
                        ["A"] * 6 + ["B"] * 5, pa.string()
                    ),
                    "url": pa.array(tri_urls, pa.string()),
                }
            )
        )
        t = _collect(mention_trend(triples, pages, bucket_us=60_000_000))
        rows = {r["subj_canonical"]: r for r in t.to_pylist()}
        assert set(rows) == {"A"}
        assert rows["A"]["slope_num"] == 6 and rows["A"]["slope_den"] == 6

    def test_single_bucket_everything_drops(self):
        from pdf_entity_extraction_ray.ops.graph_stats import mention_trend

        pages = ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array(["u0", "u1"], pa.string()),
                    "warc_ts": _ts([0, 59]),
                }
            )
        )
        triples = ray.data.from_arrow(
            pa.table(
                {
                    "subj_canonical": pa.array(["A", "A"], pa.string()),
                    "url": pa.array(["u0", "u1"], pa.string()),
                }
            )
        )
        t = _collect(mention_trend(triples, pages, bucket_us=60_000_000))
        assert t.num_rows == 0


class TestMentionTrendOverflow:
    def test_realistic_epoch_minute_buckets_do_not_overflow(self):
        """Regression: raw epoch minute-bucket indices (~3*10^7) squared
        and summed over a few hundred buckets overflowed int64 in the
        pre-shift fold (n * sxx ~ 8*10^19).  The shift-invariant re-base
        keeps the moments within the crawl-window span; the slope is the
        same exact fraction either way."""
        from pdf_entity_extraction_ray.ops.graph_stats import mention_trend

        base = 1_770_000_000  # ~2026 epoch seconds
        n = 400  # distinct minute buckets
        urls = [f"u{i}" for i in range(n)]
        pages = ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "warc_ts": _ts([base + 60 * i for i in range(n)]),
                }
            )
        )
        # one assertion per minute: y = 1 everywhere -> slope exactly 0
        triples = ray.data.from_arrow(
            pa.table(
                {
                    "subj_canonical": pa.array(["A"] * n, pa.string()),
                    "url": pa.array(urls, pa.string()),
                }
            )
        )
        t = _collect(mention_trend(triples, pages, bucket_us=60_000_000))
        rows = t.to_pylist()
        assert len(rows) == 1
        r = rows[0]
        # flat series: num = n*sxy - sx*sy = 0; den = n*sxx - sx^2 > 0
        assert r["slope_num"] == 0 and r["slope_den"] > 0
