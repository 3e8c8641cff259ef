"""Prefix-doubling (suffix-array-family) substring dedup vs a brute-force
single-process gold.  Gold definition: a token position p in doc d is a
duplicated start iff the length-L token window at (d, p) occurs >= 2 times
anywhere in the corpus (same document included); output = maximal runs of
consecutive duplicated starts with end_tok = last_start + L - 1."""

import re

import pyarrow as pa
import ray.data

from pdf_entity_extraction_ray.ops.suffix import prefix_doubling_dup_spans

TOKEN_RE = re.compile(r"[a-z0-9_]+")


def _collect(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    if batches:
        return pa.concat_tables(batches)
    s = ds.schema()
    if s is None:  # fully-empty dataset after map_groups
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "start_tok": pa.array([], pa.int64()),
                "end_tok": pa.array([], pa.int64()),
            }
        )
    return pa.table({n: pa.array([], t) for n, t in zip(s.names, s.types)})


def _docs(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _gold(texts, L):
    from collections import Counter

    toks = {d: TOKEN_RE.findall(t.lower()) for d, t in enumerate(texts)}
    counts = Counter()
    for d, ws in toks.items():
        for p in range(len(ws) - L + 1):
            counts[tuple(ws[p : p + L])] += 1
    spans = []
    for d, ws in toks.items():
        starts = [
            p
            for p in range(len(ws) - L + 1)
            if counts[tuple(ws[p : p + L])] >= 2
        ]
        run = []
        for p in starts:
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    spans.append((d, run[0], run[-1] + L - 1))
                run = [p]
        if run:
            spans.append((d, run[0], run[-1] + L - 1))
    return sorted(spans)


def _got(ds_out) -> list:
    t = _collect(ds_out)
    return sorted(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("start_tok").to_pylist(),
            t.column("end_tok").to_pylist(),
        )
    )


class TestPrefixDoubling:
    def test_cross_doc_dup(self):
        shared = "alpha bravo charlie delta echo foxtrot golf hotel"
        texts = [
            f"one two {shared} three four",
            f"five six seven {shared} eight",
            "nine ten eleven twelve thirteen fourteen fifteen sixteen",
        ]
        got = _got(prefix_doubling_dup_spans(_docs(texts), min_len=8))
        assert got == _gold(texts, 8)
        assert got  # the shared 8-gram must be found
        assert (0, 2, 9) in got and (1, 3, 10) in got

    def test_within_doc_repeat_counts(self):
        # the SAME doc repeating a window twice is a duplicate (Lee et al.
        # ExactSubstr counts occurrences anywhere) — the k-gram op's
        # distinct-doc form would miss this
        texts = [
            "p q r s t u p q r s t u zz",
            "completely different words here with no overlap at all",
        ]
        got = _got(prefix_doubling_dup_spans(_docs(texts), min_len=4))
        assert got == _gold(texts, 4)
        assert any(d == 0 for d, _, _ in got)

    def test_no_dups(self):
        texts = [
            "aa bb cc dd ee ff gg hh ii",
            "jj kk ll mm nn oo pp qq rr",
        ]
        got = _got(prefix_doubling_dup_spans(_docs(texts), min_len=4))
        assert got == []

    def test_short_docs_and_empty(self):
        texts = ["a b c", "", "a b c", "a b c d e f g h i j"]
        # L=4: "a b c" docs have no valid start; doc 3 unique
        got = _got(prefix_doubling_dup_spans(_docs(texts), min_len=4))
        assert got == _gold(texts, 4)

    def test_non_power_of_two_length(self):
        # L=6 exercises the residual combine (4 -> 6 with shift 2)
        shared = "m n o p q r"
        texts = [
            f"x {shared} y",
            f"{shared} z w v",
            "unrelated tokens that never repeat anywhere else truly",
        ]
        got = _got(prefix_doubling_dup_spans(_docs(texts), min_len=6))
        assert got == _gold(texts, 6)
        assert got

    def test_overlapping_islands_merge(self):
        # a 10-token shared block at L=4 -> starts 0..6 merge to one span
        shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
        texts = [f"{shared} tail1 tail2", f"head1 {shared}"]
        got = _got(prefix_doubling_dup_spans(_docs(texts), min_len=4))
        gold = _gold(texts, 4)
        assert got == gold
        # doc 0: starts 0..6 -> one island [0, 9]
        assert (0, 0, 9) in got

    def test_randomized_vs_gold(self):
        import random

        rng = random.Random(1234)
        vocab = [f"w{i}" for i in range(30)]
        texts = []
        for _ in range(20):
            n = rng.randrange(0, 40)
            texts.append(" ".join(rng.choice(vocab) for _ in range(n)))
        # small vocab + short L makes accidental repeats common
        for L in (2, 3, 5):
            got = _got(prefix_doubling_dup_spans(_docs(texts), min_len=L))
            assert got == _gold(texts, L), f"L={L}"
