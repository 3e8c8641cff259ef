"""CCNet-style n-gram LM (ops/ngram_lm): hand-computed stupid-backoff
scores, prefix-closed pruning, and distributed == mirror equality."""

import math

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from pdf_entity_extraction_ray.ops.ngram_lm import (
    BACKOFF,
    _LM,
    _grams,
    perplexity_score,
    train_ngram_lm,
)


def _lm_from(rows):
    return pa.table(
        {
            "gram": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[0].count(" ") + 1 for r in rows], pa.int64()),
            "count": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def test_stupid_backoff_hand_computed():
    # corpus "a b a b a": unigrams a:3 b:2; bigrams "a b":2 "b a":2;
    # trigrams "a b a":2 (the other, "b a b", occurs once -> pruned)
    lm = _LM(
        _lm_from([("a", 3), ("b", 2), ("a b", 2), ("b a", 2), ("a b a", 2)]), order=3
    )
    assert lm.total == 5
    # P(a) = 3/5 (no context)
    # P(b | a) = C("a b")/C("a") = 2/3 (bigram level, no backoff factor)
    # P(a | a b) = C("a b a")/C("a b") = 2/2
    # P(b | b a) -> trigram "b a b" pruned -> 0.4 * C("a b")/C("a") = 0.4*2/3
    # P(a | a b) = 1 again
    exp = (
        math.log(3 / 5)
        + math.log(2 / 3)
        + math.log(1.0)
        + math.log(BACKOFF * 2 / 3)
        + math.log(1.0)
    )
    assert abs(lm.logprob(["a", "b", "a", "b", "a"]) - exp) < 1e-12


def test_oov_backs_off_to_unk():
    lm = _LM(_lm_from([("a", 3)]), order=3)
    # single OOV token at i=0: only the unigram level is tried (factor
    # accumulates one BACKOFF for the failed unigram lookup), then p_unk
    got = lm.logprob(["zzz"])
    assert abs(got - math.log(BACKOFF * (1.0 / (3 + 1)))) < 1e-12


def test_empty_doc_scores_unit_perplexity():
    lm = _LM(_lm_from([("a", 3)]), order=3)
    assert lm.score([]) == (0, 0, 10**6)


def test_grams_enumeration():
    assert _grams(["x", "y", "z"], 3) == {
        "x": 1,
        "y": 1,
        "z": 1,
        "x y": 1,
        "y z": 1,
        "x y z": 1,
    }


def test_train_prunes_prefix_closed(ray_session):
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": ["a b c a b", "a b d"],
        }
    )
    lm = pa.concat_tables(
        list(
            train_ngram_lm(ray.data.from_arrow(docs)).iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    got = dict(zip(lm.column("gram").to_pylist(), lm.column("count").to_pylist()))
    # surviving grams (count >= 2) across both docs
    assert got == {"a": 3, "b": 3, "a b": 3}
    # prefix closure: every surviving multi-word gram's prefix survives
    for g in got:
        words = g.split(" ")
        if len(words) > 1:
            assert " ".join(words[:-1]) in got


def test_distributed_scoring_matches_mirror(ray_session):
    import pyarrow.parquet as pq

    from pdf_entity_extraction_ray.ops.ngram_lm import write_gold_ngram_lm

    sf = "/root/testdata/sf0.001"
    out = "/tmp/test_lm_sf0001"
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    write_gold_ngram_lm(f"{sf}/documents.parquet", out)
    gold_lm = pq.read_table(f"{out}/gold_lm.parquet")
    gold_ppl = pq.read_table(f"{out}/gold_ppl.parquet")
    ds = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    lm = pa.concat_tables(list(train_ngram_lm(ds).iter_batches(batch_format="pyarrow")))
    lm = lm.take(pc.sort_indices(lm, sort_keys=[("gram", "ascending")]))
    assert lm.equals(gold_lm)
    sc = pa.concat_tables(
        list(perplexity_score(ds, lm).iter_batches(batch_format="pyarrow"))
    )
    sc = sc.take(pc.sort_indices(sc, sort_keys=[("doc_id", "ascending")]))
    assert sc.equals(gold_ppl)


class TestCcnetBuckets:
    def test_terciles_and_duckdb_parity(self):
        import duckdb
        import pyarrow as pa
        import ray.data

        from pdf_entity_extraction_ray.ops.ngram_lm import (
            ccnet_buckets,
            train_ngram_lm,
        )

        # repetitive docs -> low perplexity (head); diverse -> tail
        texts = (
            ["the cat sat the cat sat the cat sat"] * 6
            + ["the dog ran the dog ran fast today"] * 6
            + [f"unique words here w{i} x{i} y{i} z{i} q{i}" for i in range(6)]
        )
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        ds = ray.data.from_arrow(docs)
        lm_rows = list(
            train_ngram_lm(ds.select_columns(["text"])).iter_batches(
                batch_format="pyarrow"
            )
        )
        lm = pa.concat_tables(lm_rows)
        out = pa.concat_tables(
            ccnet_buckets(ds, lm).iter_batches(batch_format="pyarrow")
        ).to_pandas()

        con = duckdb.connect()
        con.register("s", out[["doc_id", "ppl_ppm"]])
        ref = con.execute(
            """
            with t as (select quantile_disc(ppl_ppm, 1.0/3) as t1,
                              quantile_disc(ppl_ppm, 2.0/3) as t2 from s)
            select doc_id,
                   case when ppl_ppm <= t.t1 then 'head'
                        when ppl_ppm <= t.t2 then 'middle'
                        else 'tail' end as bucket
            from s, t
            """
        ).fetch_df()
        got = dict(zip(out.doc_id, out.bucket))
        exp = dict(zip(ref.doc_id, ref.bucket))
        assert got == exp
        # the semantic property CCNet wants: repetitive docs in head,
        # unique-vocab docs in tail
        assert all(got[i] == "head" for i in range(6))
        assert all(got[i] == "tail" for i in range(12, 18))
