"""BM25 ranked retrieval (ops/bm25.py): scoring semantics + the
two-pass streaming structure's edge cases."""

import math

import pyarrow as pa
import ray.data

from pdf_entity_extraction_ray.ops.bm25 import (
    bm25_oracle_sql,
    bm25_search,
    corpus_stats,
)


def _docs(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _rows(ds):
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    if not batches:
        return []
    t = pa.concat_tables(batches, promote_options="default")
    return sorted(zip(*[t.column(c).to_pylist() for c in ("query_id", "doc_id", "rank")]))


def test_corpus_stats_exact():
    ds = _docs(["alpha beta beta", "alpha", "", "gamma gamma"])
    n, sum_dl, df = corpus_stats(ds, ["alpha", "beta", "missing"])
    assert n == 4
    assert sum_dl == 3 + 1 + 0 + 2
    assert df == {"alpha": 2, "beta": 1, "missing": 0}


def test_exact_match_ranks_first():
    ds = _docs(
        [
            "hash join hash join hash join",  # heavy on both terms
            "hash only here with filler words around it",  # one term
            "nothing relevant at all",  # no terms
            "join join join join join join join join",  # one term, long
        ]
    )
    rows = _rows(bm25_search(ds, {0: "hash join"}, k=10))
    # doc 2 never appears (no matching term)
    assert all(d != 2 for _, d, _ in rows)
    top = [d for _, d, r in sorted(rows, key=lambda x: x[2])]
    assert top[0] == 0  # both-terms doc wins


def test_rare_term_outweighs_common():
    # 'rare' appears in one doc, 'common' in all: idf should make the
    # rare-term doc beat a common-term-only doc for query 'rare common'
    ds = _docs(
        [
            "common rare",
            "common common common",
            "common filler",
            "common words",
        ]
    )
    rows = _rows(bm25_search(ds, {7: "rare common"}, k=2))
    best = min(rows, key=lambda x: x[2])
    assert best[1] == 0 and best[0] == 7


def test_k_caps_results_and_rank_dense():
    ds = _docs([f"token filler{i}" for i in range(20)])
    rows = _rows(bm25_search(ds, {0: "token"}, k=5))
    assert len(rows) == 5
    assert sorted(r for _, _, r in rows) == [1, 2, 3, 4, 5]


def test_multiple_queries_independent():
    ds = _docs(["apple pie", "banana split", "apple banana"])
    rows = _rows(bm25_search(ds, {1: "apple", 2: "banana"}, k=10))
    q1 = {d for q, d, _ in rows if q == 1}
    q2 = {d for q, d, _ in rows if q == 2}
    assert q1 == {0, 2}
    assert q2 == {1, 2}


def test_matches_single_process_reference():
    """Brute-force single-process BM25 agrees on the full ranking."""
    texts = [
        "spark table scan fast",
        "fast fast join table",
        "window agg stream data",
        "join join window scan",
        "data data data data data data",
        "",
    ]
    ds = _docs(texts)
    queries = {0: "fast join", 1: "window data"}
    k1, b = 1.2, 0.75
    toks = [t.lower().split() for t in texts]
    n = len(texts)
    avgdl = sum(len(x) for x in toks) / n

    def ref_rank(qterms):
        import collections

        df = {w: sum(1 for x in toks if w in x) for w in qterms}
        out = []
        for i, x in enumerate(toks):
            tf = collections.Counter(x)
            s, hit = 0.0, False
            for w in sorted(qterms):
                f = tf.get(w, 0)
                if f:
                    hit = True
                    idf = math.log(1 + (n - df[w] + 0.5) / (df[w] + 0.5))
                    s += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * len(x) / avgdl))
            if hit:
                out.append((i, s))
        out.sort(key=lambda p: (-p[1], p[0]))
        return [(i, r + 1) for r, (i, _) in enumerate(out)]

    rows = _rows(bm25_search(ds, queries, k=10))
    for qid, q in queries.items():
        got = sorted(
            [(d, r) for qq, d, r in rows if qq == qid], key=lambda p: p[1]
        )
        assert got == ref_rank(q.split())


def test_oracle_sql_mirrors(tmp_path):
    """The generated SQL reproduces the op on a tiny corpus via DuckDB."""
    import duckdb
    import pyarrow.parquet as pq

    texts = ["red green blue", "red red blue", "green green green", "blue"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    path = tmp_path / "documents.parquet"
    pq.write_table(tbl, str(path))
    queries = {0: "red blue", 1: "green"}
    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{path}'")
    want = sorted(
        map(tuple, con.execute(bm25_oracle_sql(queries, 3)).fetchall())
    )
    got = _rows(bm25_search(ray.data.from_arrow(tbl), queries, k=3))
    assert got == want


def test_global_topk_survives_many_blocks():
    """Regression: the repartition(1) merge must see ONE batch — with
    >1024 combined partial rows the default batch size would chunk it and
    emit duplicate ranks per query."""
    texts = [f"token filler{i}" for i in range(2400)]
    ds = _docs(texts).repartition(160)  # 160 blocks * 10 = 1600 partial rows
    rows = _rows(bm25_search(ds, {0: "token"}, k=10))
    assert len(rows) == 10
    assert sorted(r for _, _, r in rows) == list(range(1, 11))
    # deterministic winners: every doc scores identically (same tf/dl),
    # so doc_id tie-break keeps the 10 smallest ids
    assert sorted(d for _, d, _ in rows) == list(range(10))


def test_no_matching_docs_returns_empty():
    """Regression: a query whose terms exist in the vocabulary universe
    but match no document must return empty, not crash in final()."""
    ds = _docs(["alpha beta", "beta gamma"])
    assert _rows(bm25_search(ds, {0: "zzznotfound"}, k=5)) == []


def test_tokenless_query_short_circuits():
    ds = _docs(["alpha beta"])
    assert _rows(bm25_search(ds, {0: "!!! ..."}, k=5)) == []
