"""BM25 top-k retrieval over the corpus — the ranked-search layer the
capped inverted index (`ops/vocab.inverted_index`) seeds, and the lexical
sibling of the dense ANN family (`ops/ann.py`).  Reference precedent: the
A7 embedding matcher ranks candidate segments by similarity to a query
(src/methods/TransformerReferenceExtractor.py:12-22); BM25 is the classic
sparse form of the same retrieval step (Robertson & Zaragoza 2009).

Two streaming passes, zero shuffles:

1. **Stats pass** — per-batch partials of (n_docs, sum_dl, df per query
   term).  All INTEGER counters, so the driver fold is exact regardless
   of block order; the partial table is one row per block with
   ``2 + n_query_terms`` columns (query vocabularies are tiny by
   definition — this never scales with the corpus).
2. **Scoring pass** — idf/avgdl captured by closure (a few floats),
   per-batch tf counting + BM25 scoring, per-block top-k combiner,
   final ``repartition(1)`` top-k merge.  The exchange moves
   ``num_blocks * k * n_queries`` rows, never the corpus.

Output is **rank-only** (query_id, doc_id, rank) — the `docs_tfidf_knn`
convention: float scores order the ranks (ties broken by doc_id
ascending) but never enter the hash compare, so 1-ulp libm differences
between engines cannot flake the oracle.
"""

from __future__ import annotations

import math
from collections import Counter

import pyarrow as pa

from .tfidf import _terms  # the ONE shared tokenizer helper (TOKEN_RE)


def _query_terms(queries: dict[int, str]) -> list[str]:
    """Sorted union of query-term vocabularies (fixed scoring order on
    both engines)."""
    terms: set[str] = set()
    for q in queries.values():
        terms.update(_terms(q))
    return sorted(terms)


def corpus_stats(docs_ds, terms: list[str]) -> tuple[int, int, dict[str, int]]:
    """(n_docs, sum_dl, {term: df}) in one streaming pass.

    Integer partials -> the driver fold is order-independent and exact.
    The partial table is bounded at one row per block; ``terms`` is the
    query vocabulary (a handful of words), not the corpus vocabulary.
    """
    term_list = list(terms)

    def partial(batch: pa.Table) -> pa.Table:
        n = 0
        sum_dl = 0
        dfs = [0] * len(term_list)
        for t in batch.column("text").to_pylist():
            toks = _terms(t or "")
            n += 1
            sum_dl += len(toks)
            seen = set(toks)
            for i, w in enumerate(term_list):
                if w in seen:
                    dfs[i] += 1
        cols = {"n_docs": pa.array([n], pa.int64()), "sum_dl": pa.array([sum_dl], pa.int64())}
        for i in range(len(term_list)):
            cols[f"df_{i}"] = pa.array([dfs[i]], pa.int64())
        return pa.table(cols)

    n_docs = 0
    sum_dl = 0
    dfs = [0] * len(term_list)
    partials = docs_ds.select_columns(["text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    for b in partials.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        n_docs += sum(b.column("n_docs").to_pylist())
        sum_dl += sum(b.column("sum_dl").to_pylist())
        for i in range(len(term_list)):
            dfs[i] += sum(b.column(f"df_{i}").to_pylist())
    return n_docs, sum_dl, dict(zip(term_list, dfs))


def bm25_search(
    docs_ds,
    queries: dict[int, str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
):
    """(query_id, doc_id, rank) — top-``k`` BM25 hits per query.

    ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))`` (the standard
    Robertson/Lucene form, never negative); per-doc term score
    ``idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))``.
    Docs matching no query term are dropped before the combiner, so the
    top-k exchange sees only candidate docs.
    """
    import numpy as np
    import pyarrow.compute as pc

    empty_result = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
        }
    )

    terms = _query_terms(queries)
    if not terms:  # before the stats pass — don't scan the corpus for nothing
        import ray.data

        return ray.data.from_arrow(empty_result)
    n_docs, sum_dl, df = corpus_stats(docs_ds, terms)
    if n_docs == 0 or sum_dl == 0:
        import ray.data

        return ray.data.from_arrow(empty_result)
    avgdl = sum_dl / n_docs
    idf = {
        w: math.log(1.0 + (n_docs - df[w] + 0.5) / (df[w] + 0.5)) for w in terms
    }
    # per query: sorted list of (term, idf) — fixed summation order
    q_terms = {
        qid: sorted(set(_terms(q)) & set(terms)) for qid, q in queries.items()
    }

    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )

    def score(batch: pa.Table) -> pa.Table:
        qids, dids, scores = [], [], []
        for doc_id, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = _terms(t or "")
            if not toks:
                continue
            dl = len(toks)
            tf = Counter(toks)
            norm = k1 * (1.0 - b + b * dl / avgdl)
            for qid, qws in q_terms.items():
                s = 0.0
                hit = False
                for w in qws:
                    f = tf.get(w, 0)
                    if f:
                        hit = True
                        s += idf[w] * f * (k1 + 1.0) / (f + norm)
                if hit:
                    qids.append(qid)
                    dids.append(doc_id)
                    scores.append(s)
        if not qids:
            return empty
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "doc_id": pa.array(dids, pa.int64()),
                "score": pa.array(scores, pa.float64()),
            }
        )

    def topk(batch: pa.Table) -> pa.Table:
        """Per-query top-k (vectorized: one sort, run-length cut)."""
        if batch.num_rows == 0:
            return empty
        t = batch.sort_by(
            [("query_id", "ascending"), ("score", "descending"), ("doc_id", "ascending")]
        )
        q = np.asarray(t.column("query_id").combine_chunks(), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, np.diff(q) != 0])
        # rank within query = position - start of its run
        pos = np.arange(len(q))
        run_start = np.repeat(starts, np.diff(np.r_[starts, len(q)]))
        rank = pos - run_start
        keep = rank < k
        t = t.take(pa.array(np.flatnonzero(keep), pa.int64()))
        return t.append_column("rank", pa.array((rank[keep] + 1).astype(np.int64)))

    def final(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty_result
        out = topk(batch.select(["query_id", "doc_id", "score"]))
        return out.select(["query_id", "doc_id", "rank"])

    scored = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )
    partials = scored.map_batches(
        lambda t: topk(t).select(["query_id", "doc_id", "score"]),
        batch_format="pyarrow",
    )
    # combined partials are tiny (blocks * k * n_queries rows);
    # batch_size=None feeds the single repartitioned block as ONE batch —
    # the default batch size would chunk it and break the global top-k
    # (the ops/tfidf.collect_pruned_df precedent)
    return partials.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )


def bm25_oracle_sql(
    queries: dict[int, str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    docs_sql: str = "select doc_id, text from documents",
) -> str:
    """DuckDB mirror of :func:`bm25_search` — same tokenizer regex, same
    idf/norm formula text, rank-only output (float scores order but never
    enter the hash)."""
    q_rows = ", ".join(
        f"({qid}, '{w}')"
        for qid, q in sorted(queries.items())
        for w in sorted(set(_terms(q)))
    )
    return f"""
with docs as ({docs_sql}),
tok as (select doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) as term
        from docs),
dl as (select doc_id, len(regexp_extract_all(lower(text), '[a-z0-9_]+')) as dl
       from docs),
stats as (select count(*) as n_docs, sum(dl) as sum_dl from dl),
qt as (select * from (values {q_rows}) as t(query_id, term)),
tf as (select doc_id, term, count(*) as tf from tok
       where term in (select distinct term from qt) group by doc_id, term),
df as (select term, count(distinct doc_id) as df from tok
       where term in (select distinct term from qt) group by term),
scored as (
    -- inner join on df is safe: a term with tf rows has df >= 1
    select qt.query_id, tf.doc_id,
           sum(ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * ({k1} + 1.0)
               / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl
                                  / (stats.sum_dl * 1.0 / stats.n_docs)))) as score
    from qt
    join tf on tf.term = qt.term
    join df on df.term = qt.term
    join dl on dl.doc_id = tf.doc_id
    cross join stats
    group by qt.query_id, tf.doc_id
)
select query_id, doc_id,
       row_number() over (partition by query_id
                          order by score desc, doc_id) as rank
from scored
qualify rank <= {k}
"""
