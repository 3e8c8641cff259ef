"""TF-IDF similarity machinery (the reference's A7/A8 candidate-pair
scorer shape, src/methods/TransformerReferenceExtractor.py:12-22 and
LightGBMReferenceExtractor.py:8-107, minus the model dependencies): a
corpus-trained IDF table (two-stage distributed aggregation), per-doc
sparse TF-IDF vectors, and brute-force cosine top-k against broadcast
query vectors.

IDF training IS a distributed pipeline: per-batch distinct-term document
frequencies (the combiner) -> small ``groupby(term).sum`` -> broadcast
table.  Scoring then streams: one sparse-dot per (doc, query) pair per
batch, queries broadcast once.
"""

from __future__ import annotations

import math

import pyarrow as pa

from .text import TOKEN_RE


def _terms(text: str) -> list[str]:
    return TOKEN_RE.findall(text.lower())


# Default vocabulary bound for the broadcast IDF table.  The sf corpora
# have a few-thousand-term vocabulary, so this bound provably changes
# nothing there (the oracle's full-vocab SQL stays hash-exact); at web
# scale it caps the driver dict / broadcast at O(DEFAULT_MAX_TERMS) no
# matter how large the corpus vocabulary grows.
DEFAULT_MAX_TERMS = 1_000_000


def collect_pruned_df(df_agg_ds, *, min_df: int = 1, max_terms: int | None = DEFAULT_MAX_TERMS):
    """Aggregated (term, df) Dataset -> driver list[(term, df)], pruned
    INSIDE the distributed plan so the driver never holds the full
    vocabulary:

    * ``min_df`` filters inside each reduce-output block (vectorized);
    * ``max_terms`` keeps the global top-N by (df desc, term asc) via a
      per-block top-N combiner, then one final top-N over the combined
      candidates (``repartition(1)``) — the driver collects at most
      ``max_terms`` rows, and the intermediate exchange moves at most
      ``num_blocks * max_terms``.

    Tie-break is deterministic (higher df wins; equal df -> lexicographic
    term) so the pruned vocabulary is stable across runs and partitionings.
    """
    import pyarrow.compute as pc

    def prune_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "term" not in batch.column_names:
            return pa.table(
                {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        t = batch.select(["term", "df"])
        if min_df > 1:
            t = t.filter(pc.greater_equal(t.column("df"), pa.scalar(min_df)))
        if max_terms is not None and t.num_rows > max_terms:
            idx = pc.select_k_unstable(
                t, k=max_terms, sort_keys=[("df", "descending"), ("term", "ascending")]
            )
            t = t.take(idx)
        return t

    pruned = df_agg_ds.map_batches(prune_block, batch_format="pyarrow")
    if max_terms is not None:
        # final global top-N over the (<= blocks * max_terms) candidates;
        # batch_size=None feeds the single repartitioned block as ONE batch
        # (the default batch size would chunk it and break the global top-N)
        pruned = pruned.repartition(1).map_batches(
            prune_block, batch_format="pyarrow", batch_size=None
        )
    out: list[tuple[str, int]] = []
    for b in pruned.iter_batches(batch_format="pyarrow"):
        if "term" not in b.column_names:
            continue
        out.extend(zip(b.column("term").to_pylist(), b.column("df").to_pylist()))
    return out


def train_idf(
    docs_ds, *, min_df: int = 1, max_terms: int | None = DEFAULT_MAX_TERMS
) -> tuple[dict[str, float], int]:
    """(term -> idf, n_docs).  Smooth idf = ln((1+N)/(1+df)) + 1.

    The driver-side dict is bounded: document frequencies are pruned in
    the distributed aggregation (:func:`collect_pruned_df`) before the
    collect, so the broadcast is O(min(vocab, max_terms)) — never the raw
    corpus vocabulary (unbounded at web scale)."""

    def partial(batch: pa.Table) -> pa.Table:
        df: dict[str, int] = {}
        for t in batch.column("text").to_pylist():
            for term in set(_terms(t)):
                df[term] = df.get(term, 0) + 1
        return pa.table(
            {
                "term": pa.array(list(df), pa.string()),
                "df": pa.array(list(df.values()), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        docs_ds.select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )
    # n_docs: cheap exact count (metadata-only for parquet sources)
    n_docs = docs_ds.count()
    idf = {
        term: math.log((1 + n_docs) / (1 + df)) + 1.0
        for term, df in collect_pruned_df(agg, min_df=min_df, max_terms=max_terms)
    }
    return idf, n_docs


def vectorize(text: str, idf: dict[str, float]) -> dict[str, float]:
    """L2-normalized sparse TF-IDF vector (raw term counts x idf)."""
    tf: dict[str, int] = {}
    for term in _terms(text):
        tf[term] = tf.get(term, 0) + 1
    vec = {t: c * idf[t] for t, c in tf.items() if t in idf}
    norm = math.sqrt(sum(v * v for v in vec.values()))
    if norm > 0:
        vec = {t: v / norm for t, v in vec.items()}
    return vec


def sparse_cosine(a: dict[str, float], b: dict[str, float]) -> float:
    if len(b) < len(a):
        a, b = b, a
    return sum(v * b[t] for t, v in a.items() if t in b)


def _collect_query_texts(docs_ds, query_doc_ids: list[int], source_path=None) -> dict[int, str]:
    """Fetch a handful of query rows WITHOUT streaming the corpus through
    the driver: with ``source_path`` the fetch is a filtered Parquet read
    (``doc_id in (...)`` prunes row groups via column statistics — only
    matching row groups are decoded); otherwise a distributed semi-join
    filter (``map_batches`` isin) whose ``take_all`` moves O(queries) rows
    to the driver."""
    wanted = set(query_doc_ids)
    if source_path is not None:
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            source_path, columns=["doc_id", "text"],
            filters=[("doc_id", "in", sorted(wanted))],
        )
        return dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))

    def only_queries(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
            )
        return batch.filter(pc.is_in(batch.column("doc_id"), pa.array(sorted(wanted))))

    rows = (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(only_queries, batch_format="pyarrow")
        .take_all()
    )
    return {r["doc_id"]: r["text"] for r in rows}


def tfidf_knn(
    docs_ds,
    query_doc_ids: list[int],
    k: int = 5,
    *,
    source_path=None,
    min_df: int = 1,
    max_terms: int | None = DEFAULT_MAX_TERMS,
):
    """(query_id, neighbor_id, rank): exact top-k by TF-IDF cosine.

    IDF + query vectors broadcast once (both pruned/bounded); per-batch
    local top-k combiner -> tiny groupby final (same shape as
    ops/ann.knn_bruteforce).  ``source_path``: the backing Parquet
    file/dir, letting the query-text fetch push its filter down to the
    read instead of streaming the corpus anywhere."""
    import ray

    idf, _ = train_idf(docs_ds, min_df=min_df, max_terms=max_terms)
    texts = _collect_query_texts(docs_ds, query_doc_ids, source_path)
    queries = {doc_id: vectorize(text, idf) for doc_id, text in texts.items()}
    ref = ray.put((idf, queries))

    def local_topk(batch: pa.Table) -> pa.Table:
        idf_, queries_ = ray.get(ref)
        out_q, out_n, out_s = [], [], []
        rows = list(
            zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist())
        )
        vecs = [(doc_id, vectorize(text, idf_)) for doc_id, text in rows]
        for qid, qv in queries_.items():
            scored = [
                (sparse_cosine(qv, dv), doc_id) for doc_id, dv in vecs if doc_id != qid
            ]
            scored.sort(key=lambda t: (-t[0], t[1]))
            for s, doc_id in scored[:k]:
                out_q.append(qid)
                out_n.append(doc_id)
                out_s.append(s)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group.column("cosine").to_pylist(), group.column("neighbor_id").to_pylist()),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        qid = group.column("query_id")[0].as_py()
        return pa.table(
            {
                "query_id": pa.array([qid] * len(rows), pa.int64()),
                "neighbor_id": pa.array([r[1] for r in rows], pa.int64()),
                "rank": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            }
        )

    return (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
    )


def keyphrases(
    docs_ds,
    k: int = 5,
    *,
    min_df: int = 1,
    max_terms: int | None = DEFAULT_MAX_TERMS,
):
    """(doc_id, term, rank) — each document's top-``k`` TF-IDF terms, the
    keyword-extraction step tagging/indexing pipelines run per document
    (reference precedent: the A7/A8 family ranks candidate strings by
    corpus-weighted similarity; this is its single-document projection).

    IDF broadcast once (pruned/bounded, :func:`train_idf`); scoring is a
    stateless per-batch pass — scores are ``tf * idf`` (per-doc ranking
    is norm-invariant).  Rank-only output, ties broken by term ascending:
    equal scores arise from identical (tf, df) pairs, where both engines
    compute bit-identical doubles, so the tie-break is deterministic
    cross-engine (the docs_tfidf_knn convention)."""
    import ray

    idf, _ = train_idf(docs_ds, min_df=min_df, max_terms=max_terms)
    ref = ray.put(idf)

    def topk(batch: pa.Table) -> pa.Table:
        idf_ = ray.get(ref)
        out_d, out_t, out_r = [], [], []
        if batch.num_rows and "text" in batch.column_names:
            for doc_id, text in zip(
                batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
            ):
                tf: dict[str, int] = {}
                for term in _terms(text or ""):
                    tf[term] = tf.get(term, 0) + 1
                scored = sorted(
                    ((c * idf_[t], t) for t, c in tf.items() if t in idf_),
                    key=lambda p: (-p[0], p[1]),
                )[:k]
                for r, (_, t) in enumerate(scored, 1):
                    out_d.append(doc_id)
                    out_t.append(t)
                    out_r.append(r)
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "term": pa.array(out_t, pa.string()),
                "rank": pa.array(out_r, pa.int64()),
            }
        )

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        topk, batch_format="pyarrow"
    )


def keyphrases_oracle_sql(
    k: int = 5, docs_sql: str = "select doc_id, text from documents"
) -> str:
    """DuckDB mirror of :func:`keyphrases` (full-vocabulary IDF — the
    pruning bounds provably change nothing at oracle scales, the
    docs_tfidf_knn argument)."""
    return f"""
with docs as ({docs_sql}),
tok as (select doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) as term
        from docs),
tf as (select doc_id, term, count(*) as tf from tok group by doc_id, term),
df as (select term, count(distinct doc_id) as df from tok group by term),
n as (select count(*) as n_docs from docs),
w as (select tf.doc_id, tf.term,
             tf.tf * (ln((1 + n_docs) / (1 + df.df)) + 1.0) as w
      from tf join df using (term), n)
select doc_id, term,
       row_number() over (partition by doc_id order by w desc, term) as rank
from w
qualify rank <= {k}
"""
