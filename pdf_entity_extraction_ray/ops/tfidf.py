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


def train_idf(docs_ds) -> tuple[dict[str, float], int]:
    """(term -> idf, n_docs).  Smooth idf = ln((1+N)/(1+df)) + 1."""

    def partial(batch: pa.Table) -> pa.Table:
        df: dict[str, int] = {}
        n = batch.num_rows
        for t in batch.column("text").to_pylist():
            for term in set(_terms(t)):
                df[term] = df.get(term, 0) + 1
        tbl = pa.table(
            {
                "term": pa.array(list(df), pa.string()),
                "df": pa.array(list(df.values()), pa.int64()),
            }
        )
        return tbl.append_column("n_docs", pa.array([n] * tbl.num_rows, pa.int64()))

    from ray.data.aggregate import Max, Sum

    agg = (
        docs_ds.select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )
    # n_docs: cheap exact count (metadata-only for parquet sources)
    n_docs = docs_ds.count()
    idf: dict[str, float] = {}
    for b in agg.iter_batches(batch_format="pyarrow"):
        if "term" not in b.column_names:
            continue
        for term, df in zip(b.column("term").to_pylist(), b.column("df").to_pylist()):
            idf[term] = math.log((1 + n_docs) / (1 + df)) + 1.0
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


def tfidf_knn(docs_ds, query_doc_ids: list[int], k: int = 5):
    """(query_id, neighbor_id, rank): exact top-k by TF-IDF cosine.

    IDF + query vectors broadcast once; per-batch local top-k combiner ->
    tiny groupby final (same shape as ops/ann.knn_bruteforce).
    """
    import ray

    idf, _ = train_idf(docs_ds)
    wanted = set(query_doc_ids)
    queries: dict[int, dict[str, float]] = {}
    for b in docs_ds.select_columns(["doc_id", "text"]).iter_batches(batch_format="pyarrow"):
        for doc_id, text in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            if doc_id in wanted:
                queries[doc_id] = vectorize(text, idf)
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
