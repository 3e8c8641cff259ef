"""A8 analog: char_wb(2,4) TF-IDF pair features + a trained, broadcast
linear scorer over candidate pairs (src/methods/LightGBMReferenceExtractor
.py:8-107 re-expressed without the lightgbm/sklearn dependencies).

The reference's shape is train-offline / broadcast-model / infer-in-stream:
``TfidfVectorizer(analyzer="char_wb", ngram_range=(2, 4))`` features of the
combined ``"{context} {query}"`` text (its final feature set,
LightGBMReferenceExtractor.py:50), a binary classifier, and a 0.5
prediction threshold (:106).  Here the classifier is a numpy logistic
model — deterministic, dependency-free — and inference is a stateless
``map_batches`` stage reading the ``ray.put`` model once per task.

The char_wb analyzer reproduces the public sklearn semantics: whitespace
split, each word padded with single spaces, n-grams taken inside padded
word boundaries, short words emitted once.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def char_wb_ngrams(text: str, min_n: int = 2, max_n: int = 4) -> list[str]:
    """sklearn ``analyzer="char_wb"`` n-grams (lowercased)."""
    out: list[str] = []
    for w in text.lower().split():
        w = f" {w} "
        w_len = len(w)
        for n in range(min_n, max_n + 1):
            offset = 0
            out.append(w[offset : offset + n])
            while offset + n < w_len:
                offset += 1
                out.append(w[offset : offset + n])
            if offset == 0:  # short word (w_len <= n): count once, stop
                break
    return out


def train_char_idf(
    docs_ds, *, min_df: int = 1, max_terms: int | None = None
) -> tuple[dict[str, float], int]:
    """(ngram -> smooth idf, n_docs) over a text Dataset — the same
    two-stage distributed DF aggregation as ops.tfidf.train_idf, with the
    char_wb analyzer.  The collected dict is pruned inside the distributed
    plan (ops.tfidf.collect_pruned_df): ``max_terms`` defaults to the
    shared DEFAULT_MAX_TERMS bound so the char-ngram vocabulary can never
    grow the driver dict unboundedly."""
    from .tfidf import DEFAULT_MAX_TERMS, collect_pruned_df

    if max_terms is None:
        max_terms = DEFAULT_MAX_TERMS

    def partial(batch: pa.Table) -> pa.Table:
        df: dict[str, int] = {}
        for t in batch.column("text").to_pylist():
            for g in set(char_wb_ngrams(t)):
                df[g] = df.get(g, 0) + 1
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
    n_docs = docs_ds.count()
    idf = {
        term: math.log((1 + n_docs) / (1 + df)) + 1.0
        for term, df in collect_pruned_df(agg, min_df=min_df, max_terms=max_terms)
    }
    return idf, n_docs


def pair_vector(a: str, b: str, idf: dict[str, float]) -> dict[str, float]:
    """L2-normalized char_wb TF-IDF of the combined pair text — the
    reference's final feature set (``f"{context_item} {query}"``)."""
    tf: dict[str, int] = {}
    for g in char_wb_ngrams(f"{a} {b}"):
        tf[g] = tf.get(g, 0) + 1
    vec = {g: c * idf[g] for g, c in tf.items() if g in idf}
    norm = math.sqrt(sum(v * v for v in vec.values()))
    if norm > 0:
        vec = {g: v / norm for g, v in vec.items()}
    return vec


class LinearPairScorer:
    """Sparse logistic model over pair vectors (the GBDT stand-in).

    ``weights``: term -> coefficient; scoring and training are pure
    functions of the inputs — deterministic across runs and partitions."""

    def __init__(self, weights: dict[str, float], bias: float, idf: dict[str, float]):
        self.weights = weights
        self.bias = bias
        self.idf = idf

    def decision(self, a: str, b: str) -> float:
        vec = pair_vector(a, b, self.idf)
        z = self.bias + sum(v * self.weights.get(t, 0.0) for t, v in vec.items())
        return 1.0 / (1.0 + math.exp(-z))

    def predict(self, a: str, b: str, threshold: float = 0.5) -> int:
        """One-hot match decision (reference predict contract, :103-107)."""
        return int(self.decision(a, b) > threshold)


def train_pair_scorer(
    pairs: list[tuple[str, str]],
    labels: list[int],
    idf: dict[str, float],
    *,
    epochs: int = 200,
    lr: float = 1.0,
) -> LinearPairScorer:
    """Offline trainer: full-batch gradient descent on logistic loss over
    the labeled pairs (the reference trains offline on driver-side sample
    data too, LightGBMReferenceExtractor.py:112-140).  Deterministic."""
    vecs = [pair_vector(a, b, idf) for a, b in pairs]
    terms = sorted({t for v in vecs for t in v})
    t_idx = {t: i for i, t in enumerate(terms)}
    X = np.zeros((len(vecs), len(terms)))
    for r, v in enumerate(vecs):
        for t, val in v.items():
            X[r, t_idx[t]] = val
    y = np.asarray(labels, dtype=np.float64)
    w = np.zeros(len(terms))
    b = 0.0
    for _ in range(epochs):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g) / len(y)
        b -= lr * float(g.mean())
    return LinearPairScorer(dict(zip(terms, w.tolist())), b, idf)


def score_candidate_pairs(pairs_ds, scorer: LinearPairScorer, threshold: float = 0.5):
    """Candidate-pair Dataset (type, a, b) -> rows the broadcast model
    accepts.  The model ships once (``ray.put``); each task reads it
    zero-copy — the train-offline/broadcast-infer engine shape."""
    import ray

    ref = ray.put(scorer)

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "a" not in batch.column_names:
            return pa.table(
                {
                    "type": pa.array([], pa.string()),
                    "a": pa.array([], pa.string()),
                    "b": pa.array([], pa.string()),
                }
            )
        model = ray.get(ref)
        keep = [
            i
            for i, (a, b) in enumerate(
                zip(batch.column("a").to_pylist(), batch.column("b").to_pylist())
            )
            if model.predict(a, b, threshold)
        ]
        return batch.take(pa.array(keep, pa.int64())).select(["type", "a", "b"])

    return pairs_ds.map_batches(score, batch_format="pyarrow")
