"""A8 analog: char_wb(2,4) TF-IDF pair features + a trained, broadcast
linear scorer over candidate pairs (src/methods/LightGBMReferenceExtractor
.py:8-107 re-expressed without the lightgbm/sklearn dependencies).

The reference's shape is train-offline / broadcast-model / infer-in-stream:
``TfidfVectorizer(analyzer="char_wb", ngram_range=(2, 4))`` features of the
combined ``"{context} {query}"`` text (its final feature set,
LightGBMReferenceExtractor.py:50), a binary classifier, and a 0.5
prediction threshold (:106).  Two dependency-free, deterministic
classifiers are provided: a numpy logistic model
(:class:`LinearPairScorer`) and a gradient-boosted-trees model
(:class:`GBDTPairScorer` — the LightGBM-fidelity class, with depth-limited
trees so feature interactions are representable).  Inference for either is
a stateless ``map_batches`` stage reading the ``ray.put`` model once per
task.

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


class GBDTPairScorer:
    """Gradient-boosted-trees pair scorer — the LightGBM-fidelity model
    class (src/methods/LightGBMReferenceExtractor.py:61-107 trains a
    LightGBM binary classifier; this is a deterministic dependency-free
    gradient boosting implementation over the same char_wb TF-IDF pair
    features, with depth-limited trees so feature INTERACTIONS are
    representable — the capability that separates a GBDT from the linear
    stand-in).

    ``trees``: list of trees; each tree is a nested tuple
    ``(feature, (left, right))`` — split on "feature weight > 0"
    (presence) — or a float leaf value.  Scoring sums ``lr * leaf`` over
    trees on top of the prior log-odds.  Everything is a pure function of
    the training data (greedy gain maximization with deterministic
    feature-name tie-breaks), so scores are identical across runs and
    partitions; inference broadcasts the tree list exactly like the
    linear model."""

    def __init__(self, prior: float, lr: float, trees: list, idf: dict[str, float]):
        self.prior = prior
        self.lr = lr
        self.trees = trees
        self.idf = idf

    def decision(self, a: str, b: str) -> float:
        vec = pair_vector(a, b, self.idf)
        z = self.prior + sum(self.lr * _tree_value(t, vec) for t in self.trees)
        return 1.0 / (1.0 + math.exp(-z))

    def predict(self, a: str, b: str, threshold: float = 0.5) -> int:
        return int(self.decision(a, b) > threshold)


def _tree_value(tree, vec: dict[str, float]) -> float:
    while not isinstance(tree, float):
        feature, (left, right) = tree
        tree = right if vec.get(feature, 0.0) > 0.0 else left
    return tree


def _fit_tree(X, grad, hess, features, depth, min_child: int, reg: float):
    """Greedy depth-limited tree on presence-splits with the standard
    second-order gain (xgboost-style: leaf = -G/(H+reg), gain = sum of
    children scores minus parent score).  Deterministic: best gain wins,
    ties break on the lexicographically smallest feature name."""
    import numpy as np

    G, H = float(grad.sum()), float(hess.sum())
    leaf = -G / (H + reg)
    if depth == 0 or len(grad) < 2 * min_child:
        return leaf

    def score(g, h):
        return g * g / (h + reg)

    best = None
    for f in features:
        mask = X[f]
        n_r = int(mask.sum())
        if n_r < min_child or len(grad) - n_r < min_child:
            continue
        g_r, h_r = float(grad[mask].sum()), float(hess[mask].sum())
        gain = score(g_r, h_r) + score(G - g_r, H - h_r) - score(G, H)
        if best is None or gain > best[0] + 1e-12:
            best = (gain, f)
    # zero-gain splits are allowed while depth remains (XOR-style
    # interactions have zero MARGINAL gain on the first split; the
    # deterministic first-feature tie-break makes the choice stable and
    # the ridge term keeps useless leaves near zero)
    if best is None:
        return leaf
    f = best[1]
    mask = X[f]
    sub_features = [x for x in features if x != f]
    left = _fit_tree(X={k: v[~mask] for k, v in X.items()}, grad=grad[~mask],
                     hess=hess[~mask], features=sub_features, depth=depth - 1,
                     min_child=min_child, reg=reg)
    right = _fit_tree(X={k: v[mask] for k, v in X.items()}, grad=grad[mask],
                      hess=hess[mask], features=sub_features, depth=depth - 1,
                      min_child=min_child, reg=reg)
    return (f, (left, right))


def train_gbdt_pair_scorer(
    pairs: list[tuple[str, str]],
    labels: list[int],
    idf: dict[str, float],
    *,
    rounds: int = 30,
    lr: float = 0.3,
    depth: int = 2,
    min_child: int = 1,
    reg: float = 1.0,
) -> GBDTPairScorer:
    """Offline GBDT trainer (the reference trains LightGBM offline on
    driver-side sample data too, LightGBMReferenceExtractor.py:112-140):
    logistic-loss gradient boosting with second-order leaf values over
    presence-binarized char_wb features.  Deterministic; the fitted model
    ships by ``ray.put`` for in-stream inference."""
    import numpy as np

    vecs = [pair_vector(a, b, idf) for a, b in pairs]
    features = sorted({t for v in vecs for t in v})
    X = {
        f: np.array([v.get(f, 0.0) > 0.0 for v in vecs], dtype=bool) for f in features
    }
    y = np.asarray(labels, dtype=np.float64)
    p0 = min(max(float(y.mean()), 1e-6), 1 - 1e-6)
    prior = math.log(p0 / (1 - p0))
    F = np.full(len(y), prior)
    trees: list = []
    for _ in range(rounds):
        p = 1.0 / (1.0 + np.exp(-F))
        grad = p - y           # dL/dF for logistic loss
        hess = p * (1.0 - p)
        tree = _fit_tree(X, grad, hess, features, depth, min_child, reg)
        trees.append(tree)
        contrib = np.array([_tree_value(tree, v) for v in vecs])
        F = F + lr * contrib
    return GBDTPairScorer(prior, lr, trees, idf)


def score_candidate_pairs(pairs_ds, scorer, threshold: float = 0.5):
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
