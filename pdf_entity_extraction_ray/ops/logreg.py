"""Distributed logistic-regression training (IRLS / Newton) over the
``documents`` table — the quality-classifier training step web-scale
curation pipelines run after heuristic gating (a fastText/LR-style
"looks-like-curated-text" scorer trained on rule labels, then applied to
the whole corpus).

Engine shape — the classic distributed GLM fit:

* **one streaming pass per Newton round**: each batch computes the exact
  per-batch gradient ``X'(y-p)`` and Hessian ``X'WX`` partials (d and
  d x d float64 sums, d = 7 features) in two matmuls and emits ONE row.
  The corpus never leaves the workers; there is NO shuffle anywhere.
* **bounded deterministic driver fold**: the driver folds
  O(blocks x d^2) floats per round, sorted by each batch's minimum
  doc_id (the ``ops/kmeans`` fold-order pattern) so repeated runs are
  bit-identical regardless of block arrival order, then solves the
  (d x d) ridge-damped Newton system locally.
* **coefficients re-broadcast by closure capture** (7 floats).
* **fixed iteration count** (no data-dependent convergence test) so the
  distributed run and the single-process gold mirror execute the same
  arithmetic; outputs land on the repo-wide ppm grid (order-noise
  ~1e-12 vs the 1e-6 grid).

Scoring (`logreg_score`) is a stateless streaming ``map_batches`` —
coefficient table broadcast by closure, one matmul per batch.

At 100 TB: ``n_iter`` full passes (8 by default) with kilobyte driver
state and zero exchanges — the op scales exactly as far as a plain
``map_batches`` count does.  Labels come from the deterministic
C4/Gopher-style ``keep`` rule (`ops/text.quality_batch`), making the
whole fit a pure function of the input table; ridge damping keeps the
optimum finite even though rule labels are linearly separable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import DIGIT_RE, PUNCT_RE, TOKEN_RE

FEATURES = (
    "intercept",
    "log_chars",
    "log_tokens",
    "mean_token_len",
    "punct_ratio",
    "digit_ratio",
    "upper_ratio",
)
RIDGE = 1.0
N_ITER = 8


def _design_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(X, y) for one Arrow batch.  Features are cheap integer-count
    ratios (the quality-scoring ingredients); the label is the
    deterministic `quality_batch` keep rule inlined."""
    texts = batch.column("text").to_pylist()
    n = len(texts)
    n_chars = np.empty(n)
    n_tokens = np.empty(n)
    n_punct = np.empty(n)
    n_digits = np.empty(n)
    n_upper = np.empty(n)
    tok_chars = np.empty(n)
    for i, t in enumerate(texts):
        toks = TOKEN_RE.findall(t)
        n_chars[i] = len(t)
        n_tokens[i] = len(toks)
        n_punct[i] = len(PUNCT_RE.findall(t))
        n_digits[i] = len(DIGIT_RE.findall(t))
        n_upper[i] = sum(1 for c in t if c.isupper())
        tok_chars[i] = sum(len(w) for w in toks)
    denom = np.maximum(n_chars, 1.0)
    X = np.column_stack(
        [
            np.ones(n),
            np.log1p(n_chars),
            np.log1p(n_tokens),
            tok_chars / np.maximum(n_tokens, 1.0),
            n_punct / denom,
            n_digits / denom,
            n_upper / denom,
        ]
    )
    # label: Gopher-style min-length gate (threshold at the synthetic
    # corpus's token median so classes are balanced) AND NOT punct_heavy
    y = ((n_tokens >= 50) & (n_tokens <= 100000) & ~(n_punct * 10 > n_chars)).astype(
        np.float64
    )
    return X, y


def _newton_partials(batch: pa.Table, beta: np.ndarray) -> pa.Table:
    d = len(FEATURES)
    if batch.num_rows == 0:
        return pa.table(
            {
                "grad": pa.array([], pa.list_(pa.float64())),
                "hess": pa.array([], pa.list_(pa.float64())),
                "first_id": pa.array([], pa.int64()),
            }
        )
    X, y = _design_matrix(batch)
    p = 1.0 / (1.0 + np.exp(-(X @ beta)))
    w = p * (1.0 - p)
    grad = X.T @ (y - p)
    hess = X.T @ (X * w[:, None])
    first = int(pc.min(batch.column("doc_id")).as_py())
    return pa.table(
        {
            "grad": pa.array([grad.tolist()], pa.list_(pa.float64())),
            "hess": pa.array([hess.reshape(d * d).tolist()], pa.list_(pa.float64())),
            "first_id": pa.array([first], pa.int64()),
        }
    )


def train_logreg(
    docs_ds,
    *,
    n_iter: int = N_ITER,
    ridge: float = RIDGE,
) -> pa.Table:
    """Fit the quality classifier; returns ``(feature, coef_ppm)`` with
    coefficients on the ppm grid (floor, the repo's float-hash rule)."""
    d = len(FEATURES)
    beta = np.zeros(d)
    ds = docs_ds.select_columns(["doc_id", "text"])

    for _ in range(n_iter):
        B = beta  # rebind so the closure captures THIS round's vector

        rows = []
        for b in ds.map_batches(
            lambda batch: _newton_partials(batch, B), batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            rows.extend(
                zip(
                    b.column("first_id").to_pylist(),
                    b.column("grad").to_pylist(),
                    b.column("hess").to_pylist(),
                )
            )
        rows.sort(key=lambda r: r[0])  # deterministic fold order
        grad = np.zeros(d)
        hess = np.zeros((d, d))
        for _fid, g, h in rows:
            grad += np.asarray(g)
            hess += np.asarray(h).reshape(d, d)
        beta = beta + np.linalg.solve(
            hess + ridge * np.eye(d), grad - ridge * beta
        )

    return pa.table(
        {
            "feature": pa.array(FEATURES, pa.string()),
            "coef_ppm": pa.array(np.floor(beta * 1e6).astype(np.int64), pa.int64()),
        }
    )


def logreg_score(docs_ds, coef_table: pa.Table):
    """(doc_id, text) -> (doc_id, score_ppm, pred) under a trained
    coefficient table — stateless streaming scoring, coefficients
    broadcast by closure (7 floats)."""
    order = {f: i for i, f in enumerate(FEATURES)}
    beta = np.zeros(len(FEATURES))
    for f, c in zip(
        coef_table.column("feature").to_pylist(),
        coef_table.column("coef_ppm").to_pylist(),
    ):
        beta[order[f]] = c / 1e6

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "score_ppm": pa.array([], pa.int64()),
                    "pred": pa.array([], pa.bool_()),
                }
            )
        X, _ = _design_matrix(batch)
        p = 1.0 / (1.0 + np.exp(-(X @ beta)))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "score_ppm": pa.array(np.floor(p * 1e6).astype(np.int64), pa.int64()),
                "pred": pa.array(p >= 0.5),
            }
        )

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def logreg_reference(parquet_path: str, *, n_iter: int = N_ITER, ridge: float = RIDGE):
    """Single-process gold mirror: identical arithmetic over one batch
    (fold order trivially deterministic).  Returns (coef table,
    score table) for the oracle parquet files."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path, columns=["doc_id", "text"])
    tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("doc_id", "ascending")]))
    d = len(FEATURES)
    X, y = _design_matrix(tbl)
    beta = np.zeros(d)
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-(X @ beta)))
        w = p * (1.0 - p)
        grad = X.T @ (y - p)
        hess = X.T @ (X * w[:, None])
        beta = beta + np.linalg.solve(hess + ridge * np.eye(d), grad - ridge * beta)
    coef_ppm = np.floor(beta * 1e6).astype(np.int64)
    coefs = pa.table(
        {
            "feature": pa.array(FEATURES, pa.string()),
            "coef_ppm": pa.array(coef_ppm, pa.int64()),
        }
    )
    # score with the PUBLISHED (ppm-quantized) coefficients — exactly what
    # logreg_score applies, so distributed scoring is byte-comparable
    p = 1.0 / (1.0 + np.exp(-(X @ (coef_ppm / 1e6))))
    scores = pa.table(
        {
            "doc_id": tbl.column("doc_id"),
            "score_ppm": pa.array(np.floor(p * 1e6).astype(np.int64), pa.int64()),
            "pred": pa.array(p >= 0.5),
        }
    )
    return coefs, scores


def write_gold_logreg(parquet_path: str, out_dir: str) -> None:
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    coefs, scores = logreg_reference(parquet_path)
    pq.write_table(coefs, f"{out_dir}/gold_logreg_coefs.parquet")
    pq.write_table(scores, f"{out_dir}/gold_logreg_scores.parquet")
