"""N-gram language-model perplexity scoring — the CCNet-style quality
filter (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data"): train a count-based LM, score every
document by perplexity, keep the low-perplexity (fluent) tail.

Engine shape
------------
* **Training is ONE exact count groupby**: per-batch ``Counter``
  combiner over 1..order-gram occurrences -> ``groupby(gram).sum`` —
  integer counts, so the LM table is exactly reproducible on any
  engine.  ``min_count`` pruning bounds the table; pruning is
  PREFIX-CLOSED (every occurrence of an n-gram contains its (n-1)-gram
  prefix, so ``count(prefix) >= count(gram)`` and a surviving gram's
  backoff denominator always survives too) — the property the scorer
  relies on.
* **Scoring is a stateless streaming ``map_batches``**: the pruned
  count table rides into each actor once (the tfidf-style bounded
  broadcast — at web scale cap it with ``min_count``/``max_grams``,
  exactly how CCNet ships its KenLM binary to workers), tokens stream
  through stupid-backoff (Brants et al. 2007) lookups.  Per-document
  log-prob sums run in token order with ``math.log`` in BOTH the
  distributed scorer and the single-process mirror (shared kernel
  below), so scores are bit-identical before the ppm floor — the
  oracle hash-gates them exactly.

Perplexity = exp(-mean token log-prob); OOV tokens score
``1 / (total_tokens + 1)`` at the unigram level (deterministic, no
discounting hyper-parameters).
"""

from __future__ import annotations

import math
from collections import Counter

import pyarrow as pa

from .text import TOKEN_RE

BACKOFF = 0.4  # stupid-backoff factor (Brants et al. 2007)


# ---------------------------------------------------------------------------
# shared kernels (distributed stages and the gold mirror call THESE — the
# distributed MACHINERY is what the oracle gate tests)
# ---------------------------------------------------------------------------


def _grams(tokens: list[str], order: int) -> Counter:
    out: Counter = Counter()
    for n in range(1, order + 1):
        for i in range(len(tokens) - n + 1):
            out[" ".join(tokens[i : i + n])] += 1
    return out


class _LM:
    """Lookup-side state built from a (gram, n, count) table."""

    def __init__(self, lm_table: pa.Table, order: int):
        self.order = order
        grams = lm_table.column("gram").to_pylist()
        counts = lm_table.column("count").to_pylist()
        ns = lm_table.column("n").to_pylist()
        self.count = dict(zip(grams, counts))
        self.total = sum(c for c, n in zip(counts, ns) if n == 1)
        self.p_unk = 1.0 / (self.total + 1)

    def logprob(self, tokens: list[str]) -> float:
        """Sum of per-token stupid-backoff log-probs, in token order."""
        lp = 0.0
        for i, w in enumerate(tokens):
            factor = 1.0
            p = None
            for n in range(min(self.order, i + 1), 0, -1):
                gram = " ".join(tokens[i - n + 1 : i + 1])
                c = self.count.get(gram)
                if c:
                    if n == 1:
                        p = c / self.total
                    else:
                        # prefix-closed pruning: the context count exists
                        p = c / self.count[" ".join(tokens[i - n + 1 : i])]
                    break
                factor *= BACKOFF
            if p is None:
                p = self.p_unk
                # factor already accumulated through every backoff level
            lp += math.log(factor * p)
        return lp

    def score(self, tokens: list[str]) -> tuple[int, int, int]:
        """(n_tokens, logprob_ppm, ppl_ppm) — floor-ppm integers."""
        n = len(tokens)
        if n == 0:
            return 0, 0, 10**6
        lp = self.logprob(tokens)
        ppl = math.exp(-lp / n)
        return n, math.floor(lp * 1e6), math.floor(ppl * 1e6)


def _tokenize(text: str) -> list[str]:
    return TOKEN_RE.findall(text.lower())


# ---------------------------------------------------------------------------
# distributed trainer + scorer
# ---------------------------------------------------------------------------


def train_ngram_lm(docs_ds, order: int = 3, min_count: int = 2) -> "object":
    """(gram, n, count) Dataset: exact 1..order-gram counts with
    ``min_count`` pruning (prefix-closed, see module docstring)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for t in batch.column("text").to_pylist():
            counts.update(_grams(_tokenize(t), order))
        grams = list(counts)
        return pa.table(
            {
                "gram": pa.array(grams, pa.string()),
                "n": pa.array([g.count(" ") + 1 for g in grams], pa.int64()),
                "count": pa.array([counts[g] for g in grams], pa.int64()),
            }
        )

    counted = (
        docs_ds.select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("count", alias_name="count"))
        .map_batches(
            lambda b: pa.table(
                {
                    "gram": b.column("gram"),
                    "n": pa.array(
                        [g.count(" ") + 1 for g in b.column("gram").to_pylist()],
                        pa.int64(),
                    ),
                    "count": b.column("count"),
                }
            ).filter(pc.greater_equal(b.column("count"), min_count))
            if b.num_rows
            else pa.table(
                {
                    "gram": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "count": pa.array([], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    return counted


class PerplexityScorer:
    """Actor-pool stage: LM dict built once per actor in ``__init__``;
    per-batch work is pure lookups through the shared kernel."""

    def __init__(self, lm_table: pa.Table, order: int = 3):
        self.lm = _LM(lm_table, order)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_tok, lp_ppm, ppl_ppm = [], [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            n, lp, ppl = self.lm.score(_tokenize(text))
            ids.append(doc_id)
            n_tok.append(n)
            lp_ppm.append(lp)
            ppl_ppm.append(ppl)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "logprob_ppm": pa.array(lp_ppm, pa.int64()),
                "ppl_ppm": pa.array(ppl_ppm, pa.int64()),
            }
        )


def perplexity_score(
    docs_ds, lm_table: pa.Table, order: int = 3, concurrency: int = 2, batch_size: int = 256
):
    """Stream the corpus through :class:`PerplexityScorer` — no shuffle;
    the LM table rides into each actor once."""
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        PerplexityScorer,
        fn_constructor_kwargs={"lm_table": lm_table, "order": order},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# single-process gold mirror
# ---------------------------------------------------------------------------


def write_gold_ngram_lm(
    docs_parquet: str, out_dir: str, order: int = 3, min_count: int = 2
) -> None:
    """Single-process gold: count table + per-doc perplexities, no Ray
    anywhere — what the distributed ops must reproduce byte-exactly."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(docs_parquet, columns=["doc_id", "text"])
    t = t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))
    counts: Counter = Counter()
    doc_tokens: list[tuple[int, list[str]]] = []
    for doc_id, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        toks = _tokenize(text)
        counts.update(_grams(toks, order))
        doc_tokens.append((doc_id, toks))
    grams = sorted(g for g, c in counts.items() if c >= min_count)
    lm_table = pa.table(
        {
            "gram": pa.array(grams, pa.string()),
            "n": pa.array([g.count(" ") + 1 for g in grams], pa.int64()),
            "count": pa.array([counts[g] for g in grams], pa.int64()),
        }
    )
    pq.write_table(lm_table, f"{out_dir}/gold_lm.parquet")

    lm = _LM(lm_table, order)
    ids, n_tok, lp_ppm, ppl_ppm = [], [], [], []
    for doc_id, toks in doc_tokens:
        n, lp, ppl = lm.score(toks)
        ids.append(doc_id)
        n_tok.append(n)
        lp_ppm.append(lp)
        ppl_ppm.append(ppl)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "logprob_ppm": pa.array(lp_ppm, pa.int64()),
                "ppl_ppm": pa.array(ppl_ppm, pa.int64()),
            }
        ),
        f"{out_dir}/gold_ppl.parquet",
    )


def ccnet_buckets(docs_ds, lm_table: pa.Table, fractions=(1.0 / 3, 2.0 / 3)):
    """CCNet's actual output step (Wenzek et al. 2020): partition the
    corpus into head / middle / tail by GLOBAL perplexity terciles —
    ``(doc_id, ppl_ppm, bucket)``, lower perplexity = "head" (the slice
    CCNet keeps for LM training).

    Thresholds are EXACT order statistics over the integer ppm scores via
    the ops/relational value-histogram shape: a per-batch
    ``(ppl_ppm -> count)`` combiner, one global count groupby, and a
    single cumulative walk with ``percentile_disc`` semantics (smallest
    value whose cumulative count reaches ``ceil(q * n)``) — so the cut
    points hash-compare exactly against DuckDB ``quantile_disc``.  The
    histogram is bounded by the DISTINCT score count (the ppm grid), not
    the corpus; the bucket assignment itself is a stateless second pass."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    scores = perplexity_score(docs_ds, lm_table).materialize()

    def hist_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "ppl_ppm" not in batch.column_names:
            return pa.table(
                {"ppl_ppm": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        g = batch.select(["ppl_ppm"]).group_by("ppl_ppm").aggregate([("ppl_ppm", "count")])
        return pa.table(
            {
                "ppl_ppm": g.column("ppl_ppm"),
                "n": g.column("ppl_ppm_count").cast(pa.int64()),
            }
        )

    hist = (
        scores.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("ppl_ppm")
        .aggregate(Sum("n", alias_name="n"))
        .sort("ppl_ppm")
    )
    vals: list[int] = []
    cnts: list[int] = []
    for b in hist.iter_batches(batch_format="pyarrow"):
        vals.extend(b.column("ppl_ppm").to_pylist())
        cnts.extend(b.column("n").to_pylist())
    cum = np.cumsum(np.asarray(cnts, dtype=np.int64))
    n = int(cum[-1]) if len(cum) else 0
    cuts = []
    for q in fractions:
        rank = int(np.ceil(q * n)) or 1
        cuts.append(int(np.asarray(vals)[np.searchsorted(cum, rank)]))
    t1, t2 = cuts

    def bucketize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "ppl_ppm" not in batch.column_names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "ppl_ppm": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.string()),
                }
            )
        p = batch.column("ppl_ppm")
        bucket = pc.if_else(
            pc.less_equal(p, t1),
            pa.scalar("head"),
            pc.if_else(pc.less_equal(p, t2), pa.scalar("middle"), pa.scalar("tail")),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "ppl_ppm": p,
                "bucket": bucket,
            }
        )

    return scores.map_batches(bucketize, batch_format="pyarrow")
