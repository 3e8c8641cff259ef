"""A7 cross-encoder reranker analog: an actor-pool stage over candidate
PAIR rows (src/methods/TransformerReferenceExtractor.py:91-118 — the
reference scores [context, query] text pairs with a sequence-classification
head and picks matches by score).

The engine shape: candidate pairs stream through ``map_batches`` with a
callable CLASS (model loaded once per actor in ``__init__``, batched
forward per ``__call__``); a tiny groupby then keeps the top-scored
candidate per query — the bi-encoder (ops/ann.py) recalls candidates, the
cross-encoder reranks them.  Deployment::

    pairs.map_batches(CrossEncoderReranker,
                      fn_constructor_kwargs={"model_name": ...},
                      concurrency=(2, 8), batch_size=64, num_gpus=0.25,
                      batch_format="pyarrow")

The real model is import-gated (no torch/transformers here); ``_model``
injects a ``fn(list[tuple[str, str]]) -> list[float]`` scorer for tests.
"""

from __future__ import annotations

import pyarrow as pa


class CrossEncoderReranker:
    """Pair rows (query, candidate) -> + ``score`` column."""

    def __init__(
        self,
        model_name: str = "Alibaba-NLP/gte-multilingual-reranker-base",
        max_length: int = 512,
        _model=None,
    ):
        if _model is None:
            try:
                import torch
                from transformers import (
                    AutoModelForSequenceClassification,
                    AutoTokenizer,
                )
            except ImportError as exc:
                raise NotImplementedError(
                    "transformers/torch are not available in this environment; "
                    "on a real cluster this constructor runs once per actor "
                    "and loads the HF checkpoint (see the real path below)"
                ) from exc
            # the real path: load once per actor (map_batches actor-pool
            # contract), batched forward per __call__
            tokenizer = AutoTokenizer.from_pretrained(model_name)
            hf_model = AutoModelForSequenceClassification.from_pretrained(
                model_name, trust_remote_code=True
            ).eval()

            def _hf_score(pairs: list[tuple[str, str]]) -> list[float]:
                with torch.no_grad():
                    enc = tokenizer(
                        [a for a, _ in pairs],
                        [b for _, b in pairs],
                        padding=True,
                        truncation=True,
                        max_length=max_length,
                        return_tensors="pt",
                    )
                    return hf_model(**enc).logits.view(-1).tolist()

            _model = _hf_score
        self.model = _model

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "query" not in batch.column_names:
            return batch.append_column("score", pa.array([], pa.float64()))
        pairs = list(
            zip(batch.column("query").to_pylist(), batch.column("candidate").to_pylist())
        )
        scores = self.model(pairs)
        return batch.append_column("score", pa.array([float(s) for s in scores], pa.float64()))


def top_candidate_per_query(scored_ds):
    """Keep the best-scored candidate row per query — deterministic ties
    (score desc, candidate asc).  Groups are per-query candidate lists
    (bounded by the recall stage's k), so per-group Python is cheap."""

    def best(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group.column("score").to_pylist(), group.column("candidate").to_pylist()),
            key=lambda t: (-t[0], t[1]),
        )
        q = group.column("query")[0].as_py()
        return pa.table(
            {
                "query": pa.array([q], pa.string()),
                "candidate": pa.array([rows[0][1]], pa.string()),
                "score": pa.array([rows[0][0]], pa.float64()),
            }
        )

    return scored_ds.groupby("query").map_groups(best, batch_format="pyarrow")


def rerank_pairs(pairs_ds, *, concurrency=2, batch_size: int = 256, **ctor):
    """Candidate-pair Dataset (query, candidate) -> scored pairs via the
    actor-pool reranker."""
    return pairs_ds.map_batches(
        CrossEncoderReranker,
        fn_constructor_kwargs=ctor,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
