"""Model-comparison workflow — the reference's daily driver
(src/check_ner_models.py:55-88 runs each candidate model over the same
cached segments and eyeballs the outputs; src/check_performance.py:32-91
scores one extractor against the labeled data).

Here both halves are one distributed workflow: every REGISTRY tagger runs
over the same pages (each model its own actor pool over the shared
extracted-segments Dataset), predictions are scored against the gold
mention table with COUNT-based joins (tp = inner-join count on the exact
span key; fp/fn by difference — no driver-side mention sets), and the
result is one small (model, precision, recall, n_pred, n_gold) table.

Swapping models = editing the ``taggers`` dict, exactly how the
reference's comparison scripts swap model classes.
"""

from __future__ import annotations

import pyarrow as pa

from ..stages.extract import extract_segments_batch
from ..stages.registry import get_tagger


def _mention_keys(ds):
    """mentions-shaped Dataset -> distinct (url, seg_id, start, end, type)
    key rows (the evaluation identity the e2e gates use)."""

    def keys(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "seg_id": pa.array([], pa.int32()),
                    "start": pa.array([], pa.int32()),
                    "end": pa.array([], pa.int32()),
                    "type": pa.array([], pa.string()),
                }
            )
        return (
            batch.select(["url", "seg_id", "start", "end", "type"])
            .group_by(["url", "seg_id", "start", "end", "type"])
            .aggregate([])
        )

    return (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby(["url", "seg_id", "start", "end", "type"])
        .count()
        .select_columns(["url", "seg_id", "start", "end", "type"])
    )


def score_against_gold(pred_ds, gold_ds, *, num_partitions: int | None = None) -> dict:
    """{'tp', 'n_pred', 'n_gold', 'precision', 'recall'} via count-only
    joins — mention sets never land on the driver."""
    import ray

    n_part = num_partitions or min(8, max(4, int(ray.cluster_resources().get("CPU", 4)) // 2))
    pred_keys = _mention_keys(pred_ds).materialize()
    gold_keys = _mention_keys(gold_ds).materialize()
    n_pred = pred_keys.count()
    n_gold = gold_keys.count()
    tp = pred_keys.join(
        gold_keys,
        join_type="inner",
        num_partitions=n_part,
        on=("url", "seg_id", "start", "end", "type"),
    ).count()
    return {
        "tp": tp,
        "n_pred": n_pred,
        "n_gold": n_gold,
        "precision": tp / n_pred if n_pred else 0.0,
        "recall": tp / n_gold if n_gold else 0.0,
    }


def compare_taggers(
    pages_path: str,
    gold_mentions_path: str,
    taggers: dict[str, tuple[str, dict]],
    *,
    concurrency=2,
    batch_size: int = 256,
) -> pa.Table:
    """Run every (registry-name, ctor-kwargs) tagger over the same pages
    and score each against gold; returns the comparison table sorted by
    model name (deterministic)."""
    import ray.data

    segments = (
        ray.data.read_parquet(pages_path)
        .map_batches(extract_segments_batch, batch_format="pyarrow")
        .materialize()  # shared input: extract once, tag N times
    )
    gold = ray.data.read_parquet(gold_mentions_path)

    rows = []
    for model_name in sorted(taggers):
        reg_name, kwargs = taggers[model_name]
        pred = segments.map_batches(
            get_tagger(reg_name),
            fn_constructor_kwargs=kwargs,
            concurrency=concurrency,
            batch_size=batch_size,
            batch_format="pyarrow",
        )
        s = score_against_gold(pred, gold)
        rows.append(
            {
                "model": model_name,
                "precision": s["precision"],
                "recall": s["recall"],
                "n_pred": s["n_pred"],
                "n_gold": s["n_gold"],
            }
        )
    return pa.Table.from_pylist(rows)
