"""Explicit salted-key aggregation — the skew treatment for hot groupby
keys (head entities: countries, celebrities, boilerplate surfaces).

The engine's FIRST-CHOICE skew treatment is map-side combining: every
hot-path shuffle in this repo runs a per-batch partial aggregation inside
``map_batches`` so a key mentioned 10^9 times ships one bounded row per
block (see stages/entities.py, stages/graph.py, ops/relational.py).
Salting is the complementary tool for when a per-batch combiner is NOT
available — built-in vectorized aggregates applied directly to raw rows,
or holistic per-group functions — and a sort/hash shuffle would land every
row of a hot key on ONE reducer partition:

* stage 1 groups by ``(keys..., _salt)`` with ``_salt = row_index %
  salt_buckets`` — a hot key's rows splinter across ``salt_buckets``
  reducer partitions, bounding any single reducer's share to ~1/buckets;
* stage 2 merges the per-salt partials with the aggregate's combine form
  (count -> sum, sum -> sum, min -> min, max -> max) — input is at most
  ``distinct_keys * salt_buckets`` tiny rows, skew-free by construction.

Results are EXACTLY equal to the unsalted aggregate for these algebraic
kinds (count/sum over ints, min/max over anything): merge order cannot
change the value, so outputs stay deterministic and oracle-hashable.
(Float sums are order-sensitive in the last ulps — scale to integers
first, the repo-wide convention, if a float sum must be hash-compared.)

The reference has no distributed analog (single-process dict counters,
src/ollama_entity_extraction pipelines); the salting pattern follows the
standard web-scale treatment for head-entity skew.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: (col, kind, alias) spec kinds -> (stage-1 Arrow agg, stage-2 merge agg)
_KINDS = {"count", "sum", "min", "max"}


def salt_batch(batch: pa.Table, salt_buckets: int) -> pa.Table:
    """Append a ``_salt`` column: row-index modulo ``salt_buckets``.

    Position-derived (not content-derived) — any even spread works, since
    stage 2 merges ALL salts of a key; determinism of the final result
    comes from the merge being exact, not from which salt a row got."""
    salt = np.arange(batch.num_rows, dtype=np.int32) % salt_buckets
    return batch.append_column("_salt", pa.array(salt, pa.int32()))


def salted_aggregate(
    ds,
    keys: list[str],
    specs: list[tuple[str, str, str]],
    salt_buckets: int = 64,
):
    """Skew-proof ``ds.groupby(keys)`` for algebraic aggregates.

    ``specs`` is a list of ``(column, kind, alias)`` with kind in
    ``{"count", "sum", "min", "max"}``; returns one row per distinct key
    combination with the aliased aggregate columns, exactly equal to the
    direct groupby (tested).  Use when rows reach the shuffle RAW (no
    combiner): the salt bounds every reducer partition to ~1/salt_buckets
    of the hottest key instead of all of it.
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    for _col, kind, _alias in specs:
        if kind not in _KINDS:
            raise ValueError(f"unsupported aggregate kind: {kind!r}")

    def stage1_agg(col, kind, alias):
        if kind == "count":
            return Count(alias_name=alias)
        return {"sum": Sum, "min": Min, "max": Max}[kind](col, alias_name=alias)

    def stage2_agg(kind, alias):
        # combine form: counts add up, sums add up, extrema nest
        return {"count": Sum, "sum": Sum, "min": Min, "max": Max}[kind](
            alias, alias_name=alias
        )

    partials = (
        ds.map_batches(salt_batch, fn_kwargs={"salt_buckets": salt_buckets},
                       batch_format="pyarrow")
        .groupby(keys + ["_salt"])
        .aggregate(*[stage1_agg(c, k, a) for c, k, a in specs])
    )
    return (
        partials.drop_columns(["_salt"])
        .groupby(keys)
        .aggregate(*[stage2_agg(k, a) for _c, k, a in specs])
    )


def event_type_counts_salted(events_ds, salt_buckets: int = 64):
    """The :func:`..ops.relational.event_type_counts` result computed
    through the SALTED path: 5 distinct event types over the whole events
    table is the canonical hot-key shape (a plain sort shuffle would put
    ~20% of all rows on one reducer).  Shares the oracle with the
    combiner-based variant — both paths must produce identical rows."""
    out = salted_aggregate(
        events_ds,
        ["event_type"],
        [
            ("value", "count", "n_events"),
            ("value", "min", "min_value"),
            ("value", "max", "max_value"),
        ],
        salt_buckets=salt_buckets,
    )

    def to_schema(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "n_events": batch.column("n_events").cast(pa.int64()),
                "min_value": batch.column("min_value"),
                "max_value": batch.column("max_value"),
            }
        )

    return out.map_batches(to_schema, batch_format="pyarrow")
