"""Relational operator demonstrations over the TPC-H-ish tables — the
engine-core coverage (groupby-aggregate, broadcast join, sort/limit,
sessionization windows) with exact DuckDB oracles.

Numeric outputs are chosen to hash identically across engines: counts,
integral-valued double sums (exact in fp), min/max (order-free) — never
order-dependent float sums.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def lineitem_agg(lineitem_ds):
    """Pricing-summary-style groupby: per (returnflag, linestatus) counts +
    exact sums/extrema.  Two-stage: per-batch Arrow ``group_by`` combiner,
    then the small global groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_quantity", "count"), ("l_extendedprice", "min"), ("l_extendedprice", "max")]
        )
        return pa.table(
            {
                "l_returnflag": g.column("l_returnflag"),
                "l_linestatus": g.column("l_linestatus"),
                "sum_qty": g.column("l_quantity_sum"),
                "n_rows": g.column("l_quantity_count").cast(pa.int64()),
                "min_price": g.column("l_extendedprice_min"),
                "max_price": g.column("l_extendedprice_max"),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": group.column("l_returnflag").slice(0, 1),
                "l_linestatus": group.column("l_linestatus").slice(0, 1),
                "sum_qty": pa.array([pc.sum(group.column("sum_qty")).as_py()], pa.float64()),
                "n_rows": pa.array([pc.sum(group.column("n_rows")).as_py()], pa.int64()),
                "min_price": pa.array([pc.min(group.column("min_price")).as_py()], pa.float64()),
                "max_price": pa.array([pc.max(group.column("max_price")).as_py()], pa.float64()),
            }
        )

    return (
        lineitem_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .map_groups(final, batch_format="pyarrow")
    )


# Build sides at or under this estimated in-memory size broadcast via
# ``ray.put``; larger ones dispatch to the hash-shuffle ``Dataset.join``
# path.  ~256 MB of (int64 key -> short string) dict fits every worker
# heap comfortably; beyond it the per-worker copy cost and driver build
# time favor the shuffle.
BROADCAST_LIMIT_BYTES = 256 * 1024 * 1024


def _join_parts() -> int:
    """Join partition count, capped for local sessions — the ONE
    definition lives in ops/dedup (with the measured justification);
    pass ``num_partitions`` explicitly on a real cluster."""
    from .dedup import _join_partitions

    return _join_partitions()


def _build_side_bytes(ds) -> int:
    """Estimated in-memory bytes of a Dataset (metadata-based for Parquet
    sources — no execution).  FAILS CLOSED: when the size is unknown the
    estimate is +inf-like, so the size-dispatched joins take the shuffle
    path instead of iter_batches-ing an unbounded build side onto the
    driver."""
    try:
        sz = ds.size_bytes()
        return int(sz) if sz else (1 << 62)
    except Exception:
        return 1 << 62


def _shard_pow2(shards: int) -> int:
    """Normalize a shard count UP to a power of two: the shard key is
    ``key & (shards - 1)``, and a non-power-of-two mask silently
    collapses to 2^popcount groups (e.g. shards=100 -> 16), defeating
    the scale knob."""
    return 1 << max(0, (int(shards) - 1).bit_length())


def _disc_rank(q: float, n: int) -> int:
    """DuckDB ``quantile_disc`` rank: the 1-indexed position of the
    smallest value whose cumulative count reaches ``ceil(q * n)`` — THE
    single definition shared by every exact-quantile op (two competing
    epsilon conventions here would let two ops mirror 'the same' oracle
    differently)."""
    import numpy as np

    return int(np.ceil(q * n)) or 1


def _add_shard_col(batch: pa.Table, key_col: str, shards: int) -> pa.Table:
    """Append the coarse ``shard`` column (hash-free: int keys are already
    uniform in the low bits for ids; the mask is the cheap grouping)."""
    if batch.num_rows == 0 or key_col not in batch.column_names:
        return batch
    shard = pc.bit_wise_and(batch.column(key_col), pa.scalar(_shard_pow2(shards) - 1))
    return batch.append_column("shard", shard.cast(pa.int32()))


def orders_by_segment(
    orders_ds, customer_ds, *, broadcast_limit_bytes: int = BROADCAST_LIMIT_BYTES,
    num_partitions: int | None = None,
):
    """orders ⋈ customer on custkey -> per-mktsegment order counts.

    Size-dispatched join strategy: when the customer (build) side's
    estimated size fits ``broadcast_limit_bytes``, the custkey->segment
    map ships once via ``ray.put`` and orders stream through
    ``map_batches`` (no shuffle); a larger build side dispatches to the
    hash-shuffle ``Dataset.join`` path (:func:`orders_by_segment_join`)
    automatically.  Both paths produce identical rows (tested)."""
    if _build_side_bytes(customer_ds) > broadcast_limit_bytes:
        return orders_by_segment_join(orders_ds, customer_ds, num_partitions=num_partitions)
    import ray

    seg_of: dict[int, str] = {}
    for batch in customer_ds.select_columns(["c_custkey", "c_mktsegment"]).iter_batches(
        batch_format="pyarrow"
    ):
        seg_of.update(
            zip(batch.column("c_custkey").to_pylist(), batch.column("c_mktsegment").to_pylist())
        )
    ref = ray.put(seg_of)

    def partial(batch: pa.Table) -> pa.Table:
        seg = ray.get(ref)
        counts: dict[str, int] = {}
        for ck in batch.column("o_custkey").to_pylist():
            s = seg.get(ck)
            if s is not None:
                counts[s] = counts.get(s, 0) + 1
        return pa.table(
            {
                "c_mktsegment": pa.array(list(counts), pa.string()),
                "n_orders": pa.array(list(counts.values()), pa.int64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": group.column("c_mktsegment").slice(0, 1),
                "n_orders": pa.array([pc.sum(group.column("n_orders")).as_py()], pa.int64()),
            }
        )

    return (
        orders_ds.select_columns(["o_custkey"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .map_groups(final, batch_format="pyarrow")
    )


def orders_by_segment_join(orders_ds, customer_ds, num_partitions: int | None = None):
    """The large-build-side complement of :func:`orders_by_segment`: a
    pruned hash-shuffle ``Dataset.join`` + two-stage aggregation (same
    shape as :func:`lineitems_join_shuffle`)."""
    joined = orders_ds.select_columns(["o_custkey"]).join(
        customer_ds.select_columns(["c_custkey", "c_mktsegment"]),
        join_type="inner",
        num_partitions=num_partitions or _join_parts(),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "c_mktsegment" not in batch.column_names:
            return pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    "n_orders": pa.array([], pa.int64()),
                }
            )
        g = batch.group_by("c_mktsegment").aggregate([([], "count_all")])
        return pa.table(
            {
                "c_mktsegment": g.column("c_mktsegment"),
                "n_orders": g.column("count_all").cast(pa.int64()),
            }
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .sum("n_orders")
        .rename_columns({"sum(n_orders)": "n_orders"})
    )


def top_orders(orders_ds, k: int = 10):
    """Top-k orders by (o_totalprice desc, o_orderkey asc) — sort + limit.
    Output is the integer key column only (floats stay out of the hash)."""
    top = orders_ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)
    return top.select_columns(["o_orderkey"])


def supplier_counts_by_region(supplier_ds, nation_ds, region_ds):
    """supplier ⋈ nation ⋈ region -> per-region supplier counts
    (two chained broadcast joins of the tiny dimension tables)."""
    import ray

    nation_region: dict[int, int] = {}
    for batch in nation_ds.iter_batches(batch_format="pyarrow"):
        nation_region.update(
            zip(batch.column("n_nationkey").to_pylist(), batch.column("n_regionkey").to_pylist())
        )
    region_name: dict[int, str] = {}
    for batch in region_ds.iter_batches(batch_format="pyarrow"):
        region_name.update(
            zip(batch.column("r_regionkey").to_pylist(), batch.column("r_name").to_pylist())
        )
    ref = ray.put((nation_region, region_name))

    def partial(batch: pa.Table) -> pa.Table:
        nr, rn = ray.get(ref)
        counts: dict[str, int] = {}
        for nk in batch.column("s_nationkey").to_pylist():
            name = rn.get(nr.get(nk))
            if name is not None:
                counts[name] = counts.get(name, 0) + 1
        return pa.table(
            {
                "r_name": pa.array(list(counts), pa.string()),
                "n_suppliers": pa.array(list(counts.values()), pa.int64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "r_name": group.column("r_name").slice(0, 1),
                "n_suppliers": pa.array([pc.sum(group.column("n_suppliers")).as_py()], pa.int64()),
            }
        )

    return (
        supplier_ds.select_columns(["s_nationkey"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("r_name")
        .map_groups(final, batch_format="pyarrow")
    )


def event_sessions(events_ds, gap_minutes: int = 30, shards: int = 256):
    """Per-user sessionization: a session breaks when the gap between
    consecutive events exceeds ``gap_minutes`` — the windowed-aggregate
    shape the reference lacks (SURVEY §2.9).

    Users are grouped through a COARSE shard (``hash(user) % shards``) so
    ``map_groups`` batches ~n_users/shards users per Python call instead
    of paying per-user overhead; inside a shard the whole computation is
    vectorized numpy (lexsort by (user, ts), one diff, one boundary sum
    per user via ``reduceat``)."""
    import numpy as np

    gap_us = gap_minutes * 60 * 1_000_000

    def add_shard(batch: pa.Table) -> pa.Table:
        return _add_shard_col(batch, "user_id", shards)

    def shard_sessions(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "user_id" not in group.column_names:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                }
            )
        users = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts = group.column("ts").cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, users))
        users, ts = users[order], ts[order]
        # boundaries of each user's run in the sorted arrays
        starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        # a new session wherever the gap to the previous event (same user)
        # exceeds the threshold; user-run starts always begin a session
        new_session = np.r_[True, np.diff(ts) > gap_us]
        new_session[starts] = True
        counts = np.diff(np.r_[starts, len(users)])
        n_sessions = np.add.reduceat(new_session.astype(np.int64), starts)
        return pa.table(
            {
                "user_id": pa.array(users[starts], pa.int64()),
                "n_events": pa.array(counts, pa.int64()),
                "n_sessions": pa.array(n_sessions, pa.int64()),
            }
        )

    return (
        events_ds.select_columns(["user_id", "ts"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: shard_sessions(g.drop_columns(["shard"])), batch_format="pyarrow"
        )
    )


def event_type_counts(events_ds):
    """Distinct-ish aggregate: per event_type count + value extrema."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("event_type").aggregate(
            [("value", "count"), ("value", "min"), ("value", "max")]
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "n_events": g.column("value_count").cast(pa.int64()),
                "min_value": g.column("value_min"),
                "max_value": g.column("value_max"),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": group.column("event_type").slice(0, 1),
                "n_events": pa.array([pc.sum(group.column("n_events")).as_py()], pa.int64()),
                "min_value": pa.array([pc.min(group.column("min_value")).as_py()], pa.float64()),
                "max_value": pa.array([pc.max(group.column("max_value")).as_py()], pa.float64()),
            }
        )

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(final, batch_format="pyarrow")
    )


def events_daily_counts(events_ds):
    """Tumbling 1-day window counts per event_type (the windowed-aggregate
    engine op; two-stage)."""

    def partial(batch: pa.Table) -> pa.Table:
        days = pc.strftime(batch.column("ts"), format="%Y-%m-%d")
        t = pa.table({"day": days, "event_type": batch.column("event_type")})
        g = t.group_by(["day", "event_type"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "day": g.column("day"),
                "event_type": g.column("event_type"),
                "n_events": g.column("count_all").cast(pa.int64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": group.column("day").slice(0, 1),
                "event_type": group.column("event_type").slice(0, 1),
                "n_events": pa.array([pc.sum(group.column("n_events")).as_py()], pa.int64()),
            }
        )

    return (
        events_ds.select_columns(["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .map_groups(final, batch_format="pyarrow")
    )


def lineitem_recent_agg(sf_dir: str, cutoff: str = "1998-01-01"):
    """Predicate pushdown at the read (rows never leave storage) + agg."""
    import datetime

    import pyarrow.dataset as pads
    import ray.data

    cut = datetime.datetime.fromisoformat(cutoff)
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= cut),
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("l_returnflag").aggregate(
            [("l_quantity", "sum"), ("l_quantity", "count")]
        )
        return pa.table(
            {
                "l_returnflag": g.column("l_returnflag"),
                "sum_qty": g.column("l_quantity_sum"),
                "n_rows": g.column("l_quantity_count").cast(pa.int64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": group.column("l_returnflag").slice(0, 1),
                "sum_qty": pa.array([pc.sum(group.column("sum_qty")).as_py()], pa.float64()),
                "n_rows": pa.array([pc.sum(group.column("n_rows")).as_py()], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .map_groups(final, batch_format="pyarrow")
    )


def parts_by_brand(part_ds):
    """Dimension-table profile: per-brand counts + extrema."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("p_brand").aggregate(
            [("p_retailprice", "max"), ("p_size", "min"), ("p_partkey", "count")]
        )
        return pa.table(
            {
                "p_brand": g.column("p_brand"),
                "n_parts": g.column("p_partkey_count").cast(pa.int64()),
                "max_price": g.column("p_retailprice_max"),
                "min_size": g.column("p_size_min").cast(pa.int32()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_brand": group.column("p_brand").slice(0, 1),
                "n_parts": pa.array([pc.sum(group.column("n_parts")).as_py()], pa.int64()),
                "max_price": pa.array([pc.max(group.column("max_price")).as_py()], pa.float64()),
                "min_size": pa.array([pc.min(group.column("min_size")).as_py()], pa.int32()),
            }
        )

    return (
        part_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .map_groups(final, batch_format="pyarrow")
    )


def top_orders_scalable(orders_ds, k: int = 10):
    """Top-k without a full sort (the scale path for O3): per-batch partial
    top-k combiner, single-group final merge — moves num_blocks*k rows,
    never the table."""

    def partial(batch: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            batch,
            k=min(k, batch.num_rows),
            sort_keys=[("o_totalprice", "descending"), ("o_orderkey", "ascending")],
        )
        return batch.take(idx).select(["o_orderkey", "o_totalprice"])

    def final(batch: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            batch,
            k=min(k, batch.num_rows),
            sort_keys=[("o_totalprice", "descending"), ("o_orderkey", "ascending")],
        )
        return batch.take(idx).select(["o_orderkey"])

    partials = orders_ds.select_columns(["o_orderkey", "o_totalprice"]).map_batches(
        partial, batch_format="pyarrow"
    )
    # the combined partials are tiny (blocks * k rows); batch_size=None
    # feeds them as ONE batch — default batching would chunk >1024-row
    # merges and emit up to k rows per chunk instead of a global top-k
    return partials.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )


def events_hourly_active_users(events_ds):
    """Exact distinct-count window: distinct users per hour.  Two-stage:
    per-batch (hour -> user set) combiner, final set-union count — the
    shuffle moves (hour, user) distinct pairs, not events."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "hour": pc.strftime(batch.column("ts"), format="%Y-%m-%d %H"),
                "user_id": batch.column("user_id"),
            }
        )
        # one Arrow hash aggregation = the distinct-pair combiner (the
        # per-row Python dict-of-sets this replaces was the bottleneck)
        return t.group_by(["hour", "user_id"]).aggregate([]).select(
            ["hour", "user_id"]
        )

    def final(group: pa.Table) -> pa.Table:
        n = len(set(group.column("user_id").to_pylist()))
        return pa.table(
            {
                "hour": group.column("hour").slice(0, 1),
                "active_users": pa.array([n], pa.int64()),
            }
        )

    return (
        events_ds.select_columns(["ts", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("hour")
        .map_groups(final, batch_format="pyarrow")
    )


def lineitems_by_priority(
    lineitem_ds, orders_ds, *, broadcast_limit_bytes: int = BROADCAST_LIMIT_BYTES,
    num_partitions: int | None = None,
):
    """lineitem ⋈ orders on orderkey -> per-priority counts + exact sums.

    Size-dispatched: an orders (build) side within
    ``broadcast_limit_bytes`` ships as a broadcast orderkey->priority map
    (lineitem streams, no shuffle); a larger one dispatches to the
    hash-shuffle path (:func:`lineitems_join_shuffle` — identical output,
    tested)."""
    if _build_side_bytes(orders_ds) > broadcast_limit_bytes:
        return lineitems_join_shuffle(lineitem_ds, orders_ds, num_partitions=num_partitions)
    import ray

    prio: dict[int, str] = {}
    for batch in orders_ds.select_columns(["o_orderkey", "o_orderpriority"]).iter_batches(
        batch_format="pyarrow"
    ):
        prio.update(
            zip(batch.column("o_orderkey").to_pylist(), batch.column("o_orderpriority").to_pylist())
        )
    ref = ray.put(prio)

    def partial(batch: pa.Table) -> pa.Table:
        pmap = ray.get(ref)
        acc: dict[str, list] = {}
        for ok, qty in zip(
            batch.column("l_orderkey").to_pylist(), batch.column("l_quantity").to_pylist()
        ):
            p = pmap.get(ok)
            if p is None:
                continue
            a = acc.setdefault(p, [0, 0.0])
            a[0] += 1
            a[1] += qty
        return pa.table(
            {
                "o_orderpriority": pa.array(list(acc), pa.string()),
                "n_items": pa.array([a[0] for a in acc.values()], pa.int64()),
                "sum_qty": pa.array([a[1] for a in acc.values()], pa.float64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": group.column("o_orderpriority").slice(0, 1),
                "n_items": pa.array([pc.sum(group.column("n_items")).as_py()], pa.int64()),
                "sum_qty": pa.array([pc.sum(group.column("sum_qty")).as_py()], pa.float64()),
            }
        )

    return (
        lineitem_ds.select_columns(["l_orderkey", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .map_groups(final, batch_format="pyarrow")
    )


def lineitems_join_shuffle(lineitem_ds, orders_ds, num_partitions: int | None = None):
    """lineitem ⋈ orders on orderkey -> per-priority counts + sums, via a
    hash-SHUFFLE ``Dataset.join`` — the large-large path where neither side
    is broadcastable (the 100-TB complement of
    :func:`lineitems_by_priority`'s dimension-table broadcast).

    Columns are pruned to the join key + payloads before the shuffle, and
    the aggregation is two-stage after the join (per-batch Arrow combiner,
    then a tiny groupby), so the exchanges move only what they must."""
    n_part = num_partitions or _join_parts()
    joined = lineitem_ds.select_columns(["l_orderkey", "l_quantity"]).join(
        orders_ds.select_columns(["o_orderkey", "o_orderpriority"]),
        join_type="inner",
        num_partitions=n_part,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_orderpriority" not in batch.column_names:
            return pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "n_items": pa.array([], pa.int64()),
                    "sum_qty": pa.array([], pa.float64()),
                }
            )
        g = batch.group_by(["o_orderpriority"]).aggregate(
            [("l_quantity", "count"), ("l_quantity", "sum")]
        )
        return pa.table(
            {
                "o_orderpriority": g.column("o_orderpriority"),
                "n_items": g.column("l_quantity_count").cast(pa.int64()),
                "sum_qty": g.column("l_quantity_sum"),
            }
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .sum(["n_items", "sum_qty"])
        .rename_columns({"sum(n_items)": "n_items", "sum(sum_qty)": "sum_qty"})
    )


def events_sliding_active_users(events_ds, window_days: int = 3):
    """SLIDING-window distinct users: for each day D, users active in the
    ``window_days``-day window ending at D — the overlapping-window
    complement of :func:`events_daily_counts`'s tumbling day.

    Scale shape: each event explodes to the ``window_days`` window-end
    days it contributes to (bounded fan-out), then the same
    distinct-pair combiner + groupby as the hourly-active-users op — the
    shuffle moves one (day, user) row per distinct pair per block."""
    def explode_days(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "ts" not in batch.column_names:
            return pa.table(
                {"day": pa.array([], pa.string()), "user_id": pa.array([], pa.int64())}
            )
        # fully vectorized: floor to day once, then one duration-add +
        # strftime per window offset (bounded fan-out), no per-row Python
        day0 = pc.floor_temporal(batch.column("ts"), unit="day")
        uid = batch.column("user_id")
        parts = [
            pa.table(
                {
                    "day": pc.strftime(
                        pc.add(day0, pa.scalar(off * 86_400_000_000, pa.duration("us"))),
                        format="%Y-%m-%d",
                    ),
                    "user_id": uid,
                }
            )
            for off in range(window_days)
        ]
        # per-batch distinct (day, user) pairs — the combiner
        return pa.concat_tables(parts).group_by(["day", "user_id"]).aggregate([])

    def partial_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "day" not in batch.column_names:
            return pa.table(
                {"day": pa.array([], pa.string()), "active_users": pa.array([], pa.int64())}
            )
        g = batch.group_by("day").aggregate([("user_id", "count_distinct")])
        return pa.table(
            {
                "day": g.column("day"),
                "active_users": g.column("user_id_count_distinct").cast(pa.int64()),
            }
        )

    # groupby the PAIRS first so each (day, user) is globally unique, then
    # count per day within the sorted output via a final partial+sum
    distinct_pairs = (
        events_ds.select_columns(["user_id", "ts"])
        .map_batches(explode_days, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .count()
        .select_columns(["day", "user_id"])
    )
    return (
        distinct_pairs.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("day")
        .sum("active_users")
        .rename_columns({"sum(active_users)": "active_users"})
    )


def events_asof_prev(events_ds, shards: int = 256):
    """AS-OF self-join: for each event, the timestamp of the same user's
    most recent STRICTLY-earlier event (NULL for a user's first event) —
    the point-in-time lookup Ray Data has no built-in for, expressed as a
    composition the brief's custom-operator ladder prescribes:
    hash-co-partition by user (coarse shard), then a fully vectorized
    sorted scan per shard (lexsort + run/block boundary masks — no Python
    row loop).

    Partitioning assumption (documented per the custom-op contract): one
    user's full history fits a shard — the same per-key-locality
    assumption as sessionization; shard count scales with the cluster.
    Equal-timestamp ties are handled exactly like SQL ASOF (the previous
    DISTINCT timestamp), so the output is deterministic even with
    duplicate (user, ts) rows."""
    import numpy as np

    def add_shard(batch: pa.Table) -> pa.Table:
        return _add_shard_col(batch, "user_id", shards)

    def shard_asof(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "user_id" not in group.column_names:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "prev_ts": pa.array([], pa.timestamp("us")),
                }
            )
        user = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts = group.column("ts").cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        eid = np.asarray(group.column("event_id").to_pylist(), dtype=np.int64)
        order = np.lexsort((ts, user))
        u, t, e = user[order], ts[order], eid[order]
        n = len(u)
        idx = np.arange(n)
        new_user = np.r_[True, u[1:] != u[:-1]]
        # a "block" is a run of equal (user, ts); every row of a block has
        # the same as-of predecessor: the last row of the previous block
        new_block = new_user | np.r_[True, t[1:] != t[:-1]]
        block_first = np.maximum.accumulate(np.where(new_block, idx, 0))
        run_first = np.maximum.accumulate(np.where(new_user, idx, 0))
        has_prev = block_first > run_first
        prev = t[np.maximum(block_first - 1, 0)].astype(object)
        prev[~has_prev] = None
        return pa.table(
            {
                "event_id": pa.array(e, pa.int64()),
                "prev_ts": pa.array(prev.tolist(), pa.timestamp("us")),
            }
        )

    return (
        events_ds.select_columns(["event_id", "user_id", "ts"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: shard_asof(g.drop_columns(["shard"])), batch_format="pyarrow"
        )
    )


def events_pairs_within(events_ds, window_minutes: int = 5, shards: int = 256):
    """RANGE self-join: per user, the number of (unordered) event pairs
    whose timestamps lie within ``window_minutes`` of each other — the
    non-equi interval join Ray Data lacks, expressed per the custom-op
    ladder as hash-co-partition by user + a per-user vectorized sorted
    sweep (``searchsorted`` of each user's sorted times against their
    shifted selves — no Python pair loop, O(n log n) per user instead of
    the oracle's O(n^2) join).

    Users with zero qualifying pairs emit no row (matching the SQL inner
    join).  Partitioning assumption: one user's history fits a shard."""
    import numpy as np

    window_us = window_minutes * 60 * 1_000_000

    def add_shard(batch: pa.Table) -> pa.Table:
        return _add_shard_col(batch, "user_id", shards)

    def shard_pairs(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "user_id" not in group.column_names:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_pairs": pa.array([], pa.int64()),
                }
            )
        user = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts = group.column("ts").cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, user))
        u, t = user[order], ts[order]
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], n]
        out_user, out_pairs = [], []
        for s, e in zip(starts, ends):
            seg = t[s:e]  # this user's times, sorted
            # for each event: later same-user events within the window
            reach = np.searchsorted(seg, seg + window_us, side="right")
            n_pairs = int((reach - np.arange(len(seg)) - 1).sum())
            if n_pairs > 0:
                out_user.append(int(u[s]))
                out_pairs.append(n_pairs)
        return pa.table(
            {
                "user_id": pa.array(out_user, pa.int64()),
                "n_pairs": pa.array(out_pairs, pa.int64()),
            }
        )

    return (
        events_ds.select_columns(["user_id", "ts"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: shard_pairs(g.drop_columns(["shard"])), batch_format="pyarrow"
        )
    )


def top_orders_per_customer(orders_ds, k: int = 3, shards: int = 256):
    """Per-group top-k: each customer's ``k`` highest-value orders with
    dense ranks — the grouped complement of :func:`top_orders`'s global
    sort+limit.

    Scale shape: a per-batch combiner keeps at most ``k`` candidate rows
    per customer per block (so the shuffle moves ~k rows per (customer,
    block), never the order history of a hot customer), then customers
    group through a coarse shard and each shard emits its final ranks
    vectorized."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_custkey" not in batch.column_names:
            return pa.table(
                {
                    "o_custkey": pa.array([], pa.int64()),
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_totalprice": pa.array([], pa.float64()),
                }
            )
        cust = np.asarray(batch.column("o_custkey").to_pylist(), dtype=np.int64)
        key = np.asarray(batch.column("o_orderkey").to_pylist(), dtype=np.int64)
        price = np.asarray(batch.column("o_totalprice").to_pylist(), dtype=np.float64)
        # sort by (cust, -price, key) then keep first k of each cust run
        order = np.lexsort((key, -price, cust))
        cust, key, price = cust[order], key[order], price[order]
        starts = np.r_[True, cust[1:] != cust[:-1]]
        pos = np.arange(len(cust)) - np.maximum.accumulate(np.where(starts, np.arange(len(cust)), 0))
        keep = pos < k
        return pa.table(
            {
                "o_custkey": pa.array(cust[keep], pa.int64()),
                "o_orderkey": pa.array(key[keep], pa.int64()),
                "o_totalprice": pa.array(price[keep], pa.float64()),
            }
        )

    def add_shard(batch: pa.Table) -> pa.Table:
        return _add_shard_col(batch, "o_custkey", shards)

    def shard_topk(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "o_custkey" not in group.column_names:
            return pa.table(
                {
                    "o_custkey": pa.array([], pa.int64()),
                    "o_orderkey": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        cust = group.column("o_custkey").combine_chunks().to_numpy(zero_copy_only=False)
        key = np.asarray(group.column("o_orderkey").to_pylist(), dtype=np.int64)
        price = np.asarray(group.column("o_totalprice").to_pylist(), dtype=np.float64)
        order = np.lexsort((key, -price, cust))
        cust, key = cust[order], key[order]
        starts = np.r_[True, cust[1:] != cust[:-1]]
        pos = np.arange(len(cust)) - np.maximum.accumulate(np.where(starts, np.arange(len(cust)), 0))
        keep = pos < k
        return pa.table(
            {
                "o_custkey": pa.array(cust[keep], pa.int64()),
                "o_orderkey": pa.array(key[keep], pa.int64()),
                "rank": pa.array(pos[keep] + 1, pa.int64()),
            }
        )

    return (
        orders_ds.select_columns(["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(lambda g: shard_topk(g.drop_columns(["shard"])), batch_format="pyarrow")
    )


def events_value_quantiles(events_ds, qs: tuple[float, ...] = (0.5, 0.9, 0.99)):
    """EXACT per-event_type discrete quantiles of ``value`` via a
    value-histogram two-stage aggregation — the scale shape for exact
    quantiles: a per-batch ``(event_type, value) -> count`` combiner (one
    row per distinct value per block, so a hot type with 10^9 rows but
    bounded value cardinality ships tiny partials), a global count
    groupby, then a per-type cumulative walk over the (small) histogram.

    ``percentile_disc`` semantics: the quantile is an ELEMENT of the data
    (smallest value whose cumulative count reaches ``ceil(q * n)``), never
    interpolated arithmetic — so float results hash-compare exactly
    against DuckDB's ``quantile_disc``.  For value domains with unbounded
    cardinality, bucket the value first (the histogram stays exact for
    integer/decimal domains; continuous domains get an epsilon-quantile
    with the bucket width as the error bound).

    One shuffle: per-block partial counts go straight to the per-type
    walk — a (type, value) pair split across blocks lands as adjacent
    rows after the in-group sort, and the cumulative rank search is
    indifferent to whether its count arrives as one row or several."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "value": batch.column("value"),
            }
        )
        # count() skips NULLs, so a NULL-value group row would carry n=0
        # and crash the rank walk; NULL values are not quantile candidates
        # (DuckDB quantile_disc skips them too) but the GROUP must still
        # surface, so keep one n=0 marker row per type seen
        g = t.group_by(["event_type", "value"]).aggregate([("value", "count")])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "value": g.column("value"),
                "n": g.column("value_count").cast(pa.int64()),
            }
        )

    def type_quantiles(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "value" not in group.column_names:
            cols = {"event_type": pa.array([], pa.string())}
            for q in qs:
                cols[f"p{round(q * 100)}"] = pa.array([], pa.float64())
            return pa.table(cols)
        idx = pc.sort_indices(
            group, sort_keys=[("event_type", "ascending"), ("value", "ascending")]
        )
        g = group.take(idx)
        et = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        vals = np.asarray(g.column("n").to_pylist(), dtype=np.int64)
        v = np.asarray(g.column("value").to_pylist(), dtype=np.float64)
        starts = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
        ends = np.r_[starts[1:], len(et)]
        out: dict[str, list] = {"event_type": []}
        # round(), not int(): 0.29*100 = 28.999... must label p29, not p28
        for q in qs:
            out[f"p{round(q * 100)}"] = []
        for s, e in zip(starts, ends):
            seg_n = vals[s:e]
            seg_v = v[s:e]
            nz = seg_n > 0  # NULL-value marker rows carry n=0
            seg_n, seg_v = seg_n[nz], seg_v[nz]
            out["event_type"].append(et[s])
            if seg_n.size == 0:
                for q in qs:  # all values NULL: NULL quantiles, row kept
                    out[f"p{round(q * 100)}"].append(None)
                continue
            cum = np.cumsum(seg_n)
            n = cum[-1]
            for q in qs:
                rank = _disc_rank(q, n)
                out[f"p{round(q * 100)}"].append(seg_v[np.searchsorted(cum, rank)])
        cols: dict = {"event_type": pa.array(out["event_type"], pa.string())}
        for q in qs:
            k = f"p{round(q * 100)}"
            cols[k] = pa.array(out[k], pa.float64())
        return pa.table(cols)

    return (
        events_ds.select_columns(["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(type_quantiles, batch_format="pyarrow")
    )


def events_json_agg(events_ds):
    """Semi-structured extraction + aggregate: parse the ``props`` JSON
    column, pull the integer ``k`` field, and aggregate per event_type —
    the everyday "JSON blob rides along in the table" op.

    Parsing is per-batch: ``json.loads`` per value (the general path —
    arbitrary JSON), with the count/sum folded into a per-batch Arrow
    combiner so only one row per (event_type, block) reaches the shuffle.
    A schema-known scalar field could swap in a vectorized RE2
    ``pc.extract_regex`` fast path; the general loads path is kept as the
    honest default (real props payloads nest)."""
    import json

    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        cols = {
            "event_type": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "k_sum": pa.array([], pa.int64()),
            "k_min": pa.array([], pa.int64()),
            "k_max": pa.array([], pa.int64()),
        }
        if batch.num_rows == 0 or "props" not in batch.column_names:
            return pa.table(cols)
        def k_of(p):
            # oracle semantics: json_extract(props,'$.k') is NULL for a
            # NULL blob, unparsable JSON, or a missing field — the row
            # still counts in count(*), only the k-aggregates skip it
            if p is None:
                return None
            try:
                val = json.loads(p).get("k")
            except (ValueError, AttributeError):
                return None
            return int(val) if val is not None else None

        ks = [k_of(p) for p in batch.column("props").to_pylist()]
        t = pa.table(
            {"event_type": batch.column("event_type"), "k": pa.array(ks, pa.int64())}
        )
        g = t.group_by("event_type").aggregate(
            [([], "count_all"), ("k", "sum"), ("k", "min"), ("k", "max")]
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "n": g.column("count_all").cast(pa.int64()),
                "k_sum": g.column("k_sum").cast(pa.int64()),
                "k_min": g.column("k_min").cast(pa.int64()),
                "k_max": g.column("k_max").cast(pa.int64()),
            }
        )

    return (
        events_ds.select_columns(["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("k_sum", alias_name="k_sum"),
            Min("k_min", alias_name="k_min"),
            Max("k_max", alias_name="k_max"),
        )
    )


def lineitem_rollup(lineitem_ds):
    """ROLLUP-style multi-level aggregate: (returnflag, linestatus) ->
    (returnflag) -> grand total, with the sentinel ``'ALL'`` marking
    rolled-up levels (hash-friendlier than NULL across engines).

    Only the FINEST level touches the big table (the usual two-stage
    combiner + small groupby); the coarser levels re-aggregate the finest
    RESULT — a few hundred rows — so the rollup costs one extra tiny
    pass, not extra corpus scans.  Sums stay exact (integral-valued
    doubles are order-free in fp64)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_quantity", "count")]
        )
        return pa.table(
            {
                "l_returnflag": g.column("l_returnflag"),
                "l_linestatus": g.column("l_linestatus"),
                "sum_qty": g.column("l_quantity_sum"),
                "n_rows": g.column("l_quantity_count").cast(pa.int64()),
            }
        )

    finest = (
        lineitem_ds.select_columns(["l_returnflag", "l_linestatus", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("sum_qty", alias_name="sum_qty"), Sum("n_rows", alias_name="n_rows"))
        .materialize()  # small; re-aggregated twice below
    )

    def to_level1(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_returnflag" not in batch.column_names:
            return batch
        return batch.set_column(
            batch.column_names.index("l_linestatus"),
            "l_linestatus",
            pa.array(["ALL"] * batch.num_rows, pa.string()),
        )

    def to_level0(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_returnflag" not in batch.column_names:
            return batch
        t = to_level1(batch)
        return t.set_column(
            t.column_names.index("l_returnflag"),
            "l_returnflag",
            pa.array(["ALL"] * t.num_rows, pa.string()),
        )

    level1 = (
        finest.map_batches(to_level1, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("sum_qty", alias_name="sum_qty"), Sum("n_rows", alias_name="n_rows"))
    )
    level0 = (
        finest.map_batches(to_level0, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("sum_qty", alias_name="sum_qty"), Sum("n_rows", alias_name="n_rows"))
    )
    return finest.union(level1).union(level0)


def events_funnel(events_ds, steps: tuple[str, ...] = ("signup", "view", "click", "purchase"),
                  shards: int = 256):
    """Ordered funnel: how many users performed ``steps[0]``, then
    ``steps[1]`` STRICTLY after it, then ``steps[2]`` after that, ... —
    the conversion query every event pipeline serves.  Greedy
    earliest-match per user (take the first occurrence of each step after
    the previous step's match) is complete: if any ordered subsequence
    exists, the greedy one does, so per-user state is one timestamp.

    Same coarse-shard shape as :func:`event_sessions`: users hash into
    ``shards`` groups so one ``map_groups`` call scans many users; inside
    a shard, per-step rows are (user, ts)-sorted once and each user's
    "first ts after prev" lookup is a bounded binary search.  Emits one
    row per step: (step, event_type, n_users)."""
    import numpy as np

    step_list = list(steps)

    def add_shard(batch: pa.Table) -> pa.Table:
        return _add_shard_col(batch, "user_id", shards)

    def shard_funnel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "user_id" not in group.column_names:
            return pa.table(
                {
                    "step": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        users = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts = group.column("ts").cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        types = np.asarray(group.column("event_type").to_pylist(), dtype=object)
        # per step: (user, ts)-sorted arrays for binary-search probing
        per_step = []
        for st in step_list:
            m = types == st
            u_s, t_s = users[m], ts[m]
            order = np.lexsort((t_s, u_s))
            per_step.append((u_s[order], t_s[order]))
        # step 0: first occurrence per user
        u0, t0 = per_step[0]
        if len(u0) == 0:
            counts = [0] * len(step_list)
            cur_users = np.empty(0, np.int64)
        else:
            first = np.r_[True, u0[1:] != u0[:-1]]
            cur_users, prev_ts = u0[first], t0[first]
            counts = [len(cur_users)]
            for k in range(1, len(step_list)):
                uk, tk = per_step[k]
                lo = np.searchsorted(uk, cur_users, side="left")
                hi = np.searchsorted(uk, cur_users, side="right")
                nxt_u, nxt_t = [], []
                for u, p, a, b in zip(cur_users, prev_ts, lo, hi):
                    j = a + np.searchsorted(tk[a:b], p, side="right")
                    if j < b:
                        nxt_u.append(u)
                        nxt_t.append(tk[j])
                cur_users = np.asarray(nxt_u, dtype=np.int64)
                prev_ts = np.asarray(nxt_t, dtype=np.int64)
                counts.append(len(cur_users))
        return pa.table(
            {
                "step": pa.array(np.arange(1, len(step_list) + 1), pa.int64()),
                "event_type": pa.array(step_list, pa.string()),
                "n_users": pa.array(counts, pa.int64()),
            }
        )

    import ray.data
    from ray.data.aggregate import Sum

    per_shard = (
        events_ds.select_columns(["user_id", "ts", "event_type"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: shard_funnel(g.drop_columns(["shard"])), batch_format="pyarrow"
        )
    )
    # shards partition users, so per-shard counts SUM to the global funnel
    agg = per_shard.groupby(["step", "event_type"]).aggregate(
        Sum("n_users", alias_name="n_users")
    ).materialize()  # <= len(steps) rows
    # an empty events input produces no shard groups at all; the funnel
    # contract (and the SQL mirror's union-all) is one row PER STEP with
    # n_users = 0 — fill the missing steps on the tiny result
    present = {r["step"] for r in agg.take_all()}
    missing = [k for k in range(1, len(step_list) + 1) if k not in present]
    if not missing:
        return agg
    fill = ray.data.from_arrow(
        pa.table(
            {
                "step": pa.array(missing, pa.int64()),
                "event_type": pa.array(
                    [step_list[k - 1] for k in missing], pa.string()
                ),
                "n_users": pa.array([0] * len(missing), pa.int64()),
            }
        )
    )
    return agg.union(fill) if present else fill


def events_retention(events_ds, num_partitions: int | None = None):
    """Cohort retention: users are cohorted by their FIRST active day;
    for each (cohort_day, day_offset) the number of cohort users active
    exactly ``offset`` days after joining — the activation/retention
    matrix every product pipeline reports.

    Three bounded exchanges: per-batch distinct (user, epoch-day)
    combiners feed one groupby that makes the pairs globally distinct
    (user-days, far smaller than raw events); a Min aggregate over those
    same rows yields each user's cohort day; a user-keyed hash join
    brings the cohort day back to the user-day rows, and a two-stage
    count per (cohort_day, offset) emits the matrix.  Every stage's
    volume is bounded by distinct user-days, never raw event count.
    Emits (cohort_day, day_offset, n_users); days are integer epoch
    days so the SQL mirror is exact integer arithmetic."""
    from ray.data.aggregate import Min, Sum

    US_PER_DAY = 86_400_000_000

    def ud_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return pa.table(
                {"user_id": pa.array([], pa.int64()), "day": pa.array([], pa.int64())}
            )
        days = pc.divide(batch.column("ts").cast(pa.int64()), US_PER_DAY)
        t = pa.table({"user_id": batch.column("user_id"), "day": days})
        g = t.group_by(["user_id", "day"]).aggregate([([], "count_all")])
        return g.select(["user_id", "day"])

    ud = (
        events_ds.select_columns(["user_id", "ts"])
        .map_batches(ud_partial, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .count()
        .select_columns(["user_id", "day"])
        .materialize()  # user-day rows; consumed twice (cohort + join)
    )
    cohort = ud.groupby("user_id").aggregate(Min("day", alias_name="cohort_day"))
    n_part = num_partitions or _join_parts()
    joined = ud.join(cohort, join_type="inner", num_partitions=n_part, on=("user_id",))

    def pair_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "cohort_day" not in batch.column_names:
            return pa.table(
                {
                    "cohort_day": pa.array([], pa.int64()),
                    "day_offset": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        t = pa.table(
            {
                "cohort_day": batch.column("cohort_day"),
                "day_offset": pc.subtract(batch.column("day"), batch.column("cohort_day")),
            }
        )
        g = t.group_by(["cohort_day", "day_offset"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "cohort_day": g.column("cohort_day"),
                "day_offset": g.column("day_offset"),
                "n_users": g.column("count_all").cast(pa.int64()),
            }
        )

    return (
        joined.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


def events_daily_anomaly(events_ds):
    """(event_type, day, n_events, is_outlier) — daily event counts per
    type with an EXACT 3-sigma outlier flag (operational anomaly
    detection over the event stream).

    The flag is computed in pure integer arithmetic so it is bit-exact
    across engines: with per-type daily counts ``x_i``, ``n`` days,
    ``S = Σx``, ``Q = Σx²``, the population z-test ``(x-μ)² > 9σ²``
    rewrites to ``(n·x − S)² > 9·(n·Q − S²)`` — no float mean/stddev ever
    materializes (Python ints / DuckDB hugeint; daily counts would need
    to exceed ~10^18 before hugeint overflows).

    Shape: one (day, type) count groupby (combiner-backed), then per-type
    (n, S, Q) folded from the tiny daily table and BROADCAST into a
    stateless flag pass — the daily table itself is never re-shuffled.
    The broadcast is O(distinct event types), corpus-size-independent.
    """
    import ray

    # consumed twice (stats fold + flag pass): materialize the tiny
    # (days x types) table so the count groupby never re-executes
    daily = events_daily_counts(events_ds).materialize()

    def stats_partial(batch: pa.Table) -> pa.Table:
        cols = {
            "event_type": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "s": pa.array([], pa.int64()),
            "q": pa.array([], pa.int64()),
        }
        if batch.num_rows == 0 or "event_type" not in batch.column_names:
            return pa.table(cols)
        x = batch.column("n_events")
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "one": pa.array([1] * batch.num_rows, pa.int64()),
                "x": x,
                "xx": pc.multiply(x, x),
            }
        )
        g = t.group_by("event_type").aggregate(
            [("one", "sum"), ("x", "sum"), ("xx", "sum")]
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "n": g.column("one_sum").cast(pa.int64()),
                "s": g.column("x_sum").cast(pa.int64()),
                "q": g.column("xx_sum").cast(pa.int64()),
            }
        )

    # fold per-type (n, S, Q) on the driver — integer partials, one row
    # per (block, type): exact regardless of arrival order, bounded by
    # the distinct-type count
    stats: dict[str, list[int]] = {}
    for b in daily.map_batches(stats_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for et, n, s, q in zip(
            b.column("event_type").to_pylist(),
            b.column("n").to_pylist(),
            b.column("s").to_pylist(),
            b.column("q").to_pylist(),
        ):
            acc = stats.setdefault(et, [0, 0, 0])
            acc[0] += n
            acc[1] += s
            acc[2] += q
    stats_ref = ray.put(stats)

    def flag(batch: pa.Table) -> pa.Table:
        cols = {
            "event_type": pa.array([], pa.string()),
            "day": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
            "is_outlier": pa.array([], pa.int64()),
        }
        if batch.num_rows == 0 or "event_type" not in batch.column_names:
            return pa.table(cols)
        st = ray.get(stats_ref)
        out = []
        for et, x in zip(
            batch.column("event_type").to_pylist(),
            batch.column("n_events").to_pylist(),
        ):
            n, s, q = st[et]
            # Python ints: exact at any magnitude
            out.append(1 if (n * x - s) ** 2 > 9 * (n * q - s * s) else 0)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": batch.column("day"),
                "n_events": batch.column("n_events"),
                "is_outlier": pa.array(out, pa.int64()),
            }
        )

    return daily.map_batches(flag, batch_format="pyarrow")


def events_value_histogram(events_ds, width: float = 50.0):
    """(event_type, bucket, n) — fixed-width histogram of the event value
    per type (the distribution-profiling pass monitoring/QA runs over a
    metric stream).  ``bucket = floor(value / width)`` on the stored
    double — the same IEEE division and floor in both engines, so bucket
    ids are bit-deterministic; counts are exact integers.

    Two-stage: per-batch Arrow group-by combiner (one row per distinct
    (type, bucket) per block) -> small global groupby-sum.  NULL values
    are dropped (mirroring SQL GROUP BY semantics on a NULL bucket)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        cols = {
            "event_type": pa.array([], pa.string()),
            "bucket": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
        if batch.num_rows == 0 or "value" not in batch.column_names:
            return pa.table(cols)
        t = batch.select(["event_type", "value"]).filter(
            pc.is_valid(batch.column("value"))
        )
        if t.num_rows == 0:
            return pa.table(cols)
        bucket = pc.floor(pc.divide(t.column("value"), pa.scalar(float(width))))
        g = pa.table(
            {"event_type": t.column("event_type"), "bucket": bucket.cast(pa.int64())}
        ).group_by(["event_type", "bucket"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "bucket": g.column("bucket"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    return (
        events_ds.select_columns(["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
    )


def events_transitions(events_ds, shards: int = 256):
    """(prev_type, next_type, n) — global counts of consecutive event-type
    bigrams per user, ordered by (ts, event_id): the Markov-transition
    matrix every behavioral model starts from.

    Same coarse-shard shape as :func:`events_funnel`: users hash into
    ``shards`` groups (the low-bit mask — ids are uniform), one
    ``map_groups`` call lexsorts a whole shard by (user, ts, event_id)
    and takes adjacent pairs where the user matches — a vectorized
    shift-compare, no per-user loop.  Each shard pre-counts its pairs
    (combiner: output is at most |types|^2 rows per shard), so the final
    groupby-sum exchanges a bounded table regardless of event volume."""
    import numpy as np
    from ray.data.aggregate import Sum

    def add_shard(batch: pa.Table) -> pa.Table:
        return _add_shard_col(batch, "user_id", shards)

    def shard_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "prev_type": pa.array([], pa.string()),
                "next_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if group.num_rows < 2 or "user_id" not in group.column_names:
            return empty
        users = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts = group.column("ts").cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        eid = group.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        types = group.column("event_type").combine_chunks()
        order = np.lexsort((eid, ts, users))
        same_user = users[order][1:] == users[order][:-1]
        if not same_user.any():
            return empty
        sorted_types = types.take(pa.array(order, pa.int64()))
        prev_idx = np.flatnonzero(same_user)
        t = pa.table(
            {
                "prev_type": sorted_types.take(pa.array(prev_idx, pa.int64())),
                "next_type": sorted_types.take(pa.array(prev_idx + 1, pa.int64())),
            }
        )
        g = t.group_by(["prev_type", "next_type"]).aggregate([([], "count_all")])
        return g.rename_columns(["prev_type", "next_type", "n"]).set_column(
            2, "n", g.column("count_all").cast(pa.int64())
        )

    return (
        events_ds.select_columns(["event_id", "ts", "user_id", "event_type"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_pairs, batch_format="pyarrow")
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


def orders_running_total(orders_ds, shards: int = 256):
    """(o_custkey, o_orderkey, running_cents) — each customer's cumulative
    spend in exact integer cents, ordered by (o_orderdate, o_orderkey):
    the windowed running total Ray Data has no native operator for.

    Money moves as ``floor(price*100 + 0.5)`` int64 cents so the
    cumulative sum is order-independent exact integer math (float
    cumulation would diverge from any SQL mirror in the last ulp).
    Customers hash into coarse shards; one ``map_groups`` per shard
    lexsorts by (cust, date, key) and computes the per-customer cumsum
    with a segmented offset subtraction (cumsum minus each customer run's
    starting offset, vectorized via repeat) — no per-customer loop, and
    per-shard state is one numpy array."""
    import numpy as np

    def add_shard(batch: pa.Table) -> pa.Table:
        return _add_shard_col(batch, "o_custkey", shards)

    def shard_running(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_custkey": pa.array([], pa.int64()),
                "o_orderkey": pa.array([], pa.int64()),
                "running_cents": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or "o_custkey" not in group.column_names:
            return empty
        cust = group.column("o_custkey").combine_chunks().to_numpy(zero_copy_only=False)
        date = group.column("o_orderdate").cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        key = group.column("o_orderkey").combine_chunks().to_numpy(zero_copy_only=False)
        price = group.column("o_totalprice").combine_chunks().to_numpy(zero_copy_only=False)
        cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        order = np.lexsort((key, date, cust))
        c_s, k_s, v_s = cust[order], key[order], cents[order]
        csum = np.cumsum(v_s)
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
        # offset before each customer run start (0 for the first run)
        run_offsets = np.r_[0, csum[starts[1:] - 1]] if len(starts) > 1 else np.zeros(1, np.int64)
        sizes = np.r_[starts[1:], len(c_s)] - starts
        running = csum - np.repeat(run_offsets, sizes)
        return pa.table(
            {
                "o_custkey": pa.array(c_s),
                "o_orderkey": pa.array(k_s),
                "running_cents": pa.array(running.astype(np.int64)),
            }
        )

    return (
        orders_ds.select_columns(["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_running, batch_format="pyarrow")
    )


def segment_revenue(
    lineitem_ds, orders_ds, customer_ds, *,
    broadcast_limit_bytes: int = BROADCAST_LIMIT_BYTES,
    num_partitions: int | None = None,
):
    """customer ⋈ orders ⋈ lineitem -> per-market-segment exact revenue:
    (c_mktsegment, n_items, revenue_e4) with revenue as
    ``floor(price*100+.5) * (100 - floor(disc*100+.5))`` int64 — units of
    10^-4 dollars, so the three-way join aggregates in exact integer math
    (the TPC-H Q3 family without the date filters).

    Join strategy per level, size-dispatched like
    :func:`lineitems_by_priority`: the custkey->segment map is by
    definition small relative to orders (broadcast when under the limit),
    and the orderkey->segment map likewise vs lineitem; either level
    falls back to a hash-shuffle ``Dataset.join`` when its build side
    exceeds ``broadcast_limit_bytes``.  Broadcast lookups are vectorized
    (``pc.index_in`` against a dictionary, no per-row Python), and the
    revenue aggregation runs as a per-batch combiner before the final
    5-row groupby."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    def _revenue(batch: pa.Table) -> pa.Array:
        price = batch.column("l_extendedprice").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        disc = batch.column("l_discount").combine_chunks().to_numpy(zero_copy_only=False)
        cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        pct = np.floor(disc * 100.0 + 0.5).astype(np.int64)
        return pa.array(cents * (100 - pct), pa.int64())

    # level 1: orders <- customer segment
    if _build_side_bytes(customer_ds) <= broadcast_limit_bytes:
        keys, segs = [], []
        for b in customer_ds.select_columns(["c_custkey", "c_mktsegment"]).iter_batches(
            batch_format="pyarrow"
        ):
            keys.append(b.column("c_custkey").combine_chunks())
            segs.append(b.column("c_mktsegment").combine_chunks())
        cust_ref = ray.put(
            (
                pa.concat_arrays(keys) if keys else pa.array([], pa.int64()),
                pa.concat_arrays(segs) if segs else pa.array([], pa.string()),
            )
        )

        def attach_segment(batch: pa.Table) -> pa.Table:
            ck, cs = ray.get(cust_ref)
            idx = pc.index_in(batch.column("o_custkey"), value_set=ck)
            seg = cs.take(idx)
            return pa.table(
                {"o_orderkey": batch.column("o_orderkey"), "seg": seg}
            ).filter(pc.is_valid(seg))

        orders_seg = orders_ds.select_columns(["o_orderkey", "o_custkey"]).map_batches(
            attach_segment, batch_format="pyarrow"
        )
    else:
        from ..ops.dedup import _join_partitions

        orders_seg = (
            orders_ds.select_columns(["o_orderkey", "o_custkey"])
            .join(
                customer_ds.select_columns(["c_custkey", "c_mktsegment"]),
                join_type="inner",
                num_partitions=num_partitions or _join_partitions(),
                on=("o_custkey",),
                right_on=("c_custkey",),
            )
            .rename_columns({"c_mktsegment": "seg"})
            .select_columns(["o_orderkey", "seg"])
        )

    # level 2: lineitem <- order segment
    if _build_side_bytes(orders_seg) <= broadcast_limit_bytes:
        keys, segs = [], []
        for b in orders_seg.iter_batches(batch_format="pyarrow"):
            if b.num_rows:
                keys.append(b.column("o_orderkey").combine_chunks())
                segs.append(b.column("seg").combine_chunks())
        ord_ref = ray.put(
            (
                pa.concat_arrays(keys) if keys else pa.array([], pa.int64()),
                pa.concat_arrays(segs) if segs else pa.array([], pa.string()),
            )
        )

        def partial(batch: pa.Table) -> pa.Table:
            ok, os = ray.get(ord_ref)
            idx = pc.index_in(batch.column("l_orderkey"), value_set=ok)
            seg = os.take(idx)
            t = pa.table(
                {"seg": seg, "revenue_e4": _revenue(batch)}
            ).filter(pc.is_valid(seg))
            g = t.group_by("seg").aggregate([("revenue_e4", "sum"), ([], "count_all")])
            return pa.table(
                {
                    "c_mktsegment": g.column("seg"),
                    "n_items": g.column("count_all").cast(pa.int64()),
                    "revenue_e4": g.column("revenue_e4_sum").cast(pa.int64()),
                }
            )

        partials = lineitem_ds.select_columns(
            ["l_orderkey", "l_extendedprice", "l_discount"]
        ).map_batches(partial, batch_format="pyarrow")
    else:
        from ..ops.dedup import _join_partitions

        def li_combine(batch: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "l_orderkey": batch.column("l_orderkey"),
                    "revenue_e4": _revenue(batch),
                }
            )
            g = t.group_by("l_orderkey").aggregate(
                [("revenue_e4", "sum"), ([], "count_all")]
            )
            return pa.table(
                {
                    "l_orderkey": g.column("l_orderkey"),
                    "rev": g.column("revenue_e4_sum").cast(pa.int64()),
                    "cnt": g.column("count_all").cast(pa.int64()),
                }
            )

        joined = (
            lineitem_ds.select_columns(["l_orderkey", "l_extendedprice", "l_discount"])
            .map_batches(li_combine, batch_format="pyarrow")
            .groupby("l_orderkey")
            .aggregate(Sum("rev", alias_name="rev"), Sum("cnt", alias_name="cnt"))
            .join(
                orders_seg,
                join_type="inner",
                num_partitions=num_partitions or _join_partitions(),
                on=("l_orderkey",),
                right_on=("o_orderkey",),
            )
        )

        def to_partial(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "seg" not in batch.column_names:
                return pa.table(
                    {
                        "c_mktsegment": pa.array([], pa.string()),
                        "n_items": pa.array([], pa.int64()),
                        "revenue_e4": pa.array([], pa.int64()),
                    }
                )
            g = batch.group_by("seg").aggregate([("rev", "sum"), ("cnt", "sum")])
            return pa.table(
                {
                    "c_mktsegment": g.column("seg"),
                    "n_items": g.column("cnt_sum").cast(pa.int64()),
                    "revenue_e4": g.column("rev_sum").cast(pa.int64()),
                }
            )

        partials = joined.map_batches(to_partial, batch_format="pyarrow")

    return partials.groupby("c_mktsegment").aggregate(
        Sum("n_items", alias_name="n_items"),
        Sum("revenue_e4", alias_name="revenue_e4"),
    )


def events_cube(events_ds):
    """CUBE(event_type, day) in exact integer cents: every rollup cell —
    per (type, day), per type, per day, and grand total — as
    ``(event_type, day, n, sum_cents)`` with ``'<all>'`` marking a
    rolled-up dimension (the OLAP cube materialization Ray Data has no
    native operator for; NULL-free labels keep the hash compare exact).

    Shape: per-batch combiner -> one exact groupby over (type, day) —
    the only exchange proportional to data — then each pre-aggregated
    cell fans out to its 4 cube cells and a second groupby over the
    TINY cell table folds the rollups.  Null values count toward ``n``
    but contribute 0 cents (the SQL ``case`` mirror)."""
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "day": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "sum_cents": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or "ts" not in batch.column_names:
            return empty
        day = pc.strftime(batch.column("ts"), format="%Y-%m-%d")
        vals = batch.column("value").combine_chunks().to_numpy(zero_copy_only=False)
        cents = np.where(
            np.isnan(vals), 0, np.floor(np.nan_to_num(vals) * 100.0 + 0.5)
        ).astype(np.int64)
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": day,
                "cents": pa.array(cents),
            }
        )
        g = t.group_by(["event_type", "day"]).aggregate(
            [("cents", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "day": g.column("day"),
                "n": g.column("count_all").cast(pa.int64()),
                "sum_cents": g.column("cents_sum").cast(pa.int64()),
            }
        )

    def fan_out(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "event_type" not in batch.column_names:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "day": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "sum_cents": pa.array([], pa.int64()),
                }
            )
        et = batch.column("event_type").combine_chunks()
        dy = batch.column("day").combine_chunks()
        n = batch.column("n").combine_chunks()
        s = batch.column("sum_cents").combine_chunks()
        all_lbl = pa.array(["<all>"] * batch.num_rows, pa.string())
        return pa.table(
            {
                "event_type": pa.concat_arrays([et, et, all_lbl, all_lbl]),
                "day": pa.concat_arrays([dy, all_lbl, dy, all_lbl]),
                "n": pa.concat_arrays([n] * 4),
                "sum_cents": pa.concat_arrays([s] * 4),
            }
        )

    return (
        events_ds.select_columns(["event_type", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents"))
        .map_batches(fan_out, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents"))
    )


def parts_copurchase(lineitem_ds, *, min_orders: int = 2, shards: int = 256):
    """Market-basket pair mining: for every unordered part pair, how many
    orders contain BOTH — the co-purchase census recommendation and
    affinity analyses start from (the frequent-2-itemset step of
    Apriori).

    The naive form self-joins lineitem on the order key; this op never
    joins: orders hash into ``shards`` coarse groups (all rows of an
    order land in one group), and inside a shard the (order, part) rows
    are lexsorted once, deduped, and expanded to within-order pairs with
    pure offset arithmetic — no per-order Python loop.  Pair volume is
    sum of k*(k-1)/2 over basket sizes k, which is bounded by the max
    basket size (7 for TPC-H lineitem; a retail-scale basket cap would
    be applied at this same spot), so no key's expansion is quadratic in
    the corpus.  Per-shard partial counts combine before the small final
    groupby; pairs below ``min_orders`` never leave the shard stage
    unaggregated.

    Emits (part_a, part_b, n_orders) with part_a < part_b."""
    import numpy as np
    import ray.data
    from ray.data.aggregate import Sum

    EMPTY = pa.table(
        {
            "part_a": pa.array([], pa.int64()),
            "part_b": pa.array([], pa.int64()),
            "n_orders": pa.array([], pa.int64()),
        }
    )

    def add_shard(batch: pa.Table) -> pa.Table:
        return _add_shard_col(batch, "l_orderkey", shards)

    def shard_pairs(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "l_orderkey" not in group.column_names:
            return EMPTY
        ok = group.column("l_orderkey").cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        pk = group.column("l_partkey").cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        # distinct (order, part): a part twice in one order is one basket item
        keep = np.r_[True, (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])]
        ok, pk = ok[keep], pk[keep]
        n = len(ok)
        if n == 0:
            return EMPTY
        # run-length detect baskets, then expand each row to its later
        # partners in the same basket: row r with position w in a basket
        # of size k pairs with the (k - 1 - w) rows after it
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.diff(np.r_[starts, n])
        idx = np.arange(n)
        within = idx - np.repeat(starts, lens)
        reps = np.repeat(lens, lens) - 1 - within
        total = int(reps.sum())
        if total == 0:
            return EMPTY
        a_idx = np.repeat(idx, reps)
        offs = np.concatenate(([0], np.cumsum(reps)[:-1]))
        b_idx = np.arange(total) - np.repeat(offs, reps) + a_idx + 1
        t = pa.table(
            {
                "part_a": pa.array(pk[a_idx], pa.int64()),
                "part_b": pa.array(pk[b_idx], pa.int64()),
            }
        )
        g = t.group_by(["part_a", "part_b"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "part_a": g.column("part_a"),
                "part_b": g.column("part_b"),
                "n_orders": g.column("count_all").cast(pa.int64()),
            }
        )

    counted = (
        lineitem_ds.select_columns(["l_orderkey", "l_partkey"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_pairs, batch_format="pyarrow")
        .groupby(["part_a", "part_b"])
        .aggregate(Sum("n_orders", alias_name="n_orders"))
    )
    return counted.filter(
        expr=f"n_orders >= {int(min_orders)}"
    )


def events_rfm(events_ds, *, event_type: str = "purchase", n_scores: int = 5):
    """RFM customer segmentation over the event stream: per user the
    recency (last active day), frequency (event count) and monetary
    (lifetime spend, whole dollars) metrics plus their exact quantile
    scores 1..``n_scores`` — the standard marketing-segmentation table.

    Scores use the all-integer tie-respecting rule of
    ``ops.text.length_percentile_filter``: score(v) =
    ``ceil(n_scores * cum(v) / N)`` where cum(v) counts users with
    metric <= v — users sharing a value always share a score (unlike
    ntile), and the arithmetic is integer-exact so the SQL window mirror
    (``count(*) over (order by metric)`` includes peers) hashes
    identically.

    Shape: per-batch (user, day, cents) combiner -> ONE user groupby
    (the only data-proportional exchange) -> per-metric distinct-value
    histograms (driver state is O(distinct days + distinct counts +
    distinct dollar amounts) — metrics are quantized to days / whole
    dollars precisely so this is bounded by value RANGES, not user
    count; a 100-TB run would coarsen the money grid further) -> score
    lookup broadcast into a stateless map.  Null values count toward
    frequency but contribute 0 cents (the SQL ``case`` mirror).

    Emits (user_id, last_day, freq, monetary_dollars, r_score, f_score,
    m_score)."""
    import numpy as np
    import ray
    from ray.data.aggregate import Max, Sum

    DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "day": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or "ts" not in batch.column_names:
            return empty
        mask = pc.equal(batch.column("event_type"), event_type)
        t = batch.filter(mask)
        if t.num_rows == 0:
            return empty
        ts = t.column("ts").cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        vals = t.column("value").combine_chunks().to_numpy(zero_copy_only=False)
        cents = np.where(
            np.isnan(vals), 0, np.floor(np.nan_to_num(vals) * 100.0 + 0.5)
        ).astype(np.int64)
        g = pa.table(
            {
                "user_id": t.column("user_id").cast(pa.int64()),
                "day": pa.array(ts // DAY_US, pa.int64()),
                "cents": pa.array(cents),
            }
        ).group_by(["user_id"]).aggregate(
            [("day", "max"), ("cents", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "day": g.column("day_max"),
                "n": g.column("count_all").cast(pa.int64()),
                "cents": g.column("cents_sum").cast(pa.int64()),
            }
        )

    users = (
        events_ds.select_columns(["user_id", "ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Max("day", alias_name="last_day"),
            Sum("n", alias_name="freq"),
            Sum("cents", alias_name="cents"),
        )
        .materialize()
    )

    # per-metric distinct-value cumulative counts -> score per value
    def hist(col, quantize=None):
        def f(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or col not in batch.column_names:
                return pa.table(
                    {"v": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
                )
            x = batch.column(col).cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            if quantize:
                x = x // quantize
            vs, cs = np.unique(x, return_counts=True)
            return pa.table(
                {"v": pa.array(vs, pa.int64()), "n": pa.array(cs, pa.int64())}
            )

        rows = (
            users.map_batches(f, batch_format="pyarrow")
            .groupby("v")
            .aggregate(Sum("n", alias_name="n"))
            .take_all()
        )
        rows.sort(key=lambda r: r["v"])
        vs = np.asarray([r["v"] for r in rows], dtype=np.int64)
        cum = np.cumsum(np.asarray([r["n"] for r in rows], dtype=np.int64))
        N = int(cum[-1]) if len(cum) else 0
        scores = (
            (n_scores * cum + N - 1) // N if N else np.empty(0, np.int64)
        ).astype(np.int64)
        return vs, scores

    r_vs, r_sc = hist("last_day")
    f_vs, f_sc = hist("freq")
    m_vs, m_sc = hist("cents", quantize=100)
    ref = ray.put((r_vs, r_sc, f_vs, f_sc, m_vs, m_sc))

    def score_batch(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "last_day": pa.array([], pa.int64()),
                "freq": pa.array([], pa.int64()),
                "monetary_dollars": pa.array([], pa.int64()),
                "r_score": pa.array([], pa.int64()),
                "f_score": pa.array([], pa.int64()),
                "m_score": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return empty
        rv, rs, fv, fs, mv, ms = ray.get(ref)
        ld = batch.column("last_day").cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        fr = batch.column("freq").cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dl = batch.column("cents").cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        ) // 100
        return pa.table(
            {
                "user_id": batch.column("user_id").cast(pa.int64()),
                "last_day": pa.array(ld, pa.int64()),
                "freq": pa.array(fr, pa.int64()),
                "monetary_dollars": pa.array(dl, pa.int64()),
                "r_score": pa.array(rs[np.searchsorted(rv, ld)], pa.int64()),
                "f_score": pa.array(fs[np.searchsorted(fv, fr)], pa.int64()),
                "m_score": pa.array(ms[np.searchsorted(mv, dl)], pa.int64()),
            }
        )

    return users.map_batches(score_batch, batch_format="pyarrow")


def q5_supplier_volume(
    lineitem_ds, orders_ds, customer_ds, supplier_ds, nation_ds, region_ds,
    *, region: str = "ASIA",
    broadcast_limit_bytes: int = BROADCAST_LIMIT_BYTES,
    num_partitions: int | None = None,
):
    """TPC-H Q5-style local-supplier volume: revenue per nation from
    lineitems whose CUSTOMER and SUPPLIER sit in the same nation of one
    region — the deepest join chain in the suite (region ⋈ nation ⋈
    customer ⋈ orders ⋈ lineitem ⋈ supplier with the
    ``c_nationkey = s_nationkey`` equality).

    Join plan, smallest-first, every level size-dispatched:

    1. region ⋈ nation and supplier are dimension tables by construction
       -> region-filtered ``nationkey -> name`` and
       ``suppkey -> nationkey`` maps broadcast once via ``ray.put``.
    2. customer (region-filtered to ``custkey -> nationkey``) broadcasts
       under ``broadcast_limit_bytes``, else hash-joins into orders.
    3. orders (reduced to ``orderkey -> cust nationkey``) likewise
       broadcasts or hash-joins into lineitem — at 100 TB this level IS
       the shuffle join; the region+nation filters have already cut it
       by ~1/R before any wide move.
    4. the fact scan attaches both nationkeys, keeps the local rows
       (vectorized ``pc.index_in`` lookups), and aggregates revenue in
       exact integer 1e-4 dollars with a per-batch combiner before the
       25-row final groupby.

    Emits (n_name, n_items, revenue_e4)."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    from ..ops.dedup import _join_partitions

    # --- level 1: tiny dimensions, always broadcast ---
    rkeys = [
        r["r_regionkey"]
        for r in region_ds.take_all()
        if r["r_name"] == region
    ]
    nat_key, nat_name = [], []
    for r in nation_ds.take_all():
        if r["n_regionkey"] in rkeys:
            nat_key.append(int(r["n_nationkey"]))
            nat_name.append(r["n_name"])
    nat_set = set(nat_key)
    supp_map = {
        int(r["s_suppkey"]): int(r["s_nationkey"])
        for r in supplier_ds.select_columns(["s_suppkey", "s_nationkey"]).take_all()
        if int(r["s_nationkey"]) in nat_set
    }
    dims_ref = ray.put(
        (
            pa.array(nat_key, pa.int64()),
            pa.array(nat_name, pa.string()),
            pa.array(sorted(supp_map), pa.int64()),
            pa.array([supp_map[k] for k in sorted(supp_map)], pa.int64()),
        )
    )

    # --- level 2: customers of the region -> (custkey, nationkey) ---
    def cust_in_region(batch: pa.Table) -> pa.Table:
        nk, _nn, _sk, _sn = ray.get(dims_ref)
        idx = pc.index_in(batch.column("c_nationkey").cast(pa.int64()), value_set=nk)
        t = pa.table(
            {
                "c_custkey": batch.column("c_custkey").cast(pa.int64()),
                "cn": batch.column("c_nationkey").cast(pa.int64()),
            }
        )
        return t.filter(pc.is_valid(idx))

    cust = customer_ds.select_columns(["c_custkey", "c_nationkey"]).map_batches(
        cust_in_region, batch_format="pyarrow"
    )

    if _build_side_bytes(customer_ds) <= broadcast_limit_bytes:
        ck, cn = [], []
        for b in cust.iter_batches(batch_format="pyarrow"):
            ck.append(b.column("c_custkey").combine_chunks())
            cn.append(b.column("cn").combine_chunks())
        cust_ref = ray.put(
            (
                pa.concat_arrays(ck) if ck else pa.array([], pa.int64()),
                pa.concat_arrays(cn) if cn else pa.array([], pa.int64()),
            )
        )

        def attach_cn(batch: pa.Table) -> pa.Table:
            k, n = ray.get(cust_ref)
            idx = pc.index_in(batch.column("o_custkey").cast(pa.int64()), value_set=k)
            cn_col = n.take(idx)
            return pa.table(
                {
                    "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
                    "cn": cn_col,
                }
            ).filter(pc.is_valid(cn_col))

        orders_cn = orders_ds.select_columns(["o_orderkey", "o_custkey"]).map_batches(
            attach_cn, batch_format="pyarrow"
        )
    else:
        orders_cn = (
            orders_ds.select_columns(["o_orderkey", "o_custkey"])
            .map_batches(
                lambda b: pa.table(
                    {
                        "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
                        "o_custkey": b.column("o_custkey").cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
            .join(
                cust,
                join_type="inner",
                num_partitions=num_partitions or _join_partitions(),
                on=("o_custkey",),
                right_on=("c_custkey",),
            )
            .select_columns(["o_orderkey", "cn"])
        )

    # --- level 3: fact scan ---
    def fact_partial_broadcast(orders_ref):
        def f(batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "n_nationkey": pa.array([], pa.int64()),
                    "n_items": pa.array([], pa.int64()),
                    "revenue_e4": pa.array([], pa.int64()),
                }
            )
            if batch.num_rows == 0 or "l_orderkey" not in batch.column_names:
                return empty
            ok, on = ray.get(orders_ref)
            _nk, _nn, sk, sn = ray.get(dims_ref)
            oidx = pc.index_in(batch.column("l_orderkey").cast(pa.int64()), value_set=ok)
            sidx = pc.index_in(batch.column("l_suppkey").cast(pa.int64()), value_set=sk)
            cn_col = on.take(oidx)
            sn_col = sn.take(sidx)
            keep = pc.and_(
                pc.and_(pc.is_valid(cn_col), pc.is_valid(sn_col)),
                pc.equal(cn_col, sn_col),
            )
            t = batch.append_column("nk", cn_col).filter(keep)
            if t.num_rows == 0:
                return empty
            rev = _q5_revenue(t)
            g = pa.table({"n_nationkey": t.column("nk"), "rev": rev}).group_by(
                ["n_nationkey"]
            ).aggregate([("rev", "sum"), ([], "count_all")])
            return pa.table(
                {
                    "n_nationkey": g.column("n_nationkey"),
                    "n_items": g.column("count_all").cast(pa.int64()),
                    "revenue_e4": g.column("rev_sum").cast(pa.int64()),
                }
            )

        return f

    def _q5_revenue(t: pa.Table) -> pa.Array:
        price = t.column("l_extendedprice").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        disc = t.column("l_discount").combine_chunks().to_numpy(zero_copy_only=False)
        cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        pct = np.floor(disc * 100.0 + 0.5).astype(np.int64)
        return pa.array(cents * (100 - pct), pa.int64())

    li = lineitem_ds.select_columns(
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )
    if _build_side_bytes(orders_ds) <= broadcast_limit_bytes:
        ok, on = [], []
        for b in orders_cn.iter_batches(batch_format="pyarrow"):
            ok.append(b.column("o_orderkey").combine_chunks())
            on.append(b.column("cn").combine_chunks())
        orders_ref = ray.put(
            (
                pa.concat_arrays(ok) if ok else pa.array([], pa.int64()),
                pa.concat_arrays(on) if on else pa.array([], pa.int64()),
            )
        )
        partials = li.map_batches(
            fact_partial_broadcast(orders_ref), batch_format="pyarrow"
        )
    else:
        joined = li.map_batches(
            lambda b: pa.table(
                {
                    "l_orderkey": b.column("l_orderkey").cast(pa.int64()),
                    "l_suppkey": b.column("l_suppkey").cast(pa.int64()),
                    "l_extendedprice": b.column("l_extendedprice"),
                    "l_discount": b.column("l_discount"),
                }
            ),
            batch_format="pyarrow",
        ).join(
            orders_cn,
            join_type="inner",
            num_partitions=num_partitions or _join_partitions(),
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )

        def fact_partial_joined(batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "n_nationkey": pa.array([], pa.int64()),
                    "n_items": pa.array([], pa.int64()),
                    "revenue_e4": pa.array([], pa.int64()),
                }
            )
            if batch.num_rows == 0 or "cn" not in batch.column_names:
                return empty
            _nk, _nn, sk, sn = ray.get(dims_ref)
            sidx = pc.index_in(batch.column("l_suppkey").cast(pa.int64()), value_set=sk)
            sn_col = sn.take(sidx)
            keep = pc.and_(
                pc.is_valid(sn_col), pc.equal(batch.column("cn"), sn_col)
            )
            t = batch.rename_columns(
                [c if c != "cn" else "nk" for c in batch.column_names]
            ).filter(keep)
            if t.num_rows == 0:
                return empty
            rev = _q5_revenue(t)
            g = pa.table({"n_nationkey": t.column("nk"), "rev": rev}).group_by(
                ["n_nationkey"]
            ).aggregate([("rev", "sum"), ([], "count_all")])
            return pa.table(
                {
                    "n_nationkey": g.column("n_nationkey"),
                    "n_items": g.column("count_all").cast(pa.int64()),
                    "revenue_e4": g.column("rev_sum").cast(pa.int64()),
                }
            )

        partials = joined.map_batches(fact_partial_joined, batch_format="pyarrow")

    agg = partials.groupby("n_nationkey").aggregate(
        Sum("n_items", alias_name="n_items"),
        Sum("revenue_e4", alias_name="revenue_e4"),
    )

    def name_join(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "n_nationkey" not in batch.column_names:
            return pa.table(
                {
                    "n_name": pa.array([], pa.string()),
                    "n_items": pa.array([], pa.int64()),
                    "revenue_e4": pa.array([], pa.int64()),
                }
            )
        nk, nn, _sk, _sn = ray.get(dims_ref)
        idx = pc.index_in(batch.column("n_nationkey").cast(pa.int64()), value_set=nk)
        return pa.table(
            {
                "n_name": nn.take(idx),
                "n_items": batch.column("n_items"),
                "revenue_e4": batch.column("revenue_e4"),
            }
        )

    return agg.map_batches(name_join, batch_format="pyarrow")


def q3_shipping_priority(
    lineitem_ds,
    orders_ds,
    customer_ds,
    *,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-01",
    k: int = 10,
    broadcast_limit_bytes: int = BROADCAST_LIMIT_BYTES,
    num_partitions: int | None = None,
):
    """TPC-H Q3-style shipping priority: the top-``k`` unshipped orders of
    one market segment by revenue — orders placed before ``cutoff`` whose
    lineitems ship after it, grouped per order.

    Plan (every level size-dispatched, smallest-first):

    1. segment customers reduce to a custkey set — broadcast under
       ``broadcast_limit_bytes``, else a hash-shuffle semi-join;
    2. date-filtered orders of those customers reduce to
       ``orderkey -> (orderdate, priority)`` — again broadcast-or-join;
       the segment (~1/5) and date filters cut the build side before any
       wide move;
    3. the lineitem fact scan filters ``l_shipdate > cutoff``, attaches
       the order attrs, and pre-aggregates revenue per order in exact
       integer 1e-4 dollars inside each batch (same fixed-point rule as
       :func:`q5_supplier_volume`);
    4. top-k: per-block ``select_k`` combiner then a single tiny merge —
       ``blocks x k`` rows move, never the aggregate table.

    Emits ``(l_orderkey, o_orderdate_us, o_orderpriority, revenue_e4)``
    ordered deterministically by (revenue desc, orderkey asc).
    """
    import numpy as np
    import ray

    cutoff_us = int(
        np.datetime64(cutoff, "us").astype("datetime64[us]").astype(np.int64)
    )

    def _revenue(batch: pa.Table) -> pa.Array:
        price = batch.column("l_extendedprice").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        disc = batch.column("l_discount").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        pct = np.floor(disc * 100.0 + 0.5).astype(np.int64)
        return pa.array(cents * (100 - pct), pa.int64())

    # --- level 1: segment customers -> custkey set ---
    seg_keys = []
    if _build_side_bytes(customer_ds) <= broadcast_limit_bytes:
        for b in customer_ds.select_columns(
            ["c_custkey", "c_mktsegment"]
        ).iter_batches(batch_format="pyarrow"):
            m = pc.equal(b.column("c_mktsegment"), segment)
            seg_keys.append(b.column("c_custkey").filter(m).combine_chunks())
        cust_arr = (
            pa.concat_arrays([a.cast(pa.int64()) for a in seg_keys])
            if seg_keys
            else pa.array([], pa.int64())
        )
    else:  # at warehouse scale: semi-join orders against customers instead
        cust_arr = None

    cust_bcast = cust_arr is not None
    cust_ref = ray.put(cust_arr)  # data travels ONLY via the object store
    del cust_arr  # keep the array out of the task closures

    # --- level 2: orders of the segment before the cutoff ---
    def order_filter(batch: pa.Table) -> pa.Table:
        ts = batch.column("o_orderdate").cast(pa.timestamp("us")).cast(pa.int64())
        keep = pc.less(ts, cutoff_us)
        if cust_bcast:
            keep = pc.and_(
                keep,
                pc.is_valid(
                    pc.index_in(
                        batch.column("o_custkey").cast(pa.int64()),
                        value_set=ray.get(cust_ref),
                    )
                ),
            )
        t = pa.table(
            {
                "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
                "o_custkey": batch.column("o_custkey").cast(pa.int64()),
                "o_orderdate_us": ts,
                "o_orderpriority": batch.column("o_orderpriority"),
            }
        )
        return t.filter(keep)

    ordsel = orders_ds.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(order_filter, batch_format="pyarrow")
    if not cust_bcast:
        n_part = num_partitions or _join_parts()
        ordsel = ordsel.join(
            customer_ds.select_columns(["c_custkey", "c_mktsegment"]).filter(
                expr=f"c_mktsegment == {segment!r}"
            ),
            join_type="inner",
            num_partitions=n_part,
            on=("o_custkey",),
            right_on=("c_custkey",),
        ).select_columns(
            ["o_orderkey", "o_custkey", "o_orderdate_us", "o_orderpriority"]
        )

    # build orderkey -> (date, priority); broadcast-or-join dispatch
    if _build_side_bytes(orders_ds) <= broadcast_limit_bytes:
        ok, od, op = [], [], []
        for b in ordsel.iter_batches(batch_format="pyarrow"):
            ok.append(b.column("o_orderkey").combine_chunks())
            od.append(b.column("o_orderdate_us").combine_chunks())
            op.append(b.column("o_orderpriority").combine_chunks())
        ord_ref = ray.put(
            (
                pa.concat_arrays(ok) if ok else pa.array([], pa.int64()),
                pa.concat_arrays(od) if od else pa.array([], pa.int64()),
                pa.concat_arrays(op) if op else pa.array([], pa.string()),
            )
        )

        def fact_partial(batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "o_orderdate_us": pa.array([], pa.int64()),
                    "o_orderpriority": pa.array([], pa.string()),
                    "revenue_e4": pa.array([], pa.int64()),
                }
            )
            if batch.num_rows == 0:
                return empty
            ship = (
                batch.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64())
            )
            t = batch.filter(pc.greater(ship, cutoff_us))
            if t.num_rows == 0:
                return empty
            okeys, odates, oprios = ray.get(ord_ref)
            idx = pc.index_in(t.column("l_orderkey").cast(pa.int64()), value_set=okeys)
            t = t.append_column("_oidx", idx).filter(pc.is_valid(idx))
            if t.num_rows == 0:
                return empty
            oidx = t.column("_oidx")
            g = pa.table(
                {
                    "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
                    "o_orderdate_us": odates.take(oidx),
                    "o_orderpriority": oprios.take(oidx),
                    "rev": _revenue(t),
                }
            ).group_by(["l_orderkey", "o_orderdate_us", "o_orderpriority"]).aggregate(
                [("rev", "sum")]
            )
            return g.rename_columns(
                ["l_orderkey", "o_orderdate_us", "o_orderpriority", "revenue_e4"]
            )

        partials = lineitem_ds.select_columns(
            ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]
        ).map_batches(fact_partial, batch_format="pyarrow")
    else:  # shuffle path: filtered fact join against the reduced orders
        n_part = num_partitions or _join_parts()

        def fact_filter(batch: pa.Table) -> pa.Table:
            ship = (
                batch.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64())
            )
            t = batch.filter(pc.greater(ship, cutoff_us))
            return pa.table(
                {
                    "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
                    "revenue_e4": _revenue(t),
                }
            )

        joined = (
            lineitem_ds.select_columns(
                ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]
            )
            .map_batches(fact_filter, batch_format="pyarrow")
            .join(
                ordsel.select_columns(
                    ["o_orderkey", "o_orderdate_us", "o_orderpriority"]
                ),
                join_type="inner",
                num_partitions=n_part,
                on=("l_orderkey",),
                right_on=("o_orderkey",),
            )
        )

        def joined_partial(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "o_orderdate_us" not in batch.column_names:
                return pa.table(
                    {
                        "l_orderkey": pa.array([], pa.int64()),
                        "o_orderdate_us": pa.array([], pa.int64()),
                        "o_orderpriority": pa.array([], pa.string()),
                        "revenue_e4": pa.array([], pa.int64()),
                    }
                )
            g = batch.select(
                ["l_orderkey", "o_orderdate_us", "o_orderpriority", "revenue_e4"]
            ).group_by(["l_orderkey", "o_orderdate_us", "o_orderpriority"]).aggregate(
                [("revenue_e4", "sum")]
            )
            return g.rename_columns(
                ["l_orderkey", "o_orderdate_us", "o_orderpriority", "revenue_e4"]
            )

        partials = joined.map_batches(joined_partial, batch_format="pyarrow")

    from ray.data.aggregate import Sum

    agg = partials.groupby(
        ["l_orderkey", "o_orderdate_us", "o_orderpriority"]
    ).aggregate(Sum("revenue_e4", alias_name="revenue_e4"))

    def topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        idx = pc.select_k_unstable(
            batch,
            k=min(k, batch.num_rows),
            sort_keys=[("revenue_e4", "descending"), ("l_orderkey", "ascending")],
        )
        return batch.take(idx)

    partial_top = agg.map_batches(topk, batch_format="pyarrow")
    # blocks x k rows: one tiny merge (batch_size=None = single batch)
    return partial_top.repartition(1).map_batches(
        topk, batch_format="pyarrow", batch_size=None
    )


def customer_pareto(orders_ds, *, pct: int = 80):
    """Pareto (80/20) revenue concentration: the minimal prefix of
    customers — ranked by total order revenue desc, custkey asc — whose
    cumulative revenue reaches ``pct``% of the whole.  Emits
    ``(o_custkey, rev_cents)`` for every kept customer.

    The global "sorted cumulative prefix" is computed WITHOUT a global
    sort: per-customer revenues (two-stage combiner groupby, exact
    integer cents) reduce to a 64-row magnitude histogram
    (``bit_length`` buckets -> count + sum each), the driver walks it to
    find the boundary bucket, and only that one bucket's rows are
    re-scanned to pick the exact threshold value T and the custkey-order
    tie prefix at T — all integer arithmetic, O(64 + |ties at T|) driver
    state.  The final cut is a vectorized filter ``rev > T or (rev == T
    and custkey <= K)`` over the streaming revenue table.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    if not 0 < pct < 100:
        raise ValueError("pct must be in (0, 100)")

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "o_custkey": pa.array([], pa.int64()),
                    "rev_cents": pa.array([], pa.int64()),
                }
            )
        price = batch.column("o_totalprice").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        g = pa.table(
            {
                "o_custkey": batch.column("o_custkey").cast(pa.int64()),
                "rev_cents": pa.array(cents, pa.int64()),
            }
        ).group_by("o_custkey").aggregate([("rev_cents", "sum")])
        return g.rename_columns(["o_custkey", "rev_cents"])

    rev = (
        orders_ds.select_columns(["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("rev_cents", alias_name="rev_cents"))
        .materialize()  # consumed up to 3x (histogram, boundary scan, cut)
    )

    # --- 64-bucket magnitude histogram (driver state: <= 64 rows) ---
    # bit_length vectorized: floor(log2(r)) + 1 for r > 0, with exact
    # integer fix-ups at the 2^k boundaries float log2 can straddle
    def hist(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "blen": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        r = batch.column("rev_cents").combine_chunks().to_numpy(zero_copy_only=False)
        if len(r) and int(r.min()) < 0:
            # contract (ADVICE r4): the inclusive-prefix rule is only
            # well-defined for non-negative revenue — the SQL mirror's
            # running-sum walk is non-monotone under negatives (rows can
            # RE-ENTER the kept set), so there is no single threshold T
            # to find.  Fail fast instead of misplacing the cut.
            raise ValueError(
                "customer_pareto requires non-negative per-customer revenue; "
                f"got min rev_cents={int(r.min())}"
            )
        blen = np.zeros(len(r), dtype=np.int64)
        nz = r > 0
        blen[nz] = np.floor(np.log2(r[nz].astype(np.float64))).astype(np.int64) + 1
        # float log2 is exact for the bucket decision except at 2^k
        # boundaries where rounding could land one off — fix up exactly:
        too_hi = nz & (np.left_shift(np.int64(1), np.minimum(blen - 1, 62)) > r)
        blen[too_hi] -= 1
        lo = np.left_shift(np.int64(1), np.minimum(blen, 62))
        too_lo = nz & (blen < 62) & (lo <= r)
        blen[too_lo] += 1
        g = pa.table(
            {"blen": pa.array(blen, pa.int64()), "rv": pa.array(r, pa.int64())}
        ).group_by("blen").aggregate([("rv", "sum"), ([], "count_all")])
        return pa.table(
            {
                "blen": g.column("blen"),
                "n": g.column("count_all").cast(pa.int64()),
                "s": g.column("rv_sum").cast(pa.int64()),
            }
        )

    buckets: dict[int, list[int]] = {}
    for b in rev.map_batches(hist, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for bl, n, s in zip(
            b.column("blen").to_pylist(),
            b.column("n").to_pylist(),
            b.column("s").to_pylist(),
        ):
            acc = buckets.setdefault(bl, [0, 0])
            acc[0] += n
            acc[1] += s
    if not buckets:
        return rev  # empty input: empty output, schema preserved
    total = sum(s for _, s in buckets.values())
    target_num = total * pct  # keep while cum_before * 100 < total * pct
    # walk magnitude buckets high -> low to find the boundary bucket
    cum = 0
    boundary = None
    for bl in sorted(buckets, reverse=True):
        n, s = buckets[bl]
        if (cum + s) * 100 >= target_num:
            boundary = bl
            break
        cum += s
    if boundary is None:  # pct of 0-total revenue: keep nothing
        boundary, cum = min(buckets), 0
    cum_above = cum  # revenue strictly above the boundary bucket

    # --- boundary bucket: exact value-ordered walk (driver state
    # O(distinct values in ONE magnitude bucket's histogram)) ---
    # the blen-0 bucket holds EVERY rev_cents <= 0 (negatives included —
    # returns/credits can make a customer's total negative), so its scan
    # has NO lower edge; the histogram's ``s`` already summed them, and
    # the value walk must see the same population or the threshold T
    # lands one bucket off (ADVICE r4)
    lo_edge = None if boundary == 0 else 1 << (boundary - 1)
    hi_edge = 1 << boundary

    def val_hist(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"rv": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        in_bucket = pc.less(batch.column("rev_cents"), hi_edge)
        if lo_edge is not None:
            in_bucket = pc.and_(
                pc.greater_equal(batch.column("rev_cents"), lo_edge), in_bucket
            )
        t = batch.filter(in_bucket)
        g = t.select(["rev_cents"]).group_by("rev_cents").aggregate([([], "count_all")])
        return pa.table(
            {
                "rv": g.column("rev_cents"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    vals: dict[int, int] = {}
    for b in rev.map_batches(val_hist, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for v, n in zip(b.column("rv").to_pylist(), b.column("n").to_pylist()):
            vals[v] = vals.get(v, 0) + n
    T, m_at_T = None, 0
    for v in sorted(vals, reverse=True):
        n = vals[v]
        if (cum_above + v * n) * 100 >= target_num:
            T = v
            # j-th tie row (1-indexed, custkey asc) is kept while
            # (cum_above + (j-1) * T) * 100 < target_num
            if v > 0:
                num = target_num - cum_above * 100
                m_at_T = min(n, -(-num // (100 * v)))  # ceildiv
            else:
                m_at_T = 0
            break
        cum_above += v * n
    if T is None:
        if not vals:
            # non-positive total (all-zero or negative revenue): the
            # inclusive-prefix rule keeps nothing — mirror the oracle's
            # empty result instead of crashing on min({})
            return rev.map_batches(lambda b: b.slice(0, 0), batch_format="pyarrow")
        T, m_at_T = min(vals), vals[min(vals)]  # ran out: keep everything

    # custkeys of the m_at_T smallest keys at value T (|ties| driver rows)
    tie_keys: list[int] = []
    if m_at_T > 0:
        for b in rev.iter_batches(batch_format="pyarrow"):
            t = b.filter(pc.equal(b.column("rev_cents"), T))
            tie_keys.extend(t.column("o_custkey").to_pylist())
        tie_keys = sorted(tie_keys)[:m_at_T]
    keep_set = set(tie_keys)
    thr = T

    def cut(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        r = batch.column("rev_cents")
        keep = pc.greater(r, thr)
        if keep_set:
            tie = pc.and_(
                pc.equal(r, thr),
                pc.is_valid(
                    pc.index_in(
                        batch.column("o_custkey"),
                        value_set=pa.array(sorted(keep_set), pa.int64()),
                    )
                ),
            )
            keep = pc.or_(keep, tie)
        return batch.filter(keep)

    return rev.map_batches(cut, batch_format="pyarrow")


def events_median_gap(events_ds, shards: int = 256):
    """Per-user median inter-event gap: sort each user's events by time,
    take consecutive differences, report the DISCRETE median (the sorted
    gap at index ``(n-1)//2`` — DuckDB ``quantile_disc(0.5)`` semantics)
    in exact microseconds, plus the gap count.  Users with fewer than two
    events emit nothing.

    Same coarse-shard + vectorized-numpy shape as
    :func:`event_sessions`: hash(user) % ``shards`` groups ~n/shards
    users per ``map_groups`` call, one lexsort + one diff per shard.
    Emits ``(user_id, n_gaps, median_gap_us)``.
    """
    import numpy as np

    def add_shard(batch: pa.Table) -> pa.Table:
        return _add_shard_col(batch, "user_id", shards)

    def shard_gaps(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "user_id" not in group.column_names:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_gaps": pa.array([], pa.int64()),
                    "median_gap_us": pa.array([], pa.int64()),
                }
            )
        users = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts = group.column("ts").cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((ts, users))
        users, ts = users[order], ts[order]
        starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        counts = np.diff(np.r_[starts, len(users)])
        gaps = np.diff(ts)  # gaps[i] = ts[i+1]-ts[i]; cross-user junk masked off
        out_u, out_n, out_m = [], [], []
        for s, c in zip(starts, counts):
            if c < 2:
                continue
            g = np.sort(gaps[s : s + c - 1], kind="stable")
            out_u.append(int(users[s]))
            out_n.append(int(c - 1))
            out_m.append(int(g[(len(g) - 1) // 2]))
        return pa.table(
            {
                "user_id": pa.array(out_u, pa.int64()),
                "n_gaps": pa.array(out_n, pa.int64()),
                "median_gap_us": pa.array(out_m, pa.int64()),
            }
        )

    return (
        events_ds.select_columns(["user_id", "ts"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: shard_gaps(g.drop_columns(["shard"])), batch_format="pyarrow"
        )
    )


def events_winsorized(events_ds, q: float = 0.99):
    """Winsorized (p99-capped) per-type value totals — the robust
    aggregate that keeps one fat-finger purchase from dominating a
    revenue metric.  Two passes:

    1. the cap: exact per-type discrete quantile of value-cents via the
       same value-histogram combiner as :func:`events_value_quantiles`
       (cap = smallest value whose cumulative count reaches
       ``ceil(q * n)`` — DuckDB ``quantile_disc`` semantics); the per-type
       caps (O(types) driver state) broadcast as a plain dict;
    2. a streaming re-scan clamps each value to its type's cap and
       pre-aggregates per batch — no shuffle beyond the tiny final
       groupby.

    Emits ``(event_type, n_events, winsorized_sum_cents, n_capped)``,
    all exact integers.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    def hist_partial(batch: pa.Table) -> pa.Table:
        # floor(x*100 + 0.5): the fixed-point rule every revenue op and
        # oracle shares (Arrow round() would be half-to-even — mismatch)
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(batch.column("value"), 100.0), 0.5)),
            pa.int64(),
        )
        g = pa.table(
            {"event_type": batch.column("event_type"), "c": cents}
        ).group_by(["event_type", "c"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "c": g.column("c"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    def type_cap(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "c" not in group.column_names:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "cap": pa.array([], pa.int64()),
                }
            )
        idx = pc.sort_indices(group, sort_keys=[("c", "ascending")])
        g = group.take(idx)
        cs = g.column("c").to_numpy(zero_copy_only=False)
        ns = g.column("n").to_numpy(zero_copy_only=False)
        cum = np.cumsum(ns)
        rank = _disc_rank(q, int(cum[-1]))
        cap = int(cs[np.searchsorted(cum, rank)])
        return pa.table(
            {
                "event_type": g.column("event_type").slice(0, 1),
                "cap": pa.array([cap], pa.int64()),
            }
        )

    caps = {
        r["event_type"]: r["cap"]
        for r in (
            events_ds.select_columns(["event_type", "value"])
            .map_batches(hist_partial, batch_format="pyarrow")
            .groupby("event_type")
            .map_groups(type_cap, batch_format="pyarrow")
            .take_all()  # O(distinct event types) — bounded by the schema
        )
    }

    def clamp_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n_events": pa.array([], pa.int64()),
                    "winsorized_sum_cents": pa.array([], pa.int64()),
                    "n_capped": pa.array([], pa.int64()),
                }
            )
        et = batch.column("event_type").to_pylist()
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(batch.column("value"), 100.0), 0.5)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        cap = np.fromiter((caps[t] for t in et), dtype=np.int64, count=len(et))
        over = cents > cap
        g = pa.table(
            {
                "event_type": batch.column("event_type"),
                "w": pa.array(np.minimum(cents, cap), pa.int64()),
                "o": pa.array(over.astype(np.int64), pa.int64()),
            }
        ).group_by("event_type").aggregate(
            [("w", "sum"), ("o", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "n_events": g.column("count_all").cast(pa.int64()),
                "winsorized_sum_cents": g.column("w_sum").cast(pa.int64()),
                "n_capped": g.column("o_sum").cast(pa.int64()),
            }
        )

    return (
        events_ds.select_columns(["event_type", "value"])
        .map_batches(clamp_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("winsorized_sum_cents", alias_name="winsorized_sum_cents"),
            Sum("n_capped", alias_name="n_capped"),
        )
    )


def events_new_users(events_ds):
    """Growth accounting: per-day NEW users (first-ever event that day)
    and the cumulative user count — the signup-curve analytic.

    Distributed min-reduction: a per-batch ``(user -> min day)`` combiner
    shrinks each block to one row per user seen, a ``Min`` groupby settles
    the global first day, a second combiner+groupby counts users per
    first-day; the final cumulative sum runs on the driver over the
    per-day counts (O(distinct days) — bounded by the calendar, not the
    corpus).  Emits ``(day, n_new, cum_users)``.
    """
    import numpy as np
    import ray.data
    from ray.data.aggregate import Min, Sum

    def first_seen(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": batch.column("user_id").cast(pa.int64()),
                "day": pc.strftime(batch.column("ts"), format="%Y-%m-%d"),
            }
        )
        g = t.group_by("user_id").aggregate([("day", "min")])
        return g.rename_columns(["user_id", "day"])

    def day_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "day" not in batch.column_names:
            return pa.table(
                {"day": pa.array([], pa.string()), "n_new": pa.array([], pa.int64())}
            )
        g = batch.select(["day"]).group_by("day").aggregate([([], "count_all")])
        return pa.table(
            {
                "day": g.column("day"),
                "n_new": g.column("count_all").cast(pa.int64()),
            }
        )

    per_day = (
        events_ds.select_columns(["user_id", "ts"])
        .map_batches(first_seen, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("day", alias_name="day"))
        .map_batches(day_counts, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n_new", alias_name="n_new"))
    )
    rows = sorted(
        ((r["day"], r["n_new"]) for r in per_day.take_all())  # O(days)
    )
    days = [d for d, _ in rows]
    news = np.asarray([n for _, n in rows], dtype=np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "day": pa.array(days, pa.string()),
                "n_new": pa.array(news, pa.int64()),
                "cum_users": pa.array(np.cumsum(news), pa.int64()),
            }
        )
    )


def q6_forecast_revenue(
    lineitem_ds,
    *,
    year: int = 1997,
    disc_lo: int = 5,
    disc_hi: int = 7,
    max_qty: float = 24.0,
):
    """TPC-H Q6-style forecast-revenue delta: one exact-integer row
    ``(revenue_e4, n_rows)`` over lineitems shipped in ``year`` with a
    discount of ``disc_lo``..``disc_hi`` percent and quantity under
    ``max_qty`` — the pure filtered-aggregate shape: column-pruned scan,
    vectorized predicate, per-batch combiner, one tiny final groupby,
    zero joins and zero wide shuffles."""
    import numpy as np

    lo_us = int(np.datetime64(f"{year}-01-01", "us").astype(np.int64))
    hi_us = int(np.datetime64(f"{year + 1}-01-01", "us").astype(np.int64))

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64())
        disc = batch.column("l_discount").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        pct = np.floor(disc * 100.0 + 0.5).astype(np.int64)
        qty = batch.column("l_quantity").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        ship_np = ship.combine_chunks().to_numpy(zero_copy_only=False)
        keep = (
            (ship_np >= lo_us)
            & (ship_np < hi_us)
            & (pct >= disc_lo)
            & (pct <= disc_hi)
            & (qty < max_qty)
        )
        price = batch.column("l_extendedprice").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        rev = int((cents[keep] * pct[keep]).sum())
        return pa.table(
            {
                "revenue_e4": pa.array([rev], pa.int64()),
                "n_rows": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "revenue_e4": pa.array(
                    [pc.sum(batch.column("revenue_e4")).as_py() or 0], pa.int64()
                ),
                "n_rows": pa.array(
                    [pc.sum(batch.column("n_rows")).as_py() or 0], pa.int64()
                ),
            }
        )

    return (
        lineitem_ds.select_columns(
            ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def q4_order_priority(
    lineitem_ds,
    orders_ds,
    *,
    late_days: int = 30,
    broadcast_limit_bytes: int = BROADCAST_LIMIT_BYTES,
    num_partitions: int | None = None,
):
    """TPC-H Q4-style order-priority census: per priority, how many
    orders have AT LEAST ONE lineitem shipped more than ``late_days``
    after the order date — the EXISTS / semi-join shape.

    Plan: orders reduce to ``orderkey -> (orderdate_us, priority)``
    (broadcast under the limit, else a hash-shuffle join); the lineitem
    scan keeps ship-late rows, dedups orderkeys per batch (the
    semi-join combiner: an order with 40 late items ships ONE key), a
    ``groupby(orderkey)`` settles global distinctness, and the tiny
    distinct-key set re-reads the broadcast map for its priority.
    Emits ``(o_orderpriority, n_orders)``."""
    import ray
    from ray.data.aggregate import Count, Sum

    late_us = int(late_days) * 86_400_000_000

    if _build_side_bytes(orders_ds) > broadcast_limit_bytes:
        # warehouse scale: the same reduction via a hash-shuffle join —
        # the q3/q5 fail-closed dispatch; the orders table never touches
        # the driver.  One join + the same distinct/count groupbys.
        n_part = num_partitions or _join_parts()

        def order_proj(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "o_orderkey" not in batch.column_names:
                return pa.table(
                    {
                        "o_orderkey": pa.array([], pa.int64()),
                        "o_orderdate_us": pa.array([], pa.int64()),
                        "o_orderpriority": pa.array([], pa.string()),
                    }
                )
            return pa.table(
                {
                    "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
                    "o_orderdate_us": batch.column("o_orderdate")
                    .cast(pa.timestamp("us"))
                    .cast(pa.int64()),
                    "o_orderpriority": batch.column("o_orderpriority"),
                }
            )

        def li_proj(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "l_orderkey" not in batch.column_names:
                return pa.table(
                    {
                        "l_orderkey": pa.array([], pa.int64()),
                        "ship_us": pa.array([], pa.int64()),
                    }
                )
            return pa.table(
                {
                    "l_orderkey": batch.column("l_orderkey").cast(pa.int64()),
                    "ship_us": batch.column("l_shipdate")
                    .cast(pa.timestamp("us"))
                    .cast(pa.int64()),
                }
            )

        def late_distinct(batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_orderpriority": pa.array([], pa.string()),
                }
            )
            if batch.num_rows == 0 or "ship_us" not in batch.column_names:
                return empty
            keep = pc.greater(
                pc.subtract(batch.column("ship_us"), batch.column("o_orderdate_us")),
                late_us,
            )
            t = pa.table(
                {
                    "o_orderkey": batch.column("l_orderkey"),
                    "o_orderpriority": batch.column("o_orderpriority"),
                }
            ).filter(keep)
            # semi-join combiner: one key per order per batch
            return t.group_by(["o_orderkey", "o_orderpriority"]).aggregate([])

        def shuffle_counts(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "o_orderpriority" not in batch.column_names:
                return pa.table(
                    {
                        "o_orderpriority": pa.array([], pa.string()),
                        "n_orders": pa.array([], pa.int64()),
                    }
                )
            g = pa.table({"o_orderpriority": batch.column("o_orderpriority")}).group_by(
                "o_orderpriority"
            ).aggregate([([], "count_all")])
            return pa.table(
                {
                    "o_orderpriority": g.column("o_orderpriority"),
                    "n_orders": g.column("count_all").cast(pa.int64()),
                }
            )

        joined = (
            lineitem_ds.select_columns(["l_orderkey", "l_shipdate"])
            .map_batches(li_proj, batch_format="pyarrow")
            .join(
                orders_ds.select_columns(
                    ["o_orderkey", "o_orderdate", "o_orderpriority"]
                ).map_batches(order_proj, batch_format="pyarrow"),
                join_type="inner",
                num_partitions=n_part,
                on=("l_orderkey",),
                right_on=("o_orderkey",),
            )
        )
        return (
            joined.map_batches(late_distinct, batch_format="pyarrow")
            .groupby(["o_orderkey", "o_orderpriority"])
            .aggregate(Count(alias_name="_n"))  # global distinct (count unused)
            .map_batches(shuffle_counts, batch_format="pyarrow")
            .groupby("o_orderpriority")
            .aggregate(Sum("n_orders", alias_name="n_orders"))
        )

    # bench scale: orders reduce under the limit -> driver collect + broadcast
    ok, od, op = [], [], []
    for b in orders_ds.select_columns(
        ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).iter_batches(batch_format="pyarrow"):
        ok.append(b.column("o_orderkey").cast(pa.int64()).combine_chunks())
        od.append(
            b.column("o_orderdate").cast(pa.timestamp("us")).cast(pa.int64())
            .combine_chunks()
        )
        op.append(b.column("o_orderpriority").combine_chunks())
    ord_ref = ray.put(
        (
            pa.concat_arrays(ok) if ok else pa.array([], pa.int64()),
            pa.concat_arrays(od) if od else pa.array([], pa.int64()),
            pa.concat_arrays(op) if op else pa.array([], pa.string()),
        )
    )

    def late_keys(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"o_orderkey": pa.array([], pa.int64())})
        okeys, odates, _ = ray.get(ord_ref)
        lk = batch.column("l_orderkey").cast(pa.int64())
        idx = pc.index_in(lk, value_set=okeys)
        ship = batch.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64())
        odate = odates.take(idx)
        keep = pc.and_(
            pc.is_valid(idx),
            pc.greater(pc.subtract(ship, odate), late_us),
        )
        t = pa.table({"o_orderkey": lk}).filter(keep)
        # semi-join combiner: one key per order per batch
        return t.group_by("o_orderkey").aggregate([])

    def priority_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_orderkey" not in batch.column_names:
            return pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "n_orders": pa.array([], pa.int64()),
                }
            )
        okeys, _, oprios = ray.get(ord_ref)
        idx = pc.index_in(batch.column("o_orderkey"), value_set=okeys)
        g = pa.table({"o_orderpriority": oprios.take(idx)}).group_by(
            "o_orderpriority"
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "o_orderpriority": g.column("o_orderpriority"),
                "n_orders": g.column("count_all").cast(pa.int64()),
            }
        )

    distinct_late = (
        lineitem_ds.select_columns(["l_orderkey", "l_shipdate"])
        .map_batches(late_keys, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Count(alias_name="_n"))  # global distinct (count unused)
    )
    return (
        distinct_late.map_batches(priority_counts, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
    )


def q1_pricing_summary(lineitem_ds, cutoff: str = "1998-09-01"):
    """TPC-H Q1-style pricing summary: per (l_returnflag, l_linestatus)
    over rows with ``l_shipdate <= cutoff``, the full additive measure set
    in EXACT integer fixed point (the repo's money rule — floats never
    cross the hash):

      sum_qty        sum of quantities (integral in this corpus)
      sum_base_e2    sum extendedprice, cents
      sum_disc_e4    sum extendedprice*(1-discount), 1e-4 dollars
      sum_charge_e6  sum extendedprice*(1-discount)*(1+tax), 1e-6 dollars
      sum_disc_pct   sum of rounded discount percents (avg = /n_rows)
      n_rows         count

    The canonical Q1 averages (avg_qty, avg_price, avg_disc) are exact
    ratios of these integer columns — emitting numerators + counts keeps
    the oracle bit-exact where a double ``avg()`` would be grid-noisy.

    Plan: one pruned scan -> per-batch integer partials (vectorized
    numpy) -> one tiny groupby over (flag, status) partial rows.  Zero
    joins, no full-table shuffle: the exchange is |batches| x |groups|
    rows."""
    import numpy as np
    from ray.data.aggregate import Sum

    cutoff_us = int(
        np.datetime64(cutoff, "us").astype("datetime64[us]").astype(np.int64)
    )

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "l_returnflag": pa.array([], pa.string()),
                "l_linestatus": pa.array([], pa.string()),
                "sum_qty": pa.array([], pa.int64()),
                "sum_base_e2": pa.array([], pa.int64()),
                "sum_disc_e4": pa.array([], pa.int64()),
                "sum_charge_e6": pa.array([], pa.int64()),
                "sum_disc_pct": pa.array([], pa.int64()),
                "n_rows": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ship = (
            batch.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64())
            .combine_chunks().to_numpy(zero_copy_only=False)
        )
        keep = ship <= cutoff_us
        if not keep.any():
            return empty
        t = batch.filter(pa.array(keep))
        qty = t.column("l_quantity").combine_chunks().to_numpy(zero_copy_only=False)
        price = t.column("l_extendedprice").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        disc = t.column("l_discount").combine_chunks().to_numpy(zero_copy_only=False)
        tax = t.column("l_tax").combine_chunks().to_numpy(zero_copy_only=False)
        cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        dpct = np.floor(disc * 100.0 + 0.5).astype(np.int64)
        tpct = np.floor(tax * 100.0 + 0.5).astype(np.int64)
        g = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "sum_qty": pa.array(np.floor(qty + 0.5).astype(np.int64), pa.int64()),
                "sum_base_e2": pa.array(cents, pa.int64()),
                "sum_disc_e4": pa.array(cents * (100 - dpct), pa.int64()),
                "sum_charge_e6": pa.array(
                    cents * (100 - dpct) * (100 + tpct), pa.int64()
                ),
                "sum_disc_pct": pa.array(dpct, pa.int64()),
            }
        ).group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("sum_qty", "sum"), ("sum_base_e2", "sum"), ("sum_disc_e4", "sum"),
                ("sum_charge_e6", "sum"), ("sum_disc_pct", "sum"),
                ([], "count_all"),
            ]
        )
        return pa.table(
            {
                "l_returnflag": g.column("l_returnflag"),
                "l_linestatus": g.column("l_linestatus"),
                "sum_qty": g.column("sum_qty_sum").cast(pa.int64()),
                "sum_base_e2": g.column("sum_base_e2_sum").cast(pa.int64()),
                "sum_disc_e4": g.column("sum_disc_e4_sum").cast(pa.int64()),
                "sum_charge_e6": g.column("sum_charge_e6_sum").cast(pa.int64()),
                "sum_disc_pct": g.column("sum_disc_pct_sum").cast(pa.int64()),
                "n_rows": g.column("count_all").cast(pa.int64()),
            }
        )

    return (
        lineitem_ds.select_columns(
            [
                "l_returnflag", "l_linestatus", "l_shipdate", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax",
            ]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_e2", alias_name="sum_base_e2"),
            Sum("sum_disc_e4", alias_name="sum_disc_e4"),
            Sum("sum_charge_e6", alias_name="sum_charge_e6"),
            Sum("sum_disc_pct", alias_name="sum_disc_pct"),
            Sum("n_rows", alias_name="n_rows"),
        )
    )


def q2_min_price_supplier(
    lineitem_ds,
    part_ds,
    supplier_ds,
    *,
    broadcast_limit_bytes: int = BROADCAST_LIMIT_BYTES,
):
    """TPC-H Q2-shaped correlated-min (argmin) join on the available
    tables: for every part that was ever sold, the single cheapest sale
    and the supplier who made it — ties broken deterministically by
    (price, s_suppkey).  The classic 'min per group, then recover the
    attributing row' shape Q2's MIN(ps_supplycost) subquery exercises
    (this corpus has no partsupp table; lineitem plays the priced
    relation).

    Plan: pruned lineitem scan -> per-batch argmin combiner (ONE row per
    (partkey) per batch, carrying the winning suppkey) -> global
    ``groupby(p_partkey).map_groups`` argmin (groups are tiny: one row
    per batch that saw the part) -> part/supplier names attached from
    broadcast maps (both dimension tables are small; fail-closed: if
    either exceeds the broadcast limit the op raises rather than
    silently driver-collecting — the hash-join rewrite is mechanical
    when a corpus needs it).

    Emits ``(p_partkey, p_name, s_suppkey, s_name, min_price_e2)``."""
    import numpy as np

    import ray

    for name, ds in (("part", part_ds), ("supplier", supplier_ds)):
        if _build_side_bytes(ds) > broadcast_limit_bytes:
            raise ValueError(
                f"q2_min_price_supplier: {name} table exceeds "
                f"broadcast_limit_bytes={broadcast_limit_bytes}; rewrite the "
                "name-attach as a hash join for this corpus"
            )

    def argmin_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "p_partkey": pa.array([], pa.int64()),
                "s_suppkey": pa.array([], pa.int64()),
                "min_price_e2": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or "l_partkey" not in batch.column_names:
            return empty
        pk = batch.column("l_partkey").cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        sk = batch.column("l_suppkey").cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        price = batch.column("l_extendedprice").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        # vectorized per-batch argmin with (price, suppkey) tie-break:
        # lexsort by (suppkey, price, partkey) then take each part's first
        order = np.lexsort((sk, cents, pk))
        pk, sk, cents = pk[order], sk[order], cents[order]
        first = np.r_[True, pk[1:] != pk[:-1]]
        return pa.table(
            {
                "p_partkey": pa.array(pk[first], pa.int64()),
                "s_suppkey": pa.array(sk[first], pa.int64()),
                "min_price_e2": pa.array(cents[first], pa.int64()),
            }
        )

    def argmin_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "p_partkey" not in group.column_names:
            return pa.table(
                {
                    "p_partkey": pa.array([], pa.int64()),
                    "s_suppkey": pa.array([], pa.int64()),
                    "min_price_e2": pa.array([], pa.int64()),
                }
            )
        idx = pc.sort_indices(
            group,
            sort_keys=[
                ("p_partkey", "ascending"),
                ("min_price_e2", "ascending"),
                ("s_suppkey", "ascending"),
            ],
        )
        g = group.take(idx)
        pk = np.asarray(g.column("p_partkey").to_pylist(), dtype=np.int64)
        first = np.r_[True, pk[1:] != pk[:-1]]
        return g.filter(pa.array(first))

    def to_map(ds, key, val):
        ks, vs = [], []
        for b in ds.select_columns([key, val]).iter_batches(batch_format="pyarrow"):
            ks.append(b.column(key).cast(pa.int64()).combine_chunks())
            vs.append(b.column(val).combine_chunks())
        return (
            pa.concat_arrays(ks) if ks else pa.array([], pa.int64()),
            pa.concat_arrays(vs) if vs else pa.array([], pa.string()),
        )

    part_ref = ray.put(to_map(part_ds, "p_partkey", "p_name"))
    supp_ref = ray.put(to_map(supplier_ds, "s_suppkey", "s_name"))

    def attach_names(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "p_partkey" not in batch.column_names:
            return pa.table(
                {
                    "p_partkey": pa.array([], pa.int64()),
                    "p_name": pa.array([], pa.string()),
                    "s_suppkey": pa.array([], pa.int64()),
                    "s_name": pa.array([], pa.string()),
                    "min_price_e2": pa.array([], pa.int64()),
                }
            )
        pkeys, pnames = ray.get(part_ref)
        skeys, snames = ray.get(supp_ref)
        pidx = pc.index_in(batch.column("p_partkey"), value_set=pkeys)
        sidx = pc.index_in(batch.column("s_suppkey"), value_set=skeys)
        return pa.table(
            {
                "p_partkey": batch.column("p_partkey"),
                "p_name": pnames.take(pidx),
                "s_suppkey": batch.column("s_suppkey"),
                "s_name": snames.take(sidx),
                "min_price_e2": batch.column("min_price_e2"),
            }
        )

    return (
        lineitem_ds.select_columns(["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(argmin_partial, batch_format="pyarrow")
        .groupby("p_partkey")
        .map_groups(argmin_group, batch_format="pyarrow")
        .map_batches(attach_names, batch_format="pyarrow")
    )


def source_mix(docs_ds):
    """Training-mixture report: per ``source``, document and token totals
    plus the corpus token share in exact integer ppm (floor) — the table
    every data-mixing decision reads.  Tokens = ``[a-z0-9_]+`` runs over
    lowered text (the repo-wide token grammar).

    Plan: one pruned scan -> per-batch (source, n_docs, n_tokens)
    combiner -> one tiny groupby; the global total lands driver-side as
    O(sources) rows and the share is attached in a final map.  Emits
    ``(source, n_docs, n_tokens, token_share_ppm)``."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "text" not in batch.column_names:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        toks = pc.count_substring_regex(
            pc.utf8_lower(batch.column("text")), pattern=r"[a-z0-9_]+"
        ).cast(pa.int64())
        g = pa.table(
            {"source": batch.column("source"), "n_tokens": toks}
        ).group_by("source").aggregate([("n_tokens", "sum"), ([], "count_all")])
        return pa.table(
            {
                "source": g.column("source"),
                "n_docs": g.column("count_all").cast(pa.int64()),
                "n_tokens": g.column("n_tokens_sum").cast(pa.int64()),
            }
        )

    agg = (
        docs_ds.select_columns(["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
        )
        .materialize()  # O(sources) rows; reused for the total + the share map
    )
    total = sum(r["n_tokens"] for r in agg.take_all()) or 1

    def share(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "n_tokens" not in batch.column_names:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "token_share_ppm": pa.array([], pa.int64()),
                }
            )
        nt = batch.column("n_tokens")
        return pa.table(
            {
                "source": batch.column("source"),
                "n_docs": batch.column("n_docs"),
                "n_tokens": nt,
                "token_share_ppm": pc.divide(
                    pc.multiply(nt.cast(pa.int64()), pa.scalar(1_000_000, pa.int64())),
                    pa.scalar(total, pa.int64()),
                ),
            }
        )

    return agg.map_batches(share, batch_format="pyarrow")


def user_burst_rates(events_ds, threshold_per_hour: int = 0):
    """Per-user PEAK hourly event rate — the rate-based bot/abuse screen
    every web log pipeline runs: bucket events into UTC hours, count per
    (user, hour), keep each user's max (and the hour it happened, earliest
    hour on ties).  ``threshold_per_hour`` > 0 keeps only users at or
    above it.

    One pruned scan -> per-batch (user, hour) count combiner -> one
    groupby settles global counts -> per-batch per-user argmax combiner
    -> one final groupby argmax.  Emits ``(user_id, peak_hour_us,
    peak_events)``."""
    import numpy as np
    from ray.data.aggregate import Sum

    HOUR = 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "ts" not in batch.column_names:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "hour_us": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        hour = pc.multiply(
            pc.divide(
                batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                pa.scalar(HOUR, pa.int64()),
            ),
            pa.scalar(HOUR, pa.int64()),
        )
        g = pa.table(
            {"user_id": batch.column("user_id").cast(pa.int64()), "hour_us": hour}
        ).group_by(["user_id", "hour_us"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "hour_us": g.column("hour_us"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    counts = (
        events_ds.select_columns(["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "hour_us"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def argmax_local(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "peak_hour_us": pa.array([], pa.int64()),
                "peak_events": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return empty
        u = batch.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        h = batch.column("hour_us").combine_chunks().to_numpy(zero_copy_only=False)
        n = batch.column("n").combine_chunks().to_numpy(zero_copy_only=False)
        # (count desc, hour asc) winner per user, vectorized
        order = np.lexsort((h, -n, u))
        u, h, n = u[order], h[order], n[order]
        first = np.r_[True, u[1:] != u[:-1]]
        return pa.table(
            {
                "user_id": pa.array(u[first], pa.int64()),
                "peak_hour_us": pa.array(h[first], pa.int64()),
                "peak_events": pa.array(n[first], pa.int64()),
            }
        )

    def argmax_group(group: pa.Table) -> pa.Table:
        t = argmax_local(
            group.rename_columns(
                [
                    {"peak_hour_us": "hour_us", "peak_events": "n"}.get(c, c)
                    for c in group.column_names
                ]
            )
        )
        return t

    out = (
        counts.map_batches(argmax_local, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(argmax_group, batch_format="pyarrow")
    )
    if threshold_per_hour > 0:
        thr = int(threshold_per_hour)

        def cut(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "peak_events" not in batch.column_names:
                return batch
            return batch.filter(
                pc.greater_equal(batch.column("peak_events"), thr)
            )

        out = out.map_batches(cut, batch_format="pyarrow")
    return out
