"""Dataset-curation operators a training-data pipeline needs ahead of
model runs: deterministic split assignment and stratified per-group
sampling.  Both are pure functions of the input rows (content-derived
hashing / smallest-key quotas), so results are identical across runs,
parallelism levels and engines — the property the SQL oracles rely on.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc


def split_cutoffs(weights: dict[str, float]) -> list[tuple[str, int]]:
    """Cumulative integer cutoffs over the md5-uniform u64 space, in the
    dict's insertion order.  Integer cutoffs (not float fractions) make
    the boundary decision bit-exact across engines; the SQL oracle embeds
    these exact literals."""
    total = sum(weights.values())
    cutoffs: list[tuple[str, int]] = []
    acc = 0.0
    for name, w in weights.items():
        acc += w / total
        cutoffs.append((name, min(int(acc * 2**64), 2**64 - 1)))
    # the last cutoff must cover the whole space regardless of float error
    cutoffs[-1] = (cutoffs[-1][0], 2**64)
    return cutoffs


def _doc_hash_u64(doc_id: int) -> int:
    """md5 of the DECIMAL STRING id, first 8 bytes little-endian — equals
    DuckDB ``md5_number_upper(cast(doc_id as varchar))``, the repo's
    established cross-engine hash bridge."""
    return int.from_bytes(hashlib.md5(str(doc_id).encode()).digest()[:8], "little")


def hash_split(docs_ds, weights: dict[str, float] | None = None):
    """(doc_id, split) — deterministic train/val/test assignment by
    hashing the doc id into the u64 space and comparing against the
    cumulative cutoffs.  A stateless ``map_batches`` (no shuffle); adding
    documents never reassigns existing ones — the stability property
    training-data splits need."""
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    cutoffs = split_cutoffs(weights)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        splits = []
        for i in ids:
            h = _doc_hash_u64(i)
            for name, cut in cutoffs:
                if h < cut:
                    splits.append(name)
                    break
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "split": pa.array(splits, pa.string()),
            }
        )

    return docs_ds.select_columns(["doc_id"]).map_batches(assign, batch_format="pyarrow")


def split_oracle_sql(weights: dict[str, float] | None = None) -> str:
    """The DuckDB equivalent of :func:`hash_split`, with the SAME integer
    cutoffs inlined as literals (computed here, so float rounding cannot
    diverge between engines)."""
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    cutoffs = split_cutoffs(weights)
    whens = "\n".join(
        f"when md5_number_upper(cast(doc_id as varchar))::hugeint < {cut} then '{name}'"
        for name, cut in cutoffs[:-1]
    )
    return f"""
        select doc_id,
               case {whens}
                    else '{cutoffs[-1][0]}' end as split
        from documents
    """


def stratified_sample(docs_ds, group_col: str = "lang", n_per_group: int = 10, shards: int = 64):
    """(doc_id, group) — the ``n_per_group`` smallest doc_ids of every
    group: deterministic stratified sampling (per-language quotas for a
    balanced training subset).

    Scale shape: a per-batch combiner caps each group at ``n_per_group``
    candidates per block (a group with 10^9 members ships ~n rows per
    block, never its population), then groups reduce through a coarse
    shard so the final quota never concentrates raw rows."""
    import numpy as np
    import zlib

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or group_col not in batch.column_names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "group": pa.array([], pa.string()),
                }
            )
        t = pa.table(
            {"doc_id": batch.column("doc_id"), "group": batch.column(group_col)}
        )
        idx = pc.select_k_unstable(
            t,
            k=t.num_rows,
            sort_keys=[("group", "ascending"), ("doc_id", "ascending")],
        )
        t = t.take(idx)
        groups = t.column("group").to_pylist()
        keep = []
        seen: dict[str, int] = {}
        for i, g in enumerate(groups):
            c = seen.get(g, 0)
            if c < n_per_group:
                keep.append(i)
                seen[g] = c + 1
        return t.take(pa.array(keep, pa.int64()))

    def add_shard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "group" not in batch.column_names:
            return batch
        sh = [zlib.crc32(g.encode()) % shards for g in batch.column("group").to_pylist()]
        return batch.append_column("shard", pa.array(sh, pa.int32()))

    def shard_final(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "group" not in group.column_names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "group": pa.array([], pa.string()),
                }
            )
        ids = np.asarray(group.column("doc_id").to_pylist(), dtype=np.int64)
        gs = np.asarray(group.column("group").to_pylist(), dtype=object)
        order = np.lexsort((ids, gs))
        ids, gs = ids[order], gs[order]
        starts = np.r_[True, gs[1:] != gs[:-1]]
        pos = np.arange(len(ids)) - np.maximum.accumulate(
            np.where(starts, np.arange(len(ids)), 0)
        )
        keep = pos < n_per_group
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "group": pa.array(gs[keep].tolist(), pa.string()),
            }
        )

    return (
        docs_ds.select_columns(["doc_id", group_col])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: shard_final(g.drop_columns(["shard"])), batch_format="pyarrow"
        )
    )
