"""Suffix-array-family substring dedup: prefix-doubling equality classes.

``ops/dedup.duplicated_spans`` is the k-gram cut-set form (and its
docstring proves cut-set equivalence at fixed threshold).  This module
adds the SUFFIX-ARRAY side of the family — Manber-Myers prefix doubling
run as O(log L) Ray Data exchanges — for the semantics the k-gram form
deliberately does not cover:

* occurrences are counted ANYWHERE (a substring repeated twice inside one
  document is a duplicate — Lee et al.'s actual ExactSubstr definition),
  not per-distinct-document;
* equality is EXACT token-sequence equality (equality-class ids are class
  representatives, never content hashes), so there is no collision story
  to wave away;
* the length-L prefix classes come out of rank composition, so no
  L-token gram string is ever materialized — at L=64 the k-gram form
  ships 64x the token payload per row, prefix doubling ships two int64
  ranks per row per round.

Positions are (doc_id, tpos) pairs — suffixes never cross documents, so
no sentinel machinery is needed (the concatenated-corpus trick's
boundary hazards disappear; a shift past the document end contributes
the reserved rank -1, which no real class ever equals).

Scale shape: every round is two coarse-hash-partitioned exchanges of
(position, rank) rows — rows never grow, the driver holds nothing, and
class ids are min-position representatives assigned by a vectorized
run-length scan inside each partition (one Python call per ~4xCPU
partition, never per class).  ceil(log2 L) rounds + one residual
combine reach exact length-L classes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import TOKEN_RE

# poskey = doc_id * 2^32 + tpos: unique int64 per position, min() over a
# class is deterministic and orders by (doc, tpos)
_POS_SHIFT = 32
_PRIME = 0x9E3779B97F4A7C15  # partition mixing only — never a class id


def _parts() -> int:
    import ray

    return 4 * max(1, int(ray.cluster_resources().get("CPU", 8)))


def _part_of(a: np.ndarray, b: np.ndarray, parts: int) -> np.ndarray:
    mixed = (a.astype(np.uint64) * np.uint64(_PRIME)) ^ b.astype(np.uint64)
    return (mixed % np.uint64(parts)).astype(np.int32)


def _empty_rank() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "tpos": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "valid": pa.array([], pa.bool_()),
        }
    )


def prefix_doubling_dup_spans(docs_ds, min_len: int = 8, parts: int | None = None):
    """(doc_id, start_tok, end_tok) — maximal runs of consecutive token
    positions that start an exactly-duplicated length-``min_len`` token
    sequence occurring >= 2 times anywhere in the corpus (same document
    included).  0-based inclusive token offsets, the duplicated_spans
    output convention; every token of a duplicated substring of length
    >= min_len is covered.

    Pipeline: tokenize -> initial single-token classes -> prefix-doubling
    rounds (shift 1, 2, 4, ... then one residual shift to land exactly on
    ``min_len``) -> length-L class sizes over valid starts -> per-doc
    islands merge.  Each round = one position-keyed exchange (attach the
    shifted rank) + one pair-keyed exchange (assign min-position class
    representatives); see module docstring for the scale argument."""
    if min_len < 2:
        raise ValueError("min_len must be >= 2")
    n_parts = parts if parts is not None else _parts()

    # --- tokenize: (doc, tpos, tok, valid) rows ----------------------
    def tok_rows(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "tpos": pa.array([], pa.int64()),
                "tok": pa.array([], pa.string()),
                "valid": pa.array([], pa.bool_()),
            }
        )
        if batch.num_rows == 0 or "text" not in batch.column_names:
            return empty
        docs, poss, toks, valids = [], [], [], []
        for doc_id, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ws = TOKEN_RE.findall(t.lower())
            nt = len(ws)
            docs.extend([doc_id] * nt)
            poss.extend(range(nt))
            toks.extend(ws)
            valids.extend([p + min_len <= nt for p in range(nt)])
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.int64()),
                "tpos": pa.array(poss, pa.int64()),
                "tok": pa.array(toks, pa.string()),
                "valid": pa.array(valids, pa.bool_()),
            }
        )

    rows = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        tok_rows, batch_format="pyarrow"
    )

    # --- initial classes: rank_1 = min poskey among equal tokens ------
    def tok_part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "tok" not in batch.column_names:
            return batch.append_column("part", pa.array([], pa.int32()))
        from ..state.lineage import url_buckets

        return batch.append_column(
            "part", pa.array(url_buckets(batch.column("tok"), n_parts), pa.int32())
        )

    def assign_tok_class(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "tok" not in group.column_names:
            return _empty_rank()
        doc = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        tp = group.column("tpos").combine_chunks().to_numpy(zero_copy_only=False)
        poskey = (doc << _POS_SHIFT) | tp
        codes = pc.dictionary_encode(group.column("tok").combine_chunks())
        idx = np.asarray(codes.indices)
        order = np.lexsort((poskey, idx))
        idx_s, pk_s = idx[order], poskey[order]
        starts = np.flatnonzero(np.r_[True, np.diff(idx_s) != 0])
        sizes = np.r_[starts[1:], len(idx_s)] - starts
        rank = np.repeat(pk_s[starts], sizes)  # min poskey per run (sorted)
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "tpos": pa.array(tp, pa.int64()),
                "rank": pa.array(rank[inv].astype(np.int64)),
                "valid": group.column("valid"),
            }
        )

    ranks = (
        rows.map_batches(tok_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(assign_tok_class, batch_format="pyarrow")
    )

    # --- one doubling round: rank_{h+shift}(p) from (rank(p), rank(p+shift))
    def round_once(ranks_ds, shift: int, final: bool):
        def sides(batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "tpos": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "valid": pa.array([], pa.bool_()),
                    "side": pa.array([], pa.int32()),
                    "part": pa.array([], pa.int32()),
                }
            )
            if batch.num_rows == 0 or "rank" not in batch.column_names:
                return empty
            doc = batch.column("doc_id").combine_chunks()
            tp = batch.column("tpos").combine_chunks()
            rk = batch.column("rank").combine_chunks()
            vd = batch.column("valid").combine_chunks()
            n = batch.num_rows
            # side 0: this position's own rank; side 1: provider for p-shift
            tp_b = pc.subtract(tp, pa.scalar(shift, pa.int64()))
            keep = pc.greater_equal(tp_b, pa.scalar(0, pa.int64()))
            t0 = pa.table(
                {
                    "doc_id": doc,
                    "tpos": tp,
                    "rank": rk,
                    "valid": vd,
                    "side": pa.array(np.zeros(n, np.int32)),
                }
            )
            t1 = pa.table(
                {
                    "doc_id": doc,
                    "tpos": tp_b,
                    "rank": rk,
                    "valid": pa.array(np.zeros(n, np.bool_)),
                    "side": pa.array(np.ones(n, np.int32)),
                }
            ).filter(keep)
            t = pa.concat_tables([t0, t1])
            d = t.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
            p = t.column("tpos").combine_chunks().to_numpy(zero_copy_only=False)
            poskey = (d << _POS_SHIFT) | p
            return t.append_column(
                "part", pa.array(_part_of(poskey, poskey, n_parts), pa.int32())
            )

        def combine(group: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "tpos": pa.array([], pa.int64()),
                    "ra": pa.array([], pa.int64()),
                    "rb": pa.array([], pa.int64()),
                    "valid": pa.array([], pa.bool_()),
                    "part": pa.array([], pa.int32()),
                }
            )
            if group.num_rows == 0 or "side" not in group.column_names:
                return empty
            d = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
            p = group.column("tpos").combine_chunks().to_numpy(zero_copy_only=False)
            r = group.column("rank").combine_chunks().to_numpy(zero_copy_only=False)
            s = group.column("side").combine_chunks().to_numpy(zero_copy_only=False)
            v = group.column("valid").combine_chunks().to_numpy(zero_copy_only=False)
            poskey = (d << _POS_SHIFT) | p
            order = np.lexsort((s, poskey))
            pk_s, r_s, s_s, v_s = poskey[order], r[order], s[order], v[order]
            starts = np.flatnonzero(np.r_[True, np.diff(pk_s) != 0])
            sizes = np.r_[starts[1:], len(pk_s)] - starts
            # side-1 rows exist only where a side-0 row exists (providers
            # point at real positions of the same doc), so every run is
            # [side0] or [side0, side1]
            ra = r_s[starts]
            rb = np.full(len(starts), -1, np.int64)
            has_b = sizes == 2
            rb[has_b] = r_s[starts[has_b] + 1]
            out_d = (pk_s[starts] >> _POS_SHIFT).astype(np.int64)
            out_p = (pk_s[starts] & ((1 << _POS_SHIFT) - 1)).astype(np.int64)
            return pa.table(
                {
                    "doc_id": pa.array(out_d),
                    "tpos": pa.array(out_p),
                    "ra": pa.array(ra.astype(np.int64)),
                    "rb": pa.array(rb),
                    "valid": pa.array(v_s[starts]),
                    "part": pa.array(_part_of(ra, rb, n_parts)),
                }
            )

        def assign_class(group: pa.Table) -> pa.Table:
            if group.num_rows == 0 or "ra" not in group.column_names:
                if final:
                    return pa.table(
                        {
                            "doc_id": pa.array([], pa.int64()),
                            "tpos": pa.array([], pa.int64()),
                        }
                    )
                return _empty_rank()
            d = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
            p = group.column("tpos").combine_chunks().to_numpy(zero_copy_only=False)
            ra = group.column("ra").combine_chunks().to_numpy(zero_copy_only=False)
            rb = group.column("rb").combine_chunks().to_numpy(zero_copy_only=False)
            v = group.column("valid").combine_chunks().to_numpy(zero_copy_only=False)
            poskey = (d << _POS_SHIFT) | p
            order = np.lexsort((poskey, rb, ra))
            ra_s, rb_s, pk_s, v_s = ra[order], rb[order], poskey[order], v[order]
            new_run = np.r_[True, (np.diff(ra_s) != 0) | (np.diff(rb_s) != 0)]
            starts = np.flatnonzero(new_run)
            sizes = np.r_[starts[1:], len(ra_s)] - starts
            if final:
                # dup = class with >= 2 VALID starts; emit the valid ones
                run_id = np.cumsum(new_run) - 1
                valid_per_run = np.bincount(
                    run_id, weights=v_s.astype(np.int64), minlength=len(starts)
                )
                dup = v_s & (valid_per_run[run_id] >= 2)
                keep = pk_s[dup]
                return pa.table(
                    {
                        "doc_id": pa.array((keep >> _POS_SHIFT).astype(np.int64)),
                        "tpos": pa.array(
                            (keep & ((1 << _POS_SHIFT) - 1)).astype(np.int64)
                        ),
                    }
                )
            rank = np.repeat(pk_s[starts], sizes)  # min poskey per class
            inv = np.empty_like(order)
            inv[order] = np.arange(len(order))
            return pa.table(
                {
                    "doc_id": pa.array(d, pa.int64()),
                    "tpos": pa.array(p, pa.int64()),
                    "rank": pa.array(rank[inv].astype(np.int64)),
                    "valid": pa.array(v),
                }
            )

        return (
            ranks_ds.map_batches(sides, batch_format="pyarrow")
            .groupby("part")
            .map_groups(combine, batch_format="pyarrow")
            .groupby("part")
            .map_groups(assign_class, batch_format="pyarrow")
        )

    # doubling schedule: lengths 1 -> 2 -> 4 -> ... -> hf, then one
    # residual combine with shift (min_len - hf) to land exactly on L
    length = 1
    while length * 2 <= min_len:
        ranks = round_once(ranks, shift=length, final=(length * 2 == min_len))
        length *= 2
    if length < min_len:
        ranks = round_once(ranks, shift=min_len - length, final=True)
    dup_starts = ranks  # final=True emitted (doc_id, tpos) dup starts

    # --- islands: maximal runs of consecutive dup starts ---------------
    def doc_shard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "tpos": pa.array([], pa.int64()),
                    "shard": pa.array([], pa.int32()),
                }
            )
        shard = pc.bit_wise_and(batch.column("doc_id"), pa.scalar(255, pa.int64()))
        return batch.append_column("shard", shard.cast(pa.int32()))

    def islands(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "start_tok": pa.array([], pa.int64()),
                "end_tok": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or "tpos" not in group.column_names:
            return empty
        tbl = group.sort_by([("doc_id", "ascending"), ("tpos", "ascending")])
        d = tbl.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        p = tbl.column("tpos").combine_chunks().to_numpy(zero_copy_only=False)
        brk = np.r_[True, (d[1:] != d[:-1]) | (np.diff(p) != 1)]
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(p)] - 1
        return pa.table(
            {
                "doc_id": pa.array(d[starts], pa.int64()),
                "start_tok": pa.array(p[starts], pa.int64()),
                "end_tok": pa.array(p[ends] + (min_len - 1), pa.int64()),
            }
        )

    return (
        dup_starts.map_batches(doc_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(islands, batch_format="pyarrow")
    )
