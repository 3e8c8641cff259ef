"""Sketch / sampling operators — the bounded-state summaries a 100-TB
corpus audit runs where exact answers would shuffle the world:

* :func:`vocab_hll` — HyperLogLog registers for corpus vocabulary
  cardinality.  Registers (bucket, rho_max) are EXACT integers under a
  fixed hash, so the distributed result is deterministic and a DuckDB
  oracle can re-derive every register with integer bit logic — the
  estimate itself is a driver-side closed form over 2^p tiny rows.
* :func:`bottomk_sample` — deterministic uniform k-sample as the k
  smallest documents under the md5 hash order (bottom-k sketch).  Unlike
  reservoir sampling, bottom-k is associative/mergeable: per-batch k-cap
  combiners compose to the exact global answer regardless of block
  splits, and the SQL oracle is ``order by md5 limit k``.

Both follow the repo's two-stage shape: per-batch partials bounded by the
sketch size, one small groupby to merge.  The hash is DuckDB's
``md5_number_upper`` (little-endian first 8 md5 bytes) so Python and SQL
agree byte-for-byte.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.similarity import _md5_hash64
from .text import TOKEN_RE

HLL_P = 12  # 2^12 = 4096 registers; relative error ~1.04/sqrt(4096) = 1.6%


def _hll_partial(tokens: set[str], p: int) -> np.ndarray:
    """Dense rho_max register array for one batch's distinct tokens.
    bucket = top ``p`` bits of the 64-bit hash; rho = 1-based position of
    the first set bit in the remaining ``64 - p`` bits (0 if none)."""
    regs = np.zeros(1 << p, dtype=np.int64)
    w_bits = 64 - p
    for t in tokens:
        h = _md5_hash64(t.encode("utf-8"))
        bucket = h >> w_bits
        w = h & ((1 << w_bits) - 1)
        # position of first 1 from the MSB side of the w_bits window
        rho = w_bits - w.bit_length() + 1 if w else 0
        if rho > regs[bucket]:
            regs[bucket] = rho
    return regs


def vocab_hll(docs_ds, p: int = HLL_P):
    """(bucket, rho_max) HyperLogLog registers over the corpus token
    vocabulary — one row per non-empty register, <= 2^p rows total.
    Per-batch partial registers merge with MAX (associative), so the
    groupby input is bounded by 2^p rows per block no matter the corpus
    size."""
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        toks: set[str] = set()
        for t in batch.column("text").to_pylist():
            toks.update(TOKEN_RE.findall(t))
        regs = _hll_partial(toks, p)
        nz = np.flatnonzero(regs)
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "rho_max": pa.array(regs[nz], pa.int64()),
            }
        )

    return (
        docs_ds.select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Max("rho_max", alias_name="rho_max"))
    )


def hll_estimate(registers: pa.Table, p: int = HLL_P) -> float:
    """Driver-side closed form over the (tiny) register table: the
    standard HLL estimator with the small-range linear-counting
    correction.  Deterministic given the registers."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.int64)
    regs[np.asarray(registers.column("bucket"))] = np.asarray(
        registers.column("rho_max")
    )
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


def hll_oracle_sql(p: int = HLL_P) -> str:
    """DuckDB mirror of :func:`vocab_hll`: exact integer bit logic over
    md5_number_upper — rho via a list scan for the first set bit (no
    float log2, so no precision coin-flips)."""
    w_bits = 64 - p
    return f"""
        with toks as (select distinct unnest(regexp_extract_all(text,
                          '[A-Za-z0-9_]+')) as tok
                      from documents),
             h as (select md5_number_upper(tok) as hv from toks),
             r as (select (hv >> {w_bits})::bigint as bucket,
                          case when (hv & {(1 << w_bits) - 1}) = 0 then 0
                               else list_position(
                                   [((hv >> ({w_bits} - b)) & 1)::bigint
                                    for b in range(1, {w_bits + 1})], 1)
                          end as rho
                   from h)
        select bucket, max(rho)::bigint as rho_max
        from r group by bucket having max(rho) > 0
    """


def bottomk_sample(docs_ds, k: int = 50):
    """The ``k`` documents with the smallest md5(doc_id) — a uniform,
    DETERMINISTIC corpus sample.  Bottom-k is mergeable: each batch keeps
    at most k rows (combiner), a single-group final pass keeps the global
    bottom k; block splits cannot change the answer.  Emits
    (doc_id, sample_rank) with rank 0..k-1 in hash order."""

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [
            _md5_hash64(str(d).encode("utf-8"))
            for d in batch.column("doc_id").to_pylist()
        ]
        t = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "h": pa.array(np.array(hs, dtype=np.uint64), pa.uint64()),
            }
        )
        idx = pc.sort_indices(t, sort_keys=[("h", "ascending"), ("doc_id", "ascending")])
        return t.take(idx[: min(k, len(idx))])

    def final(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[("h", "ascending"), ("doc_id", "ascending")]
        )
        g = group.take(idx[: min(k, group.num_rows)])
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "sample_rank": pa.array(np.arange(g.num_rows), pa.int64()),
            }
        )

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_g", pa.array(np.zeros(batch.num_rows, dtype=np.int32), pa.int32())
        )

    return (
        docs_ds.select_columns(["doc_id"])
        .map_batches(add_hash, batch_format="pyarrow")
        .map_batches(tag, batch_format="pyarrow")
        .groupby("_g")
        .map_groups(final, batch_format="pyarrow")
    )


def bottomk_oracle_sql(k: int = 50) -> str:
    return f"""
        with h as (select doc_id,
                          md5_number_upper(cast(doc_id as varchar)) as hv
                   from documents)
        select doc_id,
               (row_number() over (order by hv, doc_id) - 1)::bigint as sample_rank
        from h order by hv, doc_id limit {k}
    """

def heavy_tokens(ds, phi: float = 0.005, text_col: str = "text",
                 capacity: int | None = None):
    """EXACT heavy hitters — every token whose global occurrence count is
    >= ceil(phi * N) (N = total token occurrences) — found WITHOUT the
    full-vocabulary shuffle :func:`vocab_build` pays.

    Two streaming passes, both with bounded state:

    1. **Sketch.**  Each block folds its token counts into a batched
       Misra-Gries summary of ``capacity`` counters (exact ``np.unique``
       counts, then subtract the (capacity+1)-th largest count and drop
       non-positives — the classic batch decrement).  Per-block estimate
       error is <= n_block/(capacity+1); summing per-block summaries in a
       tiny groupby keeps total error <= N/(capacity+1).  With
       ``capacity >= 2/phi`` (the default) every phi-heavy token provably
       survives with summed estimate >= thresh - N/(capacity+1) > 0, and
       the candidate set is <= ~2/phi tokens — a few hundred rows on the
       driver no matter the corpus size.
    2. **Verify.**  The candidate token set is broadcast once via
       ``ray.put``; a second pass counts ONLY candidate tokens exactly
       (per-block state bounded by the candidate count), one small
       groupby merges, and ``n >= thresh`` filters to the exact answer.

    Tokens are ASCII-explicit ``[A-Za-z0-9_]+`` matches lowercased
    per-token (all-ASCII, so Python and DuckDB ``lower()`` agree
    byte-for-byte).  Emits (token, n) with n exact."""
    import ray
    from ray.data.aggregate import Sum

    cap = capacity or max(64, int(np.ceil(2.0 / phi)))
    sentinel = "\x00total"  # NUL-prefixed: cannot collide with a token

    def tokens_of(batch: pa.Table) -> np.ndarray:
        toks: list[str] = []
        for t in batch.column(text_col).to_pylist():
            if t:
                toks.extend(w.lower() for w in TOKEN_RE.findall(t))
        return np.asarray(toks, dtype=object)

    def mg_partial(batch: pa.Table) -> pa.Table:
        toks = tokens_of(batch)
        n_blk = int(toks.size)
        if n_blk == 0:
            uniq = np.empty(0, dtype=object)
            est = np.empty(0, dtype=np.int64)
        else:
            uniq, counts = np.unique(toks, return_counts=True)
            if uniq.size > cap:
                kth = np.partition(counts, -(cap + 1))[-(cap + 1)]
                keep = counts > kth
                uniq, est = uniq[keep], (counts[keep] - kth).astype(np.int64)
            else:
                est = counts.astype(np.int64)
        return pa.table(
            {
                "token": pa.array(list(uniq) + [sentinel], pa.string()),
                "mg": pa.array(np.append(est, n_blk), pa.int64()),
            }
        )

    summary = (
        ds.select_columns([text_col])
        .map_batches(mg_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("mg", alias_name="mg"))
        .materialize()  # <= capacity x blocks rows + 1 — bounded by design
    )
    total_tbl = summary.filter(lambda r: r["token"] == sentinel).take_all()
    n_total = int(total_tbl[0]["mg"]) if total_tbl else 0
    if n_total == 0:
        return ray.data.from_arrow(
            pa.table({"token": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
        )
    thresh = int(np.ceil(phi * n_total))
    floor_est = thresh - n_total / (cap + 1)
    cand_rows = summary.filter(
        lambda r: r["token"] != sentinel and r["mg"] >= floor_est
    ).take_all()  # provably <= ~2/phi rows (see docstring)
    candidates = {r["token"] for r in cand_rows}
    if not candidates:
        return ray.data.from_arrow(
            pa.table({"token": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
        )
    cand_ref = ray.put(np.asarray(sorted(candidates), dtype=object))

    def count_candidates(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)  # zero-copy from the local object store
        toks = tokens_of(batch)
        if toks.size == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        idx = np.searchsorted(cand, toks)
        idx[idx == cand.size] = 0
        hit = cand[idx] == toks
        uniq, counts = np.unique(toks[hit], return_counts=True)
        return pa.table(
            {
                "token": pa.array(list(uniq), pa.string()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    exact = (
        ds.select_columns([text_col])
        .map_batches(count_candidates, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )
    return exact.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n"), thresh))
        if b.num_rows and "n" in b.column_names
        else b,
        batch_format="pyarrow",
    )


def heavy_tokens_oracle_sql(source_sql: str, phi: float = 0.005) -> str:
    """DuckDB mirror: exact counts over the same ASCII token rule, HAVING
    count >= ceil(phi * total)."""
    return f"""
        with tok as (select lower(unnest(regexp_extract_all(text,
                         '[A-Za-z0-9_]+'))) as token
                     from ({source_sql})),
             n as (select count(*)::bigint as total from tok)
        select token, count(*)::bigint as n
        from tok group by token
        having count(*) >= ceil({phi} * (select total from n))
    """


def groupwise_hll(ds, group_col: str, value_col: str, p: int = HLL_P):
    """Per-group HyperLogLog registers — approximate COUNT(DISTINCT value)
    BY group with per-group state bounded at 2^p registers, the way a
    10^12-row table answers "distinct users per event type" without a
    (group, value) distinct-shuffle.

    Each block folds its (group, distinct-values) into sparse
    (group, bucket, rho_max) partial rows (<= groups x 2^p per block, in
    practice ~groups x distinct-ish); registers merge with MAX in one
    small groupby.  Registers are EXACT integers under the fixed md5
    hash, so the distributed result is deterministic and the DuckDB
    oracle re-derives every register with integer bit logic.  Feed the
    per-group register table to :func:`hll_estimate` (filtered to one
    group) for the cardinality estimate."""
    from ray.data.aggregate import Max

    w_bits = 64 - p

    def partial(batch: pa.Table) -> pa.Table:
        per_group: dict[str, dict[int, int]] = {}
        for g, v in zip(
            batch.column(group_col).to_pylist(),
            batch.column(value_col).to_pylist(),
        ):
            h = _md5_hash64(str(v).encode("utf-8"))
            bucket = h >> w_bits
            w = h & ((1 << w_bits) - 1)
            rho = w_bits - w.bit_length() + 1 if w else 0
            if rho:
                regs = per_group.setdefault(str(g), {})
                if rho > regs.get(bucket, 0):
                    regs[bucket] = rho
        gs, bs, rs = [], [], []
        for g, regs in per_group.items():
            for b, r in regs.items():
                gs.append(g)
                bs.append(b)
                rs.append(r)
        return pa.table(
            {
                group_col: pa.array(gs, pa.string()),
                "bucket": pa.array(np.array(bs, dtype=np.int64), pa.int64()),
                "rho_max": pa.array(np.array(rs, dtype=np.int64), pa.int64()),
            }
        )

    return (
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "bucket"])
        .aggregate(Max("rho_max", alias_name="rho_max"))
    )


def groupwise_hll_oracle_sql(
    table: str, group_col: str, value_col: str, p: int = HLL_P
) -> str:
    """DuckDB mirror of :func:`groupwise_hll`: the exact register bit
    logic of :func:`hll_oracle_sql`, partitioned by the group column."""
    w_bits = 64 - p
    return f"""
        with v as (select distinct {group_col}::varchar as g,
                          {value_col}::varchar as val
                   from {table}),
             h as (select g, md5_number_upper(val) as hv from v),
             r as (select g, (hv >> {w_bits})::bigint as bucket,
                          case when (hv & {(1 << w_bits) - 1}) = 0 then 0
                               else list_position(
                                   [((hv >> ({w_bits} - b)) & 1)::bigint
                                    for b in range(1, {w_bits + 1})], 1)
                          end as rho
                   from h)
        select g as {group_col}, bucket, max(rho)::bigint as rho_max
        from r group by g, bucket having max(rho) > 0
    """


def hll_row_estimates(regs: "np.ndarray", p: int) -> "np.ndarray":
    """Vectorized HLL estimate per ROW of an (n, 2^p) register matrix —
    the exact closed form of :func:`hll_estimate` (standard estimator +
    small-range linear counting), shared by the HyperBall engine op and
    its single-process gold mirror so both evaluate bit-identical floats
    over identical registers."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum(axis=1)
    zeros = (regs == 0).sum(axis=1)
    lc = m * np.log(m / np.maximum(zeros, 1))
    use_lc = (est <= 2.5 * m) & (zeros > 0)
    return np.where(use_lc, lc, est)


def hll_single_register(key: bytes, p: int) -> tuple[int, int]:
    """(bucket, rho) of one hashed key — the seed register a HyperBall
    counter starts from (the ball of radius 0 is {node})."""
    h = _md5_hash64(key)
    w_bits = 64 - p
    bucket = h >> w_bits
    w = h & ((1 << w_bits) - 1)
    rho = w_bits - w.bit_length() + 1 if w else 0
    return int(bucket), int(rho)
