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


def _mix_hash_u64(doc_id: int) -> int:
    """Salted variant of :func:`_doc_hash_u64` for the mixing decision —
    independent of the split hash so mixing never correlates with
    train/val membership.  Equals DuckDB
    ``md5_number_upper('mix:' || cast(doc_id as varchar))``."""
    return int.from_bytes(
        hashlib.md5(f"mix:{doc_id}".encode()).digest()[:8], "little"
    )


def mix_cutoff(rate: float) -> tuple[int, int]:
    """(whole_copies, fractional u64 cutoff) for a sampling rate — the
    integer literals both engines compare against (bit-exact boundary)."""
    whole = int(rate)
    return whole, min(int((rate - whole) * 2**64), 2**64 - 1)


def weighted_mix(docs_ds, rates: dict[str, float], default_rate: float = 1.0):
    """(doc_id, source, rep) — per-source weighted resampling WITH
    repetition: the source-mixing / epoch-weighting step training-data
    recipes apply before packing (rate 2.5 = every doc twice plus a
    deterministic 50% chance of a third copy; rate 0.3 = keep 30%).

    A stateless ``map_batches`` (no shuffle): the rate dict is captured by
    closure (bytes), the per-doc decision is a salted content hash against
    precomputed integer cutoffs, so the subset is a pure function of the
    input — stable under reruns and appends, and SQL-mirrorable
    (:func:`mix_oracle_sql`).  ``rep`` numbers the repetitions (0-based)
    so downstream packing can interleave epochs deterministically."""
    cuts = {s: mix_cutoff(r) for s, r in rates.items()}
    default_cut = mix_cutoff(default_rate)

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        srcs = batch.column("source").to_pylist()
        out_id, out_src, out_rep = [], [], []
        for i, s in zip(ids, srcs):
            whole, frac_cut = cuts.get(s, default_cut)
            n = whole + (1 if _mix_hash_u64(i) < frac_cut else 0)
            for c in range(n):
                out_id.append(i)
                out_src.append(s)
                out_rep.append(c)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "source": pa.array(out_src, pa.string()),
                "rep": pa.array(out_rep, pa.int64()),
            }
        )

    return docs_ds.select_columns(["doc_id", "source"]).map_batches(
        expand, batch_format="pyarrow"
    )


def mix_oracle_sql(rates: dict[str, float], default_rate: float = 1.0) -> str:
    """DuckDB equivalent of :func:`weighted_mix`, with the SAME integer
    cutoffs inlined (float rounding cannot diverge between engines)."""
    whens_whole = "\n".join(
        f"when '{s}' then {mix_cutoff(r)[0]}" for s, r in rates.items()
    )
    whens_frac = "\n".join(
        f"when '{s}' then {mix_cutoff(r)[1]}::hugeint" for s, r in rates.items()
    )
    dw, df = mix_cutoff(default_rate)
    return f"""
        with r as (
            select doc_id, source,
                   (case source {whens_whole} else {dw} end)
                   + case when md5_number_upper('mix:' || cast(doc_id as varchar))::hugeint
                               < (case source {whens_frac} else {df}::hugeint end)
                          then 1 else 0 end as n_copies
            from documents
        )
        select doc_id, source, unnest(range(n_copies)) as rep
        from r where n_copies > 0
    """


def _dsir_bucket(word: str, buckets: int) -> int:
    """Feature-hash bucket for a token: first 8 md5 hex chars as an int,
    mod ``buckets`` — equals DuckDB
    ``('0x' || substr(md5(word), 1, 8))::ubigint % buckets``."""
    return int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % buckets


def dsir_select(
    docs_ds,
    target_lang: str = "en",
    hash_buckets: int | None = 1024,
    n_part: int | None = None,
):
    """DSIR-style importance resampling (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every document
    by how much more likely its tokens are under a TARGET distribution
    than under the raw-corpus distribution, in exact integer ppm —
    ``(doc_id, score_ppm, keep)`` with ``keep = score_ppm > 0``.

    Target here is the in-corpus slice ``lang == target_lang`` (the
    recipe's target set is whatever high-quality slice you can identify;
    a lang slice keeps the demo fully self-contained and SQL-mirrorable).
    Per-feature log ratio with add-one smoothing over the shared
    vocabulary V:

        w(f) = ln( ((ct(f)+1) * (Tr+V)) / ((cr(f)+1) * (Tt+V)) )

    quantized to ``floor(10^6 * w)`` — libm log over identical doubles on
    both engines, so the floor is bit-stable — and the document score is
    the INTEGER sum of its tokens' ppm weights (order-free, hash-exact).

    ``hash_buckets`` is the paper's memory bound: tokens fold into a
    fixed md5-bucket feature space, so the weight table (and therefore
    the join's small side) is O(buckets) at ANY corpus scale; ``None``
    keeps exact word features.  Shape: one counting pass over the corpus
    (raw + target counts in the SAME kind-free groupby — target counts
    are a conditional partial, not a second scan), a vocab-scale weight
    map, then one scoring pass joined against the weight table and one
    groupby-sum per doc.  Every doc keeps a zero marker row so empty
    documents score 0 instead of vanishing in the join."""
    import math

    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..ops.text import TOKEN_RE

    def feat(words: list[str]) -> list:
        if hash_buckets is None:
            return words
        return [_dsir_bucket(w, hash_buckets) for w in words]

    feat_type = pa.string() if hash_buckets is None else pa.int64()

    def count_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "f": pa.array([], feat_type),
                "n_raw": pa.array([], pa.int64()),
                "n_tgt": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or "text" not in batch.column_names:
            return empty
        raw: dict = {}
        tgt: dict = {}
        for t, lang in zip(
            batch.column("text").to_pylist(), batch.column("lang").to_pylist()
        ):
            fs = feat(TOKEN_RE.findall(t.lower()))
            is_t = lang == target_lang
            for f in fs:
                raw[f] = raw.get(f, 0) + 1
                if is_t:
                    tgt[f] = tgt.get(f, 0) + 1
        return pa.table(
            {
                "f": pa.array(list(raw), feat_type),
                "n_raw": pa.array(list(raw.values()), pa.int64()),
                "n_tgt": pa.array([tgt.get(f, 0) for f in raw], pa.int64()),
            }
        )

    counts = (
        docs_ds.select_columns(["text", "lang"])
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("f")
        .aggregate(Sum("n_raw", alias_name="n_raw"), Sum("n_tgt", alias_name="n_tgt"))
        .materialize()
    )
    tots = counts.sum(["n_raw", "n_tgt"], ignore_nulls=True)
    t_raw = float(tots["sum(n_raw)"] or 0)
    t_tgt = float(tots["sum(n_tgt)"] or 0)
    n_vocab = float(counts.count())

    def weigh(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "f" not in batch.column_names:
            return pa.table(
                {"f": pa.array([], feat_type), "w_ppm": pa.array([], pa.int64())}
            )
        # math.log (libm) over the vocab-scale count table — bit-parity
        # with DuckDB ln, never evaluated per corpus token
        w = [
            math.floor(
                1_000_000.0
                * math.log(
                    ((ct + 1.0) * (t_raw + n_vocab))
                    / ((cr + 1.0) * (t_tgt + n_vocab))
                )
            )
            for cr, ct in zip(
                batch.column("n_raw").to_pylist(), batch.column("n_tgt").to_pylist()
            )
        ]
        return pa.table(
            {"f": batch.column("f"), "w_ppm": pa.array(np.array(w, np.int64))}
        )

    weights = counts.map_batches(weigh, batch_format="pyarrow").materialize()

    def doc_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "f": pa.array([], feat_type),
                "n": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or "text" not in batch.column_names:
            return empty
        ids: list[int] = []
        fs: list = []
        ns: list[int] = []
        for doc_id, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            cnt: dict = {}
            for f in feat(TOKEN_RE.findall(t.lower())):
                cnt[f] = cnt.get(f, 0) + 1
            ids.extend([doc_id] * len(cnt))
            fs.extend(cnt.keys())
            ns.extend(cnt.values())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "f": pa.array(fs, feat_type),
                "n": pa.array(ns, pa.int64()),
            }
        )

    doc_feats = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        doc_partial, batch_format="pyarrow"
    )

    if n_part is None:
        from ..ops.dedup import _join_partitions

        n_part = 1 if weights.count() < 10_000 else _join_partitions()

    def contrib(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "n" not in batch.column_names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "score_ppm": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "score_ppm": pc.multiply(
                    batch.column("n").cast(pa.int64()),
                    batch.column("w_ppm").cast(pa.int64()),
                ),
            }
        )

    def markers(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "score_ppm": pa.array([], pa.int64()),
                }
            )
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "score_ppm": pa.array(np.zeros(n, np.int64)),
            }
        )

    scored = (
        doc_feats.join(
            weights,
            join_type="inner",
            num_partitions=n_part,
            on=("f",),
        )
        .map_batches(contrib, batch_format="pyarrow")
        .union(
            docs_ds.select_columns(["doc_id"]).map_batches(
                markers, batch_format="pyarrow"
            )
        )
        .groupby("doc_id")
        .sum("score_ppm")
        .rename_columns({"sum(score_ppm)": "score_ppm"})
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "score_ppm" not in batch.column_names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "score_ppm": pa.array([], pa.int64()),
                    "keep": pa.array([], pa.int64()),
                }
            )
        s = batch.column("score_ppm").cast(pa.int64())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "score_ppm": s,
                "keep": pc.greater(s, 0).cast(pa.int64()),
            }
        )

    return scored.map_batches(finish, batch_format="pyarrow")


def dsir_oracle_sql(target_lang: str = "en", hash_buckets: int | None = 1024) -> str:
    """DuckDB mirror of :func:`dsir_select` — identical feature hash,
    identical double operand order inside ln, identical ppm floor."""
    if hash_buckets is None:
        f_expr = "w"
    else:
        f_expr = f"('0x' || substr(md5(w), 1, 8))::ubigint % {hash_buckets}"
    return f"""
        with tok as (select doc_id, lang,
                            unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) as w
                     from documents),
        ft as (select doc_id, lang, {f_expr} as f from tok),
        c as (select f, count(*)::bigint as n_raw,
                     sum(case when lang = '{target_lang}' then 1 else 0 end)::bigint
                         as n_tgt
              from ft group by f),
        tot as (select sum(n_raw)::double as t_raw, sum(n_tgt)::double as t_tgt,
                       count(*)::double as v from c),
        wt as (select f,
                      floor(1000000 * ln(((n_tgt + 1.0) * (tot.t_raw + tot.v))
                                         / ((n_raw + 1.0) * (tot.t_tgt + tot.v))))::bigint
                          as w_ppm
               from c, tot),
        dfc as (select doc_id, f, count(*)::bigint as n from ft group by doc_id, f),
        s as (select d.doc_id, sum(d.n * w.w_ppm)::bigint as score_ppm
              from dfc d join wt w using (f) group by d.doc_id)
        select doc_id, coalesce(s.score_ppm, 0) as score_ppm,
               cast(coalesce(s.score_ppm, 0) > 0 as bigint) as keep
        from documents left join s using (doc_id)
    """


def _shard_hash_u64(doc_id: int) -> int:
    """Salted shard hash ("shard:" prefix keeps it independent of the
    split/mix hashes) — equals DuckDB
    ``md5_number_upper('shard:' || cast(doc_id as varchar))``."""
    return int.from_bytes(
        hashlib.md5(f"shard:{doc_id}".encode()).digest()[:8], "little"
    )


def shuffle_shard(docs_ds, n_shards: int = 16):
    """Deterministic global shuffle + shard assignment for training:
    (doc_id, shard, pos) where ``shard = shard_hash %% n_shards`` and
    ``pos`` is the document's rank inside its shard under the
    (hash, doc_id) order — i.e. every shard is an independent,
    reproducible random permutation slice of the corpus, the layout a
    data loader consumes (read shard k, stream in pos order).

    Engine shape: a stateless hash pass then ONE groupby("shard")
    ``map_groups`` that sorts each shard and enumerates positions — the
    only exchange is the shard partition itself.  Scale contract: pick
    ``n_shards`` so a shard fits a worker (the same contract as any
    partitioned sort); at 100 TB that means thousands of shards, which
    also matches how loaders want their inputs."""
    import numpy as np

    def add_hash(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            e = pa.array([], pa.int64())
            return pa.table({"doc_id": e, "h": e, "shard": e})
        ids = batch.column("doc_id").to_pylist()
        hs = [_shard_hash_u64(i) for i in ids]
        signed = [h - (1 << 64) if h >= (1 << 63) else h for h in hs]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "h": pa.array(signed, pa.int64()),
                "shard": pa.array([h % n_shards for h in hs], pa.int64()),
            }
        )

    def enumerate_shard(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "doc_id" not in group.column_names:
            e = pa.array([], pa.int64())
            return pa.table({"doc_id": e, "shard": e, "pos": e})
        # unsigned hash order == signed order shifted; sort on the
        # UNSIGNED value (mirrors the hugeint oracle) via two keys:
        # negative signed values are the large unsigned half
        t = group.append_column(
            "neg", pc.less(group.column("h"), pa.scalar(0, pa.int64()))
        )
        t = t.sort_by(
            [("neg", "ascending"), ("h", "ascending"), ("doc_id", "ascending")]
        )
        n = t.num_rows
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "shard": t.column("shard"),
                "pos": pa.array(np.arange(n, dtype=np.int64)),
            }
        )

    return (
        docs_ds.select_columns(["doc_id"])
        .map_batches(add_hash, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(enumerate_shard, batch_format="pyarrow")
    )


def shuffle_shard_oracle_sql(n_shards: int = 16) -> str:
    """DuckDB mirror of :func:`shuffle_shard` (hugeint hash, unsigned
    order)."""
    return f"""
        with h as (select doc_id,
                          md5_number_upper('shard:' || cast(doc_id as varchar))::hugeint
                              as hv
                   from documents)
        select doc_id, (hv % {n_shards})::bigint as shard,
               (row_number() over (partition by hv % {n_shards}
                                   order by hv, doc_id) - 1)::bigint as pos
        from h
    """
