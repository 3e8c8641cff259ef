"""Vocabulary building — the tokenizer-training primitive: corpus token
counts with contiguous frequency-ranked integer ids.

The interesting distributed piece is the GLOBAL ENUMERATION: after the
two-stage count and the all-to-all sort by (count desc, token), each row
needs its global rank as ``token_id``.  Ray Data has no row_number, so the
op assigns ids with block-offset arithmetic over the SORTED dataset's
blocks: a tiny remote per block reports its row count (the driver holds
one integer per block, never rows), the exclusive prefix sum gives each
block its id offset, and a per-block remote appends ``offset + arange``.
Sorted Ray datasets keep their blocks range-ordered, which is what makes
the offsets correct.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .text import TOKEN_RE


def vocab_build(docs_ds, min_count: int = 1):
    """(token, n, token_id) — corpus vocabulary with exact counts and
    frequency-ranked contiguous ids (ties broken by token asc, so the
    result is deterministic and SQL row_number-comparable)."""
    import numpy as np
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch.column("text").to_pylist():
            for w in TOKEN_RE.findall(t.lower()):
                counts[w] = counts.get(w, 0) + 1
        return pa.table(
            {
                "token": pa.array(list(counts), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    counts = (
        docs_ds.select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )
    if min_count > 1:
        import pyarrow.compute as pc

        counts = counts.map_batches(
            lambda b: b.filter(pc.greater_equal(b.column("n"), min_count))
            if b.num_rows and "n" in b.column_names
            else b,
            batch_format="pyarrow",
        )
    ordered = counts.sort(["n", "token"], descending=[True, False]).materialize()

    @ray.remote
    def nrows(block: pa.Table) -> int:
        return block.num_rows

    @ray.remote
    def with_ids(block: pa.Table, offset: int) -> pa.Table:
        return block.append_column(
            "token_id",
            pa.array(offset + np.arange(block.num_rows, dtype=np.int64), pa.int64()),
        )

    refs = ordered.to_arrow_refs()
    sizes = ray.get([nrows.remote(r) for r in refs])  # one int per block
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
    return ray.data.from_arrow_refs(
        [with_ids.remote(r, int(o)) for r, o in zip(refs, offsets)]
    )


def encode_documents(docs_ds, min_count: int = 1, vocab_size: int | None = None):
    """Tokenize the corpus against the built vocabulary: exploded
    ``(doc_id, pos, token_id)`` rows, OOV tokens as ``-1`` — the id stream
    a training loader consumes after :func:`vocab_build`.

    The id map broadcasts once via ``ray.put`` — BOUNDED state because the
    vocabulary is explicitly capped (``vocab_size``/``min_count``), which
    is how production tokenizers work anyway (fixed vocab, UNK for the
    tail).  Encoding itself is a stateless ``map_batches``; a 100-TB
    corpus streams through with no shuffle."""
    import numpy as np
    import ray

    vocab = vocab_build(docs_ds, min_count=min_count)
    if vocab_size is not None:
        vocab = vocab.sort("token_id").limit(vocab_size)
    ids: dict[str, int] = {}
    for b in vocab.select_columns(["token", "token_id"]).iter_batches(
        batch_format="pyarrow"
    ):
        ids.update(zip(b.column("token").to_pylist(), b.column("token_id").to_pylist()))
    ref = ray.put(ids)

    def encode(batch: pa.Table) -> pa.Table:
        id_of = ray.get(ref)
        doc_parts, pos_parts, tid_parts = [], [], []
        for doc_id, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = TOKEN_RE.findall(t.lower())
            if not toks:
                continue
            doc_parts.append(np.full(len(toks), doc_id, dtype=np.int64))
            pos_parts.append(np.arange(len(toks), dtype=np.int64))
            tid_parts.append(
                np.fromiter(
                    (id_of.get(w, -1) for w in toks), dtype=np.int64, count=len(toks)
                )
            )
        if not doc_parts:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "token_id": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(doc_parts), pa.int64()),
                "pos": pa.array(np.concatenate(pos_parts), pa.int64()),
                "token_id": pa.array(np.concatenate(tid_parts), pa.int64()),
            }
        )

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        encode, batch_format="pyarrow"
    )


def inverted_index(docs_ds, min_df: int = 2, max_postings: int = 32, parts: int | None = None):
    """(token, df, postings) — a capped inverted index over the corpus:
    per-term exact document frequency plus the first ``max_postings``
    doc_ids ascending (the bounded posting-list prefix a retrieval layer
    seeds from; ``df`` keeps the true count even where the list is cut).

    Shape: one document is ONE input row, so a per-batch distinct over
    (token, doc_id) is already globally distinct — the only shuffle is
    the groupby that assembles each term's postings.  That groupby uses
    the coarse-hash-partition trick (stages/linking.py
    ``_block_pairs_partition``): one vectorized UDF call per ~4xCPU
    partition, run-length group detection over the (token, doc_id) sort,
    postings sliced via repeat/arange index arithmetic — never one Python
    call per term (a web vocabulary is tens of millions of terms).
    ``min_df`` prunes the hapax tail INSIDE the partition call, before
    any list materializes."""
    import numpy as np

    from ..state.lineage import url_buckets

    if parts is None:
        import ray

        parts = 4 * max(1, int(ray.cluster_resources().get("CPU", 8)))

    def pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "token": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "part": pa.array([], pa.int32()),
            }
        )
        if batch.num_rows == 0 or "text" not in batch.column_names:
            return empty
        toks: list[str] = []
        docs: list[int] = []
        for doc_id, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            seen = set(TOKEN_RE.findall(t.lower()))
            toks.extend(seen)
            docs.extend([doc_id] * len(seen))
        tok_arr = pa.array(toks, pa.string())
        return pa.table(
            {
                "token": tok_arr,
                "doc_id": pa.array(docs, pa.int64()),
                "part": pa.array(url_buckets(tok_arr, parts), pa.int32()),
            }
        )

    def assemble(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "token": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "postings": pa.array([], pa.list_(pa.int64())),
            }
        )
        if group.num_rows == 0 or "token" not in group.column_names:
            return empty
        tbl = group.sort_by([("token", "ascending"), ("doc_id", "ascending")])
        codes = pc.dictionary_encode(tbl.column("token").combine_chunks())
        idx = np.asarray(codes.indices)
        starts = np.flatnonzero(np.r_[True, np.diff(idx) != 0])
        ends = np.r_[starts[1:], len(idx)]
        sizes = ends - starts
        keep = sizes >= min_df
        if not keep.any():
            return empty
        starts, sizes = starts[keep], sizes[keep]
        lens = np.minimum(sizes, max_postings)
        # gather indices: for run r, starts[r] + 0..lens[r]-1  (vectorized)
        off = np.concatenate([[0], np.cumsum(lens)[:-1]])
        flat = np.repeat(starts - off, lens) + np.arange(lens.sum())
        docs = tbl.column("doc_id").combine_chunks().take(pa.array(flat, pa.int64()))
        postings = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(lens)]), pa.int32()), docs
        )
        tokens = codes.dictionary.take(pa.array(idx[starts], pa.int64()))
        return pa.table(
            {
                "token": tokens,
                "df": pa.array(sizes.astype(np.int64)),
                "postings": postings,
            }
        )

    return (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(assemble, batch_format="pyarrow")
    )


def bigram_pmi(docs_ds, min_count: int = 5, top_n: int = 100):
    """Collocation mining: the ``top_n`` adjacent-token bigrams by
    pointwise mutual information — ``(x, y, n_xy, n_x, n_y, pmi_ppm)``,
    PMI = ln( p(xy) / (p(x) p(y)) ) with p from corpus counts, reported
    as ``floor(10^6 * pmi)``.

    One pass over the corpus emits BOTH unigram and bigram partial counts
    (kind-tagged rows folded by a single groupby — no second corpus
    scan); totals T (tokens) and B (bigrams) reduce from the count table,
    not the corpus.  Bigrams below ``min_count`` are pruned before the
    one side-tagged hash join that attaches both unigram counts (the
    triangle_counts degree-join pattern).  The PMI expression is
    evaluated with the exact operand order ``(n_xy * T * T) /
    (B * n_x * n_y)`` in doubles and libm ``math.log`` — bit-identical
    to DuckDB's ``ln`` on the same machine, so ``floor`` can never
    disagree with the SQL oracle.  The transcendental runs over the
    min_count-filtered BIGRAM TABLE (vocab-scale), never the corpus.

    Deterministic ordering: (pmi_ppm desc, x, y) before the top_n cut."""
    import math

    import numpy as np
    from ray.data.aggregate import Max, Sum

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "kind": pa.array([], pa.int32()),
                "a": pa.array([], pa.string()),
                "b": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or "text" not in batch.column_names:
            return empty
        uni: dict[str, int] = {}
        bi: dict[tuple[str, str], int] = {}
        for t in batch.column("text").to_pylist():
            toks = TOKEN_RE.findall(t.lower())
            for w in toks:
                uni[w] = uni.get(w, 0) + 1
            for x, y in zip(toks, toks[1:]):
                bi[(x, y)] = bi.get((x, y), 0) + 1
        return pa.table(
            {
                "kind": pa.array([0] * len(uni) + [1] * len(bi), pa.int32()),
                "a": pa.array([*uni.keys(), *(x for x, _ in bi)], pa.string()),
                "b": pa.array([""] * len(uni) + [y for _, y in bi], pa.string()),
                "n": pa.array([*uni.values(), *bi.values()], pa.int64()),
            }
        )

    counts = (
        docs_ds.select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["kind", "a", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )

    def tot(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "kind" not in batch.column_names:
            return pa.table(
                {"kind": pa.array([], pa.int32()), "n": pa.array([], pa.int64())}
            )
        return batch.select(["kind", "n"])

    totals = {
        r["kind"]: r["sum(n)"]
        for r in counts.map_batches(tot, batch_format="pyarrow")
        .groupby("kind")
        .sum("n")
        .take_all()
    }
    t_tok, t_bi = float(totals.get(0, 0)), float(totals.get(1, 0))

    def keep(kind: int, flt=None):
        def fn(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "kind" not in batch.column_names:
                return pa.table(
                    {
                        "a": pa.array([], pa.string()),
                        "b": pa.array([], pa.string()),
                        "n": pa.array([], pa.int64()),
                    }
                )
            out = batch.filter(pc.equal(batch.column("kind"), kind))
            if flt is not None:
                out = out.filter(pc.greater_equal(out.column("n"), flt))
            return out.select(["a", "b", "n"])

        return fn

    unigrams = counts.map_batches(keep(0), batch_format="pyarrow").materialize()
    bigrams = counts.map_batches(keep(1, min_count), batch_format="pyarrow").materialize()
    import ray.data

    empty = pa.table(
        {
            "x": pa.array([], pa.string()),
            "y": pa.array([], pa.string()),
            "n_xy": pa.array([], pa.int64()),
            "n_x": pa.array([], pa.int64()),
            "n_y": pa.array([], pa.int64()),
            "pmi_ppm": pa.array([], pa.int64()),
        }
    )
    if bigrams.count() == 0:
        return ray.data.from_arrow(empty)

    from ..ops.dedup import _join_partitions

    n_part = 1 if unigrams.count() < 10_000 else _join_partitions()

    def explode_sides(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "a" not in batch.column_names:
            return pa.table(
                {
                    "x": pa.array([], pa.string()),
                    "y": pa.array([], pa.string()),
                    "n_xy": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int32()),
                    "key": pa.array([], pa.string()),
                }
            )
        x = batch.column("a").combine_chunks()
        y = batch.column("b").combine_chunks()
        n = batch.column("n").cast(pa.int64()).combine_chunks()
        r = batch.num_rows
        return pa.table(
            {
                "x": pa.concat_arrays([x, x]),
                "y": pa.concat_arrays([y, y]),
                "n_xy": pa.concat_arrays([n, n]),
                "side": pa.array([0] * r + [1] * r, pa.int32()),
                "key": pa.concat_arrays([x, y]),
            }
        )

    def split_sides(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "side" not in batch.column_names:
            return pa.table(
                {
                    "x": pa.array([], pa.string()),
                    "y": pa.array([], pa.string()),
                    "n_xy": pa.array([], pa.int64()),
                    "n_x": pa.array([], pa.int64()),
                    "n_y": pa.array([], pa.int64()),
                }
            )
        is_x = pc.equal(batch.column("side"), pa.scalar(0, pa.int32()))
        zero = pa.scalar(0, pa.int64())
        cnt = batch.column("n_uni").cast(pa.int64())
        return pa.table(
            {
                "x": batch.column("x"),
                "y": batch.column("y"),
                "n_xy": batch.column("n_xy"),
                "n_x": pc.if_else(is_x, cnt, zero),
                "n_y": pc.if_else(is_x, zero, cnt),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "n_xy" not in batch.column_names:
            return empty
        n_xy = batch.column("n_xy").to_pylist()
        n_x = batch.column("n_x").to_pylist()
        n_y = batch.column("n_y").to_pylist()
        # math.log (libm) per row of the SMALL bigram table — not np.log,
        # whose SIMD path can differ from DuckDB's libm ln by 1 ulp and
        # flip the floor at a ppm boundary
        pmi = [
            math.floor(
                1_000_000.0
                * math.log((cxy * t_tok * t_tok) / (t_bi * cx * cy))
            )
            for cxy, cx, cy in zip(n_xy, n_x, n_y)
        ]
        return pa.table(
            {
                "x": batch.column("x"),
                "y": batch.column("y"),
                "n_xy": batch.column("n_xy").cast(pa.int64()),
                "n_x": batch.column("n_x").cast(pa.int64()),
                "n_y": batch.column("n_y").cast(pa.int64()),
                "pmi_ppm": pa.array(np.array(pmi, np.int64)),
            }
        )

    return (
        bigrams.map_batches(explode_sides, batch_format="pyarrow")
        .join(
            unigrams.select_columns(["a", "n"]).rename_columns(
                {"a": "key_u", "n": "n_uni"}
            ),
            join_type="inner",
            num_partitions=n_part,
            on=("key",),
            right_on=("key_u",),
        )
        .map_batches(split_sides, batch_format="pyarrow")
        .groupby(["x", "y"])
        .aggregate(
            Max("n_xy", alias_name="n_xy"),
            Max("n_x", alias_name="n_x"),
            Max("n_y", alias_name="n_y"),
        )
        .map_batches(finish, batch_format="pyarrow")
        .sort(["pmi_ppm", "x", "y"], descending=[True, False, False])
        .limit(top_n)
    )


def gram_novelty(docs_ds, n: int = 3, parts: int | None = None):
    """(doc_id, novel_grams, total_grams) — per-document n-gram novelty:
    of the document's distinct word n-grams, how many first appear in THIS
    document (min doc_id over the corpus)?  The standard "how much of this
    page is new text vs. crawl echo" curation signal — a high-duplication
    corpus shows novelty collapsing toward zero for late doc_ids.

    Shape: one document is one input row, so per-batch distinct
    (gram, doc_id) pairs are already globally distinct.  Grams then
    hash into ~4xCPU coarse partitions (the inverted_index trick: one
    vectorized UDF per partition, never per gram) where a (gram, doc_id)
    sort + run-length scan marks each gram's first row as novel — the
    min-doc row, since runs are doc-sorted.  A final groupby("doc_id")
    sums the flags.  Two shuffles total (gram partition, doc groupby),
    both over 3-column integer-heavy rows; nothing touches the driver.

    Documents with fewer than ``n`` tokens emit no grams and are absent
    from the output (same contract as the SQL mirror's join)."""
    import numpy as np
    from ray.data.aggregate import Count, Sum

    from ..state.lineage import url_buckets

    if parts is None:
        import ray

        parts = 4 * max(1, int(ray.cluster_resources().get("CPU", 8)))

    def pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "gram": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "part": pa.array([], pa.int32()),
            }
        )
        if batch.num_rows == 0 or "text" not in batch.column_names:
            return empty
        grams: list[str] = []
        docs: list[int] = []
        for doc_id, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ws = TOKEN_RE.findall(t.lower())
            seen = {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}
            grams.extend(seen)
            docs.extend([doc_id] * len(seen))
        gram_arr = pa.array(grams, pa.string())
        return pa.table(
            {
                "gram": gram_arr,
                "doc_id": pa.array(docs, pa.int64()),
                "part": pa.array(url_buckets(gram_arr, parts), pa.int32()),
            }
        )

    def mark_first(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "novel": pa.array([], pa.int64())}
        )
        if group.num_rows == 0 or "gram" not in group.column_names:
            return empty
        tbl = group.sort_by([("gram", "ascending"), ("doc_id", "ascending")])
        codes = pc.dictionary_encode(tbl.column("gram").combine_chunks())
        idx = np.asarray(codes.indices)
        first = np.r_[True, np.diff(idx) != 0]
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "novel": pa.array(first.astype(np.int64)),
            }
        )

    return (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(mark_first, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("novel", alias_name="novel_grams"),
            Count(alias_name="total_grams"),
        )
    )
