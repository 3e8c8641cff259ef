"""Benchmark decontamination — remove or flag training documents that
overlap an evaluation/benchmark set by shared word n-grams (the public
GPT-3/PaLM recipe: a training doc is contaminated if any of its 13-grams
appears in an eval document; small synthetic corpora use a smaller ``n``).

Shape at 100 TB: the EVAL side is small by definition (benchmark suites
are thousands of documents), so its distinct n-gram set is built with one
streamed pass and broadcast once via ``ray.put`` — the classic
small-side-broadcast join.  The TRAINING side streams through a stateless
``map_batches`` membership probe; no shuffle touches the big corpus.  The
driver holds O(eval n-grams), never anything corpus-sized.

Tokenization and the short-document convention (docs with fewer than
``n`` words contribute their whole token join as one gram) exactly match
the shingle family in :mod:`.dedup`, so one SQL oracle idiom covers both.
No reference analog (the reference extracts entities from trusted PDFs);
this is part of the training-data op family the engine adds.
"""

from __future__ import annotations

import pyarrow as pa

from .dedup import _word_shingles


def eval_ngram_set(eval_ds, n: int = 13) -> frozenset[str]:
    """Distinct word ``n``-grams of the eval corpus.

    Streams per-batch DISTINCT gram rows (the combiner keeps driver
    traffic at one row per distinct gram per block) and unions them on
    the driver — bounded by the eval corpus' vocabulary, which is small
    by definition of "benchmark".  For an eval set too large to hold,
    swap this for the join-based path (:func:`contamination_counts` with
    a shuffle join) — the probe stage is shared.
    """

    def grams_batch(batch: pa.Table) -> pa.Table:
        out: set[str] = set()
        for t in batch.column("text").to_pylist():
            out.update(_word_shingles(t, n))
        return pa.table({"gram": pa.array(sorted(out), pa.string())})

    acc: set[str] = set()
    for b in (
        eval_ds.select_columns(["text"])
        .map_batches(grams_batch, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        acc.update(b.column("gram").to_pylist())
    return frozenset(acc)


def contamination_counts(docs_ds, eval_ds, n: int = 13):
    """(doc_id, contaminated_ngrams, contaminated) per training document:
    how many of the doc's DISTINCT n-grams appear in the eval set, and
    whether any does.  Eval set broadcast once; the corpus never shuffles."""
    import ray

    ref = ray.put(eval_ngram_set(eval_ds, n))

    def probe(batch: pa.Table) -> pa.Table:
        grams = ray.get(ref)
        counts = []
        for t in batch.column("text").to_pylist():
            counts.append(sum(1 for g in _word_shingles(t, n) if g in grams))
        c = pa.array(counts, pa.int64())
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "contaminated_ngrams": c,
                "contaminated": pc.greater(c, 0),
            }
        )

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        probe, batch_format="pyarrow"
    )


def drop_contaminated(docs_ds, eval_ds, n: int = 13):
    """The filter form: training docs with ZERO eval n-gram overlap, full
    rows preserved.  Same broadcast probe, fused into one map_batches so
    the corpus is read once and never shuffled."""
    import ray

    ref = ray.put(eval_ngram_set(eval_ds, n))

    def keep(batch: pa.Table) -> pa.Table:
        grams = ray.get(ref)
        mask = [
            all(g not in grams for g in _word_shingles(t, n))
            for t in batch.column("text").to_pylist()
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    return docs_ds.map_batches(keep, batch_format="pyarrow")


# eval doc ids are shifted above every plausible train id so one LSH pass
# over the union can tell the sides apart in its output pairs
EVAL_ID_OFFSET = 1 << 40


def fuzzy_contaminated_ids(train_ds, eval_ds, threshold: float = 0.7):
    """Train doc_ids whose word-shingle Jaccard reaches ``threshold``
    against ANY eval document — the NEAR-duplicate complement of the
    exact n-gram overlap test (fuzzy decontamination, Lee et al. style).

    One MinHash-LSH pass over the side-tagged union finds candidate
    pairs (eval ids shifted by ``EVAL_ID_OFFSET`` so cross-side pairs are
    recognizable as ``doc_a < OFFSET <= doc_b``); the shared exact-Jaccard
    verify confirms each.  Within-side pairs fall out of the same pass
    and are simply dropped.  Returns a Dataset of (doc_id,) rows."""
    import pyarrow.compute as pc

    from .dedup import minhash_lsh_pairs

    def shift(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return batch
        ids = pc.add(batch.column("doc_id"), EVAL_ID_OFFSET)
        return batch.set_column(batch.column_names.index("doc_id"), "doc_id", ids)

    union = train_ds.select_columns(["doc_id", "text"]).union(
        eval_ds.select_columns(["doc_id", "text"]).map_batches(
            shift, batch_format="pyarrow"
        )
    )
    pairs = minhash_lsh_pairs(union, threshold)

    def cross_side(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_a" not in batch.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        keep = pc.and_(
            pc.less(batch.column("doc_a"), EVAL_ID_OFFSET),
            pc.greater_equal(batch.column("doc_b"), EVAL_ID_OFFSET),
        )
        return pa.table({"doc_id": batch.filter(keep).column("doc_a")})

    return (
        pairs.map_batches(cross_side, batch_format="pyarrow")
        .groupby("doc_id")
        .count()
        .select_columns(["doc_id"])
    )


def drop_fuzzy_contaminated(train_ds, eval_ds, threshold: float = 0.7):
    """Filter form: train rows with NO near-duplicate in the eval set —
    one left-anti hash join against the contaminated-id set (tiny by
    construction: it is at most the near-dup overlap)."""
    bad = fuzzy_contaminated_ids(train_ds, eval_ds, threshold).materialize()
    if bad.count() == 0:
        return train_ds
    from .dedup import _join_partitions

    n_part = 1 if bad.count() < 10_000 else _join_partitions()
    return train_ds.join(
        bad, join_type="left_anti", num_partitions=n_part, on=("doc_id",)
    )
