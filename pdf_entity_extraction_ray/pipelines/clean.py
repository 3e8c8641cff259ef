"""Training-data cleaning pipeline: quality gate -> exact dedup ->
near-dup removal -> clean corpus.

The composite the training-data op family exists for: every stage is one
of the tested operators chained over a streaming Dataset —

  1. quality gate (ops.text.quality_batch ``keep``)
  2. exact dedup (min doc_id per md5(text))
  3. near-dup removal: MinHash-LSH pairs at the Jaccard threshold; the
     HIGHER doc_id of each surviving pair is dropped (deterministic,
     keep-first semantics)

The whole pipeline is SQL-expressible, so the driver's DuckDB oracle can
check the exact surviving row set end-to-end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..ops.dedup import exact_dedup, minhash_lsh_pairs
from ..ops.text import quality_batch


def clean_documents(docs_ds, *, jaccard_threshold: float = 0.7):
    """documents -> surviving clean rows (same columns as input)."""
    import ray

    # 1. quality gate — vectorized predicate inside map_batches
    def keep_quality(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        return batch.filter(q.column("keep"))

    gated = docs_ds.map_batches(keep_quality, batch_format="pyarrow")

    # 2. exact dedup (min doc_id per content hash)
    deduped = exact_dedup(gated).materialize()  # consumed twice below

    # 3. near-dup removal: drop the higher id of each qualifying pair
    pairs = minhash_lsh_pairs(deduped, jaccard_threshold)
    losers: set[int] = set()
    for b in pairs.iter_batches(batch_format="pyarrow"):
        losers.update(b.column("doc_b").to_pylist())
    losers_ref = ray.put(np.array(sorted(losers), dtype=np.int64))

    def drop_losers(batch: pa.Table) -> pa.Table:
        bad = ray.get(losers_ref)
        ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
        return batch.filter(pa.array(~np.isin(ids, bad)))

    return deduped.map_batches(drop_losers, batch_format="pyarrow")


def curate_documents(
    docs_ds,
    eval_ds,
    *,
    jaccard_threshold: float = 0.7,
    decontam_n: int = 3,
):
    """The full training-data curation chain, one streaming pipeline:

      1-3. :func:`clean_documents` (quality gate -> exact dedup ->
           MinHash near-dup removal)
      4.   benchmark decontamination (drop docs sharing any word
           ``decontam_n``-gram with ``eval_ds`` — ops.decontam)
      5.   PII redaction (ops.text.redact_pii_batch); output ``text`` is
           the redacted form

    Returns (doc_id, text, lang, source) survivors.  Every stage is an
    already-tested operator; the composition stays SQL-expressible so the
    driver oracle checks the exact end-to-end row set and redacted bytes.
    """
    from ..ops.decontam import drop_contaminated
    from ..ops.text import redact_pii_batch

    cleaned = clean_documents(docs_ds, jaccard_threshold=jaccard_threshold)
    decon = drop_contaminated(cleaned, eval_ds, n=decontam_n)

    def redact(batch: pa.Table) -> pa.Table:
        r = redact_pii_batch(batch)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": r.column("redacted"),
                "lang": batch.column("lang"),
                "source": batch.column("source"),
            }
        )

    return decon.map_batches(redact, batch_format="pyarrow")
