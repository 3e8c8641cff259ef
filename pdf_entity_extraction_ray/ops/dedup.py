"""Deduplication operators over ``documents`` — the scale-critical family
for training-data pipelines:

* :func:`exact_dedup`        — hash-partition + per-group first (shuffle
  moves md5 keys + small id rows, never full text twice)
* :func:`minhash_lsh_pairs`  — shingle -> MinHash -> band-bucket groupby ->
  candidate pairs -> EXACT Jaccard verify (LSH prunes the O(n^2), the
  verify step keeps the answer exact, so a SQL oracle can check it)
* :func:`ngram_jaccard_pairs` — the same exact-Jaccard pair set through
  LOSSLESS prefix-filter blocking (AllPairs/PPJoin) instead of LSH —
  deterministic 100% recall, no probabilistic miss
* :func:`simhash_pairs`      — 64-bit SimHash, 4x16-bit band blocking,
  Hamming<=k verify
* :func:`embedding_cosine_pairs` — near-dup by cosine over an embedding
  column (distributed block-nested-loop over object-store block refs)

Partitioning assumptions are stated per function; each is a hash-shuffle
join, a band-key shuffle, or a block-ref exchange — never a driver-side
materialization of the corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.similarity import (
    MinHasher,
    _stable_hash64,
    hamming64,
    jaccard,
    simhash64_batch,
)
from .text import TOKEN_RE

MINHASH_PERMS = 64
MINHASH_BANDS = 32  # r=2 rows/band: catch-probability ~1-(1-J^2)^32 (>0.999 at J=0.5)
SHINGLE_K = 3


def _word_shingles(text: str, k: int = SHINGLE_K) -> set[str]:
    words = TOKEN_RE.findall(text.lower())
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


# --------------------------------------------------------------------------
# exact dedup


def _md5_hex(texts: list) -> list:
    """One md5 hexdigest per text — the single definition of the exact-
    dedup key (shared by the combiner, the delta key scans, and callers
    that persist the key column)."""
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def exact_dedup(docs_ds, num_partitions: int | None = None, *, keep_key: bool = False):
    """Keep the lowest-doc_id row per distinct text.

    Two-stage: per-batch combiner reduces each batch to one candidate row
    per md5 key, then a ``groupby(key)`` picks the global minimum — the
    shuffle moves candidates, not the corpus.  ``keep_key=True`` retains
    the ``dedup_key`` column on the winners (rolling pipelines persist it
    so the next delta never re-hashes history).
    """

    def partial(batch: pa.Table) -> pa.Table:
        best: dict[str, tuple[int, int]] = {}  # key -> (doc_id, row_idx)
        doc_ids = batch.column("doc_id").to_pylist()
        for i, key in enumerate(_md5_hex(batch.column("text").to_pylist())):
            if key not in best or doc_ids[i] < best[key][0]:
                best[key] = (doc_ids[i], i)
        idx = [v[1] for v in best.values()]
        out = batch.take(pa.array(idx, pa.int64()))
        return out.append_column("dedup_key", pa.array(list(best.keys()), pa.string()))

    return _keep_min_doc_per_key(
        docs_ds.map_batches(partial, batch_format="pyarrow"), num_partitions,
        keep_key=keep_key,
    )


def _join_partitions() -> int:
    """Hash-join partition count for LOCAL sessions: capped at 8.

    Each ``Dataset.join`` spins up ``num_partitions`` aggregator actors
    with fixed startup cost; measured at sf0.1/32cpu, 4-16 partitions all
    land at ~5-7 s while 64 partitions (2/CPU) oversubscribes the node —
    two chained joins spawned 128+ aggregators and wedged.  On a real
    cluster pass ``num_partitions ~ input_bytes / 500 MB`` explicitly via
    the ops' ``num_partitions`` argument instead."""
    import ray

    return min(8, max(4, int(ray.cluster_resources().get("CPU", 4)) // 2))


def _keep_min_doc_per_key(keyed_ds, num_partitions: int | None = None,
                          keep_key: bool = False):
    """Rows with a ``dedup_key`` column -> keep the min-doc_id row per key.

    Fully distributed: a vectorized Min aggregate finds the winning
    (key, doc_id) per distinct key, then a hash-shuffle ``Dataset.join``
    filters the candidate rows — keys and ids travel the shuffle; nothing
    is collected to the driver or broadcast (the driver-side winner-id set
    of the previous design was O(distinct docs) driver memory)."""
    from ray.data.aggregate import Min

    partials = keyed_ds.materialize()
    if num_partitions is None and partials.count() < 10_000:
        # tiny inputs: Ray's hash join mishandles EMPTY shuffle partitions
        # (chained joins crash on them); one partition keeps every
        # partition non-empty and is optimal at this size anyway
        num_partitions = 1
    winners = partials.groupby("dedup_key").aggregate(Min("doc_id", alias_name="doc_id"))
    # (dedup_key, doc_id) is unique across partial rows (one candidate per
    # key per batch; doc ids are globally unique), so the inner join keeps
    # exactly one row per distinct key.
    kept = partials.join(
        winners,
        join_type="inner",
        num_partitions=num_partitions or _join_partitions(),
        on=("dedup_key", "doc_id"),
    )
    return kept if keep_key else kept.drop_columns(["dedup_key"])


def wordset_dedup(docs_ds, num_partitions: int | None = None):
    """Bag-of-words dedup: keep the min-doc_id row per distinct word SET
    (n-gram dedup with n=1 over sets; key from ops.text.wordset_key_batch)."""
    from .text import wordset_key_batch

    return _keep_min_doc_per_key(
        docs_ds.map_batches(wordset_key_batch, batch_format="pyarrow"), num_partitions
    )


# --------------------------------------------------------------------------
# MinHash + LSH near-dup pairs


def auto_minhash_bands(
    docs_ds,
    sample: int = 256,
    candidate_budget_per_doc: float = 10.0,
    n_docs: int | None = None,
) -> int:
    """Derive the LSH band count from a cheap corpus probe instead of a
    fixed default: sample the first ``sample`` documents, measure the
    BACKGROUND pairwise Jaccard distribution, and pick the widest band
    shape (highest recall) whose expected candidate volume stays linear
    in the corpus (``<= candidate_budget_per_doc * n_docs`` pairs).

    With r = num_perm / bands rows per band, a J-similar pair collides
    with probability fb(J) = 1-(1-J^r)^bands; the expected candidate
    count is C(n,2) * E[fb(J_background)] — evaluated directly on the
    sampled pair Jaccards (no convexity error from plugging in a mean).
    On diverse corpora this returns the exact-recall default (bands=32,
    r=2: miss ~4e-10 at J=0.7 — what the SQL oracles rely on); on
    low-diversity corpora (heavy J~0.3-0.5 background) it drops to
    bands=16 (r=4: miss ~1.2% at J=0.7), keeping candidates from scaling
    with the corpus PAIR count.  Opt in via ``bands="auto"`` on
    :func:`minhash_lsh_pairs` / :func:`near_dedup_keep`; oracle-checked
    runs keep the exact default."""
    rows = docs_ds.select_columns(["text"]).limit(sample).take_all()
    # zero-shingle docs never band (see band_rows_batch) — keep them out
    # of the background-Jaccard probe too, or blank pages would inject
    # fake J=1.0 mass and wrongly force the lower-recall band shape
    shingle_sets = [s for s in (_word_shingles(r["text"]) for r in rows) if s]
    if n_docs is None:
        n_docs = docs_ds.count()
    if len(shingle_sets) < 2 or n_docs < 2:
        return MINHASH_BANDS
    js = [
        jaccard(shingle_sets[i], shingle_sets[j])
        for i in range(len(shingle_sets))
        for j in range(i + 1, len(shingle_sets))
    ]
    budget = candidate_budget_per_doc * n_docs
    n_pairs = n_docs * (n_docs - 1) / 2.0
    for bands in (32, 16):
        r = MINHASH_PERMS // bands
        fb = sum(1.0 - (1.0 - j**r) ** bands for j in js) / len(js)
        if n_pairs * fb <= budget:
            return bands
    return 16


class _ShingleSigner:
    """Per-process MinHasher (built once, reused across batches)."""

    _hasher: MinHasher | None = None

    @classmethod
    def hasher(cls) -> MinHasher:
        if cls._hasher is None:
            cls._hasher = MinHasher(num_perm=MINHASH_PERMS, seed=42)
        return cls._hasher


# coarse shard count for band-bucket pairing: one ``map_groups`` call per
# BAND would pay per-group Python overhead across ~32 bands/doc; sharding
# by crc32(band) batches ~n_bands/256 buckets per call (same co-location:
# every row of a band lands in its band's shard)
BAND_SHARDS = 256


def band_rows_batch(batch: pa.Table, bands: int = MINHASH_BANDS) -> pa.Table:
    """documents batch -> exploded (shard, band_key, doc_id) rows."""
    import zlib

    h = _ShingleSigner.hasher()
    out_shard: list[int] = []
    out_band: list[str] = []
    out_doc: list[int] = []
    for doc_id, text in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
        sh = _word_shingles(text)
        if not sh:
            # zero-shingle docs must NOT band: the all-sentinel signature
            # is identical for every such doc, so banding them would pair
            # all blank/punct-only pages (J(empty,empty)=1.0 passes
            # verify) — diverging from the ngram path and the SQL oracle,
            # where 0/0 Jaccard is undefined and filtered
            continue
        sig = h.signature(sh)
        for bk in h.band_keys(sig, bands):
            out_shard.append(zlib.crc32(bk.encode()) % BAND_SHARDS)
            out_band.append(bk)
            out_doc.append(doc_id)
    return pa.table(
        {
            "shard": pa.array(out_shard, pa.int32()),
            "band": pa.array(out_band, pa.string()),
            "doc_id": pa.array(out_doc, pa.int64()),
        }
    )


def _shard_candidates(group: pa.Table) -> pa.Table:
    """One SHARD of band rows -> candidate pairs from every band in it.
    Pairs may repeat across bands/shards — the downstream pair groupby is
    the dedup, so no extra shuffle is spent on it here."""
    if group.num_rows == 0 or "band" not in group.column_names:
        return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
    by_band: dict[str, set[int]] = {}
    for band, doc in zip(group.column("band").to_pylist(), group.column("doc_id").to_pylist()):
        by_band.setdefault(band, set()).add(doc)
    a, b = [], []
    seen: set[tuple[int, int]] = set()  # shard-local dedup shrinks the join input
    for ids_set in by_band.values():
        ids = sorted(ids_set)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                p = (ids[i], ids[j])
                if p not in seen:
                    seen.add(p)
                    a.append(p[0])
                    b.append(p[1])
    return pa.table({"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())})


def minhash_lsh_pairs(
    docs_ds,
    threshold: float = 0.7,
    num_partitions: int | None = None,
    bands: int | str = MINHASH_BANDS,
):
    """Near-duplicate (doc_a, doc_b) pairs with word-3-gram Jaccard >=
    ``threshold``; doc_a < doc_b.

    Shuffle #1: band-key groupby (candidates only).  Shuffle #2: pair
    dedup.  The EXACT-Jaccard verify fetches both texts through ONE
    hash-shuffle ``Dataset.join`` against the (doc_id, text) projection
    (pairs exploded into side-tagged rows keyed by doc id, reassembled
    with a vectorized Max groupby) — texts travel the shuffle keyed by
    the candidate ids; the corpus is never collected to the driver or
    broadcast (the previous design ``ray.put`` an id->text dict of the
    whole corpus).

    ``bands`` trades candidate volume against recall: with r = num_perm /
    bands rows per band, a J-similar pair bands together with probability
    1-(1-J^r)^bands.  The default (r=2, b=32) misses a J=0.7 pair with
    probability ~4e-10 — effectively exact, which the SQL oracle relies
    on — but over-generates candidates when the corpus has a heavy low-J
    background (measured: a 200k-doc corpus drawn from a 36-word
    vocabulary produced 5.2M candidates for 60k true pairs).  At web
    scale pass bands=16 (r=4, miss ~1.2% at J=0.7) or ``bands="auto"``
    (:func:`auto_minhash_bands` probes the background Jaccard and picks
    the widest shape with linear expected candidates) — candidates then
    scale with the near-dup population, not the corpus pair count."""
    if bands == "auto":
        bands = auto_minhash_bands(docs_ds)
    # candidates are NOT pair-deduped here: cross-shard duplicates survive
    # the join and collapse in the reassembly groupby below, saving a whole
    # shuffle; near-dup pairs repeat in at most MINHASH_BANDS shards
    candidates = (
        docs_ds.map_batches(
            band_rows_batch, fn_kwargs={"bands": bands}, batch_format="pyarrow"
        )
        .groupby("shard")
        .map_groups(_shard_candidates, batch_format="pyarrow")
    )
    return exact_jaccard_verify(candidates, docs_ds, threshold, num_partitions)


def exact_jaccard_verify(candidates, docs_ds, threshold: float, num_partitions: int | None = None,
                         sim_fn=None):
    """(doc_a, doc_b) candidate pairs -> the subset with exact word-shingle
    similarity >= ``threshold`` (shared verify stage of the blocking-based
    near-dup ops: :func:`minhash_lsh_pairs`, :func:`ngram_jaccard_pairs`,
    :func:`ngram_containment_pairs`).  ``sim_fn(set_a, set_b) -> float``
    picks the set similarity; default Jaccard.

    Both texts are fetched through ONE hash-shuffle ``Dataset.join``
    against the (doc_id, text) projection: pairs explode into side-tagged
    rows keyed by doc id, then reassemble with a vectorized Max groupby —
    texts travel the shuffle keyed by the candidate ids; the corpus is
    never collected to the driver or broadcast.  Duplicate candidate pairs
    are allowed in (the reassembly groupby dedups them for free)."""
    texts = docs_ds.select_columns(["doc_id", "text"])
    candidates = candidates.materialize()
    if candidates.count() == 0:
        # an all-empty candidate side has no schema and crashes the hash
        # join — the verified answer is trivially empty
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
            )
        )
    n_part = num_partitions or _join_partitions()

    # each pair explodes to two side-tagged rows so ONE hash join fetches
    # both texts (a second join would pay another aggregator fleet); the
    # pair is then reassembled with a vectorized Max groupby — the empty
    # string never wins because zero-shingle (empty-text) docs can't band
    def explode_sides(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_a" not in batch.column_names:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int32()),
                    "key": pa.array([], pa.int64()),
                }
            )
        a = batch.column("doc_a")
        b = batch.column("doc_b")
        n = batch.num_rows
        return pa.table(
            {
                "doc_a": pa.concat_arrays([a.combine_chunks(), a.combine_chunks()]),
                "doc_b": pa.concat_arrays([b.combine_chunks(), b.combine_chunks()]),
                "side": pa.array([0] * n + [1] * n, pa.int32()),
                "key": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
            }
        )

    def split_sides(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "side" not in batch.column_names:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "text_a": pa.array([], pa.string()),
                    "text_b": pa.array([], pa.string()),
                }
            )
        is_a = pc.equal(batch.column("side"), pa.scalar(0, pa.int32()))
        empty = pa.scalar("", pa.string())
        return pa.table(
            {
                "doc_a": batch.column("doc_a"),
                "doc_b": batch.column("doc_b"),
                "text_a": pc.if_else(is_a, batch.column("text"), empty),
                "text_b": pc.if_else(is_a, empty, batch.column("text")),
            }
        )

    from ray.data.aggregate import Max

    paired = (
        candidates.map_batches(explode_sides, batch_format="pyarrow")
        .join(texts, join_type="inner", num_partitions=n_part,
              on=("key",), right_on=("doc_id",))
        .map_batches(split_sides, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Max("text_a", alias_name="text_a"), Max("text_b", alias_name="text_b"))
    )

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "text_a" not in batch.column_names:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
            )
        keep = []
        # memoize per batch: a doc in k candidate pairs shingles once, not
        # k times (candidate volume >> doc count on dup-heavy corpora)
        cache: dict[str, set] = {}
        fn = sim_fn or jaccard

        def sh(t: str) -> set:
            s = cache.get(t)
            if s is None:
                s = _word_shingles(t)
                cache[t] = s
            return s

        for i, (ta, tb) in enumerate(
            zip(batch.column("text_a").to_pylist(), batch.column("text_b").to_pylist())
        ):
            if fn(sh(ta), sh(tb)) >= threshold:
                keep.append(i)
        return batch.take(pa.array(keep, pa.int64())).select(["doc_a", "doc_b"])

    return paired.map_batches(verify, batch_format="pyarrow")


# --------------------------------------------------------------------------
# exact n-gram Jaccard pairs via prefix-filter blocking (AllPairs/PPJoin)


def prefix_rows_batch(batch: pa.Table, threshold: float = 0.7) -> pa.Table:
    """documents batch -> exploded (shard, token, doc_id, size) PREFIX rows.

    Each document's word-shingle set (same 3-grams as the MinHash path, so
    both ops share one exact-Jaccard contract) is sorted under a global
    total order — the blake2b hash of the shingle, which needs no corpus
    statistics — and only the first ``n - ceil(t*n) + 1`` shingles are
    emitted.  Prefix-filter theorem (Bayardo et al., WWW'07 "Scaling Up
    All Pairs Similarity Search"; Xiao et al.'s PPJoin): together with the
    size filter applied at pairing time (``t * |larger| <= |smaller|``,
    itself implied by J >= t), any pair with Jaccard >= t MUST share a
    prefix token — so the blocking is LOSSLESS, unlike MinHash banding's
    probabilistic recall.  Hash order emits more candidates than the
    classic rarest-first (document-frequency) order, but needs no DF
    aggregation pass and no vocabulary-sized driver state; candidates are
    still pruned from O(n^2) to near the true-pair volume on diverse
    corpora."""
    import math

    out_shard: list[int] = []
    out_tok: list[int] = []
    out_doc: list[int] = []
    out_size: list[int] = []
    out_pos: list[int] = []
    for doc_id, text in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
        sh = _word_shingles(text)
        n = len(sh)
        if n == 0:
            continue  # zero-shingle docs pair with nothing (J undefined)
        # epsilon guards float noise (0.7*10 == 7.000000000000001 would
        # ceil to 8 and shorten the prefix below the lossless bound); it
        # can only LENGTHEN the prefix -> more candidates, never a miss
        p = n - math.ceil(threshold * n - 1e-9) + 1
        hashes = sorted(_stable_hash64(s.encode("utf-8")) for s in sh)[:p]
        for pos, hv in enumerate(hashes):
            out_shard.append(hv % BAND_SHARDS)
            out_tok.append(hv)
            out_doc.append(doc_id)
            out_size.append(n)
            out_pos.append(pos)
    return pa.table(
        {
            "shard": pa.array(out_shard, pa.int32()),
            "token": pa.array(out_tok, pa.uint64()),
            "doc_id": pa.array(out_doc, pa.int64()),
            "size": pa.array(out_size, pa.int64()),
            "pos": pa.array(out_pos, pa.int32()),
        }
    )


def shingle_rows_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> exploded (token, doc_id, size) rows, one per
    shingle (ALL shingles — the DF-ordered prefix path trims later, once
    document frequencies are known).  Tokens are the blake2b hash viewed
    as SIGNED int64 (two's complement): Ray's hash shuffle handles int64
    keys natively, while uint64 values above 2^63 fall back to pickled
    Python objects and break the join."""
    out_tok: list[int] = []
    out_doc: list[int] = []
    out_size: list[int] = []
    for doc_id, text in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
        sh = _word_shingles(text)
        n = len(sh)
        for s in sh:
            hv = _stable_hash64(s.encode("utf-8"))
            out_tok.append(hv - (1 << 64) if hv >= (1 << 63) else hv)
            out_doc.append(doc_id)
            out_size.append(n)
    return pa.table(
        {
            "token": pa.array(out_tok, pa.int64()),
            "doc_id": pa.array(out_doc, pa.int64()),
            "size": pa.array(out_size, pa.int64()),
        }
    )


# count-min sketch of shingle document frequencies: the "cms" prefix order
# ranks tokens rarest-first WITHOUT the vocabulary-sized DF table — the
# sketch is a fixed CMS_DEPTH x CMS_WIDTH counter array (2 MiB of int64)
# regardless of corpus size, so the driver/broadcast state stays bounded at
# web scale where the shingle vocabulary does not fit anywhere.
CMS_DEPTH = 4
CMS_WIDTH = 1 << 16


def _cms_slots(hvs: np.ndarray, d: int) -> np.ndarray:
    """Row-``d`` slot index for each 64-bit shingle hash: bits
    [16d, 16d+16) of the blake2b hash (uniform, so the four rows act as
    four independent-enough hash functions without re-hashing)."""
    return (
        ((hvs >> np.uint64(16 * d)) & np.uint64(CMS_WIDTH - 1)).astype(np.int64)
        + d * CMS_WIDTH
    )


def _cms_estimate(hvs: np.ndarray, sketch: np.ndarray) -> np.ndarray:
    """Count-min upper-bound estimate of each shingle's document frequency
    (min over the four rows; never underestimates the true DF)."""
    est = sketch[_cms_slots(hvs, 0)]
    for d in range(1, CMS_DEPTH):
        est = np.minimum(est, sketch[_cms_slots(hvs, d)])
    return est


def cms_partial_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> nonzero (slot, count) rows of the batch-local DF
    sketch.  Output is bounded by min(distinct shingles in batch,
    CMS_DEPTH*CMS_WIDTH) rows no matter how large the vocabulary — the
    combiner half of the two-stage sketch aggregation."""
    counts = np.zeros(CMS_DEPTH * CMS_WIDTH, dtype=np.int64)
    for text in batch.column("text").to_pylist():
        sh = _word_shingles(text)
        if not sh:
            continue
        hvs = np.fromiter(
            (_stable_hash64(s.encode("utf-8")) for s in sh), dtype=np.uint64, count=len(sh)
        )
        for d in range(CMS_DEPTH):
            np.add.at(counts, _cms_slots(hvs, d), 1)
    nz = np.flatnonzero(counts)
    return pa.table(
        {"slot": pa.array(nz, pa.int64()), "count": pa.array(counts[nz], pa.int64())}
    )


def build_df_sketch(docs_ds) -> np.ndarray:
    """Distributed count-min DF sketch: per-batch partial sketches (rows,
    not arrays, so empty slots cost nothing) -> one small ``groupby(slot)
    .sum`` -> a <=CMS_DEPTH*CMS_WIDTH-row result folded into the dense
    array on the driver.  Driver data is O(sketch), never O(vocabulary)."""
    rows = docs_ds.map_batches(cms_partial_batch, batch_format="pyarrow")
    agg = rows.groupby("slot").sum("count")
    sketch = np.zeros(CMS_DEPTH * CMS_WIDTH, dtype=np.int64)
    for b in agg.iter_batches(batch_format="pyarrow"):
        sketch[np.asarray(b.column("slot"))] = np.asarray(b.column("sum(count)"))
    return sketch


def cms_prefix_rows_batch(batch: pa.Table, threshold: float, sketch: np.ndarray) -> pa.Table:
    """documents batch -> (shard, token, doc_id, size) prefix rows under
    the sketch-estimated rarest-first total order (est DF asc, then token
    hash as the tie-break — any total order is lossless, see
    :func:`prefix_rows_batch`).  Same epsilon-guarded prefix bound.
    Prefix tokens with CMS df-estimate <= 1 are dropped: the estimate
    only overestimates, so true df <= 1 means the token is shared by no
    other document and can never witness a pair (any J >= t pair's
    witnessing shared prefix token has df >= 2 and survives on both
    sides); positions keep their full-order index so the PPJoin
    positional filter's bound stays sound."""
    import math

    tok_parts, doc_parts, size_parts, pos_parts = [], [], [], []
    for doc_id, text in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
        sh = _word_shingles(text)
        n = len(sh)
        if n == 0:
            continue
        p = n - math.ceil(threshold * n - 1e-9) + 1
        hvs = np.fromiter(
            (_stable_hash64(s.encode("utf-8")) for s in sh), dtype=np.uint64, count=n
        )
        est = _cms_estimate(hvs, sketch)
        head = np.lexsort((hvs, est))[:p]
        keepm = est[head] > 1
        sel = hvs[head[keepm]]
        tok_parts.append(sel)
        doc_parts.append(np.full(len(sel), doc_id, dtype=np.int64))
        size_parts.append(np.full(len(sel), n, dtype=np.int64))
        pos_parts.append(np.flatnonzero(keepm).astype(np.int32))
    if not tok_parts:
        return pa.table(
            {
                "shard": pa.array([], pa.int32()),
                "token": pa.array([], pa.uint64()),
                "doc_id": pa.array([], pa.int64()),
                "size": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int32()),
            }
        )
    toks = np.concatenate(tok_parts)
    return pa.table(
        {
            "shard": pa.array((toks % np.uint64(BAND_SHARDS)).astype(np.int32), pa.int32()),
            "token": pa.array(toks, pa.uint64()),
            "doc_id": pa.array(np.concatenate(doc_parts), pa.int64()),
            "size": pa.array(np.concatenate(size_parts), pa.int64()),
            "pos": pa.array(np.concatenate(pos_parts), pa.int32()),
        }
    )


def ngram_jaccard_pairs(
    docs_ds,
    threshold: float = 0.7,
    num_partitions: int | None = None,
    order: str = "cms",
):
    """EXACT near-duplicate (doc_a, doc_b) pairs with word-3-gram Jaccard
    >= ``threshold``; doc_a < doc_b.  Same answer as
    :func:`minhash_lsh_pairs` but with deterministic 100% recall: prefix
    filtering (see :func:`prefix_rows_batch`) replaces probabilistic LSH
    banding as the candidate generator, and the same one-join
    :func:`exact_jaccard_verify` confirms every pair.

    ``order`` picks the global total order the prefixes are drawn from —
    ANY total order is lossless, but it controls candidate volume:

    * ``"cms"`` (default): rarest-first by a count-min-sketch ESTIMATE of
      document frequency.  One bounded ``groupby(slot).sum`` builds a
      fixed-size (2 MiB) sketch that broadcasts via ``ray.put``; prefixes
      are then a stateless ``map_batches`` — no vocabulary-sized DF table,
      no join back to the rows, three fewer shuffles than ``"df"``.  CMS
      only OVERestimates df, and overestimates touch a vanishing fraction
      of tokens (4x16-bit rows vs real vocabularies), so the order tracks
      true rarest-first; a collision merely reorders a prefix choice,
      which cannot lose pairs (total order stays total via the hash
      tie-break).  At sf0.1 this runs ~2.5x faster than ``"df"`` while
      keeping its hot-shingle robustness (the property ``"hash"`` lacks).
    * ``"df"`` (the classic AllPairs choice): rarest-first by EXACT
      document frequency.  Prefix tokens are the globally rarest shingles,
      so posting lists stay tiny and candidate volume tracks the true-pair
      volume even on low-diversity corpora.  Costs a DF groupby plus a
      shuffle join to get each shingle's frequency back to its doc — all
      distributed, no vocabulary ever collected to the driver (the DF
      table STAYS a dataset, unlike the TF-IDF ops' pruned broadcast).
    * ``"hash"``: blake2b order, no DF pass (two fewer shuffles).  Fine on
      diverse corpora — at sf0.1 (5k docs) it is slightly faster (24 s vs
      27 s: the DF groupby+join costs more than it saves).  On corpora
      with hot shingles a hot PREFIX token's posting list pairs
      quadratically: on the 24k-doc low-diversity validation corpus
      (36-token zipf vocabulary, scripts/validate_dedup_scale.py) the df
      order finishes in 157 s; the hash order did not finish in 560 s.

    The size filter inside the pairing stage prunes incompatible-length
    pairs before they reach the verify join.  Two distinct shingles
    hashing to one 64-bit token only ADD candidates (superset -> still
    lossless)."""

    def shard_prefix_candidates(group: pa.Table) -> pa.Table:
        import math

        if group.num_rows == 0 or "token" not in group.column_names:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
            )
        by_tok: dict[int, set[tuple[int, int, int]]] = {}
        for tok, doc, size, pos in zip(
            group.column("token").to_pylist(),
            group.column("doc_id").to_pylist(),
            group.column("size").to_pylist(),
            group.column("pos").to_pylist(),
        ):
            by_tok.setdefault(tok, set()).add((doc, size, pos))
        a, b = [], []
        seen: set[tuple[int, int]] = set()  # shard-local dedup shrinks the join input
        for members in by_tok.values():
            rows = sorted(members)
            for i in range(len(rows)):
                di, ni, pi = rows[i]
                for j in range(i + 1, len(rows)):
                    dj, nj, pj = rows[j]
                    lo, hi = (ni, nj) if ni <= nj else (nj, ni)
                    # J <= |smaller|/|larger|; epsilon errs toward KEEPING
                    # borderline pairs (exact verify discards them)
                    if lo / hi < threshold - 1e-12:
                        continue
                    # PPJoin positional filter (Xiao et al.): J >= t needs
                    # overlap alpha = ceil(t/(1+t) * (ni+nj)); sharing THIS
                    # token at 0-based prefix positions (pi, pj) bounds the
                    # achievable overlap by min(ni - pi, nj - pj) — prune
                    # the occurrence when the bound can't reach alpha.  A
                    # pair pruned here can still emit via an earlier shared
                    # prefix token (seen only records EMITTED pairs), so
                    # blocking stays lossless.
                    alpha = math.ceil(threshold / (1.0 + threshold) * (ni + nj) - 1e-9)
                    if min(ni - pi, nj - pj) < alpha:
                        continue
                    p = (di, dj)
                    if p not in seen:
                        seen.add(p)
                        a.append(p[0])
                        b.append(p[1])
        return pa.table({"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())})

    if order == "cms":
        import ray

        sketch_ref = ray.put(build_df_sketch(docs_ds))

        def cms_prefix(batch: pa.Table) -> pa.Table:
            import ray as _ray

            return cms_prefix_rows_batch(batch, threshold, _ray.get(sketch_ref))

        prefix_rows = docs_ds.map_batches(cms_prefix, batch_format="pyarrow")
    elif order == "hash":
        prefix_rows = docs_ds.map_batches(
            prefix_rows_batch, fn_kwargs={"threshold": threshold}, batch_format="pyarrow"
        )
    elif order == "df":
        rows = docs_ds.map_batches(shingle_rows_batch, batch_format="pyarrow")
        rows = rows.materialize()  # consumed twice: DF aggregation + join probe
        df = rows.groupby("token").count()
        n_part = num_partitions or _join_partitions()
        if num_partitions is None and rows.count() < 10_000:
            # tiny inputs: empty shuffle partitions crash chained hash joins
            # (the df join chains into the verify join), so collapse to 1
            n_part = num_partitions = 1

        def add_dshard(batch: pa.Table) -> pa.Table:
            d = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
            return batch.append_column(
                "dshard", pa.array((d % BAND_SHARDS).astype(np.int32), pa.int32())
            )

        def build_prefix(group: pa.Table) -> pa.Table:
            """One doc-shard of joined (token, doc_id, size, count()) rows
            -> each doc's rarest-first prefix rows, vectorized: sort by
            (doc_id, df, token), then a run-length position mask keeps the
            first ``n - ceil(t*n) + 1`` rows of every doc (same
            epsilon-guarded lossless bound as :func:`prefix_rows_batch`)."""
            if group.num_rows == 0 or "token" not in group.column_names:
                return pa.table(
                    {
                        "shard": pa.array([], pa.int32()),
                        "token": pa.array([], pa.int64()),
                        "doc_id": pa.array([], pa.int64()),
                        "size": pa.array([], pa.int64()),
                        "pos": pa.array([], pa.int32()),
                    }
                )
            idx = pc.sort_indices(
                group,
                sort_keys=[
                    ("doc_id", "ascending"),
                    ("count()", "ascending"),
                    ("token", "ascending"),
                ],
            )
            g = group.take(idx)
            doc = np.asarray(g.column("doc_id").to_pylist(), dtype=np.int64)
            size = np.asarray(g.column("size").to_pylist(), dtype=np.int64)
            starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
            runlen = np.diff(np.r_[starts, len(doc)])
            pos_in_run = np.arange(len(doc)) - np.repeat(starts, runlen)
            p = size - np.ceil(threshold * size - 1e-9).astype(np.int64) + 1
            keep = pos_in_run < p
            pref = g.filter(pa.array(keep))
            toks = np.asarray(pref.column("token").to_pylist(), dtype=np.int64)
            # numpy % with a positive divisor is non-negative for signed ints
            return pa.table(
                {
                    "shard": pa.array((toks % BAND_SHARDS).astype(np.int32), pa.int32()),
                    "token": pa.array(toks, pa.int64()),
                    "doc_id": pref.column("doc_id"),
                    "size": pref.column("size"),
                    "pos": pa.array(pos_in_run[keep].astype(np.int32), pa.int32()),
                }
            )

        prefix_rows = (
            rows.join(df, join_type="inner", num_partitions=n_part, on=("token",))
            .map_batches(add_dshard, batch_format="pyarrow")
            .groupby("dshard")
            .map_groups(build_prefix, batch_format="pyarrow")
        )
    else:
        raise ValueError(f"unknown prefix order: {order!r}")
    candidates = prefix_rows.groupby("shard").map_groups(
        shard_prefix_candidates, batch_format="pyarrow"
    )
    return exact_jaccard_verify(candidates, docs_ds, threshold, num_partitions)


# --------------------------------------------------------------------------
# SimHash near-dup pairs


def simhash_rows_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> (shard, chunk, doc_id, simhash) rows, one per
    16-bit chunk; ``shard`` coarsens the chunk key so the pairing step
    batches many chunk buckets per ``map_groups`` call (same trick as
    :data:`BAND_SHARDS` — per-chunk grouping paid per-group Python
    overhead across ~4*2^16 possible keys)."""
    token_lists = [TOKEN_RE.findall(t.lower()) for t in batch.column("text").to_pylist()]
    sims = simhash64_batch(token_lists)
    doc_ids = batch.column("doc_id").to_pylist()
    out_shard, out_chunk, out_doc, out_sim = [], [], [], []
    for doc_id, s in zip(doc_ids, sims.tolist()):
        for c in range(4):
            key = (c << 16) | ((s >> (16 * c)) & 0xFFFF)
            out_shard.append(key % BAND_SHARDS)
            out_chunk.append(key)
            out_doc.append(doc_id)
            out_sim.append(s)
    return pa.table(
        {
            "shard": pa.array(out_shard, pa.int32()),
            "chunk": pa.array(out_chunk, pa.int64()),
            "doc_id": pa.array(out_doc, pa.int64()),
            "simhash": pa.array(out_sim, pa.uint64()),
        }
    )


def simhash_pairs(docs_ds, max_hamming: int = 3):
    """(doc_a, doc_b, hamming) pairs with Hamming distance <= ``max_hamming``.
    ``max_hamming`` must be <= 3: the 4x16-bit chunk blocking guarantees
    recall only up to 3 differing bits (4 differing bits can land one per
    chunk and share nothing) — a larger radius would silently lose pairs,
    so it raises instead.
    By pigeonhole, any pair within 3 bits shares at least one of the four
    16-bit chunks, so chunk-blocking loses nothing."""
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the 4-chunk pigeonhole "
            "guarantee (recall is exact only for <= 3 differing bits)"
        )

    def shard_chunk_candidates(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "chunk" not in group.column_names:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        by_chunk: dict[int, set[tuple[int, int]]] = {}
        for chunk, doc, sim in zip(
            group.column("chunk").to_pylist(),
            group.column("doc_id").to_pylist(),
            group.column("simhash").to_pylist(),
        ):
            by_chunk.setdefault(chunk, set()).add((doc, sim))
        a, b, h = [], [], []
        for members in by_chunk.values():
            rows = sorted(members)
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    d = hamming64(rows[i][1], rows[j][1])
                    if d <= max_hamming:
                        a.append(rows[i][0])
                        b.append(rows[j][0])
                        h.append(d)
        return pa.table(
            {
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
                "hamming": pa.array(h, pa.int64()),
            }
        )

    from ray.data.aggregate import Min

    return (
        docs_ds.map_batches(simhash_rows_batch, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_chunk_candidates, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Min("hamming", alias_name="hamming"))  # vectorized distinct
    )


# --------------------------------------------------------------------------
# embedding-cosine near-dup


def _vec_matrix(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_id array, row-normalized float64 matrix) from an Arrow batch."""
    ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    M = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    if M.size:
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    return ids, M


def embedding_cosine_pairs(emb_ds, threshold: float = 0.99):
    """(vec_a, vec_b) with cosine >= threshold; vec_a < vec_b.  Exact.

    Distributed block-nested-loop self-join: the (vec_id, embedding)
    projection is materialized ONCE into object-store blocks; each map task
    compares its own batch against every block by fetching block refs
    (zero-copy on co-located workers) and doing one vectorized matmul per
    (batch, block) pair.  The driver never holds the matrix and nothing is
    re-broadcast per batch — memory per task is one batch + one block.
    Compute is inherently O(n^2/p); the sub-quadratic scale paths are
    :func:`simhash_pairs`-style banding and :mod:`.ann`'s IVF buckets.
    """
    import ray

    norm = emb_ds.select_columns(["vec_id", "embedding"]).materialize()
    block_refs = list(norm.to_arrow_refs())  # small: one ref per block

    def pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "vec_id" not in batch.column_names:
            return pa.table(
                {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64())}
            )
        bids, B = _vec_matrix(batch)
        rows_a: list[int] = []
        rows_b: list[int] = []
        for ref in block_refs:
            tbl = ray.get(ref)
            if tbl.num_rows == 0 or "vec_id" not in tbl.column_names:
                continue
            oids, M = _vec_matrix(tbl)
            S = B @ M.T
            # vectorized pair filter; vec_a < vec_b halves the work and
            # dedups the symmetric block pairing
            mask = (S >= threshold) & (bids[:, None] < oids[None, :])
            r, c = np.nonzero(mask)
            rows_a.extend(int(x) for x in bids[r])
            rows_b.extend(int(x) for x in oids[c])
        # ids only: a float similarity column would hash differently across
        # engines (numpy vs SQL arithmetic differ in the last ulps)
        return pa.table(
            {
                "vec_a": pa.array(rows_a, pa.int64()),
                "vec_b": pa.array(rows_b, pa.int64()),
            }
        )

    return norm.map_batches(pairs, batch_format="pyarrow")


# --------------------------------------------------------------------------
# near-dup removal (the production policy: transitive clusters, keep one)


def near_dedup_keep(
    docs_ds,
    threshold: float = 0.7,
    num_partitions: int | None = None,
    bands: int | str = MINHASH_BANDS,
    method: str = "minhash",
):
    """Remove near-duplicate documents TRANSITIVELY, keeping the lowest
    doc_id of every near-dup cluster: near-dup pairs -> distributed
    connected components (BSP min-label; ids are the node keys, so each
    cluster's label IS its keeper) -> left-anti join of the losers.

    ``method`` picks the candidate generator: ``"minhash"`` (LSH banding,
    probabilistic recall, cheapest at scale) or ``"ngram"``
    (:func:`ngram_jaccard_pairs` prefix filtering, deterministic 100%
    recall).  Both verify with exact Jaccard, so at equal recall the kept
    set is identical (tested).

    This is a genuinely different policy from the pair-side filter in
    pipelines/clean.py: with pairs (a,c) and (b,c) only (a !~ b), the
    pair-side filter keeps both a and b while the transitive policy keeps
    only a — the behavior large-scale training-data dedup pipelines standardize on.
    Everything shuffles; nothing corpus-sized touches the driver.
    """
    from ..stages.linking import components_from_int_edges

    if method == "ngram":
        pairs = ngram_jaccard_pairs(docs_ds, threshold, num_partitions)
    elif method == "minhash":
        pairs = minhash_lsh_pairs(docs_ds, threshold, num_partitions, bands=bands)
    else:
        raise ValueError(f"unknown near-dup method: {method!r}")
    comp = components_from_int_edges(pairs, "doc_a", "doc_b", num_partitions=num_partitions)

    def losers(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "node" not in batch.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        keep = pc.not_equal(batch.column("node"), batch.column("label"))
        return pa.table({"doc_id": batch.filter(keep).column("node")})

    losers_ds = comp.map_batches(losers, batch_format="pyarrow").materialize()
    n_part = num_partitions or _join_partitions()
    if num_partitions is None and losers_ds.count() < 10_000:
        # same guard as _keep_min_doc_per_key: Ray's hash join mishandles
        # EMPTY shuffle partitions (tiny loser sets spread over 8 partitions
        # crash); losers is ids-only so the materialize+count is free
        n_part = 1
    return docs_ds.join(
        losers_ds,
        join_type="left_anti",
        num_partitions=n_part,
        on=("doc_id",),
    )


# --------------------------------------------------------------------------
# embedding near-dup, sub-quadratic: random-hyperplane LSH + exact verify


import functools


@functools.lru_cache(maxsize=8)
def _cached_planes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    """Seeded gaussian hyperplanes (legacy RandomState — stream-stable
    across numpy versions, so signatures are deterministic everywhere)."""
    return np.random.RandomState(seed).standard_normal((n_planes, dim))


def embedding_cosine_pairs_lsh(
    emb_ds,
    threshold: float = 0.5,
    n_planes: int = 96,
    band_bits: int = 3,
    seed: int = 42,
):
    """(vec_a, vec_b) with cosine >= threshold via random-hyperplane LSH:
    sign-bit signatures -> banded blocking -> EXACT cosine verify within
    each band bucket — the sub-quadratic alternative to
    :func:`embedding_cosine_pairs`'s O(n^2) block-nested loop.

    Precision is exact (every emitted pair passed the real cosine test);
    recall is 1-(1-p^r)^b with p = 1 - theta/pi — at these defaults
    (r=3, b=32) a cosine-0.5 pair is missed with probability ~1e-5, and
    the seeded planes make any given dataset's result DETERMINISTIC.
    Vectors travel with their band rows (b-fold exchange volume — the
    self-contained layout; the lower-traffic variant joins vectors back
    per candidate like :func:`minhash_lsh_pairs` does for texts).
    """
    bands = n_planes // band_bits

    def band_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "vec_id" not in batch.column_names:
            return pa.table(
                {
                    "shard": pa.array([], pa.int32()),
                    "band": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float64())),
                }
            )
        ids, M = _vec_matrix(batch)
        planes = _cached_planes(n_planes, M.shape[1], seed)
        bits = (M @ planes.T) > 0  # (n, n_planes)
        out_shard, out_band, out_id, out_vec = [], [], [], []
        vec_lists = M.tolist()
        for r in range(len(ids)):
            row = bits[r]
            for b in range(bands):
                packed = 0
                for k in range(band_bits):
                    packed = (packed << 1) | int(row[b * band_bits + k])
                key = (b << band_bits) | packed
                out_shard.append(key % BAND_SHARDS)
                out_band.append(key)
                out_id.append(int(ids[r]))
                out_vec.append(vec_lists[r])
        return pa.table(
            {
                "shard": pa.array(out_shard, pa.int32()),
                "band": pa.array(out_band, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "embedding": pa.array(out_vec, pa.list_(pa.float64())),
            }
        )

    def shard_pairs(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "band" not in group.column_names:
            return pa.table(
                {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64())}
            )
        by_band: dict[int, dict[int, list[float]]] = {}
        for band, vid, vec in zip(
            group.column("band").to_pylist(),
            group.column("vec_id").to_pylist(),
            group.column("embedding").to_pylist(),
        ):
            by_band.setdefault(band, {})[vid] = vec
        out_a, out_b = [], []
        seen: set[tuple[int, int]] = set()
        for members in by_band.values():
            if len(members) < 2:
                continue
            ids = np.array(sorted(members), dtype=np.int64)
            M = np.array([members[int(i)] for i in ids])  # already normalized
            S = M @ M.T
            r, c = np.nonzero(np.triu(S >= threshold, k=1))
            for i, j in zip(r, c):
                p = (int(ids[i]), int(ids[j]))
                if p not in seen:
                    seen.add(p)
                    out_a.append(p[0])
                    out_b.append(p[1])
        return pa.table(
            {"vec_a": pa.array(out_a, pa.int64()), "vec_b": pa.array(out_b, pa.int64())}
        )

    return (
        emb_ds.select_columns(["vec_id", "embedding"])
        .map_batches(band_rows, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_pairs, batch_format="pyarrow")
        .groupby(["vec_a", "vec_b"])
        .count()  # cross-shard pair dedup, vectorized
        .select_columns(["vec_a", "vec_b"])
    )


# --------------------------------------------------------------------------
# corpus-level duplicated-ngram index + near-dup component labels


def duplicate_ngrams(docs_ds, min_docs: int = 2):
    """Corpus-wide duplicated word-shingle index: every ``SHINGLE_K``-gram
    that appears in >= ``min_docs`` DISTINCT documents, with its document
    frequency — the building block of exact substring-level dedup (the
    public "dedup training data at the n-gram level" recipe: find grams
    shared across documents, then cut or down-weight them).

    Scale shape: a document's shingles are a SET per doc (so each
    (gram, doc) pair exists exactly once corpus-wide), counted per batch
    into a (ngram, n_docs) partial — the shuffle moves one row per
    distinct gram per block, never the raw pairs — then a groupby-sum and
    a vectorized threshold filter.  Output is O(duplicated vocabulary).
    """

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        if batch.num_rows and "text" in batch.column_names:
            for text in batch.column("text").to_pylist():
                for s in _word_shingles(text):
                    counts[s] = counts.get(s, 0) + 1
        return pa.table(
            {
                "ngram": pa.array(list(counts.keys()), pa.string()),
                "n_docs": pa.array(list(counts.values()), pa.int64()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "sum(n_docs)" not in batch.column_names:
            return pa.table(
                {"ngram": pa.array([], pa.string()), "n_docs": pa.array([], pa.int64())}
            )
        t = pa.table(
            {"ngram": batch.column("ngram"), "n_docs": batch.column("sum(n_docs)")}
        )
        return t.filter(pc.greater_equal(t.column("n_docs"), pa.scalar(min_docs)))

    return (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("ngram")
        .sum("n_docs")
        .map_batches(finalize, batch_format="pyarrow")
    )


def near_dup_components(
    docs_ds,
    threshold: float = 0.7,
    num_partitions: int | None = None,
    method: str = "minhash",
):
    """Near-duplicate CLUSTER LABELS: (doc_id, component) for every
    document that belongs to a near-dup cluster, where ``component`` is
    the cluster's minimum member id — the inspectable complement of
    :func:`near_dedup_keep` (that op drops the losers; this one reports
    who clustered with whom, which is what corpus-audit pipelines ship).

    Pairs come from the same exact-Jaccard-verified generators
    (``method`` as in :func:`near_dedup_keep`); labels from the BSP
    min-label propagation — fully shuffled, no driver-side union-find.
    """
    from ..stages.linking import components_from_int_edges

    if method == "ngram":
        pairs = ngram_jaccard_pairs(docs_ds, threshold, num_partitions)
    elif method == "minhash":
        pairs = minhash_lsh_pairs(docs_ds, threshold, num_partitions)
    else:
        raise ValueError(f"unknown near-dup method: {method!r}")
    comp = components_from_int_edges(pairs, "doc_a", "doc_b", num_partitions=num_partitions)

    def rename(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "node" not in batch.column_names:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "component": pa.array([], pa.int64())}
            )
        return pa.table(
            {"doc_id": batch.column("node"), "component": batch.column("label")}
        )

    return comp.map_batches(rename, batch_format="pyarrow")


def exact_dedup_delta(new_ds, existing_ds, num_partitions: int | None = None):
    """Incremental exact dedup: the rows of a NEW crawl batch that survive
    dedup against BOTH themselves and an EXISTING already-deduped corpus —
    the shape a rolling ingestion pipeline runs nightly, touching the new
    batch and only the md5-key column of the old corpus (never re-deduping
    history).

    1. within-batch winners: min doc_id per md5(text) (the same combiner +
       Min groupby as :func:`exact_dedup`);
    2. one hash-shuffle LEFT ANTI ``Dataset.join`` drops winners whose key
       already exists in the corpus.  Existing-side reads prune to the key
       (computed per batch from ``text`` here; a production corpus stores
       the key column so the read ships ~16 bytes/row)."""
    # winners keep their dedup_key, so the anti-join never re-hashes them
    new_winners = exact_dedup(new_ds, num_partitions, keep_key=True)

    def keys_of(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "text" not in batch.column_names:
            return pa.table({"k": pa.array([], pa.string())})
        return pa.table(
            {"k": pa.array(_md5_hex(batch.column("text").to_pylist()), pa.string())}
        )

    def key_col(batch: pa.Table) -> pa.Table:
        if "dedup_key" in batch.column_names:
            return batch.rename_columns(
                [c if c != "dedup_key" else "k" for c in batch.column_names]
            )
        return batch.append_column("k", pa.array([], pa.string()))

    existing_keys = existing_ds.select_columns(["text"]).map_batches(
        keys_of, batch_format="pyarrow"
    )
    n_part = num_partitions or _join_partitions()
    if num_partitions is None and existing_ds.count() < 10_000:
        n_part = 1  # tiny-input guard: empty shuffle partitions crash the join
    survivors = (
        new_winners.map_batches(key_col, batch_format="pyarrow")
        .join(existing_keys, join_type="left_anti", num_partitions=n_part, on=("k",))
    )

    def drop_k(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["k"]) if "k" in batch.column_names else batch

    return survivors.map_batches(drop_k, batch_format="pyarrow")


def mod3_split(docs_ds):
    """The bloom-delta bench/registry corpus split, defined ONCE:
    doc_id % 3 == 0 plays the NEW batch, the rest the existing corpus
    (mirrors the oracle's ``doc_id % 3`` SQL)."""

    def part(batch: pa.Table, want_new: bool) -> pa.Table:
        ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
        m = (ids % 3) == 0
        return batch.filter(pa.array(m if want_new else ~m))

    new = docs_ds.map_batches(lambda b: part(b, True), batch_format="pyarrow")
    existing = docs_ds.map_batches(lambda b: part(b, False), batch_format="pyarrow")
    return new, existing


def bloom_delta_dedup(
    new_ds,
    existing_ds,
    *,
    bits_log2: int = 20,
    k_hashes: int = 4,
    num_partitions: int | None = None,
):
    """Rows of a NEW batch whose text does not appear in an EXISTING
    corpus — :func:`exact_dedup_delta`'s anti-join semantics (without the
    within-batch winner step: the delta batch is taken as-is), but with a
    **Bloom-filter prefilter** so only bloom HITS enter the shuffle join.

    The crawl-frontier / nightly-ingest pattern at 100 TB: the existing
    corpus is huge but compresses to a fixed ``2^bits_log2``-bit bitmap
    (128 KiB at the default) built by one streaming pass (one bitmap row
    per block, OR-merged on the driver — O(blocks x bitmap) transfer,
    O(bitmap) driver state regardless of corpus size) and broadcast once
    via ``ray.put``.  Bloom misses are DEFINITELY new (no false
    negatives) and stream straight to the output with zero shuffle;
    only the hit fraction (true dups + the ~``(1-e^-kn/m)^k`` false-
    positive sliver) pays the exact left-anti ``Dataset.join``.  Size
    ``bits_log2`` to ~10 bits/key for ~1% FP; an undersized filter stays
    CORRECT (more rows take the exact join), it just prunes less.

    Emits ``(doc_id, text_md5)`` for every surviving new row.
    """
    import ray

    nbytes = 1 << (bits_log2 - 3)
    mask = np.uint64((1 << bits_log2) - 1)

    def _hash_pair(texts: list) -> tuple[np.ndarray, np.ndarray]:
        keys = _md5_hex(texts)
        h = np.array(
            [(int(k[:16], 16), int(k[16:], 16)) for k in keys], dtype=np.uint64
        ).reshape(len(keys), 2)
        return h[:, 0], h[:, 1]

    def bitmap(batch: pa.Table) -> pa.Table:
        bm = np.zeros(nbytes, dtype=np.uint8)
        if batch.num_rows:
            h1, h2 = _hash_pair(batch.column("text").to_pylist())
            for i in range(k_hashes):
                idx = (h1 + np.uint64(i) * h2) & mask
                np.bitwise_or.at(
                    bm,
                    (idx >> np.uint64(3)).astype(np.int64),
                    (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)),
                )
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    agg = np.zeros(nbytes, dtype=np.uint8)
    for b in (
        existing_ds.select_columns(["text"])
        # batch_size=None: ONE bitmap row per block (the default 1024-row
        # batching would ship rows/1024 bitmaps — 128 bytes/doc overhead)
        .map_batches(bitmap, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow")
    ):
        for buf in b.column("bm").to_pylist():
            agg |= np.frombuffer(buf, dtype=np.uint8)
    bloom_ref = ray.put(agg)

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "text_md5": pa.array([], pa.string()),
                    "hit": pa.array([], pa.bool_()),
                }
            )
        bloom = ray.get(bloom_ref)
        texts = batch.column("text").to_pylist()
        keys = _md5_hex(texts)
        h1, h2 = _hash_pair(texts)
        hit = np.ones(batch.num_rows, dtype=bool)
        for i in range(k_hashes):
            idx = (h1 + np.uint64(i) * h2) & mask
            bits = bloom[(idx >> np.uint64(3)).astype(np.int64)]
            hit &= (bits >> (idx & np.uint64(7)).astype(np.uint8)) & 1 > 0
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "text_md5": pa.array(keys, pa.string()),
                "hit": pa.array(hit, pa.bool_()),
            }
        )

    # consumed twice (miss fast-path + hit join); the delta batch is the
    # small side by definition, so pinning it is bounded by the delta size
    tagged = new_ds.select_columns(["doc_id", "text"]).map_batches(
        tag, batch_format="pyarrow"
    ).materialize()
    misses = tagged.filter(expr="hit == False").select_columns(
        ["doc_id", "text_md5"]
    )
    hits = tagged.filter(expr="hit == True").select_columns(["doc_id", "text_md5"])

    def keys_of(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "text" not in batch.column_names:
            return pa.table({"text_md5": pa.array([], pa.string())})
        return pa.table(
            {
                "text_md5": pa.array(
                    _md5_hex(batch.column("text").to_pylist()), pa.string()
                )
            }
        )

    n_hits = hits.count()
    if n_hits == 0:
        return misses
    n_part = num_partitions or _join_partitions()
    if num_partitions is None and n_hits < 10_000:
        n_part = 1  # tiny-input guard: empty shuffle partitions crash the join
    survivors = hits.join(
        existing_ds.select_columns(["text"]).map_batches(
            keys_of, batch_format="pyarrow"
        ),
        join_type="left_anti",
        num_partitions=n_part,
        on=("text_md5",),
    )
    return misses.union(survivors.select_columns(["doc_id", "text_md5"]))


def gram_pos_rows_batch(batch: pa.Table, k: int = SHINGLE_K) -> pa.Table:
    """documents batch -> POSITIONAL k-gram rows (doc_id, pos, token):
    one row per gram OCCURRENCE (not the distinct-set shingle view) —
    the input both to duplicated-span detection and to any
    positional-gram analysis.  Docs shorter than ``k`` tokens emit
    nothing (no k-gram exists).  Token = signed-int64 blake2b of the
    gram (shuffle-friendly; collisions only ever ADD a dup marking)."""
    out_doc, out_pos, out_tok = [], [], []
    for doc_id, text in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
        words = TOKEN_RE.findall(text.lower())
        for i in range(len(words) - k + 1):
            hv = _stable_hash64(" ".join(words[i : i + k]).encode("utf-8"))
            out_doc.append(doc_id)
            out_pos.append(i)
            out_tok.append(hv - (1 << 64) if hv >= (1 << 63) else hv)
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "pos": pa.array(out_pos, pa.int64()),
            "token": pa.array(out_tok, pa.int64()),
        }
    )


def duplicated_spans(
    docs_ds, k: int = SHINGLE_K, min_run: int = 2, num_partitions: int | None = None
):
    """Exact-substring duplication spans (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", at k-gram granularity):
    per document, the maximal token ranges covered by consecutive k-grams
    that appear in >= 2 DISTINCT documents — the spans a substring-dedup
    pass would cut.  Emits (doc_id, start_tok, end_tok) for runs of at
    least ``min_run`` consecutive duplicated grams.

    Stages: positional gram rows (stateless map) -> cross-doc gram
    frequencies via per-batch DISTINCT (token, doc) pairs as a COMBINER
    plus a global (token, doc) groupby (Ray's dynamic block splitting can
    split a very large doc's gram rows mid-block, so batch-local distinct
    alone would double-count a within-doc repeat as df >= 2) -> one count
    groupby -> one hash join marks duplicated occurrences -> coarse
    doc-shard groupby merges consecutive positions vectorized (sort +
    diff islands).  Text never travels; only (doc, pos, token) triples
    shuffle.

    EQUIVALENCE TO THE SUFFIX-ARRAY TOOL (why no distributed SA pass):
    Lee et al.'s ExactSubstr cuts every character covered by some
    duplicated substring of length >= threshold.  At fixed threshold k
    the cut set is IDENTICAL to this k-gram formulation: (=>) every
    length-k window of a duplicated substring of length >= k is itself a
    duplicated k-gram, so the whole substring is covered by duplicated
    k-gram spans; (<=) a duplicated k-gram IS a duplicated substring of
    length k.  The suffix array buys maximal-match REPORTING at arbitrary
    lengths, not a different cut set — and execution-wise the SA path
    (prefix-doubling: O(log n) all-to-all exchanges of (pos, rank) rows)
    moves strictly more data than this form's single (doc, pos, token)
    shuffle + one count groupby + one join, all linear in corpus tokens.
    At 100 TB the k-gram form IS the scale path."""
    rows = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        gram_pos_rows_batch, fn_kwargs={"k": k}, batch_format="pyarrow"
    )
    rows = rows.materialize()  # consumed twice: df counting + the join probe

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "token" not in batch.column_names:
            return pa.table(
                {"token": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
            )
        t = pa.table({"token": batch.column("token"), "doc_id": batch.column("doc_id")})
        g = t.group_by(["token", "doc_id"]).aggregate([([], "count_all")])
        return g.select(["token", "doc_id"])

    def token_only(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "token" not in batch.column_names:
            return pa.table({"token": pa.array([], pa.int64())})
        return pa.table({"token": batch.column("token")})

    df = (
        rows.map_batches(distinct_pairs, batch_format="pyarrow")  # combiner
        .groupby(["token", "doc_id"])
        .count()  # GLOBAL distinct: correct even when a doc splits blocks
        .map_batches(token_only, batch_format="pyarrow")
        .groupby("token")
        .count()
    )

    def dup_only(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "count()" not in batch.column_names:
            return pa.table({"token": pa.array([], pa.int64())})
        return pa.table(
            {"token": batch.filter(pc.greater_equal(batch.column("count()"), 2)).column("token")}
        )

    dup = df.map_batches(dup_only, batch_format="pyarrow").materialize()
    if dup.count() == 0:
        # no cross-doc duplicated gram anywhere: an all-empty join side has
        # no schema and crashes the hash join — short-circuit instead
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "start_tok": pa.array([], pa.int64()),
                    "end_tok": pa.array([], pa.int64()),
                }
            )
        )
    n_part = num_partitions or _join_partitions()
    if num_partitions is None and rows.count() < 10_000:
        n_part = 1  # tiny-input guard (empty shuffle partitions crash joins)
    marked = rows.join(dup, join_type="inner", num_partitions=n_part, on=("token",))

    def add_dshard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return pa.table(
                {
                    "dshard": pa.array([], pa.int32()),
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                }
            )
        d = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
        return pa.table(
            {
                "dshard": pa.array((d % BAND_SHARDS).astype(np.int32), pa.int32()),
                "doc_id": batch.column("doc_id"),
                "pos": batch.column("pos"),
            }
        )

    def islands(group: pa.Table) -> pa.Table:
        """One doc-shard of duplicated (doc_id, pos) rows -> merged runs,
        fully vectorized: lexsort, then islands where consecutive
        positions differ by 1 within a doc."""
        cols = {
            "doc_id": pa.array([], pa.int64()),
            "start_tok": pa.array([], pa.int64()),
            "end_tok": pa.array([], pa.int64()),
        }
        if group.num_rows == 0 or "pos" not in group.column_names:
            return pa.table(cols)
        doc = np.asarray(group.column("doc_id").to_pylist(), dtype=np.int64)
        pos = np.asarray(group.column("pos").to_pylist(), dtype=np.int64)
        order = np.lexsort((pos, doc))
        doc, pos = doc[order], pos[order]
        new_run = np.r_[True, (doc[1:] != doc[:-1]) | (pos[1:] != pos[:-1] + 1)]
        starts = np.flatnonzero(new_run)
        lengths = np.diff(np.r_[starts, len(doc)])
        keep = lengths >= min_run
        s = starts[keep]
        return pa.table(
            {
                "doc_id": pa.array(doc[s], pa.int64()),
                "start_tok": pa.array(pos[s], pa.int64()),
                "end_tok": pa.array(pos[s + 0] + lengths[keep] - 1 + (k - 1), pa.int64()),
            }
        )

    return (
        marked.map_batches(add_dshard, batch_format="pyarrow")
        .groupby("dshard")
        .map_groups(
            lambda g: islands(g.drop_columns(["dshard"]) if "dshard" in g.column_names else g),
            batch_format="pyarrow",
        )
    )


def remove_duplicated_spans(
    docs_ds, k: int = SHINGLE_K, min_run: int = 2, num_partitions: int | None = None
):
    """The cut form of :func:`duplicated_spans`: per document, the token
    stream with cross-document duplicated runs REMOVED — Lee et al.'s
    substring dedup applied, at k-gram granularity.  Emits
    ``(doc_id, clean_tokens, n_removed)`` where ``clean_tokens`` is the
    space-joined surviving lowercase tokens (token-level surgery: the
    canonical text's punctuation cannot be reconstructed after a cut, so
    the contract is the token stream a tokenizer consumes anyway).

    Spans pack into per-doc lists via a coarse-shard groupby, then ONE
    left-outer hash join attaches them to the documents (docs without
    spans pass through); the cut itself is a stateless map.  Documents
    with zero tokens emit nothing (no stream to clean)."""
    import ray.data

    spans = duplicated_spans(docs_ds, k=k, min_run=min_run, num_partitions=num_partitions)
    spans = spans.materialize()

    def cut(batch: pa.Table, with_spans: bool) -> pa.Table:
        out_doc, out_clean, out_removed = [], [], []
        # spans ride the join as a "s:e,s:e" STRING (Arrow's hash join
        # rejects list-typed payload columns)
        span_col = batch.column("span_str").to_pylist() if with_spans else None
        for i, (doc_id, text) in enumerate(
            zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist())
        ):
            toks = TOKEN_RE.findall(text.lower())
            if not toks:
                continue
            drop = np.zeros(len(toks), dtype=bool)
            if with_spans and span_col[i]:
                for part in span_col[i].split(","):
                    s, e = part.split(":")
                    drop[int(s) : int(e) + 1] = True
            kept = [t for t, d in zip(toks, drop) if not d]
            out_doc.append(doc_id)
            out_clean.append(" ".join(kept))
            out_removed.append(int(drop.sum()))
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "clean_tokens": pa.array(out_clean, pa.string()),
                "n_removed": pa.array(out_removed, pa.int64()),
            }
        )

    docs = docs_ds.select_columns(["doc_id", "text"])
    if spans.count() == 0:
        return docs.map_batches(
            cut, fn_kwargs={"with_spans": False}, batch_format="pyarrow"
        )

    def add_dshard(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
        return batch.append_column(
            "dshard", pa.array((d % BAND_SHARDS).astype(np.int32), pa.int32())
        )

    def pack(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "doc_id" not in group.column_names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "span_str": pa.array([], pa.string()),
                }
            )
        by_doc: dict[int, list[str]] = {}
        for d, s, e in zip(
            group.column("doc_id").to_pylist(),
            group.column("start_tok").to_pylist(),
            group.column("end_tok").to_pylist(),
        ):
            by_doc.setdefault(d, []).append(f"{s}:{e}")
        return pa.table(
            {
                "doc_id": pa.array(list(by_doc), pa.int64()),
                "span_str": pa.array([",".join(v) for v in by_doc.values()], pa.string()),
            }
        )

    span_lists = (
        spans.map_batches(add_dshard, batch_format="pyarrow")
        .groupby("dshard")
        .map_groups(
            lambda g: pack(g.drop_columns(["dshard"]) if "dshard" in g.column_names else g),
            batch_format="pyarrow",
        )
    )
    n_part = num_partitions or _join_partitions()
    if num_partitions is None and docs_ds.count() < 10_000:
        n_part = 1
    joined = docs.join(span_lists, join_type="left_outer", num_partitions=n_part, on=("doc_id",))
    return joined.map_batches(cut, fn_kwargs={"with_spans": True}, batch_format="pyarrow")


def overlap_coefficient(a: set, b: set) -> float:
    """|A n B| / min(|A|, |B|) — the symmetric containment ("is the
    smaller document essentially inside the larger one").  0.0 when
    either set is empty."""
    if not a or not b:
        return 0.0
    small, large = (a, b) if len(a) <= len(b) else (b, a)
    return len(small & large) / len(small)


def ngram_containment_pairs(
    docs_ds, threshold: float = 0.8, num_partitions: int | None = None
):
    """EXACT (doc_a, doc_b) pairs (doc_a < doc_b) whose word-3-gram
    OVERLAP COEFFICIENT |A n B| / min(|A|, |B|) >= ``threshold`` — the
    doc-inside-doc near-dups Jaccard structurally misses (a page embedded
    verbatim in a 10x longer page has containment 1.0 but Jaccard ~0.1).

    Blocking is the one-sided prefix-filter analog of
    :func:`ngram_jaccard_pairs`: containment >= t forces overlap >=
    ceil(t * n_small), so the SMALLER side's rarest-first prefix
    (``n - ceil(t*n) + 1`` shingles under the CMS-estimated-DF order)
    must intersect the larger side's FULL shingle set — the container
    side admits no prefix (its size is unbounded relative to the
    contained side), which is the classic containment-join asymmetry.
    Candidate volume is therefore sum over prefix rows of df(token);
    the rarest-first order keeps probed posting lists small by
    construction (a prefix token is by definition among its document's
    rarest), and rows whose CMS df-estimate is <= 1 are dropped from
    both sides (estimate >= true df, so such tokens are provably
    unshared) — on diverse corpora that removes most of the exploded
    volume.  The same one-join text fetch verifies exactly with
    :func:`overlap_coefficient`.  Caveat (shared with the Jaccard
    ``"df"`` order): on pathologically low-diversity corpora every
    shingle is hot, no row prunes, and the posting-list pairing
    dominates — containment admits no size filter, so its constant is
    larger than Jaccard's (sf0.1 documents, 31-token vocabulary:
    ~19 s vs ~13 s)."""
    import math

    import ray

    sketch_ref = ray.put(build_df_sketch(docs_ds))

    def rows(batch: pa.Table) -> pa.Table:
        """Prefix rows (kind=0, with position) + full rows (kind=1)."""
        import ray as _ray

        sketch = _ray.get(sketch_ref)
        tok_p, doc_p, size_p, pos_p, kind_p = [], [], [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sh = _word_shingles(text)
            n = len(sh)
            if n == 0:
                continue
            hvs = np.fromiter(
                (_stable_hash64(s.encode("utf-8")) for s in sh),
                dtype=np.uint64, count=n,
            )
            est = _cms_estimate(hvs, sketch)
            order = np.lexsort((hvs, est))
            p = n - math.ceil(threshold * n - 1e-9) + 1
            # a token with CMS df-ESTIMATE <= 1 has true df <= 1 (CMS only
            # overestimates): it is shared by no other document, so rows
            # carrying it can never produce a candidate — drop them from
            # BOTH sides.  On diverse corpora this removes most of the
            # exploded volume.
            keep_all = est[order] > 1
            # kept-suffix count: how many SHAREABLE (df>1) tokens sit at
            # this position or later in the full sorted order — a sound
            # per-occurrence overlap bound (the intersection only contains
            # kept tokens, and when this is the pair's EARLIEST shared
            # token every shared token sits at a later-or-equal position;
            # pairs pruned here re-emit via that earlier occurrence)
            suffix_kept = np.cumsum(keep_all[::-1])[::-1].astype(np.int64)
            head_keep = keep_all[:p]
            pref = hvs[order[:p][head_keep]]
            rem = suffix_kept[:p][head_keep]
            tok_p.append(pref)
            doc_p.append(np.full(len(pref), doc_id, dtype=np.int64))
            size_p.append(np.full(len(pref), n, dtype=np.int64))
            pos_p.append(rem.astype(np.int32))
            kind_p.append(np.zeros(len(pref), dtype=np.int8))
            full = hvs[est > 1]
            tok_p.append(full)
            doc_p.append(np.full(len(full), doc_id, dtype=np.int64))
            size_p.append(np.full(len(full), n, dtype=np.int64))
            pos_p.append(np.full(len(full), -1, dtype=np.int32))
            kind_p.append(np.ones(len(full), dtype=np.int8))
        if not tok_p:
            return pa.table(
                {
                    "shard": pa.array([], pa.int32()),
                    "token": pa.array([], pa.uint64()),
                    "doc_id": pa.array([], pa.int64()),
                    "size": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int32()),
                    "kind": pa.array([], pa.int8()),
                }
            )
        toks = np.concatenate(tok_p)
        return pa.table(
            {
                "shard": pa.array(
                    (toks % np.uint64(BAND_SHARDS)).astype(np.int32), pa.int32()
                ),
                "token": pa.array(toks, pa.uint64()),
                "doc_id": pa.array(np.concatenate(doc_p), pa.int64()),
                "size": pa.array(np.concatenate(size_p), pa.int64()),
                "pos": pa.array(np.concatenate(pos_p), pa.int32()),
                "kind": pa.array(np.concatenate(kind_p), pa.int8()),
            }
        )

    def shard_candidates(group: pa.Table) -> pa.Table:
        import math

        if group.num_rows == 0 or "token" not in group.column_names:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
            )
        prefs: dict[int, list] = {}
        fulls: dict[int, list] = {}
        for tok, doc, size, pos, kind in zip(
            group.column("token").to_pylist(),
            group.column("doc_id").to_pylist(),
            group.column("size").to_pylist(),
            group.column("pos").to_pylist(),
            group.column("kind").to_pylist(),
        ):
            (prefs if kind == 0 else fulls).setdefault(tok, []).append(
                (doc, size, pos)
            )
        a, b = [], []
        seen: set[tuple[int, int]] = set()
        for tok, plist in prefs.items():
            flist = fulls.get(tok)
            if not flist:
                continue
            for dp, np_, rem in plist:
                need = math.ceil(threshold * np_ - 1e-9)
                # positional filter on the KEPT-suffix bound shipped in the
                # row: at most `rem` shareable (df>1) tokens of dp sit at
                # this position or later, so overlap >= need is impossible
                # when rem < need (the pair's earliest shared occurrence,
                # if any, always passes — see rows())
                if rem < need:
                    continue
                for df_, nf, _ in flist:
                    if df_ == dp or nf < np_:
                        continue  # the prefix side must be the smaller
                    pair = (dp, df_) if dp < df_ else (df_, dp)
                    if pair not in seen:
                        seen.add(pair)
                        a.append(pair[0])
                        b.append(pair[1])
        return pa.table(
            {"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())}
        )

    candidates = (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(rows, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_candidates, batch_format="pyarrow")
    )
    return exact_jaccard_verify(
        candidates, docs_ds, threshold, num_partitions, sim_fn=overlap_coefficient
    )


def containment_pairs_oracle_sql(threshold: float = 0.8) -> str:
    """DuckDB mirror of :func:`ngram_containment_pairs`: brute-force
    overlap coefficient over the same distinct word-3-gram sets."""
    return f"""
        with w as (select doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') as ws
                   from documents),
             t as (select doc_id,
                          case when len(ws) >= 3 then
                                 list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                                for i in range(1, len(ws) - 1)])
                               when len(ws) > 0 then [list_aggregate(ws, 'string_agg', ' ')]
                               else [] end as sh
                   from w)
        select a.doc_id as doc_a, b.doc_id as doc_b
        from t a join t b on a.doc_id < b.doc_id
        where len(a.sh) > 0 and len(b.sh) > 0
          and len(list_intersect(a.sh, b.sh))::double
              / least(len(a.sh), len(b.sh)) >= {threshold}
    """


def line_dedup(docs_ds, parts: int | None = None):
    """Corpus-wide exact line dedup (the C4/RefinedWeb "deduplicate at
    the line level" pass): every sentence occurrence that is NOT the
    globally first occurrence — ordered by (doc_id, position), including
    repeats within one document — is dropped, and each document is
    reassembled from its surviving sentences in original order.
    ``(doc_id, clean_text)``; documents whose every sentence is an echo
    drop out entirely.

    Sentence unit is the ``'. '`` split (the strip_boilerplate
    convention — DuckDB ``string_split``-mirrorable, no regex).

    Shape: explode (sentence, doc_id, pos) -> coarse hash partition by
    sentence (the gram_novelty trick: one vectorized UDF per ~4xCPU
    partition, a (sentence, doc_id, pos) sort + run-length scan keeps
    each run's first row) -> coarse doc-shard reassembly (sort by
    (doc_id, pos), one string-join per document).  Two exchanges, both
    moving each sentence occurrence once; no joins, no driver state."""
    import numpy as np

    from ..state.lineage import url_buckets

    if parts is None:
        import ray

        parts = 4 * max(1, int(ray.cluster_resources().get("CPU", 8)))

    def explode(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "sent": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "part": pa.array([], pa.int32()),
            }
        )
        if batch.num_rows == 0 or "text" not in batch.column_names:
            return empty
        sents: list[str] = []
        docs: list[int] = []
        poss: list[int] = []
        for doc_id, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            parts_ = t.split(". ")  # '' -> [''] in BOTH Python and DuckDB
            sents.extend(parts_)
            docs.extend([doc_id] * len(parts_))
            poss.extend(range(1, len(parts_) + 1))
        sent_arr = pa.array(sents, pa.string())
        return pa.table(
            {
                "sent": sent_arr,
                "doc_id": pa.array(docs, pa.int64()),
                "pos": pa.array(poss, pa.int64()),
                "part": pa.array(url_buckets(sent_arr, parts), pa.int32()),
            }
        )

    def keep_first(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "sent": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "shard": pa.array([], pa.int32()),
            }
        )
        if group.num_rows == 0 or "sent" not in group.column_names:
            return empty
        tbl = group.sort_by(
            [("sent", "ascending"), ("doc_id", "ascending"), ("pos", "ascending")]
        )
        codes = pc.dictionary_encode(tbl.column("sent").combine_chunks())
        idx = np.asarray(codes.indices)
        first = np.r_[True, np.diff(idx) != 0]
        kept = tbl.filter(pa.array(first))
        shard = pc.bit_wise_and(
            kept.column("doc_id"), pa.scalar(255, pa.int64())
        ).cast(pa.int32())
        return pa.table(
            {
                "sent": kept.column("sent"),
                "doc_id": kept.column("doc_id"),
                "pos": kept.column("pos"),
                "shard": shard,
            }
        )

    def reassemble(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "clean_text": pa.array([], pa.string()),
            }
        )
        if group.num_rows == 0 or "doc_id" not in group.column_names:
            return empty
        tbl = group.sort_by([("doc_id", "ascending"), ("pos", "ascending")])
        docs = tbl.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        sents = tbl.column("sent").to_pylist()
        starts = np.flatnonzero(np.r_[True, docs[1:] != docs[:-1]])
        ends = np.r_[starts[1:], len(docs)]
        return pa.table(
            {
                "doc_id": pa.array(docs[starts], pa.int64()),
                "clean_text": pa.array(
                    [". ".join(sents[a:b]) for a, b in zip(starts, ends)],
                    pa.string(),
                ),
            }
        )

    return (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(keep_first, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(reassemble, batch_format="pyarrow")
    )


def winnow_pairs(
    docs_ds,
    k: int = 3,
    w: int = 4,
    max_df: int = 10,
    min_shared: int = 2,
):
    """MOSS-style near-dup candidate pairs: two documents are paired by
    how many DISTINCT winnowing fingerprints they share
    (:func:`..text.winnow_batch` selections, positions dropped).  The
    winnowing coverage guarantee makes this the classic plagiarism /
    mirror detector: any shared word run of >= w+k-1 tokens contributes
    at least one shared fingerprint.

    Fingerprints held by more than ``max_df`` documents are boilerplate
    and are dropped before pairing (the MOSS "ignore ubiquitous
    fingerprints" rule) — which is also what bounds the exchange: a
    surviving fingerprint bucket emits at most C(max_df, 2) pairs, so
    pair volume stays LINEAR in the fingerprint count at any corpus size
    (no all-pairs anywhere, unlike the brute-force containment oracle).

    Shape: per-batch distinct (doc, fp) combiner -> groupby fp with
    per-bucket pair expansion (numpy ``triu_indices``) -> bounded
    materialize for the empty-input short-circuit (the repo-standard
    guard against Ray's empty-hash-shuffle crash; the pair table is
    already result-scale) -> (doc_a, doc_b) Sum -> vectorized threshold
    filter.  Emits ``(doc_a, doc_b, shared_fps)`` with doc_a < doc_b and
    shared_fps >= min_shared."""
    import ray.data
    from ray.data.aggregate import Sum

    from .text import winnow_batch

    _EMPTY_PAIRS = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "shared_fps": pa.array([], pa.int64()),
        }
    )

    def fp_rows(batch: pa.Table) -> pa.Table:
        t = winnow_batch(batch, k=k, w=w)
        # batch-local distinct (doc, fp): the same fingerprint selected at
        # several positions still counts once toward the pair score
        return t.group_by(["doc_id", "fp"]).aggregate([]).select(["doc_id", "fp"])

    def pairs(group: pa.Table) -> pa.Table:
        docs = np.unique(np.asarray(group.column("doc_id").to_pylist(), np.int64))
        if len(docs) < 2 or len(docs) > max_df:
            return _EMPTY_PAIRS
        i, j = np.triu_indices(len(docs), 1)
        return pa.table(
            {
                "doc_a": pa.array(docs[i]),
                "doc_b": pa.array(docs[j]),
                "shared_fps": pa.array(np.ones(len(i), np.int64)),
            }
        )

    pair_rows = (
        docs_ds.map_batches(fp_rows, batch_format="pyarrow")
        .groupby("fp")
        .map_groups(pairs, batch_format="pyarrow")
        .materialize()
    )
    if pair_rows.count() == 0:
        return ray.data.from_arrow(_EMPTY_PAIRS)
    scored = pair_rows.groupby(["doc_a", "doc_b"]).aggregate(
        Sum("shared_fps", alias_name="shared_fps")
    )
    return scored.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("shared_fps"), min_shared)),
        batch_format="pyarrow",
    )


def softdedup_weights(docs_ds, threshold: float = 0.7,
                      num_partitions: int | None = None,
                      method: str = "minhash"):
    """Soft deduplication (the SoftDeDup idea: He et al. 2024, public):
    instead of DROPPING near-duplicates, every document gets a training
    sampling weight inversely proportional to its near-dup cluster size —
    ``weight_ppm = 1_000_000 // |cluster|``, 1_000_000 for unclustered
    docs — so duplicated content contributes one document's worth of
    gradient in expectation without discarding any page.

    Composition of proven pieces: the exact-verified pair generators +
    BSP min-label components (:func:`near_dup_components`) -> one tiny
    per-cluster size groupby -> weights joined back; docs outside any
    cluster arrive via a left-anti-style null fill on a left-outer hash
    join (the cluster table is orders of magnitude smaller than the
    corpus).  Emits (doc_id, weight_ppm) for EVERY document."""
    import numpy as np
    import ray.data
    from ray.data.aggregate import Count

    comp = near_dup_components(docs_ds, threshold, num_partitions, method)
    sizes = comp.groupby("component").aggregate(Count(alias_name="n"))
    comp_m = comp.materialize()

    ids = docs_ds.select_columns(["doc_id"])
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "weight_ppm": pa.array([], pa.int64())}
    )
    if comp_m.count() == 0:
        # no near-dup clusters: every doc weighs 1.0 (and Ray's hash join
        # crashes on an empty side — short-circuit unconditionally)
        def all_one(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "doc_id" not in batch.column_names:
                return empty
            return pa.table(
                {
                    "doc_id": batch.column("doc_id").cast(pa.int64()),
                    "weight_ppm": pa.array(
                        np.full(batch.num_rows, 1_000_000, np.int64), pa.int64()
                    ),
                }
            )

        return ids.map_batches(all_one, batch_format="pyarrow")

    n_part = num_partitions
    if n_part is None:
        n_part = 1 if comp_m.count() < 10_000 else _join_partitions()
    weighted = comp_m.join(sizes, join_type="inner", num_partitions=n_part,
                           on=("component",))
    out = ids.join(
        weighted.select_columns(["doc_id", "n"]),
        join_type="left_outer",
        num_partitions=n_part,
        on=("doc_id",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return empty
        n = batch.column("n").to_pylist()
        w = np.asarray([1_000_000 // v if v else 1_000_000 for v in n], dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "weight_ppm": pa.array(w, pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")
