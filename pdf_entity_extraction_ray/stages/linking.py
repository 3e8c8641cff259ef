"""Stage 4: entity linking / canonicalization (the wide shuffle step).

Ray-native re-expression of the reference's entity resolution (D2,
src/ollama_entity_extraction/OllamaNERExtractor.py:122-184): the reference
grows transitive similarity groups with an O(n^2) pairwise pass over ALL
surface forms and consolidates each group with an LLM call.  Here:

1. **distinct surfaces** — mentions are pre-aggregated per batch
   (``map_batches`` partial count: the combiner) and then reduced with a
   small ``groupby(["type","surface"]).sum()`` — the shuffle moves one row
   per distinct (type, surface), not one per mention.  This is the G1
   head-skew treatment: a surface mentioned 10^9 times still ships one row.
2. **blocking** — each distinct surface emits a handful of block keys
   (folded words, sorted-word key M20, MinHash-LSH bands over char shingles
   for typo recall).  Only pairs sharing a block are tested — the LSH
   replacement for the reference's all-pairs loop.
3. **pair test** — within each block (``groupby(block).map_groups``), the
   EXACT reference predicates decide edges: Levenshtein ratio > 0.79 OR
   word-intersection > 0.65 (OllamaNERExtractor.py:122-126), plus the
   subset rule M21 (check_heuristics.py:63-97) and abbreviation rule M22
   (check_heuristics.py:175-226).  Oversized blocks (stop-word-like keys)
   are skipped, mirroring LSH banding's intent; the words that matter for
   recall also appear in smaller, rarer blocks.
4. **components** — two interchangeable paths with identical output:
   the driver path (``link_entities``) closes the tiny edge list with
   union-find and broadcasts the resulting map; the distributed path
   (``link_entities_distributed``) runs BSP min-label propagation
   (``label_propagation_components``) so neither the surface universe nor
   the edges ever land on the driver — the 10^8+-distinct-surface route.

Representative selection replaces the LLM judge (A9) with the
deterministic "most complete name" contract the prompts encode
(OllamaNameExtractor.py:16-20): most words (punctuation-stripped), then
longest, then lexicographically smallest; never invents a surface.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.similarity import MinHasher, UnionFind, char_shingles
from ..functions.textnorm import (
    abbreviation_expands_to,
    ascii_fold,
    strip_punct,
    surface_norm,
    surfaces_similar,
    words_subset_merge_key,
)

# Types that participate in surface-form linking.  DATE canonicalizes by
# parsed ISO value (functions/dates.py), not by string similarity.
LINKED_TYPES = ("PERSON", "ORG", "GPE", "LAW")

# Blocks larger than this are skipped in the pair test (head / stop-word
# keys — the scale guard; recall is preserved by the rarer keys).
MAX_BLOCK = 200

MINHASH_PERMS = 64
LSH_BANDS = 16  # 4 rows/band: catches Jaccard >~0.5 char-shingle pairs


def node_id_of(type_: str, canonical: str) -> int:
    """Content-derived node id — stable across runs / partitions / retries."""
    key = f"{type_}\x00{canonical}".encode()
    return int.from_bytes(hashlib.blake2b(key, digest_size=8).digest(), "little") & 0x7FFFFFFFFFFFFFFF


def representative(surfaces: list[str]) -> str:
    """Deterministic 'most complete name': most words, longest, lex-smallest."""
    return max(surfaces, key=lambda s: (len(strip_punct(s).split()), len(s), [-ord(c) for c in s]))


# --------------------------------------------------------------------------
# step 1: partial distinct-surface aggregation (the combiner)


def partial_surface_counts(batch: pa.Table) -> pa.Table:
    """mentions batch -> one row per (type, surface) with partial count."""
    sub = batch.select(["type", "surface"])
    grouped = sub.group_by(["type", "surface"]).aggregate([([], "count_all")])
    return pa.table(
        {
            "type": grouped.column("type"),
            "surface": grouped.column("surface"),
            "n": grouped.column("count_all").cast(pa.int64()),
        }
    )


# --------------------------------------------------------------------------
# step 2: blocking keys


import functools


@functools.lru_cache(maxsize=4)
def _cached_hasher(num_perm: int, seed: int) -> MinHasher:
    """Per-process MinHasher (cheap to build, process-cached so plain map
    TASKS reuse it — no actor pool / startup cost for this stage)."""
    return MinHasher(num_perm=num_perm, seed=seed)


class BlockKeyer:
    """Distinct-surface rows -> exploded (block, type, surface) rows.

    Plain-function-shaped (used with task-pool ``map_batches`` via
    :func:`block_keys_batch`); the MinHash table is process-cached."""

    def __init__(self, num_perm: int = MINHASH_PERMS, bands: int = LSH_BANDS, seed: int = 42):
        self.hasher = _cached_hasher(num_perm, seed)
        self.bands = bands

    def keys_for(self, surface: str) -> set[str]:
        norm = surface_norm(surface)
        keys: set[str] = set()
        # word keys (catch subset M21 / abbreviation M22 / word-permutation
        # M20 / accent M19 pairs — any shared informative word blocks them)
        for w in norm.split():
            if len(w) >= 3:
                keys.add("w:" + w)
        # sorted-word key (word-order permutations even of short words)
        keys.add("s:" + " ".join(sorted(norm.split())))
        # LSH bands over char shingles (typos within Levenshtein > 0.79)
        sig = self.hasher.signature(char_shingles(norm, 3))
        for bk in self.hasher.band_keys(sig, self.bands):
            keys.add("b:" + bk)
        return keys

    def __call__(self, batch: pa.Table) -> pa.Table:
        types = batch.column("type").to_pylist()
        surfaces = batch.column("surface").to_pylist()
        out_block: list[str] = []
        out_type: list[str] = []
        out_surface: list[str] = []
        for typ, surface in zip(types, surfaces):
            if typ not in LINKED_TYPES:
                continue
            for key in self.keys_for(surface):
                out_block.append(f"{typ}|{key}")
                out_type.append(typ)
                out_surface.append(surface)
        return pa.table(
            {
                "block": pa.array(out_block, pa.string()),
                "type": pa.array(out_type, pa.string()),
                "surface": pa.array(out_surface, pa.string()),
            }
        )


# --------------------------------------------------------------------------
# step 3: within-block pair test (exact reference predicates)


def surfaces_match(a: str, b: str) -> bool:
    """Full merge rule: D2 thresholds OR subset M21 OR abbreviation M22.
    Similarity runs on accent-folded forms (M19) so accent variants pair."""
    fa, fb = ascii_fold(a), ascii_fold(b)
    return (
        surfaces_similar(fa, fb)
        or words_subset_merge_key(a, b)
        or words_subset_merge_key(b, a)
        or abbreviation_expands_to(a, b)
        or abbreviation_expands_to(b, a)
    )


def block_pairs(group: pa.Table) -> pa.Table:
    """One block -> similar-pair edge rows (type, a, b), a < b."""
    types = group.column("type").to_pylist()
    surfaces = sorted(set(group.column("surface").to_pylist()))
    typ = types[0] if types else ""
    out_a: list[str] = []
    out_b: list[str] = []
    if 1 < len(surfaces) <= MAX_BLOCK:
        for i in range(len(surfaces)):
            for j in range(i + 1, len(surfaces)):
                if surfaces_match(surfaces[i], surfaces[j]):
                    out_a.append(surfaces[i])
                    out_b.append(surfaces[j])
    return pa.table(
        {
            "type": pa.array([typ] * len(out_a), pa.string()),
            "a": pa.array(out_a, pa.string()),
            "b": pa.array(out_b, pa.string()),
        }
    )


# --------------------------------------------------------------------------
# step 4: union-find + cluster map (driver-side over the small edge list)


def build_cluster_map(
    edges: list[tuple[str, str, str]],
    all_surfaces: list[tuple[str, str]],
    consolidate=None,
) -> dict[tuple[str, str], tuple[int, str]]:
    """(type, a, b) edges + (type, surface) universe ->
    {(type, surface): (node_id, canonical)}.

    ``consolidate(group: list[str]) -> str | None`` is the A9 interface
    hook (the reference's per-group LLM judge, OllamaNERExtractor.py:
    128-154): it must return one member of the group (never invent a
    surface) or None to leave the group UNMERGED (the reference's behavior
    when the LLM returns anything but exactly one name).  Default is the
    deterministic most-complete-name rule.

    Deterministic: union-find roots are order-independent (smaller key
    wins), representatives are a pure function of the member set.
    """
    uf = UnionFind()
    for typ, a, b in edges:
        uf.union((typ, a), (typ, b))
    for typ, surface in all_surfaces:
        uf.find((typ, surface))

    members: dict[tuple[str, str], list[str]] = {}
    for typ, surface in all_surfaces:
        root = uf.find((typ, surface))
        members.setdefault(root, []).append(surface)

    cluster_map: dict[tuple[str, str], tuple[int, str]] = {}
    for root, group in members.items():
        typ = root[0]
        if consolidate is None or len(group) == 1:
            canon = representative(group)
        else:
            canon = consolidate(sorted(group))
            if canon is not None and canon not in group:
                raise ValueError(
                    f"consolidator invented surface {canon!r} not in group"
                )
        if canon is None:  # group left unmerged (reference A9 contract)
            for surface in group:
                cluster_map[(typ, surface)] = (node_id_of(typ, surface), surface)
            continue
        nid = node_id_of(typ, canon)
        for surface in group:
            cluster_map[(typ, surface)] = (nid, canon)
    return cluster_map


# --------------------------------------------------------------------------
# orchestration (Dataset in, Dataset/driver artifacts out)


def _coarse_parts() -> int:
    """Coarse-partition count for the vectorized group stages: enough for
    full-cluster parallelism + skew smoothing, small enough that per-call
    UDF overhead is negligible."""
    import ray

    return 4 * max(1, int(ray.cluster_resources().get("CPU", 8)))


def _add_block_part(batch: pa.Table, parts: int) -> pa.Table:
    """Hash the block key into a coarse ``part`` column.

    The hash here is CORRECTNESS-critical ("blocks never split across
    hash partitions"): every worker, retry, and environment must agree,
    so it uses stdlib ``zlib.crc32`` — environment-independent, unlike
    lineage.url_buckets' polars xxhash (documented stable only within one
    polars version, with a differing blake2b fallback when polars is
    absent; fine for its PHYSICAL cache clustering, not for this).
    crc32 is C-speed (~GB/s); at 10^7 block rows the loop costs well
    under a second per partition call."""
    import zlib

    if batch.num_rows == 0 or "block" not in batch.column_names:
        return pa.table(
            {
                "block": pa.array([], pa.string()),
                "type": pa.array([], pa.string()),
                "surface": pa.array([], pa.string()),
                "part": pa.array([], pa.int32()),
            }
        )
    part = [
        zlib.crc32(b.encode("utf-8")) % parts
        for b in batch.column("block").to_pylist()
    ]
    return batch.append_column("part", pa.array(part, pa.int32()))


def _block_pairs_partition(group: pa.Table) -> pa.Table:
    """One coarse hash partition (MANY blocks) -> similar-pair edge rows.

    Replaces per-block ``map_groups(block_pairs)``: at >10^6 distinct
    surfaces the block-key universe is tens of millions, and Ray's
    map_groups pays one Python UDF call + Arrow table construction PER
    GROUP (~80 us) — measured 25+ min of straggler time at 2M surfaces.
    Grouping by a coarse hash of the block key instead makes group
    detection a vectorized boundary scan inside ~4xCPU partition calls;
    the Python loop runs only over multi-row blocks (the actual work).
    Same pairs, same MAX_BLOCK cap, same within-block ordering as
    :func:`block_pairs` (blocks never split across hash partitions)."""
    import numpy as np

    empty = pa.table(
        {
            "type": pa.array([], pa.string()),
            "a": pa.array([], pa.string()),
            "b": pa.array([], pa.string()),
        }
    )
    if group.num_rows == 0 or "block" not in group.column_names:
        return empty
    tbl = group.sort_by([("block", "ascending"), ("surface", "ascending")])
    codes = pc.dictionary_encode(tbl.column("block").combine_chunks()).indices
    idx = np.asarray(codes)
    starts = np.flatnonzero(np.r_[True, np.diff(idx) != 0])
    ends = np.r_[starts[1:], len(idx)]
    sizes = ends - starts
    # rows with < 2 entries can't pair; the MAX_BLOCK cap is applied to
    # the DISTINCT surface count inside the loop (block_pairs semantics —
    # duplicate rows must neither self-pair nor inflate the cap)
    keep = sizes >= 2
    if not keep.any():
        return empty
    surfaces = tbl.column("surface").to_pylist()
    types = tbl.column("type").to_pylist()
    out_t: list[str] = []
    out_a: list[str] = []
    out_b: list[str] = []
    for s, e in zip(starts[keep], ends[keep]):
        # sorted slice -> dict.fromkeys dedups while preserving order
        surs = list(dict.fromkeys(surfaces[s:e]))
        if not (1 < len(surs) <= MAX_BLOCK):
            continue
        typ = types[s]
        for i in range(len(surs)):
            si = surs[i]
            for j in range(i + 1, len(surs)):
                if surfaces_match(si, surs[j]):
                    out_t.append(typ)
                    out_a.append(si)
                    out_b.append(surs[j])
    return pa.table(
        {
            "type": pa.array(out_t, pa.string()),
            "a": pa.array(out_a, pa.string()),
            "b": pa.array(out_b, pa.string()),
        }
    )


def candidate_pair_edges(distinct, parts: int | None = None):
    """Distinct-surface Dataset -> (type, a, b) candidate-pair edges via
    LSH/word blocking with coarse-partition vectorized pair generation.
    The shared edge stage of BOTH linking paths."""
    parts = parts or _coarse_parts()
    return (
        distinct.map_batches(
            block_keys_batch, batch_format="pyarrow"
        )
        .map_batches(
            _add_block_part, fn_kwargs={"parts": parts}, batch_format="pyarrow"
        )
        .groupby("part")
        .map_groups(_block_pairs_partition, batch_format="pyarrow")
    )


def block_keys_batch(batch: pa.Table) -> pa.Table:
    """Task-pool form of :class:`BlockKeyer` (process-cached hasher).

    Empty shuffle partitions carry an EMPTY schema (Ray groupby quirk) —
    guard before touching columns, like the universe loop does."""
    if batch.num_rows == 0 or "type" not in batch.column_names:
        return pa.table(
            {
                "block": pa.array([], pa.string()),
                "type": pa.array([], pa.string()),
                "surface": pa.array([], pa.string()),
            }
        )
    return BlockKeyer()(batch)


def distinct_surfaces(mentions_ds):
    """mentions Dataset -> materialized distinct (type, surface, n)
    Dataset — the shared first shuffle of both linking paths (exposed so
    callers that need the distinct COUNT first, e.g. the pipeline's
    auto mode selection, compute it once and pass the result back in)."""
    out = (
        mentions_ds.map_batches(partial_surface_counts, batch_format="pyarrow")
        .groupby(["type", "surface"])
        .sum("n")
    )
    # Ray names the aggregate 'sum(n)'; restore the documented 'n'
    return out.map_batches(
        lambda b: b.rename_columns(
            [c if c != "sum(n)" else "n" for c in b.column_names]
        ),
        batch_format="pyarrow",
    ).materialize()


def link_entities(mentions_ds, *, consolidate=None, distinct=None):
    """mentions Dataset -> (cluster_map dict, distinct surface count).

    The returned map is small (distinct linked surfaces only); callers
    broadcast it with ``ray.put`` for the rewrite stages.  ``distinct``:
    optionally a precomputed :func:`distinct_surfaces` result (skips the
    first shuffle).
    """
    import ray

    if distinct is None:
        distinct = distinct_surfaces(mentions_ds)
    # collect the (type, surface) universe for union-find
    universe: list[tuple[str, str]] = []
    for ref in distinct.to_arrow_refs():
        tbl = ray.get(ref)
        if tbl.num_rows == 0 or "type" not in tbl.column_names:
            continue  # empty shuffle partitions carry an empty schema
        universe.extend(zip(tbl.column("type").to_pylist(), tbl.column("surface").to_pylist()))
    universe = [(t, s) for t, s in universe if t in LINKED_TYPES]

    edges_tbl = candidate_pair_edges(distinct)
    edges: list[tuple[str, str, str]] = []
    for batch in edges_tbl.iter_batches(batch_format="pyarrow"):
        if batch.num_rows == 0 or "type" not in batch.column_names:
            continue
        edges.extend(
            zip(
                batch.column("type").to_pylist(),
                batch.column("a").to_pylist(),
                batch.column("b").to_pylist(),
            )
        )
    return build_cluster_map(sorted(set(edges)), universe, consolidate), len(universe)


# --------------------------------------------------------------------------
# distributed linking: label-propagation connected components (the 10^8+-
# distinct-surface path the driver-side union-find cannot serve)


def _join_parts() -> int:
    """Join partition count, capped at 8 for LOCAL sessions: each
    ``Dataset.join`` spins up ``num_partitions`` aggregator actors with
    fixed startup cost, and 2/CPU oversubscribes one node (two chained
    joins at 64 partitions wedged a 32-CPU box — see
    ops/dedup._join_partitions).  On a real cluster pass
    ``num_partitions`` explicitly to :func:`link_entities_distributed`."""
    import ray

    return min(8, max(4, int(ray.cluster_resources().get("CPU", 4)) // 2))


def _sym_edges_batch(batch: pa.Table) -> pa.Table:
    """(type, a, b) edge batch -> symmetric int-keyed (u, v) rows."""
    if batch.num_rows == 0 or "type" not in batch.column_names:
        return pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    ka = [
        node_id_of(t, s)
        for t, s in zip(batch.column("type").to_pylist(), batch.column("a").to_pylist())
    ]
    kb = [
        node_id_of(t, s)
        for t, s in zip(batch.column("type").to_pylist(), batch.column("b").to_pylist())
    ]
    return pa.table(
        {"u": pa.array(ka + kb, pa.int64()), "v": pa.array(kb + ka, pa.int64())}
    )


def _edge_member_rows(batch: pa.Table) -> pa.Table:
    """(type, a, b) edge batch -> (node, type, surface) rows for both ends."""
    if batch.num_rows == 0 or "type" not in batch.column_names:
        return pa.table(
            {
                "node": pa.array([], pa.int64()),
                "type": pa.array([], pa.string()),
                "surface": pa.array([], pa.string()),
            }
        )
    types = batch.column("type").to_pylist()
    surfaces = batch.column("a").to_pylist() + batch.column("b").to_pylist()
    types2 = types + types
    keys = [node_id_of(t, s) for t, s in zip(types2, surfaces)]
    return pa.table(
        {
            "node": pa.array(keys, pa.int64()),
            "type": pa.array(types2, pa.string()),
            "surface": pa.array(surfaces, pa.string()),
        }
    )


def _uv_arrays(tbl: pa.Table):
    import numpy as np

    if tbl.num_rows == 0 or "u" not in tbl.column_names:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    u = tbl.column("u").combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    v = tbl.column("v").combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    return u, v


def _lp_remotes():
    """BSP worker tasks for label propagation (built lazily so importing
    this module never touches Ray)."""
    import numpy as np

    import ray

    @ray.remote
    def split_edges(tbl: pa.Table, P: int):
        """One sym-edge block -> P (u, v) shards by hash(u) partition."""
        u, v = _uv_arrays(tbl)
        dest = u % P
        order = np.argsort(dest, kind="stable")
        us, vs, ds = u[order], v[order], dest[order]
        bounds = np.searchsorted(ds, np.arange(P + 1))
        return [(us[bounds[p] : bounds[p + 1]], vs[bounds[p] : bounds[p + 1]]) for p in range(P)]

    @ray.remote
    def concat_part(*shards):
        """Assemble one partition: edges sorted by u + its node/label state.
        Nodes are the unique u values (u is the partition key, and sym
        edges contain every node as a source)."""
        # P == 1 ships the un-split 1-element list (num_returns=1 does
        # not unwrap); normalize each shard to its (u, v) tuple
        shards = [s[0] if isinstance(s, list) else s for s in shards]
        u = np.concatenate([s[0] for s in shards]) if shards else np.empty(0, np.int64)
        v = np.concatenate([s[1] for s in shards]) if shards else np.empty(0, np.int64)
        order = np.argsort(u, kind="stable")
        u, v = u[order], v[order]
        nodes = np.unique(u)
        return u, v, nodes, nodes.copy()  # initial label = own key

    @ray.remote
    def msgs(part, P: int):
        """One partition's round messages: (v, label(u)) shards by hash(v)."""
        u, v, nodes, labels = part
        lbl = labels[np.searchsorted(nodes, u)]
        dest = v % P
        order = np.argsort(dest, kind="stable")
        vs, ls, ds = v[order], lbl[order], dest[order]
        bounds = np.searchsorted(ds, np.arange(P + 1))
        return [(vs[bounds[p] : bounds[p + 1]], ls[bounds[p] : bounds[p + 1]]) for p in range(P)]

    @ray.remote
    def reduce_part(part, *incoming):
        """Fold incoming min-label messages into one partition's state."""
        u, v, nodes, labels = part
        new = labels.copy()
        incoming = [s[0] if isinstance(s, list) else s for s in incoming]
        for mv, ml in incoming:
            if len(mv):
                idx = np.searchsorted(nodes, mv)
                np.minimum.at(new, idx, ml)
        changed = not np.array_equal(new, labels)
        return (u, v, nodes, new), changed

    @ray.remote(num_returns=2)
    def expose(part):
        """(nodes, labels) ObjectRefs for worker-side checkpointing."""
        return part[2], part[3]

    @ray.remote
    def splice(part, nodes_loaded, labels_loaded):
        """Resume a checkpointed label array into a freshly rebuilt static
        partition (deterministic rebuild => node arrays must match)."""
        u, v, nodes, _labels = part
        if not np.array_equal(nodes, nodes_loaded):
            raise ValueError("checkpoint node set does not match input partition")
        return u, v, nodes, labels_loaded.astype(np.int64)

    @ray.remote
    def to_table(part) -> pa.Table:
        _, _, nodes, labels = part
        return pa.table(
            {"node": pa.array(nodes, pa.int64()), "label": pa.array(labels, pa.int64())}
        )

    return split_edges, concat_part, msgs, reduce_part, expose, splice, to_table


def label_propagation_components(
    edges_ds, *, max_iters: int | None = None, num_partitions: int | None = None,
    checkpoint_dir: str | None = None, checkpoint_every: int = 5,
    checkpoint_fingerprint: str | None = None,
):
    """Similar-pair edges (type, a, b) -> (node, label) component Dataset.

    Iterative min-label propagation as a raw-Ray-task BSP loop — the one
    place the Dataset API genuinely can't express the semantics: re-invoking
    shuffle-join operators per round pays seconds of fixed operator setup
    per iteration, while components need only diameter-many rounds of tiny
    co-partitioned exchanges.  Edges are hash-partitioned by source node
    ONCE (``node_key % P``; keys are blake2b-uniform, so modulo is an even
    partitioner); each round every partition sends vectorized
    (dst, min-label) messages to its peer partitions and folds incoming
    minima with ``np.minimum.at`` — O(P^2) small objects per round, no
    sort, no driver-side state beyond P changed-flags.  Rounds needed =
    component diameter (alias clusters are shallow; ``max_iters`` guards
    pathological chains — on hitting it labels are a valid refinement,
    just possibly unmerged).  Duplicate edges from overlapping LSH blocks
    are harmless (min is idempotent).  At petabyte scale the per-round
    partition states checkpoint through lineage Parquet; here they live in
    the object store.
    """
    sym = edges_ds.map_batches(_sym_edges_batch, batch_format="pyarrow")
    return _propagate_components(
        sym, max_iters=max_iters, num_partitions=num_partitions,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
        checkpoint_fingerprint=checkpoint_fingerprint,
    )


def components_from_int_edges(
    edges_ds, col_a: str = "a", col_b: str = "b",
    *, max_iters: int | None = None, num_partitions: int | None = None,
    checkpoint_dir: str | None = None, checkpoint_every: int = 5,
    checkpoint_fingerprint: str | None = None,
):
    """Int-keyed variant of :func:`label_propagation_components`: edge rows
    carry two int64 id columns; the ids ARE the node keys (no hashing), so
    each component's final label is its minimum member id — e.g. the
    kept document of a near-duplicate cluster."""
    import numpy as np

    def sym(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or col_a not in batch.column_names:
            return pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
        a = batch.column(col_a).combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        b = batch.column(col_b).combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, b]), pa.int64()),
                "v": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    return _propagate_components(
        edges_ds.map_batches(sym, batch_format="pyarrow"),
        max_iters=max_iters,
        num_partitions=num_partitions,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        checkpoint_fingerprint=checkpoint_fingerprint,
    )


def _propagate_components(
    sym_ds,
    *,
    max_iters: int | None,
    num_partitions: int | None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    checkpoint_fingerprint: str | None = None,
):
    """Shared BSP min-label loop over a symmetric (u, v) int-edge Dataset.

    With ``checkpoint_dir`` the label arrays checkpoint per-partition
    through worker-side Parquet every ``checkpoint_every`` rounds (plus on
    convergence) and the loop resumes from the newest matching checkpoint
    — the state/lineage discipline extended to the iterative algorithms
    (state/bsp_ckpt).

    ``max_iters=None`` (the default) runs to CONVERGENCE — min-label
    propagation terminates in component-diameter rounds, so the loop is
    always finite — keeping the distributed path's output identical to
    the driver union-find.  An explicit cap returns a valid REFINEMENT
    (possibly unmerged components) and warns when it is hit, so a silent
    under-merge can never masquerade as the converged answer."""
    import ray

    P = num_partitions or max(4, int(ray.cluster_resources().get("CPU", 4)))
    split_edges, concat_part, msgs, reduce_part, expose, splice, to_table = _lp_remotes()

    sym = sym_ds.materialize()
    block_refs = list(sym.to_arrow_refs())
    shard_lists = [
        split_edges.options(num_returns=P).remote(ref, P) for ref in block_refs
    ]
    if P == 1:  # num_returns=1 unwraps the list
        shard_lists = [[s] for s in shard_lists]
    parts = [
        concat_part.remote(*[shard_lists[i][p] for i in range(len(block_refs))])
        for p in range(P)
    ]

    start_round = 0
    fp = None
    if checkpoint_dir:
        from ..state import bsp_ckpt

        # default fingerprint = params + CONTENT digest (not just count):
        # a rewired same-count input must never resume stale labels
        fp = checkpoint_fingerprint or (
            f"components:P={P}:edges={sym.count()}"
            f":digest={bsp_ckpt.content_digest(block_refs):016x}"
        )
        loaded = bsp_ckpt.load_latest(checkpoint_dir, fp, P)
        if loaded is not None:
            start_round, value_refs = loaded
            parts = [
                splice.remote(parts[p], value_refs[p][0], value_refs[p][1])
                for p in range(P)
            ]

    cap = max_iters if max_iters is not None else (1 << 20)
    converged = False
    for rnd in range(start_round, cap):
        msg_lists = [msgs.options(num_returns=P).remote(parts[p], P) for p in range(P)]
        if P == 1:
            msg_lists = [[m] for m in msg_lists]
        results = [
            reduce_part.options(num_returns=2).remote(
                parts[q], *[msg_lists[p][q] for p in range(P)]
            )
            for q in range(P)
        ]
        parts = [r[0] for r in results]
        converged = not any(ray.get([r[1] for r in results]))
        if checkpoint_dir and (converged or (rnd + 1) % checkpoint_every == 0):
            from ..state import bsp_ckpt

            bsp_ckpt.save_round(
                checkpoint_dir, fp, rnd + 1,
                [expose.options(num_returns=2).remote(p) for p in parts],
            )
        if converged:
            break
    if not converged:
        import warnings

        warnings.warn(
            f"label propagation hit max_iters={max_iters} before converging; "
            "labels are a valid refinement but components may be unmerged",
            RuntimeWarning,
        )

    import ray.data

    return ray.data.from_arrow_refs([to_table.remote(p) for p in parts])


def _cluster_assign(group: pa.Table, consolidate=None) -> pa.Table:
    """One component's member rows -> (type, surface, node_id, canonical)."""
    types = group.column("type").to_pylist()
    surfaces = sorted(set(group.column("surface").to_pylist()))
    typ = types[0] if types else ""
    if consolidate is None or len(surfaces) == 1:
        canon = representative(surfaces)
    else:
        canon = consolidate(surfaces)
        if canon is not None and canon not in surfaces:
            raise ValueError(f"consolidator invented surface {canon!r} not in group")
    if canon is None:  # group left unmerged (reference A9 contract)
        return pa.table(
            {
                "type": pa.array([typ] * len(surfaces), pa.string()),
                "surface": pa.array(surfaces, pa.string()),
                "node_id": pa.array(
                    [node_id_of(typ, s) for s in surfaces], pa.int64()
                ),
                "canonical": pa.array(surfaces, pa.string()),
            }
        )
    nid = node_id_of(typ, canon)
    return pa.table(
        {
            "type": pa.array([typ] * len(surfaces), pa.string()),
            "surface": pa.array(surfaces, pa.string()),
            "node_id": pa.array([nid] * len(surfaces), pa.int64()),
            "canonical": pa.array([canon] * len(surfaces), pa.string()),
        }
    )


_ASSIGN_SCHEMA = pa.schema(
    [
        ("type", pa.string()),
        ("surface", pa.string()),
        ("node_id", pa.int64()),
        ("canonical", pa.string()),
    ]
)


def _cluster_assign_partition(group: pa.Table, consolidate=None) -> pa.Table:
    """One coarse hash partition (MANY component labels) -> assignment
    rows.  The per-label analog of :func:`_block_pairs_partition`: at
    >10^6 clusters, per-label ``map_groups(_cluster_assign)`` pays the
    UDF + table-construction overhead once per cluster; here labels are
    detected as vectorized run boundaries and only the representative
    choice runs in Python.  Output rows identical to per-label
    :func:`_cluster_assign` (labels never split across hash partitions)."""
    import numpy as np

    if group.num_rows == 0 or "label" not in group.column_names:
        return _ASSIGN_SCHEMA.empty_table()
    tbl = group.sort_by([("label", "ascending"), ("surface", "ascending")])
    labels = tbl.column("label").combine_chunks().to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.r_[True, np.diff(labels) != 0])
    ends = np.r_[starts[1:], len(labels)]
    surfaces = tbl.column("surface").to_pylist()
    types = tbl.column("type").to_pylist()
    out_t: list[str] = []
    out_s: list[str] = []
    out_n: list[int] = []
    out_c: list[str] = []
    for s, e in zip(starts, ends):
        surs = sorted(set(surfaces[s:e]))
        typ = types[s]
        if consolidate is None or len(surs) == 1:
            canon = representative(surs)
        else:
            canon = consolidate(surs)
            if canon is not None and canon not in surs:
                raise ValueError(f"consolidator invented surface {canon!r} not in group")
        if canon is None:  # left unmerged (reference A9 contract)
            for sur in surs:
                out_t.append(typ)
                out_s.append(sur)
                out_n.append(node_id_of(typ, sur))
                out_c.append(sur)
        else:
            nid = node_id_of(typ, canon)
            for sur in surs:
                out_t.append(typ)
                out_s.append(sur)
                out_n.append(nid)
                out_c.append(canon)
    return pa.table(
        {
            "type": pa.array(out_t, pa.string()),
            "surface": pa.array(out_s, pa.string()),
            "node_id": pa.array(out_n, pa.int64()),
            "canonical": pa.array(out_c, pa.string()),
        }
    )


def _singleton_rows(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0 or "type" not in batch.column_names:
        return pa.table(
            {
                "type": pa.array([], pa.string()),
                "surface": pa.array([], pa.string()),
                "node_id": pa.array([], pa.int64()),
                "canonical": pa.array([], pa.string()),
            }
        )
    types = batch.column("type").to_pylist()
    surfaces = batch.column("surface").to_pylist()
    return pa.table(
        {
            "type": pa.array(types, pa.string()),
            "surface": pa.array(surfaces, pa.string()),
            "node_id": pa.array(
                [node_id_of(t, s) for t, s in zip(types, surfaces)], pa.int64()
            ),
            "canonical": pa.array(surfaces, pa.string()),
        }
    )


def link_entities_distributed(
    mentions_ds, *, consolidate=None, distinct=None, num_partitions: int | None = None
):
    """mentions Dataset -> surface-map Dataset (type, surface, node_id,
    canonical) with NO driver-side universe: the documented scale path of
    :func:`link_entities` (same blocking + pair predicates; union-find
    replaced by :func:`label_propagation_components`; singleton surfaces
    bypass propagation through a left-anti join).

    Identical output to the driver path — a test asserts row-for-row
    equality — so the pipeline can switch on universe size without
    changing results.  ``distinct``: optionally a precomputed
    :func:`distinct_surfaces` result (skips the first shuffle);
    ``num_partitions`` overrides the locally-capped join partition count
    on a real cluster.
    """
    from ray.data.aggregate import Min

    n_part = num_partitions or _join_parts()
    if distinct is None:
        distinct = distinct_surfaces(mentions_ds)
    distinct = (
        distinct.map_batches(
            lambda b: (
                b.filter(pc.is_in(b.column("type"), pa.array(LINKED_TYPES)))
                if b.num_rows and "type" in b.column_names
                else pa.table(
                    {"type": pa.array([], pa.string()), "surface": pa.array([], pa.string())}
                )
            ).select(["type", "surface"]),
            batch_format="pyarrow",
        )
        .materialize()
    )

    edges = candidate_pair_edges(distinct).materialize()

    comp = label_propagation_components(edges)
    members = (
        edges.map_batches(_edge_member_rows, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("type", alias_name="type"), Min("surface", alias_name="surface"))
    )  # (node, type, surface) dedup — node key determines both
    def _label_part(batch: pa.Table, parts: int) -> pa.Table:
        if batch.num_rows == 0 or "label" not in batch.column_names:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "type": pa.array([], pa.string()),
                    "surface": pa.array([], pa.string()),
                    "label": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int32()),
                }
            )
        import numpy as np

        lab = np.asarray(batch.column("label").to_numpy(zero_copy_only=False), np.int64)
        return batch.append_column(
            "part", pa.array((lab % parts).astype(np.int32), pa.int32())
        )

    parts = _coarse_parts()
    clustered = (
        members.join(comp, join_type="inner", num_partitions=n_part, on=("node",))
        .map_batches(_label_part, fn_kwargs={"parts": parts}, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: _cluster_assign_partition(g, consolidate), batch_format="pyarrow"
        )
    )

    singles = distinct.join(
        members.select_columns(["type", "surface"]),
        join_type="left_anti",
        num_partitions=n_part,
        on=("type", "surface"),
    ).map_batches(_singleton_rows, batch_format="pyarrow")

    return clustered.union(singles)


# --------------------------------------------------------------------------
# D2 alternate blocking: sequential-window grouping over sorted surfaces
# (src/ollama_ner_extract_names.py:294-326)


def sequential_window_groups(
    names: list[str], window: int = 15
) -> list[list[str]]:
    """The reference's second grouping strategy, exactly: scan the SORTED
    name list; a group grows freely to ``window`` names; past that, the
    next name joins only while similar to the group's LAST name (D2
    thresholds); otherwise the group closes and a new one starts."""
    if not names:
        return []
    groups: list[list[str]] = []
    group = [names[0]]
    for current in names[1:]:
        if len(group) < window:
            group.append(current)
            continue
        if surfaces_similar(group[-1], current):
            group.append(current)
            continue
        groups.append(group)
        group = [current]
    groups.append(group)
    return groups


def sequential_window_pairs(distinct_ds, window: int = 15):
    """(type, surface) distinct rows -> similar-pair edges via sequential
    windows instead of LSH blocks: ``sort`` range-partitions the surfaces
    globally in order; each sorted block is scanned with the reference's
    run-capped grouping and every within-group pair is tested with the
    full merge rule.  Groups may split at block boundaries — the same
    arbitrary split the reference's own every-``window``-names cut makes,
    so recall semantics match in kind; the primary LSH blocking remains
    the default path."""

    def block_edges(batch: pa.Table) -> pa.Table:
        out_t: list[str] = []
        out_a: list[str] = []
        out_b: list[str] = []
        if batch.num_rows and "type" in batch.column_names:
            by_type: dict[str, list[str]] = {}
            for t, s in sorted(
                zip(batch.column("type").to_pylist(), batch.column("surface").to_pylist())
            ):
                if t in LINKED_TYPES:
                    by_type.setdefault(t, []).append(s)
            for t, names in by_type.items():
                for group in sequential_window_groups(names, window):
                    for i in range(len(group)):
                        for j in range(i + 1, len(group)):
                            if surfaces_match(group[i], group[j]):
                                out_t.append(t)
                                out_a.append(min(group[i], group[j]))
                                out_b.append(max(group[i], group[j]))
        return pa.table(
            {
                "type": pa.array(out_t, pa.string()),
                "a": pa.array(out_a, pa.string()),
                "b": pa.array(out_b, pa.string()),
            }
        )

    return distinct_ds.sort(["type", "surface"]).map_batches(
        block_edges, batch_format="pyarrow"
    )
