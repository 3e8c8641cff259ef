"""End-to-end KG-construction pipeline (the flagship).

Phases (each = one lazy Ray Dataset plan, resumable via lineage manifests):

  P1 mentions : pages -> segments -> tagger actor pool -> mentions Parquet
                (bucket-partitioned by hash(url))
  P2 triples  : pages -> segments -> relation extractor -> triples Parquet
  P3 linking  : mentions -> distinct surfaces -> LSH blocks -> pair test
                -> union-find -> cluster map (driver artifact, broadcast)
  P4 graph    : mentions + cluster map -> nodes Parquet
                triples  + cluster map -> edges Parquet (+ canonical triples)

The reference's equivalent lifecycle is E2 -> E3 of SURVEY §3
(run.py:14-27 then check_performance.py:32-91) with in-memory state and
JSON checkpoints; here every inter-phase artifact is Parquet and every
stage is a streaming Dataset transform.

``run_kg`` is INCREMENTAL over corpus appends (the Common-Crawl cadence:
a new snapshot lands as new Parquet files next to the old ones): the
per-page phases (P1 tagging — the dominant cost — and the P2 explodes)
record which input files each output GENERATION consumed and process only
new files into new ``g<k>`` subdirs, while the global aggregate phases
(P3 linking, P4 graph) fingerprint the full input snapshot and recompute
over the union.  Re-running after an append therefore costs
O(new pages) tagging + O(corpus) linking/graph, never O(corpus) model
inference.  Generalizes the reference's per-document skip-if-cached
(src/cache_data.py:15-16) to whole-corpus delta processing.
"""

from __future__ import annotations

import os

import pyarrow as pa

# Thread-safety shim: ray.data's path resolution tries
# ``from fsspec.implementations.http import HTTPFileSystem`` on every
# read/write.  In this environment that import always fails (no aiohttp) —
# single-threaded the ModuleNotFoundError is caught, but CONCURRENT failing
# imports race into a partially-initialized module that raises a plain
# ImportError instead, crashing thread-overlapped phase executions.  Plant
# a sentinel module so the import succeeds deterministically (the sentinel
# class matches no real filesystem, so behavior is unchanged).
try:  # pragma: no cover
    from fsspec.implementations.http import HTTPFileSystem as _HTTPFS  # noqa: F401
except Exception:  # pragma: no cover
    import sys as _sys
    import types as _types

    _mod = _types.ModuleType("fsspec.implementations.http")

    class _SentinelHTTPFileSystem:  # never instantiated
        pass

    _mod.HTTPFileSystem = _SentinelHTTPFileSystem
    _sys.modules["fsspec.implementations.http"] = _mod

from ..sources.corpus import cached_catalog, catalog_gazetteer
from ..stages.annotate import Annotator, explode_mentions_batch, explode_triples_batch
from ..stages.extract import extract_segments_batch
from ..stages.graph import build_nodes, canonical_triples
from ..stages.linking import link_entities
from ..state import lineage

CODE_VERSION = 7  # bump to invalidate all phase outputs (v7: xxhash buckets)

# ``linking_mode="auto"`` / ``rewrite_mode="auto"`` pick the scale paths
# (distributed label propagation / shuffle-join rewrites) when the distinct
# (type, surface) universe exceeds this, else the faster broadcast paths.
# Rationale: a CPython dict entry of (type, surface) -> (node_id, canonical)
# costs ~400-500 B, so 10^6 entries is ~0.5 GB on the driver AND in every
# worker that ray.gets the broadcast — the practical ceiling for "the map is
# the small side".  Outputs are identical across modes (tested), so the
# switch is purely an execution-strategy decision.
AUTO_DISTRIBUTED_THRESHOLD = 1_000_000


def _filter_buckets(batch: pa.Table, wanted: frozenset, n_buckets: int) -> pa.Table:
    import numpy as np

    buckets = lineage.url_buckets(batch.column("url"), n_buckets)
    mask = np.isin(buckets, np.fromiter(wanted, dtype=np.int32, count=len(wanted)))
    return batch.filter(pa.array(mask, pa.bool_()))


def _bucket_rows(table_dir: str) -> tuple[int, dict[int, int]]:
    import pyarrow.dataset as pads

    ds = pads.dataset(table_dir, partitioning="hive")
    per: dict[int, int] = {}
    total = 0
    for frag in ds.get_fragments():
        n = frag.count_rows()
        total += n
        # hive path .../bucket=N/file.parquet
        for part in frag.path.split(os.sep):
            if part.startswith("bucket="):
                b = int(part.split("=", 1)[1])
                per[b] = per.get(b, 0) + n
    return total, per


def _gen_tag(fp: str, gen_name: str, files: list[list]) -> str:
    """Identity of one generation's output: phase config + the exact
    source files it consumed.  Used both as the per-bucket completion
    marker inside the generation dir and as the downstream explode's
    staleness check."""
    return lineage.fingerprint({"fp": fp, "gen": gen_name, "files": files})


def _run_partitioned_phase(
    *,
    phase: str,
    out_dir: str,
    pages_path: str,
    fp: str,
    stage_cls,
    stage_kwargs: dict,
    n_buckets: int,
    concurrency,
    batch_size: int,
    resume: bool,
    override_num_blocks: int | None = None,
    stage_ray_remote_args: dict | None = None,
) -> str:
    """pages -> segments -> stage -> generation/bucket-partitioned Parquet
    (``<phase>/g<k>/bucket=<b>/``) with per-partition resume AND
    incremental appends.  Returns the table dir (readers consume the
    root; the ``g<k>`` level is not a hive key, so reads see only the
    ``bucket`` column, exactly as before).

    Generations make ``run_kg`` delta-incremental over corpus growth: the
    manifest records which input files each generation consumed
    (metadata snapshot, :func:`lineage.input_snapshot`); when the pages
    dir gains files, only the NEW files flow through the tagger into a
    new ``g<k>`` dir — the dominant cost (model inference per page) is
    never re-paid for already-tagged pages.  Any in-place change to a
    consumed file breaks the append-only assumption and forces a full
    rebuild.  Within a generation, per-bucket ``_COMPLETE`` markers are
    stamped after the generation's single write completes, so they
    resume only the narrow crash window between that write and the
    manifest write (and drive the unattributable-dir sweep); a crash
    MID-write re-pays the whole generation — true per-bucket streaming
    markers would need a custom datasink."""
    import ray.data

    table_dir = os.path.join(out_dir, phase)
    snapshot = lineage.input_snapshot(pages_path)
    if not snapshot:
        raise ValueError(
            f"no parquet input found under {pages_path!r} — "
            "check the pages path"
        )
    manifest = lineage.load_manifest(out_dir, phase) if resume else None
    if manifest is not None and manifest.get("fingerprint") != fp:
        manifest = None  # stale config/code
    if not resume and os.path.isdir(table_dir):
        lineage.invalidate(out_dir, phase, table_dir)
    generations: dict = dict(manifest.get("generations", {})) if manifest else {}
    delta: list | str = snapshot
    if generations:
        delta = lineage.snapshot_delta(generations, snapshot)
        if delta == "changed":  # a consumed input file mutated -> rebuild
            generations = {}
    if not generations:
        # manifest-only invalidation: completed bucket dirs stay on disk —
        # the per-bucket markers decide what is reusable (a marker only
        # matches when phase config AND the full source-file list match),
        # and the gen-dir sweep below drops everything unattributable
        lineage.invalidate(out_dir, phase)
        new_files = snapshot
        gen_id = 0
    else:
        if not delta:  # input unchanged -> phase complete
            return table_dir
        new_files = delta
        gen_id = len(generations)
    gen_name = f"g{gen_id}"
    gen_dir = os.path.join(table_dir, gen_name)
    gen_fp = _gen_tag(fp, gen_name, new_files)
    # drop output this run cannot attribute: ANY entry that is neither a
    # recorded complete generation nor the one being (re)built —
    # half-written gens under a LOST manifest, and pre-generation-layout
    # bucket dirs from older code versions.  Their source files reappear
    # in new_files, so keeping them would duplicate rows downstream.
    if os.path.isdir(table_dir):
        import shutil

        for name in os.listdir(table_dir):
            if name not in generations and name != gen_name:
                p = os.path.join(table_dir, name)
                shutil.rmtree(p, ignore_errors=True) if os.path.isdir(p) else os.remove(p)
    done = lineage.existing_buckets(gen_dir, gen_fp) if resume else set()
    missing = frozenset(range(n_buckets)) - done
    # partial writes from a mid-phase crash and stale-fingerprint orphans
    # must go before recompute — appending into them would duplicate rows
    lineage.drop_incomplete_buckets(gen_dir, keep=done)

    base = os.path.abspath(pages_path)
    paths = (
        [base]
        if os.path.isfile(base)
        else [os.path.join(base, rel) for rel, _size in new_files]
    )
    with lineage.PhaseTimer() as timer:
        if missing and paths:
            import ray

            if override_num_blocks is None:
                # local block sizing: Ray defaults to ~200 blocks regardless
                # of data size, which puts light stages in the
                # task-overhead-bound regime; but THIS phase is the heavy
                # one (~1.2 ms/page in the tagger), where finer tasks beat
                # wave quantization across the actor pool (64 blocks on 30
                # actors = 2.1 waves with straggler waste; measured 71.6s ->
                # 60.7s at 6 blocks/CPU on 1M pages).  Light downstream
                # reads use 2 blocks/CPU instead.
                override_num_blocks = 6 * int(ray.cluster_resources().get("CPU", 16))
            ds = ray.data.read_parquet(
                paths,
                columns=["url", "warc_ts", "html", "lang"],
                override_num_blocks=override_num_blocks,
            )
            if done:  # per-partition resume: recompute only missing buckets
                ds = ds.map_batches(
                    _filter_buckets,
                    fn_kwargs={"wanted": missing, "n_buckets": n_buckets},
                    batch_format="pyarrow",
                )
            ds = ds.map_batches(extract_segments_batch, batch_format="pyarrow")
            ds = ds.map_batches(
                stage_cls,
                fn_constructor_kwargs={**stage_kwargs, "n_buckets": n_buckets},
                concurrency=concurrency,
                batch_size=batch_size,
                batch_format="pyarrow",
                # execution-resource pass-through (e.g. num_gpus for a real
                # transformer tagger pool) — never fingerprinted: resources
                # change placement, not output
                **(stage_ray_remote_args or {}),
            )
            # cluster blocks by the partition key before the hive write:
            # without it every task writes a file per bucket it touches
            # (blocks x buckets tiny files — measured to poison EVERY
            # downstream read, even with override_num_blocks); with it the
            # file count is ~n_buckets and downstream explodes inherit the
            # clustering (so they need no shuffle of their own).
            #
            # STRATEGY (measured, see BASELINE.md "bucket clustering A/B"):
            # ``sort`` is a range shuffle on a low-cardinality int32 — the
            # sample pass is metadata-cheap and the exchange moves each row
            # once, same as a hash partition would.  Ray 2.49's key-hash
            # ``repartition(keys=["bucket"])`` requires the experimental
            # HASH_SHUFFLE strategy, which (a) measured 28x slower on a
            # standalone 2M-row exchange (103s vs 3.7s) and (b) LIVELOCKS
            # this pipeline outright at 8 and 32 CPUs (aggregator actors +
            # the annotator actor pool + backpressured reads starve each
            # other; 0 blocks flow for minutes — scripts/ab_bucket_cluster.py).
            # Sort stays the default; GRAFT_BUCKET_CLUSTER=hash re-measures
            # on future Ray versions.
            if os.environ.get("GRAFT_BUCKET_CLUSTER", "sort") == "hash":
                from ray.data.context import DataContext, ShuffleStrategy

                # the plan executes under the context CAPTURED at dataset
                # creation — flip the strategy there (and restore after, so
                # the experimental path never leaks into later phases)
                ctx = ds.context if hasattr(ds, "context") else DataContext.get_current()
                prev_strategy = ctx.shuffle_strategy
                ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
                try:
                    ds.repartition(n_buckets, keys=["bucket"], sort=False).write_parquet(
                        gen_dir, partition_cols=["bucket"]
                    )
                finally:
                    ctx.shuffle_strategy = prev_strategy
            else:
                ds.sort("bucket").write_parquet(gen_dir, partition_cols=["bucket"])
            lineage.mark_buckets_complete(gen_dir, gen_fp)

    generations[gen_name] = {"files": new_files, "tag": gen_fp}
    total, per = _bucket_rows(table_dir)
    lineage.write_manifest(
        out_dir, phase, fp, total, timer.wall, per,
        extra={
            "recomputed_buckets": sorted(missing),
            "n_buckets": n_buckets,
            "generations": generations,
        },
    )
    return table_dir


def _explode_phase(
    out_dir: str,
    phase: str,
    annotations_dir: str,
    explode_fn,
    fp: str,
    resume: bool,
    columns: list[str] | None = None,
) -> str:
    """annotations -> flat table via a stateless explode (whole-phase
    manifest; the artifact keeps the hive ``bucket`` partitioning).

    The annotations artifact is bucket-clustered on disk, and the explode
    preserves block order, so the hive write needs no shuffle; ``columns``
    prunes the read (each explode consumes only its own nested column).

    Mirrors the annotations artifact's GENERATIONS (incremental appends):
    each annotation gen explodes into its own ``g<k>`` subdir, keyed by the
    upstream gen's ``tag`` — an already-exploded gen is skipped, a gen
    whose upstream was rebuilt (tag change) is re-exploded, and a gen dir
    present on disk but not recorded done (mid-explode crash) is dropped
    and redone.  Explodes are cheap relative to tagging, so gen (not
    bucket) is the resume grain here."""
    import shutil

    import ray.data

    table_dir = os.path.join(out_dir, phase)
    ann_manifest = lineage.load_manifest(out_dir, "annotations") or {}
    ann_gens: dict = ann_manifest.get("generations", {})
    manifest = lineage.load_manifest(out_dir, phase) if resume else None
    if manifest is not None and manifest.get("fingerprint") != fp:
        manifest = None
    if not resume and os.path.isdir(table_dir):
        lineage.invalidate(out_dir, phase, table_dir)
    done: dict = dict(manifest.get("exploded_gens", {})) if manifest else {}
    # done maps gen name -> upstream tag it was exploded from
    done = {g: t for g, t in done.items() if ann_gens.get(g, {}).get("tag") == t}
    todo = [g for g in sorted(ann_gens, key=lambda n: int(n[1:])) if g not in done]
    if os.path.isdir(table_dir):
        # sweep anything not recorded done: partial gens from a crash AND
        # pre-generation-layout bucket dirs from older code versions
        for name in os.listdir(table_dir):
            if name not in done:
                p = os.path.join(table_dir, name)
                shutil.rmtree(p, ignore_errors=True) if os.path.isdir(p) else os.remove(p)
    if not todo and manifest is not None:
        return table_dir
    with lineage.PhaseTimer() as timer:
        import ray

        nblocks = 2 * int(ray.cluster_resources().get("CPU", 16))
        for g in todo:
            ds = ray.data.read_parquet(
                os.path.join(annotations_dir, g),
                columns=columns,
                override_num_blocks=nblocks,
            )
            ds = ds.map_batches(explode_fn, batch_format="pyarrow")
            ds.write_parquet(os.path.join(table_dir, g), partition_cols=["bucket"])
            done[g] = ann_gens[g]["tag"]
    total, per = _bucket_rows(table_dir)
    lineage.write_manifest(
        out_dir, phase, fp, total, timer.wall, per, extra={"exploded_gens": done}
    )
    return table_dir


def run_kg(
    pages_path: str,
    out_dir: str,
    *,
    gazetteer: list[tuple[str, str]] | None = None,
    seed: int = 42,
    n_per_type: int = 25,
    n_buckets: int = 16,
    concurrency=None,
    batch_size: int = 1024,
    resume: bool = True,
    override_num_blocks: int | None = None,
    linking_mode: str = "auto",
    rewrite_mode: str = "auto",
    auto_threshold: int = AUTO_DISTRIBUTED_THRESHOLD,
    tagger_ray_remote_args: dict | None = None,
    extra_patterns: list[tuple[str, str]] | None = None,
) -> dict:
    """Run the full pipeline; returns artifact paths + stats.

    ``gazetteer`` defaults to the synthetic catalog's (the deterministic
    stand-in for model weights — at real scale this argument is a model
    name and the tagger stage loads it per actor).

    ``linking_mode``: ``"driver"`` closes connected components on the
    driver (exact, right up to ~10^7 distinct surfaces); ``"distributed"``
    runs the label-propagation path (stages/linking.py
    ``link_entities_distributed``) whose surface map never touches the
    driver until the P4 broadcast — identical output by construction
    (tests assert row equality).

    ``rewrite_mode``: ``"broadcast"`` ships the finished surface map once
    via ``ray.put`` and rewrites with dict lookups (the small-side
    assumption — right up to maps of ~10^7 entries); ``"join"`` rewrites
    mentions and triples through hash-shuffle ``Dataset.join``s against
    the surface-map PARQUET (stages/graph.py ``canonical_triples_join`` /
    ``build_nodes_join``) — with ``linking_mode="distributed"`` the map
    then never exists on the driver at all.  Identical outputs (tested).

    Both default to ``"auto"``: the pipeline counts the distinct
    (type, surface) universe (the cheap first shuffle linking needs
    anyway, computed once and reused) and picks the scale paths when it
    exceeds ``auto_threshold`` (:data:`AUTO_DISTRIBUTED_THRESHOLD`), else
    the broadcast fast paths — so a 100x-scale run gets the right plan
    without flag knowledge, and small corpora keep the low-latency path."""
    import ray
    import ray.data

    if gazetteer is None:
        gazetteer = catalog_gazetteer(cached_catalog(seed, n_per_type))
    if concurrency is None:
        # size the actor pool to the session: leave headroom for the
        # upstream read/extract tasks so no stage starves the others
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)

    os.makedirs(out_dir, exist_ok=True)
    base_fp = {
        "pages": os.path.abspath(pages_path),
        "code": CODE_VERSION,
        "gazetteer": lineage.fingerprint({"g": sorted(gazetteer)}),
        "n_buckets": n_buckets,
        "extra_patterns": sorted(extra_patterns or []),
    }

    # P1: one tagging pass -> nested per-segment annotations (bucketed)
    annotations_dir = _run_partitioned_phase(
        phase="annotations",
        out_dir=out_dir,
        pages_path=pages_path,
        fp=lineage.fingerprint({**base_fp, "phase": "annotations"}),
        stage_cls=Annotator,
        stage_kwargs={
            "gazetteer": gazetteer,
            "use_windows": True,
            "extra_patterns": extra_patterns,
        },
        n_buckets=n_buckets,
        concurrency=concurrency,
        batch_size=batch_size,
        resume=resume,
        override_num_blocks=override_num_blocks,
        stage_ray_remote_args=tagger_ray_remote_args,
    )

    # P2: flat mentions / triples tables = cheap explode projections.
    # The two datasets are independent -> submit from two driver threads so
    # their Ray executions overlap (halves this phase's fixed latency).
    # In-thread dataset construction is safe HERE because the module-top
    # fsspec shim pre-imports the one lazy module that races; P4 still
    # builds its plans on the main thread to also serialize DataContext
    # capture for its strategy-flipping experiment path.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        mentions_fut = pool.submit(
            _explode_phase, out_dir, "mentions", annotations_dir,
            explode_mentions_batch,
            lineage.fingerprint({**base_fp, "phase": "mentions"}), resume,
            ["url", "seg_id", "lang", "seg_offset", "mentions", "bucket"],
        )
        triples_fut = pool.submit(
            _explode_phase, out_dir, "triples", annotations_dir,
            explode_triples_batch,
            lineage.fingerprint({**base_fp, "phase": "triples"}), resume,
            ["url", "seg_id", "triples", "bucket"],
        )
        mentions_dir = mentions_fut.result()
        triples_dir = triples_fut.result()

    # P3: linking — the cluster map is itself a checkpointed Parquet artifact.
    # Fingerprints use the REQUESTED mode strings (incl. "auto"): the modes
    # are execution strategies with identical outputs (tested), so an auto
    # resolution flip never silently invalidates a sound artifact.
    # Linking and graph are GLOBAL aggregates, so (unlike the per-page
    # phases, which absorb appends as delta generations) their
    # fingerprints include the full input-content snapshot: any corpus
    # growth recomputes them — over mentions/triples that were only
    # delta-tagged upstream.
    snap_fp = lineage.fingerprint({"files": lineage.input_snapshot(pages_path)})
    fp_link = lineage.fingerprint(
        {**base_fp, "phase": "linking", "mode": linking_mode, "pages_snap": snap_fp}
    )
    surface_map_dir = os.path.join(out_dir, "surface_map")

    def _load_map():
        import pyarrow.parquet as pq

        smt = pq.read_table(surface_map_dir)
        return {
            (t, s): (nid, canon)
            for t, s, nid, canon in zip(
                smt.column("type").to_pylist(),
                smt.column("surface").to_pylist(),
                smt.column("node_id").to_pylist(),
                smt.column("canonical").to_pylist(),
            )
        }

    resolved_rewrite = rewrite_mode
    resolved_linking = linking_mode
    with lineage.PhaseTimer() as t_link:
        if resume and lineage.phase_complete(out_dir, "linking", fp_link):
            import pyarrow.dataset as pads

            n_surfaces = pads.dataset(surface_map_dir).count_rows()
            # resolve modes from the SAME measure a fresh run uses (the
            # distinct count stored in the manifest); fall back to the
            # surface-map row count for manifests from older runs
            _m = lineage.load_manifest(out_dir, "linking") or {}
            _nd = _m.get("n_distinct", n_surfaces)
            if resolved_linking == "auto":
                resolved_linking = "distributed" if _nd > auto_threshold else "driver"
            if resolved_rewrite == "auto":
                resolved_rewrite = "join" if _nd > auto_threshold else "broadcast"
            cluster_map = None  # loaded lazily below, only if P4 needs it
        else:
            import shutil

            import pyarrow.parquet as pq

            # drop the manifest BEFORE the artifact: a crash mid-rebuild
            # must never leave a complete-looking manifest over a partial
            # or deleted surface map (the per-page phases already follow
            # this invalidate-then-rebuild order)
            lineage.invalidate(out_dir, "linking")
            shutil.rmtree(surface_map_dir, ignore_errors=True)
            # prune at the read: linking consumes only (type, surface)
            mentions_ds = ray.data.read_parquet(
                mentions_dir,
                columns=["type", "surface"],
                override_num_blocks=2 * int(ray.cluster_resources().get("CPU", 16)),
            )
            distinct = None
            n_distinct = None
            if linking_mode == "auto" or rewrite_mode == "auto":
                from ..stages.linking import distinct_surfaces

                # the distinct agg is linking's own first shuffle — compute
                # it once, read its count, and hand the materialized result
                # to whichever path wins (no duplicated work)
                distinct = distinct_surfaces(mentions_ds)
                n_distinct = distinct.count()
                if linking_mode == "auto":
                    resolved_linking = (
                        "distributed" if n_distinct > auto_threshold else "driver"
                    )
                if rewrite_mode == "auto":
                    resolved_rewrite = "join" if n_distinct > auto_threshold else "broadcast"
            if resolved_linking == "distributed":
                from ..stages.linking import link_entities_distributed

                # surface map written straight from the Dataset; the dict
                # below is only the P4 broadcast side (small by definition
                # of "broadcastable"; beyond that P4 shuffle-joins instead)
                link_entities_distributed(mentions_ds, distinct=distinct).write_parquet(
                    surface_map_dir
                )
                if resolved_rewrite == "join":
                    # the map never lands on the driver: P4 joins read the
                    # parquet; count is metadata-only
                    import pyarrow.dataset as pads

                    cluster_map = None
                    n_surfaces = pads.dataset(surface_map_dir).count_rows()
                else:
                    cluster_map = _load_map()
                    n_surfaces = len(cluster_map)
            else:
                cluster_map, n_surfaces = link_entities(mentions_ds, distinct=distinct)
                os.makedirs(surface_map_dir, exist_ok=True)
                keys = sorted(cluster_map)
                pq.write_table(
                    pa.table(
                        {
                            "type": pa.array([k[0] for k in keys], pa.string()),
                            "surface": pa.array([k[1] for k in keys], pa.string()),
                            "node_id": pa.array([cluster_map[k][0] for k in keys], pa.int64()),
                            "canonical": pa.array([cluster_map[k][1] for k in keys], pa.string()),
                        }
                    ),
                    os.path.join(surface_map_dir, "part-0.parquet"),
                )
    if not (resume and lineage.phase_complete(out_dir, "linking", fp_link)):
        extra = (
            {"clusters": len({v[0] for v in cluster_map.values()})}
            if cluster_map is not None
            else {}
        )
        if n_distinct is not None:
            extra["n_distinct"] = n_distinct
        lineage.write_manifest(out_dir, "linking", fp_link, n_surfaces, t_link.wall, extra=extra)

    # P4: graph materialize
    fp_graph = lineage.fingerprint(
        {
            **base_fp,
            "phase": "graph",
            "rewrite": rewrite_mode,
            "linking": linking_mode,
            "pages_snap": snap_fp,
        }
    )
    nodes_dir = os.path.join(out_dir, "nodes")
    edges_dir = os.path.join(out_dir, "edges")
    canon_dir = os.path.join(out_dir, "triples_canonical")
    recomputed_graph = not (resume and lineage.phase_complete(out_dir, "graph", fp_graph))
    # the broadcast map is needed only when P4 actually rebuilds on the
    # broadcast path — a fully-cached rerun (or the join path) must not
    # pay the dict load + object-store copy
    if recomputed_graph and resolved_rewrite != "join" and cluster_map is None:
        cluster_map = _load_map()
    cluster_map_ref = (
        ray.put(cluster_map)
        if (cluster_map is not None and recomputed_graph and resolved_rewrite != "join")
        else None
    )
    with lineage.PhaseTimer() as t_graph:
        if recomputed_graph:
            import shutil

            # drop the manifest BEFORE the artifacts (see the P3 note): a
            # crash mid-rebuild must never leave a complete-looking graph
            # manifest over deleted/partial nodes/edges
            lineage.invalidate(out_dir, "graph")
            for d in (nodes_dir, edges_dir, canon_dir):
                shutil.rmtree(d, ignore_errors=True)
            # nodes and the canonical-triples rewrite are independent ->
            # overlap them (plans built on the main thread: dataset
            # construction is not thread-safe, fsspec lazy imports race)
            from concurrent.futures import ThreadPoolExecutor

            nblocks = 2 * int(ray.cluster_resources().get("CPU", 16))
            mentions_read = ray.data.read_parquet(
                mentions_dir,
                columns=["type", "surface", "url"],
                override_num_blocks=nblocks,
            )
            triples_read = ray.data.read_parquet(triples_dir, override_num_blocks=nblocks)
            if resolved_rewrite == "join":
                from ..stages.graph import build_nodes_join, canonical_triples_join

                def sm_read():
                    return ray.data.read_parquet(surface_map_dir)

                plans = [
                    (build_nodes_join(mentions_read, sm_read()), nodes_dir),
                    (canonical_triples_join(triples_read, sm_read()), canon_dir),
                ]
            else:
                plans = [
                    (build_nodes(mentions_read, cluster_map_ref), nodes_dir),
                    (canonical_triples(triples_read, cluster_map_ref), canon_dir),
                ]
            with ThreadPoolExecutor(max_workers=2) as pool:
                futures = [pool.submit(ds.write_parquet, path) for ds, path in plans]
                for f in futures:
                    f.result()
            # edges derive from the canonical table (node ids already
            # resolved there) — no second broadcast-map pass over triples
            from ..stages.graph import build_edges_from_canonical

            build_edges_from_canonical(
                ray.data.read_parquet(
                    canon_dir,
                    columns=[
                        "src_id", "pred", "dst_id",
                        "subj_canonical", "obj_canonical", "url",
                    ],
                    override_num_blocks=nblocks,
                )
            ).write_parquet(edges_dir)
    if recomputed_graph:
        import pyarrow.dataset as pads

        n_nodes = pads.dataset(nodes_dir).count_rows()
        n_edges = pads.dataset(edges_dir).count_rows()
        extra = {"nodes": n_nodes, "edges": n_edges, "distinct_surfaces": n_surfaces}
        if cluster_map is not None:
            extra["clusters"] = len({v[0] for v in cluster_map.values()})
        lineage.write_manifest(
            out_dir, "graph", fp_graph, n_nodes + n_edges, t_graph.wall, extra=extra
        )

    m = lineage.load_manifest(out_dir, "graph") or {}
    return {
        "mentions": mentions_dir,
        "surface_map": surface_map_dir,
        "triples": triples_dir,
        "triples_canonical": canon_dir,
        "nodes": nodes_dir,
        "edges": edges_dir,
        "n_nodes": m.get("nodes"),
        "n_edges": m.get("edges"),
        "distinct_surfaces": n_surfaces,
        "link_wall_sec": round(t_link.wall, 3),
        "resolved_linking_mode": resolved_linking,
        "resolved_rewrite_mode": resolved_rewrite,
    }


def main(argv: list[str] | None = None) -> None:
    """CLI entry (``ray job submit -- python -m
    pdf_entity_extraction_ray.pipelines.kg <pages_dir> <out_dir>``)."""
    import argparse
    import json

    parser = argparse.ArgumentParser(description="Run the KG pipeline")
    parser.add_argument("pages", help="pages Parquet dir")
    parser.add_argument("out", help="output dir")
    parser.add_argument("--n-buckets", type=int, default=16)
    parser.add_argument("--batch-size", type=int, default=1024)
    parser.add_argument("--no-resume", action="store_true")
    args = parser.parse_args(argv)

    import ray

    if not ray.is_initialized():  # the job submitter may have initialised
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)
    result = run_kg(
        args.pages,
        args.out,
        n_buckets=args.n_buckets,
        batch_size=args.batch_size,
        resume=not args.no_resume,
    )
    print(json.dumps(result))
    ray.shutdown()


if __name__ == "__main__":
    main()
