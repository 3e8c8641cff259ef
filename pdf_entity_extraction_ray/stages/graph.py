"""Stage 5: graph materialization — nodes / edges Parquet tables.

The Ray-native rendering of the reference's merged EntitiesDict
(src/ollama_entity_extraction/data_model/EntitiesDict.py:27-32: alias
mention lists folded under a representative surface) plus the new
triples->edges rewrite the north_rule requires.

Both rewrites read the broadcast cluster map (``ray.put`` once, zero-copy
``ray.get`` inside each task via the object-ref-in-closure pattern) — a
broadcast hash join, NOT a shuffle join: the map is the small side by
construction (distinct linked surfaces).

Aggregations are two-stage (per-batch partial combine inside
``map_batches``, then a small ``groupby`` reduce) so the shuffle moves one
row per (node) / (src, pred, dst) per block instead of one per mention —
the head-entity-skew treatment from SURVEY §4.
"""

from __future__ import annotations


import pyarrow as pa

from .linking import LINKED_TYPES, node_id_of

# urls/aliases per node are capped in the materialized table (a country
# appearing on 10^9 pages must not produce a 10^9-element list cell)
MAX_URLS_PER_NODE = 20
MAX_ALIASES_PER_NODE = 64
MAX_URLS_PER_EDGE = 10

NODES_SCHEMA = pa.schema(
    [
        ("node_id", pa.int64()),
        ("canonical", pa.string()),
        ("type", pa.string()),
        ("aliases", pa.list_(pa.string())),
        ("n_mentions", pa.int64()),
        ("n_urls", pa.int64()),
        ("urls_sample", pa.list_(pa.string())),
    ]
)

EDGES_SCHEMA = pa.schema(
    [
        ("src_id", pa.int64()),
        ("src_canonical", pa.string()),
        ("pred", pa.string()),
        ("dst_id", pa.int64()),
        ("dst_canonical", pa.string()),
        ("weight", pa.int64()),
        ("urls_sample", pa.list_(pa.string())),
    ]
)


def resolve(cluster_map: dict, typ: str, surface: str, obj_norm: str = "") -> tuple[int, str]:
    """(type, surface) -> (node_id, canonical).

    DATE entities canonicalize by parsed ISO value (obj_norm) — the
    deterministic analog of the reference's dateparser normalization
    (src/methods/DateParser.py:44-50); unresolved surfaces fall back to a
    singleton node (never invent, never drop)."""
    if typ == "DATE":
        canon = obj_norm or surface
        return node_id_of("DATE", canon), canon
    hit = cluster_map.get((typ, surface))
    if hit is not None:
        return hit
    return node_id_of(typ, surface), surface


# --------------------------------------------------------------------------
# nodes


def node_partials_batch(batch: pa.Table, cluster_map: dict) -> pa.Table:
    """mentions batch -> partial per-node aggregates (pure fn form)."""
    acc: dict[int, dict] = {}
    for typ, surface, url in zip(
        batch.column("type").to_pylist(),
        batch.column("surface").to_pylist(),
        batch.column("url").to_pylist(),
    ):
        if typ not in LINKED_TYPES:
            continue
        nid, canon = resolve(cluster_map, typ, surface)
        a = acc.setdefault(
            nid, {"canonical": canon, "type": typ, "aliases": set(), "n": 0, "urls": set()}
        )
        a["aliases"].add(surface)
        a["n"] += 1
        if len(a["urls"]) < MAX_URLS_PER_NODE:
            a["urls"].add(url)
    return pa.table(
        {
            "node_id": pa.array(list(acc), pa.int64()),
            "canonical": pa.array([a["canonical"] for a in acc.values()], pa.string()),
            "type": pa.array([a["type"] for a in acc.values()], pa.string()),
            "aliases": pa.array([sorted(a["aliases"]) for a in acc.values()], pa.list_(pa.string())),
            "n_mentions": pa.array([a["n"] for a in acc.values()], pa.int64()),
            "urls": pa.array([sorted(a["urls"]) for a in acc.values()], pa.list_(pa.string())),
        }
    )


def node_final_merge(group: pa.Table) -> pa.Table:
    """Reduce partial node rows for one node_id -> one NODES_SCHEMA row."""
    aliases: set[str] = set()
    urls: set[str] = set()
    n = 0
    for row_aliases in group.column("aliases").to_pylist():
        aliases.update(row_aliases)
    for row_urls in group.column("urls").to_pylist():
        urls.update(row_urls)
    for row_n in group.column("n_mentions").to_pylist():
        n += row_n
    return pa.table(
        {
            "node_id": pa.array([group.column("node_id")[0].as_py()], pa.int64()),
            "canonical": pa.array([group.column("canonical")[0].as_py()], pa.string()),
            "type": pa.array([group.column("type")[0].as_py()], pa.string()),
            "aliases": pa.array([sorted(aliases)[:MAX_ALIASES_PER_NODE]], pa.list_(pa.string())),
            "n_mentions": pa.array([n], pa.int64()),
            "n_urls": pa.array([len(urls)], pa.int64()),
            "urls_sample": pa.array([sorted(urls)[:MAX_URLS_PER_NODE]], pa.list_(pa.string())),
        }
    )


def build_nodes(mentions_ds, cluster_map_ref):
    """mentions Dataset + broadcast cluster map -> nodes Dataset."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        return node_partials_batch(batch, ray.get(cluster_map_ref))

    return (
        mentions_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("node_id")
        .map_groups(node_final_merge, batch_format="pyarrow")
    )


# --------------------------------------------------------------------------
# edges


def edge_partials_batch(batch: pa.Table, cluster_map: dict) -> pa.Table:
    """triples batch -> partial per-(src, pred, dst) aggregates."""
    acc: dict[tuple[int, str, int], dict] = {}
    for subj, subj_type, pred, obj, obj_type, obj_norm, url in zip(
        batch.column("subj").to_pylist(),
        batch.column("subj_type").to_pylist(),
        batch.column("pred").to_pylist(),
        batch.column("obj").to_pylist(),
        batch.column("obj_type").to_pylist(),
        batch.column("obj_norm").to_pylist(),
        batch.column("url").to_pylist(),
    ):
        src_id, src_canon = resolve(cluster_map, subj_type, subj)
        dst_id, dst_canon = resolve(cluster_map, obj_type, obj, obj_norm)
        key = (src_id, pred, dst_id)
        a = acc.setdefault(
            key, {"src_canonical": src_canon, "dst_canonical": dst_canon, "w": 0, "urls": set()}
        )
        a["w"] += 1
        if len(a["urls"]) < MAX_URLS_PER_EDGE:
            a["urls"].add(url)
    return pa.table(
        {
            "src_id": pa.array([k[0] for k in acc], pa.int64()),
            "pred": pa.array([k[1] for k in acc], pa.string()),
            "dst_id": pa.array([k[2] for k in acc], pa.int64()),
            "src_canonical": pa.array([a["src_canonical"] for a in acc.values()], pa.string()),
            "dst_canonical": pa.array([a["dst_canonical"] for a in acc.values()], pa.string()),
            "weight": pa.array([a["w"] for a in acc.values()], pa.int64()),
            "urls": pa.array([sorted(a["urls"]) for a in acc.values()], pa.list_(pa.string())),
        }
    )


def edge_final_merge(group: pa.Table) -> pa.Table:
    urls: set[str] = set()
    weight = 0
    for row_urls in group.column("urls").to_pylist():
        urls.update(row_urls)
    for w in group.column("weight").to_pylist():
        weight += w
    return pa.table(
        {
            "src_id": pa.array([group.column("src_id")[0].as_py()], pa.int64()),
            "src_canonical": pa.array([group.column("src_canonical")[0].as_py()], pa.string()),
            "pred": pa.array([group.column("pred")[0].as_py()], pa.string()),
            "dst_id": pa.array([group.column("dst_id")[0].as_py()], pa.int64()),
            "dst_canonical": pa.array([group.column("dst_canonical")[0].as_py()], pa.string()),
            "weight": pa.array([weight], pa.int64()),
            "urls_sample": pa.array([sorted(urls)[:MAX_URLS_PER_EDGE]], pa.list_(pa.string())),
        }
    )


def build_edges(triples_ds, cluster_map_ref):
    """triples Dataset + broadcast cluster map -> edges Dataset."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        return edge_partials_batch(batch, ray.get(cluster_map_ref))

    return (
        triples_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["src_id", "pred", "dst_id"])
        .map_groups(edge_final_merge, batch_format="pyarrow")
    )


def canonical_triples(triples_ds, cluster_map_ref):
    """triples Dataset -> triples with canonical subj/obj columns added
    (the table the P/R evaluation consumes)."""
    import ray

    def rewrite(batch: pa.Table) -> pa.Table:
        cluster_map = ray.get(cluster_map_ref)
        subj_canon: list[str] = []
        obj_canon: list[str] = []
        for subj, subj_type, obj, obj_type, obj_norm in zip(
            batch.column("subj").to_pylist(),
            batch.column("subj_type").to_pylist(),
            batch.column("obj").to_pylist(),
            batch.column("obj_type").to_pylist(),
            batch.column("obj_norm").to_pylist(),
        ):
            _, sc = resolve(cluster_map, subj_type, subj)
            _, oc = resolve(cluster_map, obj_type, obj, obj_norm)
            subj_canon.append(sc)
            obj_canon.append(oc)
        return batch.append_column("subj_canonical", pa.array(subj_canon, pa.string())).append_column(
            "obj_canonical", pa.array(obj_canon, pa.string())
        )

    return triples_ds.map_batches(rewrite, batch_format="pyarrow")
