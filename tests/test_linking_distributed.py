"""Distributed linking (label-propagation connected components).

The driver union-find path (stages/linking.py ``link_entities``) is exact;
the distributed path must produce IDENTICAL (type, surface) -> (node_id,
canonical) assignments so the pipeline can switch on universe size without
changing results.  A stress test drives the propagation over a synthetic
edge set far larger than anything the small corpus produces.
"""

import pyarrow as pa
import ray.data

from pdf_entity_extraction_ray.stages.extract import extract_segments_batch
from pdf_entity_extraction_ray.stages.linking import (
    label_propagation_components,
    link_entities,
    link_entities_distributed,
)
from pdf_entity_extraction_ray.stages.tagger import GazetteerTagger


def _mentions_ds(small_corpus):
    from pdf_entity_extraction_ray.sources.corpus import catalog_gazetteer, make_catalog

    gaz = catalog_gazetteer(make_catalog(42, 25))
    return (
        ray.data.read_parquet(f"{small_corpus}/pages")
        .map_batches(extract_segments_batch, batch_format="pyarrow")
        .map_batches(_tag_batch_fn(gaz), batch_format="pyarrow")
    )


def _tag_batch_fn(gaz):
    from pdf_entity_extraction_ray.stages.tagger import TITLE_CASED_TYPES

    def tag(batch: pa.Table) -> pa.Table:
        tagger = GazetteerTagger(gaz)
        types, surfaces = [], []
        for text in batch.column("text").to_pylist():
            for span in tagger.tag_segment(text):
                s = span["text"]
                if span["entity_label"] in TITLE_CASED_TYPES:
                    s = s.title()
                types.append(span["entity_label"])
                surfaces.append(s)
        return pa.table(
            {"type": pa.array(types, pa.string()), "surface": pa.array(surfaces, pa.string())}
        )

    return tag


def test_distributed_matches_driver_path(small_corpus):
    mentions = _mentions_ds(small_corpus)
    cluster_map, n_surfaces = link_entities(mentions)

    sm_ds = link_entities_distributed(mentions)
    got = {}
    for b in sm_ds.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0 or "type" not in b.column_names:
            continue
        for t, s, nid, canon in zip(
            b.column("type").to_pylist(),
            b.column("surface").to_pylist(),
            b.column("node_id").to_pylist(),
            b.column("canonical").to_pylist(),
        ):
            got[(t, s)] = (nid, canon)
    assert len(got) == n_surfaces
    assert got == cluster_map


def test_label_propagation_stress_many_components():
    """1.5*10^5 nodes in 5*10^4 chains of length 3 — a surface universe far
    beyond what should ever be collected to the driver (and well past the
    edge counts the small corpus produces).  Each chain must collapse to
    exactly one component labeled by its minimum member key."""
    from pdf_entity_extraction_ray.stages.linking import node_id_of

    n_chains, chain_len = 50_000, 3

    def make_edges(batch: dict) -> pa.Table:
        types, a, b = [], [], []
        for cid in batch["id"].tolist():
            for j in range(chain_len - 1):
                types.append("PERSON")
                a.append(f"s{cid}_{j}")
                b.append(f"s{cid}_{j + 1}")
        return pa.table(
            {
                "type": pa.array(types, pa.string()),
                "a": pa.array(a, pa.string()),
                "b": pa.array(b, pa.string()),
            }
        )

    edges = ray.data.range(n_chains, override_num_blocks=16).map_batches(
        make_edges, batch_format="numpy"
    )
    labels = label_propagation_components(edges, max_iters=chain_len + 2, num_partitions=4)

    n_rows = 0
    roots = set()
    for b in labels.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0 or "label" not in b.column_names:
            continue
        n_rows += b.num_rows
        roots.update(b.column("label").to_pylist())
    assert n_rows == n_chains * chain_len
    assert len(roots) == n_chains
    # every root is the minimum node key of its own chain
    expected = {
        min(node_id_of("PERSON", f"s{cid}_{j}") for j in range(chain_len))
        for cid in range(n_chains)
    }
    assert roots == expected
