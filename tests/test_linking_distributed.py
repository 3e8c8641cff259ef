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


def test_propagation_converges_past_25_rounds_by_default():
    """Default max_iters=None runs to convergence: a chain of diameter 60
    (would under-merge at the old cap of 25) fully merges."""
    import pyarrow as pa
    import ray.data

    from pdf_entity_extraction_ray.stages.linking import components_from_int_edges

    n = 60
    edges = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(list(range(n)), pa.int64()),
                "b": pa.array(list(range(1, n + 1)), pa.int64()),
            }
        )
    )
    out = {r["node"]: r["label"] for r in components_from_int_edges(edges).take_all()}
    assert set(out.values()) == {0}  # single fully-merged component


def test_explicit_cap_warns_on_non_convergence():
    import warnings

    import pyarrow as pa
    import ray.data

    from pdf_entity_extraction_ray.stages.linking import components_from_int_edges

    n = 30
    edges = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(list(range(n)), pa.int64()),
                "b": pa.array(list(range(1, n + 1)), pa.int64()),
            }
        )
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = {r["node"]: r["label"]
               for r in components_from_int_edges(edges, max_iters=3).take_all()}
    assert any("max_iters" in str(x.message) for x in w)
    assert len(set(out.values())) > 1  # refinement, not converged


def test_duplicate_surface_rows_never_self_pair():
    """candidate_pair_edges on a NON-distinct input must not emit (s, s)
    self-edges nor let duplicate rows trip the MAX_BLOCK cap."""
    import pyarrow as pa
    import ray.data

    from pdf_entity_extraction_ray.stages.linking import candidate_pair_edges

    rows = [("PERSON", "John Smith")] * 5 + [("PERSON", "John Smith Jr")] * 5
    ds = ray.data.from_arrow(
        pa.table(
            {
                "type": pa.array([r[0] for r in rows], pa.string()),
                "surface": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    edges = candidate_pair_edges(ds).take_all()
    assert edges, "the subset-rule pair must survive"
    assert all(r["a"] != r["b"] for r in edges)
    assert all(r["a"] < r["b"] for r in edges)
