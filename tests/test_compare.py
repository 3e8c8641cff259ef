"""Model-comparison workflow (check_ner_models analog): multiple registry
taggers over the same pages, scored against gold with count-only joins."""

import pytest

from pdf_entity_extraction_ray.pipelines.compare import compare_taggers


def test_compare_ranks_full_vs_degraded_gazetteer(small_corpus):
    """The full gazetteer must score P=R=1.0; a gazetteer stripped of GPE
    and LAW entries must lose recall while keeping precision (it only ever
    tags true surfaces)."""
    from pdf_entity_extraction_ray.sources.corpus import catalog_gazetteer, make_catalog

    gaz = catalog_gazetteer(make_catalog(42, 25))
    degraded = [(s, t) for s, t in gaz if t not in ("GPE", "LAW")]

    table = compare_taggers(
        f"{small_corpus}/pages",
        f"{small_corpus}/gold_mentions",
        {
            "full-gazetteer": ("gazetteer", {"gazetteer": gaz}),
            "no-gpe-law": ("gazetteer", {"gazetteer": degraded}),
        },
        concurrency=2,
    )
    rows = {r["model"]: r for r in table.to_pylist()}
    full, deg = rows["full-gazetteer"], rows["no-gpe-law"]

    assert full["precision"] == pytest.approx(1.0)
    assert full["recall"] == pytest.approx(1.0)
    assert full["n_pred"] == full["n_gold"]

    assert deg["precision"] == pytest.approx(1.0)  # never invents surfaces
    assert deg["recall"] < 0.9                      # missing two whole types
    assert deg["n_pred"] < full["n_pred"]
    assert deg["n_gold"] == full["n_gold"]
