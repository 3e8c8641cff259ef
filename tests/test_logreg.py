"""Distributed IRLS logistic regression (ops/logreg) — distributed ==
single-process gold mirror, parallelism invariance, and fit sanity."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from pdf_entity_extraction_ray.ops.logreg import (
    FEATURES,
    _design_matrix,
    logreg_reference,
    logreg_score,
    train_logreg,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    return ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def _sorted(ds) -> pa.Table:
    tbl = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("doc_id", "ascending")]))


def test_distributed_matches_reference(docs_ds):
    coefs = train_logreg(docs_ds)
    gold_c, gold_s = logreg_reference(f"{SF}/documents.parquet")
    assert coefs.equals(gold_c)
    assert _sorted(logreg_score(docs_ds, coefs)).equals(gold_s)


def test_parallelism_invariance(ray_session):
    tables = [
        train_logreg(
            ray.data.read_parquet(
                f"{SF}/documents.parquet",
                columns=["doc_id", "text"],
                override_num_blocks=nb,
            )
        )
        for nb in (2, 5)
    ]
    assert tables[0].equals(tables[1])


def test_fit_separates_the_label(docs_ds):
    """The rule labels are (near-)separable on the features; the ridge
    fit should still classify the training rows almost perfectly."""
    coefs = train_logreg(docs_ds)
    scored = _sorted(logreg_score(docs_ds, coefs))
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("doc_id", "ascending")]))
    _, y = _design_matrix(tbl)
    pred = scored.column("pred").to_pylist()
    acc = sum(int(p == bool(t)) for p, t in zip(pred, y)) / len(y)
    # ridge damping blurs the hard n_tokens>=50 decision boundary a little
    assert acc >= 0.9, acc
    # both classes must be present — the label rule is balanced by design
    assert 0.1 < sum(pred) / len(pred) < 0.9


def test_coef_schema():
    gold_c, gold_s = logreg_reference(f"{SF}/documents.parquet")
    assert gold_c.column("feature").to_pylist() == list(FEATURES)
    assert gold_c.schema.field("coef_ppm").type == pa.int64()
    assert gold_s.schema.field("score_ppm").type == pa.int64()
