"""A8 analog: char_wb TF-IDF pair features + broadcast linear scorer."""

import pyarrow as pa
import ray.data

from pdf_entity_extraction_ray.ops.pairscore import (
    char_wb_ngrams,
    pair_vector,
    score_candidate_pairs,
    train_char_idf,
    train_pair_scorer,
)


def test_char_wb_matches_sklearn_semantics():
    """The documented sklearn example: char_wb (5,5) on 'jumpy fox' pads
    words and never crosses boundaries."""
    assert char_wb_ngrams("jumpy fox", 5, 5) == [" jump", "jumpy", "umpy ", " fox "]
    # short word emitted once, as the padded token prefix
    assert char_wb_ngrams("ox", 4, 4) == [" ox "]
    assert char_wb_ngrams("ab", 2, 4) == [" a", "ab", "b ", " ab", "ab ", " ab "]


def _toy_corpus():
    texts = [
        "maria lopez maria",
        "lopez maria gutierrez",
        "acme analytics group",
        "acme analytics",
        "quartz basalt granite",
    ]
    return ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )


def test_trained_scorer_separates_and_matches_single_process_oracle():
    idf, n_docs = train_char_idf(_toy_corpus())
    assert n_docs == 5 and len(idf) > 10

    pos = [("maria lopez", "lopez maria"), ("acme analytics", "acme analytics group")]
    neg = [("maria lopez", "quartz basalt"), ("acme analytics", "granite quartz")]
    pairs = pos + neg
    labels = [1, 1, 0, 0]
    model = train_pair_scorer(pairs, labels, idf)

    # separates its training data
    for a, b in pos:
        assert model.predict(a, b) == 1, (a, b)
    for a, b in neg:
        assert model.predict(a, b) == 0, (a, b)

    # distributed scoring == the single-process model, pair for pair
    cand = pa.table(
        {
            "type": ["PERSON"] * 4,
            "a": [p[0] for p in pairs],
            "b": [p[1] for p in pairs],
        }
    )
    kept = pa.concat_tables(
        [
            b
            for b in score_candidate_pairs(
                ray.data.from_arrow(cand), model
            ).iter_batches(batch_format="pyarrow")
            if b.num_rows
        ],
        promote_options="default",
    )
    expected = [(a, b) for a, b in pairs if model.predict(a, b)]
    got = list(zip(kept.column("a").to_pylist(), kept.column("b").to_pylist()))
    assert sorted(got) == sorted(expected) == sorted(pos)


def test_scorer_as_linking_edge_filter():
    """The hook shape: blocking candidates -> trained scorer filter ->
    union-find, replacing the rule predicate with the learned one."""
    from pdf_entity_extraction_ray.stages.linking import build_cluster_map

    idf, _ = train_char_idf(_toy_corpus())
    model = train_pair_scorer(
        [("maria lopez", "lopez maria"), ("maria lopez", "granite quartz")],
        [1, 0],
        idf,
    )
    cand = ray.data.from_arrow(
        pa.table(
            {
                "type": ["PERSON", "PERSON"],
                "a": ["Maria Lopez", "Maria Lopez"],
                "b": ["Lopez Maria", "Granite Quartz"],
            }
        )
    )
    edges = []
    for b in score_candidate_pairs(cand, model).iter_batches(batch_format="pyarrow"):
        if b.num_rows and "type" in b.column_names:
            edges.extend(
                zip(b.column("type").to_pylist(), b.column("a").to_pylist(), b.column("b").to_pylist())
            )
    cm = build_cluster_map(
        sorted(set(edges)),
        [("PERSON", "Maria Lopez"), ("PERSON", "Lopez Maria"), ("PERSON", "Granite Quartz")],
    )
    assert cm[("PERSON", "Maria Lopez")] == cm[("PERSON", "Lopez Maria")]
    assert cm[("PERSON", "Granite Quartz")] != cm[("PERSON", "Maria Lopez")]


def test_gbdt_learns_feature_interactions_linear_cannot():
    """XOR over two marker tokens: an additive linear model caps out below
    perfect accuracy, while the depth-2 GBDT (the LightGBM-fidelity class)
    separates it exactly — the representational gap that motivates trees."""
    from pdf_entity_extraction_ray.ops.pairscore import (
        char_wb_ngrams,
        train_gbdt_pair_scorer,
        train_pair_scorer,
    )

    combos = ["base", "base aaaa", "base bbbb", "base aaaa bbbb"]
    labels4 = [0, 1, 1, 0]  # XOR of the two markers
    pairs = [(t, "") for t in combos for _ in range(4)]
    labels = [l for l in labels4 for _ in range(4)]
    idf = {g: 1.0 for t in combos for g in char_wb_ngrams(t)}

    gbdt = train_gbdt_pair_scorer(pairs, labels, idf, rounds=40, depth=2)
    assert [gbdt.predict(t, "") for t in combos] == labels4

    linear = train_pair_scorer(pairs, labels, idf)
    assert [linear.predict(t, "") for t in combos] != labels4  # XOR is out of reach

    # deterministic: a second training run scores identically
    gbdt2 = train_gbdt_pair_scorer(pairs, labels, idf, rounds=40, depth=2)
    assert [gbdt2.decision(t, "") for t in combos] == [gbdt.decision(t, "") for t in combos]


def test_gbdt_broadcast_inference_shape(ray_session):
    """The GBDT ships through the same ray.put broadcast-infer stage as the
    linear model (score_candidate_pairs)."""
    import pyarrow as pa
    import ray.data

    from pdf_entity_extraction_ray.ops.pairscore import (
        char_wb_ngrams,
        score_candidate_pairs,
        train_gbdt_pair_scorer,
    )

    pos = [("acme corp", "acme corporation")] * 4
    neg = [("acme corp", "zebra lake")] * 4
    pairs = pos + neg
    labels = [1] * 4 + [0] * 4
    idf = {g: 1.0 for a, b in pairs for g in char_wb_ngrams(f"{a} {b}")}
    model = train_gbdt_pair_scorer(pairs, labels, idf, rounds=25, depth=2)

    ds = ray.data.from_arrow(
        pa.table(
            {
                "type": pa.array(["ORG", "ORG"], pa.string()),
                "a": pa.array(["acme corp", "acme corp"], pa.string()),
                "b": pa.array(["acme corporation", "zebra lake"], pa.string()),
            }
        )
    )
    kept = score_candidate_pairs(ds, model).take_all()
    assert [(r["a"], r["b"]) for r in kept] == [("acme corp", "acme corporation")]
