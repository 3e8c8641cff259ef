"""A7 cross-encoder rerank stage + D2 sequential-window blocking."""

import pyarrow as pa
import pytest
import ray.data

from pdf_entity_extraction_ray.stages.linking import (
    sequential_window_groups,
    sequential_window_pairs,
)
from pdf_entity_extraction_ray.stages.reranker import (
    CrossEncoderReranker,
    rerank_pairs,
    top_candidate_per_query,
)


def _make_fake_scorer():
    """Deterministic: score = shared-word count.  Built as a CLOSURE so
    cloudpickle ships it by value — a test-module-level function would be
    pickled by reference and Ray workers cannot import the test module."""

    def score(pairs):
        return [len(set(q.split()) & set(c.split())) for q, c in pairs]

    return score


def test_reranker_is_import_gated():
    with pytest.raises(NotImplementedError):
        CrossEncoderReranker()


def test_rerank_actor_pool_and_top1():
    pairs = pa.table(
        {
            "query": ["46 of the american convention"] * 3,
            "candidate": [
                "46 47 the american convention",
                "37 of the 47",
                "46 of the 47",
            ],
        }
    )
    scored = rerank_pairs(
        ray.data.from_arrow(pairs), concurrency=1, _model=_make_fake_scorer()
    )
    best = pa.concat_tables(
        [b for b in top_candidate_per_query(scored).iter_batches(batch_format="pyarrow") if b.num_rows],
        promote_options="default",
    )
    assert best.num_rows == 1
    assert best.column("candidate").to_pylist() == ["46 47 the american convention"]


def test_sequential_window_groups_reference_semantics():
    """Cap-15 growth, then similarity-to-last extension, else a new group
    (ollama_ner_extract_names.py:294-326)."""
    # 15 dissimilar names fill the first group; the 16th (dissimilar) splits
    names = [f"name{chr(ord('a') + i)} {'x' * (i + 3)}" for i in range(15)]
    groups = sequential_window_groups(names + ["zzz completely different"], window=15)
    assert [len(g) for g in groups] == [15, 1]

    # a 16th name similar to the 15th EXTENDS the group past the cap
    extended = names + [names[-1] + "s"]
    groups = sequential_window_groups(extended, window=15)
    assert [len(g) for g in groups] == [16]

    assert sequential_window_groups([], 15) == []


def test_sequential_window_pairs_finds_adjacent_aliases():
    """Sorted adjacency: accent/typo variants sort next to each other and
    must pair under the window blocking."""
    rows = pa.table(
        {
            "type": ["PERSON"] * 4 + ["ORG"],
            "surface": [
                "Maria Lopez",
                "Maria Lopes",       # typo variant, adjacent after sort
                "Pedro Alvarez",
                "Quintin Zabala",
                "Maria Lopez",       # ORG same surface: must NOT pair cross-type
            ],
        }
    )
    edges = set()
    for b in sequential_window_pairs(ray.data.from_arrow(rows), window=15).iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows and "type" in b.column_names:
            edges.update(
                zip(b.column("type").to_pylist(), b.column("a").to_pylist(), b.column("b").to_pylist())
            )
    assert ("PERSON", "Maria Lopes", "Maria Lopez") in edges
    assert all(t == "PERSON" for t, _, _ in edges)
    assert not any("Quintin" in a or "Quintin" in b for _, a, b in edges)
