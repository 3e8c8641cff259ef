"""A1 with a RUNNABLE committed checkpoint (VERDICT r3 next-step #2).

Unlike tests/test_real_models.py (skip-gated on optional libraries),
these run in CI: the committed pure-numpy token-classification
checkpoint (pdf_entity_extraction_ray/fixtures/np_tagger.npz, trained by
scripts/train_np_tagger.py) drives the ACTUAL model-pieces ->
bio_merge (M4) -> dedup (M7) -> overlap-removal (M6) chain — real
(non-gazetteer) piece dicts, including ``##`` subword continuations,
through the full mentions phase at Ray actor-pool scale, with a
CORRECTNESS-style gate against the planted gold mentions."""

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from pdf_entity_extraction_ray.stages.np_model import (
    NumpyTokenClassificationModel,
    NumpyTokenClassifierTagger,
    subword_pieces,
    tokenize,
)


def test_tokenizer_offsets_slice_back():
    text = 'The court (per J. R. Alvarado) ruled on July 14, 2015: "guilty."'
    toks = tokenize(text)
    for tok, s, e in toks:
        assert text[s:e] == tok
    words = [t[0] for t in toks]
    assert "J." in words and "R." in words          # initials keep their dot
    # the comma detaches but stays char-contiguous, so bio_merge
    # reconstructs "July 14, 2015" exactly from I-DATE pieces
    assert "14" in words and "," in words and "2015" in words
    assert "(" in words and ")" in words            # parens detached


def test_subword_pieces_roundtrip_through_bio_merge():
    from pdf_entity_extraction_ray.functions.spans import bio_merge

    word = "Constantinople"
    pieces = subword_pieces(word, 10)
    assert len(pieces) > 1 and pieces[1][3] is True  # really split
    hf = [
        {
            "entity": ("B-GPE" if not cont else "I-GPE"),
            "word": ("##" + t) if cont else t,
            "start": s,
            "end": e,
        }
        for t, s, e, cont in pieces
    ]
    spans = bio_merge(hf)
    assert spans == [
        {"entity_label": "GPE", "text": word, "start_index": 10, "end_index": 10 + len(word)}
    ]


def test_model_emits_hf_shaped_pieces():
    model = NumpyTokenClassificationModel()
    pieces = model("Ley de Transparencia was cited in Geneva on 3 March 2021.")
    for p in pieces:
        assert set(p) >= {"entity", "word", "start", "end", "score"}
        assert p["entity"][:2] in ("B-", "I-")
        assert 0.0 < p["score"] <= 1.0


@pytest.fixture(scope="module")
def np_mentions(small_corpus):
    """Full mentions phase: pages -> segments -> numpy-model actor pool."""
    from pdf_entity_extraction_ray.stages.extract import extract_segments_batch

    pages = ray.data.read_parquet(f"{small_corpus}/pages")
    segs = pages.map_batches(extract_segments_batch, batch_format="pyarrow")
    out = segs.map_batches(
        NumpyTokenClassifierTagger,
        batch_format="pyarrow",
        concurrency=2,
        batch_size=32,
    )
    batches = list(out.iter_batches(batch_format="pyarrow"))
    return pa.concat_tables(batches)


def _mention_hash(tbl: pa.Table) -> str:
    rows = sorted(
        zip(
            tbl.column("url").to_pylist(),
            tbl.column("seg_id").to_pylist(),
            tbl.column("start").to_pylist(),
            tbl.column("end").to_pylist(),
            tbl.column("type").to_pylist(),
            tbl.column("surface").to_pylist(),
        )
    )
    h = hashlib.blake2b(digest_size=16)
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()


def test_np_model_full_mentions_phase_matches_gold(np_mentions, small_corpus):
    """CORRECTNESS-style gate: the numpy-model mentions equal the planted
    gold exactly on (url, seg_id, start, end, type) — the same bar the
    gazetteer ensemble is held to."""
    gold = pq.read_table(f"{small_corpus}/gold_mentions")
    want = set(
        zip(
            gold.column("url").to_pylist(),
            gold.column("seg_id").to_pylist(),
            gold.column("start").to_pylist(),
            gold.column("end").to_pylist(),
            gold.column("type").to_pylist(),
        )
    )
    got = set(
        zip(
            np_mentions.column("url").to_pylist(),
            np_mentions.column("seg_id").to_pylist(),
            np_mentions.column("start").to_pylist(),
            np_mentions.column("end").to_pylist(),
            np_mentions.column("type").to_pylist(),
        )
    )
    assert got == want  # P = R = 1.0 at seed 42


def test_np_model_deterministic_across_batching(np_mentions, small_corpus):
    """Same pipeline at a different batch size / concurrency hashes
    identically (content-derived ids, deterministic forward pass)."""
    from pdf_entity_extraction_ray.stages.extract import extract_segments_batch

    pages = ray.data.read_parquet(f"{small_corpus}/pages")
    out = (
        pages.map_batches(extract_segments_batch, batch_format="pyarrow")
        .map_batches(
            NumpyTokenClassifierTagger,
            batch_format="pyarrow",
            concurrency=1,
            batch_size=128,
        )
    )
    other = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    assert _mention_hash(other) == _mention_hash(np_mentions)
