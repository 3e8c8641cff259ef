"""Real-model smoke hooks (SURVEY §2.3 A1-A5, A7).

These run ONLY when the optional model libraries are installed — never in
this sandbox (every test skips via ``pytest.importorskip``) — so that the
first real-cluster run is NOT the first execution of the integration line.
Each test loads one real checkpoint, tags one segment, and asserts the
shared span-dict contract (text/entity_label/start_index/end_index with
offsets that slice the segment back out).
"""

import pytest

SEGMENT = "Barack Obama visited the European Commission in Paris on July 14, 2015."


def _assert_span_contract(spans, segment=SEGMENT):
    assert isinstance(spans, list)
    for s in spans:
        assert set(s) >= {"text", "entity_label", "start_index", "end_index"}
        assert 0 <= s["start_index"] < s["end_index"] <= len(segment)
        assert segment[s["start_index"] : s["end_index"]] == s["text"]
        assert isinstance(s["entity_label"], str) and s["entity_label"]


def test_flair_real_model_smoke():
    pytest.importorskip("flair")
    from pdf_entity_extraction_ray.stages.adapters import FlairTagger

    tagger = FlairTagger(model_name="flair_ner_english_fast")
    spans = tagger.tag_segment(SEGMENT)
    _assert_span_contract(spans)
    assert spans  # the fast English NER finds Obama/Paris in this segment


def test_spacy_real_model_smoke():
    spacy = pytest.importorskip("spacy")
    try:
        spacy.load("en_core_web_sm")
    except OSError:
        pytest.skip("en_core_web_sm not downloaded")
    from pdf_entity_extraction_ray.stages.adapters import SpacyTagger

    _assert_span_contract(SpacyTagger(model_name="en_core_web_sm").tag_segment(SEGMENT))


def test_gliner_real_model_smoke():
    pytest.importorskip("gliner")
    from pdf_entity_extraction_ray.stages.adapters import GLiNERTagger

    tagger = GLiNERTagger(labels=["person", "location", "date"])
    _assert_span_contract(tagger.tag_segment(SEGMENT))


def test_span_marker_real_model_smoke():
    pytest.importorskip("span_marker")
    from pdf_entity_extraction_ray.stages.adapters import SpanMarkerTagger

    _assert_span_contract(SpanMarkerTagger().tag_segment(SEGMENT))


def test_hf_token_classification_real_model_smoke():
    pytest.importorskip("transformers")
    pytest.importorskip("torch")
    from pdf_entity_extraction_ray.stages.hf_tagger import HFTokenClassifierTagger

    tagger = HFTokenClassifierTagger(model_name="dslim/bert-base-NER")
    _assert_span_contract(tagger.tag_segment(SEGMENT))


def test_cross_encoder_real_model_smoke():
    pytest.importorskip("transformers")
    pytest.importorskip("torch")
    from pdf_entity_extraction_ray.stages.reranker import CrossEncoderReranker

    reranker = CrossEncoderReranker(model_name="cross-encoder/ms-marco-MiniLM-L-6-v2")
    scores = reranker.model([("what is ray data", "Ray Data is a library"),
                             ("what is ray data", "bananas are yellow")])
    assert len(scores) == 2 and all(isinstance(s, float) for s in scores)
