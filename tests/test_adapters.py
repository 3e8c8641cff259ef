"""A2-A5 model-zoo adapters: each framework's output-shape mapping and
post-processing chain, exercised through the ``_classifier`` test seam
(the real libraries are absent here; the import-gated constructors must
say so with the integration contract)."""

import pyarrow as pa
import pytest

from pdf_entity_extraction_ray.stages.adapters import (
    FlairTagger,
    GLiNERTagger,
    SpacyTagger,
    SpanMarkerTagger,
)
from pdf_entity_extraction_ray.stages.registry import available_taggers, get_tagger


class _FakeFlair:
    """Predict stores spans on the sentence, flair-style."""

    def __init__(self, spans):
        self._spans = spans

    def predict(self, sentence):
        from types import SimpleNamespace

        sentence.get_spans = lambda kind: [
            SimpleNamespace(text=t, tag=l, start_position=s, end_position=e)
            for (t, l, s, e) in self._spans
        ]


def test_flair_adapter_maps_span_fields():
    tagger = FlairTagger(_classifier=_FakeFlair([("Ada Lovelace", "PER", 0, 12)]))
    spans = tagger.tag_segment("Ada Lovelace wrote notes.")
    assert spans == [
        {"text": "Ada Lovelace", "entity_label": "PER", "start_index": 0, "end_index": 12}
    ]


def test_flair_adapter_whitelist():
    fake = _FakeFlair([("Ada", "PER", 0, 3), ("1843", "DATE", 10, 14)])
    tagger = FlairTagger(allowed_types={"PER"}, _classifier=fake)
    assert [s["entity_label"] for s in tagger.tag_segment("x")] == ["PER"]


class _FakeSpacyDoc:
    def __init__(self, ents):
        from types import SimpleNamespace

        self.ents = [
            SimpleNamespace(text=t, label_=l, start_char=s, end_char=e)
            for (t, l, s, e) in ents
        ]


def test_spacy_adapter_maps_ents():
    nlp = lambda text: _FakeSpacyDoc([("Labor Statute", "STATUTE", 4, 17)])
    tagger = SpacyTagger(_classifier=nlp)
    assert tagger.tag_segment("See Labor Statute s.3") == [
        {"text": "Labor Statute", "entity_label": "STATUTE", "start_index": 4, "end_index": 17}
    ]


class _EchoGliner:
    """Marks every occurrence of a fixed phrase inside each window —
    window-local offsets, like the real model."""

    def __init__(self, phrase, label):
        self.phrase, self.label = phrase, label

    def predict_entities(self, window_text, labels):
        out, k = [], 0
        while (i := window_text.find(self.phrase, k)) != -1:
            out.append(
                {"text": self.phrase, "label": self.label,
                 "start": i, "end": i + len(self.phrase)}
            )
            k = i + 1
        return out


def test_gliner_adapter_window_chain():
    """Windowed re-basing (M8) + label truncation (M12) + dedup (M7) +
    overlap removal (M6): a phrase far past the first window must come back
    with SEGMENT-level offsets and one copy despite window overlap."""
    words = [f"w{i}" for i in range(25)] + ["legal", "ref"] + [f"v{i}" for i in range(10)]
    text = " ".join(words)
    tagger = GLiNERTagger(_classifier=_EchoGliner("legal ref", "cardinal_number"))
    spans = tagger.tag_segment(text)
    assert len(spans) == 1
    (s,) = spans
    assert s["entity_label"] == "CAR"  # truncate_label("cardinal_number")
    assert text[s["start_index"] : s["end_index"]] == "legal ref"


def test_spanmarker_adapter_maps_fields():
    clf = type(
        "C", (), {
            "predict": staticmethod(lambda text: [
                {"span": "Bogotá", "label": "GPE",
                 "char_start_index": 8, "char_end_index": 14}
            ])
        },
    )()
    tagger = SpanMarkerTagger(_classifier=clf)
    assert tagger.tag_segment("Born in Bogotá.") == [
        {"text": "Bogotá", "entity_label": "GPE", "start_index": 8, "end_index": 14}
    ]


def test_adapters_share_batch_interface():
    """__call__ is the shared MENTIONS_SCHEMA actor-pool surface."""
    tagger = SpacyTagger(_classifier=lambda text: _FakeSpacyDoc([("Bogotá", "GPE", 0, 6)]))
    batch = pa.table(
        {
            "url": ["u1"], "seg_id": pa.array([0], pa.int32()), "lang": ["en"],
            "text": ["Bogotá hosts the summit."],
            "seg_offset": pa.array([100], pa.int32()),
        }
    )
    out = tagger(batch)
    assert out.column("type").to_pylist() == ["GPE"]
    assert out.column("page_start").to_pylist() == [100]
    assert out.column("surface").to_pylist() == ["Bogotá"]


def test_registry_lists_model_zoo_and_gates_imports():
    names = available_taggers()
    for name in ("gazetteer", "hf-token-classifier", "flair", "spacy", "gliner", "span-marker"):
        assert name in names, name
    for name in ("flair", "spacy", "gliner", "span-marker"):
        with pytest.raises(NotImplementedError):
            get_tagger(name)()
