"""Real-model tagger adapters A2-A5 (the rest of the reference's model zoo).

Each adapter follows the A1 template (stages/hf_tagger.py): load the model
once per actor in ``__init__`` (import-gated — the libraries are absent in
this environment, so the constructor raises ``NotImplementedError`` with
the exact integration contract), convert the backend's native output into
the shared span dicts, and run EXACTLY the post-processing the reference
applies for that framework:

* :class:`FlairTagger`       — A2, src/methods/FlairNERModel.py:19-53:
  flair ``Sentence`` predict -> ``get_spans("ner")``; spans arrive merged,
  the reference emits them directly (no extra chain).
* :class:`SpacyTagger`       — A3, src/methods/OpennyaiEnLegalNERSm.py:
  16-49: ``nlp(text).ents`` -> direct emission.
* :class:`GLiNERTagger`      — A4, src/methods/GLiNERModel.py:45-91:
  M8 sliding windows (20/10, ``+1``-space offset re-base) ->
  ``predict_entities(window, labels)`` -> M12 label truncation -> M7
  dedup -> M6 overlap removal.
* :class:`SpanMarkerTagger`  — A5, src/methods/SpanMarkerOntonotes5.py:
  12-41: ``model.predict(text)`` -> {span, label, char_start/end_index}
  field mapping, direct emission.

For tests, every adapter accepts ``_classifier=<object>``: the injected
fake replaces the model load, so the per-framework output-shape mapping
and post-processing chain are exercised without the real libraries — the
Ray-side plumbing (actor-pool ``__call__``, MENTIONS_SCHEMA batches) is
shared with :class:`~.tagger.GazetteerTagger` and fully tested there.
"""

from __future__ import annotations

from ..functions.spans import (
    dedup_spans,
    filter_types,
    remove_overlapping,
    sliding_windows,
    truncate_label,
)
from .registry import register_tagger
from .tagger import GazetteerTagger


def _gated_import(module: str, contract: str):
    try:
        return __import__(module)
    except ImportError as exc:
        raise NotImplementedError(
            f"{module} is not available in this environment; on a real "
            f"cluster this constructor runs once per actor: {contract}"
        ) from exc


@register_tagger("flair")
class FlairTagger:
    """A2: Flair sequence tagger -> direct span emission.

    Model-name mapping mirrors the reference's classifier table
    (FlairNERModel.py:21-27)."""

    CLASSIFIER_BY_NAME = {
        "flair_ner_english": "ner",
        "flair_ner_english_fast": "ner-fast",
        "flair_ner_multilingual_large": "ner-large",
        "flair_ner_spanish_large": "es-ner-large",
        "flair_ner_ontonotes_multilingual_large": "ner-ontonotes-large",
    }

    def __init__(
        self,
        model_name: str = "flair_ner_english",
        allowed_types: set[str] | None = None,
        _classifier=None,
    ):
        if _classifier is None:
            _gated_import(
                "flair",
                "self.classifier = flair.nn.Classifier.load("
                f"{self.CLASSIFIER_BY_NAME.get(model_name, model_name)!r})",
            )
            from flair.nn import Classifier  # pragma: no cover

            _classifier = Classifier.load(self.CLASSIFIER_BY_NAME[model_name])
        self.classifier = _classifier
        self.allowed_types = allowed_types

    def tag_segment(self, text: str) -> list[dict]:
        # flair's Sentence carries its own char offsets; the fake/test seam
        # calls the same two-method surface (predict + get_spans)
        from types import SimpleNamespace

        try:  # pragma: no cover - real flair path
            from flair.data import Sentence

            sentence = Sentence(text)
        except ImportError:
            sentence = SimpleNamespace(text=text)
        self.classifier.predict(sentence)
        spans = [
            {
                "text": e.text,
                "entity_label": e.tag,
                "start_index": e.start_position,
                "end_index": e.end_position,
            }
            for e in sentence.get_spans("ner")
        ]
        if self.allowed_types is not None:
            spans = filter_types(spans, self.allowed_types)
        return spans

    __call__ = GazetteerTagger.__call__


@register_tagger("spacy")
class SpacyTagger:
    """A3: spaCy pipeline (e.g. the opennyai legal model) -> ``doc.ents``."""

    def __init__(
        self,
        model_name: str = "en_core_web_sm",
        allowed_types: set[str] | None = None,
        _classifier=None,
    ):
        if _classifier is None:
            spacy = _gated_import(
                "spacy", f"self.nlp = spacy.load({model_name!r})"
            )
            _classifier = spacy.load(model_name)  # pragma: no cover
        self.nlp = _classifier
        self.allowed_types = allowed_types

    def tag_segment(self, text: str) -> list[dict]:
        doc = self.nlp(text)
        spans = [
            {
                "text": e.text,
                "entity_label": e.label_,
                "start_index": e.start_char,
                "end_index": e.end_char,
            }
            for e in doc.ents
        ]
        if self.allowed_types is not None:
            spans = filter_types(spans, self.allowed_types)
        return spans

    __call__ = GazetteerTagger.__call__


@register_tagger("gliner")
class GLiNERTagger:
    """A4: GLiNER zero-shot spans through the reference's full window chain
    (M8 windows -> M12 truncate -> M7 dedup -> M6 overlap removal)."""

    def __init__(
        self,
        model_name: str = "urchade/gliner_multi-v2.1",
        labels: list[str] | None = None,
        window_size: int = 20,
        slide_size: int = 10,
        _classifier=None,
    ):
        if _classifier is None:
            _gated_import(
                "gliner",
                f"self.classifier = gliner.GLiNER.from_pretrained({model_name!r})",
            )
            from gliner import GLiNER  # pragma: no cover

            _classifier = GLiNER.from_pretrained(model_name)
        self.classifier = _classifier
        self.labels = labels if labels is not None else ["law", "cardinal"]
        self.window_size = window_size
        self.slide_size = slide_size

    def tag_segment(self, text: str) -> list[dict]:
        words = text.split()
        pieces: list[dict] = []
        for window_text, base in sliding_windows(words, self.window_size, self.slide_size):
            for ent in self.classifier.predict_entities(window_text, self.labels):
                pieces.append(
                    {
                        "text": ent["text"],
                        "entity_label": truncate_label(ent["label"]),  # M12
                        "start_index": ent["start"] + base,
                        "end_index": ent["end"] + base,
                    }
                )
        return remove_overlapping(dedup_spans(pieces))  # M7 then M6

    __call__ = GazetteerTagger.__call__


@register_tagger("span-marker")
class SpanMarkerTagger:
    """A5: SpanMarker char-span predictions -> direct field mapping."""

    def __init__(
        self,
        model_name: str = "tomaarsen/span-marker-roberta-large-ontonotes5",
        allowed_types: set[str] | None = None,
        _classifier=None,
    ):
        if _classifier is None:
            _gated_import(
                "span_marker",
                "self.classifier = span_marker.SpanMarkerModel.from_pretrained("
                f"{model_name!r}); self.classifier.cuda()",
            )
            from span_marker import SpanMarkerModel  # pragma: no cover

            _classifier = SpanMarkerModel.from_pretrained(model_name)
        self.classifier = _classifier
        self.allowed_types = allowed_types

    def tag_segment(self, text: str) -> list[dict]:
        spans = [
            {
                "text": r["span"],
                "entity_label": r["label"],
                "start_index": r["char_start_index"],
                "end_index": r["char_end_index"],
            }
            for r in self.classifier.predict(text)
        ]
        if self.allowed_types is not None:
            spans = filter_types(spans, self.allowed_types)
        return spans

    __call__ = GazetteerTagger.__call__
