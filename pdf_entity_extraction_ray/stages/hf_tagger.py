"""Real-model tagger adapter (reference A1: HF token-classification
pipelines, src/methods/NERTransformerModel.py:19-22).

Not runnable in this environment (no ``transformers``): the constructor
raises ``NotImplementedError`` with the exact integration contract.  The
post-processing chain it would feed is the SAME tested reference
semantics the gazetteer stand-in uses (M4 BIO merge -> M5 whitelist ->
M7 dedup -> M6 overlap removal), so swapping a real model in changes
nothing downstream — mentions, triples, linking and the graph are
model-agnostic.

Deployment shape (actor pool, GPU-fractional)::

    ds.map_batches(HFTokenClassifierTagger,
                   fn_constructor_kwargs={"model_name": "dslim/bert-base-NER"},
                   concurrency=(2, 8), batch_size=64, num_gpus=0.25,
                   batch_format="pyarrow")

The Flair / spaCy / GLiNER members of the reference zoo (A2-A4) follow
the identical template: load in ``__init__``, emit piece dicts shaped
``{"entity", "word", "start", "end"}``, let ``bio_merge`` build spans.
"""

from __future__ import annotations

from ..functions.spans import bio_merge, dedup_spans, filter_types, remove_overlapping
from .registry import register_tagger
from .tagger import GazetteerTagger


@register_tagger("hf-token-classifier")
class HFTokenClassifierTagger:
    """A1 adapter: HuggingFace token-classification -> reference span chain."""

    def __init__(
        self,
        model_name: str = "dslim/bert-base-NER",
        allowed_types: set[str] | None = None,
        device: str | int = -1,
    ):
        try:
            from transformers import pipeline  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "transformers is not available in this environment; on a real "
                "cluster this constructor loads the pipeline once per actor: "
                "self.pipe = pipeline('token-classification', model=model_name, "
                "device=device)"
            ) from exc
        self.pipe = pipeline("token-classification", model=model_name, device=device)
        self.allowed_types = allowed_types

    def tag_segment(self, text: str) -> list[dict]:
        # pieces arrive HF-shaped: {"entity": "B-PER", "word", "start", "end"}
        pieces = self.pipe(text)
        spans = bio_merge(pieces)                       # M4
        if self.allowed_types is not None:
            spans = filter_types(spans, self.allowed_types)  # M5
        spans = dedup_spans(spans)                      # M7
        return remove_overlapping(spans)                # M6

    # identical Arrow batch interface to every other tagger
    __call__ = GazetteerTagger.__call__
