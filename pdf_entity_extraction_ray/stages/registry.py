"""Tagger registry — the user-extension seam (SURVEY §2.10).

The reference's extension surface is template-method subclassing
(``NERTransformerModel.process_segment`` overridden by 11 extractors,
src/methods/NERTransformerModel.py:72-108; ``OllamaNERExtractor.get_prompt``
by 3, src/ollama_entity_extraction/OllamaNERExtractor.py:39-41).  Here a
tagger is any callable CLASS with the actor-pool contract:

    __init__(**config)           # load-expensive setup, once per actor
    __call__(batch: pa.Table) -> pa.Table   # MENTIONS_SCHEMA rows out
    tag_segment(text: str) -> list[span]    # per-segment semantics (shared
                                            # with the single-process oracle)

Registered by name so pipeline configs can swap extractors the way the
reference's comparison scripts swap model classes (src/check_ner_models.py).
"""

from __future__ import annotations

from collections.abc import Callable

_REGISTRY: dict[str, type] = {}


def register_tagger(name: str) -> Callable[[type], type]:
    def wrap(cls: type) -> type:
        if name in _REGISTRY and _REGISTRY[name] is not cls:
            raise ValueError(f"tagger {name!r} already registered")
        _REGISTRY[name] = cls
        return cls

    return wrap


def get_tagger(name: str) -> type:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown tagger {name!r}; known: {sorted(_REGISTRY)}") from None


def available_taggers() -> list[str]:
    return sorted(_REGISTRY)


# built-ins
from .tagger import GazetteerTagger  # noqa: E402

register_tagger("gazetteer")(GazetteerTagger)

# model-zoo adapters register themselves on import (A1 + A2-A5)
from . import adapters  # noqa: E402,F401
from . import hf_tagger  # noqa: E402,F401
