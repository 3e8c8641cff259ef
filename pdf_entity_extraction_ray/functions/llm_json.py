"""Tolerant JSON entity-response parsing (reference M18).

The reference parses LLM chat responses that may be wrapped in ```-fences,
may use an ``{"entities": [...]}`` wrapper, and may contain junk items
(check_fuzzy_match.py:85-149, check_fuzzy_windows_match.py:194-209).  No
LLM exists in this deterministic engine, but the same shape appears for ANY
ill-formed upstream producer (a scraped API, a cached model dump), so the
parser is kept as a first-class function.

Valid items validate to the ``ExtractedEntity`` shape
(src/data_model/ExtractedEntity.py:4-11): ``text`` (non-empty str),
``type`` (str), optional int ``character_start`` / ``character_end`` with
``0 <= start < end``.  Invalid items are dropped, never raised.
"""

from __future__ import annotations

import json
import re

_FENCE_RE = re.compile(r"```(?:json)?\s*(.*?)\s*```", re.DOTALL)


def strip_fences(raw: str) -> str:
    """Return the content of the first ```-fenced block, else the input."""
    m = _FENCE_RE.search(raw)
    return m.group(1) if m else raw.strip()


def parse_entity_response(raw: str) -> list[dict]:
    """Parse a response into validated entity dicts
    (``{"text", "type", "character_start", "character_end"}``)."""
    text = strip_fences(raw)
    try:
        data = json.loads(text)
    except (json.JSONDecodeError, TypeError):
        return []
    if isinstance(data, dict):
        data = data.get("entities", [])
    if not isinstance(data, list):
        return []
    out: list[dict] = []
    for item in data:
        if not isinstance(item, dict):
            continue
        ent_text = item.get("text")
        ent_type = item.get("type", item.get("entity_label", ""))
        if not isinstance(ent_text, str) or not ent_text or not isinstance(ent_type, str):
            continue
        start = item.get("character_start", item.get("start"))
        end = item.get("character_end", item.get("end"))
        if start is not None or end is not None:
            if (
                not isinstance(start, int)
                or not isinstance(end, int)
                or isinstance(start, bool)
                or isinstance(end, bool)
                or start < 0
                or end <= start
            ):
                continue
        rec = {"text": ent_text, "type": ent_type}
        if start is not None:
            rec["character_start"] = start
            rec["character_end"] = end
        out.append(rec)
    return out
