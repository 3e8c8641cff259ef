"""Fuzzy span-location repair paths (reference M16/M17) — used when an
upstream extractor returns a surface form without offsets.

* :func:`fuzzy_window_match`      — M16 sliding-similarity-window locate
  (check_fuzzy_windows_match.py:28-119): candidate substrings in a window
  sized ``2.5 x len(entity)`` with length jitter, ``SequenceMatcher``
  ratio >= 0.85, >50% char-overlap suppression between accepted matches
  (D3, :104-117).
* :func:`token_window_match`      — M17 token-based locate
  (check_token_based_match.py:9-84): ``\\b\\w+\\b`` tokens with positions,
  entity-length token windows, token-list ``SequenceMatcher`` >= 0.8.

Both are O(n*m) and documented as low-volume repair paths only (SURVEY
§2.2) — never placed on the hot batch path.
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

_WORD_RE = re.compile(r"\b\w+\b")


def fuzzy_window_match(
    entity_text: str,
    source_text: str,
    threshold: float = 0.85,
    length_jitter: int = 20,
) -> list[tuple[int, int, float]]:
    """All fuzzy occurrences of ``entity_text`` as (start, end, ratio),
    best-first, with >50% overlap suppression."""
    n = len(entity_text)
    if n == 0 or not source_text:
        return []
    window = max(int(2.5 * n), n + 1)
    candidates: list[tuple[float, int, int]] = []
    step = max(1, n // 4)
    for start in range(0, max(len(source_text) - n + 1, 1), step):
        for jitter in range(-length_jitter, length_jitter + 1, max(1, length_jitter // 4)):
            end = start + n + jitter
            if end <= start or end > len(source_text):
                continue
            if end - start > window:
                continue
            chunk = source_text[start:end]
            ratio = SequenceMatcher(None, entity_text.lower(), chunk.lower()).ratio()
            if ratio >= threshold:
                candidates.append((ratio, start, end))
    candidates.sort(key=lambda t: (-t[0], t[1], t[2]))
    accepted: list[tuple[int, int, float]] = []
    for ratio, start, end in candidates:
        clash = False
        for a_start, a_end, _ in accepted:
            overlap = max(0, min(end, a_end) - max(start, a_start))
            if overlap * 2 > min(end - start, a_end - a_start):  # >50% (D3)
                clash = True
                break
        if not clash:
            accepted.append((start, end, ratio))
    accepted.sort(key=lambda t: t[0])
    return accepted


def token_window_match(
    entity_text: str, source_text: str, threshold: float = 0.8
) -> tuple[int, int] | None:
    """First token-window match of ``entity_text`` with token-list
    similarity >= ``threshold``; None if absent."""
    entity_tokens = [m.group(0).lower() for m in _WORD_RE.finditer(entity_text)]
    if not entity_tokens:
        return None
    source = [(m.group(0).lower(), m.start(), m.end()) for m in _WORD_RE.finditer(source_text)]
    k = len(entity_tokens)
    best: tuple[float, int, int] | None = None
    for i in range(0, max(len(source) - k + 1, 0) or (1 if source else 0)):
        win = source[i : i + k]
        if not win:
            break
        ratio = SequenceMatcher(None, entity_tokens, [w[0] for w in win]).ratio()
        if ratio >= threshold and (best is None or ratio > best[0]):
            best = (ratio, win[0][1], win[-1][2])
    if best is None:
        return None
    return best[1], best[2]
