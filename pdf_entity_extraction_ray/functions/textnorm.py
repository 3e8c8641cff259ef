"""Surface-form normalization functions (reference semantics).

Each function reproduces a normalization rule of the reference repo
(citations are into /root/reference/):

* :func:`normalize_ws`       — M1, ``" ".join(text.split())``
  (src/ollama_entity_extraction/OllamaNERExtractor.py:199,
   src/methods/MultipleEntityExtractor.py:119, src/fix_word_boxes.py:24)
* :func:`ascii_fold`         — M19 accent folding, ``unidecode(name)``
  (src/check_heuristics.py:19-42); pure-stdlib reimplementation.
* :func:`sorted_word_key`    — M20 sorted-word-multiset key
  (src/check_heuristics.py:45-60)
* :func:`strip_punct`        — M23 punctuation-insensitive key
  (src/check_heuristics.py:229-249)
* :func:`word_intersection_ratio` — M24
  (src/ollama_entity_extraction/OllamaNERExtractor.py:43-51)
* :func:`levenshtein_ratio`  — the ``Levenshtein.ratio`` the reference's
  similarity predicate uses (OllamaNERExtractor.py:124); reimplemented with
  the same weighting (substitution cost 2), so thresholds carry over.
* :func:`surfaces_similar`   — D2 blocking predicate: ratio > 0.79 OR
  word-intersection > 0.65 (OllamaNERExtractor.py:122-126).
"""

from __future__ import annotations

import string
import unicodedata

# Characters NFKD decomposition alone cannot fold to ASCII.
_FOLD_EXTRA = str.maketrans(
    {
        "ø": "o", "Ø": "O", "ß": "ss", "æ": "ae", "Æ": "AE",
        "œ": "oe", "Œ": "OE", "ð": "d", "Ð": "D", "þ": "th",
        "Þ": "Th", "ł": "l", "Ł": "L", "đ": "d", "Đ": "D",
        "ı": "i", "'": "'", "’": "'", "–": "-", "—": "-",
    }
)

_PUNCT_TABLE = str.maketrans("", "", string.punctuation)


def normalize_ws(text: str) -> str:
    """Collapse all whitespace runs to single spaces and strip ends (M1).

    This defines the canonical text that every downstream character offset
    refers to — the byte-identical-text-per-url invariant.
    """
    return " ".join(text.split())


def ascii_fold(text: str) -> str:
    """Fold accented characters to their ASCII base (M19, unidecode-style).

    The extra-fold table runs again AFTER decomposition: NFKD can surface
    table characters that were not in the input (e.g. ``Ǣ`` -> ``Æ`` +
    macron), and folding must be idempotent."""
    text = text.translate(_FOLD_EXTRA)
    decomposed = unicodedata.normalize("NFKD", text)
    stripped = "".join(c for c in decomposed if not unicodedata.combining(c))
    return stripped.translate(_FOLD_EXTRA)


def sorted_word_key(name: str) -> str:
    """Word-permutation-insensitive key (M20): fold, split, sort, join."""
    return " ".join(sorted(ascii_fold(name).split()))


def strip_punct(name: str) -> str:
    """Remove all ASCII punctuation (M23)."""
    return name.translate(_PUNCT_TABLE)


def surface_norm(name: str) -> str:
    """The canonicalization shuffle key: fold accents, lowercase, strip
    punctuation, collapse whitespace.  Deterministic, content-derived."""
    return normalize_ws(strip_punct(ascii_fold(name)).lower())


def word_intersection_ratio(a: str, b: str) -> float:
    """|words(a) ∩ words(b)| / max(|words(a)|, |words(b)|), lowercased (M24)."""
    wa = set(a.lower().split())
    wb = set(b.lower().split())
    if not wa or not wb:
        return 0.0
    return len(wa & wb) / max(len(wa), len(wb))


def lcs_length(a: str, b: str) -> int:
    """Longest-common-subsequence length via the Allison–Dix bit-parallel
    algorithm — O(len(a)*len(b)/wordsize) using Python bigints as the bit
    vector.  Exact."""
    la = len(a)
    if la == 0 or not b:
        return 0
    posmask: dict[str, int] = {}
    for i, c in enumerate(a):
        posmask[c] = posmask.get(c, 0) | (1 << i)
    row = 0
    full = (1 << la) - 1
    for c in b:
        x = row | posmask.get(c, 0)
        row = x & ~(x - ((row << 1) | 1)) & full
    return bin(row).count("1")


def levenshtein_ratio(a: str, b: str) -> float:
    """Normalized similarity matching ``Levenshtein.ratio`` semantics:
    ``(len(a)+len(b) - dist) / (len(a)+len(b))`` with substitution cost 2.
    With substitutions costing exactly delete+insert, the optimal alignment
    never substitutes, so ``dist = len(a)+len(b) - 2*LCS`` and the ratio is
    ``2*LCS / (len(a)+len(b))`` — computed bit-parallel."""
    total = len(a) + len(b)
    if total == 0:
        return 1.0
    return 2.0 * lcs_length(a, b) / total


LEVENSHTEIN_THRESHOLD = 0.79   # OllamaNERExtractor.py:124
WORD_INTERSECT_THRESHOLD = 0.65  # OllamaNERExtractor.py:125


def surfaces_similar(a: str, b: str) -> bool:
    """D2 pair predicate: Levenshtein ratio > 0.79 OR word-intersection > 0.65
    (src/ollama_entity_extraction/OllamaNERExtractor.py:122-126)."""
    if word_intersection_ratio(a, b) > WORD_INTERSECT_THRESHOLD:
        return True
    # cheap length-based upper bound on the ratio before the O(n*m) DP
    la, lb = len(a), len(b)
    if la + lb == 0:
        return True
    if (la + lb - abs(la - lb)) / (la + lb) <= LEVENSHTEIN_THRESHOLD:
        return False
    return levenshtein_ratio(a, b) > LEVENSHTEIN_THRESHOLD


def words_subset_merge_key(shorter: str, longer: str) -> bool:
    """M21: fold shorter names whose word set is a subset of a longer name's
    word set, requiring at least 2 words (src/check_heuristics.py:63-97)."""
    ws = set(ascii_fold(shorter).lower().split())
    wl = set(ascii_fold(longer).lower().split())
    return len(ws) >= 2 and ws <= wl and ws != wl


def abbreviation_expands_to(abbrev: str, full: str) -> bool:
    """M22: ``abbrev`` matches ``full`` when every initial (single letter,
    dots stripped) prefix-matches one of ``full``'s extra words and every
    non-initial word of ``abbrev`` appears in ``full``
    (src/check_heuristics.py:175-226)."""
    aw = [w.rstrip(".") for w in ascii_fold(abbrev).lower().split()]
    fw = ascii_fold(full).lower().split()
    if not aw or not fw:
        return False
    initials = [w for w in aw if len(w) == 1]
    non_initials = [w for w in aw if len(w) > 1]
    if not initials:
        return False
    if not set(non_initials) <= set(fw):
        return False
    extra = [w for w in fw if w not in non_initials]
    remaining = list(extra)
    for ini in initials:
        for k, w in enumerate(remaining):
            if w.startswith(ini):
                del remaining[k]
                break
        else:
            return False
    return True
