"""Property-based tests (hypothesis) for the similarity / span kernels."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_entity_extraction_ray.functions.spans import remove_overlapping
from pdf_entity_extraction_ray.functions.textnorm import (
    ascii_fold,
    levenshtein_ratio,
    normalize_ws,
    surface_norm,
)

TEXT = st.text(alphabet=st.characters(codec="utf-8", categories=["L", "N", "P", "Z"]), max_size=40)
SHORT = st.text(alphabet="abcdef ", max_size=12)


def _levenshtein_dp(a: str, b: str) -> int:
    """Reference O(n*m) DP with substitution cost 2 (Levenshtein.ratio
    semantics) — the oracle for the bit-parallel implementation."""
    n, m = len(a), len(b)
    prev = list(range(0, 2 * (m + 1), 2))[: m + 1]
    prev = [j for j in range(m + 1)]
    # distances with sub cost 2 == n + m - 2*LCS; compute LCS by DP
    lcs_prev = [0] * (m + 1)
    for i in range(1, n + 1):
        lcs_cur = [0] * (m + 1)
        for j in range(1, m + 1):
            if a[i - 1] == b[j - 1]:
                lcs_cur[j] = lcs_prev[j - 1] + 1
            else:
                lcs_cur[j] = max(lcs_prev[j], lcs_cur[j - 1])
        lcs_prev = lcs_cur
    return n + m - 2 * lcs_prev[m]


@settings(max_examples=200, deadline=None)
@given(SHORT, SHORT)
def test_levenshtein_ratio_matches_dp_oracle(a, b):
    total = len(a) + len(b)
    expected = 1.0 if total == 0 else (total - _levenshtein_dp(a, b)) / total
    assert abs(levenshtein_ratio(a, b) - expected) < 1e-12


@settings(max_examples=100, deadline=None)
@given(TEXT)
def test_normalize_ws_idempotent_and_single_spaced(t):
    out = normalize_ws(t)
    assert normalize_ws(out) == out
    assert "  " not in out and out == out.strip()


@settings(max_examples=100, deadline=None)
@given(TEXT)
def test_ascii_fold_is_ascii_for_latin(t):
    folded = ascii_fold(t)
    # folding twice changes nothing
    assert ascii_fold(folded) == folded


@settings(max_examples=100, deadline=None)
@given(TEXT)
def test_surface_norm_idempotent(t):
    assert surface_norm(surface_norm(t)) == surface_norm(t)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 10)).map(
            lambda p: {
                "text": "x" * p[1],
                "entity_label": "X",
                "start_index": p[0],
                "end_index": p[0] + p[1],
            }
        ),
        max_size=12,
    )
)
def test_remove_overlapping_yields_disjoint_sorted_spans(spans):
    kept = remove_overlapping(spans)
    for prev, cur in zip(kept, kept[1:]):
        assert prev["end_index"] <= cur["start_index"]
    # every input span either kept or overlaps something kept
    for s in spans:
        assert any(
            not (s["end_index"] <= k["start_index"] or s["start_index"] >= k["end_index"])
            for k in kept
        )
