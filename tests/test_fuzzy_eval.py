"""Unit tests for the M16/M17 fuzzy matchers and the evaluation protocol."""

from pdf_entity_extraction_ray.functions.evaluation import (
    match_names_to_groups,
    name_metrics,
    set_pr,
)
from pdf_entity_extraction_ray.functions.fuzzy import (
    fuzzy_window_match,
    token_window_match,
)


class TestFuzzyWindowM16:
    def test_finds_typo_variant(self):
        src = "reported by Jose Gutierez yesterday"
        hits = fuzzy_window_match("Jose Gutierrez", src, threshold=0.8)
        assert hits, "typo variant should match above 0.8"
        start, end, ratio = hits[0]
        assert "Gutierez" in src[start:end]

    def test_no_match_in_unrelated_text(self):
        assert fuzzy_window_match("Acme Holdings", "totally different words here") == []

    def test_overlap_suppression_d3(self):
        src = "Acme Corp Acme Corp"
        hits = fuzzy_window_match("Acme Corp", src, threshold=0.9)
        for i in range(len(hits)):
            for j in range(i + 1, len(hits)):
                a, b = hits[i], hits[j]
                overlap = max(0, min(a[1], b[1]) - max(a[0], b[0]))
                assert overlap * 2 <= min(a[1] - a[0], b[1] - b[0])


class TestTokenWindowM17:
    def test_exact_tokens(self):
        src = "meeting with Maria del Carmen Ruiz at noon"
        span = token_window_match("maria del carmen ruiz", src)
        assert span is not None
        assert src[span[0] : span[1]] == "Maria del Carmen Ruiz"

    def test_one_token_differs(self):
        src = "meeting with Maria del Karmen Ruiz at noon"
        span = token_window_match("maria del carmen ruiz", src, threshold=0.7)
        assert span is not None

    def test_absent(self):
        assert token_window_match("zeta omega", "nothing relevant") is None


class TestReferenceEvalProtocol:
    def test_first_unclaimed_group_claiming(self):
        gold = [["A", "A2"], ["A", "B2"], ["C"]]
        # "A" appears in two groups; each prediction claims the FIRST unclaimed
        found, fps, not_found = match_names_to_groups(["A", "A"], gold)
        assert (found, fps, not_found) == (2, 0, 1)

    def test_metrics(self):
        gold = [["X"], ["Y"], ["Z"]]
        m = name_metrics(["X", "Q"], gold)
        assert m["found"] == 1 and m["false_positives"] == 1 and m["not_found"] == 2
        assert m["precision"] == 0.5
        assert abs(m["recall"] - 1 / 3) < 1e-9
        assert m["accuracy"] == 0.25

    def test_set_pr(self):
        m = set_pr({1, 2, 3}, {2, 3, 4})
        assert m["tp"] == 2 and abs(m["precision"] - 2 / 3) < 1e-9
