"""Unit tests for surface-form normalization (reference semantics M1, M19-M24,
D2 thresholds — citations in pdf_entity_extraction_ray/functions/textnorm.py)."""

from pdf_entity_extraction_ray.functions.textnorm import (
    abbreviation_expands_to,
    ascii_fold,
    levenshtein_ratio,
    normalize_ws,
    sorted_word_key,
    strip_punct,
    surface_norm,
    surfaces_similar,
    word_intersection_ratio,
    words_subset_merge_key,
)


def test_normalize_ws_m1():
    assert normalize_ws("  a\t\tb\n c  ") == "a b c"
    assert normalize_ws("") == ""
    assert normalize_ws("x") == "x"


def test_ascii_fold_m19():
    assert ascii_fold("José Gutiérrez") == "Jose Gutierrez"
    assert ascii_fold("Ibáñez Muñoz") == "Ibanez Munoz"
    assert ascii_fold("Łódź øre ß") == "Lodz ore ss"
    assert ascii_fold("plain") == "plain"


def test_sorted_word_key_m20():
    assert sorted_word_key("Carlos Pérez Díaz") == sorted_word_key("Díaz Carlos Pérez")
    assert sorted_word_key("Ana Belén") == "Ana Belen"


def test_strip_punct_m23():
    assert strip_punct("J. R. R. Tolkien") == "J R R Tolkien"
    assert strip_punct("a-b_c!") == "abc"


def test_surface_norm_is_idempotent():
    for s in ["José  Pérez.", "GLOBEX Holdings", "  x  "]:
        assert surface_norm(surface_norm(s)) == surface_norm(s)


def test_word_intersection_ratio_m24():
    assert word_intersection_ratio("a b c", "a b d") == 2 / 3
    assert word_intersection_ratio("A B", "a b") == 1.0
    assert word_intersection_ratio("", "a") == 0.0


def test_levenshtein_ratio_matches_library_semantics():
    # Levenshtein.ratio("kitten", "sitting") == 0.6153846...
    assert abs(levenshtein_ratio("kitten", "sitting") - 8 / 13) < 1e-9
    assert levenshtein_ratio("abc", "abc") == 1.0
    assert levenshtein_ratio("", "") == 1.0
    assert levenshtein_ratio("a", "") == 0.0


def test_d2_thresholds():
    # one-char typo in a long name stays above 0.79 (reference merge case)
    assert surfaces_similar("Vanguard Biotech", "Vangiard Biotech")
    # sharing 2 of 3 words exceeds 0.65 word-intersection
    assert surfaces_similar("José Gutiérrez Paredes", "José Gutiérrez")
    # unrelated names match neither predicate
    assert not surfaces_similar("Globex Holdings", "Initech Partners")


def test_words_subset_merge_m21():
    assert words_subset_merge_key("José Gutiérrez", "José Alejandro Gutiérrez")
    assert not words_subset_merge_key("José", "José Alejandro Gutiérrez")  # 1 word
    assert not words_subset_merge_key("José Pérez", "José Alejandro Gutiérrez")


def test_abbreviation_m22():
    assert abbreviation_expands_to("J. A. Gutiérrez", "José Alejandro Gutiérrez")
    assert abbreviation_expands_to("J. Gutiérrez", "José Gutiérrez")
    assert not abbreviation_expands_to("Z. Gutiérrez", "José Gutiérrez")
    assert not abbreviation_expands_to("José Gutiérrez", "José Gutiérrez")  # no initials
