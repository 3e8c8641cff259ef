"""Locale coverage of the deterministic date grammar (dateparser parity).

The reference's M9 runs ``dateparser.search.search_dates`` with its full
locale zoo (src/methods/DateParser.py:44-50); the deterministic grammar
stands in for it and must at least cover every locale the corpus's
``lang`` column can carry (en, es, fr, de, pt) — a non-English date that
fails ``is_parseable_date`` silently drops a DATE mention (round-3
verdict gap 4).
"""

import datetime as dt

import pytest

from pdf_entity_extraction_ray.functions.dates import (
    is_parseable_date,
    parse_date,
    search_dates,
)

GOLD = dt.date(2004, 5, 17)

CASES = [
    # en (existing)
    ("May 17, 2004", GOLD),
    ("17 May 2004", GOLD),
    ("2004-05-17", GOLD),
    # es (existing)
    ("17 de mayo de 2004", GOLD),
    # fr
    ("17 mai 2004", GOLD),
    ("17 décembre 2004", dt.date(2004, 12, 17)),
    ("17 aout 2004", dt.date(2004, 8, 17)),     # accentless variant
    ("17 août 2004", dt.date(2004, 8, 17)),
    ("17 janvier 2004", dt.date(2004, 1, 17)),
    # de (note the ordinal day dot)
    ("17. Mai 2004", GOLD),
    ("17. März 2004", dt.date(2004, 3, 17)),
    ("17. Marz 2004", dt.date(2004, 3, 17)),    # accentless variant
    ("17. Dezember 2004", dt.date(2004, 12, 17)),
    ("17 Oktober 2004", dt.date(2004, 10, 17)),
    # pt
    ("17 de maio de 2004", GOLD),
    ("17 de março de 2004", dt.date(2004, 3, 17)),
    ("17 de marco de 2004", dt.date(2004, 3, 17)),
    ("17 de fevereiro de 2004", dt.date(2004, 2, 17)),
]


@pytest.mark.parametrize("text,expected", CASES)
def test_locale_dates_parse(text, expected):
    assert is_parseable_date(text)
    assert parse_date(text) == expected


def test_search_dates_spans_cover_full_locale_expression():
    """The matched text must cover the WHOLE planted expression (gold
    mention offsets depend on exact span boundaries)."""
    for text, expected in CASES:
        got = search_dates(f"born {text} end")
        assert got and got[0][0] == text and got[0][1] == expected, text


def test_non_dates_still_rejected():
    for text in ["mai", "17 de 2004", "Mai Mai Mai", "17. 2004", "de mayo"]:
        assert not is_parseable_date(text), text


def test_corpus_plants_all_locales_and_dates_parse():
    """Every lang the corpus emits has parseable planted dates: generate
    pages until each locale produced at least one born_on DATE mention,
    and assert each planted DATE text parses (the gold P/R 1.0
    precondition)."""
    from pdf_entity_extraction_ray.sources.corpus import cached_catalog, generate_page

    clusters = cached_catalog(42, 25)
    seen: dict[str, int] = {}
    for idx in range(400):
        page = generate_page(idx, clusters, 42)
        for m in page.mentions:
            if m["type"] == "DATE":
                assert is_parseable_date(m["text"]), (page.lang, m["text"])
                seen[page.lang] = seen.get(page.lang, 0) + 1
    assert set(seen) >= {"en", "es", "fr", "de", "pt"}, seen


class TestRelativeDates:
    """Round-5: the dateparser RELATIVE forms (reference
    check_spark_nlp.py 'next monday'/'yesterday') with an EXPLICIT anchor
    instead of dateparser's wall clock."""

    ANCHOR = __import__("datetime").date(2024, 5, 15)  # a Wednesday

    def test_grammar(self):
        import datetime as dt

        from pdf_entity_extraction_ray.functions.dates import (
            parse_relative_date,
        )

        a = self.ANCHOR
        cases = {
            "today": a, "yesterday": a - dt.timedelta(1),
            "Tomorrow": a + dt.timedelta(1),
            # next = strictly after, last = strictly before (dateparser
            # PREFER_DATES_FROM defaults); anchor IS a Wednesday
            "next wednesday": dt.date(2024, 5, 22),
            "last wednesday": dt.date(2024, 5, 8),
            "next monday": dt.date(2024, 5, 20),
            "last sunday": dt.date(2024, 5, 12),
            "3 days ago": dt.date(2024, 5, 12),
            "1 week ago": dt.date(2024, 5, 8),
            "in 2 weeks": dt.date(2024, 5, 29),
            "in 1 day": dt.date(2024, 5, 16),
            # multilingual day words
            "ayer": a - dt.timedelta(1), "hier": a - dt.timedelta(1),
            "gestern": a - dt.timedelta(1), "ontem": a - dt.timedelta(1),
            "demain": a + dt.timedelta(1), "amanhã": a + dt.timedelta(1),
            "heute": a, "hoje": a,
        }
        for text, want in cases.items():
            assert parse_relative_date(text, a) == want, text
        assert parse_relative_date("no dates here", a) is None

    def test_anchored_entry_points(self):
        import datetime as dt

        from pdf_entity_extraction_ray.functions.dates import (
            parse_date_anchored,
            search_dates_anchored,
        )

        a = self.ANCHOR
        # absolute grammar wins and needs no anchor
        assert parse_date_anchored("2004-11-05", None) == dt.date(2004, 11, 5)
        assert parse_date_anchored("yesterday", None) is None  # legacy path
        assert parse_date_anchored("yesterday", a) == a - dt.timedelta(1)
        got = search_dates_anchored(
            "seen yesterday, due 2004-11-05, back in 2 weeks", a
        )
        assert got == [
            ("yesterday", a - dt.timedelta(1)),
            ("2004-11-05", dt.date(2004, 11, 5)),
            ("in 2 weeks", dt.date(2024, 5, 29)),
        ]

    def test_no_word_boundary_false_positives(self):
        from pdf_entity_extraction_ray.functions.dates import RELATIVE_RE

        # substrings of larger words must not trigger
        for text in ("hierarchy", "smorgasbord", "heutelike", "untoday"):
            assert RELATIVE_RE.search(text) is None, text
        # possessive/plural forms DO match the base word (span = the word)
        m = RELATIVE_RE.search("hier!")
        assert m and m.group(0) == "hier"
