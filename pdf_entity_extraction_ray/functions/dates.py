"""Deterministic date detection/parsing (stand-in for ``dateparser``).

The reference filters candidate spans through
``dateparser.search.search_dates`` (M9: src/methods/FlairDateParserModel.py:30-36,
src/methods/MultipleEntityExtractor.py:60-63, src/methods/DateParser.py:44-50,
including Spanish via ``languages=["es"]``).  ``dateparser`` is not available
in this environment and is non-deterministic anyway (relative dates use wall
clock), so this module provides a deterministic regex-based parser covering
the absolute-date formats the pipeline plants: no wall clock, no locale state,
same result on every worker.
"""

from __future__ import annotations

import datetime as _dt
import re

_MONTHS_EN = {
    "january": 1, "february": 2, "march": 3, "april": 4, "may": 5, "june": 6,
    "july": 7, "august": 8, "september": 9, "october": 10, "november": 11,
    "december": 12,
}
_MONTHS_ES = {
    "enero": 1, "febrero": 2, "marzo": 3, "abril": 4, "mayo": 5, "junio": 6,
    "julio": 7, "agosto": 8, "septiembre": 9, "octubre": 10, "noviembre": 11,
    "diciembre": 12,
}
# the other web-major locales the corpus's ``lang`` column carries
# (dateparser's zoo covers these via languages=[...]; the deterministic
# grammar lists each month name plus its accent-stripped variant, since
# real crawl text is sloppy about diacritics)
_MONTHS_FR = {
    "janvier": 1, "février": 2, "fevrier": 2, "mars": 3, "avril": 4,
    "mai": 5, "juin": 6, "juillet": 7, "août": 8, "aout": 8,
    "septembre": 9, "octobre": 10, "novembre": 11, "décembre": 12,
    "decembre": 12,
}
_MONTHS_DE = {
    "januar": 1, "februar": 2, "märz": 3, "marz": 3, "april": 4, "mai": 5,
    "juni": 6, "juli": 7, "august": 8, "september": 9, "oktober": 10,
    "november": 11, "dezember": 12,
}
_MONTHS_PT = {
    "janeiro": 1, "fevereiro": 2, "março": 3, "marco": 3, "abril": 4,
    "maio": 5, "junho": 6, "julho": 7, "agosto": 8, "setembro": 9,
    "outubro": 10, "novembro": 11, "dezembro": 12,
}
_MONTHS = {**_MONTHS_EN, **_MONTHS_ES, **_MONTHS_FR, **_MONTHS_DE, **_MONTHS_PT}
_MONTH_ALT = "|".join(sorted(_MONTHS, key=len, reverse=True))

# "November 5, 2004" | "5 November 2004" | "5 de noviembre de 2004" |
# "5 mai 2004" | "5. Mai 2004" (German ordinal dot) | "5 de maio de 2004" |
# "2004-11-05" | "11/05/2004"
DATE_RE = re.compile(
    r"(?:(?P<m1>%(m)s)\s+(?P<d1>\d{1,2})(?:\s*,)?\s+(?P<y1>\d{4}))"
    r"|(?:(?P<d2>\d{1,2})\.?\s+(?:de\s+)?(?P<m2>%(m)s)(?:\s+de)?\s+(?P<y2>\d{4}))"
    r"|(?P<y3>\d{4})-(?P<mo3>\d{2})-(?P<d3>\d{2})"
    r"|(?P<mo4>\d{1,2})/(?P<d4>\d{1,2})/(?P<y4>\d{4})" % {"m": _MONTH_ALT},
    re.IGNORECASE,
)


def parse_date(text: str) -> _dt.date | None:
    """Parse a single date expression; None when not a recognized date."""
    match = DATE_RE.search(text)
    if not match:
        return None
    g = match.groupdict()
    try:
        if g["m1"]:
            return _dt.date(int(g["y1"]), _MONTHS[g["m1"].lower()], int(g["d1"]))
        if g["m2"]:
            return _dt.date(int(g["y2"]), _MONTHS[g["m2"].lower()], int(g["d2"]))
        if g["y3"]:
            return _dt.date(int(g["y3"]), int(g["mo3"]), int(g["d3"]))
        return _dt.date(int(g["y4"]), int(g["mo4"]), int(g["d4"]))
    except ValueError:
        return None


def is_parseable_date(text: str) -> bool:
    """M9 predicate: keep candidate span iff it parses as a date
    (reference: ``search_dates(text)`` truthy)."""
    return parse_date(text) is not None


def search_dates(text: str) -> list[tuple[str, _dt.date]]:
    """All date expressions in ``text`` as ``(matched_text, date)`` in
    occurrence order — the shape of ``dateparser.search.search_dates``."""
    out: list[tuple[str, _dt.date]] = []
    for match in DATE_RE.finditer(text):
        parsed = parse_date(match.group(0))
        if parsed is not None:
            out.append((match.group(0), parsed))
    return out
