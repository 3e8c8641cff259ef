"""Annotated-page visualization sink — the web analog of the reference's
annotated-PDF output (S6, src/save_visualization_to_pdf.py:115-133: entity
boxes drawn over the page).  Web pages have no geometry, so the analog
marks mention spans in the canonical page text with ``<mark>`` tags,
color-keyed by entity type.

Debug-path only (one document at a time, driver-side) — exactly the role
the reference's PDF sink plays.
"""

from __future__ import annotations

import html as _html

_TYPE_COLORS = {
    "PERSON": "#ffd54f",
    "ORG": "#81d4fa",
    "GPE": "#a5d6a7",
    "LAW": "#ce93d8",
    "DATE": "#ffab91",
}


def render_annotated_html(
    page_text: str, mentions: list[dict], title: str = "annotated page"
) -> str:
    """Canonical page text + mention dicts (``page_start``/``page_end``/
    ``type``) -> standalone HTML with non-overlapping marks.

    Overlaps are resolved with the reference's M6 rule (sort by
    ``(start, -length)``, greedy keep), so the rendering matches what the
    pipeline emitted."""
    spans = sorted(
        mentions, key=lambda m: (m["page_start"], -(m["page_end"] - m["page_start"]))
    )
    kept = []
    last_end = -1
    for m in spans:
        if m["page_start"] >= last_end:
            kept.append(m)
            last_end = m["page_end"]

    parts: list[str] = []
    pos = 0
    for m in kept:
        start, end = m["page_start"], m["page_end"]
        parts.append(_html.escape(page_text[pos:start]))
        color = _TYPE_COLORS.get(m["type"], "#eeeeee")
        parts.append(
            f'<mark style="background:{color}" title="{_html.escape(m["type"])}">'
            f"{_html.escape(page_text[start:end])}</mark>"
        )
        pos = end
    parts.append(_html.escape(page_text[pos:]))

    legend = " ".join(
        f'<mark style="background:{c}">{t}</mark>' for t, c in _TYPE_COLORS.items()
    )
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{_html.escape(title)}</title></head><body>"
        f"<p>{legend}</p><hr><p>{''.join(parts)}</p></body></html>"
    )


def write_annotated_page(path: str, page_text: str, mentions: list[dict], title: str = "") -> None:
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(render_annotated_html(page_text, mentions, title or path))
