"""Stage 1: HTML -> canonical text + segments (stateless map_batches).

Ray-native re-expression of the reference's text reconstruction step
(``" ".join(segment_box["text"].split())`` at
src/ollama_entity_extraction/OllamaNERExtractor.py:199 and the PDF word
extraction at src/data_model/PdfWords.py:17-40): a pure, deterministic
function of the ``html`` column, batch-at-a-time over zero-copy Arrow.

Two batch fns:

* :func:`extract_text_batch`   — pages -> (url, warc_ts, lang, text); the
  byte-identical-text-per-url invariant lives here.
* :func:`extract_segments_batch` — pages -> exploded (url, seg_id, seg_type,
  text, seg_offset) rows; ``seg_offset`` is the segment's char offset into
  the canonical page text so segment-local span offsets project onto page
  offsets by addition (replacing the reference's geometric char->bbox
  projection, src/data_model/WordBox.py:45-85 — offsets ARE the provenance).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.htmlx import html_to_segments


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """pages(url, warc_ts, html, lang, ...) -> url, warc_ts, lang, text."""
    htmls = batch.column("html").to_pylist()
    texts = [" ".join(html_to_segments(h)) for h in htmls]
    return pa.table(
        {
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "lang": batch.column("lang"),
            "text": pa.array(texts, pa.large_string()),
        }
    )


def extract_segments_batch(batch: pa.Table) -> pa.Table:
    """pages -> one row per segment with page-text offsets."""
    urls = batch.column("url").to_pylist()
    langs = batch.column("lang").to_pylist()
    htmls = batch.column("html").to_pylist()

    out_url: list[str] = []
    out_seg_id: list[int] = []
    out_lang: list[str] = []
    out_text: list[str] = []
    out_offset: list[int] = []
    for url, lang, html in zip(urls, langs, htmls):
        offset = 0
        for seg_id, seg in enumerate(html_to_segments(html)):
            out_url.append(url)
            out_seg_id.append(seg_id)
            out_lang.append(lang)
            out_text.append(seg)
            out_offset.append(offset)
            offset += len(seg) + 1  # single joining space in the page text
    return pa.table(
        {
            "url": pa.array(out_url, pa.string()),
            "seg_id": pa.array(out_seg_id, pa.int32()),
            "lang": pa.array(out_lang, pa.string()),
            "text": pa.array(out_text, pa.large_string()),
            "seg_offset": pa.array(out_offset, pa.int32()),
        }
    )
