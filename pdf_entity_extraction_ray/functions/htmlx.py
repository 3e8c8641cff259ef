"""Deterministic HTML -> canonical text extraction.

The web analog of the reference's PDF text reconstruction
(src/data_model/PdfWords.py:17-40 + the whitespace normalization at
src/ollama_entity_extraction/OllamaNERExtractor.py:199): a pure function of
the ``html`` bytes whose output is the canonical text every downstream char
offset refers to.  Must be byte-identical per url across runs / retries /
parallelism levels (BASELINE.json input_hint).

Rules (trafilatura-style, stdlib-only, deterministic):
  1. drop <script>, <style>, <noscript>, <template> elements and comments
  2. block-level tags open/close become newlines (segment boundaries)
  3. all remaining tags are stripped
  4. HTML entities are unescaped
  5. per block: whitespace collapsed (M1); empty blocks dropped
Canonical page text = blocks joined by single spaces (so offsets into page
text are stable), segment list = the blocks.
"""

from __future__ import annotations

import html as _htmlmod
import re

_DROP_RE = re.compile(
    r"<(script|style|noscript|template)\b[^>]*>.*?(?:</\1\s*>|\Z)|<!--.*?(?:-->|\Z)",
    re.IGNORECASE | re.DOTALL,
)
_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|td|th|table|section|article|"
    "header|footer|nav|aside|blockquote|pre|figure|figcaption|main|hr|title"
)
_BLOCK_RE = re.compile(r"</?(?:%s)\b[^>]*>" % _BLOCK_TAGS, re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")


def html_to_segments(html: bytes | str) -> list[str]:
    """Extract the ordered list of whitespace-normalized text blocks."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    html = _DROP_RE.sub(" ", html)
    # block boundaries come ONLY from block-level tags (sentinel \x00);
    # source newlines are ordinary whitespace (pretty-printed HTML must not
    # split a paragraph into several segments)
    html = _BLOCK_RE.sub("\x00", html)
    html = _TAG_RE.sub(" ", html)
    html = _htmlmod.unescape(html)
    segments = []
    for block in html.split("\x00"):
        norm = " ".join(block.split())
        if norm:
            segments.append(norm)
    return segments


def html_to_text(html: bytes | str) -> str:
    """Canonical page text: normalized blocks joined by single spaces.

    Equivalent to M1 over the whole visible text; byte-identical per url.
    """
    return " ".join(html_to_segments(html))
