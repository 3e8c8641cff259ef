"""Tests for the S4-parity sinks."""

import json

import pyarrow as pa

from pdf_entity_extraction_ray.sources.sinks import write_entities_json, write_surface_list

ENTS = pa.table(
    {
        "surface": ["Zoe", "Ana", "Ana"],
        "type": ["PERSON", "PERSON", "ORG"],
        "n_mentions": pa.array([1, 3, 2], pa.int64()),
        "pages": [["u3"], ["u1", "u2"], ["u1"]],
    }
)


def test_entities_json_sorted_and_shaped(tmp_path):
    path = str(tmp_path / "out" / "entities.json")
    n = write_entities_json(ENTS, path)
    assert n == 3
    data = json.load(open(path))
    # surface-sorted keys; last duplicate surface wins the dict slot but all
    # rows are serialized deterministically
    assert list(data) == ["Ana", "Zoe"]
    assert data["Ana"]["pages"] in (["u1", "u2"], ["u1"])
    assert data["Zoe"] == {"type": "PERSON", "n_mentions": 1, "pages": ["u3"]}


def test_surface_list(tmp_path):
    path = str(tmp_path / "surfaces.txt")
    n = write_surface_list(ENTS, path)
    assert n == 2
    assert open(path).read() == "Ana\nZoe\n"


def test_annotated_html_marks_at_offsets(tmp_path):
    from pdf_entity_extraction_ray.sources.viz import render_annotated_html, write_annotated_page

    text = "Ana Ruiz works for Acme Corp."
    mentions = [
        {"page_start": 0, "page_end": 8, "type": "PERSON"},
        {"page_start": 19, "page_end": 28, "type": "ORG"},
    ]
    out = render_annotated_html(text, mentions)
    assert ">Ana Ruiz</mark>" in out and ">Acme Corp</mark>" in out
    assert out.count("<mark") >= 2 + 5  # spans + legend
    # escaping: raw angle brackets in text never leak through
    evil = render_annotated_html("x <script> y", [])
    assert "<script>" not in evil

    p = tmp_path / "page.html"
    write_annotated_page(str(p), text, mentions)
    assert p.read_text().startswith("<!doctype html>")


def test_annotated_html_overlaps_resolved_like_m6(tmp_path):
    from pdf_entity_extraction_ray.sources.viz import render_annotated_html

    text = "abcdef"
    mentions = [
        {"page_start": 0, "page_end": 4, "type": "ORG"},
        {"page_start": 2, "page_end": 6, "type": "GPE"},  # overlaps; dropped
    ]
    out = render_annotated_html(text, mentions)
    assert ">abcd</mark>" in out and "cdef" not in out.replace("abcdef", "")
