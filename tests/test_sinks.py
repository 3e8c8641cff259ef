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
