"""Small-result sinks (reference S4 parity).

The reference materializes its corpus-level entity dictionary as an
indented, surface-sorted JSON file plus a sorted plain-text surface list
(src/ollama_entity_extraction/OllamaNERExtractor.py:27-37, sorted via
EntitiesDict.py:57-58).  Parquet is this engine's inter-phase format; these
writers exist for the human-readable exports the reference's downstream
tooling consumes.  They are DRIVER-SIDE and only for small results (the
entities table is bounded by distinct surfaces; nodes by clusters) — big
tables go through ``Dataset.write_parquet``.
"""

from __future__ import annotations

import json
import os


def _iter_rows(ds_or_table):
    import pyarrow as pa

    if isinstance(ds_or_table, pa.Table):
        yield from ds_or_table.to_pylist()
        return
    for batch in ds_or_table.iter_batches(batch_format="pyarrow"):
        yield from batch.to_pylist()


def write_entities_json(entities, path: str) -> int:
    """entities Dataset/Table -> surface-sorted indented JSON
    (``{surface: {type, n_mentions, pages, mentions, ...}}``, the
    EntitiesDict.to_dict shape).  Returns entity count."""
    rows = sorted(_iter_rows(entities), key=lambda r: (r["surface"], r["type"]))
    payload = {
        row["surface"]: {k: v for k, v in row.items() if k != "surface"} for row in rows
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=4, ensure_ascii=False, default=str)
    os.replace(tmp, path)
    return len(rows)


def write_surface_list(entities, path: str) -> int:
    """Sorted distinct surface list, one per line (the reference's .txt
    export, OllamaNERExtractor.py:30-37)."""
    surfaces = sorted({row["surface"] for row in _iter_rows(entities)})
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(surfaces) + ("\n" if surfaces else ""))
    os.replace(tmp, path)
    return len(surfaces)


def compact_parquet(in_dir: str, out_dir: str, *, target_rows_per_file: int = 100_000) -> None:
    """Small-files compaction — the table-maintenance pass every long-
    running Parquet lake needs: re-write a directory of many small files
    into ~``target_rows_per_file``-row files.  Content-preserving by
    construction (a streamed read -> write, no driver materialization);
    the repartition is metadata-driven (row-count split, no shuffle).

    Idempotence/resume story: the write lands in a fresh ``out_dir`` (the
    caller swaps directories atomically after success) rather than
    rewriting in place — a crashed compaction never corrupts the source."""
    import ray.data

    ds = ray.data.read_parquet(in_dir)
    ds.write_parquet(out_dir, min_rows_per_file=target_rows_per_file)
