"""JSONL page corpus interchange (the web-corpus sibling of the Parquet
source: Common-Crawl-style extraction dumps ship as JSONL).

The reference reads/writes per-document JSON caches and label text files
(src/cache_data.py:15-16, run.py:24-27); here the same interchange is a
Dataset-level source/sink: ``write_pages_jsonl`` / ``read_pages_jsonl``
round-trip the pages schema exactly (binary ``html`` travels base64,
``warc_ts`` travels ISO-8601 — JSON carries neither bytes nor timestamps
natively), so a JSONL-landed crawl drops into ``run_kg`` unchanged.
"""

from __future__ import annotations

import base64
import datetime as _dt

import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)


def pages_to_jsonl_batch(batch: pa.Table) -> pa.Table:
    """pages batch -> JSON-safe columns (html base64, warc_ts ISO)."""
    return pa.table(
        {
            "url": batch.column("url"),
            "warc_ts": pa.array(
                [t.isoformat() for t in batch.column("warc_ts").to_pylist()], pa.string()
            ),
            "html_b64": pa.array(
                [base64.b64encode(h).decode("ascii") for h in batch.column("html").to_pylist()],
                pa.string(),
            ),
            "text": batch.column("text").cast(pa.string()),
            "lang": batch.column("lang"),
        }
    )


def jsonl_to_pages_batch(batch: pa.Table) -> pa.Table:
    """JSONL batch -> the exact pages schema (bytes + timestamps restored).

    The Arrow JSON reader may auto-infer ISO strings as timestamps —
    accept either representation."""
    ts_col = batch.column("warc_ts")
    if pa.types.is_timestamp(ts_col.type):
        warc_ts = ts_col.cast(pa.timestamp("us"))
    else:
        warc_ts = pa.array(
            [_dt.datetime.fromisoformat(t) for t in ts_col.to_pylist()],
            pa.timestamp("us"),
        )
    return pa.table(
        {
            "url": batch.column("url").cast(pa.string()),
            "warc_ts": warc_ts,
            "html": pa.array(
                [base64.b64decode(h) for h in batch.column("html_b64").to_pylist()],
                pa.binary(),
            ),
            "text": batch.column("text").cast(pa.large_string()),
            "lang": batch.column("lang").cast(pa.string()),
        }
    )


def write_pages_jsonl(pages_ds, out_dir: str) -> None:
    """pages Dataset -> JSONL files (streaming; one file per block)."""
    pages_ds.map_batches(pages_to_jsonl_batch, batch_format="pyarrow").write_json(out_dir)


def read_pages_jsonl(path: str):
    """JSONL dir/files -> pages Dataset with the canonical schema."""
    import ray.data

    return ray.data.read_json(path).map_batches(jsonl_to_pages_batch, batch_format="pyarrow")
