"""CSV corpus interchange — the third interchange format beside Parquet
and JSONL (sources/jsonl.py): curation vendors and spreadsheet-side
auditors ship document tables as CSV.

``write_docs_csv`` / ``read_docs_csv`` round-trip the documents schema
byte-exactly through Ray's native CSV source/sink (Arrow CSV underneath:
the writer quotes embedded delimiters/quotes/newlines, the reader is
configured with ``newlines_in_values`` so quoted multi-line text survives).
Reference parity: the reference persists per-document caches as loose text
files (src/cache_data.py:15-16); CSV is the web-corpus equivalent of that
interchange surface.
"""

from __future__ import annotations

import pyarrow as pa
from pyarrow import csv as pacsv

DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)


def write_docs_csv(docs_ds, out_dir: str) -> None:
    """Documents dataset -> CSV shards (one file per block, streaming).

    Non-null contract (enforced): CSV cannot distinguish a null from an
    empty string — pyarrow 16's writer emits both as an empty field and
    its reader has no write-side null sentinel — so a null would come
    back as ``""`` and silently break the byte-exact roundtrip claim.
    Rows with nulls must be repaired or dropped BEFORE export."""

    def norm(batch: pa.Table) -> pa.Table:
        for f in DOCS_SCHEMA:
            nulls = batch.column(f.name).null_count
            if nulls:
                raise ValueError(
                    f"write_docs_csv: column {f.name!r} has {nulls} null(s); "
                    "CSV cannot round-trip null vs empty-string — repair or "
                    "drop null rows before export"
                )
        return pa.table(
            {f.name: batch.column(f.name).cast(f.type) for f in DOCS_SCHEMA}
        )

    docs_ds.map_batches(norm, batch_format="pyarrow").write_csv(out_dir)


def read_docs_csv(csv_dir: str):
    """CSV shards -> documents Dataset with the exact original schema.

    Types are pinned (never inferred — an all-digit text column must not
    come back as int64) and quoted newlines are legal inside values."""
    import ray.data

    return ray.data.read_csv(
        csv_dir,
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
        convert_options=pacsv.ConvertOptions(
            column_types={f.name: f.type for f in DOCS_SCHEMA}
        ),
    )
