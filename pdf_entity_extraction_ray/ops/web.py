"""Web-corpus operators over the pages table ``(url, warc_ts, html, text,
lang)`` — the host-level views a Common-Crawl-style pipeline runs before
anything else (per-host page budgets, spam/robots domain filtering, crawl
freshness auditing).

URL parsing is a single vectorized RE2 ``pc.extract_regex`` over the Arrow
url column — never a Python ``urlparse`` per row — and the aggregation is
the standard two-stage shape: per-batch Arrow ``group_by`` combiners emit
one row per distinct host per block (a 10^9-page host ships O(blocks)
partials, not raw rows), then a small global groupby folds them.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_HOST_PATTERN = r"^[a-z][a-z0-9+.-]*://(?P<host>[^/?#]+)"


def host_of(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized scheme-stripped authority (host[:port]) of each url;
    empty string where the url has no scheme://authority prefix."""
    ex = pc.extract_regex(urls, pattern=_HOST_PATTERN)
    return pc.fill_null(pc.struct_field(ex, "host"), "")


def host_stats(pages_ds):
    """pages -> one row per host: page count, total extracted-text chars,
    first/last crawl timestamp (epoch microseconds — integer columns so
    the DuckDB oracle compares exactly)."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        cols = {
            "host": pa.array([], pa.string()),
            "n_pages": pa.array([], pa.int64()),
            "text_chars": pa.array([], pa.int64()),
            "first_crawl_us": pa.array([], pa.int64()),
            "last_crawl_us": pa.array([], pa.int64()),
        }
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return pa.table(cols)
        t = pa.table(
            {
                "host": host_of(batch.column("url")),
                "chars": pc.utf8_length(batch.column("text")).cast(pa.int64()),
                "ts": batch.column("warc_ts").cast(pa.int64()),
            }
        )
        g = t.group_by("host").aggregate(
            [("chars", "count"), ("chars", "sum"), ("ts", "min"), ("ts", "max")]
        )
        return pa.table(
            {
                "host": g.column("host"),
                "n_pages": g.column("chars_count").cast(pa.int64()),
                "text_chars": g.column("chars_sum").cast(pa.int64()),
                "first_crawl_us": g.column("ts_min"),
                "last_crawl_us": g.column("ts_max"),
            }
        )

    return (
        pages_ds.select_columns(["url", "warc_ts", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("n_pages", alias_name="n_pages"),
            Sum("text_chars", alias_name="text_chars"),
            Min("first_crawl_us", alias_name="first_crawl_us"),
            Max("last_crawl_us", alias_name="last_crawl_us"),
        )
    )
