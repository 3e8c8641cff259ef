"""WARC source/sink — Common Crawl's native container format.

The reference ingests PDFs via a subprocess reader and re-reads its own
JSON caches (``/root/reference/src/data_model/PdfWords.py:17-53``,
``src/cache_data.py:13-21``); the web-scale analog of "read the corpus in
its native wire format" is WARC: each page is one ``response`` record
(WARC/1.0 headers + an HTTP/1.1 response whose body is the raw html).

``write_warc`` renders a pages Dataset to ``.warc`` shard files (one per
input block, stdlib-only, deterministic record bytes); ``read_warc``
parses them back distributed — ``ray.data.read_binary_files`` hands each
task whole files, the parse walks records via their declared
``Content-Length`` (never scanning for separators inside payloads, so
binary html with embedded CRLFCRLF is safe).  Roundtrip contract:
``read_warc(write_warc(pages))`` re-yields exactly ``(url, warc_ts,
html)``.

At 100 TB this is the INPUT format: files are the natural parallelism
unit (CC shards are ~1 GB), each parse task is one file, and the
downstream pipeline is identical to the Parquet path.
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timezone

import pyarrow as pa

_TS_FMT = "%Y-%m-%dT%H:%M:%S.%fZ"


def _record(url: str, ts_us: int, html: bytes) -> bytes:
    """One WARC/1.0 response record wrapping an HTTP/1.1 response."""
    dt = datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc)
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        + f"Content-Length: {len(html)}\r\n\r\n".encode()
        + html
    )
    rid = hashlib.blake2b(
        f"{url}|{ts_us}".encode(), digest_size=16
    ).hexdigest()
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {dt.strftime(_TS_FMT)}\r\n"
        f"WARC-Record-ID: <urn:hash:{rid}>\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return head + http + b"\r\n\r\n"


def write_warc(pages_ds, out_dir: str) -> int:
    """Render ``(url, warc_ts, html)`` rows to ``.warc`` shard files under
    ``out_dir`` (one file per input block, named by a content digest so a
    re-run over identical data is byte-idempotent).  Returns the number
    of records written.  A ``_WARC_DONE`` marker lands last so partially
    written directories are never mistaken for complete ones."""
    import ray.data  # noqa: F401  (caller owns the session)

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        urls = batch.column("url").to_pylist()
        ts = batch.column("warc_ts").cast(pa.int64()).to_pylist()
        htmls = batch.column("html").to_pylist()
        blob = b"".join(_record(u, t, h) for u, t, h in zip(urls, ts, htmls))
        digest = hashlib.blake2b(blob, digest_size=12).hexdigest()
        path = os.path.join(out_dir, f"part-{digest}.warc")
        if not os.path.exists(path):  # idempotent resume
            tmp = f"{path}.tmp-{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(blob)
            os.replace(tmp, path)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    total = (
        pages_ds.select_columns(["url", "warc_ts", "html"])
        .map_batches(write_batch, batch_format="pyarrow")
        .sum("n")
    )
    with open(os.path.join(out_dir, "_WARC_DONE"), "w") as fh:
        fh.write(str(int(total or 0)))
    return int(total or 0)


def _parse_warc_bytes(data: bytes) -> pa.Table:
    """Parse one WARC file's bytes -> (url, warc_ts_us, html) columns.
    Walks records by declared Content-Length; per-record Python is fine
    (records are KB-to-MB; the parallelism unit is the FILE)."""
    urls: list[str] = []
    ts: list[int] = []
    htmls: list[bytes] = []
    pos = 0
    n = len(data)
    while pos < n:
        end = data.find(b"\r\n\r\n", pos)
        if end < 0:
            break
        headers: dict[str, str] = {}
        head_lines = data[pos:end].decode("utf-8", "replace").split("\r\n")
        if not head_lines or not head_lines[0].startswith("WARC/"):
            raise ValueError(f"malformed WARC record header at byte {pos}")
        for line in head_lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers["content-length"])
        body = data[end + 4 : end + 4 + length]
        pos = end + 4 + length
        # skip the inter-record CRLFCRLF separator
        if data[pos : pos + 4] == b"\r\n\r\n":
            pos += 4
        if headers.get("warc-type") != "response":
            continue
        http_split = body.find(b"\r\n\r\n")
        html = body[http_split + 4 :] if http_split >= 0 else b""
        dt = datetime.strptime(headers["warc-date"], _TS_FMT).replace(
            tzinfo=timezone.utc
        )
        urls.append(headers["warc-target-uri"])
        ts.append(int(dt.timestamp() * 1_000_000))
        htmls.append(html)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
        }
    )


def read_warc(warc_dir: str):
    """Distributed WARC reader: one parse task per ``.warc`` file ->
    Dataset(url, warc_ts, html)."""
    import ray.data

    if not os.path.exists(os.path.join(warc_dir, "_WARC_DONE")):
        raise FileNotFoundError(
            f"{warc_dir} has no _WARC_DONE marker — incomplete WARC sink"
        )

    def parse(batch: dict) -> pa.Table:
        tables = [_parse_warc_bytes(bytes(b)) for b in batch["bytes"]]
        return pa.concat_tables(tables) if tables else _parse_warc_bytes(b"")

    files = ray.data.read_binary_files(
        [
            os.path.join(warc_dir, f)
            for f in sorted(os.listdir(warc_dir))
            if f.endswith(".warc")
        ]
    )
    return files.map_batches(parse, batch_format="numpy")


_SURT_RE = None  # compiled lazily (module import stays cheap)


def surt_key(url: str) -> str:
    """SURT-style CDX url key: reversed dot-split lowercase host joined
    with commas, then ``)`` and the path+query (port dropped — the corpus
    carries none; the oracle mirrors the same rule).  '' for non-urls."""
    global _SURT_RE
    if _SURT_RE is None:
        import re

        _SURT_RE = re.compile(
            r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)(:\d+)?([^#]*)"
        )
    m = _SURT_RE.match(url)
    if not m:
        return ""
    host, _port, rest = m.group(1).lower(), m.group(2), m.group(3)
    return ",".join(reversed(host.split("."))) + ")" + (rest or "/")


def cdx_index(warc_dir: str):
    """CDX-style capture index over a WARC directory — the standard
    web-archive lookup table (urlkey, timestamp, location): one parse
    task per ``.warc`` file (the same file-level parallelism contract as
    :func:`read_warc`), each walking its records by declared
    Content-Length while tracking byte offsets.

    Emits ``(urlkey, ts14, url, n_bytes, digest_md5, warc_file, offset,
    record_len)`` — urlkey/ts14/url/n_bytes/digest_md5 are pure functions
    of the page row (the DuckDB-mirrorable projection the registry query
    selects); warc_file/offset/record_len depend on shard layout and are
    covered by the seek-and-reparse unit test instead."""
    import hashlib as _hl

    import ray.data

    if not os.path.exists(os.path.join(warc_dir, "_WARC_DONE")):
        raise FileNotFoundError(
            f"{warc_dir} has no _WARC_DONE marker — incomplete WARC sink"
        )

    def index_one(path: str, data: bytes) -> pa.Table:
        ks, ts14s, us, nb, dg, off, rl = [], [], [], [], [], [], []
        pos = 0
        n = len(data)
        fname = os.path.basename(path)
        while pos < n:
            start = pos
            end = data.find(b"\r\n\r\n", pos)
            if end < 0:
                break
            headers: dict[str, str] = {}
            head_lines = data[pos:end].decode("utf-8", "replace").split("\r\n")
            if not head_lines or not head_lines[0].startswith("WARC/"):
                raise ValueError(f"malformed WARC record header at byte {pos}")
            for line in head_lines[1:]:
                k, _, v = line.partition(":")
                headers[k.strip().lower()] = v.strip()
            length = int(headers["content-length"])
            body = data[end + 4 : end + 4 + length]
            pos = end + 4 + length
            if data[pos : pos + 4] == b"\r\n\r\n":
                pos += 4
            if headers.get("warc-type") != "response":
                continue
            http_split = body.find(b"\r\n\r\n")
            html = body[http_split + 4 :] if http_split >= 0 else b""
            dt = datetime.strptime(headers["warc-date"], _TS_FMT).replace(
                tzinfo=timezone.utc
            )
            url = headers["warc-target-uri"]
            ks.append(surt_key(url))
            ts14s.append(dt.strftime("%Y%m%d%H%M%S"))
            us.append(url)
            nb.append(len(html))
            dg.append(_hl.md5(html).hexdigest())
            off.append(start)
            rl.append(pos - start)
        return pa.table(
            {
                "urlkey": pa.array(ks, pa.string()),
                "ts14": pa.array(ts14s, pa.string()),
                "url": pa.array(us, pa.string()),
                "n_bytes": pa.array(nb, pa.int64()),
                "digest_md5": pa.array(dg, pa.string()),
                "warc_file": pa.array([fname] * len(ks), pa.string()),
                "offset": pa.array(off, pa.int64()),
                "record_len": pa.array(rl, pa.int64()),
            }
        )

    def parse(batch: dict) -> pa.Table:
        tables = [
            index_one(p, bytes(b)) for p, b in zip(batch["path"], batch["bytes"])
        ]
        return pa.concat_tables(tables) if tables else index_one("", b"")

    files = ray.data.read_binary_files(
        [
            os.path.join(warc_dir, f)
            for f in sorted(os.listdir(warc_dir))
            if f.endswith(".warc")
        ],
        include_paths=True,
    )
    return files.map_batches(parse, batch_format="numpy")
