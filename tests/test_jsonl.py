"""JSONL source/sink round-trip: binary html and timestamps must survive
the JSON interchange byte-for-byte, and a JSONL-landed corpus must drive
the extraction stage identically to the Parquet original."""

import pyarrow as pa
import ray.data

from pdf_entity_extraction_ray.sources.jsonl import read_pages_jsonl, write_pages_jsonl


def test_jsonl_roundtrip_exact(small_corpus, tmp_path):
    out = str(tmp_path / "pages_jsonl")
    pages = ray.data.read_parquet(f"{small_corpus}/pages")
    write_pages_jsonl(pages, out)

    def collect(ds):
        rows = {}
        for b in ds.iter_batches(batch_format="pyarrow"):
            for url, ts, html, text, lang in zip(
                b.column("url").to_pylist(),
                b.column("warc_ts").to_pylist(),
                b.column("html").to_pylist(),
                b.column("text").to_pylist(),
                b.column("lang").to_pylist(),
            ):
                rows[url] = (ts, html, text, lang)
        return rows

    orig = collect(pages)
    back = collect(read_pages_jsonl(out))
    assert back == orig  # bytes, timestamps, text — all exact


def test_jsonl_corpus_drives_extraction(small_corpus, tmp_path):
    from pdf_entity_extraction_ray.stages.extract import extract_text_batch

    out = str(tmp_path / "pages_jsonl2")
    write_pages_jsonl(ray.data.read_parquet(f"{small_corpus}/pages"), out)
    extracted = read_pages_jsonl(out).map_batches(extract_text_batch, batch_format="pyarrow")
    gold = {}
    for b in ray.data.read_parquet(f"{small_corpus}/pages").iter_batches(batch_format="pyarrow"):
        gold.update(zip(b.column("url").to_pylist(), b.column("text").to_pylist()))
    n = 0
    for b in extracted.iter_batches(batch_format="pyarrow"):
        for url, text in zip(b.column("url").to_pylist(), b.column("text").to_pylist()):
            assert text == gold[url]
            n += 1
    assert n == len(gold)
