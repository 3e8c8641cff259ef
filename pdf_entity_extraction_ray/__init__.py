"""Ray-Data-native knowledge-graph construction engine.

A from-scratch re-expression of the data-processing capabilities of
``ali6parmak/pdf-entity-extraction`` (reference at /root/reference, read-only)
as idiomatic Ray Data pipelines over Common-Crawl-style web-page Parquet:

  pages(url, warc_ts, html, text, lang)
    -> extract_text (stateless map_batches, byte-identical per url)
    -> segments -> mentions (actor-pool tagger + reference span semantics)
    -> triples (sentence-scoped pattern relation extraction)
    -> entity linking (groupby shuffle + MinHash-LSH blocking + union-find)
    -> nodes / edges Parquet.

Subpackages:
  functions/  pure, deterministic per-row/per-batch functions (the reference
              semantics live here; unit-tested table-driven)
  stages/     Ray Data stage callables (stateless fns + actor-pool classes)
  sources/    corpus synthesis + parquet readers
  pipelines/  end-to-end pipeline drivers (lazy Dataset plans)
  state/      lineage manifests, checkpoint/resume
"""

__version__ = "0.1.0"
