"""Fused annotation stage: segments -> (mentions, triples) in ONE tagging
pass.

The tagger is the dominant cost of the pipeline (the reference's model
inference, SURVEY §6); running it once and materializing a nested
per-segment row is strictly cheaper than the naive two-phase layout
(mentions phase + triples phase each re-tagging every segment).  The flat
``mentions`` / ``triples`` deliverable tables are cheap explode
projections of this artifact.

Per-segment nesting also guarantees a segment's mentions can never split
across batch boundaries (the correctness hazard the fused RelationExtractor
avoided, stages/relations.py docstring).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from .relations import TRIPLES_SCHEMA, triples_from_spans
from .tagger import MENTIONS_SCHEMA, TITLE_CASED_TYPES, GazetteerTagger

_MENTION_STRUCT = pa.struct(
    [
        ("text", pa.string()),
        ("surface", pa.string()),
        ("type", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
    ]
)
_TRIPLE_STRUCT = pa.struct(
    [
        ("subj", pa.string()),
        ("subj_type", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_type", pa.string()),
        ("obj_norm", pa.string()),
        ("evidence_start", pa.int32()),
        ("evidence_end", pa.int32()),
    ]
)
_TRIPLE_FIELDS = [f.name for f in _TRIPLE_STRUCT]

ANNOTATIONS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("seg_id", pa.int32()),
        ("lang", pa.string()),
        ("seg_offset", pa.int32()),
        ("mentions", pa.list_(_MENTION_STRUCT)),
        ("triples", pa.list_(_TRIPLE_STRUCT)),
    ]
)


class Annotator:
    """Actor-pool stage: one tagging pass per segment -> nested row.

    When ``n_buckets`` is set, the url-hash ``bucket`` partition column is
    computed inline (a separate trivial map operator costs more in task
    overhead than its work, measured via ``ds.stats()``).
    """

    def __init__(self, gazetteer: list[tuple[str, str]], n_buckets: int = 0, **tagger_kwargs):
        self.tagger = GazetteerTagger(gazetteer, **tagger_kwargs)
        self.n_buckets = n_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {name: [] for name in ANNOTATIONS_SCHEMA.names}
        for url, seg_id, lang, text, seg_offset in zip(
            batch.column("url").to_pylist(),
            batch.column("seg_id").to_pylist(),
            batch.column("lang").to_pylist(),
            batch.column("text").to_pylist(),
            batch.column("seg_offset").to_pylist(),
        ):
            spans = self.tagger.tag_segment(text)
            mentions = []
            for span in spans:
                surface = span["text"]
                if span["entity_label"] in TITLE_CASED_TYPES:
                    surface = surface.title()  # M13
                mentions.append(
                    {
                        "text": span["text"],
                        "surface": surface,
                        "type": span["entity_label"],
                        "start": span["start_index"],
                        "end": span["end_index"],
                    }
                )
            triples = [
                {k: t[k] for k in _TRIPLE_FIELDS} for t in triples_from_spans(text, spans)
            ]
            out["url"].append(url)
            out["seg_id"].append(seg_id)
            out["lang"].append(lang)
            out["seg_offset"].append(seg_offset)
            out["mentions"].append(mentions)
            out["triples"].append(triples)
        tbl = pa.table(
            {n: pa.array(out[n], ANNOTATIONS_SCHEMA.field(n).type) for n in ANNOTATIONS_SCHEMA.names}
        )
        if self.n_buckets:
            from ..state.lineage import url_bucket

            tbl = tbl.append_column(
                "bucket",
                pa.array([url_bucket(u, self.n_buckets) for u in out["url"]], pa.int32()),
            )
        return tbl


def explode_mentions_batch(batch: pa.Table) -> pa.Table:
    """annotations -> flat MENTIONS_SCHEMA rows (+ passthrough ``bucket``)."""
    cols: dict[str, list] = {name: [] for name in MENTIONS_SCHEMA.names}
    buckets: list[int] = []
    has_bucket = "bucket" in batch.column_names
    bucket_vals = batch.column("bucket").to_pylist() if has_bucket else None
    for i, (url, seg_id, lang, seg_offset, mentions) in enumerate(
        zip(
            batch.column("url").to_pylist(),
            batch.column("seg_id").to_pylist(),
            batch.column("lang").to_pylist(),
            batch.column("seg_offset").to_pylist(),
            batch.column("mentions").to_pylist(),
        )
    ):
        for m in mentions:
            key = f"{url}\x00{seg_id}\x00{m['start']}".encode()
            cols["url"].append(url)
            cols["seg_id"].append(seg_id)
            cols["lang"].append(lang)
            cols["mention_id"].append(
                int.from_bytes(hashlib.blake2b(key, digest_size=8).digest(), "little")
                & 0x7FFFFFFFFFFFFFFF
            )
            cols["text"].append(m["text"])
            cols["surface"].append(m["surface"])
            cols["type"].append(m["type"])
            cols["start"].append(m["start"])
            cols["end"].append(m["end"])
            cols["page_start"].append(seg_offset + m["start"])
            cols["page_end"].append(seg_offset + m["end"])
            if has_bucket:
                buckets.append(bucket_vals[i])
    tbl = pa.table(
        {n: pa.array(cols[n], MENTIONS_SCHEMA.field(n).type) for n in MENTIONS_SCHEMA.names}
    )
    if has_bucket:
        tbl = tbl.append_column("bucket", pa.array([str(b) for b in buckets], pa.string()))
    return tbl


def explode_triples_batch(batch: pa.Table) -> pa.Table:
    """annotations -> flat TRIPLES_SCHEMA rows (+ passthrough ``bucket``)."""
    cols: dict[str, list] = {name: [] for name in TRIPLES_SCHEMA.names}
    buckets: list[int] = []
    has_bucket = "bucket" in batch.column_names
    bucket_vals = batch.column("bucket").to_pylist() if has_bucket else None
    for i, (url, seg_id, triples) in enumerate(
        zip(
            batch.column("url").to_pylist(),
            batch.column("seg_id").to_pylist(),
            batch.column("triples").to_pylist(),
        )
    ):
        for t in triples:
            cols["url"].append(url)
            cols["seg_id"].append(seg_id)
            for k in _TRIPLE_FIELDS:
                cols[k].append(t[k])
            if has_bucket:
                buckets.append(bucket_vals[i])
    tbl = pa.table(
        {n: pa.array(cols[n], TRIPLES_SCHEMA.field(n).type) for n in TRIPLES_SCHEMA.names}
    )
    if has_bucket:
        tbl = tbl.append_column("bucket", pa.array([str(b) for b in buckets], pa.string()))
    return tbl
