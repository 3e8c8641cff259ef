"""Sequence packing — the training-data step that turns a document corpus
into fixed-token-budget training sequences (the public GPT-style recipe:
concatenate document token streams, cut every ``budget`` tokens; each
document is tagged with the bin its FIRST token lands in plus its token
offset, so a loader can assemble bins without re-tokenizing).

Distributed shape: a global concatenation order is a serial dependency, so
packing is defined PER SHARD (``shard = doc_id // shard_size`` — a
deterministic, data-independent key).  Each shard's docs are packed
independently: sort by doc_id inside the shard, exclusive-prefix-sum the
token counts, ``bin = tok_offset // budget``.  Shards are embarrassingly
parallel (one ``groupby(shard).map_groups``, vectorized cumsum inside);
bin ids are (shard, bin) pairs, and the loader treats each shard as its
own packing stream — exactly how multi-worker training shards a corpus
anyway.  Token counts use the repo-wide ``TOKEN_RE`` so the DuckDB oracle
(window-function prefix sum) reproduces every value exactly.

No reference analog (the reference emits entities, not training
sequences); part of the training-data op family the engine adds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .text import TOKEN_RE

DEFAULT_BUDGET = 512
DEFAULT_SHARD_SIZE = 100


def pack_sequences(
    docs_ds,
    budget: int = DEFAULT_BUDGET,
    shard_size: int = DEFAULT_SHARD_SIZE,
):
    """(doc_id, shard, n_tokens, tok_offset, bin) per document.

    ``tok_offset`` is the document's starting position in its shard's
    concatenated token stream; ``bin`` is ``tok_offset // budget`` — the
    training sequence the document starts in.  Per-batch token counting is
    a stateless map (the expensive part streams); only tiny
    (doc_id, shard, n_tokens) rows reach the shuffle, never text.
    """

    def count_tokens(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
        n = [len(TOKEN_RE.findall(t)) for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "shard": pa.array(ids // shard_size, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
            }
        )

    def pack_shard(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "doc_id" not in group.column_names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "shard": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "tok_offset": pa.array([], pa.int64()),
                    "bin": pa.array([], pa.int64()),
                }
            )
        # a group block may hold MANY shards (Ray batches small groups):
        # sort by (shard, doc_id) and reset the prefix sum at shard starts
        import pyarrow.compute as pc

        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("shard", "ascending"), ("doc_id", "ascending")]
            )
        )
        shard = np.asarray(g.column("shard").to_pylist(), dtype=np.int64)
        n_tok = np.asarray(g.column("n_tokens").to_pylist(), dtype=np.int64)
        csum = np.cumsum(n_tok) - n_tok  # exclusive prefix sum
        starts = np.flatnonzero(np.r_[True, shard[1:] != shard[:-1]])
        # subtract each shard's base so offsets restart per shard
        base = np.repeat(csum[starts], np.diff(np.r_[starts, len(shard)]))
        off = csum - base
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "shard": g.column("shard"),
                "n_tokens": g.column("n_tokens"),
                "tok_offset": pa.array(off, pa.int64()),
                "bin": pa.array(off // budget, pa.int64()),
            }
        )

    return (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(count_tokens, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pack_shard, batch_format="pyarrow")
    )


def pack_oracle_sql(
    budget: int = DEFAULT_BUDGET, shard_size: int = DEFAULT_SHARD_SIZE
) -> str:
    """DuckDB mirror: window-function exclusive prefix sum per shard."""
    return f"""
        with t as (select doc_id,
                          doc_id // {shard_size} as shard,
                          len(regexp_extract_all(text, '[A-Za-z0-9_]+')) as n_tokens
                   from documents),
             c as (select doc_id, shard, n_tokens,
                          coalesce(sum(n_tokens) over (
                              partition by shard order by doc_id
                              rows between unbounded preceding and 1 preceding
                          ), 0)::bigint as tok_offset
                   from t)
        select doc_id, shard, n_tokens, tok_offset,
               tok_offset // {budget} as bin
        from c
    """


def chunk_docs(docs_ds, chunk_size: int = 128, overlap: int = 32):
    """(doc_id, chunk_id, start_tok, n_tokens) — sliding-window token
    chunking with overlap, the RAG-ingestion / context-window-splitting
    step (and the document-level generalization of the tagger's M8
    segment windows, functions/spans.py).

    Deterministic layout per document: stride ``chunk_size - overlap``;
    chunk ``i`` starts at ``i * stride``; a document with ``n <=
    chunk_size`` tokens is ONE chunk; otherwise ``ceil((n - chunk_size) /
    stride) + 1`` chunks, the last one shortened to the remaining tokens
    (never an empty tail chunk, never a chunk fully contained in the
    previous one).  Pure per-document arithmetic on the repo-wide
    ``TOKEN_RE`` count -> a stateless ``map_batches``; no shuffle, and
    the SQL mirror (:func:`chunk_oracle_sql`) reproduces every integer.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap

    def chunks(batch: pa.Table) -> pa.Table:
        ids_out, cid_out, start_out, len_out = [], [], [], []
        if batch.num_rows and "text" in batch.column_names:
            for doc_id, t in zip(
                batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
            ):
                n = len(TOKEN_RE.findall((t or "").lower()))
                if n == 0:
                    continue
                k = 1 if n <= chunk_size else (n - chunk_size + stride - 1) // stride + 1
                for i in range(k):
                    start = i * stride
                    ids_out.append(doc_id)
                    cid_out.append(i)
                    start_out.append(start)
                    len_out.append(min(chunk_size, n - start))
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "chunk_id": pa.array(cid_out, pa.int64()),
                "start_tok": pa.array(start_out, pa.int64()),
                "n_tokens": pa.array(len_out, pa.int64()),
            }
        )

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        chunks, batch_format="pyarrow"
    )


def chunk_oracle_sql(
    chunk_size: int = 128,
    overlap: int = 32,
    docs_sql: str = "select doc_id, text from documents",
) -> str:
    """DuckDB mirror of :func:`chunk_docs` (same tokenizer regex, same
    integer chunk-count formula)."""
    stride = chunk_size - overlap
    return f"""
with docs as ({docs_sql}),
w as (select doc_id,
             len(regexp_extract_all(lower(text), '[a-z0-9_]+'))::bigint as n
      from docs),
c as (select doc_id, n,
             case when n = 0 then 0
                  when n <= {chunk_size} then 1
                  else (n - {chunk_size} + {stride} - 1) // {stride} + 1
             end as k
      from w)
select doc_id,
       unnest(range(k))::bigint as chunk_id,
       (unnest(range(k)) * {stride})::bigint as start_tok,
       least({chunk_size}, n - unnest(range(k)) * {stride})::bigint as n_tokens
from c where k > 0
"""
