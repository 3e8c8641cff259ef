"""Distributed BPE tokenizer training — the iterative merge-learning
primitive (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units") that `vocab_build` (word-level ids) stops
short of.

Why this shape at 100 TB
------------------------
BPE iterations never touch the corpus: the ONE corpus-wide pass is the
word-count groupby (tokens -> distinct (word, n)), after which training
runs over the *distinct-word* table — orders of magnitude smaller than
the corpus and explicitly boundable with ``min_count`` (exactly how
production trainers work: SentencePiece/HF tokenizers hold this table in
one process; here it is sharded across actors so word storage and merge
application scale out).

The loop is the one place the Dataset API is the wrong tool (per-round
operator setup cost x thousands of merge rounds), so it drops to raw
Ray actors — the brief's "shared mutable index" escape hatch:

* each ``_BPEShard`` actor holds a disjoint slice of the word table as
  mutable state (symbol sequences + a pair -> word inverted index),
* per round the driver pops the globally best pair from a lazy max-heap
  (count desc, then lexicographic — deterministic ties), broadcasts ONE
  merge, and receives per-shard pair-count DELTAS (only pairs adjacent
  to an actual occurrence change, so round cost is O(occurrences), not
  O(vocabulary)),
* driver state is the aggregated pair-count dict — bounded by the
  distinct adjacent symbol pairs of the (min_count-pruned) word
  universe, the same bound every single-process BPE trainer pays.

Words are independent under BPE (pair counts and merge application are
per-word), so shard assignment is round-robin by block — no hash
co-location, no shuffle after the initial count.

Encoding (``encode_bpe``) is a stateless streaming ``map_batches`` with
a per-actor word -> tokens memo; Zipf makes the memo hit rate ~99% so a
100-TB corpus encodes at word-count lookup speed.

``train_bpe_reference`` / ``write_gold_bpe`` are the single-process
mirrors backing the DuckDB oracle: the driver gate proves the
distributed trainer/encoder byte-equal to them.
"""

from __future__ import annotations

import hashlib
import heapq
from collections import Counter

import pyarrow as pa

from .text import TOKEN_RE

EOW = "</w>"  # end-of-word marker symbol (Sennrich-style)


# ---------------------------------------------------------------------------
# pure per-word kernels (shared by the distributed shards, the reference
# trainer, and the encoder — the distributed MACHINERY is what the oracle
# gate tests; these semantics are pinned by hand-computed unit tests)
# ---------------------------------------------------------------------------


def word_symbols(word: str) -> tuple[str, ...]:
    """Initial symbol sequence of a word: its characters + ``</w>``."""
    return tuple(word) + (EOW,)


def _pair_multiset(syms: tuple[str, ...]) -> Counter:
    return Counter(zip(syms, syms[1:]))


def merge_word(syms: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    """Left-to-right single pass replacing adjacent (left, right) with the
    concatenated symbol (overlaps resolve leftmost-first: 'aaa' under
    (a,a) -> ('aa','a'))."""
    merged = left + right
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def encode_word(word: str, rank_of: dict[tuple[str, str], int]) -> tuple[str, ...]:
    """Apply learned merges to one word, always merging the lowest-rank
    applicable pair first (the standard BPE inference order)."""
    syms = word_symbols(word)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for p in zip(syms, syms[1:]):
            r = rank_of.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        syms = merge_word(syms, best_pair[0], best_pair[1])
    return syms


class _ShardState:
    """Mutable word-table slice: the unit of both the remote shard actor
    and the single-process reference trainer."""

    def __init__(self, words: list[str], counts: list[int]):
        self.syms: list[tuple[str, ...]] = [word_symbols(w) for w in words]
        self.n: list[int] = list(counts)
        # pair -> set of word indices currently containing that pair
        self.index: dict[tuple[str, str], set[int]] = {}
        for i, s in enumerate(self.syms):
            for p in zip(s, s[1:]):
                self.index.setdefault(p, set()).add(i)

    def pair_counts(self) -> dict[tuple[str, str], int]:
        out: Counter = Counter()
        for s, n in zip(self.syms, self.n):
            for p, c in _pair_multiset(s).items():
                out[p] += c * n
        return dict(out)

    def apply_merge(self, left: str, right: str) -> dict[tuple[str, str], int]:
        """Merge (left, right) in every word containing it; return the
        pair-count DELTA this shard contributes (new minus old adjacency
        multisets of only the changed words, weighted by word count)."""
        affected = self.index.pop((left, right), set())
        delta: Counter = Counter()
        for i in affected:
            old = self.syms[i]
            new = merge_word(old, left, right)
            self.syms[i] = new
            n = self.n[i]
            old_p, new_p = _pair_multiset(old), _pair_multiset(new)
            for p, c in new_p.items():
                delta[p] += c * n
            for p, c in old_p.items():
                delta[p] -= c * n
            # maintain the inverted index for pairs entering/leaving word i
            for p in new_p.keys() - old_p.keys():
                self.index.setdefault(p, set()).add(i)
            for p in old_p.keys() - new_p.keys():
                if p != (left, right):
                    s = self.index.get(p)
                    if s is not None:
                        s.discard(i)
                        if not s:
                            del self.index[p]
        return {p: d for p, d in delta.items() if d}


def _merge_loop(
    full_counts: dict[tuple[str, str], int],
    apply_fn,
    n_merges: int,
    min_pair_count: int,
) -> list[tuple[int, str, str, int]]:
    """Driver-side argmax loop shared by the distributed and reference
    trainers.  ``apply_fn(left, right) -> delta dict`` mutates the word
    state; the lazy max-heap re-validates stale entries against the live
    count dict.  Ties break (count desc, left asc, right asc) —
    deterministic regardless of shard layout."""
    counts: dict[tuple[str, str], int] = dict(full_counts)
    heap = [(-c, p[0], p[1]) for p, c in counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        best = None
        while heap:
            negc, l, r = heapq.heappop(heap)
            if counts.get((l, r), 0) == -negc and -negc > 0:
                best = (l, r, -negc)
                break
        if best is None or best[2] < min_pair_count:
            break
        l, r, c = best
        merges.append((rank, l, r, c))
        counts.pop((l, r), None)
        for p, d in apply_fn(l, r).items():
            if p == (l, r):
                continue
            nc = counts.get(p, 0) + d
            if nc > 0:
                counts[p] = nc
                heapq.heappush(heap, (-nc, p[0], p[1]))
            else:
                counts.pop(p, None)
    return merges


def _merges_table(merges: list[tuple[int, str, str, int]]) -> pa.Table:
    return pa.table(
        {
            "merge_rank": pa.array([m[0] for m in merges], pa.int64()),
            "lhs": pa.array([m[1] for m in merges], pa.string()),
            "rhs": pa.array([m[2] for m in merges], pa.string()),
            "n": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# single-process reference (gold mirror)
# ---------------------------------------------------------------------------


def train_bpe_reference(
    word_counts: dict[str, int], n_merges: int = 200, min_pair_count: int = 2
) -> pa.Table:
    """Exact single-process trainer over a word-frequency dict — the
    oracle mirror for :func:`train_bpe`."""
    words = sorted(word_counts)
    st = _ShardState(words, [word_counts[w] for w in words])
    merges = _merge_loop(st.pair_counts(), st.apply_merge, n_merges, min_pair_count)
    return _merges_table(merges)


def token_fingerprint(tokens: tuple[str, ...]) -> str:
    return hashlib.md5(" ".join(tokens).encode("utf-8")).hexdigest()


def write_gold_bpe(
    docs_parquet: str,
    out_dir: str,
    n_merges: int = 200,
    min_pair_count: int = 2,
) -> None:
    """Single-process gold: train merges and encode every document, no
    Ray anywhere — what the distributed ops must reproduce byte-exactly."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(docs_parquet, columns=["doc_id", "text"])
    wc: Counter = Counter()
    doc_tokens: list[tuple[int, list[str]]] = []
    for doc_id, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        toks = TOKEN_RE.findall(text.lower())
        wc.update(toks)
        doc_tokens.append((doc_id, toks))
    merges = train_bpe_reference(dict(wc), n_merges=n_merges, min_pair_count=min_pair_count)
    pq.write_table(merges, f"{out_dir}/gold_merges.parquet")

    rank_of = {
        (l, r): k
        for k, (l, r) in enumerate(
            zip(merges.column("lhs").to_pylist(), merges.column("rhs").to_pylist())
        )
    }
    memo: dict[str, tuple[str, ...]] = {}
    ids, n_tok, fps = [], [], []
    for doc_id, toks in doc_tokens:
        pieces: list[str] = []
        for w in toks:
            enc = memo.get(w)
            if enc is None:
                enc = encode_word(w, rank_of)
                memo[w] = enc
            pieces.extend(enc)
        ids.append(doc_id)
        n_tok.append(len(pieces))
        fps.append(token_fingerprint(tuple(pieces)))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "tok_fp": pa.array(fps, pa.string()),
            }
        ),
        f"{out_dir}/gold_encodings.parquet",
    )


# ---------------------------------------------------------------------------
# distributed trainer
# ---------------------------------------------------------------------------


def word_counts(docs_ds):
    """ONE corpus pass: per-batch combiner Counter -> exact groupby sum.
    Identical tokenization to ``vocab_build`` (TOKEN_RE over lowercase)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for t in batch.column("text").to_pylist():
            counts.update(TOKEN_RE.findall(t.lower()))
        return pa.table(
            {
                "word": pa.array(list(counts), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    return (
        docs_ds.select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )


def train_bpe(
    docs_ds,
    n_merges: int = 200,
    min_pair_count: int = 2,
    min_count: int = 1,
    num_shards: int = 8,
) -> pa.Table:
    """Distributed BPE training: word-count groupby, round-robin shard
    actors over the distinct-word table, driver merge loop on incremental
    pair-count deltas.  Returns (merge_rank, lhs, rhs, n) — byte-equal to
    :func:`train_bpe_reference` on the same corpus."""
    import ray

    wc = word_counts(docs_ds)
    if min_count > 1:
        import pyarrow.compute as pc

        wc = wc.map_batches(
            lambda b: b.filter(pc.greater_equal(b.column("n"), min_count))
            if b.num_rows and "n" in b.column_names
            else b,
            batch_format="pyarrow",
        )

    @ray.remote
    class _BPEShard:
        def __init__(self, block_refs: list):
            words: list[str] = []
            counts: list[int] = []
            for tbl in ray.get(block_refs):
                if tbl.num_rows == 0 or "word" not in tbl.column_names:
                    continue
                words.extend(tbl.column("word").to_pylist())
                counts.extend(tbl.column("n").to_pylist())
            self.state = _ShardState(words, counts)

        def pair_counts(self) -> dict:
            return self.state.pair_counts()

        def apply_merge(self, left: str, right: str) -> dict:
            return self.state.apply_merge(left, right)

    refs = wc.materialize().to_arrow_refs()
    P = max(1, min(num_shards, len(refs)) if refs else 1)
    assignment: list[list] = [[] for _ in range(P)]
    for i, r in enumerate(refs):
        assignment[i % P].append(r)
    shards = [_BPEShard.remote(a) for a in assignment]

    full: Counter = Counter()
    for d in ray.get([s.pair_counts.remote() for s in shards]):
        full.update(d)

    def apply_fn(left: str, right: str) -> dict:
        delta: Counter = Counter()
        for d in ray.get([s.apply_merge.remote(left, right) for s in shards]):
            delta.update(d)
        return dict(delta)

    merges = _merge_loop(dict(full), apply_fn, n_merges, min_pair_count)
    for s in shards:
        ray.kill(s)
    return _merges_table(merges)


# ---------------------------------------------------------------------------
# distributed encoder
# ---------------------------------------------------------------------------


class BPEEncoder:
    """Actor-pool stage: rank table built once per actor in ``__init__``,
    per-word memo amortizes encoding across the Zipf head.  Emits
    (doc_id, n_tokens, tok_fp) — fingerprints make content comparable
    without shipping token streams."""

    def __init__(self, merges: pa.Table):
        self.rank_of = {
            (l, r): k
            for k, (l, r) in enumerate(
                zip(merges.column("lhs").to_pylist(), merges.column("rhs").to_pylist())
            )
        }
        self.memo: dict[str, tuple[str, ...]] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_tok, fps = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            pieces: list[str] = []
            for w in TOKEN_RE.findall(text.lower()):
                enc = self.memo.get(w)
                if enc is None:
                    enc = encode_word(w, self.rank_of)
                    self.memo[w] = enc
                pieces.extend(enc)
            ids.append(doc_id)
            n_tok.append(len(pieces))
            fps.append(token_fingerprint(tuple(pieces)))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "tok_fp": pa.array(fps, pa.string()),
            }
        )


def encode_bpe(docs_ds, merges: pa.Table, concurrency: int = 2, batch_size: int = 256):
    """Stream the corpus through :class:`BPEEncoder` (stateless w.r.t. the
    corpus — no shuffle; the merge table rides into each actor once)."""
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        BPEEncoder,
        fn_constructor_kwargs={"merges": merges},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
