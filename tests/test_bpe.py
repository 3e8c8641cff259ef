"""BPE trainer/encoder: hand-computed merge semantics, distributed ==
single-process reference, shard-count invariance, encoder memo path."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_entity_extraction_ray.ops.bpe import (
    BPEEncoder,
    encode_bpe,
    encode_word,
    merge_word,
    train_bpe,
    train_bpe_reference,
    word_symbols,
    write_gold_bpe,
)

# the classic Sennrich corpus: low x5, lower x2, newest x6, widest x3
SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_merge_word_overlaps_leftmost_first():
    assert merge_word(("a", "a", "a"), "a", "a") == ("aa", "a")
    assert merge_word(("x", "a", "a", "y"), "a", "a") == ("x", "aa", "y")


def test_reference_merges_hand_computed():
    t = train_bpe_reference(SENNRICH, n_merges=5)
    got = list(
        zip(
            t.column("merge_rank").to_pylist(),
            t.column("lhs").to_pylist(),
            t.column("rhs").to_pylist(),
            t.column("n").to_pylist(),
        )
    )
    assert got == [
        (0, "e", "s", 9),
        (1, "es", "t", 9),
        (2, "est", "</w>", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
    ]


def test_encode_word_uses_rank_order():
    merges = train_bpe_reference(SENNRICH, n_merges=5)
    rank_of = {
        (l, r): k
        for k, (l, r) in enumerate(
            zip(merges.column("lhs").to_pylist(), merges.column("rhs").to_pylist())
        )
    }
    assert encode_word("lowest", rank_of) == ("low", "est</w>")
    # a word with no applicable merges stays at character granularity
    assert encode_word("zq", rank_of) == ("z", "q", "</w>")
    assert word_symbols("ab") == ("a", "b", "</w>")


def _docs_ds(word_counts: dict[str, int], n_blocks: int = 4):
    import ray.data

    rows = []
    i = 0
    for w, n in word_counts.items():
        for _ in range(n):
            rows.append({"doc_id": i, "text": w})
            i += 1
    return ray.data.from_items(rows, override_num_blocks=n_blocks)


def test_distributed_equals_reference(ray_session):
    ds = _docs_ds(SENNRICH)
    dist = train_bpe(ds, n_merges=50, num_shards=4)
    ref = train_bpe_reference(SENNRICH, n_merges=50)
    assert dist.equals(ref)
    # merges run until pairs fall under min_pair_count, then stop cleanly
    assert dist.num_rows < 50 or dist.column("n").to_pylist()[-1] >= 2


def test_shard_count_invariance(ray_session):
    ds = _docs_ds(SENNRICH, n_blocks=6)
    a = train_bpe(ds, n_merges=8, num_shards=1)
    b = train_bpe(ds, n_merges=8, num_shards=5)
    assert a.equals(b)


def test_encode_bpe_matches_gold(ray_session, tmp_path):
    import ray.data

    texts = [
        "the newest widest river",
        "lower and lower the low tide",
        "newest newest widest low",
        "",
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(docs, src)
    gold_dir = str(tmp_path / "gold")
    write_gold_bpe(src, gold_dir, n_merges=30, min_pair_count=2)

    merges = pq.read_table(f"{gold_dir}/gold_merges.parquet")
    ds = ray.data.read_parquet(src)
    # distributed training reproduces the gold merges on the same corpus
    assert train_bpe(ds, n_merges=30, num_shards=3).equals(merges)
    # distributed encoding reproduces the gold encodings
    enc = encode_bpe(ds, merges, concurrency=2, batch_size=2)
    got = pa.concat_tables(
        list(enc.iter_batches(batch_format="pyarrow")), promote_options="default"
    ).sort_by("doc_id")
    assert got.equals(pq.read_table(f"{gold_dir}/gold_encodings.parquet").sort_by("doc_id"))
    # the empty document encodes to zero tokens
    assert got.column("n_tokens").to_pylist()[3] == 0


def test_encoder_memo_and_fingerprint_stability():
    merges = train_bpe_reference(SENNRICH, n_merges=5)
    enc = BPEEncoder(merges)
    b = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["lowest lowest", "lowest"], pa.string()),
        }
    )
    out = enc(b)
    n = out.column("n_tokens").to_pylist()
    assert n == [4, 2]  # ("low","est</w>") per word
    assert "lowest" in enc.memo
    fp = out.column("tok_fp").to_pylist()
    assert fp[0] != fp[1] and len(fp[0]) == 32


def test_min_pair_count_stops_training():
    # every pair unique -> nothing reaches min_pair_count=2
    t = train_bpe_reference({"abc": 1}, n_merges=10, min_pair_count=2)
    assert t.num_rows == 0
    # min_pair_count=1 merges freely
    t1 = train_bpe_reference({"abc": 1}, n_merges=10, min_pair_count=1)
    assert t1.num_rows > 0
