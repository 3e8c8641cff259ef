"""200k-document dedup-scale validation (the round-2 one-off, committed
and rerun for round 3's band auto-tuning).

Builds a deterministic low-diversity corpus — 160k unique docs of 40
tokens drawn zipf-skewed from a 36-token vocabulary, plus 20k exact
duplicates and 20k near duplicates (last token changed; word-3-gram
Jaccard ~0.85) — then:

1. shows :func:`auto_minhash_bands` probes the heavy low-J background and
   lands at bands=16 (the r=2 default's banding collisions make candidates
   quadratic here: the round-2 measurement was 5.2M candidates for 60k
   true pairs, 250+ s in the verify join);
2. runs ``minhash_lsh_pairs(bands="auto")`` and reports wall + pair count
   (expected: the 60,000 planted pairs — 3 per duplicated base doc);
3. runs ``near_dedup_keep(bands="auto")`` and reports wall + kept count
   (expected: 160,000 — one keeper per duplicate cluster).

Usage: python scripts/validate_dedup_scale.py [n_base] [n_dup]
Prints one JSON line; numbers are recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CORPUS = "/tmp/graft_dedup_scale/documents.parquet"


def build_corpus(path: str, n_base: int, n_dup: int, doc_len: int = 40, seed: int = 11):
    rng = np.random.RandomState(seed)
    vocab = np.array([f"tok{i}" for i in range(36)])
    p = 1.0 / np.arange(1, len(vocab) + 1)
    p /= p.sum()  # zipf-ish skew: common tokens dominate -> heavy low-J background
    base = [" ".join(rng.choice(vocab, doc_len, p=p)) for _ in range(n_base)]
    texts = list(base)
    texts += [base[i] for i in range(n_dup)]  # exact duplicates
    texts += [base[i].rsplit(" ", 1)[0] + " neartok" for i in range(n_dup)]  # near dups
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        path,
    )


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 160_000
    n_dup = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data

    from pdf_entity_extraction_ray.ops.dedup import (
        auto_minhash_bands,
        minhash_lsh_pairs,
        near_dedup_keep,
    )

    if not os.path.isfile(CORPUS):
        build_corpus(CORPUS, n_base, n_dup)

    def read():
        return ray.data.read_parquet(CORPUS)

    t0 = time.perf_counter()
    chosen = auto_minhash_bands(read())
    t_probe = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    n_pairs = 0
    for b in minhash_lsh_pairs(read(), 0.7, bands="auto").iter_batches(
        batch_format="pyarrow"
    ):
        n_pairs += b.num_rows
    t_pairs = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    n_kept = 0
    for b in near_dedup_keep(read(), 0.7, bands="auto").iter_batches(
        batch_format="pyarrow"
    ):
        n_kept += b.num_rows
    t_keep = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "n_docs": n_base + 2 * n_dup,
                "auto_bands": chosen,
                "probe_sec": t_probe,
                "pairs": n_pairs,
                "pairs_expected": 3 * n_dup,
                "pairs_sec": t_pairs,
                "kept": n_kept,
                "kept_expected": n_base,
                "keep_sec": t_keep,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
