"""Train the committed numpy token-classification checkpoint (A1 fixture).

Deterministic end-to-end: seeded corpus synthesis, seeded init/shuffle,
plain numpy SGD.  Produces ``pdf_entity_extraction_ray/fixtures/
np_tagger.npz`` (~0.5 MB, float16-stored embeddings) and prints held-out
span-level P/R through the REAL chain (model pieces -> bio_merge -> M7 ->
M6), i.e. the same path stages/np_model.NumpyTokenClassifierTagger runs.

Usage:  python scripts/train_np_tagger.py [out.npz]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_entity_extraction_ray.stages.np_model import featurize_segment  # noqa: E402

V = 8192
H = 32
TYPES = ["PERSON", "ORG", "GPE", "LAW", "DATE"]
LABELS = ["O"] + [f"{p}-{t}" for t in TYPES for p in ("B", "I")]
LIDX = {l: i for i, l in enumerate(LABELS)}

N_PAGES = 900
HOLDOUT = 120  # last pages are eval-only
CORPUS_DIR = "/tmp/np_tagger_train_corpus"
SEED = 42

EPOCHS = int(os.environ.get("NP_TAGGER_EPOCHS", "20"))
LR = 1.0
BATCH = 512
ENTITY_WEIGHT = 4.0


def build_dataset():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    from pdf_entity_extraction_ray.sources.corpus import write_corpus
    from pdf_entity_extraction_ray.stages.extract import extract_segments_batch

    if not os.path.exists(os.path.join(CORPUS_DIR, "pages")):
        write_corpus(CORPUS_DIR, n_pages=N_PAGES, seed=SEED, n_per_type=25)

    pages = pq.read_table(os.path.join(CORPUS_DIR, "pages"))
    segs = extract_segments_batch(pages)
    gold = pq.read_table(os.path.join(CORPUS_DIR, "gold_mentions"))
    by_seg: dict[tuple, list[tuple[int, int, str]]] = {}
    for r in gold.to_pylist():
        by_seg.setdefault((r["url"], r["seg_id"]), []).append(
            (r["start"], r["end"], r["type"])
        )
    rows = segs.to_pylist()
    ray.shutdown()
    return rows, by_seg


def label_pieces(pieces, spans):
    """BIO label per piece from gold char spans (piece inside span)."""
    labels = []
    for _ptext, s, e, _cont in pieces:
        lab = "O"
        for gs, ge, typ in spans:
            if s >= gs and e <= ge:
                lab = ("B-" if s == gs else "I-") + typ
                break
        labels.append(LIDX[lab])
    return labels


def main(out_path: str):
    rng = np.random.RandomState(0)
    rows, by_seg = build_dataset()
    # deterministic page split: url order is content-derived and stable
    urls = sorted({r["url"] for r in rows})
    eval_urls = set(urls[-HOLDOUT:])

    feats_all: list[list[int]] = []
    y_all: list[int] = []
    misaligned = 0
    total_spans = 0
    train_rows = [r for r in rows if r["url"] not in eval_urls]
    for r in train_rows:
        spans = by_seg.get((r["url"], r["seg_id"]), [])
        feats, pieces = featurize_segment(r["text"], V)
        labels = label_pieces(pieces, spans)
        # audit: every gold span should be exactly tiled by labeled pieces
        for gs, ge, _t in spans:
            total_spans += 1
            covered = [p for p, l in zip(pieces, labels) if l != LIDX["O"] and p[1] >= gs and p[2] <= ge]
            if not covered or covered[0][1] != gs or covered[-1][2] != ge:
                misaligned += 1
        feats_all.extend(feats)
        y_all.extend(labels)
    print(f"train pieces={len(y_all)} gold_spans={total_spans} misaligned={misaligned}")

    y = np.asarray(y_all, dtype=np.int64)
    L = len(LABELS)
    E = (rng.standard_normal((V, H)) * 0.1).astype(np.float32)
    W2 = (rng.standard_normal((H, L)) * 0.1).astype(np.float32)
    b2 = np.zeros(L, dtype=np.float32)
    Wlin = np.zeros((V, L), dtype=np.float32)  # wide (direct sparse) term
    w_class = np.where(y == LIDX["O"], 1.0, ENTITY_WEIGHT).astype(np.float32)

    # ragged features -> flat index + offsets for vectorized mean-pool
    flat = np.asarray([i for f in feats_all for i in f], dtype=np.int64)
    lens = np.asarray([len(f) for f in feats_all], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])

    n = len(y)
    for epoch in range(EPOCHS):
        order = rng.permutation(n)
        lr = LR / (1.0 + 0.2 * epoch)
        tot_loss = 0.0
        for bstart in range(0, n, BATCH):
            idx = order[bstart : bstart + BATCH]
            B = len(idx)
            pooled = np.zeros((B, H), dtype=np.float32)
            lin = np.zeros((B, L), dtype=np.float32)
            for j, i in enumerate(idx):
                f = flat[starts[i] : starts[i] + lens[i]]
                pooled[j] = E[f].mean(axis=0)
                lin[j] = Wlin[f].sum(axis=0)
            h = np.maximum(pooled, 0.0)
            logits = h @ W2 + b2 + lin
            logits -= logits.max(axis=1, keepdims=True)
            p = np.exp(logits)
            p /= p.sum(axis=1, keepdims=True)
            wb = w_class[idx]
            tot_loss += float(-(np.log(p[np.arange(B), y[idx]] + 1e-9) * wb).sum())
            d = p.copy()
            d[np.arange(B), y[idx]] -= 1.0
            d *= (wb / B)[:, None]
            dW2 = h.T @ d
            db2 = d.sum(axis=0)
            dh = d @ W2.T
            dh[pooled <= 0] = 0.0
            W2 -= lr * dW2
            b2 -= lr * db2
            for j, i in enumerate(idx):
                f = flat[starts[i] : starts[i] + lens[i]]
                E[f] -= (lr / lens[i]) * dh[j]
                Wlin[f] -= lr * d[j]
        print(f"epoch {epoch}: loss/piece = {tot_loss / n:.4f}")

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez_compressed(
        out_path,
        E=E.astype(np.float16),
        W2=W2.astype(np.float32),
        b2=b2.astype(np.float32),
        Wlin=Wlin.astype(np.float16),
        labels=np.asarray(LABELS),
    )
    print(f"saved {out_path} ({os.path.getsize(out_path)} bytes)")

    # held-out eval through the REAL chain
    from pdf_entity_extraction_ray.stages.np_model import NumpyTokenClassifierTagger

    tagger = NumpyTokenClassifierTagger(checkpoint_path=out_path)
    got, want = set(), set()
    for r in rows:
        if r["url"] not in eval_urls:
            continue
        key = (r["url"], r["seg_id"])
        for gs, ge, typ in by_seg.get(key, []):
            want.add((key, gs, ge, typ))
        for s in tagger.tag_segment(r["text"]):
            got.add((key, s["start_index"], s["end_index"], s["entity_label"]))
    tp = len(got & want)
    print(
        f"held-out pages={HOLDOUT}: P={tp / max(len(got), 1):.4f} "
        f"R={tp / max(len(want), 1):.4f} (got {len(got)}, gold {len(want)})"
    )


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "pdf_entity_extraction_ray",
        "fixtures",
        "np_tagger.npz",
    )
    main(out)
