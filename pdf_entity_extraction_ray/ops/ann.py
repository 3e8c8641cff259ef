"""Similarity search over an embedding column (``list<float>``).

* :func:`knn_bruteforce` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), every batch does one vectorized matmul and
  emits only its LOCAL top-k per query (the combiner), so the final
  groupby-reduce sees ``num_blocks * k`` rows per query, never the corpus.
* :func:`knn_ivf` — the scale path: embeddings are bucketed by their
  dominant dimension (a trivially deterministic coarse quantizer); queries
  probe their top-``n_probe`` dominant dimensions' buckets only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalized(vectors) -> np.ndarray:
    M = np.asarray(vectors, dtype=np.float64)
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def _collect_queries(emb_ds, query_ids: list[int]):
    wanted = set(query_ids)
    got: dict[int, list[float]] = {}
    for batch in emb_ds.select_columns(["vec_id", "embedding"]).iter_batches(batch_format="pyarrow"):
        for vid, vec in zip(batch.column("vec_id").to_pylist(), batch.column("embedding").to_pylist()):
            if vid in wanted:
                got[vid] = vec
    qids = sorted(got)
    return np.asarray(qids), _normalized([got[q] for q in qids])


def knn_bruteforce(emb_ds, query_ids: list[int], k: int = 10):
    """(query_id, neighbor_id, rank) — exact top-k by cosine, self excluded.
    Ties break by ascending neighbor_id (deterministic)."""
    import ray

    qids, Q = _collect_queries(emb_ds, query_ids)
    qref = ray.put((qids, Q))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, Q_ = ray.get(qref)
        bids = np.asarray(batch.column("vec_id").to_pylist())
        B = _normalized(batch.column("embedding").to_pylist())
        S = Q_ @ B.T  # (n_q, n_batch)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids_)):
            sims = S[qi]
            mask = bids != qids_[qi]
            cand_ids, cand_sims = bids[mask], sims[mask]
            if len(cand_ids) > k:
                # partial top-k inside the batch (the combiner step)
                idx = np.argpartition(-cand_sims, k)[:k]
                cand_ids, cand_sims = cand_ids[idx], cand_sims[idx]
            out_q.extend([int(qids_[qi])] * len(cand_ids))
            out_n.extend(int(x) for x in cand_ids)
            out_s.extend(float(x) for x in cand_sims)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group.column("cosine").to_pylist(), group.column("neighbor_id").to_pylist()),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        qid = group.column("query_id")[0].as_py()
        return pa.table(
            {
                "query_id": pa.array([qid] * len(rows), pa.int64()),
                "neighbor_id": pa.array([r[1] for r in rows], pa.int64()),
                "rank": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            }
        )

    return (
        emb_ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
    )


def knn_ivf(emb_ds, query_ids: list[int], k: int = 10, n_probe: int = 8):
    """Approximate top-k: coarse-quantize by dominant dimension, probe only
    the query's ``n_probe`` strongest dimensions' buckets."""
    import ray

    qids, Q = _collect_queries(emb_ds, query_ids)
    probe_sets = {int(q): set(np.argsort(-np.abs(Q[i]))[:n_probe].tolist()) for i, q in enumerate(qids)}
    qref = ray.put((qids, Q, probe_sets))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, Q_, probes = ray.get(qref)
        bids = np.asarray(batch.column("vec_id").to_pylist())
        B = _normalized(batch.column("embedding").to_pylist())
        buckets = np.argmax(np.abs(B), axis=1)
        S = Q_ @ B.T
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids_)):
            probe = probes[int(qids_[qi])]
            mask = np.array([b in probe for b in buckets]) & (bids != qids_[qi])
            cand_ids, cand_sims = bids[mask], S[qi][mask]
            if len(cand_ids) > k:
                idx = np.argpartition(-cand_sims, k)[:k]
                cand_ids, cand_sims = cand_ids[idx], cand_sims[idx]
            out_q.extend([int(qids_[qi])] * len(cand_ids))
            out_n.extend(int(x) for x in cand_ids)
            out_s.extend(float(x) for x in cand_sims)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group.column("cosine").to_pylist(), group.column("neighbor_id").to_pylist()),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        qid = group.column("query_id")[0].as_py()
        return pa.table(
            {
                "query_id": pa.array([qid] * len(rows), pa.int64()),
                "neighbor_id": pa.array([r[1] for r in rows], pa.int64()),
                "rank": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            }
        )

    return (
        emb_ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
    )
