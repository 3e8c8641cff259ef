"""Per-round, per-partition checkpoints for the BSP iterative algorithms
(connected components, k-core, PageRank) — the lineage story extended to
the loops the Dataset API can't express.

The static partition state (edges, node arrays) is a deterministic
function of the input, so a checkpoint stores only each partition's
DYNAMIC per-node values (labels / core estimates / ranks) plus the round
number.  Saves happen WORKER-SIDE: a remote task per partition writes its
own one-row Parquet file (``nodes`` and ``values`` as list columns); the
driver never pulls an array, it only writes the tiny round manifest JSON
after every partition's save resolves (so a manifest implies a complete
round — the same marker-after-write discipline as state/lineage.py).
Resume: rebuild the static state from the input, then a remote task per
partition loads its values file and splices it in.

A checkpoint is keyed by a caller-supplied fingerprint (input identity +
algorithm parameters); a mismatch is ignored, never trusted.  The BSP
callers default the fingerprint to parameters + an order-invariant
CONTENT digest of the edge blocks (:func:`content_digest`) so a
same-count but rewired input never silently resumes stale values.

Storage contract: paths are plain local filesystem paths written by
worker tasks and listed in a driver-written manifest — on a multi-node
cluster ``ckpt_dir`` MUST be a shared filesystem (NFS/EFS/Lustre)
visible at the same path from every node and the driver; otherwise part
files land on arbitrary workers' local disks and resume cannot find
them.  (Object-store URI backends would need pyarrow.fs plumbing here.)
Resume is transactional against that failure mode: every partition's
load task verifies its file worker-side and the whole checkpoint is
discarded — forcing recompute from round 0 — if any partition file is
unreadable where the load actually runs.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa


def _remotes():
    import ray

    @ray.remote
    def save_values(path: str, nodes: np.ndarray, values: np.ndarray) -> bool:
        import pyarrow.parquet as pq

        tmp = path + ".tmp"
        pq.write_table(
            pa.table(
                {
                    "nodes": pa.array([nodes.tolist()], pa.list_(pa.int64())),
                    "values": pa.array([values.tolist()], pa.list_(pa.float64()))
                    if values.dtype.kind == "f"
                    else pa.array([values.tolist()], pa.list_(pa.int64())),
                }
            ),
            tmp,
        )
        os.replace(tmp, path)
        return True

    @ray.remote(num_returns=3)
    def load_values(path: str, float_values: bool):
        """(ok, nodes, values) — ok=False (instead of a crash) when the
        part file is missing/unreadable on THIS worker's filesystem, so
        the driver can discard the whole checkpoint and recompute."""
        import pyarrow.parquet as pq

        try:
            t = pq.read_table(path)
        except (FileNotFoundError, OSError, pa.ArrowInvalid):
            return False, None, None
        nodes = np.asarray(t.column("nodes")[0].as_py(), dtype=np.int64)
        dtype = np.float64 if float_values else np.int64
        values = np.asarray(t.column("values")[0].as_py(), dtype=dtype)
        return True, nodes, values

    return save_values, load_values


def content_digest(block_refs) -> int:
    """Order-invariant uint64 digest of a materialized (u, v) int-edge
    Dataset's blocks: per block a remote task sums splitmix64-finalized
    mixes of each (u, v) pair, the driver sums P scalars mod 2**64.
    Asymmetric in (u, v), invariant to row and block order, one cheap
    vectorized pass per block — computed only when checkpointing is on.
    Folded into the default BSP fingerprints so two inputs with the same
    edge COUNT but different edges never share a checkpoint."""
    import ray

    @ray.remote
    def block_digest(tbl: pa.Table) -> int:
        if tbl.num_rows == 0:
            return 0
        u = np.asarray(tbl.column("u").to_pylist(), dtype=np.int64).view(np.uint64)
        v = np.asarray(tbl.column("v").to_pylist(), dtype=np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            x = u * np.uint64(0x9E3779B97F4A7C15) + v * np.uint64(0xC2B2AE3D27D4EB4F)
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            x = x ^ (x >> np.uint64(31))
            return int(x.sum(dtype=np.uint64))

    return sum(ray.get([block_digest.remote(r) for r in block_refs])) % (1 << 64)


def _manifest_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "manifest.json")


def save_round(ckpt_dir: str, fp: str, round_idx: int, nodes_values_refs) -> None:
    """Write every partition's (nodes, values) worker-side, then the
    manifest.  ``nodes_values_refs`` is a list of (nodes_ref, values_ref)
    or (nodes_array, values_array) pairs — ObjectRefs pass straight into
    the save task without touching the driver."""
    import ray

    save_values, _ = _remotes()
    os.makedirs(ckpt_dir, exist_ok=True)
    paths = [
        os.path.join(ckpt_dir, f"round_{round_idx}_part_{p}.parquet")
        for p in range(len(nodes_values_refs))
    ]
    done = [
        save_values.remote(path, nodes, values)
        for path, (nodes, values) in zip(paths, nodes_values_refs)
    ]
    ray.get(done)  # manifest only after every partition file is durable
    tmp = _manifest_path(ckpt_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"fingerprint": fp, "round": round_idx, "P": len(paths), "paths": paths},
            f,
            indent=1,
        )
    os.replace(tmp, _manifest_path(ckpt_dir))


def load_latest(ckpt_dir: str, fp: str, P: int, float_values: bool = False):
    """Return (round_idx, [(nodes_ref, values_ref)] one per partition) for
    the newest complete checkpoint matching ``fp`` and ``P``, else None.
    Values are loaded worker-side; the driver sees only ObjectRefs."""
    path = _manifest_path(ckpt_dir)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        m = json.load(f)
    if m.get("fingerprint") != fp or m.get("P") != P:
        return None
    if not all(os.path.exists(p) for p in m["paths"]):
        return None
    import ray

    _, load_values = _remotes()
    loads = [load_values.remote(p, float_values) for p in m["paths"]]
    # transactional: only the P tiny ok-flags touch the driver; any
    # partition file unreadable where its load task ran (non-shared fs,
    # partial cleanup) discards the WHOLE checkpoint — per-partition
    # fallback would mix rounds, which is wrong for PageRank
    if not all(ray.get([ok for ok, _, _ in loads])):
        return None
    return m["round"], [(nodes, values) for _, nodes, values in loads]
