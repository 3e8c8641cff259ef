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
algorithm parameters); a mismatch is ignored, never trusted.
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

    @ray.remote
    def load_values(path: str, float_values: bool):
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        nodes = np.asarray(t.column("nodes")[0].as_py(), dtype=np.int64)
        dtype = np.float64 if float_values else np.int64
        values = np.asarray(t.column("values")[0].as_py(), dtype=dtype)
        return nodes, values

    return save_values, load_values


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
    _, load_values = _remotes()
    refs = [load_values.options(num_returns=2).remote(p, float_values) for p in m["paths"]]
    return m["round"], refs
