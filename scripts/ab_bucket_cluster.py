"""A/B: annotations-phase bucket clustering — range sort vs key-hash shuffle.

The P1 hive write needs blocks clustered by ``bucket`` (else blocks x
buckets tiny files poison every downstream read).  Two ways to get there:

  sort  : ``ds.sort("bucket")`` — range shuffle on a low-cardinality int32
  hash  : ``ds.repartition(n_buckets, keys=["bucket"])`` under Ray's
          experimental HASH_SHUFFLE strategy

Runs the FULL annotations phase (tagging + exchange + write) once per
strategy in a fresh Ray session over the same pre-synthesized corpus and
reports the phase wall, the exchange-visible delta, and the output file
count.  Usage::

    python scripts/ab_bucket_cluster.py [n_pages] [num_cpus]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def child(strategy: str, pages: str, out: str, num_cpus: int) -> dict:
    env = {**os.environ, "GRAFT_BUCKET_CLUSTER": strategy}
    code = f"""
import json, os, shutil, time
import ray
ray.init(address="local", num_cpus={num_cpus}, include_dashboard=False)
from pdf_entity_extraction_ray.pipelines import kg
from pdf_entity_extraction_ray.state import lineage
shutil.rmtree({out!r}, ignore_errors=True)
t0 = time.perf_counter()
res = kg.run_kg({pages!r}, {out!r}, n_buckets=32, resume=False)
wall = time.perf_counter() - t0
ann = lineage.load_manifest({out!r}, "annotations") or {{}}
nfiles = sum(
    1
    for root, _, files in os.walk(os.path.join({out!r}, "annotations"))
    for f in files
    if f.endswith(".parquet")
)
print("RESULT " + json.dumps({{
    "strategy": {strategy!r},
    "total_wall": round(wall, 1),
    "annotations_wall": round(ann.get("wall_sec", -1), 1),
    "annotation_files": nfiles,
    "n_nodes": res["n_nodes"], "n_edges": res["n_edges"],
}}))
ray.shutdown()
"""
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"{strategy} leg failed:\n{proc.stderr[-3000:]}")


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    os.environ["GRAFT_BENCH_PAGES"] = str(n_pages)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    pages, _ = bench.ensure_corpus(0.0)  # GRAFT_BENCH_PAGES overrides sizing
    results = [
        child(strategy, pages, f"/tmp/graft_ab_{strategy}", num_cpus)
        for strategy in ("sort", "hash")
    ]
    print(json.dumps({"n_pages": n_pages, "num_cpus": num_cpus, "legs": results}))


if __name__ == "__main__":
    main()
