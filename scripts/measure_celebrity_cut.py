"""Measure the max_degree celebrity cut's recall on the sf0.1 entity graph
(VERDICT r4 item 5): pair counts and RA mass, uncut vs max_degree=1000,
plus the degree profile that explains the loss.  Records go to BASELINE.md.

Usage: python scripts/measure_celebrity_cut.py [sf_dir] [max_degree]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_degree = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    skip_uncut = len(sys.argv) > 3 and sys.argv[3] == "--cut-only"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    import ray.data

    from pdf_entity_extraction_ray.ops.graph_stats import resource_allocation

    if os.path.isdir(os.path.join(sf_dir, "edges")):
        edges_path = os.path.join(sf_dir, "edges")  # a kg output dir directly
    else:
        import __ray_entry__ as entry

        edges_path = entry._kg_artifacts(sf_dir)["edges"]
    edges = ray.data.read_parquet(
        edges_path, columns=["src_canonical", "dst_canonical"]
    )

    # degree profile (undirected simple graph)
    import pyarrow as pa

    deg: dict[str, set] = {}
    for b in edges.iter_batches(batch_format="pyarrow"):
        for s, d in zip(
            b.column("src_canonical").to_pylist(),
            b.column("dst_canonical").to_pylist(),
        ):
            if s == d:
                continue
            deg.setdefault(s, set()).add(d)
            deg.setdefault(d, set()).add(s)
    degs = sorted((len(v) for v in deg.values()), reverse=True)
    n_over = sum(1 for d in degs if d > max_degree)
    print(
        f"graph: {len(deg)} nodes, max degree {degs[0]}, "
        f"{n_over} nodes over max_degree={max_degree}, top5={degs[:5]}"
    )

    def run(md):
        t0 = time.monotonic()
        n_pairs = 0
        ra_mass = 0
        for b in resource_allocation(edges, max_degree=md).iter_batches(
            batch_format="pyarrow"
        ):
            n_pairs += b.num_rows
            col = b.column("ra_micro")
            ra_mass += sum(col.to_pylist())
        return n_pairs, ra_mass, time.monotonic() - t0

    cut_pairs, cut_mass, cut_s = run(max_degree)
    print(f"cut   (max_degree={max_degree}): {cut_pairs} pairs, "
          f"ra_mass={cut_mass}, {cut_s:.1f}s")
    if skip_uncut:
        ray.shutdown()
        return 0
    uncut_pairs, uncut_mass, uncut_s = run(None)
    print(f"uncut: {uncut_pairs} pairs, ra_mass={uncut_mass}, {uncut_s:.1f}s")
    lost = uncut_pairs - cut_pairs
    print(
        f"pairs lost: {lost} ({100.0 * lost / max(uncut_pairs, 1):.2f}%); "
        f"ra mass kept: {100.0 * cut_mass / max(uncut_mass, 1):.2f}%; "
        f"speedup {uncut_s / max(cut_s, 1e-9):.1f}x"
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
