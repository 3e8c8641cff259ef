"""The coarse-partition vectorized linking stages must be row-equivalent
to the per-group reference forms they replaced (block_pairs /
_cluster_assign stay in the module as the semantic spec)."""

import random

import pyarrow as pa

from pdf_entity_extraction_ray.sources.corpus import cached_catalog, tail_surfaces
from pdf_entity_extraction_ray.stages.linking import (
    MAX_BLOCK,
    BlockKeyer,
    _block_pairs_partition,
    _cluster_assign,
    _cluster_assign_partition,
    block_pairs,
)


def _pairs_via_groups(keyed: pa.Table) -> set:
    out = set()
    for block in set(keyed.column("block").to_pylist()):
        grp = keyed.filter(pa.compute.equal(keyed.column("block"), pa.scalar(block)))
        t = block_pairs(grp)
        out |= set(
            zip(
                t.column("type").to_pylist(),
                t.column("a").to_pylist(),
                t.column("b").to_pylist(),
            )
        )
    return out


def _pairs_via_partitions(keyed: pa.Table, parts: int = 7) -> set:
    from pdf_entity_extraction_ray.state.lineage import url_buckets

    out = set()
    bucket = url_buckets(keyed.column("block"), parts)
    keyed = keyed.append_column("part", pa.array(bucket, pa.int32()))
    for p in range(parts):
        grp = keyed.filter(pa.compute.equal(keyed.column("part"), pa.scalar(p, pa.int32())))
        t = _block_pairs_partition(grp)
        out |= set(
            zip(
                t.column("type").to_pylist(),
                t.column("a").to_pylist(),
                t.column("b").to_pylist(),
            )
        )
    return out


def _keyed_table(surfaces: list[tuple[str, str]]) -> pa.Table:
    keyer = BlockKeyer()
    return keyer(
        pa.table(
            {
                "type": pa.array([t for t, _ in surfaces], pa.string()),
                "surface": pa.array([s for _, s in surfaces], pa.string()),
            }
        )
    )


def test_partition_pairs_equal_per_group_pairs_on_catalog():
    cat = cached_catalog(42, 25)
    surfaces = [(c.type, a) for c in cat for a in c.aliases]
    keyed = _keyed_table(surfaces)
    assert _pairs_via_partitions(keyed) == _pairs_via_groups(keyed)


def test_partition_pairs_equal_on_tails_and_max_block_cap():
    # tails (pair blocks of exactly 2) + an oversized shared-word block
    # (> MAX_BLOCK surfaces sharing "Common") that both forms must skip
    surfaces = [("ORG", s) for k in range(40) for s in tail_surfaces(k)]
    surfaces += [("ORG", f"Common Qx{i:04d}") for i in range(MAX_BLOCK + 5)]
    keyed = _keyed_table(surfaces)
    got = _pairs_via_partitions(keyed, parts=3)
    want = _pairs_via_groups(keyed)
    assert got == want
    # sanity: the tail pairs themselves survived
    full0, alias0 = tail_surfaces(0)
    assert ("ORG", alias0, full0) in got or ("ORG", full0, alias0) in got


def test_partition_assign_equal_per_label_assign():
    rng = random.Random(9)
    rows = []
    for label in range(60):
        typ = rng.choice(["PERSON", "ORG"])
        for m in range(rng.randint(1, 4)):
            rows.append((label * 7919, typ, f"Surface {label} V{m}"))
    tbl = pa.table(
        {
            "label": pa.array([r[0] for r in rows], pa.int64()),
            "type": pa.array([r[1] for r in rows], pa.string()),
            "surface": pa.array([r[2] for r in rows], pa.string()),
        }
    )

    def rows_of(t: pa.Table) -> set:
        return set(
            zip(
                t.column("type").to_pylist(),
                t.column("surface").to_pylist(),
                t.column("node_id").to_pylist(),
                t.column("canonical").to_pylist(),
            )
        )

    want = set()
    for label in set(tbl.column("label").to_pylist()):
        grp = tbl.filter(pa.compute.equal(tbl.column("label"), pa.scalar(label)))
        want |= rows_of(_cluster_assign(grp))
    got = rows_of(_cluster_assign_partition(tbl))
    assert got == want
