"""Round-4 eleventh-batch ops: sorted-neighborhood + FastSS ER blocking,
bloom-prefiltered delta dedup, TPC-H Q3-style top-k join."""
import random
import re

import pyarrow as pa

from pdf_entity_extraction_ray.ops.blocking import (
    _byte_ed_le1,
    _prefix_bucket,
    editdist1_pairs,
    snm_pairs,
)


def _mentions_ds(rows):
    import ray

    return ray.data.from_arrow(
        pa.table(
            {
                "type": pa.array([t for t, _ in rows], pa.string()),
                "text": pa.array([s for _, s in rows], pa.string()),
            }
        )
    )


def _snm_gold(rows, w):
    key = lambda s: re.sub(r"[^a-z0-9]", "", s.lower())  # noqa: E731
    ranked = sorted({(key(s), t, s) for t, s in rows})
    out = set()
    for i in range(len(ranked)):
        for d in range(1, w):
            if i + d < len(ranked):
                a, b = ranked[i], ranked[i + d]
                out.add((a[1], a[2], b[1], b[2], d))
    return out


def _run_snm(rows, w):
    got = set()
    for b in snm_pairs(_mentions_ds(rows), window=w).iter_batches(
        batch_format="pyarrow"
    ):
        for r in zip(*[b.column(c).to_pylist() for c in
                       ("type_a", "surf_a", "type_b", "surf_b", "dist")]):
            assert r not in got, f"duplicate pair {r}"
            got.add(r)
    return got


def test_snm_pairs_matches_bruteforce_across_buckets():
    # keys straddle prefix buckets on purpose: az/b0/b1... are adjacent in
    # sort order but live in different 2-char buckets, so every pair here
    # exercises the driver-side boundary stitch
    rows = [
        ("ORG", "Azura Corp"),       # key azuracorp
        ("ORG", "B-Zero Ltd"),       # key bzeroltd
        ("GPE", "Baku"),             # key baku
        ("GPE", "Bakú"),             # key bak (accent stripped)
        ("PER", "Ada"),              # key ada
        ("PER", "ada"),              # key ada (distinct surface, same key)
        ("ORG", "!!!"),              # empty key -> bucket 0
        ("ORG", "zz top"),           # key zztop, far bucket
    ]
    for w in (2, 3, 4):
        assert _run_snm(rows, w) == _snm_gold(rows, w)


def test_snm_pairs_window_larger_than_input():
    rows = [("PER", "Bob"), ("PER", "Bobby"), ("ORG", "Bobcat Inc")]
    assert _run_snm(rows, 10) == _snm_gold(rows, 10)


def test_snm_duplicate_mentions_collapse():
    rows = [("PER", "Ada")] * 5 + [("PER", "Adb")]
    assert _run_snm(rows, 2) == _snm_gold(rows, 2)


def test_prefix_bucket_order_preserving():
    keys = ["", "0", "09z", "a", "az", "b", "b0", "zz"]
    b = _prefix_bucket(keys)
    assert list(b) == sorted(b)
    # 2-char prefix equality => same bucket
    assert _prefix_bucket(["abx"])[0] == _prefix_bucket(["aby"])[0]


# ---------------------------------------------------------------------------
# FastSS edit-distance-1 blocking


def _lev_bytes(a: bytes, b: bytes) -> int:
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


def test_byte_ed_le1_matches_dp():
    rng = random.Random(7)
    alphabet = b"abz\xc3\xa9"  # includes the two bytes of utf-8 e-acute
    for _ in range(500):
        a = bytes(rng.choice(alphabet) for _ in range(rng.randrange(0, 6)))
        b = bytes(rng.choice(alphabet) for _ in range(rng.randrange(0, 6)))
        if a == b:
            continue
        assert _byte_ed_le1(a, b) == (_lev_bytes(a, b) <= 1), (a, b)


def test_editdist1_pairs_bruteforce_byte_semantics():
    rows = [
        ("GPE", "Bogota"),
        ("GPE", "Bogotá"),   # byte distance 2 from Bogota -> NOT a pair
        ("GPE", "Bogata"),   # distance 1 from Bogota
        ("GPE", "Bogot"),    # deletion, distance 1 from Bogota
        ("PER", "Bogota"),   # same surface, other type -> never paired
        ("GPE", "Quito"),
        ("GPE", "Quite"),    # distance 1 from Quito
    ]
    got = set()
    for b in editdist1_pairs(_mentions_ds(rows)).iter_batches(
        batch_format="pyarrow"
    ):
        for r in zip(*[b.column(c).to_pylist() for c in
                       ("type", "surf_a", "surf_b", "dist")]):
            assert r not in got
            got.add(r)
    uniq = sorted(set(rows))
    gold = {
        (t1, s1, s2, 1)
        for (t1, s1) in uniq
        for (t2, s2) in uniq
        if t1 == t2 and s1 < s2
        and _lev_bytes(s1.encode(), s2.encode()) == 1
    }
    assert got == gold
    assert ("GPE", "Bogata", "Bogota", 1) in got
    assert all(not (p[1] == "Bogota" and p[2] == "Bogotá") for p in got)


# ---------------------------------------------------------------------------
# bloom-prefiltered delta dedup


def _docs_ds(rows):
    import ray

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in rows], pa.int64()),
                "text": pa.array([t for _, t in rows], pa.string()),
            }
        )
    )


def test_bloom_delta_exact_even_with_saturated_filter():
    import hashlib

    from pdf_entity_extraction_ray.ops.dedup import bloom_delta_dedup

    existing = [(i, f"doc {i % 13}") for i in range(1, 60)]
    new = [(100 + i, f"doc {i}") for i in range(30)]  # i<13 collide w/ prior
    gold = {
        (i, hashlib.md5(t.encode()).hexdigest())
        for i, t in new
        if t not in {t2 for _, t2 in existing}
    }
    # bits_log2=7 (16 bytes) saturates the filter -> nearly every row is a
    # bloom hit -> the exact join must still produce the exact answer
    for bits in (7, 20):
        got = set()
        for b in bloom_delta_dedup(
            _docs_ds(new), _docs_ds(existing), bits_log2=bits
        ).iter_batches(batch_format="pyarrow"):
            got |= set(
                zip(b.column("doc_id").to_pylist(), b.column("text_md5").to_pylist())
            )
        assert got == gold, f"bits_log2={bits}"


def test_bloom_delta_empty_existing_keeps_all_new():
    from pdf_entity_extraction_ray.ops.dedup import bloom_delta_dedup

    new = [(1, "a"), (2, "b")]
    got = set()
    for b in bloom_delta_dedup(
        _docs_ds(new), _docs_ds([]).filter(lambda r: False)
    ).iter_batches(batch_format="pyarrow"):
        got |= set(b.column("doc_id").to_pylist())
    assert got == {1, 2}


# ---------------------------------------------------------------------------
# TPC-H Q3 top-k


def test_q3_bruteforce_with_ties():
    import numpy as np
    import ray

    from pdf_entity_extraction_ray.ops.relational import q3_shipping_priority

    rng = random.Random(11)
    n_cust, n_ord = 20, 60
    cust = pa.table(
        {
            "c_custkey": pa.array(list(range(n_cust)), pa.int64()),
            "c_mktsegment": pa.array(
                [rng.choice(["BUILDING", "AUTOMOBILE"]) for _ in range(n_cust)]
            ),
        }
    )
    odate = [
        (np.datetime64("1998-01-01") + np.timedelta64(rng.randrange(300), "D"))
        .astype("datetime64[us]")
        for _ in range(n_ord)
    ]
    orders = pa.table(
        {
            "o_orderkey": pa.array(list(range(n_ord)), pa.int64()),
            "o_custkey": pa.array(
                [rng.randrange(n_cust) for _ in range(n_ord)], pa.int64()
            ),
            "o_orderdate": pa.array(odate, pa.timestamp("us")),
            "o_orderpriority": pa.array(
                [rng.choice(["1-URGENT", "3-MEDIUM"]) for _ in range(n_ord)]
            ),
        }
    )
    li_rows = []
    for _ in range(300):
        ok = rng.randrange(n_ord)
        ship = (
            np.datetime64("1998-01-01") + np.timedelta64(rng.randrange(400), "D")
        ).astype("datetime64[us]")
        # price quantized to cents so revenue ties happen on purpose
        li_rows.append((ok, ship, rng.randrange(1, 4) * 100.0, 0.0))
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in li_rows], pa.int64()),
            "l_shipdate": pa.array([r[1] for r in li_rows], pa.timestamp("us")),
            "l_extendedprice": pa.array([r[2] for r in li_rows], pa.float64()),
            "l_discount": pa.array([r[3] for r in li_rows], pa.float64()),
        }
    )

    cutoff = np.datetime64("1998-06-01")
    seg_keys = {
        k for k, s in zip(
            cust.column("c_custkey").to_pylist(),
            cust.column("c_mktsegment").to_pylist(),
        ) if s == "BUILDING"
    }
    omap = {}
    for k, c, d, p in zip(
        orders.column("o_orderkey").to_pylist(),
        orders.column("o_custkey").to_pylist(),
        orders.column("o_orderdate").to_pylist(),
        orders.column("o_orderpriority").to_pylist(),
    ):
        if c in seg_keys and np.datetime64(d, "us") < cutoff:
            omap[k] = (d, p)
    rev = {}
    for ok, ship, price, disc in li_rows:
        if ok in omap and ship > cutoff:
            rev[ok] = rev.get(ok, 0) + int(price * 100 + 0.5) * (
                100 - int(disc * 100 + 0.5)
            )
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    gold = {(k, omap[k][1], v) for k, v in ranked}

    out = q3_shipping_priority(
        ray.data.from_arrow(lineitem),
        ray.data.from_arrow(orders),
        ray.data.from_arrow(cust),
        cutoff="1998-06-01",
        k=10,
    )
    got = set()
    for b in out.iter_batches(batch_format="pyarrow"):
        got |= set(
            zip(
                b.column("l_orderkey").to_pylist(),
                b.column("o_orderpriority").to_pylist(),
                b.column("revenue_e4").to_pylist(),
            )
        )
    assert got == gold
