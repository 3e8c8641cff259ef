"""Round-4 thirteenth-batch ops: bipartite host co-citation projection,
winsorized robust per-type aggregate."""
import math
import random

import numpy as np
import pyarrow as pa


def test_host_overlap_bruteforce():
    import ray

    from pdf_entity_extraction_ray.ops.web import host_entity_overlap

    rng = random.Random(9)
    hosts = [f"h{i}.example" for i in range(12)]
    ents = [("GPE", f"City {i}") for i in range(15)] + [("PER", "Ada")]
    rows = []
    for ty, tx in ents:
        for h in rng.sample(hosts, rng.randrange(0, 6)):
            # duplicate mentions of the same entity on the same host
            for _ in range(rng.randrange(1, 3)):
                rows.append((f"https://{h}/p{rng.randrange(99)}", ty, tx))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([u for u, _, _ in rows], pa.string()),
                "type": pa.array([t for _, t, _ in rows], pa.string()),
                "text": pa.array([x for _, _, x in rows], pa.string()),
            }
        )
    )
    got = {}
    for b in host_entity_overlap(ds, min_common=2, shards=8).iter_batches(
        batch_format="pyarrow"
    ):
        for a, c, n in zip(
            b.column("host_a").to_pylist(),
            b.column("host_b").to_pylist(),
            b.column("n_common").to_pylist(),
        ):
            assert (a, c) not in got
            got[(a, c)] = n
    # brute force over distinct (host, entity)
    he = {(u.split("/")[2], ty, tx) for u, ty, tx in rows}
    gold = {}
    for h1, t1, x1 in he:
        for h2, t2, x2 in he:
            if h1 < h2 and t1 == t2 and x1 == x2:
                gold[(h1, h2)] = gold.get((h1, h2), 0) + 1
    gold = {k: v for k, v in gold.items() if v >= 2}
    assert got == gold
    assert all(a < b for a, b in got)


def test_host_overlap_single_host_entity_emits_nothing():
    import ray

    from pdf_entity_extraction_ray.ops.web import host_entity_overlap

    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["https://a.x/1", "https://a.x/2"], pa.string()),
                "type": pa.array(["GPE", "GPE"], pa.string()),
                "text": pa.array(["Lima", "Lima"], pa.string()),
            }
        )
    )
    assert host_entity_overlap(ds, min_common=1).count() == 0


def test_winsorized_bruteforce_with_half_cent_values():
    import ray

    from pdf_entity_extraction_ray.ops.relational import events_winsorized

    rng = random.Random(13)
    types, vals = [], []
    for _ in range(400):
        types.append(rng.choice(["purchase", "view"]))
        # include exact .005 values to pin the floor(x*100+0.5) rule
        vals.append(rng.choice([0.005, 1.0, 2.5, 99.995, rng.random() * 50]))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "value": pa.array(vals, pa.float64()),
            }
        )
    )
    got = {}
    for b in events_winsorized(ds).iter_batches(batch_format="pyarrow"):
        for t, n, w, c in zip(
            b.column("event_type").to_pylist(),
            b.column("n_events").to_pylist(),
            b.column("winsorized_sum_cents").to_pylist(),
            b.column("n_capped").to_pylist(),
        ):
            got[t] = (n, w, c)
    gold = {}
    per = {}
    for t, v in zip(types, vals):
        per.setdefault(t, []).append(int(math.floor(v * 100 + 0.5)))
    for t, cs in per.items():
        s = sorted(cs)
        rank = math.ceil(0.99 * len(s) - 1e-9)
        cap = s[np.searchsorted(np.cumsum(np.ones(len(s), dtype=int)), rank)]
        gold[t] = (
            len(cs),
            sum(min(c, cap) for c in cs),
            sum(1 for c in cs if c > cap),
        )
    assert got == gold


def test_winsorized_cap_is_an_element():
    import ray

    from pdf_entity_extraction_ray.ops.relational import events_winsorized

    # 10 values 1..10 dollars: p99 cap = ceil(9.9)=10th element = 1000c,
    # so nothing is capped and the sum is exact
    ds = ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["t"] * 10, pa.string()),
                "value": pa.array([float(i) for i in range(1, 11)], pa.float64()),
            }
        )
    )
    rows = events_winsorized(ds).take_all()
    assert rows == [
        {
            "event_type": "t",
            "n_events": 10,
            "winsorized_sum_cents": 5500,
            "n_capped": 0,
        }
    ]
