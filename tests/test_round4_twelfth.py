"""Round-4 twelfth-batch ops: double-sweep diameter lower bound, Pareto
revenue-concentration cut, per-user discrete-median inter-event gap."""
import random

import numpy as np
import pyarrow as pa


def _edges_ds(pairs):
    import ray

    ids = {}
    for a, b in pairs:
        ids.setdefault(a, 1000 + len(ids))
        ids.setdefault(b, 1000 + len(ids))
    return ray.data.from_arrow(
        pa.table(
            {
                "src_id": pa.array([ids[a] for a, _ in pairs], pa.int64()),
                "dst_id": pa.array([ids[b] for _, b in pairs], pa.int64()),
                "src_canonical": pa.array([a for a, _ in pairs], pa.string()),
                "dst_canonical": pa.array([b for _, b in pairs], pa.string()),
            }
        )
    )


def _sweep(pairs):
    from pdf_entity_extraction_ray.ops.graph_stats import double_sweep

    rows = double_sweep(_edges_ds(pairs)).take_all()
    assert len(rows) == 1
    r = rows[0]
    return (r["seed"], r["far1"], r["ecc1"], r["far2"], r["diameter_lb"])


def test_double_sweep_path_graph_exact():
    # path a-b-c-d-e: double sweep is exact on trees
    assert _sweep([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]) == (
        "a", "e", 4, "a", 4,
    )


def test_double_sweep_star_ties_lexicographic():
    # star around z: from seed a every other leaf is at depth 2; farthest
    # tie must break to the smallest canonical (b), then back out again
    assert _sweep([("z", "a"), ("z", "b"), ("z", "c")]) == ("a", "b", 2, "a", 2)


def test_double_sweep_stays_in_seed_component():
    got = _sweep(
        [("a", "b"), ("b", "c"), ("x", "y")]  # second component never entered
    )
    assert got == ("a", "c", 2, "a", 2)


def test_double_sweep_cycle_lower_bound():
    # 6-cycle: true diameter 3; double sweep reports >= ecc(seed) and <= 3
    n = ["a", "b", "c", "d", "e", "f"]
    pairs = [(n[i], n[(i + 1) % 6]) for i in range(6)]
    seed, far1, ecc1, far2, lb = _sweep(pairs)
    assert seed == "a" and ecc1 == 3 and lb == 3


# ---------------------------------------------------------------------------
# Pareto cut


def _orders_ds(rows):
    import ray

    return ray.data.from_arrow(
        pa.table(
            {
                "o_custkey": pa.array([c for c, _ in rows], pa.int64()),
                "o_totalprice": pa.array([p for _, p in rows], pa.float64()),
            }
        )
    )


def _pareto_gold(rows, pct):
    rev = {}
    for c, p in rows:
        rev[c] = rev.get(c, 0) + int(np.floor(p * 100 + 0.5))
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    tot = sum(rev.values())
    out, cum = set(), 0
    for c, r in ranked:
        if cum * 100 < tot * pct:
            out.add((c, r))
        cum += r
    return out


def _pareto_run(rows, pct):
    from pdf_entity_extraction_ray.ops.relational import customer_pareto

    got = set()
    for b in customer_pareto(_orders_ds(rows), pct=pct).iter_batches(
        batch_format="pyarrow"
    ):
        got |= set(
            zip(b.column("o_custkey").to_pylist(), b.column("rev_cents").to_pylist())
        )
    return got


def test_pareto_bruteforce_random_with_ties():
    rng = random.Random(3)
    rows = []
    for c in range(80):
        for _ in range(rng.randrange(1, 4)):
            # quantized prices force revenue ties across customers
            rows.append((c, rng.randrange(1, 20) * 10.0))
    for pct in (20, 50, 80, 99):
        assert _pareto_run(rows, pct) == _pareto_gold(rows, pct), pct


def test_pareto_single_whale_dominates():
    rows = [(1, 1_000_000.0)] + [(k, 1.0) for k in range(2, 50)]
    got = _pareto_run(rows, 80)
    assert got == {(1, 100_000_000)}


def test_pareto_all_equal_keeps_custkey_prefix():
    rows = [(k, 10.0) for k in range(10)]
    got = _pareto_run(rows, 80)
    assert {c for c, _ in got} == set(range(8))


def test_pareto_power_of_two_boundaries():
    # revenues sitting exactly on 2^k cent edges exercise the bit-length
    # histogram fix-ups
    rows = [(k, (1 << k) / 100.0) for k in range(1, 20)]
    for pct in (30, 80):
        assert _pareto_run(rows, pct) == _pareto_gold(rows, pct)


# ---------------------------------------------------------------------------
# median inter-event gap


def test_median_gap_bruteforce():
    from pdf_entity_extraction_ray.ops.relational import events_median_gap

    import ray

    rng = random.Random(5)
    users, ts = [], []
    base = np.datetime64("2024-01-01T00:00:00", "us")
    for u in range(40):
        n = rng.randrange(1, 8)
        stamps = sorted(rng.randrange(0, 10_000) for _ in range(n))
        if rng.random() < 0.3 and n >= 2:
            stamps[1] = stamps[0]  # duplicate timestamps
        for s in stamps:
            users.append(u)
            ts.append(base + np.timedelta64(s, "s"))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
            }
        )
    )
    got = {}
    for b in events_median_gap(ds).iter_batches(batch_format="pyarrow"):
        for u, n, m in zip(
            b.column("user_id").to_pylist(),
            b.column("n_gaps").to_pylist(),
            b.column("median_gap_us").to_pylist(),
        ):
            got[u] = (n, m)
    gold = {}
    per_user = {}
    for u, t in zip(users, ts):
        per_user.setdefault(u, []).append(t.astype(np.int64))
    for u, stamps in per_user.items():
        if len(stamps) < 2:
            continue
        g = np.sort(np.diff(np.sort(np.asarray(stamps))))
        gold[u] = (len(g), int(g[(len(g) - 1) // 2]))
    assert got == gold


def test_pareto_zero_total_returns_empty():
    # all-zero revenue: the inclusive-prefix rule keeps nothing
    # (regression: this crashed on min() of an empty dict)
    assert _pareto_run([(1, 0.0), (2, 0.0)], 80) == set()


def test_pareto_negative_revenue_fails_fast():
    # ADVICE r4: under negatives the SQL mirror's running-sum walk is
    # non-monotone (rows can re-enter the kept set) so no single
    # threshold T exists — the op must refuse, not misplace the cut
    import pytest

    with pytest.raises((ValueError, Exception)) as exc:
        _pareto_run([(1, -5.0), (2, 3.0)], 80)
    assert "non-negative" in str(exc.value)
