"""Round-4 fourteenth-batch ops: CSV interchange roundtrip, boolean AND
whole-token retrieval."""
import re

import pyarrow as pa
import pytest


def test_csv_roundtrip_hostile_text(tmp_path):
    import ray

    from pdf_entity_extraction_ray.sources.csvio import (
        read_docs_csv,
        write_docs_csv,
    )

    rows = [
        (1, 'plain text', "en", "web", 10),
        (2, 'with "quotes" and, commas', "en", "web", 25),
        (3, "multi\nline\ntext", "fr", "crawl", 15),
        (4, "", "de", "web", 0),
        (5, "123456", "en", "web", 6),  # all-digit text must stay string
        (6, "trailing space ", "pt", "web", 15),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array([r[4] for r in rows], pa.int64()),
            }
        )
    )
    out = str(tmp_path / "csv")
    write_docs_csv(ds, out)
    back = read_docs_csv(out)
    got = sorted(
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in back.take_all()
    )
    # Arrow CSV reads empty quoted strings back as empty strings OR null
    # depending on quoting; normalize None -> "" like the writer emitted
    got = [(a, b if b is not None else "", c, d, e) for a, b, c, d, e in got]
    assert got == rows
    sch = back.schema()
    base = getattr(sch, "base_schema", sch)
    assert base.field("text").type == pa.string()
    assert base.field("doc_id").type == pa.int64()


def _search(texts, terms):
    import ray

    from pdf_entity_extraction_ray.ops.text import and_search

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    return {r["doc_id"] for r in and_search(ds, terms).take_all()}


def test_and_search_whole_token_semantics():
    texts = [
        "fast hash join",          # both
        "the fastest hash",        # 'fast' only inside 'fastest' -> no
        "fast but no h-word",      # one term
        "HASH then FAST",          # case-insensitive
        "fast,hash",               # punctuation boundaries
        "hash fast hash fast",     # repeats
        "",
    ]
    assert _search(texts, ("fast", "hash")) == {0, 3, 4, 5}


def test_and_search_matches_token_grammar():
    token_re = re.compile(r"[a-z0-9_]+")
    texts = [
        "alpha_2 beta", "alpha_2beta", "x alpha_2, beta!", "beta alpha_2",
        "alpha 2 beta", "alpha_2\nbeta",
    ]
    gold = {
        i
        for i, t in enumerate(texts)
        if {"alpha_2", "beta"} <= set(token_re.findall(t.lower()))
    }
    assert _search(texts, ("alpha_2", "beta")) == gold


def test_and_search_rejects_non_token_terms():
    with pytest.raises(ValueError):
        _search(["x"], ("Fast",))
    with pytest.raises(ValueError):
        _search(["x"], ("a b",))
    with pytest.raises(ValueError):
        _search(["x"], ())


def test_new_users_bruteforce():
    import random

    import numpy as np
    import ray

    from pdf_entity_extraction_ray.ops.relational import events_new_users

    rng = random.Random(17)
    users, ts = [], []
    base = np.datetime64("2024-03-01T12:00:00", "us")
    for u in range(60):
        for _ in range(rng.randrange(1, 6)):
            users.append(u)
            ts.append(base + np.timedelta64(rng.randrange(0, 20 * 86400), "s"))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
            }
        )
    )
    rows = events_new_users(ds).take_all()
    got = [(r["day"], r["n_new"], r["cum_users"]) for r in rows]
    first = {}
    for u, t in zip(users, ts):
        d = str(t.astype("datetime64[D]"))
        first[u] = min(first.get(u, d), d)
    per_day = {}
    for d in first.values():
        per_day[d] = per_day.get(d, 0) + 1
    gold, cum = [], 0
    for d in sorted(per_day):
        cum += per_day[d]
        gold.append((d, per_day[d], cum))
    assert got == gold
    assert got[-1][2] == 60  # every user counted exactly once
