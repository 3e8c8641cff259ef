"""The ``entities`` table — the direct Arrow rendering of the reference's
``EntitiesDict``/``EntityInfo`` parallel-list data model
(src/ollama_entity_extraction/data_model/EntityInfo.py:4-17,
EntitiesDict.py:5-25): per surface form, aligned lists of page refs,
mention texts, char offsets and segment numbers, accumulated across the
whole corpus (G1 — the first wide shuffle).

Two-stage aggregation: per-batch partial collect (the combiner) then a
``groupby((type, surface))`` final merge; every list column is capped at
``max_per_entity`` with a true ``n_mentions`` count kept alongside — the
head-skew treatment (a surface on 10^9 pages ships one bounded row).
Within-entity list order is (url, seg_id, start) — content-derived, so the
table is deterministic at any parallelism (the reference's insertion order
is its sequential file order, run.py:17).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

ENTITIES_SCHEMA = pa.schema(
    [
        ("surface", pa.string()),
        ("type", pa.string()),
        ("n_mentions", pa.int64()),
        ("pages", pa.list_(pa.string())),          # reference "pages" (url ~ doc ref)
        ("mentions", pa.list_(pa.string())),
        ("mention_starts", pa.list_(pa.int32())),
        ("mention_ends", pa.list_(pa.int32())),
        ("segment_numbers", pa.list_(pa.int32())),
    ]
)

MAX_PER_ENTITY = 64


def _partial(batch: pa.Table, max_per_entity: int) -> pa.Table:
    acc: dict[tuple[str, str], dict] = {}
    for url, seg_id, text, surface, typ, start, end in zip(
        batch.column("url").to_pylist(),
        batch.column("seg_id").to_pylist(),
        batch.column("text").to_pylist(),
        batch.column("surface").to_pylist(),
        batch.column("type").to_pylist(),
        batch.column("start").to_pylist(),
        batch.column("end").to_pylist(),
    ):
        a = acc.setdefault((surface, typ), {"n": 0, "rows": []})
        a["n"] += 1
        a["rows"].append((url, seg_id, start, end, text))
    # emit the sorted smallest-``max_per_entity`` rows per key: the final
    # merge's global cap is then exactly the globally-smallest rows — the
    # capped lists are deterministic at ANY batch layout (an
    # arrival-order cap would keep batch-dependent rows)
    for a in acc.values():
        a["rows"] = sorted(a["rows"])[:max_per_entity]
    keys = sorted(acc)
    return pa.table(
        {
            "surface": pa.array([k[0] for k in keys], pa.string()),
            "type": pa.array([k[1] for k in keys], pa.string()),
            "n_mentions": pa.array([acc[k]["n"] for k in keys], pa.int64()),
            "rows": pa.array(
                [sorted(acc[k]["rows"]) for k in keys],
                pa.list_(
                    pa.struct(
                        [
                            ("url", pa.string()),
                            ("seg_id", pa.int32()),
                            ("start", pa.int32()),
                            ("end", pa.int32()),
                            ("text", pa.string()),
                        ]
                    )
                ),
            ),
        }
    )


def _final(group: pa.Table, max_per_entity: int) -> pa.Table:
    rows: list[tuple] = []
    for part in group.column("rows").to_pylist():
        rows.extend((r["url"], r["seg_id"], r["start"], r["end"], r["text"]) for r in part)
    rows = sorted(set(rows))[:max_per_entity]
    n = int(pc.sum(group.column("n_mentions")).as_py())
    return pa.table(
        {
            "surface": group.column("surface").slice(0, 1),
            "type": group.column("type").slice(0, 1),
            "n_mentions": pa.array([n], pa.int64()),
            "pages": pa.array([[r[0] for r in rows]], pa.list_(pa.string())),
            "mentions": pa.array([[r[4] for r in rows]], pa.list_(pa.string())),
            "mention_starts": pa.array([[r[2] for r in rows]], pa.list_(pa.int32())),
            "mention_ends": pa.array([[r[3] for r in rows]], pa.list_(pa.int32())),
            "segment_numbers": pa.array([[r[1] for r in rows]], pa.list_(pa.int32())),
        }
    )


def build_entities(mentions_ds, max_per_entity: int = MAX_PER_ENTITY):
    """mentions Dataset -> entities Dataset (EntityInfo parallel lists)."""
    return (
        mentions_ds.map_batches(
            _partial, fn_kwargs={"max_per_entity": max_per_entity}, batch_format="pyarrow"
        )
        .groupby(["surface", "type"])
        .map_groups(
            lambda g: _final(g, max_per_entity), batch_format="pyarrow"
        )
    )
