"""Local mimic of the driver's correctness gate: run every queries() entry
at a given sf_dir and compare to oracle_sql() via DuckDB (row count, schema,
order-insensitive value hash).  Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_table(result) -> pa.Table:
    import pandas as pd
    import ray.data

    if isinstance(result, ray.data.Dataset):
        batches = list(result.iter_batches(batch_format="pyarrow"))
        if batches:
            return pa.concat_tables(batches, promote_options="default")
        # Dataset.schema() is Ray's Schema wrapper; the pyarrow schema
        # lives on .base_schema (older Ray returned pyarrow directly);
        # a fully-empty dataset has no schema at all
        schema = result.schema()
        if schema is None:
            return pa.table({})
        return getattr(schema, "base_schema", schema).empty_table()
    if isinstance(result, pd.DataFrame):
        return pa.Table.from_pandas(result)
    return result


def value_hash(tbl: pa.Table) -> str:
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    rows = sorted(repr(r) for r in zip(*[tbl.column(c).to_pylist() for c in cols]))
    return hashlib.blake2b("\n".join(rows).encode(), digest_size=8).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # oracle_sql() reads gold tables under /tmp/..._v1/<scale-name>/ — tell
    # it which scale this run is so the harness is honest at any sf
    os.environ["GRAFT_ORACLE_SF"] = os.path.basename(os.path.normpath(sf_dir)) or "sf0.01"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"create view {t} as select * from '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ours = to_table(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {ours.num_rows} rows, cols={sorted(ours.column_names)}")
            continue
        theirs = con.execute(oracles[name]).arrow()
        ok_rows = ours.num_rows == theirs.num_rows
        ok_schema = sorted(ours.column_names) == sorted(theirs.column_names)
        ok_hash = ok_schema and value_hash(ours) == value_hash(theirs)
        status = "PASS" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{status}  {name}: rows {ours.num_rows}/{theirs.num_rows} "
            f"schema={'ok' if ok_schema else (sorted(ours.column_names), sorted(theirs.column_names))} "
            f"hash={'ok' if ok_hash else 'MISMATCH'}"
        )
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
