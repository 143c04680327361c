"""Local replica of the driver's correctness gate.

Runs every __ray_entry__ query at the given sf dir, runs its oracle SQL in
DuckDB over the same parquet tables, and compares row count, column names,
and an order-insensitive value hash (columns sorted by name, rows sorted,
floats as-is — queries are responsible for deterministic rounding).

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, list):  # e.g. Dataset.unique() returns a list
        return pd.DataFrame({"value": res})
    return res.to_pandas()


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    rows = sorted(df.astype(str).itertuples(index=False, name=None))
    return hashlib.md5(repr(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    import __ray_entry__ as entrymod
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    # driver-side Python oracles for non-SQL-expressible rows-only
    # queries (zlib ratios, iterative bin packing) — same comparison,
    # sequential independent recomputation instead of DuckDB
    py_oracles = getattr(entrymod, "oracle_py", dict)()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"parquet_scan('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:28s} ERROR {type(e).__name__}: {e}")
            continue
        el = time.time() - t0
        if name not in oracles and name not in py_oracles:
            print(f"{name:28s} rows-only {len(got):7d} rows  {el:6.1f}s")
            continue
        if name in oracles:
            want = con.execute(oracles[name]).df()
        else:
            want = py_oracles[name](sf_dir)
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        if not problems and value_hash(got) != value_hash(want):
            problems.append("value hash mismatch")
            merged = got[sorted(got.columns)].astype(str)
            wanted = want[sorted(want.columns)].astype(str)
            a = set(map(tuple, merged.itertuples(index=False, name=None)))
            b = set(map(tuple, wanted.itertuples(index=False, name=None)))
            print("   only-in-got :", list(a - b)[:3])
            print("   only-in-want:", list(b - a)[:3])
        ok = "OK" if name in oracles else "OK(py)"
        status = ok if not problems else "FAIL " + "; ".join(problems)
        if problems:
            failures.append(name)
        print(f"{name:28s} {status}  ({len(got)} rows, {el:6.1f}s)")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
