#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB, compare row count, column
names, and an order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
       python tools/check_correctness.py [sf_dir] --window   # the driver's 50
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.map(lambda v: f"{v:.9g}" if pd.notna(v) else "NULL")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.map(lambda v: str(bool(v)) if pd.notna(v) else "NULL")
        else:
            df[c] = s.map(lambda v: "NULL" if v is None or v != v else str(v))
    return df


def value_hash(df: pd.DataFrame) -> str:
    c = _canon(df)
    rows = sorted("\x1f".join(map(str, r)) for r in c.itertuples(index=False))
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if "--window" in only:
        # convenience: exactly the driver's 50-entry correctness window
        from xcube_geodb_spark.suite import DRIVER_WINDOW

        only = (only - {"--window"}) | set(DRIVER_WINDOW)

    import __spark_entry__ as entrymod
    from xcube_geodb_spark.session import get_spark

    spark = get_spark(master="local[8]", extra_conf={"spark.driver.memory": "8g"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures, passed, rows_only = [], 0, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"spark error: {type(e).__name__}: {str(e)[:200]}"))
            print(f"FAIL {name}: spark error {str(e)[:160]}")
            continue
        if name not in oracles:
            rows_only += 1
            print(f"rows-only {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"oracle error: {str(e)[:200]}"))
            print(f"FAIL {name}: oracle error {str(e)[:160]}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        else:
            if value_hash(sdf) != value_hash(odf):
                problems.append("value hash mismatch")
            dt_mismatch = [
                (c, str(sdf[c].dtype), str(odf[c].dtype))
                for c in sdf.columns
                if str(sdf[c].dtype) != str(odf[c].dtype)
            ]
            if dt_mismatch:
                problems.append(f"dtype mismatch: {dt_mismatch}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
        else:
            passed += 1
            print(f"ok   {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
    print(
        f"\n{passed} passed, {len(failures)} failed, {rows_only} rows-only "
        f"(sf_dir={sf_dir})"
    )
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
