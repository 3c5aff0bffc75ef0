"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compare row count, column names, and order-insensitive value sets.

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from onionnet_spark.session import get_spark

SF_DIR = os.environ.get("ONIONNET_CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_value(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def spark_result(df):
    cols = sorted(df.columns)
    rows = sorted(
        (tuple(norm_value(r[c]) for c in cols) for r in df.collect()), key=repr
    )
    return cols, rows


def duck_result(con, sql):
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(
        (tuple(norm_value(row[i]) for i in order) for row in res.fetchall()),
        key=repr,
    )
    return sorted(cols), rows


def main():
    only = set(sys.argv[1:])
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            s_cols, s_rows = spark_result(df)
        except Exception as e:
            print(f"FAIL  {name}: SPARK ERROR {type(e).__name__}: {e}")
            failures.append(name)
            n_fail += 1
            continue
        if name not in oracles:
            status = "ROWS-ONLY"
            ok = len(s_rows) >= 0
            n_rowsonly += 1
            print(f"{status:9s} {name}: rows={len(s_rows)} ({time.time()-t0:.1f}s)")
            continue
        try:
            d_cols, d_rows = duck_result(con, oracles[name])
        except Exception as e:
            print(f"FAIL  {name}: ORACLE ERROR {type(e).__name__}: {e}")
            failures.append(name)
            n_fail += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL  {name}: schema mismatch spark={s_cols} duck={d_cols}")
            failures.append(name)
            n_fail += 1
        elif len(s_rows) != len(d_rows):
            print(
                f"FAIL  {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}"
            )
            failures.append(name)
            n_fail += 1
        elif s_rows != d_rows:
            diff_s = [r for r in s_rows if r not in set(d_rows)][:3]
            diff_d = [r for r in d_rows if r not in set(s_rows)][:3]
            print(f"FAIL  {name}: value mismatch; spark-only={diff_s} duck-only={diff_d}")
            failures.append(name)
            n_fail += 1
        else:
            n_pass += 1
            print(f"PASS  {name}: rows={len(s_rows)} ({time.time()-t0:.1f}s)")
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    if failures:
        print("failures:", failures)
        sys.exit(1)


if __name__ == "__main__":
    main()
