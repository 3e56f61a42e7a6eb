"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet
tables, compare row count, schema width, and order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def frame_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    )
    return normed


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from levi_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    # Retired (pytest-only) queries stay checkable when named explicitly.
    from levi_spark.queries import RETIRED_QUERIES

    for rname, (rfn, rsql) in RETIRED_QUERIES.items():
        if rname in only:
            qs[rname] = rfn
            if rsql is not None:
                oracles[rname] = rsql
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:34s} rows={len(srows):7d}  (no oracle — rows-only)")
            continue
        orel = con.execute(oracles[name])
        ocols = [d[0] for d in orel.description]
        orows = orel.fetchall()
        status = []
        if len(srows) != len(orows):
            status.append(f"ROWS {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            status.append(f"COLS {sorted(scols)} vs {sorted(ocols)}")
        if not status:
            if frame_key(srows, scols) != frame_key(orows, ocols):
                sk, ok = frame_key(srows, scols), frame_key(orows, ocols)
                diffs = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
                status.append(f"VALUES (first diffs: {diffs})")
        if status:
            failures.append(name)
            print(f"{name:34s} FAIL: {'; '.join(status)[:500]}")
        else:
            print(f"{name:34s} OK    rows={len(srows)}")
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match the oracle")


if __name__ == "__main__":
    main()
