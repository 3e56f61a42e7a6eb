"""Audit dtype drift between every query's Spark result and its DuckDB
oracle. The driver's hash is dtype-sensitive (DuckDB promotes SUM(int)
to HUGEINT -> pandas float64/object, Spark stays int64), so any column
whose pandas dtype differs between the two engines is a future
hash-mismatch. Run at sf0.001 for speed.

Usage: python tools/dtype_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from levi_spark.queries import QUERIES
from levi_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="dtype-audit")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = []
    for name, (fn, sql) in QUERIES.items():
        if sql is None:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
            want = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"ERROR {type(e).__name__}: {e}"))
            print(f"{name}: ERROR {e}", flush=True)
            continue
        gd = {c: str(d) for c, d in got.dtypes.items()}
        wd = {c: str(d) for c, d in want.dtypes.items()}
        drift = {
            c: (gd.get(c), wd.get(c))
            for c in set(gd) | set(wd)
            if gd.get(c) != wd.get(c)
        }
        if drift:
            bad.append((name, drift))
            print(f"{name}: DRIFT {drift}", flush=True)
        else:
            print(f"{name}: ok", flush=True)
    print(f"\n=== {len(bad)} queries with drift/errors ===")
    for name, d in bad:
        print(f"  {name}: {d}")


if __name__ == "__main__":
    main()
