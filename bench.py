"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print one
JSON line: {"metric", "value", "unit", "queries": {name: sec}, "sf"}.

The driver keeps only the LAST 2000 chars of stdout (BENCH_r01.json's
"tail"), so the stdout line must fit that window or it cannot be parsed.
With 80+ registered queries the full per-query map is ~2.4k chars, so:
  - stdout gets ONE compact JSON line whose "queries" map holds the
    slowest queries first, greedily packed under a 1800-char budget
    (slowest first = the regression-relevant ones survive truncation);
  - the COMPLETE per-query map is written to BENCH_DETAIL.json next to
    this file and echoed to stderr, for the judge / local diffing.
"value" is always the total over ALL queries, not just the printed ones.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from levi_spark.queries import QUERIES
from levi_spark.session import get_spark

STDOUT_BUDGET = 1800


def _testdata_fingerprint(sf_dir: str) -> dict:
    """Per-table row counts + content md5 of the input parquet, so
    round-over-round bench comparisons can tell a code regression from
    a driver-side testdata regeneration (the r01->r02 confound)."""
    import hashlib

    import pyarrow.parquet as pq

    out = {}
    for name in sorted(os.listdir(sf_dir)):
        if not name.endswith(".parquet"):
            continue
        p = os.path.join(sf_dir, name)
        h = hashlib.md5()
        with open(p, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        out[name[:-len(".parquet")]] = {
            "rows": pq.ParquetFile(p).metadata.num_rows,
            "bytes": os.path.getsize(p),
            "md5": h.hexdigest(),
        }
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="levi-spark-bench")
    # one tiny action to absorb JVM/session warmup out of the first query
    spark.range(1).count()

    timings: dict[str, float] = {}
    for name, (fn, _sql) in QUERIES.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # noop sink materializes every output column (count() would let
        # Catalyst prune the projection and under-report)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        # isolation between queries: cached RDDs and streaming memory
        # sinks left behind by one query must not tax the next
        spark.catalog.clearCache()
        for v in spark.catalog.listTables():
            if v.name.startswith("levi_stream_"):
                spark.catalog.dropTempView(v.name)
    total = round(sum(timings.values()), 4)

    detail = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "testdata": _testdata_fingerprint(sf_dir),
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(json.dumps(detail), file=sys.stderr)

    # stdout line: slowest-first greedy pack under the tail budget
    head = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": {},
        "sf": sf,
        "n_queries": len(timings),
        "detail": "BENCH_DETAIL.json",
    }
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        trial = dict(head)
        trial["queries"] = {**head["queries"], name: round(sec, 2)}
        if len(json.dumps(trial, separators=(",", ":"))) > STDOUT_BUDGET:
            break
        head = trial
    sys.stderr.flush()
    print(json.dumps(head, separators=(",", ":")))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
