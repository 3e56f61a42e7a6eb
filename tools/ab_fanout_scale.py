"""Valid fan-out A/B at an arbitrary tier: times each capped codec
gate at explicit LEVI_CODEC_FANOUT widths (the env override now beats
the cap — before that fix, tools/ab_fanout.py compared 8-vs-8 on
capped gates and its per-gate deltas were pure session noise).

Usage:
  SPARK_GRAFT_SF_DIR=/tmp/levi_sf10 python tools/ab_fanout_scale.py \
      [--widths 8,32] [--runs 1] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from levi_spark.queries import QUERIES
from levi_spark.session import get_spark

CAPPED = [
    "parquet_nested_read", "parquet_prune_scan",
    "parquet_bloom_point_lookup", "parquet_column_read",
    "orc_column_read",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="8,32")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    widths = [w.strip() for w in args.widths.split(",") if w.strip()]
    spark = get_spark(app_name="levi-ab-fanout-scale")
    spark.range(1).count()

    names = args.queries or CAPPED
    out = {}
    for name in names:
        fn = QUERIES[name][0]
        rec = {}
        for w in widths:
            os.environ["LEVI_CODEC_FANOUT"] = w
            times = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format(
                    "noop").save()
                times.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
            rec[w] = {"min": min(times), "runs": times}
            print(json.dumps({name: {w: rec[w]}}), flush=True)
        out[name] = rec
    os.environ.pop("LEVI_CODEC_FANOUT", None)
    print(json.dumps({"sf_dir": sf_dir, "summary": {
        n: {k: v["min"] for k, v in r.items()} for n, r in out.items()
    }}))


if __name__ == "__main__":
    main()
