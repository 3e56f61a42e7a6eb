"""Same-session A/B of the codec-gate fan-out width.

Times each codec gate with LEVI_CODEC_FANOUT=8 vs unset (full
defaultParallelism) interleaved in ONE Spark session, so session
drift cancels. Bench methodology otherwise (noop sink, min of runs).

Usage: python tools/ab_fanout.py [--runs 2] [query ...]
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

GATES = [
    "parquet_column_read", "orc_column_read", "orc_write_roundtrip",
    "parquet_codec_matrix_read", "parquet_nested_read",
    "parquet_prune_scan", "parquet_write_roundtrip",
    "parquet_record_assembly", "orc_bloom_point_lookup",
    "parquet_bloom_point_lookup",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--master", default=None,
        help="e.g. local-cluster[2,16,8192] for the multi-JVM witness "
             "(VERDICT r12 ask #8); default: get_spark's local[cpus]",
    )
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if args.master and args.master.startswith("local-cluster"):
        # executor JVMs spawn their own Python workers; pin the exact
        # interpreter (same as tools/local_cluster_window.py)
        os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    spark = get_spark(app_name="levi-ab-fanout", master=args.master)
    spark.range(1).count()

    names = args.queries or GATES
    out = {}
    for name in names:
        fn = QUERIES[name][0]
        rec = {}
        # warm both variants once (codegen, file listing), untimed
        for variant in ("8", None):
            if variant is None:
                os.environ.pop("LEVI_CODEC_FANOUT", None)
            else:
                os.environ["LEVI_CODEC_FANOUT"] = variant
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        for variant in ("8", None):
            key = variant or "wide"
            if variant is None:
                os.environ.pop("LEVI_CODEC_FANOUT", None)
            else:
                os.environ["LEVI_CODEC_FANOUT"] = variant
            times = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format(
                    "noop").save()
                times.append(round(time.perf_counter() - t0, 4))
            rec[key] = {"min": min(times), "runs": times}
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print(json.dumps({"summary": {
        n: {k: v["min"] for k, v in r.items()} for n, r in out.items()
    }}))


if __name__ == "__main__":
    main()
