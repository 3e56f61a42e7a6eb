"""Per-query measurement harness for the optimization rounds.

For each named query (default: all), in bench-identical session shape:
  * time fn(spark, sf_dir) + noop sink (same methodology as bench.py),
  * count Spark jobs launched while the query ran (statusTracker over a
    job group),
  * dump `.explain("formatted")` of the returned DataFrame plus the
    AQE-final executed plan to plans/<tag>/<name>_<suffix>.txt.

Usage:
  python tools/measure_query.py --suffix before [--plans-dir plans/r12] \
      [--runs 2] [query ...]

Timing note: min over --runs runs, like bench.py. Plans are captured on
the LAST run (after the noop write, so AQE's final plan is resolved).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from levi_spark.plans.inspect import explain_text
from levi_spark.queries import QUERIES
from levi_spark.session import get_spark


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--plans-dir", default="plans/r12")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="levi-spark-measure")
    spark.range(1).count()  # absorb JVM warmup
    sc = spark.sparkContext

    names = args.queries or list(QUERIES)
    os.makedirs(args.plans_dir, exist_ok=True)
    out = {}
    for name in names:
        fn = QUERIES[name][0]
        times, jobs, last_df = [], [], None
        for i in range(args.runs):
            group = f"measure-{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            times.append(round(time.perf_counter() - t0, 4))
            jobs.append(len(sc.statusTracker().getJobIdsForGroup(group)))
            sc.setJobGroup("", "")
            last_df = df
            spark.catalog.clearCache()
            for v in spark.catalog.listTables():
                if v.name.startswith("levi_stream_"):
                    spark.catalog.dropTempView(v.name)
        rec = {"seconds": min(times), "runs": times, "jobs": jobs}
        out[name] = rec
        if not args.no_plans:
            p = os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt")
            with open(p, "w") as f:
                f.write(f"# query: {name}\n# seconds (min of {args.runs}): "
                        f"{rec['seconds']}  runs: {times}  jobs: {jobs}\n"
                        f"# sf_dir: {sf_dir}\n\n")
                f.write("== explain(formatted) of returned DataFrame ==\n")
                f.write(explain_text(last_df, "formatted"))
                f.write("\n\n== AQE-final executed plan (after noop run) ==\n")
                f.write(last_df._jdf.queryExecution().executedPlan().toString())
        print(json.dumps({name: rec}), flush=True)
    print(json.dumps({"total": round(sum(r["seconds"] for r in out.values()), 2),
                      "n": len(out)}))


if __name__ == "__main__":
    main()
