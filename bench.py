"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print one
JSON line: {"metric", "value", "unit", "queries": {name: sec}, "sf"}.
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
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
