"""Multi-process execution witness (VERDICT r10 ask #2): run the
driver's 50-query correctness window under Spark's pseudo-distributed
``local-cluster[N,C,M]`` master — separate executor JVMs with a REAL
serialization boundary between driver and executors — and compare
every query against the DuckDB oracle, exactly like the per-round
driver gate.

What this catches that ``local[32]`` cannot:

* driver-local scratch paths an executor task tries to read/write
  (different process, same machine here — but the code path is the
  cluster one: files move through the shuffle/broadcast machinery,
  not shared JVM memory);
* closure-capture bugs (anything unserializable or driver-stateful
  captured into a task);
* accumulator/broadcast misuse that one-JVM local mode silently
  forgives.

Usage: python tools/local_cluster_window.py [sf_dir] [n_queries]
Writes LOCALCLUSTER_r{N}.json next to the repo root when --out is
given, else prints the JSON to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_check import TABLES, frame_key  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = None
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    n_queries = int(args[1]) if len(args) > 1 else 50
    offset = 0
    for a in sys.argv[1:]:
        if a.startswith("--offset="):
            offset = int(a.split("=", 1)[1])

    import __spark_entry__ as e
    from levi_spark.session import get_spark

    # 2 executor JVMs x 16 cores x 8 GiB — the same 32-way parallelism
    # as the test default, split across two OS processes so every
    # task boundary serializes for real.
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    master = os.environ.get(
        "SPARK_GRAFT_CLUSTER_MASTER", "local-cluster[2,16,8192]"
    )
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = get_spark(
        app_name="local-cluster-window",
        master=master,
        extra_conf={
            "spark.executor.memory": "8g",
            "spark.executorEnv.PYTHONPATH": pkg_root,
        },
    )
    execs = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
    # driver counts as one entry; a real local-cluster run shows 3
    print(f"master={master} executor-status entries={execs}")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    window = list(qs)[offset:offset + n_queries]
    results: dict[str, dict] = {}
    failures = []
    for name in window:
        t0 = time.time()
        rec: dict = {}
        try:
            sdf = qs[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            rec["spark_rows"] = len(srows)
            if name in oracles:
                orel = con.execute(oracles[name])
                ocols = [d[0] for d in orel.description]
                orows = orel.fetchall()
                rec["oracle_rows"] = len(orows)
                rec["rows_match"] = len(srows) == len(orows)
                rec["schema_match"] = sorted(scols) == sorted(ocols)
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and frame_key(srows, scols) == frame_key(orows, ocols)
                )
            else:
                rec["rows_match"] = rec["hash_match"] = None
            rec["err"] = None
        except Exception as ex:  # noqa: BLE001 — the witness must record
            rec["err"] = f"{type(ex).__name__}: {ex}"[:400]
        rec["sec"] = round(time.time() - t0, 3)
        ok = rec["err"] is None and rec.get("hash_match") in (True, None)
        if not ok:
            failures.append(name)
        results[name] = rec
        print(f"{name:34s} {'OK' if ok else 'FAIL':4s} {rec['sec']:7.2f}s")

    # prove we really ran multi-process: after the jobs, the registered
    # executor set must hold the driver plus both executor JVMs
    execs_end = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
    print(f"executor-status entries at end: {execs_end}")
    if master.startswith("local-cluster") and execs_end < 3:
        failures.append("__executor_count__")
    artifact = {
        "master": master,
        "sf_dir": sf_dir,
        "n": len(window),
        "executors_registered": execs_end,
        "failures": failures,
        "queries": results,
    }
    blob = json.dumps(artifact, indent=1)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(blob + "\n")
        print(f"wrote {out_path}")
    else:
        print(blob)
    print(f"{len(window) - len(failures)}/{len(window)} green under {master}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
