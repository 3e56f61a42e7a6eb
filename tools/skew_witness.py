"""Skew witness (VERDICT r10 ask #3): on a DELIBERATELY skewed events
tier (one hot user owning ``hot_frac`` of all rows —
``make_scaled_testdata.py --hot-frac``), measure the salted operators
against their plain formulations and assert bit-identical results.

Two plans per case:

* hot-GROUP rollup per user: plain ``groupBy(user_id)`` funnels the
  hot user through one reducer; ``salted_agg`` fans it over 16
  partials first.
* hot-KEY join: events x per-user profile on user_id; plain shuffle
  join puts every hot row in one task (AQE's skew split is measured
  as-is — it applies to sort-merge joins); ``salted_join`` replicates
  the build row per salt.

Writes a JSON artifact: per-case plain/salted wall seconds, the hot
key's share, and equality of results. The claim under test is NOT
"salted is always faster" (at small tiers the extra exchange costs
more than the skew) — it is (a) answers identical, (b) at the 100x
hot tier the plain plan's straggler grows with the hot share while
the salted plan scales like the uniform tier.

Round 12 adds the ADAPTIVE cases (VERDICT r11 ask #3): the same two
operators gated on the deterministic skew probe
(``levi_spark.operators.skew.adaptive_agg`` / ``adaptive_join``).
On the hot tier the probe must choose the salted plan; on a UNIFORM
tier (``--uniform-data``) it must choose the plain plan, so the
uniform case no longer pays the measured ~2× salting overhead.

Usage: python tools/skew_witness.py --data /tmp/levi_sf10_hot
           [--uniform-data /tmp/levi_sf10]
           [--out SKEW_WITNESS.json] [--n-salts 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from levi_spark.session import get_spark_for_data  # noqa: E402
from levi_spark.operators.skew import (  # noqa: E402
    adaptive_agg,
    adaptive_join,
    salted_agg,
    salted_join,
    should_salt,
    skew_probe,
)


def _timed(df):
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--uniform-data", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--n-salts", type=int, default=32)
    a = ap.parse_args()

    spark = get_spark_for_data(a.data, app_name="skew-witness")
    spark.range(1).count()
    ev = spark.read.parquet(os.path.join(a.data, "events.parquet")).select(
        "event_id", "user_id", "event_type", "value"
    )
    total = ev.count()
    hot_row = (
        ev.groupBy("user_id").count().orderBy(F.desc("count")).first()
    )
    hot_share = hot_row["count"] / total
    print(f"rows={total} hot_user={hot_row['user_id']} "
          f"share={hot_share:.1%}")

    results: dict = {
        "data": a.data,
        "rows": total,
        "hot_user_share": round(hot_share, 4),
        "n_salts": a.n_salts,
        "cases": {},
    }

    # -- case 1: hot-group rollup ------------------------------------
    evq = ev.withColumn(
        "vq", F.floor(F.col("value") * 10000.0 + F.lit(0.5)).cast("long")
    )
    plain_rollup = evq.groupBy("user_id").agg(
        F.sum("vq").alias("vq_sum"),
        F.count("event_id").alias("event_id_count"),
        F.max("event_type").alias("event_type_max"),
    )
    salted_rollup = salted_agg(
        evq,
        ["user_id"],
        {"vq": "sum", "event_id": "count", "event_type": "max"},
        salt_on=F.col("event_id"),
        n_salts=a.n_salts,
    ).select("user_id", "vq_sum", "event_id_count", "event_type_max")
    t_plain = _timed(plain_rollup)
    t_salted = _timed(salted_rollup)
    eq = (
        plain_rollup.exceptAll(salted_rollup).limit(1).count() == 0
        and salted_rollup.exceptAll(plain_rollup).limit(1).count() == 0
    )
    print(f"rollup: plain={t_plain}s salted={t_salted}s equal={eq}")
    results["cases"]["hot_group_rollup"] = {
        "plain_sec": t_plain, "salted_sec": t_salted, "equal": eq,
    }

    # -- exchange balance: rows per reducer with and without salt ----
    # Wall-clock alone under-reports skew on a 32-core VM at this tier
    # (one 3.3M-row task still finishes in under a second, and hash
    # aggregation combines map-side), so the witness also measures the
    # thing salting actually changes: the ROW DISTRIBUTION across the
    # key exchange's partitions. plain max/median is the straggler
    # multiplier a 1000-executor cluster would feel on a key exchange
    # that cannot map-side combine (sort, window, join build).
    import statistics

    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def balance(df):
        counts = [
            r["c"] for r in df.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count(F.lit(1)).alias("c")).collect()
        ]
        counts += [0] * (n_parts - len(counts))
        return {
            "max_rows": max(counts),
            "median_rows": int(statistics.median(counts)),
            "partitions": n_parts,
        }

    plain_bal = balance(ev.repartition(n_parts, "user_id"))
    salted_bal = balance(
        ev.withColumn(
            "__salt", F.pmod(F.xxhash64("event_id"), F.lit(a.n_salts))
        ).repartition(n_parts, "user_id", "__salt")
    )
    skew_mult = round(
        plain_bal["max_rows"] / max(plain_bal["median_rows"], 1), 1
    )
    salt_mult = round(
        salted_bal["max_rows"] / max(salted_bal["median_rows"], 1), 1
    )
    print(f"exchange balance: plain max/median={skew_mult}x, "
          f"salted={salt_mult}x")
    results["exchange_balance"] = {
        "plain": plain_bal, "salted": salted_bal,
        "plain_straggler_multiplier": skew_mult,
        "salted_straggler_multiplier": salt_mult,
    }

    # -- case 2: hot-key join ----------------------------------------
    profile = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_user_events")
    )
    plain_join = (
        ev.select("event_id", "user_id", "event_type")
        .hint("shuffle_hash")  # forbid broadcast: measure the shuffle
        .join(profile, on=["user_id"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("n_user_events").alias("weight"),
        )
    )
    s_join = (
        salted_join(
            ev.select("event_id", "user_id", "event_type"),
            profile,
            on=["user_id"],
            salt_on=F.col("event_id"),
            n_salts=a.n_salts,
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("n_user_events").alias("weight"),
        )
    )
    t_plain_j = _timed(plain_join)
    t_salted_j = _timed(s_join)
    eq_j = (
        plain_join.exceptAll(s_join).limit(1).count() == 0
        and s_join.exceptAll(plain_join).limit(1).count() == 0
    )
    print(f"join:   plain={t_plain_j}s salted={t_salted_j}s equal={eq_j}")
    results["cases"]["hot_key_join"] = {
        "plain_sec": t_plain_j, "salted_sec": t_salted_j, "equal": eq_j,
    }

    # -- adaptive cases: probe-gated plan choice ----------------------
    # The hot tier must CHOOSE the salted plan; the uniform tier must
    # CHOOSE the plain one (and therefore stop paying the ~2x salting
    # overhead the r11 witness measured honestly). Timings are listed
    # next to the fixed-plan numbers above so the delta is visible.
    def adaptive_case(ev_frame, label):
        evq_f = ev_frame.withColumn(
            "vq", F.floor(F.col("value") * 10000.0 + F.lit(0.5))
            .cast("long")
        )
        probe = skew_probe(ev_frame, ["user_id"], F.col("event_id"))
        chose_salt = should_salt(probe, n_parts)
        ad_rollup = adaptive_agg(
            evq_f, ["user_id"],
            {"vq": "sum", "event_id": "count", "event_type": "max"},
            salt_on=F.col("event_id"), n_salts=a.n_salts,
        ).select("user_id", "vq_sum", "event_id_count", "event_type_max")
        t_ad = _timed(ad_rollup)
        profile_f = ev_frame.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_user_events")
        )
        ad_join = (
            adaptive_join(
                ev_frame.select("event_id", "user_id", "event_type"),
                profile_f, on=["user_id"], salt_on=F.col("event_id"),
                n_salts=a.n_salts,
            )
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("n_user_events").alias("weight"))
        )
        t_adj = _timed(ad_join)
        print(f"adaptive[{label}]: probe hot={probe['hot_count']}/"
              f"{probe['sampled']} -> "
              f"{'SALTED' if chose_salt else 'PLAIN'}; "
              f"rollup={t_ad}s join={t_adj}s")
        return {
            "probe": probe,
            "chose_salted": bool(chose_salt),
            "rollup_sec": t_ad,
            "join_sec": t_adj,
        }

    results["adaptive"] = {"hot": adaptive_case(ev, "hot")}
    adaptive_ok = results["adaptive"]["hot"]["chose_salted"]
    if a.uniform_data:
        evu = spark.read.parquet(
            os.path.join(a.uniform_data, "events.parquet")
        ).select("event_id", "user_id", "event_type", "value")
        # fixed-plan reference points on the uniform tier
        evuq = evu.withColumn(
            "vq", F.floor(F.col("value") * 10000.0 + F.lit(0.5))
            .cast("long")
        )
        u_plain = _timed(evuq.groupBy("user_id").agg(
            F.sum("vq").alias("vq_sum"),
            F.count("event_id").alias("event_id_count"),
            F.max("event_type").alias("event_type_max"),
        ))
        u_salted = _timed(salted_agg(
            evuq, ["user_id"],
            {"vq": "sum", "event_id": "count", "event_type": "max"},
            salt_on=F.col("event_id"), n_salts=a.n_salts,
        ))
        u_case = adaptive_case(evu, "uniform")
        u_case["plain_sec"] = u_plain
        u_case["salted_sec"] = u_salted
        results["adaptive"]["uniform"] = u_case
        print(f"uniform fixed plans: plain={u_plain}s salted={u_salted}s")
        adaptive_ok = adaptive_ok and not u_case["chose_salted"]

    blob = json.dumps(results, indent=1)
    if a.out:
        with open(a.out, "w") as fh:
            fh.write(blob + "\n")
        print("wrote", a.out)
    else:
        print(blob)
    sys.exit(0 if eq and eq_j and adaptive_ok else 1)


if __name__ == "__main__":
    main()
