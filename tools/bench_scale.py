"""Scaling-curve bench: run the heavy + dedup + ANN + streaming query
families at sf0.1 AND at the derived sf1 tier (see
make_scaled_testdata.py), in ONE session, and write per-query scaling
ratios to BENCH_SF1.json.

What "good" looks like: rows grow by --factor (10x), so a
linear-in-rows query should show time ratio <= factor (usually well
under it on local[32] because sf0.1 under-utilizes 32 cores — fixed
per-query overheads like Python worker spawn, micro-batch lifecycle
and scheduler floors amortize at the larger scale). A time ratio
ABOVE factor * TOLERANCE is flagged super_linear and is a plan bug to
fix, not a note to write.

Usage:
  python tools/make_scaled_testdata.py            # once
  python tools/bench_scale.py [--factor 10] [--small /root/testdata/sf0.1]
      [--large /tmp/levi_sf1] [--out BENCH_SF1.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from levi_spark.queries import QUERIES
from levi_spark.session import dir_bytes, get_spark, sized_session_conf

TOLERANCE = 1.3  # super-linear flag threshold: ratio > factor * this

DEDUP_FAMILY = [
    "exact_dedup_documents", "doc_substring_dedup",
    "doc_substring_span_report", "minhash_lsh_neardup", "doc_simhash",
    "simhash_neardup_pairs", "neardup_clusters", "dedup_canonical_corpus",
    "segment_dedup_docs", "semdedup_prune", "doc_cdc_chunk_dedup",
    "ngram_jaccard_pairs", "doc_winnow_neardup",
    "editdist_candidate_verify", "url_canonical_dedup",
    "embedding_lsh_neardup", "embedding_neardup_pairs",
]
ANN_FAMILY = [
    "ann_cosine_topk", "ivf_ann_topk", "ivf_trained_topk",
    "ivf_pq_adc_topk", "pq_adc_topk", "pq_trained_codes",
    "embedding_pq_codes", "ann_filtered_topk", "ann_hard_negatives",
    "ann_recall_scores", "ann_ranking_metrics",
    "embedding_binary_quant_topk", "kmeans_embedding_clusters",
    "embedding_pca_projection", "embedding_sq8_codes",
]
ROUND9 = [
    "zstd_lz4_roundtrip_stats", "parquet_codec_matrix_read",
    "parquet_nested_read",
]
ROUND10 = [
    "parquet_record_assembly", "parquet_bloom_point_lookup",
    "orc_bloom_point_lookup", "delta_self_hosted_roundtrip",
]
ROUND9_CLOSING = [
    "orc_column_read", "orc_write_roundtrip",
]
ANCHOR = "q1_pricing_summary"

# Round-12 (VERDICT r11 ask #2): the 100x tier is the FULL registry
# minus named per-query-budget exclusions (none at present) — every
# family's scaling curve is measured, not asserted. Reproduce with:
#   python tools/bench_scale.py --factor 100 --large /tmp/levi_sf10 \
#       --names "$(python -c 'from tools.bench_scale import TIER100; \
#                  print(",".join(TIER100))')"
TIER100_EXCLUDE: dict[str, str] = {}  # name -> budget-exclusion reason
TIER100 = [n for n in QUERIES if n not in TIER100_EXCLUDE]


def pick_queries(top_n: int = 25) -> list[str]:
    names = (set(DEDUP_FAMILY) | set(ANN_FAMILY) | set(ROUND9)
             | set(ROUND10) | set(ROUND9_CLOSING) | {ANCHOR})
    names |= {n for n in QUERIES if n.startswith("stream_")}
    detail = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DETAIL.json")
    try:
        with open(detail) as f:
            timings = json.load(f)["queries"]
        heavy = sorted(timings, key=lambda k: -timings[k])[:top_n]
        names |= set(heavy)
    except (OSError, ValueError, KeyError):
        pass
    missing = names - set(QUERIES)
    if missing:
        raise SystemExit(f"unknown queries: {sorted(missing)}")
    # registry order keeps related queries (and their staged caches)
    # adjacent
    return [n for n in QUERIES if n in names]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--large", default="/tmp/levi_sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SF1.json"))
    ap.add_argument("--names", default=None,
                    help="comma-separated subset (e.g. the heaviest "
                         "queries for a 100x tier)")
    ap.add_argument("--shuffle", type=int, default=None,
                    help="shuffle partitions override; by default BOTH "
                         "shuffle partitions and driver memory are "
                         "derived from the LARGE tier's on-disk bytes "
                         "(levi_spark.session.sized_session_conf — the "
                         "config-scales-with-data rule, now code)")
    a = ap.parse_args()

    sized = sized_session_conf(dir_bytes(a.large))
    spark = get_spark(app_name="levi-spark-bench-scale",
                      shuffle_partitions=a.shuffle
                      or sized["shuffle_partitions"],
                      driver_memory=sized["driver_memory"])
    spark.range(1).count()
    if a.names:
        names = [n.strip() for n in a.names.split(",") if n.strip()]
        missing = set(names) - set(QUERIES)
        if missing:
            raise SystemExit(f"unknown queries: {sorted(missing)}")
    else:
        names = pick_queries()
    print(f"benchmarking {len(names)} queries at {a.small} then {a.large}",
          file=sys.stderr)

    from levi_spark.streaming import jobs as _stream_jobs

    state_metrics: dict[str, dict[str, dict]] = {}

    def run(name: str, sf_dir: str) -> float | str:
        fn = QUERIES[name][0]
        _stream_jobs.LAST_STATE_METRICS = {}
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        except Exception as e:  # record, don't lose the whole run
            msg = f"ERROR: {type(e).__name__}: {str(e)[:300]}"
            print(f"  {sf_dir.rsplit('/', 1)[-1]} {name}: {msg}",
                  file=sys.stderr, flush=True)
            return msg
        sec = round(time.perf_counter() - t0, 3)
        if _stream_jobs.LAST_STATE_METRICS:
            # state rows/bytes per micro-batch: the "watermark bounds
            # state" claim as a measured curve across tiers
            m = dict(_stream_jobs.LAST_STATE_METRICS)
            m.pop("batches", None)
            m["n_batches"] = len(
                _stream_jobs.LAST_STATE_METRICS.get("batches", []))
            state_metrics.setdefault(name, {})[
                sf_dir.rsplit("/", 1)[-1]] = m
        spark.catalog.clearCache()
        for v in spark.catalog.listTables():
            if v.name.startswith("levi_stream_"):
                spark.catalog.dropTempView(v.name)
        print(f"  {sf_dir.rsplit('/', 1)[-1]} {name}: {sec}s",
              file=sys.stderr, flush=True)
        return sec

    small = {n: run(n, a.small) for n in names}
    large = {n: run(n, a.large) for n in names}

    rows = {}
    for n in names:
        if isinstance(small[n], str) or isinstance(large[n], str):
            rows[n] = {"sf0.1_sec": small[n], "sf1_sec": large[n],
                       "time_ratio": None, "super_linear": True}
            continue
        ratio = round(large[n] / small[n], 2) if small[n] > 0 else None
        rows[n] = {
            "sf0.1_sec": small[n],
            "sf1_sec": large[n],
            "time_ratio": ratio,
            "super_linear": bool(ratio and ratio > a.factor * TOLERANCE),
        }
    flagged = sorted(n for n in rows if rows[n]["super_linear"])
    out = {
        "factor_rows": a.factor,
        "tolerance": TOLERANCE,
        "small_dir": a.small,
        "large_dir": a.large,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "driver_memory": spark.conf.get("spark.driver.memory"),
        "n_queries": len(names),
        "total_sf0.1_sec": round(
            sum(v for v in small.values() if not isinstance(v, str)), 2),
        "total_sf1_sec": round(
            sum(v for v in large.values() if not isinstance(v, str)), 2),
        "median_time_ratio": (lambda rs: rs[len(rs) // 2] if rs else None)(
            sorted(r["time_ratio"] for r in rows.values()
                   if r["time_ratio"])),
        "super_linear_queries": flagged,
        "queries": rows,
        "stream_state_metrics": state_metrics,
        "method": (
            "one warm session, sf0.1 pass then sf1 pass, single run per "
            "query per scale (scaling curve, not regression detection); "
            "sf1 derived from sf0.1 by key-shifted replication "
            "(tools/make_scaled_testdata.py) so join fan-outs and group "
            "cardinalities scale like real data; super_linear flags "
            "time_ratio > factor * tolerance"
        ),
    }
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in (
        "n_queries", "total_sf0.1_sec", "total_sf1_sec",
        "median_time_ratio", "super_linear_queries")}))


if __name__ == "__main__":
    main()
