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

# Queries whose repeat runs would hit the per-session staged SimHash
# pair-set cache (levi_spark.queries._NEARDUP_PAIRS_CACHE) and report a
# cache-hit time instead of real work — they keep single-run timing.
SESSION_STAGED = {
    "simhash_neardup_pairs",
    "neardup_clusters",
    "dedup_canonical_corpus",
    # the ANN evaluation gates stage the exact/IVF/PQ pipelines per
    # session (queries._staged_ann) — same cache-hit concern
    "ann_recall_scores",
    "ann_ranking_metrics",
}
# EVERY non-staged query gets a 2nd run so single-run variance stops
# masquerading as regression (ivf_trained_topk swung 3.0->5.2->4.1 s,
# then embedding_pca_projection "doubled" on unchanged code in r05
# precisely because >=5 s queries were exempt — the hysteresis VERDICT
# r05 ask #4 closed). Reported time = min over runs. A 3rd
# tie-breaker run fires only on >NOISY_RATIO disagreement AND only for
# queries under THIRD_RUN_BELOW_S, bounding worst-case wall time.
THIRD_RUN_BELOW_S = 5.0
NOISY_RATIO = 1.2

# Cross-session anchor (VERDICT r07 ask #4): sessions on this shared
# VM drift 1.1-1.3x wholesale, so BENCH_DETAIL carries the anchor
# query's time and an anchor-normalized total — mechanical
# cross-session comparison is total * (ANCHOR_REF_S / anchor_seconds).
# q1_pricing_summary is the anchor: pure JVM scan+agg, unchanged since
# round 1, and the query every drift investigation already ratioed
# against. ANCHOR_REF_S pins the builder's round-7 closing session
# (q1 = 0.54 s) as the reference clock.
ANCHOR_QUERY = "q1_pricing_summary"
ANCHOR_REF_S = 0.54

# Machine-readable bench floors (VERDICT r10 ask #6): lifecycle gates
# whose warm sf0.1 cost is a JOB-COUNT floor, not a data cost — each
# runs a fixed sequence of Spark job launches against the measured
# ~130-230 ms/job JVM scheduler floor (job count O(1) in data volume;
# stage-timed analyses committed in the query docstrings, reproduce
# with LEVI_STAGE_TIMING=1). A round-over-round mover that stays
# within floor_seconds x session drift is mechanically dismissible.
FLOOR_ANALYSES = {
    "incremental_agg_refresh": {
        "floor_seconds": 6.5,
        "floor_basis": (
            "48 sequential job launches (statusTracker-counted r13; "
            "was ~50 before the live-file listing moved to the cached "
            "driver-side log replay) at the ~130-230 ms/job scheduler "
            "floor; soft_delete + CDF MERGE + refresh fold, job count "
            "O(changes) not O(data) — see queries.py docstring. r13 "
            "fresh-session min-of-3 7.38 s at anchor 0.45"
        ),
    },
    "cdc_replicate_counts": {
        "floor_seconds": 6.0,
        "floor_basis": (
            "47 sequential job launches (statusTracker-counted r13; "
            "dv_delete + cdf_merge + sync; was 49 before the live-file "
            "listing moved to the cached driver-side log replay) at "
            "the ~130-230 ms/job scheduler floor; job count O(1) per "
            "lifecycle op"
        ),
    },
    "editdist_candidate_verify": {
        "floor_seconds": 2.7,
        "floor_basis": (
            "18 sequential job launches (distributed prefix-sum rank "
            "+ neighbor join) at the scheduler floor, plus regexp/"
            "levenshtein codegen that JITs slowly: fresh-session runs "
            "arrays start 9-16 s and settle by run 3 (r13 isolated "
            "probe min-of-4 2.99 s at anchor 0.50, matching the r11 "
            "2.70 s band). The r12 driver 3.73 s and hot-session 5.4 s "
            "readings are warm-up/contention drift on unchanged code "
            "(no diff hunks since r09), not a regression"
        ),
    },
    "suffix_rank_spans": {
        "floor_seconds": 6.5,
        "floor_basis": (
            "4 prefix-doubling rounds x ~5 sequential jobs (distinct "
            "exchange, range sampling, offset collect, checkpoint, "
            "join) + span fold at the ~130-230 ms/job scheduler "
            "floor; job count O(log L) — see queries.py docstring"
        ),
    },
    "histogram_quantiles_prices": {
        "floor_seconds": 1.4,
        "floor_basis": (
            "distributed order-statistics job sequence (r11 rewrite "
            "67bd531 that killed the single-partition WindowExec): "
            "~7 sequential launches — bucket build, broadcast "
            "cumulative, count, range-repartition + localCheckpoint "
            "materialize, per-partition counts collect, targeted "
            "row_number join, final union — at the ~130-230 ms/job "
            "scheduler floor; job count O(1), the repartition is the "
            "scale win. r11 measured 1.54 s"
        ),
    },
    "doc_cdc_chunk_dedup": {
        "floor_seconds": 2.0,
        "floor_basis": (
            "short-query noise band: code unchanged since creation "
            "(git -L verified r11), 2.18-2.91 s observed across "
            "r10/r11 inside the documented 1.1-1.3x shared-VM "
            "session band; movers above ~3.5 s at anchor ~0.5 s "
            "warrant a fresh-session probe, below that it is drift"
        ),
    },
    "row_tracking_counts": {
        "floor_seconds": 4.2,
        "floor_basis": (
            "lifecycle job sequence (write + OPTIMIZE preservation "
            "rewrite + row-id attach verification) at the same "
            "scheduler floor; fresh-session re-probe r10: min-of-2 "
            "4.19 s at anchor 0.821 s — movers above this are session "
            "drift until a fresh-session probe disagrees"
        ),
    },
}

# Cross-SESSION variance notes (VERDICT r06 ask #8): queries whose
# round-over-round swings have been checked against their run arrays
# and attributed to session-level variance, not code (none changed in
# the flagged rounds). Carried into BENCH_DETAIL so a future diff
# reads the attribution next to the number.
VARIANCE_NOTES = {
    "fs_scheme_roundtrip": (
        "commit/fsync-heavy lifecycle gate with a large first-use "
        "component: r13 fresh-session run arrays [12.07, 4.28, 3.78] "
        "and [9.51, 4.41, 3.74, 3.85] on unchanged gate code — the "
        "first run used to absorb the session's one-time Python-worker "
        "imports for the executor-side write path (~3-4 s across 32 "
        "reused workers, measured: 100-row self-hosted write 4.2 s "
        "cold vs 1.1 s warm) plus JVM write-path JIT. Session-level "
        "worker warm-up (session.py:_warm_python_workers, r13) now "
        "owns the Python share; the warm band is 3.4-4.5 s and "
        "anything under ~2x of that is fsync/load noise, not a plan "
        "change (the r12 driver outlier 6.04 s had zero code diff)"
    ),
    "q16_supplier_part_counts": (
        "band 1.2-1.9s across r04-r07 sessions with unchanged code; "
        "r07 runs [1.53, 1.71] sit mid-band"
    ),
    "events_retention_cohorts": (
        "band 0.4-0.7s across r04-r07 sessions with unchanged code"
    ),
    "orders_market_basket": (
        "alternates ~2.3s / ~5s between sessions (r05 5.0, r06 2.27, "
        "r07 4.3) with unchanged code — the pairwise stage's cost "
        "tracks AQE coalesce decisions; both ends of the band hold "
        "the documented skew-safe plan"
    ),
    "multimodal_wav_decode": (
        "band 0.38-0.83s; trivial per-row work dominated by Python "
        "worker spawn timing"
    ),
    "row_tracking_counts": (
        "NOT variance: +~1.5-3s in r07 from the added OPTIMIZE "
        "preservation phase (lifecycle scheduler floor, see docstring)"
    ),
    "embedding_pca_projection": (
        "NOT variance: r08 reshaped the bench-scale Gram to pure-JVM "
        "nested posexplode (no Python workers on the critical path — "
        "the r05/r07 contention amplifier); expect ~1.7s warm vs the "
        "old 1.2-1.5s mapInPandas best case, and NO 8x blowup under "
        "shared-VM load"
    ),
    "doc_substring_dedup": (
        "NOT variance: r08 replaced the hot-gram window with the "
        "salted two-stage count over one reused exchange (VERDICT r07 "
        "ask #5); warm band 5.8-6.7s vs the window's 5.2-5.7 — the "
        "~1.1x is the price of hot-key skew-proofness at 100 TB"
    ),
    "stream_left_outer_join": (
        "NOT variance: r08 cut state shards 8 -> 4 (user-hash keys "
        "number in the hundreds at sf0.1) and stage-timed the drain; "
        "expect ~6s vs r07's 7.1s builder / 18.5s loaded-driver runs"
    ),
    "editdist_candidate_verify": (
        "NOT variance: r09 replaced vocabulary-fixed blocking (pairs "
        "grew N^2/blocks — measured 35x wall at 10x rows, BENCH_SF1) "
        "with sorted-neighborhood candidates over the distributed "
        "prefix-sum rank; warm ~3s vs the old ~1.7s — the price of "
        "<=W candidates per doc by construction"
    ),
    "embedding_lsh_neardup": (
        "NOT variance: r09 made band width adaptive "
        "(max(8, ceil(log2 N)-3)) so buckets grow with the corpus — "
        "sf0.1 unchanged (8 bits), sf1 went 115s -> ~11s (BENCH_SF1)"
    ),
    "semdedup_prune": (
        "NOT variance: r09 routed large quantized codebooks "
        "(k*dim >= 2048) to the Arrow/numpy assignment path, "
        "bit-exact with the literal argmin; sf0.1 path unchanged "
        "(k=8), sf1 went 95s -> ~43s (BENCH_SF1)"
    ),
    "_session_drift": (
        "whole-session uplift, not per-query regressions: the r07 "
        "mid-round full run measured 231.6s/161 queries; two later "
        "same-day runs on unchanged code measured 286.3s/162 and "
        "271.8s/167 with the uplift spread uniformly across "
        "unchanged queries (q1 0.48->0.66, cdc_replicate 7.8->8.8, "
        "substring_dedup 3.9->5.1, all ~1.1-1.3x) — machine-level "
        "drift on this shared VM. Compare queries WITHIN one "
        "BENCH_DETAIL, or ratio cross-session numbers against a "
        "stable anchor like q1_pricing_summary"
    ),
}


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

    def run_once(name, fn):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # noop sink materializes every output column (count() would let
        # Catalyst prune the projection and under-report)
        df.write.mode("overwrite").format("noop").save()
        sec = round(time.perf_counter() - t0, 4)
        # isolation between queries: cached RDDs and streaming memory
        # sinks left behind by one query must not tax the next
        spark.catalog.clearCache()
        for v in spark.catalog.listTables():
            if v.name.startswith("levi_stream_"):
                spark.catalog.dropTempView(v.name)
        return sec

    runs: dict[str, list[float]] = {}
    for name, (fn, _sql) in QUERIES.items():
        runs[name] = [run_once(name, fn)]
    # variance pass: every non-staged query gets a 2nd run; a 3rd only
    # when the first two disagree by >NOISY_RATIO and the query is fast
    # enough that the tie-breaker stays cheap
    for name, (fn, _sql) in QUERIES.items():
        if name in SESSION_STAGED:
            continue
        runs[name].append(run_once(name, fn))
        lo, hi = min(runs[name]), max(runs[name])
        if lo > 0 and hi / lo > NOISY_RATIO and lo < THIRD_RUN_BELOW_S:
            runs[name].append(run_once(name, fn))
    timings = {name: min(rs) for name, rs in runs.items()}
    total = round(sum(timings.values()), 4)

    fingerprint = _testdata_fingerprint(sf_dir)
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    # loud cross-round attribution guard: if the committed BENCH_DETAIL
    # was taken on different testdata bytes, timings are NOT comparable
    testdata_match = None
    if os.path.exists(detail_path):
        try:
            with open(detail_path) as f:
                prev = json.load(f)
            if prev.get("sf") == sf and "testdata" in prev:
                testdata_match = prev["testdata"] == fingerprint
        except (ValueError, OSError):
            pass
    if testdata_match is False:
        print(
            "=" * 72
            + "\nBENCH WARNING: testdata fingerprint differs from the "
            "committed BENCH_DETAIL.json —\ncross-round timing deltas are "
            "NOT attributable to code until re-baselined.\n" + "=" * 72,
            file=sys.stderr,
        )

    anchor_s = timings.get(ANCHOR_QUERY)
    anchor_norm_total = (
        round(total * ANCHOR_REF_S / anchor_s, 4) if anchor_s else None
    )
    detail = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "anchor": {
            "query": ANCHOR_QUERY,
            "anchor_seconds": anchor_s,
            "anchor_ref_seconds": ANCHOR_REF_S,
            "anchor_ref_session": "builder r07 closing bench",
            "session_drift_ratio": (
                round(anchor_s / ANCHOR_REF_S, 4) if anchor_s else None
            ),
            "anchor_normalized_total": anchor_norm_total,
            "note": (
                "cross-session comparisons should use "
                "anchor_normalized_total = value * (anchor_ref_seconds "
                "/ anchor_seconds); raw totals drift 1.1-1.3x with "
                "shared-VM load (see variance_notes._session_drift)"
            ),
        },
        "timing_note": (
            "per-query time = min over runs; EVERY query runs 2x (3rd "
            f"tie-breaker only when the first two disagree by "
            f">{NOISY_RATIO:.1f}x and the query is under "
            f"{THIRD_RUN_BELOW_S:.0f}s); session-staged queries (SimHash "
            "pair-set / ANN pipeline consumers) keep single-run timing so "
            "a cache hit is never reported as query speed"
        ),
        "sf": sf,
        "n_queries": len(timings),
        "testdata": fingerprint,
        "testdata_match_previous": testdata_match,
        "variance_notes": VARIANCE_NOTES,
        "floors": FLOOR_ANALYSES,
    }
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
        "testdata_match_previous": testdata_match,
        "anchor_seconds": anchor_s,
        "anchor_normalized_total": anchor_norm_total,
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
