"""Structured Streaming surface over the ``events`` table.

The reference has no streaming plane (SURVEY.md §2.3) — this module is
part of the north-star extension set. Each job is built as a real
streaming pipeline (``readStream`` file source -> stateful transform ->
sink) and also exposed in run-to-completion form: a file-source stream
with ``Trigger.AvailableNow`` drains the input, and the sink's contents
come back as a batch DataFrame, which makes every job oracle-checkable
against DuckDB on the same parquet.

Scale stance: file-source streams partition per file; state (dedup
keys, session state, window aggregates) lives in the state store keyed
by the groupBy key, so a 1000-executor cluster shards state by key
hash. Nothing here collects to the driver.
"""

from __future__ import annotations

import uuid
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)


def _events_schema(ts_unit: str) -> StructType:
    # NANOS is only readable as a raw long (nanosAsLong); MICROS reads
    # natively as TIMESTAMP_NTZ. The stream source needs the explicit
    # schema either way, so branch on the footer unit.
    ts_type = LongType() if ts_unit == "ns" else TimestampNTZType()
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


SESSION_GAP_US = 30 * 60 * 1_000_000


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-source stream of the events table with ``ts_us`` (epoch
    micros, long) normalized exactly like the batch reader
    (levi_spark.sources.registry.read_events)."""
    from levi_spark.sources.registry import events_ts_unit

    unit = events_ts_unit(sf_dir)
    if unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file stream source requires a directory: stream the sf dir,
    # filtered down to the events file(s)
    ev = (
        spark.readStream.schema(_events_schema(unit))
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    ts_us = (
        F.expr("ts div 1000")
        if unit == "ns"
        else F.unix_micros(F.col("ts").cast("timestamp"))
    )
    return ev.withColumn("ts_us", ts_us).drop("ts")


# Per-batch state-store metrics of the MOST RECENT _drain_to_memory
# run: the "watermark bounds state" scale claim as a measured series,
# not a design note. bench_scale snapshots this after each stream_*
# query at every tier, so the artifact carries state rows/bytes per
# micro-batch at 1x/10x/100x.
LAST_STATE_METRICS: dict = {}


def _capture_state_metrics(q) -> dict:
    import json as _json

    batches = []
    for p in q.recentProgress:
        if not isinstance(p, dict):  # StreamingQueryProgress object
            p = _json.loads(p.json if isinstance(p.json, str) else p.json())
        ops = []
        for op in p.get("stateOperators") or []:
            ops.append({
                "operator": op.get("operatorName"),
                "rows_total": op.get("numRowsTotal"),
                "rows_updated": op.get("numRowsUpdated"),
                "rows_removed": op.get("numRowsRemoved"),
                "memory_bytes": op.get("memoryUsedBytes"),
            })
        batches.append({
            "batch_id": p.get("batchId"),
            "input_rows": p.get("numInputRows"),
            "state_operators": ops,
        })
    rows_series = [
        sum(op["rows_total"] or 0 for op in b["state_operators"])
        for b in batches if b["state_operators"]
    ]
    return {
        "batches": batches,
        "peak_state_rows": max(rows_series, default=0),
        "final_state_rows": rows_series[-1] if rows_series else 0,
        "peak_state_bytes": max(
            (sum(op["memory_bytes"] or 0 for op in b["state_operators"])
             for b in batches if b["state_operators"]),
            default=0,
        ),
    }


def _drain_to_memory(
    df: DataFrame, output_mode: str, state_partitions: int = 8
) -> DataFrame:
    """Run the streaming DataFrame to completion (AvailableNow) into a
    memory sink; return the sink table as a batch DataFrame.

    The stream captures ``spark.sql.shuffle.partitions`` at start as
    its state-store partition count — for per-key state over modest key
    cardinality, 32 partitions mean 32 state stores and (for Python
    stateful ops) 32 worker spawns per batch for mostly-empty splits.
    Pin a smaller count for the stream, restore the session conf after.
    """
    spark = df.sparkSession
    name = f"levi_stream_{uuid.uuid4().hex[:12]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        global LAST_STATE_METRICS
        try:
            LAST_STATE_METRICS = _capture_state_metrics(q)
        except Exception:  # metrics must never fail the drain
            LAST_STATE_METRICS = {}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def hourly_rollup_stream(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windowed aggregate with a 1-hour watermark:
    n_events + exact quantized sum(value) per (hour, event_type).
    (COUNT DISTINCT is not available in streaming aggregation — the
    batch rollup carries the n_users column.)"""
    ts = F.timestamp_micros(F.col("ts_us"))
    return (
        events.withColumn("__ts", ts)
        .withWatermark("__ts", "1 hour")
        .groupBy(F.window("__ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.col("value") * F.lit(10000.0) + F.lit(0.5)).cast("long")
            ).alias("_sv"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("hour_s"),
            "event_type",
            "n_events",
            (F.col("_sv").cast("double") / F.lit(10000.0)).alias("sum_value"),
        )
    )


def distinct_user_event_stream(events: DataFrame) -> DataFrame:
    """Streaming exact dedup: first-seen (user_id, event_type) pairs.
    ``dropDuplicates`` keeps per-key state in the state store; emitting
    only the key columns keeps the result order-insensitive."""
    return events.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )


def dedup_within_watermark_stream(events: DataFrame) -> DataFrame:
    """WATERMARK-BOUNDED streaming dedup: one row per (user_id,
    event_type, day), where duplicate suppression state is EXPIRED by
    the event-time watermark instead of growing forever —
    ``dropDuplicatesWithinWatermark``, the API an unbounded
    production stream needs (plain ``dropDuplicates`` state is
    unbounded; at 100 TB/day of events the key set does not fit
    anywhere). The 25-hour delay exceeds the dedup key's day
    granularity, so within any drain the semantics equal global
    distinct and the job stays oracle-checkable; emitting only key
    columns keeps the result order-insensitive."""
    keyed = (
        events.withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .withWatermark("ts", "25 hours")
        .withColumn("day", F.to_date("ts"))
    )
    return keyed.dropDuplicatesWithinWatermark(
        ["user_id", "event_type", "day"]
    ).select("user_id", "event_type", "day")


_SESSION_STATE_SCHEMA = "last_ts LONG, n_sessions LONG, n_events LONG"
_SESSION_OUT_SCHEMA = "user_id LONG, n_sessions LONG, n_events LONG"


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator
    (``applyInPandasWithState``) — the streaming twin of the batch
    window-algebra sessionizer in ``levi_spark.queries``. State carries
    (last event ts, session count, event count) per user across
    micro-batches; each batch's rows are folded in (ts, event_id)
    order."""
    gap_us = SESSION_GAP_US

    # defined as a closure so cloudpickle serializes it BY VALUE — the
    # executor Python workers don't need levi_spark on their path
    def sessionize_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_us", "event_id"])
            for ts in pdf["ts_us"].to_numpy():
                if last_ts is None or ts - last_ts > gap_us:
                    n_sessions += 1
                last_ts = int(ts)
                n_events += 1
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        sessionize_fn,
        outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def session_window_stream(events: DataFrame) -> DataFrame:
    """Native ``session_window`` aggregation (30-min gap): the JVM-side
    twin of ``sessionize_stream`` — session merging happens inside
    Spark's streaming session-window state store (Tungsten rows, no
    Python workers in the loop), which is the scale path for
    high-cardinality session state. Emits one row per closed session:
    (user_id, session start, event count).

    Boundary semantics differ from the Python sessionizer by design:
    ``session_window`` merges *overlapping* [ts, ts+gap) intervals, so
    an event at exactly last_ts+gap starts a NEW session (``>= gap`` ⇒
    new), while the stateful fold uses ``> gap``. The oracle encodes
    the native rule."""
    ts = F.timestamp_micros(F.col("ts_us"))
    return (
        events.withColumn("__ts", ts)
        .withWatermark("__ts", "2 hours")
        .groupBy("user_id", F.session_window("__ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start_s"),
            "n_events",
        )
    )


# -- run-to-completion entry points (oracle-checkable) ---------------------


def interval_join_stream(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Stream-stream interval join (purchase attribution): every
    purchase is matched to each view by the same user in the preceding
    hour. Both inputs carry event-time watermarks and the join
    condition bounds event time on both sides, so the state store can
    evict: a buffered view is dropped once the purchase watermark
    passes view_ts + 1h, a buffered purchase once the view watermark
    passes its ts — bounded state at any input rate, which is the whole
    trick of running this on an unbounded 100 TB/day stream. Inner
    join, so matches emit eagerly (append mode) without waiting for the
    watermark.
    """
    v = views.select(
        F.col("event_id").alias("view_event_id"),
        F.col("user_id").alias("v_user"),
        F.timestamp_micros(F.col("ts_us")).alias("v_ts"),
    ).withWatermark("v_ts", "1 hour")
    p = purchases.select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id").alias("p_user"),
        F.timestamp_micros(F.col("ts_us")).alias("p_ts"),
    ).withWatermark("p_ts", "1 hour")
    cond = (
        (v["v_user"] == p["p_user"])
        & (p["p_ts"] >= v["v_ts"])
        & (p["p_ts"] <= v["v_ts"] + F.expr("INTERVAL 1 HOUR"))
    )
    return v.join(p, cond, "inner").select(
        F.col("v_user").alias("user_id"),
        "view_event_id",
        "purchase_event_id",
        (F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("v_ts"))).alias("lag_us"),
    )


def full_outer_interval_join_stream(
    views: DataFrame, purchases: DataFrame
) -> DataFrame:
    """Stream-stream FULL OUTER interval join — the round-8 extension
    of the left-outer capability: BOTH sides' unmatched rows emit
    null-padded once the global watermark proves no match can arrive.
    A view with no purchase in its following hour emits (view, -1);
    a purchase with no same-user view in its PRECEDING hour emits
    (-1, purchase). State is bounded identically on both sides (the
    time condition bounds each row's matchable window to 1 hour), and
    eviction produces the outer rows — so with the sentinel-tail
    drain the output is row-for-row equal to a batch FULL JOIN."""
    v = views.select(
        F.col("event_id").alias("view_event_id"),
        F.col("user_id").alias("v_user"),
        F.timestamp_micros(F.col("ts_us")).alias("v_ts"),
    ).withWatermark("v_ts", "1 hour")
    p = purchases.select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id").alias("p_user"),
        F.timestamp_micros(F.col("ts_us")).alias("p_ts"),
    ).withWatermark("p_ts", "1 hour")
    cond = (
        (v["v_user"] == p["p_user"])
        & (p["p_ts"] >= v["v_ts"])
        & (p["p_ts"] <= v["v_ts"] + F.expr("INTERVAL 1 HOUR"))
    )
    return v.join(p, cond, "fullOuter").select(
        F.coalesce(F.col("v_user"), F.col("p_user")).alias("user_id"),
        F.coalesce(F.col("view_event_id"), F.lit(-1)).alias("view_event_id"),
        F.coalesce(F.col("purchase_event_id"), F.lit(-1)).alias(
            "purchase_event_id"
        ),
        F.coalesce(
            F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("v_ts")),
            F.lit(-1),
        ).alias("lag_us"),
    )


def left_outer_interval_join_stream(
    views: DataFrame, purchases: DataFrame
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every view emits — with
    its attributed purchase when one lands in the following hour, or
    NULL-padded once the watermark proves no purchase can still
    arrive. This is the stateful capability the inner join doesn't
    exercise: unmatched left rows sit in the state store until the
    GLOBAL watermark (min across both inputs) passes their last
    possible match time (view_ts + 1h), and only then emit with a
    null right side — bounded state AND complete output on an
    unbounded stream. Matched pairs still emit eagerly."""
    v = views.select(
        F.col("event_id").alias("view_event_id"),
        F.col("user_id").alias("v_user"),
        F.timestamp_micros(F.col("ts_us")).alias("v_ts"),
    ).withWatermark("v_ts", "1 hour")
    p = purchases.select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id").alias("p_user"),
        F.timestamp_micros(F.col("ts_us")).alias("p_ts"),
    ).withWatermark("p_ts", "1 hour")
    cond = (
        (v["v_user"] == p["p_user"])
        & (p["p_ts"] >= v["v_ts"])
        & (p["p_ts"] <= v["v_ts"] + F.expr("INTERVAL 1 HOUR"))
    )
    return v.join(p, cond, "leftOuter").select(
        F.col("v_user").alias("user_id"),
        "view_event_id",
        F.coalesce(F.col("purchase_event_id"), F.lit(-1)).alias(
            "purchase_event_id"
        ),
        F.coalesce(
            F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("v_ts")),
            F.lit(-1),
        ).alias("lag_us"),
    )


def _stage_stream_dir(
    path: str, real: DataFrame, sentinel_ts: list, mtime_base: float
) -> int:
    """Stage one side's stream input: the real rows land via a
    DISTRIBUTED Spark write (renamed into place — no driver-side data
    movement), then tiny driver-written sentinel files follow. Names
    and mtimes force the file-stream source's delivery order
    (FileStreamSource orders by modification time, then path): real
    batches strictly before the watermark-advancing sentinels.
    Returns the number of REAL data files staged, so the caller can
    size ``maxFilesPerTrigger`` to put every real file plus the first
    sentinel in micro-batch 1 and only the flush sentinel in batch 2
    (see the r12 drain-cost note on :func:`run_left_outer_join`)."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    tmp = path + "__tmp"
    real.select("event_id", "user_id", "ts_us").repartition(2).write.parquet(
        tmp
    )
    i = 0
    for part in sorted(glob.glob(os.path.join(tmp, "part-*.parquet"))):
        f = os.path.join(path, f"{i:03d}_batch.parquet")
        os.replace(part, f)
        os.utime(f, (mtime_base + 1000 * i,) * 2)
        i += 1
    n_real = i
    for ts in sentinel_ts:
        f = os.path.join(path, f"{i:03d}_sentinel.parquet")
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([-1], pa.int64()),
                    "user_id": pa.array([-1], pa.int64()),
                    "ts_us": pa.array([int(ts)], pa.int64()),
                }
            ),
            f,
        )
        os.utime(f, (mtime_base + 1000 * i,) * 2)
        i += 1
    return n_real


def run_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the left-outer interval join to completion with the
    SENTINEL-TAIL pattern: each side's scratch stream dir carries its
    real rows followed by two far-future sentinel files (user_id -1,
    10/11 and 30/31 days past the data's max event time). The
    sentinel batches push both watermarks — and therefore the global
    minimum — past every real view's ``v_ts + 1h`` eviction deadline,
    and the final batch flushes the evictions, so EVERY unmatched
    view emits its null-padded row and the batch oracle is exact (no
    withheld tail, the usual outer-stream-join caveat). Sentinels
    filter out by user_id afterwards.

    Stage breakdown (``LEVI_STAGE_TIMING=1`` — VERDICT r07 ask #3):
    the wall time splits into ``max_ts_probe`` (one scan+max job),
    ``stage_views``/``stage_purchases`` (one distributed parquet
    write each), and ``drain`` (the streaming query itself: 4
    micro-batches, each committing 2 join state stores x
    ``state_partitions`` HDFS-backed state partitions plus the
    file-source/offset/commit log fsyncs — O(1) in data rows).
    ``state_partitions=4`` at gate scale: the join keys on user hash
    with only hundreds of distinct users at sf0.1, so 4 shards bound
    the per-batch state-commit fan-out (the r07 default of 8 doubled
    the store-commit count for zero parallelism gain — store commits
    are I/O-bound metadata writes, not compute); a production
    deployment sizes this to executor cores.

    Drain cost (r12 optimization): each side streams with
    ``maxFilesPerTrigger = n_real_files + 1``, so micro-batch 1
    carries every real file PLUS the first sentinel and micro-batch 2
    carries only the flush sentinel — 2 micro-batches instead of the
    old one-file-per-trigger 4. Equivalence: the watermark only
    advances at END of batch (it is the previous batch's max event
    time minus the delay), so batch 1 joins all real rows under the
    initial watermark exactly as before, the sentinel seen in batch 1
    pushes the global watermark past every real eviction deadline at
    its end, and batch 2 (the second sentinel) flushes all unmatched
    state — the same advance-then-flush two-step the 4-batch layout
    performed, with the same rows emitted. Each micro-batch commits
    2 state stores x state_partitions, so halving the batch count
    halves the store-commit and offset/commit-log fsync count."""
    import tempfile
    import time as _time

    import os

    from levi_spark.functions.timing import stage_timer
    from levi_spark.sources.registry import read_events
    from pyspark.sql.types import LongType, StructField, StructType

    ev = read_events(spark, sf_dir).select(
        "event_id", "user_id", "ts_us", "event_type"
    )
    with stage_timer("stream_left_outer_join", "max_ts_probe"):
        max_ts = ev.agg(F.max("ts_us")).first()[0]
    day_us = 86_400 * 1_000_000
    base = tempfile.mkdtemp(prefix="levi_spark_lojoin_")
    vdir = os.path.join(base, "views")
    pdir = os.path.join(base, "purchases")

    t0 = _time.time() - 1_000_000
    with stage_timer("stream_left_outer_join", "stage_views"):
        nv = _stage_stream_dir(
            vdir,
            ev.where(F.col("event_type") == "view"),
            [max_ts + 10 * day_us, max_ts + 11 * day_us],
            t0,
        )
    with stage_timer("stream_left_outer_join", "stage_purchases"):
        np_ = _stage_stream_dir(
            pdir,
            ev.where(F.col("event_type") == "purchase"),
            [max_ts + 30 * day_us, max_ts + 31 * day_us],
            t0,
        )

    sch = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("ts_us", LongType()),
        ]
    )

    def stream(path: str, n_real: int) -> DataFrame:
        # real files + first sentinel in batch 1, flush sentinel in
        # batch 2 — see the drain-cost note in the docstring
        return (
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", str(n_real + 1))
            .parquet(path)
        )

    with stage_timer("stream_left_outer_join", "drain"):
        out = _drain_to_memory(
            left_outer_interval_join_stream(
                stream(vdir, nv), stream(pdir, np_)
            ),
            "append",
            state_partitions=4,
        )
    return out.where(F.col("user_id") >= 0)


def run_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the FULL OUTER interval join to completion with the same
    sentinel-tail pattern as :func:`run_left_outer_join` — the
    sentinels push the global watermark past every row's eviction
    deadline on BOTH sides, so unmatched views AND unmatched
    purchases all flush and the batch FULL JOIN oracle is exact.
    Stage timers under scope ``stream_full_outer_join``. Drains in 2
    micro-batches (real files + first sentinel, then the flush
    sentinel) — same advance-then-flush equivalence as
    :func:`run_left_outer_join`."""
    import tempfile
    import time as _time

    import os

    from levi_spark.functions.timing import stage_timer
    from levi_spark.sources.registry import read_events
    from pyspark.sql.types import LongType, StructField, StructType

    ev = read_events(spark, sf_dir).select(
        "event_id", "user_id", "ts_us", "event_type"
    )
    with stage_timer("stream_full_outer_join", "max_ts_probe"):
        max_ts = ev.agg(F.max("ts_us")).first()[0]
    day_us = 86_400 * 1_000_000
    base = tempfile.mkdtemp(prefix="levi_spark_fojoin_")
    vdir = os.path.join(base, "views")
    pdir = os.path.join(base, "purchases")

    t0 = _time.time() - 1_000_000
    with stage_timer("stream_full_outer_join", "stage_views"):
        nv = _stage_stream_dir(
            vdir,
            ev.where(F.col("event_type") == "view"),
            [max_ts + 10 * day_us, max_ts + 11 * day_us],
            t0,
        )
    with stage_timer("stream_full_outer_join", "stage_purchases"):
        np_ = _stage_stream_dir(
            pdir,
            ev.where(F.col("event_type") == "purchase"),
            [max_ts + 30 * day_us, max_ts + 31 * day_us],
            t0,
        )

    sch = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("ts_us", LongType()),
        ]
    )

    def stream(path: str, n_real: int) -> DataFrame:
        return (
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", str(n_real + 1))
            .parquet(path)
        )

    with stage_timer("stream_full_outer_join", "drain"):
        out = _drain_to_memory(
            full_outer_interval_join_stream(
                stream(vdir, nv), stream(pdir, np_)
            ),
            "append",
            state_partitions=4,
        )
    return out.where(F.col("user_id") >= 0)


def topk_users_stream(events: DataFrame) -> DataFrame:
    """Streaming pre-aggregation for windowed top-k: per-hour per-user
    event counts under a 1-hour watermark. Ranking itself is NOT a
    streaming aggregate (no window functions over an unbounded stream)
    — the deployment pattern is stream-aggregate-then-serve: the
    stream maintains the (window, user) counts incrementally in the
    state store, and the small ranked view is computed over the sink.
    At 100 TB/day the stateful agg shrinks the firehose to
    O(windows x active users) before anything sorts."""
    ts = F.timestamp_micros(F.col("ts_us"))
    return (
        events.withColumn("__ts", ts)
        .withWatermark("__ts", "1 hour")
        .groupBy(F.window("__ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("hour_s"),
            "user_id",
            "n_events",
        )
    )


def run_topk_users(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    from pyspark.sql import Window

    agg = _drain_to_memory(
        topk_users_stream(read_events_stream(spark, sf_dir)), "complete"
    )
    w = Window.partitionBy("hour_s").orderBy(
        F.col("n_events").desc(), F.col("user_id").asc()
    )
    return (
        agg.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .select("hour_s", "user_id", "n_events", "rk")
    )


def run_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = read_events_stream(spark, sf_dir).where(F.col("event_type") == "view")
    purchases = read_events_stream(spark, sf_dir).where(
        F.col("event_type") == "purchase"
    )
    return _drain_to_memory(interval_join_stream(views, purchases), "append")


def run_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _drain_to_memory(
        hourly_rollup_stream(read_events_stream(spark, sf_dir)), "complete"
    )


def run_distinct_user_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _drain_to_memory(
        distinct_user_event_stream(read_events_stream(spark, sf_dir)), "append"
    )


def run_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _drain_to_memory(
        dedup_within_watermark_stream(read_events_stream(spark, sf_dir)),
        "append",
    )


def run_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _drain_to_memory(
        session_window_stream(read_events_stream(spark, sf_dir)), "complete"
    )


def run_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session counts per user after draining the stream. With one
    input file this is a single micro-batch, so every user emits
    exactly one final row; across multiple batches the memory sink in
    update mode appends per-batch snapshots and the last row per user
    is the final one — we keep the max (counts are monotone)."""
    raw = _drain_to_memory(
        sessionize_stream(read_events_stream(spark, sf_dir)), "update"
    )
    return raw.groupBy("user_id").agg(
        F.max("n_sessions").alias("n_sessions"),
        F.max("n_events").alias("n_events"),
    )


def chained_window_agg_stream(events: DataFrame) -> DataFrame:
    """CHAINED stateful aggregation (Spark 3.5+'s multiple-stateful-
    operator support): a tumbling 1-hour windowed aggregate feeds a
    second windowed aggregate over ``window(w, '1 day')`` — the hourly
    partials close as the watermark passes each hour and flow straight
    into the daily state store within the SAME streaming query, so a
    day's rollup needs state proportional to open windows, not to the
    day's rows. Before multi-stateful support this took two queries
    glued by a sink; here it is one plan with two state stores."""
    ts = F.timestamp_micros(F.col("ts_us"))
    hourly = (
        events.withColumn("__ts", ts)
        .withWatermark("__ts", "1 hour")
        .groupBy(F.window("__ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("value") * F.lit(10000.0) + F.lit(0.5))
                .cast("long")
            ).alias("sv"),
        )
    )
    return (
        hourly.groupBy(F.window(F.col("w"), "1 day").alias("d"), "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.count(F.lit(1)).alias("n_hours"),
            F.sum("sv").alias("_sv"),
        )
        .select(
            F.date_format(F.col("d.start"), "yyyy-MM-dd").alias("day_s"),
            "event_type",
            "n_events",
            "n_hours",
            (F.col("_sv").cast("double") / F.lit(10000.0)).alias("sum_value"),
        )
    )


def run_chained_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the hourly->daily chained aggregation with the sentinel-
    tail pattern: the scratch stream dir carries the real rows, then
    two far-future sentinel batches (event_type ``zz_sentinel``, 10
    and 30 days past max event time) that push the watermark past
    every day boundary so append mode flushes ALL daily windows —
    without them the final day would stay withheld in state and the
    batch oracle could never match. Sentinels filter out afterwards.
    Scale shape: one distributed staging write; the drain commits two
    chained state stores per micro-batch, O(open windows) state.
    Drains in 2 micro-batches (real files + first sentinel, then the
    flush sentinel): the watermark only advances at end of batch, so
    batch 1 accumulates all real windows under the initial watermark
    exactly as the old one-file-per-trigger 4-batch layout did, and
    batch 2 runs with the watermark past every real hour/day boundary
    — hourly windows close into the daily store and the daily windows
    flush, the same advance-then-flush two-step, same rows out."""
    import glob
    import os
    import tempfile
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from levi_spark.sources.registry import read_events

    ev = read_events(spark, sf_dir).select(
        "event_id", "event_type", "value", "ts_us"
    )
    max_ts = ev.agg(F.max("ts_us")).collect()[0][0]
    d = tempfile.mkdtemp(prefix="levi_chain_")
    path = os.path.join(d, "stream")
    os.makedirs(path)
    tmp = path + "__tmp"
    ev.repartition(2).write.parquet(tmp)
    base = time.time()
    i = 0
    for part in sorted(glob.glob(os.path.join(tmp, "part-*.parquet"))):
        f = os.path.join(path, f"{i:03d}_batch.parquet")
        os.replace(part, f)
        os.utime(f, (base + 1000 * i,) * 2)
        i += 1
    n_real = i
    for off_days in (10, 30):
        f = os.path.join(path, f"{i:03d}_sentinel.parquet")
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([-1], pa.int64()),
                    "event_type": pa.array(["zz_sentinel"], pa.string()),
                    "value": pa.array([0.0], pa.float64()),
                    "ts_us": pa.array(
                        [int(max_ts) + off_days * 86_400_000_000],
                        pa.int64(),
                    ),
                }
            ),
            f,
        )
        os.utime(f, (base + 1000 * i,) * 2)
        i += 1
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("ts_us", LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(n_real + 1))
        .parquet(path)
    )
    out = _drain_to_memory(
        chained_window_agg_stream(stream), "append", state_partitions=4
    )
    return out.where(F.col("event_type") != "zz_sentinel")
