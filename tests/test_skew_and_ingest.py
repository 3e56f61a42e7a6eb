"""Skew-mitigation helpers and streaming->Delta ingestion tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from levi_spark.delta.log import DeltaLog
from levi_spark.operators.skew import salted_agg, salted_join
from levi_spark.streaming.delta_sink import ingest_events


@pytest.fixture(scope="module")
def skewed(spark):
    """1 hot key (50k rows) + 1000 cold keys (10 rows each)."""
    hot = spark.range(50_000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    cold = spark.range(10_000).select(
        (F.col("id") % 1000 + 1).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(cold)


def test_salted_agg_matches_plain(spark, skewed):
    got = {
        (r.k): (r.v_count, r.v_sum)
        for r in salted_agg(
            skewed, ["k"], {"v": "count"}, salt_on=F.col("v"), n_salts=8
        )
        .join(
            salted_agg(skewed, ["k"], {"v": "sum"}, salt_on=F.col("v"), n_salts=8),
            "k",
        )
        .collect()
    }
    want = {
        (r.k): (r.c, r.s)
        for r in skewed.groupBy("k")
        .agg(F.count("v").alias("c"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == want


def test_salted_agg_rejects_non_decomposable(skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, ["k"], {"v": "median"}, salt_on=F.col("v"))


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.range(1001).select(
        F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    got = sorted(
        map(
            tuple,
            salted_join(skewed, dim, ["k"], salt_on=F.col("v"), n_salts=8)
            .groupBy("k", "name")
            .count()
            .collect(),
        )
    )
    want = sorted(
        map(tuple, skewed.join(dim, "k").groupBy("k", "name").count().collect())
    )
    assert got == want


def test_salted_join_spreads_hot_key(spark, skewed):
    dim = spark.range(1001).select(F.col("id").alias("k"))
    j = salted_join(skewed, dim, ["k"], salt_on=F.col("v"), n_salts=8)
    # the hot key's rows must land in >1 shuffle partition pre-drop
    parts = (
        j.where(F.col("k") == 0)
        .withColumn("__pid", F.spark_partition_id())
        .select("__pid")
        .distinct()
        .count()
    )
    assert parts > 1


def test_stream_ingest_into_delta(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    table = str(tmp_path / "events_delta")
    ckpt = str(tmp_path / "ckpt")
    ingest_events(spark, sf, table, ckpt, max_files_per_trigger=1)
    snap = DeltaLog(spark, table).snapshot()
    src_rows = spark.read.parquet(f"{sf}/events.parquet").count()
    assert snap.to_df().count() == src_rows
    assert set(snap.metadata.partition_columns) == {"event_type"}
    # restart with the same checkpoint: nothing new to consume -> no new version
    v_before = DeltaLog(spark, table).latest_version()
    ingest_events(spark, sf, table, ckpt, max_files_per_trigger=1)
    assert DeltaLog(spark, table).latest_version() == v_before
    assert DeltaLog(spark, table).snapshot().to_df().count() == src_rows


def test_stream_ingest_crash_replay_is_exactly_once(spark, tmp_path):
    """A batch replayed after a crash between table-commit and source-
    checkpoint write (simulated by re-invoking the sink with the same
    batch_id) must be a no-op — the SetTransaction recorded in the
    commit makes the sink idempotent."""
    from levi_spark.streaming.delta_sink import _sink_batch

    table = str(tmp_path / "t")
    batch = spark.createDataFrame([(1, "a"), (2, "b")], "k INT, e STRING")
    assert _sink_batch(batch, 0, table, None, "app-x") is True
    v0 = DeltaLog(spark, table).latest_version()
    # crash replay of batch 0: skipped, no new version, no duplicate rows
    assert _sink_batch(batch, 0, table, None, "app-x") is False
    assert DeltaLog(spark, table).latest_version() == v0
    assert DeltaLog(spark, table).snapshot().to_df().count() == 2
    # the next batch still lands
    assert _sink_batch(batch, 1, table, None, "app-x") is True
    assert DeltaLog(spark, table).snapshot().to_df().count() == 4


def test_stream_upsert_sink_crash_replay_and_merge(spark, tmp_path):
    """The streaming upsert sink: (a) a batch reduces to its latest row
    per key and MERGEs (matched keys update, new keys insert); (b) a
    crash replay of an applied batch is skipped entirely."""
    from pyspark.sql import functions as F

    from levi_spark.delta.log import DeltaLog
    from levi_spark.streaming import delta_sink as ds

    table = str(tmp_path / "t")

    # reach the inner foreachBatch sink without a streaming query
    captured = {}

    class _FakeWriter:
        def __init__(self, fn):
            captured["sink"] = fn

    import types

    def run_batches(*batches):
        # build the sink closure exactly as stream_upsert_to_delta does
        stream_stub = types.SimpleNamespace()
        # call through the real function but intercept writeStream
        orig = ds.stream_upsert_to_delta

        class _WS:
            def foreachBatch(self, fn):
                captured["sink"] = fn
                return self

            def option(self, *a):
                return self

            def trigger(self, **k):
                return self

            def start(self):
                return types.SimpleNamespace(awaitTermination=lambda: None)

        stream_stub.writeStream = _WS()
        orig(
            stream_stub, table, str(tmp_path / "ckpt"),
            keys=["k"], order_cols=["ts", "seq"],
        )
        for bid, b in batches:
            captured["sink"](b, bid)

    b0 = spark.createDataFrame(
        [(1, 10, 0, "a"), (1, 20, 1, "b"), (2, 5, 0, "c")],
        "k long, ts long, seq long, tag string",
    )
    b1 = spark.createDataFrame(
        [(1, 30, 0, "d"), (3, 1, 0, "e")],
        "k long, ts long, seq long, tag string",
    )
    run_batches((0, b0), (1, b1))
    got = {r.k: (r.ts, r.tag) for r in DeltaLog(spark, table).snapshot().to_df().collect()}
    # k=1: batch-0 reduced to ts=20 then updated to ts=30 by batch 1
    assert got == {1: (30, "d"), 2: (5, "c"), 3: (1, "e")}
    v = DeltaLog(spark, table).latest_version()
    # crash replay of batch 1: skipped — no new version, same rows
    captured["sink"](b1, 1)
    assert DeltaLog(spark, table).latest_version() == v
    assert {r.k for r in DeltaLog(spark, table).snapshot().to_df().collect()} == {1, 2, 3}


def test_stream_upsert_sink_ignores_stale_rows_in_later_batches(spark, tmp_path):
    """File-stream batch order is path order, not event-time order: an
    OLDER row for a key arriving in a LATER batch must not clobber the
    newer stored state (the matched update is conditional on the order
    tuple)."""
    import types

    from pyspark.sql import functions as F

    from levi_spark.delta.log import DeltaLog
    from levi_spark.streaming import delta_sink as ds

    table = str(tmp_path / "t")
    captured = {}

    class _WS:
        def foreachBatch(self, fn):
            captured["sink"] = fn
            return self

        def option(self, *a):
            return self

        def trigger(self, **k):
            return self

        def start(self):
            return types.SimpleNamespace(awaitTermination=lambda: None)

    stub = types.SimpleNamespace(writeStream=_WS())
    ds.stream_upsert_to_delta(
        stub, table, str(tmp_path / "ckpt"), keys=["k"],
        order_cols=["ts", "seq"],
    )
    b0 = spark.createDataFrame([(1, 100, 0, "new")], "k long, ts long, seq long, tag string")
    b1 = spark.createDataFrame([(1, 50, 0, "old"), (2, 1, 0, "x")],
                               "k long, ts long, seq long, tag string")
    captured["sink"](b0, 0)
    captured["sink"](b1, 1)
    got = {r.k: (r.ts, r.tag) for r in DeltaLog(spark, table).snapshot().to_df().collect()}
    assert got[1] == (100, "new")   # stale ts=50 did NOT overwrite
    assert got[2] == (1, "x")       # genuinely new key still inserted


# -- adaptive salting (round 12, VERDICT r11 ask #3) ------------------


def test_skew_probe_detects_hot_key(spark, skewed):
    from levi_spark.operators.skew import should_salt, skew_probe

    p = skew_probe(skewed, ["k"], F.col("v"))
    # hot key holds ~83% of rows; the ~1/101 sample must see that
    assert p["sampled"] > 200
    assert p["hot_count"] / p["sampled"] > 0.5
    assert should_salt(p, 32)


def test_skew_probe_uniform_stays_plain(spark):
    from levi_spark.operators.skew import should_salt, skew_probe

    uniform = spark.range(60_000).select(
        (F.col("id") % 5000).alias("k"), F.col("id").alias("v")
    )
    p = skew_probe(uniform, ["k"], F.col("v"))
    assert p["sampled"] > 200
    assert not should_salt(p, 32)


def test_skew_probe_tiny_input_stays_plain(spark):
    from levi_spark.operators.skew import should_salt, skew_probe

    tiny = spark.range(500).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    p = skew_probe(tiny, ["k"], F.col("v"))
    assert not should_salt(p, 32)  # below min_sample: plain is right


def test_adaptive_agg_matches_plain_both_regimes(spark, skewed):
    from levi_spark.operators.skew import adaptive_agg

    for df in (
        skewed,
        spark.range(60_000).select(
            (F.col("id") % 5000).alias("k"), F.col("id").alias("v")
        ),
    ):
        got = {
            r.k: (r.v_sum, r.v_count)
            for r in adaptive_agg(
                df, ["k"], {"v": "sum"}, salt_on=F.col("v")
            )
            .join(
                adaptive_agg(df, ["k"], {"v": "count"}, salt_on=F.col("v")),
                "k",
            )
            .collect()
        }
        want = {
            r.k: (r.s, r.c)
            for r in df.groupBy("k")
            .agg(F.sum("v").alias("s"), F.count("v").alias("c"))
            .collect()
        }
        assert got == want


def test_adaptive_join_matches_plain(spark, skewed):
    from levi_spark.operators.skew import adaptive_join

    small = (
        skewed.select("k").distinct().withColumn("w", F.col("k") * 10)
    )
    got = sorted(
        map(
            tuple,
            adaptive_join(
                skewed, small, on=["k"], salt_on=F.col("v")
            ).select("k", "v", "w").collect(),
        )
    )
    want = sorted(
        map(tuple, skewed.join(small, "k").select("k", "v", "w").collect())
    )
    assert got == want
