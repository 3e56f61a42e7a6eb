"""The driver-side checkpoint writer fast path must be
indistinguishable from the distributed writer: same reconciled
content, readable by BOTH replay paths, same post-expiry behavior."""

import os

import pytest

from levi_spark.delta import checkpoint as cp_mod
from levi_spark.delta.checkpoint import expire_log, write_checkpoint
from levi_spark.delta.log import DeltaLog
from levi_spark.delta.writer import write_delta


def _mk(spark, path):
    write_delta(
        spark.createDataFrame(
            [(i, f"s{i}", float(i)) for i in range(40)],
            "k LONG, s STRING, v DOUBLE",
        ).repartition(4),
        path, mode="error", checkpoint_interval=None,
    )
    write_delta(
        spark.createDataFrame([(100, "x", 1.0)], "k LONG, s STRING, v DOUBLE"),
        path, mode="append", checkpoint_interval=None,
        txn=("app-a", 7),
    )


def _content(spark, path):
    df = DeltaLog(spark, path).snapshot().to_df()
    return sorted(map(tuple, df.select(*sorted(df.columns)).collect()))


def test_fast_path_equals_distributed_checkpoint(spark, tmp_path, monkeypatch):
    fast, dist = str(tmp_path / "fast"), str(tmp_path / "dist")
    _mk(spark, fast)
    _mk(spark, dist)

    v1 = write_checkpoint(spark, fast)  # local fast path (small log)
    monkeypatch.setattr(cp_mod, "_local_checkpoint_rows", lambda snap: None)
    v2 = write_checkpoint(spark, dist)  # forced distributed writer
    monkeypatch.undo()
    assert v1 == v2 == 1

    want = _content(spark, dist)
    assert _content(spark, fast) == want

    # both checkpoints survive full log expiry and replay identically,
    # on the LOCAL path and the DISTRIBUTED path
    import levi_spark.delta.log as log_mod

    for p in (fast, dist):
        assert expire_log(spark, p) == [0, 1]
        assert _content(spark, p) == want
        monkeypatch.setattr(log_mod, "_LOCAL_LOG_CAP", 0)
        snap = DeltaLog(spark, p).snapshot()
        assert snap._local_actions() is None
        df = snap.to_df()
        assert sorted(map(tuple, df.select(*sorted(df.columns)).collect())) == want
        monkeypatch.undo()

    # SetTransaction watermarks ride into the fast-path checkpoint
    assert DeltaLog(spark, fast).snapshot().txn_versions() == {"app-a": 7}


def test_fast_path_checkpoint_stats_preserved(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    write_checkpoint(spark, path)
    expire_log(spark, path)
    adds = DeltaLog(spark, path).snapshot().add_actions().collect()
    assert all(a["num_records"] is not None for a in adds)
    # empty part files legitimately carry no min/max
    ks = [
        a["stats"]["minValues"]["k"] for a in adds if a["num_records"] > 0
    ]
    assert ks and min(ks) == 0 and max(ks) == 100


def test_describe_detail(spark, tmp_path):
    from pyspark.sql import functions as F

    from levi_spark.delta.history import describe_detail
    from levi_spark.delta.writer import write_delta

    p = str(tmp_path / "t")
    df = spark.range(0, 20).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("part")
    )
    write_delta(df.repartition(2), p, mode="error", partition_by=["part"],
                checkpoint_interval=None)
    write_delta(df.where("k < 2").select("k", "part"), p, mode="append",
                checkpoint_interval=None)
    row = describe_detail(spark, p).collect()[0]
    assert row.format == "delta" and row.partitionColumns == ["part"]
    assert row.numFiles >= 3 and row.sizeInBytes > 0
    assert row.createdAt <= row.lastModified
    assert row.location.endswith("/t")
