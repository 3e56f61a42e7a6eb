"""RESTORE + TIMESTAMP AS OF: metadata-only rollback, DV detachment,
vacuumed-version refusal, and timestamp version resolution."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from levi_spark.delta.dv import soft_delete
from levi_spark.delta.log import DeltaLog
from levi_spark.delta.restore import (
    restore,
    snapshot_at_timestamp,
    version_at_timestamp,
)
from levi_spark.delta.vacuum import vacuum
from levi_spark.delta.writer import write_delta


def _mk(spark, path):
    write_delta(spark.range(10).select("id"), path, mode="error",
                checkpoint_interval=None)                       # v0
    write_delta(spark.range(10, 15).select("id"), path, mode="append",
                checkpoint_interval=None)                       # v1
    write_delta(spark.range(100, 103).select("id"), path, mode="overwrite",
                checkpoint_interval=None)                       # v2
    return DeltaLog(spark, path)


def test_restore_to_earlier_version_is_metadata_only(spark, tmp_path):
    path = str(tmp_path / "t")
    log = _mk(spark, path)
    data_files_before = {
        f for f in os.listdir(path) if f.endswith(".parquet")
    }
    r = restore(spark, path, 1)
    assert r["version"] == 3 and r["files_readded"] > 0 and r["files_removed"] > 0
    snap = DeltaLog(spark, path).snapshot()
    assert {row.id for row in snap.to_df().collect()} == set(range(15))
    # no data files were written or deleted — pure metadata
    assert {f for f in os.listdir(path) if f.endswith(".parquet")} == data_files_before
    # restore of the restore: back to v2's contents
    r2 = restore(spark, path, 2)
    assert {row.id for row in DeltaLog(spark, path).snapshot().to_df().collect()} == {
        100, 101, 102,
    }
    # restoring to the current state is a no-op
    assert restore(spark, path, r2["version"])["version"] == -1


def test_restore_detaches_deletion_vectors(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(
        spark.range(20).select("id").coalesce(2), path, mode="error",
        checkpoint_interval=None,
    )                                                           # v0
    soft_delete(spark, path, "id % 4 = 1", checkpoint_interval=None)  # v1
    assert DeltaLog(spark, path).snapshot().to_df().count() == 15
    r = restore(spark, path, 0)
    assert r["version"] == 2
    assert DeltaLog(spark, path).snapshot().to_df().count() == 20


def test_restore_refuses_vacuumed_version(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    # age everything and vacuum: v0/v1 files are tombstoned and old
    for root, _d, files in os.walk(path):
        for n in files:
            p = os.path.join(root, n)
            os.utime(p, (time.time() - 9000, time.time() - 9000))
    gone = vacuum(spark, path, retention_hours=1.0)
    assert gone["files_deleted"]
    with pytest.raises(ValueError, match="vacuumed"):
        restore(spark, path, 1)
    # and nothing was committed by the failed attempt
    assert DeltaLog(spark, path).latest_version() == 2


def test_timestamp_resolution(spark, tmp_path):
    path = str(tmp_path / "t")
    log = _mk(spark, path)
    stamps = {}
    for v in (0, 1, 2):
        with open(os.path.join(log.log_path, f"{v:020d}.json")) as fh:
            for line in fh:
                a = json.loads(line)
                if "commitInfo" in a:
                    stamps[v] = a["commitInfo"]["timestamp"]
    assert version_at_timestamp(log, stamps[2] + 10_000) == 2
    # exactly at v1's stamp resolves to v1 unless v2 shares the stamp
    want = 2 if stamps[2] <= stamps[1] else 1
    assert version_at_timestamp(log, stamps[1]) == want
    with pytest.raises(ValueError, match="no commit at or before"):
        version_at_timestamp(log, stamps[0] - 10_000)
    snap = snapshot_at_timestamp(spark, path, stamps[2] + 10_000)
    assert {r.id for r in snap.to_df().collect()} == {100, 101, 102}
