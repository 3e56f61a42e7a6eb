"""VACUUM: unreferenced files are reclaimed, live ones (including DV
sidecars) survive, retention is honored, dry-run deletes nothing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from levi_spark.delta.dv import purge_deleted, soft_delete
from levi_spark.delta.log import DeltaLog
from levi_spark.delta.vacuum import vacuum
from levi_spark.delta.writer import write_delta


@pytest.fixture()
def table(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.range(0, 200).select(F.col("id"), (F.col("id") % 3).alias("k"))
    write_delta(df.repartition(4), p, mode="error", checkpoint_interval=None)
    return p


def _ids(spark, p):
    return sorted(r.id for r in DeltaLog(spark, p).snapshot().to_df().collect())


def test_vacuum_after_overwrite_reclaims_old_files(spark, table):
    write_delta(
        spark.range(0, 50).select(F.col("id"), (F.col("id") % 3).alias("k")),
        table,
        mode="overwrite",
        checkpoint_interval=None,
    )
    # retention window still open -> nothing deleted
    res = vacuum(spark, table, retention_hours=1.0)
    assert res["files_deleted"] == []
    # retention 0 -> old files go
    res = vacuum(spark, table, retention_hours=0.0)
    assert len(res["files_deleted"]) == 4
    assert res["bytes_reclaimed"] > 0
    assert _ids(spark, table) == list(range(50))
    # exact: only live files remain
    live = {
        r["path"]
        for r in DeltaLog(spark, table).snapshot().add_actions().select("path").collect()
    }
    on_disk = _parquet_rels(table)
    assert on_disk == live


def test_vacuum_keeps_live_dv_sidecars(spark, table):
    soft_delete(spark, table, "id < 30", checkpoint_interval=None)
    res = vacuum(spark, table, retention_hours=0.0)
    # the DV sidecar is referenced -> not deleted; reads still correct
    assert all("_deletion_vectors" not in f for f in res["files_deleted"])
    assert _ids(spark, table) == list(range(30, 200))


def test_vacuum_reclaims_orphaned_dv_after_purge(spark, table):
    soft_delete(spark, table, "id < 30", checkpoint_interval=None)
    purge_deleted(spark, table)
    res = vacuum(spark, table, retention_hours=0.0)
    assert any("_deletion_vectors" in f for f in res["files_deleted"])
    assert _ids(spark, table) == list(range(30, 200))
    # DV dir fully gone from disk
    dv_root = os.path.join(table, "_deletion_vectors")
    assert not os.path.isdir(dv_root) or not any(
        files for _r, _d, files in os.walk(dv_root)
    )


def test_dry_run_deletes_nothing(spark, table):
    write_delta(
        spark.range(0, 10).select(F.col("id"), (F.col("id") % 3).alias("k")),
        table,
        mode="overwrite",
        checkpoint_interval=None,
    )
    res = vacuum(spark, table, retention_hours=0.0, dry_run=True)
    assert len(res["files_deleted"]) == 4
    assert _parquet_rels(table) >= set(res["files_deleted"])  # still on disk


def _parquet_rels(table: str) -> set[str]:
    out = set()
    for root, dirs, files in os.walk(table):
        if "_delta_log" in root:
            continue
        for n in files:
            if n.endswith(".parquet"):
                out.add(
                    os.path.normpath(
                        os.path.relpath(os.path.join(root, n), table)
                    )
                )
    return out

