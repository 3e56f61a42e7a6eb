"""CLONE TABLE: shallow (zero-copy, absolute-path adds) and deep
(byte-copy) clones — content parity, divergence isolation, DV
carry-over, and refusal contracts."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from levi_spark.delta.clone import clone_table
from levi_spark.delta.dv import soft_delete
from levi_spark.delta.log import DeltaLog
from levi_spark.delta.writer import write_delta


def _mk_src(spark, path):
    write_delta(
        spark.range(20).select("id", (F.col("id") * 2).alias("v")),
        path, mode="error", checkpoint_interval=None,
    )
    write_delta(
        spark.range(20, 25).select("id", (F.col("id") * 2).alias("v")),
        path, mode="append", checkpoint_interval=None,
    )
    soft_delete(spark, path, "id % 5 = 0", checkpoint_interval=None)
    return DeltaLog(spark, path)


def test_shallow_clone_reads_source_content(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _mk_src(spark, src)
    info = clone_table(spark, src, dst, shallow=True)
    assert info["shallow"] and info["files"] > 0 and info["version"] == 0
    # zero data files under the clone directory — truly zero-copy
    assert glob.glob(os.path.join(dst, "*.parquet")) == []
    got = {(r.id, r.v) for r in DeltaLog(spark, dst).snapshot().to_df().collect()}
    want = {(i, 2 * i) for i in range(25) if i % 5 != 0}
    assert got == want  # DV descriptors carried: deleted rows invisible


def test_shallow_clone_diverges_without_touching_source(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _mk_src(spark, src)
    src_files_before = sorted(glob.glob(os.path.join(src, "**", "*"), recursive=True))
    clone_table(spark, src, dst, shallow=True)
    write_delta(
        spark.range(100, 103).select("id", (F.col("id") * 2).alias("v")),
        dst, mode="append", checkpoint_interval=None,
    )
    soft_delete(spark, dst, "id = 1", checkpoint_interval=None)
    # clone sees its own edits
    clone_ids = {r.id for r in DeltaLog(spark, dst).snapshot().to_df().collect()}
    assert {100, 101, 102} <= clone_ids and 1 not in clone_ids
    # source bytes and content are untouched
    assert sorted(
        glob.glob(os.path.join(src, "**", "*"), recursive=True)
    ) == src_files_before
    src_ids = {r.id for r in DeltaLog(spark, src).snapshot().to_df().collect()}
    assert 1 in src_ids and 100 not in src_ids


def test_deep_clone_is_self_contained(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _mk_src(spark, src)
    info = clone_table(spark, src, dst, shallow=False)
    assert not info["shallow"]
    # every referenced file exists under the clone itself
    for p, _pv in DeltaLog(spark, dst).snapshot().file_infos():
        assert p.startswith(os.path.abspath(dst))
    got = {(r.id, r.v) for r in DeltaLog(spark, dst).snapshot().to_df().collect()}
    want = {(i, 2 * i) for i in range(25) if i % 5 != 0}
    assert got == want


def test_clone_of_older_version(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _mk_src(spark, src)  # v0 initial, v1 append, v2 soft delete
    clone_table(spark, src, dst, shallow=True, version=1)
    got = {r.id for r in DeltaLog(spark, dst).snapshot().to_df().collect()}
    assert got == set(range(25))  # pre-delete snapshot


def test_clone_refuses_existing_destination(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _mk_src(spark, src)
    clone_table(spark, src, dst, shallow=True)
    with pytest.raises(ValueError, match="already a Delta table"):
        clone_table(spark, src, dst, shallow=True)


def test_deep_clone_refuses_external_files(spark, tmp_path):
    """A shallow clone's adds are absolute — deep-cloning the shallow
    clone must refuse rather than silently re-link outside files."""
    src = str(tmp_path / "src")
    mid = str(tmp_path / "mid")
    dst = str(tmp_path / "dst")
    _mk_src(spark, src)
    clone_table(spark, src, mid, shallow=True)
    with pytest.raises(ValueError, match="re-link external file"):
        clone_table(spark, mid, dst, shallow=False)


def test_shallow_clone_of_shallow_clone(spark, tmp_path):
    """Chained shallow clones keep resolving to the original files."""
    src = str(tmp_path / "src")
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    _mk_src(spark, src)
    clone_table(spark, src, a, shallow=True)
    clone_table(spark, a, b, shallow=True)
    got = {r.id for r in DeltaLog(spark, b).snapshot().to_df().collect()}
    assert got == {i for i in range(25) if i % 5 != 0}
