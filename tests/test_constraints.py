"""CHECK constraints: delta.constraints.* table configuration, spec
semantics (FALSE violates, NULL passes), write-path enforcement."""

import os

import pytest
from pyspark.sql import functions as F

from levi_spark.delta.constraints import (
    CheckConstraintViolation,
    add_check_constraint,
    drop_check_constraint,
)
from levi_spark.delta.log import DeltaLog
from levi_spark.delta.writer import write_delta


def _mk(spark, path, vals=(1, 2, 3)):
    df = spark.createDataFrame([(v, f"r{v}") for v in vals], "k INT, s STRING")
    write_delta(df, path, mode="error", checkpoint_interval=None)
    return df


def test_add_validate_enforce_drop(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    v = add_check_constraint(spark, path, "k_positive", "k > 0")
    assert v == 1
    snap = DeltaLog(spark, path).snapshot()
    assert snap.metadata.configuration["delta.constraints.k_positive"] == "k > 0"

    # good append passes
    good = spark.createDataFrame([(7, "x")], "k INT, s STRING")
    write_delta(good, path, mode="append", checkpoint_interval=None)

    # violating append refused, nothing committed, no stray files
    before = DeltaLog(spark, path).snapshot()
    bad = spark.createDataFrame([(5, "y"), (-1, "z")], "k INT, s STRING")
    with pytest.raises(CheckConstraintViolation, match="k_positive.*1 rows"):
        write_delta(bad, path, mode="append", checkpoint_interval=None)
    after = DeltaLog(spark, path).snapshot()
    assert after.version == before.version
    assert not [d for d in os.listdir(path) if d.startswith(".staging-")]
    assert after.to_df().count() == 4

    # overwrite is checked too
    with pytest.raises(CheckConstraintViolation):
        write_delta(bad, path, mode="overwrite", checkpoint_interval=None)

    drop_check_constraint(spark, path, "k_positive")
    write_delta(bad, path, mode="append", checkpoint_interval=None)
    assert DeltaLog(spark, path).snapshot().to_df().count() == 6


def test_add_constraint_scans_existing_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, vals=(1, -2, 3))
    with pytest.raises(CheckConstraintViolation, match="1 existing rows"):
        add_check_constraint(spark, path, "k_positive", "k > 0")
    # nothing recorded
    assert "delta.constraints.k_positive" not in DeltaLog(
        spark, path
    ).snapshot().metadata.configuration


def test_null_passes_like_sql_check(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    add_check_constraint(spark, path, "s_prefix", "s LIKE 'r%'")
    with_null = spark.createDataFrame([(9, None)], "k INT, s STRING")
    write_delta(with_null, path, mode="append", checkpoint_interval=None)
    assert DeltaLog(spark, path).snapshot().to_df().count() == 4


def test_bad_expression_rejected_before_commit(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    with pytest.raises(Exception):
        add_check_constraint(spark, path, "nope", "no_such_col > 0")
    assert DeltaLog(spark, path).snapshot().version == 0


def test_duplicate_and_missing_names(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    add_check_constraint(spark, path, "c1", "k > 0")
    with pytest.raises(ValueError, match="already exists"):
        add_check_constraint(spark, path, "c1", "k > 1")
    with pytest.raises(KeyError):
        drop_check_constraint(spark, path, "c2")


def test_constraint_survives_other_commits(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    add_check_constraint(spark, path, "k_positive", "k > 0")
    write_delta(
        spark.createDataFrame([(4, "a")], "k INT, s STRING"),
        path,
        mode="append",
        checkpoint_interval=None,
    )
    conf = DeltaLog(spark, path).snapshot().metadata.configuration
    assert conf.get("delta.constraints.k_positive") == "k > 0"
