"""SCD2 upsert round-trips — canonical scenario from the reference suite
(/root/reference/tests/test_public_interface.py:201-594): base pkeys
(1,2,4), updates (2→Z @2025-01-01, 3→C @2025-09-15)."""

import datetime as dt

import pytest

from levi_spark.delta.table import LeviTable
from levi_spark.delta.writer import write_delta
from levi_spark.operators.scd import type_2_scd_upsert

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2025, 1, 1)
T2 = dt.datetime(2025, 9, 15)

BASE_COLS = ["pkey", "attr", "is_current", "effective_time", "end_time"]


def _mk_base(spark, path):
    rows = [
        (1, "A", True, T0, None),
        (2, "B", True, T0, None),
        (4, "D", True, T0, None),
    ]
    df = spark.createDataFrame(rows, "pkey long, attr string, is_current boolean, "
                                     "effective_time timestamp, end_time timestamp")
    write_delta(df, path, mode="error")
    return LeviTable(spark, path)


def _updates(spark):
    return spark.createDataFrame(
        [(2, "Z", T1), (3, "C", T2)],
        "pkey long, attr string, effective_time timestamp",
    )


def test_scd2_upsert(spark, tmp_path):
    t = _mk_base(spark, str(tmp_path / "t"))
    type_2_scd_upsert(t, _updates(spark), "pkey", ["attr"],
                      "is_current", "effective_time", "end_time")
    got = sorted(tuple(r) for r in t.to_df().select(*BASE_COLS).collect())
    assert got == sorted([
        (1, "A", True, T0, None),          # untouched
        (2, "B", False, T0, T1),           # closed old version
        (2, "Z", True, T1, None),          # new current version
        (3, "C", True, T2, None),          # brand-new key
        (4, "D", True, T0, None),          # untouched
    ])


def test_scd2_identical_update_is_noop(spark, tmp_path):
    t = _mk_base(spark, str(tmp_path / "t"))
    same = spark.createDataFrame(
        [(2, "B", T1)], "pkey long, attr string, effective_time timestamp"
    )
    type_2_scd_upsert(t, same, "pkey", ["attr"],
                      "is_current", "effective_time", "end_time")
    got = sorted(tuple(r) for r in t.to_df().select(*BASE_COLS).collect())
    assert got == sorted([
        (1, "A", True, T0, None),
        (2, "B", True, T0, None),
        (4, "D", True, T0, None),
    ])


def test_scd2_integer_version_columns(spark, tmp_path):
    # integer "version" time columns (reference :526-594)
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "A", True, 1, None), (2, "B", True, 1, None)],
        "pkey long, attr string, is_current boolean, effective_ver long, end_ver long",
    )
    write_delta(df, path, mode="error")
    t = LeviTable(spark, path)
    ups = spark.createDataFrame([(2, "Z", 2)], "pkey long, attr string, effective_ver long")
    type_2_scd_upsert(t, ups, "pkey", ["attr"], "is_current", "effective_ver", "end_ver")
    got = sorted(tuple(r) for r in
                 t.to_df().select("pkey", "attr", "is_current", "effective_ver", "end_ver").collect())
    assert got == sorted([
        (1, "A", True, 1, None),
        (2, "B", False, 1, 2),
        (2, "Z", True, 2, None),
    ])


def test_scd2_parameterized_flag_column(spark, tmp_path):
    # the reference hardcodes `is_current` in its merge predicate
    # (levi/__init__.py:277); we honor the parameter.
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "A", True, T0, None)],
        "pkey long, attr string, cur boolean, eff timestamp, fin timestamp",
    )
    write_delta(df, path, mode="error")
    t = LeviTable(spark, path)
    ups = spark.createDataFrame([(1, "B", T1)], "pkey long, attr string, eff timestamp")
    type_2_scd_upsert(t, ups, "pkey", ["attr"], "cur", "eff", "fin")
    got = sorted(tuple(r) for r in t.to_df().select("pkey", "attr", "cur", "eff", "fin").collect())
    assert got == sorted([(1, "A", False, T0, T1), (1, "B", True, T1, None)])


def test_scd2_column_validation(spark, tmp_path):
    t = _mk_base(spark, str(tmp_path / "t"))
    bad_updates = t.spark.createDataFrame(
        [(2, "Z", T1, "extra")],
        "pkey long, attr string, effective_time timestamp, extra string",
    )
    with pytest.raises(TypeError):
        type_2_scd_upsert(t, bad_updates, "pkey", ["attr"],
                          "is_current", "effective_time", "end_time")
    with pytest.raises(TypeError):
        type_2_scd_upsert(t, _updates(spark), "pkey", ["attr", "missing_attr"],
                          "is_current", "effective_time", "end_time")
