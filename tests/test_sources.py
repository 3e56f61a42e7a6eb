"""Source layer tests: declared DDLs match the real parquet footers,
events normalization, mandatory-schema CSV/JSON readers, Delta reader."""

from __future__ import annotations

import pytest
from pyspark.sql.types import StructType

from levi_spark.sources.registry import (
    TABLE_DDL,
    SchemaMismatchError,
    read_csv,
    read_delta,
    read_events,
    read_json,
    read_table,
)


@pytest.mark.parametrize("name", sorted(TABLE_DDL))
def test_declared_ddl_matches_parquet(spark, testdata_dir, name):
    df = read_table(spark, testdata_dir, name)
    declared = StructType.fromDDL(
        TABLE_DDL[name] + (", ts_us BIGINT" if name == "events" else "")
    )
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for f in declared.fields:
        assert actual[f.name] == f.dataType.simpleString(), (
            f"{name}.{f.name}: {actual[f.name]} != {f.dataType.simpleString()}"
        )


def test_unknown_table_rejected(spark, testdata_dir):
    with pytest.raises(KeyError):
        read_table(spark, testdata_dir, "nope")


def test_events_normalized_to_micros(spark, testdata_dir):
    ev = read_events(spark, testdata_dir)
    assert "ts" not in ev.columns and "ts_us" in ev.columns
    row = ev.selectExpr("min(ts_us) AS lo", "max(ts_us) AS hi").first()
    # 2024 epoch-µs range
    assert 1_700_000_000_000_000 < row.lo < row.hi < 1_800_000_000_000_000


def test_schema_mismatch_detected(spark, testdata_dir, monkeypatch):
    import levi_spark.sources.registry as R

    monkeypatch.setitem(R.TABLE_DDL, "region", "r_regionkey INT, bogus_col STRING")
    with pytest.raises(SchemaMismatchError):
        read_table(spark, testdata_dir, "region")


def test_csv_json_round_trip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id BIGINT, name STRING")
    cdir, jdir = str(tmp_path / "c"), str(tmp_path / "j")
    df.write.option("header", "true").csv(cdir)
    df.write.json(jdir)
    got_c = sorted(map(tuple, read_csv(spark, cdir, "id BIGINT, name STRING").collect()))
    got_j = sorted(map(tuple, read_json(spark, jdir, "id BIGINT, name STRING").collect()))
    assert got_c == got_j == [(1, "a"), (2, "b")]


def test_read_delta_via_log_replay(spark, fixtures_dir):
    df = read_delta(spark, f"{fixtures_dir}/basic_append/delta")
    assert df.count() == 7  # 3 + 2 + 2 rows across the three commits
    assert set(df.columns) == {"letter", "number", "a_float"}
