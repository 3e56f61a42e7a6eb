"""Logical types through both sides of the parquet stack: the
assembly reader converts DATE / TIME / TIMESTAMP (all three units,
naive and UTC-adjusted) / DECIMAL / unsigned INTEGER leaves exactly
as pyarrow's ``to_pylist`` does, and the writer emits those
annotations (ConvertedType + LogicalType, pyarrow's own layout) so
pyarrow, DuckDB and our assembly agree on files WE write."""

import datetime
import decimal

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from levi_spark.operators.parquetassembly import read_rows_bytes
from levi_spark.operators.parquetwrite import write_parquet

UTC = datetime.timezone.utc


def _blob(table, **kw):
    sink = pa.BufferOutputStream()
    pq.write_table(table, sink, **kw)
    return sink.getvalue().to_pybytes()


def test_read_pyarrow_logical_types_exactly():
    t = pa.table({
        "d": pa.array(
            [datetime.date(2020, 1, 1), None,
             datetime.date(1969, 12, 31)], pa.date32()),
        "ts_us": pa.array(
            [datetime.datetime(2021, 5, 1, 12, 30, 15, 123456),
             None, datetime.datetime(1960, 1, 1)],
            pa.timestamp("us")),
        "ts_ms_utc": pa.array(
            [datetime.datetime(2021, 5, 1, 12, 0, tzinfo=UTC)] * 3,
            pa.timestamp("ms", tz="UTC")),
        "ts_ns": pa.array(
            [datetime.datetime(2021, 5, 1, 12, 0)] * 3,
            pa.timestamp("ns")),
        "dec": pa.array(
            [decimal.Decimal("123.45"), None,
             decimal.Decimal("-0.07")], pa.decimal128(10, 2)),
        "tm": pa.array(
            [datetime.time(1, 2, 3, 456789), None,
             datetime.time(23, 59)], pa.time64("us")),
        "u32": pa.array([0, 4294967295, 7], pa.uint32()),
        "lst": pa.array(
            [[datetime.date(2001, 2, 3), None], None, []],
            pa.list_(pa.date32())),
    })
    blob = _blob(t, use_dictionary=False)
    assert read_rows_bytes(blob) == pq.read_table(
        pa.BufferReader(blob)).to_pylist()


def test_write_logical_types_three_readers(tmp_path):
    vals_d = [datetime.date(2020, 1, 1), None,
              datetime.date(1970, 1, 2)]
    vals_ts = [datetime.datetime(2021, 5, 1, 12, 30, 15, 123456),
               None, datetime.datetime(1980, 6, 1)]
    vals_tsu = [
        datetime.datetime(2021, 5, 1, 12, 0, tzinfo=UTC), None,
        datetime.datetime(1999, 1, 1, tzinfo=UTC)]
    vals_dec = [decimal.Decimal("123.45"), None,
                decimal.Decimal("-0.07")]
    vals_tm = [datetime.time(1, 2, 3, 456789), None,
               datetime.time(23, 59)]
    blob = write_parquet([
        ("d", "DATE", vals_d),
        ("ts", "TIMESTAMP_MICROS", vals_ts),
        ("tsu", "TIMESTAMP_MILLIS_UTC", vals_tsu),
        ("dec", "DECIMAL(10,2)", vals_dec),
        ("tm", "TIME_MICROS", vals_tm),
        ("ld", "LIST<DATE>",
         [[datetime.date(2000, 1, 1), None], None, []]),
        ("st", "STRUCT<w:DATE,x:DECIMAL(6,3)>",
         [{"w": datetime.date(1991, 1, 5),
           "x": decimal.Decimal("1.25")}, None,
          {"w": None, "x": None}]),
    ], codec="SNAPPY")
    back = pq.read_table(pa.BufferReader(blob))
    types = {f.name: str(f.type) for f in back.schema}
    assert types["d"] == "date32[day]"
    assert types["ts"] == "timestamp[us]"
    assert types["tsu"] == "timestamp[ms, tz=UTC]"
    assert types["dec"] == "decimal128(10, 2)"
    assert types["tm"] == "time64[us]"
    bl = back.to_pylist()
    assert [r["d"] for r in bl] == vals_d
    assert [r["ts"] for r in bl] == vals_ts
    assert [r["tsu"] for r in bl] == vals_tsu
    assert [r["dec"] for r in bl] == vals_dec
    assert [r["tm"] for r in bl] == vals_tm
    assert bl[0]["st"]["x"] == decimal.Decimal("1.250")
    assert read_rows_bytes(blob) == bl
    p = tmp_path / "lt.parquet"
    p.write_bytes(blob)
    dtypes = dict(
        (r[0], r[1]) for r in duckdb.sql(
            f"describe select * from read_parquet('{p}')"
        ).fetchall()
    )
    assert dtypes["d"] == "DATE"
    assert dtypes["ts"] == "TIMESTAMP"
    assert dtypes["tsu"] == "TIMESTAMP WITH TIME ZONE"
    assert dtypes["dec"] == "DECIMAL(10,2)"
    row = duckdb.sql(
        f"select d, ts, dec from read_parquet('{p}')"
    ).fetchone()
    assert row == (vals_d[0], vals_ts[0], vals_dec[0])


def test_raw_int_inputs_pass_through():
    blob = write_parquet(
        [("d", "DATE", [18262, None]),
         ("ts", "TIMESTAMP_MICROS", [1619870415123456, None])],
        codec="UNCOMPRESSED",
    )
    bl = pq.read_table(pa.BufferReader(blob)).to_pylist()
    assert bl[0]["d"] == datetime.date(2020, 1, 1)
    assert bl[0]["ts"].year == 2021


def test_decimal_scale_contract():
    with pytest.raises(ValueError, match="does not fit scale"):
        write_parquet(
            [("x", "DECIMAL(10,2)", [decimal.Decimal("1.005")])]
        )


def test_wide_decimal_flba_three_readers(tmp_path):
    """DECIMAL(p>18) stores as fixed-len two's complement; stats are
    selected NUMERICALLY (byte order is not decimal order for
    negatives) and read back signed-correct by pyarrow and DuckDB."""
    vals = [decimal.Decimal("12345678901234567890.123"), None,
            decimal.Decimal("-9999999999999999999.999"),
            decimal.Decimal("0.001")]
    blob = write_parquet(
        [("wd", "DECIMAL(23,3)", vals)], codec="SNAPPY",
        write_page_index=True,
    )
    t = pq.read_table(pa.BufferReader(blob))
    assert str(t.schema.field("wd").type) == "decimal128(23, 3)"
    assert t.column("wd").to_pylist() == vals
    st = pq.ParquetFile(
        pa.BufferReader(blob)).metadata.row_group(0).column(0
                                                            ).statistics
    assert st.min == decimal.Decimal("-9999999999999999999.999")
    assert st.max == decimal.Decimal("12345678901234567890.123")
    assert read_rows_bytes(blob) == t.to_pylist()
    p = tmp_path / "wd.parquet"
    p.write_bytes(blob)
    assert duckdb.sql(
        f"select min(wd), max(wd) from read_parquet('{p}')"
    ).fetchone() == (vals[2], vals[0])


def test_timestamp_stats_prune_on_our_files(tmp_path):
    """Logical-typed columns still carry int stats the planner can
    prune on — a time-range scan stays a metadata-only plan."""
    from levi_spark.operators.parquetmeta import plan_scan

    base = datetime.datetime(2024, 1, 1)
    ts = [base + datetime.timedelta(minutes=i) for i in range(4096)]
    blob = write_parquet(
        [("ts", "TIMESTAMP_MICROS", ts)],
        codec="SNAPPY", row_group_size=1024, page_rows=256,
        write_page_index=True,
    )
    p = tmp_path / "ts.parquet"
    p.write_bytes(blob)
    lo = int((base + datetime.timedelta(minutes=2000)
              - datetime.datetime(1970, 1, 1)).total_seconds()
             * 1e6)
    hi = int((base + datetime.timedelta(minutes=2100)
              - datetime.datetime(1970, 1, 1)).total_seconds()
             * 1e6)
    # minutes 2000-2100 straddle the 1024-row group boundary at 2048
    plan = plan_scan(str(p), "ts", lo, hi)
    assert plan["row_groups_kept"] == [1, 2]
    assert plan["pages_kept"] <= 2  # one 256-row page per group


def test_int96_legacy_timestamps_through_assembly():
    """Legacy Spark INT96 timestamps (julian day + nanos-in-day)
    assemble to instants equal to pyarrow's read, flat and inside
    lists."""
    t = pa.table({
        "ts": pa.array(
            [datetime.datetime(2021, 5, 1, 12, 30, 15, 123456),
             None, datetime.datetime(1960, 1, 1)],
            pa.timestamp("us")),
        "l": pa.array(
            [[datetime.datetime(2000, 1, 1, 1)], None, []],
            pa.list_(pa.timestamp("us"))),
    })
    blob = _blob(t, use_deprecated_int96_timestamps=True,
                 use_dictionary=False)
    assert read_rows_bytes(blob) == pq.read_table(
        pa.BufferReader(blob)).to_pylist()


def test_time_millis_integer_exactness():
    """7 ms must decode to exactly 7000 us — float division by 0.001
    floors to 6999 (the bug this pins); time32[ms] across the field."""
    vals = [datetime.time(0, 0, 0, 7000), None,
            datetime.time(12, 34, 56, 789000)]
    t = pa.table({"tm": pa.array(vals, pa.time32("ms"))})
    blob = _blob(t, use_dictionary=False)
    got = read_rows_bytes(blob)
    assert got == pq.read_table(pa.BufferReader(blob)).to_pylist()
    assert got[0]["tm"] == datetime.time(0, 0, 0, 7000)
