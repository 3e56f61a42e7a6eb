"""Footer-based write stats must be bit-faithful to the distributed
aggregate they replace — and must refuse (return None) whenever they
could not be."""

import glob
import math
import os

from pyspark.sql import types as T

from levi_spark.delta.log import DeltaLog
from levi_spark.delta.writer import _file_stats, _footer_stats, write_delta
from levi_spark.sources.registry import read_table

SF = "/root/testdata/sf0.001"


def _committed_files(path):
    return [
        p for p in glob.glob(os.path.join(path, "*.parquet"))
        if "_delta_log" not in p
    ]


def _norm(stats):
    # the aggregate path drops None mins; footer never emits None — both
    # normalize to plain dicts for comparison
    return {
        fn: {
            "numRecords": s["numRecords"],
            "minValues": dict(s["minValues"]),
            "maxValues": dict(s["maxValues"]),
            "nullCount": dict(s["nullCount"]),
        }
        for fn, s in stats.items()
    }


def test_footer_matches_aggregate_on_real_tables(spark, tmp_path):
    for name in ("lineitem", "events", "customer", "documents"):
        df = read_table(spark, SF, name)
        path = str(tmp_path / name)
        write_delta(df, path, mode="error", checkpoint_interval=None)
        files = _committed_files(path)
        data_schema = T.StructType(list(df.schema.fields))
        footer = _footer_stats(files, data_schema)
        assert footer is not None, name
        agg = _file_stats(
            spark.read.schema(data_schema).parquet(*files), data_schema
        )
        assert _norm(footer) == _norm(agg), name


def test_stats_written_into_commit(spark, tmp_path):
    df = read_table(spark, SF, "customer")
    path = str(tmp_path / "t")
    write_delta(df, path, mode="error", checkpoint_interval=None)
    adds = DeltaLog(spark, path).snapshot().add_actions().collect()
    assert adds and all(r["num_records"] and r["num_records"] > 0 for r in adds)
    st = adds[0]["stats"]
    assert st["minValues"]["c_name"].startswith("Customer#")
    assert st["nullCount"]["c_acctbal"] == 0


def test_nan_forces_fallback(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, float("nan")), (2, 0.5)], "k INT, d DOUBLE"
    )
    p = str(tmp_path / "raw")
    df.coalesce(1).write.parquet(p)
    files = glob.glob(p + "/*.parquet")
    assert _footer_stats(files, df.schema) is None
    # and the full writer still commits via the aggregate fallback
    path = str(tmp_path / "t")
    write_delta(df, path, mode="error", checkpoint_interval=None)
    got = DeltaLog(spark, path).snapshot().to_df().collect()
    assert len(got) == 2 and any(math.isnan(r["d"]) for r in got)


def test_complex_columns_force_fallback(spark, tmp_path):
    df = spark.createDataFrame([(1, {"a": 2})], "k INT, s STRUCT<a: INT>")
    p = str(tmp_path / "raw")
    df.coalesce(1).write.parquet(p)
    assert _footer_stats(glob.glob(p + "/*.parquet"), df.schema) is None


def test_oversized_string_forces_fallback(spark, tmp_path):
    df = spark.createDataFrame([(1, "z" * 5000)], "k INT, s STRING")
    p = str(tmp_path / "raw")
    df.coalesce(1).write.parquet(p)
    assert _footer_stats(glob.glob(p + "/*.parquet"), df.schema) is None


def test_all_null_column_stays_on_footer_path(spark, tmp_path):
    df = spark.createDataFrame([(1, None), (2, None)], "k INT, s STRING")
    p = str(tmp_path / "raw")
    df.coalesce(1).write.parquet(p)
    files = glob.glob(p + "/*.parquet")
    footer = _footer_stats(files, df.schema)
    assert footer is not None
    (s,) = footer.values()
    assert "s" not in s["minValues"] and s["nullCount"]["s"] == 2
