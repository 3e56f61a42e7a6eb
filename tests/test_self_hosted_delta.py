"""write_delta(self_hosted=True): the Delta data plane carried by OUR
parquet writer's bytes (operators/parquetwrite), verified by Spark
read-back, pyarrow, DuckDB, our own record assembly, and the commit's
footer-derived stats.
"""

import glob
import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from levi_spark.delta.log import DeltaLog
from levi_spark.delta.writer import write_delta
from levi_spark.operators.parquetmeta import read_column_bytes


@pytest.fixture()
def typed_df(spark):
    return spark.range(0, 5000, 1, 4).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("price"),
        F.concat(F.lit("n-"), (F.col("id") % 97).cast("string")).alias("name"),
        F.when(F.col("id") % 7 != 0, F.col("id") % 1000).alias("opt_int"),
        F.to_date(F.lit("2024-01-01")).alias("d"),
        F.to_timestamp(F.lit("2024-06-15 12:34:56.789")).alias("ts"),
        F.array(F.col("id") % 5, F.col("id") % 3).alias("arr"),
        (F.col("id").cast("decimal(12,2)") / 4).alias("dec"),
    )


def test_roundtrip_spark_duckdb_own_assembly(spark, typed_df, tmp_path):
    p = str(tmp_path / "t")
    v = write_delta(typed_df, p, self_hosted=True)
    assert v == 0
    back = DeltaLog(spark, p).snapshot().to_df()
    assert back.orderBy("k").collect() == typed_df.orderBy("k").collect()

    files = sorted(glob.glob(p + "/*.parquet"))
    assert files
    con = duckdb.connect()
    n, sk, so, sd = con.execute(
        "SELECT COUNT(*), SUM(k), SUM(opt_int), SUM(dec) "
        f"FROM read_parquet({files!r})"
    ).fetchone()
    assert (n, sk) == (5000, sum(range(5000)))
    assert so == sum(i % 1000 for i in range(5000) if i % 7 != 0)

    own = 0
    for f in files:
        with open(f, "rb") as fh:
            own += sum(read_column_bytes(fh.read(), "k"))
    assert own == sum(range(5000))


def test_footer_stats_land_in_commit(spark, typed_df, tmp_path):
    p = str(tmp_path / "t")
    write_delta(typed_df, p, self_hosted=True)
    logf = sorted(glob.glob(p + "/_delta_log/*.json"))[0]
    adds = [json.loads(l)["add"] for l in open(logf) if '"add"' in l]
    total = 0
    for a in adds:
        st = json.loads(a["stats"])
        total += st["numRecords"]
        assert "k" in st["minValues"] and "k" in st["maxValues"]
        assert st["nullCount"]["k"] == 0
        assert st["nullCount"]["opt_int"] > 0
    assert total == 5000


def test_append_and_time_travel(spark, typed_df, tmp_path):
    p = str(tmp_path / "t")
    write_delta(typed_df, p, self_hosted=True)
    write_delta(
        typed_df.withColumn("k", F.col("k") + 5000), p,
        mode="append", self_hosted=True,
    )
    log = DeltaLog(spark, p)
    assert log.snapshot(0).to_df().count() == 5000
    assert log.snapshot().to_df().count() == 10000


def test_partitioned_roundtrip(spark, tmp_path):
    df = spark.range(0, 3000, 1, 4).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("string").alias("bucket"),
        F.when(F.col("id") % 11 == 0, None)
        .otherwise((F.col("id") % 3).cast("string")).alias("seg"),
        (F.col("id") * 2.5).alias("v"),
    )
    p = str(tmp_path / "t")
    write_delta(df, p, self_hosted=True, partition_by=["bucket", "seg"])
    back = DeltaLog(spark, p).snapshot().to_df()
    assert back.orderBy("k").collect() == df.select(
        back.columns).orderBy("k").collect()
    # hive layout on disk, incl. the null partition dir
    import glob as _g

    dirs = {d.split("/")[-2] for d in _g.glob(p + "/bucket=*/seg=*/")}
    assert "seg=__HIVE_DEFAULT_PARTITION__" in dirs
    # partition pruning stays metadata-only: one value's rows only
    one = back.where((F.col("bucket") == "2") & (F.col("seg") == "1"))
    assert one.count() == df.where(
        (F.col("bucket") == "2") & (F.col("seg") == "1")).count()


def test_partitioned_nullable_int_and_date_keys(spark, tmp_path):
    # applyInPandas delivers null int/date group keys as NaN/NaT and
    # non-null int keys as floats (3.0) — the hive segments must still
    # be __HIVE_DEFAULT_PARTITION__ / "3", never "nan"/"NaT"/"3.0"
    df = spark.range(0, 600, 1, 4).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise((F.col("id") % 3).cast("int")).alias("bi"),
        F.when(F.col("id") % 5 == 0, None).otherwise(
            F.to_date(F.lit("2024-03-09"))).alias("bd"),
        (F.col("id") * 0.5).alias("v"),
    )
    p = str(tmp_path / "t")
    write_delta(df, p, self_hosted=True, partition_by=["bi", "bd"])
    import glob as _g

    segs = {s for d in _g.glob(p + "/bi=*/bd=*/")
            for s in d.rstrip("/").split("/")[-2:]}
    assert "bi=__HIVE_DEFAULT_PARTITION__" in segs
    assert "bd=__HIVE_DEFAULT_PARTITION__" in segs
    assert "bd=2024-03-09" in segs
    assert {"bi=0", "bi=1", "bi=2"} <= segs
    assert not any("nan" in s or "NaT" in s or ".0" in s for s in segs)
    back = DeltaLog(spark, p).snapshot().to_df()
    assert back.orderBy("k").collect() == df.select(
        back.columns).orderBy("k").collect()


def test_unsupported_type_refuses(spark, tmp_path):
    df = spark.range(3).select(
        F.create_map(F.lit("a"), F.col("id")).alias("m")
    )
    with pytest.raises(NotImplementedError, match="unsupported column"):
        write_delta(df, str(tmp_path / "t"), self_hosted=True)
