"""Regression tests for the round-2 ADVICE findings (fixed in round 3):

1. (high) replicate_cdf must not delete keys that survive an overwrite
   commit — the change feed synthesizes delete+insert at the SAME
   version, and the net-change tie-break must prefer the non-delete
   image.
2. (medium) the reader-feature guard must refuse unsupported protocols
   on the DISTRIBUTED checkpoint path too (struct-of-nulls protocol
   rows from F.struct must not shadow the real protocol action).
3. (low) timestamp data-skipping stats must serialize identically from
   the parquet-footer path and the Spark-aggregate fallback.
4. (low) column-mapping physical names must be honored under ANY
   nesting (map values, arrays of arrays), not just structs and
   arrays-of-structs.
5. (low) lifecycle queries use per-invocation scratch dirs so
   concurrent runs can't clobber each other.
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from levi_spark.delta.log import DeltaLog, UnsupportedTableFeatureError
from levi_spark.delta.writer import write_delta
from levi_spark.operators.replicate import replicate_cdf


# ---------------------------------------------------------------- 1: high


def _rows(spark, path):
    df = DeltaLog(spark, path).snapshot().to_df()
    return sorted(map(tuple, df.select(*sorted(df.columns)).collect()))


def test_replicate_window_with_overwrite_keeps_surviving_keys(spark, tmp_path):
    """An overwrite commit synthesizes delete+insert rows at ONE commit
    version for every key present on both sides; the sync must land the
    insert image, not the (alphabetically-first) delete image."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(20)],
        "k LONG, name STRING, v DOUBLE",
    )
    write_delta(df.repartition(3), src, mode="error", checkpoint_interval=None)
    replicate_cdf(spark, src, dst, ["k"])

    # keys 0-9 SURVIVE the overwrite (with new values), 10-19 vanish,
    # 50 is new — all inside the one sync window
    new = spark.createDataFrame(
        [(i, f"ow{i}", i * 2.0) for i in range(10)] + [(50, "ow", 50.0)],
        "k LONG, name STRING, v DOUBLE",
    )
    write_delta(new.repartition(2), src, mode="overwrite", checkpoint_interval=None)
    r = replicate_cdf(spark, src, dst, ["k"])
    assert not r["bootstrapped"]
    assert _rows(spark, dst) == _rows(spark, src)
    got = {
        (row["k"], row["name"])
        for row in DeltaLog(spark, dst).snapshot().to_df().collect()
    }
    assert (3, "ow3") in got and (3, "n3") not in got
    assert (50, "ow") in got and all(k < 10 or k == 50 for k, _ in got)


# -------------------------------------------------------------- 2: medium


def test_protocol_guard_enforced_on_distributed_checkpoint_path(
    spark, tmp_path, monkeypatch
):
    """Force the >64MB fallback (distributed _actions_df) over a
    checkpointed log whose protocol demands an unsupported reader
    feature: the guard must still refuse. Previously the checkpoint
    branch's F.struct protocol column was never NULL, so a metaData
    row's struct-of-nulls could shadow the real protocol action and
    the guard failed open exactly on the fallback path it calls
    authoritative."""
    from levi_spark.delta import log as log_mod
    from levi_spark.delta.checkpoint import write_checkpoint

    path = str(tmp_path / "t")
    write_delta(
        spark.range(5).withColumnRenamed("id", "k"),
        path,
        mode="error",
        checkpoint_interval=None,
    )
    log_dir = os.path.join(path, "_delta_log")
    with open(os.path.join(log_dir, f"{1:020d}.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        # deletionVectors/variantType became supported
                        # in round 5, collations in round 7 —
                        # catalog-owned commit coordination remains
                        # genuinely unimplemented
                        "readerFeatures": ["catalogOwned-preview"],
                        "writerFeatures": ["catalogOwned-preview"],
                    }
                }
            )
            + "\n"
        )
    write_checkpoint(spark, path)

    monkeypatch.setattr(log_mod, "_LOCAL_LOG_CAP", 0)  # force distributed
    snap = DeltaLog(spark, path).snapshot()
    assert snap._local_actions() is None  # the fallback really is active
    with pytest.raises(UnsupportedTableFeatureError, match="catalogOwned"):
        snap.to_df()


# ----------------------------------------------------------------- 3: low


def _add_stats(path):
    """{file -> parsed stats dict} from every add action in the log."""
    out = {}
    log_dir = os.path.join(path, "_delta_log")
    for name in sorted(os.listdir(log_dir)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(log_dir, name)) as f:
            for line in f:
                d = json.loads(line)
                if "add" in d and d["add"].get("stats"):
                    out[d["add"]["path"]] = json.loads(d["add"]["stats"])
    return out


def test_timestamp_stats_identical_footer_vs_spark_fallback(spark, tmp_path):
    """Same timestamp data through both stats paths must serialize the
    same min/max strings (explicit-offset UTC ISO), so data skipping
    does not depend on which path a commit happened to take."""
    base = spark.createDataFrame(
        [("2024-03-01 10:30:00",), ("2024-07-15 23:59:59",)], "s STRING"
    ).select(F.to_timestamp("s").alias("ts"), F.lit(1).alias("k"))

    p_footer = str(tmp_path / "footer")
    write_delta(base, p_footer, mode="error", checkpoint_interval=None)

    # an array column makes _footer_stats bail -> Spark aggregate path
    p_spark = str(tmp_path / "fallback")
    write_delta(
        base.withColumn("arr", F.array(F.lit(1))),
        p_spark,
        mode="error",
        checkpoint_interval=None,
    )

    s_footer = _add_stats(p_footer)
    s_spark = _add_stats(p_spark)
    mins_f = {v["minValues"].get("ts") for v in s_footer.values()}
    mins_s = {v["minValues"].get("ts") for v in s_spark.values()}
    maxs_f = {v["maxValues"].get("ts") for v in s_footer.values()}
    maxs_s = {v["maxValues"].get("ts") for v in s_spark.values()}
    assert mins_f == mins_s and maxs_f == maxs_s
    # and the canonical form is timezone-explicit UTC
    for v in mins_f | maxs_f:
        assert v.endswith("+00:00"), v


# ----------------------------------------------------------------- 4: low


def _pn(name):
    return {"delta.columnMapping.physicalName": name}


def test_physical_schema_recurses_map_values_and_nested_arrays():
    from levi_spark.delta.log import TableMetadata

    schema = T.StructType(
        [
            T.StructField(
                "m",
                T.MapType(
                    T.StringType(),
                    T.StructType(
                        [T.StructField("inner", T.LongType(), True, _pn("col-i"))]
                    ),
                ),
                True,
                _pn("col-m"),
            ),
            T.StructField(
                "aa",
                T.ArrayType(
                    T.ArrayType(
                        T.StructType(
                            [T.StructField("deep", T.StringType(), True, _pn("col-d"))]
                        )
                    )
                ),
                True,
                _pn("col-aa"),
            ),
        ]
    )
    meta = TableMetadata(
        id="x",
        schema=schema,
        partition_columns=[],
        configuration={"delta.columnMapping.mode": "name"},
    )
    phys = meta.physical_schema
    assert phys["col-m"].dataType.valueType.fieldNames() == ["col-i"]
    assert phys["col-aa"].dataType.elementType.elementType.fieldNames() == [
        "col-d"
    ]


# ----------------------------------------------------------------- 5: low


def test_scratch_dirs_unique_per_invocation():
    from levi_spark.queries import _scratch

    a, b = _scratch("x"), _scratch("x")
    assert a != b and os.path.isdir(a) and os.path.isdir(b)
