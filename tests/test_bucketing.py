"""Bucketed co-located joins: the join/agg on the bucket key must plan
with zero shuffle exchanges, and results must match the plain path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from levi_spark.operators.bucketing import (
    assert_colocated,
    colocated_join,
    write_bucketed,
)
from levi_spark.plans.inspect import plan_summary

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    """orders + lineitem bucketed on the join key; broadcast disabled so
    the co-location (not a broadcast) is what removes the exchange."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_colocated_join_no_shuffle_and_correct(spark, bucketed_pair, no_broadcast):
    orders = spark.table("b_orders").withColumnRenamed("o_orderkey", "k")
    li = spark.table("b_lineitem").withColumnRenamed("l_orderkey", "k")
    joined = orders.join(li, on="k")
    assert_colocated(joined)
    s = plan_summary(joined)
    assert s["exchanges"] == 0, s
    assert s["sort_merge_joins"] == 1, s

    plain = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .withColumnRenamed("o_orderkey", "k")
        .join(
            spark.read.parquet(f"{SF}/lineitem.parquet").withColumnRenamed(
                "l_orderkey", "k"
            ),
            on="k",
        )
    )
    assert joined.count() == plain.count()
    got = joined.agg(F.sum("l_quantity"), F.count(F.lit(1))).first()
    want = plain.agg(F.sum("l_quantity"), F.count(F.lit(1))).first()
    assert got == want


def test_sorted_buckets_skip_join_sort(spark, bucketed_pair, no_broadcast):
    """With single-file buckets + the legacy outputOrdering flag, the
    write-time sortBy removes the Sort below the SMJ (SPARK-28595)."""
    from levi_spark.plans.inspect import executed_plan

    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        o = spark.table("b_orders")
        li = spark.table("b_lineitem")
        plan = executed_plan(o.join(li, o.o_orderkey == li.l_orderkey))
        assert "SortMergeJoin" in plan
        assert "Sort [" not in plan, plan[:800]
    finally:
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")


def test_bucket_agg_no_exchange(spark, bucketed_pair, no_broadcast):
    agg = spark.table("b_lineitem").groupBy("l_orderkey").agg(F.sum("l_quantity"))
    assert_colocated(agg)


def test_mismatched_buckets_detected(spark, bucketed_pair, no_broadcast):
    """A different bucket count on one side degrades to a shuffle —
    assert_colocated must catch it."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(li, "b_lineitem_12", ["l_orderkey"], 12)
    try:
        orders = spark.table("b_orders").withColumnRenamed("o_orderkey", "k")
        li12 = spark.table("b_lineitem_12").withColumnRenamed("l_orderkey", "k")
        with pytest.raises(AssertionError, match="not co-located"):
            assert_colocated(orders.join(li12, on="k"))
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem_12")


def test_write_bucketed_validates_args(spark):
    df = spark.range(5)
    with pytest.raises(ValueError, match="non-empty"):
        write_bucketed(df, "t", [], 4)
    with pytest.raises(ValueError, match=">= 1"):
        write_bucketed(df, "t", ["id"], 0)
