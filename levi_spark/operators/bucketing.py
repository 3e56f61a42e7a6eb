"""Bucketed tables: pay the shuffle once at write time, then join and
aggregate on the bucket key with NO exchange, forever.

The reference has no notion of physical layout for joins — its one
join (`/root/reference/levi/__init__.py:243-247`) is an in-RAM Acero
hash join, which cannot scale past one node. On Spark, the dominant
cost of a repeated fact-fact join at 100 TB is re-shuffling both
sides on the key for every query. Bucketing is the standing fix:

* ``write_bucketed`` hash-partitions the data into ``n_buckets``
  files per (table, partition) on the join key and records the layout
  in the catalog. That write IS the shuffle — performed once.
* Any later equi-join of two tables bucketed on the same key with the
  same bucket count is **co-located**: task *i* reads bucket *i* of
  both sides; the plan has zero ``Exchange`` nodes. Aggregations on
  the bucket key skip their exchange the same way.
* ``assert_colocated`` turns that property into a runtime check (and
  the plan-shape tests pin it), because a silent bucket-count mismatch
  degrades to a full shuffle without changing any result.

Sizing guidance for the 100 TB target: pick ``n_buckets`` so one
bucket of the larger table is ~128-512 MB (e.g. 30 TB fact table ->
65-250k buckets; round to a power of two so a future 2x split keeps
alignment). Local tests use small counts; the plan shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from levi_spark.plans.inspect import executed_plan


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a catalog table bucketed by ``bucket_cols`` into
    ``n_buckets`` buckets, optionally sorted within each bucket.

    ``sort_cols`` additionally removes the Sort below a later
    sort-merge join — but only when the session sets
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` AND each
    bucket is a single file (guaranteed here by the pre-repartition;
    Spark 3.0+ stopped trusting multi-file bucket order, SPARK-28595).
    Without the flag the join is still exchange-free; it just re-sorts
    each (already co-partitioned) bucket."""
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    # Pre-partition on the bucket key so each bucket lands in exactly
    # one file: Spark's repartition and bucketBy share the Murmur3 hash,
    # and the reader only trusts write-time sortBy order (skipping the
    # Sort under a later SMJ) for single-file buckets.
    w = (
        df.repartition(n_buckets, *[df[c] for c in bucket_cols])
        .write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, bucket_cols[0], *bucket_cols[1:])
    )
    if sort_cols:
        w = w.sortBy(sort_cols[0], *sort_cols[1:])
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key. With
    matching bucketing this plans as an exchange-free sort-merge join;
    ``assert_colocated`` verifies rather than hopes."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def assert_colocated(df: DataFrame) -> None:
    """Raise if the plan re-shuffles: a co-located join/aggregation
    must contain no shuffle Exchange (broadcast is fine)."""
    plan = executed_plan(df)
    shuffles = [
        ln.strip()
        for ln in plan.splitlines()
        if "Exchange " in ln and "BroadcastExchange" not in ln
    ]
    if shuffles:
        raise AssertionError(
            "plan is not co-located; shuffle exchanges present:\n"
            + "\n".join(shuffles)
        )
