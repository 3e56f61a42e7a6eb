"""Sequence packing for LLM training: concatenate a corpus in a
deterministic order and split it into fixed-capacity training
sequences ("concat-and-chunk" packing — the layout most pretraining
pipelines feed the trainer).

The primitive everything rests on is an EXCLUSIVE PREFIX SUM of token
counts in corpus order. A naive ``sum() over (order by k)`` window has
no PARTITION BY, so Spark plans it into a single task — the classic
global-window scale-killer. :func:`with_prefix_sum` computes the same
result scalably:

1. range-partition on the order key (non-overlapping sorted ranges);
2. per-partition running sum — an ordinary partitioned window;
3. one metadata-scale collect of per-partition totals, turned into
   per-partition starting offsets and broadcast back.

The result is independent of the number of partitions or where the
range boundaries land, so it is deterministic across cluster sizes —
the property that makes packed-sequence ids reproducible between a
laptop run and a 1000-executor run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_prefix_sum(
    df: DataFrame, order_col: str | list[str], value_col: str, out_col: str
) -> DataFrame:
    """Append ``out_col`` = sum of ``value_col`` over all rows strictly
    before this one in ``order_col`` order (exclusive prefix sum).
    ``order_col`` may be one column or a list (lexicographic order);
    the combination must be unique — it defines corpus order."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    part = df.repartitionByRange(*[F.col(c) for c in order_cols]).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = part.withColumn(
        "__local", F.coalesce(F.sum(value_col).over(w), F.lit(0)).cast("long")
    )
    # partition totals: one row per partition — metadata scale
    totals = (
        part.groupBy("__pid")
        .agg(F.sum(value_col).cast("long").alias("__tot"))
        .collect()
    )
    offset = 0
    offsets = []
    for r in sorted(totals, key=lambda r: r["__pid"]):
        offsets.append((r["__pid"], offset))
        offset += r["__tot"] or 0
    if not offsets:
        return local.withColumn(out_col, F.lit(0).cast("long")).drop(
            "__pid", "__local"
        )
    off_df = df.sparkSession.createDataFrame(offsets, "__pid int, __off long")
    return (
        local.join(F.broadcast(off_df), on="__pid", how="left")
        .withColumn(out_col, (F.col("__local") + F.coalesce("__off", F.lit(0))).cast("long"))
        .drop("__pid", "__local", "__off")
    )


def pack_sequences(
    docs: DataFrame,
    order_col: str,
    tokens_col: str,
    capacity: int,
) -> DataFrame:
    """Assign every document the half-open range of training sequences
    it occupies when the corpus is concatenated in ``order_col`` order
    and split every ``capacity`` tokens. Returns the input plus
    ``start`` (global token offset), ``first_seq`` and ``last_seq``.
    Exploding ``sequence(first_seq, last_seq)`` yields the
    (sequence, document) membership map."""
    with_off = with_prefix_sum(docs, order_col, tokens_col, "start")
    return with_off.withColumn(
        "first_seq", F.floor(F.col("start") / capacity).cast("long")
    ).withColumn(
        "last_seq",
        F.floor((F.col("start") + F.col(tokens_col) - 1) / capacity).cast("long"),
    )


def export_shards(
    docs: DataFrame,
    order_col: str | list[str],
    tokens_col: str,
    shard_tokens: int,
    out_dir: str,
) -> None:
    """Materialize the training set as token-bounded SHARDS: each
    document lands in the shard containing its global start offset
    (corpus concatenated in ``order_col`` order, one shard per
    ``shard_tokens`` tokens), written as one parquet directory per
    shard (``shard_id=N/``). The export a pretraining pipeline runs
    last — deterministic shard membership across cluster sizes because
    the offsets come from :func:`with_prefix_sum`, and the write
    shuffles once on shard_id so each shard's files are written
    together (a trainer streams shard directories independently).

    ``__start`` (the global token offset) is kept in the output — a
    resuming loader can seek by token position."""
    staged = with_prefix_sum(docs, order_col, tokens_col, "__start")
    sharded = staged.withColumn(
        "shard_id", F.expr(f"__start div {int(shard_tokens)}")
    )
    (
        sharded.repartition("shard_id")
        .write.mode("error")
        .partitionBy("shard_id")
        .parquet(out_dir)
    )
