"""Sequence-packing primitives: the distributed prefix sum must equal
the single-window result regardless of input partitioning, and packing
assigns every token to exactly one training sequence."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from levi_spark.operators.packing import pack_sequences, with_prefix_sum


def _docs(spark, n, parts):
    return (
        spark.range(n)
        .select(F.col("id").alias("doc_id"), (F.col("id") % 37 + 1).alias("n_tokens"))
        .repartition(parts)
    )


def test_prefix_sum_matches_global_window_any_partitioning(spark):
    for parts in (1, 3, 16):
        df = _docs(spark, 500, parts)
        got = {
            (r["doc_id"], r["start"])
            for r in with_prefix_sum(df, "doc_id", "n_tokens", "start").collect()
        }
        w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
        want = {
            (r["doc_id"], r["start"])
            for r in df.withColumn(
                "start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
            ).collect()
        }
        assert got == want, f"prefix sum diverged at {parts} partitions"


def test_prefix_sum_empty_frame(spark):
    df = _docs(spark, 0, 2)
    assert with_prefix_sum(df, "doc_id", "n_tokens", "start").count() == 0


def test_pack_sequences_covers_every_token_once(spark):
    df = _docs(spark, 200, 8)
    cap = 64
    packed = pack_sequences(df, "doc_id", "n_tokens", cap)
    rows = packed.collect()
    total = sum(r["n_tokens"] for r in rows)
    # contiguous, gap-free offsets
    by_id = sorted(rows, key=lambda r: r["doc_id"])
    off = 0
    for r in by_id:
        assert r["start"] == off
        off += r["n_tokens"]
    # sequence span matches the token interval
    n_seqs = (total + cap - 1) // cap
    assert max(r["last_seq"] for r in rows) == n_seqs - 1
    for r in rows:
        assert r["first_seq"] == r["start"] // cap
        assert r["last_seq"] == (r["start"] + r["n_tokens"] - 1) // cap
