"""Unit tests for the cross-engine-exact HyperLogLog sketch
(levi_spark/functions/sketch.py).

Covers: rank chain correctness against a pure-Python leading-bit count,
mergeability (sketch of a union == max-merge of shard sketches), the
exact-integer harmonic sum, estimate accuracy within HLL's expected
error band, and the Spark/DuckDB rank-chain equivalence.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from levi_spark.functions.sketch import (
    RANK_SPAN,
    bloom_membership,
    bloom_positions,
    cms_lookup,
    cms_sketch,
    hll_estimate,
    hll_rank,
    hll_rank_sql,
    hll_sketch,
)


def _py_rank(h: int, bits: int = 48) -> int:
    """Reference: 1 for the top bit set, bits for h == 1, bits+1 for 0."""
    for i in range(bits):
        if h >= 1 << (bits - 1 - i):
            return i + 1
    return bits + 1


RANK_PROBES = [
    0,
    1,
    2,
    3,
    (1 << 47),
    (1 << 47) - 1,
    (1 << 48) - 1,
    (1 << 23) + 5,
    12345678901,
]


def test_rank_matches_python_reference(spark):
    df = spark.createDataFrame([(h,) for h in RANK_PROBES], "h long")
    got = {
        r["h"]: r["rank"]
        for r in df.select("h", hll_rank(F.col("h")).alias("rank")).collect()
    }
    assert got == {h: _py_rank(h) for h in RANK_PROBES}


def test_rank_sql_matches_python_reference():
    con = duckdb.connect()
    for h in RANK_PROBES:
        (got,) = con.execute(
            f"SELECT {hll_rank_sql(f'CAST({h} AS BIGINT)')}"
        ).fetchone()
        assert got == _py_rank(h), h
    con.close()


def test_sketch_merges_by_max(spark):
    a = spark.range(0, 3000).select(F.col("id").cast("string").alias("k"))
    b = spark.range(2000, 5000).select(F.col("id").cast("string").alias("k"))
    merged = (
        hll_sketch(a, "k")
        .unionAll(hll_sketch(b, "k"))
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )
    whole = hll_sketch(a.unionAll(b), "k")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_harmonic_sum_exact_and_bounded(spark):
    df = spark.range(0, 10000).select(F.col("id").cast("string").alias("k"))
    sk = hll_sketch(df, "k", p=8)
    row = hll_estimate(sk, p=8).collect()[0]
    regs = {r["bucket"]: r["register"] for r in sk.collect()}
    expect = sum(1 << (RANK_SPAN - v) for v in regs.values())
    expect += (256 - len(regs)) * (1 << RANK_SPAN)
    assert row["z_int"] == expect
    assert row["z_int"] < 1 << 63
    assert row["n_zero_buckets"] == 256 - len(regs)


@pytest.mark.parametrize("n", [100, 5000, 60000])
def test_estimate_within_error_band(spark, n):
    df = spark.range(0, n).select(F.col("id").cast("string").alias("k"))
    est = hll_estimate(hll_sketch(df, "k", p=8), p=8).collect()[0]["est_corrected"]
    # m=256 -> sigma ~ 1.04/sqrt(256) = 6.5%; allow 4 sigma
    assert abs(est - n) / n < 0.26, est


def test_cms_never_undercounts_and_merges(spark):
    # skewed multiset: key i appears (i % 7) + 1 times
    df = spark.range(0, 2000).select(
        (F.col("id") % 200).alias("k"), F.explode(F.sequence(F.lit(1), F.col("id") % 7 + 1))
    ).select("k")
    sk = cms_sketch(df, "k", depth=4, width=64)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    looked = cms_lookup(exact, sk, "k").collect()
    assert looked, "lookup returned no rows"
    assert all(r["est"] >= r["n"] for r in looked)
    # merge property: shard sketches summed == whole sketch
    a, b = df.randomSplit([0.5, 0.5], seed=7)
    merged = (
        cms_sketch(a, "k").unionAll(cms_sketch(b, "k"))
        .groupBy("row", "bucket")
        .agg(F.sum("counter").alias("counter"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, cms_sketch(df, "k").collect())
    )


def test_bloom_no_false_negatives(spark):
    build = spark.range(0, 500).select((F.col("id") * 3).alias("k"))
    probe = spark.range(0, 3000).select(F.col("id").alias("k"))
    pos = bloom_positions(build, "k", k=4, m=8192)
    tested = bloom_membership(probe, pos, "k", k=4, m=8192)
    members = {r["k"] for r in build.collect()}
    rows = tested.collect()
    assert len(rows) == 3000
    misses = [r["k"] for r in rows if r["k"] in members and not r["maybe_member"]]
    assert misses == []
    # false-positive rate should be non-trivially below 1 at these params
    fp = sum(1 for r in rows if r["maybe_member"] and r["k"] not in members)
    non_members = 3000 - len([r for r in rows if r["k"] in members])
    assert fp / non_members < 0.25
