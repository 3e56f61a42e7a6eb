"""Deterministic sampling/splitting: reproducibility across runs and
partitionings, threshold monotonicity, stratum-rate uniformity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from levi_spark.operators.sampling import hash_bucket, split_assign, stratified_sample


def _ids(spark, n=5000, parts=4):
    return spark.range(n).repartition(parts).select(
        F.col("id"), (F.col("id") % 7).alias("stratum")
    )


def test_split_reproducible_and_partition_independent(spark):
    df1 = _ids(spark, parts=4)
    df2 = _ids(spark, parts=13)  # different physical layout
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.id: r.split for r in split_assign(df1, "id", w).collect()}
    b = {r.id: r.split for r in split_assign(df2, "id", w).collect()}
    assert a == b


def test_split_proportions_and_exhaustiveness(spark):
    out = split_assign(_ids(spark), "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 5000
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.03


def test_first_split_is_prefix_stable(spark):
    """Raising train 80->90 must never evict a row from train — the
    first split only grows (later splits share shifting boundaries,
    which is why train goes first)."""
    df = _ids(spark)
    a = {r.id: r.split for r in split_assign(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    b = {r.id: r.split for r in split_assign(df, "id", {"train": 0.9, "val": 0.05, "test": 0.05}).collect()}
    old_train = {i for i, s in a.items() if s == "train"}
    new_train = {i for i, s in b.items() if s == "train"}
    assert old_train <= new_train
    assert len(new_train) > len(old_train)


def test_salt_rerolls_assignments(spark):
    df = _ids(spark)
    w = {"train": 0.5, "test": 0.5}
    a = {r.id: r.split for r in split_assign(df, "id", w, salt="v1").collect()}
    b = {r.id: r.split for r in split_assign(df, "id", w, salt="v2").collect()}
    moved = sum(1 for i in a if a[i] != b[i])
    assert moved > 1000  # ~half re-roll under a new salt


def test_stratified_rate_uniform_across_strata(spark):
    kept = stratified_sample(_ids(spark, 14000), "id", 0.2)
    rates = {
        r.stratum: r.n / 2000
        for r in kept.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    assert len(rates) == 7
    for s, rate in rates.items():
        assert abs(rate - 0.2) < 0.04, (s, rate)


def test_hash_bucket_matches_python_reference(spark):
    import hashlib

    rows = spark.range(50).select(
        "id", hash_bucket(F.col("id"), 1_000_000).alias("b")
    ).collect()
    for r in rows:
        want = int(hashlib.md5(str(r.id).encode()).hexdigest()[:12], 16) % 1_000_000
        assert r.b == want


def test_validation(spark):
    df = spark.range(5)
    with pytest.raises(ValueError, match="positive"):
        split_assign(df, "id", {"a": 0.0})
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(df, "id", 1.5)
