"""Deterministic sampling and dataset splitting for training pipelines.

A 100 TB corpus needs reproducible subsets: ``df.sample()`` draws a
different set per run (and per partition layout), which poisons
train/val/test hygiene — a document must land in the same split
forever, on any cluster size, in any engine. The standard fix is
hash-bucket assignment:

* ``hash_bucket(col, n)`` — md5 of the key (+ optional salt), first 12
  hex digits as an int64, mod n. Pure codegen expressions, uniform,
  engine-reproducible (md5 is bit-identical everywhere; xxhash64 is
  not portable to DuckDB and ``rand(seed)`` is partition-dependent).
* ``split_assign(df, key, weights)`` — named splits by cumulative
  bucket thresholds over 1e6 buckets ("train"/"val"/"test" style).
  Changing the salt re-rolls every assignment. Threshold layout makes
  the FIRST split prefix-stable: growing its weight only adds rows to
  it, never evicts one (put the split whose stability matters — train
  — first; later splits share shifting boundaries).
* ``stratified_sample(df, fraction)`` — keep a row iff its bucket
  falls under fraction * 1e6; applied after a groupBy key it samples
  each stratum at the same rate with zero shuffles (the filter is
  map-side; strata are just whatever partition of rows you filter).

All of it is WHERE-clause arithmetic: Catalyst pushes the md5 filter
into the scan stage, no shuffle, no state, no driver participation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def hash_bucket(col: Column, n_buckets: int = _BUCKETS, salt: str = "") -> Column:
    """Deterministic uniform bucket in [0, n_buckets) from an md5 of
    the key — reproducible across engines, partitionings, and runs."""
    key = F.concat(col.cast("string"), F.lit(salt))
    return (
        F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long") % n_buckets
    )


def split_assign(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Append ``split_col`` assigning each row to a named split with
    probability proportional to its weight, keyed only by
    ``key_col`` (+salt) — stable under reruns and repartitioning."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    bucket = hash_bucket(F.col(key_col), _BUCKETS, salt)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = bucket < int(acc * _BUCKETS)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(items[-1][0])
    return df.withColumn(
        split_col, last if expr is None else expr.otherwise(last)
    )


def stratified_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by key hash — the
    same keys survive on every run and engine. Filtering after any
    per-stratum partition of the data samples every stratum at the
    same rate (the hash is independent of the strata columns)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(
        hash_bucket(F.col(key_col), _BUCKETS, salt) < int(fraction * _BUCKETS)
    )
