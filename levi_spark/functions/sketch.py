"""Cross-engine-exact HyperLogLog distinct sketch.

A 100 TB pipeline counts distinct keys (users, URLs, shingles) with
sketches, not exact sets. Spark's ``approx_count_distinct`` is a
HLL++ whose hash (xxhash) and float paths are NOT reproducible in any
other engine, so it cannot be oracle-checked. This module builds HLL
from primitives that are bit-identical everywhere:

* hashes come from md5 (two independent 48-bit halves of the digest —
  the same ``conv(substring(md5(k)))`` identity the sampler uses);
* the register rank (leading-zero count) is a generated 48-branch
  comparison chain — pure int64 comparisons, no ``log2`` ULP risk;
* the harmonic sum ``sum(2^-M_j)`` is kept in INTEGER form as
  ``sum(2^(RANK_SPAN - M_j))`` — every term is an exact int64 power of
  two and the total stays below 2^63, so the sum is exact and
  order-independent (double summation of 2^-M terms would round once
  exponents spread past 53 bits, making it partition-order-dependent);
* only the final alpha*m²/Z (and the small-range linear-counting
  branch) are doubles, computed in one fixed operation order and
  quantized by the caller.

Aggregation shape: one partial-aggregatable groupBy(bucket) max — the
sketch merges map-side exactly like any HLL (max of registers), so the
shuffle is m rows regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# rank values live in [1, 49] (48 hash bits + 1), so every term
# 2^(RANK_SPAN - rank) has exponent >= 5; an all-empty m=256 sketch sums
# to 256 * 2^54 = 2^62 < 2^63, so the harmonic sum never overflows int64.
RANK_SPAN = 54


def _h48(col: Column, salt: str, skip: int) -> Column:
    """48-bit int from md5 hex digits [skip, skip+12) — same identity
    DuckDB evaluates as ('0x' || substr(md5(..), skip+1, 12))::BIGINT."""
    key = F.concat(col.cast("string"), F.lit(salt))
    return F.conv(F.substring(F.md5(key), skip + 1, 12), 16, 10).cast("long")


def hll_rank(h: Column, bits: int = 48) -> Column:
    """Position of the highest set bit, counted from the top: 1 for
    h >= 2^(bits-1), ``bits`` for h == 1, bits+1 for h == 0. A
    comparison chain, never floor(log2(h)) (ULP-unsafe)."""
    expr = F.lit(bits + 1)
    # wrap inside-out: the largest threshold must be the OUTERMOST branch
    # (evaluated first), mirroring the CASE order in hll_rank_sql
    for i in reversed(range(bits)):
        expr = F.when(h >= F.lit(1 << (bits - 1 - i)), F.lit(i + 1)).otherwise(expr)
    return expr


def hll_rank_sql(h: str, bits: int = 48) -> str:
    """DuckDB mirror of :func:`hll_rank` — identical comparison chain."""
    whens = "\n".join(
        f"WHEN {h} >= {1 << (bits - 1 - i)} THEN {i + 1}" for i in range(bits)
    )
    return f"CASE {whens} ELSE {bits + 1} END"


def hll_sketch(df: DataFrame, key: str, p: int = 8, salt: str = "hll") -> DataFrame:
    """(bucket, register) rows of the HLL sketch of ``df[key]`` —
    only non-empty buckets; merge-able by max(register)."""
    m = 1 << p
    bucket = (_h48(F.col(key), salt, 0) % m).alias("bucket")
    rank = hll_rank(_h48(F.col(key), salt + "r", 12)).alias("rank")
    return (
        df.select(bucket, rank)
        .groupBy("bucket")
        .agg(F.max("rank").alias("register"))
    )


def cms_sketch(
    df: DataFrame, key: str, depth: int = 4, width: int = 64, salt: str = "cms"
) -> DataFrame:
    """Count-Min sketch of ``df[key]``: (row, bucket, counter) with at
    most depth*width rows. Counters are exact int64 counts, so the
    sketch — unlike float-weighted variants — is bit-identical in any
    engine sharing the md5 bucket identity. Merging shards is
    groupBy(row, bucket).sum — partial-aggregatable, m rows over the
    shuffle regardless of input size."""
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    (_h48(F.col(key), f"{salt}{i}", 0) % width).alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    ).alias("rb")
    return (
        df.select(rows)
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def cms_lookup(
    keys: DataFrame,
    sketch: DataFrame,
    key: str,
    depth: int = 4,
    width: int = 64,
    salt: str = "cms",
) -> DataFrame:
    """``keys`` + an ``est`` column: min over the sketch rows of the
    key's counters (the classic CM upper bound, est >= true count).
    One key-bounded join — the sketch side is depth*width rows, always
    broadcastable."""
    probes = keys.select(
        F.col(key),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        (_h48(F.col(key), f"{salt}{i}", 0) % width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(key, "rb.row", "rb.bucket")
    est = (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(key)
        .agg(F.min("counter").alias("est"))
    )
    return keys.join(est, key)


def bloom_positions(df: DataFrame, key: str, k: int = 4, m: int = 65536,
                    salt: str = "bloom") -> DataFrame:
    """The set-bit positions of a Bloom filter over ``df[key]`` — one
    ``position`` column, distinct, <= m rows. Kept relational (not a
    packed bitset) so membership is an equi-join any engine can mirror;
    at m=64Ki the whole filter broadcasts as a few-KB table."""
    pos = F.explode(
        F.array(*[(_h48(F.col(key), f"{salt}{i}", 0) % m) for i in range(k)])
    ).alias("position")
    return df.select(pos).distinct()


def bloom_membership(
    keys: DataFrame, positions: DataFrame, key: str, k: int = 4, m: int = 65536,
    salt: str = "bloom"
) -> DataFrame:
    """``keys`` + ``maybe_member`` (true iff every probe bit is set —
    no false negatives, bounded false positives). Probe bits join
    against the broadcast position table; a key passes when its
    distinct probe positions are all present (min over left-join
    match flags, robust to two hashes of one key colliding)."""
    probes = keys.select(
        F.col(key),
        F.explode(
            F.array(*[(_h48(F.col(key), f"{salt}{i}", 0) % m) for i in range(k)])
        ).alias("position"),
    ).distinct()
    hit = F.broadcast(positions.withColumn("__set", F.lit(1)))
    flags = (
        probes.join(hit, "position", "left")
        .groupBy(key)
        .agg((F.min(F.coalesce(F.col("__set"), F.lit(0))) == 1).alias("maybe_member"))
    )
    return keys.join(flags, key)


def hll_estimate(sketch: DataFrame, p: int = 8):
    """Columns (one aggregated row): z_int (exact integer harmonic
    sum scaled by 2^RANK_SPAN), n_zero_buckets, est (raw HLL double),
    est_corrected (linear counting below 2.5m when empties exist).
    Callers quantize ``est_corrected`` before surfacing it."""
    m = 1 << p
    agg = sketch.agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {RANK_SPAN} - register)")
        ).alias("z_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    z_int = (
        F.col("z_present")
        + (F.lit(m) - F.col("n_present")) * F.lit(1 << RANK_SPAN).cast("long")
    ).alias("z_int")
    zeros = (F.lit(m) - F.col("n_present")).alias("n_zero_buckets")
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = (
        F.lit(alpha * m * m)
        / (F.col("z_int").cast("double") / F.lit(float(1 << RANK_SPAN)))
    ).alias("est")
    out = agg.select(z_int, zeros, est)
    corrected = (
        F.when(
            (F.col("est") <= F.lit(2.5 * m)) & (F.col("n_zero_buckets") > 0),
            F.lit(float(m))
            * F.log(F.lit(float(m)) / F.col("n_zero_buckets").cast("double")),
        )
        .otherwise(F.col("est"))
        .alias("est_corrected")
    )
    return out.select("z_int", "n_zero_buckets", "est", corrected)
