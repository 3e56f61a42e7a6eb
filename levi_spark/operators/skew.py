"""Skew-mitigation primitives: salted aggregation and salted joins.

At 100 TB a single hot key (one user's events, one boilerplate
document cluster, one null-ish join key) turns a shuffle into one
straggler reducer. AQE's skew-join split handles sort-merge joins at
runtime; these helpers cover the two cases AQE does not: hash
aggregations with a hot group, and broadcast-unfriendly joins where
the build side must be replicated per salt.

Both are deterministic (salt is derived by hashing a caller-chosen
disambiguator column, not a random number) so results are reproducible
and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_on: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot keys: phase 1 aggregates on
    (keys + salt) — the hot group fans out over ``n_salts`` reducers —
    phase 2 combines the partials on the keys alone (tiny input).

    ``aggs`` maps column -> one of 'sum' | 'count' | 'min' | 'max'
    (the decomposable aggregates: partial and final combine are the
    same op, except count whose final combine is a sum).
    """
    salt = F.pmod(F.xxhash64(salt_on), F.lit(n_salts)).alias("__salt")
    partial_aggs, final_aggs = [], []
    for col, how in aggs.items():
        p = f"__p_{col}_{how}"
        if how == "count":
            partial_aggs.append(F.count(F.col(col)).alias(p))
            final_aggs.append(F.sum(F.col(p)).alias(f"{col}_count"))
        elif how == "sum":
            partial_aggs.append(F.sum(F.col(col)).alias(p))
            final_aggs.append(F.sum(F.col(p)).alias(f"{col}_sum"))
        elif how == "min":
            partial_aggs.append(F.min(F.col(col)).alias(p))
            final_aggs.append(F.min(F.col(p)).alias(f"{col}_min"))
        elif how == "max":
            partial_aggs.append(F.max(F.col(col)).alias(p))
            final_aggs.append(F.max(F.col(p)).alias(f"{col}_max"))
        else:
            raise ValueError(f"non-decomposable aggregate: {how!r}")
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def skew_probe(
    df: DataFrame,
    keys: list[str],
    sample_on: Column,
    sample_mod: int = 101,
    salt: str = "skewprobe",
) -> dict:
    """Cheap deterministic key-histogram probe: one column-pruned pass
    over a ~1/``sample_mod`` row sample (md5 arithmetic on
    ``sample_on`` — reproducible across engines, partitionings and
    runs, so probe-gated plans are oracle-checkable), aggregated to
    {sampled, hot_count, distinct_keys}. The scan reads only the key
    and sample columns; the shuffle is over the sample. Probe the
    SOURCE frame — a probe over expensive derived lineage recomputes
    it, so cache first or probe upstream."""
    from levi_spark.operators.sampling import hash_bucket

    s = df.where(hash_bucket(sample_on, sample_mod, salt) == 0)
    per_key = s.groupBy(*keys).agg(F.count(F.lit(1)).alias("__c"))
    row = per_key.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).alias("sampled"),
        F.coalesce(F.max("__c"), F.lit(0)).alias("hot"),
        F.count(F.lit(1)).alias("nkeys"),
    ).first()
    return {
        "sampled": int(row["sampled"]),
        "hot_count": int(row["hot"]),
        "distinct_keys": int(row["nkeys"]),
    }


def should_salt(
    probe: dict,
    n_partitions: int,
    factor: float = 4.0,
    min_sample: int = 200,
) -> bool:
    """Salt iff the hottest key's sampled share exceeds ``factor`` ×
    an even reducer share — i.e. the plain key-exchange would hand one
    reducer ``factor``× the average load (the straggler a
    1000-executor cluster feels). Below ``min_sample`` sampled rows
    the input is too small for skew to matter (or to be measurable):
    stay plain, which is also the cheap choice."""
    if probe["sampled"] < min_sample:
        return False
    return probe["hot_count"] * n_partitions > factor * probe["sampled"]


def _runtime_partitions(df: DataFrame) -> int:
    spark = df.sparkSession
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:  # "auto" under AQE-managed runtimes
        return spark.sparkContext.defaultParallelism


def adaptive_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_on: Column,
    n_salts: int = 16,
    sample_mod: int = 101,
    factor: float = 4.0,
    min_sample: int = 200,
) -> DataFrame:
    """:func:`salted_agg` gated on a measured skew probe: uniform key
    distributions keep the plain single-exchange plan (the salted
    two-phase costs an extra exchange that only pays when a straggler
    dominates — SKEW_WITNESS.json quantifies both sides), skewed ones
    fan out over ``n_salts`` partials. Output schema is identical on
    both paths (``{col}_{how}`` columns), and both plans are
    bit-identical in results — the probe changes the PLAN, never the
    answer."""
    probe = skew_probe(df, keys, salt_on, sample_mod)
    if should_salt(probe, _runtime_partitions(df), factor, min_sample):
        return salted_agg(df, keys, aggs, salt_on, n_salts)
    fns = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}
    plain = []
    for col, how in aggs.items():
        if how not in fns:
            raise ValueError(f"non-decomposable aggregate: {how!r}")
        plain.append(fns[how](F.col(col)).alias(f"{col}_{how}"))
    return df.groupBy(*keys).agg(*plain)


def adaptive_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_on: Column,
    n_salts: int = 16,
    how: str = "inner",
    sample_mod: int = 101,
    factor: float = 4.0,
    min_sample: int = 200,
) -> DataFrame:
    """:func:`salted_join` gated on a measured skew probe of the BIG
    side's join keys: uniform keys keep the plain equi-join (AQE's
    skew-join split additionally covers the sort-merge case at
    runtime; replicating the build side ``n_salts``× is pure cost
    there), hot keys get the salt fan-out. Results are identical on
    both paths."""
    probe = skew_probe(big, on, salt_on, sample_mod)
    if should_salt(probe, _runtime_partitions(big), factor, min_sample):
        return salted_join(big, small, on, salt_on, n_salts, how)
    return big.join(small, on, how)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_on: Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot keys and ``small`` is too large
    to broadcast: the big side gets a deterministic salt in
    [0, n_salts), the small side is replicated once per salt value
    (explode of a literal range — n_salts x |small| rows), and the join
    key becomes (keys + salt), spreading each hot key over ``n_salts``
    reducers."""
    big_s = big.withColumn("__salt", F.pmod(F.xxhash64(salt_on), F.lit(n_salts)))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, on + ["__salt"], how).drop("__salt")
