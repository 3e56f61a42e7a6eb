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
