"""Type-2 slowly-changing-dimension upsert (reference P10:
``type_2_scd_upsert``, ``/root/reference/levi/__init__.py:169-295``).

MERGE semantics realized as declarative DataFrame set algebra (no
delta-spark jar in this environment): the staged source uses the same
NULL-merge-key trick as the reference — a changed row appears twice,
once keyed (to close the old version) and once NULL-keyed (to fall into
the insert branch) — and the four row populations (history, unchanged
current, closed, inserted) are unioned and committed as one overwrite.

Deliberate deviations from the reference, both documented there as
latent issues:

* the current-flag column name is **parameterized** in the match
  predicate — the reference hardcodes ``is_current`` at
  levi/__init__.py:277 and would corrupt tables using another name;
* attribute comparison stays non-null-safe ``!=`` (NULL ↔ value is NOT
  a change), matching levi/__init__.py:237-241 exactly.

Scale: one shuffle join updates×current (AQE broadcasts the typically
small updates side), one union, one write. No driver-side row handling.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from levi_spark.delta.table import LeviTable


def scd2_merge_result(
    base_df: DataFrame,
    updates_df: DataFrame,
    primary_key: str,
    attr_col_names: list[str],
    is_current_col_name: str,
    effective_time_col_name: str,
    end_time_col_name: str,
) -> DataFrame:
    """Pure transform: the post-upsert table contents. Shared by the
    table operator and the query/oracle surface."""
    base_required = sorted(
        [primary_key, *attr_col_names, is_current_col_name,
         effective_time_col_name, end_time_col_name]
    )
    if sorted(base_df.columns) != base_required:
        raise TypeError(
            f"Base table columns {sorted(base_df.columns)} must be exactly {base_required}"
        )
    updates_required = sorted([primary_key, *attr_col_names, effective_time_col_name])
    if sorted(updates_df.columns) != updates_required:
        raise TypeError(
            f"Updates columns {sorted(updates_df.columns)} must be exactly {updates_required}"
        )

    pk_type = dict(base_df.dtypes)[primary_key]
    flag = is_current_col_name
    eff = effective_time_col_name
    end = end_time_col_name

    current = base_df.where(F.col(flag) == F.lit(True))
    history = base_df.where(~(F.col(flag) == F.lit(True)) | F.col(flag).isNull())

    # -- staged source: NULL-merge-key trick ---------------------------------
    base_sfx = current.select(
        F.col(primary_key).alias("__pk_base"),
        *[F.col(a).alias(f"{a}__base") for a in attr_col_names],
    )
    joined = updates_df.join(
        base_sfx, updates_df[primary_key] == base_sfx["__pk_base"], "inner"
    )
    any_attr_differs = reduce(
        lambda x, y: x | y,
        [F.col(a) != F.col(f"{a}__base") for a in attr_col_names],
    )
    staged_changed = (
        joined.where(any_attr_differs)
        .select(*updates_df.columns)
        .withColumn("__merge_key", F.lit(None).cast(pk_type))
    )
    staged_all = updates_df.withColumn("__merge_key", F.col(primary_key))
    staged = staged_all.unionByName(staged_changed)

    # -- MERGE as set algebra -------------------------------------------------
    src = staged.select(
        F.col("__merge_key"),
        F.col(primary_key).alias("__s_pk"),
        *[F.col(a).alias(f"__s_{a}") for a in attr_col_names],
        F.col(eff).alias("__s_eff"),
    )
    keyed_src = src.where(F.col("__merge_key").isNotNull())

    m = current.join(
        keyed_src, current[primary_key] == keyed_src["__merge_key"], "left"
    )
    matched_differs = F.col("__merge_key").isNotNull() & reduce(
        lambda x, y: x | y,
        [F.col(a) != F.col(f"__s_{a}") for a in attr_col_names],
    )
    closed = m.where(matched_differs).select(
        *[F.col(c) for c in [primary_key, *attr_col_names]],
        F.lit(False).alias(flag),
        F.col(eff),
        F.col("__s_eff").alias(end),
    )
    kept_current = m.where(~F.coalesce(matched_differs, F.lit(False))).select(
        *base_df.columns
    )

    inserted = (
        src.join(
            current.select(F.col(primary_key).alias("__t_pk")),
            src["__merge_key"] == F.col("__t_pk"),
            "left_anti",
        )
        .select(
            F.col("__s_pk").alias(primary_key),
            *[F.col(f"__s_{a}").alias(a) for a in attr_col_names],
            F.lit(True).alias(flag),
            F.col("__s_eff").alias(eff),
            F.lit(None).cast(dict(base_df.dtypes)[end]).alias(end),
        )
    )

    cols = base_df.columns
    return (
        history.select(*cols)
        .unionByName(kept_current.select(*cols))
        .unionByName(closed.select(*cols))
        .unionByName(inserted.select(*cols))
    )


def type_2_scd_upsert(
    table: LeviTable,
    updates_df: DataFrame,
    primary_key: str,
    attr_col_names: list[str],
    is_current_col_name: str,
    effective_time_col_name: str,
    end_time_col_name: str,
) -> None:
    if not isinstance(table, LeviTable):
        raise TypeError(f"An existing LeviTable is required, got {type(table).__name__}")
    table.overwrite(
        scd2_merge_result(
            table.to_df(),
            updates_df,
            primary_key,
            attr_col_names,
            is_current_col_name,
            effective_time_col_name,
            end_time_col_name,
        )
    )
