"""Data-plane duplicate-elimination operators (reference P9/P11/P12:
``kill_duplicates`` / ``drop_duplicates`` / ``drop_duplicates_pkey``,
``/root/reference/levi/__init__.py:119-166,298-426``).

Spark-first design notes (100 TB stance):

* No positional ``take`` / driver-side index arrays (the reference
  appends a 0..n-1 index column and gathers by position) — survivor
  selection is a ``row_number()`` window over the duplicate key, which
  shuffles once on that key and streams.
* "First physical occurrence" (P11) is given a *defined*, distributed
  meaning: files ordered by (commit version, path), rows by
  ``_metadata.row_index`` within a file — byte-for-byte the order a
  single-process reader would see, but computed without collapsing to
  one partition.
* Writes are FILE-TARGETED: every mutation rewrites only the files
  that actually lose a row (``write_delta(replace_paths=…)``), never
  the whole table — at 100 TB a dedup pass touching 0.1% of rows must
  not rewrite the other 99.9% of bytes. Survivor selection still sees
  the GLOBAL duplicate structure (the loser set is computed over the
  full table, then anti-joined against only the hit files), so
  targeting never changes results. Untouched files keep their add
  actions, stats, and history.
"""

from __future__ import annotations

import functools
import operator
import os

from urllib.parse import unquote

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from levi_spark.delta.table import LeviTable
from levi_spark.delta.writer import write_delta


def _check_table(table) -> LeviTable:
    if not isinstance(table, LeviTable):
        raise TypeError(f"An existing LeviTable is required, got {type(table).__name__}")
    return table


def _check_columns(df_cols: list[str], required: list[str]) -> None:
    missing = [c for c in required if c not in df_cols]
    if missing:
        raise TypeError(
            f"Columns {missing} not found in table columns {sorted(df_cols)}"
        )


def kill_duplicates_transform(df: DataFrame, duplication_columns: list[str]) -> DataFrame:
    """Survivor set after deleting every member of every duplicate group.

    Pure transform shared by the table operator and the query surface.
    left_anti on equi-keys: NULL keys never match ⇒ NULL rows survive,
    exactly like the reference's MERGE-delete predicate
    (levi/__init__.py:155).
    """
    if not duplication_columns or not isinstance(duplication_columns, (list, tuple)):
        raise TypeError("duplication_columns must be a non-empty list")
    _check_columns(df.columns, list(duplication_columns))
    dup_keys = (
        df.groupBy(*duplication_columns)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .where(F.col("__cnt") > 1)
        .select(*duplication_columns)
    )
    return df.join(dup_keys, on=list(duplication_columns), how="left_anti").select(
        *df.columns
    )


def kill_duplicates(table: LeviTable, duplication_columns: list[str]) -> None:
    """Delete **every** member of every duplicate group (no survivor).

    Rows with NULL in any duplication column are never deleted — SQL
    ``=`` never matches NULL (reference parity, the MERGE predicate at
    levi/__init__.py:155).

    Full-table rewrite for reference parity; at scale prefer
    :func:`kill_duplicates_targeted`, which rewrites only the files
    that actually hold duplicate-group rows.
    """
    _check_table(table)
    table.overwrite(kill_duplicates_transform(table.to_df(), duplication_columns))


def kill_duplicates_targeted(table: LeviTable, duplication_columns: list[str]) -> dict:
    """P9 semantics with a file-targeted rewrite — the 100 TB path.

    The reference's MERGE-delete (levi/__init__.py:155-166) and our
    :func:`kill_duplicates` both rewrite the whole table. Here:

    1. One full scan, aggregated map-side, produces per duplicate key
       the *set of files* holding its rows (``_metadata.file_name`` +
       ``collect_set`` — output is metadata-sized, bounded by the file
       count, never the row count).
    2. Only those "hit" files are re-read; the anti-join against the
       duplicate keys runs on that subset, and one commit atomically
       replaces exactly those files (``write_delta(replace_paths=…)``).

    Correct because every row of a (non-NULL-keyed) duplicate group is,
    by definition, in a hit file — so recomputing duplicate keys on the
    subset yields exactly the global duplicate keys. Rows with NULL in
    a duplication column never match (reference parity) and are
    excluded up front, so files whose only repeats are NULL-keyed are
    not rewritten. Untouched files keep their stats and history.

    Returns ``{"files_rewritten", "files_total", "rows_deleted",
    "version"}`` (version -1 if the table has no duplicates).
    """
    _check_table(table)
    if not duplication_columns or not isinstance(duplication_columns, (list, tuple)):
        raise TypeError("duplication_columns must be a non-empty list")
    dcols = list(duplication_columns)
    snap = table.snapshot()
    df = snap.to_df()
    _check_columns(df.columns, dcols)

    non_null = functools.reduce(
        operator.and_, [F.col(c).isNotNull() for c in dcols]
    )
    hit_names = {
        r["__fn"]
        for r in (
            df.where(non_null)
            .select(*dcols, F.col("_metadata.file_name").alias("__fn"))
            .groupBy(*dcols)
            .agg(F.count(F.lit(1)).alias("__cnt"), F.collect_set("__fn").alias("__fns"))
            .where(F.col("__cnt") > 1)
            .select(F.explode("__fns").alias("__fn"))
            .distinct()
            .collect()
        )
    }
    all_rels = [unquote(r["add"]["path"])
                for r in snap.live_adds_collected()]
    if not hit_names:
        return {
            "files_rewritten": 0,
            "files_total": len(all_rels),
            "rows_deleted": 0,
            "version": -1,
        }
    rels = [p for p in all_rels if os.path.basename(p) in hit_names]
    # survivors of the rewrite are not logically modified — preserve
    # their row ids on row-tracked tables (materialized columns ride
    # through the transform; the writer strips them from the schema)
    from levi_spark.operators.layout import _rt_materialized_names

    mat_id, mat_cv = _rt_materialized_names(snap)
    sub = snap.to_df(paths=rels, with_row_ids=mat_id is not None)
    if mat_id is not None:
        sub = sub.withColumnRenamed("_row_id", mat_id).withColumnRenamed(
            "_row_commit_version", mat_cv
        )
    survivors = kill_duplicates_transform(sub, dcols)
    n_before = sub.count()
    n_after = survivors.count()
    version = write_delta(
        survivors,
        table.path,
        mode="append",
        partition_by=list(snap.metadata.partition_columns),
        replace_paths=rels,
        operation="DELETE",
        identity_passthrough=True,  # rewrite carries existing ids
    )
    return {
        "files_rewritten": len(rels),
        "files_total": len(all_rels),
        "rows_deleted": n_before - n_after,
        "version": version,
    }


def _physical_order_df(table: LeviTable) -> DataFrame:
    """Table data plus ``__file_name``/``__file_seq``/``__row_idx``
    columns reproducing single-process read order: add actions sorted by
    (commit version, path), then parquet row index within each file."""
    snap = table.snapshot()
    files = (
        snap.add_actions()
        .select("path", "commit_version")
        .orderBy("commit_version", "path")
        .collect()
    )
    seq_rows = [(os.path.basename(r["path"]), i) for i, r in enumerate(files)]
    spark = table.spark
    seq_df = spark.createDataFrame(seq_rows, ["__file_name", "__file_seq"])
    df = snap.to_df()
    data_cols = df.columns
    return (
        df.withColumn("__file_name", F.col("_metadata.file_name"))
        .withColumn("__row_idx", F.col("_metadata.row_index"))
        .join(F.broadcast(seq_df), on="__file_name", how="left")
        .select(*data_cols, "__file_name", "__file_seq", "__row_idx")
    )


_ORDER_META = ("__file_name", "__file_seq", "__row_idx")


def _targeted_loser_rewrite(table: LeviTable, losers: DataFrame) -> dict:
    """Rewrite ONLY the files that contain a loser row, dropping exactly
    those rows. ``losers`` carries (``__file_name``, ``__row_idx``) of
    every row to delete — computed by the caller over the FULL table, so
    global survivor choice is preserved. One metadata-scale collect
    (distinct file names), one subset re-read, one atomic commit."""
    snap = table.snapshot()
    hit_names = {
        r["__file_name"] for r in losers.select("__file_name").distinct().collect()
    }
    all_rels = [unquote(r["add"]["path"])
                for r in snap.live_adds_collected()]
    if not hit_names:
        return {
            "files_rewritten": 0,
            "files_total": len(all_rels),
            "rows_deleted": 0,
            "version": -1,
        }
    rels = [p for p in all_rels if os.path.basename(p) in hit_names]
    from levi_spark.operators.layout import _rt_materialized_names

    mat_id, mat_cv = _rt_materialized_names(snap)
    sub = snap.to_df(
        paths=rels, with_lineage=True, with_row_ids=mat_id is not None
    )
    keep_cols = list(snap.metadata.data_columns)
    if mat_id is not None:
        sub = sub.withColumnRenamed("_row_id", mat_id).withColumnRenamed(
            "_row_commit_version", mat_cv
        )
        keep_cols += [mat_id, mat_cv]
    kept = sub.join(
        losers.select(
            F.col("__file_name").alias("_file_name"),
            F.col("__row_idx").alias("_row_index"),
        ),
        on=["_file_name", "_row_index"],
        how="left_anti",
    ).select(*keep_cols)
    n_before = sub.count()
    n_after = kept.count()
    version = write_delta(
        kept,
        table.path,
        mode="append",
        partition_by=list(snap.metadata.partition_columns),
        replace_paths=rels,
        operation="DELETE",
        identity_passthrough=True,  # rewrite carries existing ids
    )
    return {
        "files_rewritten": len(rels),
        "files_total": len(all_rels),
        "rows_deleted": n_before - n_after,
        "version": version,
    }


def drop_duplicates(table: LeviTable, duplication_columns: list[str]) -> dict:
    """Keep exactly one row per duplicate group — the first by physical
    row order (reference P11). Survivor = min (file_seq, row_idx) via a
    window; one shuffle on the duplicate key — and a FILE-TARGETED
    rewrite: only files that lose a row are replaced (the loser set is
    global, so survivors outside the rewritten files are untouched by
    construction)."""
    _check_table(table)
    if not duplication_columns or not isinstance(duplication_columns, (list, tuple)):
        raise TypeError("duplication_columns must be a non-empty list or tuple")
    df = _physical_order_df(table)
    data_cols = [c for c in df.columns if c not in _ORDER_META]
    _check_columns(data_cols, list(duplication_columns))
    w = Window.partitionBy(*duplication_columns).orderBy("__file_seq", "__row_idx")
    losers = (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") > 1)
        .select("__file_name", "__row_idx")
    )
    return _targeted_loser_rewrite(table, losers)


def drop_duplicates_ordered(
    df: DataFrame, duplication_columns: list[str], order_columns: list[str]
) -> DataFrame:
    """Keep one row per duplicate group — the first under an explicit,
    caller-defined ordering. Pure transform; the SQL-stable counterpart
    of P11's physical-order semantics (one shuffle on the dup key)."""
    if not duplication_columns:
        raise TypeError("duplication_columns must be a non-empty list or tuple")
    _check_columns(df.columns, [*duplication_columns, *order_columns])
    w = Window.partitionBy(*duplication_columns).orderBy(
        *[F.col(c).asc() for c in order_columns]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(*df.columns)
    )


def drop_duplicates_pkey_transform(
    df: DataFrame, primary_key: str, duplication_columns: list[str]
) -> DataFrame:
    """Pure transform behind P12: per duplicate group keep the lowest
    primary key; pk must be globally unique (``ValueError``)."""
    if not primary_key or not isinstance(primary_key, str):
        raise TypeError("primary_key must be a non-empty string")
    if not duplication_columns or not isinstance(duplication_columns, (list, tuple)):
        raise TypeError("duplication_columns must be a non-empty list or tuple")
    if primary_key in duplication_columns:
        raise TypeError("primary_key cannot be one of the duplication_columns")
    _check_columns(df.columns, [primary_key, *duplication_columns])
    counts = df.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct(primary_key).alias("d")
    ).first()
    if counts["n"] != counts["d"]:
        raise ValueError(
            f"Primary key {primary_key!r} is not unique: {counts['n']} rows, "
            f"{counts['d']} distinct keys"
        )
    return drop_duplicates_ordered(df, list(duplication_columns), [primary_key])


def drop_duplicates_pkey(
    table: LeviTable, primary_key: str, duplication_columns: list[str]
) -> dict:
    """Keep, per duplicate group, the row with the lowest primary key
    (reference P12). Requires a globally unique primary key
    (``ValueError`` otherwise — it guards survivor determinism).
    File-targeted: only files losing a row are rewritten."""
    _check_table(table)
    if not primary_key or not isinstance(primary_key, str):
        raise TypeError("primary_key must be a non-empty string")
    if not duplication_columns or not isinstance(duplication_columns, (list, tuple)):
        raise TypeError("duplication_columns must be a non-empty list or tuple")
    if primary_key in duplication_columns:
        raise TypeError("primary_key cannot be one of the duplication_columns")
    snap = table.snapshot()
    df = snap.to_df(with_lineage=True)
    _check_columns(df.columns, [primary_key, *duplication_columns])
    counts = df.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct(primary_key).alias("d")
    ).first()
    if counts["n"] != counts["d"]:
        raise ValueError(
            f"Primary key {primary_key!r} is not unique: {counts['n']} rows, "
            f"{counts['d']} distinct keys"
        )
    w = Window.partitionBy(*duplication_columns).orderBy(F.col(primary_key).asc())
    losers = (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") > 1)
        .select(
            F.col("_file_name").alias("__file_name"),
            F.col("_row_index").alias("__row_idx"),
        )
    )
    return _targeted_loser_rewrite(table, losers)
