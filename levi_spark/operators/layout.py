"""Data-layout maintenance: small-file compaction and z-order clustering.

The reference's README motivates both ("compact the small files ...
make queries on this Delta table run faster", levi README.md:30; the
z-order hint at README.md:58) but implements neither — they live in
delta-rs. Here they are Spark-native OPTIMIZE-style operators on top
of the engine's own writer primitive (``write_delta(replace_paths=...)``:
new files + tombstones for the replaced ones in a single commit).

Scale stance:
* Compaction reads ONLY the files below the size threshold (never the
  whole table), bin-packs them to the target size, and replaces them
  in one commit. Untouched large files keep their stats.
* Z-ordering maps each clustering column to a fixed-width rank via
  min/max linear bucketing (two literals from one metadata-cheap agg —
  no global sort, no skew-prone single-partition window), interleaves
  the bucket bits into a z-value, and range-partitions + sorts by it.
  The payoff is file-level min/max locality: Delta data skipping
  (levi's ``skipped_stats`` measures exactly this) prunes far more
  files for multi-column predicates.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from levi_spark.delta.log import DeltaLog
from levi_spark.delta.writer import write_delta


def compact_small_files(
    spark: SparkSession,
    path: str,
    small_bytes: int = 32 * 1024 * 1024,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite every live file smaller than ``small_bytes`` into
    ~``target_bytes`` files; one commit replaces them atomically.

    Returns {"files_removed", "files_added", "version"} (version is -1
    when nothing qualified — fewer than 2 small files is a no-op).
    """
    log = DeltaLog(spark, path)
    snap = log.snapshot()
    part_cols = list(snap.metadata.partition_columns)
    smalls = [
        r["path"]
        for r in snap.add_actions()
        .where(F.col("size_bytes") < small_bytes)
        .select("path")
        .collect()
    ]
    if len(smalls) < 2:
        return {"files_removed": 0, "files_added": 0, "version": -1}
    total = sum(os.stat(os.path.join(path, p)).st_size for p in smalls)
    n_out = max(1, math.ceil(total / target_bytes))

    df = snap.to_df(paths=smalls)
    before = log.latest_version()
    version = write_delta(
        df.repartition(n_out),
        path,
        mode="append",
        partition_by=part_cols,
        replace_paths=smalls,
        operation="OPTIMIZE",
    )
    after_files = DeltaLog(spark, path).snapshot().add_actions().count()
    return {
        "files_removed": len(smalls),
        "files_added": after_files
        - (snap.add_actions().count() - len(smalls)),
        "version": version,
        "prev_version": before,
    }


def zorder_value(df: DataFrame, cols: list[str], bits: int = 12) -> DataFrame:
    """Append a ``__z`` column: bit-interleaved z-curve index of the
    clustering columns, each linearly bucketed to [0, 2^bits) between
    its global min and max (one tiny agg; literals broadcast in the
    plan). Entirely whole-stage-codegen expressions."""
    ranges = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{c}") for c in cols],
    ).first()
    n = len(cols)
    buckets = []
    for c in cols:
        lo, hi = ranges[f"__lo_{c}"], ranges[f"__hi_{c}"]
        span = (hi - lo) or 1.0
        b = F.least(
            F.lit((1 << bits) - 1),
            F.floor(
                (F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * F.lit(1 << bits)
            ).cast("long"),
        )
        buckets.append(F.greatest(F.lit(0), b))
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for i, b in enumerate(buckets):
            z = z + F.shiftleft(
                F.shiftright(b, bit).bitwiseAND(F.lit(1)), bit * n + i
            ).cast("long")
    return df.withColumn("__z", z)


def optimize_zorder(
    spark: SparkSession,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 12,
) -> int:
    """Full-table rewrite clustered by the z-curve over ``cols``:
    range-partition on the z-value (contiguous curve segments per
    file), sort within partitions, commit as an overwrite. Returns the
    new version."""
    log = DeltaLog(spark, path)
    snap = log.snapshot()
    df = zorder_value(snap.to_df(), cols, bits=bits)
    clustered = (
        df.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    return write_delta(
        clustered,
        path,
        mode="overwrite",
        partition_by=list(snap.metadata.partition_columns),
        operation="OPTIMIZE",
    )
