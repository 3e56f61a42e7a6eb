"""Checkpoint writer + log expiry: the other half of log replay.

The reader (:mod:`levi_spark.delta.log`) already consumes checkpoints
(fixtures ``with_checkpoint`` / ``no_replay``); this module produces
them, which is what makes log truncation safe: snapshot reconstruction
cost stays O(files) instead of O(history), and commits older than the
checkpoint can be deleted (Delta's metadata-cleanup behavior the
``no_replay`` fixture demonstrates).

The checkpoint parquet is written BY SPARK (the live-file set is the
reconciled add-action frame — O(table files), potentially millions of
rows at 100 TB, so it is never collected to the driver) and the single
part file is moved to ``NNNN.checkpoint.parquet``.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pyspark.sql import Window

from levi_spark.delta.log import (
    _METADATA_TYPE,
    _PROTOCOL_TYPE,
    _REMOVE_TYPE,
    _TXN_TYPE,
    DeltaLog,
)


def write_checkpoint(spark: SparkSession, table_path: str, version: int | None = None) -> int:
    """Write ``<v>.checkpoint.parquet`` + ``_last_checkpoint`` for the
    snapshot at ``version`` (default: latest). Returns the checkpointed
    version."""
    log = DeltaLog(spark, table_path)
    snap = log.snapshot(version)
    v = snap.version
    acts = snap._actions_df()

    adds = snap.live_adds_raw().select(
        "add",
        F.lit(None).cast(_REMOVE_TYPE).alias("remove"),
        F.lit(None).cast(_METADATA_TYPE).alias("metaData"),
        F.lit(None).cast(_PROTOCOL_TYPE).alias("protocol"),
        F.lit(None).cast(_TXN_TYPE).alias("txn"),
    )
    add_type = adds.schema["add"].dataType
    meta = (
        acts.where(F.col("metaData.schemaString").isNotNull())
        .orderBy(F.col("version").desc())
        .limit(1)
        .select(
            F.lit(None).cast(add_type).alias("add"),
            F.lit(None).cast(_REMOVE_TYPE).alias("remove"),
            F.col("metaData"),
            F.lit(None).cast(_PROTOCOL_TYPE).alias("protocol"),
            F.lit(None).cast(_TXN_TYPE).alias("txn"),
        )
    )
    proto = (
        acts.where(F.col("protocol.minReaderVersion").isNotNull())
        .orderBy(F.col("version").desc())
        .limit(1)
        .select(
            F.lit(None).cast(add_type).alias("add"),
            F.lit(None).cast(_REMOVE_TYPE).alias("remove"),
            F.lit(None).cast(_METADATA_TYPE).alias("metaData"),
            F.col("protocol"),
            F.lit(None).cast(_TXN_TYPE).alias("txn"),
        )
    )
    # Latest SetTransaction per appId rides into the checkpoint —
    # expiring pre-checkpoint commits must not lose incremental
    # consumers' applied-version watermarks.
    txn_w = Window.partitionBy("txn.appId").orderBy(
        F.col("txn.version").desc(), F.col("version").desc()
    )
    txns = (
        acts.where(F.col("txn.appId").isNotNull())
        .withColumn("__rn", F.row_number().over(txn_w))
        .where(F.col("__rn") == 1)
        .select(
            F.lit(None).cast(add_type).alias("add"),
            F.lit(None).cast(_REMOVE_TYPE).alias("remove"),
            F.lit(None).cast(_METADATA_TYPE).alias("metaData"),
            F.lit(None).cast(_PROTOCOL_TYPE).alias("protocol"),
            F.col("txn"),
        )
    )
    cp_df = adds.unionByName(meta).unionByName(proto).unionByName(txns)

    log_dir = log.log_path
    staging = os.path.join(log_dir, f".cp-staging-{uuid.uuid4().hex}")
    n_actions = cp_df.count()
    cp_df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(
        n for n in os.listdir(staging) if n.endswith(".parquet") and n.startswith("part-")
    )
    dst = os.path.join(log_dir, f"{v:020d}.checkpoint.parquet")
    os.replace(os.path.join(staging, part), dst)
    shutil.rmtree(staging, ignore_errors=True)
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        fh.write(json.dumps({"version": v, "size": n_actions}) + "\n")
    return v


def expire_log(spark: SparkSession, table_path: str, keep_last: int = 0) -> list[int]:
    """Delete commit JSONs at versions <= the newest checkpoint minus
    ``keep_last`` — safe because the checkpoint carries the reconciled
    state (the ``no_replay`` fixture's layout). Returns the deleted
    versions. Refuses to delete anything without a checkpoint."""
    log = DeltaLog(spark, table_path)
    commits, checkpoints = log._entries()
    if not checkpoints:
        return []
    cutoff = max(checkpoints) - keep_last
    deleted = []
    for c in commits:
        if c <= cutoff:
            os.remove(os.path.join(log.log_path, f"{c:020d}.json"))
            deleted.append(c)
    return deleted
