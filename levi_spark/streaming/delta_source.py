"""Incremental Delta→Delta sync: our log as a streaming source.

Structured Streaming's file source cannot follow a Delta log (it would
re-read rewritten files and miss remove semantics). The engine's
change feed (:mod:`levi_spark.delta.changes`) gives exactly the
needed primitive — "rows added by data-changing commits after version
V" — so continuous ingestion becomes a pull loop:

    state = SyncState(dst_table_dir)        # persists last-seen version
    n = incremental_sync(spark, src, dst, state)   # one micro-batch

Each call reads ONLY the files added since the checkpointed version
(O(new data), never the table), appends them to ``dst`` in one commit,
and advances the checkpoint — exactly-once per commit range because
the state write happens after the destination commit and re-running a
completed range appends nothing new (the version window is empty).

This is the same contract as Delta's ``readStream`` source with
``maxFilesPerTrigger``-style batching left to commit granularity; the
driver loop (cron, Airflow task, while-True) owns the schedule.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from levi_spark.delta.changes import table_changes
from levi_spark.delta.log import DeltaLog
from levi_spark.delta.writer import write_delta


class SyncState:
    """Last-synced source version, persisted as JSON next to the
    destination table (the destination commit and this file advance
    together; a crash between them replays an empty window)."""

    def __init__(self, state_path: str):
        self.path = state_path

    def last_version(self) -> int:
        if not os.path.exists(self.path):
            return -1
        with open(self.path) as fh:
            return json.load(fh)["last_version"]

    def advance(self, version: int) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"last_version": version}, fh)
        os.replace(tmp, self.path)


def incremental_sync(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    state: SyncState,
) -> dict:
    """Pull one micro-batch: append all source rows committed after the
    checkpointed version to ``dst_path``. Returns {"rows", "from_version",
    "to_version", "dst_version"} (dst_version -1 when idle)."""
    src_log = DeltaLog(spark, src_path)
    to_version = src_log.latest_version()
    from_version = state.last_version()
    if from_version < 0:
        # first sync: bootstrap from the full current snapshot (the
        # change feed needs a base; versions <= to_version are captured
        # wholesale, later calls go incremental)
        snap = src_log.snapshot(to_version)
        df = snap.to_df()
        mode = "error" if not os.path.isdir(os.path.join(dst_path, "_delta_log")) else "append"
        rows = df.count()
        dst_v = write_delta(
            df, dst_path, mode=mode,
            partition_by=list(snap.metadata.partition_columns),
        )
        state.advance(to_version)
        return {
            "rows": rows,
            "from_version": -1,
            "to_version": to_version,
            "dst_version": dst_v,
        }
    if to_version <= from_version:
        return {
            "rows": 0,
            "from_version": from_version,
            "to_version": to_version,
            "dst_version": -1,
        }
    ch = table_changes(spark, src_path, from_version, to_version).drop(
        "_commit_version"
    )
    rows = ch.count()
    if rows == 0:
        state.advance(to_version)
        return {
            "rows": 0,
            "from_version": from_version,
            "to_version": to_version,
            "dst_version": -1,
        }
    src_parts = list(src_log.snapshot(to_version).metadata.partition_columns)
    dst_v = write_delta(ch, dst_path, mode="append", partition_by=src_parts)
    state.advance(to_version)
    return {
        "rows": rows,
        "from_version": from_version,
        "to_version": to_version,
        "dst_version": dst_v,
    }
