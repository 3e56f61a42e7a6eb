"""Streaming ingestion into the engine's own Delta tables.

``foreachBatch`` bridges Structured Streaming to the batch writer: each
micro-batch commits one Delta version (append). The checkpoint location
makes the SOURCE side exactly-once across clean restarts; the SINK side
is made exactly-once under crash replay too by recording the micro-batch
id as a Delta SetTransaction in the same commit (delta-spark's
``txnAppId``/``txnVersion`` idempotent-sink pattern): when Spark replays
a batch whose commit already landed — crash between the table commit
and the checkpoint write — the sink sees ``batch_id <= txn_versions()``
and skips, instead of double-appending.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from levi_spark.delta.writer import write_delta


def _sink_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_path: str,
    partition_by: list[str] | None,
    app_id: str,
) -> bool:
    """Commit one micro-batch idempotently; returns False when the
    batch was already applied (crash replay)."""
    from levi_spark.delta.log import DeltaLog

    exists = os.path.isdir(os.path.join(table_path, "_delta_log"))
    if exists:
        applied = (
            DeltaLog(batch_df.sparkSession, table_path)
            .snapshot()
            .txn_versions()
            .get(app_id, -1)
        )
        if batch_id <= applied:
            return False
    write_delta(
        batch_df,
        table_path,
        mode="append" if exists else "error",
        partition_by=partition_by,
        txn=(app_id, batch_id),
    )
    return True


def stream_to_delta(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
    app_id: str | None = None,
) -> None:
    """Drain ``stream_df`` (AvailableNow) into the Delta table at
    ``table_path``, one commit per micro-batch, exactly-once across
    both clean restarts (source checkpoint) and crash replays
    (per-batch SetTransaction)."""
    app = app_id or f"levi-stream-sink:{os.path.abspath(checkpoint_dir)}"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _sink_batch(batch_df, batch_id, table_path, partition_by, app)

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def ingest_events(
    spark: SparkSession,
    sf_dir: str,
    table_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """File-stream the events table into a Delta table partitioned by
    event_type — the full loop: source -> stream -> engine's log."""
    from levi_spark.streaming.jobs import read_events_stream

    stream_to_delta(
        read_events_stream(spark, sf_dir, max_files_per_trigger),
        table_path,
        checkpoint_dir,
        partition_by=["event_type"],
    )
