"""Streaming ingestion into the engine's own Delta tables.

``foreachBatch`` bridges Structured Streaming to the batch writer: each
micro-batch commits one Delta version (append). With a checkpoint
location the file source tracks consumed input, so restarting the
stream does not re-ingest — at-least-once across crashes inside a
batch, exactly-once across clean restarts. (delta-spark's native sink
additionally records txn app ids for exactly-once under crash replay;
that is the production upgrade path.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from levi_spark.delta.writer import write_delta


def stream_to_delta(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
) -> None:
    """Drain ``stream_df`` (AvailableNow) into the Delta table at
    ``table_path``, one commit per micro-batch."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        import os

        mode = "append" if os.path.isdir(os.path.join(table_path, "_delta_log")) else "error"
        write_delta(batch_df, table_path, mode=mode, partition_by=partition_by)

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
