from levi_spark.delta.log import DeltaLog, Snapshot

__all__ = ["DeltaLog", "Snapshot"]
