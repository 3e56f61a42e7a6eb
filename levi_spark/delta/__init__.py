from levi_spark.delta.log import DeltaLog, Snapshot
from levi_spark.delta.dv import purge_deleted, soft_delete
from levi_spark.delta.vacuum import vacuum
from levi_spark.delta.changes import table_changes

__all__ = ["DeltaLog", "Snapshot", "soft_delete", "purge_deleted", "vacuum", "table_changes"]
