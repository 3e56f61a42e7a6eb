"""levi-spark: PySpark-native Delta-table analytics & maintenance engine.

Re-expresses the capability surface of mrpowers-io/levi (a delta-rs /
PyArrow / pandas helper library, see SURVEY.md) as idiomatic PySpark,
plus large-scale LLM-data-pipeline operators (dedup, similarity search,
text analysis, streaming) designed for 100 TB-scale execution.

Top-level surface: the session factory, the log-replay core, and the
table lifecycle verbs. The reference's 12-function drop-in API is
:mod:`levi_spark.api`; the full oracle-gated query registry is
:mod:`levi_spark.queries`.
"""

from levi_spark.session import get_spark
from levi_spark.delta.log import DeltaLog, Snapshot


def __getattr__(name: str):
    # Lazy re-exports: importing levi_spark stays cheap (pyspark only);
    # lifecycle verbs resolve on first use.
    lazy = {
        "write_delta": ("levi_spark.delta.writer", "write_delta"),
        "clone_table": ("levi_spark.delta.clone", "clone_table"),
        "restore": ("levi_spark.delta.restore", "restore"),
        "restore_to_timestamp": (
            "levi_spark.delta.restore", "restore_to_timestamp"),
        "snapshot_at_timestamp": (
            "levi_spark.delta.restore", "snapshot_at_timestamp"),
        "describe_history": ("levi_spark.delta.history", "describe_history"),
        "describe_detail": ("levi_spark.delta.history", "describe_detail"),
        "vacuum": ("levi_spark.delta.vacuum", "vacuum"),
        "soft_delete": ("levi_spark.delta.dv", "soft_delete"),
        "merge": ("levi_spark.operators.merge", "merge"),
        "LeviTable": ("levi_spark.delta.table", "LeviTable"),
        "table_changes_cdf": ("levi_spark.delta.changes", "table_changes_cdf"),
        "set_table_properties": (
            "levi_spark.delta.constraints", "set_table_properties"),
        "add_check_constraint": (
            "levi_spark.delta.constraints", "add_check_constraint"),
        "drop_check_constraint": (
            "levi_spark.delta.constraints", "drop_check_constraint"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'levi_spark' has no attribute {name!r}")


__all__ = [
    "get_spark", "DeltaLog", "Snapshot", "write_delta", "clone_table",
    "restore", "restore_to_timestamp", "snapshot_at_timestamp",
    "describe_history", "describe_detail", "vacuum", "soft_delete",
    "merge", "LeviTable", "table_changes_cdf", "set_table_properties",
    "add_check_constraint", "drop_check_constraint",
]
__version__ = "0.1.0"
