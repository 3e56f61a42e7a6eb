"""SparkSession factory for levi-spark.

One place to configure the session the way the engine expects:

* UTC session timezone — deterministic timestamp semantics across the
  duckdb oracle, the Delta log's epoch-millis ``modificationTime``
  fields, and partition-value parsing.
* AQE on — runtime re-planning (skew joins, dynamic coalescing) is the
  scale story for the 100 TB target; on local[32] it also coalesces
  tiny shuffle partitions.
* ``spark.sql.shuffle.partitions`` sized for the local test harness;
  a real cluster deployment overrides it (or lets AQE coalesce).

The reference (levi) has no session concept — it is single-process
delta-rs/pyarrow (``/root/reference/levi/__init__.py:1-10``). This module
is the Spark-native replacement for that implicit runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "levi-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession."""
    # Python workers (pandas UDFs, applyInPandasWithState) unpickle
    # module-level references by importing them — make the package root
    # importable in worker processes no matter where the driver ran from.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Arrow for any pandas-UDF boundary (similarity / multimodal ops).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.columnarReaderBatchSize", "4096")
        # columnMapping 'id' mode: the DeltaLog scan schema carries
        # parquet.field.id metadata and the reader must resolve by it
        # (delta-spark sets the same flag for id-mapped tables). For
        # schemas without field-id metadata this is a no-op.
        .config("spark.sql.parquet.fieldId.read.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
