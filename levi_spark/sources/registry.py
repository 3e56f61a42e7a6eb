"""Typed source layer: schema-declared readers for every input format.

Scale stance: every reader takes an EXPLICIT schema. Schema inference
on parquet is metadata-only (footers) but on CSV/JSON it is a full
pre-scan of the data — at 100 TB that is a second pass over the lake,
so the generic readers refuse to infer. Column pruning is expressed as
``select`` on the returned DataFrame (Catalyst pushes it into the
scan); partition filters likewise.

The synthetic star-schema table DDLs below mirror FIXTURES.md §B and
are verified against the actual parquet footers by
``tests/test_sources.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# DDL per driver-generated table (FIXTURES.md §B)
TABLE_DDL: dict[str, str] = {
    "region": "r_regionkey INT, r_name STRING",
    "nation": "n_nationkey INT, n_name STRING, n_regionkey INT",
    "customer": (
        "c_custkey BIGINT, c_name STRING, c_nationkey INT, "
        "c_acctbal DOUBLE, c_mktsegment STRING"
    ),
    "supplier": "s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE",
    "part": (
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size INT, p_retailprice DOUBLE"
    ),
    "orders": (
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING"
    ),
    "lineitem": (
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, l_linenumber INT, "
        "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, "
        "l_returnflag STRING, l_linestatus STRING, l_shipdate TIMESTAMP_NTZ"
    ),
    # ts intentionally absent here: stored as TIMESTAMP(NANOS), surfaced
    # by read_events as ts_us BIGINT (see below)
    "events": (
        "event_id BIGINT, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING"
    ),
    "documents": "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    "embeddings": "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
}


class SchemaMismatchError(TypeError):
    pass


def _check_columns(df: DataFrame, name: str, ddl: str) -> None:
    expected = {f.name for f in StructType.fromDDL(ddl).fields}
    actual = set(df.columns)
    missing = expected - actual
    if missing:
        raise SchemaMismatchError(
            f"table {name!r}: missing columns {sorted(missing)} (have {sorted(actual)})"
        )


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one star-schema table, column set verified
    against the declared DDL. ``events`` is normalized (nanos -> µs)."""
    if name == "events":
        return read_events(spark, sf_dir)
    if name not in TABLE_DDL:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TABLE_DDL)}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    _check_columns(df, name, TABLE_DDL[name])
    return df


def events_ts_unit(sf_dir: str) -> str:
    """Physical unit of events.ts, from the parquet footer (metadata-only
    read): 'ns' for TIMESTAMP(NANOS), 'us' for TIMESTAMP(MICROS).
    Driver-generated testdata has shipped BOTH across rounds, so every
    reader branches on the footer instead of assuming."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{sf_dir}/events*.parquet"))
    if not files:
        raise FileNotFoundError(f"no events*.parquet under {sf_dir}")
    t = pq.read_schema(files[0]).field("ts").type
    if pa.types.is_int64(t):
        return "ns"  # pre-flattened raw nanos (test fixtures)
    unit = getattr(t, "unit", None)
    if unit not in ("ns", "us"):
        raise SchemaMismatchError(f"events.ts: unsupported type {t!r}")
    return unit


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table with ``ts`` normalized to ``ts_us`` (epoch
    microseconds, long), whatever the file's physical unit:

    * TIMESTAMP(NANOS): Spark can only surface it as a raw long via the
      nanosAsLong legacy conf -> ``ts div 1000``.
    * TIMESTAMP(MICROS): read as TIMESTAMP_NTZ, ``unix_micros`` under
      the UTC session timezone (levi_spark.session pins it) — the same
      integer DuckDB's ``epoch_ns(ts) // 1000`` yields.
    """
    if events_ts_unit(sf_dir) == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        df = df.withColumn("ts_us", F.expr("ts div 1000")).drop("ts")
    else:
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        df = df.withColumn(
            "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
        ).drop("ts")
    _check_columns(df, "events", TABLE_DDL["events"] + ", ts_us BIGINT")
    return df


def read_csv(
    spark: SparkSession, path: str, schema: str | StructType, **options: str
) -> DataFrame:
    """CSV with a mandatory schema — inference would re-scan the data."""
    opts = {"header": "true", **options}
    return spark.read.options(**opts).schema(schema).csv(path)


def read_json(
    spark: SparkSession, path: str, schema: str | StructType, **options: str
) -> DataFrame:
    """JSON-lines with a mandatory schema — inference would re-scan."""
    return spark.read.options(**options).schema(schema).json(path)


def read_delta(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Delta table content at a version, via the engine's own log
    replay (levi_spark.delta.log.DeltaLog)."""
    from levi_spark.delta.log import DeltaLog

    return DeltaLog(spark, path).snapshot(version).to_df()
