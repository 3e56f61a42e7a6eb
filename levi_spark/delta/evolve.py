"""Type widening — the WRITE side of the ``typeWidening`` table
feature this engine's reader has accepted since round 6.

``widen_column(spark, path, column, to_type)`` publishes a
METADATA-ONLY commit: the column's type is replaced by a strictly
wider one from the spec's allowed matrix, the field's metadata gains
a ``delta.typeChanges`` entry recording {fromType, toType,
tableVersion}, and the protocol upgrades to reader 3 / writer 7 with
``typeWidening`` on both sides (it is a genuine reader feature: old
files stay written at the NARROW physical type, and a reader unaware
of widening would take the parquet footer's type over the schema's
and mis-reassemble). No data file is touched — the whole operation is
O(1) in table size, which is exactly why type widening exists (an
int->long migration on a 100 TB table rewrites nothing).

Allowed widenings (the spec's stable set for integral/floating
types; decimal/date widenings are not implemented here and refuse):
byte->short/int/long, short->int/long, int->long, float->double.
Anything else raises — silently recording an unsupported change
would corrupt every reader.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from levi_spark.delta.log import DeltaLog
from levi_spark.delta.writer import (
    _COORD_PROP,
    _publish_commit,
    _publish_staged_commit,
    merge_protocol,
)

_WIDENINGS: dict[str, set[str]] = {
    "byte": {"short", "integer", "long"},
    "short": {"integer", "long"},
    "integer": {"long"},
    "float": {"double"},
}

_TYPES: dict[str, T.DataType] = {
    "byte": T.ByteType(),
    "short": T.ShortType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
}


def widen_column(
    spark: SparkSession, table_path: str, column: str, to_type: str
) -> int:
    """Widen ``column`` to ``to_type`` in a metadata-only commit;
    returns the committed version. Appends after the widening write
    files at the NEW (wide) type; files written before it keep the
    narrow physical type and upcast at scan time."""
    to_type = {"int": "integer"}.get(to_type, to_type)
    log = DeltaLog(spark, table_path)
    snap = log.snapshot()
    meta = snap.metadata
    fields = []
    hit = False
    for f in meta.schema.fields:
        if f.name != column:
            fields.append(f)
            continue
        hit = True
        from_name = f.dataType.typeName()
        if to_type not in _WIDENINGS.get(from_name, set()):
            raise ValueError(
                f"widening {from_name} -> {to_type} on '{column}' is not "
                "in the supported matrix (byte/short/int -> wider "
                "integral, float -> double)"
            )
        md = dict(f.metadata or {})
        changes = list(md.get("delta.typeChanges", []))
        changes.append(
            {
                "fromType": from_name,
                "toType": to_type,
                "tableVersion": snap.version + 1,
            }
        )
        md["delta.typeChanges"] = changes
        fields.append(
            T.StructField(f.name, _TYPES[to_type], f.nullable, md)
        )
    if not hit:
        raise ValueError(f"column '{column}' not in table schema")
    if column in meta.partition_columns:
        raise ValueError(f"cannot widen partition column '{column}'")

    new_schema = T.StructType(fields)
    proto = merge_protocol(
        snap.protocol,
        {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["typeWidening"],
            "writerFeatures": ["typeWidening"],
        },
    )
    now_ms = int(time.time() * 1000)
    payload = "\n".join(
        json.dumps(a)
        for a in (
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": "WIDEN COLUMN TYPE",
                    "operationParameters": {
                        "column": column,
                        "toType": to_type,
                    },
                    "engineInfo": "levi-spark/0.1.0",
                }
            },
            {"protocol": proto},
            {
                "metaData": {
                    "id": meta.id or str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": new_schema.json(),
                    "partitionColumns": meta.partition_columns,
                    "configuration": meta.configuration,
                    "createdTime": meta.created_time or now_ms,
                }
            },
        )
    ) + "\n"
    log_dir = os.path.join(os.path.abspath(table_path), "_delta_log")
    version = snap.version + 1
    # schema changes never blind-rebase: a racing commit may itself
    # have evolved the schema this widening was computed from
    if _COORD_PROP in meta.configuration:
        return _publish_staged_commit(log_dir, version, payload)
    return _publish_commit(log_dir, version, payload, rebase_ok=False)
