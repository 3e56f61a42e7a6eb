"""Column mapping (name mode) reads: tables whose parquet files carry
UUID-style physical column names resolve back to logical names via the
schemaString's delta.columnMapping.physicalName metadata. 'id' mode
(parquet field-id resolution) stays refused; writes to mapped tables
stay refused."""

import json
import os

import pytest

from levi_spark.delta.log import DeltaLog, UnsupportedTableFeatureError
from levi_spark.delta.writer import write_delta

PHYS_K, PHYS_S, PHYS_P = "col-9a1b", "col-77fe", "col-p0ab"


def _schema_string(with_partition):
    fields = [
        {
            "name": "k",
            "type": "long",
            "nullable": True,
            "metadata": {"delta.columnMapping.id": 1,
                         "delta.columnMapping.physicalName": PHYS_K},
        },
        {
            "name": "s",
            "type": "string",
            "nullable": True,
            "metadata": {"delta.columnMapping.id": 2,
                         "delta.columnMapping.physicalName": PHYS_S},
        },
    ]
    if with_partition:
        fields.append(
            {
                "name": "p",
                "type": "integer",
                "nullable": True,
                "metadata": {"delta.columnMapping.id": 3,
                             "delta.columnMapping.physicalName": PHYS_P},
            }
        )
    return json.dumps({"type": "struct", "fields": fields})


def _mk_mapped(spark, path, mode="name", with_partition=False):
    os.makedirs(os.path.join(path, "_delta_log"))
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], f"`{PHYS_K}` BIGINT, `{PHYS_S}` STRING"
    )
    df.coalesce(1).write.mode("append").parquet(path)
    data = [
        n for n in os.listdir(path) if n.endswith(".parquet")
    ]
    stats = json.dumps(
        {
            "numRecords": 2,
            "minValues": {PHYS_K: 1, PHYS_S: "a"},
            "maxValues": {PHYS_K: 2, PHYS_S: "b"},
            "nullCount": {PHYS_K: 0, PHYS_S: 0},
        }
    )
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "t-1",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _schema_string(with_partition),
                "partitionColumns": ["p"] if with_partition else [],
                "configuration": {"delta.columnMapping.mode": mode},
                "createdTime": 0,
            }
        },
    ]
    for n in data:
        actions.append(
            {
                "add": {
                    "path": n,
                    "partitionValues": {PHYS_P: "7"} if with_partition else {},
                    "size": os.path.getsize(os.path.join(path, n)),
                    "modificationTime": 0,
                    "dataChange": True,
                    "stats": stats,
                }
            }
        )
    with open(os.path.join(path, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")


def test_name_mode_reads_logical_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_mapped(spark, path)
    df = DeltaLog(spark, path).snapshot().to_df()
    assert df.columns == ["k", "s"]
    assert sorted(map(tuple, df.collect())) == [(1, "a"), (2, "b")]


def test_name_mode_partition_values(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_mapped(spark, path, with_partition=True)
    df = DeltaLog(spark, path).snapshot().to_df()
    assert df.columns == ["k", "s", "p"]
    assert sorted(map(tuple, df.collect())) == [(1, "a", 7), (2, "b", 7)]


def test_name_mode_stats_resolve_logical(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_mapped(spark, path)
    adds = DeltaLog(spark, path).snapshot().add_actions().collect()
    st = adds[0]["stats"]
    assert st["minValues"]["k"] == 1 and st["maxValues"]["s"] == "b"
    assert adds[0]["num_records"] == 2


def test_id_mode_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_mapped(spark, path, mode="id")
    with pytest.raises(UnsupportedTableFeatureError, match="id"):
        DeltaLog(spark, path).snapshot().to_df()


def test_write_to_mapped_table_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_mapped(spark, path)
    df = spark.createDataFrame([(3, "c")], "k BIGINT, s STRING")
    with pytest.raises(NotImplementedError, match="column-mapped"):
        write_delta(df, path, mode="append", checkpoint_interval=None)
