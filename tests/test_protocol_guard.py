"""Read-side Delta protocol enforcement: tables whose protocol demands
reader capabilities this engine lacks must be REFUSED, not misread.
(The public Delta protocol spec defines minReaderVersion 3 +
readerFeatures; standard roaring-bitmap deletion vectors and v2
checkpoints are not implemented here, so a table declaring them would
silently return deleted rows / miss log entries if we kept reading.)
"""

import json
import os

import pytest

from levi_spark.delta.log import DeltaLog, UnsupportedTableFeatureError
from levi_spark.delta.writer import write_delta


def _mk_table(spark, path):
    write_delta(
        spark.range(5).withColumnRenamed("id", "k"),
        path,
        mode="error",
        checkpoint_interval=None,
    )


def _append_protocol_commit(path, protocol):
    log_dir = os.path.join(path, "_delta_log")
    versions = [
        int(f[:20]) for f in os.listdir(log_dir) if f.endswith(".json")
    ]
    v = max(versions) + 1
    with open(os.path.join(log_dir, f"{v:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": protocol}) + "\n")


def test_v1_reads_fine(spark, tmp_path):
    path = str(tmp_path / "t1")
    _mk_table(spark, path)
    assert DeltaLog(spark, path).snapshot().to_df().count() == 5


def test_reader_v3_unsupported_feature_refused(spark, tmp_path):
    path = str(tmp_path / "t2")
    _mk_table(spark, path)
    _append_protocol_commit(
        path,
        {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            # deletionVectors/v2Checkpoint/typeWidening/variantType
            # became supported in round 5; collations-preview is a real
            # Delta reader feature this engine does not implement
            "readerFeatures": ["collations-preview"],
            "writerFeatures": ["collations-preview"],
        },
    )
    with pytest.raises(UnsupportedTableFeatureError, match="collations"):
        DeltaLog(spark, path).snapshot().to_df()


def test_reader_v3_supported_features_ok(spark, tmp_path):
    path = str(tmp_path / "t3")
    _mk_table(spark, path)
    _append_protocol_commit(
        path,
        {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["timestampNtz", "vacuumProtocolCheck"],
            "writerFeatures": ["timestampNtz"],
        },
    )
    assert DeltaLog(spark, path).snapshot().to_df().count() == 5


def test_reader_v2_without_mapping_ok(spark, tmp_path):
    path = str(tmp_path / "t4")
    _mk_table(spark, path)
    _append_protocol_commit(
        path, {"minReaderVersion": 2, "minWriterVersion": 5}
    )
    assert DeltaLog(spark, path).snapshot().to_df().count() == 5


def test_future_reader_version_refused(spark, tmp_path):
    path = str(tmp_path / "t5")
    _mk_table(spark, path)
    _append_protocol_commit(path, {"minReaderVersion": 9, "minWriterVersion": 9})
    with pytest.raises(UnsupportedTableFeatureError, match="minReaderVersion 9"):
        DeltaLog(spark, path).snapshot().to_df()
