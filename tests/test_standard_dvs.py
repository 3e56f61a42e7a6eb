"""Standard Delta deletion vectors (roaring-bitmap 'u'/'p'/'i'
descriptors, levi_spark.delta.roaring): codec round trips over every
container kind, DV-file framing with CRC, and end-to-end reads of a
foreign-style table whose log uses minReaderVersion 3 +
readerFeatures=[deletionVectors] — plus clone portability of standard
DVs."""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from levi_spark.delta.clone import clone_table
from levi_spark.delta.log import DeltaLog
from levi_spark.delta.roaring import (
    decode_descriptor,
    decode_rbm_array,
    dv_file_path,
    encode_rbm_array,
    read_dv_blob,
    write_dv_file,
    z85_decode,
    z85_encode,
)


# ---- codec laws ------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(st.integers(0, 2**33), max_size=300),
    force_run=st.booleans(),
)
def test_rbm_array_round_trip(vals, force_run):
    got = decode_rbm_array(encode_rbm_array(vals, force_run=force_run))
    assert got.tolist() == sorted(set(vals))


def test_rbm_bitmap_container():
    """>4096 values in one 16-bit chunk forces the 8 KiB bitset form."""
    vals = list(range(0, 13000, 2))
    assert decode_rbm_array(encode_rbm_array(vals)).tolist() == vals


def test_z85_uuid_round_trip():
    u = uuid.uuid4()
    enc = z85_encode(u.bytes)
    assert len(enc) == 20 and z85_decode(enc) == u.bytes
    with pytest.raises(ValueError, match="z85"):
        z85_decode("abc")  # not 5-aligned


def test_dv_file_framing_and_crc():
    blob = encode_rbm_array([3, 1, 4, 1, 5])
    data, offs = write_dv_file([b"other", blob])
    assert data[0] == 1  # format version
    assert read_dv_blob(data, offs[1], len(blob)) == blob
    corrupt = bytearray(data)
    corrupt[offs[1] + 5] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        read_dv_blob(bytes(corrupt), offs[1], len(blob))
    with pytest.raises(ValueError, match="size mismatch"):
        read_dv_blob(data, offs[1], len(blob) + 1)


def test_inline_descriptor_with_padding(tmp_path):
    blob = encode_rbm_array([0, 2, 9])
    padded = blob + b"\x00" * ((-len(blob)) % 4)
    desc = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(padded),
        "offset": None,
        "sizeInBytes": len(blob),
        "cardinality": 3,
    }
    assert decode_descriptor(str(tmp_path), desc).tolist() == [0, 2, 9]


def test_cardinality_mismatch_detected(tmp_path):
    blob = encode_rbm_array([1, 2])
    padded = blob + b"\x00" * ((-len(blob)) % 4)
    desc = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(padded),
        "sizeInBytes": len(blob),
        "cardinality": 5,
    }
    with pytest.raises(ValueError, match="cardinality"):
        decode_descriptor(str(tmp_path), desc)


# ---- foreign-table end-to-end ---------------------------------------------

def _mk_standard_dv_table(spark, path, deleted_rows, storage="u"):
    """A foreign-style Delta table: one parquet data file of ids 0..19,
    a standard roaring DV deleting ``deleted_rows`` (by row index), log
    protocol minReaderVersion 3 + readerFeatures=[deletionVectors]."""
    os.makedirs(os.path.join(path, "_delta_log"))
    spark.range(20).select("id").coalesce(1).write.mode("append").parquet(path)
    data = [n for n in os.listdir(path) if n.endswith(".parquet")]
    assert len(data) == 1
    blob = encode_rbm_array(deleted_rows)
    if storage == "u":
        u = uuid.uuid4()
        file_bytes, offs = write_dv_file([blob])
        pod = "ab/" + z85_encode(u.bytes)
        dv_abs = dv_file_path(path, pod)
        os.makedirs(os.path.dirname(dv_abs), exist_ok=True)
        with open(dv_abs, "wb") as f:
            f.write(file_bytes)
        dv = {
            "storageType": "u",
            "pathOrInlineDv": pod,
            "offset": offs[0],
            "sizeInBytes": len(blob),
            "cardinality": len(deleted_rows),
        }
    else:  # inline
        padded = blob + b"\x00" * ((-len(blob)) % 4)
        dv = {
            "storageType": "i",
            "pathOrInlineDv": z85_encode(padded),
            "sizeInBytes": len(blob),
            "cardinality": len(deleted_rows),
        }
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}}
            ],
        }
    )
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        },
        {
            "metaData": {
                "id": "t-dv",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema,
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 0,
            }
        },
        {
            "add": {
                "path": data[0],
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(path, data[0])),
                "modificationTime": 0,
                "dataChange": True,
                "stats": json.dumps({"numRecords": 20}),
                "deletionVector": dv,
            }
        },
    ]
    with open(os.path.join(path, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")


def test_read_foreign_table_with_uuid_dv(spark, tmp_path):
    path = str(tmp_path / "t")
    deleted = [0, 3, 7, 19]
    _mk_standard_dv_table(spark, path, deleted, storage="u")
    got = sorted(r.id for r in DeltaLog(spark, path).snapshot().to_df().collect())
    assert got == [i for i in range(20) if i not in deleted]


def test_read_foreign_table_with_inline_dv(spark, tmp_path):
    path = str(tmp_path / "t")
    deleted = list(range(0, 20, 2))
    _mk_standard_dv_table(spark, path, deleted, storage="i")
    got = sorted(r.id for r in DeltaLog(spark, path).snapshot().to_df().collect())
    assert got == list(range(1, 20, 2))


def test_shallow_clone_of_uuid_dv_table(spark, tmp_path):
    """'u' descriptors are rewritten to absolute 'p' references into the
    source, so the clone keeps masking deleted rows."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    deleted = [1, 2, 3]
    _mk_standard_dv_table(spark, src, deleted, storage="u")
    clone_table(spark, src, dst, shallow=True)
    live = DeltaLog(spark, dst).snapshot().live_adds_collected()
    (dv,) = [r["add"]["deletionVector"] for r in live]
    assert dv["storageType"] == "p" and os.path.isabs(dv["pathOrInlineDv"])
    got = sorted(r.id for r in DeltaLog(spark, dst).snapshot().to_df().collect())
    assert got == [i for i in range(20) if i not in deleted]


def test_deep_clone_of_uuid_dv_table_is_self_contained(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    deleted = [5, 6]
    _mk_standard_dv_table(spark, src, deleted, storage="u")
    clone_table(spark, src, dst, shallow=False)
    # descriptor verbatim 'u', DV file copied under the same rel name
    live = DeltaLog(spark, dst).snapshot().live_adds_collected()
    (dv,) = [r["add"]["deletionVector"] for r in live]
    assert dv["storageType"] == "u"
    assert os.path.exists(dv_file_path(dst, dv["pathOrInlineDv"]))
    got = sorted(r.id for r in DeltaLog(spark, dst).snapshot().to_df().collect())
    assert got == [i for i in range(20) if i not in deleted]
