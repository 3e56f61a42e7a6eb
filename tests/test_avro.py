"""Avro Object Container (levi_spark.operators.avro): the spec's own
zigzag test vectors, container round-trip laws across codecs and
block sizes, union/array/empty edge cases, and framing refusals."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from levi_spark.operators.avro import (
    _read_long,
    _write_long,
    decode_avro,
    encode_avro,
)

SCHEMA = {
    "type": "record",
    "name": "T",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "d", "type": "double"},
        {"name": "f", "type": "float"},
        {"name": "ok", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
        {"name": "a", "type": {"type": "array", "items": "long"}},
        {"name": "o", "type": ["null", "string"]},
    ],
}


def test_zigzag_spec_vectors():
    """The Avro spec documents these exact encodings."""
    for v, want in [
        (0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
        (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01"),
        (-(2**63), b"\xff" * 9 + b"\x01"),
    ]:
        out = bytearray()
        _write_long(out, v)
        assert bytes(out) == want, (v, bytes(out).hex())
        assert _read_long(bytes(out), 0) == (v, len(want))


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(0, 40),
    codec=st.sampled_from(["null", "deflate"]),
    per_block=st.integers(1, 7),
    seed=st.integers(0, 10_000),
)
def test_container_round_trip_law(n, codec, per_block, seed):
    rng = np.random.default_rng(seed)
    recs = []
    for k in range(n):
        recs.append(
            {
                "i": int(rng.integers(-(2**62), 2**62)),
                "s": "x" * int(rng.integers(0, 10)) + "é",
                "d": float(rng.integers(-100, 100)) / 4,
                "f": float(np.float32(rng.integers(-100, 100)) / 8),
                "ok": bool(rng.integers(0, 2)),
                "raw": bytes(rng.integers(0, 256, rng.integers(0, 6),
                                          dtype=np.uint8)),
                "a": [int(x) for x in rng.integers(-50, 50,
                                                   rng.integers(0, 5))],
                "o": None if k % 3 == 0 else f"v{k}",
            }
        )
    blob = encode_avro(SCHEMA, recs, codec=codec, records_per_block=per_block)
    schema, got = decode_avro(blob)
    assert got == recs
    assert schema["fields"][0]["name"] == "i"


def test_union_null_order_variants():
    """Both ["null", T] and [T, "null"] branch numberings decode."""
    for order in (["null", "long"], ["long", "null"]):
        sch = {"type": "record", "name": "U",
               "fields": [{"name": "o", "type": order}]}
        recs = [{"o": None}, {"o": 42}]
        assert decode_avro(encode_avro(sch, recs))[1] == recs


def test_framing_refusals():
    recs = [{"i": 1, "s": "a", "d": 0.5, "f": 0.5, "ok": True,
             "raw": b"z", "a": [1], "o": None}]
    blob = encode_avro(SCHEMA, recs)
    with pytest.raises(ValueError, match="not an Avro"):
        decode_avro(b"Obj\x02" + blob[4:])
    # corrupt the sync marker after the block
    bad = bytearray(blob)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync marker"):
        decode_avro(bytes(bad))
    with pytest.raises(ValueError, match="overruns|truncated"):
        decode_avro(blob[:-10])
    with pytest.raises(NotImplementedError, match="unsupported"):
        encode_avro(
            {"type": "record", "name": "X",
             "fields": [{"name": "m", "type": {"type": "map",
                                               "values": "long"}}]},
            [],
        )
    with pytest.raises(NotImplementedError, match="codec"):
        encode_avro(SCHEMA, recs, codec="snappy")


def test_trailing_garbage_and_partial_block_refuse():
    recs = [{"i": 7, "s": "", "d": 1.0, "f": 2.0, "ok": False,
             "raw": b"", "a": [], "o": "y"}]
    blob = encode_avro(SCHEMA, recs)
    with pytest.raises(ValueError):
        decode_avro(blob + b"JUNKJUNK")
