"""TFRecord + tf.Example (levi_spark.operators.tfrecord): CRC32C
check-value pin, framing laws, wire-format round trips including the
proto edge cases (negative int64 varints, packed vs unpacked lists),
and strict corruption refusals."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from levi_spark.operators.tfrecord import (
    crc32c,
    decode_example,
    decode_tfrecord,
    encode_example,
    encode_tfrecord,
)


def test_crc32c_check_value():
    """The Castagnoli CRC's published check value: CRC32C of the ASCII
    digits '123456789' is 0xE3069283 — pins polynomial, reflection,
    init and xorout all at once."""
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # masked framing round-trips through the container
    assert decode_tfrecord(encode_tfrecord([b""])) == [b""]


@settings(max_examples=30, deadline=None)
@given(
    ints=st.lists(
        st.integers(-(2**63), 2**63 - 1), min_size=0, max_size=8
    ),
    n_bytes=st.lists(st.binary(min_size=0, max_size=30), max_size=4),
    seed=st.integers(0, 10_000),
)
def test_example_round_trip_law(ints, n_bytes, seed):
    rng = np.random.default_rng(seed)
    floats = [
        float(np.float32(x))
        for x in rng.standard_normal(rng.integers(0, 5)).tolist()
    ]
    ex = {}
    if ints:
        ex["i"] = ints
    if floats:
        ex["f"] = floats
    if n_bytes:
        ex["b"] = n_bytes
    got = decode_example(encode_example(ex))
    assert got.get("i", []) == ints if ints else "i" not in got
    if floats:
        assert got["f"] == floats  # float32 exact through packed wire
    if n_bytes:
        assert got["b"] == n_bytes


def test_unpacked_lists_also_decode():
    """proto2-style UNPACKED repeated encodings are legal on the wire;
    the decoder must accept both."""
    from levi_spark.operators.tfrecord import (
        _field,
        _len_field,
        _write_varint,
    )

    # Int64List with two unpacked varint values 7, -1
    il = bytearray()
    for v in (7, -1):
        _field(il, 1, 0)
        _write_varint(il, v)
    fb = bytearray()
    _len_field(fb, 3, bytes(il))
    # FloatList with one unpacked fixed32
    fl = bytearray()
    _field(fl, 1, 5)
    fl.extend(struct.pack("<f", 2.5))
    fb2 = bytearray()
    _len_field(fb2, 2, bytes(fl))
    feats = bytearray()
    for name, f in (("a", fb), ("b", fb2)):
        entry = bytearray()
        _len_field(entry, 1, name.encode())
        _len_field(entry, 2, bytes(f))
        _len_field(feats, 1, bytes(entry))
    ex = bytearray()
    _len_field(ex, 1, bytes(feats))
    got = decode_example(bytes(ex))
    assert got["a"] == [7, -1]
    assert got["b"] == [2.5]


@settings(max_examples=20, deadline=None)
@given(
    recs=st.lists(st.binary(min_size=0, max_size=200), min_size=0, max_size=6)
)
def test_tfrecord_framing_law(recs):
    assert decode_tfrecord(encode_tfrecord(recs)) == recs


def test_corruption_refusals():
    tf = encode_tfrecord([b"hello world", b"x" * 50])
    for at, msg in [(8, "length CRC"), (14, "data CRC"), (12 + 11 + 2, "data CRC")]:
        bad = bytearray(tf)
        bad[at] ^= 0x01
        with pytest.raises(ValueError, match=msg):
            decode_tfrecord(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        decode_tfrecord(tf[:-3])
    with pytest.raises(ValueError, match="truncated"):
        decode_tfrecord(tf[:5])
    with pytest.raises(ValueError, match="varint"):
        decode_example(b"\x08" + b"\xff" * 11)
