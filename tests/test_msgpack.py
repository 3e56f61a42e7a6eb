"""MessagePack codec (levi_spark.operators.msgpack): the format
spec's own encoding examples pinned byte-for-byte, canonical
smallest-representation encoding, deep round-trip laws, and strict
refusals (ext types, 0xc1, truncation, trailing bytes)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from levi_spark.operators.msgpack import decode_msgpack, encode_msgpack


def test_spec_example_bytes():
    pins = [
        (None, b"\xc0"), (True, b"\xc3"), (False, b"\xc2"),
        (0, b"\x00"), (127, b"\x7f"), (-1, b"\xff"), (-32, b"\xe0"),
        (128, b"\xcc\x80"), (255, b"\xcc\xff"), (256, b"\xcd\x01\x00"),
        (-33, b"\xd0\xdf"), (-129, b"\xd1\xff\x7f"),
        (2**16, b"\xce\x00\x01\x00\x00"),
        (2**32, b"\xcf\x00\x00\x00\x01\x00\x00\x00\x00"),
        (-(2**63), b"\xd3\x80" + b"\x00" * 7),
        ("", b"\xa0"), ("abc", b"\xa3abc"), ("a" * 31, b"\xbf" + b"a" * 31),
        ("a" * 32, b"\xd9\x20" + b"a" * 32),
        ([], b"\x90"), ({}, b"\x80"), ([1, 2], b"\x92\x01\x02"),
        ({"a": 1}, b"\x81\xa1a\x01"),
        (b"", b"\xc4\x00"), (b"\x01", b"\xc4\x01\x01"),
        (1.5, b"\xcb\x3f\xf8\x00\x00\x00\x00\x00\x00"),
    ]
    for v, want in pins:
        assert encode_msgpack(v) == want, (v, encode_msgpack(v).hex())
        assert decode_msgpack(want) == v


_SCALARS = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-(2**63), 2**64 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=40),
    st.binary(max_size=40),
)
_VALUES = st.recursive(
    _SCALARS,
    lambda kids: st.one_of(
        st.lists(kids, max_size=5),
        st.dictionaries(st.text(max_size=8), kids, max_size=5),
    ),
    max_leaves=25,
)


@settings(max_examples=60, deadline=None)
@given(v=_VALUES)
def test_round_trip_law(v):
    assert decode_msgpack(encode_msgpack(v)) == v


def test_refusals():
    with pytest.raises(ValueError, match="0xc1"):
        decode_msgpack(b"\xc1")
    with pytest.raises(ValueError, match="unsupported"):
        decode_msgpack(b"\xd4\x01\x00")  # fixext1
    with pytest.raises(ValueError, match="truncated"):
        decode_msgpack(b"\xcd\x01")
    with pytest.raises(ValueError, match="after MessagePack"):
        decode_msgpack(b"\x01\x02")
    with pytest.raises(ValueError, match="exceeds uint64"):
        encode_msgpack(2**64)
    with pytest.raises(ValueError, match="not encodable"):
        encode_msgpack(object())
