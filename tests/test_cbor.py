"""CBOR codec (levi_spark.operators.cbor): RFC 8949 Appendix A
example vectors pinned byte-for-byte, deterministic-encoding laws,
round trips over nested values, indefinite-length decode, and strict
refusals (tags, float16, reserved info, stray breaks)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from levi_spark.operators.cbor import decode_cbor, encode_cbor

# RFC 8949 Appendix A examples (the spec's own test vectors)
RFC_VECTORS = [
    (0, "00"),
    (1, "01"),
    (10, "0a"),
    (23, "17"),
    (24, "1818"),
    (25, "1819"),
    (100, "1864"),
    (1000, "1903e8"),
    (1000000, "1a000f4240"),
    (1000000000000, "1b000000e8d4a51000"),
    (18446744073709551615, "1bffffffffffffffff"),
    (-1, "20"),
    (-10, "29"),
    (-100, "3863"),
    (-1000, "3903e7"),
    (False, "f4"),
    (True, "f5"),
    (None, "f6"),
    (1.1, "fb3ff199999999999a"),
    (-4.1, "fbc010666666666666"),
    (b"", "40"),
    (b"\x01\x02\x03\x04", "4401020304"),
    ("", "60"),
    ("a", "6161"),
    ("IETF", "6449455446"),
    ("ü", "62c3bc"),
    ("水", "63e6b0b4"),
    ([], "80"),
    ([1, 2, 3], "83010203"),
    ([1, [2, 3], [4, 5]], "8301820203820405"),
    (list(range(1, 26)),
     "98190102030405060708090a0b0c0d0e0f101112131415161718181819"),
    ({}, "a0"),
    ({1: 2, 3: 4}, "a201020304"),
    ({"a": 1, "b": [2, 3]}, "a26161016162820203"),
    ({"a": "A", "b": "B", "c": "C", "d": "D", "e": "E"},
     "a56161614161626142616361436164614461656145"),
]


@pytest.mark.parametrize("value,hexpect", RFC_VECTORS)
def test_rfc8949_appendix_a_vectors(value, hexpect):
    assert encode_cbor(value).hex() == hexpect
    assert decode_cbor(bytes.fromhex(hexpect)) == value


JSONISH = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(-(2**63), 2**64 - 1)
    | st.text(max_size=12)
    | st.binary(max_size=12),
    lambda c: st.lists(c, max_size=5)
    | st.dictionaries(st.text(max_size=6), c, max_size=5),
    max_leaves=20,
)


@settings(max_examples=60, deadline=None)
@given(v=JSONISH)
def test_round_trip_law(v):
    assert decode_cbor(encode_cbor(v)) == v


def test_shortest_form_is_enforced():
    """Deterministic encoding: 24 must use the 1-byte argument form,
    never the immediate... inverse: 23 stays immediate."""
    assert encode_cbor(23) == b"\x17"
    assert encode_cbor(24) == b"\x18\x18"
    assert encode_cbor(255) == b"\x18\xff"
    assert encode_cbor(256) == b"\x19\x01\x00"


def test_indefinite_length_decode():
    """RFC 8949 Appendix A indefinite examples: streamed string
    chunks, arrays, and maps terminate on 0xff."""
    assert decode_cbor(bytes.fromhex("5f42010243030405ff")) == (
        b"\x01\x02\x03\x04\x05"
    )
    assert decode_cbor(bytes.fromhex("7f657374726561646d696e67ff")) == (
        "streaming"
    )
    assert decode_cbor(bytes.fromhex("9f018202039f0405ffff")) == [
        1, [2, 3], [4, 5],
    ]
    assert decode_cbor(bytes.fromhex("bf61610161629f0203ffff")) == {
        "a": 1, "b": [2, 3],
    }


def test_float32_decodes():
    assert decode_cbor(bytes.fromhex("fa47c35000")) == 100000.0


def test_strict_refusals():
    with pytest.raises(NotImplementedError, match="tag"):
        decode_cbor(bytes.fromhex("c074323031332d30332d32315432303a30343a30305a"))
    with pytest.raises(NotImplementedError, match="float16"):
        decode_cbor(bytes.fromhex("f90001"))
    with pytest.raises(ValueError, match="reserved additional info"):
        decode_cbor(bytes.fromhex("1c"))
    with pytest.raises(ValueError, match="break"):
        decode_cbor(bytes.fromhex("ff"))
    with pytest.raises(ValueError, match="truncated"):
        decode_cbor(bytes.fromhex("1903"))
    with pytest.raises(ValueError, match="after CBOR item"):
        decode_cbor(bytes.fromhex("0000"))
    with pytest.raises(ValueError, match="wrong kind"):
        decode_cbor(bytes.fromhex("5f6161ff"))  # text chunk in byte stream
    with pytest.raises(ValueError, match="cannot encode"):
        encode_cbor({1, 2})
