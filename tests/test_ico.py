"""ICO container (levi_spark.operators.ico): DIB + PNG entry round
trips, the double-height XOR/AND layout, MSB-first 1-bit mask packing
with 32-bit row padding, directory consistency checks, and strict
refusals."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from levi_spark.operators.ico import decode_ico, encode_ico


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@settings(max_examples=20, deadline=None)
@given(h=st.integers(1, 40), w=st.integers(1, 40), seed=st.integers(0, 9999))
def test_dib_round_trip_law(h, w, seed):
    rgb = _rand((h, w, 3), seed)
    mask = _rand((h, w), seed + 1) % 2
    (e,) = decode_ico(encode_ico([("dib", rgb, mask)]))
    assert e["kind"] == "dib"
    assert np.array_equal(e["pixels"], rgb)
    assert np.array_equal(e["mask"], mask)


@settings(max_examples=10, deadline=None)
@given(h=st.integers(1, 24), w=st.integers(1, 24), seed=st.integers(0, 9999))
def test_png_entry_round_trip_law(h, w, seed):
    rgb = _rand((h, w, 3), seed)
    (e,) = decode_ico(encode_ico([("png", rgb, None)]))
    assert e["kind"] == "png"
    assert np.array_equal(e["pixels"], rgb)
    assert e["mask"] is None


def test_mixed_multi_entry_and_256_encoding():
    """Two entries decode independently; a 256-wide entry's directory
    byte is 0 (the bWidth=0-encodes-256 rule)."""
    big = _rand((4, 256, 3), 7)
    small = _rand((16, 16, 3), 8)
    payload = encode_ico([("dib", big, None), ("png", small, None)])
    assert payload[6] == 0  # bWidth: 256 % 256
    assert payload[7] == 4  # bHeight
    a, b = decode_ico(payload)
    assert np.array_equal(a["pixels"], big)
    assert np.array_equal(b["pixels"], small)


def test_mask_bits_are_msb_first_and_padded():
    """Hand-check the AND plane: a 16x1 mask [1,0,0,...,0,1] packs to
    0x80 0x01 + two pad bytes (mask rows pad to 32 bits), sitting
    after the directory, header, and one padded XOR row."""
    rgb = np.zeros((1, 16, 3), np.uint8)
    mask = np.zeros((1, 16), np.uint8)
    mask[0, 0] = 1
    mask[0, 15] = 1
    payload = encode_ico([("dib", rgb, mask)])
    # 6 dir + 16 entry + 40 header + 48 XOR row (16*3 already 4-aligned)
    mask_off = 6 + 16 + 40 + 48
    assert payload[mask_off : mask_off + 4] == b"\x80\x01\x00\x00"
    (e,) = decode_ico(payload)
    assert np.array_equal(e["mask"], mask)


def test_dib_height_is_doubled_in_header():
    payload = encode_ico([("dib", np.zeros((5, 3, 3), np.uint8), None)])
    (h2,) = struct.unpack_from("<i", payload, 6 + 16 + 8)
    assert h2 == 10


def test_strict_refusals():
    rgb = np.zeros((2, 2, 3), np.uint8)
    with pytest.raises(ValueError, match="at least one"):
        encode_ico([])
    with pytest.raises(ValueError, match="alpha in-stream"):
        encode_ico([("png", rgb, np.zeros((2, 2), np.uint8))])
    with pytest.raises(ValueError, match="kind"):
        encode_ico([("bmp", rgb, None)])
    with pytest.raises(ValueError, match="outside 1..256"):
        encode_ico([("dib", np.zeros((257, 2, 3), np.uint8), None)])
    good = bytearray(encode_ico([("dib", rgb, None)]))
    good[2] = 2  # ICONDIR type: cursor
    with pytest.raises(ValueError, match="not an ICO"):
        decode_ico(bytes(good))
    good[2] = 1
    good[6 + 12] = 0xFF  # entry size low byte -> span out of file
    with pytest.raises(ValueError, match="out of file"):
        decode_ico(bytes(good))
    with pytest.raises(ValueError, match="out of file"):
        decode_ico(encode_ico([("dib", rgb, None)])[:-3])
    with pytest.raises(ValueError, match="directory truncated"):
        decode_ico(encode_ico([("dib", rgb, None)])[:12])


def test_dimension_mismatch_raises():
    payload = bytearray(encode_ico([("dib", np.zeros((4, 4, 3), np.uint8), None)]))
    payload[6] = 5  # directory width lies
    with pytest.raises(ValueError, match="directory says"):
        decode_ico(bytes(payload))
