"""WebP lossless / VP8L (levi_spark.operators.webp): round-trip laws
across transforms, cache, and alpha; palette bundling widths; a
hand-assembled bitstream pinning simple-code and zero-bit-code
semantics independent of our encoder; a hand-assembled META-Huffman
stream; 2D distance map sanity; container pins; strict refusals."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from levi_spark.operators.webp import (
    _DIST_MAP,
    _BitWriter,
    _encode_spatial,
    decode_webp,
    encode_webp,
)


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def _rgba(img):
    if img.shape[2] == 4:
        return img
    a = np.full(img.shape[:2] + (1,), 255, np.uint8)
    return np.concatenate([img, a], axis=2)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 9999),
    alpha=st.booleans(),
    sg=st.booleans(),
    cache=st.sampled_from([0, 3, 7]),
)
def test_round_trip_law(h, w, seed, alpha, sg, cache):
    img = _rand((h, w, 4 if alpha else 3), seed)
    img[: min(2, h)] = img[0, 0]  # runs -> LZ77 exercised
    out = decode_webp(
        encode_webp(img, subtract_green=sg, cache_bits=cache)
    )
    assert np.array_equal(out, _rgba(img))


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(2, 20),
    w=st.integers(2, 20),
    seed=st.integers(0, 9999),
    mode=st.integers(0, 13),
)
def test_predictor_round_trip_law(h, w, seed, mode):
    """All 14 predictor modes survive encode->decode (the encoder's
    forward pass and the decoder's inverse must agree on edge rules,
    including the rightmost column's wrap-around top-right)."""
    img = _rand((h, w, 3), seed)
    out = decode_webp(encode_webp(img, predictor=mode))
    assert np.array_equal(out, _rgba(img))


@pytest.mark.parametrize("n_colors", [2, 3, 4, 9, 16, 17, 200])
def test_palette_bundling_widths(n_colors):
    """Color indexing across every bundling width: <=2 colors pack 8
    pixels/byte, <=4 pack 4, <=16 pack 2, else 1 (no bundling)."""
    rng = np.random.default_rng(n_colors)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, (13, 11))
    img = pal[idx]
    out = decode_webp(encode_webp(img, palette=True))
    assert np.array_equal(out, _rgba(img))


def test_header_and_container_pins():
    """Container/bitstream layout against the spec: RIFF sizes, VP8L
    tag, 0x2F signature, and the 28 header bits of a 1x1 opaque image
    (w-1 = 0 in 14 bits, h-1 = 0 in 14 bits, alpha 0, version 0)."""
    buf = encode_webp(np.zeros((1, 1, 3), np.uint8))
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WEBP"
    assert buf[12:16] == b"VP8L"
    (riff_len,) = struct.unpack_from("<I", buf, 4)
    assert riff_len == len(buf) - 8
    assert buf[20] == 0x2F
    assert buf[21] == 0 and buf[22] == 0 and (buf[23] & 0x0F) == 0


def test_hand_assembled_simple_codes_decode():
    """Bit-level pin independent of our encoder: a 2x1 image written
    by hand with SIMPLE Huffman codes. Green code carries two symbols
    (so 1 bit per pixel); red/blue/alpha/distance are single-symbol
    codes, which by the degenerate-code rule consume ZERO bits."""
    bw = _BitWriter()
    bw.bits(1, 14)  # width - 1
    bw.bits(0, 14)  # height - 1
    bw.bit(0)  # alpha hint
    bw.bits(0, 3)  # version
    bw.bit(0)  # no transforms
    bw.bit(0)  # no color cache
    bw.bit(0)  # no meta huffman

    def simple(symbols):
        bw.bit(1)  # simple code
        bw.bit(len(symbols) - 1)
        if symbols[0] <= 1:
            bw.bit(0)
            bw.bit(symbols[0])
        else:
            bw.bit(1)
            bw.bits(symbols[0], 8)
        if len(symbols) == 2:
            bw.bits(symbols[1], 8)

    simple([10, 200])  # green: symbols 10 and 200
    simple([7])  # red
    simple([9])  # blue
    simple([255])  # alpha
    simple([0])  # distance
    bw.bit(0)  # pixel 0 green -> smaller symbol (10); r/b/a zero bits
    bw.bit(1)  # pixel 1 green -> 200
    body = b"\x2f" + bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    out = decode_webp(payload)
    assert out.shape == (1, 2, 4)
    assert out[0, 0].tolist() == [7, 10, 9, 255]  # RGBA
    assert out[0, 1].tolist() == [7, 200, 9, 255]


def test_hand_assembled_meta_huffman():
    """META-Huffman: an 8x4 image with 4-pixel tiles (huffman_bits=2)
    whose entropy image selects group 0 for the left tile column and
    group 1 for the right; each group is a fixed color via degenerate
    codes, so the decoded image must be split-color."""
    bw = _BitWriter()
    bw.bits(7, 14)
    bw.bits(3, 14)
    bw.bit(0)
    bw.bits(0, 3)
    bw.bit(0)  # no transforms
    bw.bit(0)  # no color cache
    bw.bit(1)  # meta huffman present
    bw.bits(0, 3)  # huffman_bits = 2 -> 4px tiles; entropy image 2x1
    # entropy image: pixels (a,r,g,b) = (_, 0, 0, _) and (_, 0, 1, _)
    _encode_spatial(bw, [(255, 0, 0, 0), (255, 0, 1, 0)], 2, 1, False)

    def simple(symbols):
        bw.bit(1)
        bw.bit(len(symbols) - 1)
        if symbols[0] <= 1:
            bw.bit(0)
            bw.bit(symbols[0])
        else:
            bw.bit(1)
            bw.bits(symbols[0], 8)
        if len(symbols) == 2:
            bw.bits(symbols[1], 8)

    for g, r, b in ((20, 30, 40), (120, 130, 140)):  # two groups
        simple([g])
        simple([r])
        simple([b])
        simple([255])
        simple([0])
    # every pixel decodes with zero bits from its tile's group
    body = b"\x2f" + bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    out = decode_webp(payload)
    assert out.shape == (4, 8, 4)
    assert (out[:, :4] == [30, 20, 40, 255]).all()
    assert (out[:, 4:] == [130, 120, 140, 255]).all()


def test_dist_map_is_the_spec_table():
    assert len(_DIST_MAP) == 120
    assert _DIST_MAP[0] == (0, 1) and _DIST_MAP[1] == (1, 0)
    assert _DIST_MAP[-1] == (8, 7)
    # all within the spec neighborhood
    assert all(-8 <= dx <= 8 and 0 <= dy <= 7 for dx, dy in _DIST_MAP)


def test_copy_above_uses_2d_code_and_shrinks():
    """An image whose rows repeat must compress via the copy-above
    reference (2D distance code 1) far below literal cost."""
    row = _rand((1, 64, 3), 5)
    img = np.repeat(row, 32, axis=0)
    buf = encode_webp(img)
    assert len(buf) < 64 * 32  # 6144 raw bytes -> way below 1 byte/px
    assert np.array_equal(decode_webp(buf), _rgba(img))


def test_strict_refusals():
    with pytest.raises(ValueError, match="not a WebP"):
        decode_webp(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40)
    good = encode_webp(_rand((8, 8, 3), 3))
    lossy = bytearray(good)
    lossy[12:16] = b"VP8 "
    with pytest.raises(NotImplementedError, match="VP8L"):
        decode_webp(bytes(lossy))
    with pytest.raises(ValueError, match="truncated"):
        decode_webp(good[:-4])
    bad_sig = bytearray(good)
    bad_sig[20] = 0x2E
    with pytest.raises(ValueError, match="signature"):
        decode_webp(bytes(bad_sig))
    with pytest.raises(ValueError, match="outside 14-bit"):
        encode_webp(np.zeros((1, 0, 3), np.uint8))
    with pytest.raises(ValueError, match="palette combines"):
        encode_webp(
            np.zeros((2, 2, 3), np.uint8), palette=True, subtract_green=True
        )


def test_truncated_bitstream_raises_overrun():
    buf = bytearray(encode_webp(_rand((16, 16, 3), 9)))
    (clen,) = struct.unpack_from("<I", bytes(buf), 16)
    struct.pack_into("<I", buf, 16, clen - 6)
    del buf[-10:]
    struct.pack_into("<I", buf, 4, len(buf) - 8)
    with pytest.raises(ValueError, match="overrun|truncated|mismatch"):
        decode_webp(bytes(buf))


@settings(max_examples=15, deadline=None)
@given(h=st.integers(2, 20), w=st.integers(2, 20), seed=st.integers(0, 9999),
       g2r=st.integers(0, 255), g2b=st.integers(0, 255),
       r2b=st.integers(0, 255))
def test_color_transform_round_trip_law(h, w, seed, g2r, g2b, r2b):
    """Transform 1 (cross-channel color transform) with arbitrary
    3.5-fixed multipliers: forward-encode then inverse-decode must be
    identity — and the element packing is channel-sensitive
    (green_to_red lives in the BLUE byte of the transform image)."""
    img = _rand((h, w, 3), seed)
    out = decode_webp(encode_webp(img, color_transform=(g2r, g2b, r2b)))
    assert np.array_equal(out, _rgba(img))


def test_color_transform_composes_with_subtract_green_and_cache():
    img = _rand((16, 16, 4), 11)
    buf = encode_webp(img, color_transform=(34, 200, 129),
                      subtract_green=True, cache_bits=5)
    assert np.array_equal(decode_webp(buf), img)


def test_color_transform_actually_changes_the_wire():
    """Guard against a no-op forward pass: with nonzero multipliers
    the coded residuals differ from the plain stream."""
    img = _rand((12, 12, 3), 13)
    assert encode_webp(img, color_transform=(128, 64, 32)) != encode_webp(img)
