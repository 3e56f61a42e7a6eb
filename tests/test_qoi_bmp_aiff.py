"""Round-8 codec trio (QOI / BMP / AIFF): round-trip laws across the
supported profiles, spec-pinning checks against externally-known
encodings, and strict refusals."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from levi_spark.operators.aiff import decode_aiff, encode_aiff
from levi_spark.operators.bmp import decode_bmp, encode_bmp
from levi_spark.operators.qoi import decode_qoi, encode_qoi


# ---------------------------------------------------------------- QOI


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ch=st.sampled_from([3, 4]),
    structure=st.sampled_from(["noise", "flat", "gradient", "mixed"]),
    seed=st.integers(0, 10_000),
)
def test_qoi_round_trip_law(h, w, ch, structure, seed):
    rng = np.random.default_rng(seed)
    if structure == "noise":
        img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    elif structure == "flat":
        img = np.full((h, w, ch), rng.integers(0, 256), np.uint8)
    elif structure == "gradient":
        g = (np.arange(h * w).reshape(h, w) % 256).astype(np.uint8)
        img = np.stack([(g + 7 * k) % 256 for k in range(ch)], axis=2)
    else:
        img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        img[: h // 2] = img[0, 0]  # runs
    out, cs = decode_qoi(encode_qoi(img, colorspace=seed % 2))
    assert cs == seed % 2
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_qoi_known_bytes():
    """Spec pins. (a) Wraparound: (255,0,0) from the implicit
    (0,0,0,255) start is dr = -1 under the spec's mod-256 deltas, so
    the reference encoder emits QOI_OP_DIFF 0x5A (01 01 10 10), NOT a
    literal — and so must ours. (b) A pixel beyond DIFF/LUMA reach
    (dg = 50 > 31) must emit the 0xFE RGB literal. (c) Repeats fold
    into one RUN byte."""
    red = np.array([[[255, 0, 0]]], np.uint8)
    assert encode_qoi(red) == (
        b"qoif" + (1).to_bytes(4, "big") * 2 + bytes([3, 0])
        + bytes([0x5A]) + b"\x00" * 7 + b"\x01"
    )
    img = np.array([[[200, 50, 10]]], np.uint8)
    e = encode_qoi(img)
    assert e == (
        b"qoif" + (1).to_bytes(4, "big") * 2 + bytes([3, 0])
        + bytes([0xFE, 200, 50, 10]) + b"\x00" * 7 + b"\x01"
    )
    # a same-pixel repeat becomes one RUN byte
    img2 = np.tile(img, (1, 3, 1))
    e2 = encode_qoi(img2)
    assert e2[14:18] == bytes([0xFE, 200, 50, 10])
    assert e2[18] == 0xC0 | 1  # run of 2
    out, _ = decode_qoi(e2)
    assert np.array_equal(out, img2)


def test_qoi_refusals():
    img = np.zeros((2, 2, 3), np.uint8)
    e = encode_qoi(img)
    with pytest.raises(ValueError, match="not QOI"):
        decode_qoi(b"qoix" + e[4:])
    with pytest.raises(ValueError, match="end marker|exhausted"):
        decode_qoi(e[:-1])
    with pytest.raises(ValueError, match="after QOI end marker"):
        decode_qoi(e + b"x")
    with pytest.raises(ValueError):
        encode_qoi(np.zeros((2, 2), np.uint8))  # needs 3|4 channels


# ---------------------------------------------------------------- BMP


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    top_down=st.booleans(),
    seed=st.integers(0, 10_000),
)
def test_bmp24_round_trip_law(h, w, top_down, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img, top_down=top_down)), img)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    ncol=st.integers(1, 256),
    rle=st.booleans(),
    runs=st.booleans(),
    seed=st.integers(0, 10_000),
)
def test_bmp8_round_trip_law(h, w, ncol, rle, runs, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    idx = rng.integers(0, ncol, (h, w)).astype(np.uint8)
    if runs and h > 2:
        idx[: h // 2] = idx[0, 0]
    out = decode_bmp(encode_bmp(idx, palette=pal, rle=rle))
    assert np.array_equal(out, pal[idx])


def test_bmp_layout_bytes_differ_but_decode_equal():
    """Bottom-up vs top-down files differ on disk (row order + height
    sign) yet must decode to the same top-down array."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    up, down = encode_bmp(img), encode_bmp(img, top_down=True)
    assert up != down
    assert np.array_equal(decode_bmp(up), decode_bmp(down))
    # height field: positive vs negative
    import struct

    assert struct.unpack_from("<i", up, 22)[0] == 5
    assert struct.unpack_from("<i", down, 22)[0] == -5


def test_bmp_refusals():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    e = encode_bmp(img)
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + e[2:])
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(e[:-3])
    with pytest.raises(ValueError, match="palette"):
        encode_bmp(np.zeros((2, 2), np.uint8))
    with pytest.raises(ValueError, match="beyond palette"):
        encode_bmp(
            np.full((2, 2), 5, np.uint8),
            palette=np.zeros((3, 3), np.uint8),
        )
    # RLE8 delta escape is refused, not silently skipped
    pal = np.zeros((4, 3), np.uint8)
    r = encode_bmp(np.zeros((2, 2), np.uint8), palette=pal, rle=True)
    import struct

    off = struct.unpack_from("<I", r, 10)[0]
    bad = r[:off] + bytes([0, 2, 1, 1]) + r[off:]
    with pytest.raises(NotImplementedError, match="delta"):
        decode_bmp(bad)


# --------------------------------------------------------------- AIFF


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 400),
    stereo=st.booleans(),
    rate=st.sampled_from([8000, 11025, 16000, 22050, 44100, 48000, 96001]),
    seed=st.integers(0, 10_000),
)
def test_aiff_round_trip_law(n, stereo, rate, seed):
    rng = np.random.default_rng(seed)
    shape = (n, 2) if stereo else (n,)
    s = rng.integers(-32768, 32768, shape).astype(np.int16)
    d = decode_aiff(encode_aiff(s, rate))
    assert d["sample_rate"] == rate
    assert d["channels"] == (2 if stereo else 1)
    assert d["n_frames"] == n
    assert np.array_equal(d["samples"], s)


def test_aiff_f80_canonical_encodings():
    """The COMM sample rate is a REAL 80-bit IEEE extended float:
    44100 must serialize to the canonical 40 0E AC 44 00... bytes
    every AIFF reference documents, and 48000 to 40 0E BB 80 00..."""
    from levi_spark.operators.aiff import _f80_to_rate, _rate_to_f80

    assert _rate_to_f80(44100).hex() == "400eac44000000000000"
    assert _rate_to_f80(48000).hex() == "400ebb80000000000000"
    assert _rate_to_f80(8000).hex() == "400bfa00000000000000"
    for r in (1, 2, 3, 8000, 11025, 44100, 2**40 + 12345):
        assert _f80_to_rate(_rate_to_f80(r)) == r
    with pytest.raises(ValueError, match="non-integral"):
        _f80_to_rate(bytes.fromhex("400eac44000000000001"))
    with pytest.raises(ValueError, match="negative"):
        _f80_to_rate(bytes.fromhex("c00eac44000000000000"))


def test_aiff_samples_are_big_endian_on_disk():
    s = np.array([0x0102, -0x0102], np.int16)
    e = encode_aiff(s, 8000)
    at = e.index(b"SSND") + 8 + 8  # chunk header + offset/blockSize
    assert e[at : at + 2] == b"\x01\x02"  # big-endian 0x0102
    d = decode_aiff(e)
    assert np.array_equal(d["samples"], s)


def test_aiff_refusals():
    e = encode_aiff(np.arange(10, dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="not IFF"):
        decode_aiff(b"RIFF" + e[4:])
    with pytest.raises(ValueError, match="is not AIFF"):
        decode_aiff(e[:8] + b"AIFC" + e[12:])
    with pytest.raises(ValueError, match="overruns|truncated|< "):
        decode_aiff(e[:-4])
    # unknown chunks are skipped by size
    extra = e[:12] + b"NAME" + (4).to_bytes(4, "big") + b"test" + e[12:]
    fixed = b"FORM" + (len(extra) - 8).to_bytes(4, "big") + extra[8:]
    d = decode_aiff(fixed)
    assert d["n_frames"] == 10


# ---------------------------------------------------------------- TGA


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    kind=st.sampled_from(["gray", "rgb", "rgba"]),
    rle=st.booleans(),
    top_down=st.booleans(),
    runs=st.booleans(),
    seed=st.integers(0, 10_000),
)
def test_tga_round_trip_law(h, w, kind, rle, top_down, runs, seed):
    from levi_spark.operators.tga import decode_tga, encode_tga

    rng = np.random.default_rng(seed)
    shape = {"gray": (h, w), "rgb": (h, w, 3), "rgba": (h, w, 4)}[kind]
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    if runs and h > 2:
        img[: h // 2] = img[0, 0]
    if kind == "gray" and rle:
        rle = False  # grayscale RLE not written
    out = decode_tga(encode_tga(img, rle=rle, top_down=top_down))
    assert np.array_equal(out, img)


def test_tga_bgr_and_row_order_on_disk():
    """The bytes really are BGR bottom-up: a 1x2 RGB image's first
    stored pixel is the LAST row's first pixel, blue first."""
    from levi_spark.operators.tga import decode_tga, encode_tga

    img = np.array([[[1, 2, 3], [4, 5, 6]]], np.uint8)  # one row
    e = encode_tga(img)
    assert e[18:24] == bytes([3, 2, 1, 6, 5, 4])  # BGR per pixel
    two = np.array([[[1, 2, 3]], [[4, 5, 6]]], np.uint8)  # two rows
    e2 = encode_tga(two)
    assert e2[18:21] == bytes([6, 5, 4])  # bottom row stored first
    e2td = encode_tga(two, top_down=True)
    assert e2td[18:21] == bytes([3, 2, 1])
    assert e2td[17] & 0x20  # descriptor bit 5
    assert np.array_equal(decode_tga(e2), decode_tga(e2td))


def test_tga_refusals():
    from levi_spark.operators.tga import decode_tga, encode_tga

    img = np.zeros((3, 3, 3), np.uint8)
    e = encode_tga(img)
    with pytest.raises(ValueError, match="truncated"):
        decode_tga(e[:-4])
    with pytest.raises(NotImplementedError, match="color-mapped"):
        decode_tga(e[:2] + bytes([1]) + e[3:])
    with pytest.raises(NotImplementedError, match="right-to-left"):
        decode_tga(e[:17] + bytes([e[17] | 0x10]) + e[18:])
    r = encode_tga(img, rle=True)
    with pytest.raises(ValueError, match="exhausted|truncated"):
        decode_tga(r[:-2])
