"""Baseline JPEG codec (levi_spark.operators.jpeg): flat-block
exactness (the gate's oracle law), bounded-error round trips under
quantization, marker/profile refusals, and the multimodal-plane
integration the `multimodal_jpeg_decode` gate exercises at scale."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from levi_spark.operators.jpeg import (
    DEFAULT_QUANT,
    decode_jpeg,
    encode_jpeg,
    jpeg_image_decoder,
)

Q1 = np.ones(64, dtype=np.int64)


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def test_flat_blocks_round_trip_exactly():
    """A greyscale image of constant 8x8 blocks survives bit-for-bit:
    DC-only blocks, DC quantizer 8 divides 8*(v-128) exactly."""
    vals = _rand((4, 4), 11)
    img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    assert (decode_jpeg(encode_jpeg(img)) == img).all()


def test_gate_oracle_law_mean_from_md5():
    digest = hashlib.md5(b"doc text").digest()
    img = np.kron(
        np.frombuffer(digest, np.uint8).reshape(4, 4),
        np.ones((8, 8), dtype=np.uint8),
    )
    d = jpeg_image_decoder(encode_jpeg(img))
    assert (d["width"], d["height"]) == (32, 32)
    assert d["mean_pixel"] == sum(digest) / 16.0


def _harmonic_image(digest: bytes) -> np.ndarray:
    """The round-6 gate raster: per digest byte b, an 8x8 block at mean
    m = 16 + b*7//8 plus the u=4 horizontal harmonic at even amplitude
    a = 2*(b%8+1) — exactly one nonzero AC coefficient per block."""
    from levi_spark.queries import JPEG_H4

    b = np.frombuffer(digest, np.uint8).astype(np.int64)
    m = (16 + b * 7 // 8).reshape(4, 4)
    a = (2 * (b % 8 + 1)).reshape(4, 4)
    base = np.kron(m, np.ones((8, 8), dtype=np.int64))
    wave = np.kron(a, np.ones((8, 8), dtype=np.int64)) * np.tile(
        np.array(JPEG_H4, dtype=np.int64), (32, 4)
    )
    return (base + wave).astype(np.uint8)


@settings(max_examples=30, deadline=None)
@given(m=st.integers(16, 239), a=st.integers(1, 8))
def test_single_ac_harmonic_block_is_analytically_exact(m, a):
    """AC path vs ANALYTIC values (not a self-round-trip): a block
    m + 2a*h4(x) has DCT exactly {DC: 8*(m-128), AC(0,4): 16a}; with
    the default quant table (DC 8, AC 16) both quantize exactly, so
    decode must reproduce the pixels bit-for-bit. A decoder that drops,
    mis-scales, or mis-positions the AC coefficient fails here even if
    its encoder has the matching bug (the expectation is closed-form,
    independent of the codec)."""
    h4 = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int64)
    img = (m + 2 * a * np.tile(h4, (8, 1))).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(img))
    assert (got == img).all()
    # and the quantized stream really carries a nonzero AC coefficient:
    # a flat block at the same mean decodes to a DIFFERENT raster
    flat = np.full((8, 8), m, dtype=np.uint8)
    assert not (decode_jpeg(encode_jpeg(flat)) == img).all()


def test_gate_harmonic_raster_exact_and_mad_law():
    """The full 32x32 gate raster (16 blocks, mixed amplitudes —
    Huffman sizes 2-5 and both DPCM delta signs) survives bit-for-bit,
    and the decoder's mean/mean_abs_dev equal the oracle's closed
    forms over the digest bytes."""
    digest = hashlib.md5(b"ac harmonic doc").digest()
    img = _harmonic_image(digest)
    assert (decode_jpeg(encode_jpeg(img)) == img).all()
    d = jpeg_image_decoder(encode_jpeg(img))
    b = np.frombuffer(digest, np.uint8).astype(np.int64)
    m = 16 + b * 7 // 8
    a = 2 * (b % 8 + 1)
    mu = m.sum() / 16.0
    assert d["mean_pixel"] == mu
    assert d["mean_abs_dev"] == (
        np.abs(m + a - mu) + np.abs(m - a - mu)
    ).sum() / 32.0


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_grayscale_bounded_error_q1(h, w, seed):
    """With an all-ones quant table the only loss is coefficient
    rounding: per-pixel error is bounded by sum of rounding errors
    through the orthonormal IDCT (≤ 4), and shape/crop survive
    non-multiple-of-8 dimensions."""
    a = _rand((h, w), seed)
    d = decode_jpeg(encode_jpeg(a, quant=Q1))
    assert d.shape == a.shape
    assert np.abs(d.astype(int) - a.astype(int)).max() <= 4


def test_rgb_round_trip_bounded():
    a = _rand((17, 23, 3), 7)
    d = decode_jpeg(encode_jpeg(a, quant=Q1))
    assert d.shape == a.shape
    # YCbCr<->RGB float conversion adds ~1 lsb on top of DCT rounding
    assert np.abs(d.astype(int) - a.astype(int)).max() <= 6


def test_default_quant_error_tracks_table():
    a = _rand((32, 32), 3)
    d = decode_jpeg(encode_jpeg(a, quant=DEFAULT_QUANT))
    # AC step 16: error stays far below gross corruption
    assert np.abs(d.astype(int) - a.astype(int)).mean() < 8


def test_refusals():
    a = _rand((8, 8), 1)
    good = encode_jpeg(a)
    with pytest.raises(ValueError, match="no SOI"):
        decode_jpeg(b"\x89PNG\r\n")
    with pytest.raises(ValueError, match="truncated|missing EOI"):
        decode_jpeg(good[:40])
    # doctor SOF0 marker into progressive SOF2
    sof_at = good.find(b"\xff\xc0")
    prog = good[:sof_at] + b"\xff\xc2" + good[sof_at + 2 :]
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(prog)
    # doctor sampling factors to 4:2:0 (0x22) in a color SOF
    c = encode_jpeg(_rand((8, 8, 3), 2))
    sof_at = c.find(b"\xff\xc0")
    comp0_samp = sof_at + 4 + 6 + 1  # marker(2)+len(2)+prec/h/w/nc(6)+id(1)
    sub = c[:comp0_samp] + b"\x22" + c[comp0_samp + 1 :]
    with pytest.raises(ValueError, match="subsampled"):
        decode_jpeg(sub)


def test_byte_stuffing_round_trip():
    """Content engineered to emit 0xFF bytes in the entropy stream must
    survive the stuff/unstuff cycle."""
    for seed in range(6):
        a = _rand((16, 16), 1000 + seed)
        d = decode_jpeg(encode_jpeg(a, quant=Q1))
        assert np.abs(d.astype(int) - a.astype(int)).max() <= 4


def test_multimodal_plane_integration(spark):
    import pandas as pd

    from levi_spark.operators.multimodal import decode_image_features

    imgs = {}
    payloads = []
    for i in range(1, 5):
        vals = _rand((4, 4), i)
        img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
        imgs[i] = img
        payloads.append(encode_jpeg(img))
    pdf = pd.DataFrame({"doc_id": list(imgs), "payload": payloads})
    feats = decode_image_features(
        spark.createDataFrame(pdf), decoder=jpeg_image_decoder
    ).collect()
    assert len(feats) == 4
    for r in feats:
        assert (r.width, r.height) == (32, 32)
        assert r.mean_pixel == pytest.approx(
            imgs[r.doc_id].astype(np.float64).mean()
        )
