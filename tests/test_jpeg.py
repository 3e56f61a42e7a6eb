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
    # doctor SOF0 into SOF3 (lossless) — still refused; SOF2 is now a
    # supported path with its own tests
    sof_at = good.find(b"\xff\xc0")
    lossless = good[:sof_at] + b"\xff\xc3" + good[sof_at + 2 :]
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(lossless)
    # a baseline-shaped scan (Ss=0, Se=63) inside an SOF2 stream is
    # not a legal progressive DC scan
    prog = good[:sof_at] + b"\xff\xc2" + good[sof_at + 2 :]
    with pytest.raises(ValueError, match="Se = 0"):
        decode_jpeg(prog)
    # doctor sampling factors to 3x1 — above the supported 1-2 range
    c = encode_jpeg(_rand((8, 8, 3), 2))
    sof_at = c.find(b"\xff\xc0")
    comp0_samp = sof_at + 4 + 6 + 1  # marker(2)+len(2)+prec/h/w/nc(6)+id(1)
    sub = c[:comp0_samp] + b"\x31" + c[comp0_samp + 1 :]
    with pytest.raises(ValueError, match="sampling factors above 2"):
        decode_jpeg(sub)


def test_byte_stuffing_round_trip():
    """Content engineered to emit 0xFF bytes in the entropy stream must
    survive the stuff/unstuff cycle."""
    for seed in range(6):
        a = _rand((16, 16), 1000 + seed)
        d = decode_jpeg(encode_jpeg(a, quant=Q1))
        assert np.abs(d.astype(int) - a.astype(int)).max() <= 4


def test_420_smooth_content_bounded_error():
    """4:2:0 on smooth gradients: chroma varies slowly, so the 2x2
    mean + replication upsample stays within a small bound; dims that
    are not MCU multiples crop back correctly."""
    xx, yy = np.meshgrid(np.arange(41), np.arange(35))
    img = np.stack(
        [(xx * 3 + yy * 2) % 200 + 20, (xx * 2) % 180 + 30, (yy * 4) % 150 + 50],
        axis=-1,
    ).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(img, quant=Q1, subsampling="420"))
    assert d.shape == img.shape
    assert np.abs(d.astype(int) - img.astype(int)).mean() < 4


def test_420_grey_as_rgb_harmonic_is_exact():
    """The 4:2:0 gate design: R=G=B harmonic raster -> Y carries the
    harmonic, Cb=Cr=128 flat -> chroma averages to a constant and
    quantizes to zero -> bit-exact RGB round trip through the
    interleaved-MCU + upsample + color-transform path."""
    digest = hashlib.md5(b"420 doc").digest()
    grey = _harmonic_image(digest)
    rgb = np.stack([grey, grey, grey], axis=-1)
    got = decode_jpeg(encode_jpeg(rgb, subsampling="420"))
    assert np.array_equal(got, rgb)
    # and the stream really declares 2x2 luma sampling
    enc = encode_jpeg(rgb, subsampling="420")
    sof_at = enc.find(b"\xff\xc0")
    assert enc[sof_at + 4 + 6 + 1] == 0x22


def test_420_vs_444_stream_sizes():
    """Subsampling must actually drop chroma blocks: for a color image
    the 4:2:0 stream is smaller than 4:4:4 of the same content."""
    rng = np.random.default_rng(9)
    base = rng.integers(40, 200, (32, 32)).astype(np.uint8)
    img = np.stack([base, base // 2 + 10, 255 - base], axis=-1)
    assert len(encode_jpeg(img, subsampling="420")) < len(
        encode_jpeg(img, subsampling="444")
    )


def test_422_and_440_round_trips():
    """The generic MCU loop handles every 1-2 factor combination:
    4:2:2 (2,1) and 4:4:0 (1,2) round-trip within the subsampling
    error bound, grey-as-RGB harmonics are bit-exact there too, and
    factors above 2 are refused."""
    digest = hashlib.md5(b"422 doc").digest()
    grey = _harmonic_image(digest)
    rgb = np.stack([grey, grey, grey], axis=-1)
    for mode, samp_byte in [("422", 0x21), ("440", 0x12)]:
        enc = encode_jpeg(rgb, subsampling=mode)
        sof_at = enc.find(b"\xff\xc0")
        assert enc[sof_at + 4 + 6 + 1] == samp_byte
        assert np.array_equal(decode_jpeg(enc), rgb), mode
        # smooth color content stays within a loose subsampling bound
        xx, yy = np.meshgrid(np.arange(40), np.arange(36))
        sm = np.stack(
            [(xx * 3) % 200 + 20, (yy * 2) % 180 + 30, (xx + yy) % 150 + 50],
            axis=-1,
        ).astype(np.uint8)
        d = decode_jpeg(encode_jpeg(sm, quant=Q1, subsampling=mode))
        assert d.shape == sm.shape
        assert np.abs(d.astype(int) - sm.astype(int)).mean() < 4, mode
    g = _rand((24, 24), 4)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g, quant=Q1, subsampling="420")),
        decode_jpeg(encode_jpeg(g, quant=Q1)),
    )
    # doctor sampling factors to 3x1 -> explicit refusal
    c = encode_jpeg(_rand((8, 8, 3), 2))
    sof_at = c.find(b"\xff\xc0")
    comp0_samp = sof_at + 4 + 6 + 1
    bad = c[:comp0_samp] + b"\x31" + c[comp0_samp + 1 :]
    with pytest.raises(ValueError, match="sampling factors above 2"):
        decode_jpeg(bad)


H4 = np.array([1, -1, -1, 1, 1, -1, -1, 1])


def _chroma_expected(m, a_b, a_r, s):
    """Decoder's exact float pipeline for one (block-mean, sign) class:
    the association order mirrors decode_jpeg's YCbCr->RGB lines."""
    r = np.round(m + (1.402 * (s * a_r)))
    g = np.round((m - (0.344136 * (s * a_b))) - (0.714136 * (s * a_r)))
    b = np.round(m + (1.772 * (s * a_b)))
    return r, g, b


def test_ycbcr_nonzero_chroma_420_is_exact():
    """The round-7 gate core: Cb/Cr carry a NONZERO u=4 AC harmonic
    (constant over 2x2 cells so the encoder's mean-downsample is
    exact, even amplitude so 8*a divides the AC quantizer 16), and the
    decoded RGB matches the closed-form per-class values bit-for-bit —
    proving chroma dequant, 2x2 upsample and the color transform on
    nonzero data."""
    from levi_spark.operators.jpeg import encode_jpeg_ycbcr

    m = np.array([[60, 110], [170, 220]])  # per Y block
    a_b, a_r = 10.0, 6.0
    y = np.kron(m, np.ones((8, 8))).astype(np.float64)
    hcol = H4[(np.arange(16) % 16) // 2]
    cb = np.broadcast_to(128.0 + a_b * hcol, (16, 16)).copy()
    cr = np.broadcast_to(128.0 + a_r * hcol, (16, 16)).copy()
    enc = encode_jpeg_ycbcr(np.stack([y, cb, cr], -1), subsampling="420")
    got = decode_jpeg(enc)
    exp = np.zeros((16, 16, 3))
    for x in range(16):
        s = hcol[x]
        for by in range(2):
            for bx in range(2):
                if bx * 8 <= x < bx * 8 + 8:
                    exp[by * 8 : by * 8 + 8, x] = _chroma_expected(
                        m[by, bx], a_b, a_r, s
                    )
    assert np.array_equal(got, np.clip(exp, 0, 255).astype(np.uint8))
    # the chroma is REALLY nonzero: channels differ in the output
    assert not np.array_equal(got[..., 0], got[..., 1])
    # and a zero-chroma encode of the same luma is a shorter stream
    flat = np.stack([y, np.full_like(y, 128.0), np.full_like(y, 128.0)], -1)
    assert len(encode_jpeg_ycbcr(flat, subsampling="420")) < len(enc)


def test_ycbcr_nonzero_chroma_422_and_440():
    """Nonzero chroma through the other subsampled geometries: the
    harmonic rides the subsampled axis (horizontal for 4:2:2, vertical
    for 4:4:0) so the mean-downsample stays exact in each."""
    from levi_spark.operators.jpeg import encode_jpeg_ycbcr

    m, a_b, a_r = 120, 8.0, 12.0
    hvals = H4[(np.arange(16) % 16) // 2]
    # 4:2:2 — 16x8 single MCU, horizontal harmonic
    y = np.full((8, 16), float(m))
    cb = np.broadcast_to(128.0 + a_b * hvals, (8, 16)).copy()
    cr = np.broadcast_to(128.0 + a_r * hvals, (8, 16)).copy()
    got = decode_jpeg(encode_jpeg_ycbcr(np.stack([y, cb, cr], -1), subsampling="422"))
    for x in range(16):
        r, g, b = _chroma_expected(m, a_b, a_r, hvals[x])
        assert np.array_equal(got[:, x].T, np.tile([[r], [g], [b]], 8))
    # 4:4:0 — 8x16 single MCU, vertical harmonic
    y = np.full((16, 8), float(m))
    cb = np.broadcast_to(128.0 + a_b * hvals[:, None], (16, 8)).copy()
    cr = np.broadcast_to(128.0 + a_r * hvals[:, None], (16, 8)).copy()
    got = decode_jpeg(encode_jpeg_ycbcr(np.stack([y, cb, cr], -1), subsampling="440"))
    for yy in range(16):
        r, g, b = _chroma_expected(m, a_b, a_r, hvals[yy])
        assert np.array_equal(got[yy].T, np.tile([[r], [g], [b]], 8))
    with pytest.raises(ValueError, match="Y/Cb/Cr planes"):
        encode_jpeg_ycbcr(np.zeros((8, 8)))


def test_gate420_no_rounding_boundary():
    """The gate's bit-exactness rests on no pre-round value landing
    near a .5 boundary (numpy rounds half-even, DuckDB half-away):
    scan every (m, aB, aR) combo the digest can produce."""
    amps = np.arange(2, 17, 2, dtype=float)
    vals = []
    for a_r in amps:
        vals += [1.402 * a_r]
        for a_b in amps:
            vals += [1.772 * a_b]
            for m in range(30, 222):
                vals.append((m - (0.344136 * a_b)) - (0.714136 * a_r))
                vals.append((m + (0.344136 * a_b)) + (0.714136 * a_r))
    v = np.array(vals)
    assert np.abs(v - np.floor(v) - 0.5).min() > 0.003
    # and the extreme channel values stay unclipped for every m
    assert 30 - 1.772 * 16 > 0 and 221 + 1.772 * 16 < 255


def test_progressive_round_trip_and_eobrun():
    from levi_spark.operators.jpeg import encode_jpeg_progressive

    for shape in [(8, 8), (17, 23), (40, 33)]:
        a = _rand(shape, sum(shape))
        d = decode_jpeg(encode_jpeg_progressive(a, quant=Q1))
        assert d.shape == a.shape
        assert np.abs(d.astype(int) - a.astype(int)).max() <= 4
    # flat image: the whole AC scan is one EOBRUN spanning every block
    flat = np.full((64, 64), 99, np.uint8)
    assert (decode_jpeg(encode_jpeg_progressive(flat)) == flat).all()


def test_progressive_harmonic_is_exact_and_refusals():
    """Same exact-coefficient raster as the baseline gate, through the
    SOF2 multi-scan path; an illegal Ah/Al pairing and multi-component
    progressive are refused explicitly."""
    from levi_spark.operators.jpeg import encode_jpeg_progressive

    digest = hashlib.md5(b"prog doc").digest()
    img = _harmonic_image(digest)
    enc = encode_jpeg_progressive(img)
    assert b"\xff\xc2" in enc and (decode_jpeg(enc) == img).all()
    # doctor the AC scan's AhAl byte -> Ah=3/Al=0 violates Ah=Al+1
    sos2 = enc.rfind(b"\xff\xda")
    bad = bytearray(enc)
    bad[sos2 + 2 + 2 + 1 + 2 + 2] = 0x30
    with pytest.raises(ValueError, match="Ah = Al"):
        decode_jpeg(bytes(bad))
    with pytest.raises(ValueError, match="greyscale-only"):
        encode_jpeg_progressive(_rand((8, 8, 3), 1))


def test_successive_approximation_equals_full_precision():
    """The round-7 SA path: a 4-scan stream (DC/AC first at Al=1, DC/AC
    refinement at Ah=1/Al=0) must reconstruct the same pixels as the
    single-precision progressive stream for ANY content — successive
    approximation is lossless once all bit planes land."""
    from levi_spark.operators.jpeg import encode_jpeg_progressive

    for seed in range(6):
        shape = [(8, 8), (17, 23), (40, 33), (64, 64), (9, 65), (32, 32)][seed]
        img = _rand(shape, seed)
        for q in (Q1, DEFAULT_QUANT):
            sa = encode_jpeg_progressive(img, quant=q, successive=True)
            assert sa.count(b"\xff\xda") == 4
            assert np.array_equal(
                decode_jpeg(sa),
                decode_jpeg(encode_jpeg_progressive(img, quant=q)),
            ), (shape, "sa != spectral-only")


def test_successive_approximation_harmonic_exact_and_refine_matters():
    """The SA gate fixture is bit-exact, and the refinement scans are
    load-bearing: truncating the stream after the first two scans
    (legal JPEG — decoder sees only the Al=1 planes) yields DIFFERENT
    pixels, so a decoder that ignored refinement could not pass."""
    from levi_spark.operators.jpeg import encode_jpeg_progressive

    digest = hashlib.md5(b"sa doc").digest()
    img = _harmonic_image(digest)
    enc = encode_jpeg_progressive(img, successive=True)
    assert (decode_jpeg(enc) == img).all()
    # cut the stream just before the 3rd SOS and close with EOI
    scans = [i for i in range(len(enc)) if enc[i : i + 2] == b"\xff\xda"]
    coarse = enc[: scans[2]] + b"\xff\xd9"
    got = decode_jpeg(coarse)
    assert got.shape == img.shape and not np.array_equal(got, img)
    # odd-valued content: every block exercises nonzero low bits
    odd = np.full((16, 16), 77, np.uint8)
    assert (decode_jpeg(encode_jpeg_progressive(odd, successive=True)) == odd).all()


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


def test_restart_markers_round_trip_and_structure():
    """Round-7 surface: DRI/RSTn restart intervals — identical pixels
    to the unrestarted stream for any content/geometry, real markers
    in the stream (DRI segment + cycling RST0-7), per-segment DC
    predictor resets, and a wrong-sequence marker refuses."""
    rng = np.random.default_rng(21)
    for trial in range(8):
        h, w = int(rng.integers(8, 70)), int(rng.integers(8, 70))
        color = trial % 2 == 0
        img = _rand((h, w, 3) if color else (h, w), trial)
        sub = ["444", "420", "422", "440"][trial % 4] if color else "444"
        ri = int(rng.integers(1, 6))
        with_r = decode_jpeg(
            encode_jpeg(img, quant=Q1, subsampling=sub, restart_interval=ri)
        )
        without = decode_jpeg(encode_jpeg(img, quant=Q1, subsampling=sub))
        assert np.array_equal(with_r, without), (h, w, sub, ri)
    enc = encode_jpeg(_rand((40, 40), 3), restart_interval=2)
    assert b"\xff\xdd" in enc and b"\xff\xd0" in enc and b"\xff\xd1" in enc
    i = enc.rfind(b"\xff\xd1")
    bad = bytearray(enc)
    bad[i + 1] = 0xD6
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg(bytes(bad))
    # the gate raster stays bit-exact with restarts in the stream
    from levi_spark.operators.jpeg import encode_jpeg_ycbcr

    digest = hashlib.md5(b"rst doc").digest()
    grey = _harmonic_image(digest)
    assert (
        decode_jpeg(encode_jpeg(grey, restart_interval=3)) == grey
    ).all()
