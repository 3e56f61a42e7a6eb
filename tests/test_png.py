"""PNG codec (levi_spark.operators.png): round-trip laws over all five
scanline filters, analytic-mean cross-check, spec error contracts, and
the multimodal-plane integration the `multimodal_png_decode` gate
exercises at scale."""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from levi_spark.operators.png import (
    decode_png,
    encode_png,
    png_image_decoder,
    png_resize,
)


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("shape", [(6, 8), (6, 8, 3), (1, 1), (5, 3, 3)])
@pytest.mark.parametrize(
    "filters", ["cycle", "none", "sub", "up", "avg", "paeth"]
)
def test_round_trip_every_filter(shape, filters):
    a = _rand(shape, hash((shape, filters)) % 2**31)
    f = (
        filters
        if filters in ("cycle", "none")
        else [{"sub": 1, "up": 2, "avg": 3, "paeth": 4}[filters]] * shape[0]
    )
    got = decode_png(encode_png(a, filters=f))
    assert got.shape == a.shape and (got == a).all()


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    rgb=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
    data=st.data(),
)
def test_round_trip_law(h, w, rgb, seed, data):
    """Decode(encode(x, any per-line filter mix)) == x — the law that
    holds iff every filter/defilter pair is a true inverse, including
    at image edges where left/up-left neighbors are defined as 0."""
    shape = (h, w, 3) if rgb else (h, w)
    a = _rand(shape, seed)
    line_filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h)
    )
    got = decode_png(encode_png(a, filters=line_filters))
    assert got.shape == a.shape and (got == a).all()


def test_mean_matches_analytic_md5_raster():
    """The gate's oracle law, locally: a tiled md5 raster's decoded
    mean equals sum(digest)/16 exactly in float64."""
    digest = hashlib.md5(b"some document text").digest()
    raster = (digest * 10)[: 8 * 6 * 3]
    a = np.frombuffer(raster, np.uint8).reshape(6, 8, 3)
    d = png_image_decoder(encode_png(a, filters="cycle"))
    assert d["width"] == 8 and d["height"] == 6
    assert d["mean_pixel"] == sum(digest) / 16.0


def test_resize_nearest_neighbor():
    a = _rand((6, 8, 3), 3)
    out = decode_png(png_resize(encode_png(a), 4, 3))
    rows = (np.arange(3) * 6) // 3
    cols = (np.arange(4) * 8) // 4
    assert (out == a[rows][:, cols]).all()


def test_error_contracts():
    a = _rand((4, 4), 1)
    good = encode_png(a)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF" + good)
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:-6])
    corrupt = bytearray(good)
    corrupt[45] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(corrupt))


def _doctor_ihdr(payload: bytes, **fields) -> bytes:
    """Rewrite IHDR fields (recomputing the CRC) to fabricate
    unsupported-profile PNGs from a valid one."""
    pos = 8
    (length,) = struct.unpack(">I", payload[pos : pos + 4])
    data = bytearray(payload[pos + 8 : pos + 8 + length])
    w, h, depth, ct, comp, filt, inter = struct.unpack(">IIBBBBB", bytes(data))
    vals = dict(
        w=w, h=h, depth=depth, ct=ct, comp=comp, filt=filt, inter=inter
    )
    vals.update(fields)
    new = struct.pack(
        ">IIBBBBB",
        vals["w"], vals["h"], vals["depth"], vals["ct"], vals["comp"],
        vals["filt"], vals["inter"],
    )
    chunk = (
        struct.pack(">I", len(new))
        + b"IHDR"
        + new
        + struct.pack(">I", zlib.crc32(b"IHDR" + new))
    )
    return payload[:8] + chunk + payload[pos + 12 + length :]


def test_unsupported_profiles_refused():
    good = encode_png(_rand((4, 4), 2))
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(_doctor_ihdr(good, depth=16))
    with pytest.raises(ValueError, match="color type"):
        decode_png(_doctor_ihdr(good, ct=3))  # palette
    with pytest.raises(ValueError, match="interlace"):
        decode_png(_doctor_ihdr(good, inter=2))  # reserved method
    # a SEQUENTIAL stream relabeled Adam7 has the wrong pass layout —
    # caught by length accounting or filter-id validation, never
    # misread silently
    with pytest.raises(ValueError, match="Adam7|trailing|filter id"):
        decode_png(_doctor_ihdr(good, inter=1))


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 50),
    w=st.integers(1, 50),
    rgb=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_adam7_round_trip_law(h, w, rgb, seed):
    """Round-7 surface: Adam7 interlace round-trips losslessly for any
    geometry — including sizes where whole passes are empty — and the
    stream really declares interlace method 1."""
    a = _rand((h, w, 3) if rgb else (h, w), seed)
    enc = encode_png(a, interlace=True)
    ih = enc.find(b"IHDR")
    assert enc[ih + 4 + 12] == 1
    assert np.array_equal(decode_png(enc), a)


def test_adam7_pass_structure_matters():
    """Deinterlacing is load-bearing: decoding the Adam7 stream as if
    it were sequential (or vice versa) cannot reproduce the image, and
    per-pass filter context is really reset (filters='cycle' inside
    each pass round-trips)."""
    a = _rand((24, 17, 3), 5)
    seq, adam = encode_png(a), encode_png(a, interlace=True)
    assert seq != adam
    assert np.array_equal(decode_png(seq), decode_png(adam))
    with pytest.raises(ValueError):
        decode_png(_doctor_ihdr(adam, inter=0))


def test_ancillary_chunks_skipped_after_crc():
    """tEXt and friends are CRC-checked then skipped, per spec."""
    a = _rand((3, 3, 3), 9)
    good = encode_png(a)
    text = b"Comment\x00hello"
    extra = (
        struct.pack(">I", len(text))
        + b"tEXt"
        + text
        + struct.pack(">I", zlib.crc32(b"tEXt" + text))
    )
    # splice the ancillary chunk between IHDR and IDAT
    ihdr_end = 8 + 12 + 13
    doctored = good[:ihdr_end] + extra + good[ihdr_end:]
    assert (decode_png(doctored) == a).all()


def test_multimodal_plane_integration(spark):
    """decode_image_features with the PNG codec over a binary column —
    the Arrow-batched plumbing the gated query uses."""
    import pandas as pd

    from levi_spark.operators.multimodal import decode_image_features

    arrays = {i: _rand((6, 8, 3), i) for i in range(1, 5)}
    pdf = pd.DataFrame(
        {
            "doc_id": list(arrays),
            "payload": [encode_png(a, filters="cycle") for a in arrays.values()],
        }
    )
    feats = decode_image_features(
        spark.createDataFrame(pdf), decoder=png_image_decoder
    ).collect()
    assert len(feats) == 4
    for r in feats:
        assert (r.width, r.height) == (8, 6)
        assert r.mean_pixel == pytest.approx(
            arrays[r.doc_id].astype(np.float64).mean()
        )
