"""GIF codec (levi_spark.operators.gif): LZW round-trip laws
(variable code widths, table resets past 4095 codes, KwKwK),
multi-frame animation round trips with delays, the 4-pass interlace,
palette refusals, and the multimodal-plane frame fan-out the
`multimodal_gif_decode` gate exercises at scale."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from levi_spark.operators.gif import (
    _lzw_compress,
    _lzw_decompress,
    decode_gif,
    encode_gif,
    gif_frame_features,
)


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@settings(max_examples=25, deadline=None)
@given(n=st.integers(1, 20_000), seed=st.integers(0, 10_000),
       entropy=st.sampled_from([4, 16, 256]))
def test_lzw_round_trip_law(n, seed, entropy):
    """LZW is lossless across entropy regimes — low-entropy streams
    grow the table past every width bump and (for long inputs) past
    the 4095-code reset."""
    rng = np.random.default_rng(seed)
    data = (rng.integers(0, entropy, n) * 37 % 256).astype(np.uint8)
    assert np.array_equal(_lzw_decompress(_lzw_compress(data, 8), 8, n), data)


def test_lzw_width_growth_and_reset_are_hit():
    """A long low-entropy stream must actually cross the 9->10->11->12
    bit widths and the 4095-code table reset (the compressed stream
    contains > 4096 codes' worth of input)."""
    data = (np.arange(120_000) % 7).astype(np.uint8)
    enc = _lzw_compress(data, 8)
    assert np.array_equal(_lzw_decompress(enc, 8, len(data)), data)
    assert len(enc) < len(data)  # the table really compresses


@settings(max_examples=15, deadline=None)
@given(h=st.integers(1, 40), w=st.integers(1, 40),
       k=st.integers(1, 4), seed=st.integers(0, 10_000),
       grey=st.booleans())
def test_animation_round_trip_law(h, w, k, seed, grey):
    rng = np.random.default_rng(seed)
    frames = []
    for _ in range(k):
        f = rng.integers(0, 256, (h, w) if grey else (h, w, 3), dtype=np.uint8)
        frames.append(f if grey else f // 64 * 64)  # cap palette for RGB
    delays = [int(x) for x in rng.integers(1, 100, k)]
    d = decode_gif(encode_gif(frames, delays_cs=delays))
    assert (d["width"], d["height"]) == (w, h)
    assert d["delays_cs"] == delays
    for f_in, f_out in zip(frames, d["frames"]):
        want = np.stack([f_in] * 3, -1) if f_in.ndim == 2 else f_in
        assert np.array_equal(f_out, want)


def test_interlace_round_trip_and_header():
    img = _rand((23, 17), 3)
    enc = encode_gif([img], interlace=True)
    assert enc[:6] == b"GIF89a"
    d = decode_gif(enc)
    assert np.array_equal(d["frames"][0], np.stack([img] * 3, -1))
    # sequential decode of the same pixels differs only in stream form
    assert np.array_equal(
        decode_gif(encode_gif([img]))["frames"][0], d["frames"][0]
    )


def test_refusals_and_errors():
    big = _rand((32, 32, 3), 1)  # ~1000 distinct colors
    with pytest.raises(ValueError, match="palette"):
        encode_gif([big])
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG.....")
    enc = encode_gif([_rand((8, 8), 2)])
    with pytest.raises(ValueError, match="trailer|truncated|sub-block"):
        decode_gif(enc[:-10])
    with pytest.raises(ValueError, match="canvas size"):
        encode_gif([_rand((8, 8), 1), _rand((9, 8), 1)])


def test_gate_oracle_law_per_frame_means():
    """The gate fixture's analytic law: frame f mean over the tiled
    digest raster equals sum((b + 7f) % 256) / 16."""
    text = "gif doc"
    digest = hashlib.md5(text.encode()).digest()
    b = np.frombuffer(digest, np.uint8).astype(np.int64)
    n = 144
    frames = [
        np.tile((b + 7 * f) % 256, (n // 16) + 1)[:n]
        .astype(np.uint8).reshape(12, 12)
        for f in range(3)
    ]
    feats = gif_frame_features(encode_gif(frames, delays_cs=[4, 5, 6]))
    assert [f["frame_idx"] for f in feats] == [0, 1, 2]
    assert [f["delay_cs"] for f in feats] == [4, 5, 6]
    for f, d in enumerate(feats):
        assert d["mean_pixel"] == ((b + 7 * f) % 256).sum() / 16.0


def test_multimodal_plane_integration(spark):
    import pandas as pd

    from levi_spark.operators.multimodal import decode_frame_features

    payloads = {}
    for i in range(1, 4):
        frames = [_rand((10, 10), 10 * i + f) for f in range(i + 1)]
        payloads[i] = encode_gif(frames)
    pdf = pd.DataFrame(
        {"doc_id": list(payloads), "payload": list(payloads.values())}
    )
    rows = decode_frame_features(
        spark.createDataFrame(pdf), decoder=gif_frame_features
    ).collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append(r.frame_idx)
        assert (r.width, r.height) == (10, 10)
    assert {k: sorted(v) for k, v in got.items()} == {
        1: [0, 1], 2: [0, 1, 2], 3: [0, 1, 2, 3]
    }


def test_transparency_and_disposal_compositing():
    """Full graphic-control semantics: transparent pixels leave the
    prior canvas visible; disposal 2 clears the frame region to the
    canvas base before the next frame; disposal 3 restores the
    pre-frame canvas."""
    f1 = np.full((8, 8), 50, np.uint8)
    f2 = np.full((8, 8), 200, np.uint8)
    f2[2:4, 2:4] = 7  # transparent color
    d = decode_gif(encode_gif([f1, f2], transparent_color=7))
    assert (d["frames"][1][2:4, 2:4] == 50).all()
    assert (d["frames"][1][0, 0] == 200).all()
    assert d["transparent_index"][1] is not None
    # disposal 2: holes over a disposed region show the base (black)
    d = decode_gif(encode_gif([f1, f2], transparent_color=7, disposals=[2, 0]))
    assert (d["frames"][1][2:4, 2:4] == 0).all()
    # disposal 3: the frame after a restore-to-previous frame sees the
    # canvas from BEFORE it
    f3 = np.full((8, 8), 130, np.uint8)
    f3[5, 5] = 7
    d = decode_gif(
        encode_gif([f1, f2, f3], transparent_color=7, disposals=[0, 3, 0])
    )
    assert (d["frames"][2][5, 5] == 50).all()
    assert (d["frames"][1][0, 0] == 200).all()
    # contract checks
    with pytest.raises(ValueError, match="slot"):
        encode_gif(
            [np.arange(256, dtype=np.uint8).reshape(16, 16)],
            transparent_color=(1, 2, 3),
        )
    with pytest.raises(ValueError, match="disposal methods"):
        encode_gif([f1], disposals=[7])
