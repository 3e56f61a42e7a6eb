"""MJPEG-in-AVI video container (levi_spark.operators.avi): container
round trips (headers, timing, idx1), strict-validation refusals,
closed-form gate-law parity, and the multimodal-plane per-frame
fan-out the `multimodal_mjpeg_avi_decode` gate exercises at scale."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from levi_spark.operators.avi import (
    avi_frame_features,
    decode_avi_mjpeg,
    encode_avi_frames,
    encode_avi_mjpeg,
)
from levi_spark.operators.jpeg import encode_jpeg

H4 = np.array((1, -1, -1, 1, 1, -1, -1, 1), dtype=np.int64)


def _analytic_frame(b: np.ndarray, f: int) -> np.ndarray:
    """The gate raster: per-8x8-block exact DC + u=4 AC harmonic."""
    bb = (b + 11 * f) % 256
    m = (16 + bb * 7 // 8).reshape(4, 4)
    a = (2 * (bb % 8 + 1)).reshape(4, 4)
    base = np.kron(m, np.ones((8, 8), dtype=np.int64))
    wave = np.kron(a, np.ones((8, 8), dtype=np.int64)) * np.tile(H4, (32, 4))
    return (base + wave).astype(np.uint8)


def _digest_bytes(text: str) -> np.ndarray:
    return np.frombuffer(
        hashlib.md5(text.encode()).digest(), np.uint8
    ).astype(np.int64)


@settings(max_examples=10, deadline=None)
@given(k=st.integers(1, 5), fps=st.integers(1, 60), seed=st.integers(0, 999))
def test_container_round_trip_law(k, fps, seed):
    """Every frame survives the mux bit-exact (analytic rasters make
    the JPEG layer lossless), and the container timing fields read
    back exactly as written."""
    b = _digest_bytes(f"avi {seed}")
    frames = [_analytic_frame(b, f) for f in range(k)]
    d = decode_avi_mjpeg(encode_avi_frames(frames, fps=fps))
    assert (d["width"], d["height"]) == (32, 32)
    assert d["n_frames"] == k
    assert d["usec_per_frame"] == 1_000_000 // fps
    assert (d["fps_rate"], d["fps_scale"]) == (fps, 1)
    for got, want in zip(d["frames"], frames):
        assert np.array_equal(got, want)


def test_strict_validation_refusals():
    b = _digest_bytes("refusals")
    payload = encode_avi_frames([_analytic_frame(b, 0)], fps=10)

    with pytest.raises(ValueError, match="not a RIFF"):
        decode_avi_mjpeg(b"JUNK" + payload[4:])
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi_mjpeg(payload[:8] + b"WAVE" + payload[12:])
    # truncated container: RIFF size overruns the payload
    with pytest.raises(ValueError):
        decode_avi_mjpeg(payload[:-10])
    # corrupt idx1 offset -> entry-by-entry cross-check trips
    idx = payload.rindex(b"idx1")
    bad = bytearray(payload)
    struct.pack_into("<I", bad, idx + 16, 9999)  # entry 0 dwChunkOffset
    with pytest.raises(ValueError, match="idx1 entry"):
        decode_avi_mjpeg(bytes(bad))
    # non-MJPEG handler refused loudly
    bad = bytearray(payload)
    pos = bad.index(b"vids") + 4
    bad[pos : pos + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="handler"):
        decode_avi_mjpeg(bytes(bad))
    # empty containers refused at encode time
    with pytest.raises(ValueError):
        encode_avi_mjpeg([], 32, 32)


def test_avih_strh_movi_consistency_enforced():
    """dwTotalFrames / strh dwLength / movi chunk count must agree."""
    b = _digest_bytes("count check")
    payload = encode_avi_frames([_analytic_frame(b, f) for f in range(3)])
    bad = bytearray(payload)
    avih = bad.index(b"avih") + 8
    struct.pack_into("<I", bad, avih + 16, 7)  # dwTotalFrames
    with pytest.raises(ValueError, match="frame count mismatch"):
        decode_avi_mjpeg(bytes(bad))


def test_gate_oracle_law_per_frame_stats():
    """Per-frame mean and MAD match the closed forms the DuckDB
    oracle re-derives from md5 hex arithmetic."""
    b = _digest_bytes("video doc")
    frames = [_analytic_frame(b, f) for f in range(4)]
    feats = avi_frame_features(encode_avi_frames(frames, fps=24))
    assert [d["frame_idx"] for d in feats] == [0, 1, 2, 3]
    for f, d in enumerate(feats):
        bb = (b + 11 * f) % 256
        m = 16 + bb * 7 // 8
        a = 2 * (bb % 8 + 1)
        mu = m.mean()
        assert d["mean_pixel"] == mu
        assert d["mean_abs_dev"] == (
            np.abs(m + a - mu) + np.abs(m - a - mu)
        ).sum() / 32.0
        assert d["usec_per_frame"] == 1_000_000 // 24
        assert d["n_frames"] == 4


def test_arbitrary_rasters_survive_via_other_jpeg_modes():
    """The container is codec-complete: 4:2:0 RGB and restart-interval
    JPEG frames both ride in the same AVI (decode just re-yields what
    the JPEG layer produces — frame-level parity checked on shape and
    container bookkeeping, pixel parity is the JPEG suite's job)."""
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    grey = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    payload = encode_avi_mjpeg(
        [
            encode_jpeg(rgb, subsampling="420"),
            encode_jpeg(grey, restart_interval=2),
        ],
        32,
        32,
        fps=5,
    )
    d = decode_avi_mjpeg(payload)
    assert d["n_frames"] == 2
    assert d["frames"][0].shape == (32, 32, 3)
    assert d["frames"][1].shape == (32, 32)


def test_multimodal_plane_integration(spark):
    import pandas as pd

    from levi_spark.operators.multimodal import decode_video_features

    payloads = {}
    for i in range(1, 4):
        b = _digest_bytes(f"doc {i}")
        frames = [_analytic_frame(b, f) for f in range(i + 1)]
        payloads[i] = encode_avi_frames(frames, fps=10 * i)
    pdf = pd.DataFrame(
        {"doc_id": list(payloads), "payload": list(payloads.values())}
    )
    rows = decode_video_features(
        spark.createDataFrame(pdf), decoder=avi_frame_features
    ).collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append(r.frame_idx)
        assert (r.width, r.height) == (32, 32)
        assert r.usec_per_frame == 1_000_000 // (10 * r.doc_id)
        assert r.n_frames == r.doc_id + 1
    assert {k: sorted(v) for k, v in got.items()} == {
        1: [0, 1], 2: [0, 1, 2], 3: [0, 1, 2, 3]
    }
