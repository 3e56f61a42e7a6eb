"""Real image codec for the multimodal plane: binary netpbm (PGM ``P5``
grayscale / PPM ``P6`` RGB), implemented in pure numpy — no PIL/opencv
needed, so the engine's image decode path is NOT a stub for this
format. The pluggable-decoder seam in
:mod:`levi_spark.operators.multimodal` stays the upgrade path for
compressed formats (JPEG/PNG via PIL, video via ffmpeg).

Netpbm binary layout: ASCII header ``P5|P6 <width> <height> <maxval>``
(whitespace/comment separated) followed by a single whitespace byte and
``width*height*channels`` raw samples (maxval <= 255)."""

from __future__ import annotations

import numpy as np


def encode_netpbm(pixels: np.ndarray) -> bytes:
    """uint8 array (H, W) -> P5 or (H, W, 3) -> P6."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        magic, h, w = b"P5", *a.shape
    elif a.ndim == 3 and a.shape[2] == 3:
        magic, (h, w) = b"P6", a.shape[:2]
    else:
        raise ValueError(f"expected (H,W) or (H,W,3) uint8, got {a.shape}")
    return magic + f" {w} {h} 255\n".encode() + a.tobytes()


def decode_netpbm(payload: bytes) -> np.ndarray:
    """P5 -> (H, W) uint8; P6 -> (H, W, 3) uint8. Raises ValueError on
    anything else (including ASCII P2/P3 variants)."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError(f"not binary netpbm: magic {payload[:2]!r}")
    channels = 3 if payload[:2] == b"P6" else 1
    # header: magic + 3 ints, tokens separated by whitespace; '#'
    # starts a comment running to end-of-line
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated netpbm header")
        c = payload[pos : pos + 1]
        if c == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(payload[start:pos]))
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError(f"16-bit netpbm unsupported (maxval {maxval})")
    pos += 1  # the single whitespace byte after maxval
    n = w * h * channels
    raster = payload[pos : pos + n]
    if len(raster) != n:
        raise ValueError(f"raster truncated: want {n} bytes, have {len(raster)}")
    a = np.frombuffer(raster, dtype=np.uint8)
    return a.reshape(h, w) if channels == 1 else a.reshape(h, w, 3)


def netpbm_image_decoder(payload: bytes) -> dict:
    """Drop-in ``decoder`` for
    :func:`levi_spark.operators.multimodal.decode_image_features`:
    real width/height/mean over the decoded samples."""
    a = decode_netpbm(payload)
    h, w = a.shape[:2]
    px = a.astype(np.float64)
    mean = float(px.mean())
    return {
        "width": w,
        "height": h,
        "mean_pixel": mean,
        "mean_abs_dev": float(np.abs(px - mean).mean()),
    }


def netpbm_resize(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Nearest-neighbor resize, re-encoded in the source format —
    a real ``resizer`` for
    :func:`levi_spark.operators.multimodal.resize_images`. Index map:
    source_row(r) = floor(r * H / target_h), likewise for columns."""
    a = decode_netpbm(payload)
    h, w = a.shape[:2]
    rows = (np.arange(target_h) * h) // target_h
    cols = (np.arange(target_w) * w) // target_w
    out = a[rows][:, cols]
    return encode_netpbm(out)
