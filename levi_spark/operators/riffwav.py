"""Real audio codec for the multimodal plane: RIFF/WAVE with
16-bit integer PCM, implemented in pure numpy — no soundfile/librosa
needed, so the engine's audio decode path is NOT a stub for this
format (the pluggable-decoder seam in
:mod:`levi_spark.operators.multimodal` stays the upgrade path for
compressed codecs: mp3/ogg/flac).

Canonical PCM layout: ``RIFF <size> WAVE`` then a ``fmt `` chunk
(PCM tag 1, channels, sample rate, byte rate, block align, bits) and a
``data`` chunk of little-endian int16 frames. The decoder walks chunks
(skipping unknown ones such as ``LIST``) so files from other writers
parse too.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 array (n,) mono or (n, ch) -> canonical PCM WAV bytes."""
    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"expected (n,) or (n, ch) int16, got {a.shape}")
    n, ch = a.shape
    data = a.tobytes()
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV bytes -> (sample_rate, int16 array (n, ch)). Raises
    ValueError on non-RIFF/non-PCM/truncated input."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(f"not RIFF/WAVE: {payload[:12]!r}")
    pos = 12
    sample_rate = channels = bits = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            tag, channels, sample_rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag != 1:
                raise ValueError(f"non-PCM WAV (format tag {tag}) unsupported")
        elif cid == b"data":
            if len(body) != size:
                raise ValueError(f"data chunk truncated: want {size}, have {len(body)}")
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise ValueError(f"{bits}-bit PCM unsupported (16 only)")
    a = np.frombuffer(data, dtype="<i2")
    return sample_rate, a.reshape(-1, channels)


def wav_audio_decoder(payload: bytes) -> dict:
    """Drop-in ``decoder`` for
    :func:`levi_spark.operators.multimodal.decode_audio_features`:
    real sample rate / frame count / RMS over the decoded samples.
    RMS stays float-exact cross-engine for integer samples: the
    squared-sum is an integer below 2^53 and the frame count divides
    exactly when it is a power of two."""
    sample_rate, a = decode_wav(payload)
    x = a.astype(np.float64)
    return {
        "sample_rate": sample_rate,
        "n_samples": a.shape[0],
        "rms": float(np.sqrt((x * x).sum() / x.size)),
    }
