"""Sun AU (``.snd``/``.au``) audio container — pure stdlib + numpy.

The telephony/Unix audio container (the format NeXT/Sun shipped and
``audio/basic`` still names in MIME): a big-endian 24-byte-plus
header — magic ``.snd``, data offset, data size (or ``0xFFFFFFFF``
for unknown), encoding id, sample rate, channels — then raw sample
data, with an optional annotation gap between header and data.
Call-center and voicemail corpora arrive in exactly this framing,
usually 8 kHz G.711.

Encodings owned here: 1 = G.711 mu-law and 27 = G.711 A-law (both
delegate the companding math to :mod:`levi_spark.operators.adpcm`'s
spec-exact tables), 2 = linear PCM8 (signed), 3 = linear PCM16
big-endian. Everything else (floats, G.72x ADPCM, 24/32-bit) refuses
loudly. Strict: bad magic, offset < 24, truncated data against a
declared size, and interleave-violating channel counts raise.

The reference engine has no media surface; north-star extension
surface beside :mod:`levi_spark.operators.riffwav` (the RIFF-side
twin: AU is big-endian header-first where WAV is little-endian
chunked).
"""

from __future__ import annotations

import struct

import numpy as np

from levi_spark.operators.adpcm import (
    alaw_compress,
    alaw_expand,
    mulaw_compress,
    mulaw_expand,
)

_MAGIC = b".snd"
_ULAW, _PCM8, _PCM16, _ALAW = 1, 2, 3, 27
_NAMES = {_ULAW: "ulaw", _PCM8: "pcm8", _PCM16: "pcm16", _ALAW: "alaw"}


def encode_au(
    samples: np.ndarray,
    rate: int = 8000,
    encoding: str = "ulaw",
    annotation: bytes = b"",
) -> bytes:
    """int16 (n,) or (n, channels) -> AU bytes. ``encoding``:
    ``ulaw`` | ``alaw`` | ``pcm16`` | ``pcm8`` (pcm8 keeps the top
    byte). The optional annotation sits between header and data and
    grows the data offset, exercising readers' offset handling."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] < 1:
        raise ValueError(f"AU needs (n,) or (n, ch) int16, got {s.shape}")
    inter = s.reshape(-1)  # interleaved frames
    if encoding == "ulaw":
        enc, data = _ULAW, mulaw_compress(inter).astype(np.uint8).tobytes()
    elif encoding == "alaw":
        enc, data = _ALAW, alaw_compress(inter).astype(np.uint8).tobytes()
    elif encoding == "pcm16":
        enc, data = _PCM16, inter.astype(">i2").tobytes()
    elif encoding == "pcm8":
        enc, data = _PCM8, (inter.astype(np.int32) >> 8).astype(
            np.int8
        ).tobytes()
    else:
        raise ValueError(f"AU encoding {encoding!r} (ulaw|alaw|pcm16|pcm8)")
    offset = 24 + len(annotation)
    hdr = struct.pack(
        ">4sIIIII", _MAGIC, offset, len(data), enc, int(rate), s.shape[1]
    )
    return hdr + annotation + data


def decode_au(payload: bytes) -> dict:
    """AU bytes -> ``{encoding, rate, channels, samples (n, ch)
    int16}``. mu-law/A-law expand through the G.711 tables; PCM8
    scales to the 16-bit top byte (the inverse of the encoder)."""
    if payload[:4] != _MAGIC:
        raise ValueError(f"not AU (starts {payload[:4]!r})")
    if len(payload) < 24:
        raise ValueError("AU header truncated")
    _, offset, dsize, enc, rate, channels = struct.unpack_from(
        ">4sIIIII", payload, 0
    )
    if offset < 24:
        raise ValueError(f"AU data offset {offset} < 24")
    if channels < 1:
        raise ValueError("AU channel count 0")
    data = payload[offset:]
    if dsize != 0xFFFFFFFF:
        if len(data) < dsize:
            raise ValueError(
                f"AU data truncated: {len(data)} < declared {dsize}"
            )
        data = data[:dsize]
    if enc == _ULAW:
        flat = mulaw_expand(np.frombuffer(data, np.uint8))
    elif enc == _ALAW:
        flat = alaw_expand(np.frombuffer(data, np.uint8))
    elif enc == _PCM16:
        if len(data) % 2:
            raise ValueError("AU pcm16 data length is odd")
        flat = np.frombuffer(data, ">i2").astype(np.int16)
    elif enc == _PCM8:
        flat = (
            np.frombuffer(data, np.int8).astype(np.int16) << 8
        )
    else:
        raise NotImplementedError(
            f"AU encoding id {enc} (supported: 1 ulaw, 2 pcm8, "
            "3 pcm16, 27 alaw)"
        )
    if len(flat) % channels:
        raise ValueError(
            f"{len(flat)} samples do not interleave into {channels} channels"
        )
    return {
        "encoding": _NAMES[enc],
        "rate": rate,
        "channels": channels,
        "samples": np.asarray(flat, np.int16).reshape(-1, channels),
    }
