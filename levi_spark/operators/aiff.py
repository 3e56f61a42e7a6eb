"""AIFF codec — pure stdlib + numpy.

Apple's IFF-framed PCM container: the big-endian sibling of RIFF/WAV
(EA IFF 85 chunk framing, ``FORM``/``AIFF`` instead of
``RIFF``/``WAVE``) that Mac-originated audio corpora ship in. Two
spec quirks make it a real parser exercise rather than a WAV clone:

* every multi-byte field is BIG-endian, including the 16-bit PCM
  samples themselves (WAV is little-endian throughout);
* the COMM chunk encodes the sample rate as an 80-bit IEEE 754
  EXTENDED float (1 sign + 15 exponent bits, bias 16383, then a
  64-bit mantissa with the integer bit EXPLICIT) — decoded here with
  exact integer arithmetic, no float80 support needed: for the
  in-range case ``rate = mantissa >> (16446 - exponent)``.

Chunks: COMM (channels, numSampleFrames, sampleSize, rate80) and SSND
(offset/blockSize u32s then sample data); unknown chunks are skipped
by their declared size (odd sizes padded, per IFF). Strict — size
mismatches, a missing COMM/SSND, non-integral rates, and unsupported
sample sizes raise. Mono/stereo 16-bit PCM; stereo is
frame-interleaved L,R. North-star extension surface beside
:mod:`levi_spark.operators.riffwav`.
"""

from __future__ import annotations

import struct

import numpy as np


def _rate_to_f80(rate: int) -> bytes:
    """Integral sample rate -> 80-bit extended float (sign 0)."""
    if rate <= 0:
        raise ValueError(f"sample rate {rate} must be positive")
    nbits = rate.bit_length()
    exponent = 16383 + nbits - 1
    mantissa = rate << (64 - nbits)  # explicit integer bit lands at MSB
    return struct.pack(">HQ", exponent, mantissa)


def _f80_to_rate(b: bytes) -> int:
    (se, mantissa) = struct.unpack(">HQ", b)
    if se & 0x8000:
        raise ValueError("negative AIFF sample rate")
    exponent = se & 0x7FFF
    if exponent == 0 and mantissa == 0:
        raise ValueError("zero AIFF sample rate")
    if exponent == 0x7FFF:
        raise ValueError("AIFF sample rate is inf/NaN")
    shift = 16446 - exponent  # 16383 + 63
    if shift < 0 or shift > 63:
        raise ValueError(f"AIFF sample rate out of integral range (exp {exponent})")
    if shift and (mantissa & ((1 << shift) - 1)):
        raise ValueError("non-integral AIFF sample rate unsupported")
    return mantissa >> shift


def encode_aiff(
    samples: np.ndarray, sample_rate: int = 16000
) -> bytes:
    """int16 (n,) mono or (n, 2) stereo -> AIFF bytes (16-bit PCM,
    big-endian samples)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        ch, frames = 1, len(s)
        inter = s
    elif s.ndim == 2 and s.shape[1] == 2:
        ch, frames = 2, len(s)
        inter = s.reshape(-1)
    else:
        raise ValueError(f"samples shape {s.shape} unsupported")
    data = inter.astype(">i2").tobytes()
    comm = struct.pack(">hIh", ch, frames, 16) + _rate_to_f80(sample_rate)
    ssnd = struct.pack(">II", 0, 0) + data
    body = bytearray(b"AIFF")
    for cid, payload in ((b"COMM", comm), (b"SSND", ssnd)):
        body.extend(cid + struct.pack(">I", len(payload)) + payload)
        if len(payload) % 2:
            body.append(0)  # IFF pad byte (excluded from the size)
    return b"FORM" + struct.pack(">I", len(body)) + bytes(body)


def decode_aiff(payload: bytes) -> dict:
    """AIFF bytes -> {"sample_rate", "channels", "n_frames",
    "samples" ((n,) or (n, 2) int16)}. Strict framing."""
    if len(payload) < 12:
        raise ValueError("AIFF shorter than FORM header")
    if payload[:4] != b"FORM":
        raise ValueError(f"not IFF (starts {payload[:4]!r})")
    (form_size,) = struct.unpack_from(">I", payload, 4)
    if 8 + form_size > len(payload):
        raise ValueError(
            f"FORM size {form_size} overruns file of {len(payload)}"
        )
    if payload[8:12] != b"AIFF":
        raise ValueError(f"FORM type {payload[8:12]!r} is not AIFF")
    i, end = 12, 8 + form_size
    comm = ssnd = None
    while i < end:
        if i + 8 > end:
            raise ValueError("chunk header overruns FORM")
        cid = payload[i : i + 4]
        (size,) = struct.unpack_from(">I", payload, i + 4)
        body_at = i + 8
        if body_at + size > end:
            raise ValueError(f"chunk {cid!r} size {size} overruns FORM")
        if cid == b"COMM":
            if size != 18:
                raise ValueError(f"COMM size {size} != 18")
            comm = payload[body_at : body_at + 18]
        elif cid == b"SSND":
            ssnd = payload[body_at : body_at + size]
        i = body_at + size + (size % 2)  # IFF pad
    if comm is None:
        raise ValueError("AIFF missing COMM chunk")
    if ssnd is None:
        raise ValueError("AIFF missing SSND chunk")
    ch, frames, bits = struct.unpack_from(">hIh", comm, 0)
    rate = _f80_to_rate(comm[8:18])
    if ch not in (1, 2):
        raise NotImplementedError(f"{ch}-channel AIFF unsupported")
    if bits != 16:
        raise NotImplementedError(f"{bits}-bit AIFF unsupported (16 only)")
    if len(ssnd) < 8:
        raise ValueError("SSND shorter than its offset/blockSize header")
    offset, _block = struct.unpack_from(">II", ssnd, 0)
    data = ssnd[8 + offset :]
    need = frames * ch * 2
    if len(data) < need:
        raise ValueError(f"SSND data {len(data)} < {need} for {frames} frames")
    s = np.frombuffer(data[:need], dtype=">i2").astype(np.int16)
    return {
        "sample_rate": int(rate),
        "channels": int(ch),
        "n_frames": int(frames),
        "samples": s if ch == 1 else s.reshape(-1, 2),
    }
