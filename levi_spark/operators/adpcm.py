"""Compressed telephony/game audio codecs for the multimodal plane —
IMA ADPCM (WAVE format tag 0x0011) and G.711 mu-law / A-law (tags
0x0007 / 0x0006), pure stdlib + numpy. Narrows the compressed-audio
seam (:mod:`levi_spark.operators.multimodal` refuses MP3/AAC/Opus):
these three are the compressed formats classic telephony dumps, game
assets and speech corpora actually use inside WAV containers, and all
three are INTEGER-EXACT — the IMA decoder is a pure int state machine
(step/index tables, no floats), G.711 expansion is a closed-form
integer map — so decode results hash identically across engines.

IMA ADPCM (IMA/DVI4 as carried in WAVE, Microsoft block layout):
4-bit codes, two per byte (LOW nibble first); per-channel 89-entry
step-size table with index adjustments [-1,-1,-1,-1,2,4,6,8];
per-block 4-byte header ``<int16 samp0, uint8 step_index, uint8 0>``
whose samp0 is emitted verbatim as the block's first output sample
(so ``samples_per_block = 1 + 2*(block_align - 4)`` for mono). Blocks
restart the predictor from their own header — seeking needs no
history. The WAVE mux writes the extended ``fmt `` (cbSize=2,
wSamplesPerBlock) plus the ``fact`` chunk with the true sample count,
and the demux validates both against the data chunk.

G.711: 8-bit logarithmic companding. mu-law: ``u' = ~u``, exponent
``e=(u'>>4)&7``, mantissa ``m=u'&15``, magnitude
``((2m+33)<<e)-33``, sign from bit 7 (14-bit range, +-8031). A-law:
even-bit inversion (XOR 0x55), 13-bit range +-4032 per G.711 tables.
Both decode tables round-trip their own encoders exactly.

The reference engine has no media surface; this module is north-star
extension surface like :mod:`levi_spark.operators.flac`.
"""

from __future__ import annotations

import struct

import numpy as np

# fmt: off
IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
# fmt: on
IMA_INDEX_ADJUST = (-1, -1, -1, -1, 2, 4, 6, 8)

WAVE_FORMAT_IMA_ADPCM = 0x0011
WAVE_FORMAT_ALAW = 0x0006
WAVE_FORMAT_MULAW = 0x0007


def ima_decode_codes(
    codes: np.ndarray, predictor: int, step_index: int
) -> tuple[np.ndarray, int, int]:
    """Run the IMA state machine over 4-bit codes from a given state.

    Returns (decoded int16 samples — one per code, NOT including the
    seed predictor — final predictor, final step index). Sequentially
    dependent by construction, so a plain loop; at scale each payload
    decodes independently inside an Arrow batch.
    """
    codes = np.asarray(codes, dtype=np.int64)
    if codes.size and (codes.min() < 0 or codes.max() > 15):
        raise ValueError("IMA codes must be 4-bit")
    if not -32768 <= predictor <= 32767:
        raise ValueError(f"predictor {predictor} out of int16 range")
    if not 0 <= step_index <= 88:
        raise ValueError(f"step index {step_index} out of [0, 88]")
    pred, idx = int(predictor), int(step_index)
    out = np.empty(codes.size, dtype=np.int64)
    for i, code in enumerate(codes):
        step = IMA_STEPS[idx]
        diff = step >> 3
        if code & 1:
            diff += step >> 2
        if code & 2:
            diff += step >> 1
        if code & 4:
            diff += step
        pred = pred - diff if code & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + IMA_INDEX_ADJUST[code & 7]))
        out[i] = pred
    return out, pred, idx


def ima_encode_samples(
    samples: np.ndarray, predictor: int = 0, step_index: int = 0
) -> tuple[np.ndarray, int, int]:
    """Canonical IMA encoder: quantize each sample's delta from the
    running prediction to a 4-bit code. Returns (codes, final
    predictor, final step index); decoding the codes from the same
    seed state reproduces the encoder's prediction trajectory exactly
    (the round-trip law pinned in tests)."""
    pred, idx = int(predictor), int(step_index)
    codes = np.empty(len(samples), dtype=np.int64)
    for i, s in enumerate(np.asarray(samples, dtype=np.int64)):
        step = IMA_STEPS[idx]
        delta = int(s) - pred
        code = 8 if delta < 0 else 0
        if delta < 0:
            delta = -delta
        if delta >= step:
            code |= 4
            delta -= step
        if delta >= step >> 1:
            code |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            code |= 1
        codes[i] = code
        # track the decoder's reconstruction
        step_ = IMA_STEPS[idx]
        diff = step_ >> 3
        if code & 1:
            diff += step_ >> 2
        if code & 2:
            diff += step_ >> 1
        if code & 4:
            diff += step_
        pred = pred - diff if code & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + IMA_INDEX_ADJUST[code & 7]))
    return codes, pred, idx


def _pack_nibbles(codes: np.ndarray) -> bytes:
    """4-bit codes -> bytes, LOW nibble first (WAVE IMA layout)."""
    c = np.asarray(codes, dtype=np.int64)
    if c.size % 2:
        raise ValueError("IMA blocks carry an even number of codes")
    return (c[0::2] | (c[1::2] << 4)).astype(np.uint8).tobytes()


def _unpack_nibbles(data: bytes) -> np.ndarray:
    b = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    out = np.empty(2 * b.size, dtype=np.int64)
    out[0::2] = b & 0x0F
    out[1::2] = b >> 4
    return out


def encode_wav_ima(
    blocks: list[tuple[int, int, np.ndarray]],
    sample_rate: int,
    codes_per_block: int | None = None,
) -> bytes:
    """Mux mono IMA ADPCM blocks into a WAVE container.

    ``blocks`` is a list of ``(samp0, step_index, codes)`` — each
    block's header sample, seed step index, and its 4-bit codes. All
    blocks must carry the same (even) code count so block_align is
    constant, per the format contract.
    """
    if not blocks:
        raise ValueError("need at least one IMA block")
    ncodes = len(blocks[0][2]) if codes_per_block is None else codes_per_block
    data = b""
    for samp0, step_index, codes in blocks:
        if len(codes) != ncodes:
            raise ValueError("all IMA blocks must have equal code counts")
        data += struct.pack("<hBB", samp0, step_index, 0) + _pack_nibbles(
            np.asarray(codes)
        )
    block_align = 4 + ncodes // 2
    samples_per_block = 1 + ncodes
    total_samples = len(blocks) * samples_per_block
    avg_bps = (sample_rate * block_align + samples_per_block - 1) // samples_per_block
    fmt = struct.pack(
        "<HHIIHHHH",
        WAVE_FORMAT_IMA_ADPCM,
        1,
        sample_rate,
        avg_bps,
        block_align,
        4,  # wBitsPerSample
        2,  # cbSize
        samples_per_block,
    )
    fact = struct.pack("<I", total_samples)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<I", len(fact))
        + fact
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_wave(payload: bytes) -> dict[bytes, bytes]:
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(f"not RIFF/WAVE: {payload[:12]!r}")
    chunks: dict[bytes, bytes] = {}
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"chunk {cid!r} truncated")
        chunks[cid] = body
        pos += 8 + size + (size & 1)
    return chunks


def decode_wav_ima(payload: bytes) -> tuple[int, np.ndarray]:
    """WAVE(tag 0x11, mono) -> (sample_rate, int16 samples). Walks
    blocks, emits each header samp0 then the nibble-decoded samples,
    and validates fmt/fact/data consistency (block align vs samples
    per block, fact count vs decoded count)."""
    chunks = _walk_wave(payload)
    if b"fmt " not in chunks or b"data" not in chunks:
        raise ValueError("missing fmt/data chunk")
    fmt = chunks[b"fmt "]
    tag, channels, sample_rate, _bps, block_align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if tag != WAVE_FORMAT_IMA_ADPCM:
        raise ValueError(f"format tag {tag:#06x} is not IMA ADPCM")
    if channels != 1:
        raise NotImplementedError("stereo IMA ADPCM unsupported (mono only)")
    if bits != 4:
        raise ValueError(f"IMA ADPCM must be 4-bit, got {bits}")
    if len(fmt) < 20:
        raise ValueError("IMA fmt chunk missing wSamplesPerBlock")
    (spb,) = struct.unpack("<H", fmt[18:20])
    if spb != 1 + 2 * (block_align - 4):
        raise ValueError(
            f"wSamplesPerBlock {spb} disagrees with block align "
            f"{block_align} (want {1 + 2 * (block_align - 4)})"
        )
    data = chunks[b"data"]
    if len(data) % block_align:
        raise ValueError(
            f"data size {len(data)} is not a multiple of block align "
            f"{block_align}"
        )
    out: list[np.ndarray] = []
    for off in range(0, len(data), block_align):
        samp0, step_index, _rsv = struct.unpack_from("<hBB", data, off)
        codes = _unpack_nibbles(data[off + 4 : off + block_align])
        dec, _p, _i = ima_decode_codes(codes, samp0, step_index)
        out.append(np.concatenate(([samp0], dec)))
    samples = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
    if b"fact" in chunks:
        (n,) = struct.unpack("<I", chunks[b"fact"][:4])
        if n != samples.size:
            raise ValueError(
                f"fact says {n} samples, data decodes to {samples.size}"
            )
    return sample_rate, samples.astype(np.int16)


# ---------------------------------------------------------------- G.711


def mulaw_expand(codes: np.ndarray) -> np.ndarray:
    """G.711 mu-law bytes -> linear samples in [-8031, 8031]
    (vectorized closed form; 14-bit magnitude convention)."""
    u = (~np.asarray(codes, dtype=np.int64)) & 0xFF
    sign = u & 0x80
    e = (u >> 4) & 0x07
    m = u & 0x0F
    mag = (((2 * m + 33) << e) - 33).astype(np.int64)
    return np.where(sign != 0, -mag, mag)


def mulaw_compress(samples: np.ndarray) -> np.ndarray:
    """Linear -> mu-law bytes (inverse of :func:`mulaw_expand` on its
    exact output lattice; clamps magnitudes beyond 8031)."""
    x = np.asarray(samples, dtype=np.int64)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 8031) + 33
    e = (np.floor(np.log2(mag)).astype(np.int64) - 5).clip(0, 7)
    m = (mag >> (e + 1)) & 0x0F
    return (~(sign | (e << 4) | m)) & 0xFF


def alaw_expand(codes: np.ndarray) -> np.ndarray:
    """G.711 A-law bytes -> linear samples in [-4032, 4032]
    (even-bit inversion, 13-bit convention)."""
    a = np.asarray(codes, dtype=np.int64) ^ 0x55
    sign = a & 0x80
    e = (a >> 4) & 0x07
    m = a & 0x0F
    mag = np.where(e == 0, 2 * m + 1, (2 * m + 33) << (e - 1))
    return np.where(sign != 0, -mag, mag)


def alaw_compress(samples: np.ndarray) -> np.ndarray:
    """Linear -> A-law bytes (inverse of :func:`alaw_expand` on its
    exact output lattice; clamps magnitudes beyond 4032)."""
    x = np.asarray(samples, dtype=np.int64)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 4032)
    e = np.maximum(np.floor(np.log2(np.maximum(mag, 1))).astype(np.int64) - 4, 0)
    m = np.where(e == 0, mag >> 1, (mag >> e) - 16)
    return (sign | (e << 4) | m) ^ 0x55


def encode_wav_g711(
    codes: np.ndarray, sample_rate: int, law: str = "mu"
) -> bytes:
    """Mux raw G.711 code bytes into a WAVE container (tag 7 or 6,
    mono, 8-bit) with the spec's fact chunk."""
    c = np.asarray(codes, dtype=np.int64)
    if c.size and (c.min() < 0 or c.max() > 255):
        raise ValueError("G.711 codes must be bytes")
    tag = WAVE_FORMAT_MULAW if law == "mu" else WAVE_FORMAT_ALAW
    data = c.astype(np.uint8).tobytes()
    fmt = struct.pack(
        "<HHIIHHH", tag, 1, sample_rate, sample_rate, 1, 8, 0
    )
    fact = struct.pack("<I", c.size)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<I", len(fact))
        + fact
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_g711(payload: bytes) -> tuple[int, np.ndarray]:
    """WAVE(tag 7/6, mono 8-bit) -> (sample_rate, expanded linear
    samples)."""
    chunks = _walk_wave(payload)
    if b"fmt " not in chunks or b"data" not in chunks:
        raise ValueError("missing fmt/data chunk")
    tag, channels, sample_rate, _bps, _ba, bits = struct.unpack(
        "<HHIIHH", chunks[b"fmt "][:16]
    )
    if tag not in (WAVE_FORMAT_MULAW, WAVE_FORMAT_ALAW):
        raise ValueError(f"format tag {tag:#06x} is not G.711")
    if channels != 1 or bits != 8:
        raise NotImplementedError("G.711 WAV must be mono 8-bit")
    codes = np.frombuffer(chunks[b"data"], dtype=np.uint8)
    if b"fact" in chunks:
        (n,) = struct.unpack("<I", chunks[b"fact"][:4])
        if n != codes.size:
            raise ValueError(f"fact says {n} samples, data has {codes.size}")
    expand = mulaw_expand if tag == WAVE_FORMAT_MULAW else alaw_expand
    return sample_rate, expand(codes)


def ima_audio_stats(payload: bytes) -> dict:
    """Integer-exact per-payload stats for the driver gate: every
    field is an int64, so the cross-engine value-hash compare cannot
    drift (the state machine is pure integer arithmetic)."""
    sample_rate, a = decode_wav_ima(payload)
    x = a.astype(np.int64)
    return {
        "sample_rate": int(sample_rate),
        "n_samples": int(x.size),
        "last_sample": int(x[-1]) if x.size else 0,
        "sum_samples": int(x.sum()),
        "sum_abs": int(np.abs(x).sum()),
    }


def g711_audio_stats(payload: bytes) -> dict:
    """Integer-exact per-payload stats for the G.711 gate."""
    sample_rate, a = decode_wav_g711(payload)
    x = a.astype(np.int64)
    return {
        "sample_rate": int(sample_rate),
        "n_samples": int(x.size),
        "last_sample": int(x[-1]) if x.size else 0,
        "sum_samples": int(x.sum()),
        "sum_abs": int(np.abs(x).sum()),
    }


def ima_audio_decoder(payload: bytes) -> dict:
    """Drop-in ``decoder`` for
    :func:`levi_spark.operators.multimodal.decode_audio_features`."""
    sample_rate, a = decode_wav_ima(payload)
    x = a.astype(np.float64)
    return {
        "sample_rate": sample_rate,
        "n_samples": int(a.size),
        "rms": float(np.sqrt((x * x).sum() / max(1, x.size))),
    }
