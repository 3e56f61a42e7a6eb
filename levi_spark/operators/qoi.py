"""QOI ("Quite OK Image") codec — pure stdlib + numpy.

The 2021 single-page lossless image format (qoiformat.org spec,
public domain) increasingly used for fast intermediate storage in
image pipelines — exactly the "decode cheaply inside the Arrow batch"
slot a training-data pipeline wants. One chunk stream, six ops:

* ``QOI_OP_RGB``   (0xFE): 3 literal bytes r,g,b
* ``QOI_OP_RGBA``  (0xFF): 4 literal bytes r,g,b,a
* ``QOI_OP_INDEX`` (0b00xxxxxx): replay ``index[x]`` from the
  64-entry running array keyed by ``(3r+5g+7b+11a) % 64``
* ``QOI_OP_DIFF``  (0b01drdgdb): per-channel -2..1 deltas (bias 2),
  alpha unchanged
* ``QOI_OP_LUMA``  (0b10dddddd + byte): dg in -32..31 (bias 32),
  dr-dg and db-dg in -8..7 (bias 8)
* ``QOI_OP_RUN``   (0b11xxxxxx): repeat previous pixel 1..62 times
  (biases -1; 63 and 64 are the RGB/RGBA tags)

Header: ``qoif`` + width/height (big-endian u32) + channels (3|4) +
colorspace (0|1). Stream ends with seven 0x00 bytes then 0x01.
Previous pixel starts (0,0,0,255); the index array starts zeroed.

Strict: truncated streams, pixel over/underrun, bad headers, and a
missing end marker all raise. The reference engine has no media
surface; north-star extension surface like
:mod:`levi_spark.operators.tiff`.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(img: np.ndarray, colorspace: int = 0) -> bytes:
    """uint8 (H, W, 3|4) -> QOI bytes. Deterministic: the spec's op
    priority is fixed (run > index > diff > luma > literal), so equal
    pixels always encode to equal bytes."""
    a8 = np.asarray(img, dtype=np.uint8)
    if a8.ndim != 3 or a8.shape[2] not in (3, 4):
        raise ValueError(f"QOI needs (H, W, 3|4) uint8, got {a8.shape}")
    h, w, ch = a8.shape
    if colorspace not in (0, 1):
        raise ValueError("colorspace is 0 (sRGB) or 1 (linear)")
    out = bytearray(_MAGIC + struct.pack(">IIBB", w, h, ch, colorspace))

    px = a8.reshape(-1, ch).astype(np.int64)
    if ch == 3:
        px = np.concatenate(
            [px, np.full((len(px), 1), 255, np.int64)], axis=1
        )
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    for r, g, b, a in map(tuple, px):
        cur = (r, g, b, a)
        if cur == prev:
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        k = _hash(r, g, b, a)
        if index[k] == cur:
            out.append(k)  # QOI_OP_INDEX
        else:
            index[k] = cur
            if a == prev[3]:
                dr, dg, db = r - prev[0], g - prev[1], b - prev[2]
                dr, dg, db = (
                    (dr + 128) % 256 - 128,
                    (dg + 128) % 256 - 128,
                    (db + 128) % 256 - 128,
                )
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(
                        0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)
                    )
                elif (
                    -32 <= dg <= 31
                    and -8 <= dr - dg <= 7
                    and -8 <= db - dg <= 7
                ):
                    out.append(0x80 | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out.append(0xFE)
                    out.extend((r, g, b))
            else:
                out.append(0xFF)
                out.extend((r, g, b, a))
        prev = cur
    if run:
        out.append(0xC0 | (run - 1))
    out.extend(_END)
    return bytes(out)


def decode_qoi(payload: bytes) -> tuple[np.ndarray, int]:
    """QOI bytes -> ((H, W, 3|4) uint8, colorspace). Strict: raises on
    bad magic, over/underrun, truncation, or a wrong end marker."""
    if len(payload) < 14 + 8:
        raise ValueError("QOI shorter than header + end marker")
    if payload[:4] != _MAGIC:
        raise ValueError(f"not QOI (starts {payload[:4]!r})")
    w, h, ch, cs = struct.unpack_from(">IIBB", payload, 4)
    if ch not in (3, 4):
        raise ValueError(f"QOI channels {ch} invalid")
    if cs not in (0, 1):
        raise ValueError(f"QOI colorspace {cs} invalid")
    n = w * h
    if n == 0:
        raise ValueError("QOI zero-pixel image")
    px = np.empty((n, 4), np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    i, pos = 14, 0
    end = len(payload) - 8
    while pos < n:
        if i >= end:
            raise ValueError(
                f"QOI stream exhausted at pixel {pos}/{n}"
            )
        op = payload[i]
        i += 1
        if op == 0xFE:  # RGB
            r, g, b = payload[i : i + 3]
            i += 3
        elif op == 0xFF:  # RGBA
            r, g, b, a = payload[i : i + 4]
            i += 4
        elif op >> 6 == 0b00:  # INDEX
            r, g, b, a = index[op & 0x3F]
        elif op >> 6 == 0b01:  # DIFF
            r = (r + ((op >> 4) & 3) - 2) % 256
            g = (g + ((op >> 2) & 3) - 2) % 256
            b = (b + (op & 3) - 2) % 256
        elif op >> 6 == 0b10:  # LUMA
            dg = (op & 0x3F) - 32
            arg = payload[i]
            i += 1
            r = (r + dg + ((arg >> 4) & 0xF) - 8) % 256
            g = (g + dg) % 256
            b = (b + dg + (arg & 0xF) - 8) % 256
        else:  # RUN
            run = (op & 0x3F) + 1
            if pos + run > n:
                raise ValueError(
                    f"QOI run overruns image at pixel {pos}+{run}/{n}"
                )
            px[pos : pos + run] = (r, g, b, a)
            pos += run
            index[_hash(r, g, b, a)] = (r, g, b, a)
            continue
        px[pos] = (r, g, b, a)
        pos += 1
        index[_hash(r, g, b, a)] = (r, g, b, a)
    if payload[i : i + 8] != _END:
        raise ValueError("QOI end marker missing or misplaced")
    if i + 8 != len(payload):
        raise ValueError(f"{len(payload) - i - 8} bytes after QOI end marker")
    img = px.reshape(h, w, 4)
    return (img[:, :, :3].copy() if ch == 3 else img), cs
