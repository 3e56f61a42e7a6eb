"""Truevision TGA codec — pure stdlib + numpy.

The game-asset/texture raster format (Truevision TGA 2.0 spec, 1991,
public) still common in 3D/game corpora. Little-endian 18-byte
header, BGR(A) pixel order, BOTTOM-UP rows by default with the
image-descriptor bit 5 flipping to top-down — a third family of
row-order/byte-order trip-wires after BMP and AIFF.

Supported profile (strict — malformed files raise):

* type 2 (uncompressed truecolor) at 24 or 32 bits,
* type 3 (uncompressed grayscale) at 8 bits,
* type 10 (RLE truecolor): high-bit packets are runs of
  ``(n & 0x7F) + 1`` copies of ONE pixel, low-bit packets are that
  many literal pixels; this encoder never crosses a scan line (the
  spec's rule) and the decoder enforces exact pixel-count landing,
* both row orders via descriptor bit 5; an ID field is skipped by
  its declared length.

Color-mapped types (1/9) and 16-bit depths refuse loudly. Returns
(H, W, C) uint8 RGB(A) or (H, W) gray in top-down order. North-star
extension surface like :mod:`levi_spark.operators.bmp`.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_tga(
    img: np.ndarray, rle: bool = False, top_down: bool = False
) -> bytes:
    """(H, W) gray, (H, W, 3) RGB, or (H, W, 4) RGBA uint8 -> TGA."""
    a8 = np.asarray(img, dtype=np.uint8)
    if a8.ndim == 2:
        if rle:
            raise NotImplementedError("grayscale RLE (type 11) not written")
        itype, depth, ch = 3, 8, 1
    elif a8.ndim == 3 and a8.shape[2] in (3, 4):
        ch = a8.shape[2]
        depth = ch * 8
        itype = 10 if rle else 2
    else:
        raise ValueError(f"TGA needs (H,W[,3|4]) uint8, got {a8.shape}")
    h, w = a8.shape[:2]
    alpha_bits = 8 if ch == 4 else 0
    desc = alpha_bits | (0x20 if top_down else 0)
    hdr = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, itype, 0, 0, 0, 0, 0, w, h, depth, desc
    )
    rows = a8 if top_down else a8[::-1]
    if ch == 1:
        return hdr + rows.tobytes()
    bgr = rows[:, :, [2, 1, 0]] if ch == 3 else rows[:, :, [2, 1, 0, 3]]
    if not rle:
        return hdr + bgr.tobytes()
    body = bytearray()
    for row in bgr:
        px = [bytes(p) for p in row.tolist()]
        x = 0
        while x < w:
            run = 1
            while x + run < w and run < 128 and px[x + run] == px[x]:
                run += 1
            if run >= 2:
                body.append(0x80 | (run - 1))
                body.extend(px[x])
                x += run
                continue
            j = x + 1
            while j < w and j - x < 128:
                if j + 1 < w and px[j + 1] == px[j]:
                    break
                j += 1
            body.append(j - x - 1)
            for p in px[x:j]:
                body.extend(p)
            x = j
    return hdr + bytes(body)


def decode_tga(payload: bytes) -> np.ndarray:
    if len(payload) < 18:
        raise ValueError("TGA shorter than header")
    (
        id_len, cmap_type, itype, _cm_first, _cm_len, _cm_size,
        _xo, _yo, w, h, depth, desc,
    ) = struct.unpack_from("<BBBHHBHHHHBB", payload, 0)
    if w <= 0 or h <= 0:
        raise ValueError(f"TGA dimensions {w}x{h} invalid")
    if cmap_type != 0 or itype in (1, 9):
        raise NotImplementedError("color-mapped TGA unsupported")
    top_down = bool(desc & 0x20)
    if desc & 0x10:
        raise NotImplementedError("right-to-left TGA unsupported")
    at = 18 + id_len
    if itype == 3:
        if depth != 8:
            raise NotImplementedError(f"{depth}-bit grayscale unsupported")
        need = w * h
        if len(payload) < at + need:
            raise ValueError(f"grayscale body truncated ({len(payload)-at}/{need})")
        img = np.frombuffer(payload[at : at + need], np.uint8).reshape(h, w)
        return np.ascontiguousarray(img if top_down else img[::-1])
    if itype not in (2, 10):
        raise NotImplementedError(f"TGA image type {itype} unsupported")
    if depth not in (24, 32):
        raise NotImplementedError(f"{depth}-bit truecolor unsupported")
    ch = depth // 8
    n = w * h
    if itype == 2:
        need = n * ch
        if len(payload) < at + need:
            raise ValueError(f"truecolor body truncated ({len(payload)-at}/{need})")
        flat = np.frombuffer(payload[at : at + need], np.uint8).reshape(n, ch)
    else:
        flat = np.empty((n, ch), np.uint8)
        i, pos = at, 0
        while pos < n:
            if i >= len(payload):
                raise ValueError(f"RLE stream exhausted at pixel {pos}/{n}")
            head = payload[i]
            i += 1
            cnt = (head & 0x7F) + 1
            if pos + cnt > n:
                raise ValueError(f"RLE packet overruns image at {pos}+{cnt}/{n}")
            if head & 0x80:
                if i + ch > len(payload):
                    raise ValueError("RLE run pixel truncated")
                flat[pos : pos + cnt] = np.frombuffer(
                    payload[i : i + ch], np.uint8
                )
                i += ch
            else:
                if i + cnt * ch > len(payload):
                    raise ValueError("RLE literal packet truncated")
                flat[pos : pos + cnt] = np.frombuffer(
                    payload[i : i + cnt * ch], np.uint8
                ).reshape(cnt, ch)
                i += cnt * ch
            pos += cnt
    img = flat.reshape(h, w, ch)
    rgb = img[:, :, [2, 1, 0]] if ch == 3 else img[:, :, [2, 1, 0, 3]]
    return np.ascontiguousarray(rgb if top_down else rgb[::-1])
