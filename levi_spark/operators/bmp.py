"""Windows BMP codec — pure stdlib + numpy.

The screenshot/scan interchange format desktop tooling still emits by
the truckload; a crawl-scale multimodal pipeline meets it constantly.
Supported profile (strict — malformed files raise):

* ``BM`` file header (14 bytes) + BITMAPINFOHEADER (40 bytes,
  little-endian throughout — BMP has no byte-order switch);
* 24-bit BI_RGB: BOTTOM-UP row order (positive height; the format's
  default), BGR byte order in the pixel array, each row padded to a
  4-byte boundary — the three classic trip-wires;
* top-down images via NEGATIVE height (the spec's own encoding);
* 8-bit paletted BI_RGB and BI_RLE8 (compression 1): the run-length
  coding with its escape codes — 0,0 end-of-line, 0,1 end-of-bitmap,
  0,2 dx,dy delta (refused here: a delta leaves pixels undefined),
  0,n>=3 absolute literal run padded to a word boundary.

The palette (BGRX quads) maps indices back to RGB on decode, so both
profiles return (H, W, 3) uint8 in row-major top-down order.
Cross-validated sizes/offsets; other depths/compressions refuse
loudly. North-star extension surface like
:mod:`levi_spark.operators.tiff`.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_bmp(
    img: np.ndarray,
    rle: bool = False,
    palette: np.ndarray | None = None,
    top_down: bool = False,
) -> bytes:
    """(H, W, 3) uint8 -> 24-bit BI_RGB, or (H, W) uint8 indices +
    ``palette`` (N<=256, 3) -> 8-bit paletted (BI_RGB, or BI_RLE8
    when ``rle``). ``top_down`` writes negative height (24-bit only —
    RLE8 is bottom-up by spec)."""
    a8 = np.asarray(img, dtype=np.uint8)
    if a8.ndim == 3 and a8.shape[2] == 3:
        if rle:
            raise ValueError("RLE8 needs an 8-bit paletted image")
        h, w = a8.shape[:2]
        row_bytes = (w * 3 + 3) & ~3
        body = bytearray()
        rows = a8 if top_down else a8[::-1]
        for row in rows:
            bgr = row[:, ::-1].tobytes()
            body.extend(bgr + b"\x00" * (row_bytes - len(bgr)))
        return _wrap(w, h, 24, 0, b"", bytes(body), top_down)
    if a8.ndim != 2:
        raise ValueError(f"BMP needs (H,W,3) or (H,W)+palette, got {a8.shape}")
    if palette is None:
        raise ValueError("8-bit BMP needs a palette")
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= len(pal) <= 256:
        raise ValueError(f"palette shape {pal.shape} invalid")
    if int(a8.max(initial=0)) >= len(pal):
        raise ValueError("pixel index beyond palette")
    h, w = a8.shape
    quads = bytearray()
    for r, g, b in pal.tolist():
        quads.extend((b, g, r, 0))
    if not rle:
        row_bytes = (w + 3) & ~3
        body = bytearray()
        for row in a8[::-1]:
            body.extend(row.tobytes() + b"\x00" * (row_bytes - w))
        return _wrap(w, h, 8, 0, bytes(quads), bytes(body), False)
    body = bytearray()
    for y, row in enumerate(a8[::-1]):
        x = 0
        vals = row.tolist()
        while x < w:
            run = 1
            while x + run < w and run < 255 and vals[x + run] == vals[x]:
                run += 1
            if run >= 2 or w - x == 1:
                body.extend((run, vals[x]))
                x += run
                continue
            j = x + 1
            while j < w and j - x < 255:
                if j + 1 < w and vals[j + 1] == vals[j]:
                    break
                j += 1
            lit = vals[x:j]
            if len(lit) < 3:  # absolute mode needs >= 3; emit unit runs
                for v in lit:
                    body.extend((1, v))
            else:
                body.extend((0, len(lit)))
                body.extend(lit)
                if len(lit) % 2:
                    body.append(0)  # word-align
            x = j
        body.extend((0, 0))  # end of line
    body.extend((0, 1))  # end of bitmap
    return _wrap(w, h, 8, 1, bytes(quads), bytes(body), False)


def _wrap(
    w: int, h: int, bpp: int, comp: int, palette: bytes, body: bytes,
    top_down: bool,
) -> bytes:
    off = 14 + 40 + len(palette)
    file_hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, w, -h if top_down else h, 1, bpp, comp, len(body),
        2835, 2835, len(palette) // 4, 0,
    )
    return file_hdr + info + palette + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes -> (H, W, 3) uint8 RGB, top-down row order."""
    if len(payload) < 54:
        raise ValueError("BMP shorter than headers")
    magic, fsize, _r1, _r2, off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP (starts {payload[:2]!r})")
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise NotImplementedError(f"BITMAPCOREHEADER ({hdr_size}) unsupported")
    _, w, h_signed, planes, bpp, comp, _img_size, _, _, clr_used, _ = (
        struct.unpack_from("<IiiHHIIiiII", payload, 14)
    )
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        raise ValueError(f"BMP dimensions {w}x{h_signed} invalid")
    if planes != 1:
        raise ValueError(f"BMP planes {planes} != 1")
    if off > len(payload):
        raise ValueError("pixel-array offset beyond file")
    if bpp == 24 and comp == 0:
        row_bytes = (w * 3 + 3) & ~3
        need = off + row_bytes * h
        if len(payload) < need:
            raise ValueError(f"24-bit body truncated ({len(payload)}/{need})")
        rows = np.frombuffer(
            payload[off : off + row_bytes * h], np.uint8
        ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        rgb = rows[:, :, ::-1]
        return np.ascontiguousarray(rgb if top_down else rgb[::-1])
    if bpp == 8:
        n_colors = clr_used or 256
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_colors > off:
            raise ValueError("palette overruns pixel-array offset")
        quads = np.frombuffer(
            payload[pal_off : pal_off + 4 * n_colors], np.uint8
        ).reshape(n_colors, 4)
        pal = quads[:, :3][:, ::-1]  # BGRX -> RGB
        if comp == 0:
            if top_down:
                raise NotImplementedError("top-down paletted BMP unsupported")
            row_bytes = (w + 3) & ~3
            need = off + row_bytes * h
            if len(payload) < need:
                raise ValueError(f"8-bit body truncated ({len(payload)}/{need})")
            idx = np.frombuffer(
                payload[off : off + row_bytes * h], np.uint8
            ).reshape(h, row_bytes)[:, :w][::-1]
        elif comp == 1:  # BI_RLE8
            if top_down:
                raise ValueError("RLE8 is bottom-up by spec")
            idx = np.zeros((h, w), np.uint8)
            i, x, y = off, 0, 0
            while True:
                if i + 2 > len(payload):
                    raise ValueError("RLE8 stream truncated")
                n, v = payload[i], payload[i + 1]
                i += 2
                if n:
                    if y >= h or x + n > w:
                        raise ValueError(
                            f"RLE8 run overruns row at ({x},{y})+{n}"
                        )
                    idx[h - 1 - y, x : x + n] = v
                    x += n
                elif v == 0:
                    x, y = 0, y + 1
                elif v == 1:
                    break
                elif v == 2:
                    raise NotImplementedError(
                        "RLE8 delta escape leaves pixels undefined — refused"
                    )
                else:
                    if y >= h or x + v > w:
                        raise ValueError(
                            f"RLE8 literal overruns row at ({x},{y})+{v}"
                        )
                    if i + v > len(payload):
                        raise ValueError("RLE8 literal truncated")
                    idx[h - 1 - y, x : x + v] = np.frombuffer(
                        payload[i : i + v], np.uint8
                    )
                    x += v
                    i += v + (v % 2)
        else:
            raise NotImplementedError(f"8-bit compression {comp} unsupported")
        if int(idx.max(initial=0)) >= n_colors:
            raise ValueError("pixel index beyond palette")
        return pal[idx]
    raise NotImplementedError(f"{bpp}-bit compression-{comp} BMP unsupported")
