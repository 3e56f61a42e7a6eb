"""Real PNG codec for the multimodal plane — pure stdlib ``zlib`` +
numpy, no PIL. Closes the first compressed-format seam in
:mod:`levi_spark.operators.multimodal` (netpbm and RIFF/PCM WAV are the
uncompressed siblings): the engine can now decode a genuinely
DEFLATE-compressed, scanline-filtered image format end to end, which is
what a production multimodal ingest actually receives.

Supported profile (the dominant one for ML image corpora): 8-bit
greyscale (color type 0) and truecolor RGB (color type 2), all five
scanline filters (None/Sub/Up/Average/Paeth — PNG spec §9
'Filtering'), and BOTH interlace methods — sequential and Adam7
(seven sub-image passes with per-pass filter context, spec §8.2),
on encode and decode. Everything else — palette, alpha, 16-bit —
raises ``ValueError`` rather than misreading.

Layout (PNG spec): 8-byte signature, then chunks of
``len(4 BE) | type(4) | data | crc32(type+data)``. IHDR carries
width/height/bit-depth/color-type/compression/filter/interlace; IDAT
chunks concatenate into one zlib stream of ``height`` scanlines, each
``1 filter byte + width*bpp`` filtered samples; IEND terminates.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# filter type ids (PNG spec §9)
F_NONE, F_SUB, F_UP, F_AVERAGE, F_PAETH = 0, 1, 2, 3, 4


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor: nearest of left/up/up-left to a+b-c, ties
    breaking left, then up (spec-mandated order — a different tie
    break corrupts the raster)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


# Adam7 pass origins and steps: (x0, y0, xstep, ystep), spec §8.2
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _filter_lines(raw: np.ndarray, bpp: int, line_filters) -> bytearray:
    """Filter one (sub-)image: (h, stride) uint8 rows -> the PNG
    scanline stream (1 filter byte + filtered samples per row), with
    fresh prior-row context (a pass boundary resets `prior` per
    spec)."""
    h = raw.shape[0]
    stride = raw.shape[1]
    stream = bytearray()
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = raw[y]
        ft = line_filters[y]
        left = np.concatenate([np.zeros(bpp, np.uint8), line[:-bpp]])
        if ft == F_NONE:
            out = line
        elif ft == F_SUB:
            out = line - left  # uint8 wraps mod 256, per spec
        elif ft == F_UP:
            out = line - prior
        elif ft == F_AVERAGE:
            up_left_mean = (
                (left.astype(np.uint16) + prior.astype(np.uint16)) // 2
            ).astype(np.uint8)
            out = line - up_left_mean
        elif ft == F_PAETH:
            prior_left = np.concatenate([np.zeros(bpp, np.uint8), prior[:-bpp]])
            pred = np.fromiter(
                (
                    _paeth(int(la), int(pa_), int(pl))
                    for la, pa_, pl in zip(left, prior, prior_left)
                ),
                dtype=np.uint8,
                count=stride,
            )
            out = line - pred
        else:
            raise ValueError(f"unknown filter id {ft}")
        stream.append(ft)
        stream.extend(out.tobytes())
        prior = line
    return stream


def _make_filters(filters, h: int):
    if filters == "cycle":
        return [i % 5 for i in range(h)]
    if filters == "none":
        return [F_NONE] * h
    line_filters = list(filters)
    if len(line_filters) != h:
        raise ValueError(f"need {h} filter ids, got {len(line_filters)}")
    return line_filters


def encode_png(pixels: np.ndarray, filters="cycle",
               interlace: bool = False) -> bytes:
    """uint8 array (H, W) -> greyscale PNG; (H, W, 3) -> RGB PNG.

    ``filters`` picks the per-scanline filter: ``"cycle"`` rotates
    through all five types (so a decoder of this stream must implement
    every defilter path — the encode side of our own test oracle),
    ``"none"`` emits unfiltered lines, or pass an explicit list of
    filter ids, one per scanline (sequential mode only).
    ``interlace=True`` emits an Adam7 stream: seven sub-image passes,
    each with its own scanlines and filter context."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        color_type, bpp = 0, 1
        h, w = a.shape
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, bpp = 2, 3
        h, w = a.shape[:2]
    else:
        raise ValueError(f"expected (H,W) or (H,W,3) uint8, got {a.shape}")
    a3 = a.reshape(h, w, bpp)
    stream = bytearray()
    if interlace:
        if not isinstance(filters, str):
            raise ValueError(
                "explicit per-line filters are for sequential mode"
            )
        for x0, y0, xs, ys in _ADAM7:
            sub = a3[y0::ys, x0::xs]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue  # empty pass emits nothing, per spec
            stream += _filter_lines(
                sub.reshape(ph, pw * bpp), bpp, _make_filters(filters, ph)
            )
    else:
        stream += _filter_lines(
            a3.reshape(h, w * bpp), bpp, _make_filters(filters, h)
        )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0,
                       1 if interlace else 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(stream), 9))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> (H, W) uint8 greyscale or (H, W, 3) uint8 RGB. Verifies
    the signature and every chunk CRC; inflates the IDAT stream with
    stdlib zlib; reverses all five scanline filters. Raises
    ``ValueError`` on anything outside the supported profile."""
    if payload[: len(_SIG)] != _SIG:
        raise ValueError(f"not a PNG: signature {payload[:8]!r}")
    pos = len(_SIG)
    ihdr = None
    idat = bytearray()
    ended = False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if crc != zlib.crc32(ctype + data):
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            ended = True
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped after CRC check
    if ihdr is None or not ended or not idat:
        raise ValueError("missing IHDR/IDAT/IEND")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (only 8)")
    if color_type not in (0, 2):
        raise ValueError(
            f"unsupported color type {color_type} (greyscale 0 / RGB 2)"
        )
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"unknown interlace method {interlace}")
    bpp = 1 if color_type == 0 else 3
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        stride = w * bpp
        if len(raw) != h * (1 + stride):
            raise ValueError(
                f"inflated stream is {len(raw)} bytes, want {h * (1 + stride)}"
            )
        out = _defilter_lines(raw, 0, h, stride, bpp)
        return out.reshape(h, w) if bpp == 1 else out.reshape(h, w, 3)
    # Adam7: seven passes, each its own scanline group with fresh
    # filter context, scattered back onto the full-resolution grid
    full = np.zeros((h, w, bpp), dtype=np.uint8)
    off = 0
    for x0, y0, xs, ys in _ADAM7:
        pw = (w - x0 + xs - 1) // xs
        ph = (h - y0 + ys - 1) // ys
        if pw <= 0 or ph <= 0:
            continue
        stride = pw * bpp
        need = ph * (1 + stride)
        if off + need > len(raw):
            raise ValueError("inflated stream too short for Adam7 passes")
        sub = _defilter_lines(raw, off, ph, stride, bpp)
        full[y0::ys, x0::xs] = sub.reshape(ph, pw, bpp)
        off += need
    if off != len(raw):
        raise ValueError(
            f"{len(raw) - off} trailing bytes after the last Adam7 pass"
        )
    return full.reshape(h, w) if bpp == 1 else full


def _defilter_lines(
    raw: bytes, off: int, h: int, stride: int, bpp: int
) -> np.ndarray:
    """Reverse the scanline filters of one (sub-)image starting at
    byte ``off``: h lines of (1 filter byte + stride samples), prior
    row starting at zero (pass boundaries reset context)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        base = off + y * (1 + stride)
        ft = raw[base]
        line = np.frombuffer(
            raw, np.uint8, count=stride, offset=base + 1
        ).astype(np.int32)
        if ft == F_NONE:
            recon = line
        elif ft == F_UP:
            recon = (line + prior) & 0xFF
        else:
            # Sub/Average/Paeth need the just-reconstructed left
            # neighbor — sequential along the scanline by definition
            recon = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                left = recon[i - bpp] if i >= bpp else 0
                up = int(prior[i])
                up_left = int(prior[i - bpp]) if i >= bpp else 0
                if ft == F_SUB:
                    recon[i] = (line[i] + left) & 0xFF
                elif ft == F_AVERAGE:
                    recon[i] = (line[i] + (left + up) // 2) & 0xFF
                elif ft == F_PAETH:
                    recon[i] = (line[i] + _paeth(left, up, up_left)) & 0xFF
                else:
                    raise ValueError(f"unknown filter id {ft} on line {y}")
        out[y] = recon.astype(np.uint8)
        prior = recon
    return out


def png_image_decoder(payload: bytes) -> dict:
    """Drop-in ``decoder`` for
    :func:`levi_spark.operators.multimodal.decode_image_features`:
    real width/height/mean over the inflated, defiltered samples."""
    a = decode_png(payload)
    h, w = a.shape[:2]
    px = a.astype(np.float64)
    mean = float(px.mean())
    return {
        "width": w,
        "height": h,
        "mean_pixel": mean,
        "mean_abs_dev": float(np.abs(px - mean).mean()),
    }


def png_resize(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Nearest-neighbor resize, re-encoded as PNG — a real ``resizer``
    for :func:`levi_spark.operators.multimodal.resize_images`."""
    a = decode_png(payload)
    h, w = a.shape[:2]
    rows = (np.arange(target_h) * h) // target_h
    cols = (np.arange(target_w) * w) // target_w
    return encode_png(a[rows][:, cols])
