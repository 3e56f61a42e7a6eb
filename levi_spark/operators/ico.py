"""ICO icon container — pure stdlib + numpy.

The Windows icon resource format (documented by Microsoft's
ICONDIR/ICONDIRENTRY layout and the favicon.ico convention) is the
one raster container a *web crawl* meets on effectively every domain:
``/favicon.ico``. One file carries N images, each either

* a **DIB entry** — a BITMAPINFOHEADER with ``biHeight`` equal to
  TWICE the visible height (the bottom half is the 24-bit bottom-up
  BGR "XOR" color plane, the top half a 1-bit "AND" transparency
  mask, each mask row padded to a 32-bit boundary), with NO
  BITMAPFILEHEADER; or
* a **PNG entry** — a complete PNG stream verbatim (the Vista+
  extension used for 256px entries), detected by signature.

Directory layout (little-endian):

* ``ICONDIR``: u16 reserved=0, u16 type (1=icon, 2=cursor), u16 count
* ``ICONDIRENTRY`` x count (16 bytes): bWidth/bHeight (0 encodes
  256), bColorCount, bReserved, wPlanes, wBitCount (hotspot x/y for
  cursors), dwBytesInRes, dwImageOffset

Strict: bad reserved/type fields, overlapping or out-of-bounds entry
spans, directory/DIB dimension mismatches, and non-double DIB heights
all raise. PNG entries delegate to :mod:`levi_spark.operators.png`
(signature + per-chunk CRC checks included). The reference engine has
no media surface; north-star extension surface like
:mod:`levi_spark.operators.bmp`.
"""

from __future__ import annotations

import struct

import numpy as np

from levi_spark.operators.png import decode_png, encode_png

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _mask_row_bytes(w: int) -> int:
    return ((w + 31) // 32) * 4


def _encode_dib(img: np.ndarray, mask: np.ndarray | None) -> bytes:
    h, w = img.shape[:2]
    if mask is None:
        mask = np.zeros((h, w), np.uint8)
    m = (np.asarray(mask) != 0).astype(np.uint8)
    if m.shape != (h, w):
        raise ValueError(f"mask shape {m.shape} != image {(h, w)}")
    xor_row = (w * 3 + 3) & ~3
    body = bytearray()
    for row in img[::-1]:  # bottom-up
        bgr = row[:, ::-1].tobytes()
        body.extend(bgr + b"\x00" * (xor_row - len(bgr)))
    mrow = _mask_row_bytes(w)
    for row in m[::-1]:
        bits = np.packbits(row)  # MSB-first, as the DIB 1-bit plane is
        body.extend(bits.tobytes() + b"\x00" * (mrow - len(bits)))
    hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, 2 * h, 1, 24, 0, len(body), 0, 0, 0, 0
    )
    return hdr + bytes(body)


def encode_ico(entries: list[tuple[str, np.ndarray, np.ndarray | None]]) -> bytes:
    """``[(kind, rgb, mask), ...] -> ICO bytes``. ``kind`` is ``"dib"``
    or ``"png"``; ``rgb`` is (H, W, 3) uint8 with H, W <= 256; ``mask``
    is an optional (H, W) 0/1 AND-mask (DIB entries only — PNG entries
    carry alpha in-stream and must pass ``None``)."""
    if not entries:
        raise ValueError("ICO needs at least one entry")
    blobs = []
    dims = []
    for kind, rgb, mask in entries:
        a8 = np.asarray(rgb, dtype=np.uint8)
        if a8.ndim != 3 or a8.shape[2] != 3:
            raise ValueError(f"ICO entry needs (H, W, 3) uint8, got {a8.shape}")
        h, w = a8.shape[:2]
        if not (1 <= w <= 256 and 1 <= h <= 256):
            raise ValueError(f"ICO entry {w}x{h} outside 1..256")
        if kind == "dib":
            blobs.append(_encode_dib(a8, mask))
        elif kind == "png":
            if mask is not None:
                raise ValueError("PNG entries carry alpha in-stream; mask=None")
            blobs.append(encode_png(a8))
        else:
            raise ValueError(f"ICO entry kind {kind!r} (want dib|png)")
        dims.append((w, h))
    out = bytearray(struct.pack("<HHH", 0, 1, len(entries)))
    offset = 6 + 16 * len(entries)
    for (w, h), blob in zip(dims, blobs):
        out.extend(
            struct.pack(
                "<BBBBHHII",
                w % 256, h % 256,  # 0 encodes 256
                0, 0, 1, 24, len(blob), offset,
            )
        )
        offset += len(blob)
    for blob in blobs:
        out.extend(blob)
    return bytes(out)


def _decode_dib(payload: bytes, want_w: int, want_h: int) -> dict:
    if len(payload) < 40:
        raise ValueError("ICO DIB shorter than BITMAPINFOHEADER")
    (hdr_size, w, h2, planes, bpp, comp, _sz, _xp, _yp, _clr, _imp) = (
        struct.unpack_from("<IiiHHIIiiII", payload, 0)
    )
    if hdr_size != 40:
        raise ValueError(f"ICO DIB header size {hdr_size} (want 40)")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"ICO DIB profile bpp={bpp} comp={comp} (supported: 24-bit BI_RGB)"
        )
    if h2 % 2:
        raise ValueError(f"ICO DIB height {h2} not double-height")
    h = h2 // 2
    if (w, h) != (want_w, want_h):
        raise ValueError(
            f"directory says {want_w}x{want_h}, DIB says {w}x{h}"
        )
    xor_row = (w * 3 + 3) & ~3
    mrow = _mask_row_bytes(w)
    need = 40 + h * xor_row + h * mrow
    if len(payload) < need:
        raise ValueError(f"ICO DIB truncated: {len(payload)} < {need}")
    xor = np.frombuffer(
        payload, np.uint8, count=h * xor_row, offset=40
    ).reshape(h, xor_row)
    rgb = xor[::-1, : w * 3].reshape(h, w, 3)[:, :, ::-1].copy()
    mbits = np.frombuffer(
        payload, np.uint8, count=h * mrow, offset=40 + h * xor_row
    ).reshape(h, mrow)
    mask = np.unpackbits(mbits, axis=1)[::-1, :w].copy()
    return {"kind": "dib", "pixels": rgb, "mask": mask}


def decode_ico(payload: bytes) -> list[dict]:
    """ICO bytes -> per-entry dicts ``{kind: "dib"|"png", pixels:
    (H, W, 3) uint8 RGB top-down, mask: (H, W) uint8 0/1 or None}``.
    Strict: raises on bad directory fields, out-of-bounds or
    overlapping spans, and dimension mismatches."""
    if len(payload) < 6:
        raise ValueError("ICO shorter than ICONDIR")
    reserved, rtype, count = struct.unpack_from("<HHH", payload, 0)
    if reserved != 0 or rtype != 1:
        raise ValueError(f"not an ICO (reserved={reserved}, type={rtype})")
    if count == 0:
        raise ValueError("ICO with zero entries")
    if len(payload) < 6 + 16 * count:
        raise ValueError("ICO directory truncated")
    spans = []
    for i in range(count):
        bw, bh, _cc, resv, _pl, _bc, size, off = struct.unpack_from(
            "<BBBBHHII", payload, 6 + 16 * i
        )
        if resv != 0:
            raise ValueError(f"entry {i} reserved byte {resv}")
        if off + size > len(payload) or off < 6 + 16 * count:
            raise ValueError(f"entry {i} span [{off}, {off + size}) out of file")
        spans.append((bw or 256, bh or 256, off, size))
    # entries may be stored in any offset order: sort by offset before
    # the pairwise check so non-adjacent overlaps are caught too
    by_off = sorted(spans, key=lambda s: s[2])
    for (_, _, o1, s1), (_, _, o2, _s2) in zip(by_off, by_off[1:]):
        if o1 + s1 > o2:
            raise ValueError("ICO entry spans overlap")
    out = []
    for w, h, off, size in spans:
        blob = payload[off : off + size]
        if blob[: len(_PNG_SIG)] == _PNG_SIG:
            px = decode_png(blob)
            if px.ndim == 2:
                px = np.stack([px] * 3, axis=2)
            if px.shape[:2] != (h, w):
                raise ValueError(
                    f"directory says {w}x{h}, PNG is "
                    f"{px.shape[1]}x{px.shape[0]}"
                )
            out.append({"kind": "png", "pixels": px, "mask": None})
        else:
            out.append(_decode_dib(blob, w, h))
    return out
