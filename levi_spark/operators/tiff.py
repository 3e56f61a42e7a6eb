"""TIFF 6.0 codec for the multimodal plane — pure stdlib + numpy.
The scanned-document/fax/archival image container: digitized corpora
(books, forms, microfilm) overwhelmingly arrive as multi-page TIFFs,
so this is the document-ingestion sibling of the GIF/AVI fan-outs.

Supported profile (strict — malformed files raise): classic TIFF in
BOTH byte orders — little-endian "II*\\0" (Intel) and big-endian
"MM\\0*" (Motorola — Mac/scientific scanner output; every header,
IFD, and array field follows the declared order) — the chained-IFD
MULTI-PAGE layout (one image per IFD, one fan-out row per page),
8-bit greyscale and 8-bit RGB, multi-strip images (RowsPerStrip <
ImageLength, ragged last strip), and the three compressions scanned
corpora actually use:

* 1 = uncompressed,
* 32773 = PackBits (the classic byte RLE: n>=0 -> n+1 literals,
  -127..-1 -> 1-n repeats, -128 no-op),
* 5 = TIFF LZW — MSB-first bit packing, 9-bit initial width,
  ClearCode 256 / EOI 257, and the spec's famous EARLY-CHANGE quirk
  (code width bumps one code EARLIER than GIF's LSB LZW: at table
  sizes 511/1023/2047), with table reset before 4094; Predictor 2
  (horizontal differencing per SAMPLE — stride = SamplesPerPixel,
  so an RGB channel differences against the previous PIXEL's same
  channel, TIFF 6.0 section 14) supported with it.

Strip byte counts, IFD entry types, and decoded sizes are all
cross-validated; unknown compressions, tiles, and planar layouts
refuse loudly rather than misread. The reference engine has no media
surface; this is north-star extension surface like
:mod:`levi_spark.operators.gif`.
"""

from __future__ import annotations

import struct

import numpy as np

_II = b"II*\x00"
_MM = b"MM\x00*"

# tag ids
_WIDTH, _LENGTH, _BITS, _COMP = 256, 257, 258, 259
_PHOTO, _STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT = 262, 273, 277, 278, 279
_PREDICTOR = 317


def packbits_encode(data: bytes) -> bytes:
    """Classic PackBits RLE (TIFF 6.0 section 9)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)  # -(run-1) as unsigned byte
            out.append(data[i])
            i += run
            continue
        # literal stretch: until a run of >= 3 starts (2-byte runs are
        # cheaper folded into the literal) or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            run = 1
            while j + run < n and run < 3 and data[j + run] == data[j]:
                run += 1
            if run >= 3:
                break
            j += run if run == 2 and j + 2 - i <= 128 else 1
        j = min(j, i + 128, n)
        out.append(j - i - 1)
        out.extend(data[i:j])
        i = j
    return bytes(out)


def packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expect:
        if i >= len(data):
            raise ValueError(
                f"PackBits stream exhausted at {len(out)}/{expect} bytes"
            )
        n = data[i]
        i += 1
        if n == 128:
            continue
        if n < 128:
            if i + n + 1 > len(data):
                raise ValueError("PackBits literal overruns stream")
            out.extend(data[i : i + n + 1])
            i += n + 1
        else:
            if i >= len(data):
                raise ValueError("PackBits run missing byte")
            out.extend(bytes([data[i]]) * (257 - n))
            i += 1
    if len(out) != expect:
        raise ValueError(f"PackBits produced {len(out)}, want {expect}")
    return bytes(out)


class _MsbWriter:
    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.out)


class _MsbReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, width: int) -> int:
        out = 0
        for _ in range(width):
            if self.pos >= 8 * len(self.data):
                raise ValueError("LZW stream exhausted mid-code")
            byte = self.data[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


_CLEAR, _EOI = 256, 257


def tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW: MSB-first packing, early change (the width
    bump happens when the NEXT emitted code could be the first of the
    wider range — at table sizes 511/1023/2047), table reset at
    4094."""
    w = _MsbWriter()
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    w.write(_CLEAR, width)
    cur = b""
    for ch in data:
        nxt = cur + bytes([ch])
        if nxt in table:
            cur = nxt
            continue
        w.write(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1  # early change
        if next_code >= 4094:
            w.write(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([ch])
    if cur:
        w.write(table[cur], width)
    w.write(_EOI, width)
    return w.flush()


def tiff_lzw_decode(data: bytes, expect: int) -> bytes:
    r = _MsbReader(data)
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while len(out) < expect:
        code = r.read(width)
        if code == _EOI:
            break
        if code == _CLEAR:
            reset()
            continue
        if prev is None:
            if code >= 256:
                raise ValueError(f"LZW first code {code} not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table {len(table)}")
        out.extend(entry)
        prev = entry
        # early change, reader side: the decoder's table lags the
        # encoder's by ONE entry (the encoder adds while emitting, the
        # decoder adds on the NEXT code), so where the encoder bumps
        # at next_code == 2^w - 1 (511/1023/2047), the decoder bumps
        # at table length 2^w - 2
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) != expect:
        raise ValueError(f"LZW produced {len(out)} bytes, want {expect}")
    return bytes(out)


def _predict2_encode(rows: np.ndarray, spp: int = 1) -> np.ndarray:
    """Horizontal differencing (Predictor=2), per row: TIFF 6.0
    differences per SAMPLE, so the stride is SamplesPerPixel — pixel
    x's red differences against pixel x-1's red, never against its own
    blue. ``rows`` is (nrows, width*spp) interleaved."""
    d = rows.astype(np.int64)
    out = d.copy()
    out[:, spp:] = (d[:, spp:] - d[:, :-spp]) % 256
    return out.astype(np.uint8)


def _predict2_decode(rows: np.ndarray, spp: int = 1) -> np.ndarray:
    h, wspp = rows.shape
    r = rows.reshape(h, wspp // spp, spp).astype(np.int64)
    return np.cumsum(r, axis=1).astype(np.uint8).reshape(h, wspp)


def encode_tiff(
    pages: list[np.ndarray],
    compression: int = 5,
    rows_per_strip: int = 5,
    predictor: int | None = None,
    byte_order: str = "II",
) -> bytes:
    """uint8 (H, W) greyscale or (H, W, 3) RGB pages -> multi-page
    TIFF. ``predictor=2`` pairs with LZW. ``byte_order`` is the
    header's own vocabulary: ``"II"`` little-endian (Intel) or
    ``"MM"`` big-endian (Motorola — Mac/scientific tooling); every
    multi-byte header/IFD/array field follows it (pixel data is
    8-bit, so only the structure is order-sensitive)."""
    if not pages:
        raise ValueError("TIFF needs at least one page")
    if predictor == 2 and compression != 5:
        raise ValueError("Predictor 2 is only written with LZW here")
    if byte_order not in ("II", "MM"):
        raise ValueError(f"byte_order {byte_order!r} must be 'II' or 'MM'")
    bo = "<" if byte_order == "II" else ">"

    blob = bytearray(
        (_II if byte_order == "II" else _MM) + b"\x00\x00\x00\x00"
    )  # IFD0 offset patched below
    ifd_offsets = []

    for page in pages:
        a = np.asarray(page, dtype=np.uint8)
        grey = a.ndim == 2
        if not grey and (a.ndim != 3 or a.shape[2] != 3):
            raise ValueError(f"page shape {a.shape} unsupported")
        h, w = a.shape[:2]
        spp = 1 if grey else 3
        flat = a.reshape(h, w * spp)

        strips = []
        for y0 in range(0, h, rows_per_strip):
            rows = flat[y0 : y0 + rows_per_strip]
            if predictor == 2:
                rows = _predict2_encode(rows, spp)
            raw = rows.tobytes()
            if compression == 1:
                strips.append(raw)
            elif compression == 32773:
                strips.append(packbits_encode(raw))
            elif compression == 5:
                strips.append(tiff_lzw_encode(raw))
            else:
                raise ValueError(f"compression {compression} unsupported")

        strip_offsets = []
        for s in strips:
            strip_offsets.append(len(blob))
            blob.extend(s)
            if len(blob) % 2:
                blob.append(0)  # word-align

        n_strips = len(strips)

        def _extra_array(values, fmt, size):
            # arrays that don't fit in the 4 value bytes go after the IFD
            return values, fmt, size

        entries = []  # (tag, type, count, value_or_deferred)
        entries.append((_WIDTH, 3, 1, w))
        entries.append((_LENGTH, 3, 1, h))
        if grey:
            entries.append((_BITS, 3, 1, 8))
        else:
            entries.append((_BITS, 3, 3, ("ARR3", [8, 8, 8])))
        entries.append((_COMP, 3, 1, compression))
        entries.append((_PHOTO, 3, 1, 1 if grey else 2))
        if n_strips == 1:
            entries.append((_STRIP_OFF, 4, 1, strip_offsets[0]))
        else:
            entries.append((_STRIP_OFF, 4, n_strips, ("ARR4", strip_offsets)))
        entries.append((_SPP, 3, 1, spp))
        entries.append((_ROWS_PER_STRIP, 3, 1, rows_per_strip))
        if n_strips == 1:
            entries.append((_STRIP_CNT, 4, 1, len(strips[0])))
        else:
            entries.append(
                (_STRIP_CNT, 4, n_strips, ("ARR4", [len(s) for s in strips]))
            )
        if predictor:
            entries.append((_PREDICTOR, 3, 1, predictor))
        entries.sort(key=lambda e: e[0])

        # lay out deferred arrays first
        deferred = {}
        for tag, typ, cnt, val in entries:
            if isinstance(val, tuple):
                kind, arr = val
                deferred[tag] = len(blob)
                fmt = bo + ("H" if kind == "ARR3" else "I") * cnt
                blob.extend(struct.pack(fmt, *arr))
                if len(blob) % 2:
                    blob.append(0)

        ifd_offsets.append(len(blob))
        blob.extend(struct.pack(bo + "H", len(entries)))
        for tag, typ, cnt, val in entries:
            if isinstance(val, tuple):
                packed = struct.pack(bo + "I", deferred[tag])
            elif typ == 3:
                packed = struct.pack(bo + "HH", val, 0)
            else:
                packed = struct.pack(bo + "I", val)
            blob.extend(struct.pack(bo + "HHI", tag, typ, cnt) + packed)
        blob.extend(b"\x00\x00\x00\x00")  # next-IFD, patched for chaining

    # chain the IFDs
    struct.pack_into(bo + "I", blob, 4, ifd_offsets[0])
    for i in range(len(ifd_offsets) - 1):
        # next-IFD pointer sits after the entry block of IFD i
        (n_entries,) = struct.unpack_from(bo + "H", blob, ifd_offsets[i])
        struct.pack_into(
            bo + "I", blob, ifd_offsets[i] + 2 + 12 * n_entries, ifd_offsets[i + 1]
        )
    return bytes(blob)


def _read_ifd(data: bytes, off: int, bo: str = "<") -> tuple[dict, int]:
    (n,) = struct.unpack_from(bo + "H", data, off)
    entries = {}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, off + 2 + 12 * i)
        voff = off + 2 + 12 * i + 8
        if typ == 3 and cnt == 1:
            (v,) = struct.unpack_from(bo + "H", data, voff)
            entries[tag] = [v]
        elif typ == 4 and cnt == 1:
            (v,) = struct.unpack_from(bo + "I", data, voff)
            entries[tag] = [v]
        elif typ in (3, 4):
            size = (2 if typ == 3 else 4) * cnt
            if size <= 4:
                ptr = voff
            else:
                (ptr,) = struct.unpack_from(bo + "I", data, voff)
            fmt = bo + ("H" if typ == 3 else "I") * cnt
            entries[tag] = list(struct.unpack_from(fmt, data, ptr))
        else:
            entries[tag] = None  # types we don't interpret
    (nxt,) = struct.unpack_from(bo + "I", data, off + 2 + 12 * n)
    return entries, nxt


def decode_tiff(payload: bytes) -> list[np.ndarray]:
    """Multi-page TIFF -> list of uint8 arrays ((H, W) grey or
    (H, W, 3) RGB), one per IFD in chain order."""
    if payload[:4] == _II:
        bo = "<"
    elif payload[:4] == _MM:
        bo = ">"
    else:
        raise ValueError(f"not a TIFF (starts {payload[:4]!r})")
    (off,) = struct.unpack_from(bo + "I", payload, 4)
    pages = []
    seen = set()
    while off:
        if off in seen:
            raise ValueError("IFD chain loops")
        seen.add(off)
        e, off = _read_ifd(payload, off, bo)
        for req in (_WIDTH, _LENGTH, _STRIP_OFF, _STRIP_CNT):
            if req not in e:
                raise ValueError(f"IFD missing required tag {req}")
        w, h = e[_WIDTH][0], e[_LENGTH][0]
        comp = e.get(_COMP, [1])[0]
        spp = e.get(_SPP, [1])[0]
        bits = e.get(_BITS, [8])
        if any(b != 8 for b in bits):
            raise NotImplementedError(f"{bits}-bit TIFF unsupported (8 only)")
        if spp not in (1, 3):
            raise NotImplementedError(f"{spp} samples/pixel unsupported")
        predictor = e.get(_PREDICTOR, [1])[0]
        if predictor not in (1, 2):
            raise NotImplementedError(f"predictor {predictor} unsupported")
        rps = e.get(_ROWS_PER_STRIP, [h])[0]
        offs, cnts = e[_STRIP_OFF], e[_STRIP_CNT]
        if len(offs) != len(cnts):
            raise ValueError("StripOffsets/StripByteCounts disagree")
        expected_strips = (h + rps - 1) // rps
        if len(offs) != expected_strips:
            raise ValueError(
                f"{len(offs)} strips for {h} rows at {rps}/strip "
                f"(want {expected_strips})"
            )
        rows = []
        for i, (so, sc) in enumerate(zip(offs, cnts)):
            nrows = min(rps, h - i * rps)
            expect = nrows * w * spp
            raw = payload[so : so + sc]
            if len(raw) != sc:
                raise ValueError(f"strip {i} overruns file")
            if comp == 1:
                if len(raw) != expect:
                    raise ValueError(
                        f"uncompressed strip {i} is {len(raw)}, want {expect}"
                    )
                dec = raw
            elif comp == 32773:
                dec = packbits_decode(raw, expect)
            elif comp == 5:
                dec = tiff_lzw_decode(raw, expect)
            else:
                raise NotImplementedError(f"compression {comp} unsupported")
            block = np.frombuffer(dec, np.uint8).reshape(nrows, w * spp)
            if predictor == 2:
                block = _predict2_decode(block, spp)
            rows.append(block)
        img = np.concatenate(rows, axis=0)
        pages.append(img if spp == 1 else img.reshape(h, w, 3))
    if not pages:
        raise ValueError("TIFF has no IFDs")
    return pages


def tiff_page_features(payload: bytes) -> list[dict]:
    """Per-page features for the multimodal fan-out plane."""
    pages = decode_tiff(payload)
    out = []
    for i, p in enumerate(pages):
        px = p.astype(np.float64)
        mean = float(px.mean())
        out.append(
            {
                "frame_idx": i,
                "delay_cs": 0,  # containers without timing report 0
                "width": int(p.shape[1]),
                "height": int(p.shape[0]),
                "mean_pixel": mean,
            }
        )
    return out
