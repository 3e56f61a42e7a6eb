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
ImageLength, ragged last strip), TILED images (TIFF 6.0 section 15:
TileWidth/TileLength multiples of 16, edge tiles padded to full tile
size), PLANAR RGB strip images (PlanarConfiguration=2 — component-
major strips, each plane differencing independently under the
predictor), and the three compressions scanned corpora actually
use:

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

Strip/tile byte counts, tile grid geometry, IFD entry types, and
decoded sizes are all cross-validated; unknown compressions and the
tiled+planar combination refuse loudly rather than misread. The reference engine has no media
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
_PLANAR = 284
_TILE_W, _TILE_L, _TILE_OFF, _TILE_CNT = 322, 323, 324, 325


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
    tile: tuple[int, int] | None = None,
    planar: bool = False,
) -> bytes:
    """uint8 (H, W) greyscale or (H, W, 3) RGB pages -> multi-page
    TIFF. ``predictor=2`` pairs with LZW. ``byte_order`` is the
    header's own vocabulary: ``"II"`` little-endian (Intel) or
    ``"MM"`` big-endian (Motorola — Mac/scientific tooling); every
    multi-byte header/IFD/array field follows it (pixel data is
    8-bit, so only the structure is order-sensitive).

    ``tile=(tw, tl)`` switches the page layout from strips to TILES
    (TIFF 6.0 section 15: TileWidth/TileLength multiples of 16, edge
    tiles PADDED to full tile size before compression). ``planar=
    True`` writes RGB pages in PlanarConfiguration=2 (strip layout
    only): StripsPerImage strips of the full red plane, then green,
    then blue — each plane differencing independently under the
    predictor (so stride 1, not 3)."""
    if not pages:
        raise ValueError("TIFF needs at least one page")
    if predictor == 2 and compression != 5:
        raise ValueError("Predictor 2 is only written with LZW here")
    if byte_order not in ("II", "MM"):
        raise ValueError(f"byte_order {byte_order!r} must be 'II' or 'MM'")
    if tile is not None:
        tw, tl = tile
        if tw % 16 or tl % 16 or tw <= 0 or tl <= 0:
            raise ValueError("TileWidth/TileLength must be positive multiples of 16")
        if planar:
            raise NotImplementedError("tiled + planar layout not written here")
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
        if planar and grey:
            raise ValueError("planar=True needs an RGB page")
        flat = a.reshape(h, w * spp)

        def _pack(rows: np.ndarray, pred_spp: int) -> bytes:
            if predictor == 2:
                rows = _predict2_encode(rows, pred_spp)
            raw = rows.tobytes()
            if compression == 1:
                return raw
            if compression == 32773:
                return packbits_encode(raw)
            if compression == 5:
                return tiff_lzw_encode(raw)
            raise ValueError(f"compression {compression} unsupported")

        strips = []
        if tile is not None:
            # row-major tile grid; edge tiles padded to (tl, tw)
            for ty in range(0, h, tl):
                for tx in range(0, w, tw):
                    t = np.zeros(
                        (tl, tw, spp) if spp == 3 else (tl, tw), np.uint8
                    )
                    seg = a[ty : ty + tl, tx : tx + tw]
                    t[: seg.shape[0], : seg.shape[1]] = seg
                    strips.append(_pack(t.reshape(tl, tw * spp), spp))
        elif planar:
            # component-major: all red strips, all green, all blue
            for c in range(3):
                plane = a[:, :, c]
                for y0 in range(0, h, rows_per_strip):
                    strips.append(_pack(plane[y0 : y0 + rows_per_strip], 1))
        else:
            for y0 in range(0, h, rows_per_strip):
                strips.append(_pack(flat[y0 : y0 + rows_per_strip], spp))

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

        def _arr4(tag, values):
            if len(values) == 1:
                entries.append((tag, 4, 1, values[0]))
            else:
                entries.append((tag, 4, len(values), ("ARR4", list(values))))

        entries = []  # (tag, type, count, value_or_deferred)
        entries.append((_WIDTH, 3, 1, w))
        entries.append((_LENGTH, 3, 1, h))
        if grey:
            entries.append((_BITS, 3, 1, 8))
        else:
            entries.append((_BITS, 3, 3, ("ARR3", [8, 8, 8])))
        entries.append((_COMP, 3, 1, compression))
        entries.append((_PHOTO, 3, 1, 1 if grey else 2))
        entries.append((_SPP, 3, 1, spp))
        if tile is not None:
            entries.append((_TILE_W, 3, 1, tw))
            entries.append((_TILE_L, 3, 1, tl))
            _arr4(_TILE_OFF, strip_offsets)
            _arr4(_TILE_CNT, [len(s) for s in strips])
        else:
            _arr4(_STRIP_OFF, strip_offsets)
            entries.append((_ROWS_PER_STRIP, 3, 1, rows_per_strip))
            _arr4(_STRIP_CNT, [len(s) for s in strips])
        if planar:
            entries.append((_PLANAR, 3, 1, 2))
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
        for req in (_WIDTH, _LENGTH):
            if req not in e:
                raise ValueError(f"IFD missing required tag {req}")
        tiled = _TILE_OFF in e or _TILE_W in e
        if tiled:
            for req in (_TILE_W, _TILE_L, _TILE_OFF, _TILE_CNT):
                if req not in e:
                    raise ValueError(f"tiled IFD missing required tag {req}")
        else:
            for req in (_STRIP_OFF, _STRIP_CNT):
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
        planar_cfg = e.get(_PLANAR, [1])[0]
        if planar_cfg not in (1, 2):
            raise ValueError(f"PlanarConfiguration {planar_cfg} invalid")
        if planar_cfg == 2 and (tiled or spp == 1):
            raise NotImplementedError(
                "planar layout supported for RGB strip images only"
            )
        predictor = e.get(_PREDICTOR, [1])[0]
        if predictor not in (1, 2):
            raise NotImplementedError(f"predictor {predictor} unsupported")

        def _decomp(raw: bytes, expect: int, what: str) -> bytes:
            if comp == 1:
                if len(raw) != expect:
                    raise ValueError(
                        f"uncompressed {what} is {len(raw)}, want {expect}"
                    )
                return raw
            if comp == 32773:
                return packbits_decode(raw, expect)
            if comp == 5:
                return tiff_lzw_decode(raw, expect)
            raise NotImplementedError(f"compression {comp} unsupported")

        if tiled:
            tw, tl = e[_TILE_W][0], e[_TILE_L][0]
            if tw % 16 or tl % 16 or tw <= 0 or tl <= 0:
                raise ValueError(
                    f"TileWidth/TileLength {tw}x{tl} must be positive "
                    "multiples of 16"
                )
            offs, cnts = e[_TILE_OFF], e[_TILE_CNT]
            if len(offs) != len(cnts):
                raise ValueError("TileOffsets/TileByteCounts disagree")
            across = -(-w // tw)
            down = -(-h // tl)
            if len(offs) != across * down:
                raise ValueError(
                    f"{len(offs)} tiles for {w}x{h} at {tw}x{tl} "
                    f"(want {across * down})"
                )
            img = np.zeros(
                (h, w, spp) if spp == 3 else (h, w), np.uint8
            )
            for i, (so, sc) in enumerate(zip(offs, cnts)):
                raw = payload[so : so + sc]
                if len(raw) != sc:
                    raise ValueError(f"tile {i} overruns file")
                dec = _decomp(raw, tl * tw * spp, f"tile {i}")
                block = np.frombuffer(dec, np.uint8).reshape(tl, tw * spp)
                if predictor == 2:
                    block = _predict2_decode(block, spp)
                t = (
                    block.reshape(tl, tw, spp)
                    if spp == 3
                    else block
                )
                ty, tx = (i // across) * tl, (i % across) * tw
                ch, cw = min(tl, h - ty), min(tw, w - tx)
                img[ty : ty + ch, tx : tx + cw] = t[:ch, :cw]
            pages.append(img)
        elif planar_cfg == 2:
            rps = e.get(_ROWS_PER_STRIP, [h])[0]
            offs, cnts = e[_STRIP_OFF], e[_STRIP_CNT]
            if len(offs) != len(cnts):
                raise ValueError("StripOffsets/StripByteCounts disagree")
            per_plane = (h + rps - 1) // rps
            if len(offs) != 3 * per_plane:
                raise ValueError(
                    f"{len(offs)} planar strips for {h} rows at "
                    f"{rps}/strip (want {3 * per_plane})"
                )
            img = np.zeros((h, w, 3), np.uint8)
            for i, (so, sc) in enumerate(zip(offs, cnts)):
                c, si = divmod(i, per_plane)
                nrows = min(rps, h - si * rps)
                raw = payload[so : so + sc]
                if len(raw) != sc:
                    raise ValueError(f"strip {i} overruns file")
                dec = _decomp(raw, nrows * w, f"planar strip {i}")
                block = np.frombuffer(dec, np.uint8).reshape(nrows, w)
                if predictor == 2:
                    block = _predict2_decode(block, 1)
                img[si * rps : si * rps + nrows, :, c] = block
            pages.append(img)
        else:
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
                raw = payload[so : so + sc]
                if len(raw) != sc:
                    raise ValueError(f"strip {i} overruns file")
                dec = _decomp(raw, nrows * w * spp, f"strip {i}")
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
