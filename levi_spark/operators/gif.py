"""GIF codec for the multimodal plane — pure stdlib + numpy, no PIL.
Closes the ANIMATED-container seam: the frame-sampling operators
(`levi_spark.operators.multimodal.sample_frames`,
`multimodal_frame_sample`) modeled frames as fixed-size byte slices;
this decodes real multi-frame GIF89a animations, the dominant short-
animation container in web scrapes.

Supported profile: GIF87a/GIF89a, global and local color tables,
LZW-compressed image data (variable code width 3-12 bits, LSB-first
packing, CLEAR/EOI codes, the deferred-clear and KwKwK cases), the
4-pass GIF row interlace, and multi-frame animation COMPOSITING with
full graphic-control semantics: per-frame delays, TRANSPARENCY
(transparent-index pixels leave the underlying canvas visible) and
all disposal methods (0/1 keep, 2 restore-to-background — the frame
region clears to the canvas base, rendered as black like browsers
render a transparent background — and 3 restore-to-previous).
Sort/aspect fields are ignored per spec.

Encode (for fixtures and tests): greyscale or RGB frames quantized to
one global 256-entry palette (exact for greyscale and for rasters with
<= 256 distinct colors; refuses otherwise rather than dither), each
frame full-canvas, LZW-compressed with table resets at 4096 codes;
``transparent_color`` reserves a palette index so frames can punch
holes, ``disposals`` sets per-frame disposal methods.
"""

from __future__ import annotations

import struct

import numpy as np

_HDR = b"GIF89a"


class _LsbWriter:
    """LSB-first bit packer (GIF packs code bits least significant
    first — the opposite of JPEG/FLAC)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= (code & ((1 << width) - 1)) << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


class _LsbReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, width: int) -> int:
        while self.n < width:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.n -= width
        return v


def _lzw_compress(indices: np.ndarray, mcs: int) -> bytes:
    """GIF-flavor LZW: emit CLEAR, build the string table up to 4095,
    reset on overflow, end with EOI."""
    clear = 1 << mcs
    eoi = clear + 1
    bw = _LsbWriter()

    def fresh():
        return {(i,): i for i in range(clear)}, eoi + 1, mcs + 1

    table, next_code, width = fresh()
    bw.write(clear, width)
    seq: tuple[int, ...] = ()
    for px in indices.tolist():
        cand = seq + (px,)
        if cand in table:
            seq = cand
            continue
        bw.write(table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        elif next_code > 4095:
            bw.write(clear, width)
            table, next_code, width = fresh()
        seq = (px,)
    if seq:
        bw.write(table[seq], width)
    bw.write(eoi, width)
    return bw.flush()


def _lzw_decompress(data: bytes, mcs: int, expect: int) -> np.ndarray:
    """Inverse; stops at EOI or when ``expect`` pixels are out."""
    clear = 1 << mcs
    eoi = clear + 1
    br = _LsbReader(data)
    out = np.empty(expect, np.uint8)
    n_out = 0

    def fresh():
        return {i: (i,) for i in range(clear)}, eoi + 1, mcs + 1

    table, next_code, width = fresh()
    prev: tuple[int, ...] | None = None
    while n_out < expect:
        code = br.read(width)
        if code == clear:
            table, next_code, width = fresh()
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError(f"LZW code {code} out of range")
        for px in entry:
            if n_out >= expect:
                raise ValueError("LZW emits more pixels than the frame")
            out[n_out] = px
            n_out += 1
        if prev is not None and next_code <= 4095:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out != expect:
        raise ValueError(f"LZW stream yields {n_out}/{expect} pixels")
    return out


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """GIF 4-pass interlace: stored row order is passes 0::8, 4::8,
    2::4, 1::2 of the display order."""
    h = rows.shape[0]
    out = np.empty_like(rows)
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    for src, dst in enumerate(order):
        out[dst] = rows[src]
    return out


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks (len byte + bytes, 0 terminates)."""
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("unterminated sub-block sequence")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += payload[pos : pos + n]
        pos += n


def encode_gif(
    frames: list[np.ndarray] | np.ndarray,
    delays_cs: list[int] | None = None,
    interlace: bool = False,
    transparent_color=None,
    disposals: list[int] | None = None,
) -> bytes:
    """Frames -> animated GIF89a. Each frame is uint8 (H, W) greyscale
    or (H, W, 3) RGB; all frames share one canvas size and one global
    palette built from the union of colors (must fit 256 — this
    encoder refuses to dither). ``delays_cs`` per-frame delays in
    centiseconds (graphic-control extensions; default 10).
    ``transparent_color`` (grey value or RGB triple) reserves a
    palette index: pixels of that exact color are encoded transparent
    and the prior canvas shows through on decode. ``disposals`` sets
    each frame's disposal method (0/1 keep, 2 restore-to-background,
    3 restore-to-previous)."""
    if isinstance(frames, np.ndarray) and frames.ndim in (2, 3):
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    rgb_frames = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share the canvas size")
        if f.ndim == 2:
            rgb_frames.append(np.stack([f, f, f], axis=-1))
        elif f.ndim == 3 and f.shape[2] == 3:
            rgb_frames.append(f)
        else:
            raise ValueError(f"expected (H,W) or (H,W,3) uint8, got {f.shape}")
    # one global palette over all frames
    allpx = np.concatenate([f.reshape(-1, 3) for f in rgb_frames])
    palette, inverse = np.unique(allpx, axis=0, return_inverse=True)
    trans_idx = None
    if transparent_color is not None:
        tc = np.asarray(transparent_color, dtype=np.uint8).reshape(-1)
        if tc.shape == (1,):
            tc = np.repeat(tc, 3)
        if tc.shape != (3,):
            raise ValueError("transparent_color must be a grey value or RGB")
        hit = np.where((palette == tc).all(axis=1))[0]
        trans_idx = int(hit[0]) if len(hit) else len(palette)
        if trans_idx == len(palette) and len(palette) >= 256:
            raise ValueError("no palette slot left for the transparent index")
    if len(palette) > 256:
        raise ValueError(
            f"{len(palette)} distinct colors exceed one 256-entry palette "
            "(this encoder refuses to dither)"
        )
    pal = np.zeros((256, 3), np.uint8)
    pal[: len(palette)] = palette
    index_frames = []
    off = 0
    for f in rgb_frames:
        n = f.shape[0] * f.shape[1]
        index_frames.append(
            inverse[off : off + n].astype(np.uint8).reshape(h, w)
        )
        off += n
    delays = list(delays_cs or [10] * len(frames))
    if len(delays) != len(frames):
        raise ValueError(f"need {len(frames)} delays, got {len(delays)}")
    disp = list(disposals or [0] * len(frames))
    if len(disp) != len(frames):
        raise ValueError(f"need {len(frames)} disposals, got {len(disp)}")
    if any(d not in (0, 1, 2, 3) for d in disp):
        raise ValueError("disposal methods are 0-3")

    out = bytearray(_HDR)
    # logical screen descriptor: global table, 8 bits/channel, 256 cells
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x70 | 0x07, 0, 0)
    out += pal.tobytes()
    if len(frames) > 1:  # Netscape loop-forever app extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fi, idx in enumerate(index_frames):
        gflags = disp[fi] << 2
        if trans_idx is not None:
            gflags |= 0x01
        out += b"\x21\xf9\x04" + bytes([gflags]) + struct.pack(
            "<H", delays[fi]
        ) + bytes([trans_idx or 0, 0])
        flags = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, flags)
        rows = idx
        if interlace:
            order = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            rows = idx[order]
        out.append(8)  # LZW minimum code size
        lzw = _lzw_compress(rows.reshape(-1), 8)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(payload: bytes) -> dict:
    """GIF -> {"width", "height", "frames": [(H, W, 3) uint8 ...],
    "delays_cs": [int ...], "transparent_index": [int|None ...]}.
    Frames are composited canvases ("draw over previous" semantics).
    Raises ``ValueError`` outside the supported profile."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"not a GIF: header {payload[:6]!r}")
    w, h, flags, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(
            payload[pos : pos + 3 * n], np.uint8
        ).reshape(n, 3)
        pos += 3 * n
    frames: list[np.ndarray] = []
    delays: list[int] = []
    trans: list[int | None] = []
    canvas = np.zeros((h, w, 3), np.uint8)
    pending_delay = 0
    pending_trans: int | None = None
    pending_disposal = 0
    while True:
        if pos >= len(payload):
            raise ValueError("missing GIF trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                gflags = data[0]
                (pending_delay,) = struct.unpack("<H", data[1:3])
                pending_trans = data[3] if gflags & 0x01 else None
                pending_disposal = (gflags >> 2) & 0x7
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block {block:#04x}")
        fx, fy, fw, fh, iflags = struct.unpack(
            "<HHHHB", payload[pos : pos + 9]
        )
        pos += 9
        pal = global_pal
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(
                payload[pos : pos + 3 * n], np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("image has neither global nor local palette")
        mcs = payload[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError(f"bad LZW minimum code size {mcs}")
        lzw, pos = _sub_blocks(payload, pos)
        idx = _lzw_decompress(lzw, mcs, fw * fh).reshape(fh, fw)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("pixel index outside the color table")
        before = canvas  # for disposal 3 (restore to previous)
        canvas = canvas.copy()
        region = canvas[fy : fy + fh, fx : fx + fw]
        rendered = pal[idx]
        if pending_trans is not None:
            keep = idx == pending_trans  # holes show the prior canvas
            region[...] = np.where(keep[..., None], region, rendered)
        else:
            region[...] = rendered
        frames.append(canvas)
        delays.append(pending_delay)
        trans.append(pending_trans)
        # disposal prepares the canvas the NEXT frame draws onto
        if pending_disposal == 2:  # restore to background (base black)
            canvas = canvas.copy()
            canvas[fy : fy + fh, fx : fx + fw] = 0
        elif pending_disposal == 3:  # restore to previous
            canvas = before
        pending_delay, pending_trans, pending_disposal = 0, None, 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return {
        "width": w,
        "height": h,
        "frames": frames,
        "delays_cs": delays,
        "transparent_index": trans,
    }


def gif_frame_features(payload: bytes) -> list[dict]:
    """Per-frame features for the multimodal plane: frame index, delay
    and mean pixel over the composited RGB canvas."""
    d = decode_gif(payload)
    out = []
    for i, (f, delay) in enumerate(zip(d["frames"], d["delays_cs"])):
        out.append(
            {
                "frame_idx": i,
                "delay_cs": int(delay),
                "width": d["width"],
                "height": d["height"],
                "mean_pixel": float(f.astype(np.float64).mean()),
            }
        )
    return out
