"""WebP lossless (VP8L) codec — pure stdlib + numpy.

WebP is the dominant *web image* format a modern crawl meets (HTTP
Archive puts it ahead of PNG on new pages), and its lossless VP8L
profile is a from-first-principles codec exercise: the public "WebP
Lossless Bitstream Specification" (Google, 2012-2023; RFC 9649
carries the container) defines an LSB-first bitstream of

* a RIFF container (``RIFF``/``WEBP``/``VP8L`` chunk),
* a 1-byte ``0x2F`` signature + 14-bit width/height fields,
* up to four invertible TRANSFORMS (predictor with a per-block mode
  sub-image, cross-channel color transform, subtract-green, color
  indexing with sub-byte pixel bundling),
* a spatially-coded ARGB image: canonical Huffman code groups (green
  + LZ77 lengths + color-cache indices / red / blue / alpha /
  distances) read bit-by-bit MSB-of-code-first, optional META-Huffman
  (an entropy image selecting a code group per 2^b-pixel tile),
  optional COLOR CACHE (the ``0x1e35a7bd`` multiplicative hash), and
  LZ77 backward references whose short distances map through the
  spec's 120-entry 2D neighborhood table.

Decoder: the full profile above. Encoder: real Huffman codes built
from symbol frequencies (normal code-length-coded codes and the 1/2
symbol "simple" form), LZ77 run references (previous pixel, and
copy-above emitted through 2D code 1), optional color cache,
subtract-green, uniform predictor (mode sub-image emitted as a real
entropy-coded stream), and color indexing with bundling for small
palettes. Encode->decode round trips are bit-faithful; decode-side
strictness raises on bad signatures, over/underruns, invalid Huffman
code sets, and truncated streams.

The reference engine has no media surface; north-star extension
surface like :mod:`levi_spark.operators.png` (same per-doc
Arrow-batch decode slot). No code is shared with or derived from
libwebp — everything is implemented from the published spec text;
constants (distance map, hash multiplier, code-length order) are
spec tables.
"""

from __future__ import annotations

import struct

import numpy as np

_CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
                      13, 14, 15]

# spec §4.2.2: 2D neighborhood for distance codes 1..120, (dx, dy)
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (6, 5), (-6, 5), (5, 6), (-5, 6),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]

_HASH_MUL = 0x1E35A7BD


# --------------------------------------------------------------------------
# bit I/O (LSB-first stream; Huffman codes MSB-of-code-first)
# --------------------------------------------------------------------------


class _BitReader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0  # bit position

    def bit(self) -> int:
        p = self.pos
        if (p >> 3) >= len(self.buf):
            raise ValueError("VP8L bitstream overrun")
        self.pos = p + 1
        return (self.buf[p >> 3] >> (p & 7)) & 1

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def bit(self, b: int):
        self.acc |= (b & 1) << self.nacc
        self.nacc += 1
        if self.nacc == 8:
            self.out.append(self.acc)
            self.acc = 0
            self.nacc = 0

    def bits(self, v: int, n: int):
        for i in range(n):
            self.bit((v >> i) & 1)

    def code(self, value: int, length: int):
        for i in range(length - 1, -1, -1):
            self.bit((value >> i) & 1)

    def done(self) -> bytes:
        if self.nacc:
            self.out.append(self.acc)
            self.acc = 0
            self.nacc = 0
        return bytes(self.out)


# --------------------------------------------------------------------------
# canonical Huffman
# --------------------------------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), DEFLATE canonical assignment."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _Huffman:
    """Bit-serial decoder over canonical codes (codes are consumed
    most-significant-bit first per the VP8L spec)."""

    def __init__(self, lengths: list[int]):
        used = [s for s, ln in enumerate(lengths) if ln]
        if not used:
            raise ValueError("VP8L: empty Huffman code")
        if len(used) == 1:
            self.single = used[0]
            self.table = {}
            return
        # completeness (Kraft equality) — an over/under-subscribed
        # code is corrupt and would loop or misdecode
        kraft = sum(2 ** -ln for ln in lengths if ln)
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError(f"VP8L: invalid Huffman code (Kraft {kraft})")
        self.single = None
        self.table = {
            (ln, code): sym
            for sym, (code, ln) in _canonical_codes(lengths).items()
        }

    @classmethod
    def fixed(cls, symbols: list[int]):
        h = cls.__new__(cls)
        if len(symbols) == 1:
            h.single = symbols[0]
            h.table = {}
        else:
            h.single = None
            h.table = {(1, 0): symbols[0], (1, 1): symbols[1]}
        return h

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code, depth = 0, 0
        while depth <= 15:
            code = (code << 1) | br.bit()
            depth += 1
            sym = self.table.get((depth, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: Huffman code longer than 15 bits")


def _read_huffman_code(br: _BitReader, alphabet: int) -> _Huffman:
    if br.bit():  # simple code
        nsym = br.bit() + 1
        first = br.bits(8) if br.bit() else br.bit()
        syms = [first]
        if nsym == 2:
            syms.append(br.bits(8))
        if max(syms) >= alphabet:
            raise ValueError(
                f"VP8L: simple-code symbol {max(syms)} >= alphabet {alphabet}"
            )
        return _Huffman.fixed(syms)
    n_lengths = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(n_lengths):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.bits(3)
    cl = _Huffman(cl_lengths)
    if br.bit():  # limited max_symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < alphabet and max_symbol > 0:
        max_symbol -= 1
        s = cl.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.bits(2)
            lengths[i : i + rep] = [prev] * min(rep, alphabet - i)
            i += rep
        elif s == 17:
            i += 3 + br.bits(3)
        else:
            i += 11 + br.bits(7)
    if i > alphabet:
        raise ValueError("VP8L: code lengths overflow the alphabet")
    return _Huffman(lengths)


# --------------------------------------------------------------------------
# LZ77 prefix coding (spec §4.2.1)
# --------------------------------------------------------------------------


def _prefix_decode(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value -> (code, extra_bits, extra_value)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    highest = v.bit_length() - 1
    second = (v >> (highest - 1)) & 1
    extra = highest - 1
    return 2 * highest + second, extra, v & ((1 << extra) - 1)


# --------------------------------------------------------------------------
# spatial image stream (decode)
# --------------------------------------------------------------------------


def _cache_key(px: tuple[int, int, int, int], bits: int) -> int:
    argb = (px[0] << 24) | (px[1] << 16) | (px[2] << 8) | px[3]
    return (_HASH_MUL * argb & 0xFFFFFFFF) >> (32 - bits)


def _read_code_group(br: _BitReader, cache_size: int) -> list[_Huffman]:
    return [
        _read_huffman_code(br, 256 + 24 + cache_size),
        _read_huffman_code(br, 256),
        _read_huffman_code(br, 256),
        _read_huffman_code(br, 256),
        _read_huffman_code(br, 40),
    ]


def _decode_spatial(br: _BitReader, w: int, h: int, is_level0: bool):
    """Decode one image stream (no transforms) -> list of ARGB tuples."""
    cache_bits = br.bits(4) if br.bit() else 0
    if cache_bits > 11:
        raise ValueError(f"VP8L: color cache bits {cache_bits} > 11")
    cache_size = (1 << cache_bits) if cache_bits else 0
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.bit():  # meta Huffman
        meta_bits = 2 + br.bits(3)
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        epx = _decode_spatial(br, mw, mh, False)
        meta = [((p[1] << 8) | p[2]) for p in epx]  # (red<<8)|green
        n_groups = max(meta) + 1
    groups = [_read_code_group(br, cache_size) for _ in range(n_groups)]
    cache = [(0, 0, 0, 0)] * cache_size
    n = w * h
    px: list[tuple[int, int, int, int]] = []
    while len(px) < n:
        if meta is not None:
            x, y = len(px) % w, len(px) // w
            mw = (w + (1 << meta_bits) - 1) >> meta_bits
            g = groups[meta[(y >> meta_bits) * mw + (x >> meta_bits)]]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            out = [(alpha, red, s, blue)]
        elif s < 280:
            length = _prefix_decode(s - 256, br)
            dcode = _prefix_decode(g[4].read(br), br)
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            if dist > len(px):
                raise ValueError(
                    f"VP8L: backref distance {dist} at pixel {len(px)}"
                )
            if len(px) + length > n:
                raise ValueError("VP8L: backref overruns the image")
            start = len(px) - dist
            for k in range(length):  # overlap-safe: px grows as we copy
                p = px[start + k]
                px.append(p)
                if cache_size:
                    cache[_cache_key(p, cache_bits)] = p
            continue
        else:
            idx = s - 280
            if idx >= cache_size:
                raise ValueError(f"VP8L: cache index {idx} >= {cache_size}")
            out = [cache[idx]]
        for p in out:
            px.append(p)
            if cache_size:
                cache[_cache_key(p, cache_bits)] = p
    return px


# --------------------------------------------------------------------------
# transforms (decode side: inverses)
# --------------------------------------------------------------------------


def _avg2(a, b):
    return tuple((x + y) >> 1 for x, y in zip(a, b))


def _clamp_add_sub_full(l, t, tl):
    return tuple(
        min(255, max(0, x + y - z)) for x, y, z in zip(l, t, tl)
    )


def _clamp_add_sub_half(l, t, tl):
    ave = _avg2(l, t)
    out = []
    for a, b in zip(ave, tl):
        d = a - b
        half = d // 2 if d >= 0 else -((-d) // 2)  # C trunc division
        out.append(min(255, max(0, a + half)))
    return tuple(out)


def _select(l, t, tl):
    pred = [a + b - c for a, b, c in zip(l, t, tl)]
    p_l = sum(abs(p - x) for p, x in zip(pred, l))
    p_t = sum(abs(p - x) for p, x in zip(pred, t))
    return l if p_l < p_t else t


def _predict(mode: int, l, t, tr, tl):
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(l, t, tl)
    raise ValueError(f"VP8L: predictor mode {mode}")


def _inv_predictor(px, w, h, modes, mode_w, bits):
    out = []
    for i, res in enumerate(px):
        x, y = i % w, i // w
        if x == 0 and y == 0:
            pred = (255, 0, 0, 0)
        elif y == 0:
            pred = out[i - 1]  # L
        elif x == 0:
            pred = out[i - w]  # T
        else:
            mode = modes[(y >> bits) * mode_w + (x >> bits)][2]  # green
            l = out[i - 1]
            t = out[i - w]
            # top-right indexes the contiguous ARGB array: for the
            # rightmost column it wraps to the CURRENT row's first
            # pixel (already decoded) — the spec/libwebp semantic
            tr = out[i - w + 1]
            tl = out[i - w - 1]
            pred = _predict(mode, l, t, tr, tl)
        out.append(tuple((r + p) & 0xFF for r, p in zip(res, pred)))
    return out


def _ct_delta(t: int, c: int) -> int:
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_color_transform(px, w, h, elems, ew, bits):
    out = []
    for i, (a, r, g, b) in enumerate(px):
        x, y = i % w, i // w
        e = elems[(y >> bits) * ew + (x >> bits)]
        # ColorTransformElement packing (spec): green_to_red in the
        # BLUE byte, green_to_blue in the GREEN byte, red_to_blue in
        # the RED byte of the transform-image pixel (a, r, g, b)
        g2r, g2b, r2b = e[3], e[2], e[1]
        r2 = (r + _ct_delta(g2r, g)) & 0xFF
        b2 = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r2)) & 0xFF
        out.append((a, r2, g, b2))
    return out


def _inv_subtract_green(px):
    return [(a, (r + g) & 0xFF, g, (b + g) & 0xFF) for a, r, g, b in px]


def _inv_color_indexing(px, w, h, palette, pack_bits):
    if not pack_bits:
        out = []
        for _, _, g, _ in px:
            if g >= len(palette):
                raise ValueError(f"VP8L: palette index {g}")
            out.append(palette[g])
        return out
    ppb = 1 << pack_bits  # pixels per coded byte
    idx_bits = 8 >> pack_bits
    coded_w = (w + ppb - 1) // ppb
    out = []
    for y in range(h):
        for x in range(w):
            g = px[y * coded_w + x // ppb][2]
            k = x % ppb
            idx = (g >> (k * idx_bits)) & ((1 << idx_bits) - 1)
            if idx >= len(palette):
                raise ValueError(f"VP8L: palette index {idx}")
            out.append(palette[idx])
    return out


def decode_webp(payload: bytes) -> np.ndarray:
    """WebP lossless bytes -> (H, W, 4) uint8 RGBA."""
    if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError(f"not a WebP (starts {payload[:4]!r})")
    if payload[12:16] != b"VP8L":
        raise NotImplementedError(
            f"chunk {payload[12:16]!r}: only lossless VP8L is supported"
        )
    (chunk_len,) = struct.unpack_from("<I", payload, 16)
    data = payload[20 : 20 + chunk_len]
    if len(data) != chunk_len:
        raise ValueError("VP8L chunk truncated")
    if data[0] != 0x2F:
        raise ValueError(f"VP8L signature byte {data[0]:#x}")
    br = _BitReader(data[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("VP8L version != 0")
    cur_w = w
    transforms = []  # (type, payload...)
    seen = set()
    while br.bit():
        tt = br.bits(2)
        if tt in seen:
            raise ValueError(f"VP8L: transform {tt} repeated")
        seen.add(tt)
        if tt == 0 or tt == 1:  # predictor / color transform
            bits = br.bits(3) + 2
            sw = (cur_w + (1 << bits) - 1) >> bits
            sh = (h + (1 << bits) - 1) >> bits
            sub = _decode_spatial(br, sw, sh, False)
            transforms.append((tt, bits, sw, sub))
        elif tt == 2:  # subtract green
            transforms.append((2,))
        else:  # color indexing
            n_colors = br.bits(8) + 1
            deltas = _decode_spatial(br, n_colors, 1, False)
            palette = []
            prev = (0, 0, 0, 0)
            for d in deltas:
                prev = tuple((p + q) & 0xFF for p, q in zip(prev, d))
                palette.append(prev)
            if n_colors <= 2:
                pack = 3
            elif n_colors <= 4:
                pack = 2
            elif n_colors <= 16:
                pack = 1
            else:
                pack = 0
            transforms.append((3, palette, pack))
            if pack:
                cur_w = (cur_w + (1 << pack) - 1) >> pack
    px = _decode_spatial(br, cur_w, h, True)
    for t in reversed(transforms):
        if t[0] == 0:
            px = _inv_predictor(px, cur_w, h, t[3], t[2], t[1])
        elif t[0] == 1:
            px = _inv_color_transform(px, cur_w, h, t[3], t[2], t[1])
        elif t[0] == 2:
            px = _inv_subtract_green(px)
        else:
            px = _inv_color_indexing(px, w, h, t[1], t[2])
            cur_w = w
    if len(px) != w * h:
        raise ValueError("VP8L: decoded pixel count mismatch")
    arr = np.array(px, dtype=np.uint8).reshape(h, w, 4)
    # ARGB -> RGBA
    return arr[:, :, [1, 2, 3, 0]].copy()


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


def _huffman_lengths(freqs: list[int], max_len: int = 15) -> list[int]:
    """Code lengths from frequencies (heap Huffman; raises if the
    depth limit is exceeded — our alphabets/fixtures stay shallow)."""
    import heapq

    live = [(f, [s]) for s, f in enumerate(freqs) if f]
    if not live:
        return [0] * len(freqs)
    if len(live) == 1:
        out = [0] * len(freqs)
        out[live[0][1][0]] = 1
        return out
    heap = [(f, i, syms) for i, (f, syms) in enumerate(live)]
    heapq.heapify(heap)
    depth = {s: 0 for _, _, syms in heap for s in syms}
    tie = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, tie, s1 + s2))
        tie += 1
    out = [0] * len(freqs)
    for s, d in depth.items():
        if d > max_len:
            raise ValueError(f"VP8L encoder: code depth {d} > {max_len}")
        out[s] = d
    return out


def _write_huffman_code(bw: _BitWriter, lengths: list[int]):
    used = [s for s, ln in enumerate(lengths) if ln]
    if len(used) <= 2 and all(s < 256 for s in used):
        bw.bit(1)  # simple
        bw.bit(len(used) - 1)
        first = used[0] if used else 0
        if first <= 1 and len(used) >= 1:
            bw.bit(0)  # 1-bit first symbol
            bw.bit(first)
        else:
            bw.bit(1)
            bw.bits(first, 8)
        if len(used) == 2:
            bw.bits(used[1], 8)
        return
    bw.bit(0)  # normal
    cl_freq = [0] * 19
    for ln in lengths:
        cl_freq[ln] += 1
    cl_lengths = _huffman_lengths(cl_freq, 7)
    bw.bits(15, 4)  # num_code_lengths = 19
    for sym in _CODE_LENGTH_ORDER:
        bw.bits(cl_lengths[sym], 3)
    bw.bit(0)  # no max_symbol cap
    codes = _canonical_codes(cl_lengths)
    for ln in lengths:
        c, cl = codes[ln]
        bw.code(c, cl)


def _encode_spatial(bw: _BitWriter, px: list, w: int, h: int,
                    is_level0: bool, cache_bits: int = 0):
    """Tokenize (literals / run backrefs / cache hits) then entropy-code."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    if cache_bits:
        bw.bit(1)
        bw.bits(cache_bits, 4)
    else:
        bw.bit(0)
    if is_level0:
        bw.bit(0)  # no meta Huffman
    # tokenize
    cache = [(0, 0, 0, 0)] * cache_size
    tokens = []  # ("lit", px) | ("copy", length, dist) | ("cache", idx)
    n = len(px)
    i = 0
    while i < n:
        p = px[i]
        # run of previous pixel (dist 1) or copy-above (dist w)
        best_len, best_dist = 0, 0
        for dist in (1, w):
            if dist > i:
                continue
            ln = 0
            while i + ln < n and px[i + ln] == px[i + ln - dist]:
                ln += 1
                if ln >= 4096:
                    break
            if ln > best_len:
                best_len, best_dist = ln, dist
        if best_len >= 3:
            tokens.append(("copy", best_len, best_dist))
            for j in range(best_len):
                if cache_size:
                    q = px[i + j]
                    cache[_cache_key(q, cache_bits)] = q
            i += best_len
            continue
        if cache_size:
            k = _cache_key(p, cache_bits)
            if cache[k] == p:
                tokens.append(("cache", k))
                i += 1
                continue
            cache[k] = p
        tokens.append(("lit", p))
        i += 1
    # frequencies
    gf = [0] * (256 + 24 + cache_size)
    rf, bf, af, df = [0] * 256, [0] * 256, [0] * 256, [0] * 40
    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = t[1]
            gf[g] += 1
            rf[r] += 1
            bf[b] += 1
            af[a] += 1
        elif t[0] == "copy":
            lc, _, _ = _prefix_encode(t[1])
            gf[256 + lc] += 1
            dcode = 1 if t[2] == w and w > 1 else t[2] + 120
            dc, _, _ = _prefix_encode(dcode)
            df[dc] += 1
        else:
            gf[280 + t[1]] += 1
    for f in (rf, bf, af, df):
        if not any(f):
            f[0] = 1  # a code must exist even if unused
    lens = [
        _huffman_lengths(gf),
        _huffman_lengths(rf),
        _huffman_lengths(bf),
        _huffman_lengths(af),
        _huffman_lengths(df),
    ]
    for ln in lens:
        _write_huffman_code(bw, ln)
    # a single-symbol code is ZERO bits on the wire (the decoder's
    # degenerate-code rule), so its write table must be empty-width
    codes = [
        {s: (0, 0) for s, l in enumerate(ln) if l}
        if sum(1 for l in ln if l) == 1
        else _canonical_codes(ln)
        for ln in lens
    ]

    def put(ci: int, sym: int):
        c, ln = codes[ci][sym]
        bw.code(c, ln)

    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = t[1]
            put(0, g)
            put(1, r)
            put(2, b)
            put(3, a)
        elif t[0] == "copy":
            lc, le, lv = _prefix_encode(t[1])
            put(0, 256 + lc)
            bw.bits(lv, le)
            dcode = 1 if t[2] == w and w > 1 else t[2] + 120
            dc, de, dv = _prefix_encode(dcode)
            put(4, dc)
            bw.bits(dv, de)
        else:
            put(0, 280 + t[1])


def encode_webp(
    img: np.ndarray,
    subtract_green: bool = False,
    cache_bits: int = 0,
    palette: bool = False,
    predictor: int | None = None,
    color_transform: tuple[int, int, int] | None = None,
) -> bytes:
    """uint8 (H, W, 3|4) -> lossless WebP. ``subtract_green`` /
    ``palette`` (color indexing incl. sub-byte bundling for <= 16
    colors) / uniform ``predictor`` mode / uniform
    ``color_transform`` ``(green_to_red, green_to_blue,
    red_to_blue)`` are real transform encodes; at most one of
    palette/predictor, optionally + subtract_green and/or the color
    transform."""
    a8 = np.asarray(img, dtype=np.uint8)
    if a8.ndim != 3 or a8.shape[2] not in (3, 4):
        raise ValueError(f"WebP needs (H, W, 3|4) uint8, got {a8.shape}")
    h, w = a8.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError(f"WebP dims {w}x{h} outside 14-bit range")
    if palette and (subtract_green or predictor is not None):
        raise ValueError("palette combines with no other transform here")
    has_alpha = a8.shape[2] == 4
    px = [
        (int(p[3]) if has_alpha else 255, int(p[0]), int(p[1]), int(p[2]))
        for p in a8.reshape(-1, a8.shape[2])
    ]
    bw = _BitWriter()
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bit(1 if has_alpha else 0)
    bw.bits(0, 3)  # version
    cur_w = w
    if predictor is not None:
        if not 0 <= predictor <= 13:
            raise ValueError(f"predictor mode {predictor}")
        bw.bit(1)
        bw.bits(0, 2)  # transform 0
        bits = 4  # 16x16 blocks
        bw.bits(bits - 2, 3)
        sw = (w + 15) >> 4
        sh = (h + 15) >> 4
        modes = [(255, 0, predictor, 0)] * (sw * sh)
        _encode_spatial(bw, modes, sw, sh, False)
        res = []
        out = []
        for i, p in enumerate(px):
            x, y = i % w, i // w
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = out[i - 1]
            elif x == 0:
                pred = out[i - w]
            else:
                l, t = out[i - 1], out[i - w]
                tr = out[i - w + 1]
                tl = out[i - w - 1]
                pred = _predict(predictor, l, t, tr, tl)
            res.append(tuple((c - q) & 0xFF for c, q in zip(p, pred)))
            out.append(p)
        px = res
    if color_transform is not None:
        g2r, g2b, r2b = color_transform
        if not all(0 <= t <= 255 for t in (g2r, g2b, r2b)):
            raise ValueError(f"color transform bytes {color_transform}")
        bw.bit(1)
        bw.bits(1, 2)  # transform 1
        bits = 4  # 16x16 blocks
        bw.bits(bits - 2, 3)
        sw = (w + 15) >> 4
        sh = (h + 15) >> 4
        # element pixel: r2b in RED, g2b in GREEN, g2r in BLUE
        elems = [(255, r2b, g2b, g2r)] * (sw * sh)
        _encode_spatial(bw, elems, sw, sh, False)
        fwd = []
        for a, r, g, b in px:
            r_enc = (r - _ct_delta(g2r, g)) & 0xFF
            b_enc = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
            fwd.append((a, r_enc, g, b_enc))
        px = fwd
    if subtract_green:
        bw.bit(1)
        bw.bits(2, 2)  # transform 2
        px = [(a, (r - g) & 0xFF, g, (b - g) & 0xFF) for a, r, g, b in px]
    if palette:
        colors = []
        index = {}
        for p in px:
            if p not in index:
                index[p] = len(colors)
                colors.append(p)
        if len(colors) > 256:
            raise ValueError(f"palette: {len(colors)} colors > 256")
        bw.bit(1)
        bw.bits(3, 2)  # transform 3
        bw.bits(len(colors) - 1, 8)
        deltas = []
        prev = (0, 0, 0, 0)
        for c in colors:
            deltas.append(tuple((a - b) & 0xFF for a, b in zip(c, prev)))
            prev = c
        _encode_spatial(bw, deltas, len(colors), 1, False)
        nc = len(colors)
        pack = 3 if nc <= 2 else 2 if nc <= 4 else 1 if nc <= 16 else 0
        if pack:
            ppb = 1 << pack
            idx_bits = 8 >> pack
            coded_w = (w + ppb - 1) // ppb
            packed = []
            for y in range(h):
                for cx in range(coded_w):
                    g = 0
                    for k in range(ppb):
                        x = cx * ppb + k
                        if x < w:
                            g |= index[px[y * w + x]] << (k * idx_bits)
                    packed.append((255, 0, g, 0))
            px, cur_w = packed, coded_w
        else:
            px = [(255, 0, index[p], 0) for p in px]
    bw.bit(0)  # end of transforms
    _encode_spatial(bw, px, cur_w, h, True, cache_bits=cache_bits)
    body = b"\x2f" + bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
