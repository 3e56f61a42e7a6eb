"""DEFLATE (RFC 1951) — from scratch, pure stdlib + numpy.

The one compressed format underneath everything this engine already
ingests — gzip members (WARC, tar.gz), ZIP entries, PNG IDAT, PDF
FlateDecode — has so far been delegated to :mod:`zlib`. This module
owns the bitstream itself:

* :func:`inflate` — the full RFC 1951 decoder: LSB-first bit reader,
  stored blocks (LEN/NLEN complement check), fixed-Huffman blocks,
  dynamic blocks (the 19-symbol code-length code in the spec's
  scrambled order, repeat codes 16/17/18), canonical Huffman codes
  read code-MSB-first, the §3.2.5 length/distance prefix tables with
  extra bits, and the 32 KiB back-reference window (overlap-safe).
* :func:`deflate` — a real encoder: greedy LZ77 with a 3-byte
  hash-chain matcher (window 32 KiB, lazy-free — greedy is enough
  for a correct, well-compressing stream) emitted through the FIXED
  Huffman code, plus stored-block mode. Every stream it emits is
  accepted by zlib.
* :func:`zlib_wrap` / :func:`zlib_unwrap` — the RFC 1950 container
  (CMF/FLG header with the check-bits rule, Adler-32 trailer
  computed here, not borrowed).

Strict decode: bad NLEN complements, over/under-subscribed Huffman
codes, distances past the window, reserved block type 3, repeat
codes with no previous length, and truncation all raise. The tests
cross-check BOTH directions against zlib (the reference
implementation) across entropy regimes and block types. North-star
codec surface like :mod:`levi_spark.operators.webp`.
"""

from __future__ import annotations

import struct

_CL_ORDER = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14,
             1, 15]

# RFC 1951 §3.2.5: length codes 257..285 -> (extra bits, base length)
_LEN_TABLE = (
    [(0, n) for n in range(3, 11)]
    + [(1, 11), (1, 13), (1, 15), (1, 17)]
    + [(2, 19), (2, 23), (2, 27), (2, 31)]
    + [(3, 35), (3, 43), (3, 51), (3, 59)]
    + [(4, 67), (4, 83), (4, 99), (4, 115)]
    + [(5, 131), (5, 163), (5, 195), (5, 227)]
    + [(0, 258)]
)
# distance codes 0..29 -> (extra bits, base distance)
_DIST_TABLE = [(0, 1), (0, 2), (0, 3), (0, 4)]
while len(_DIST_TABLE) < 30:
    extra = len(_DIST_TABLE) // 2 - 1
    base = _DIST_TABLE[-1][1] + (1 << (_DIST_TABLE[-1][0]))
    _DIST_TABLE.append((extra, base))


class _Bits:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def bit(self) -> int:
        p = self.pos
        if (p >> 3) >= len(self.buf):
            raise ValueError("DEFLATE stream truncated")
        self.pos = p + 1
        return (self.buf[p >> 3] >> (p & 7)) & 1

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v

    def align_byte(self):
        self.pos = (self.pos + 7) & ~7


_ROOT_BITS = 10  # primary flat-table width; codes longer than this
#                  (rare symbols by Huffman construction) fall back to
#                  the canonical bit-walk over self.table


class _Huff:
    """Canonical Huffman decoder (codes read MSB-of-code-first).

    Decoding is table-driven: ``fast`` maps the next ``root`` stream
    bits (LSB-first peek, so bit 0 of the index is the first stream
    bit = the MSB of the code) to a packed ``(sym << 4) | code_len``
    entry, filled for every don't-care suffix. Codes longer than
    ``root`` bits hit the -1 sentinel and take the canonical
    ``(len, code) -> sym`` walk instead — by construction those are
    the rarest symbols in the block, so the slow path almost never
    runs. Unused patterns of an under-subscribed code stay -1 and
    raise at decode time, exactly like the old per-bit walk."""

    def __init__(self, lengths: list[int]):
        counts: dict[int, int] = {}
        for ln in lengths:
            if ln:
                counts[ln] = counts.get(ln, 0) + 1
        if not counts:
            raise ValueError("DEFLATE: empty Huffman code")
        kraft = sum(c * 2 ** -ln for ln, c in counts.items())
        if kraft > 1 + 1e-12:
            raise ValueError("DEFLATE: over-subscribed Huffman code")
        # under-subscription is legal only for the degenerate 1-code
        # case in practice (zlib emits complete codes); decode simply
        # fails on unused patterns
        code = 0
        next_code = {}
        for ln in range(1, max(counts) + 1):
            code = (code + counts.get(ln - 1, 0)) << 1
            next_code[ln] = code
        self.table: dict[tuple[int, int], int] = {}
        self.max_len = max(counts)
        root = self.max_len if self.max_len < _ROOT_BITS else _ROOT_BITS
        self.root = root
        self.mask = (1 << root) - 1
        fast = [-1] * (1 << root)
        for sym, ln in enumerate(lengths):
            if not ln:
                continue
            c = next_code[ln]
            self.table[(ln, c)] = sym
            next_code[ln] += 1
            if ln <= root:
                # reverse the ln code bits: stream order is MSB of
                # code first, peek order is LSB of index first
                rev = 0
                for b in range(ln):
                    rev |= ((c >> b) & 1) << (ln - 1 - b)
                entry = (sym << 4) | ln
                step = 1 << ln
                for idx in range(rev, 1 << root, step):
                    fast[idx] = entry
        self.fast = fast

    def read(self, br: _Bits) -> int:
        code = 0
        for depth in range(1, self.max_len + 1):
            code = (code << 1) | br.bit()
            sym = self.table.get((depth, code))
            if sym is not None:
                return sym
        raise ValueError("DEFLATE: invalid Huffman code in stream")


_FIXED_LIT = _Huff(
    [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8
)
_FIXED_DIST = _Huff([5] * 30)


# Unzipped copies of _LEN_TABLE / _DIST_TABLE for the hot loop (one
# list index instead of tuple unpack per match).
_LEN_EB = [t[0] for t in _LEN_TABLE]
_LEN_BASE = [t[1] for t in _LEN_TABLE]
_DIST_EB = [t[0] for t in _DIST_TABLE]
_DIST_BASE = [t[1] for t in _DIST_TABLE]


def inflate(payload: bytes) -> bytes:
    """Raw DEFLATE stream -> bytes (RFC 1951, all three block types).

    Table-driven: the bit reader is an integer accumulator refilled a
    byte at a time (no per-bit calls), Huffman symbols resolve through
    the :class:`_Huff` root table in one list index, and back-reference
    copies are slice-based (with the overlap-repeat case materialized
    by tiling the last ``distance`` bytes) instead of per-byte appends.
    Error behavior is unchanged from the per-bit decoder: truncation,
    bad stored-block complements, over-subscribed codes, unused
    patterns of under-subscribed codes, reserved block type 3 and
    out-of-window distances all raise ValueError."""
    buf = payload
    blen = len(buf)
    bp = 0  # next byte to load into the accumulator
    acc = 0  # LSB = next stream bit
    cnt = 0  # bits currently in acc
    out = bytearray()

    while True:
        while cnt < 3:
            if bp >= blen:
                raise ValueError("DEFLATE stream truncated")
            acc |= buf[bp] << cnt
            bp += 1
            cnt += 8
        bfinal = acc & 1
        btype = (acc >> 1) & 3
        acc >>= 3
        cnt -= 3
        if btype == 0:  # stored
            acc >>= cnt & 7  # align to byte
            cnt -= cnt & 7
            at = bp - (cnt >> 3)
            if at + 4 > blen:
                raise ValueError("DEFLATE: stored header truncated")
            ln, nln = struct.unpack_from("<HH", buf, at)
            if ln != (~nln & 0xFFFF):
                raise ValueError(
                    f"DEFLATE: stored LEN {ln:#06x} != ~NLEN {nln:#06x}"
                )
            if at + 4 + ln > blen:
                raise ValueError("DEFLATE: stored block truncated")
            out += buf[at + 4 : at + 4 + ln]
            bp = at + 4 + ln
            acc = 0
            cnt = 0
        elif btype in (1, 2):
            if btype == 1:
                lit, dist = _FIXED_LIT, _FIXED_DIST
            else:
                # dynamic header: small, so a per-field refill loop is
                # fine here; the hot loop below stays branch-lean
                def _take(n):
                    nonlocal acc, cnt, bp
                    while cnt < n:
                        if bp >= blen:
                            raise ValueError("DEFLATE stream truncated")
                        acc |= buf[bp] << cnt
                        bp += 1
                        cnt += 8
                    v = acc & ((1 << n) - 1)
                    acc >>= n
                    cnt -= n
                    return v

                hlit = _take(5) + 257
                hdist = _take(5) + 1
                hclen = _take(4) + 4
                cl_lengths = [0] * 19
                for i in range(hclen):
                    cl_lengths[_CL_ORDER[i]] = _take(3)
                cl = _Huff(cl_lengths)
                cl_fast, cl_mask, cl_max = cl.fast, cl.mask, cl.max_len
                lengths: list[int] = []
                while len(lengths) < hlit + hdist:
                    while cnt < 7 and bp < blen:
                        acc |= buf[bp] << cnt
                        bp += 1
                        cnt += 8
                    e = cl_fast[acc & cl_mask]
                    if e < 0:
                        raise ValueError(
                            "DEFLATE: invalid Huffman code in stream"
                        )
                    w = e & 15
                    if w > cnt:
                        raise ValueError("DEFLATE stream truncated")
                    acc >>= w
                    cnt -= w
                    s = e >> 4
                    if s < 16:
                        lengths.append(s)
                    elif s == 16:
                        if not lengths:
                            raise ValueError(
                                "DEFLATE: repeat code with no previous"
                            )
                        lengths += [lengths[-1]] * (3 + _take(2))
                    elif s == 17:
                        lengths += [0] * (3 + _take(3))
                    else:
                        lengths += [0] * (11 + _take(7))
                if len(lengths) > hlit + hdist:
                    raise ValueError("DEFLATE: code lengths overflow")
                lit = _Huff(lengths[:hlit])
                # RFC 1951 §3.2.7 permits ONE distance code of zero
                # bits when the block is all literals — the table may
                # be empty, so defer the error to the first actual
                # distance read instead of table-build time
                dist = (
                    _Huff(lengths[hlit:])
                    if any(lengths[hlit:])
                    else None
                )
            lit_fast, lit_mask = lit.fast, lit.mask
            lit_tab, lit_max = lit.table, lit.max_len
            if dist is not None:
                d_fast, d_mask = dist.fast, dist.mask
                d_tab, d_max = dist.table, dist.max_len
            append = out.append
            while True:
                # one refill covers the root peek (<=10 bits); longer
                # codes and extra bits refill on their own paths
                while cnt < 15 and bp < blen:
                    acc |= buf[bp] << cnt
                    bp += 1
                    cnt += 8
                e = lit_fast[acc & lit_mask]
                if e >= 0:
                    w = e & 15
                    s = e >> 4
                else:  # code longer than the root table (rare symbol)
                    code = 0
                    s = -1
                    for depth in range(1, lit_max + 1):
                        if depth > cnt:
                            raise ValueError("DEFLATE stream truncated")
                        code = (code << 1) | ((acc >> (depth - 1)) & 1)
                        sym = lit_tab.get((depth, code))
                        if sym is not None:
                            s, w = sym, depth
                            break
                    if s < 0:
                        raise ValueError(
                            "DEFLATE: invalid Huffman code in stream"
                        )
                if w > cnt:
                    raise ValueError("DEFLATE stream truncated")
                acc >>= w
                cnt -= w
                if s < 256:
                    append(s)
                    continue
                if s == 256:
                    break
                if s > 285:
                    raise ValueError(f"DEFLATE: length code {s}")
                eb = _LEN_EB[s - 257]
                while cnt < eb:
                    if bp >= blen:
                        raise ValueError("DEFLATE stream truncated")
                    acc |= buf[bp] << cnt
                    bp += 1
                    cnt += 8
                length = _LEN_BASE[s - 257] + (acc & ((1 << eb) - 1))
                acc >>= eb
                cnt -= eb
                if dist is None:
                    raise ValueError(
                        "DEFLATE: length code in a block whose "
                        "distance code is empty (all-literal)"
                    )
                while cnt < 15 and bp < blen:
                    acc |= buf[bp] << cnt
                    bp += 1
                    cnt += 8
                e = d_fast[acc & d_mask]
                if e >= 0:
                    w = e & 15
                    d = e >> 4
                else:
                    code = 0
                    d = -1
                    for depth in range(1, d_max + 1):
                        if depth > cnt:
                            raise ValueError("DEFLATE stream truncated")
                        code = (code << 1) | ((acc >> (depth - 1)) & 1)
                        sym = d_tab.get((depth, code))
                        if sym is not None:
                            d, w = sym, depth
                            break
                    if d < 0:
                        raise ValueError(
                            "DEFLATE: invalid Huffman code in stream"
                        )
                if w > cnt:
                    raise ValueError("DEFLATE stream truncated")
                acc >>= w
                cnt -= w
                if d > 29:
                    raise ValueError(f"DEFLATE: distance code {d}")
                eb = _DIST_EB[d]
                while cnt < eb:
                    if bp >= blen:
                        raise ValueError("DEFLATE stream truncated")
                    acc |= buf[bp] << cnt
                    bp += 1
                    cnt += 8
                distance = _DIST_BASE[d] + (acc & ((1 << eb) - 1))
                acc >>= eb
                cnt -= eb
                olen = len(out)
                if distance > olen:
                    raise ValueError(
                        f"DEFLATE: distance {distance} past window "
                        f"at output byte {olen}"
                    )
                start = olen - distance
                if distance >= length:
                    out += out[start : start + length]
                elif distance == 1:
                    out += out[start:] * length
                else:  # overlapping copy: tile the last `distance`
                    #      bytes until `length` is covered
                    reps = length // distance + 1
                    out += (out[start:] * reps)[:length]
        else:
            raise ValueError("DEFLATE: reserved block type 3")
        if bfinal:
            return bytes(out)


class _BitsW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v: int, n: int):  # LSB-first
        self.acc |= v << self.n
        self.n += n
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def code(self, v: int, n: int):  # Huffman: MSB of code first
        for i in range(n - 1, -1, -1):
            self.bits((v >> i) & 1, 1)

    def done(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _fixed_lit_code(sym: int) -> tuple[int, int]:
    if sym < 144:
        return 0x30 + sym, 8
    if sym < 256:
        return 0x190 + sym - 144, 9
    if sym < 280:
        return sym - 256, 7
    return 0xC0 + sym - 280, 8


def _len_code(length: int) -> tuple[int, int, int]:
    if length == 258:
        # the dedicated zero-extra-bit code 285, NOT code 284 with
        # extra value 31 (decodable but non-canonical, 5 wasted bits)
        return 285, 0, 0
    for i, (eb, base) in enumerate(_LEN_TABLE):
        nxt = _LEN_TABLE[i + 1][1] if i + 1 < len(_LEN_TABLE) else 259
        if base <= length < max(nxt, base + (1 << eb)):
            if i == len(_LEN_TABLE) - 1 and length != 258:
                continue
            return 257 + i, eb, length - base
    raise ValueError(f"length {length}")


def _dist_code(distance: int) -> tuple[int, int, int]:
    for i in range(len(_DIST_TABLE) - 1, -1, -1):
        eb, base = _DIST_TABLE[i]
        if distance >= base:
            return i, eb, distance - base
    raise ValueError(f"distance {distance}")


def deflate(data: bytes, mode: str = "fixed") -> bytes:
    """bytes -> raw DEFLATE stream. ``mode="fixed"``: greedy LZ77
    (3-byte hash chains, 32 KiB window, max match 258) through the
    static Huffman code; ``mode="stored"``: uncompressed blocks."""
    if mode == "stored":
        bw = _BitsW()
        pos = 0
        while True:
            chunk = data[pos : pos + 0xFFFF]
            pos += len(chunk)
            final = 1 if pos >= len(data) else 0
            bw.bits(final, 1)
            bw.bits(0, 2)
            # align + LEN/NLEN + raw bytes
            if bw.n:
                bw.bits(0, 8 - bw.n)
            bw.out += struct.pack("<HH", len(chunk), ~len(chunk) & 0xFFFF)
            bw.out += chunk
            if final:
                return bw.done()
    if mode != "fixed":
        raise ValueError(f"deflate mode {mode!r} (fixed|stored)")
    bw = _BitsW()
    bw.bits(1, 1)  # final
    bw.bits(1, 2)  # fixed
    head: dict[bytes, list[int]] = {}
    i, n = 0, len(data)
    while i < n:
        best_len, best_dist = 0, 0
        if i + 3 <= n:
            key = data[i : i + 3]
            maxl = min(258, n - i)
            # The candidate walk below emits byte-identical streams to
            # the per-byte original: same most-recent-first order, same
            # strictly-longer update, same >=64 early stop. Only the
            # per-candidate work changed — a one-byte "cannot beat the
            # current best" filter (a longer match needs byte best_len
            # to agree, and equal-length candidates never update), and
            # the prefix length via descending-step slice compares
            # instead of one Python iteration per matched byte.
            for j in reversed(head.get(key, [])):
                if i - j > 32768:
                    break
                if best_len and data[j + best_len] != data[i + best_len]:
                    continue
                if data[j : j + maxl] == data[i : i + maxl]:
                    length = maxl
                else:
                    length = 3
                    step = 64
                    while step:
                        while (
                            length + step <= maxl
                            and data[j + length : j + length + step]
                            == data[i + length : i + length + step]
                        ):
                            length += step
                        step >>= 1
                if length > best_len:
                    best_len, best_dist = length, i - j
                    if length >= 64:
                        break
                    if best_len == maxl:
                        break  # nothing can be strictly longer
        if best_len >= 3:
            c, eb, ev = _len_code(best_len)
            code, nbits = _fixed_lit_code(c)
            bw.code(code, nbits)
            bw.bits(ev, eb)
            dc, deb, dev = _dist_code(best_dist)
            bw.code(dc, 5)
            bw.bits(dev, deb)
            end = i + best_len
            while i < end:
                if i + 3 <= n:
                    head.setdefault(data[i : i + 3], []).append(i)
                i += 1
        else:
            code, nbits = _fixed_lit_code(data[i])
            bw.code(code, nbits)
            if i + 3 <= n:
                head.setdefault(data[i : i + 3], []).append(i)
            i += 1
    code, nbits = _fixed_lit_code(256)
    bw.code(code, nbits)
    return bw.done()


def adler32(data: bytes) -> int:
    """RFC 1950 Adler-32, computed here: after bytes e1..ek the
    running ``a`` is ``a0 + prefix_k`` and ``b`` accumulates every
    intermediate ``a`` — so per chunk ``b += k*a0 + sum(prefixes)``,
    vectorized in chunks small enough that the uint64 prefix sums
    cannot overflow (5552 is zlib's own NMAX bound)."""
    import numpy as np

    a, b = 1, 0
    arr = np.frombuffer(data, np.uint8).astype(np.uint64)
    for k in range(0, len(arr), 5552):
        chunk = arr[k : k + 5552]
        pref = np.cumsum(chunk)
        b = (b + len(chunk) * a + int(pref.sum())) % 65521
        a = (a + int(chunk.sum())) % 65521
    return ((b << 16) | a) & 0xFFFFFFFF


def zlib_wrap(data: bytes, mode: str = "fixed") -> bytes:
    """RFC 1950 container around :func:`deflate`: CMF/FLG with the
    31-divisibility check bits, Adler-32 trailer."""
    cmf = 0x78  # deflate, 32K window
    flg = 31 - (cmf * 256) % 31  # FCHECK so that CMF*256+FLG % 31 == 0
    if flg == 31:
        flg = 0
    return (
        bytes((cmf, flg))
        + deflate(data, mode)
        + struct.pack(">I", adler32(data))
    )


def zlib_unwrap(payload: bytes) -> bytes:
    """RFC 1950 -> bytes via :func:`inflate`, checking header bits and
    the Adler-32 trailer."""
    if len(payload) < 6:
        raise ValueError("zlib stream shorter than header + trailer")
    cmf, flg = payload[0], payload[1]
    if cmf & 0x0F != 8:
        raise ValueError(f"zlib CM {cmf & 0x0F} (want 8 = deflate)")
    if (cmf * 256 + flg) % 31 != 0:
        raise ValueError("zlib header check bits invalid")
    if flg & 0x20:
        raise NotImplementedError("zlib preset dictionary (FDICT)")
    data = inflate(payload[2:-4])
    (want,) = struct.unpack(">I", payload[-4:])
    got = adler32(data)
    if got != want:
        raise ValueError(f"Adler-32 mismatch: {got:#010x} != {want:#010x}")
    return data


_CRC_TABLE = None


def crc32(data: bytes) -> int:
    """RFC 1952 / ISO 3309 CRC-32, computed here: the reflected
    0xEDB88320 polynomial, table-driven, init/final XOR 0xFFFFFFFF —
    vectorized per byte column over a numpy table."""
    global _CRC_TABLE
    import numpy as np

    if _CRC_TABLE is None:
        t = np.arange(256, dtype=np.uint32)
        for _ in range(8):
            t = np.where(t & 1, (t >> 1) ^ np.uint32(0xEDB88320), t >> 1)
        _CRC_TABLE = t
    crc = 0xFFFFFFFF
    for b in data:
        crc = int(_CRC_TABLE[(crc ^ b) & 0xFF]) ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def gzip_wrap(data: bytes, mode: str = "fixed") -> bytes:
    """RFC 1952 container around :func:`deflate`: the 10-byte header
    (magic, CM=8, no flags, MTIME=0 for determinism, XFL=0, OS=255
    "unknown") + raw deflate + CRC-32 + ISIZE."""
    return (
        b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"
        + deflate(data, mode)
        + struct.pack("<II", crc32(data), len(data) & 0xFFFFFFFF)
    )


def gzip_unwrap(payload: bytes) -> bytes:
    """RFC 1952 -> bytes via :func:`inflate`: parses the header
    (including optional FEXTRA/FNAME/FCOMMENT/FHCRC fields), checks
    CM, and verifies both trailer words."""
    if payload[:2] != b"\x1f\x8b":
        raise ValueError(f"not gzip (starts {payload[:2]!r})")
    if payload[2] != 8:
        raise ValueError(f"gzip CM {payload[2]} (want 8 = deflate)")
    flg = payload[3]
    if flg & 0xE0:
        raise ValueError(f"gzip reserved flag bits set ({flg:#04x})")
    pos = 10
    if flg & 0x04:  # FEXTRA
        (xlen,) = struct.unpack_from("<H", payload, pos)
        pos += 2 + xlen
    if flg & 0x08:  # FNAME
        pos = payload.index(b"\x00", pos) + 1
    if flg & 0x10:  # FCOMMENT
        pos = payload.index(b"\x00", pos) + 1
    if flg & 0x02:  # FHCRC
        pos += 2
    data = inflate(payload[pos:-8])
    want_crc, want_len = struct.unpack_from("<II", payload, len(payload) - 8)
    if crc32(data) != want_crc:
        raise ValueError(
            f"gzip CRC-32 mismatch: {crc32(data):#010x} != {want_crc:#010x}"
        )
    if len(data) & 0xFFFFFFFF != want_len:
        raise ValueError(f"gzip ISIZE {want_len} != {len(data)}")
    return data
