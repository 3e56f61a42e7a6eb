"""LZ4, both directions — from scratch, pure stdlib.

Three public layouts over one core:

* :func:`lz4_block_uncompress` — the raw block format (token byte =
  4-bit literal length | 4-bit match length, 255-saturating length
  extensions, 2-byte little-endian offsets, 4-byte minimum match).
  This is parquet's ``LZ4_RAW`` codec (enum 7), the one modern
  writers emit.
* :func:`lz4_hadoop_uncompress` — the legacy parquet ``LZ4`` codec
  (enum 5): Hadoop's framing of [4-byte big-endian uncompressed
  size][4-byte big-endian compressed size][block]*, with the
  raw-block fallback real-world readers apply (some writers emitted
  unframed blocks under the LZ4 enum).
* :func:`lz4_frame_uncompress` — the interoperable ``.lz4`` frame
  format (magic ``0x184D2204``, FLG/BD descriptor with XXH32 header
  checksum, independent/linked blocks with the high-bit
  stored-uncompressed flag, optional block and content checksums —
  verified with :func:`xxh32` implemented here).

The write side (round 9): :func:`lz4_block_compress` (greedy
4-byte hash matching honoring the spec's end conditions — 5 literal
tail bytes, no match in the last 12) and :func:`lz4_frame_compress`
(descriptor + 256 KiB blocks with stored fallback + checksums);
every stream they emit decodes under the reference implementation.

Strict decode: zero offsets, matches past the window, bad frame
magic/version, reserved FLG bits, and checksum mismatches all
raise. Tests cross-check BOTH directions against pyarrow's bundled
lz4 (frame and raw-block codecs) across entropy regimes, plus
published XXH32 vectors. Public specs: lz4_Block_format.md /
lz4_Frame_format.md (github.com/lz4/lz4), Hadoop's Lz4Codec stream
layout.
"""

from __future__ import annotations

import struct

_FRAME_MAGIC = 0x184D2204


def lz4_block_uncompress(src: bytes, max_out: int | None = None) -> bytes:
    """Raw LZ4 block -> bytes. ``max_out`` bounds the output (belt
    against corrupt length runs when the caller knows the size)."""
    out = bytearray()
    i = 0
    n = len(src)
    if n == 0:
        return b""
    while True:
        if i >= n:
            raise ValueError("lz4: truncated block (no token)")
        token = src[i]
        i += 1
        litlen = token >> 4
        if litlen == 15:
            while True:
                if i >= n:
                    raise ValueError("lz4: truncated literal length")
                b = src[i]
                i += 1
                litlen += b
                if b != 255:
                    break
        if i + litlen > n:
            raise ValueError("lz4: literals past end of block")
        out += src[i : i + litlen]
        i += litlen
        if max_out is not None and len(out) > max_out:
            raise ValueError("lz4: output exceeds declared size")
        if i == n:
            break  # last sequence carries literals only
        if i + 2 > n:
            raise ValueError("lz4: truncated match offset")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("lz4: zero match offset")
        mlen = token & 0x0F
        if mlen == 15:
            while True:
                if i >= n:
                    raise ValueError("lz4: truncated match length")
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        start = len(out) - offset
        if start < 0:
            raise ValueError(
                f"lz4: offset {offset} past window ({len(out)} bytes)"
            )
        if offset >= mlen:
            out += out[start : start + mlen]
        else:
            for k in range(mlen):  # overlap-safe
                out.append(out[start + k])
        if max_out is not None and len(out) > max_out:
            raise ValueError("lz4: output exceeds declared size")
    return bytes(out)


def lz4_hadoop_uncompress(src: bytes) -> bytes:
    """Legacy parquet LZ4 (Hadoop framing): repeated [u32 BE
    uncompressed size][u32 BE compressed size][raw block]; falls
    back to a bare raw block when the prefix does not parse as that
    framing (both layouts exist in the wild under codec enum 5)."""
    if len(src) >= 8:
        (usize,) = struct.unpack_from(">I", src, 0)
        pos = 4
        out = bytearray()
        ok = True
        remaining = usize
        try:
            while remaining > 0:
                if pos + 4 > len(src):
                    ok = False
                    break
                (csize,) = struct.unpack_from(">I", src, pos)
                pos += 4
                if pos + csize > len(src):
                    ok = False
                    break
                chunk = lz4_block_uncompress(
                    src[pos : pos + csize], max_out=remaining
                )
                pos += csize
                out += chunk
                remaining -= len(chunk)
            if ok and remaining == 0 and pos == len(src):
                return bytes(out)
        except ValueError:
            pass
    return lz4_block_uncompress(src)


def lz4_frame_uncompress(payload: bytes) -> bytes:
    """LZ4 frame(s) -> bytes, concatenated; skippable frames
    (``0x184D2A5x``) skipped; header, block, and content XXH32
    checksums verified."""
    out = bytearray()
    pos = 0
    while pos < len(payload):
        (magic,) = struct.unpack_from("<I", payload, pos)
        if 0x184D2A50 <= magic <= 0x184D2A5F:
            (n,) = struct.unpack_from("<I", payload, pos + 4)
            pos += 8 + n
            continue
        if magic != _FRAME_MAGIC:
            raise ValueError(f"lz4: bad frame magic {magic:#010x}")
        pos += 4
        desc_start = pos
        flg = payload[pos]
        bd = payload[pos + 1]
        pos += 2
        if (flg >> 6) != 1:
            raise ValueError(f"lz4: frame version {flg >> 6} != 1")
        if flg & 0x02:
            raise ValueError("lz4: reserved FLG bit set")
        block_checksum = bool(flg & 0x10)
        content_size = None
        if flg & 0x08:
            (content_size,) = struct.unpack_from("<Q", payload, pos)
            pos += 8
        if flg & 0x01:
            pos += 4  # dictionary id — window starts empty; refuse
            raise NotImplementedError("lz4: dictionary frames")
        if (bd & 0x8F) != 0:
            raise ValueError("lz4: reserved BD bits set")
        hc = payload[pos]
        pos += 1
        want = (xxh32(payload[desc_start : pos - 1]) >> 8) & 0xFF
        if hc != want:
            raise ValueError(
                f"lz4: header checksum {hc:#04x} != {want:#04x}"
            )
        content_checksum = bool(flg & 0x04)
        frame = bytearray()
        while True:
            (bsize,) = struct.unpack_from("<I", payload, pos)
            pos += 4
            if bsize == 0:
                break  # EndMark
            stored = bool(bsize & 0x80000000)
            bsize &= 0x7FFFFFFF
            block = payload[pos : pos + bsize]
            if len(block) != bsize:
                raise ValueError("lz4: frame block truncated")
            pos += bsize
            if block_checksum:
                (bc,) = struct.unpack_from("<I", payload, pos)
                pos += 4
                if xxh32(block) != bc:
                    raise ValueError("lz4: block checksum mismatch")
            if stored:
                frame += block
            else:
                # linked blocks may reference earlier output: decode
                # against the running frame buffer
                before = len(frame)
                dec = _block_into(block, frame)
                del dec  # appended in place
                if before == len(frame):
                    raise ValueError("lz4: empty compressed block")
        if content_size is not None and len(frame) != content_size:
            raise ValueError(
                f"lz4: content {len(frame)} != declared {content_size}"
            )
        if content_checksum:
            (cc,) = struct.unpack_from("<I", payload, pos)
            pos += 4
            if xxh32(bytes(frame)) != cc:
                raise ValueError("lz4: content checksum mismatch")
        out += frame
    return bytes(out)


def _block_into(src: bytes, out: bytearray) -> None:
    """Decode one block appending to ``out``; matches may reference
    bytes already in ``out`` (linked-block mode)."""
    i = 0
    n = len(src)
    while True:
        if i >= n:
            raise ValueError("lz4: truncated block (no token)")
        token = src[i]
        i += 1
        litlen = token >> 4
        if litlen == 15:
            while True:
                b = src[i]
                i += 1
                litlen += b
                if b != 255:
                    break
        if i + litlen > n:
            raise ValueError("lz4: literals past end of block")
        out += src[i : i + litlen]
        i += litlen
        if i == n:
            return
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("lz4: zero match offset")
        mlen = token & 0x0F
        if mlen == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        start = len(out) - offset
        if start < 0:
            raise ValueError("lz4: offset past window")
        if offset >= mlen:
            out += out[start : start + mlen]
        else:
            for k in range(mlen):
                out.append(out[start + k])


# --------------------------------------------------------------------------
# XXH32 (public algorithm; lz4 frame checksums)
# --------------------------------------------------------------------------

_P1 = 0x9E3779B1
_P2 = 0x85EBCA77
_P3 = 0xC2B2AE3D
_P4 = 0x27D4EB2F
_P5 = 0x165667B1
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while i + 16 <= n:
            l1, l2, l3, l4 = struct.unpack_from("<4I", data, i)
            v1 = (_rotl32((v1 + l1 * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl32((v2 + l2 * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl32((v3 + l3 * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl32((v4 + l4 * _P2) & _M32, 13) * _P1) & _M32
            i += 16
        h = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12)
            + _rotl32(v4, 18)
        ) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = (_rotl32((h + k * _P3) & _M32, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (_rotl32((h + data[i] * _P5) & _M32, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# --------------------------------------------------------------------------
# Compression (round 9 second half): the write side, same greedy
# hash-chain approach as snappy_compress but in LZ4's block grammar.
# --------------------------------------------------------------------------


def lz4_block_compress(data: bytes) -> bytes:
    """bytes -> raw LZ4 block. Greedy 4-byte hash matching over a
    64 KiB offset window; the spec's end conditions are honored (the
    last 5 bytes are always literals and no match starts within the
    last 12 bytes). Accepted by the reference decoder (pyarrow's
    bundled lz4, cross-checked in tests) and by
    :func:`lz4_block_uncompress`."""
    n = len(data)
    out = bytearray()

    def emit(lit: bytes, mlen: int | None, offset: int | None) -> None:
        ll = len(lit)
        token_l = 15 if ll >= 15 else ll
        token_m = 0
        if mlen is not None:
            m = mlen - 4
            token_m = 15 if m >= 15 else m
        out.append((token_l << 4) | token_m)
        if ll >= 15:
            rest = ll - 15
            while rest >= 255:
                out.append(255)
                rest -= 255
            out.append(rest)
        out.extend(lit)
        if mlen is None:
            return
        out.append(offset & 0xFF)
        out.append((offset >> 8) & 0xFF)
        if mlen - 4 >= 15:
            rest = mlen - 4 - 15
            while rest >= 255:
                out.append(255)
                rest -= 255
            out.append(rest)

    table: dict[bytes, int] = {}
    i = lit_start = 0
    # spec end conditions: last match must start >= 12 bytes before
    # the end and leave >= 5 literal bytes after it
    limit = n - 12
    while i <= limit and i + 4 <= n:
        key = data[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 0xFFFF and data[j : j + 4] == key:
            length = 4
            max_len = n - 5 - i  # keep the 5-byte literal tail
            while length < max_len and data[j + length] == data[i + length]:
                length += 1
            if length >= 4:
                emit(data[lit_start:i], length, i - j)
                i += length
                lit_start = i
                continue
        i += 1
    emit(data[lit_start:], None, None)
    return bytes(out)


def lz4_frame_compress(data: bytes, content_checksum: bool = True) -> bytes:
    """bytes -> a .lz4 frame: FLG/BD descriptor with XXH32 header
    checksum, 256 KiB independent blocks (stored when compression
    does not win), optional content checksum."""
    flg = (1 << 6) | 0x20 | (0x04 if content_checksum else 0)
    bd = 0x50  # 256 KiB max block size
    desc = bytes([flg, bd])
    out = bytearray(struct.pack("<I", _FRAME_MAGIC))
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + (1 << 18)]
        pos += len(chunk)
        comp = lz4_block_compress(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            out += comp
        else:
            out += struct.pack("<I", 0x80000000 | len(chunk))
            out += chunk
    out += struct.pack("<I", 0)  # EndMark
    if content_checksum:
        out += struct.pack("<I", xxh32(data))
    return bytes(out)
