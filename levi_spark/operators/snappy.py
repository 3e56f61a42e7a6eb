"""Snappy raw-block decompression — from scratch, pure stdlib.

Snappy is parquet's default codec (every testdata file here is
snappy-compressed), and its RAW BLOCK format (Google's public
``format_description.txt``) is small enough to own outright:

* a varint (LEB128) preamble carrying the UNCOMPRESSED length, then
* a tag stream: the low 2 bits of each tag byte select
  - ``00`` literal — length ``(tag >> 2) + 1`` when < 61, else the
    upper bits say how many little-endian EXTRA length bytes follow
    (61 -> 1, 62 -> 2, 63 -> 3, 64 -> 4),
  - ``01`` copy with 1-byte offset — length ``((tag >> 2) & 7) + 4``
    (4..11), offset ``((tag >> 5) << 8) | next_byte`` (overlap-safe:
    offset may be < length, the RLE-through-LZ device),
  - ``10`` copy with 2-byte little-endian offset — length
    ``(tag >> 2) + 1`` (1..64),
  - ``11`` copy with 4-byte little-endian offset, same length rule.

Strict: truncated varints/literals/offsets, zero offsets, copies
reaching before the start of output, and output over/underrun
against the preamble all raise. Decompression is verified against
real snappy streams (parquet column chunks written by parquet-cpp
and parquet-mr) in the tests and the ``parquet_column_read`` gate
path. :func:`snappy_compress` (round 9) is the write side the
first-principles parquet WRITER needs: greedy 4-byte hash-chain
matching emitted through copy-2 tags (16-bit offsets) — every
stream it emits decodes under the reference implementation
(pyarrow's bundled snappy, cross-checked in tests) and under our
own decoder. North-star codec surface beside
:mod:`levi_spark.operators.deflate`.
"""

from __future__ import annotations


def snappy_uncompress(payload: bytes) -> bytes:
    """Raw snappy block -> bytes (NOT the framing format — parquet
    stores raw blocks)."""
    n = len(payload)
    # varint preamble: uncompressed length
    out_len = 0
    shift = 0
    pos = 0
    while True:
        if pos >= n:
            raise ValueError("snappy: length varint truncated")
        b = payload[pos]
        pos += 1
        out_len |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 35:
            raise ValueError("snappy: length varint longer than 5 bytes")
    out = bytearray()
    while pos < n:
        tag = payload[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nbytes = ln - 59
                if pos + nbytes > n:
                    raise ValueError("snappy: literal length truncated")
                ln = int.from_bytes(payload[pos : pos + nbytes], "little")
                pos += nbytes
            ln += 1
            if pos + ln > n:
                raise ValueError(
                    f"snappy: literal of {ln} bytes overruns input"
                )
            out += payload[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            length = ((tag >> 2) & 7) + 4
            if pos >= n:
                raise ValueError("snappy: copy-1 offset truncated")
            offset = ((tag >> 5) << 8) | payload[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("snappy: copy-2 offset truncated")
            offset = int.from_bytes(payload[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("snappy: copy-4 offset truncated")
            offset = int.from_bytes(payload[pos : pos + 4], "little")
            pos += 4
        if offset == 0:
            raise ValueError("snappy: zero copy offset")
        if offset > len(out):
            raise ValueError(
                f"snappy: copy offset {offset} reaches before output "
                f"start at byte {len(out)}"
            )
        start = len(out) - offset
        for k in range(length):  # overlap-safe byte-at-a-time
            out.append(out[start + k])
        if len(out) > out_len:
            raise ValueError(
                f"snappy: output overruns declared length {out_len}"
            )
    if len(out) != out_len:
        raise ValueError(
            f"snappy: output {len(out)} bytes != declared {out_len}"
        )
    return bytes(out)


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """bytes -> snappy raw block. Greedy LZ with a 4-byte hash table
    over a 64 KiB window, emitted as literal tags and copy-2 tags
    (2-byte offsets, lengths chunked to the 64-byte tag maximum).
    Correctness over ratio: simple, deterministic, and accepted by
    the reference decoder."""
    out = bytearray(_varint(len(data)))
    n = len(data)

    def emit_literal(lo: int, hi: int) -> None:
        while lo < hi:
            ln = min(hi - lo, 60)
            rest = hi - lo
            if rest > 60:
                # use extended 1-byte length for runs up to 256
                ln = min(rest, 256)
                out.append((60 << 2))
                out.append(ln - 1)
            else:
                out.append(((ln - 1) << 2))
            out.extend(data[lo : lo + ln])
            lo += ln

    def emit_copy(offset: int, length: int) -> None:
        # chunk to the 64-byte tag maximum, never leaving a tail
        # below the 4-byte copy minimum (65 -> 60 + 5, not 64 + 1)
        while length > 0:
            if length >= 68 or length <= 64:
                ln = min(length, 64)
            else:
                ln = 60
            out.append(((ln - 1) << 2) | 2)
            out.append(offset & 0xFF)
            out.append((offset >> 8) & 0xFF)
            length -= ln

    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    while i + 4 <= n:
        key = data[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 0xFFFF and data[j : j + 4] == key:
            length = 4
            while (
                i + length < n
                and length < 64 * 4
                and data[j + length] == data[i + length]
            ):
                length += 1
            emit_literal(lit_start, i)
            emit_copy(i - j, length)
            i += length
            lit_start = i
        else:
            i += 1
    emit_literal(lit_start, n)
    return bytes(out)
