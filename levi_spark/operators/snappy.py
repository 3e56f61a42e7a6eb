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
against the preamble all raise. Only decompression lives here — the
write side of this engine's parquet flows goes through pyarrow, and
a from-scratch compressor would add bytes, not capability. Verified
against real snappy streams (parquet column chunks written by
parquet-cpp and parquet-mr) in the tests and the
``parquet_column_read`` gate path. North-star codec surface beside
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
