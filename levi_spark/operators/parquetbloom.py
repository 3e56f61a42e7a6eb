"""Parquet split-block Bloom filters (SBBF) from first principles.

Implements the parquet-format ``BloomFilter.md`` spec exactly: the
bitset is an array of 256-bit blocks (eight 32-bit little-endian
words); a value hashes once with XXH64 seed 0 (ours —
:func:`levi_spark.operators.zstd.xxh64`, already cross-validated
against libzstd frame checksums); the TOP 32 bits pick the block via
the multiply-shift trick ``((h >> 32) * num_blocks) >> 32`` and the
LOW 32 bits drive eight salted multiplies, each contributing one bit
in its own word — so a membership probe touches exactly one cache
line.  Hash input is the value's PLAIN encoding (little-endian
int/float bytes; raw bytes for BYTE_ARRAY, no length prefix).

On disk a filter is a compact-Thrift ``BloomFilterHeader`` (numBytes
+ the BLOCK / XXHASH / UNCOMPRESSED union tags) followed by the raw
bitset, pointed at by ``ColumnMetaData.bloom_filter_offset`` (field
14) / ``bloom_filter_length`` (field 15).  The write side lives in
:func:`levi_spark.operators.parquetwrite.write_parquet`
(``bloom_filter=[cols]``); this module owns the bitset math, header
codec, the reader, and a point-lookup planner that prunes row
groups by min/max stats AND bloom probes before any data I/O — the
100 TB needle-in-haystack path: one footer tail read + one ~32-2048
byte ranged read per row group, zero data pages for groups the
filter rules out.
"""

from __future__ import annotations

import math
import struct

from levi_spark.operators.zstd import xxh64

_SALT = (
    0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
    0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31,
)


def optimal_num_bytes(ndv: int, fpp: float = 0.01) -> int:
    """Bitset size for ``ndv`` distinct values at false-positive rate
    ``fpp``: the split-block formula ``m = -8k / ln(1 - fpp^(1/8))``
    rounded up to a power of two, clamped to [32 bytes, 128 MiB]."""
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp {fpp} out of (0, 1)")
    ndv = max(1, ndv)
    bits = -8.0 * ndv / math.log(1.0 - fpp ** 0.125)
    nbytes = max(32, int(bits) // 8 + 1)
    return min(1 << (nbytes - 1).bit_length(), 128 << 20)


class SplitBlockBloom:
    """A split-block Bloom bitset; ``num_bytes`` must be a power of
    two >= 32 (one 32-byte block minimum)."""

    def __init__(self, num_bytes: int,
                 bitset: bytes | bytearray | None = None) -> None:
        if num_bytes < 32 or num_bytes & (num_bytes - 1):
            raise ValueError(
                f"SBBF size {num_bytes}: need a power of two >= 32"
            )
        if bitset is None:
            bitset = bytearray(num_bytes)
        elif len(bitset) != num_bytes:
            raise ValueError("bitset length != numBytes")
        self.bits = bytearray(bitset)
        self.num_blocks = num_bytes // 32

    def _mask(self, h: int) -> tuple[int, list[int]]:
        block = ((h >> 32) * self.num_blocks) >> 32
        key = h & 0xFFFFFFFF
        return block, [((key * s) & 0xFFFFFFFF) >> 27 for s in _SALT]

    def insert_hash(self, h: int) -> None:
        block, bits = self._mask(h)
        base = block * 32
        for i, b in enumerate(bits):
            word_at = base + 4 * i
            (w,) = struct.unpack_from("<I", self.bits, word_at)
            struct.pack_into("<I", self.bits, word_at, w | (1 << b))

    def might_contain_hash(self, h: int) -> bool:
        block, bits = self._mask(h)
        base = block * 32
        for i, b in enumerate(bits):
            (w,) = struct.unpack_from("<I", self.bits, base + 4 * i)
            if not w & (1 << b):
                return False
        return True

    def insert(self, ptype: str, value) -> None:
        self.insert_hash(bloom_hash(ptype, value))

    def might_contain(self, ptype: str, value) -> bool:
        return self.might_contain_hash(bloom_hash(ptype, value))


def bloom_hash(ptype: str, value) -> int:
    """XXH64(seed 0) of the value's PLAIN encoding per the spec."""
    if ptype == "INT64":
        raw = struct.pack("<q", value)
    elif ptype == "INT32":
        raw = struct.pack("<i", value)
    elif ptype == "DOUBLE":
        raw = struct.pack("<d", value)
    elif ptype == "FLOAT":
        raw = struct.pack("<f", value)
    elif ptype in ("BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY"):
        raw = value.encode("utf-8") if isinstance(value, str) \
            else bytes(value)
    else:
        raise NotImplementedError(
            f"bloom filter for physical type {ptype}"
        )
    return xxh64(raw)


def bloom_header_bytes(num_bytes: int) -> bytes:
    """Compact-Thrift BloomFilterHeader: numBytes + the three
    single-member unions (BLOCK algorithm, XXHASH hash, UNCOMPRESSED
    compression), each an empty struct at field 1."""
    from levi_spark.operators.parquetwrite import _TW

    tw = _TW()
    tw.begin()
    tw.i32(1, num_bytes)
    for fid in (2, 3, 4):
        tw.struct_field(fid)
        tw.struct_field(1)
        tw.end()
        tw.end()
    tw.end()
    return bytes(tw.buf)


def read_bloom_filter(data: bytes, offset: int) -> SplitBlockBloom:
    """Parse a BloomFilterHeader + bitset at ``offset`` (the
    ColumnMetaData.bloom_filter_offset)."""
    from levi_spark.operators.parquetmeta import _Reader

    r = _Reader(data, offset)
    hdr = r.struct()
    num_bytes = hdr.get(1)
    if num_bytes is None or num_bytes <= 0:
        raise ValueError("bloom filter header: bad numBytes")
    algo, hashv, comp = hdr.get(2), hdr.get(3), hdr.get(4)
    if not (isinstance(algo, dict) and 1 in algo):
        raise NotImplementedError(f"bloom algorithm {algo!r}: only "
                                  "BLOCK (SplitBlockAlgorithm)")
    if not (isinstance(hashv, dict) and 1 in hashv):
        raise NotImplementedError(f"bloom hash {hashv!r}: only "
                                  "XXHASH")
    if not (isinstance(comp, dict) and 1 in comp):
        raise NotImplementedError(f"bloom compression {comp!r}: "
                                  "only UNCOMPRESSED")
    bitset = data[r.pos: r.pos + num_bytes]
    if len(bitset) != num_bytes:
        raise ValueError("bloom filter bitset truncated")
    return SplitBlockBloom(num_bytes, bitset)


def _footer_with_blooms(data: bytes) -> tuple[dict, list[list[dict]]]:
    """Footer dict plus, per row group, per column: path / ptype /
    bloom offsets — re-walked from the raw thrift because
    parse_footer's chunk dict doesn't carry fields 14/15."""
    from levi_spark.operators.parquetmeta import (
        parse_footer,
        thrift_read_struct,
    )

    if data[-4:] != b"PAR1":
        raise ValueError("trailing PAR1 magic missing")
    (flen,) = struct.unpack_from("<I", data, len(data) - 8)
    meta = data[len(data) - 8 - flen: len(data) - 8]
    footer = parse_footer(meta)
    fm = thrift_read_struct(meta)
    groups = []
    for rg in fm.get(4) or []:
        cols = []
        for cc in rg.get(1) or []:
            md = cc.get(3) or {}
            st = md.get(12) or {}
            cols.append({
                "path": b".".join(md.get(3) or []).decode("utf-8"),
                "bloom_offset": md.get(14),
                "bloom_length": md.get(15),
                "stat_max": st.get(5, st.get(1)),
                "stat_min": st.get(6, st.get(2)),
            })
        groups.append(cols)
    return footer, groups


def plan_point_lookup(path: str, column: str, value) -> dict:
    """Metadata-only row-group pruning for ``column == value``: keep
    a row group only if the footer min/max admits the value AND (when
    a bloom filter is present) the filter might contain it.  Returns
    kept/pruned group indices and which evidence pruned each."""
    with open(path, "rb") as f:
        data = f.read()
    return plan_point_lookup_bytes(data, column, value)


def plan_point_lookup_bytes(data: bytes, column: str, value) -> dict:
    from levi_spark.operators.parquetmeta import (
        _decode_stat,
        stat_compare_key,
    )

    footer, blooms = _footer_with_blooms(data)
    types = dict(footer["columns"])
    if column not in types:
        raise ValueError(f"{column!r} not in {sorted(types)}")
    ptype = types[column]
    skey, sbytes = stat_compare_key(footer, column, ptype)
    if skey is not None:
        # may raise _ProbeNeverMatches: such a probe equals nothing
        value = sbytes(value, footer["type_lengths"].get(column))
    h = bloom_hash(ptype, value)
    kept: list[int] = []
    pruned: dict[int, str] = {}
    has_bloom = any(
        c["path"] == column and c["bloom_offset"] is not None
        for g in blooms for c in g
    )
    for gi in range(len(footer["row_groups"])):
        bc = next(c for c in blooms[gi] if c["path"] == column)
        mn = _decode_stat(ptype, bc["stat_min"])
        mx = _decode_stat(ptype, bc["stat_max"])
        if mn is not None and mx is not None:
            if skey is not None:
                inside = skey(mn) <= skey(value) <= skey(mx)
            else:
                inside = mn <= value <= mx
            if not inside:
                pruned[gi] = "stats"
                continue
        if bc["bloom_offset"] is not None:
            bf = read_bloom_filter(data, bc["bloom_offset"])
            if not bf.might_contain_hash(h):
                pruned[gi] = "bloom"
                continue
        kept.append(gi)
    return {
        "column": column,
        "row_groups_kept": kept,
        "pruned": pruned,
        "has_bloom": has_bloom,
        "num_row_groups": len(footer["row_groups"]),
    }
