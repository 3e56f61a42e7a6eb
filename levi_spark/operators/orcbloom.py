"""ORC bloom-filter index streams (``BLOOM_FILTER_UTF8``, stream kind
8) from first principles — the hash pair, the bitset, the protobuf
framing, and the membership test, verified bit-exactly against the ORC
C++ library (pyarrow) in both directions.

Spec: ORC format "Index > Bloom Filter" section and the protobuf
definitions (``orc_proto.proto``)::

    message BloomFilter  { optional uint32 numHashFunctions = 1;
                           repeated fixed64 bitset = 2;     // pre-UTF8
                           optional bytes utf8bitset = 3; }
    message BloomFilterIndex { repeated BloomFilter bloomFilter = 1; }

One ``BloomFilter`` per ROW GROUP (``rowIndexStride`` rows), same
granularity as ROW_INDEX entries; the stream lives in the stripe's
index region.

Hashing (empirically byte-derived against pyarrow/ORC-C++, see
``tests/test_orc_bloom.py``):

* strings / binary — the Hive-style one-lane Murmur3 64-bit over the
  raw UTF-8 bytes, seed 104729 (``Murmur3::hash64`` in the C++ lib):
  8-byte little-endian blocks through the x64_128 h1-lane schedule
  (k*C1, rotl31, k*C2; h = rotl27(h^k)*5 + 0x52dce729), tail bytes
  OR-folded, then ``h ^= len`` and the standard fmix64 finalizer.
* integer family (incl. date) — Thomas Wang's 64-bit integer hash on
  SIGNED int64 with SIGN-EXTENDING (arithmetic) right shifts.
  hash(0) == 0 is the fingerprint: the all-ones intermediate
  collapses to zero under arithmetic shifts (the textbook unsigned
  formulation hashes 0 elsewhere). BOTH reference writers implement
  this same signed variant — verified byte-identical bitsets against
  pyarrow (ORC C++) AND Spark (ORC Java) for identical inputs
  including negative keys (``tests/test_orc_bloom.py``).

Bit placement (``BloomFilter.addHash`` in both implementations):
``h1 = (int32) hash64``, ``h2 = (int32)(hash64 >>> 32)``; for
``i in 1..k``: ``combined = h1 + i*h2`` (int32 wrap), bitwise-NOT if
negative, ``pos = combined % numBits``; bit ``pos`` of the
little-endian int64 array (word ``pos >> 6``, bit ``pos & 63``).

Sizing (Hive/ORC formulas, reproduced by pyarrow observations:
n=10000, fpp=0.05 -> 62400 bits / k=4):
``m = int(-n*ln(p)/ln(2)^2)`` rounded UP to the next multiple of 64,
``k = max(1, round(m/n * ln 2))``.
"""

from __future__ import annotations

import math
import struct

_M64 = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
DEFAULT_SEED = 104729
DEFAULT_FPP = 0.05


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix64(h: int) -> int:
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & _M64
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & _M64
    return h ^ (h >> 33)


def murmur3_hash64(data: bytes, seed: int = DEFAULT_SEED) -> int:
    """Hive/ORC one-lane Murmur3 64-bit (unsigned result)."""
    h = seed
    nblocks = len(data) >> 3
    for i in range(nblocks):
        k = int.from_bytes(data[i * 8 : i * 8 + 8], "little")
        k = (k * _C1) & _M64
        k = _rotl64(k, 31)
        k = (k * _C2) & _M64
        h ^= k
        h = _rotl64(h, 27)
        h = (h * 5 + 0x52DCE729) & _M64
    tail = data[nblocks * 8 :]
    if tail:
        k1 = 0
        for i in range(len(tail) - 1, -1, -1):
            k1 ^= tail[i] << (8 * i)
        k1 = (k1 * _C1) & _M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _M64
        h ^= k1
    h ^= len(data)
    return _fmix64(h)


def _to_s64(x: int) -> int:
    x &= _M64
    return x - (1 << 64) if x >= 1 << 63 else x


def long_hash(key: int) -> int:
    """Thomas Wang 64-bit hash, ORC convention (arithmetic right
    shifts on signed int64 — both the C++ and Java writers).
    Unsigned 64-bit result."""
    key = _to_s64(key)
    key = _to_s64((~key) + (key << 21))
    key = _to_s64(key ^ (key >> 24))  # python >> on signed int IS arithmetic
    key = _to_s64(key + (key << 3) + (key << 8))
    key = _to_s64(key ^ (key >> 14))
    key = _to_s64(key + (key << 2) + (key << 4))
    key = _to_s64(key ^ (key >> 28))
    key = _to_s64(key + (key << 31))
    return key & _M64


_LONG_KINDS = {"long", "int", "short", "byte", "date"}
_BYTES_KINDS = {"string", "binary", "char", "varchar"}


def hash_value(value, kind: str) -> int:
    """hash64 of one non-null value for an ORC column of ``kind``."""
    if kind in _LONG_KINDS:
        return long_hash(int(value))
    if kind in _BYTES_KINDS:
        b = value.encode() if isinstance(value, str) else bytes(value)
        return murmur3_hash64(b)
    if kind == "double" or kind == "float":
        # addDouble == addLong(doubleToLongBits) in both implementations
        return long_hash(struct.unpack("<q", struct.pack("<d", float(value)))[0])
    raise NotImplementedError(f"ORC bloom filter for kind {kind!r}")


def optimal_num_bits(n: int, fpp: float) -> int:
    nb = int(-n * math.log(fpp) / (math.log(2) ** 2))
    return nb + (64 - nb % 64)


def optimal_num_hashes(n: int, m: int) -> int:
    # Hive uses Math.round (half-up); python round() is banker's —
    # floor(x + 0.5) reproduces Java for the positive domain
    return max(1, int(m / n * math.log(2) + 0.5))


def _to_s32(x: int) -> int:
    x &= 0xFFFFFFFF
    return x - (1 << 32) if x >= 1 << 31 else x


def _positions(hash64: int, k: int, nbits: int):
    h1 = _to_s32(hash64)
    h2 = _to_s32(hash64 >> 32)
    for i in range(1, k + 1):
        c = _to_s32(h1 + i * h2)
        if c < 0:
            c = (~c) & 0xFFFFFFFF
        yield c % nbits


class BloomFilter:
    """One row group's filter (build side)."""

    def __init__(self, expected_entries: int, fpp: float = DEFAULT_FPP):
        self.nbits = optimal_num_bits(expected_entries, fpp)
        self.k = optimal_num_hashes(expected_entries, self.nbits)
        self.words = bytearray(self.nbits // 8)

    def add_hash(self, hash64: int) -> None:
        for pos in _positions(hash64, self.k, self.nbits):
            self.words[pos >> 3] |= 1 << (pos & 7)

    def add(self, value, kind: str) -> None:
        self.add_hash(hash_value(value, kind))

    def might_contain_hash(self, hash64: int) -> bool:
        return bloom_might_contain(self.k, bytes(self.words), hash64)

    def to_pb(self) -> bytes:
        """BloomFilter message: numHashFunctions + utf8bitset."""
        bitset = bytes(self.words)
        out = bytes([1 << 3]) + _pb_varint(self.k)  # field 1 varint
        out += bytes([(3 << 3) | 2]) + _pb_varint(len(bitset)) + bitset
        return out


def _pb_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def bloom_index_pb(filters: list[BloomFilter]) -> bytes:
    """BloomFilterIndex message: repeated field-1 BloomFilter."""
    out = bytearray()
    for f in filters:
        body = f.to_pb()
        out += bytes([(1 << 3) | 2]) + _pb_varint(len(body)) + body
    return bytes(out)


def bloom_might_contain(k: int, bitset: bytes, hash64: int) -> bool:
    """Membership test against a decoded utf8bitset (little-endian)."""
    nbits = len(bitset) * 8
    if not nbits or not k:
        return True  # degenerate filter admits everything (sound)
    for pos in _positions(hash64, k, nbits):
        if not (bitset[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True
