"""LZ4 decode (levi_spark.operators.lz4): block format cross-checked
against pyarrow's lz4_raw codec, frame format against pyarrow's lz4
frame codec, hand-built Hadoop framing (the legacy parquet LZ4
enum), published XXH32 vectors, and strict refusals."""

from __future__ import annotations

import random
import struct

import pyarrow as pa
import pytest

from levi_spark.operators.lz4 import (
    lz4_block_uncompress,
    lz4_frame_uncompress,
    lz4_hadoop_uncompress,
    xxh32,
)


def test_xxh32_published_vectors():
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF


def _cases(seed=1):
    random.seed(seed)
    return [
        b"",
        b"x",
        b"A" * 50000,
        b"lorem ipsum dolor sit amet " * 3000,
        bytes(random.randrange(256) for _ in range(60000)),
        bytes(random.choice(b"abcd") for _ in range(80000)),
    ]


def test_block_format_cross_check():
    raw = pa.Codec("lz4_raw")
    for d in _cases():
        assert lz4_block_uncompress(raw.compress(d, asbytes=True)) == d


def test_frame_format_cross_check():
    frame = pa.Codec("lz4")
    for d in _cases(2):
        assert lz4_frame_uncompress(frame.compress(d, asbytes=True)) == d


def test_hadoop_framing():
    """[u32 BE usize][u32 BE csize][block] — and the bare-block
    fallback some legacy writers require."""
    raw = pa.Codec("lz4_raw")
    d = b"hadoop framed lz4 " * 500
    blk = raw.compress(d, asbytes=True)
    framed = struct.pack(">II", len(d), len(blk)) + blk
    assert lz4_hadoop_uncompress(framed) == d
    # multiple chunks under one uncompressed-size header
    half = len(d) // 2
    b1 = raw.compress(d[:half], asbytes=True)
    b2 = raw.compress(d[half:], asbytes=True)
    multi = (struct.pack(">I", len(d))
             + struct.pack(">I", len(b1)) + b1
             + struct.pack(">I", len(b2)) + b2)
    assert lz4_hadoop_uncompress(multi) == d
    # bare block (no framing) still decodes
    assert lz4_hadoop_uncompress(blk) == d


def test_frame_skippable_and_concatenated():
    frame = pa.Codec("lz4")
    a, b = b"first " * 300, b"second " * 400
    skip = struct.pack("<II", 0x184D2A51, 3) + b"\x01\x02\x03"
    enc = (skip + frame.compress(a, asbytes=True)
           + frame.compress(b, asbytes=True))
    assert lz4_frame_uncompress(enc) == a + b


def test_strict_refusals():
    with pytest.raises(ValueError, match="magic"):
        lz4_frame_uncompress(b"\x00\x11\x22\x33rest")
    with pytest.raises(ValueError, match="zero match offset"):
        # token 0x14: 1 literal, match len 4+0; offset 0
        lz4_block_uncompress(b"\x14Q\x00\x00")
    with pytest.raises(ValueError, match="past window"):
        # offset 200 with only 1 byte decoded
        lz4_block_uncompress(b"\x14Q\xc8\x00")
    enc = pa.Codec("lz4").compress(b"data " * 200, asbytes=True)
    bad = bytearray(enc)
    bad[6] ^= 0xFF  # header checksum byte or descriptor
    with pytest.raises((ValueError, NotImplementedError)):
        lz4_frame_uncompress(bytes(bad))


def test_block_max_out_guard():
    raw = pa.Codec("lz4_raw")
    blk = raw.compress(b"Z" * 1000, asbytes=True)
    with pytest.raises(ValueError, match="exceeds declared"):
        lz4_block_uncompress(blk, max_out=999)
    assert lz4_block_uncompress(blk, max_out=1000) == b"Z" * 1000


def test_block_compress_reference_accepts():
    """Our block encoder honors the spec end conditions (literal
    tail, no match in the last 12 bytes); the reference decoder and
    ours both accept every stream."""
    from levi_spark.operators.lz4 import lz4_block_compress

    random.seed(31)
    raw = pa.Codec("lz4_raw")
    cases = ([b"", b"x", b"A" * 50000, b"lorem ipsum " * 4000]
             + [b"Q" * k for k in range(1, 40)]
             + [bytes(random.choice(b"abcd") for _ in range(2000))
                for _ in range(20)])
    for d in cases:
        enc = lz4_block_compress(d)
        assert lz4_block_uncompress(enc) == d
        assert raw.decompress(enc, decompressed_size=len(d),
                              asbytes=True) == d
    assert len(lz4_block_compress(b"A" * 50000)) < 250


def test_frame_compress_reference_accepts():
    from levi_spark.operators.lz4 import lz4_frame_compress

    frame = pa.Codec("lz4")
    d = b"multi-block frame content " * 30000  # > one 256 KiB block
    enc = lz4_frame_compress(d)
    assert lz4_frame_uncompress(enc) == d
    assert frame.decompress(enc, decompressed_size=len(d),
                            asbytes=True) == d
    # checksum integrity: flipping a content byte must raise
    bad = bytearray(enc)
    bad[-6] ^= 0xFF
    with pytest.raises(ValueError):
        lz4_frame_uncompress(bytes(bad))
