"""Regression tests for the round-8 ADVICE findings.

1. parquetmeta: REQUIRED columns (max def level 0) have no
   definition-level block — previously misparsed as OPTIONAL.
2. deflate: RFC 1951 §3.2.7 permits one zero-bit distance code for
   all-literal dynamic blocks — previously rejected at table build.
3. ico: entries stored out of offset order were falsely rejected and
   non-adjacent overlaps missed — spans are now sorted first.
4. deflate encoder: length 258 must emit code 285 (0 extra bits),
   not code 284 + extra 31.
5. arrowipc: empty record batches with zero-length offsets buffers
   (as pyarrow writes) must decode.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_required_column_reads_without_level_block(tmp_path):
    """A REQUIRED (non-nullable) column carries no def-level block in
    v1 data pages; the reader must not eat 4 value bytes as one."""
    from levi_spark.operators.parquetmeta import read_column, read_footer

    t = pa.table(
        {
            "k": pa.array(range(50), pa.int64()),
            "x": pa.array([i * 0.5 for i in range(50)], pa.float64()),
            "s": pa.array([f"s{i}" for i in range(50)], pa.utf8()),
        },
        schema=pa.schema(
            [
                pa.field("k", pa.int64(), nullable=False),
                pa.field("x", pa.float64(), nullable=False),
                pa.field("s", pa.utf8(), nullable=False),
            ]
        ),
    )
    p = str(tmp_path / "req.parquet")
    pq.write_table(t, p, compression="none", use_dictionary=False,
                   data_page_version="1.0")
    f = read_footer(p)
    assert f["levels"]["k"] == (0, 0)
    for col in ("k", "x", "s"):
        assert read_column(p, col) == t.column(col).to_pylist()


def test_mixed_required_and_optional_levels(tmp_path):
    from levi_spark.operators.parquetmeta import read_column, read_footer

    t = pa.table(
        {
            "r": pa.array(range(20), pa.int64()),
            "o": pa.array(
                [None if i % 3 == 0 else i for i in range(20)], pa.int64()
            ),
        },
        schema=pa.schema(
            [
                pa.field("r", pa.int64(), nullable=False),
                pa.field("o", pa.int64(), nullable=True),
            ]
        ),
    )
    p = str(tmp_path / "mix.parquet")
    pq.write_table(t, p, compression="snappy", use_dictionary=False,
                   data_page_version="1.0")
    f = read_footer(p)
    assert f["levels"] == {"r": (0, 0), "o": (1, 0)}
    assert read_column(p, "r") == list(range(20))
    assert read_column(p, "o") == t.column("o").to_pylist()


def test_inflate_accepts_empty_distance_code():
    """Hand-built dynamic block: two literal symbols (65, 256) of
    length 1, ONE distance code of zero bits (all HDIST lengths 0) —
    legal per §3.2.7, previously rejected at table-build time."""
    from levi_spark.operators.deflate import _BitsW, inflate

    w = _BitsW()
    w.bits(1, 1)  # BFINAL
    w.bits(2, 2)  # BTYPE = dynamic
    w.bits(0, 5)  # HLIT  = 257
    w.bits(0, 5)  # HDIST = 1
    w.bits(14, 4)  # HCLEN = 18
    # code-length code lengths in _CL_ORDER positions 0..17:
    # sym18 -> 1, sym0 -> 2, sym1 -> 2, rest 0
    cl = {18: 1, 0: 2, 1: 2}
    order = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2,
             14, 1]
    for s in order:
        w.bits(cl.get(s, 0), 3)
    # canonical codes: 18 -> 0 (1 bit), 0 -> 10, 1 -> 11 (2 bits)
    def cl_emit(sym):
        if sym == 18:
            w.code(0, 1)
        elif sym == 0:
            w.code(0b10, 2)
        else:
            w.code(0b11, 2)

    # 257 lit lengths + 1 dist length:
    cl_emit(18); w.bits(65 - 11, 7)    # 65 zeros
    cl_emit(1)                          # sym 65 'A' -> length 1
    cl_emit(18); w.bits(138 - 11, 7)   # 138 zeros
    cl_emit(18); w.bits(52 - 11, 7)    # 52 zeros  (66..255 done)
    cl_emit(1)                          # sym 256 -> length 1
    cl_emit(0)                          # the single dist length: 0
    # data: lit code is {65: 0, 256: 1}, 1 bit each
    for _ in range(5):
        w.code(0, 1)  # 'A'
    w.code(1, 1)  # end of block
    stream = w.done()
    assert inflate(stream) == b"AAAAA"
    # cross-check: zlib accepts the same stream
    assert zlib.decompressobj(-15).decompress(stream) == b"AAAAA"


def test_inflate_still_rejects_length_code_with_empty_dist():
    """If a block declares an empty distance code but then emits a
    length code, that IS invalid — the error is deferred, not lost.
    Built with HLIT=258 so symbol 257 (a length code) is in the lit
    alphabet while the distance code stays empty."""
    from levi_spark.operators import deflate as D

    cl = {18: 1, 0: 2, 1: 2}
    order = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2,
             14, 1]
    w2 = D._BitsW()
    w2.bits(1, 1)
    w2.bits(2, 2)
    w2.bits(1, 5)   # HLIT = 258 (includes sym 257)
    w2.bits(0, 5)   # HDIST = 1
    w2.bits(14, 4)
    for s in order:
        w2.bits(cl.get(s, 0), 3)

    def cl2(sym):
        if sym == 18:
            w2.code(0, 1)
        elif sym == 0:
            w2.code(0b10, 2)
        else:
            w2.code(0b11, 2)

    cl2(18); w2.bits(138 - 11, 7)  # 138 zeros
    cl2(18); w2.bits(118 - 11, 7)  # 118 zeros (syms 0..255)
    cl2(1)                          # sym 256 len 1
    cl2(1)                          # sym 257 len 1  (a LENGTH code)
    cl2(0)                          # dist: single zero length
    # canonical lit: 256 -> 0, 257 -> 1
    w2.code(1, 1)  # emit sym 257: length 3, needs a distance -> boom
    with pytest.raises(ValueError, match="distance code is empty"):
        D.inflate(w2.done())


def test_len_code_258_uses_code_285():
    from levi_spark.operators.deflate import _len_code, deflate, inflate

    assert _len_code(258) == (285, 0, 0)
    assert _len_code(257) == (284, 5, 30)
    data = b"Q" * 600  # forces max-length matches
    enc = deflate(data)
    assert inflate(enc) == data
    assert zlib.decompressobj(-15).decompress(enc) == data


def test_ico_out_of_order_entries_accepted():
    """Directory order need not be offset order; decode must accept
    a valid file whose second entry precedes the first on disk."""
    from levi_spark.operators.ico import decode_ico, encode_ico

    rgb1 = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    rgb2 = (np.arange(2 * 2 * 3, dtype=np.uint8) * 3).reshape(2, 2, 3)
    payload = bytearray(encode_ico([("png", rgb1, None),
                                    ("png", rgb2, None)]))
    # swap the two 16-byte directory entries (images stay in place)
    d0 = bytes(payload[6:22])
    d1 = bytes(payload[22:38])
    payload[6:22] = d1
    payload[22:38] = d0
    a, b = decode_ico(bytes(payload))
    assert a["pixels"].shape == (2, 2, 3)
    assert b["pixels"].shape == (4, 4, 3)
    assert np.array_equal(a["pixels"], rgb2)
    assert np.array_equal(b["pixels"], rgb1)


def test_ico_non_adjacent_overlap_rejected():
    from levi_spark.operators.ico import decode_ico, encode_ico

    rgb = np.zeros((2, 2, 3), np.uint8)
    payload = bytearray(encode_ico([("png", rgb, None),
                                    ("png", rgb, None)]))
    # point entry 1's offset INTO entry 0's span, then swap directory
    # rows so the overlap pair is no longer directory-adjacent order
    off0, = struct.unpack_from("<I", payload, 6 + 12)
    struct.pack_into("<I", payload, 22 + 12, off0 + 4)
    with pytest.raises(ValueError, match="overlap"):
        decode_ico(bytes(payload))


def test_arrowipc_empty_pyarrow_batch_decodes():
    """pyarrow emits a zero-length offsets buffer for an empty utf8
    column; the reader must not unpack a phantom first offset."""
    import io

    from levi_spark.operators.arrowipc import decode_arrow_ipc

    schema = pa.schema([("k", pa.int64()), ("s", pa.utf8())])
    empty = pa.record_batch(
        [pa.array([], pa.int64()), pa.array([], pa.utf8())], schema=schema
    )
    full = pa.record_batch(
        [pa.array([1, 2], pa.int64()), pa.array(["a", "bb"], pa.utf8())],
        schema=schema,
    )
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, schema) as wr:
        wr.write_batch(empty)
        wr.write_batch(full)
    schema_out, cols = decode_arrow_ipc(sink.getvalue())
    assert [n for n, _ in schema_out] == ["k", "s"]
    assert cols["k"] == [1, 2]
    assert cols["s"] == ["a", "bb"]
