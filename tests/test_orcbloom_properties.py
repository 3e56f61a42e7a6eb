"""Property-based tests for the ORC bloom filter primitives
(operators/orcbloom): no-false-negatives is the structural guarantee a
bloom filter must never break, the hash pair must be engine-exact
(pinned against pyarrow bitsets elsewhere; here: pure invariants), and
the protobuf framing must roundtrip through our own reader."""

from hypothesis import given, settings
from hypothesis import strategies as st

from levi_spark.operators.orc import pb_decode
from levi_spark.operators.orcbloom import (
    BloomFilter,
    bloom_index_pb,
    bloom_might_contain,
    hash_value,
    long_hash,
    murmur3_hash64,
    optimal_num_bits,
    optimal_num_hashes,
)

i64 = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)


@given(st.lists(i64, min_size=1, max_size=300))
@settings(max_examples=50, deadline=None)
def test_no_false_negatives_longs(vals):
    bf = BloomFilter(1000, 0.05)
    for v in vals:
        bf.add(v, "long")
    assert all(bf.might_contain_hash(long_hash(v)) for v in vals)


@given(st.lists(st.text(min_size=0, max_size=40), min_size=1,
                max_size=200))
@settings(max_examples=50, deadline=None)
def test_no_false_negatives_strings(vals):
    bf = BloomFilter(1000, 0.05)
    for v in vals:
        bf.add(v, "string")
    assert all(
        bf.might_contain_hash(murmur3_hash64(v.encode())) for v in vals
    )


@given(i64)
@settings(max_examples=300, deadline=None)
def test_long_hash_is_a_64bit_function(v):
    h = long_hash(v)
    assert 0 <= h < (1 << 64)
    assert long_hash(v) == h  # deterministic


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=300, deadline=None)
def test_murmur_is_a_64bit_function(b):
    h = murmur3_hash64(b)
    assert 0 <= h < (1 << 64)
    assert murmur3_hash64(b) == h


@given(st.floats(allow_nan=False, allow_infinity=False))
@settings(max_examples=200, deadline=None)
def test_double_hash_bridges_to_long_bits(x):
    import struct

    bits = struct.unpack("<q", struct.pack("<d", x))[0]
    assert hash_value(x, "double") == long_hash(bits)


@given(st.integers(min_value=8, max_value=200_000),
       st.floats(min_value=0.001, max_value=0.9))
@settings(max_examples=200, deadline=None)
def test_sizing_shapes(n, fpp):
    m = optimal_num_bits(n, fpp)
    assert m % 64 == 0 and m > 0
    assert optimal_num_hashes(n, m) >= 1


@given(st.lists(i64, min_size=0, max_size=100))
@settings(max_examples=40, deadline=None)
def test_pb_framing_roundtrips(vals):
    bf = BloomFilter(500, 0.1)
    for v in vals:
        bf.add(v, "long")
    idx = bloom_index_pb([bf, bf])
    decoded = pb_decode(idx)[1]
    assert len(decoded) == 2
    for bb in decoded:
        m = pb_decode(bb)
        assert m[1][0] == bf.k
        assert m[3][0] == bytes(bf.words)
        # membership through the decoded framing
        assert all(
            bloom_might_contain(m[1][0], m[3][0], long_hash(v))
            for v in vals
        )
