"""Snappy raw-block decompression (levi_spark.operators.snappy):
pyarrow's compressor as the reference across entropy regimes,
overlap-copy RLE behavior, hand-built tag streams pinning each copy
kind, and strict refusals."""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from levi_spark.operators.snappy import snappy_uncompress


@settings(max_examples=50, deadline=None)
@given(data=st.binary(max_size=8000))
def test_uncompress_pyarrow_law(data):
    comp = pa.compress(data, codec="snappy", asbytes=True)
    assert snappy_uncompress(comp) == data


def test_overlap_copy_rle():
    """Runs compress as overlapping copies (offset < length)."""
    data = b"A" * 50000 + b"B" * 3
    comp = pa.compress(data, codec="snappy", asbytes=True)
    assert len(comp) < len(data) // 20  # copies cap at 64 bytes each
    assert snappy_uncompress(comp) == data


def test_hand_built_tags():
    """One literal + each copy kind, assembled by hand: 'abcd' then
    copy-1 (offset 4, length 4), copy-2 (offset 8, length 8), copy-4
    (offset 16, length 16) -> 'abcd' * 8."""
    stream = bytes(
        [32]  # varint: 32 uncompressed bytes
        + [(4 - 1) << 2 | 0] + list(b"abcd")  # literal of 4
        + [((4 - 4) & 7) << 2 | 1 | (0 << 5), 4]  # copy-1 len 4 off 4
        + [(8 - 1) << 2 | 2, 8, 0]  # copy-2 len 8 off 8
        + [(16 - 1) << 2 | 3, 16, 0, 0, 0]  # copy-4 len 16 off 16
    )
    assert snappy_uncompress(stream) == b"abcd" * 8


def test_strict_refusals():
    good = pa.compress(b"payload data " * 30, codec="snappy", asbytes=True)
    with pytest.raises(ValueError, match="truncated|overruns"):
        snappy_uncompress(good[:-4])
    with pytest.raises(
        ValueError, match="!= declared|overruns|before output"
    ):
        snappy_uncompress(b"\x7f" + good[1:])  # lie about the length
    with pytest.raises(ValueError, match="before output start"):
        # copy-2 at output byte 0 reaching back 4
        snappy_uncompress(bytes([4, (4 - 1) << 2 | 2, 4, 0]))
    with pytest.raises(ValueError, match="zero copy offset"):
        snappy_uncompress(
            bytes([8, (4 - 1) << 2 | 0]) + b"abcd"
            + bytes([(4 - 1) << 2 | 2, 0, 0])
        )
