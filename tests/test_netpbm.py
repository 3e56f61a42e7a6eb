"""Pure-numpy netpbm codec: round-trip, header parsing (comments,
whitespace), nearest-neighbor resize, error contracts."""

import numpy as np
import pytest

from levi_spark.operators.netpbm import (
    decode_netpbm,
    encode_netpbm,
    netpbm_image_decoder,
    netpbm_resize,
)


def test_p6_round_trip():
    rng = np.random.RandomState(7)
    a = rng.randint(0, 256, size=(5, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_netpbm(encode_netpbm(a)), a)


def test_p5_round_trip():
    a = np.arange(35, dtype=np.uint8).reshape(5, 7)
    assert np.array_equal(decode_netpbm(encode_netpbm(a)), a)


def test_header_comments_and_whitespace():
    a = np.arange(6, dtype=np.uint8).reshape(2, 3)
    payload = b"P5 # a comment\n 3 # another\n\t2\n255\n" + a.tobytes()
    assert np.array_equal(decode_netpbm(payload), a)


def test_decoder_features():
    a = np.full((4, 8, 3), 10, dtype=np.uint8)
    d = netpbm_image_decoder(encode_netpbm(a))
    assert d == {
        "width": 8, "height": 4, "mean_pixel": 10.0, "mean_abs_dev": 0.0,
    }


def test_resize_nearest_neighbor():
    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = decode_netpbm(netpbm_resize(encode_netpbm(a), 4, 4))
    rows = (np.arange(4) * 8) // 4
    assert np.array_equal(out, a[rows][:, rows])
    assert out.shape == (4, 4)


def test_error_contracts():
    with pytest.raises(ValueError, match="magic"):
        decode_netpbm(b"P3 1 1 255\n0 0 0")
    with pytest.raises(ValueError, match="truncated"):
        decode_netpbm(b"P5 4 4 255\n\x00\x01")
    with pytest.raises(ValueError, match="16-bit"):
        decode_netpbm(b"P5 1 1 65535\n\x00\x00")
    with pytest.raises(ValueError, match="expected"):
        encode_netpbm(np.zeros((2, 2, 4), dtype=np.uint8))


def test_plugs_into_decode_image_features(spark):
    from levi_spark.operators.multimodal import decode_image_features

    a = np.full((2, 3, 3), 100, dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_netpbm(a)))], "doc_id long, payload binary"
    )
    (row,) = decode_image_features(df, decoder=netpbm_image_decoder).collect()
    assert (row["width"], row["height"], row["mean_pixel"]) == (3, 2, 100.0)
