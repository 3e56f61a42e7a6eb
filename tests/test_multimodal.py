"""Multimodal operator plumbing tests: binary payloads through
Arrow-batched mapInPandas — schemas, fan-out shape, decoder pluggability,
and the stub/NotImplementedError contract for absent codecs."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from levi_spark.operators.multimodal import (
    decode_image_features,
    fake_image_decoder,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def payloads(spark, testdata_dir):
    docs = spark.read.parquet(f"{testdata_dir}/documents.parquet")
    return (
        docs.where(F.col("doc_id") < 20)
        .select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    )


def test_decode_requires_codec_by_default(payloads):
    with pytest.raises(Exception) as ei:
        decode_image_features(payloads).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_fake_decoder_deterministic(payloads):
    out1 = sorted(decode_image_features(payloads, decoder=fake_image_decoder).collect())
    out2 = sorted(decode_image_features(payloads, decoder=fake_image_decoder).collect())
    assert out1 == out2
    assert len(out1) == 20
    for r in out1:
        assert 1 <= r.width <= 64 and 1 <= r.height <= 64
        assert r.mean_pixel > 0


def test_resize_schema_and_size(payloads):
    out = resize_images(payloads, 32, 16).collect()
    assert len(out) == 20
    for r in out:
        assert (r.width, r.height) == (32, 16)
        assert len(r.payload) == (32 * 16) // 8


def test_sample_frames_matches_python(payloads):
    rows = payloads.collect()
    expected = []
    for r in rows:
        data = bytes(r.payload)
        n_frames = (len(data) + 63) // 64
        for f in range(0, n_frames, 2):
            chunk = data[f * 64 : (f + 1) * 64]
            expected.append(
                (r.doc_id, f, len(chunk), hashlib.sha256(chunk).hexdigest())
            )
    got = [
        (r.doc_id, r.frame_idx, r.frame_bytes, r.frame_sha)
        for r in sample_frames(payloads, frame_bytes=64, stride=2).collect()
    ]
    assert sorted(got) == sorted(expected)
