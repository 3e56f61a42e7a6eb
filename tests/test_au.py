"""Sun AU container (levi_spark.operators.au): encoding round trips
(PCM16 exact, PCM8 floor semantics, mu-law/A-law through the G.711
tables), the annotation-gap offset, unknown-size handling, and
strict refusals."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from levi_spark.operators.adpcm import alaw_expand, mulaw_expand
from levi_spark.operators.au import decode_au, encode_au


@settings(max_examples=25, deadline=None)
@given(n=st.integers(1, 200), ch=st.integers(1, 4), seed=st.integers(0, 9999),
       note=st.integers(0, 9))
def test_pcm16_round_trip_law(n, ch, seed, note):
    s = np.random.default_rng(seed).integers(
        -32768, 32768, (n, ch)).astype(np.int16)
    out = decode_au(encode_au(s, 44100, "pcm16", annotation=b"a" * note))
    assert out["encoding"] == "pcm16" and out["channels"] == ch
    assert np.array_equal(out["samples"], s)


def test_pcm8_is_floor_not_truncate():
    s = np.array([[-33], [-300], [33], [300]], np.int16)
    out = decode_au(encode_au(s, 8000, "pcm8"))["samples"].ravel()
    assert out.tolist() == [-256, -512, 0, 256]  # floor(x/256)*256


@pytest.mark.parametrize("law,expand", [("ulaw", mulaw_expand),
                                        ("alaw", alaw_expand)])
def test_g711_levels_are_fixed_points(law, expand):
    """Samples that sit on G.711 quantization levels survive the
    companding round trip value-exactly."""
    codes = np.arange(256, dtype=np.uint8)
    s = expand(codes).astype(np.int16).reshape(-1, 1)
    out = decode_au(encode_au(s, 8000, law))
    assert out["encoding"] == law
    assert np.array_equal(out["samples"], s)


def test_unknown_data_size_ffffffff():
    s = np.arange(10, dtype=np.int16).reshape(-1, 1)
    blob = bytearray(encode_au(s, 8000, "pcm16"))
    struct.pack_into(">I", blob, 8, 0xFFFFFFFF)
    assert np.array_equal(decode_au(bytes(blob))["samples"], s)


def test_strict_refusals():
    s = np.zeros((4, 1), np.int16)
    good = encode_au(s, 8000, "pcm16")
    with pytest.raises(ValueError, match="not AU"):
        decode_au(b"RIFF" + good[4:])
    with pytest.raises(ValueError, match="offset"):
        bad = bytearray(good)
        struct.pack_into(">I", bad, 4, 10)
        decode_au(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        decode_au(good[:-3])
    with pytest.raises(NotImplementedError, match="encoding id"):
        bad = bytearray(good)
        struct.pack_into(">I", bad, 12, 6)  # float32
        decode_au(bytes(bad))
    with pytest.raises(ValueError, match="interleave"):
        bad = bytearray(good)
        struct.pack_into(">I", bad, 20, 3)  # 8 samples % 3 != 0
        decode_au(bytes(bad))
    with pytest.raises(ValueError, match="AU encoding"):
        encode_au(s, 8000, "opus")
