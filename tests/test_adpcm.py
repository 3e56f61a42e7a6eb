"""IMA ADPCM + G.711 codecs (levi_spark.operators.adpcm): state-
machine laws (encoder/decoder state parity, clamps), WAV mux/demux
validation, G.711 companding laws (lattice identity, mu-law's
negative-zero alias, A-law code identity), and the DuckDB-oracle
closed forms the `multimodal_adpcm_decode` / `multimodal_g711_decode`
gates rely on."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from levi_spark.operators.adpcm import (
    IMA_STEPS,
    alaw_compress,
    alaw_expand,
    decode_wav_g711,
    decode_wav_ima,
    encode_wav_g711,
    encode_wav_ima,
    g711_audio_stats,
    ima_audio_stats,
    ima_decode_codes,
    ima_encode_samples,
    mulaw_compress,
    mulaw_expand,
)


def test_step_table_shape():
    assert len(IMA_STEPS) == 89
    assert IMA_STEPS[0] == 7 and IMA_STEPS[88] == 32767
    assert all(a < b for a, b in zip(IMA_STEPS, IMA_STEPS[1:]))


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 300),
    seed=st.integers(0, 10_000),
    pred=st.integers(-32768, 32767),
    idx=st.integers(0, 88),
)
def test_encoder_decoder_state_parity_law(n, seed, pred, idx):
    """Decoding the encoder's codes from the same seed reproduces the
    encoder's internal reconstruction trajectory and final state —
    the property that makes block-chained streams decodable."""
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, n)
    codes, pf, idxf = ima_encode_samples(samples, pred, idx)
    dec, p2, i2 = ima_decode_codes(codes, pred, idx)
    assert (pf, idxf) == (p2, i2)
    assert dec[-1] == pf
    assert dec.min() >= -32768 and dec.max() <= 32767


def test_decoder_clamps_and_validation():
    # all-max codes slam the predictor into the clamp without wrapping
    dec, p, i = ima_decode_codes(np.full(200, 7), 0, 88)
    assert p == 32767 and i == 88
    dec, p, i = ima_decode_codes(np.full(200, 15), 0, 88)
    assert p == -32768
    with pytest.raises(ValueError, match="4-bit"):
        ima_decode_codes(np.array([16]), 0, 0)
    with pytest.raises(ValueError, match="predictor"):
        ima_decode_codes(np.array([0]), 40000, 0)
    with pytest.raises(ValueError, match="step index"):
        ima_decode_codes(np.array([0]), 0, 89)


@settings(max_examples=15, deadline=None)
@given(
    nblocks=st.integers(1, 4),
    ncodes=st.sampled_from([8, 32, 64]),
    seed=st.integers(0, 10_000),
    sr=st.integers(4000, 48000),
)
def test_wav_ima_mux_demux_law(nblocks, ncodes, seed, sr):
    """Every block decodes independently from its own header state;
    the container emits samp0 + decoded codes per block in order."""
    rng = np.random.default_rng(seed)
    blocks = [
        (
            int(rng.integers(-32768, 32768)),
            int(rng.integers(0, 89)),
            rng.integers(0, 16, ncodes),
        )
        for _ in range(nblocks)
    ]
    sample_rate, out = decode_wav_ima(encode_wav_ima(blocks, sr))
    assert sample_rate == sr
    want = np.concatenate(
        [
            np.concatenate(([s0], ima_decode_codes(c, s0, i0)[0]))
            for s0, i0, c in blocks
        ]
    )
    assert np.array_equal(out.astype(np.int64), want)


def test_wav_ima_validation_refusals():
    codes = np.arange(32) % 16
    payload = encode_wav_ima([(0, 0, codes)], 8000)
    with pytest.raises(ValueError, match="not RIFF"):
        decode_wav_ima(b"XXXX" + payload[4:])
    # corrupt wSamplesPerBlock -> fmt cross-check trips
    bad = bytearray(payload)
    fmt_at = bad.index(b"fmt ") + 8
    struct.pack_into("<H", bad, fmt_at + 18, 99)
    with pytest.raises(ValueError, match="wSamplesPerBlock"):
        decode_wav_ima(bytes(bad))
    # corrupt fact count -> decoded-count cross-check trips
    bad = bytearray(payload)
    fact_at = bad.index(b"fact") + 8
    struct.pack_into("<I", bad, fact_at, 7)
    with pytest.raises(ValueError, match="fact says"):
        decode_wav_ima(bytes(bad))
    # PCM WAV refused by the IMA demux
    from levi_spark.operators.riffwav import encode_wav

    with pytest.raises(ValueError, match="not IMA"):
        decode_wav_ima(encode_wav(np.zeros(4, dtype=np.int16), 8000))
    with pytest.raises(ValueError, match="even number"):
        encode_wav_ima([(0, 0, np.array([1, 2, 3]))], 8000)
    # stereo refused loudly (mono-only profile)
    bad = bytearray(payload)
    fmt_at = bad.index(b"fmt ") + 8
    struct.pack_into("<H", bad, fmt_at + 2, 2)  # nChannels
    with pytest.raises(NotImplementedError, match="stereo"):
        decode_wav_ima(bytes(bad))


def test_g711_companding_laws():
    c = np.arange(256)
    # expansion ranges per G.711 conventions
    mu = mulaw_expand(c)
    al = alaw_expand(c)
    assert mu.min() == -8031 and mu.max() == 8031
    assert al.min() == -4032 and al.max() == 4032
    # lattice identity: expand . compress . expand == expand
    assert np.array_equal(mulaw_expand(mulaw_compress(mu)), mu)
    assert np.array_equal(alaw_expand(alaw_compress(al)), al)
    # code identity, modulo mu-law's negative-zero alias 127 -> 255
    rt = mulaw_compress(mu)
    assert np.array_equal(rt[c != 127], c[c != 127]) and rt[127] == 255
    assert np.array_equal(alaw_compress(al), c)
    # both zero codes decode to zero
    assert mu[127] == 0 and mu[255] == 0


@settings(max_examples=20, deadline=None)
@given(x=st.integers(-40000, 40000))
def test_g711_quantization_error_bound(x):
    """Compression then expansion lands within the segment's step of
    the (clamped) input — the companding contract."""
    mu_hat = int(mulaw_expand(mulaw_compress(np.array([x])))[0])
    clamped = max(-8031, min(8031, x))
    # segment step for |clamped|: 2^(e+1) with e from the magnitude
    seg = max(2, 2 << max(0, int(np.floor(np.log2(abs(clamped) + 33))) - 5))
    assert abs(mu_hat - clamped) <= seg


def test_g711_wav_mux_demux():
    c = np.arange(256)
    for law, expand in (("mu", mulaw_expand), ("a", alaw_expand)):
        sr, x = decode_wav_g711(encode_wav_g711(c, 16000, law=law))
        assert sr == 16000
        assert np.array_equal(x, expand(c))
    with pytest.raises(ValueError, match="not G.711"):
        from levi_spark.operators.riffwav import encode_wav

        decode_wav_g711(encode_wav(np.zeros(4, dtype=np.int16), 8000))


def test_gate_fixture_stats_are_integer_exact():
    """The exact fixture shape the driver gates run: md5 hex digits as
    two chained-restart blocks (ADPCM) and tiled digest bytes
    (G.711)."""
    text = "audio doc"
    d = 11
    hx = hashlib.md5(text.encode()).hexdigest()
    codes = np.array([int(ch, 16) for ch in hx], dtype=np.int64)
    w = encode_wav_ima(
        [
            ((d % 256) - 128, d % 89, codes),
            (((3 * d) % 256) - 128, (5 * d) % 89, codes[::-1]),
        ],
        8000 + 100 * (d % 7),
    )
    s = ima_audio_stats(w)
    d0, p0, _ = ima_decode_codes(codes, (d % 256) - 128, d % 89)
    d1, p1, _ = ima_decode_codes(codes[::-1], ((3 * d) % 256) - 128, (5 * d) % 89)
    allsamp = np.concatenate(([(d % 256) - 128], d0, [((3 * d) % 256) - 128], d1))
    assert s == {
        "sample_rate": 8000 + 100 * (d % 7),
        "n_samples": 66,
        "last_sample": int(p1),
        "sum_samples": int(allsamp.sum()),
        "sum_abs": int(np.abs(allsamp).sum()),
    }

    digest = hashlib.md5(text.encode()).digest()
    g = g711_audio_stats(
        encode_wav_g711(np.tile(np.frombuffer(digest, np.uint8), 8), 8000)
    )
    lin = mulaw_expand(np.frombuffer(digest, np.uint8).astype(np.int64))
    assert g == {
        "sample_rate": 8000,
        "n_samples": 128,
        "last_sample": int(lin[-1]),
        "sum_samples": 8 * int(lin.sum()),
        "sum_abs": 8 * int(np.abs(lin).sum()),
    }


def test_multimodal_plane_integration(spark):
    import pandas as pd

    from levi_spark.operators.adpcm import ima_audio_decoder
    from levi_spark.operators.multimodal import decode_audio_features

    rng = np.random.default_rng(3)
    payloads = {
        i: encode_wav_ima(
            [(int(rng.integers(-100, 100)), i, rng.integers(0, 16, 32))],
            8000 * i,
        )
        for i in range(1, 4)
    }
    pdf = pd.DataFrame(
        {"doc_id": list(payloads), "payload": list(payloads.values())}
    )
    rows = decode_audio_features(
        spark.createDataFrame(pdf), decoder=ima_audio_decoder
    ).collect()
    assert {r.doc_id: (r.sample_rate, r.n_samples) for r in rows} == {
        1: (8000, 33), 2: (16000, 33), 3: (24000, 33)
    }
