"""Pure-numpy RIFF/PCM WAV codec: round-trips, foreign-chunk
tolerance, error contracts, and the stdlib `wave` module as an
independent oracle for our encoder."""

import io
import struct
import wave

import numpy as np
import pytest

from levi_spark.operators.riffwav import decode_wav, encode_wav, wav_audio_decoder


def test_round_trip_mono_and_stereo():
    rng = np.random.default_rng(7)
    for ch in (1, 2):
        a = rng.integers(-32768, 32767, size=(100, ch), dtype=np.int16)
        rate, back = decode_wav(encode_wav(a, 22050))
        assert rate == 22050 and back.shape == (100, ch)
        assert np.array_equal(back, a)


def test_stdlib_wave_reads_our_encoding():
    a = np.arange(-50, 50, dtype=np.int16)
    w = wave.open(io.BytesIO(encode_wav(a, 8000)))
    assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (8000, 1, 2)
    assert np.array_equal(
        np.frombuffer(w.readframes(w.getnframes()), dtype="<i2"), a
    )


def test_decodes_stdlib_wave_output():
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(2)
    w.setsampwidth(2)
    w.setframerate(44100)
    a = np.array([[1, -1], [300, -300], [32767, -32768]], dtype=np.int16)
    w.writeframes(a.tobytes())
    w.close()
    rate, back = decode_wav(buf.getvalue())
    assert rate == 44100 and np.array_equal(back, a)


def test_unknown_chunks_skipped():
    a = np.ones(10, dtype=np.int16)
    raw = encode_wav(a, 16000)
    # splice a LIST chunk between fmt and data
    fmt_end = raw.index(b"data")
    junk = b"LIST" + struct.pack("<I", 6) + b"INFOab"
    spliced = raw[:fmt_end] + junk + raw[fmt_end:]
    rate, back = decode_wav(spliced)
    assert rate == 16000 and np.array_equal(back[:, 0], a)


def test_error_contracts():
    with pytest.raises(ValueError, match="not RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)
    a = np.ones(4, dtype=np.int16)
    raw = encode_wav(a, 8000)
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(raw[:-3])
    # non-PCM format tag refused
    bad = bytearray(raw)
    fmt_at = raw.index(b"fmt ") + 8
    bad[fmt_at : fmt_at + 2] = struct.pack("<H", 3)  # IEEE float tag
    with pytest.raises(ValueError, match="non-PCM"):
        decode_wav(bytes(bad))


def test_decoder_features():
    a = np.array([3, -4], dtype=np.int16)  # rms = sqrt((9+16)/2)
    d = wav_audio_decoder(encode_wav(a, 8000))
    assert d["sample_rate"] == 8000 and d["n_samples"] == 2
    assert d["rms"] == pytest.approx((25 / 2) ** 0.5)
