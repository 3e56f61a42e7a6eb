"""MP3 framing layer (levi_spark.operators.mp3): census round trips
across bitrate/padding/rate combinations, ID3v2 syncsafe sizing,
ID3v1 trailing tags, the Layer III frame-size formula, and strict
desync/reserved-field refusals."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from levi_spark.operators.mp3 import build_mp3, mp3_frame_census

FRAME = st.tuples(st.integers(1, 14), st.integers(0, 1))


@settings(max_examples=30, deadline=None)
@given(frames=st.lists(FRAME, min_size=1, max_size=12),
       ri=st.integers(0, 2), tag=st.booleans(), v1=st.booleans())
def test_census_round_trip_law(frames, ri, tag, v1):
    payload = build_mp3(frames, rate_index=ri,
                        id3v2_payload=b"x" * 37 if tag else b"",
                        id3v1=v1)
    c = mp3_frame_census(payload)
    assert c["n_frames"] == len(frames)
    assert c["n_samples"] == 1152 * len(frames)
    assert c["n_padded"] == sum(p for _, p in frames)
    assert c["is_vbr"] == (1 if len({b for b, _ in frames}) > 1 else 0)
    assert c["sample_rate"] == [44100, 48000, 32000][ri]
    assert c["id3v2_bytes"] == (47 if tag else 0)
    assert c["id3v1_bytes"] == (128 if v1 else 0)
    assert c["audio_bytes"] + c["id3v2_bytes"] + c["id3v1_bytes"] == len(payload)


def test_frame_size_formula_pins():
    """The published Layer III sizes: 128 kbit/s at 44100 Hz is 417
    bytes unpadded / 418 padded; 320 at 48000 is 960."""
    c = mp3_frame_census(build_mp3([(9, 0)]))  # 128 kbps @ 44100
    assert c["audio_bytes"] == 417
    c = mp3_frame_census(build_mp3([(9, 1)]))
    assert c["audio_bytes"] == 418
    c = mp3_frame_census(build_mp3([(14, 0)], rate_index=1))  # 320 @ 48k
    assert c["audio_bytes"] == 960


def test_id3v2_syncsafe_size():
    """A 200-byte tag payload crosses the 7-bit boundary: syncsafe
    encoding must carry it as 0x00 0x00 0x01 0x48."""
    payload = build_mp3([(5, 0)], id3v2_payload=b"t" * 200)
    assert payload[6:10] == bytes([0, 0, 1, 72])
    assert mp3_frame_census(payload)["id3v2_bytes"] == 210


def test_strict_refusals():
    good = build_mp3([(5, 0), (7, 1)])
    with pytest.raises(ValueError, match="lost sync"):
        mp3_frame_census(b"\x00" + good)
    with pytest.raises(ValueError, match="stray bytes"):
        mp3_frame_census(good + b"\xaa\xbb")
    with pytest.raises(ValueError, match="claims"):
        mp3_frame_census(good[:-10])
    hdr = bytearray(good)
    hdr[2] = (hdr[2] & 0x0F) | 0xF0  # bitrate index 15
    with pytest.raises(ValueError, match="invalid bitrate index"):
        mp3_frame_census(bytes(hdr))
    layer2 = bytearray(good)
    layer2[1] = (layer2[1] & ~0b110) | 0b100  # Layer II bits
    with pytest.raises(NotImplementedError, match="Layer III"):
        mp3_frame_census(bytes(layer2))
    mixed = build_mp3([(5, 0)]) + build_mp3([(5, 0)], rate_index=1)
    with pytest.raises(ValueError, match="sample rate changes"):
        mp3_frame_census(mixed)
    with pytest.raises(NotImplementedError, match="free-format"):
        free = bytearray(build_mp3([(1, 0)]))
        free[2] = free[2] & 0x0F  # bitrate index 0
        mp3_frame_census(bytes(free))
    with pytest.raises(ValueError, match="no MP3 frames"):
        mp3_frame_census(build_mp3([(5, 0)], id3v2_payload=b"x")[:11])


def test_header_bit_layout():
    """Hand-check the 32-bit header of a 160 kbit/s padded mono-ish
    frame at 32 kHz: sync/version/layer/protection/bitrate/rate/pad."""
    payload = build_mp3([(10, 1)], rate_index=2)
    (hdr,) = struct.unpack_from(">I", payload, 0)
    assert hdr >> 21 == 0x7FF
    assert (hdr >> 19) & 3 == 0b11  # MPEG-1
    assert (hdr >> 17) & 3 == 0b01  # Layer III
    assert (hdr >> 16) & 1 == 1  # no CRC
    assert (hdr >> 12) & 0xF == 10
    assert (hdr >> 10) & 3 == 2
    assert (hdr >> 9) & 1 == 1
