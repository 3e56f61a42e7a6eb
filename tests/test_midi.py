"""SMF parsing (levi_spark.operators.midi): varint laws, running
status, tempo-map duration integration, note-on-velocity-0
convention, format 0/1, and strict refusals."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from levi_spark.operators.midi import (
    _read_varint,
    _varint,
    build_midi,
    midi_event_stats,
)


@settings(max_examples=50, deadline=None)
@given(v=st.integers(0, (1 << 28) - 1))
def test_varint_round_trip_law(v):
    buf = _varint(v)
    got, pos = _read_varint(buf, 0)
    assert got == v and pos == len(buf)
    assert len(buf) == max(1, (v.bit_length() + 6) // 7)


def test_varint_pins():
    """Spec examples: 0x00->00, 0x40->40, 0x7F->7F, 0x80->81 00,
    0x2000->C0 00, 0x1FFFFF->FF FF 7F."""
    assert _varint(0x00) == b"\x00"
    assert _varint(0x40) == b"\x40"
    assert _varint(0x7F) == b"\x7f"
    assert _varint(0x80) == b"\x81\x00"
    assert _varint(0x2000) == b"\xc0\x00"
    assert _varint(0x1FFFFF) == b"\xff\xff\x7f"


@settings(max_examples=25, deadline=None)
@given(
    notes=st.lists(
        st.tuples(st.integers(0, 400), st.integers(0, 127),
                  st.integers(1, 127), st.integers(0, 15)),
        min_size=1, max_size=30,
    ),
    rs=st.booleans(),
)
def test_note_census_law(notes, rs):
    """n_notes / pitch / velocity sums survive build->parse with and
    without running status (the wire differs, the census must not)."""
    evs = []
    for d, note, vel, ch in notes:
        evs.append((d, "on", ch, note, vel))
        evs.append((10, "off", ch, note, 0))
    c = midi_event_stats(build_midi([evs], running_status=rs))
    assert c["n_notes"] == len(notes)
    assert c["sum_pitch"] == sum(n for _, n, _, _ in notes)
    assert c["sum_velocity"] == sum(v for _, _, v, _ in notes)
    assert c["max_tick"] == sum(d for d, _, _, _ in notes) + 10 * len(notes)


def test_running_status_actually_shrinks_the_file():
    evs = [(0, "on", 0, 60 + i, 64) for i in range(20)]
    with_rs = build_midi([evs], running_status=True)
    without = build_midi([evs], running_status=False)
    assert len(with_rs) == len(without) - 19
    assert midi_event_stats(with_rs) == midi_event_stats(without)


def test_note_on_velocity_zero_is_note_off():
    evs = [(0, "on", 0, 60, 100), (48, "on", 0, 60, 0)]
    c = midi_event_stats(build_midi([evs]))
    assert c["n_notes"] == 1


def test_tempo_map_duration():
    """480 ticks at default 500000 us/q, then tempo doubles to
    250000 for 480 more: duration = 480*500000/480 + 480*250000/480."""
    evs = [
        (0, "on", 0, 60, 80),
        (480, "tempo", 250_000),
        (480, "off", 0, 60, 0),
    ]
    c = midi_event_stats(build_midi([evs], division=480))
    assert c["max_tick"] == 960
    assert c["n_tempo_changes"] == 1
    assert c["duration_us"] == 500_000 + 250_000


def test_format1_multitrack():
    t0 = [(0, "tempo", 400_000)]
    t1 = [(0, "on", 0, 64, 90), (960, "off", 0, 64, 0)]
    t2 = [(0, "program", 3, 42), (240, "on", 3, 40, 70),
          (240, "off", 3, 40, 0)]
    c = midi_event_stats(build_midi([t0, t1, t2], division=240))
    assert c["fmt"] == 1 and c["n_tracks"] == 3
    assert c["n_notes"] == 2
    assert c["max_tick"] == 960
    # 960 ticks at 400000us/q over division 240 = 1.6s
    assert c["duration_us"] == 960 * 400_000 // 240


def test_strict_refusals():
    good = build_midi([[(0, "on", 0, 60, 64), (10, "off", 0, 60, 0)]])
    with pytest.raises(ValueError, match="not SMF"):
        midi_event_stats(b"RIFF" + good[4:])
    with pytest.raises(ValueError, match="after last track"):
        midi_event_stats(good + b"\x00")
    with pytest.raises(ValueError, match="MTrk truncated"):
        midi_event_stats(good[:-3])
    smpte = bytearray(good)
    struct.pack_into(">H", smpte, 12, 0x8000 | 0x7740)
    with pytest.raises(NotImplementedError, match="SMPTE"):
        midi_event_stats(bytes(smpte))
    # strip the end-of-track meta (last 4 bytes of track body) and
    # shrink the length header accordingly
    no_eot = bytearray(good)
    (tlen,) = struct.unpack_from(">I", no_eot, 18)
    struct.pack_into(">I", no_eot, 18, tlen - 4)
    del no_eot[-4:]
    with pytest.raises(ValueError, match="end-of-track"):
        midi_event_stats(bytes(no_eot))
    with pytest.raises(ValueError, match="no running status"):
        # delta 0 then a data byte with no prior status
        bad = (b"MThd" + struct.pack(">IHHH", 6, 0, 1, 480)
               + b"MTrk" + struct.pack(">I", 6)
               + b"\x00\x33\x44\x00\xff\x2f")
        midi_event_stats(bad)
