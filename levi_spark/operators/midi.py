"""Standard MIDI File (SMF) parsing — pure stdlib.

MIDI files are the symbolic-music corpus format (every public piano /
score dataset ships as ``.mid``), and parsing one exercises two
classic binary-format mechanisms a from-scratch engine should own:
**variable-length quantities** (big-endian 7-bit groups, MSB
continuation — the opposite bit order of protobuf varints, which
:mod:`levi_spark.operators.tfrecord` already decodes) and **running
status** (a channel event may omit its status byte, inheriting the
previous one — a parser that misses this desyncs immediately).

Layout per the SMF spec (MMA RP-001, public):

* ``MThd`` chunk: format (0|1|2), ntrks, division (ticks/quarter;
  SMPTE division — top bit set — is refused).
* ``MTrk`` chunks: a stream of ``<delta-time varint> <event>`` where
  event is a channel message (note-off ``0x8n``, note-on ``0x9n``
  — velocity 0 counts as a note-off per convention — polyphonic
  pressure ``0xAn``, control ``0xBn``, program ``0xCn`` (1 data
  byte), channel pressure ``0xDn`` (1), pitch bend ``0xEn``), a meta
  event ``0xFF type <len varint> <data>`` (tempo ``0x51`` = 3-byte
  microseconds-per-quarter; end-of-track ``0x2F`` must terminate
  every track), or sysex ``0xF0/0xF7 <len varint> <data>``.

``build_midi`` emits format-0/1 files; ``midi_event_stats`` walks
strictly (bad magic, SMPTE division, missing end-of-track, a data
byte where a status byte is required with no running status, or
trailing bytes all raise) and reports note counts, pitch/velocity
sums, total ticks, tempo changes, and the tempo-map-integrated
duration in microseconds. The reference engine has no media surface.
"""

from __future__ import annotations

import struct


def _varint(value: int) -> bytes:
    if value < 0 or value >= 1 << 28:
        raise ValueError(f"SMF varint out of range: {value}")
    out = [value & 0x7F]
    value >>= 7
    while value:
        out.append(0x80 | (value & 0x7F))
        value >>= 7
    return bytes(reversed(out))


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    v = 0
    for _ in range(4):
        if pos >= len(buf):
            raise ValueError("SMF varint truncated")
        b = buf[pos]
        pos += 1
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            return v, pos
    raise ValueError("SMF varint longer than 4 bytes")


def build_midi(
    tracks: list[list[tuple]],
    division: int = 480,
    fmt: int | None = None,
    running_status: bool = True,
) -> bytes:
    """``tracks``: per track a list of events, each
    ``(delta, "on"|"off", channel, note, velocity)`` or
    ``(delta, "tempo", us_per_quarter)`` or
    ``(delta, "program", channel, prog)``. End-of-track is appended
    automatically. ``running_status`` omits repeated status bytes."""
    if not tracks:
        raise ValueError("SMF needs at least one track")
    if not 1 <= division <= 0x7FFF:
        raise ValueError(f"division {division} (SMPTE unsupported)")
    if fmt is None:
        fmt = 0 if len(tracks) == 1 else 1
    chunks = bytearray(
        b"MThd" + struct.pack(">IHHH", 6, fmt, len(tracks), division)
    )
    for evs in tracks:
        body = bytearray()
        last_status = None
        for ev in evs:
            body += _varint(ev[0])
            kind = ev[1]
            if kind in ("on", "off"):
                _, _, ch, note, vel = ev
                status = (0x90 if kind == "on" else 0x80) | (ch & 0xF)
                if not (running_status and status == last_status):
                    body.append(status)
                last_status = status
                body += bytes((note & 0x7F, vel & 0x7F))
            elif kind == "program":
                _, _, ch, prog = ev
                status = 0xC0 | (ch & 0xF)
                if not (running_status and status == last_status):
                    body.append(status)
                last_status = status
                body.append(prog & 0x7F)
            elif kind == "tempo":
                body += b"\xff\x51\x03" + ev[2].to_bytes(3, "big")
                last_status = None  # meta events cancel running status
            else:
                raise ValueError(f"unknown event kind {kind!r}")
        body += b"\x00\xff\x2f\x00"  # end of track
        chunks += b"MTrk" + struct.pack(">I", len(body)) + bytes(body)
    return bytes(chunks)


_DATA_LEN = {0x8: 2, 0x9: 2, 0xA: 2, 0xB: 2, 0xC: 1, 0xD: 1, 0xE: 2}


def midi_event_stats(payload: bytes) -> dict:
    """Strict SMF walk -> ``{fmt, n_tracks, division, n_notes,
    sum_pitch, sum_velocity, max_tick, n_tempo_changes,
    duration_us}``. Duration integrates the tempo map over the
    longest track's tick span (default 500000 us/quarter before the
    first tempo event, per the spec)."""
    if payload[:4] != b"MThd":
        raise ValueError(f"not SMF (starts {payload[:4]!r})")
    hlen, fmt, ntrks, division = struct.unpack_from(">IHHH", payload, 4)
    if hlen != 6:
        raise ValueError(f"MThd length {hlen}")
    if fmt not in (0, 1, 2):
        raise ValueError(f"SMF format {fmt}")
    if division & 0x8000:
        raise NotImplementedError("SMPTE division unsupported")
    if fmt == 0 and ntrks != 1:
        raise ValueError(f"format 0 with {ntrks} tracks")
    pos = 8 + hlen  # 14: MThd payload is exactly 6 bytes (checked)
    n_notes = sum_pitch = sum_vel = 0
    max_tick = 0
    tempos: list[tuple[int, int]] = []  # (tick, us_per_quarter)
    for _ in range(ntrks):
        if payload[pos : pos + 4] != b"MTrk":
            raise ValueError(f"MTrk expected at byte {pos}")
        (tlen,) = struct.unpack_from(">I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + tlen]
        if len(body) != tlen:
            raise ValueError("MTrk truncated")
        pos += 8 + tlen
        tick = 0
        p = 0
        status = None
        ended = False
        while p < len(body):
            if ended:
                raise ValueError("events after end-of-track")
            delta, p = _read_varint(body, p)
            tick += delta
            b0 = body[p]
            if b0 == 0xFF:
                mtype = body[p + 1]
                mlen, p2 = _read_varint(body, p + 2)
                data = body[p2 : p2 + mlen]
                if len(data) != mlen:
                    raise ValueError("meta event truncated")
                p = p2 + mlen
                status = None
                if mtype == 0x2F:
                    ended = True
                elif mtype == 0x51:
                    if mlen != 3:
                        raise ValueError(f"tempo meta length {mlen}")
                    tempos.append((tick, int.from_bytes(data, "big")))
            elif b0 in (0xF0, 0xF7):
                mlen, p2 = _read_varint(body, p + 1)
                p = p2 + mlen
                status = None
            else:
                if b0 & 0x80:
                    status = b0
                    p += 1
                elif status is None:
                    raise ValueError(
                        f"data byte {b0:#x} with no running status"
                    )
                kind = status >> 4
                nd = _DATA_LEN.get(kind)
                if nd is None:
                    raise ValueError(f"status byte {status:#x}")
                data = body[p : p + nd]
                if len(data) != nd:
                    raise ValueError("channel event truncated")
                p += nd
                if kind == 0x9 and data[1] > 0:
                    n_notes += 1
                    sum_pitch += data[0]
                    sum_vel += data[1]
        if not ended:
            raise ValueError("track missing end-of-track meta")
        max_tick = max(max_tick, tick)
    if pos != len(payload):
        raise ValueError(f"{len(payload) - pos} bytes after last track")
    # integrate the tempo map (format-1 tempo lives in track 0; the
    # collected list is tick-sorted within a track and format-0/1
    # fixtures keep all tempo events in one track)
    tempos.sort()
    dur = 0
    cur = 500_000
    prev_tick = 0
    for t_tick, t_us in tempos:
        seg = min(t_tick, max_tick) - prev_tick
        if seg > 0:
            dur += seg * cur
            prev_tick = min(t_tick, max_tick)
        cur = t_us
    dur += (max_tick - prev_tick) * cur
    return {
        "fmt": fmt,
        "n_tracks": ntrks,
        "division": division,
        "n_notes": n_notes,
        "sum_pitch": sum_pitch,
        "sum_velocity": sum_vel,
        "max_tick": max_tick,
        "n_tempo_changes": len(tempos),
        "duration_us": dur // division,
    }
