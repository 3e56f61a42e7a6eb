"""MP3 (MPEG-1 Audio Layer III) *framing* layer — pure stdlib.

The honest slice of MP3 an ingestion pipeline needs without touching
the refused decode seam (:mod:`levi_spark.operators.multimodal`
refuses MP3/AAC/Opus *audio decode*; see
:mod:`levi_spark.operators.mpeg1` for why): walking the container to
index it. A crawl that stores audio shards must know, per blob, frame
count, duration, bitrate profile (CBR vs VBR), and where the audio
actually starts/ends — all derivable from the ISO/IEC 11172-3 frame
headers alone:

* 32-bit header: 11-bit syncword (0x7FF), 2-bit version (MPEG-1 =
  0b11 here), 2-bit layer (Layer III = 0b01), protection bit, 4-bit
  bitrate index (Layer III table: 32..320 kbit/s; 0 = free format,
  refused; 15 invalid), 2-bit sample-rate index (44100/48000/32000),
  padding bit, private/mode/mode-ext/copyright/original/emphasis.
* Layer III MPEG-1 frame size = ``144 * bitrate / sample_rate +
  padding`` bytes — the formula the census lives or dies by: one
  wrong size desyncs every later frame.
* ID3v2 leading tag (``ID3`` + version + flags + 28-bit SYNCSAFE
  size) and ID3v1 trailing 128-byte ``TAG`` block are skipped, and
  their byte spans reported.

``build_mp3`` emits structurally valid files (headers + opaque
main-data padding) for round-trip testing; ``mp3_frame_census``
walks one strictly: every frame header must be in-sync,
same-version/layer/sample-rate as the first, with a legal bitrate
index, and frames must exactly tile the span between the tags —
trailing garbage raises. The reference engine has no media surface.
"""

from __future__ import annotations

import struct

# Layer III, MPEG-1 bitrates (kbit/s); index 0 = free format, 15 invalid
_BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
             192, 224, 256, 320]
_RATES = [44100, 48000, 32000]  # index 3 reserved
_SAMPLES_PER_FRAME = 1152


def _frame_size(bitrate_kbps: int, rate: int, padding: int) -> int:
    return 144 * bitrate_kbps * 1000 // rate + padding


def build_mp3(
    frames: list[tuple[int, int]],
    rate_index: int = 0,
    id3v2_payload: bytes = b"",
    id3v1: bool = False,
) -> bytes:
    """``frames`` is a list of (bitrate_index 1..14, padding 0|1);
    emits an ID3v2 tag (when payload given), the frames (header +
    0xAA main-data fill), and optionally a trailing ID3v1 block."""
    if not 0 <= rate_index <= 2:
        raise ValueError(f"sample-rate index {rate_index}")
    out = bytearray()
    if id3v2_payload:
        n = len(id3v2_payload)
        if n >= 1 << 28:
            raise ValueError("ID3v2 tag too large for syncsafe size")
        size = bytes(
            [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + size + id3v2_payload
    rate = _RATES[rate_index]
    for bi, pad in frames:
        if not 1 <= bi <= 14:
            raise ValueError(f"bitrate index {bi} (1..14)")
        hdr = (
            (0x7FF << 21)
            | (0b11 << 19)  # MPEG-1
            | (0b01 << 17)  # Layer III
            | (1 << 16)  # no CRC
            | (bi << 12)
            | (rate_index << 10)
            | ((pad & 1) << 9)
        )
        frame = bytearray(struct.pack(">I", hdr))
        frame += b"\xaa" * (_frame_size(_BITRATES[bi], rate, pad) - 4)
        out += frame
    if id3v1:
        out += b"TAG" + b"\x00" * 125
    return bytes(out)


def mp3_frame_census(payload: bytes) -> dict:
    """Strict frame walk -> ``{n_frames, n_samples, sum_bitrate_kbps,
    n_padded, is_vbr, sample_rate, audio_bytes, id3v2_bytes,
    id3v1_bytes}``. Raises on desync, reserved indices, mixed
    version/layer/rate, or bytes that tile into no frame."""
    pos = 0
    id3v2 = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("ID3v2 header truncated")
        s = payload[6:10]
        if any(b & 0x80 for b in s):
            raise ValueError("ID3v2 size bytes not syncsafe")
        id3v2 = 10 + ((s[0] << 21) | (s[1] << 14) | (s[2] << 7) | s[3])
        pos = id3v2
    end = len(payload)
    id3v1 = 0
    if end - pos >= 128 and payload[end - 128 : end - 125] == b"TAG":
        id3v1 = 128
        end -= 128
    n = padded = kbps_sum = 0
    rates = set()
    brs = set()
    while pos < end:
        if end - pos < 4:
            raise ValueError(f"{end - pos} stray bytes after last frame")
        (hdr,) = struct.unpack_from(">I", payload, pos)
        if (hdr >> 21) != 0x7FF:
            raise ValueError(f"lost sync at byte {pos}: {hdr:#010x}")
        version = (hdr >> 19) & 3
        layer = (hdr >> 17) & 3
        if version != 0b11 or layer != 0b01:
            raise NotImplementedError(
                f"version bits {version:#b} / layer bits {layer:#b}: "
                "only MPEG-1 Layer III framing is supported"
            )
        bi = (hdr >> 12) & 0xF
        if bi == 0:
            raise NotImplementedError("free-format bitrate (index 0)")
        if bi == 15:
            raise ValueError(f"invalid bitrate index 15 at byte {pos}")
        ri = (hdr >> 10) & 3
        if ri == 3:
            raise ValueError(f"reserved sample-rate index at byte {pos}")
        pad = (hdr >> 9) & 1
        rates.add(_RATES[ri])
        if len(rates) > 1:
            raise ValueError(f"sample rate changes mid-stream at byte {pos}")
        fs = _frame_size(_BITRATES[bi], _RATES[ri], pad)
        if pos + fs > end:
            raise ValueError(
                f"frame at byte {pos} claims {fs} bytes, {end - pos} left"
            )
        n += 1
        padded += pad
        kbps_sum += _BITRATES[bi]
        brs.add(bi)
        pos += fs
    if n == 0:
        raise ValueError("no MP3 frames")
    return {
        "n_frames": n,
        "n_samples": n * _SAMPLES_PER_FRAME,
        "sum_bitrate_kbps": kbps_sum,
        "n_padded": padded,
        "is_vbr": 1 if len(brs) > 1 else 0,
        "sample_rate": rates.pop(),
        "audio_bytes": end - id3v2,
        "id3v2_bytes": id3v2,
        "id3v1_bytes": id3v1,
    }
