"""AVI (RIFF) video container with MJPEG frames — pure stdlib + numpy.
Closes the VIDEO seam (`levi_spark.operators.multimodal` kept video
behind a NotImplementedError because ffmpeg is unavailable): Motion
JPEG in an AVI container is real video — a RIFF multiplex of
independently-coded JPEG frames — and every byte of it is decodable
with the stdlib plus the engine's own T.81 JPEG codec
(:mod:`levi_spark.operators.jpeg`), no native media libs.

Supported profile (decode, strict — malformed containers raise):
'RIFF..AVI ' top level, LIST/hdrl with the 56-byte 'avih' main
header, one video stream (LIST/strl with 56-byte 'strh' fccType
'vids' handler 'MJPG'/'mjpg' and a 40-byte BITMAPINFOHEADER 'strf'),
LIST/movi with word-aligned '00dc' compressed-frame chunks, and the
'idx1' index, which is cross-checked entry-by-entry against the movi
chunks actually present (ckid, flags, offset, size). Frame payloads
decode through :func:`levi_spark.operators.jpeg.decode_jpeg`, so the
whole baseline/progressive/4:2:0/restart-interval JPEG surface is
reachable inside a video container. Audio streams ('auds') and
non-MJPEG video handlers are refused loudly rather than misread.

Encode (for fixtures and tests): a spec-shaped writer — avih/strh
rate:scale timing, BITMAPINFOHEADER with biCompression 'MJPG',
keyframe-flagged idx1 (every MJPEG frame is a keyframe) — so decoders
here and elsewhere see a normal MJPEG AVI.

The reference engine has no media surface (its scope is
`levi/__init__.py`); this module is north-star extension surface for
multimodal training-data pipelines.
"""

from __future__ import annotations

import struct

import numpy as np

from levi_spark.operators.jpeg import decode_jpeg, encode_jpeg

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _riff_list(list_type: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", list_type + data)


def encode_avi_mjpeg(
    frames_jpeg: list[bytes],
    width: int,
    height: int,
    fps: int = 25,
) -> bytes:
    """Wrap already-encoded JPEG frames into an MJPEG AVI container.

    Timing is expressed both ways real muxers do: ``avih``
    dwMicroSecPerFrame = 1e6 // fps and ``strh`` dwRate/dwScale =
    fps/1, with dwTotalFrames == stream dwLength == len(frames).
    """
    if not frames_jpeg:
        raise ValueError("MJPEG AVI needs at least one frame")
    n = len(frames_jpeg)
    maxsz = max(len(f) for f in frames_jpeg)
    usec = 1_000_000 // int(fps)

    avih = struct.pack(
        "<14I",
        usec,  # dwMicroSecPerFrame
        maxsz * int(fps),  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        _AVIF_HASINDEX,  # dwFlags
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        maxsz,  # dwSuggestedBufferSize
        width,
        height,
        0,
        0,
        0,
        0,  # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids",
        b"MJPG",
        0,  # dwFlags
        0,  # wPriority
        0,  # wLanguage
        0,  # dwInitialFrames
        1,  # dwScale
        int(fps),  # dwRate
        0,  # dwStart
        n,  # dwLength (frames)
        maxsz,  # dwSuggestedBufferSize
        0xFFFFFFFF,  # dwQuality (default)
        0,  # dwSampleSize (0: varying)
        0,
        0,
        width,
        height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage
        0,
        0,
        0,
        0,
    )
    hdrl = _riff_list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _riff_list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_chunks = b""
    idx_entries = []
    offset = 4  # idx1 offsets are relative to the 'movi' fourcc
    for f in frames_jpeg:
        ck = _chunk(b"00dc", f)
        idx_entries.append(
            struct.pack("<4sIII", b"00dc", _AVIIF_KEYFRAME, offset, len(f))
        )
        movi_chunks += ck
        offset += len(ck)
    movi = _riff_list(b"movi", movi_chunks)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, list_type_or_None, payload_start, payload_size)
    for each chunk in data[pos:end]; word-aligned advance."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        start = pos + 8
        if start + size > end:
            raise ValueError(
                f"AVI chunk {fourcc!r} overruns container "
                f"({start + size} > {end})"
            )
        if fourcc == b"LIST":
            yield fourcc, data[start : start + 4], start + 4, size - 4
        else:
            yield fourcc, None, start, size
        pos = start + size + (size & 1)


def decode_avi_mjpeg(payload: bytes) -> dict:
    """Parse + fully validate an MJPEG AVI and decode every frame.

    Returns ``{"width", "height", "n_frames", "usec_per_frame",
    "fps_rate", "fps_scale", "frames": [np.ndarray]}``. Raises
    ``ValueError`` on structural damage (bad magic, overrun chunks,
    header/stream disagreement, index mismatch) and
    ``NotImplementedError`` for non-MJPEG video or audio streams.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not a RIFF file")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 > len(payload):
        raise ValueError("RIFF size overruns payload")
    if payload[8:12] != b"AVI ":
        raise ValueError(f"not an AVI RIFF (form {payload[8:12]!r})")

    avih = strh = strf = None
    frame_chunks: list[tuple[int, int]] = []  # (offset-from-movi-tag, size)
    frames_data: list[bytes] = []
    idx1 = None

    for fourcc, ltype, start, size in _walk(payload, 12, 8 + riff_size):
        if fourcc == b"LIST" and ltype == b"hdrl":
            for c2, l2, s2, z2 in _walk(payload, start, start + size):
                if c2 == b"avih":
                    avih = payload[s2 : s2 + z2]
                elif c2 == b"LIST" and l2 == b"strl":
                    for c3, _l3, s3, z3 in _walk(payload, s2, s2 + z2):
                        if c3 == b"strh":
                            if strh is not None:
                                raise NotImplementedError(
                                    "multi-stream AVI unsupported"
                                )
                            strh = payload[s3 : s3 + z3]
                        elif c3 == b"strf":
                            strf = payload[s3 : s3 + z3]
        elif fourcc == b"LIST" and ltype == b"movi":
            # idx1 offsets are relative to the 'movi' fourcc, which
            # sits 4 bytes before the list payload.
            movi_tag = start - 4
            for c2, _l2, s2, z2 in _walk(payload, start, start + size):
                if c2 == b"00dc":
                    frame_chunks.append((s2 - 8 - movi_tag, z2))
                    frames_data.append(payload[s2 : s2 + z2])
                elif c2[2:4] in (b"wb", b"db", b"dc"):
                    raise NotImplementedError(
                        f"stream chunk {c2!r} unsupported (MJPEG video only)"
                    )
        elif fourcc == b"idx1":
            idx1 = payload[start : start + size]

    if avih is None or len(avih) != 56:
        raise ValueError("missing or short avih header")
    if strh is None or len(strh) != 56:
        raise ValueError("missing or short strh header")
    if strf is None or len(strf) < 40:
        raise ValueError("missing or short strf (BITMAPINFOHEADER)")

    (
        usec,
        _maxbps,
        _pad,
        flags,
        total_frames,
        _init,
        n_streams,
        _sugg,
        width,
        height,
    ) = struct.unpack_from("<10I", avih)
    if n_streams != 1:
        raise NotImplementedError(f"{n_streams}-stream AVI unsupported")

    fcc_type, handler = struct.unpack_from("<4s4s", strh)
    if fcc_type != b"vids":
        raise NotImplementedError(f"stream type {fcc_type!r} unsupported")
    if handler not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(f"video handler {handler!r} unsupported")
    scale, rate, _start, length = struct.unpack_from("<IIII", strh, 20)
    if scale == 0:
        raise ValueError("strh dwScale must be nonzero")

    bi_size, bi_w, bi_h = struct.unpack_from("<Iii", strf)
    compression = strf[16:20]
    if compression not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"strf biCompression {compression!r} unsupported"
        )
    if (bi_w, abs(bi_h)) != (width, height):
        raise ValueError(
            f"strf {bi_w}x{abs(bi_h)} disagrees with avih {width}x{height}"
        )

    if total_frames != len(frames_data) or length != len(frames_data):
        raise ValueError(
            f"frame count mismatch: avih {total_frames}, strh {length}, "
            f"movi {len(frames_data)}"
        )

    if flags & _AVIF_HASINDEX:
        if idx1 is None:
            raise ValueError("AVIF_HASINDEX set but no idx1 chunk")
        if len(idx1) != 16 * len(frame_chunks):
            raise ValueError(
                f"idx1 has {len(idx1) // 16} entries for "
                f"{len(frame_chunks)} movi chunks"
            )
        for i, (off, sz) in enumerate(frame_chunks):
            ckid, _f, ioff, isz = struct.unpack_from("<4sIII", idx1, 16 * i)
            if ckid != b"00dc" or ioff != off or isz != sz:
                raise ValueError(
                    f"idx1 entry {i} ({ckid!r}@{ioff}+{isz}) disagrees "
                    f"with movi chunk @{off}+{sz}"
                )

    frames = []
    for data in frames_data:
        a = decode_jpeg(data)
        h, w = a.shape[:2]
        if (w, h) != (width, height):
            raise ValueError(
                f"frame {len(frames)} is {w}x{h}, container says "
                f"{width}x{height}"
            )
        frames.append(a)
    return {
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "usec_per_frame": usec,
        "fps_rate": rate,
        "fps_scale": scale,
        "frames": frames,
    }


def encode_avi_frames(
    frames: list[np.ndarray], fps: int = 25, **jpeg_kwargs
) -> bytes:
    """Convenience: JPEG-encode raw rasters and mux them."""
    if not frames:
        raise ValueError("MJPEG AVI needs at least one frame")
    h, w = frames[0].shape[:2]
    return encode_avi_mjpeg(
        [encode_jpeg(f, **jpeg_kwargs) for f in frames], w, h, fps=fps
    )


def avi_frame_features(payload: bytes) -> list[dict]:
    """Per-frame features for the multimodal plane (one dict per
    frame): frame index, container frame count and timing, and the
    decoded frame's mean pixel + mean absolute deviation."""
    d = decode_avi_mjpeg(payload)
    out = []
    for i, f in enumerate(d["frames"]):
        px = f.astype(np.float64)
        mean = float(px.mean())
        out.append(
            {
                "frame_idx": i,
                "n_frames": d["n_frames"],
                "width": d["width"],
                "height": d["height"],
                "usec_per_frame": d["usec_per_frame"],
                "mean_pixel": mean,
                "mean_abs_dev": float(np.abs(px - mean).mean()),
            }
        )
    return out
