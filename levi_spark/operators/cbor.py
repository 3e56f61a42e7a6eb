"""CBOR codec (RFC 8949) — pure stdlib.

The IETF's binary JSON: COSE/WebAuthn payloads, CoAP telemetry, and
an increasing share of dataset metadata sidecars ship as CBOR. The
wire model is one initial byte = 3-bit MAJOR TYPE + 5-bit additional
info, then big-endian arguments:

* major 0/1: unsigned / negative integers (negative encodes
  ``-1 - n``, so ``-500`` carries ``n = 499``)
* major 2/3: byte / text strings (length argument)
* major 4/5: arrays / maps (count argument)
* major 6: semantic TAGS (tag 0/1 timestamps etc.) — refused here:
  application semantics, not data
* major 7: false ``0xf4``, true ``0xf5``, null ``0xf6``,
  float64 ``0xfb`` (float16 ``0xf9``/float32 ``0xfa`` refused on
  encode, decoded for float32; float16 needs no corpus here)

Additional info: 0-23 = immediate value, 24/25/26/27 = 1/2/4/8-byte
argument, 31 = indefinite length (decoded for strings/arrays/maps
with the ``0xff`` break, never encoded — RFC 8949 §4.2 forbids it in
deterministic encoding).

The encoder follows RFC 8949 §4.2.1 CORE DETERMINISTIC ENCODING:
shortest-form arguments always, definite lengths only. Strict
decode: truncation, trailing bytes, reserved additional-info values,
a break outside an indefinite item, and ill-formed nesting all
raise. North-star ingestion surface beside
:mod:`levi_spark.operators.msgpack` (same slot, opposite bit
conventions: CBOR is big-endian type-first where msgpack is
type-byte-mapped).
"""

from __future__ import annotations

import struct


def encode_cbor(obj) -> bytes:
    out = bytearray()
    _enc(out, obj)
    return bytes(out)


def _head(out: bytearray, major: int, n: int) -> None:
    if n < 24:
        out.append((major << 5) | n)
    elif n < 1 << 8:
        out.append((major << 5) | 24)
        out.append(n)
    elif n < 1 << 16:
        out.append((major << 5) | 25)
        out += struct.pack(">H", n)
    elif n < 1 << 32:
        out.append((major << 5) | 26)
        out += struct.pack(">I", n)
    elif n < 1 << 64:
        out.append((major << 5) | 27)
        out += struct.pack(">Q", n)
    else:
        raise ValueError(f"CBOR argument {n} exceeds 64 bits")


def _enc(out: bytearray, o) -> None:
    if o is None:
        out.append(0xF6)
    elif o is True:
        out.append(0xF5)
    elif o is False:
        out.append(0xF4)
    elif isinstance(o, int):
        if o >= 0:
            _head(out, 0, o)
        else:
            _head(out, 1, -1 - o)
    elif isinstance(o, float):
        out.append(0xFB)
        out += struct.pack(">d", o)
    elif isinstance(o, bytes):
        _head(out, 2, len(o))
        out += o
    elif isinstance(o, str):
        b = o.encode("utf-8")
        _head(out, 3, len(b))
        out += b
    elif isinstance(o, (list, tuple)):
        _head(out, 4, len(o))
        for v in o:
            _enc(out, v)
    elif isinstance(o, dict):
        _head(out, 5, len(o))
        for k, v in o.items():
            _enc(out, k)
            _enc(out, v)
    else:
        raise ValueError(f"CBOR cannot encode {type(o).__name__}")


def decode_cbor(payload: bytes):
    v, i = _dec(payload, 0)
    if i != len(payload):
        raise ValueError(f"{len(payload) - i} bytes after CBOR item")
    return v


def _need(payload: bytes, i: int, n: int) -> None:
    if i + n > len(payload):
        raise ValueError(f"CBOR truncated at byte {i} (need {n})")


def _arg(payload: bytes, i: int, info: int) -> tuple[int | None, int]:
    """additional-info -> (argument, next index); None = indefinite."""
    if info < 24:
        return info, i
    if info == 24:
        _need(payload, i, 1)
        return payload[i], i + 1
    if info == 25:
        _need(payload, i, 2)
        return struct.unpack_from(">H", payload, i)[0], i + 2
    if info == 26:
        _need(payload, i, 4)
        return struct.unpack_from(">I", payload, i)[0], i + 4
    if info == 27:
        _need(payload, i, 8)
        return struct.unpack_from(">Q", payload, i)[0], i + 8
    if info == 31:
        return None, i
    raise ValueError(f"CBOR reserved additional info {info}")


def _dec(payload: bytes, i: int):
    _need(payload, i, 1)
    b = payload[i]
    major, info = b >> 5, b & 0x1F
    i += 1
    if major == 7:
        if b == 0xF4:
            return False, i
        if b == 0xF5:
            return True, i
        if b == 0xF6 or b == 0xF7:  # null / undefined
            return None, i
        if b == 0xFA:
            _need(payload, i, 4)
            return struct.unpack_from(">f", payload, i)[0], i + 4
        if b == 0xFB:
            _need(payload, i, 8)
            return struct.unpack_from(">d", payload, i)[0], i + 8
        if b == 0xFF:
            raise ValueError(f"CBOR break (0xff) outside indefinite item "
                             f"at byte {i - 1}")
        if b == 0xF9:
            raise NotImplementedError("CBOR float16 unsupported")
        raise ValueError(f"CBOR simple value {info} unsupported")
    if major == 6:
        raise NotImplementedError(
            f"CBOR tag (major 6, byte {i - 1}): application semantics "
            "are out of scope"
        )
    n, i = _arg(payload, i, info)
    if major == 0:
        if n is None:
            raise ValueError("indefinite-length integer is ill-formed")
        return n, i
    if major == 1:
        if n is None:
            raise ValueError("indefinite-length integer is ill-formed")
        return -1 - n, i
    if major in (2, 3):
        if n is None:  # indefinite: definite chunks until break
            parts = []
            while True:
                _need(payload, i, 1)
                if payload[i] == 0xFF:
                    i += 1
                    break
                if payload[i] >> 5 != major or payload[i] & 0x1F == 31:
                    raise ValueError(
                        "indefinite string chunk of the wrong kind"
                    )
                v, i = _dec(payload, i)
                parts.append(v if major == 2 else v.encode("utf-8"))
            raw = b"".join(parts)
            return (raw, i) if major == 2 else (raw.decode("utf-8"), i)
        _need(payload, i, n)
        raw = payload[i : i + n]
        return (bytes(raw), i + n) if major == 2 else (
            raw.decode("utf-8"), i + n,
        )
    if major == 4:
        out = []
        if n is None:
            while True:
                _need(payload, i, 1)
                if payload[i] == 0xFF:
                    return out, i + 1
                v, i = _dec(payload, i)
                out.append(v)
        for _ in range(n):
            v, i = _dec(payload, i)
            out.append(v)
        return out, i
    # major 5: map
    out = {}
    if n is None:
        while True:
            _need(payload, i, 1)
            if payload[i] == 0xFF:
                return out, i + 1
            k, i = _dec(payload, i)
            v, i = _dec(payload, i)
            out[k] = v
    for _ in range(n):
        k, i = _dec(payload, i)
        v, i = _dec(payload, i)
        out[k] = v
    return out, i
