"""MessagePack codec — pure stdlib.

The compact binary JSON used by RPC layers, Redis streams, Fluentd
log shipping and ML metadata sidecars — a log-ingestion pipeline
meets ``.msgpack`` framing constantly. Implemented from the public
format spec (msgpack.org): the full type-byte map —

* positive fixint ``0x00-0x7f``, negative fixint ``0xe0-0xff``,
* fixmap ``0x80-0x8f``, fixarray ``0x90-0x9f``, fixstr ``0xa0-0xbf``,
* nil ``0xc0``, false ``0xc2``, true ``0xc3``,
* bin 8/16/32 ``0xc4-0xc6``, float32/64 ``0xca/0xcb``,
* uint 8/16/32/64 ``0xcc-0xcf``, int 8/16/32/64 ``0xd0-0xd3``,
* str 8/16/32 ``0xd9-0xdb``, array 16/32 ``0xdc/0xdd``,
* map 16/32 ``0xde/0xdf``

(ext types ``0xc7-0xc9``/``0xd4-0xd8`` refuse — no application types
here; ``0xc1`` is never-used per spec and refuses). The encoder is
CANONICAL: smallest representation wins (ints pick the narrowest
format, str/bin/containers the shortest length header), map keys keep
caller order. Strict decode: truncation, trailing bytes, and invalid
bytes raise. North-star ingestion surface beside
:mod:`levi_spark.operators.avro`.
"""

from __future__ import annotations

import struct


def encode_msgpack(obj) -> bytes:
    out = bytearray()
    _enc(out, obj)
    return bytes(out)


def _enc(out: bytearray, o) -> None:
    if o is None:
        out.append(0xC0)
    elif o is True:
        out.append(0xC3)
    elif o is False:
        out.append(0xC2)
    elif isinstance(o, int):
        if 0 <= o <= 0x7F:
            out.append(o)
        elif -32 <= o < 0:
            out.append(o & 0xFF)
        elif 0 < o:
            for fmt, code, hi in (
                ("B", 0xCC, 1 << 8),
                ("H", 0xCD, 1 << 16),
                ("I", 0xCE, 1 << 32),
                ("Q", 0xCF, 1 << 64),
            ):
                if o < hi:
                    out.append(code)
                    out.extend(struct.pack(">" + fmt, o))
                    return
            raise ValueError(f"int {o} exceeds uint64")
        else:
            for fmt, code, lo in (
                ("b", 0xD0, -(1 << 7)),
                ("h", 0xD1, -(1 << 15)),
                ("i", 0xD2, -(1 << 31)),
                ("q", 0xD3, -(1 << 63)),
            ):
                if o >= lo:
                    out.append(code)
                    out.extend(struct.pack(">" + fmt, o))
                    return
            raise ValueError(f"int {o} below int64")
    elif isinstance(o, float):
        out.append(0xCB)
        out.extend(struct.pack(">d", o))
    elif isinstance(o, str):
        b = o.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n < 1 << 8:
            out.extend((0xD9, n))
        elif n < 1 << 16:
            out.append(0xDA)
            out.extend(struct.pack(">H", n))
        else:
            out.append(0xDB)
            out.extend(struct.pack(">I", n))
        out.extend(b)
    elif isinstance(o, (bytes, bytearray)):
        n = len(o)
        if n < 1 << 8:
            out.extend((0xC4, n))
        elif n < 1 << 16:
            out.append(0xC5)
            out.extend(struct.pack(">H", n))
        else:
            out.append(0xC6)
            out.extend(struct.pack(">I", n))
        out.extend(o)
    elif isinstance(o, (list, tuple)):
        n = len(o)
        if n <= 15:
            out.append(0x90 | n)
        elif n < 1 << 16:
            out.append(0xDC)
            out.extend(struct.pack(">H", n))
        else:
            out.append(0xDD)
            out.extend(struct.pack(">I", n))
        for v in o:
            _enc(out, v)
    elif isinstance(o, dict):
        n = len(o)
        if n <= 15:
            out.append(0x80 | n)
        elif n < 1 << 16:
            out.append(0xDE)
            out.extend(struct.pack(">H", n))
        else:
            out.append(0xDF)
            out.extend(struct.pack(">I", n))
        for k, v in o.items():
            _enc(out, k)
            _enc(out, v)
    else:
        raise ValueError(f"type {type(o).__name__} not encodable")


def decode_msgpack(payload: bytes):
    """One MessagePack value; trailing bytes refuse."""
    v, i = _dec(payload, 0)
    if i != len(payload):
        raise ValueError(f"{len(payload) - i} bytes after MessagePack value")
    return v


def _need(payload: bytes, i: int, n: int) -> None:
    if i + n > len(payload):
        raise ValueError(f"MessagePack truncated at {i} (need {n} bytes)")


def _dec(payload: bytes, i: int):
    _need(payload, i, 1)
    b = payload[i]
    i += 1
    if b <= 0x7F:
        return b, i
    if b >= 0xE0:
        return b - 256, i
    if 0x80 <= b <= 0x8F:
        return _dec_map(payload, i, b & 0x0F)
    if 0x90 <= b <= 0x9F:
        return _dec_arr(payload, i, b & 0x0F)
    if 0xA0 <= b <= 0xBF:
        return _dec_str(payload, i, b & 0x1F)
    if b == 0xC0:
        return None, i
    if b == 0xC2:
        return False, i
    if b == 0xC3:
        return True, i
    if b in (0xC4, 0xC5, 0xC6):
        n, i = _dec_len(payload, i, 1 << (b - 0xC4))
        _need(payload, i, n)
        return bytes(payload[i : i + n]), i + n
    if b == 0xCA:
        _need(payload, i, 4)
        return struct.unpack_from(">f", payload, i)[0], i + 4
    if b == 0xCB:
        _need(payload, i, 8)
        return struct.unpack_from(">d", payload, i)[0], i + 8
    if b in (0xCC, 0xCD, 0xCE, 0xCF):
        n = 1 << (b - 0xCC)
        _need(payload, i, n)
        return int.from_bytes(payload[i : i + n], "big"), i + n
    if b in (0xD0, 0xD1, 0xD2, 0xD3):
        n = 1 << (b - 0xD0)
        _need(payload, i, n)
        return int.from_bytes(payload[i : i + n], "big", signed=True), i + n
    if b in (0xD9, 0xDA, 0xDB):
        n, i = _dec_len(payload, i, 1 << (b - 0xD9))
        return _dec_str(payload, i, n)
    if b == 0xDC:
        n, i = _dec_len(payload, i, 2)
        return _dec_arr(payload, i, n)
    if b == 0xDD:
        n, i = _dec_len(payload, i, 4)
        return _dec_arr(payload, i, n)
    if b == 0xDE:
        n, i = _dec_len(payload, i, 2)
        return _dec_map(payload, i, n)
    if b == 0xDF:
        n, i = _dec_len(payload, i, 4)
        return _dec_map(payload, i, n)
    raise ValueError(f"MessagePack byte 0x{b:02x} unsupported (ext/0xc1)")


def _dec_len(payload: bytes, i: int, width: int) -> tuple[int, int]:
    _need(payload, i, width)
    return int.from_bytes(payload[i : i + width], "big"), i + width


def _dec_str(payload: bytes, i: int, n: int):
    _need(payload, i, n)
    return payload[i : i + n].decode("utf-8"), i + n


def _dec_arr(payload: bytes, i: int, n: int):
    out = []
    for _ in range(n):
        v, i = _dec(payload, i)
        out.append(v)
    return out, i


def _dec_map(payload: bytes, i: int, n: int):
    out = {}
    for _ in range(n):
        k, i = _dec(payload, i)
        if not isinstance(k, (str, int, bytes)):
            raise ValueError(f"map key type {type(k).__name__} unsupported")
        v, i = _dec(payload, i)
        out[k] = v
    return out, i
