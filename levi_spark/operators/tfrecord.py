"""TFRecord + tf.Example codec — pure stdlib + numpy.

THE classic training-data shard format: a TFRecord file is a
sequence of length-framed records, each framed as::

    uint64 length (little-endian)
    uint32 masked_crc32c(length bytes)
    byte   data[length]
    uint32 masked_crc32c(data)

with CRC32C (Castagnoli, reflected polynomial 0x82F63B78) and the
published mask ``((crc >> 15) | (crc << 17)) + 0xa282ead8 (mod
2^32)``. Records here are tf.Example protobufs, decoded with a
minimal protobuf WIRE-FORMAT reader (varints, zigzag not needed for
these messages, length-delimited fields) over the public schema::

    Example  { Features features = 1; }
    Features { map<string, Feature> feature = 1; }   // entries: k=1 v=2
    Feature  { BytesList bytes_list = 1;             // value = 1
               FloatList float_list = 2;             // value = 1, packed
               Int64List int64_list = 3; }           // value = 1, packed

Strict: a flipped bit fails the CRC, truncated frames/varints raise,
unknown wire types raise, and both packed and unpacked list encodings
are accepted on decode (the encoder writes packed, the proto3 wire
default). North-star ingestion surface beside
:mod:`levi_spark.operators.warc`.
"""

from __future__ import annotations

import struct

import numpy as np

_MASK_DELTA = 0xA282EAD8

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ (0x82F63B78 if _c & 1 else 0)
    _CRC_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    """CRC32C (Castagnoli), reflected, init/xorout 0xFFFFFFFF."""
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFFFFFF


# ---------------------------------------------------------------- varint


def _write_varint(out: bytearray, v: int) -> None:
    if v < 0:
        v &= (1 << 64) - 1  # proto int64 negatives ride as 10-byte varints
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(data: bytes, i: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        if i >= len(data):
            raise ValueError("varint truncated")
        b = data[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            raise ValueError("varint longer than 10 bytes")
    if out >= 1 << 63:
        out -= 1 << 64  # int64 wraparound
    return out, i


# ------------------------------------------------------- proto wire layer


def _field(out: bytearray, number: int, wire: int) -> None:
    _write_varint(out, (number << 3) | wire)


def _len_field(out: bytearray, number: int, payload: bytes) -> None:
    _field(out, number, 2)
    _write_varint(out, len(payload))
    out.extend(payload)


def encode_example(features: dict) -> bytes:
    """{name: list[int] | list[float] | list[bytes]} -> tf.Example
    bytes. Int lists pack as varints, float lists as packed float32,
    bytes lists as repeated length-delimited values. Deterministic:
    features serialize in sorted-name order."""
    feats = bytearray()
    for name in sorted(features):
        vals = features[name]
        fb = bytearray()
        if not isinstance(vals, (list, tuple)):
            raise ValueError(f"feature {name!r}: values must be a list")
        if vals and isinstance(vals[0], (bytes, bytearray)):
            bl = bytearray()
            for v in vals:
                _len_field(bl, 1, bytes(v))
            _len_field(fb, 1, bytes(bl))  # Feature.bytes_list
        elif vals and isinstance(vals[0], float):
            packed = np.asarray(vals, dtype="<f4").tobytes()
            fl = bytearray()
            _field(fl, 1, 2)
            _write_varint(fl, len(packed))
            fl.extend(packed)
            _len_field(fb, 2, bytes(fl))  # Feature.float_list
        elif all(isinstance(v, int) for v in vals):
            il = bytearray()
            pk = bytearray()
            for v in vals:
                _write_varint(pk, v)
            _field(il, 1, 2)
            _write_varint(il, len(pk))
            il.extend(pk)
            _len_field(fb, 3, bytes(il))  # Feature.int64_list
        else:
            raise ValueError(f"feature {name!r}: unsupported value types")
        entry = bytearray()
        _len_field(entry, 1, name.encode("utf-8"))  # map key
        _len_field(entry, 2, bytes(fb))  # map value (Feature)
        _len_field(feats, 1, bytes(entry))  # Features.feature entry
    out = bytearray()
    _len_field(out, 1, bytes(feats))  # Example.features
    return bytes(out)


def _scan_fields(data: bytes):
    """Yield (field_number, wire_type, value) over one message body;
    value is int for varint(0)/fixed(1,5), bytes for length-delim(2)."""
    i = 0
    while i < len(data):
        tag, i = _read_varint(data, i)
        number, wire = tag >> 3, tag & 7
        if wire == 0:
            v, i = _read_varint(data, i)
            yield number, wire, v
        elif wire == 2:
            ln, i = _read_varint(data, i)
            if ln < 0 or i + ln > len(data):
                raise ValueError(f"field {number} length {ln} overruns message")
            yield number, wire, data[i : i + ln]
            i += ln
        elif wire == 5:
            if i + 4 > len(data):
                raise ValueError("fixed32 truncated")
            yield number, wire, data[i : i + 4]
            i += 4
        elif wire == 1:
            if i + 8 > len(data):
                raise ValueError("fixed64 truncated")
            yield number, wire, data[i : i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wire} (field {number})")


def decode_example(payload: bytes) -> dict:
    """tf.Example bytes -> {name: list} (int64 / float32 / bytes)."""
    features: dict = {}
    feats_body = b""
    for num, wire, val in _scan_fields(payload):
        if num == 1 and wire == 2:
            feats_body = val
    for num, wire, entry in _scan_fields(feats_body):
        if num != 1 or wire != 2:
            continue
        name, feature = None, b""
        for enum, ewire, eval_ in _scan_fields(entry):
            if enum == 1 and ewire == 2:
                name = eval_.decode("utf-8")
            elif enum == 2 and ewire == 2:
                feature = eval_
        if name is None:
            raise ValueError("feature map entry without a key")
        out: list = []
        for fnum, fwire, body in _scan_fields(feature):
            if fwire != 2:
                raise ValueError(f"Feature field {fnum} not length-delimited")
            if fnum == 1:  # BytesList
                for vnum, vwire, v in _scan_fields(body):
                    if vnum == 1 and vwire == 2:
                        out.append(v)
            elif fnum == 2:  # FloatList
                for vnum, vwire, v in _scan_fields(body):
                    if vnum != 1:
                        continue
                    if vwire == 2:  # packed
                        if len(v) % 4:
                            raise ValueError("packed floats misaligned")
                        out.extend(
                            float(x)
                            for x in np.frombuffer(v, "<f4").tolist()
                        )
                    elif vwire == 5:  # unpacked
                        out.append(
                            float(struct.unpack("<f", v)[0])
                        )
            elif fnum == 3:  # Int64List
                for vnum, vwire, v in _scan_fields(body):
                    if vnum != 1:
                        continue
                    if vwire == 2:  # packed
                        i = 0
                        while i < len(v):
                            x, i = _read_varint(v, i)
                            out.append(x)
                    elif vwire == 0:
                        out.append(v)
            else:
                raise ValueError(f"unknown Feature kind {fnum}")
        features[name] = out
    return features


# ------------------------------------------------------------- container


def encode_tfrecord(records: list[bytes]) -> bytes:
    out = bytearray()
    for rec in records:
        ln = struct.pack("<Q", len(rec))
        out.extend(ln)
        out.extend(struct.pack("<I", _masked_crc(ln)))
        out.extend(rec)
        out.extend(struct.pack("<I", _masked_crc(rec)))
    return bytes(out)


def decode_tfrecord(payload: bytes) -> list[bytes]:
    """Strict framing walk: every length and data CRC must verify."""
    out = []
    i = 0
    while i < len(payload):
        if i + 12 > len(payload):
            raise ValueError(f"record header truncated at {i}")
        ln_bytes = payload[i : i + 8]
        (ln,) = struct.unpack("<Q", ln_bytes)
        (ln_crc,) = struct.unpack_from("<I", payload, i + 8)
        if _masked_crc(ln_bytes) != ln_crc:
            raise ValueError(f"length CRC mismatch at offset {i}")
        i += 12
        if i + ln + 4 > len(payload):
            raise ValueError(f"record data truncated at {i} (length {ln})")
        data = payload[i : i + ln]
        (data_crc,) = struct.unpack_from("<I", payload, i + ln)
        if _masked_crc(data) != data_crc:
            raise ValueError(f"data CRC mismatch at offset {i}")
        out.append(data)
        i += ln + 4
    return out
