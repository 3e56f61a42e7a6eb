"""Avro Object Container File codec — pure stdlib.

The other half of the data-lake interchange story next to parquet:
Kafka dumps, Sqoop exports and event archives ship as ``.avro``
container files. Implemented from the public Avro 1.x specification:

* container framing: magic ``Obj\\x01``, a file-metadata map
  (``avro.schema`` JSON + ``avro.codec``), a random 16-byte sync
  marker, then blocks of ``(record count, byte size, data, sync)``
  — a wrong sync marker or a short block refuses;
* codecs: ``null`` and ``deflate`` (raw DEFLATE, zlib wbits=-15);
* binary encoding: int/long as ZIGZAG varints, float/double as
  little-endian IEEE, boolean as one byte, string/bytes as
  length-prefixed, arrays as count-prefixed blocks terminated by a
  zero count (the negative-count + block-size variant is accepted on
  read, per spec);
* schemas: RECORDS of the primitive types above, arrays of
  primitives, and 2-branch ``["null", T]`` unions (the nullable-
  column idiom) — nested records/maps/enums/fixed refuse loudly at
  schema parse rather than misdecode.

North-star ingestion surface beside
:mod:`levi_spark.operators.tfrecord`.
"""

from __future__ import annotations

import json
import struct
import zlib

_MAGIC = b"Obj\x01"
_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "bytes", "string"}


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def _write_long(out: bytearray, v: int) -> None:
    z = (v << 1) ^ (v >> 63)  # arithmetic shift keeps the sign fold exact
    z &= (1 << 64) - 1
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(data: bytes, i: int) -> tuple[int, int]:
    z = shift = 0
    while True:
        if i >= len(data):
            raise ValueError("Avro varint truncated")
        b = data[i]
        i += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            raise ValueError("Avro varint longer than 10 bytes")
    return (z >> 1) ^ -(z & 1), i


def _write_bytes(out: bytearray, b: bytes) -> None:
    _write_long(out, len(b))
    out.extend(b)


def _read_bytes(data: bytes, i: int) -> tuple[bytes, int]:
    n, i = _read_long(data, i)
    if n < 0 or i + n > len(data):
        raise ValueError(f"Avro bytes length {n} overruns buffer")
    return data[i : i + n], i + n


def _validate_schema(schema: dict) -> list[tuple[str, object]]:
    """Record schema -> [(field name, type spec)]; type spec is a
    primitive name, ("array", prim), or ("union_null", prim)."""
    if schema.get("type") != "record":
        raise NotImplementedError("top-level Avro schema must be a record")
    fields = []
    for f in schema.get("fields", []):
        t = f["type"]
        if isinstance(t, str) and t in _PRIMITIVES and t != "null":
            fields.append((f["name"], t))
        elif isinstance(t, dict) and t.get("type") == "array":
            it = t.get("items")
            if not (isinstance(it, str) and it in _PRIMITIVES and it != "null"):
                raise NotImplementedError(
                    f"array items {it!r} unsupported (primitives only)"
                )
            fields.append((f["name"], ("array", it)))
        elif (
            isinstance(t, list)
            and len(t) == 2
            and "null" in t
            and any(x in _PRIMITIVES - {"null"} for x in t)
        ):
            prim = next(x for x in t if x != "null")
            null_first = t[0] == "null"
            fields.append((f["name"], ("union_null", prim, null_first)))
        else:
            raise NotImplementedError(f"Avro field type {t!r} unsupported")
    return fields


def _write_value(out: bytearray, typ: str, v) -> None:
    if typ in ("int", "long"):
        _write_long(out, int(v))
    elif typ == "float":
        out.extend(struct.pack("<f", float(v)))
    elif typ == "double":
        out.extend(struct.pack("<d", float(v)))
    elif typ == "boolean":
        out.append(1 if v else 0)
    elif typ == "string":
        _write_bytes(out, str(v).encode("utf-8"))
    elif typ == "bytes":
        _write_bytes(out, bytes(v))
    else:
        raise NotImplementedError(typ)


def _read_value(data: bytes, i: int, typ: str):
    if typ in ("int", "long"):
        return _read_long(data, i)
    if typ == "float":
        if i + 4 > len(data):
            raise ValueError("Avro float truncated")
        return struct.unpack_from("<f", data, i)[0], i + 4
    if typ == "double":
        if i + 8 > len(data):
            raise ValueError("Avro double truncated")
        return struct.unpack_from("<d", data, i)[0], i + 8
    if typ == "boolean":
        if i >= len(data):
            raise ValueError("Avro boolean truncated")
        if data[i] not in (0, 1):
            raise ValueError(f"Avro boolean byte {data[i]} invalid")
        return data[i] == 1, i + 1
    if typ == "string":
        b, i = _read_bytes(data, i)
        return b.decode("utf-8"), i
    if typ == "bytes":
        b, i = _read_bytes(data, i)
        return bytes(b), i
    raise NotImplementedError(typ)


def encode_avro(
    schema: dict, records: list[dict], codec: str = "null",
    records_per_block: int = 64, sync: bytes | None = None,
) -> bytes:
    """Record dicts -> Avro Object Container File bytes. ``sync``
    pins the 16-byte marker for deterministic fixtures (the spec says
    random; determinism is a feature here)."""
    fields = _validate_schema(schema)
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"codec {codec!r} unsupported")
    sync = sync if sync is not None else bytes(range(16))
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    out = bytearray(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k in sorted(meta):
        _write_bytes(out, k.encode())
        _write_bytes(out, meta[k])
    _write_long(out, 0)  # map terminator
    out.extend(sync)
    for at in range(0, len(records), records_per_block):
        chunk = records[at : at + records_per_block]
        body = bytearray()
        for rec in chunk:
            for name, spec in fields:
                v = rec.get(name)
                if isinstance(spec, tuple) and spec[0] == "array":
                    vals = list(v or [])
                    if vals:
                        _write_long(body, len(vals))
                        for x in vals:
                            _write_value(body, spec[1], x)
                    _write_long(body, 0)
                elif isinstance(spec, tuple) and spec[0] == "union_null":
                    _prim, null_first = spec[1], spec[2]
                    if v is None:
                        _write_long(body, 0 if null_first else 1)
                    else:
                        _write_long(body, 1 if null_first else 0)
                        _write_value(body, _prim, v)
                else:
                    if v is None:
                        raise ValueError(
                            f"field {name!r} is {spec}, got None"
                        )
                    _write_value(body, spec, v)
        data = (
            zlib.compress(bytes(body), 6)[2:-4]  # raw deflate per spec
            if codec == "deflate"
            else bytes(body)
        )
        _write_long(out, len(chunk))
        _write_long(out, len(data))
        out.extend(data)
        out.extend(sync)
    return bytes(out)


def decode_avro(payload: bytes) -> tuple[dict, list[dict]]:
    """Container bytes -> (schema dict, record dicts). Strict: magic,
    sync markers, block sizes, and trailing bytes all validate."""
    if payload[:4] != _MAGIC:
        raise ValueError(f"not an Avro container (starts {payload[:4]!r})")
    i = 4
    meta: dict[str, bytes] = {}
    while True:
        n, i = _read_long(payload, i)
        if n == 0:
            break
        if n < 0:  # negative count: abs count + byte size (skippable)
            n = -n
            _, i = _read_long(payload, i)
        for _ in range(n):
            k, i = _read_bytes(payload, i)
            v, i = _read_bytes(payload, i)
            meta[k.decode()] = v
    if "avro.schema" not in meta:
        raise ValueError("Avro container missing avro.schema")
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"codec {codec!r} unsupported")
    fields = _validate_schema(schema)
    sync = payload[i : i + 16]
    if len(sync) != 16:
        raise ValueError("Avro header sync marker truncated")
    i += 16
    records: list[dict] = []
    while i < len(payload):
        count, i = _read_long(payload, i)
        size, i = _read_long(payload, i)
        if count < 0 or size < 0 or i + size + 16 > len(payload):
            raise ValueError(f"Avro block at {i} overruns file")
        data = payload[i : i + size]
        i += size
        if payload[i : i + 16] != sync:
            raise ValueError(f"Avro sync marker mismatch after block at {i}")
        i += 16
        if codec == "deflate":
            data = zlib.decompress(data, wbits=-15)
        j = 0
        for _ in range(count):
            rec = {}
            for name, spec in fields:
                if isinstance(spec, tuple) and spec[0] == "array":
                    vals = []
                    while True:
                        n, j = _read_long(data, j)
                        if n == 0:
                            break
                        if n < 0:
                            n = -n
                            _, j = _read_long(data, j)  # block byte size
                        for _k in range(n):
                            v, j = _read_value(data, j, spec[1])
                            vals.append(v)
                    rec[name] = vals
                elif isinstance(spec, tuple) and spec[0] == "union_null":
                    _prim, null_first = spec[1], spec[2]
                    idx, j = _read_long(data, j)
                    if idx not in (0, 1):
                        raise ValueError(f"union branch {idx} invalid")
                    if (idx == 0) == null_first:
                        rec[name] = None
                    else:
                        rec[name], j = _read_value(data, j, _prim)
                else:
                    rec[name], j = _read_value(data, j, spec)
            records.append(rec)
        if j != len(data):
            raise ValueError(
                f"Avro block decoded {j} of {len(data)} bytes"
            )
    return schema, records
