"""Parquet footer metadata — parsed from scratch, pure stdlib.

Every scan this engine plans starts from a parquet FOOTER, and so
far that parsing has been delegated to Spark/pyarrow. This module
owns the two public formats underneath:

* **Thrift compact protocol** (Apache Thrift spec): ULEB128 varints,
  zigzag integers, short-form field headers ``(id delta << 4) |
  type`` with long-form fallback, list headers ``(size << 4) |
  elem_type`` (15 = varint size follows), nested structs, and the
  BOOLEAN_TRUE/FALSE types that live in the field header itself.
  :func:`thrift_read_struct` is a generic reader producing
  field-id-keyed dicts.
* **parquet-format FileMetaData** (the parquet.thrift IDL, public):
  ``PAR1`` magic both ends, little-endian footer length at
  ``end-8``, then FileMetaData — schema elements (with num_children
  for group nesting), num_rows, row groups -> column chunks ->
  ColumnMetaData (type, encodings, path, codec, value counts,
  compressed/uncompressed sizes, page offsets).

:func:`read_footer` needs only the file TAIL (it never touches page
data) — the exact shape a 100 TB scan planner wants: one ranged read
per file. The test suite and the driver gate cross-check every
extracted field against pyarrow (the reference implementation) on
the real testdata files; a varint read one byte short or a field
delta misapplied shifts every later field and cannot match.
"""

from __future__ import annotations

import struct

_STOP = 0
_TRUE, _FALSE = 1, 2
_BYTE, _I16, _I32, _I64, _DOUBLE = 3, 4, 5, 6, 7
_BINARY, _LIST, _SET, _MAP, _STRUCT = 8, 9, 10, 11, 12


class _Reader:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def u8(self) -> int:
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def varint(self) -> int:
        v = shift = 0
        while True:
            if self.pos >= len(self.buf):
                raise ValueError("thrift varint truncated")
            b = self.u8()
            v |= (b & 0x7F) << shift
            if not b & 0x80:
                return v
            shift += 7
            if shift > 70:
                raise ValueError("thrift varint longer than 10 bytes")

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)

    def binary(self) -> bytes:
        n = self.varint()
        out = self.buf[self.pos : self.pos + n]
        if len(out) != n:
            raise ValueError("thrift binary truncated")
        self.pos += n
        return out

    def value(self, ttype: int):
        if ttype == _TRUE:
            return True
        if ttype == _FALSE:
            return False
        if ttype == _BYTE:
            v = self.u8()
            return v - 256 if v >= 128 else v
        if ttype in (_I16, _I32, _I64):
            return self.zigzag()
        if ttype == _DOUBLE:
            v = struct.unpack_from("<d", self.buf, self.pos)[0]
            self.pos += 8
            return v
        if ttype == _BINARY:
            return self.binary()
        if ttype in (_LIST, _SET):
            head = self.u8()
            n = head >> 4
            et = head & 0x0F
            if n == 15:
                n = self.varint()
            if et == _TRUE:  # bools in lists are 1/2 per element
                return [self.u8() == 1 for _ in range(n)]
            return [self.value(et) for _ in range(n)]
        if ttype == _MAP:
            n = self.varint()
            if n == 0:
                return {}
            kv = self.u8()
            kt, vt = kv >> 4, kv & 0x0F
            return {self.value(kt): self.value(vt) for _ in range(n)}
        if ttype == _STRUCT:
            return self.struct()
        raise ValueError(f"thrift compact type {ttype}")

    def struct(self) -> dict:
        out: dict[int, object] = {}
        fid = 0
        while True:
            head = self.u8()
            if head == _STOP:
                return out
            delta = head >> 4
            ttype = head & 0x0F
            if delta:
                fid += delta
            else:
                fid = self.zigzag()
            out[fid] = self.value(ttype)


def thrift_read_struct(buf: bytes, pos: int = 0) -> dict:
    """Generic compact-protocol struct -> {field id: value} (nested
    structs become dicts, lists stay lists, strings stay bytes)."""
    return _Reader(buf, pos).struct()


_CODECS = {0: "UNCOMPRESSED", 1: "SNAPPY", 2: "GZIP", 3: "LZO",
           4: "BROTLI", 5: "LZ4", 6: "ZSTD", 7: "LZ4_RAW"}
_TYPES = {0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96",
          4: "FLOAT", 5: "DOUBLE", 6: "BYTE_ARRAY",
          7: "FIXED_LEN_BYTE_ARRAY"}
_ENCODINGS = {0: "PLAIN", 2: "PLAIN_DICTIONARY", 3: "RLE",
              4: "BIT_PACKED", 5: "DELTA_BINARY_PACKED",
              6: "DELTA_LENGTH_BYTE_ARRAY", 7: "DELTA_BYTE_ARRAY",
              8: "RLE_DICTIONARY", 9: "BYTE_STREAM_SPLIT"}


def parse_footer(meta: bytes) -> dict:
    """FileMetaData thrift bytes -> a plain dict: version, num_rows,
    created_by, leaf schema columns (dotted paths + physical types),
    and per row group the column chunks with codec / encodings /
    value counts / sizes / offsets."""
    fm = thrift_read_struct(meta)
    schema = fm.get(2) or []
    leaves: list[tuple[str, str]] = []
    levels: dict[str, tuple[int, int]] = {}

    # SchemaElement field 3 is repetition_type: 0=REQUIRED, 1=OPTIONAL,
    # 2=REPEATED. Definition level increments for OPTIONAL and REPEATED
    # ancestors, repetition level for REPEATED — the Dremel record
    # shredding model the page level blocks encode against.
    def walk(i: int, prefix: list[str], dl: int, rl: int) -> int:
        el = schema[i]
        name = (el.get(4) or b"").decode("utf-8")
        nchild = el.get(5) or 0
        rep = el.get(3) if i else 0  # root is conceptually REQUIRED
        if rep in (1, 2):
            dl += 1
        if rep == 2:
            rl += 1
        if nchild == 0:
            path = ".".join(prefix + [name])
            leaves.append((path, _TYPES.get(el.get(1), f"T{el.get(1)}")))
            levels[path] = (dl, rl)
            return i + 1
        j = i + 1
        for _ in range(nchild):
            j = walk(j, prefix + [name] if i else prefix, dl, rl)
        return j

    if schema:
        walk(0, [], 0, 0)
    groups = []
    for rg in fm.get(4) or []:
        cols = []
        for cc in rg.get(1) or []:
            md = cc.get(3) or {}
            cols.append(
                {
                    "path": b".".join(md.get(3) or []).decode("utf-8"),
                    "type": _TYPES.get(md.get(1), f"T{md.get(1)}"),
                    "codec": _CODECS.get(md.get(4), f"C{md.get(4)}"),
                    "encodings": sorted(
                        _ENCODINGS.get(e, f"E{e}") for e in md.get(2) or []
                    ),
                    "num_values": md.get(5),
                    "uncompressed": md.get(6),
                    "compressed": md.get(7),
                    "data_page_offset": md.get(9),
                    "dict_page_offset": md.get(11),
                }
            )
        groups.append(
            {
                "num_rows": rg.get(3),
                "total_byte_size": rg.get(2),
                "columns": cols,
            }
        )
    return {
        "version": fm.get(1),
        "num_rows": fm.get(3),
        "created_by": (fm.get(6) or b"").decode("utf-8", "replace"),
        "columns": leaves,
        "levels": levels,
        "row_groups": groups,
    }


def read_footer(path: str) -> dict:
    """Parse a parquet file's footer by reading only the TAIL: seek
    to ``end-8`` for the footer length + ``PAR1`` magic, then one
    ranged read of the FileMetaData bytes."""
    import os

    size = os.path.getsize(path)
    if size < 12:
        raise ValueError(f"{path}: too small to be parquet")
    with open(path, "rb") as f:
        f.seek(size - 8)
        tail = f.read(8)
        if tail[4:] != b"PAR1":
            raise ValueError(f"{path}: trailing PAR1 magic missing")
        (flen,) = struct.unpack("<I", tail[:4])
        if flen + 8 > size:
            raise ValueError(f"{path}: footer length {flen} out of range")
        f.seek(size - 8 - flen)
        meta = f.read(flen)
    return parse_footer(meta)


# --------------------------------------------------------------------------
# Column reads from first principles: PageHeader (thrift) -> level
# decoding (the RLE / bit-packed hybrid) -> PLAIN values. Combined
# with read_footer and levi_spark.operators.deflate.inflate, a GZIP
# parquet column round-trips with ZERO external parquet/compression
# code. Supported profile: data page v1, PLAIN encoding, INT64 /
# DOUBLE / BYTE_ARRAY, max definition level <= 1 (flat optional
# columns), no dictionary pages; everything else refuses loudly.
# --------------------------------------------------------------------------


def _rle_bp_hybrid(buf: bytes, bit_width: int, count: int) -> list[int]:
    """The parquet RLE/bit-packed hybrid (levels encoding): varint
    header — LSB 0 = RLE run (fixed-width little-endian value), LSB 1
    = bit-packed groups of 8 values."""
    r = _Reader(buf)
    out: list[int] = []
    width_bytes = (bit_width + 7) // 8
    while len(out) < count:
        header = r.varint()
        if header & 1:  # bit-packed: (header >> 1) groups of 8
            n_groups = header >> 1
            total_bits = n_groups * 8 * bit_width
            raw = r.buf[r.pos : r.pos + (total_bits + 7) // 8]
            r.pos += (total_bits + 7) // 8
            acc = int.from_bytes(raw, "little")
            mask = (1 << bit_width) - 1
            for i in range(n_groups * 8):
                if len(out) < count:
                    out.append((acc >> (i * bit_width)) & mask)
        else:  # RLE run
            run = header >> 1
            v = int.from_bytes(
                r.buf[r.pos : r.pos + width_bytes], "little"
            )
            r.pos += width_bytes
            out.extend([v] * min(run, count - len(out)))
    return out


def read_column(path: str, column: str) -> list:
    """Read one flat column of a parquet FILE from first principles
    (see :func:`read_column_bytes`)."""
    with open(path, "rb") as f:
        return read_column_bytes(f.read(), column)


def read_column_bytes(data: bytes, column: str) -> list:
    """Read one flat column of an in-memory parquet file from first
    principles: footer -> column chunk offsets -> PageHeader thrift
    -> decompress (UNCOMPRESSED or GZIP via our own inflate) ->
    definition levels (RLE/bit-packed hybrid) -> PLAIN values, nulls
    as None."""
    if data[-4:] != b"PAR1":
        raise ValueError("trailing PAR1 magic missing")
    (flen,) = struct.unpack_from("<I", data, len(data) - 8)
    footer = parse_footer(data[len(data) - 8 - flen : len(data) - 8])
    types = dict(footer["columns"])
    if column not in types:
        raise ValueError(f"{column!r} not in {sorted(types)}")
    ptype = types[column]
    max_def, max_rep = footer["levels"][column]
    if max_rep > 0:
        raise NotImplementedError(
            "repeated (nested list) column: use read_column_nested"
        )
    out: list = []
    for g in footer["row_groups"]:
        chunk = next(c for c in g["columns"] if c["path"] == column)
        if chunk["codec"] not in ("UNCOMPRESSED", "GZIP", "SNAPPY"):
            raise NotImplementedError(
                f"codec {chunk['codec']}: first-principles reads cover "
                "UNCOMPRESSED, GZIP (our inflate) and SNAPPY (our "
                "block decoder)"
            )
        def decompress(body: bytes) -> bytes:
            if chunk["codec"] == "GZIP":
                from levi_spark.operators.deflate import gzip_unwrap

                return gzip_unwrap(body)
            if chunk["codec"] == "SNAPPY":
                from levi_spark.operators.snappy import snappy_uncompress

                return snappy_uncompress(body)
            return body

        def plain_values(buf: bytes, at: int, count: int) -> list:
            if ptype == "INT64":
                return list(struct.unpack_from(f"<{count}q", buf, at))
            if ptype == "DOUBLE":
                return list(struct.unpack_from(f"<{count}d", buf, at))
            if ptype == "BYTE_ARRAY":
                vals = []
                for _ in range(count):
                    (ln,) = struct.unpack_from("<i", buf, at)
                    vals.append(buf[at + 4 : at + 4 + ln].decode("utf-8"))
                    at += 4 + ln
                return vals
            raise NotImplementedError(f"physical type {ptype}")

        dictionary: list | None = None
        pos = chunk["dict_page_offset"]
        if pos is None:
            pos = chunk["data_page_offset"]
        remaining = chunk["num_values"]
        while remaining > 0:
            r = _Reader(data, pos)
            ph = r.struct()
            page_type = ph.get(1)
            comp_size = ph.get(3)
            body = data[r.pos : r.pos + comp_size]
            pos = r.pos + comp_size
            if page_type == 2:  # DICTIONARY_PAGE
                dict_hdr = ph.get(7) or {}
                dictionary = plain_values(
                    decompress(body), 0, dict_hdr.get(1)
                )
                continue
            if page_type != 0:  # 0 = DATA_PAGE (v1)
                raise NotImplementedError(f"page type {page_type}")
            dph = ph.get(5) or {}
            n_values = dph.get(1)
            encoding = dph.get(2)
            body = decompress(body)
            if max_def == 0:
                # REQUIRED column: v1 data pages carry NO definition-
                # level block at all — every value is present
                levels = [1] * n_values
                vpos = 0
            else:
                # OPTIONAL column (max def level 1): a [i32 length]
                # [RLE/bit-packed hybrid] block precedes the values
                (lev_len,) = struct.unpack_from("<i", body, 0)
                levels = _rle_bp_hybrid(
                    body[4 : 4 + lev_len], 1, n_values
                )
                vpos = 4 + lev_len
            n_present = sum(levels)
            if encoding == 0:  # PLAIN
                vals = plain_values(body, vpos, n_present)
            elif encoding in (2, 8):  # (PLAIN_)RLE_DICTIONARY
                if dictionary is None:
                    raise ValueError(
                        "dictionary-encoded page before any dictionary"
                    )
                bit_width = body[vpos]
                idx = _rle_bp_hybrid(
                    body[vpos + 1 :], bit_width, n_present
                )
                vals = [dictionary[i] for i in idx]
            else:
                raise NotImplementedError(f"value encoding {encoding}")
            it = iter(vals)
            out.extend(next(it) if lv else None for lv in levels)
            remaining -= n_values
    return out
