"""Arrow IPC stream format — from scratch, pure stdlib + numpy.

Arrow IPC is *the* training-data interchange wire (Feather v2, Flight
payloads, the ``.arrow`` shards dataset hubs serve), and implementing
it from the published spec means owning two public formats at once:

* **FlatBuffers** (Google's flatbuffers internals spec): root
  ``uoffset``, tables prefixed by a signed ``soffset`` to their
  vtable (``[u16 vtable_bytes, u16 table_bytes, u16 slot
  offsets...]``), forward-pointing ``uoffset`` fields, ``[u32 len]``
  vectors and null-terminated strings, unions as a (type byte,
  value table) field pair, structs inline. Both a reader
  (:class:`_FB`) and a down-growing writer (:class:`_Builder`,
  offsets tracked from the buffer end so prepending never moves
  existing objects) are implemented here — no flatbuffers library.
* **Arrow IPC framing** (Arrow columnar spec, "Serialization and
  Interprocess Communication"): encapsulated messages =
  ``0xFFFFFFFF`` continuation + little-endian metadata length +
  Message flatbuffer padded to 8 + body; a Schema message, then
  RecordBatch messages whose bodies concatenate each column's
  buffers (validity bitmap LSB-first, int32 offsets for utf8, data)
  at 8-byte alignment; end-of-stream marker ``FFFFFFFF 00000000``.

Field slots follow the published ``Message.fbs``/``Schema.fbs``
(Message: version/header-union/bodyLength; Schema: endianness/fields;
Field: name/nullable/type-union/children; RecordBatch:
length/nodes/buffers; FieldNode and Buffer as inline 16-byte
structs). Supported column types: int64, float64, bool, utf8 — with
nulls — the flat shard schema this engine's fixtures need; nested
types, dictionaries, and compressed bodies refuse loudly.

The test suite pins INTEROP both ways against pyarrow (the reference
implementation): pyarrow must open our streams and we must decode
pyarrow's — a far stronger oracle than self-round-trip. North-star
ingestion surface beside :mod:`levi_spark.operators.avro`.
"""

from __future__ import annotations

import struct

import numpy as np

_CONT = b"\xff\xff\xff\xff"

# MessageHeader union
_H_SCHEMA, _H_DICT, _H_BATCH = 1, 2, 3
# Type union ids (Schema.fbs)
_T_INT, _T_FLOAT, _T_UTF8, _T_BOOL = 2, 3, 5, 6


# --------------------------------------------------------------------------
# FlatBuffers reader
# --------------------------------------------------------------------------


class _FB:
    def __init__(self, buf: bytes):
        self.buf = buf

    def u16(self, pos):
        return struct.unpack_from("<H", self.buf, pos)[0]

    def i32(self, pos):
        return struct.unpack_from("<i", self.buf, pos)[0]

    def u32(self, pos):
        return struct.unpack_from("<I", self.buf, pos)[0]

    def i64(self, pos):
        return struct.unpack_from("<q", self.buf, pos)[0]

    def root(self) -> int:
        return self.u32(0)

    def field(self, table: int, slot: int) -> int | None:
        """Absolute position of field data for slot, or None."""
        vtable = table - self.i32(table)
        vbytes = self.u16(vtable)
        off = 4 + 2 * slot
        if off + 2 > vbytes:
            return None
        rel = self.u16(vtable + off)
        return table + rel if rel else None

    def table_field(self, table: int, slot: int) -> int | None:
        p = self.field(table, slot)
        return None if p is None else p + self.u32(p)

    def string_field(self, table: int, slot: int) -> str | None:
        p = self.table_field(table, slot)
        if p is None:
            return None
        n = self.u32(p)
        return self.buf[p + 4 : p + 4 + n].decode("utf-8")

    def scalar_field(self, table: int, slot: int, fmt: str, default):
        p = self.field(table, slot)
        if p is None:
            return default
        return struct.unpack_from(fmt, self.buf, p)[0]

    def vector_field(self, table: int, slot: int) -> tuple[int, int]:
        """(element start, length) of a vector field; (0, 0) if absent."""
        p = self.table_field(table, slot)
        if p is None:
            return 0, 0
        return p + 4, self.u32(p)


# --------------------------------------------------------------------------
# FlatBuffers writer (down-growing; offsets measured from buffer END)
# --------------------------------------------------------------------------


class _Builder:
    def __init__(self):
        self.chunks: list[bytes] = []  # prepend order; final = reversed
        self.size = 0

    def _prepend(self, data: bytes) -> int:
        self.chunks.append(data)
        self.size += len(data)
        return self.size  # from-end offset of the chunk START

    def _align(self, n: int):
        pad = (-self.size) % n
        if pad:
            self._prepend(b"\x00" * pad)

    def _pre_align(self, payload_len: int, align: int):
        """Pad (trailing bytes in the final buffer) so the payload
        about to be prepended STARTS at a from-end offset that is a
        multiple of ``align`` — padding must never land between a
        vector's length word and its elements."""
        pad = (-(self.size + payload_len)) % align
        if pad:
            self._prepend(b"\x00" * pad)

    def string(self, s: str) -> int:
        b = s.encode("utf-8") + b"\x00"
        self._pre_align(len(b), 4)
        self._prepend(b)
        return self._prepend(struct.pack("<I", len(b) - 1))

    def vector_of_tables(self, offsets: list[int]) -> int:
        self._pre_align(4 * len(offsets), 4)
        # reserve the uoffset cells, then resolve each against its cell
        cells = bytearray()
        base = self.size + 4 * len(offsets)
        for i, o in enumerate(offsets):
            cell_from_end = base - 4 * i  # start of cell i
            cells += struct.pack("<I", cell_from_end - o)
        self._prepend(bytes(cells))
        return self._prepend(struct.pack("<I", len(offsets)))

    def vector_of_structs(self, raw: bytes, count: int, align: int = 8) -> int:
        self._pre_align(len(raw), align)
        self._prepend(raw)
        return self._prepend(struct.pack("<I", count))

    def table(self, fields: list[tuple[int, str, object]]) -> int:
        """fields: (slot, kind, value); kind in {"i16","i32","i64",
        "u8","bool","offset"} — "offset" values are from-end offsets
        of already-written objects. Returns the table's from-end
        offset."""
        sizes = {"u8": 1, "bool": 1, "i16": 2, "i32": 4, "i64": 8,
                 "offset": 4}
        fmts = {"u8": "<B", "bool": "<B", "i16": "<h", "i32": "<i",
                "i64": "<q"}
        present = sorted(fields, key=lambda f: -sizes[f[1]])  # big first
        # lay out inline data after the 4-byte soffset
        pos = 4
        slots: dict[int, int] = {}
        layout: list[tuple[int, str, object, int]] = []
        for slot, kind, value in present:
            sz = sizes[kind]
            pos = (pos + sz - 1) // sz * sz
            slots[slot] = pos
            layout.append((slot, kind, value, pos))
            pos += sz
        # round the table to max(4, field alignment): the leading i32
        # soffset must stay 4-aligned (a lone i16 field would otherwise
        # shrink the table to a 2-aligned size and land the next
        # table's soffset off-grid — pyarrow's verifier rejects that)
        max_align = max(
            [sizes[k] for _, k, _ in present] + [4]
        )
        table_bytes = (pos + max_align - 1) // max_align * max_align
        n_slots = max(slots) + 1 if slots else 0
        vbytes = 4 + 2 * n_slots
        # write table: soffset + inline fields (needs from-end position
        # of the table start to resolve uoffsets). Rounding table_bytes
        # to the max field alignment + starting on an 8-aligned from-end
        # offset keeps every inline scalar address-aligned.
        self._align(8)
        table_start = self.size + table_bytes  # after we prepend it
        body = bytearray(table_bytes)
        for slot, kind, value, at in layout:
            if kind == "offset":
                # uoffset = field_addr_fwd -> target; in from-end
                # coords: (table_start - at) - value
                struct.pack_into("<I", body, at,
                                 (table_start - at) - value)
            else:
                struct.pack_into(fmts[kind], body, at,
                                 int(value) if kind != "bool" else
                                 (1 if value else 0))
        # vtable sits directly before the table: soffset = v - t > 0
        vt = bytearray(struct.pack("<HH", vbytes, table_bytes))
        for s in range(n_slots):
            vt += struct.pack("<H", slots.get(s, 0))
        struct.pack_into("<i", body, 0, len(vt))  # soffset: vtable gap
        self._prepend(bytes(body))
        assert self.size == table_start
        self._prepend(bytes(vt))
        return table_start

    def finish(self, root: int) -> bytes:
        # total = 4 (root uoffset) + pad + chunks; keep total % 8 == 0
        # so every from-end-aligned object lands address-aligned
        pad = (-(self.size + 4)) % 8
        self._prepend(b"\x00" * pad)
        total = self.size + 4
        out = struct.pack("<I", total - root)
        return out + b"".join(reversed(self.chunks))


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------


def _validity(col: list) -> tuple[bytes, int]:
    nulls = sum(1 for v in col if v is None)
    if nulls == 0:
        return b"", 0
    bits = np.zeros(len(col), np.uint8)
    for i, v in enumerate(col):
        if v is not None:
            bits[i] = 1
    return np.packbits(bits, bitorder="little").tobytes(), nulls


def _col_buffers(col: list, typ: str) -> list[bytes]:
    if typ == "int64":
        data = struct.pack(
            f"<{len(col)}q", *[0 if v is None else int(v) for v in col]
        )
        return [data]
    if typ == "float64":
        data = struct.pack(
            f"<{len(col)}d", *[0.0 if v is None else float(v) for v in col]
        )
        return [data]
    if typ == "bool":
        bits = np.array([1 if v else 0 for v in col], np.uint8)
        return [np.packbits(bits, bitorder="little").tobytes()]
    if typ == "utf8":
        offs = [0]
        blob = bytearray()
        for v in col:
            if v is not None:
                blob += v.encode("utf-8")
            offs.append(len(blob))
        return [struct.pack(f"<{len(offs)}i", *offs), bytes(blob)]
    raise ValueError(f"unsupported Arrow type {typ!r}")


def _field_table(b: _Builder, name: str, typ: str) -> int:
    if typ == "int64":
        tt, t = _T_INT, b.table([(0, "i32", 64), (1, "bool", True)])
    elif typ == "float64":
        tt, t = _T_FLOAT, b.table([(0, "i16", 2)])  # DOUBLE
    elif typ == "utf8":
        tt, t = _T_UTF8, b.table([])
    elif typ == "bool":
        tt, t = _T_BOOL, b.table([])
    else:
        raise ValueError(f"unsupported Arrow type {typ!r}")
    nm = b.string(name)
    return b.table(
        [(0, "offset", nm), (1, "bool", True), (2, "u8", tt),
         (3, "offset", t)]
    )


def _message(header_type: int, header: int, body_len: int,
             b: _Builder) -> bytes:
    msg = b.table(
        [(0, "i16", 4), (1, "u8", header_type), (2, "offset", header),
         (3, "i64", body_len)]
    )
    fb = b.finish(msg)
    pad = (-len(fb)) % 8
    fb += b"\x00" * pad
    return _CONT + struct.pack("<I", len(fb)) + fb


def encode_arrow_ipc(
    schema: list[tuple[str, str]],
    batches: list[dict[str, list]],
) -> bytes:
    """``schema`` = [(name, "int64"|"float64"|"utf8"|"bool")], each
    batch a {name: values} dict (None = null) -> Arrow IPC stream."""
    out = bytearray()
    b = _Builder()
    fvec = b.vector_of_tables([_field_table(b, n, t) for n, t in schema])
    sch = b.table([(0, "i16", 0), (1, "offset", fvec)])
    out += _message(_H_SCHEMA, sch, 0, b)
    for batch in batches:
        cols = [batch[n] for n, _ in schema]
        n_rows = len(cols[0]) if cols else 0
        if any(len(c) != n_rows for c in cols):
            raise ValueError("ragged batch columns")
        nodes = bytearray()
        bufs: list[bytes] = []
        for (name, typ), col in zip(schema, cols):
            vbuf, nulls = _validity(col)
            nodes += struct.pack("<qq", len(col), nulls)
            bufs.append(vbuf)
            bufs.extend(_col_buffers(col, typ))
        body = bytearray()
        bdescs = bytearray()
        for raw in bufs:
            off = len(body)
            bdescs += struct.pack("<qq", off, len(raw))
            body += raw
            body += b"\x00" * ((-len(raw)) % 8)
        b = _Builder()
        nvec = b.vector_of_structs(bytes(nodes), len(cols))
        bvec = b.vector_of_structs(bytes(bdescs), len(bufs))
        rb = b.table(
            [(0, "i64", n_rows), (1, "offset", nvec), (2, "offset", bvec)]
        )
        out += _message(_H_BATCH, rb, len(body), b)
        out += body
    out += _CONT + b"\x00\x00\x00\x00"
    return bytes(out)


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------


def _parse_field(fb: _FB, fpos: int) -> tuple[str, str]:
    name = fb.string_field(fpos, 0) or ""
    tt = fb.scalar_field(fpos, 2, "<B", 0)
    tpos = fb.table_field(fpos, 3)
    if tt == _T_INT:
        width = fb.scalar_field(tpos, 0, "<i", 0)
        signed = fb.scalar_field(tpos, 1, "<B", 0)
        if width != 64 or not signed:
            raise NotImplementedError(
                f"Int bitWidth={width} signed={bool(signed)} unsupported"
            )
        return name, "int64"
    if tt == _T_FLOAT:
        prec = fb.scalar_field(tpos, 0, "<h", 0)
        if prec != 2:
            raise NotImplementedError(f"FloatingPoint precision {prec}")
        return name, "float64"
    if tt == _T_UTF8:
        return name, "utf8"
    if tt == _T_BOOL:
        return name, "bool"
    raise NotImplementedError(f"Arrow Type union id {tt} unsupported")


def _bits(buf: bytes, n: int) -> list[bool]:
    if not buf:
        return [True] * n
    arr = np.unpackbits(
        np.frombuffer(buf, np.uint8), bitorder="little"
    )[:n]
    return [bool(x) for x in arr]


def _read_batch_into(fb: _FB, hpos: int, body: bytes,
                     schema: list[tuple[str, str]],
                     columns: dict[str, list]) -> None:
    if fb.field(hpos, 3) is not None:
        raise NotImplementedError("compressed record batch")
    nvec, n_nodes = fb.vector_field(hpos, 1)
    bvec, _n_bufs = fb.vector_field(hpos, 2)
    if n_nodes != len(schema):
        raise ValueError(f"{n_nodes} field nodes for {len(schema)} fields")

    def buf(i: int) -> bytes:
        off = fb.i64(bvec + 16 * i)
        ln = fb.i64(bvec + 16 * i + 8)
        return body[off : off + ln]

    bi = 0
    for k, (name, typ) in enumerate(schema):
        length = fb.i64(nvec + 16 * k)
        valid = _bits(buf(bi), length)
        bi += 1
        if typ == "int64":
            vals = struct.unpack_from(f"<{length}q", buf(bi))
            bi += 1
        elif typ == "float64":
            vals = struct.unpack_from(f"<{length}d", buf(bi))
            bi += 1
        elif typ == "bool":
            vals = _bits(buf(bi), length)
            bi += 1
        else:  # utf8
            if length == 0:
                # conforming writers may emit a zero-length offsets
                # buffer for an empty batch — nothing to unpack
                vals = []
            else:
                offs = struct.unpack_from(f"<{length + 1}i", buf(bi))
                data = buf(bi + 1)
                vals = [
                    data[offs[j] : offs[j + 1]].decode("utf-8")
                    for j in range(length)
                ]
            bi += 2
        columns[name].extend(
            v if ok else None for v, ok in zip(vals, valid)
        )


def _parse_schema_table(fb: _FB, spos: int) -> list[tuple[str, str]]:
    vec, n = fb.vector_field(spos, 1)
    return [
        _parse_field(fb, vec + 4 * i + fb.u32(vec + 4 * i))
        for i in range(n)
    ]


def decode_arrow_ipc(payload: bytes):
    """Arrow IPC stream -> (schema [(name, type)], columns {name:
    list}) with batches concatenated and nulls as None."""
    pos = 0
    schema: list[tuple[str, str]] | None = None
    columns: dict[str, list] = {}
    while True:
        if pos + 8 > len(payload):
            raise ValueError("stream ends without EOS marker")
        if payload[pos : pos + 4] != _CONT:
            raise ValueError(f"missing continuation marker at byte {pos}")
        (mlen,) = struct.unpack_from("<I", payload, pos + 4)
        pos += 8
        if mlen == 0:
            break  # end of stream
        meta = payload[pos : pos + mlen]
        if len(meta) != mlen:
            raise ValueError("message metadata truncated")
        pos += mlen
        fb = _FB(meta)
        msg = fb.root()
        htype = fb.scalar_field(msg, 1, "<B", 0)
        hpos = fb.table_field(msg, 2)
        body_len = fb.scalar_field(msg, 3, "<q", 0)
        body = payload[pos : pos + body_len]
        if len(body) != body_len:
            raise ValueError("message body truncated")
        pos += body_len
        if htype == _H_SCHEMA:
            if schema is not None:
                raise ValueError("second Schema message")
            schema = _parse_schema_table(fb, hpos)
            columns = {name: [] for name, _ in schema}
        elif htype == _H_BATCH:
            if schema is None:
                raise ValueError("RecordBatch before Schema")
            _read_batch_into(fb, hpos, body, schema, columns)
        elif htype == _H_DICT:
            raise NotImplementedError("dictionary batches unsupported")
        else:
            raise ValueError(f"message header type {htype}")
    if schema is None:
        raise ValueError("stream carries no Schema message")
    return schema, columns


# --------------------------------------------------------------------------
# Arrow FILE format (Feather v2 / ".arrow" files): the stream wrapped
# in "ARROW1" magic with a FOOTER flatbuffer for random access —
# Footer { version(0); schema(1); dictionaries(2); recordBatches(3) },
# Block struct { offset: i64; metaDataLength: i32 (+pad); bodyLength:
# i64 } = 24 bytes. Readers seek the footer and jump straight to any
# batch; the tail is [footer][i32 footer_len]["ARROW1"].
# --------------------------------------------------------------------------

_MAGIC = b"ARROW1"


def encode_arrow_file(
    schema: list[tuple[str, str]],
    batches: list[dict[str, list]],
) -> bytes:
    """Arrow FILE (Feather v2) bytes: magic + stream messages + a real
    Footer flatbuffer with per-batch Block entries."""
    stream = encode_arrow_ipc(schema, batches)
    body = stream[:-8]  # drop the stream EOS marker
    out = bytearray(_MAGIC + b"\x00\x00")
    base = len(out)
    out += body
    # locate each record-batch message to build the Block vector
    blocks = []
    pos = 0
    while pos < len(body):
        (mlen,) = struct.unpack_from("<I", body, pos + 4)
        fb = _FB(body[pos + 8 : pos + 8 + mlen])
        msg = fb.root()
        htype = fb.scalar_field(msg, 1, "<B", 0)
        blen = fb.scalar_field(msg, 3, "<q", 0)
        if htype == _H_BATCH:
            blocks.append((base + pos, 8 + mlen, blen))
        pos += 8 + mlen + blen
    out += _CONT + b"\x00\x00\x00\x00"  # in-file EOS (pyarrow writes it)
    b = _Builder()
    fvec = b.vector_of_tables([_field_table(b, n, t) for n, t in schema])
    sch = b.table([(0, "i16", 0), (1, "offset", fvec)])
    raw = bytearray()
    for off, mdlen, blen in blocks:
        raw += struct.pack("<qi4xq", off, mdlen, blen)  # Block: 24 B
    bvec = b.vector_of_structs(bytes(raw), len(blocks), align=8)
    dvec = b.vector_of_structs(b"", 0, align=8)
    footer = b.table(
        [(0, "i16", 4), (1, "offset", sch), (2, "offset", dvec),
         (3, "offset", bvec)]
    )
    fbuf = b.finish(footer)
    out += fbuf
    out += struct.pack("<i", len(fbuf)) + _MAGIC
    return bytes(out)


def decode_arrow_file(payload: bytes):
    """Arrow FILE bytes -> (schema, columns), read the random-access
    way: seek the footer, take the schema from it, jump to each Block
    and decode that batch — the stream messages between are never
    scanned linearly."""
    if payload[:6] != _MAGIC or payload[-6:] != _MAGIC:
        raise ValueError("not an Arrow file (ARROW1 magic missing)")
    (flen,) = struct.unpack_from("<i", payload, len(payload) - 10)
    fstart = len(payload) - 10 - flen
    if fstart < 8:
        raise ValueError("Arrow file footer length out of range")
    fb = _FB(payload[fstart : fstart + flen])
    footer = fb.root()
    spos = fb.table_field(footer, 1)
    if spos is None:
        raise ValueError("Arrow file footer carries no schema")
    schema = _parse_schema_table(fb, spos)
    columns: dict[str, list] = {name: [] for name, _ in schema}
    dvec, n_dicts = fb.vector_field(footer, 2)
    if n_dicts:
        raise NotImplementedError("dictionary batches unsupported")
    bvec, n_blocks = fb.vector_field(footer, 3)
    for i in range(n_blocks):
        off = fb.i64(bvec + 24 * i)
        (mdlen,) = struct.unpack_from("<i", fb.buf, bvec + 24 * i + 8)
        blen = fb.i64(bvec + 24 * i + 16)
        if payload[off : off + 4] != _CONT:
            raise ValueError(f"Block {i} does not start a message")
        (mlen,) = struct.unpack_from("<I", payload, off + 4)
        mfb = _FB(payload[off + 8 : off + 8 + mlen])
        msg = mfb.root()
        if mfb.scalar_field(msg, 1, "<B", 0) != _H_BATCH:
            raise ValueError(f"Block {i} is not a RecordBatch message")
        body = payload[off + mdlen : off + mdlen + blen]
        if len(body) != blen:
            raise ValueError(f"Block {i} body truncated")
        hpos = mfb.table_field(msg, 2)
        _read_batch_into(mfb, hpos, body, schema, columns)
    return schema, columns
