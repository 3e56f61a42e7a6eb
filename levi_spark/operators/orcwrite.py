"""First-principles Apache ORC writer: protobuf footers, RLEv2
(SHORT_REPEAT / DIRECT / fixed-delta DELTA) integer encoding,
byte/boolean RLE, PRESENT bitmaps, string / binary DIRECT_V2 and
DICTIONARY_V2, date / decimal / timestamp columns, LIST / STRUCT /
MAP / UNION nesting, per-stripe + file + per-ROW-GROUP statistics
with seek positions (ROW_INDEX), and chunked compression framing
over this repo's own compressors (``zstd_compress``,
``snappy_compress``, raw ``deflate`` — ORC "ZLIB" — and
``lz4_block_compress``).

The symmetric half of :mod:`levi_spark.operators.orc`: files written
here are read back value-exact by pyarrow.orc, by Spark's native ORC
reader, and by our own first-principles reader (the same three-reader
cross-check design as the parquet writer in
``operators/parquetwrite.py``).

Timestamps use the JAVA writer convention (second truncated toward
zero, nanos in [0, 1e9) — what Spark's own writer emits), because
Spark's reader rejects the C++ negative-nanos layout outright.  The
price is the ecosystem's known boundary divergence: instants inside
the second just before 1970-01-01 read back +1 s under the C++/pyarrow
rule — exactly as they do from Spark-written files (byte-level
derivation in ``operators/orc.py:_decode_nanos``).

100 TB shape: a writer task emits one stripe per ``stripe_rows``
slice with stats computed inline, so downstream scans prune on the
stripe statistics this writer itself records — the write side of the
planner loop closed for ORC exactly as round 10 closed it for parquet.
"""
from __future__ import annotations

import struct

from levi_spark.operators.deflate import deflate
from levi_spark.operators.lz4 import lz4_block_compress
from levi_spark.operators.orc import _FBS, MAGIC, _TYPE_KINDS
from levi_spark.operators.snappy import snappy_compress
from levi_spark.operators.zstd import zstd_compress

_SECS_EPOCH_2015 = 1420070400

_CODECS = {"none": 0, "zlib": 1, "snappy": 2, "lz4": 4, "zstd": 5}


# ---------------------------------------------------------------- protobuf
def _uv(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _f(field: int, wire: int) -> bytes:
    return _uv(field << 3 | wire)


def pb_varint(field: int, v: int) -> bytes:
    return _f(field, 0) + _uv(v)


def pb_bytes(field: int, b: bytes) -> bytes:
    return _f(field, 2) + _uv(len(b)) + b


def pb_packed(field: int, vals: list[int]) -> bytes:
    body = b"".join(_uv(v) for v in vals)
    return pb_bytes(field, body)


def pb_double(field: int, v: float) -> bytes:
    return _f(field, 1) + struct.pack("<d", v)


# --------------------------------------------------------------- run-lengths
def byte_rle_encode(vals: list[int]) -> bytes:
    """ORC byte RLE: runs of 3..130 as [len-3, byte]; literals of
    1..128 as [256-n, bytes...]."""
    out = bytearray()
    i, n = 0, len(vals)
    lit_start = 0

    def flush_literals(end):
        j = lit_start
        while j < end:
            k = min(128, end - j)
            out.append(256 - k)
            out.extend(vals[j : j + k])
            j += k

    while i < n:
        run = 1
        while i + run < n and vals[i + run] == vals[i] and run < 130:
            run += 1
        if run >= 3:
            flush_literals(i)
            out.append(run - 3)
            out.append(vals[i])
            i += run
            lit_start = i
        else:
            i += run
    flush_literals(n)
    return bytes(out)


def boolean_rle_encode(bits: list[bool]) -> bytes:
    bb = []
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i : i + 8]):
            if bit:
                b |= 1 << (7 - j)
        bb.append(b)
    return byte_rle_encode(bb)


def _width_code(bits: int) -> tuple[int, int]:
    for code, w in enumerate(_FBS):
        if w >= bits:
            return code, w
    raise ValueError(f"width {bits}")


class _BitWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, width: int):
        self.acc = (self.acc << width) | v
        self.n += width
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def done(self) -> bytes:
        if self.n:
            self.out.append((self.acc << (8 - self.n)) & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def int_rle_v2_encode(vals: list[int], signed: bool) -> bytes:
    """RLEv2 with SHORT_REPEAT for runs >= 3 (<= 10), fixed-delta
    DELTA for constant-stride runs >= 4 (sorted keys, sequential ids),
    and DIRECT for everything else (chunks of <= 512) — a legal,
    self-describing subset of the four sub-encodings; any reader must
    accept it."""
    out = bytearray()
    i, n = 0, len(vals)
    while i < n:
        run = 1
        while i + run < n and vals[i + run] == vals[i] and run < 10:
            run += 1
        if run >= 3:
            v = _zz(vals[i]) if signed else vals[i]
            width = max(1, (v.bit_length() + 7) // 8)
            out.append((width - 1) << 3 | (run - 3))
            out.extend(v.to_bytes(width, "big"))
            i += run
            continue
        # fixed-delta DELTA: constant non-zero stride (wcode 0 means
        # "all remaining deltas equal the delta base")
        if i + 3 < n:
            d = vals[i + 1] - vals[i]
            if d and vals[i + 2] - vals[i + 1] == d \
                    and vals[i + 3] - vals[i + 2] == d:
                run = 3
                while (i + run + 1 < n and run < 511
                       and vals[i + run + 1] - vals[i + run] == d):
                    run += 1
                length = run + 1  # values covered
                out.append(0xC0 | (length - 1) >> 8)
                out.append((length - 1) & 0xFF)
                out += _uv(_zz(vals[i]) if signed else vals[i])
                out += _uv(_zz(d))
                i += length
                continue
        # DIRECT chunk: stop early at the next repeat-run of >= 6 so
        # long runs still get SHORT_REPEATs
        j = i
        while j < n and j - i < 512:
            if (j + 6 <= n
                    and all(vals[j + k] == vals[j] for k in range(1, 6))):
                break
            j += 1
        if j == i:
            j = min(i + 512, n)
        chunk = [(_zz(v) if signed else v) for v in vals[i:j]]
        bits = max(1, max(v.bit_length() for v in chunk))
        code, width = _width_code(bits)
        length = len(chunk)
        out.append(0x40 | code << 1 | (length - 1) >> 8)
        out.append((length - 1) & 0xFF)
        bw = _BitWriter()
        for v in chunk:
            bw.write(v, width)
        out.extend(bw.done())
        i = j
    return bytes(out)


# -------------------------------------------------------------- compression
def _compressor(codec: str):
    if codec == "zlib":
        return lambda b: deflate(b, mode="fixed")
    if codec == "snappy":
        return snappy_compress
    if codec == "zstd":
        return lambda b: zstd_compress(b, checksum=False)
    if codec == "lz4":
        return lz4_block_compress
    raise NotImplementedError(f"ORC write codec {codec}")


def compress_stream(buf: bytes, codec: str, block: int = 262144) -> bytes:
    """ORC chunked framing: 3-byte LE header, low bit = isOriginal."""
    if codec == "none":
        return buf
    fn = _compressor(codec)
    out = bytearray()
    for at in range(0, len(buf), block):
        chunk = buf[at : at + block]
        comp = fn(chunk)
        if len(comp) < len(chunk):
            h = len(comp) << 1
            out += h.to_bytes(3, "little") + comp
        else:
            h = len(chunk) << 1 | 1
            out += h.to_bytes(3, "little") + chunk
    return bytes(out)


# ------------------------------------------------------------ type parsing
def _parse_type(spec: str) -> dict:
    s = spec.strip()
    low = s.lower()
    if low.startswith("list<") and s.endswith(">"):
        return {"kind": "list", "child": _parse_type(s[5:-1])}
    if low.startswith("struct<") and s.endswith(">"):
        fields = []
        for part in _split_top(s[7:-1]):
            fname, _, ftype = part.partition(":")
            fields.append((fname.strip(), _parse_type(ftype)))
        return {"kind": "struct", "fields": fields}
    if low.startswith("map<") and s.endswith(">"):
        k, v = _split_top(s[4:-1])
        return {"kind": "map", "key": _parse_type(k),
                "value": _parse_type(v)}
    if low.startswith("union<") and s.endswith(">"):
        return {"kind": "union",
                "branches": [_parse_type(p) for p in _split_top(s[6:-1])]}
    if low.startswith("decimal(") and s.endswith(")"):
        p, sc = s[8:-1].split(",")
        return {"kind": "decimal", "precision": int(p), "scale": int(sc)}
    if low in ("long", "int", "short", "byte", "boolean", "float",
               "double", "string", "binary", "date", "timestamp"):
        return {"kind": low}
    raise NotImplementedError(f"ORC write type {spec!r}")


def _split_top(s: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "<" or ch == "(":
            depth += 1
        elif ch == ">" or ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _flatten_types(root_fields: list[tuple[str, dict]]) -> list[dict]:
    """Pre-order column tree, ids assigned like the ORC spec."""
    types: list[dict] = []

    def add(node: dict) -> int:
        my = len(types)
        types.append(node)
        node["id"] = my
        node["subtypes"] = []
        if node["kind"] == "struct":
            for _fn, child in node["fields"]:
                node["subtypes"].append(add(child))
        elif node["kind"] == "list":
            node["subtypes"].append(add(node["child"]))
        elif node["kind"] == "map":
            node["subtypes"].append(add(node["key"]))
            node["subtypes"].append(add(node["value"]))
        elif node["kind"] == "union":
            for br in node["branches"]:
                node["subtypes"].append(add(br))
        return my

    root = {"kind": "struct", "fields": root_fields}
    add(root)
    return types


_KIND_ENUM = {k: i for i, k in enumerate(_TYPE_KINDS)}


def _type_pb(node: dict) -> bytes:
    out = pb_varint(1, _KIND_ENUM[node["kind"]])
    if node["subtypes"]:
        out += pb_packed(2, node["subtypes"])
    if node["kind"] == "struct":
        for fn, _c in node["fields"]:
            out += pb_bytes(3, fn.encode())
    if node["kind"] == "decimal":
        out += pb_varint(5, node["precision"])
        out += pb_varint(6, node["scale"])
    return out


# ------------------------------------------------------------ column encode
class _Streams:
    """Per-column stream accumulator for one stripe."""

    def __init__(self):
        self.order: list[tuple[int, int, bytes]] = []  # (col, kind, raw)

    def add(self, col: int, kind: int, raw: bytes):
        # zero-length streams are recorded, not skipped: readers
        # (pyarrow's C++ in particular) require e.g. the DATA stream
        # of an all-null column to EXIST with length 0
        self.order.append((col, kind, raw))


_STREAM_DATA, _STREAM_LENGTH, _STREAM_SECONDARY = 1, 2, 5
_STREAM_PRESENT, _STREAM_DICTIONARY = 0, 3


_ENC_DIRECT, _ENC_DICT_V2 = 0, 3
_ENC_DIRECT_V2 = 2
_V2_KINDS = {"long", "int", "short", "string", "binary", "date",
             "decimal", "timestamp", "list", "map"}


def _collect_nullable(node: dict, vals: list, out: set) -> None:
    """Pre-pass marking every column id whose slice holds a null —
    so PRESENT streams stay CONSISTENT across row groups when the
    encoders restart per group (a group without nulls must still emit
    its PRESENT run if any sibling group has one)."""
    present = [v for v in vals if v is not None]
    if len(present) != len(vals):
        out.add(node["id"])
    kind = node["kind"]
    if kind == "struct":
        for fname, child in node["fields"]:
            _collect_nullable(child, [row[fname] for row in present], out)
    elif kind == "list":
        _collect_nullable(node["child"],
                          [x for v in present for x in v], out)
    elif kind == "map":
        items = [list(v.items()) if isinstance(v, dict) else list(v)
                 for v in present]
        flat = [kv for v in items for kv in v]
        _collect_nullable(node["key"], [k for k, _ in flat], out)
        _collect_nullable(node["value"], [v for _, v in flat], out)
    elif kind == "union":
        for i, br in enumerate(node["branches"]):
            _collect_nullable(br, [v for t, v in present if t == i], out)


def _encode_column(node: dict, vals: list, streams: _Streams,
                   stats: list, use_dict: bool = False,
                   force_present: set | None = None) -> None:
    """Encode one column's slice (``vals`` has one slot per occurrence
    in the parent context, None = null) and recurse into children.
    Records the encoding actually used on ``node["_enc"]`` /
    ``node["_dict_size"]`` for the stripe footer."""
    col = node["id"]
    kind = node["kind"]
    node["_enc"] = _ENC_DIRECT_V2 if kind in _V2_KINDS else _ENC_DIRECT
    node["_dict_size"] = 0
    has_null = any(v is None for v in vals)
    if has_null or (force_present and col in force_present):
        streams.add(col, _STREAM_PRESENT,
                    boolean_rle_encode([v is not None for v in vals]))
    present = [v for v in vals if v is not None]
    st = {"n": len(present), "has_null": has_null, "kind": kind}
    stats.append((col, st))

    if kind == "struct":
        for idx, (fname, child) in enumerate(node["fields"]):
            child_vals = [row[fname] for row in present]
            _encode_column(child, child_vals, streams, stats,
                           force_present=force_present)
        return
    if kind == "list":
        lens = [len(v) for v in present]
        streams.add(col, _STREAM_LENGTH, int_rle_v2_encode(lens, False))
        flat = [x for v in present for x in v]
        _encode_column(node["child"], flat, streams, stats,
                       force_present=force_present)
        return
    if kind == "map":
        items = [list(v.items()) if isinstance(v, dict) else list(v)
                 for v in present]
        lens = [len(v) for v in items]
        streams.add(col, _STREAM_LENGTH, int_rle_v2_encode(lens, False))
        flat = [kv for v in items for kv in v]
        _encode_column(node["key"], [k for k, _ in flat], streams,
                       stats, force_present=force_present)
        _encode_column(node["value"], [v for _, v in flat], streams,
                       stats, force_present=force_present)
        return
    if kind == "union":
        # values are (tag, value) pairs; DATA = tag byte RLE, each
        # branch child carries its own occurrences in row order
        tags = [int(t) for t, _v in present]
        nb = len(node["branches"])
        if tags and not all(0 <= t < nb for t in tags):
            raise ValueError("ORC union: tag out of range")
        streams.add(col, _STREAM_DATA, byte_rle_encode(tags))
        for i, br in enumerate(node["branches"]):
            _encode_column(br, [v for t, v in present if t == i],
                           streams, stats,
                           force_present=force_present)
        return

    if use_dict and kind in ("string", "binary"):
        raws = [v.encode("utf-8") if isinstance(v, str) else bytes(v)
                for v in present]
        entries = sorted(set(raws))
        index = {r: j for j, r in enumerate(entries)}
        node["_enc"] = _ENC_DICT_V2
        node["_dict_size"] = len(entries)
        streams.add(col, _STREAM_DATA,
                    int_rle_v2_encode([index[r] for r in raws], False))
        streams.add(col, _STREAM_DICTIONARY,
                    b"".join(entries))
        streams.add(col, _STREAM_LENGTH,
                    int_rle_v2_encode([len(e) for e in entries], False))
        if kind == "string" and present:
            st.update(smin=min(present), smax=max(present))
        return

    if kind in ("long", "int", "short"):
        streams.add(col, _STREAM_DATA, int_rle_v2_encode(present, True))
        if present:
            st.update(min=min(present), max=max(present),
                      sum=sum(present))
    elif kind == "byte":
        streams.add(col, _STREAM_DATA,
                    byte_rle_encode([v & 0xFF for v in present]))
    elif kind == "boolean":
        streams.add(col, _STREAM_DATA,
                    boolean_rle_encode([bool(v) for v in present]))
    elif kind in ("float", "double"):
        fmt = "<f" if kind == "float" else "<d"
        streams.add(col, _STREAM_DATA,
                    b"".join(struct.pack(fmt, float(v)) for v in present))
        if present:
            st.update(dmin=min(present), dmax=max(present))
    elif kind in ("string", "binary"):
        raws = [v.encode("utf-8") if isinstance(v, str) else bytes(v)
                for v in present]
        streams.add(col, _STREAM_DATA, b"".join(raws))
        streams.add(col, _STREAM_LENGTH,
                    int_rle_v2_encode([len(r) for r in raws], False))
        if kind == "string" and present:
            st.update(smin=min(present), smax=max(present))
    elif kind == "date":
        streams.add(col, _STREAM_DATA, int_rle_v2_encode(present, True))
        if present:
            st.update(date_min=min(present), date_max=max(present))
    elif kind == "decimal":
        body = bytearray()
        for v in present:
            u = _zz(int(v))
            while True:
                b = u & 0x7F
                u >>= 7
                body.append(b | 0x80 if u else b)
                if not u:
                    break
        streams.add(col, _STREAM_DATA, bytes(body))
        streams.add(col, _STREAM_SECONDARY,
                    int_rle_v2_encode([node["scale"]] * len(present),
                                      True))
    elif kind == "timestamp":
        # Java convention (what Spark's own writer emits): second
        # truncated TOWARD ZERO, nanos always in [0, 1e9). Spark's
        # reader REJECTS the C++ negative-nanos layout outright
        # ("nanos > 999999999 or < 0"), so this is the only layout all
        # three readers accept; the price is the ecosystem's known
        # boundary divergence — instants inside the second just before
        # 1970-01-01 read back +1 s under the C++ rule (pyarrow and
        # our reader), exactly as they do from Spark-written files.
        secs, nanos = [], []
        for ns in present:
            q, r = divmod(int(ns), 10**9)
            if r and q < 0:  # trunc toward zero
                q += 1
            secs.append(q - _SECS_EPOCH_2015)
            nanos.append(_pack_nanos(r))
        streams.add(col, _STREAM_DATA, int_rle_v2_encode(secs, True))
        streams.add(col, _STREAM_SECONDARY,
                    int_rle_v2_encode(nanos, False))
    else:
        raise NotImplementedError(f"ORC write kind {kind}")


def _pack_nanos(r: int) -> int:
    """Trailing-zero packing; negative values stored as unsigned
    two's complement (the C++ writer layout our reader decodes)."""
    z = 0
    if r:
        t = abs(r)
        while t % 10 == 0 and z < 8:
            t //= 10
            z += 1
    if z >= 2:
        packed = (r // 10**z) << 3 | (z - 1)
    else:
        packed = r << 3
    return packed & ((1 << 64) - 1)


def _stats_pb(st: dict) -> bytes:
    out = pb_varint(1, st["n"])
    if "min" in st:
        body = (pb_varint(1, _zz(st["min"])) + pb_varint(2, _zz(st["max"]))
                + pb_varint(3, _zz(st["sum"])))
        out += pb_bytes(2, body)
    if "dmin" in st:
        out += pb_bytes(3, pb_double(1, st["dmin"])
                        + pb_double(2, st["dmax"]))
    if "smin" in st:
        out += pb_bytes(4, pb_bytes(1, st["smin"].encode())
                        + pb_bytes(2, st["smax"].encode()))
    if "date_min" in st:
        out += pb_bytes(7, pb_varint(1, _zz(st["date_min"]))
                        + pb_varint(2, _zz(st["date_max"])))
    out += pb_varint(10, 1 if st["has_null"] else 0)
    return out


# ----------------------------------------------------------------- writer
def _merge_stat(f: dict, s: dict) -> None:
    f["n"] += s["n"]
    f["has_null"] |= s["has_null"]
    for lo, hi in (("min", "max"), ("dmin", "dmax"),
                   ("smin", "smax"), ("date_min", "date_max")):
        if lo in s:
            f[lo] = s[lo] if lo not in f else min(f[lo], s[lo])
            f[hi] = s[hi] if hi not in f else max(f[hi], s[hi])
    if "sum" in s:
        f["sum"] = f.get("sum", 0) + s["sum"]


def _pos_extra(kind: str, skind: int) -> int:
    """Zero-valued skip slots appended after the byte offsets in each
    ROW_INDEX position list — zero because this writer RESTARTS every
    encoder (and compression chunk) at row-group boundaries, which the
    positions spec permits. Mirrors the canonical layout the reader's
    ``read_row_group`` consumes."""
    if skind == _STREAM_PRESENT:
        return 2  # byte-RLE skip + bit offset
    if skind == _STREAM_DATA:
        if kind == "boolean":
            return 2
        if kind in ("float", "double", "string", "binary", "decimal"):
            return 0  # plain byte / varint stream
        return 1  # RLE values (ints, byte RLE tags)
    if skind in (_STREAM_LENGTH, _STREAM_SECONDARY):
        return 1
    return 0


def write_orc(columns: list[tuple[str, str, list]],
              compression: str = "zstd",
              stripe_rows: int | None = None,
              block_size: int = 262144,
              dictionary: bool | list[str] = False,
              row_index_stride: int = 10000,
              bloom_filter: list[str] | None = None,
              bloom_fpp: float = 0.05) -> bytes:
    """``[(name, type, values-with-None), ...]`` -> ORC file bytes.

    Types: ``long int short byte boolean float double string binary
    date decimal(p,s) timestamp list<T> struct<a:T,...> map<K,V>
    union<T1,T2,...>``.  Value conventions match
    :mod:`levi_spark.operators.orc`'s reader: dates are epoch days,
    decimals unscaled ints, timestamps epoch NANOSECONDS; struct
    values are dicts, maps dicts or (k, v) lists, unions (tag, value)
    pairs.  ``dictionary`` (True, or a list of column names) switches
    top-level string/binary columns to DICTIONARY_V2 (sorted dict,
    per-stripe) — and disables the row index, since the per-stripe
    dictionary cannot restart per group.

    ``row_index_stride`` > 0 writes ROW_INDEX streams: per-group
    min/max statistics plus seek positions.  Every encoder and
    compression chunk restarts at group boundaries, so positions are
    plain byte offsets with zero skip counts — readers (including our
    ``read_row_group`` and engines doing predicate pushdown) can skip
    straight to any 10k-row group of any column.

    ``bloom_filter`` names top-level flat columns (int family, date,
    float/double, string, binary) that get a ``BLOOM_FILTER_UTF8``
    index stream: one filter per row group, sized for
    ``row_index_stride`` expected entries at ``bloom_fpp``
    (:mod:`levi_spark.operators.orcbloom` — bitsets byte-identical to
    the ORC C++ library's). Nulls are not added (readers combine the
    bloom with the hasNull statistic). Requires an active row index,
    since filters share its row-group granularity.
    """
    if compression not in _CODECS:
        raise NotImplementedError(f"ORC codec {compression!r}")
    n_rows = len(columns[0][2])
    for name, _t, vals in columns:
        if len(vals) != n_rows:
            raise ValueError(f"column {name}: ragged length")
    root_fields = [(name, _parse_type(t)) for name, t, _v in columns]
    types = _flatten_types(root_fields)
    n_cols = len(types)
    want_dict = {
        name: (dictionary is True
               or (isinstance(dictionary, list) and name in dictionary))
        for name, _t, _v in columns
    }
    stride = 0 if any(want_dict.values()) else (row_index_stride or 0)
    if stride and stride % 8:
        raise ValueError("row_index_stride must be a multiple of 8")
    if stride:
        # group-restarted encoders pad BIT-PACKED streams to byte
        # boundaries; that is only a valid continuous stream when the
        # per-group bit count is divisible by 8.  Top-level PRESENT
        # always is (stride % 8 == 0); a nullable boolean's DATA and
        # any sub-top-level PRESENT / boolean are not — those schemas
        # write without an index rather than an invalid one.
        whole_null: set[int] = set()
        for (name, _t, vals), (fname, node) in zip(columns, root_fields):
            _collect_nullable(node, vals, whole_null)

        def _bit_ok(node, top):
            if node["kind"] == "boolean" and (
                not top or node["id"] in whole_null
            ):
                return False
            if not top and node["id"] in whole_null:
                return False
            kids = (node.get("fields") and
                    [c for _f, c in node["fields"]]) or []
            if node["kind"] == "list":
                kids = [node["child"]]
            elif node["kind"] == "map":
                kids = [node["key"], node["value"]]
            elif node["kind"] == "union":
                kids = node["branches"]
            return all(_bit_ok(c, False) for c in kids)

        if not all(_bit_ok(node, True) for _n, node in root_fields):
            stride = 0

    bloom_ids: dict[int, str] = {}  # type id -> hash kind
    if bloom_filter:
        from levi_spark.operators.orcbloom import (
            _BYTES_KINDS, _LONG_KINDS, BloomFilter,
        )
        if not stride:
            raise ValueError(
                "bloom_filter requires an active row index (filters "
                "share its row-group granularity)"
            )
        by_name = {name: node for name, node in root_fields}
        for bname in bloom_filter:
            if bname not in by_name:
                raise ValueError(f"bloom_filter: no column {bname!r}")
            node = by_name[bname]
            if node["kind"] not in (
                _LONG_KINDS | _BYTES_KINDS | {"float", "double"}
            ):
                raise ValueError(
                    f"bloom_filter: unsupported kind {node['kind']!r} "
                    f"for column {bname!r}"
                )
            bloom_ids[node["id"]] = node["kind"]

    out = bytearray(MAGIC)  # 3-byte header
    stripe_infos = []
    stripe_stats_pb = []
    file_stats = [dict(n=0, has_null=False) for _ in range(n_cols)]
    sr = stripe_rows or max(n_rows, 1)

    for start in range(0, n_rows, sr):
        rows = min(sr, n_rows - start)
        g_size = stride if stride else max(rows, 1)
        nullable: set[int] = set()
        for (name, _t, vals), (fname, node) in zip(columns, root_fields):
            _collect_nullable(node, vals[start : start + rows], nullable)
        # encode per row group (encoders restart at boundaries)
        group_streams: list[_Streams] = []
        group_stats: list[dict[int, dict]] = []
        group_blooms: list[dict[int, object]] = []
        for g0 in range(0, rows, g_size):
            grows = min(g_size, rows - g0)
            enc = _Streams()
            stats_g: list[tuple[int, dict]] = [(0, {
                "n": grows, "has_null": False, "kind": "struct"})]
            blooms_g: dict[int, object] = {}
            for (name, _t, vals), (fname, node) in zip(
                columns, root_fields
            ):
                gvals = vals[start + g0 : start + g0 + grows]
                _encode_column(
                    node, gvals,
                    enc, stats_g, use_dict=want_dict[name],
                    force_present=nullable,
                )
                if node["id"] in bloom_ids:
                    bf = BloomFilter(stride, bloom_fpp)
                    kind = bloom_ids[node["id"]]
                    for v in gvals:
                        if v is not None:
                            bf.add(v, kind)
                    blooms_g[node["id"]] = bf
            group_streams.append(enc)
            group_stats.append({c: s for c, s in stats_g})
            group_blooms.append(blooms_g)
        keys = [(c, k) for c, k, _ in group_streams[0].order]
        for gs in group_streams[1:]:
            if [(c, k) for c, k, _ in gs.order] != keys:
                raise AssertionError("ORC writer: stream set diverged "
                                     "across row groups")
        # concatenate per-stream group chunks; record per-group offsets
        framed_parts: dict[tuple, list[bytes]] = {k: [] for k in keys}
        for gs in group_streams:
            for c, k, raw in gs.order:
                framed_parts[(c, k)].append(
                    compress_stream(raw, compression, block_size)
                )
        # merged stripe stats per column
        per_col: dict[int, dict] = {
            c: dict(n=0, has_null=False) for c in range(n_cols)
        }
        for gstats in group_stats:
            for c in range(n_cols):
                _merge_stat(per_col[c], gstats[c])

        offset = len(out)
        stream_meta = []
        if stride:
            # ROW_INDEX streams first (they ARE the stripe's index
            # region), one per column, entries in row-group order
            col_keys: dict[int, list[tuple]] = {}
            for c, k in keys:
                col_keys.setdefault(c, []).append((c, k))
            base = 1 if compression == "none" else 2
            for c in range(n_cols):
                entries = b""
                for g in range(len(group_streams)):
                    positions: list[int] = []
                    for key in col_keys.get(c, []):
                        off = sum(len(p) for p in framed_parts[key][:g])
                        positions.append(off)
                        if base == 2:
                            positions.append(0)  # offset inside chunk
                        positions += [0] * _pos_extra(
                            types[c]["kind"], key[1]
                        )
                    entry = (pb_packed(1, positions) if positions
                             else b"")
                    entry += pb_bytes(2, _stats_pb(group_stats[g][c]))
                    entries += pb_bytes(1, entry)
                framed = compress_stream(entries, compression,
                                         block_size)
                stream_meta.append((6, c, len(framed)))  # ROW_INDEX
                out += framed
                if c in bloom_ids:
                    from levi_spark.operators.orcbloom import (
                        bloom_index_pb,
                    )
                    idx = bloom_index_pb(
                        [gb[c] for gb in group_blooms]
                    )
                    framed = compress_stream(idx, compression,
                                             block_size)
                    # BLOOM_FILTER_UTF8 sits right after its column's
                    # ROW_INDEX, the layout the C++ writer produces
                    stream_meta.append((8, c, len(framed)))
                    out += framed
        index_len = len(out) - offset
        for key in keys:
            framed = b"".join(framed_parts[key])
            stream_meta.append((key[1], key[0], len(framed)))
            out += framed
        data_len = len(out) - offset - index_len
        # stripe footer
        sf = b"".join(
            pb_bytes(1, pb_varint(1, skind) + pb_varint(2, col)
                     + pb_varint(3, ln))
            for skind, col, ln in stream_meta
        )
        # per-column encoding as actually used this stripe (DIRECT_V2
        # where an RLEv2 stream exists, DICTIONARY_V2 when requested,
        # plain DIRECT otherwise — pyarrow's StructColumnReader
        # rejects anything else on structs)
        sf += b"".join(
            pb_bytes(2, pb_varint(1, t.get(
                "_enc", _ENC_DIRECT_V2 if t["kind"] in _V2_KINDS
                else _ENC_DIRECT))
                + (pb_varint(2, t["_dict_size"])
                   if t.get("_dict_size") else b""))
            for t in types
        )
        sf += pb_bytes(3, b"UTC")
        sf_framed = compress_stream(sf, compression, block_size)
        out += sf_framed
        stripe_infos.append({
            "offset": offset, "index_length": index_len,
            "data_length": data_len,
            "footer_length": len(sf_framed), "num_rows": rows,
        })
        # per-stripe stats (metadata section) + file-stat fold
        ss = b"".join(pb_bytes(1, _stats_pb(per_col[c]))
                      for c in range(n_cols))
        stripe_stats_pb.append(pb_bytes(1, ss))
        for c in range(n_cols):
            _merge_stat(file_stats[c], per_col[c])

    meta = b"".join(stripe_stats_pb)
    meta_framed = compress_stream(meta, compression, block_size)
    out += meta_framed

    footer = pb_varint(1, 3)  # headerLength
    content_len = (stripe_infos[-1]["offset"]
                   + stripe_infos[-1]["index_length"]
                   + stripe_infos[-1]["data_length"]
                   + stripe_infos[-1]["footer_length"]) if stripe_infos \
        else 3
    footer += pb_varint(2, content_len)
    for si in stripe_infos:
        footer += pb_bytes(3, pb_varint(1, si["offset"])
                           + pb_varint(2, si["index_length"])
                           + pb_varint(3, si["data_length"])
                           + pb_varint(4, si["footer_length"])
                           + pb_varint(5, si["num_rows"]))
    for node in types:
        footer += pb_bytes(4, _type_pb(node))
    footer += pb_varint(6, n_rows)
    for c in range(n_cols):
        footer += pb_bytes(7, _stats_pb(file_stats[c]))
    footer += pb_varint(8, stride)  # rowIndexStride
    footer_framed = compress_stream(footer, compression, block_size)
    out += footer_framed

    ps = pb_varint(1, len(footer_framed))
    ps += pb_varint(2, _CODECS[compression])
    ps += pb_varint(3, block_size)
    ps += pb_packed(4, [0, 12])
    ps += pb_varint(5, len(meta_framed))
    ps += pb_varint(6, 1)  # writerVersion
    ps += pb_bytes(8000, MAGIC)
    if len(ps) > 255:
        raise ValueError("postscript too long")
    out += ps
    out.append(len(ps))
    return bytes(out)
