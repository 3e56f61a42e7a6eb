"""Minimal-but-real PDF text layer — pure stdlib (zlib).

PDF is the single most common *document* format a training-data crawl
ingests, and "extract the text layer" is the first stage of every PDF
pipeline. This module implements the honest core of ISO 32000-1
(public spec; same structure since PDF 1.4):

* :func:`encode_pdf` writes a complete, valid PDF: header, numbered
  indirect objects (catalog → page tree → pages → FlateDecode content
  streams → one Type1 font), a byte-accurate classic ``xref`` table,
  trailer, ``startxref``, ``%%EOF``. Any conforming reader opens the
  output.
* :func:`decode_pdf_text` parses a PDF and returns the text layer per
  page: follows ``startxref`` to the classic cross-reference table
  (``/Prev`` chains included), resolves the trailer's ``/Root`` to
  the catalog, walks the ``/Pages`` tree (nested ``/Kids``), inflates
  each page's ``/Contents`` (no filter or ``/FlateDecode``; indirect
  ``/Length`` resolved), and tokenizes the content stream for the
  text-showing operators: ``Tj``, ``'``, ``"``, ``TJ`` (string items
  of the array; kerning numbers skipped). Line layout: ``T*``, ``'``,
  ``"``, ``Td`` and ``TD`` each start a new line (joined with
  ``\\n``). Literal strings handle the spec's escapes (``\\\\ \\( \\)
  \\n \\r \\t \\b \\f``, 1-3 digit octal, line continuations) and
  balanced unescaped parens; hex strings ``<..>`` (odd length pads a
  trailing 0) are supported.

Strict: bad header, missing/ill-formed xref, a ``/Prev`` loop,
unresolvable objects, ``stream`` keyword violations, and any stream
filter other than FlateDecode all raise (``ValueError`` /
``NotImplementedError``) — cross-reference *streams* (PDF 1.5
compressed xref) and encrypted files are refused loudly, not guessed
at. Text strings are treated as Latin-1 bytes (the round-trip
convention for the ASCII corpus this engine gates on; a full
/ToUnicode CMap layer is out of scope and refused implicitly by
returning the raw byte text). The reference engine has no document
surface; north-star extension surface like
:mod:`levi_spark.operators.warc`.
"""

from __future__ import annotations

import re
import zlib

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


# --------------------------------------------------------------------------
# object-level tokenizer/parser (xref dicts, trailer, page tree)
# --------------------------------------------------------------------------


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover - debug aid
        return f"_Ref({self.num})"


class _Name(str):
    """A /Name distinct from a string value."""


class _Parser:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def _skip_ws(self):
        b = self.buf
        while self.pos < len(b):
            c = b[self.pos : self.pos + 1]
            if c in (b"%",):
                nl = b.find(b"\n", self.pos)
                self.pos = len(b) if nl < 0 else nl + 1
            elif c in _WS:
                self.pos += 1
            else:
                return

    def parse(self):
        self._skip_ws()
        b, i = self.buf, self.pos
        if i >= len(b):
            raise ValueError("PDF object expected at end of buffer")
        c = b[i : i + 1]
        if b[i : i + 2] == b"<<":
            return self._dict()
        if c == b"<":
            return self._hex_string()
        if c == b"(":
            return self._literal_string()
        if c == b"[":
            return self._array()
        if c == b"/":
            return self._name()
        if c in b"+-.0123456789":
            return self._number_or_ref()
        m = re.match(rb"true|false|null", b[i:])
        if m:
            self.pos += m.end()
            return {b"true": True, b"false": False, b"null": None}[m.group()]
        raise ValueError(f"PDF parse error at byte {i}: {b[i:i+20]!r}")

    def _name(self) -> _Name:
        b = self.buf
        self.pos += 1
        out = bytearray()
        while self.pos < len(b):
            c = b[self.pos : self.pos + 1]
            if c in _WS or c in _DELIM:
                break
            if c == b"#":
                out.append(int(b[self.pos + 1 : self.pos + 3], 16))
                self.pos += 3
            else:
                out += c
                self.pos += 1
        return _Name(out.decode("latin-1"))

    def _number_or_ref(self):
        b = self.buf
        m = re.match(rb"[+-]?(?:\d+\.\d*|\.\d+|\d+)", b[self.pos :])
        if not m:
            raise ValueError(f"bad number at byte {self.pos}")
        tok = m.group()
        self.pos += m.end()
        if b"." in tok:
            return float(tok)
        n = int(tok)
        # lookahead for "gen R" — an indirect reference
        m2 = re.match(rb"\s+(\d+)\s+R(?![A-Za-z0-9])", b[self.pos :])
        if m2 and n >= 0:
            self.pos += m2.end()
            return _Ref(n)
        return n

    def _array(self) -> list:
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.buf[self.pos : self.pos + 1] == b"]":
                self.pos += 1
                return out
            out.append(self.parse())

    def _dict(self) -> dict:
        self.pos += 2
        out = {}
        while True:
            self._skip_ws()
            if self.buf[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                return out
            key = self.parse()
            if not isinstance(key, _Name):
                raise ValueError(f"dict key {key!r} is not a /Name")
            out[str(key)] = self.parse()

    def _hex_string(self) -> bytes:
        b = self.buf
        end = b.find(b">", self.pos)
        if end < 0:
            raise ValueError("unterminated hex string")
        hx = re.sub(rb"\s", b"", b[self.pos + 1 : end])
        self.pos = end + 1
        if len(hx) % 2:
            hx += b"0"  # spec: odd final digit implies trailing 0
        return bytes.fromhex(hx.decode("ascii"))

    def _literal_string(self) -> bytes:
        b = self.buf
        i = self.pos + 1
        depth = 1
        out = bytearray()
        esc = {
            b"n": 10, b"r": 13, b"t": 9, b"b": 8, b"f": 12,
            b"(": 40, b")": 41, b"\\": 92,
        }
        while i < len(b):
            c = b[i : i + 1]
            if c == b"\\":
                nxt = b[i + 1 : i + 2]
                if nxt in esc:
                    out.append(esc[nxt])
                    i += 2
                elif nxt.isdigit():
                    j = i + 1
                    while j < i + 4 and b[j : j + 1].isdigit():
                        j += 1
                    out.append(int(b[i + 1 : j], 8) & 0xFF)
                    i = j
                elif nxt in (b"\n", b"\r"):  # line continuation
                    i += 2
                    if nxt == b"\r" and b[i : i + 1] == b"\n":
                        i += 1
                else:  # unknown escape: drop the backslash (spec)
                    out += nxt
                    i += 2
                continue
            if c == b"(":
                depth += 1
            elif c == b")":
                depth -= 1
                if depth == 0:
                    self.pos = i + 1
                    return bytes(out)
            out += c
            i += 1
        raise ValueError("unterminated literal string")


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


def _esc(s: bytes) -> bytes:
    return s.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")


def _content_stream(ops: list[tuple]) -> bytes:
    out = [b"BT", b"/F1 12 Tf", b"72 720 Td", b"14 TL"]
    for op in ops:
        tag = op[0]
        if tag == "Tj":
            out.append(b"(" + _esc(op[1].encode("latin-1")) + b") Tj")
        elif tag == "TjHex":
            out.append(b"<" + op[1].encode("latin-1").hex().encode() + b"> Tj")
        elif tag == "quote":
            out.append(b"(" + _esc(op[1].encode("latin-1")) + b") '")
        elif tag == "dquote":
            aw, ac, s = op[1], op[2], op[3]
            out.append(
                b"%g %g (%s) \"" % (aw, ac, _esc(s.encode("latin-1")))
            )
        elif tag == "TJ":
            items = []
            for it in op[1]:
                if isinstance(it, str):
                    items.append(b"(" + _esc(it.encode("latin-1")) + b")")
                else:
                    items.append(b"%g" % it)
            out.append(b"[" + b" ".join(items) + b"] TJ")
        elif tag == "Tstar":
            out.append(b"T*")
        elif tag == "Td":
            out.append(b"%g %g Td" % (op[1], op[2]))
        elif tag == "TD":
            out.append(b"%g %g TD" % (op[1], op[2]))
        else:
            raise ValueError(f"unknown content op {tag!r}")
    out.append(b"ET")
    return b"\n".join(out)


def encode_pdf(pages: list[list[tuple]]) -> bytes:
    """``pages`` is a list of per-page op lists (see
    :func:`_content_stream` for the op vocabulary: Tj / TjHex / quote
    / dquote / TJ / Tstar / Td / TD). Returns a complete PDF with a
    byte-accurate xref table and FlateDecode content streams."""
    if not pages:
        raise ValueError("PDF needs at least one page")
    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    kids = b" ".join(b"%d 0 R" % (4 + 2 * i) for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    objs[3] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for i, ops in enumerate(pages):
        page_num, cont_num = 4 + 2 * i, 5 + 2 * i
        objs[page_num] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> "
            b"/Contents %d 0 R >>" % cont_num
        )
        raw = _content_stream(ops)
        z = zlib.compress(raw, 9)
        objs[cont_num] = (
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(z)
            + z
            + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n = max(objs) + 1
    out += b"xref\n0 %d\n" % n
    out += b"0000000000 65535 f \n"
    for num in range(1, n):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (n, xref_at)
    )
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def _parse_xref(buf: bytes, at: int, seen: set[int]) -> tuple[dict[int, int], dict]:
    """Classic xref table at ``at`` -> ({obj num: offset}, trailer),
    following /Prev chains (earlier tables never override later)."""
    if at in seen:
        raise ValueError("xref /Prev loop")
    seen.add(at)
    p = _Parser(buf, at)
    p._skip_ws()
    if buf[p.pos : p.pos + 4] != b"xref":
        if re.match(rb"\d+\s+\d+\s+obj", buf[p.pos : p.pos + 40]):
            raise NotImplementedError(
                "cross-reference stream (PDF 1.5 compressed xref) unsupported"
            )
        raise ValueError(f"no xref table at byte {at}")
    p.pos += 4
    table: dict[int, int] = {}
    while True:
        p._skip_ws()
        if buf[p.pos : p.pos + 7] == b"trailer":
            p.pos += 7
            break
        m = re.match(rb"(\d+)\s+(\d+)", buf[p.pos :])
        if not m:
            raise ValueError(f"bad xref subsection at byte {p.pos}")
        first, count = int(m.group(1)), int(m.group(2))
        p.pos += m.end()
        p._skip_ws()
        for k in range(count):
            ent = buf[p.pos : p.pos + 20]
            m2 = re.match(rb"(\d{10}) (\d{5}) ([nf])", ent)
            if not m2:
                raise ValueError(f"bad xref entry {ent!r}")
            if m2.group(3) == b"n":
                table.setdefault(first + k, int(m2.group(1)))
            p.pos += 20 if ent[18:19] in b"\r\n " and ent[19:20] in b"\r\n" else len(
                m2.group(0)
            )
            p._skip_ws()
    trailer = p.parse()
    if not isinstance(trailer, dict):
        raise ValueError("trailer is not a dictionary")
    if "Prev" in trailer:
        older, _ = _parse_xref(buf, int(trailer["Prev"]), seen)
        for k, v in older.items():
            table.setdefault(k, v)
    return table, trailer


class _Pdf:
    def __init__(self, buf: bytes):
        if not buf.startswith(b"%PDF-"):
            raise ValueError(f"not a PDF (starts {buf[:8]!r})")
        tail = buf[-256:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise ValueError("no startxref")
        self.buf = buf
        self.xref, self.trailer = _parse_xref(buf, int(m.group(1)), set())

    def obj(self, ref):
        """Resolve an indirect reference (or pass a direct value through)."""
        if not isinstance(ref, _Ref):
            return ref
        at = self.xref.get(ref.num)
        if at is None:
            raise ValueError(f"object {ref.num} not in xref")
        m = re.match(rb"(\d+)\s+\d+\s+obj", self.buf[at : at + 40])
        if not m or int(m.group(1)) != ref.num:
            raise ValueError(
                f"xref offset {at} does not hold object {ref.num}"
            )
        p = _Parser(self.buf, at + m.end())
        val = p.parse()
        if isinstance(val, dict):
            p._skip_ws()
            if self.buf[p.pos : p.pos + 6] == b"stream":
                val["__stream_at__"] = p.pos
        return val

    def stream_data(self, d: dict) -> bytes:
        at = d["__stream_at__"] + 6
        if self.buf[at : at + 2] == b"\r\n":
            at += 2
        elif self.buf[at : at + 1] == b"\n":
            at += 1
        else:
            raise ValueError("stream keyword not followed by EOL")
        length = self.obj(d["Length"])
        raw = self.buf[at : at + int(length)]
        if len(raw) != int(length):
            raise ValueError("stream truncated")
        filt = d.get("Filter")
        if filt is None:
            return raw
        filts = filt if isinstance(filt, list) else [filt]
        for f in filts:
            if str(f) == "FlateDecode":
                raw = zlib.decompress(raw)
            else:
                raise NotImplementedError(f"stream filter /{f} unsupported")
        return raw

    def pages(self) -> list[dict]:
        root = self.obj(self.trailer["Root"])
        out: list[dict] = []

        def walk(node_ref):
            node = self.obj(node_ref)
            t = str(node.get("Type", ""))
            if t == "Pages":
                for kid in node["Kids"]:
                    walk(kid)
            elif t == "Page":
                out.append(node)
            else:
                raise ValueError(f"page-tree node of /Type /{t}")

        walk(root["Pages"])
        return out


def _page_text(content: bytes) -> str:
    """Tokenize a content stream; gather the text-showing operators."""
    p = _Parser(content, 0)
    stack: list = []
    lines: list[bytearray] = [bytearray()]
    n = len(content)

    def newline():
        lines.append(bytearray())

    while True:
        p._skip_ws()
        if p.pos >= n:
            break
        c = content[p.pos : p.pos + 1]
        if c in b"(<[/+-.0123456789" or content[p.pos : p.pos + 2] == b"<<":
            stack.append(p.parse())
            continue
        m = re.match(rb"[A-Za-z'\"*][A-Za-z0-9'\"*]*", content[p.pos :])
        if not m:
            raise ValueError(
                f"content stream parse error at byte {p.pos}: "
                f"{content[p.pos:p.pos+12]!r}"
            )
        op = m.group()
        p.pos += m.end()
        if op == b"Tj":
            lines[-1] += stack[-1]
        elif op == b"'":
            newline()
            lines[-1] += stack[-1]
        elif op == b'"':
            newline()
            lines[-1] += stack[-1]
        elif op == b"TJ":
            for it in stack[-1]:
                if isinstance(it, bytes):
                    lines[-1] += it
        elif op in (b"T*", b"Td", b"TD"):
            if lines[-1]:
                newline()
        stack.clear()
    return "\n".join(ln.decode("latin-1") for ln in lines).strip("\n")


def decode_pdf_text(payload: bytes) -> list[str]:
    """PDF bytes -> text layer per page (see module docstring for the
    line-layout convention)."""
    pdf = _Pdf(payload)
    out = []
    for page in pdf.pages():
        conts = page.get("Contents")
        if conts is None:
            out.append("")
            continue
        refs = conts if isinstance(conts, list) else [conts]
        parts = []
        for r in refs:
            d = pdf.obj(r)
            if not isinstance(d, dict) or "__stream_at__" not in d:
                raise ValueError("/Contents is not a stream")
            parts.append(pdf.stream_data(d))
        out.append(_page_text(b"\n".join(parts)))
    return out
