"""PDF text layer (levi_spark.operators.pdf): encode->decode round
trips over every text-showing operator, string escapes and octal,
hex strings, multi-page trees, xref byte accuracy, /Prev chains,
and strict refusals (xref streams, foreign filters, bad offsets)."""

from __future__ import annotations

import re
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from levi_spark.operators.pdf import decode_pdf_text, encode_pdf

TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=255,
                           blacklist_characters="\x7f"),
    min_size=1, max_size=60,
)


@settings(max_examples=40, deadline=None)
@given(s=TEXT)
def test_tj_round_trip_law(s):
    """Tj survives arbitrary Latin-1 strings, including ( ) \\."""
    assert decode_pdf_text(encode_pdf([[("Tj", s)]])) == [s]


@settings(max_examples=20, deadline=None)
@given(lines=st.lists(TEXT, min_size=1, max_size=6))
def test_tstar_layout_law(lines):
    ops = []
    for i, ln in enumerate(lines):
        if i:
            ops.append(("Tstar",))
        ops.append(("Tj", ln))
    assert decode_pdf_text(encode_pdf([ops])) == ["\n".join(lines)]


def test_all_show_operators():
    pages = [[
        ("Tj", "alpha"),
        ("TJ", ["br", -120, "avo", 33.5]),
        ("quote", "next line"),
        ("dquote", 1.5, 0.2, "spaced"),
        ("TjHex", "hexed"),
        ("Td", 0, -14),
        ("Tj", "moved"),
    ]]
    (page,) = decode_pdf_text(encode_pdf(pages))
    assert page == "alphabravo\nnext line\nspaced" + "hexed\nmoved"


def test_multi_page():
    pages = [[("Tj", f"page {i}")] for i in range(5)]
    assert decode_pdf_text(encode_pdf(pages)) == [f"page {i}" for i in range(5)]


def test_xref_offsets_are_byte_accurate():
    """Every xref 'n' entry must point exactly at 'N 0 obj'."""
    buf = encode_pdf([[("Tj", "x")], [("Tj", "y")]])
    m = re.search(rb"xref\n0 (\d+)\n", buf)
    n = int(m.group(1))
    entries = buf[m.end() : m.end() + 20 * n]
    for k in range(1, n):
        off = int(entries[20 * k : 20 * k + 10])
        assert re.match(rb"%d 0 obj" % k, buf[off:]), f"object {k}"


def test_escapes_and_octal_decode():
    """Hand-built content: octal escapes, line continuation, unknown
    escape dropping, odd-length hex string."""
    content = b"BT (\\101\\102\\103 \\\njoined \\z) Tj <414> Tj ET"
    body = _wrap_single_stream(content)
    assert decode_pdf_text(body) == ["ABC joined zA@"]


def _wrap_single_stream(content: bytes, filt: bytes = b"") -> bytes:
    """Assemble a minimal single-page PDF around a raw content stream."""
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length %d %s>>\nstream\n" % (len(content), filt)
           + content + b"\nendstream",
    }
    out = bytearray(b"%PDF-1.4\n")
    offs = {}
    for n in sorted(objs):
        offs[n] = len(out)
        out += b"%d 0 obj\n" % n + objs[n] + b"\nendobj\n"
    xr = len(out)
    out += b"xref\n0 5\n0000000000 65535 f \n"
    for n in range(1, 5):
        out += b"%010d 00000 n \n" % offs[n]
    out += b"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xr
    return bytes(out)


def test_prev_chain_is_followed():
    """An incremental update: new xref with /Prev; object 4 is
    re-pointed by the newer table, object 3 resolves via the older."""
    base = bytearray(_wrap_single_stream(b"BT (old) Tj ET"))
    old_xref = int(re.search(rb"startxref\n(\d+)", base).group(1))
    new_content = b"BT (new) Tj ET"
    add_at = len(base)
    base += b"4 0 obj\n<< /Length %d >>\nstream\n" % len(new_content)
    base += new_content + b"\nendstream\nendobj\n"
    xr = len(base)
    base += b"xref\n4 1\n%010d 00000 n \ntrailer\n" % add_at
    base += b"<< /Size 5 /Root 1 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n" % (
        old_xref, xr,
    )
    assert decode_pdf_text(bytes(base)) == ["new"]


def test_strict_refusals():
    with pytest.raises(ValueError, match="not a PDF"):
        decode_pdf_text(b"GIF89a...")
    with pytest.raises(ValueError, match="at least one"):
        encode_pdf([])
    good = encode_pdf([[("Tj", "x")]])
    with pytest.raises(ValueError, match="no startxref"):
        decode_pdf_text(good[: good.rfind(b"startxref")])
    # xref offset lying about the object number
    bad = bytearray(good)
    m = re.search(rb"\n(\d{10}) 00000 n \n", bad)
    bad[m.start(1) : m.end(1)] = b"0000000009"
    with pytest.raises(ValueError, match="does not hold object"):
        decode_pdf_text(bytes(bad))
    with pytest.raises(NotImplementedError, match="filter"):
        decode_pdf_text(
            _wrap_single_stream(b"BT (x) Tj ET", b"/Filter /LZWDecode ")
        )


def test_xref_stream_refused_loudly():
    """A PDF 1.5 file whose startxref points at an object (xref
    stream) must refuse with the named feature, not a parse error."""
    buf = _wrap_single_stream(b"BT (x) Tj ET")
    # point startxref at object 1's "1 0 obj"
    obj1_at = buf.find(b"1 0 obj")
    doctored = re.sub(
        rb"startxref\n\d+", b"startxref\n%d" % obj1_at, buf
    )
    with pytest.raises(NotImplementedError, match="cross-reference stream"):
        decode_pdf_text(doctored)


def test_flate_roundtrip_with_indirect_length():
    """Real-world shape: /Length as an indirect reference."""
    content = zlib.compress(b"BT (flate) Tj ET")
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length 5 0 R /Filter /FlateDecode >>\nstream\n"
           + content + b"\nendstream",
        5: b"%d" % len(content),
    }
    out = bytearray(b"%PDF-1.4\n")
    offs = {}
    for n in sorted(objs):
        offs[n] = len(out)
        out += b"%d 0 obj\n" % n + objs[n] + b"\nendobj\n"
    xr = len(out)
    out += b"xref\n0 6\n0000000000 65535 f \n"
    for n in range(1, 6):
        out += b"%010d 00000 n \n" % offs[n]
    out += b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xr
    assert decode_pdf_text(bytes(out)) == ["flate"]
