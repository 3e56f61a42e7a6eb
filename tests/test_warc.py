"""WARC container (levi_spark.operators.warc): round-trip laws over
both layouts (plain and member-gzip), strict framing validation, HTTP
response splitting, and the closed-form record features the
`warc_extract_records` gate relies on."""

from __future__ import annotations

import gzip
import hashlib
import io

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from levi_spark.operators.warc import (
    decode_warc,
    encode_warc,
    split_http_response,
    warc_record_features,
)


def _mk_records(n, body_of=lambda i: f"body {i}".encode()):
    return [
        {
            "type": "response",
            "uri": f"https://example.invalid/{i}",
            "payload": b"HTTP/1.1 200 OK\r\n\r\n" + body_of(i),
            "content_type": "application/http; msgtype=response",
        }
        for i in range(n)
    ]


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 6),
    gz=st.booleans(),
    blob=st.binary(min_size=0, max_size=300),
)
def test_round_trip_law(n, gz, blob):
    """Arbitrary binary payloads (including CRLFs and gzip magic
    inside bodies) survive framing in both layouts."""
    recs = _mk_records(n, body_of=lambda i: blob + bytes([i]))
    out = decode_warc(encode_warc(recs, gzip_members=gz))
    assert len(out) == n
    for i, r in enumerate(out):
        assert r["type"] == "response"
        assert r["uri"] == f"https://example.invalid/{i}"
        assert r["payload"].endswith(blob + bytes([i]))


def test_warcinfo_preamble_and_http_split():
    w = encode_warc(
        _mk_records(2), warcinfo={"software": "levi-spark", "format": "WARC/1.0"}
    )
    out = decode_warc(w)
    assert out[0]["type"] == "warcinfo"
    assert b"software: levi-spark" in out[0]["payload"]
    status, headers, body = split_http_response(out[1]["payload"])
    assert status == "HTTP/1.1 200 OK" and body == b"body 0"


def test_framing_validation_refusals():
    w = encode_warc(_mk_records(1))
    with pytest.raises(ValueError, match="not a WARC"):
        decode_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    # corrupt Content-Length -> separator check trips
    bad = w.replace(b"Content-Length: 25", b"Content-Length: 23")
    with pytest.raises(ValueError, match="CRLFCRLF|truncated"):
        decode_warc(bad)
    # truncated payload
    with pytest.raises(ValueError, match="truncated|terminated"):
        decode_warc(w[:-6])
    # unsupported version line
    with pytest.raises(ValueError, match="unsupported WARC version"):
        decode_warc(b"WARC/9.9" + w[8:])
    # truncated gzip member
    gzw = encode_warc(_mk_records(1), gzip_members=True)
    with pytest.raises(ValueError, match="gzip"):
        decode_warc(gzw[:-4])


def test_member_gzip_layout_is_real_members():
    """The gzip layout writes one member per record — a reader can
    split at member boundaries (the Common Crawl access pattern)."""
    w = encode_warc(_mk_records(3), gzip_members=True)
    # decompressing only the FIRST member yields exactly one record
    import zlib

    d = zlib.decompressobj(wbits=31)
    first = d.decompress(w)
    assert d.eof and d.unused_data  # member boundary + more members follow
    assert first.startswith(b"WARC/1.0") and first.count(b"WARC/1.0") == 1
    assert len(decode_warc(w)) == 3


def test_gate_fixture_features_closed_form():
    """The exact fixture the driver gate runs: warcinfo + j+2-times-
    repeated md5 hex bodies; features equal the md5-derived closed
    forms the DuckDB oracle computes."""
    from levi_spark.queries import _WARC_HTTP_HDR, _WARC_INFO_PAYLOAD

    text, d = "warc doc", 6
    hx = hashlib.md5(text.encode()).hexdigest().encode()
    recs = [
        {
            "type": "response",
            "uri": f"https://corpus.invalid/{d}/{j}",
            "payload": _WARC_HTTP_HDR + hx * (j + 2),
            "content_type": "application/http; msgtype=response",
        }
        for j in range(2)
    ]
    feats = warc_record_features(
        encode_warc(recs, gzip_members=True, warcinfo={"software": "levi-spark"})
    )
    hsum = sum(hx)
    assert feats[0]["warc_type"] == "warcinfo"
    assert feats[0]["content_length"] == len(_WARC_INFO_PAYLOAD)
    assert feats[0]["payload_byte_sum"] == sum(_WARC_INFO_PAYLOAD)
    for j in range(2):
        f = feats[j + 1]
        assert f["uri"] == f"https://corpus.invalid/{d}/{j}"
        assert f["content_length"] == len(_WARC_HTTP_HDR) + 32 * (j + 2)
        assert f["payload_byte_sum"] == sum(_WARC_HTTP_HDR) + (j + 2) * hsum
