"""WARC (Web ARChive, ISO 28500) record extraction — pure stdlib.
The container format web-scale training corpora actually ship in
(Common Crawl publishes WARC/WET/WAT): a WARC file is a sequence of
records, each a ``WARC/1.0`` header block (CRLF-delimited named
fields) plus a Content-Length-framed payload, records separated by
two blank lines; production crawls store each record as its own GZIP
MEMBER so readers can split archives without decompressing the whole
file.

Decode (strict — malformed records raise): both plain and
member-gzipped layouts (member boundaries recovered via zlib's
unused-data tail), version-line validation, required headers
(WARC-Type, WARC-Record-ID, Content-Length), exact Content-Length
framing with the mandatory CRLF CRLF record separator, and HTTP
response payloads split into status/headers/body on request. Encode
writes the same layout (warcinfo preamble + records, uuid record
ids, optional per-member gzip) for fixtures and tests.

At scale the per-payload work rides the same Arrow-batched
``mapInPandas`` fan-out as the media codecs
(:func:`levi_spark.operators.multimodal.decode_frame_features`
pattern): one WARC blob in, one row per contained record out, no
driver-side loop. The reference engine has no ingestion surface
(its scope is `levi/__init__.py`); this is north-star extension
surface for corpus ingestion.
"""

from __future__ import annotations

import gzip
import io
import zlib

_CRLF = b"\r\n"


def _fmt_headers(headers: dict[str, str]) -> bytes:
    return b"".join(
        f"{k}: {v}".encode("utf-8") + _CRLF for k, v in headers.items()
    )


def encode_warc(
    records: list[dict],
    gzip_members: bool = False,
    warcinfo: dict[str, str] | None = None,
) -> bytes:
    """Serialize records into a WARC file.

    Each record dict: ``type`` (response/resource/metadata/...),
    ``uri`` (WARC-Target-URI), ``payload`` (bytes), optional
    ``record_id`` / ``date`` / ``content_type``. ``gzip_members=True``
    writes each record as its own gzip member (the Common Crawl
    layout). A ``warcinfo`` dict prepends the standard first record
    describing the capture.
    """
    out = []
    seq = [] if warcinfo is None else [
        {
            "type": "warcinfo",
            "uri": None,
            "payload": _fmt_headers(warcinfo),
            "content_type": "application/warc-fields",
        }
    ]
    seq.extend(records)
    for i, rec in enumerate(seq):
        payload = rec["payload"]
        headers = {
            "WARC-Type": rec["type"],
            "WARC-Record-ID": rec.get(
                "record_id", f"<urn:uuid:00000000-0000-0000-0000-{i:012d}>"
            ),
            "WARC-Date": rec.get("date", "2026-01-01T00:00:00Z"),
        }
        if rec.get("uri"):
            headers["WARC-Target-URI"] = rec["uri"]
        if rec.get("content_type"):
            headers["Content-Type"] = rec["content_type"]
        headers["Content-Length"] = str(len(payload))
        body = (
            b"WARC/1.0" + _CRLF
            + _fmt_headers(headers)
            + _CRLF
            + payload
            + _CRLF + _CRLF
        )
        if gzip_members:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(body)
            out.append(buf.getvalue())
        else:
            out.append(body)
    return b"".join(out)


def _split_gzip_members(payload: bytes) -> list[bytes]:
    """Decompress a concatenation of gzip members one member at a
    time (zlib exposes each member's unconsumed tail)."""
    members = []
    rest = payload
    while rest:
        d = zlib.decompressobj(wbits=31)
        members.append(d.decompress(rest))
        if not d.eof:
            raise ValueError("truncated gzip member in WARC")
        rest = d.unused_data
    return members


def decode_warc(payload: bytes) -> list[dict]:
    """Parse a WARC file (plain or member-gzipped) into record dicts:
    ``{"type", "record_id", "uri", "date", "headers", "payload"}``.
    Raises ValueError on bad magic, missing required headers, or
    Content-Length/separator framing damage."""
    if payload[:2] == b"\x1f\x8b":
        chunks = _split_gzip_members(payload)
        data = b"".join(chunks)
    elif payload[:5] == b"WARC/":
        data = payload
    else:
        raise ValueError(f"not a WARC file (starts {payload[:8]!r})")

    records = []
    pos = 0
    while pos < len(data):
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError("WARC record header block not terminated")
        lines = data[pos:hdr_end].split(_CRLF)
        version = lines[0]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line {version!r}")
        if version not in (b"WARC/1.0", b"WARC/1.1"):
            raise ValueError(f"unsupported WARC version {version!r}")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            if b":" not in line:
                raise ValueError(f"malformed WARC header line {line!r}")
            k, v = line.split(b":", 1)
            headers[k.decode("utf-8").strip()] = v.decode("utf-8").strip()
        for req in ("WARC-Type", "WARC-Record-ID", "Content-Length"):
            if req not in headers:
                raise ValueError(f"record missing required header {req}")
        clen = int(headers["Content-Length"])
        body_start = hdr_end + 4
        body = data[body_start : body_start + clen]
        if len(body) != clen:
            raise ValueError(
                f"record payload truncated: want {clen}, have {len(body)}"
            )
        sep = data[body_start + clen : body_start + clen + 4]
        if sep != _CRLF + _CRLF:
            raise ValueError(
                f"record not terminated by CRLFCRLF (got {sep!r})"
            )
        records.append(
            {
                "type": headers["WARC-Type"],
                "record_id": headers["WARC-Record-ID"],
                "uri": headers.get("WARC-Target-URI"),
                "date": headers.get("WARC-Date"),
                "headers": headers,
                "payload": body,
            }
        )
        pos = body_start + clen + 4
    return records


def split_http_response(payload: bytes) -> tuple[str, dict[str, str], bytes]:
    """Split an HTTP response record payload into (status line,
    headers, body) per the WARC response convention."""
    end = payload.find(_CRLF + _CRLF)
    if end < 0:
        raise ValueError("HTTP response block not terminated")
    lines = payload[:end].split(_CRLF)
    status = lines[0].decode("utf-8", "replace")
    if not status.startswith("HTTP/"):
        raise ValueError(f"bad HTTP status line {status!r}")
    headers = {}
    for line in lines[1:]:
        k, v = line.split(b":", 1)
        headers[k.decode("utf-8").strip()] = v.decode("utf-8").strip()
    return status, headers, payload[end + 4 :]


def warc_record_features(payload: bytes) -> list[dict]:
    """Per-record features for the corpus-ingestion fan-out: record
    index, type, target URI, payload length and payload byte sum
    (integer-exact content witnesses)."""
    out = []
    for i, rec in enumerate(decode_warc(payload)):
        body = rec["payload"]
        out.append(
            {
                "record_idx": i,
                "warc_type": rec["type"],
                "uri": rec["uri"] or "",
                "content_length": len(body),
                "payload_byte_sum": int(sum(body)),
            }
        )
    return out
