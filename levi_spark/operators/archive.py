"""Archive-shard ingestion — ZIP and tar(.gz) member extraction, pure
stdlib. Training corpora and eval suites routinely arrive as archive
shards (a zip of text files per domain, tar.gz dumps per crawl
slice); at 100 TB the right shape is "archives as rows": each archive
is one binary payload in a DataFrame column, and member extraction
fans out INSIDE an Arrow batch on the executors (same pattern as the
media codecs and :mod:`levi_spark.operators.warc`) — never a
driver-side loop over files.

Formats: ZIP via :mod:`zipfile` (stored and deflate members — the
writer emits deflate; encrypted or other compression methods raise),
POSIX tar via :mod:`tarfile` with optional whole-stream gzip
(``r:gz``). Extraction is strict — a corrupt central directory, bad
CRC, or truncated gzip stream raises instead of yielding partial
members. Member traversal order is the archive's own order (zip
central directory / tar sequence), so features are deterministic.

The reference engine has no ingestion surface (its scope is
`levi/__init__.py`); this is north-star extension surface for corpus
ingestion alongside WARC.
"""

from __future__ import annotations

import io
import tarfile
import zipfile


def encode_zip(members: list[tuple[str, bytes]], compress: bool = True) -> bytes:
    """(name, data) pairs -> ZIP bytes (deflate by default)."""
    buf = io.BytesIO()
    method = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", method) as zf:
        for name, data in members:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = method
            zf.writestr(info, data)
    return buf.getvalue()


def encode_tar(
    members: list[tuple[str, bytes]],
    gzip_stream: bool = False,
    compression: str | None = None,
) -> bytes:
    """(name, data) pairs -> POSIX tar bytes. ``compression``:
    ``None`` | ``"gz"`` | ``"xz"`` | ``"bz2"`` (the three stream
    compressors tar shards actually arrive in); ``gzip_stream=True``
    is the legacy spelling of ``compression="gz"``."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
    tar = buf.getvalue()
    if gzip_stream and compression is None:
        compression = "gz"
    if compression is None:
        return tar
    if compression == "gz":
        import gzip

        out = io.BytesIO()
        with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
            gz.write(tar)  # mtime pinned -> byte-deterministic fixtures
        return out.getvalue()
    if compression == "xz":
        import lzma

        return lzma.compress(tar, format=lzma.FORMAT_XZ, preset=6)
    if compression == "bz2":
        import bz2

        return bz2.compress(tar, 9)
    raise ValueError(f"tar compression {compression!r} (None|gz|xz|bz2)")


def decode_archive(payload: bytes) -> list[dict]:
    """Sniff + extract: ZIP (PK magic), gzip (1f 8b -> tar.gz) or
    plain tar. Returns ``[{"name", "size", "data", "format"}]`` in
    archive order; raises ValueError on damage or unsupported
    compression."""
    if payload[:2] == b"PK":
        out = []
        try:
            with zipfile.ZipFile(io.BytesIO(payload)) as zf:
                bad = zf.testzip()
                if bad is not None:
                    raise ValueError(f"ZIP member {bad!r} fails CRC")
                for info in zf.infolist():
                    if info.compress_type not in (
                        zipfile.ZIP_STORED,
                        zipfile.ZIP_DEFLATED,
                    ):
                        raise ValueError(
                            f"ZIP compression method {info.compress_type} "
                            "unsupported (stored/deflate only)"
                        )
                    out.append(
                        {
                            "name": info.filename,
                            "size": info.file_size,
                            "data": zf.read(info),
                            "format": "zip",
                        }
                    )
        except zipfile.BadZipFile as e:
            raise ValueError(f"bad ZIP archive: {e}") from e
        return out
    if (
        payload[:2] == b"\x1f\x8b"
        or payload[:6] == b"\xfd7zXZ\x00"
        or payload[:3] == b"BZh"
        or payload[257:262] == b"ustar"
    ):
        if payload[:2] == b"\x1f\x8b":
            fmt = "tar.gz"
        elif payload[:6] == b"\xfd7zXZ\x00":
            fmt = "tar.xz"
        elif payload[:3] == b"BZh":
            fmt = "tar.bz2"
        else:
            fmt = "tar"
        if fmt == "tar.xz":
            import lzma

            d = lzma.LZMADecompressor(format=lzma.FORMAT_XZ)
            try:
                payload = d.decompress(payload)
            except lzma.LZMAError as e:
                raise ValueError(f"bad xz stream: {e}") from e
            if not d.eof:
                raise ValueError("truncated xz stream")
            if d.unused_data:
                raise ValueError(
                    f"{len(d.unused_data)} bytes after the xz stream "
                    "footer — not a single-stream tar.xz"
                )
        if fmt == "tar.bz2":
            import bz2

            d = bz2.BZ2Decompressor()
            try:
                payload = d.decompress(payload)
            except OSError as e:
                raise ValueError(f"bad bzip2 stream: {e}") from e
            if not d.eof:
                raise ValueError("truncated bzip2 stream")
            if d.unused_data:
                raise ValueError(
                    f"{len(d.unused_data)} bytes after the bzip2 stream "
                    "— not a single-stream tar.bz2"
                )
        if fmt == "tar.gz":
            # decompress strictly first: tarfile stops reading at the
            # last member header, so a clipped gzip trailer (CRC/size)
            # would otherwise pass silently
            import zlib

            d = zlib.decompressobj(wbits=31)
            try:
                payload = d.decompress(payload)
                d.flush()
            except zlib.error as e:
                raise ValueError(f"bad gzip stream: {e}") from e
            if not d.eof:
                raise ValueError("truncated gzip stream")
            if d.unused_data:
                # bytes after the gzip trailer: a second concatenated
                # member or trailing garbage — the strict contract
                # refuses rather than silently dropping it (the WARC
                # splitter handles the multi-member layout; a tar.gz
                # shard is ONE stream)
                raise ValueError(
                    f"{len(d.unused_data)} bytes after the gzip trailer "
                    "(concatenated member or garbage) — not a single-"
                    "stream tar.gz"
                )
        try:
            with tarfile.open(
                fileobj=io.BytesIO(payload),
                mode="r:",
            ) as tf:
                out = []
                for info in tf:
                    if not info.isfile():
                        continue
                    f = tf.extractfile(info)
                    data = f.read() if f is not None else b""
                    if len(data) != info.size:
                        raise ValueError(
                            f"tar member {info.name!r} truncated"
                        )
                    out.append(
                        {
                            "name": info.name,
                            "size": info.size,
                            "data": data,
                            "format": fmt,
                        }
                    )
                return out
        except tarfile.TarError as e:
            raise ValueError(f"bad tar archive: {e}") from e
    raise ValueError(f"not a ZIP/tar/tar.gz archive (starts {payload[:4]!r})")


def archive_member_features(payload: bytes) -> list[dict]:
    """Per-member features for the corpus-ingestion fan-out: member
    index, name, archive format, size and byte sum (integer-exact
    content witnesses)."""
    out = []
    for i, m in enumerate(decode_archive(payload)):
        out.append(
            {
                "member_idx": i,
                "name": m["name"],
                "format": m["format"],
                "size": int(m["size"]),
                "byte_sum": int(sum(m["data"])),
            }
        )
    return out
