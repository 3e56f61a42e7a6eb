"""The filesystem seam (levi_spark/fs.py): LocalFS and the JVM
HadoopFS must agree operation-for-operation, exercised over the SAME
tmp directory — plain path through LocalFS, file:// URI through the
Hadoop LocalFileSystem — so any behavioral gap between the backends
surfaces as a direct assertion diff."""

import os

import pytest

from levi_spark import fs as FS
from levi_spark.fs import (
    HadoopFS,
    LocalFS,
    absolutize,
    copy_file,
    copy_tree,
    fs_for,
    local_form,
)


def test_dispatch_and_helpers(spark, tmp_path):
    assert isinstance(fs_for(str(tmp_path)), LocalFS)
    assert isinstance(fs_for(f"file://{tmp_path}"), HadoopFS)
    assert fs_for(f"file://{tmp_path}") is fs_for("file:///elsewhere")
    assert local_form("/a/b") == "/a/b"
    assert local_form("file:///a/b") == "/a/b"
    assert local_form("s3a://bucket/k") is None
    assert absolutize("file:///a/b/") == "file:///a/b"
    assert absolutize("rel/p") == os.path.abspath("rel/p")
    # a plain path is local even when a session exists
    assert fs_for("relative/path") is fs_for("/abs/path")


@pytest.fixture(params=["local", "hadoop"])
def fsx(request, spark, tmp_path):
    """(fs, path_of) — same tmp dir, addressed both ways."""
    if request.param == "local":
        return fs_for(str(tmp_path)), lambda *p: str(tmp_path.joinpath(*p))
    return (
        fs_for(f"file://{tmp_path}"),
        lambda *p: f"file://{tmp_path.joinpath(*p)}",
    )


def test_roundtrip_ops(fsx, tmp_path):
    fs, P = fsx
    fs.mkdirs(P("d/sub"))
    assert fs.isdir(P("d/sub")) and not fs.exists(P("d/nope"))
    fs.write_text(P("d/a.json"), '{"k": 1}\n')
    fs.write_bytes(P("d/b.bin"), b"\x00\x01\xff")
    assert fs.read_text(P("d/a.json")) == '{"k": 1}\n'
    assert fs.read_bytes(P("d/b.bin")) == b"\x00\x01\xff"
    assert sorted(fs.listdir(P("d"))) == ["a.json", "b.bin", "sub"]
    st = fs.stat(P("d/b.bin"))
    assert st.size == 3 and st.mtime_ms > 0
    assert fs.getsize(P("d/a.json")) == 9

    fs.create_exclusive(P("d/c.json"), "x")
    with pytest.raises(FileExistsError):
        fs.create_exclusive(P("d/c.json"), "y")
    assert fs.read_text(P("d/c.json")) == "x"

    fs.rename(P("d/c.json"), P("d/c2.json"))
    assert fs.exists(P("d/c2.json")) and not fs.exists(P("d/c.json"))
    fs.replace(P("d/c2.json"), P("d/a.json"))  # overwrite semantics
    assert fs.read_text(P("d/a.json")) == "x"

    walked = {
        (os.path.basename(r.rstrip("/")) or "root", tuple(sorted(d)),
         tuple(sorted(f)))
        for r, d, f in fs.walk(P("d"))
    }
    assert ("d", ("sub",), ("a.json", "b.bin")) in walked
    assert ("sub", (), ()) in walked

    fs.remove(P("d/b.bin"))
    assert not fs.exists(P("d/b.bin"))
    fs.rmtree(P("d"))
    assert not fs.exists(P("d"))
    with pytest.raises(FileNotFoundError):
        fs.listdir(P("d"))
    with pytest.raises(FileNotFoundError):
        fs.stat(P("d/gone"))


def test_write_overwrites(fsx):
    fs, P = fsx
    fs.mkdirs(P("o"))
    fs.write_text(P("o/f"), "one")
    fs.write_text(P("o/f"), "two")
    assert fs.read_text(P("o/f")) == "two"


def test_copy_across_schemes(spark, tmp_path):
    os.makedirs(tmp_path / "src/dvdir", exist_ok=True)
    (tmp_path / "src/x.bin").write_bytes(b"payload")
    (tmp_path / "src/dvdir/y.bin").write_bytes(b"dv")
    copy_file(str(tmp_path / "src/x.bin"),
              f"file://{tmp_path}/c1.bin")
    copy_file(f"file://{tmp_path}/src/x.bin", str(tmp_path / "c2.bin"))
    assert (tmp_path / "c1.bin").read_bytes() == b"payload"
    assert (tmp_path / "c2.bin").read_bytes() == b"payload"
    copy_tree(f"file://{tmp_path}/src/dvdir",
              f"file://{tmp_path}/dstdir")
    assert (tmp_path / "dstdir/y.bin").read_bytes() == b"dv"
