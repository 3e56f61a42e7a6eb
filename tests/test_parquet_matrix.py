"""First-principles parquet read matrix (round 9): ZSTD / LZ4_RAW
codecs via our own decoders, data page v2, DELTA_BINARY_PACKED /
DELTA_LENGTH_BYTE_ARRAY / DELTA_BYTE_ARRAY / BYTE_STREAM_SPLIT
encodings, extra physical types (INT32 / FLOAT / BOOLEAN), and
nested single-level list reassembly — every case cross-checked
value-exactly against pyarrow, the reference implementation."""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from levi_spark.operators.parquetmeta import (
    read_column,
    read_column_nested,
    read_footer,
)


def _write(tmp_path, table, name="t.parquet", **kw):
    p = str(tmp_path / name)
    pq.write_table(table, p, **kw)
    return p


def _mixed_table(n=800, nulls=True, seed=5):
    random.seed(seed)

    def maybe(v, i):
        return None if nulls and i % 7 == 0 else v

    return pa.table(
        {
            "i32": pa.array(
                [maybe(random.randrange(-(2**31), 2**31), i)
                 for i in range(n)], pa.int32()),
            "i64": pa.array(
                [maybe(random.randrange(-(2**62), 2**62), i)
                 for i in range(n)], pa.int64()),
            "f32": pa.array(
                [maybe(float(random.randrange(1000)) / 4, i)
                 for i in range(n)], pa.float32()),
            "f64": pa.array(
                [maybe(random.random() * 1e6, i) for i in range(n)],
                pa.float64()),
            "s": pa.array(
                [maybe(f"key_{i % 37}_{random.randrange(99)}", i)
                 for i in range(n)], pa.utf8()),
            "b": pa.array(
                [maybe(i % 3 == 0, i) for i in range(n)], pa.bool_()),
        }
    )


@pytest.mark.parametrize("codec", ["zstd", "lz4", "snappy", "gzip", "none"])
@pytest.mark.parametrize("page_version", ["1.0", "2.0"])
def test_codec_and_page_version_matrix(tmp_path, codec, page_version):
    """Every codec x page version on all six physical types, with
    nulls, across two row groups."""
    t = _mixed_table()
    p = _write(tmp_path, t, f"{codec}_{page_version}.parquet",
               compression=codec, use_dictionary=False,
               data_page_version=page_version, row_group_size=300)
    for col in t.column_names:
        assert read_column(p, col) == t.column(col).to_pylist(), (
            f"{col} @ {codec}/{page_version}")


@pytest.mark.parametrize("codec", ["zstd", "lz4"])
def test_new_codecs_with_dictionary(tmp_path, codec):
    vals = [f"v{i % 11}" for i in range(2000)]
    t = pa.table({"s": pa.array(vals, pa.utf8()),
                  "k": pa.array([i % 11 for i in range(2000)], pa.int64())})
    p = _write(tmp_path, t, compression=codec, use_dictionary=True,
               data_page_version="1.0", row_group_size=700)
    assert read_column(p, "s") == vals
    assert read_column(p, "k") == [i % 11 for i in range(2000)]


def test_delta_binary_packed(tmp_path):
    """DELTA_BINARY_PACKED on int32/int64 — monotone, random and
    negative-delta regimes, > 1 miniblock block sizes."""
    random.seed(9)
    seqs = {
        "mono64": (pa.int64(), list(range(100000, 103000))),
        "rand64": (pa.int64(),
                   [random.randrange(-(2**40), 2**40) for _ in range(2500)]),
        "desc32": (pa.int32(), list(range(50000, 44000, -2))),
        "tiny32": (pa.int32(), [7]),
    }
    for k, (typ, v) in seqs.items():
        t = pa.table({k: pa.array(v, typ)})
        p = _write(tmp_path, t, f"{k}.parquet", compression="zstd",
                   use_dictionary=False,
                   column_encoding={k: "DELTA_BINARY_PACKED"},
                   data_page_version="2.0")
        f = read_footer(p)
        for g in f["row_groups"]:
            for c in g["columns"]:
                assert "DELTA_BINARY_PACKED" in c["encodings"]
        assert read_column(p, k) == v


def test_delta_binary_packed_int64_extremes(tmp_path):
    """Deltas overflowing 64-bit intermediate math must wrap like the
    reference implementation."""
    vals = [0, 2**62, -(2**62), 2**62 - 1, -(2**62) + 7, 0]
    t = pa.table({"k": pa.array(vals, pa.int64())})
    p = _write(tmp_path, t, use_dictionary=False,
               column_encoding={"k": "DELTA_BINARY_PACKED"})
    assert read_column(p, "k") == vals


def test_delta_length_and_delta_byte_array(tmp_path):
    random.seed(3)
    strs = [f"user_prefix_{i % 97:03d}/{random.randrange(10**6)}"
            for i in range(3000)]
    sorted_strs = sorted(strs)  # front-coding shines on sorted keys
    t = pa.table({"dl": pa.array(strs, pa.utf8()),
                  "db": pa.array(sorted_strs, pa.utf8())})
    p = _write(tmp_path, t, compression="zstd", use_dictionary=False,
               column_encoding={"dl": "DELTA_LENGTH_BYTE_ARRAY",
                                "db": "DELTA_BYTE_ARRAY"},
               data_page_version="2.0")
    f = read_footer(p)
    encs = {c["path"]: c["encodings"] for c in f["row_groups"][0]["columns"]}
    assert "DELTA_LENGTH_BYTE_ARRAY" in encs["dl"]
    assert "DELTA_BYTE_ARRAY" in encs["db"]
    assert read_column(p, "dl") == strs
    assert read_column(p, "db") == sorted_strs


def test_byte_stream_split(tmp_path):
    random.seed(4)
    f32 = [random.random() * 100 for _ in range(2000)]
    f64 = [random.random() * 1e9 for _ in range(2000)]
    t = pa.table({"f32": pa.array(f32, pa.float32()),
                  "f64": pa.array(f64, pa.float64())})
    p = _write(tmp_path, t, compression="zstd", use_dictionary=False,
               column_encoding={"f32": "BYTE_STREAM_SPLIT",
                                "f64": "BYTE_STREAM_SPLIT"})
    got32 = read_column(p, "f32")
    want32 = t.column("f32").to_pylist()
    assert got32 == pytest.approx(want32, abs=0)  # bit-exact
    assert read_column(p, "f64") == f64


def test_v2_pages_with_nulls_levels_uncompressed(tmp_path):
    """v2 stores levels outside the compressed region; null-heavy
    columns exercise that split plus num_nulls accounting."""
    vals = [None if i % 2 else i for i in range(5000)]
    t = pa.table({"k": pa.array(vals, pa.int64())})
    p = _write(tmp_path, t, compression="zstd", use_dictionary=False,
               data_page_version="2.0")
    assert read_column(p, "k") == vals


def test_nested_list_roundtrip(tmp_path):
    """Single-level lists: null list vs empty list vs null element
    all reassembled from (rep, def) pairs."""
    rows = [[1, 2, 3], None, [], [None, 5], [6], None, [], [7, None, 9]]
    t = pa.table({"v": pa.array(rows, pa.list_(pa.int64()))})
    p = _write(tmp_path, t, compression="zstd", use_dictionary=False)
    (path, _), = read_footer(p)["columns"]
    assert read_column_nested(p, path) == rows


def test_nested_list_strings_and_large(tmp_path):
    random.seed(11)
    rows = []
    for i in range(4000):
        if i % 13 == 0:
            rows.append(None)
        elif i % 7 == 0:
            rows.append([])
        else:
            rows.append(
                [None if j % 5 == 4 else f"tok{i}_{j}"
                 for j in range(random.randrange(1, 6))]
            )
    t = pa.table({"v": pa.array(rows, pa.list_(pa.utf8()))})
    p = _write(tmp_path, t, compression="snappy", row_group_size=900)
    (path, _), = read_footer(p)["columns"]
    assert read_column_nested(p, path) == rows


def test_nested_required_outer_list(tmp_path):
    """A non-nullable list field shifts every definition threshold
    down by one — empty vs present must still disambiguate."""
    rows = [[1], [], [2, None], [3, 4]]
    t = pa.table(
        {"v": pa.array(rows, pa.list_(pa.int64()))},
        schema=pa.schema(
            [pa.field("v", pa.list_(pa.int64()), nullable=False)]),
    )
    p = _write(tmp_path, t, use_dictionary=False)
    (path, _), = read_footer(p)["columns"]
    f = read_footer(p)
    assert f["levels"][path][1] == 1
    assert read_column_nested(p, path) == rows


def test_real_testdata_embeddings_nested():
    """The driver's embeddings table has an array<float> column —
    read it nested from first principles and cross-check duckdb."""
    import duckdb

    p = "/root/testdata/sf0.001/embeddings.parquet"
    f = read_footer(p)
    nested = [c for c, _ in f["columns"] if f["levels"][c][1] == 1]
    if not nested:
        pytest.skip("no repeated column in embeddings at this sf")
    col = nested[0]
    top = col.split(".")[0]
    want = [r[0] for r in duckdb.sql(
        f"SELECT {top} FROM read_parquet('{p}') LIMIT 50").fetchall()]
    got = read_column_nested(p, col)[:50]
    for g, w in zip(got, want):
        assert (g is None) == (w is None)
        if g is not None:
            assert g == pytest.approx(list(w), rel=1e-6)


def test_lz4_raw_codec_enum_is_lz4_raw(tmp_path):
    t = pa.table({"k": pa.array(range(50), pa.int64())})
    p = _write(tmp_path, t, compression="lz4", use_dictionary=False)
    assert (read_footer(p)["row_groups"][0]["columns"][0]["codec"]
            == "LZ4_RAW")
    assert read_column(p, "k") == list(range(50))
