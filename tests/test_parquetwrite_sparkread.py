"""Spark itself (parquet-mr lineage, the third reference reader and
the actual production engine) must read files OUR writer emits —
flat, LIST, STRUCT, MAP, both page versions, the closed
value-encoding matrix, dictionary chunks, bloom-filtered and
page-indexed files — value-for-value against the input."""

import os

import pytest

from levi_spark.operators.parquetwrite import write_parquet


def _rows(spark, path, cols):
    df = spark.read.parquet(path).select(*cols)
    return [tuple(r) for r in df.collect()]


@pytest.mark.parametrize("ver", [1, 2])
def test_spark_reads_flat_and_list(spark, tmp_path, ver):
    n = 3000
    ks = list(range(n))
    ps = [None if i % 7 == 0 else i * 0.25 for i in range(n)]
    ls = [
        None if i % 11 == 0
        else ([] if i % 13 == 0
              else [None if j % 5 == 3 else i * 10 + j
                    for j in range(i % 6)])
        for i in range(n)
    ]
    blob = write_parquet(
        [("k", "INT64", ks), ("p", "DOUBLE", ps),
         ("l", "LIST<INT64>", ls)],
        codec="ZSTD", row_group_size=1024, page_rows=256,
        data_page_version=ver, write_page_index=True,
        bloom_filter=["k"],
    )
    p = os.path.join(tmp_path, f"v{ver}.parquet")
    with open(p, "wb") as f:
        f.write(blob)
    got = sorted(_rows(spark, p, ["k", "p", "l"]))
    want = sorted(zip(ks, ps, ls), key=lambda t: t[0])
    assert [g[0] for g in got] == [w[0] for w in want]
    assert got[5][1] == want[5][1]
    assert [g[2] for g in got] == [w[2] for w in want]


def test_spark_reads_struct_map_and_encodings(spark, tmp_path):
    n = 2000
    ks = list(range(n))
    structs = [
        None if i % 17 == 0
        else {"a": (None if i % 5 == 0 else i), "b": "s%d" % i}
        for i in range(n)
    ]
    maps = [[("o", i), ("m", i % 97)] for i in range(n)]
    ss = ["prefix_%06d_%s" % (i // 3, "x" * (i % 5))
          for i in range(n)]
    ds = [i * 0.5 for i in range(n)]
    # BYTE_STREAM_SPLIT is omitted here: Spark's vectorized parquet
    # reader raises "Unsupported encoding: BYTE_STREAM_SPLIT" (a
    # Spark gap — pyarrow and DuckDB read our BSS files fine, see
    # test_parquetwrite.py); delta ints and front-coded strings are
    # in parquet-mr's supported set.
    blob = write_parquet(
        [("k", "INT64", ks),
         ("st", "STRUCT<a:INT64,b:BYTE_ARRAY>", structs),
         ("mp", "MAP<BYTE_ARRAY,INT64>", maps),
         ("s", "BYTE_ARRAY", ss), ("d", "DOUBLE", ds)],
        codec="SNAPPY", row_group_size=512, page_rows=128,
        data_page_version=2, write_page_index=True,
        column_encoding={"k": "DELTA_BINARY_PACKED",
                         "s": "DELTA_BYTE_ARRAY"},
    )
    p = os.path.join(tmp_path, "smx.parquet")
    with open(p, "wb") as f:
        f.write(blob)
    df = spark.read.parquet(p)
    got = {r["k"]: r for r in df.collect()}
    assert len(got) == n
    for i in (0, 1, 5, 17, 85, 1999):
        r = got[i]
        if structs[i] is None:
            assert r["st"] is None
        else:
            assert r["st"]["a"] == structs[i]["a"]
            assert r["st"]["b"] == structs[i]["b"]
        assert dict(r["mp"]) == dict(maps[i])
        assert r["s"] == ss[i]
        assert r["d"] == ds[i]
    # Spark pushes an equality filter and still answers exactly on
    # our bloom-filtered, page-indexed file
    one = df.where("k = 1234").collect()
    assert len(one) == 1 and one[0]["s"] == ss[1234]


def test_spark_reads_dictionary_and_rle_bool(spark, tmp_path):
    n = 4000
    cats = [None if i % 9 == 0 else "cat%d" % (i % 7)
            for i in range(n)]
    bools = [None if i % 11 == 0 else (i % 3 == 0)
             for i in range(n)]
    blob = write_parquet(
        [("c", "BYTE_ARRAY", cats), ("b", "BOOLEAN", bools),
         ("k", "INT64", list(range(n)))],
        codec="GZIP", row_group_size=1000,
        use_dictionary=["c"], column_encoding={"b": "RLE"},
    )
    p = os.path.join(tmp_path, "dict.parquet")
    with open(p, "wb") as f:
        f.write(blob)
    got = {r["k"]: (r["c"], r["b"])
           for r in spark.read.parquet(p).collect()}
    assert all(got[i] == (cats[i], bools[i]) for i in range(n))
    agg = spark.read.parquet(p).groupBy("c").count().collect()
    import collections
    want = collections.Counter(cats)
    assert {r["c"]: r["count"] for r in agg} == dict(want)
