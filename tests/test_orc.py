"""First-principles ORC reader vs pyarrow.orc and Spark's writer.

Ground truth is pyarrow.orc (ORC C++) everywhere; Spark (ORC Java)
written files are cross-checked through the same normalization, so
both independent reference writers' byte streams are exercised —
including their different pre-1970 timestamp conventions.
"""
import datetime
import decimal
import random

import pyarrow as pa
import pyarrow.orc as po
import pytest

from levi_spark.operators import orc

EPD = datetime.date(1970, 1, 1)
EPT = datetime.datetime(1970, 1, 1)


def _norm(v):
    if v is None:
        return None
    if isinstance(v, datetime.datetime):
        td = v.replace(tzinfo=None) - EPT
        return (td.days * 86400 + td.seconds) * 10**9 + td.microseconds * 1000
    if isinstance(v, datetime.date):
        return (v - EPD).days
    if isinstance(v, decimal.Decimal):
        return int(v.scaleb(-v.as_tuple().exponent))
    return v


def _check_file(path):
    ref = po.read_table(path)
    for col in ref.column_names:
        got = orc.read_column(path, col)
        exp = [_norm(v) for v in ref.column(col).to_pylist()]
        assert got == exp, f"{path} column {col}"


# ---------------------------------------------------------- RLE vectors
# Byte/integer run-length examples straight from the ORCv1 spec text.

def test_byte_rle_spec_vectors():
    assert orc.byte_rle(bytes([0x61, 0x00]), 100) == [0] * 100
    assert orc.byte_rle(bytes([0x01, 0x01]), 4) == [1] * 4
    assert orc.byte_rle(bytes([0xFE, 0x44, 0x45]), 2) == [0x44, 0x45]


def test_int_rle_v1_spec_vectors():
    # 100 copies of 7: control 97, delta 0, base varint 7
    assert orc.int_rle_v1(bytes([0x61, 0x00, 0x07]), 100, False) == [7] * 100
    # 100 values 7..106: delta 1
    assert orc.int_rle_v1(bytes([0x61, 0x01, 0x07]), 100, False) == list(
        range(7, 107)
    )
    # literals [2, 3, 6, 7, 11]
    assert orc.int_rle_v1(
        bytes([0xFB, 0x02, 0x03, 0x06, 0x07, 0x0B]), 5, False
    ) == [2, 3, 6, 7, 11]


def test_int_rle_v2_spec_vectors():
    # SHORT_REPEAT: 10000 x5
    assert orc.int_rle_v2(bytes([0x0A, 0x27, 0x10]), 5, False) == [10000] * 5
    # DIRECT: header 0x5e 0x03 = 16-bit width, 4 values, big-endian
    # packed (0x5ca1, 0xab1e, 0xdead, 0xbeef)
    assert orc.int_rle_v2(
        bytes([0x5E, 0x03, 0x5C, 0xA1, 0xAB, 0x1E, 0xDE, 0xAD, 0xBE, 0xEF]),
        4, False,
    ) == [0x5CA1, 0xAB1E, 0xDEAD, 0xBEEF]
    # DELTA: [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]
    assert orc.int_rle_v2(
        bytes([0xC6, 0x09, 0x02, 0x02, 0x22, 0x42, 0x42, 0x46]), 10, False
    ) == [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]
    # PATCHED_BASE: [2030, 2000, 2020, 1000000, 2040..2090 by 10]
    assert orc.int_rle_v2(
        bytes([0x8E, 0x09, 0x2B, 0x21, 0x07, 0xD0, 0x1E, 0x00, 0x14,
               0x70, 0x28, 0x32, 0x3C, 0x46, 0x50, 0x5A, 0xFC, 0xE8]),
        10, False,
    ) == [2030, 2000, 2020, 1000000, 2040, 2050, 2060, 2070, 2080, 2090]


# ------------------------------------------------------ pyarrow writer
@pytest.fixture(scope="module")
def wide_table(tmp_path_factory):
    random.seed(11)
    n = 20000
    pb = [random.randint(0, 100) for _ in range(n)]
    for i in random.sample(range(n), 100):
        pb[i] = random.randint(10**14, 10**15)  # forces PATCHED_BASE
    t = pa.table({
        "pb": pa.array(pb, pa.int64()),
        "i": pa.array(
            [random.randint(-10**12, 10**12) if random.random() > .1
             else None for _ in range(n)], pa.int64()),
        "s": pa.array(
            [random.choice(["alpha", "beta", "gamma"])
             if random.random() > .05 else None for _ in range(n)]),
        "u": pa.array(["u%d" % random.randint(0, 10**9) for _ in range(n)]),
        "d": pa.array(
            [random.random() * 1e6 - 5e5 if random.random() > .1 else None
             for _ in range(n)], pa.float64()),
        "f": pa.array([random.random() for _ in range(n)], pa.float32()),
        "b": pa.array([random.random() > .5 for _ in range(n)]),
        "by": pa.array(
            [random.randint(-128, 127) for _ in range(n)], pa.int8()),
        "sh": pa.array(
            [random.randint(-32768, 32767) for _ in range(n)], pa.int16()),
        "dt": pa.array(
            [EPD + datetime.timedelta(days=random.randint(-7000, 20000))
             if random.random() > .1 else None for _ in range(n)],
            pa.date32()),
        "dec": pa.array(
            [decimal.Decimal(random.randint(-10**10, 10**10)).scaleb(-4)
             if random.random() > .1 else None for _ in range(n)],
            pa.decimal128(14, 4)),
        "ts": pa.array(
            [EPT + datetime.timedelta(
                seconds=random.randint(-2 * 10**9, 2 * 10**9),
                microseconds=random.randint(0, 999999))
             if random.random() > .1 else None for _ in range(n)],
            pa.timestamp("us")),
        "bin": pa.array(
            [random.randbytes(random.randint(0, 16))
             if random.random() > .1 else None for _ in range(n)],
            pa.binary()),
        "l": pa.array(
            [[random.randint(0, 10**6)
              for _ in range(random.randint(0, 4))]
             if random.random() > .1 else None for _ in range(n)],
            pa.list_(pa.int64())),
    })
    return t, tmp_path_factory.mktemp("orc")


@pytest.mark.parametrize(
    "codec", ["uncompressed", "zlib", "snappy", "zstd", "lz4"]
)
def test_pyarrow_roundtrip_all_codecs(wide_table, codec):
    t, d = wide_table
    path = str(d / f"wide_{codec}.orc")
    po.write_table(t, path, compression=codec, stripe_size=128 * 1024)
    f = orc.read_footer(path)
    assert f["num_rows"] == t.num_rows
    assert len(f["stripes"]) > 1  # multi-stripe exercised
    _check_file(path)


def test_timestamp_edges_both_writers(wide_table):
    t, d = wide_table
    vals = [
        datetime.datetime(1960, 5, 5, 1, 2, 3, 500000),
        datetime.datetime(1960, 5, 5, 1, 2, 3, 0),
        datetime.datetime(1969, 12, 31, 23, 59, 59, 999999),
        datetime.datetime(1970, 1, 1, 0, 0, 0, 1),
        datetime.datetime(2014, 12, 31, 23, 59, 59, 999999),
        datetime.datetime(2015, 1, 1, 0, 0, 0, 0),
        datetime.datetime(2020, 6, 1, 6, 7, 8, 123456),
    ]
    path = str(d / "ts_edge.orc")
    po.write_table(
        pa.table({"ts": pa.array(vals, pa.timestamp("us"))}), path,
        compression="zlib",
    )
    _check_file(path)


def test_file_and_stripe_stats(wide_table):
    t, d = wide_table
    path = str(d / "stats.orc")
    po.write_table(t, path, compression="snappy", stripe_size=128 * 1024)
    f = orc.read_footer(path)
    root = f["types"][0]
    col = root["subtypes"][root["field_names"].index("pb")]
    fs = f["file_stats"][col]
    vals = t.column("pb").to_pylist()
    assert fs["min"] == min(vals) and fs["max"] == max(vals)
    assert len(f["stripe_stats"]) == len(f["stripes"])


def test_plan_scan_prunes_and_is_sound(tmp_path):
    n = 400000
    random.seed(4)
    t = pa.table({"k": pa.array(range(n), pa.int64()),
                  "v": pa.array([random.randint(0, 10**12)
                                 for _ in range(n)], pa.int64())})
    path = str(tmp_path / "sorted.orc")
    po.write_table(t, path, compression="zstd", stripe_size=64 * 1024)
    f = orc.read_footer(path)
    assert len(f["stripes"]) >= 3
    lo, hi = 10, 50
    plan = orc.plan_scan(path, "k", lo, hi)
    assert plan["stripes_pruned"], "sorted key must prune stripes"
    # soundness: decode every pruned stripe, no in-range value exists
    full = orc.read_column(path, "k")
    offs = [0]
    for s in f["stripes"]:
        offs.append(offs[-1] + s["num_rows"])
    for i in plan["stripes_pruned"]:
        assert all(not (lo <= v <= hi) for v in full[offs[i]:offs[i + 1]])
    kept_rows = sum(f["stripes"][i]["num_rows"]
                    for i in plan["stripes_kept"])
    assert kept_rows + plan["rows_pruned"] == n


def test_row_group_pruning_and_seek_reads(tmp_path):
    random.seed(13)
    n = 60000

    def maybe(f, p=.85):
        return f() if random.random() < p else None

    t = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "i": pa.array([maybe(lambda: random.randint(-10**13, 10**13))
                       for _ in range(n)], pa.int64()),
        "s": pa.array([maybe(lambda: "s%d" % random.randint(0, 10**7))
                       for _ in range(n)]),
        "dct": pa.array([random.choice(["aa", "bb", "cc"])
                         for _ in range(n)]),
        "d": pa.array([maybe(lambda: random.random())
                       for _ in range(n)], pa.float64()),
        "b": pa.array([maybe(lambda: random.random() > .5)
                       for _ in range(n)]),
        "by": pa.array([random.randint(-128, 127) for _ in range(n)],
                       pa.int8()),
        "bin": pa.array([maybe(lambda: random.randbytes(
            random.randint(0, 9))) for _ in range(n)], pa.binary()),
    })
    path = str(tmp_path / "rg.orc")
    po.write_table(t, path, compression="zstd", stripe_size=512 * 1024)
    f = orc.read_footer(path)
    stride = f["row_index_stride"]
    assert stride == 10000
    # row-group pruning on the sorted key inside surviving stripes
    lo, hi = 12345, 23456
    plan = orc.plan_scan(path, "k", lo, hi, row_groups=True)
    assert plan["rows_pruned_by_row_groups"] > 0
    full = {c: orc.read_column(path, c) for c in t.column_names}
    offs = [0]
    for s in f["stripes"]:
        offs.append(offs[-1] + s["num_rows"])
    for si, g in plan["row_groups"].items():
        seg = full["k"][offs[si]:offs[si + 1]]
        for gi in g["groups_pruned"]:  # soundness: decode the pruned
            assert all(not (lo <= v <= hi)
                       for v in seg[gi * stride:(gi + 1) * stride])
    # position-based seek: every (column, stripe, edge group) decodes
    # to exactly the full read's slice
    for c in t.column_names:
        for si, s in enumerate(f["stripes"]):
            ngroups = -(-s["num_rows"] // stride)
            for gi in (0, ngroups // 2, ngroups - 1):
                got = orc.read_row_group(path, c, si, gi)
                at = offs[si] + gi * stride
                exp = full[c][at : at + min(
                    stride, s["num_rows"] - gi * stride)]
                assert got == exp, (c, si, gi)


def test_row_group_seek_timestamp_decimal(tmp_path):
    import decimal as _dec
    random.seed(21)
    n = 45000
    ts = [EPT + datetime.timedelta(
        seconds=random.randint(-2 * 10**9, 2 * 10**9),
        microseconds=random.randint(0, 999999)) for _ in range(n)]
    decs = [_dec.Decimal(random.randint(-10**10, 10**10)).scaleb(-4)
            for _ in range(n)]
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                  "dec": pa.array(decs, pa.decimal128(14, 4))})
    path = str(tmp_path / "tsdec.orc")
    po.write_table(t, path, compression="zstd",
                   stripe_size=4 * 1024 * 1024)
    f = orc.read_footer(path)
    stride = f["row_index_stride"]
    for c in ("ts", "dec"):
        full = orc.read_column(path, c)
        for g in (0, 1, 4):
            got = orc.read_row_group(path, c, 0, g)
            assert got == full[g * stride:(g + 1) * stride], (c, g)


def test_row_group_seek_uncompressed(tmp_path):
    n = 25000
    t = pa.table({"k": pa.array(range(n), pa.int64()),
                  "s": pa.array(["v%d" % (i % 100) for i in range(n)])})
    path = str(tmp_path / "u.orc")
    po.write_table(t, path, compression="uncompressed",
                   stripe_size=8 * 1024 * 1024)
    f = orc.read_footer(path)
    assert f["stripes"][0]["num_rows"] > f["row_index_stride"]
    full = orc.read_column(path, "s")
    stride = f["row_index_stride"]
    got = orc.read_row_group(path, "s", 0, 1)
    assert got == full[stride : 2 * stride]
    got_k = orc.read_row_group(path, "k", 0, 1)
    assert got_k == list(range(stride, 2 * stride))


def test_unknown_column_and_bad_magic(tmp_path):
    t = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    path = str(tmp_path / "t.orc")
    po.write_table(t, path)
    with pytest.raises(ValueError, match="not in"):
        orc.read_column(path, "nope")
    with pytest.raises(ValueError, match="magic"):
        orc.parse_footer(b"\x00" * 64 + b"\x05")


# ------------------------------------------------------ record assembly
def _norm_nested(v):
    if isinstance(v, dict):
        return {k: _norm_nested(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_norm_nested(x) for x in v]
    if isinstance(v, tuple):
        return tuple(_norm_nested(x) for x in v)
    return _norm(v)


def test_read_rows_arbitrary_nesting(tmp_path):
    random.seed(42)
    n = 4000

    def maybe(f, p=.85):
        return f() if random.random() < p else None

    t = pa.table({
        "st": pa.array(
            [maybe(lambda: {"a": maybe(lambda: random.randint(0, 1000)),
                            "b": maybe(lambda: random.choice(
                                ["x", "yy", "zzz"]))})
             for _ in range(n)],
            pa.struct([("a", pa.int64()), ("b", pa.utf8())])),
        "lol": pa.array(
            [maybe(lambda: [maybe(lambda: [random.randint(0, 9)
                                           for _ in range(
                                               random.randint(0, 3))], .9)
                            for _ in range(random.randint(0, 3))])
             for _ in range(n)], pa.list_(pa.list_(pa.int64()))),
        "los": pa.array(
            [maybe(lambda: [maybe(lambda: {"u": random.random(),
                                           "v": maybe(lambda:
                                                      random.randint(-5, 5))},
                                  .9)
                            for _ in range(random.randint(0, 2))])
             for _ in range(n)],
            pa.list_(pa.struct([("u", pa.float64()), ("v", pa.int64())]))),
        "m": pa.array(
            [maybe(lambda: {f"k{random.randint(0, 5)}":
                            maybe(lambda: random.randint(0, 100))
                            for _ in range(random.randint(0, 3))})
             for _ in range(n)], pa.map_(pa.utf8(), pa.int64())),
        "swl": pa.array(
            [maybe(lambda: {"tags": maybe(lambda: [
                random.choice(["p", "q"])
                for _ in range(random.randint(0, 3))]),
                "w": random.random()})
             for _ in range(n)],
            pa.struct([("tags", pa.list_(pa.utf8())), ("w", pa.float64())])),
        "ts": pa.array(
            [maybe(lambda: EPT + datetime.timedelta(
                seconds=random.randint(-2 * 10**9, 2 * 10**9),
                microseconds=random.randint(0, 999999)))
             for _ in range(n)], pa.timestamp("us")),
    })
    path = str(tmp_path / "nested.orc")
    po.write_table(t, path, compression="zstd", stripe_size=128 * 1024)
    ref = [
        {k: _norm_nested(v) for k, v in row.items()}
        for row in po.read_table(path).to_pylist()
    ]
    got = orc.read_rows(path)
    assert got == ref


def test_read_column_nested_kinds(tmp_path):
    t = pa.table({
        "st": pa.array([{"a": i} for i in range(100)],
                       pa.struct([("a", pa.int64())])),
        "m": pa.array([{"k": i} for i in range(100)],
                      pa.map_(pa.utf8(), pa.int64())),
    })
    path = str(tmp_path / "n2.orc")
    po.write_table(t, path)
    assert orc.read_column(path, "st")[3] == {"a": 3}
    assert orc.read_column(path, "m")[3] == [("k", 3)]


def test_read_rows_spark_written(spark, tmp_path):
    from pyspark.sql import functions as F

    df = spark.range(3000).select(
        F.col("id"),
        F.struct(F.col("id").alias("a"),
                 F.concat(F.lit("s"), F.col("id").cast("string"))
                 .alias("b")).alias("st"),
        F.array(F.col("id"), F.col("id") + 1).alias("arr"),
        F.when(F.col("id") % 7 != 0,
               F.create_map(F.lit("k1"), F.col("id"),
                            F.lit("k2"), F.col("id") * 2)).alias("m"),
        F.when(F.col("id") % 5 != 0,
               F.array(F.struct((F.col("id") % 3).alias("u"))))
        .alias("los"),
    )
    tgt = str(tmp_path / "sparknested")
    (df.coalesce(1).write.mode("overwrite")
       .option("compression", "zstd").orc(tgt))
    import glob
    path = glob.glob(tgt + "/part-*.orc")[0]
    ref = [
        {k: _norm_nested(v) for k, v in row.items()}
        for row in po.read_table(path).to_pylist()
    ]
    assert orc.read_rows(path) == ref


# -------------------------------------------------------- spark writer
@pytest.fixture(scope="module")
def spark_orc_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sparkorc")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df = li.select("l_orderkey", "l_partkey", "l_quantity",
                   "l_extendedprice", "l_shipdate", "l_returnflag",
                   "l_linestatus").orderBy("l_orderkey")
    import glob
    import shutil
    out = {}
    for codec in ["snappy", "zstd", "zlib", "lz4", "none"]:
        tgt = str(d / f"dir_{codec}")
        (df.coalesce(1).write.mode("overwrite")
           .option("compression", codec)
           .option("orc.stripe.size", 262144)
           .orc(tgt))
        out[codec] = shutil.copy(
            glob.glob(tgt + "/part-*.orc")[0], str(d / f"{codec}.orc")
        )
    return out


@pytest.mark.parametrize("codec", ["snappy", "zstd", "zlib", "lz4", "none"])
def test_spark_written_files(spark_orc_dir, codec):
    path = spark_orc_dir[codec]
    f = orc.read_footer(path)
    assert f["postscript"]["compression"] == (
        "none" if codec == "none" else codec
    )
    _check_file(path)


def test_spark_file_pruning(spark_orc_dir):
    path = spark_orc_dir["zstd"]
    f = orc.read_footer(path)
    if len(f["stripes"]) < 2:
        pytest.skip("single stripe at this scale")
    plan = orc.plan_scan(path, "l_orderkey", 1, 5)
    assert plan["rows_pruned"] > 0
