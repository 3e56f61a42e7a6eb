"""First-principles ORC writer vs pyarrow.orc, Spark's reader, and
our own first-principles reader (three independent readers)."""
import io
import random

import pyarrow.orc as po
import pytest

from levi_spark.operators import orc as rorc
from levi_spark.operators.orcwrite import (
    boolean_rle_encode,
    byte_rle_encode,
    int_rle_v2_encode,
    write_orc,
)
from tests.test_orc import _norm_nested


def _wide_columns(n=6000, seed=5):
    random.seed(seed)

    def maybe(f, p=.85):
        return f() if random.random() < p else None

    return [
        ("k", "long", list(range(n))),
        ("i", "long", [maybe(lambda: random.randint(-10**14, 10**14))
                       for _ in range(n)]),
        ("s", "string", [maybe(lambda: random.choice(
            ["alpha", "beta", "gamma"]) + str(random.randint(0, 99)))
            for _ in range(n)]),
        ("d", "double", [maybe(lambda: random.random() * 1e6 - 5e5)
                         for _ in range(n)]),
        ("f", "float", [random.choice([0.5, 1.25, -3.75])
                        for _ in range(n)]),
        ("b", "boolean", [maybe(lambda: random.random() > .5)
                          for _ in range(n)]),
        ("by", "byte", [random.randint(-128, 127) for _ in range(n)]),
        ("dt", "date", [maybe(lambda: random.randint(-7000, 20000))
                        for _ in range(n)]),
        ("dec", "decimal(14,4)",
         [maybe(lambda: random.randint(-10**10, 10**10))
          for _ in range(n)]),
        # sub-second part kept >= 1 ms: pre-1970 instants with a
        # sub-millisecond fraction sit in the ecosystem's known
        # Java-writer/C++-reader +1 s divergence band (see
        # orc._combine_ts), which the boundary test covers explicitly
        ("ts", "timestamp",
         [maybe(lambda: random.randint(-2 * 10**9, 2 * 10**9) * 10**9
                + random.randint(1, 999) * 10**6) for _ in range(n)]),
        ("bin", "binary", [maybe(lambda: random.randbytes(
            random.randint(0, 12))) for _ in range(n)]),
        ("l", "list<long>", [maybe(lambda: [
            random.randint(0, 100)
            for _ in range(random.randint(0, 4))]) for _ in range(n)]),
        ("st", "struct<a:long,b:string>", [maybe(lambda: {
            "a": maybe(lambda: random.randint(0, 9)),
            "b": maybe(lambda: "x" * random.randint(0, 3))})
            for _ in range(n)]),
        ("m", "map<string,long>", [maybe(lambda: {
            f"k{j}": random.randint(0, 5)
            for j in range(random.randint(0, 3))}) for _ in range(n)]),
    ]


def _assert_pyarrow_reads(blob, cols):
    t = po.read_table(io.BytesIO(blob))
    assert t.num_rows == len(cols[0][2])
    for name, _typ, vals in cols:
        got = [_norm_nested(v) for v in t.column(name).to_pylist()]
        if name == "m":
            got = [sorted(v) if v is not None else None for v in got]
            vals = [sorted(v.items()) if v is not None else None
                    for v in vals]
        assert got == vals, f"pyarrow column {name}"


# ----------------------------------------------------------- encoders
def test_rle_v2_encode_roundtrip():
    random.seed(1)
    for signed in (True, False):
        lo = -10**15 if signed else 0
        vals = [random.randint(lo, 10**15) for _ in range(3000)]
        vals[100:400] = [42] * 300  # long run -> SHORT_REPEATs
        enc = int_rle_v2_encode(vals, signed)
        assert rorc.int_rle_v2(enc, len(vals), signed) == vals


def test_rle_v2_delta_runs_roundtrip():
    for signed in (True, False):
        vals = (list(range(0, 6000, 3)) + [7] * 20
                + list(range(10**9, 10**9 - 4000, -2))
                + [random.randint(0, 10**12) for _ in range(500)])
        if signed:
            vals += [-x for x in vals[:200]]
        enc = int_rle_v2_encode(vals, signed)
        assert rorc.int_rle_v2(enc, len(vals), signed) == vals
    # the sorted-key stream must actually be small (DELTA fired)
    sorted_keys = int_rle_v2_encode(list(range(100000)), True)
    assert len(sorted_keys) < 2000


def test_dictionary_strings(tmp_path):
    random.seed(8)
    n = 9000
    strs = [random.choice(["alpha", "beta", "gamma", "delta", "eps"])
            if random.random() > .1 else None for _ in range(n)]
    bins = [random.choice([b"\x01\x02", b"zz", b""]) for _ in range(n)]
    blob = write_orc(
        [("k", "long", list(range(n))), ("s", "string", strs),
         ("bn", "binary", bins)],
        compression="zstd", stripe_rows=4000, dictionary=["s", "bn"],
    )
    t = po.read_table(io.BytesIO(blob))
    assert t.column("s").to_pylist() == strs
    assert t.column("bn").to_pylist() == bins
    rows = rorc.read_rows_bytes(blob)
    assert [r["s"] for r in rows] == strs
    assert [r["bn"] for r in rows] == bins
    # dictionary + DELTA keys beat the plain layout handily
    plain = write_orc(
        [("k", "long", list(range(n))), ("s", "string", strs),
         ("bn", "binary", bins)], compression="none", stripe_rows=4000,
    )
    rich = write_orc(
        [("k", "long", list(range(n))), ("s", "string", strs),
         ("bn", "binary", bins)], compression="none", stripe_rows=4000,
        dictionary=True,
    )
    assert len(rich) * 4 < len(plain)


def test_byte_and_boolean_rle_roundtrip():
    random.seed(2)
    bs = [random.randint(0, 255) for _ in range(1000)]
    bs[50:300] = [7] * 250
    assert rorc.byte_rle(byte_rle_encode(bs), len(bs)) == bs
    bits = [random.random() > .3 for _ in range(997)]
    assert rorc.boolean_rle(boolean_rle_encode(bits), len(bits)) == bits


# ----------------------------------------------------- file round-trips
@pytest.mark.parametrize("codec", ["none", "zstd", "snappy", "zlib", "lz4"])
def test_write_read_all_codecs(codec):
    cols = _wide_columns()
    blob = write_orc(cols, compression=codec, stripe_rows=2500)
    _assert_pyarrow_reads(blob, cols)
    rows = rorc.read_rows_bytes(blob)
    assert [r["k"] for r in rows] == list(range(len(cols[0][2])))
    assert rorc.read_column_bytes(blob, "ts") == cols[9][2]
    f = rorc.parse_footer(blob)
    assert len(f["stripes"]) == 3
    assert len(f["stripe_stats"]) == 3


def test_own_planner_prunes_own_file(tmp_path):
    n = 50000
    cols = [("k", "long", list(range(n))),
            ("pad", "string", ["p" * 40 for _ in range(n)])]
    blob = write_orc(cols, compression="zstd", stripe_rows=5000)
    path = tmp_path / "own.orc"
    path.write_bytes(blob)
    plan = rorc.plan_scan(str(path), "k", 100, 200)
    assert len(plan["stripes_pruned"]) == 9
    assert plan["rows_pruned"] == 45000
    # file stats present and exact
    f = rorc.parse_footer(blob)
    col = f["types"][0]["subtypes"][0]
    assert f["file_stats"][col]["min"] == 0
    assert f["file_stats"][col]["max"] == n - 1
    assert f["file_stats"][col]["sum"] == n * (n - 1) // 2


def test_timestamp_epoch_boundaries_roundtrip():
    # Java convention (Spark's writer layout): exact round-trip
    # through pyarrow and our reader whenever the instant is >= 1970
    # or its sub-second fraction is zero or >= 1 ms
    vals = [0, 1000, -10**9, 10**18, -5 * 10**9 + 500_000_000,
            -10**15 + 250_000_000, -1420070400 * 10**9 - 1000]
    blob = write_orc([("ts", "timestamp", vals)], compression="zlib")
    assert rorc.read_column_bytes(blob, "ts") == vals
    t = po.read_table(io.BytesIO(blob))
    # compare as epoch-ns ints: to_pylist() truncates to datetime's
    # microsecond precision, which would hide sub-us values
    assert t.column("ts").cast("int64").to_pylist() == vals
    # pre-1970 instants with a SUB-MILLISECOND fraction sit in the
    # ecosystem's known +1 s divergence band (the C++ reader only
    # adjusts when nanos > 999999) — pyarrow and our reader diverge
    # IDENTICALLY, exactly as they do on Spark-written files
    edge = [-1000, -999999000, -10**15 + 500, -2 * 10**9 + 77000]
    blob = write_orc([("ts", "timestamp", edge)], compression="none")
    ours = rorc.read_column_bytes(blob, "ts")
    theirs = po.read_table(io.BytesIO(blob)).column("ts").cast(
        "int64").to_pylist()
    assert ours == theirs == [v + 10**9 for v in edge]


def test_empty_and_all_null_columns():
    blob = write_orc([("a", "long", []), ("b", "string", [])])
    assert rorc.read_rows_bytes(blob) == []
    blob = write_orc([("a", "long", [None, None, None])])
    assert rorc.read_column_bytes(blob, "a") == [None, None, None]
    t = po.read_table(io.BytesIO(blob))
    assert t.column("a").to_pylist() == [None, None, None]


def test_ragged_and_unknown_type_raise():
    with pytest.raises(ValueError, match="ragged"):
        write_orc([("a", "long", [1]), ("b", "long", [1, 2])])
    with pytest.raises(NotImplementedError):
        write_orc([("a", "uuid", [1])])


def test_union_columns_roundtrip():
    random.seed(31)
    n = 8000
    vals = []
    for _ in range(n):
        r = random.random()
        if r < .1:
            vals.append(None)
        elif r < .55:
            vals.append((0, random.randint(-10**9, 10**9)))
        else:
            vals.append((1, "u%d" % random.randint(0, 10**6)))
    blob = write_orc(
        [("k", "long", list(range(n))),
         ("u", "union<long,string>", vals)],
        compression="zstd", stripe_rows=3000,
    )
    rows = rorc.read_rows_bytes(blob)
    assert [r["u"] for r in rows] == vals
    # pyarrow reads the union as sparse_union with matching values
    t = po.read_table(io.BytesIO(blob))
    assert t.column("u").to_pylist() == [
        None if v is None else v[1] for v in vals
    ]
    with pytest.raises(ValueError, match="tag out of range"):
        write_orc([("u", "union<long,string>", [(7, 1)])])


def test_spark_reads_our_files(spark, tmp_path):
    cols = _wide_columns(n=3000, seed=9)
    # Spark's vectorized ORC reader; drop map (Spark reads it fine but
    # row comparison via pyarrow is the canonical path above) — keep
    # every scalar + list + struct
    keep = [c for c in cols if c[0] != "m"]
    blob = write_orc(keep, compression="zstd", stripe_rows=1000)
    p = tmp_path / "ours.orc"
    p.write_bytes(blob)
    df = spark.read.orc(str(p))
    got = df.orderBy("k").collect()
    assert len(got) == 3000
    ks = [r["k"] for r in got]
    assert ks == list(range(3000))
    assert [r["i"] for r in got] == keep[1][2]
    assert [r["s"] for r in got] == keep[2][2]
    assert [r["b"] for r in got] == keep[5][2]
    assert [r["l"] for r in got] == keep[11][2]
    sts = [None if r["st"] is None else {"a": r["st"]["a"],
                                         "b": r["st"]["b"]}
           for r in got]
    assert sts == keep[12][2]
    # dates/timestamps through Spark come back as objects; spot-check
    import datetime
    exp_dt = keep[7][2]
    for r, e in zip(got, exp_dt):
        if e is None:
            assert r["dt"] is None
        else:
            assert (r["dt"] - datetime.date(1970, 1, 1)).days == e
