"""ORC bloom filter streams (levi_spark.operators.orcbloom) against the
ORC C++ library (pyarrow) as the independent reference — both
directions, byte level.

The long-hash convention is the subtle part: ORC implements Thomas
Wang's 64-bit hash on SIGNED int64 with ARITHMETIC right shifts — NOT
the textbook unsigned formulation, which hashes 0 and all negative
keys differently. hash(0) == 0 is the fingerprint (the all-ones
intermediate collapses under sign-extending shifts); the vectors below
were recovered bit-exactly from pyarrow-written files via CRT over
coprime filter sizes, and the Spark test pins the SECOND reference
writer (ORC Java) to the same bytes.
"""

import io
import struct

import pyarrow as pa
import pyarrow.orc as po
import pytest

from levi_spark.operators.orc import (
    _parse_stripe_footer,
    decompress_stream,
    parse_footer,
    pb_decode,
    plan_scan_bytes,
    read_bloom_index,
    read_column_bytes,
)
from levi_spark.operators.orcbloom import (
    BloomFilter,
    bloom_might_contain,
    hash_value,
    long_hash,
    murmur3_hash64,
    optimal_num_bits,
    optimal_num_hashes,
)
from levi_spark.operators.orcwrite import write_orc


def _pyarrow_blooms(table, fpp=0.05, cols=(1,), stride=10000):
    buf = io.BytesIO()
    po.write_table(table, buf, compression="zlib",
                   bloom_filter_columns=list(cols), bloom_filter_fpp=fpp,
                   row_index_stride=stride)
    data = buf.getvalue()
    f = parse_footer(data)
    comp = f["postscript"]["compression"]
    out = {}
    for st in f["stripes"]:
        sf = _parse_stripe_footer(data, st, comp)
        pos = st["offset"]
        for s in sf["streams"]:
            if s["kind"] == "bloom_filter_utf8":
                raw = decompress_stream(data[pos:pos + s["length"]], comp)
                fl = []
                for bb in pb_decode(raw)[1]:
                    bf = pb_decode(bb)
                    fl.append((bf[1][0], bf[3][0]))
                out.setdefault(s["column"], []).extend(fl)
            pos += s["length"]
    return data, out


def test_long_hash_cpp_vectors():
    # first-position integers recovered from pyarrow files by CRT
    # (see module docstring); position = flip32(low32 + high32)
    def first_pos(h):
        h1 = h & 0xFFFFFFFF
        h2 = (h >> 32) & 0xFFFFFFFF
        if h1 >= 1 << 31:
            h1 -= 1 << 32
        if h2 >= 1 << 31:
            h2 -= 1 << 32
        s = (h1 + h2) & 0xFFFFFFFF
        if s >= 1 << 31:
            s -= 1 << 32
        return (~s) & 0xFFFFFFFF if s < 0 else s

    vectors = {
        0: 0, 1: 325023031, 2: 650054067, 3: 1172334124,
        42: 767109033, 123456789: 1973499094,
        -1: 1822452856, -2: 1497421998, -3: 975108536,
        -42: 1380419718, -123456789: 170870993,
    }
    for v, want in vectors.items():
        assert first_pos(long_hash(v)) == want, v
    assert long_hash(0) == 0  # the C++ fingerprint


def test_sizing_formulas_match_pyarrow():
    # observed from pyarrow: n=10000 fpp=0.05 -> 62400 bits, k=4;
    # fpp=0.5 -> 14464 bits k=1; fpp=0.4 -> 19072 bits k=1;
    # fpp=0.35 -> 21888 bits k=2
    for fpp, bits, k in ((0.05, 62400, 4), (0.5, 14464, 1),
                         (0.4, 19072, 1), (0.35, 21888, 2)):
        m = optimal_num_bits(10000, fpp)
        assert m == bits, (fpp, m)
        assert optimal_num_hashes(10000, m) == k, fpp


def test_int_and_string_bitsets_byte_identical_to_pyarrow():
    vals = [(i * 2654435761) % 999983 - 500000 for i in range(7000)]
    vals[0] = 0
    strs = [f"doc-{abs(v) % 9973}" for v in vals]
    t = pa.table({"k": pa.array(vals, pa.int64()), "s": strs})
    _data, blooms = _pyarrow_blooms(t, cols=(1, 2))
    ours_k = BloomFilter(10000, 0.05)
    for v in vals:
        ours_k.add(v, "long")
    ours_s = BloomFilter(10000, 0.05)
    for s in strs:
        ours_s.add(s, "string")
    assert (ours_k.k, bytes(ours_k.words)) == blooms[1][0]
    assert (ours_s.k, bytes(ours_s.words)) == blooms[2][0]


def test_double_bitset_byte_identical_to_pyarrow():
    # addDouble == addLong(doubleToLongBits)
    vals = [i * 0.75 - 1000.5 for i in range(5000)]
    t = pa.table({"d": pa.array(vals, pa.float64())})
    _data, blooms = _pyarrow_blooms(t, cols=(1,))
    ours = BloomFilter(10000, 0.05)
    for v in vals:
        ours.add(v, "double")
    assert (ours.k, bytes(ours.words)) == blooms[1][0]


def test_reader_consumes_pyarrow_blooms():
    vals = [(i * 2654435761) % 100003 for i in range(30000)]
    t = pa.table({"k": pa.array(vals, pa.int64())})
    data, _ = _pyarrow_blooms(t, cols=(1,))
    f = parse_footer(data)
    blooms = read_bloom_index(data, f, f["stripes"][0], 1)
    assert len(blooms) == 3  # 30000 rows / 10000 stride
    k, bits = blooms[0]
    # deterministic: every present value must test positive
    seg = set(vals[:10000])
    assert all(
        bloom_might_contain(k, bits, hash_value(v, "long"))
        for v in seg
    )
    # statistical: absent values must mostly miss (~fpp); a wrong
    # hash would make present values miss, caught above
    absent = [v for v in range(100003) if v % 7 == 3][:2000]
    miss = sum(
        1 for v in absent if v not in seg
        and not bloom_might_contain(k, bits, hash_value(v, "long"))
    )
    assert miss > 1500


def test_roundtrip_plan_prunes_and_is_sound():
    n = 60000
    keys = [(i * 2654435761) % 1000003 for i in range(n)]
    kset = set(keys)
    strs = [f"u-{k}" for k in keys]
    blob = write_orc(
        [("k", "long", keys), ("s", "string", strs)],
        compression="zlib", stripe_rows=30000,
        bloom_filter=["k", "s"], row_index_stride=10000,
    )
    # pyarrow accepts the layout and the data
    t = po.ORCFile(io.BytesIO(blob)).read()
    assert t.column("k").to_pylist() == keys

    # absent-but-in-range point: stats admit, bloom prunes everything
    absent = next(v for v in range(500000, 1000003) if v not in kset)
    p = plan_scan_bytes(blob, "s", f"u-{absent}", f"u-{absent}",
                        row_groups=True, bloom=True)
    assert p["has_bloom"]
    assert p["rows_pruned_by_bloom"] == n

    # present point: its group is kept, pruned groups truly lack it
    present = keys[34567]
    p = plan_scan_bytes(blob, "k", present, present,
                        row_groups=True, bloom=True)
    all_vals = read_column_bytes(blob, "k")
    for si, ginfo in p["row_groups"].items():
        base_rows = si * 30000
        for g in range(ginfo["groups_total"]):
            seg = all_vals[base_rows + g * 10000:
                           base_rows + (g + 1) * 10000]
            if g in ginfo["groups_kept"]:
                continue
            assert present not in seg, "bloom false negative"
    si, g = 34567 // 30000, (34567 % 30000) // 10000
    assert g in p["row_groups"][si]["groups_kept"]


def test_writer_contract_errors():
    with pytest.raises(ValueError, match="no column"):
        write_orc([("a", "long", [1])], bloom_filter=["zz"])
    with pytest.raises(ValueError, match="unsupported kind"):
        write_orc([("a", "list<long>", [[1]])], bloom_filter=["a"])
    with pytest.raises(ValueError, match="row index"):
        write_orc([("a", "long", [1])], bloom_filter=["a"],
                  row_index_stride=0)


def test_bitsets_byte_identical_to_spark_java_writer(spark, tmp_path):
    # the SECOND reference implementation: Spark writes ORC through
    # the Java library; its blooms must be the same bytes as ours
    # (and pyarrow's) for identical input — negative keys included,
    # where a logical-vs-arithmetic shift mistake would diverge
    import glob

    from pyspark.sql import functions as F

    out = str(tmp_path / "orc")
    (
        spark.range(-5000, 5000, 1, 1)
        .select(F.col("id").alias("k"),
                F.concat(F.lit("s-"), F.col("id")).alias("s"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("orc.bloom.filter.columns", "k,s")
        .option("orc.bloom.filter.fpp", "0.05")
        .option("orc.row.index.stride", "10000")
        .orc(out)
    )
    f = glob.glob(out + "/*.orc")[0]
    with open(f, "rb") as fh:
        data = fh.read()
    foot = parse_footer(data)
    kj, bitsj = read_bloom_index(data, foot, foot["stripes"][0], 1)[0]
    ours_k = BloomFilter(10000, 0.05)
    for v in range(-5000, 5000):
        ours_k.add(v, "long")
    assert (ours_k.k, bytes(ours_k.words)) == (kj, bitsj)
    ks, bitss = read_bloom_index(data, foot, foot["stripes"][0], 2)[0]
    ours_s = BloomFilter(10000, 0.05)
    for v in range(-5000, 5000):
        ours_s.add(f"s-{v}", "string")
    assert (ours_s.k, bytes(ours_s.words)) == (ks, bitss)
    # zero false negatives through the plan-side membership test
    assert all(
        bloom_might_contain(kj, bitsj, hash_value(v, "long"))
        for v in range(-5000, 5000)
    )


def test_murmur3_string_hash_matches_recovered_vector():
    # 'hello' bits observed from pyarrow (k=4, 62400):
    # [1086, 10561, 11390, 37438]
    h = murmur3_hash64(b"hello")
    h1 = h & 0xFFFFFFFF
    h2 = (h >> 32) & 0xFFFFFFFF
    if h1 >= 1 << 31:
        h1 -= 1 << 32
    if h2 >= 1 << 31:
        h2 -= 1 << 32
    got = set()
    for i in range(1, 5):
        c = (h1 + i * h2) & 0xFFFFFFFF
        if c >= 1 << 31:
            c -= 1 << 32
        if c < 0:
            c = (~c) & 0xFFFFFFFF
        got.add(c % 62400)
    assert got == {1086, 10561, 11390, 37438}
