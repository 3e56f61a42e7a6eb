"""Parquet split-block Bloom filters: spec math, header codec,
writer integration, point-lookup planning, and the no-false-negative
law."""

import random
import struct

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from levi_spark.operators.parquetbloom import (
    SplitBlockBloom,
    bloom_hash,
    bloom_header_bytes,
    optimal_num_bytes,
    plan_point_lookup_bytes,
    read_bloom_filter,
)
from levi_spark.operators.parquetmeta import read_column_bytes
from levi_spark.operators.parquetwrite import write_parquet


def test_optimal_num_bytes_monotone_power_of_two():
    prev = 0
    for ndv in (1, 10, 100, 1000, 50000, 1000000):
        n = optimal_num_bytes(ndv, 0.01)
        assert n >= 32 and n & (n - 1) == 0
        assert n >= prev
        prev = n
    # tighter fpp -> more bytes
    assert optimal_num_bytes(10000, 0.001) > optimal_num_bytes(
        10000, 0.05
    )
    with pytest.raises(ValueError):
        optimal_num_bytes(100, 1.5)


def test_sbbf_size_validation():
    with pytest.raises(ValueError):
        SplitBlockBloom(31)
    with pytest.raises(ValueError):
        SplitBlockBloom(48)  # not a power of two
    with pytest.raises(ValueError):
        SplitBlockBloom(32, b"\x00" * 64)


def test_block_math_touches_one_block():
    """The 8 salted bits land in 8 distinct words of ONE 32-byte
    block — the cache-line property the split-block design buys."""
    bf = SplitBlockBloom(1024)
    h = bloom_hash("INT64", 12345)
    bf.insert_hash(h)
    set_words = [
        i for i in range(0, 1024, 4)
        if struct.unpack_from("<I", bf.bits, i)[0]
    ]
    assert len(set_words) == 8
    block = set_words[0] // 32
    assert all(w // 32 == block for w in set_words)


def test_no_false_negatives_all_types():
    rng = random.Random(1)
    cases = [
        ("INT64", [rng.randrange(-(2**62), 2**62)
                   for _ in range(2000)]),
        ("INT32", [rng.randrange(-(2**31), 2**31)
                   for _ in range(2000)]),
        ("DOUBLE", [rng.random() * 1e9 for _ in range(2000)]),
        ("FLOAT", [float(struct.unpack(
            "<f", struct.pack("<f", rng.random()))[0])
            for _ in range(2000)]),
        ("BYTE_ARRAY", ["w%d" % rng.randrange(10**9)
                        for _ in range(2000)]),
    ]
    for ptype, vals in cases:
        bf = SplitBlockBloom(optimal_num_bytes(len(set(vals))))
        for v in vals:
            bf.insert(ptype, v)
        assert all(bf.might_contain(ptype, v) for v in vals), ptype


def test_fpr_bounded():
    rng = random.Random(2)
    vals = rng.sample(range(10**9), 5000)
    bf = SplitBlockBloom(optimal_num_bytes(5000, 0.01))
    for v in vals:
        bf.insert("INT64", v)
    present = set(vals)
    fp = sum(
        bf.might_contain("INT64", v)
        for v in range(2 * 10**9, 2 * 10**9 + 20000)
        if v not in present
    )
    assert fp / 20000 < 0.02  # spec-level fpp 0.01, 2x slack


def test_header_roundtrip_and_refusals():
    bf = SplitBlockBloom(64)
    bf.insert("INT64", 7)
    blob = bloom_header_bytes(64) + bytes(bf.bits)
    back = read_bloom_filter(blob, 0)
    assert back.might_contain("INT64", 7)
    assert not back.might_contain("INT64", 8)
    with pytest.raises(ValueError, match="truncated"):
        read_bloom_filter(blob[:-1], 0)


def test_boolean_bloom_refused():
    with pytest.raises(NotImplementedError):
        bloom_hash("BOOLEAN", True)


def _bloom_file(rng, n=20000, rg=1024):
    ks = sorted(rng.sample(range(0, 10**6, 7), n))
    ss = ["s%d" % (k * 3) for k in ks]
    blob = write_parquet(
        [("k", "INT64", ks), ("s", "BYTE_ARRAY", ss)],
        codec="SNAPPY", row_group_size=rg, bloom_filter=True,
    )
    return ks, ss, blob


def test_writer_bloom_interop_and_plan():
    rng = random.Random(7)
    ks, ss, blob = _bloom_file(rng)
    # pyarrow still reads the file (unknown fields are skippable)
    t = pq.read_table(pa.BufferReader(blob))
    assert t.column("k").to_pylist() == ks
    assert read_column_bytes(blob, "k") == ks
    # every present key's true row group is kept (no false negatives)
    for k in rng.sample(ks, 200):
        plan = plan_point_lookup_bytes(blob, "k", k)
        assert plan["has_bloom"]
        assert ks.index(k) // 1024 in plan["row_groups_kept"]
    # absent keys inside the global range: bloom prunes beyond stats
    present = set(ks)
    bloom_pruned = 0
    for _ in range(200):
        k = rng.randrange(0, 10**6)
        if k in present:
            continue
        plan = plan_point_lookup_bytes(blob, "k", k)
        bloom_pruned += sum(
            1 for why in plan["pruned"].values() if why == "bloom"
        )
    assert bloom_pruned > 0
    # string column filters work through the same plan
    s = ss[1234]
    plan = plan_point_lookup_bytes(blob, "s", s)
    assert plan["row_groups_kept"]


def test_plan_soundness_decode_pruned_groups():
    """Decoding the groups the plan PRUNED must yield zero matches —
    the same in-map law the parquet_prune_scan gate asserts."""
    rng = random.Random(9)
    ks, _ss, blob = _bloom_file(rng, n=8000, rg=512)
    all_vals = read_column_bytes(blob, "k")
    present = set(ks)
    probes = [ks[17], ks[4000], ks[-3]] + [
        v for v in rng.sample(range(0, 10**6), 50)
        if v not in present
    ]
    for val in probes:
        plan = plan_point_lookup_bytes(blob, "k", val)
        for gi in plan["pruned"]:
            seg = all_vals[gi * 512: (gi + 1) * 512]
            assert val not in seg, (
                f"UNSOUND: {val} found in pruned group {gi} "
                f"({plan['pruned'][gi]})"
            )


def test_bloom_with_dictionary_and_column_subset():
    rng = random.Random(3)
    ks = [rng.randrange(100) for _ in range(5000)]  # low cardinality
    blob = write_parquet(
        [("k", "INT64", ks), ("j", "INT64", list(range(5000)))],
        codec="ZSTD", row_group_size=2048,
        use_dictionary=["k"], bloom_filter=["k"],
    )
    assert read_column_bytes(blob, "k") == ks
    plan = plan_point_lookup_bytes(blob, "k", 42)
    assert plan["has_bloom"]
    # j has no bloom filter: plan degrades to stats-only
    plan_j = plan_point_lookup_bytes(blob, "j", 4999)
    assert not plan_j["has_bloom"]
    assert plan_j["row_groups_kept"] == [2]


def test_reader_consumes_spark_written_blooms(spark, tmp_path):
    """Second-reference cross-check (mirrors the ORC dual-writer pin):
    parquet-mr SBBF bytes written by Spark must behave exactly under
    our reader — every present value kept (a false negative = wrong
    xxHash64 or block math), in-range absent values pruned by the
    BLOOM (stats can't help there)."""
    import glob

    from pyspark.sql import functions as F

    out = str(tmp_path / "pq")
    (
        spark.range(-5000, 5000, 1, 1)
        .select(F.col("id").alias("k"),
                F.concat(F.lit("s-"), F.col("id")).alias("s"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#k", "true")
        .option("parquet.bloom.filter.enabled#s", "true")
        .option("parquet.bloom.filter.expected.ndv#k", "10000")
        .option("parquet.bloom.filter.expected.ndv#s", "10000")
        .parquet(out)
    )
    f = glob.glob(out + "/*.parquet")[0]
    with open(f, "rb") as fh:
        data = fh.read()

    for v in range(-5000, 5000, 97):  # every present probe kept
        p = plan_point_lookup_bytes(data, "k", v)
        assert p["has_bloom"] and not p["pruned"], v
        ps = plan_point_lookup_bytes(data, "s", f"s-{v}")
        assert ps["has_bloom"] and not ps["pruned"], v
    # in-range absents: the 10k dense ints leave no integer gaps, so
    # int absents sit outside [min,max] — use strings, where
    # "s-<v>x" sorts inside the value range but occurs nowhere
    bloom_pruned = 0
    for v in range(0, 400, 7):
        p = plan_point_lookup_bytes(data, "s", f"s-{v}x")
        if p["pruned"] and "bloom" in set(p["pruned"].values()):
            bloom_pruned += 1
    assert bloom_pruned >= 50  # ~57 probes at fpp 0.01


def test_plan_scan_point_consults_bloom(tmp_path):
    """plan_scan with lo == hi probes the bloom filters: a present
    key keeps exactly its group, absent in-range keys prune the
    stats-admitted group, range scans never touch the filters."""
    from levi_spark.operators.parquetmeta import plan_scan

    rng = random.Random(4)
    ks = sorted(rng.sample(range(0, 10**6, 7), 20000))
    blob = write_parquet(
        [("k", "INT64", ks)], codec="SNAPPY", row_group_size=1024,
        page_rows=256, write_page_index=True, bloom_filter=["k"],
    )
    p = tmp_path / "pt.parquet"
    p.write_bytes(blob)
    plan = plan_scan(str(p), "k", ks[7777], ks[7777])
    assert plan["has_bloom"]
    assert plan["row_groups_kept"] == [7777 // 1024]
    present = set(ks)
    pruned = 0
    for _ in range(40):
        v = rng.randrange(0, 10**6)
        if v in present:
            continue
        pt = plan_scan(str(p), "k", v, v)
        pruned += len(pt["row_groups_pruned_by_bloom"])
        # soundness inherited: pruned groups cannot hold the value
        all_vals = read_column_bytes(blob, "k")
        for gi in pt["row_groups_pruned_by_bloom"]:
            assert v not in all_vals[gi * 1024: (gi + 1) * 1024]
    assert pruned > 0
    rng_plan = plan_scan(str(p), "k", 3000, 9000)
    assert not rng_plan["has_bloom"]
    assert not rng_plan["row_groups_pruned_by_bloom"]


def test_flba_decimal_planner_signed_order(tmp_path):
    """FLBA decimal stats are signed two's complement; unsigned byte
    comparison would stats-prune groups CONTAINING a negative probe
    (a false negative). The planner compares under the declared
    DECIMAL order, normalizes Decimal probes, bloom-probes the raw
    FLBA bytes, and returns a clean empty plan for probes finer than
    the column scale."""
    import bisect
    import decimal

    from levi_spark.operators.parquetmeta import plan_scan

    vals = [decimal.Decimal(k).scaleb(-3)
            for k in range(-1000000, 1000000, 97)]
    blob = write_parquet(
        [("wd", "DECIMAL(23,3)", vals)], codec="SNAPPY",
        row_group_size=2048, page_rows=512,
        write_page_index=True, bloom_filter=["wd"],
    )
    p = tmp_path / "wd.parquet"
    p.write_bytes(blob)
    # negative present probe: its group MUST survive
    probe = vals[100]
    assert probe < 0
    plan = plan_scan(str(p), "wd", probe, probe)
    assert 100 // 2048 in plan["row_groups_kept"]
    # absent (scale-fitting) probe: bloom prunes
    pl2 = plan_scan(str(p), "wd", decimal.Decimal("0.001"),
                    decimal.Decimal("0.001"))
    assert not pl2["row_groups_kept"]
    assert pl2["row_groups_pruned_by_bloom"]
    # probe finer than the column scale equals nothing: empty plan
    fine = decimal.Decimal("-0.0005")
    pl4 = plan_scan(str(p), "wd", fine, fine)
    assert not pl4["row_groups_kept"]
    assert pl4["rows_pruned_by_group_stats"] == len(vals)
    # range scan across the sign boundary keeps exactly the span
    lo, hi = decimal.Decimal("-5.000"), decimal.Decimal("5.000")
    pl3 = plan_scan(str(p), "wd", lo, hi)
    first = bisect.bisect_left(vals, lo) // 2048
    last = (bisect.bisect_right(vals, hi) - 1) // 2048
    assert pl3["row_groups_kept"] == list(range(first, last + 1))
    # bloom probe accepts raw FLBA bytes too
    raw = int(probe.scaleb(3)).to_bytes(10, "big", signed=True)
    pb = plan_point_lookup_bytes(blob, "wd", raw)
    assert 100 // 2048 in pb["row_groups_kept"]
