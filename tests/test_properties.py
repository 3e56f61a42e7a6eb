"""Property-based tests (hypothesis) — the reference suite pins golden
examples; these pin the *laws* behind them: unit parsing is linear in
the number, boundary parsing brackets correctly, emitted pruning SQL is
sound (never prunes a file that could contain a matching value), and
the dedup transforms satisfy their set-algebra definitions on arbitrary
inputs, not just the canonical fixtures."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from levi_spark.functions.units import TEN_TB, boundary_parser, str_to_bytes
from levi_spark.operators.metadata import filter_to_sql, filters_to_sql

UNIT_FACTORS = {"b": 1, "kb": 10**3, "mb": 10**6, "gb": 10**9, "tb": 10**12}

units = st.sampled_from(sorted(UNIT_FACTORS))
nums = st.integers(min_value=0, max_value=10**6)


@given(nums, units)
def test_str_to_bytes_is_linear_in_the_number(n, u):
    assert str_to_bytes(f"{n}{u}") == n * UNIT_FACTORS[u]


@given(nums, units, st.sampled_from(["<", "<=", ">", ">=", ""]))
def test_str_to_bytes_ignores_comparison_prefixes(n, u, p):
    assert str_to_bytes(f"{p}{n}{u}") == str_to_bytes(f"{n}{u}")


@given(
    nums,
    st.text(
        alphabet=st.characters(blacklist_categories=("Nd",), max_codepoint=0x2FF),
        min_size=1,
    ).filter(lambda s: s.strip().lower() not in UNIT_FACTORS),
)
def test_str_to_bytes_rejects_unknown_units(n, sfx):
    with pytest.raises(ValueError):
        str_to_bytes(f"{n}{sfx}")


@given(nums, units)
def test_boundary_parser_brackets(n, u):
    v = str_to_bytes(f"{n}{u}")
    assert boundary_parser(f"<={n}{u}") == (0, v)
    assert boundary_parser(f"<{n}{u}") == (0, v - 1)
    assert boundary_parser(f">={n}{u}") == (v, TEN_TB)
    assert boundary_parser(f">{n}{u}") == (v + 1, TEN_TB)


@given(nums, units, nums, units)
def test_boundary_parser_range(a, ua, b, ub):
    assert boundary_parser(f"{a}{ua}-{b}{ub}") == (
        str_to_bytes(f"{a}{ua}"),
        str_to_bytes(f"{b}{ub}"),
    )


ops = st.sampled_from(["=", "<", "<=", ">", ">="])


def _op_holds(op: str, v, bound) -> bool:
    return {
        "=": v == bound,
        "<": v < bound,
        "<=": v <= bound,
        ">": v > bound,
        ">=": v >= bound,
    }[op]


def _eval_pruning_sql(sql: str, mn: int, mx: int) -> bool:
    # The emitted text is valid Python given bindings for the stats cols.
    return bool(eval(sql.replace("`min.c`", "MN").replace("`max.c`", "MX"),
                     {"MN": mn, "MX": mx}))


@given(
    st.integers(-1000, 1000), st.integers(0, 500), ops,
    st.integers(-1000, 1000), st.integers(-1000, 1000),
)
def test_pruning_sql_is_sound(mn, width, op, bound, v):
    """If any v in [min, max] satisfies the filter, the emitted pruning
    predicate must keep the file — skipping is only ever allowed when no
    contained value can match (the invariant behind skipped_stats)."""
    mx = mn + width
    if not (mn <= v <= mx and _op_holds(op, v, bound)):
        return
    sql = filter_to_sql(("c", op, bound))
    assert _eval_pruning_sql(sql, mn, mx)


@given(st.lists(st.tuples(ops, st.integers(-10, 10)), min_size=1, max_size=4))
def test_filters_to_sql_is_the_conjunction(fs):
    sql = filters_to_sql([("c", op, v) for op, v in fs])
    assert sql.count(" and ".join([""] * 2)) >= len(fs) - 1
    # conjunction evaluates as the AND of the parts
    mn, mx = -5, 5
    parts = [_eval_pruning_sql(filter_to_sql(("c", op, v)), mn, mx) for op, v in fs]
    assert _eval_pruning_sql(sql, mn, mx) == all(parts)


# ---- Spark transform laws (few examples; each is a Spark job) -------------

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 6),
        st.one_of(st.none(), st.integers(0, 3)),
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows_strategy)
def test_kill_duplicates_transform_law(spark, rows):
    """Survivors are exactly the rows whose (non-NULL) key occurs once —
    NULL-keyed rows always survive."""
    from levi_spark.operators.dedup import kill_duplicates_transform

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)],
        "id INT, a INT, b INT",  # explicit: an all-NULL b column can't be inferred
    )
    got = sorted(r["id"] for r in kill_duplicates_transform(df, ["a", "b"]).collect())
    counts = Counter((a, b) for a, b in rows)
    want = sorted(
        i for i, (a, b) in enumerate(rows)
        if b is None or counts[(a, b)] == 1
    )
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(0, 6), min_size=1, max_size=20))
def test_drop_duplicates_pkey_transform_law(spark, keys):
    """Exactly one survivor per group: the lowest primary key."""
    from levi_spark.operators.dedup import drop_duplicates_pkey_transform

    rows = [(i, k) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, ["pk", "g"])
    got = sorted(
        (r["pk"], r["g"])
        for r in drop_duplicates_pkey_transform(df, "pk", ["g"]).collect()
    )
    want = sorted(
        (min(i for i, kk in rows if kk == k), k) for k in set(keys)
    )
    assert got == want


# ---- round-3 primitives ---------------------------------------------------


@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 10**6), st.integers(0, 1000)),
        min_size=0,
        max_size=60,
        unique_by=lambda t: (t[0], t[1]),
    )
)
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_with_prefix_sum_composite_keys_match_python(spark, rows):
    """Distributed exclusive prefix sum over composite (g, k) order ==
    the obvious single-threaded fold, for any partitioning."""
    from levi_spark.operators.packing import with_prefix_sum

    df = spark.createDataFrame(
        [(g, k, w) for g, k, w in rows] or [(0, 0, 0)][:0],
        "g INT, k LONG, w LONG",
    ) if rows else spark.createDataFrame([], "g INT, k LONG, w LONG")
    got = {
        (r["g"], r["k"]): r["cum"]
        for r in with_prefix_sum(df, ["g", "k"], "w", "cum").collect()
    }
    acc = 0
    for g, k, w in sorted(rows):
        assert got[(g, k)] == acc, (g, k, got[(g, k)], acc)
        acc += w


@given(
    st.recursive(
        st.sampled_from(["long", "string", "double"]),
        lambda inner: st.one_of(
            st.tuples(st.just("array"), inner),
            st.tuples(st.just("map"), inner, inner),
            st.lists(st.tuples(st.sampled_from(["a", "b", "c"]), inner),
                     min_size=1, max_size=3, unique_by=lambda t: t[0])
            .map(lambda fs: ("struct", fs)),
        ),
        max_leaves=6,
    )
)
@settings(max_examples=50, deadline=None, suppress_health_check=list(HealthCheck))
def test_physical_type_renames_every_nested_struct_field(shape):
    """_physical_type must rewrite physicalName metadata at ANY
    nesting depth — no struct field anywhere may keep its logical name
    when a mapping exists."""
    from pyspark.sql import types as T

    from levi_spark.delta.log import _physical_type

    def build(s):
        if s == "long":
            return T.LongType()
        if s == "string":
            return T.StringType()
        if s == "double":
            return T.DoubleType()
        if s[0] == "array":
            return T.ArrayType(build(s[1]))
        if s[0] == "map":
            return T.MapType(build(s[1]), build(s[2]))
        fields = [
            T.StructField(
                name,
                build(sub),
                True,
                {"delta.columnMapping.physicalName": f"col-{name}"},
            )
            for name, sub in s[1]
        ]
        return T.StructType(fields)

    def assert_renamed(dt):
        if isinstance(dt, T.StructType):
            for f in dt.fields:
                assert f.name.startswith("col-"), f.name
                assert_renamed(f.dataType)
        elif isinstance(dt, T.ArrayType):
            assert_renamed(dt.elementType)
        elif isinstance(dt, T.MapType):
            assert_renamed(dt.keyType)
            assert_renamed(dt.valueType)

    assert_renamed(_physical_type(build(shape)))


# --- round-3 operator laws --------------------------------------------------

def _chunk_plan(n: int) -> list[tuple[int, int]]:
    """Pure model of doc_chunk_overlap / CHUNK_OVERLAP_SQL: 1-based
    (start, end) token spans for a document of n tokens (window 32,
    stride 24). Cross-engine agreement on the real corpus is pinned by
    the oracle parity test; this pins the LAW of the shared formula."""
    extra = max(n - 32, 0)
    n_chunks = 1 + (extra + 23) // 24
    return [(k * 24 + 1, min(k * 24 + 32, n)) for k in range(n_chunks)]


@given(st.integers(min_value=1, max_value=5000))
def test_chunk_plan_total_coverage_and_overlap(n):
    spans = _chunk_plan(n)
    covered: set[int] = set()
    for a, b in spans:
        assert 1 <= a <= b <= n          # never empty, never out of range
        covered |= set(range(a, b + 1))
    assert covered == set(range(1, n + 1))  # every token in >= 1 chunk
    for (a1, b1), (a2, _b2) in zip(spans, spans[1:]):
        assert a2 == a1 + 24             # fixed stride
        if b1 - a1 + 1 == 32:
            assert b1 - a2 + 1 == 8      # full windows overlap exactly 8


def _sq8_code(x: float, lo: float, hi: float) -> int:
    """Pure model of embedding_sq8_codes / SQ8_SQL."""
    import math

    if hi == lo:
        return 0
    return min(max(math.floor((x - lo) / (hi - lo) * 255.0 + 0.5), 0), 255)


@given(
    st.floats(min_value=-100.0, max_value=100.0, allow_nan=False),
    st.floats(min_value=-100.0, max_value=100.0, allow_nan=False),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_sq8_reconstruction_error_is_half_step_bounded(a, b, t):
    lo, hi = min(a, b), max(a, b)
    x = lo + (hi - lo) * t            # any point inside the range
    q = _sq8_code(x, lo, hi)
    assert 0 <= q <= 255
    recon = lo + q * (hi - lo) / 255.0
    half_step = (hi - lo) / 255.0 * 0.5
    assert abs(x - recon) <= half_step + 1e-9 * max(1.0, abs(hi - lo))


# ---- market-basket per-order cap bounds pair fan-out --------------------


def test_market_basket_cap_bounds_pathological_basket(spark):
    """One pathological 1,000-item order next to normal 3-item orders:
    the capped item list holds at most MARKET_BASKET_CAP rows for the
    monster order (so pair fan-out is <= cap*(cap-1)/2, not ~5*10^5),
    keeps every row of the small orders, and the kept set is the
    deterministic frequency-desc/partkey-asc prefix."""
    from levi_spark.queries import MARKET_BASKET_CAP, market_basket_cap_items

    rows = [(1, p) for p in range(1000)]
    rows += [(o, p) for o in (2, 3, 4) for p in (5, 6, 7)]
    items = spark.createDataFrame(rows, "l_orderkey LONG, l_partkey LONG")
    capped = market_basket_cap_items(items)
    by_order = {
        r["l_orderkey"]: r["n"]
        for r in capped.groupBy("l_orderkey").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert by_order[1] == MARKET_BASKET_CAP
    assert by_order[2] == by_order[3] == by_order[4] == 3
    # deterministic winners for the monster order: parts 5,6,7 appear in
    # 4 orders (highest frequency), then partkey-ascending fill
    kept = sorted(
        r["l_partkey"]
        for r in capped.where("l_orderkey = 1").collect()
    )
    # 5,6,7 (freq 4) win first, then partkey-ascending fill of the
    # freq-1 parts 0,1,2,3,4,8,...,31 — the union is exactly 0..cap-1
    assert kept == list(range(MARKET_BASKET_CAP))


def test_market_basket_cap_is_identity_below_cap(spark):
    from levi_spark.queries import market_basket_cap_items

    rows = [(o, p) for o in range(10) for p in range(o % 5 + 1)]
    items = spark.createDataFrame(rows, "l_orderkey LONG, l_partkey LONG")
    capped = market_basket_cap_items(items)
    assert sorted(map(tuple, capped.collect())) == sorted(rows)


# --- round-5: streaming UPSERT sink crash-replay law ------------------------

upsert_events = st.lists(
    st.tuples(
        st.integers(0, 4),      # key
        st.integers(0, 9),      # ts (order col 1)
        st.integers(0, 9),      # seq (order col 2, tie break)
        st.integers(-50, 50),   # value
    ),
    min_size=1,
    max_size=16,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    events=upsert_events,
    cuts=st.sets(st.integers(1, 15), max_size=4),
    replays=st.data(),
)
def test_stream_upsert_crash_replay_law(spark, tmp_path_factory, events,
                                        cuts, replays):
    """Exactly-once law for the streaming UPSERT sink under randomized
    batch boundaries AND randomized crash/replay points: for any split
    of an event sequence into micro-batches, and any replay pattern
    where already-applied batches are re-delivered (Spark's contract
    after a crash between table commit and checkpoint write: same
    batch id, same content), the final table equals latest-row-per-key
    over ALL events, and no replay ever changes table state.

    Found-by-this-test subtlety, now pinned: a batch whose MERGE has
    nothing to do (every incoming row loses the order-tuple condition)
    commits NOTHING — no version, no SetTransaction — so its replay
    re-runs rather than being skipped. That is still exactly-once at
    the state level (single-writer replay sees the identical state and
    no-ops again); only batches that DID commit must skip on replay."""
    from levi_spark.delta.log import DeltaLog
    from levi_spark.streaming.delta_sink import _upsert_batch

    table = str(tmp_path_factory.mktemp("upsert_law") / "t")
    app = "levi-property-upsert"

    # randomized batch boundaries over the event sequence
    bounds = sorted(c for c in cuts if c < len(events))
    batches, prev = [], 0
    for b in bounds + [len(events)]:
        if b > prev:
            batches.append(events[prev:b])
            prev = b

    def mk_df(rows):
        return spark.createDataFrame(
            rows, "k INT, ts INT, seq INT, value INT"
        )

    def state():
        return sorted(
            map(tuple, DeltaLog(spark, table).snapshot().to_df().collect())
        )

    def version():
        return DeltaLog(spark, table).snapshot().version

    for bid, rows in enumerate(batches):
        v_before = version() if bid > 0 else -1
        assert _upsert_batch(mk_df(rows), bid, table, ["k"],
                             ["ts", "seq"], app) is True
        v_after = version()
        committed = v_after > v_before
        s_after = state()
        # randomized kill point: replay this batch 0-2 times
        for _ in range(replays.draw(st.integers(0, 2), label=f"replay{bid}")):
            replay_applied = _upsert_batch(mk_df(rows), bid, table, ["k"],
                                           ["ts", "seq"], app)
            if committed:
                # SetTransaction landed with the commit: replay skips
                assert replay_applied is False
            # the heart of exactly-once: replay NEVER changes state
            # or creates a commit
            assert version() == v_after
            assert state() == s_after

    # final state == latest per key across ALL events (pure model).
    # per-batch row_number picks an arbitrary winner among full
    # (ts, seq) ties, and the cross-batch >= update condition keeps
    # the last-applied batch's winner among equal tuples — so the
    # model tracks the winning (ts, seq) and the SET of values any
    # equal-tuple row could legitimately carry.
    model: dict[int, tuple] = {}
    for rows in batches:
        best: dict[int, tuple] = {}
        for k, ts, seq, val in rows:
            if k not in best or (ts, seq) > best[k][:2]:
                best[k] = (ts, seq, {val})
            elif (ts, seq) == best[k][:2]:
                best[k][2].add(val)
        for k, (ts, seq, vals) in best.items():
            if k not in model or (ts, seq) >= model[k][:2]:
                if k in model and (ts, seq) == model[k][:2]:
                    vals = vals | model[k][2]
                model[k] = (ts, seq, vals)

    got = {
        r.k: (r.ts, r.seq, r.value)
        for r in DeltaLog(spark, table).snapshot().to_df().collect()
    }
    assert set(got) == set(model)
    for k, (ts, seq, vals) in model.items():
        assert got[k][:2] == (ts, seq)
        assert got[k][2] in vals
