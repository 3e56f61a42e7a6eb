"""Scale-path evidence for the dedup/ANN operators whose docstrings
claim a bounded-work shape: run the SCALED configuration (sf0.1, where
SemDeDup's derived k leaves the k=4 floor) and assert both cross-engine
correctness and the bounded-population property itself.

sf0.1 embeddings = 5,000 vectors -> _semdedup_k gives k=20, so these
tests exercise a genuinely different cluster count than the sf0.01
driver gate (which sits at the floor) — the "k scales with corpus"
claim has a test behind it, not just a docstring.
"""

import os

import duckdb
import pandas as pd
import pytest

from levi_spark.queries import (
    SEMDEDUP_SQL,
    SEMDEDUP_TARGET_POP,
    _semdedup_k,
    semdedup_prune,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SCALED_SF", "/root/testdata/sf0.1")


def test_semdedup_k_grows_with_corpus():
    assert _semdedup_k(1) == 4 and _semdedup_k(500) == 4  # floor
    assert _semdedup_k(5_000) == 20
    assert _semdedup_k(1_000_000) == 3907
    assert _semdedup_k(5_000_000_000) == 19_531_250  # LAION-scale
    # bounded expected population at every size
    for n in (10_000, 10**6, 10**9):
        assert n / _semdedup_k(n) <= SEMDEDUP_TARGET_POP


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="no sf0.1 testdata")
def test_semdedup_scaled_k_matches_oracle_and_bounds_population(spark):
    got = semdedup_prune(spark, SF_DIR).toPandas()
    n = len(got)
    k = _semdedup_k(n)
    assert k > 4, "scaled run must leave the k=4 floor to prove anything"
    # every derived cluster id is in range and the LARGEST cluster stays
    # within a loose multiple of the target population (k-means is not
    # balanced, but an O(N^2) collapse into one cluster would blow this)
    pop = got.groupby("cluster").size()
    assert 0 <= pop.index.min() and pop.index.max() < k
    assert pop.max() <= 8 * SEMDEDUP_TARGET_POP

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    want = con.execute(SEMDEDUP_SQL).df()
    con.close()

    got = got.sort_values("vec_id").reset_index(drop=True)
    want = want.sort_values("vec_id").reset_index(drop=True)
    for c in got.columns:
        want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)])


def test_semdedup_pair_dots_bit_exact_vs_sequential_fold():
    """The r13 rank-1-update kernel must emit the IDENTICAL doubles as
    a per-pair sequential left-fold (the r11 JVM plan's accumulation
    order), for both a same-block group (id_b > id_a dedup) and a
    cross-block group (full |A|x|B| grid), plus the empty-side edge."""
    import numpy as np

    from levi_spark.queries import _semdedup_pair_dots

    rng = np.random.default_rng(7)
    pop, dim = 37, 64
    ids = np.concatenate(
        [np.arange(pop, dtype=np.int64) * 3,
         np.arange(pop, dtype=np.int64) * 3 + 1]
    )
    vecs = [rng.standard_normal(dim) for _ in range(2 * pop)]

    def group(p, q):
        return pd.DataFrame(
            {"__side": np.repeat([0, 1], pop), "vec_id": ids, "v": vecs,
             "__n": rng.random(2 * pop) + 0.5, "__p": p, "__q": q}
        )

    def reference(pdf):
        A = pdf[pdf["__side"] == 0]
        B = pdf[pdf["__side"] == 1]
        rows = []
        for _, ra in A.iterrows():
            for _, rb in B.iterrows():
                if (int(pdf["__p"].iloc[0]) == int(pdf["__q"].iloc[0])
                        and not rb["vec_id"] > ra["vec_id"]):
                    continue
                acc = 0.0  # plain Python floats: the JVM fold order
                for x, y in zip(ra["v"], rb["v"]):
                    acc += float(x) * float(y)
                rows.append(
                    (max(ra["vec_id"], rb["vec_id"]),
                     min(ra["vec_id"], rb["vec_id"]),
                     acc, float(ra["__n"]) * float(rb["__n"]))
                )
        return pd.DataFrame(
            rows, columns=["vec_id", "__lo", "__dot", "__nn"]
        )

    for p, q in ((0, 0), (0, 1)):
        pdf = group(p, q)
        got = (_semdedup_pair_dots(pdf)
               .sort_values(["vec_id", "__lo"]).reset_index(drop=True))
        want = (reference(pdf)
                .sort_values(["vec_id", "__lo"]).reset_index(drop=True))
        assert len(got) == len(want) > 0
        assert (got["vec_id"].values == want["vec_id"].values).all()
        assert (got["__lo"].values == want["__lo"].values).all()
        # bit-exact, not approx: the whole point of the kernel contract
        assert np.array_equal(got["__dot"].values, want["__dot"].values)
        assert np.array_equal(got["__nn"].values, want["__nn"].values)

    empty = group(0, 0)[lambda d: d["__side"] == 0]
    out = _semdedup_pair_dots(empty)
    assert len(out) == 0 and list(out.columns) == [
        "vec_id", "__lo", "__dot", "__nn"
    ]
