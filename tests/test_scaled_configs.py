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
