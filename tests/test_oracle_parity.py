"""Local replica of the driver's correctness gate: every registered
query's Spark result must equal its DuckDB oracle at sf0.01 —
column names, row count, and (after sorting columns by name and rows by
value) the values themselves.

Set SPARK_GRAFT_ORACLE_SF to point at a different scale dir (sf0.001
for a quick pass while iterating).
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from levi_spark.queries import QUERIES, RETIRED_QUERIES

# Retired registry queries keep the SAME strict gate here — the
# round-10 retirement moved them out of the driver window, not out of
# coverage (README "Registry cost policy").
ALL_GATED = {**QUERIES, **RETIRED_QUERIES}

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style normalization: columns sorted by name, rows sorted
    by all values, timestamps/bytes/objects stringified. Integer WIDTH
    is normalized to int64 (CORRECTNESS_r01 shows the driver hash
    tolerates int32-vs-int64 drift, e.g. q8/q9 o_year), but int-vs-float
    is NOT normalized: an uncast SUM(int) oracle comes back from DuckDB
    as HUGEINT -> float64 and the driver hash-fails it, so the strict
    dtype compare below must fail it too."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else str(v)
            )
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize(
    "name", [n for n, (_f, s) in ALL_GATED.items() if s is not None]
)
def test_query_matches_duckdb_oracle(spark, ddb, name):
    fn, sql = ALL_GATED[name]
    got = _canon(fn(spark, SF_DIR).toPandas())
    want = _canon(ddb.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: spark columns {list(got.columns)} != oracle {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows vs oracle {len(want)}"
    assert {c: str(d) for c, d in got.dtypes.items()} == {
        c: str(d) for c, d in want.dtypes.items()
    }, f"{name}: dtype drift (int-vs-float drift hash-fails at the driver)"
    pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)
