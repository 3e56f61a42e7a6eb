"""Dedup operator round-trips — canonical inputs/expected sets from the
reference suite (/root/reference/tests/test_public_interface.py:159-198,
597-906)."""

import pytest

from levi_spark.delta.table import LeviTable
from levi_spark.delta.writer import write_delta
from levi_spark.operators.dedup import (
    drop_duplicates,
    drop_duplicates_pkey,
    kill_duplicates,
)


def _mk_table(spark, path, rows, cols):
    df = spark.createDataFrame(rows, cols)
    write_delta(df, path, mode="error")
    return LeviTable(spark, path)


def _rows(table, cols):
    return sorted(tuple(r) for r in table.to_df().select(*cols).collect())


KILL_ROWS = [
    (1, "A", "A"), (2, "A", "B"), (3, "A", "A"), (4, "A", "A"),
    (5, "B", "B"), (6, "D", "D"), (9, "B", "B"),
]


def test_kill_duplicates(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), KILL_ROWS, ["col1", "col2", "col3"])
    kill_duplicates(t, ["col3", "col2"])
    assert _rows(t, ["col1", "col2", "col3"]) == [(2, "A", "B"), (6, "D", "D")]


def test_kill_duplicates_null_keys_survive(spark, tmp_path):
    rows = [(1, None, "A"), (2, None, "A"), (3, "X", "A")]
    t = _mk_table(spark, str(tmp_path / "t"), rows, ["col1", "col2", "col3"])
    kill_duplicates(t, ["col2", "col3"])
    # NULL = NULL never matches: both null rows survive
    assert _rows(t, ["col1"]) == [(1,), (2,), (3,)]


def test_kill_duplicates_errors(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), KILL_ROWS, ["col1", "col2", "col3"])
    with pytest.raises(TypeError):
        kill_duplicates("not a table", ["col1"])
    with pytest.raises(TypeError):
        kill_duplicates(t, [])
    with pytest.raises(TypeError):
        kill_duplicates(t, ["nope"])


DROP_ROWS = [
    (1, "A", "A", "C"), (2, "A", "B", "C"), (3, "A", "A", "D"),
    (4, "A", "A", "E"), (5, "B", "B", "C"), (6, "D", "D", "C"), (9, "B", "B", "E"),
]


def test_drop_duplicates_keeps_first_physical(spark, tmp_path):
    # single input partition → one file → physical order == insertion order
    df = spark.createDataFrame(DROP_ROWS, ["col1", "col2", "col3", "col4"]).coalesce(1)
    path = str(tmp_path / "t")
    write_delta(df, path, mode="error")
    t = LeviTable(spark, path)
    drop_duplicates(t, ["col2", "col3"])
    assert _rows(t, ["col1", "col2", "col3", "col4"]) == [
        (1, "A", "A", "C"),
        (2, "A", "B", "C"),
        (5, "B", "B", "C"),
        (6, "D", "D", "C"),
    ]


def test_drop_duplicates_pkey(spark, tmp_path):
    # unsorted pk input — survivor must be lowest pk per group
    rows = [(9, "B", "B", "E"), (4, "A", "A", "E"), (1, "A", "A", "C"),
            (5, "B", "B", "C"), (2, "A", "B", "C"), (6, "D", "D", "C"),
            (3, "A", "A", "D")]
    t = _mk_table(spark, str(tmp_path / "t"), rows, ["col1", "col2", "col3", "col4"])
    drop_duplicates_pkey(t, "col1", ["col2", "col3"])
    assert _rows(t, ["col1", "col2", "col3", "col4"]) == [
        (1, "A", "A", "C"),
        (2, "A", "B", "C"),
        (5, "B", "B", "C"),
        (6, "D", "D", "C"),
    ]


def test_drop_duplicates_pkey_errors(spark, tmp_path):
    t = _mk_table(
        spark, str(tmp_path / "t"),
        [(1, "A", "A"), (1, "B", "B")], ["col1", "col2", "col3"],
    )
    with pytest.raises(TypeError):
        drop_duplicates_pkey(t, "", ["col2"])
    with pytest.raises(TypeError):
        drop_duplicates_pkey(t, "col1", ["col1", "col2"])
    with pytest.raises(TypeError):
        drop_duplicates_pkey(t, "col1", ["missing"])
    with pytest.raises(ValueError):
        drop_duplicates_pkey(t, "col1", ["col2"])  # pk not unique
