"""Full Dremel record assembly: arbitrary nesting cross-checked
against pyarrow's ``Table.to_pylist()`` (the reference reassembly)
on files written by BOTH pyarrow and DuckDB, across page versions,
codecs, dictionary encoding and row-group/page splits."""

import os
import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from levi_spark.operators.parquetassembly import (
    assemble_leaf,
    read_rows,
    read_rows_bytes,
)


def _blob(table, **kw):
    sink = pa.BufferOutputStream()
    pq.write_table(table, sink, **kw)
    return sink.getvalue().to_pybytes()


def _check(table, **kw):
    got = read_rows_bytes(_blob(table, **kw))
    assert got == table.to_pylist()


def test_list_of_lists_nulls_everywhere():
    t = pa.table({
        "x": pa.array(
            [[[1, 2], [], None], [], None, [[3]], [[None, 4]]],
            pa.list_(pa.list_(pa.int64())),
        )
    })
    _check(t, use_dictionary=False)


def test_list_of_structs():
    t = pa.table({
        "x": pa.array(
            [[{"a": 1, "b": "p"}, {"a": None, "b": None}], None, [],
             [{"a": 3, "b": "q"}]],
            pa.list_(pa.struct([("a", pa.int64()),
                                ("b", pa.string())])),
        )
    })
    _check(t, use_dictionary=False)


def test_map_column():
    t = pa.table({
        "m": pa.array(
            [[("k1", 1), ("k2", None)], [], None, [("z", 9)]],
            pa.map_(pa.string(), pa.int64()),
        )
    })
    _check(t, use_dictionary=False)


def test_struct_with_list_and_struct():
    t = pa.table({
        "s": pa.array(
            [
                {"a": 1, "b": [1.5, 2.5], "c": {"d": "x"}},
                None,
                {"a": None, "b": None, "c": None},
                {"a": 4, "b": [], "c": {"d": None}},
            ],
            pa.struct([
                ("a", pa.int64()),
                ("b", pa.list_(pa.float64())),
                ("c", pa.struct([("d", pa.string())])),
            ]),
        )
    })
    _check(t, use_dictionary=False)


def test_triple_nesting_dictionary_zstd_small_pages():
    t = pa.table({
        "id": pa.array(list(range(200)), pa.int32()),
        "deep": pa.array(
            [
                [[["a", "b"], None], []] if i % 3 == 0
                else (None if i % 5 == 0 else [[[str(i)]]])
                for i in range(200)
            ],
            pa.list_(pa.list_(pa.list_(pa.string()))),
        ),
    })
    _check(t, compression="zstd", row_group_size=64,
           data_page_size=256)


def test_map_of_list_of_struct_with_list():
    inner = pa.struct([("u", pa.int64()),
                       ("v", pa.list_(pa.int64()))])
    t = pa.table({
        "m": pa.array(
            [
                [("a", [{"u": 1, "v": [1, 2]},
                        {"u": None, "v": []}])],
                [("b", None), ("c", [])],
                None,
                [],
            ],
            pa.map_(pa.string(), pa.list_(inner)),
        )
    })
    _check(t, use_dictionary=False)


def test_data_page_v2():
    t = pa.table({
        "x": pa.array([[[1, 2], [], None], [], None, [[3]]],
                      pa.list_(pa.list_(pa.int64())))
    })
    _check(t, data_page_version="2.0", use_dictionary=False)


def test_required_fields():
    sch = pa.schema([
        pa.field("s", pa.struct(
            [pa.field("a", pa.int64(), nullable=False)]),
            nullable=False),
        pa.field("l", pa.list_(
            pa.field("e", pa.string(), nullable=False)),
            nullable=False),
    ])
    t = pa.table({"s": [{"a": 1}, {"a": 2}],
                  "l": [["x", "y"], []]}, schema=sch)
    _check(t, use_dictionary=False)


def test_columns_filter_and_missing_field():
    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "l": pa.array([[1], [], None], pa.list_(pa.int64())),
    })
    b = _blob(t, use_dictionary=False)
    assert read_rows_bytes(b, columns=["id"]) == [
        {"id": 1}, {"id": 2}, {"id": 3}
    ]
    with pytest.raises(ValueError, match="no such top-level"):
        read_rows_bytes(b, columns=["nope"])


def test_duckdb_written_nested(tmp_path):
    p = os.path.join(tmp_path, "n.parquet")
    duckdb.sql(
        f"""copy (select range as id,
          case when range%7=0 then NULL
               else [range, NULL, range*2] end as arr,
          {{'a': range::INT, 'b': [range::VARCHAR]}} as st,
          map([range::VARCHAR], [range*10]) as m
        from range(500))
        to '{p}' (format parquet, row_group_size 128)"""
    )
    assert read_rows(p) == pq.read_table(p).to_pylist()


def test_randomized_nested_roundtrip():
    """Deterministic fuzz: random list<list<struct<a, b:list>>> rows
    across random row-group/page splits, both page versions."""
    rng = random.Random(0xD0E5)

    def maybe(p, f):
        return None if rng.random() < p else f()

    def leaf_list():
        return maybe(0.2, lambda: [
            maybe(0.3, lambda: rng.randrange(1000))
            for _ in range(rng.randrange(4))
        ])

    def struct():
        return maybe(0.15, lambda: {
            "a": maybe(0.3, lambda: rng.randrange(100)),
            "b": leaf_list(),
        })

    def row():
        return maybe(0.15, lambda: [
            maybe(0.2, lambda: [struct()
                                for _ in range(rng.randrange(3))])
            for _ in range(rng.randrange(4))
        ])

    typ = pa.list_(pa.list_(pa.struct(
        [("a", pa.int64()), ("b", pa.list_(pa.int64()))])))
    for trial in range(4):
        rows = [row() for _ in range(300)]
        t = pa.table({"x": pa.array(rows, typ)})
        for kw in (
            {"row_group_size": 37, "data_page_size": 128,
             "use_dictionary": False},
            {"data_page_version": "2.0", "compression": "zstd",
             "use_dictionary": False},
        ):
            _check(t, **kw)


def test_leftover_values_refused():
    nodes = [{"name": "x", "rep": 1, "def": 1, "repl": 0,
              "children": [], "ptype": "INT64"}]
    with pytest.raises(ValueError, match="left over"):
        assemble_leaf(nodes, [1, 1], [0, 0], [5, 6, 7])


def test_record_starting_midlist_refused():
    nodes = [{"name": "x", "rep": 2, "def": 1, "repl": 1,
              "children": [], "ptype": "INT64"}]
    with pytest.raises(ValueError, match="record starts"):
        assemble_leaf(nodes, [1, 1], [1, 0], [5, 6])
