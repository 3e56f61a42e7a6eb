"""tools/make_scaled_testdata.py: the derived tier must preserve
referential integrity under key-shifted replication, decorrelate
copies (the property the scaling bench depends on), and be
deterministic."""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from tools.make_scaled_testdata import scale

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tier(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sf_scaled"))
    scale(SRC, dst, 3)
    return dst


def test_row_counts_scale(tier):
    for t, base in (("orders", 1500), ("lineitem", 6000),
                    ("customer", 150), ("documents", 500),
                    ("embeddings", 500)):
        n = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{tier}/{t}.parquet')"
        ).fetchone()[0]
        assert n == base * 3, t
    for t in ("region", "nation"):
        a = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        b = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{tier}/{t}.parquet')"
        ).fetchone()[0]
        assert a == b, t


def test_foreign_keys_consistent(tier):
    """Every lineitem still joins an order; every order a customer —
    key shifts must be applied consistently on both sides."""
    orphans = duckdb.sql(f"""
        SELECT COUNT(*) FROM read_parquet('{tier}/lineitem.parquet') l
        LEFT JOIN read_parquet('{tier}/orders.parquet') o
          ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL
    """).fetchone()[0]
    assert orphans == 0
    orphans = duckdb.sql(f"""
        SELECT COUNT(*) FROM read_parquet('{tier}/orders.parquet') o
        LEFT JOIN read_parquet('{tier}/customer.parquet') c
          ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL
    """).fetchone()[0]
    assert orphans == 0
    # join fan-out preserved: lines per order distribution identical
    src_avg = duckdb.sql(f"""
        SELECT AVG(n) FROM (SELECT COUNT(*) n FROM
        read_parquet('{SRC}/lineitem.parquet') GROUP BY l_orderkey)
    """).fetchone()[0]
    dst_avg = duckdb.sql(f"""
        SELECT AVG(n) FROM (SELECT COUNT(*) n FROM
        read_parquet('{tier}/lineitem.parquet') GROUP BY l_orderkey)
    """).fetchone()[0]
    assert abs(src_avg - dst_avg) < 1e-9


def test_keys_unique_after_shift(tier):
    for t, k in (("orders", "o_orderkey"), ("customer", "c_custkey"),
                 ("documents", "doc_id"), ("embeddings", "vec_id")):
        n, nd = duckdb.sql(
            f"SELECT COUNT(*), COUNT(DISTINCT {k}) "
            f"FROM read_parquet('{tier}/{t}.parquet')"
        ).fetchone()
        assert n == nd, t


def test_document_copies_are_gram_decorrelated(tier):
    """Copies must share neither 8-gram content with the original
    (keeps shingle-banded dedup candidates linear in copies) NOR the
    token MULTISET (bag-of-words SimHash hashes a preserved multiset
    identically — the 100x-tier twin artifact); the per-copy character
    rotation preserves every token's LENGTH, so n_chars and the
    token-count structure stay realistic."""
    rows = duckdb.sql(f"""
        SELECT doc_id, text FROM read_parquet('{tier}/documents.parquet')
        WHERE doc_id % 500 = 7 ORDER BY doc_id
    """).fetchall()
    assert len(rows) == 3
    base = rows[0][1].split()
    for _did, text in rows[1:]:
        toks = text.split()
        assert sorted(toks) != sorted(base)  # multiset RELABELED
        assert sorted(map(len, toks)) == sorted(map(len, base))
        assert len(text) == len(rows[0][1])  # n_chars preserved
        g0 = {tuple(base[i:i+8]) for i in range(len(base) - 7)}
        g1 = {tuple(toks[i:i+8]) for i in range(len(toks) - 7)}
        assert len(g0 & g1) <= max(1, len(g0) // 50)


def test_embedding_copies_rotation_preserves_norms(tier):
    rows = duckdb.sql(f"""
        SELECT vec_id, embedding FROM
        read_parquet('{tier}/embeddings.parquet')
        WHERE vec_id % 500 = 11 ORDER BY vec_id
    """).fetchall()
    assert len(rows) == 3
    base = np.array(rows[0][1], np.float32)
    for i, (_vid, v) in enumerate(rows[1:], start=1):
        v = np.array(v, np.float32)
        assert np.isclose(np.linalg.norm(v), np.linalg.norm(base),
                          rtol=1e-6)
        assert np.allclose(np.roll(base, i), v)  # exact rotation
        # decorrelated: cosine far from 1
        cos = float(base @ v / (np.linalg.norm(base) ** 2))
        assert cos < 0.9


def test_deterministic(tier, tmp_path):
    import hashlib

    dst2 = str(tmp_path / "again")
    scale(SRC, dst2, 3)
    for t in ("documents", "embeddings", "lineitem"):
        h1 = hashlib.md5(open(f"{tier}/{t}.parquet", "rb").read())
        h2 = hashlib.md5(open(f"{dst2}/{t}.parquet", "rb").read())
        assert h1.hexdigest() == h2.hexdigest(), t
