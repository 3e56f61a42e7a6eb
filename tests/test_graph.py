"""Connected components: known topologies + convergence contract."""

from __future__ import annotations

import pytest

from levi_spark.operators.graph import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        (r.node, r.component)
        for r in connected_components(df, **kw).collect()
    }


def test_two_components_and_chain(spark):
    # component {1,2,3} via chain, component {10, 11}
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_long_chain_converges(spark):
    # diameter 9: propagation needs several rounds
    got = _cc(spark, [(i, i + 1) for i in range(10)])
    assert got == {(i, 0) for i in range(11)}


def test_star_and_self_loop(spark):
    got = _cc(spark, [(5, 1), (5, 2), (5, 3), (7, 7)])
    assert got == {(1, 1), (2, 1), (3, 1), (5, 1), (7, 7)}


def test_duplicate_and_reversed_edges(spark):
    got = _cc(spark, [(2, 1), (1, 2), (2, 1), (3, 2)])
    assert got == {(1, 1), (2, 1), (3, 1)}


def test_max_iter_contract(spark):
    edges = [(i, i + 1) for i in range(6)]
    with pytest.raises(RuntimeError, match="no fixpoint"):
        _cc(spark, edges, max_iter=1)


def test_long_chain_converges_logarithmically(spark):
    """A 512-node path graph: pure min-propagation needs ~512 rounds;
    with pointer jumping the fixpoint must arrive within 20."""
    from levi_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(511)], "src long, dst long"
    )
    comp = connected_components(edges, max_iter=20)
    rows = comp.collect()
    assert len(rows) == 512
    assert {r["component"] for r in rows} == {0}


def _ref_pagerank(edges, iters=3, scale=10**12, damping=85):
    """Pure-python replica of the integer PageRank contract."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    outw = {}
    for s, _d, w in edges:
        outw[s] = outw.get(s, 0) + w
    base = (scale * (100 - damping)) // (100 * n)
    r = {v: scale // n for v in nodes}
    for _ in range(iters):
        inflow = {v: 0 for v in nodes}
        for s, d, w in edges:
            inflow[d] += (r[s] // outw[s]) * w
        r = {v: base + (damping * inflow[v]) // 100 for v in nodes}
    return r


def test_pagerank_matches_integer_reference(spark):
    from levi_spark.operators.graph import pagerank

    edges = [
        (1, 2, 3), (1, 3, 1), (2, 3, 2), (3, 1, 5), (4, 3, 1),
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank(df, weight="w").collect()}
    assert got == _ref_pagerank(edges)
    # node 4 has no inbound edges -> exactly the undamped base share
    scale, damping, n = 10**12, 85, 4
    assert got[4] == (scale * (100 - damping)) // (100 * n)
    assert got[4] == min(got.values())


def test_pagerank_unweighted_default(spark):
    from levi_spark.operators.graph import pagerank

    df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank(df).collect()}
    assert got == _ref_pagerank([(1, 2, 1), (2, 1, 1)])
    assert got[1] == got[2]  # symmetric 2-cycle -> equal ranks
