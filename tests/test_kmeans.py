"""k-means operator (levi_spark.operators.kmeans): recovery of
well-separated clusters, Lloyd convergence, empty-cluster fallback,
and the quantized cross-engine-exact mode."""

import pytest

from levi_spark.operators.kmeans import assign_clusters, kmeans_fit


def _toy(spark):
    # Three tight blobs around (0,0), (10,10), (-10,5); ids interleaved
    # so the first-3 seeding starts with one point from each blob.
    rows = []
    blobs = [(0.0, 0.0), (10.0, 10.0), (-10.0, 5.0)]
    for i in range(30):
        bx, by = blobs[i % 3]
        rows.append((i, [bx + (i % 5) * 0.1, by - (i % 7) * 0.1]))
    return spark.createDataFrame(rows, "id long, v array<double>")


def test_recovers_separated_blobs(spark):
    df = _toy(spark)
    fit = kmeans_fit(df, "id", "v", k=3, max_iter=10)
    assert fit["converged"]
    assigned = assign_clusters(df, "id", "v", fit["centroids"]).collect()
    by_blob = {}
    for r in assigned:
        by_blob.setdefault(r["id"] % 3, set()).add(r["cluster"])
    # each blob maps to exactly one cluster, and the three differ
    assert all(len(c) == 1 for c in by_blob.values())
    assert len({c.pop() for c in by_blob.values()}) == 3


def test_deterministic_across_runs(spark):
    df = _toy(spark)
    a = kmeans_fit(df, "id", "v", k=3, max_iter=5, dist_scale=1e6, mean_scale=1e8)
    b = kmeans_fit(df, "id", "v", k=3, max_iter=5, dist_scale=1e6, mean_scale=1e8)
    assert a["centroids"] == b["centroids"]  # bit-identical, not just close


def test_empty_cluster_keeps_previous_centroid(spark):
    # Two identical far-out seeds: the duplicate (higher cent_id) never
    # wins a tie, so its cluster is empty and must keep its seed.
    df = spark.createDataFrame(
        [(0, [100.0, 100.0]), (1, [100.0, 100.0]), (2, [0.0, 0.0]), (3, [0.1, 0.0])],
        "id long, v array<double>",
    )
    fit = kmeans_fit(df, "id", "v", k=3, max_iter=3)
    assert fit["centroids"][1] == [100.0, 100.0]  # untouched seed
    clusters = {
        r["id"]: r["cluster"]
        for r in assign_clusters(df, "id", "v", fit["centroids"]).collect()
    }
    assert clusters[0] == 0 and clusters[1] == 0  # tie broken to lower id
    assert clusters[2] == clusters[3] == 2


def test_dist_col_quantized(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [3.0, 4.0])], "id long, v array<double>"
    )
    out = {
        r["id"]: (r["cluster"], r["d"])
        for r in assign_clusters(
            df, "id", "v", [[0.0, 0.0], [3.0, 4.0]], dist_col="d", dist_scale=1e6
        ).collect()
    }
    assert out[0] == (0, 0) and out[1] == (1, 0)
    far = assign_clusters(
        df, "id", "v", [[6.0, 8.0]], dist_col="d", dist_scale=1e6
    ).collect()
    # id 0 -> squared L2 = 100 exactly -> 100 * 1e6 quantized
    assert {r["id"]: r["d"] for r in far}[0] == 100_000_000


def test_k_larger_than_data_raises(spark):
    df = spark.createDataFrame([(0, [1.0])], "id long, v array<double>")
    with pytest.raises(ValueError, match="only 1 vectors"):
        kmeans_fit(df, "id", "v", k=5)


def test_arrow_assignment_bit_exact_with_literal(spark):
    """The Arrow/numpy large-codebook path must reproduce the literal
    HOF argmin EXACTLY — same quantized distances, same tie-breaks —
    on real embedding vectors with a codebook big enough to trigger
    it (k*dim >= 2048)."""
    from levi_spark.operators.kmeans import (
        _ARROW_MIN_LITERALS,
        _argmin_col,
        _assign_arrow,
        assign_clusters,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).selectExpr("vec_id", "CAST(embedding AS array<double>) AS v")
    cents = [
        list(r["v"]) for r in emb.orderBy("vec_id").limit(40).collect()
    ]
    assert len(cents) * len(cents[0]) >= _ARROW_MIN_LITERALS
    lit_cluster, lit_d = _argmin_col(F.col("v"), cents, 1e6)
    want = {
        r["vec_id"]: (r["c"], r["d"])
        for r in emb.select(
            "vec_id", lit_cluster.alias("c"), lit_d.alias("d")
        ).collect()
    }
    got = {
        r["id"]: (r["cluster"], r["dist"])
        for r in _assign_arrow(
            emb, "vec_id", "v", cents, 1e6, dist_col="dist"
        ).collect()
    }
    assert got == want
    # and assign_clusters routes to the arrow path at this size: the
    # plan carries a Python map node, no join, and no KEYED shuffle —
    # the only exchange allowed is the ROUND-ROBIN input spreader the
    # kernel inserts when a narrow file would leave cores idle (at
    # real scale the input is already wide and it never fires)
    routed = assign_clusters(emb, "vec_id", "v", cents,
                             dist_col="dist", dist_scale=1e6)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan[:500]
    assert "Join" not in plan, plan[:500]
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "RoundRobinPartitioning" in line, line
    got2 = {r["id"]: (r["cluster"], r["dist"]) for r in routed.collect()}
    assert got2 == want


def test_kmeans_fit_identical_across_paths(spark):
    """kmeans_fit with a codebook above the Arrow threshold must give
    the same centroids as the literal path run on the same data (force
    by toggling the threshold)."""
    import levi_spark.operators.kmeans as KM

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).selectExpr("vec_id", "CAST(embedding AS array<double>) AS v")
    kw = dict(k=40, max_iter=2, tol=0.0, dist_scale=1e6, mean_scale=1e8)
    fit_arrow = KM.kmeans_fit(emb, "vec_id", "v", **kw)
    old = KM._ARROW_MIN_LITERALS
    KM._ARROW_MIN_LITERALS = 10**9  # force literal path
    try:
        fit_lit = KM.kmeans_fit(emb, "vec_id", "v", **kw)
    finally:
        KM._ARROW_MIN_LITERALS = old
    assert fit_arrow["centroids"] == fit_lit["centroids"]
    assert fit_arrow["iterations"] == fit_lit["iterations"]
