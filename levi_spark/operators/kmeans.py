"""K-means (Lloyd) over an array<double> column — pure DataFrame ops.

Trains the coarse quantizer the IVF ANN path needs
(``levi_spark.queries.ivf_ann_topk`` ships with deterministic
first-k centroids; at scale those come from this fit over a sample).
No MLlib, no RDDs — every step is a whole-stage-codegen expression or
a key-bounded shuffle:

* **assign**: the k centroids (k·dim doubles — tiny) become a literal
  array of structs and the argmin is ``array_min`` over
  (distance, cent_id) structs — squared-L2 via
  ``zip_with``+``aggregate``, ZERO joins and ZERO shuffles, fully
  whole-stage-codegen. Codebooks past ``_MAPSIDE_LITERAL_CAP``
  (codegen bloat) fall back to broadcast cross-join + window argmin.
* **update**: ``posexplode`` the vectors and average per
  (cluster, dimension) — one shuffle keyed by k·dim groups, then the
  k·dim means collect to the driver (metadata scale) to become the
  next round's broadcast literals. Keeping centroids driver-side makes
  each round's lineage flat — no iterative plan growth, no checkpoint
  needed (contrast :mod:`levi_spark.operators.graph`, whose labels
  must stay distributed).
* **stop**: max centroid shift < ``tol``, or ``max_iter``.

Empty clusters keep their previous centroid (standard Lloyd fallback).
Deterministic end-to-end: seeded by the first k vectors in ``id_col``
order, ties in assignment broken by centroid id.

**Cross-engine-exact mode** (``dist_scale`` / ``mean_scale``): when an
external oracle must reproduce the fit bit-for-bit, float summation
order must not matter. Distances become integer sums of per-dimension
``floor(sqdiff * dist_scale + 0.5)`` (int64 addition is associative),
and centroid means become ``sum(floor(v * mean_scale + 0.5)) /
mean_scale / count`` — the integer sum is order-independent and the
two double divisions are performed in the same order everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _sqdist_quant(a, b, scale: float):
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.floor((x - y) * (x - y) * F.lit(scale) + F.lit(0.5)).cast(
                "long"
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


# Above this many k*dim literals the map-side argmin expression would
# bloat codegen; fall back to the broadcast-join + window plan.
_MAPSIDE_LITERAL_CAP = 8192

# At/above this many k*dim literals the interpreted HOF argmin is the
# bottleneck (measured: semdedup at k=79, dim=64 spent ~80% of its
# 95 s sf1 wall in assignment passes); quantized-distance codebooks
# switch to the Arrow/numpy path below, which is BIT-EXACT with
# _sqdist_quant (identical elementwise IEEE double ops; the int64 sum
# is associative so vectorization cannot change it).
_ARROW_MIN_LITERALS = 2048


def _assign_arrow(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    dist_scale: float | None,
    dist_col: str | None = None,
    keep_vec: bool = False,
):
    """Arrow-batched nearest-centroid assignment for LARGE codebooks:
    numpy over (rows, centroid-chunk, dim) broadcasts — map-side, zero
    shuffle, zero joins, exactly like the literal argmin but ~100x
    faster when k*dim is big.  BIT-EXACT with the JVM expressions in
    both modes: quantized distances are int64 sums of identical
    elementwise double ops (integer addition is order-free), and FLOAT
    distances accumulate SEQUENTIALLY over dimensions — the same
    left-to-right double adds as the ``aggregate`` fold, vectorized
    across rows, so no pairwise-summation reordering can flip a
    near-tie.  Strict ``<`` keeps the lowest cent_id on ties, matching
    array_min struct order."""
    import numpy as np
    import pandas as pd

    C = [list(map(float, c)) for c in centroids]
    scale = float(dist_scale) if dist_scale else None
    out_id = "id"

    def run(batches):
        Cn = np.asarray(C, dtype=np.float64)  # (k, dim)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            best_d = None
            best_i = None
            # centroid CHUNKS via broadcasting: (rows, chunk, dim)
            # stays bounded
            step = max(1, (32 << 20) // (V.shape[0] * V.shape[1] * 8))
            for c0 in range(0, len(Cn), step):
                Cc = Cn[c0 : c0 + step]
                if scale is not None:
                    diff = V[:, None, :] - Cc[None, :, :]
                    d = np.floor(diff * diff * scale + 0.5).astype(
                        np.int64
                    ).sum(axis=2)  # (rows, chunk)
                else:
                    # float mode: accumulate dim-by-dim in the fold's
                    # exact order
                    d = np.zeros((len(V), len(Cc)), dtype=np.float64)
                    for j in range(V.shape[1]):
                        t = V[:, j, None] - Cc[None, :, j]
                        d += t * t
                ci = d.argmin(axis=1)  # first (lowest id) wins ties
                dm = d[np.arange(len(V)), ci]
                if best_d is None:
                    best_d, best_i = dm, (ci + c0).astype(np.int32)
                else:
                    m = dm < best_d
                    best_d = np.where(m, dm, best_d)
                    best_i = np.where(
                        m, (ci + c0).astype(np.int32), best_i
                    )
            out = pd.DataFrame({out_id: pdf[id_col],
                                "cluster": best_i})
            if dist_col:
                out[dist_col] = best_d
            if keep_vec:
                out["__v"] = pdf[vec_col]
            yield out

    schema = f"{out_id} long, cluster int"
    if dist_col:
        schema += f", {dist_col} " + ("long" if scale is not None
                                      else "double")
    if keep_vec:
        schema += ", __v array<double>"
    src = df.select(id_col, vec_col)
    # a narrow parquet read can arrive in 2-3 partitions; the numpy
    # kernel then runs on 2-3 Python workers while 30 cores idle —
    # spread it ONCE (at real scale the input is already wide and
    # this branch never fires)
    para = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < max(2, para // 2):
        src = src.repartition(para)
    return src.mapInPandas(run, schema)


def _argmin_col(vec_col, centroids: list[list[float]], dist_scale: float | None):
    """Nearest-centroid id for ``vec_col`` as a PURE map-side
    expression: the centroids become a literal array of structs and the
    argmin is ``array_min`` over (distance, cent_id) structs — ties to
    the lower id by lexicographic struct order. No join, no shuffle,
    no per-point window: assignment is embarrassingly parallel, which
    is the plan you want when scoring 100 TB of vectors against a
    broadcastable codebook. Returns (cluster_col, dist_col)."""
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("cent_id"),
                F.array(*[F.lit(float(x)) for x in c]).alias("cv"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    dfun = (
        (lambda v, cv: _sqdist_quant(v, cv, dist_scale))
        if dist_scale
        else _sqdist
    )
    best = F.array_min(
        F.transform(
            cent_arr,
            lambda c: F.struct(
                dfun(vec_col, c["cv"]).alias("d"), c["cent_id"].alias("cent_id")
            ),
        )
    )
    return best["cent_id"], best["d"]


def top_cells_sqdist_quant(
    vec_col, centroids: list[list[float]], nprobe: int, dist_scale: float
):
    """Array of the ``nprobe`` nearest cell ids by quantized squared-L2
    (ascending, ties to the lower id) as a pure map-side expression —
    the serve-path companion of :func:`_argmin_col` for nprobe > 1.
    No join, no shuffle; identical int64 arithmetic to the fit."""
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(int(i)).alias("cent_id"),
                F.array(*[F.lit(float(x)) for x in c]).alias("cv"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    scored = F.transform(
        cent_arr,
        lambda c: F.struct(
            _sqdist_quant(vec_col, c["cv"], dist_scale).alias("d"),
            c["cent_id"].alias("cent_id"),
        ),
    )
    return F.transform(
        F.slice(F.array_sort(scored), 1, nprobe), lambda s: s["cent_id"]
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    max_iter: int = 10,
    tol: float = 1e-6,
    dist_scale: float | None = None,
    mean_scale: float | None = None,
) -> dict:
    """Fit k centroids; returns {"centroids": [[...], ...], "iterations",
    "converged"}. ``df[vec_col]`` must be array<double> of fixed length.

    ``dist_scale``/``mean_scale`` switch on the cross-engine-exact
    integer arithmetic described in the module docstring."""
    spark = df.sparkSession
    pts = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    seeds = [
        list(r["__v"])
        for r in pts.orderBy("__id").limit(k).collect()
    ]
    if len(seeds) < k:
        raise ValueError(f"k={k} but only {len(seeds)} vectors")
    cents = seeds
    converged = False
    it = 0
    dim = len(seeds[0])
    for it in range(1, max_iter + 1):
        if dist_scale and k * dim >= _ARROW_MIN_LITERALS:
            # large quantized codebook: vectorized Arrow assignment,
            # vectors passed through so the update stage is unchanged
            best = _assign_arrow(
                pts, "__id", "__v", cents, dist_scale, keep_vec=True
            ).select(F.col("cluster").alias("cent_id"), "__v")
        elif k * dim <= _MAPSIDE_LITERAL_CAP:
            # assignment with zero shuffle: literal-codebook argmin
            cluster_col, _d = _argmin_col(F.col("__v"), cents, dist_scale)
            best = pts.select(cluster_col.alias("cent_id"), "__v")
        else:
            cdf = spark.createDataFrame(
                [(i, c) for i, c in enumerate(cents)], "cent_id int, cv array<double>"
            )
            dist = (
                _sqdist_quant(F.col("__v"), F.col("cv"), dist_scale)
                if dist_scale
                else _sqdist(F.col("__v"), F.col("cv"))
            )
            scored = pts.crossJoin(F.broadcast(cdf)).select(
                "__id", "__v", "cent_id", dist.alias("__d")
            )
            w = Window.partitionBy("__id").orderBy(
                F.col("__d").asc(), F.col("cent_id").asc()
            )
            best = (
                scored.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .select("cent_id", "__v")
            )
        exploded = best.select("cent_id", F.posexplode("__v").alias("pos", "val"))
        if mean_scale:
            means = (
                exploded.groupBy("cent_id", "pos")
                .agg(
                    F.sum(
                        F.floor(F.col("val") * F.lit(mean_scale) + F.lit(0.5)).cast(
                            "long"
                        )
                    ).alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            )
            mval = lambda r: r["s"] / mean_scale / r["n"]  # noqa: E731
        else:
            means = (
                exploded.groupBy("cent_id", "pos").agg(F.avg("val").alias("m")).collect()
            )
            mval = lambda r: r["m"]  # noqa: E731
        new_cents = [list(c) for c in cents]  # empty clusters keep position
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r["cent_id"], {})[r["pos"]] = mval(r)
        for cid, dims in by_cluster.items():
            new_cents[cid] = [dims[p] for p in sorted(dims)]
        shift = max(
            sum((a - b) * (a - b) for a, b in zip(old, new))
            for old, new in zip(cents, new_cents)
        )
        cents = new_cents
        if shift < tol:
            converged = True
            break
    return {"centroids": cents, "iterations": it, "converged": converged}


def assign_clusters(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    dist_col: str | None = None,
    dist_scale: float | None = None,
    keep_vec: bool = False,
) -> DataFrame:
    """(id, cluster[, dist]) for every row: nearest centroid by squared
    L2, ties to the lower cluster id. Small codebooks score as a pure
    map-side literal-array argmin (no join, no shuffle); codebooks past
    the literal cap fall back to broadcast cross join + window argmin.
    ``dist_col`` also emits the winning distance (int64 when
    ``dist_scale`` is set). ``keep_vec`` carries the vector column
    through (under its input name) so callers that need (cluster,
    vector) rows avoid re-joining the source frame on the id — the
    assignment is map-side, so dropping the vector only to join it
    back would cost a full self-join shuffle."""
    n_lit = len(centroids) * len(centroids[0]) if centroids else 0
    if n_lit >= _ARROW_MIN_LITERALS:
        # quantized AND float modes: the numpy kernel reproduces the
        # JVM arithmetic exactly in both (see _assign_arrow)
        out_df = _assign_arrow(
            df, id_col, vec_col, centroids, dist_scale, dist_col,
            keep_vec=keep_vec,
        )
        if keep_vec:
            out_df = out_df.withColumnRenamed("__v", vec_col)
        return out_df
    if centroids and n_lit <= _MAPSIDE_LITERAL_CAP:
        cluster_col, d_col = _argmin_col(F.col("__v"), centroids, dist_scale)
        out = ["id", cluster_col.alias("cluster")]
        if dist_col:
            out.append(d_col.alias(dist_col))
        if keep_vec:
            out.append(F.col("__v").alias(vec_col))
        return df.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("__v")
        ).select(*out)
    spark = df.sparkSession
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cent_id int, cv array<double>"
    )
    dist = (
        _sqdist_quant(F.col("__v"), F.col("cv"), dist_scale)
        if dist_scale
        else _sqdist(F.col("__v"), F.col("cv"))
    )
    scored = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("__v")
    ).crossJoin(F.broadcast(cdf)).select(
        "id", "__v", "cent_id", dist.alias("__d")
    )
    w = Window.partitionBy("id").orderBy(F.col("__d").asc(), F.col("cent_id").asc())
    out = ["id", F.col("cent_id").alias("cluster")]
    if dist_col:
        out.append(F.col("__d").alias(dist_col))
    if keep_vec:
        out.append(F.col("__v").alias(vec_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(*out)
    )
