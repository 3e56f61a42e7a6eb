"""Distributed connected components (duplicate-cluster grouping).

After pairwise near-dup candidate generation (MinHash-LSH / SimHash /
embedding-cosine — :mod:`levi_spark.queries`), a training-data dedup
pipeline must group the *transitive* duplicates: A~B and B~C puts all
three in one cluster even when A,C never paired. That is connected
components over the candidate-pair graph — absent from the reference
(its dedup is single-key groupBy only, levi/__init__.py:148-153) and
not expressible as one SQL query, so it is the engine's iterative
showcase.

Algorithm: min-label propagation + pointer jumping. Every node starts
labeled with itself; each round every node takes the min label over
itself and its neighbors, THEN follows its label's label
(``comp -> comp(comp)``, the large-star/path-halving contraction).
Neighbor propagation alone needs diameter rounds — a worst-case chain
graph of n nodes needs n rounds — while the jump step halves every
label chain per round, so convergence is O(log n) on any graph
(near-dup clusters are short chains anyway; the bound matters when a
pathological near-dup chain shows up in a 100 TB corpus).

Scale design:
* each round is two key-bounded shuffles (edge⋈label join + min-agg,
  then the label⋈label jump join) — no cross joins, no driver-side
  graph;
* ``localCheckpoint(eager=True)`` truncates the plan each round —
  without it the lineage doubles per iteration and Catalyst planning
  time, not the data, becomes the bottleneck;
* the convergence check is one scan-aggregate per round (labels are
  non-increasing, so an exact decimal ``sum(comp)`` changes iff any
  label changed — r12 replaced the old new⋈old join, removing a
  two-sided label shuffle per iteration), never a collect of labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    jump_after: int = 2,
    scratch_dir: str | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the smallest node id in the node's component.
    Raises ``RuntimeError`` if ``max_iter`` rounds don't converge.

    ``jump_after``: pointer jumping starts at this round. Near-dup
    graphs are shallow (hub-and-spoke, diameter 2-3) and converge on
    propagation alone before jumping would matter — skipping the jump
    join there saves ~a third of each round. A graph still unconverged
    after ``jump_after`` rounds is deep, and from then on the halving
    step bounds total rounds at O(log n).

    Two structural properties keep the DRIVER cheap at many rounds
    (found by the 100x scaling tier, where the loop wedged Catalyst
    for 19+ minutes in million-digit BigInteger products):

    * ``localCheckpoint`` carries the child plan's ``sizeInBytes``
      ESTIMATE into the new leaf, and Catalyst's size-only stats
      visitor multiplies child estimates at every join — so a round
      that references ``labels`` twice SQUARES the carried estimate,
      and after r rounds the BigInt has ~2^r digits (measured: 28 →
      4,392 digits in 7 rounds; at round ~20 a single stats walk
      multiplies million-digit integers for minutes). Propagation
      therefore references ``labels`` exactly ONCE: self-loops are
      added to the symmetric edge set, which makes ``min over
      neighbours' labels`` include the node's own label — same
      fixpoint, one join instead of two plus a left-join, and the
      estimate grows ADDITIVELY per propagation round.
    * the jump step is inherently ``labels JOIN labels`` (comp of
      comp), which still doubles the estimate's digits each jump
      round — so every ``stats_reset_every`` rounds the labels are
      materialized to a scratch parquet and re-read: a FRESH leaf
      with file-based statistics (the periodic reliable-checkpoint
      pattern production iterative jobs use), which hard-caps the
      compounding at ~2^stats_reset_every between resets.

    ``scratch_dir``: where the periodic stats-reset parquet lands.
    Must be a path every executor AND the driver can read (shared
    filesystem / object store) on a real cluster. Defaults to
    ``spark.sql.streaming.checkpointLocation`` if set, else
    ``spark.checkpoint.dir`` (``SparkContext.setCheckpointDir``),
    else a driver-local tempdir — the tempdir fallback is correct
    only in local mode, where driver and executors share one
    filesystem."""
    import shutil
    import tempfile

    stats_reset_every = 6
    spark = edges.sparkSession
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = sym.select(F.col("a")).distinct()
    # self-loops: min over N(a) ∪ {a} ≡ least(own, min-neighbour)
    sym_loop = (
        sym.unionByName(nodes.select("a", F.col("a").alias("b")))
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(F.col("a").alias("node"), F.col("a").alias("comp"))
    # Convergence signal (r12): every node's label is NON-INCREASING
    # round over round (propagation takes a min that includes the
    # node's own label via the self-loop; the jump takes least(comp,
    # comp(comp))), so "no label changed" is exactly "sum(comp)
    # unchanged" — one scan-aggregate per round instead of the old
    # new⋈old join (which shuffled both label frames every round).
    # decimal(38,0) keeps the sum exact at any node count / id range.
    # A non-numeric id column would CAST to NULL and a NULL sum would
    # compare equal every round (silent wrong convergence) — so the
    # cast is validated once up front and a NULL sum raises.
    if not isinstance(
        nodes.schema["a"].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.DecimalType),
    ):
        raise TypeError(
            "connected_components: node id column must be integral "
            f"(got {nodes.schema['a'].dataType.simpleString()}); the "
            "sum-based convergence check needs an exact numeric label"
        )

    def _label_sum(frame):
        s = frame.agg(
            F.sum(F.col("comp").cast("decimal(38,0)"))
        ).first()[0]
        if s is None and frame.limit(1).count() > 0:
            raise ValueError(
                "connected_components: NULL label sum (NULL node id?)"
            )
        return s

    prev_sum = _label_sum(labels)
    base = scratch_dir
    if base is None:
        base = spark.conf.get("spark.sql.streaming.checkpointLocation", None)
    if base is None:
        base = spark.sparkContext.getCheckpointDir()  # may be None
    if base is not None:
        import uuid

        scratch = base.rstrip("/") + f"/levi_cc_{uuid.uuid4().hex}"
        local_scratch = False
    else:
        scratch = tempfile.mkdtemp(prefix="levi_cc_")
        local_scratch = True
    try:
        for round_i in range(max_iter):
            propagated = (
                sym_loop.join(labels, sym_loop["b"] == labels["node"])
                .groupBy("a")
                .agg(F.min("comp").alias("comp"))
                .select(F.col("a").alias("node"), "comp")
            )
            if round_i >= jump_after:
                # Pointer jumping (path halving): comp := min(comp,
                # comp(comp)). Every label is itself a node id, so the
                # self-join always resolves; a length-n pointer chain
                # halves each round, giving O(log n) convergence.
                jump = propagated.select(
                    F.col("node").alias("__jn"), F.col("comp").alias("__jc")
                )
                propagated = propagated.join(
                    jump, propagated["comp"] == jump["__jn"], "left"
                ).select(
                    "node",
                    F.least(
                        F.col("comp"), F.coalesce(F.col("__jc"), F.col("comp"))
                    ).alias("comp"),
                )
            if round_i % stats_reset_every == stats_reset_every - 1:
                path = f"{scratch}/labels_{round_i}"
                propagated.write.mode("overwrite").parquet(path)
                new_labels = spark.read.parquet(path)
            else:
                new_labels = propagated.localCheckpoint(eager=True)
            new_sum = _label_sum(new_labels)
            changed = int(new_sum != prev_sum)
            prev_sum = new_sum
            labels = new_labels
            if changed == 0:
                return labels.select(
                    "node", F.col("comp").alias("component")
                ).localCheckpoint(eager=True)
    finally:
        if local_scratch:
            shutil.rmtree(scratch, ignore_errors=True)
        else:
            # shared-filesystem scratch: delete through Hadoop FS so
            # s3://, hdfs:// and file:// paths all clean up.
            try:
                jvm = spark.sparkContext._jvm
                jsc = spark.sparkContext._jsc
                p = jvm.org.apache.hadoop.fs.Path(scratch)
                p.getFileSystem(jsc.hadoopConfiguration()).delete(p, True)
            except Exception:
                pass
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 3,
    scale: int = 10**12,
    damping_pct: int = 85,
) -> DataFrame:
    """Weighted PageRank over an edge list, in EXACT integer
    arithmetic: ranks live on an integer grid of ``scale`` units
    (initial rank = scale // N), each edge carries
    ``(rank div out_weight) * weight`` units to its target, and the
    damping mix is ``base + (damping_pct * inflow) div 100`` with
    ``base = (scale * (100 - damping_pct)) div (100 * N)``. Every
    operation is BIGINT-closed, so the result is bit-identical across
    engines (an oracle can unroll the same rounds as SQL CTEs) and
    never accumulates float drift. Dangling-node mass decays (the
    standard sink variant without redistribution); per-edge floor
    division loses < out_weight units per node per round — at
    scale=1e12 that is noise.

    Scale design: each round is one key-bounded join of the rank
    frame onto the edge list plus one groupBy(dst) — both shuffles
    hash on node keys, partial aggregation collapses contributions
    map-side, and nothing collects. N (node count) is the only driver
    scalar. For web-scale graphs raise ``iters``; convergence is not
    auto-detected (callers gate rounds deterministically).

    Returns (node, rank_scaled BIGINT).
    """
    # r12: materialize the contracted edge frame ONCE (eager
    # localCheckpoint) before iterating — without it, every round's
    # contrib join re-evaluated the caller's whole edge-extraction
    # subtree (for event_type_pagerank that is the per-user window
    # over the events firehose, re-run ~5x: nodes.count, outw, and
    # each iteration). Same bit-exact arithmetic; the checkpoint is
    # the contracted summary, the frame an iterative algorithm must
    # hold resident anyway (same device as the CC loop above).
    e = edges.select(
        F.col(src).alias("__s"),
        F.col(dst).alias("__d"),
        (F.col(weight) if weight else F.lit(1)).cast("long").alias("__w"),
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("__s").alias("node"))
        .unionByName(e.select(F.col("__d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_scaled", F.lit(0).cast("long"))
    base = (scale * (100 - damping_pct)) // (100 * n)
    outw = e.groupBy("__s").agg(F.sum("__w").alias("__ow"))
    # out-weights attach once, not once per round
    ew = e.join(outw, "__s").localCheckpoint(eager=True)
    r = nodes.withColumn("pr", F.lit(int(scale // n)).cast("long"))
    for _ in range(iters):
        contrib = (
            ew.join(r, ew["__s"] == r["node"])
            .select("__d", F.expr("(pr div __ow) * __w").alias("__c"))
            .groupBy("__d")
            .agg(F.sum("__c").alias("__in"))
        )
        r = (
            nodes.join(contrib, nodes["node"] == contrib["__d"], "left")
            .select(
                "node",
                (
                    F.lit(int(base))
                    + F.expr(f"({damping_pct} * coalesce(__in, 0L)) div 100")
                ).cast("long").alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return r.select("node", F.col("pr").alias("rank_scaled"))
