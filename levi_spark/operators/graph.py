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
* the convergence check is a metadata-scale count per round (2 jobs
  per iteration), not a collect of labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    jump_after: int = 2,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the smallest node id in the node's component.
    Raises ``RuntimeError`` if ``max_iter`` rounds don't converge.

    ``jump_after``: pointer jumping starts at this round. Near-dup
    graphs are shallow (hub-and-spoke, diameter 2-3) and converge on
    propagation alone before jumping would matter — skipping the jump
    join there saves ~a third of each round. A graph still unconverged
    after ``jump_after`` rounds is deep, and from then on the halving
    step bounds total rounds at O(log n)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("a").alias("node"), F.col("a").alias("comp")).distinct()
    for round_i in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        propagated = labels.join(
            nbr_min, labels["node"] == nbr_min["a"], "left"
        ).select(
            "node",
            F.least(
                F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
            ).alias("comp"),
        )
        if round_i >= jump_after:
            # Pointer jumping (path halving): comp := min(comp,
            # comp(comp)). Every label is itself a node id, so the
            # self-join always resolves; a length-n pointer chain halves
            # each round, giving O(log n) convergence on chain graphs.
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
        new_labels = propagated.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("comp").alias("component"))
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
