"""Distributed corpus suffix ranking by PREFIX DOUBLING — the
suffix-array machinery behind Lee et al.'s exact-substring
deduplication ("Deduplicating Training Data Makes Language Models
Better"), expressed as log-rounds of Spark dense ranking instead of a
single-node suffix-array build.

Why it exists next to the gram pipeline (``doc_substring_dedup`` /
``doc_substring_span_report``): the two are PROVABLY equivalent on
duplicated-token coverage (any length-L subwindow of a longer
duplicated substring is itself duplicated — see
``tests/test_span_fidelity.py``), but they are algorithmically
independent — ranks compare real token sequences, no hashing — so one
verifies the other end to end (``tests/test_suffixarray.py`` pins the
two span histograms equal on the documents table), and the rank
tables answer questions grams cannot: the exact LONGEST duplicated
substring in the corpus via binary search, and duplicated-window
detection at ANY length T from one table (the classic two-overlapping-
power-of-two-windows trick), without re-sharding per length.

Scale shape (the 100 TB story):

* ``suffix_rank_tables`` runs ``ceil(log2(max_len))`` rounds; each
  round is one self-join on a shifted position key plus one DENSE RANK
  of (rank, rank-at-offset) pairs. Dense ranking is distributed and
  JVM-side: range-repartition the DISTINCT pairs (ascending partition
  ids carry ascending ranges), per-partition ``row_number`` windows,
  and a driver-bounded partition-count collect turned into broadcast
  offsets — no global single-partition window, nothing through
  Python. Lineage is truncated per round (localCheckpoint), so round
  k's jobs never recompute rounds 0..k-1.
* every join keys on (doc, position) or on the pair ranks — uniform
  keys, no skew hot spot; rounds terminate early once all ranks are
  distinct (no repeats longer than 2^k exist).
* ``longest_duplicated_span`` is a binary search over candidate
  lengths: each probe is one groupBy-count on a pair of rank columns
  already materialized — O(log max_len) cheap jobs, zero re-ranking.

Suffixes never cross document boundaries: the rank at an
out-of-range offset is the -1 sentinel, which orders shorter suffixes
first exactly like a unique end-of-document terminator would.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dense_rank_join(df: DataFrame, cols: list[str],
                     out: str) -> tuple[DataFrame, int]:
    """Add a GLOBAL dense rank over ``cols`` as column ``out`` —
    distributed and ENTIRELY JVM-side (whole-stage codegen; an
    earlier zipWithIndex formulation deserialized the whole distinct
    key set through Python workers, ~3x the wall time):

    1. range-repartition the DISTINCT key set (ascending partition
       ids carry ascending key ranges — Spark's RangePartitioner
       contract, the same one global sort rests on);
    2. per-partition ``row_number`` over a window keyed by the
       physical partition id — each window partition is one bounded
       shuffle partition, never a global single-partition window;
    3. one driver-bounded collect of per-partition COUNTS (<=
       shuffle-partition rows) -> cumulative offsets, broadcast back;
    4. rank = partition offset + local row_number - 1; join back on
       the key.

    Returns ``(joined, n_distinct)`` — the distinct-key count falls
    out of the offset accumulation for free, and since ranks are
    dense it doubles as the convergence signal (all-unique iff
    n_distinct == row count), saving one count job per round."""
    from pyspark.sql import Window

    spark = df.sparkSession
    try:
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:  # e.g. "auto" on some vendored runtimes
        n = spark.sparkContext.defaultParallelism
    distinct = df.select(*cols).distinct()
    d = (
        distinct.repartitionByRange(n, *cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    w = Window.partitionBy("__pid").orderBy(*cols)
    d = d.withColumn("__rn", F.row_number().over(w)).localCheckpoint(
        eager=False
    )
    counts = {
        r["__pid"]: r["c"]
        for r in d.groupBy("__pid").agg(
            F.count(F.lit(1)).alias("c")
        ).collect()
    }
    offs, acc = [], 0
    for pid in sorted(counts):
        offs.append((pid, acc))
        acc += counts[pid]
    off_df = spark.createDataFrame(offs, "__pid int, __off long")
    ranked = (
        d.join(F.broadcast(off_df), "__pid")
        .select(*cols,
                (F.col("__off") + F.col("__rn") - 1).alias(out))
    )
    return df.join(ranked, cols), acc


def explode_tokens(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc, p, tok) — whitespace tokens with 0-based positions."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return (
        docs.where(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("doc"), F.posexplode(toks)
                .alias("p", "tok"))
    )


def suffix_rank_tables(tokens: DataFrame, max_pow: int = 9) -> DataFrame:
    """Prefix-doubling rank tables: (doc, p, n, r0, r1, ..., rK) where
    ``rk`` is the dense rank of the length-``2^k`` window starting at
    (doc, p) among ALL corpus windows (windows truncated at document
    end; shorter sorts first). Stops early at the round where every
    rank is unique (no duplicated window of that length exists), so
    K <= max_pow. ``n`` is the document's token count."""
    base = tokens.select("doc", "p", "tok")
    n_by_doc = base.groupBy("doc").agg(F.max("p").alias("__maxp"))
    df, nd = _dense_rank_join(base, ["tok"], "r0")
    df = df.drop("tok")
    df = df.join(n_by_doc, "doc").withColumn(
        "n", F.col("__maxp") + 1
    ).drop("__maxp")
    # truncate lineage EVERY round (not just at the end): each round
    # runs several actions (convergence count, range sampling, offset
    # collect) and without the checkpoint each one recomputes every
    # prior round's joins from scratch — measured ~6x the wall time
    # on a corpus where the data itself is trivial
    df = df.localCheckpoint(eager=True)
    total = df.count()
    k = 0
    converged = False
    while True:
        # dense ranks: all-unique iff the round's distinct-key count
        # (returned by _dense_rank_join for free) equals the row count
        if nd == total:
            converged = True
            break  # all windows unique; doubling further changes nothing
        if k >= max_pow:
            break  # exhausted the round budget with repeats remaining
        step = 1 << k
        shifted = df.select(
            "doc", (F.col("p") - step).alias("p"),
            F.col(f"r{k}").alias("__rs"),
        )
        df = (
            df.join(shifted, ["doc", "p"], "left")
            .withColumn("__rs", F.coalesce("__rs", F.lit(-1)))
        )
        df, nd = _dense_rank_join(df, [f"r{k}", "__rs"], f"r{k + 1}")
        df = df.drop("__rs").localCheckpoint(eager=True)
        k += 1
    # record convergence on the top rank column's metadata so window
    # probes can refuse lengths the table cannot answer exactly
    # (t >= 2^(k+1) is only covered when r_k is all-unique)
    df = df.select(
        *[c for c in df.columns if c != f"r{k}"],
        F.col(f"r{k}").alias(f"r{k}", metadata={
            "rank_converged": converged
        }),
    )
    return df.localCheckpoint(eager=True)


def _pair_cols(ranks: DataFrame, t: int):
    """Key columns identifying the length-``t`` window at (doc, p):
    rank_a at p and rank_a at p + t - 2^a, with 2^a <= t < 2^(a+1)
    (the two windows overlap and exactly cover [p, p+t)). Returns
    (joined_df, key_cols) over rows where the window fits the doc."""
    amax = max(int(c[1:]) for c in ranks.columns
               if c[0] == "r" and c[1:].isdigit())
    a = min(t.bit_length() - 1, amax)  # floor(log2 t), capped
    ra = f"r{a}"
    if a < t.bit_length() - 1:
        # the table's rank columns stop below floor(log2 t): only safe
        # when ranking CONVERGED (r_amax all-unique corpus-wide, so no
        # longer window can repeat either and dup detection is
        # vacuously empty). If suffix_rank_tables exhausted max_pow
        # with repeats remaining, two r_amax columns cannot cover
        # [p, p+t) and the key would under-constrain — refuse rather
        # than report false duplicates (the EXACT contract).
        meta = ranks.schema[f"r{amax}"].metadata
        converged = meta.get("rank_converged") if meta else None
        if converged is None:  # pre-metadata table: verify by count
            converged = (
                ranks.select(f"r{amax}").distinct().count()
                == ranks.count()
            )
        if not converged:
            raise ValueError(
                f"rank table covers windows up to 2^{amax + 1}-1 and "
                f"ranking did not converge; cannot answer length "
                f"t={t} exactly — rebuild with max_pow >= "
                f"{t.bit_length() - 1}"
            )
    off = t - (1 << a)
    fits = ranks.where(F.col("p") + t <= F.col("n"))
    if off == 0:
        return fits.select("doc", "p", F.col(ra).alias("k1"),
                           F.col(ra).alias("k2")), ["k1"]
    right = ranks.select(
        "doc", (F.col("p") - off).alias("p"),
        F.col(ra).alias("k2"),
    )
    return (
        fits.select("doc", "p", F.col(ra).alias("k1"))
        .join(right, ["doc", "p"])
    ), ["k1", "k2"]


def dup_window_starts(ranks: DataFrame, t: int) -> DataFrame:
    """(doc, p) of every length-``t`` window whose token sequence
    occurs >= 2 times in the corpus — EXACT (rank identity, no
    hashing)."""
    pairs, keys = _pair_cols(ranks, t)
    counts = pairs.groupBy(*keys).agg(F.count(F.lit(1)).alias("__c"))
    return (
        pairs.join(counts, keys)
        .where(F.col("__c") > 1)
        .select("doc", "p")
        .distinct()
    )


def has_duplicated_window(ranks: DataFrame, t: int) -> bool:
    pairs, keys = _pair_cols(ranks, t)
    return (
        pairs.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") > 1)
        .limit(1)
        .count()
        > 0
    )


def longest_duplicated_span(ranks: DataFrame) -> int:
    """Length of the LONGEST token sequence occurring >= 2 times in
    the corpus — binary search over window lengths (each probe one
    groupBy on materialized rank columns). 0 if even single tokens
    are all unique."""
    if not has_duplicated_window(ranks, 1):
        return 0
    max_n = ranks.agg(F.max("n")).first()[0]
    lo, hi = 1, max_n  # invariant: dup at lo, none at hi+1
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if has_duplicated_window(ranks, mid):
            lo = mid
        else:
            hi = mid - 1
    return lo


def dup_span_report(ranks: DataFrame, t: int) -> DataFrame:
    """Maximal duplicated-span histogram at threshold ``t`` — the
    same span algebra as ``doc_substring_span_report``
    (include_first=True), driven by rank-exact duplicated windows
    instead of gram hashes: interval union of [p, p+t) per doc (gap >
    t breaks), histogram by span length. Columns: span_len, n_spans,
    n_docs, n_tokens."""
    from pyspark.sql import Window

    pos = dup_window_starts(ranks, t)
    w = Window.partitionBy("doc").orderBy("p")
    lagged = F.lag("p").over(w)
    spans = (
        pos.withColumn(
            "new_span",
            F.when(lagged.isNull() | (F.col("p") - lagged > t),
                   F.lit(1)).otherwise(F.lit(0)),
        )
        .withColumn("span_id", F.sum("new_span").over(w))
        .groupBy("doc", "span_id")
        .agg((F.max("p") - F.min("p") + t).alias("span_len"))
    )
    return (
        spans.groupBy("span_len")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.countDistinct("doc").alias("n_docs"),
        )
        .select(
            F.col("span_len").cast("long").alias("span_len"),
            F.col("n_spans").cast("long").alias("n_spans"),
            F.col("n_docs").cast("long").alias("n_docs"),
            (F.col("span_len") * F.col("n_spans")).cast("long")
            .alias("n_tokens"),
        )
        .orderBy("span_len")
    )
