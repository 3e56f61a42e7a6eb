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
  round is one self-join on a shifted position key plus one UNIQUE
  RELABELING of (rank, rank-at-offset) pairs. Relabeling is
  distributed and JVM-side: ``monotonically_increasing_id`` over the
  materialized DISTINCT pair set — every consumer compares ranks for
  equality only, so the r11 order-preserving dense rank
  (range-repartition + per-partition row_number + broadcast offsets)
  was strictly more work than duplicate detection needs; dropping it
  removes one exchange, a sampling pass and a per-partition sort per
  round (r12). No global single-partition window, nothing through
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
    """Add a UNIQUE LABEL per distinct ``cols`` key as column ``out``
    — distributed and ENTIRELY JVM-side (whole-stage codegen).

    Every consumer of the rank tables (``dup_window_starts`` /
    ``has_duplicated_window`` / ``longest_duplicated_span`` /
    ``dup_span_report`` and each doubling round's (r_k, r_k') key)
    compares ranks for EQUALITY only — prefix doubling for
    duplicate-window detection never sorts by rank, so an
    order-preserving dense rank is strictly more work than needed.
    r12 optimization: the old formulation range-repartitioned the
    distinct key set (one extra exchange plus a sampling pass), sorted
    each partition under a ``row_number`` window, and collected
    per-partition counts into broadcast offsets; labels replace all of
    that with ``monotonically_increasing_id`` over the distinct key
    set — injective on the materialized frame (partition id in the
    high bits, per-partition counter in the low bits), no sort, no
    sampling job, no offsets collect. The label set is materialized
    (eager localCheckpoint) BEFORE the join back so every downstream
    pass sees one consistent assignment. Labels are nonnegative, so
    the -1 out-of-range sentinel in :func:`suffix_rank_tables` stays a
    value no real window can take.

    Returns ``(joined, n_distinct)`` — n_distinct (the convergence
    signal: all-unique iff n_distinct == row count) is the count of
    the materialized label frame."""
    d = (
        df.select(*cols).distinct()
        .withColumn(out, F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    return df.join(d, cols), d.count()


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
    ``rk`` is an EQUALITY-FAITHFUL label of the length-``2^k`` window
    starting at (doc, p): two windows carry the same label iff their
    token sequences are identical (windows truncated at document end;
    the -1 sentinel stands in for out-of-range halves, which orders
    shorter windows apart from every real window exactly like a unique
    end-of-document terminator would). Label VALUES are not
    order-preserving — every consumer (duplicate-window detection, the
    longest-repeat binary search, the doubling rounds themselves)
    compares labels for equality only. Stops early at the round where
    every label is unique (no duplicated window of that length
    exists), so K <= max_pow. ``n`` is the document's token count."""
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
