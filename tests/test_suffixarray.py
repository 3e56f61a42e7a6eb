"""Distributed prefix-doubling suffix ranking
(operators/suffixarray.py): exact duplicated-window detection and the
longest-duplicated-substring binary search against a brute-force
oracle, plus the cross-ALGORITHM check — the rank-based span report
must equal the gram-hash span report on the real documents table
(independent machinery, provably identical answer)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from levi_spark.operators.suffixarray import (
    dup_span_report,
    dup_window_starts,
    explode_tokens,
    has_duplicated_window,
    longest_duplicated_span,
    suffix_rank_tables,
)
from levi_spark.queries import SUBSTR_L, doc_substring_span_report

V = [f"w{i}" for i in range(300)]


def _docs(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )


def _brute_dup_starts(texts: dict[int, str], t: int):
    from collections import Counter

    toks = {d: s.split() for d, s in texts.items()}
    c: Counter = Counter()
    for tk in toks.values():
        for i in range(len(tk) - t + 1):
            c[tuple(tk[i:i + t])] += 1
    return {
        (d, i)
        for d, tk in toks.items()
        for i in range(len(tk) - t + 1)
        if c[tuple(tk[i:i + t])] >= 2
    }


def _brute_longest(texts: dict[int, str]) -> int:
    from collections import Counter

    toks = {d: s.split() for d, s in texts.items()}
    best = 0
    for ln in range(1, max(len(v) for v in toks.values()) + 1):
        c: Counter = Counter()
        for tk in toks.values():
            for i in range(len(tk) - ln + 1):
                c[tuple(tk[i:i + ln])] += 1
        if any(v >= 2 for v in c.values()):
            best = ln
    return best


def test_dup_windows_and_longest_vs_brute_force(spark):
    dup23 = [f"a{i}" for i in range(23)]  # non-power-of-two length
    dup5 = [f"b{i}" for i in range(5)]
    texts = {
        0: " ".join(V[0:15] + dup23 + V[15:30]),
        1: " ".join(V[30:45] + dup23 + V[45:60]),
        2: " ".join(V[60:75] + dup5 + V[75:90]),
        3: " ".join(V[90:105] + dup5 + V[105:120]),
    }
    ranks = suffix_rank_tables(explode_tokens(_docs(spark, texts)))
    for t in (5, 7, 8, 23, 24):
        got = {
            (r["doc"], r["p"])
            for r in dup_window_starts(ranks, t).collect()
        }
        assert got == _brute_dup_starts(texts, t), f"t={t}"
    assert longest_duplicated_span(ranks) == _brute_longest(texts) == 23
    assert has_duplicated_window(ranks, 23)
    assert not has_duplicated_window(ranks, 24)


def test_all_unique_corpus_early_stop(spark):
    texts = {0: " ".join(V[0:40]), 1: " ".join(V[40:80])}
    ranks = suffix_rank_tables(explode_tokens(_docs(spark, texts)))
    # every token unique -> ranking stops at r0 and nothing repeats
    assert longest_duplicated_span(ranks) == 0
    assert dup_window_starts(ranks, 3).count() == 0
    # capped-table path: t far beyond the stopped round still empty
    assert not has_duplicated_window(ranks, 64)


def test_repeat_within_one_doc(spark):
    rep = [f"r{i}" for i in range(9)]
    texts = {0: " ".join(V[0:10] + rep + V[10:20] + rep + V[20:30])}
    ranks = suffix_rank_tables(explode_tokens(_docs(spark, texts)))
    assert longest_duplicated_span(ranks) == 9
    assert dup_window_starts(ranks, 9).count() == 2


def test_exhausted_max_pow_refuses_uncovered_lengths(spark):
    # max_pow exhausted WITHOUT convergence (a 23-token duplicate but
    # ranks only up to r1): lengths within coverage stay exact, a
    # length beyond 2^(amax+1)-1 raises instead of under-keying
    dup23 = [f"a{i}" for i in range(23)]
    texts = {
        0: " ".join(V[0:15] + dup23 + V[15:30]),
        1: " ".join(V[30:45] + dup23 + V[45:60]),
    }
    ranks = suffix_rank_tables(
        explode_tokens(_docs(spark, texts)), max_pow=1
    )
    assert ranks.schema["r1"].metadata["rank_converged"] is False
    for t in (2, 3):  # covered: two r1 windows span [p, p+t)
        got = {(r["doc"], r["p"])
               for r in dup_window_starts(ranks, t).collect()}
        assert got == _brute_dup_starts(texts, t), f"t={t}"
    with pytest.raises(ValueError, match="did not converge"):
        has_duplicated_window(ranks, 4)
    with pytest.raises(ValueError, match="did not converge"):
        dup_window_starts(ranks, 64).count()
    # a CONVERGED table still answers any length (vacuously empty
    # beyond its top round) — the early-stop contract is unchanged
    uniq = suffix_rank_tables(
        explode_tokens(_docs(spark, {0: " ".join(V[0:40])}))
    )
    top = max(int(c[1:]) for c in uniq.columns
              if c[0] == "r" and c[1:].isdigit())
    assert uniq.schema[f"r{top}"].metadata["rank_converged"] is True
    assert not has_duplicated_window(uniq, 64)


def test_rank_report_equals_gram_report_on_documents(spark):
    # the cross-algorithm gate: rank-exact spans == gram-hash spans on
    # the real documents table (include_first=True on the gram side —
    # both definitions mark every duplicated occurrence)
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    ranks = suffix_rank_tables(
        explode_tokens(docs.where(F.expr(
            f"size(split(trim(text), '\\\\s+')) >= {SUBSTR_L}"
        )))
    )
    got = (
        dup_span_report(ranks, SUBSTR_L).toPandas()
        .astype("int64").sort_values("span_len").reset_index(drop=True)
    )
    want = (
        doc_substring_span_report(spark, sf, include_first=True)
        .toPandas().astype("int64")
        .sort_values("span_len").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns])
