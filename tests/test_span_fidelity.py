"""Paper-fidelity proof for the maximal duplicated-span report
(doc_substring_span_report): against a BRUTE-FORCE oracle that
implements Lee et al.'s definition directly — the union of ALL
duplicated substrings of length >= L, at EVERY length, not just
multiples of L — the gram-union pipeline must produce the identical
span histogram.

Why this holds (the coverage-equivalence argument, also recorded in
the operator docstring): a token position lies inside some duplicated
substring of length >= L iff it lies inside some duplicated L-gram —
any length-L subwindow of a longer duplicated substring is itself
duplicated, and covers every position of the long substring as the
subwindow slides. So the duplicated-token SET is identical, maximal
spans are the connected runs of that set under both definitions, and
span lengths come out exact at TOKEN resolution — including planted
duplicates whose length is not a multiple of L, and spans formed by
OVERLAPPING duplicated substrings of different lengths.
"""

import duckdb
import pandas as pd
import pytest

from levi_spark.queries import SPAN_REPORT_SQL, SUBSTR_L, doc_substring_span_report


def brute_force_spans(texts: dict[int, str], min_len: int) -> pd.DataFrame:
    """Lee-et-al by definition: every (doc, start, length>=min_len)
    window whose token text occurs >= 2 times anywhere in the corpus
    marks its tokens duplicated; spans are maximal runs of duplicated
    tokens; histogram by span length."""
    toks = {d: t.split() for d, t in texts.items()}
    from collections import Counter, defaultdict

    counts: Counter = Counter()
    max_n = max(len(v) for v in toks.values())
    for d, tk in toks.items():
        n = len(tk)
        for ln in range(min_len, n + 1):
            for s in range(0, n - ln + 1):
                counts[tuple(tk[s:s + ln])] += 1
    covered: dict[int, set] = defaultdict(set)
    for d, tk in toks.items():
        n = len(tk)
        for ln in range(min_len, n + 1):
            for s in range(0, n - ln + 1):
                if counts[tuple(tk[s:s + ln])] >= 2:
                    covered[d].update(range(s, s + ln))
    rows = []
    for d, pos in covered.items():
        if not pos:
            continue
        run = []
        for p in sorted(pos):
            if run and p != run[-1] + 1:
                rows.append((d, len(run)))
                run = []
            run.append(p)
        if run:
            rows.append((d, len(run)))
    spans = pd.DataFrame(rows, columns=["doc_id", "span_len"])
    out = (
        spans.groupby("span_len")
        .agg(n_spans=("doc_id", "size"), n_docs=("doc_id", "nunique"))
        .reset_index()
    )
    out["n_tokens"] = out["span_len"] * out["n_spans"]
    return out.astype("int64").sort_values("span_len").reset_index(drop=True)


def _run_operator(spark, texts: dict[int, str]) -> pd.DataFrame:
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="levi_span_fid_")
    pdf = pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": [texts[k] for k in texts],
            "lang": "en",
            "source": "t",
            "n_chars": [len(texts[k]) for k in texts],
        }
    )
    pdf.to_parquet(os.path.join(d, "documents.parquet"))
    # include_first=True = the paper's corpus-duplication accounting
    # (every occurrence marked); the gate default marks non-first
    # occurrences only (the removal plan)
    got = doc_substring_span_report(spark, d, include_first=True).toPandas()
    return (
        got.astype("int64")
        .sort_values("span_len")
        .reset_index(drop=True)
    )


V = [f"w{i}" for i in range(200)]  # distinct vocabulary tokens


def _mk(tokens: list[str]) -> str:
    return " ".join(tokens)


def test_planted_non_multiple_of_L_lengths(spark):
    # planted duplicated runs of 11, 13 and 27 tokens (L = 8; none a
    # multiple), each shared between two docs, embedded in unique text
    assert SUBSTR_L == 8
    dup11 = [f"a{i}" for i in range(11)]
    dup13 = [f"b{i}" for i in range(13)]
    dup27 = [f"c{i}" for i in range(27)]
    texts = {
        0: _mk(V[0:20] + dup11 + V[20:40]),
        1: _mk(V[40:60] + dup11 + V[60:80]),
        2: _mk(V[80:95] + dup13 + V[95:110]),
        3: _mk(V[110:125] + dup13 + V[125:140]),
        4: _mk(V[140:150] + dup27 + V[150:160]),
        5: _mk(V[160:170] + dup27 + V[170:180]),
    }
    got = _run_operator(spark, texts)
    want = brute_force_spans(texts, SUBSTR_L)
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_dtype=False
    )
    assert set(want["span_len"]) == {11, 13, 27}


def test_overlapping_and_adjacent_repeats_merge_exactly(spark):
    # two distinct duplicated substrings ADJACENT in doc 0 (their
    # union is a 21-token duplicated region even though no single
    # 21-token substring repeats) plus an OVERLAPPING pair; brute
    # force and the gram union must agree on the merged spans
    dupA = [f"a{i}" for i in range(10)]
    dupB = [f"b{i}" for i in range(11)]
    texts = {
        0: _mk(V[0:15] + dupA + dupB + V[15:30]),   # adjacent here
        1: _mk(V[30:50] + dupA + V[50:70]),
        2: _mk(V[70:90] + dupB + V[90:110]),
        # overlap: x0..x8 dup with doc 4; x4..x12 dup with doc 5
        3: _mk(V[110:125] + [f"x{i}" for i in range(13)] + V[125:140]),
        4: _mk(V[140:160] + [f"x{i}" for i in range(0, 9)] + V[160:175]),
        5: _mk(V[175:190] + [f"x{i}" for i in range(4, 13)] + V[190:200]),
    }
    got = _run_operator(spark, texts)
    want = brute_force_spans(texts, SUBSTR_L)
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_dtype=False
    )
    # doc 0's adjacent repeats merged into one 21-token region
    assert 21 in set(want["span_len"])


def test_sub_threshold_lengths_invisible_both_ways(spark):
    # a 7-token duplicate (< L = 8) is below the paper threshold for
    # BOTH the oracle and the operator: empty histograms
    dup7 = [f"s{i}" for i in range(7)]
    texts = {
        0: _mk(V[0:20] + dup7 + V[20:40]),
        1: _mk(V[40:60] + dup7 + V[60:80]),
    }
    got = _run_operator(spark, texts)
    want = brute_force_spans(texts, SUBSTR_L)
    assert len(got) == 0 and len(want) == 0


def test_duckdb_oracle_matches_brute_force_on_planted(spark):
    # the registry's DuckDB oracle implements the same span algebra —
    # pin it against the brute force too, so all three agree
    dup9 = [f"q{i}" for i in range(9)]
    dup17 = [f"r{i}" for i in range(17)]
    texts = {
        0: _mk(V[0:12] + dup9 + V[12:25]),
        1: _mk(V[25:40] + dup9 + V[40:55]),
        2: _mk(V[55:70] + dup17 + V[70:85]),
        3: _mk(V[85:100] + dup17 + V[100:115]),
    }
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="levi_span_fid_sql_")
    pdf = pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": [texts[k] for k in texts],
            "lang": "en",
            "source": "t",
            "n_chars": [len(texts[k]) for k in texts],
        }
    )
    pdf.to_parquet(os.path.join(d, "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(d, 'documents.parquet')}')"
    )
    got = (
        con.execute(SPAN_REPORT_SQL).df().astype("int64")
        .sort_values("span_len").reset_index(drop=True)
    )
    # the registry SQL implements the gate's NON-FIRST semantics: with
    # exactly two copies per planted family, the surviving (non-first)
    # copy halves every count of the paper histogram
    want = brute_force_spans(texts, SUBSTR_L)
    for c in ("n_spans", "n_docs", "n_tokens"):
        want[c] //= 2
    pd.testing.assert_frame_equal(got[want.columns], want,
                                  check_dtype=False)
