"""Text-analysis column builders for the documents pipeline.

All JVM-side ``pyspark.sql.functions`` expressions — no Python UDFs in
the hot path, so whole-stage codegen applies and each operator scales
linearly with executors. Every builder has a deliberately *dual
implementation* in ANSI SQL (see ``levi_spark/queries.py`` oracles), so
correctness is machine-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword
# heuristic language-ID. Chosen to be disjoint across languages.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "nicht"],
    "es": ["el", "que", "los"],
    "fr": ["le", "les", "une"],
    "zh": ["的", "是", "了"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish splitting is a later refinement)."""
    return F.size(F.split(F.trim(text), r"\s+"))


def char_count_no_space(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"\s", ""))


def substring_occurrences(text: Column, needle: str) -> Column:
    """Occurrences of ``needle`` in ``text`` via length arithmetic —
    identical semantics in any SQL engine (no regex dialect drift)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def marker_hits(text: Column, words: list[str]) -> Column:
    """Total occurrences of the marker words as whole tokens (padded
    with spaces so word boundaries are literal)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    out = F.lit(0).cast("long")
    for w in words:
        out = out + substring_occurrences(padded, f" {w} ")
    return out


def lang_id_expr(text: Column) -> Column:
    """Heuristic language ID: argmax of marker-word hit counts with a
    deterministic tie-break (language code order); 'und' if no marker
    hit at all."""
    hits = {lang: marker_hits(text, words) for lang, words in LANG_MARKERS.items()}
    langs = sorted(LANG_MARKERS)  # deterministic tie-break: code order
    best = F.greatest(*[hits[lang] for lang in langs])
    expr = F.lit("und")
    for lang in reversed(langs):
        expr = F.when(hits[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("und"))


def quality_score_expr(text: Column) -> Column:
    """Document quality score in [0,1]: blend of token-count band,
    mean token length band, punctuation and digit ratios.

    Pure double arithmetic with a fixed operation order so the DuckDB
    oracle reproduces it bit-for-bit (rounded to 6 dp at the surface).
    """
    n_tok = token_count(text).cast("double")
    n_char = F.length(text).cast("double")
    n_alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", "")).cast("double")
    n_digit = F.length(F.regexp_replace(text, r"[^0-9]", "")).cast("double")
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", "")).cast("double")
    mean_tok_len = char_count_no_space(text).cast("double") / n_tok
    tok_band = F.when((n_tok >= 10) & (n_tok <= 5000), F.lit(1.0)).otherwise(F.lit(0.2))
    len_band = F.when((mean_tok_len >= 2.0) & (mean_tok_len <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.3)
    )
    alpha_ratio = n_alpha / n_char
    digit_pen = F.lit(1.0) - (n_digit / n_char)
    punct_pen = F.lit(1.0) - (n_punct / n_char)
    return (
        tok_band * F.lit(0.3)
        + len_band * F.lit(0.2)
        + alpha_ratio * F.lit(0.3)
        + digit_pen * F.lit(0.1)
        + punct_pen * F.lit(0.1)
    )


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct character n-grams as an array column (for Jaccard)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(text) - (n - 1), F.lit(0)))
    grams = F.transform(idx, lambda i: text.substr(i, F.lit(n)))
    return F.array_distinct(grams)


def jaccard_expr(a: Column, b: Column) -> Column:
    """Jaccard similarity of two array columns (distinct elements)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return inter / union


# Modulus chosen so acc*257+c stays below 2^63: int64 engines (Spark)
# and arbitrary-precision engines (DuckDB HUGEINT) agree without overflow.
FINGERPRINT_MOD = 10_000_000_000_000_061


def rolling_fingerprint(text: Column, modulus: int = FINGERPRINT_MOD) -> Column:
    """Deterministic polynomial rolling hash of the document (base-257
    Horner over code points, mod ``FINGERPRINT_MOD``) — a content
    fingerprint any engine can recompute. Built with ``aggregate`` over
    the char array: JVM-side, no UDF."""
    mersenne = modulus
    # fold over characters via their code points
    chars = F.transform(
        F.sequence(F.lit(1), F.length(text)),
        lambda i: F.ascii(text.substr(i, F.lit(1))).cast("long"),
    )
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(257) + c) % F.lit(mersenne),
    )
