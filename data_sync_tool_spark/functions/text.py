"""Text-analysis column expressions for large-scale training-data pipelines.

All hot-path functions are built-in-expression compositions (JVM-side,
whole-stage codegen); nothing here is per-row Python. Each is designed to be
reproducible in ANSI SQL so the DuckDB oracle can verify it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny stopword marker sets per language — a deterministic, SQL-expressible
# n-gram-ish language heuristic (counts of padded function words).
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " und ", " die ", " ist ", " das "],
    "fr": [" le ", " la ", " et ", " les ", " est "],
    "es": [" el ", " la ", " que ", " los ", " es "],
}


def occurrence_count(text: Column, needle: str) -> Column:
    """Number of occurrences of ``needle`` in ``text`` via length arithmetic —
    the only occurrence counter expressible identically in Spark and DuckDB."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / F.lit(len(needle))
    ).cast("long")


def marker_score(text: Column, lang: str) -> Column:
    """Total marker-word occurrences for ``lang`` over a space-padded,
    lowercased image of the text."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    score = F.lit(0).cast("long")
    for m in LANG_MARKERS[lang]:
        score = score + occurrence_count(padded, m)
    return score


def lang_id(text: Column) -> Column:
    """Best-scoring language by marker count, 'und' when all scores are 0.

    Ties break by fixed language order (en, de, fr, es) — deterministic.
    """
    langs = list(LANG_MARKERS)
    scores = {lg: marker_score(text, lg) for lg in langs}
    best = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lg in langs:  # strict > keeps earlier language on ties
        is_better = scores[lg] > best_score
        best = F.when(is_better, F.lit(lg)).otherwise(best)
        best_score = F.when(is_better, scores[lg]).otherwise(best_score)
    return best


def token_count(text: Column) -> Column:
    """Whitespace token count. Empty/blank text counts 0."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


def word_chars(text: Column) -> Column:
    """Count of alphanumeric characters."""
    return F.length(F.regexp_replace(text, r"[^0-9A-Za-z]", "")).cast("long")


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: alphanumeric density damped by
    extreme length. score = alnum_ratio * least(1, tokens/20)."""
    n = F.length(text).cast("double")
    alnum_ratio = F.when(n > 0, word_chars(text) / n).otherwise(F.lit(0.0))
    len_factor = F.least(F.lit(1.0), token_count(text) / F.lit(20.0))
    return F.round(alnum_ratio * len_factor, 6)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased text
    (rolling-hash analogue, exact and order-dependent)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def shingles(text: Column, k: int = 5) -> Column:
    """Array of character k-shingles over the normalized text (positions
    1..len-k+1). Short texts yield a single shingle of the whole text.

    NOTE: building per-row shingle ARRAYS is ~25x slower than the exploded
    representation in Spark 4 — every hot-path consumer should use
    ``operators.dedup_suite.exploded_shingles`` instead; this column form is
    for small-data / interactive use."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    n = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(F.lit(1), n - F.lit(k - 1)))
    return F.transform(idx, lambda i: norm.substr(i, F.lit(k)))
