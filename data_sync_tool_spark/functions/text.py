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


def padded_lower(text: Column) -> Column:
    """Space-padded, lowercased scoring image. Hot-path callers should
    materialize this ONCE in an explicit projection and pass the column to
    ``marker_score``/``lang_id`` with ``prepadded=True``: the image is
    referenced ~2× per marker, and because it is non-cheap and multiply
    referenced, CollapseProject keeps the materialized column instead of
    re-inlining a lower()+concat per reference."""
    return F.concat(F.lit(" "), F.lower(text), F.lit(" "))


def marker_score(text: Column, lang: str, prepadded: bool = False) -> Column:
    """Total marker-word occurrences for ``lang`` over a space-padded,
    lowercased image of the text."""
    padded = text if prepadded else padded_lower(text)
    score = F.lit(0).cast("long")
    for m in LANG_MARKERS[lang]:
        score = score + occurrence_count(padded, m)
    return score


def lang_id(text: Column, prepadded: bool = False) -> Column:
    """Best-scoring language by marker count, 'und' when all scores are 0.

    Ties break by fixed language order (en, de, fr, es) — deterministic:
    ``array_position`` finds the FIRST index of the max, and a winner needs
    a strictly positive score. The scores live in one array so each
    language's expression tree is built exactly once — a chained
    when(best_score<s, ...) formulation re-embeds every earlier score tree
    in each step (≈2^n_langs copies) and pushes Catalyst analysis time past
    the actual execution time on small batches."""
    langs = list(LANG_MARKERS)
    scores = F.array(*[marker_score(text, lg, prepadded) for lg in langs])
    top = F.array_max(scores)
    pick = F.element_at(
        F.array(*[F.lit(lg) for lg in langs]),
        F.array_position(scores, top).cast("int"),
    )
    return F.when(top > 0, pick).otherwise(F.lit("und"))


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


# PII scrubbing — the pre-training redaction pass (emails, phone numbers,
# IPv4 addresses → typed placeholder tokens). Patterns use only regex
# constructs with identical semantics in Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition, and \b word boundaries —
# no lookaround, no backreferences. Order matters and is fixed: emails are
# redacted before IPs so an address-like mail domain is consumed by the
# email rule first; counts are computed per-pattern on the ORIGINAL text and
# are therefore independent (a token can count in two categories).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{2}-\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Text with every PII match replaced by its placeholder token, applying
    ``PII_PATTERNS`` in order (one chained ``regexp_replace`` per pattern —
    three JVM regex passes, zero Python)."""
    out = text
    for _name, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII pattern (``email`` / ``ip`` / ``phone``) in the
    original text, via ``regexp_extract_all`` length (codegen, no UDF)."""
    pat = next(p for n, p, _t in PII_PATTERNS if n == kind)
    return F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).cast("long")
