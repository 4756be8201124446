"""Exact duplicated-span detection and removal (ExactSubstr dedup) — find
every maximal run of ≥ ``min_len`` consecutive normalized tokens that occurs
verbatim more than once in the corpus (across documents or repeated inside
one), and optionally rewrite documents with the non-canonical occurrences
cut out. This is the substring-granularity member of the dedup family
(exact / minhash / simhash / ngram-Jaccard / embedding in
``dedup_suite.py`` + ``similarity.py``): document-level dedup misses the
boilerplate, licence headers, and quoted passages that recur inside
otherwise-unique pages, which is exactly what span dedup removes
(Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better", the ExactSubstr setting). The reference
(free4ages/data-sync-tool) has no counterpart operator.

Published implementations build a corpus-wide suffix array — a
single-machine, RAM-bound design. The Spark-native shape used here reaches
the same answer with data-parallel primitives:

1. one scan tokenizes and windows every position into its ``min_len``-gram,
   shuffling only ``(doc, pos, xxhash64(gram))`` — 8-byte keys, never gram
   text, so shuffle bytes are O(corpus tokens × ~16B) regardless of span
   length (the count and the candidate probe both consume this shuffle;
   AQE reuses the exchange, so the corpus explode physically runs once);
2. a map-side-combined count finds hashes seen ≥ ``min_count`` times —
   duplicated positions are typically a small fraction of the corpus, and
   everything downstream is sized by THEM, not by the corpus;
3. candidate gram TEXT is re-derived once per candidate document (one
   id-join against the staged token arrays, token arrays never duplicated
   per gram) and re-grouped by the actual text, so a 64-bit hash collision
   can only ever cost a false candidate, never a wrong answer — the result
   is exact;
4. adjacent duplicated positions merge into maximal spans with a
   gaps-and-islands pass per document (window state bounded by document
   length, partitioned by doc — no global ordering).

Tokenization matches :func:`operators.corpus.tokenize` (lowercase,
non-[0-9a-z] → space) so span text is engine-reproducible byte-for-byte;
``dedupe_spans`` consequently returns *normalized-token* text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .decontam import _gram_windows, _tokens


def _staged(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    from .dedup_suite import _FANOUT_MIN_BYTES_HEAVY, _ensure_parallelism

    # fan-out before the tokenize+gram explode: the corpus-wide position
    # windowing is the expensive pass and must not run on a 1-2-split read
    return _ensure_parallelism(df, _FANOUT_MIN_BYTES_HEAVY).select(
        F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("_toks")
    )


def _dup_positions(
    staged: DataFrame, min_len: int, min_count: int
) -> DataFrame:
    """(id, pos, gram, canon_id, canon_pos) for every occurrence of every
    exactly-duplicated ``min_len``-gram; canon_* is the corpus-first
    occurrence (min (id, pos)) of that gram."""
    pos_grams = staged.select(
        "id",
        F.posexplode(_gram_windows(F.col("_toks"), min_len, distinct=False)),
    ).select("id", "pos", F.xxhash64("col").alias("_gh"))
    dup_hashes = (
        pos_grams.groupBy("_gh")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("_gh")
    )
    cand = pos_grams.join(dup_hashes, "_gh").select("id", "pos")
    # re-derive gram text for candidates only: ONE row per candidate doc
    # carries the token array, then positions explode back out — the array
    # is never copied per gram
    cand_by_doc = cand.groupBy("id").agg(F.collect_list("pos").alias("_ps"))
    verified_src = (
        cand_by_doc.join(staged, "id")
        .select("id", F.explode("_ps").alias("pos"), "_toks")
        .select(
            "id",
            "pos",
            F.concat_ws(" ", F.slice(F.col("_toks"), F.col("pos") + 1, min_len)).alias(
                "gram"
            ),
        )
    )
    exact = (
        verified_src.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.min(F.struct("id", "pos")).alias("_canon"),
        )
        .filter(F.col("_c") >= min_count)
        .select(
            "gram",
            F.col("_canon.id").alias("canon_id"),
            F.col("_canon.pos").alias("canon_pos"),
        )
    )
    return verified_src.join(exact, "gram").select(
        "id", "pos", "gram", "canon_id", "canon_pos"
    )


def duplicate_spans(
    df: DataFrame,
    min_len: int = 12,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, span_start, span_tokens, span_text): every MAXIMAL duplicated
    token span per document — a run of consecutive positions whose every
    ``min_len``-gram occurs ≥ ``min_count`` times corpus-wide (within- and
    cross-document occurrences both count). ``span_start`` is the 0-based
    token index; ``span_tokens ≥ min_len``; ``span_text`` is the exact
    normalized-token span, re-sliced from the source document."""
    if min_len < 1:
        raise ValueError("require min_len >= 1")
    if min_count < 2:
        raise ValueError("require min_count >= 2")
    staged = _staged(df, text_col, id_col)
    dup = _dup_positions(staged, min_len, min_count).select("id", "pos").dropDuplicates()
    w = Window.partitionBy("id").orderBy("pos")
    spans = (
        dup.withColumn("_isl", F.col("pos") - F.row_number().over(w))
        .groupBy("id", "_isl")
        .agg(F.min("pos").alias("span_start"), F.count(F.lit(1)).alias("_run"))
        .select(
            "id",
            "span_start",
            (F.col("_run") + F.lit(min_len - 1)).alias("span_tokens"),
        )
    )
    # one id-join re-slices span text from the staged arrays (audit column
    # and the proof the distributed merge reproduced real document content)
    by_doc = spans.groupBy("id").agg(
        F.collect_list(F.struct("span_start", "span_tokens")).alias("_sp")
    )
    return (
        by_doc.join(staged, "id")
        .select("id", F.explode("_sp").alias("_s"), "_toks")
        .select(
            "id",
            F.col("_s.span_start").alias("span_start"),
            F.col("_s.span_tokens").alias("span_tokens"),
            F.concat_ws(
                " ",
                F.slice(F.col("_toks"), F.col("_s.span_start") + 1, F.col("_s.span_tokens")),
            ).alias("span_text"),
        )
    )


def dedupe_spans(
    df: DataFrame,
    min_len: int = 12,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rewrite the corpus with duplicated spans removed, keeping the
    corpus-first copy: every token position covered by a duplicated
    ``min_len``-gram whose occurrence is NOT the gram's canonical
    (min (id, pos)) occurrence is dropped; the canonical copy survives in
    place. Documents with nothing to drop pass through with their token
    stream intact. Returns the input columns with ``text`` replaced by the
    NORMALIZED-token rewrite (tokenization is lossy by design — see module
    docstring).

    Policy note: canonicality is per gram, so when distinct duplicated
    spans overlap in one document the union of their non-canonical
    positions is dropped — same granularity Lee et al. apply at byte level.
    """
    staged = _staged(df, text_col, id_col)
    noncanon = _dup_positions(staged, min_len, min_count).filter(
        ~((F.col("id") == F.col("canon_id")) & (F.col("pos") == F.col("canon_pos")))
    )
    covered = (
        noncanon.select(
            "id", F.explode(F.sequence(F.col("pos"), F.col("pos") + min_len - 1)).alias("_tp")
        )
        .groupBy("id")
        .agg(F.collect_set("_tp").alias("_drop"))
    )
    rebuilt = staged.join(covered, "id", "left").select(
        "id",
        F.when(F.col("_drop").isNull(), F.concat_ws(" ", F.col("_toks")))
        .otherwise(
            F.concat_ws(
                " ",
                F.filter(
                    F.col("_toks"),
                    lambda _x, i: ~F.array_contains(F.col("_drop"), i),
                ),
            )
        )
        .alias("_new_text"),
    )
    out_cols = [c for c in df.columns if c != text_col]
    return (
        df.join(rebuilt, F.col(id_col) == rebuilt["id"])
        .select(*out_cols, F.col("_new_text").alias(text_col))
    )
