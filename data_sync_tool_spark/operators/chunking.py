"""Document chunking — the embedding-pipeline pre-step: split each document
into fixed-size overlapping character windows.

Pure built-in expressions (``sequence`` → ``explode`` → ``substring``): the
whole operator pipelines inside one whole-stage-codegen span, no Python, no
shuffle — at 100 TB it is exactly as parallel as the input scan. Character
windows (not model tokens) by design: tokenizers are model-specific, and a
char budget with overlap is the standard storage-side approximation; feed
the chunks to a model-specific tokenizer downstream if exact token counts
are needed.

Chunk layout: chunk ``i`` covers ``[i*stride, i*stride + chunk_chars)`` with
``stride = chunk_chars - overlap``; a doc of length ≤ ``chunk_chars`` is one
chunk; the final chunk may be short but always reaches the end of the text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_chars) — one row per window."""
    if not 0 <= overlap < chunk_chars:
        raise ValueError("require 0 <= overlap < chunk_chars")
    stride = chunk_chars - overlap
    ln = F.length(F.col(text_col))
    n_chunks = (
        F.when(ln <= chunk_chars, F.lit(1))
        .otherwise(F.ceil((ln - F.lit(chunk_chars)) / F.lit(float(stride))).cast("int") + 1)
    )
    exploded = df.select(
        F.col(id_col),
        F.col(text_col).alias("_t"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    chunk = F.expr(f"substring(_t, chunk_idx * {stride} + 1, {chunk_chars})")
    return exploded.select(
        id_col,
        "chunk_idx",
        chunk.alias("chunk_text"),
        F.length(chunk).alias("n_chars"),
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: int | None = None,
) -> DataFrame:
    """GPT-style concat-and-chunk packing layout: documents are laid out
    contiguously in ``id_col`` order and cut into fixed ``budget``-token
    training sequences. Returns one row per document:
    ``(id, n_tokens, tok_start, seq_id, crosses_boundary)`` where
    ``tok_start`` is the doc's offset in the global token stream, ``seq_id``
    = the sequence containing its first token, and ``crosses_boundary``
    (0/1) marks docs split across two or more sequences. Token counts use
    the corpus tokenization (lowercase, non-alnum → space).

    Scale shape — a distributed prefix sum, NOT a single-partition window:
    range-partition by id, per-partition token totals (one tiny O(partitions)
    collect) become driver-computed partition offsets, and the running sum
    inside each partition is a window over that partition only. No stage
    touches more than one partition's rows; the offsets join broadcasts.
    Within one invocation the range exchange is computed once and its
    shuffle files are reused by both the totals job and the final plan, so
    partition ids are consistent; the OUTPUT is a pure function of
    (id order, token counts) regardless of partitioning.

    The result is deterministic packing metadata a writer can use to emit
    shards without re-scanning text (pair with ``chunk_documents`` for the
    chunk text itself).
    """
    if budget < 1:
        raise ValueError("require budget >= 1")
    from pyspark.sql import Window

    from .decontam import _tokens

    from .dedup_suite import _ensure_parallelism

    spark = df.sparkSession
    n_parts = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    staged = _ensure_parallelism(df).select(
        F.col(id_col), F.size(_tokens(F.col(text_col))).cast("long").alias("n_tokens")
    )
    ranged = staged.repartitionByRange(n_parts, F.col(id_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    totals = {
        r["_pid"]: r["tot"]
        for r in ranged.groupBy("_pid").agg(F.sum("n_tokens").alias("tot")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()] or [(0, 0)],
        "_pid int, _off long",
    )
    w = Window.partitionBy("_pid").orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    out = (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn("tok_start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + F.col("_off"))
        .withColumn("seq_id", F.expr(f"tok_start div {budget}"))
        .withColumn(
            "crosses_boundary",
            (
                F.expr(f"(tok_start + greatest(n_tokens, 1) - 1) div {budget}")
                > F.col("seq_id")
            ).cast("int"),
        )
    )
    return out.select(id_col, "n_tokens", "tok_start", "seq_id", "crosses_boundary")


def packed_sequence_text(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = " ",
    n_partitions: int | None = None,
) -> DataFrame:
    """Materialized concat-and-chunk training sequences: the corpus token
    stream (docs in ``id_col`` order, docs split mid-stream where a budget
    boundary lands) cut into exactly-``budget``-token sequences. Returns
    ``(seq_id, n_tokens, seq_text)`` — every sequence full except the last.

    Scale shape: token positions come from :func:`pack_sequences` doc
    offsets (a distributed prefix sum) plus ``posexplode`` within the doc —
    NO global window over the token stream. The per-sequence assembly
    groups ≤``budget`` tokens and orders them with one in-group
    ``sort_array(collect_list(struct))`` (bounded state: budget tokens per
    group). One corpus scan for offsets, one for tokens; the offsets join
    is by id (broadcast-eligible when doc count ≪ corpus bytes).
    """
    from .decontam import _tokens

    from .dedup_suite import _ensure_parallelism

    layout = pack_sequences(df, budget, text_col, id_col, n_partitions).select(
        id_col, "tok_start"
    )
    toks = (
        _ensure_parallelism(df)
        .select(F.col(id_col), F.posexplode(_tokens(F.col(text_col))))
        .select(id_col, F.col("pos"), F.col("col").alias("token"))
    )
    placed = toks.join(layout, id_col).select(
        (F.col("tok_start") + F.col("pos")).alias("gpos"), "token"
    )
    grouped = placed.groupBy(F.expr(f"gpos div {budget}").alias("seq_id")).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sort_array(F.collect_list(F.struct(F.col("gpos"), F.col("token")))).alias("_o"),
    )
    return grouped.select(
        "seq_id",
        "n_tokens",
        F.array_join(F.transform(F.col("_o"), lambda s: s["token"]), sep).alias("seq_text"),
    )
