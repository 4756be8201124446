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
