"""Byte-pair-encoding tokenizer: corpus-scale training and Arrow-batched
encoding. Gives the packing / token-budget operators (``chunking.py``) and
corpus statistics a real subword tokenizer instead of whitespace tokens.
The reference (free4ages/data-sync-tool) has no tokenizer; this follows the
public BPE formulation (Sennrich et al. 2016, word-frequency variant used
by GPT-2's and sentencepiece's trainers).

Scale shape — the part that matters at 100 TB:

- Training never iterates over the corpus. BPE's merge loop only needs the
  DISTINCT-WORD frequency table (Sennrich's key observation): ONE
  map-side-combined ``groupBy(word).count()`` reduces any corpus to a
  bounded table (natural-language vocabulary grows ~O(corpus^0.5),
  Heaps' law), the driver keeps the ``max_words`` most frequent, and the
  merge loop runs driver-side over that bounded dict — identical result to
  scanning the corpus per merge round, at none of the cost.
- Encoding is the legitimate Python case (iterative, data-dependent string
  rewriting that built-in expressions can't express): an Arrow-batched
  pandas UDF with a per-batch word→tokens memo, so each DISTINCT word in a
  batch is encoded once regardless of how often it repeats.

Tokenization of text into words matches :func:`operators.corpus.tokenize`
(lowercase, non-[0-9a-z] → space) so trained merges compose with every
other corpus operator. Words are encoded independently (merges never cross
word boundaries), with no end-of-word marker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .decontam import _tokens


def _merge_word(symbols: list[str], pair: tuple[str, str]) -> list[str]:
    out: list[str] = []
    i, n = 0, len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == pair[0] and symbols[i + 1] == pair[1]:
            out.append(symbols[i] + symbols[i + 1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def train_bpe_on_word_counts(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """The driver-side merge loop: greedy most-frequent-pair merges over a
    word→count dict (deterministic tie-break: higher count, then
    lexicographically smallest pair). Exposed separately so tests can run
    it as the sequential reference."""
    words: list[tuple[list[str], int]] = [(list(w), c) for w, c in word_counts if w]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in words:
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = [(_merge_word(sym, best), c) for sym, c in words]
    return merges


def bpe_train(
    df: DataFrame,
    n_merges: int = 256,
    text_col: str = "text",
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges on a corpus: one distributed word-count
    aggregate, then the driver merge loop over the ``max_words`` most
    frequent distinct words (ordering deterministic: count desc, word asc —
    independent of partitioning)."""
    if n_merges < 0:
        raise ValueError("require n_merges >= 0")
    counts = (
        df.select(F.explode(_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    return train_bpe_on_word_counts([(r["w"], r["c"]) for r in counts], n_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Sequential reference encoder: apply merges in rank order until no
    mergeable pair remains (the GPT-2 ``get_pairs``/``bigram`` loop)."""
    sym = list(word)
    while len(sym) > 1:
        ranked = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(sym, sym[1:]))
            if (a, b) in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        sym = sym[:i] + [sym[i] + sym[i + 1]] + sym[i + 2:]
    return sym


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col: array<string>`` — the BPE token stream of each
    document (words tokenized as in :func:`corpus.tokenize`, each word
    encoded independently by merge rank). Arrow-batched pandas UDF with a
    per-batch distinct-word memo."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _encode(words_col):  # pandas Series of list[str]
        import pandas as pd

        memo: dict[str, list[str]] = {}

        def enc_doc(words):
            out: list[str] = []
            for w in words:
                got = memo.get(w)
                if got is None:
                    got = memo[w] = encode_word(w, ranks)
                out.extend(got)
            return out

        return pd.Series([enc_doc(ws) for ws in words_col])

    staged = df.withColumn("_words", _tokens(F.col(text_col)))
    return staged.withColumn(out_col, _encode(F.col("_words"))).drop("_words")


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_bpe_tokens) per document — the budget signal for sequence
    packing with a real tokenizer."""
    return bpe_encode(df, merges, text_col).select(
        F.col(id_col).alias("id"), F.size("bpe_tokens").alias("n_bpe_tokens")
    )
