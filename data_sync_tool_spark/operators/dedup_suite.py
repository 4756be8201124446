"""Deduplication suite for large-scale training-data pipelines.

Five near/exact-duplicate strategies over a document table, all expressed as
DataFrame plans (shuffle-conscious; no per-row Python except where matrix
math genuinely wants numpy, and then it's Arrow-batched):

- exact          : md5 fingerprint groupBy — one hash aggregate.
- minhash_lsh    : char-shingles → H minhashes → B bands → bucket join →
                   exact-Jaccard verification of candidates only. The
                   classic sub-quadratic near-dup pipeline; the self-join is
                   on band buckets (tiny groups), never all-pairs.
- simhash        : 64-bit sign-of-weighted-bit-sums per doc (numpy over Arrow
                   batches), banded into 4×16-bit chunks — Hamming-≤k
                   candidates via chunk-equality buckets (pigeonhole), then
                   exact Hamming verify.
- ngram_jaccard  : exact Jaccard over shingle sets for candidate pairs from
                   cheap blocking (length bucket), for when recall must be 1.0
                   within a block.
- embedding near-dup: see ``similarity.py`` (cosine over LSH buckets).

Determinism: every hash seed derives from literal ints; no RNG state.
All pair outputs are canonicalized (a < b) and deduped.
"""

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, shingles


# ------------------------------------------------------------------ exact
def exact_duplicate_groups(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """(doc_id, canonical_id, fp) for every doc in a group of size > 1;
    canonical = min id. One hash aggregate + one broadcast-friendly join."""
    with_fp = df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    groups = (
        with_fp.groupBy("fp")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    return (
        with_fp.join(groups, "fp")
        .select(id_col, "canonical_id", "fp")
    )


def exact_dedupe(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative of every fingerprint group."""
    w = df.withColumn("fp", fingerprint(F.col(text_col)))
    keep = w.groupBy("fp").agg(F.min(id_col).alias(id_col))
    return df.join(keep, id_col, "left_semi")


# ----------------------------------------------------------------- minhash
def _seeded_hash(seed: int, s: Column, hash_mode: str) -> Column:
    """``hash_mode``: ``xxhash64`` (fast JVM default) or ``md5`` (int32 md5
    prefix of ``str(seed)||shingle`` — byte-reproducible in any SQL engine,
    used by the DuckDB oracle queries)."""
    if hash_mode == "xxhash64":
        return F.xxhash64(F.lit(seed), s)
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(str(seed)), s)), 1, 8), 16, 10
    ).cast("long")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    shingle_k: int = 5,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(id, sig: array<long>, sh: array<string>) — minhash per doc as
    explode → per-id min aggregate: one shingle pass, one partial-aggregated
    shuffle, no giant per-row expression tree.

    (Deliberately NOT expressed as N sibling ``transform``/``array_min``
    lambdas over an inlined shingle lambda — Catalyst's projection collapse
    miscompiles that shape: nested named-lambda variables collide after
    inlining. Exploding is also the better plan at scale: the hash scans
    pipeline inside one stage and the min is map-side combined.)"""
    shingled = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_k).alias("sh")
    )
    exploded = shingled.select("id", F.explode("sh").alias("s"))
    mins = exploded.groupBy("id").agg(
        *[
            F.min(_seeded_hash(seed, F.col("s"), hash_mode)).alias(f"_mh{seed}")
            for seed in range(n_hashes)
        ]
    )
    sig = mins.select(
        "id", F.array(*[F.col(f"_mh{seed}") for seed in range(n_hashes)]).alias("sig")
    )
    return sig.join(shingled, "id")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate generation by band-bucket join, then exact shingle-Jaccard
    verification. Returns (a, b, jaccard) with a < b, jaccard ≥ threshold.

    Scale shape: explode(bands) multiplies rows ×B (cheap); the self-join is
    an equi-join on (band, band_hash) — hot buckets (boilerplate docs) are
    the skew risk, handled by AQE skew-join; the exact verify only touches
    candidate pairs.
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k).select(
        "id", "sig", F.array_distinct("sh").alias("sh")
    )
    banded = sig.select(
        "id", "sh",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.col("sig")[i] for i in range(b * rows_per_band,
                                                                (b + 1) * rows_per_band)])
                    for b in range(bands)
                ]
            )
        ).alias("band", "bh"),
    )
    left = banded.select(F.col("id").alias("a"), F.col("sh").alias("sh_a"), "band", "bh")
    right = banded.select(F.col("id").alias("b"), F.col("sh").alias("sh_b"), "band", "bh")
    cands = (
        left.join(right, ["band", "bh"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sh_a", "sh_b")
        .dropDuplicates(["a", "b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        cands.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ----------------------------------------------------------------- simhash
def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              shingle_k: int = 4) -> DataFrame:
    """(id, simhash:long) — sign of per-bit weighted sums over shingle
    hashes. numpy over Arrow batches (the 64-bit-unpack inner loop is what
    pandas_udf exists for); everything before/after stays JVM-side."""
    from pyspark.sql import types as T

    hashed = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.array_distinct(shingles(F.col(text_col), shingle_k)),
            lambda s: F.xxhash64(s),
        ).alias("hs"),
    )

    @F.pandas_udf(T.LongType())
    def _sim(hs: pd.Series) -> pd.Series:
        out = np.empty(len(hs), dtype=np.int64)
        for i, arr in enumerate(hs):
            if arr is None or len(arr) == 0:
                out[i] = 0
                continue
            a = np.asarray(arr, dtype=np.uint64)
            bits = ((a[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
            votes = bits.sum(axis=0) * 2 - len(a)  # +1/-1 per shingle per bit
            out[i] = np.int64(
                np.bitwise_or.reduce((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64))
                .astype(np.int64)
            )
        return pd.Series(out)

    return hashed.select("id", _sim("hs").alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    shingle_k: int = 4,
) -> DataFrame:
    """(a, b, hamming) with hamming ≤ max_hamming. Pigeonhole banding: with 4
    16-bit chunks, any pair within Hamming 3 shares ≥1 exact chunk — join on
    (chunk_idx, chunk_value), verify exact popcount on candidates."""
    sims = simhash64(df, text_col, id_col, shingle_k)
    chunks = sims.select(
        "id", "simhash",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("simhash"), 16 * c).bitwiseAND(F.lit(0xFFFF))
                for c in range(4)
            ])
        ).alias("chunk", "cv"),
    )
    l = chunks.select(F.col("id").alias("a"), F.col("simhash").alias("sa"), "chunk", "cv")
    r = chunks.select(F.col("id").alias("b"), F.col("simhash").alias("sb"), "chunk", "cv")
    cands = (
        l.join(r, ["chunk", "cv"]).filter(F.col("a") < F.col("b"))
        .select("a", "b", "sa", "sb").dropDuplicates(["a", "b"])
    )
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


# ----------------------------------------------------------- ngram jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.5,
    length_band: int = 32,
) -> DataFrame:
    """Exact Jaccard within length-bucket blocks: two docs with Jaccard ≥ t
    have similar lengths, so blocking on floor(len/band) (+neighbor) keeps
    recall while bounding the join. Returns (a, b, jaccard)."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(F.col(text_col), shingle_k)).alias("sh"),
        F.floor(F.length(F.trim(F.col(text_col))) / length_band).alias("lb"),
    )
    # each doc lands in its own block and the previous one → neighbor pairs meet
    blocked = base.select(
        "id", "sh", F.explode(F.array(F.col("lb"), F.col("lb") + 1)).alias("blk")
    )
    l = blocked.select(F.col("id").alias("a"), F.col("sh").alias("sh_a"), "blk")
    r = blocked.select(F.col("id").alias("b"), F.col("sh").alias("sh_b"), "blk")
    cands = (
        l.join(r, "blk").filter(F.col("a") < F.col("b"))
        .select("a", "b", "sh_a", "sh_b").dropDuplicates(["a", "b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        cands.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
