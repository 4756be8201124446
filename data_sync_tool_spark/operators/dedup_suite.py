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
- ngram_jaccard  : exact Jaccard over shingle sets with geometric size-band
                   blocking — recall 1.0 at any threshold (qualifying pairs
                   always co-block), at the cost of large blocks on
                   size-homogeneous corpora.
- embedding near-dup: see ``similarity.py`` (cosine over LSH buckets).

Determinism: every hash seed derives from literal ints; no RNG state.
All pair outputs are canonicalized (a < b) and deduped.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint


# Fan-out break-even input sizes (see _ensure_parallelism). A map pass only
# deserves its own exchange when the serialized single-core work would exceed
# the extra stage's fixed latency several-fold. Per-byte cost varies ~30x
# between a plain projection (md5/substr: tens of MB/s/core) and a shingle or
# gram explode (one output row per input CHARACTER: ~1 MB/s/core), so the
# gate is per-callsite: cheap-per-byte ops break even around a few MB of
# parquet, heavy ones around ~100 KB.
_FANOUT_MIN_BYTES = 4 << 20
_FANOUT_MIN_BYTES_HEAVY = 128 << 10


def _ensure_parallelism(df: DataFrame, min_bytes: int = _FANOUT_MIN_BYTES) -> DataFrame:
    """Small inputs arrive as one or two parquet splits; the shingle/hash
    passes then run on one core. Fan the rows out to the session's default
    parallelism BEFORE the expensive per-row work (a tiny shuffle of raw
    text). A 100 TB input already has thousands of splits — this is a no-op
    there. Sizing uses ``inputFiles()`` (pure metadata) instead of
    ``df.rdd.getNumPartitions()``, which forces a plan→RDD conversion.

    ``min_bytes`` gates the fan-out by input size: below it the exchange is
    pure overhead (the whole map pass costs less than the extra stage's
    fixed latency — see the break-even notes above). Unsizable inputs
    (non-file sources) keep the fan-out; the gate is an optimization, not a
    correctness rule."""
    target = df.sparkSession.sparkContext.defaultParallelism
    files = df.inputFiles()
    if files and len(files) >= target:
        return df
    if files:
        import os
        from urllib.parse import urlparse

        try:
            total = sum(
                os.path.getsize(urlparse(f).path or f) for f in files
            )
            if total < min_bytes:
                return df
        except OSError:  # non-local filesystem: size unknown, keep fanning
            pass
    return df.repartition(target)


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


def _jaccard(a: str, b: str) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = (F.size(a) + F.size(b)).cast("double") - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


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


def exploded_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """(id, s) — one row per character k-shingle position.

    Deliberately NOT an array<string> column: building per-doc shingle arrays
    with ``transform(sequence(...), i -> substring(...))`` measured ~25x
    slower than exploding the index sequence and substring-ing per row (array
    construction of hundreds of small strings per row defeats codegen).
    Downstream per-doc sets are rebuilt with ``collect_set`` AFTER hashing the
    shingle to int64 — longs, not strings, cross the shuffle."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    base = _ensure_parallelism(df, _FANOUT_MIN_BYTES_HEAVY).select(
        F.col(id_col).alias("id"), norm.alias("_nt")
    )
    idx = F.sequence(F.lit(1), F.greatest(F.lit(1), F.length("_nt") - F.lit(k - 1)))
    return base.select("id", "_nt", F.explode(idx).alias("_i")).select(
        "id", F.expr(f"substring(_nt, _i, {k})").alias("s")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    shingle_k: int = 5,
    hash_mode: str = "xxhash64",
    with_shingles: bool = True,
) -> DataFrame:
    """(id, sig: array<long>, sh: array<string>) — minhash per doc as
    explode → per-id min aggregate: one shingle pass, one partial-aggregated
    shuffle, no giant per-row expression tree.

    (Deliberately NOT expressed as N sibling ``transform``/``array_min``
    lambdas over an inlined shingle lambda — Catalyst's projection collapse
    miscompiles that shape: nested named-lambda variables collide after
    inlining. Exploding is also the better plan at scale: the hash scans
    pipeline inside one stage and every aggregate is map-side combined.)

    ``with_shingles`` adds ``sh: array<long>`` — the doc's DISTINCT shingle
    set as int64 xxhash64 values (for exact-Jaccard verification), built in
    the SAME aggregation pass."""
    ex = exploded_shingles(df, text_col, id_col, shingle_k)
    aggs = [
        F.min(_seeded_hash(seed, F.col("s"), hash_mode)).alias(f"_mh{seed}")
        for seed in range(n_hashes)
    ]
    if with_shingles:
        aggs.append(F.collect_set(F.xxhash64("s")).alias("sh"))
    g = ex.groupBy("id").agg(*aggs)
    return g.select(
        "id",
        F.array(*[F.col(f"_mh{seed}") for seed in range(n_hashes)]).alias("sig"),
        *(["sh"] if with_shingles else []),
    )


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

    No corpus-sized ``persist()`` anywhere: caching signatures + shingle
    sets of a 100 TB input is the anti-pattern (they are ~corpus-sized).
    The banding pass aggregates ONLY what banding needs (minhashes + set
    size, no shingle arrays); the verify pass re-shingles JUST the
    candidate-pair participants (a semi-join against the materialized
    candidate ids — at near-dup thresholds candidates ≪ corpus, and at
    loose thresholds the pass degrades to the former full re-shingle,
    never worse). The candidate pair table itself (bounded by the pair
    count, slim ids) is materialized once so the banding pipeline does not
    re-execute for each of the two re-attach joins.
    """
    # the band self-join carries ONLY (id, set-size, band, band-hash) — the
    # full shingle arrays must not ride the ×bands explode nor both shuffle
    # sides; they are re-attached once per side AFTER candidate dedup
    banded = _banded_minhash(df, text_col, id_col, n_hashes, bands, shingle_k)
    left = banded.select(F.col("id").alias("a"), F.col("n").alias("na"), "band", "bh")
    right = banded.select(F.col("id").alias("b"), F.col("n").alias("nb"), "band", "bh")
    cands = (
        left.join(right, ["band", "bh"])
        .filter(F.col("a") < F.col("b"))
        # size-ratio prefilter: J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so pairs
        # whose set sizes disagree too much cannot clear the threshold —
        # pruned BEFORE pair dedup and the expensive intersect
        .filter(F.least("na", "nb") >= F.lit(threshold) * F.greatest("na", "nb"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
        .localCheckpoint()
    )
    ids = (
        cands.select(F.col("a").alias("id"))
        .unionByName(cands.select(F.col("b").alias("id")))
        .dropDuplicates()
    )
    participants = df.join(
        ids.withColumnRenamed("id", id_col), id_col, "left_semi"
    )
    sets = (
        exploded_shingles(participants, text_col, id_col, shingle_k)
        .groupBy("id")
        .agg(F.collect_set(F.xxhash64("s")).alias("sh"))
    )
    pairs = (
        cands.join(sets.select(F.col("id").alias("a"), F.col("sh").alias("sh_a")), "a")
        .join(sets.select(F.col("id").alias("b"), F.col("sh").alias("sh_b")), "b")
    )
    out = pairs.withColumn("jaccard", F.round(_jaccard("sh_a", "sh_b"), 6)).filter(
        F.col("jaccard") >= threshold
    ).select("a", "b", "jaccard")
    return out


def _banded_minhash(
    df: DataFrame, text_col: str, id_col: str,
    n_hashes: int, bands: int, shingle_k: int,
) -> DataFrame:
    """``banded`` = (id, n, band, bh) slim band rows for the batch path —
    the one aggregation pass here deliberately does NOT collect the shingle
    sets (the batch verify re-shingles candidate participants only, so the
    set arrays never cross this shuffle). Deterministic — identical inputs
    produce identical bands regardless of which path computes them."""
    ex = exploded_shingles(df, text_col, id_col, shingle_k)
    # ONE partially-aggregated shuffle: min() is duplicate-invariant, so the
    # seeded mins run over raw occurrences map-side (the former
    # dropDuplicates pre-pass shuffled every raw shingle STRING first — a
    # full extra exchange, measured ~1.5x this stage); ``n`` is the distinct
    # HASHED-shingle count — exactly the set cardinality the jaccard verify
    # uses (``sh`` is collect_set(xxhash64(s))), so the size-ratio prefilter
    # bound stays consistent with the verified jaccard.
    sig = ex.groupBy("id").agg(
        *[
            F.min(_seeded_hash(seed, F.col("s"), "xxhash64")).alias(f"_mh{seed}")
            for seed in range(n_hashes)
        ],
        F.size(F.collect_set(F.xxhash64("s"))).alias("n"),
    )
    return _bands_of(sig, n_hashes, bands)


def _combined_minhash(
    df: DataFrame, text_col: str, id_col: str, n_hashes: int, shingle_k: int,
) -> DataFrame:
    """(id, _mh0.._mhN, sh, n) in ONE shingle pass + ONE aggregation — the
    index/incremental building block where both the band signatures AND the
    exact shingle sets are needed (computing them as two aggregations runs
    the whole shingle explode twice)."""
    ex = exploded_shingles(df, text_col, id_col, shingle_k)
    return ex.groupBy("id").agg(
        *[
            F.min(_seeded_hash(seed, F.col("s"), "xxhash64")).alias(f"_mh{seed}")
            for seed in range(n_hashes)
        ],
        F.collect_set(F.xxhash64("s")).alias("sh"),
    ).withColumn("n", F.size("sh"))


def _bands_of(sig: DataFrame, n_hashes: int, bands: int) -> DataFrame:
    """(id, n, band, bh) from a signature frame carrying _mh0.._mhN and n.
    Same band-hash composition on every path (batch, index build, new-batch
    incremental), which is what keeps their candidate sets identical."""
    rows_per_band = n_hashes // bands
    return sig.select(
        "id", "n",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.col(f"_mh{i}") for i in range(b * rows_per_band,
                                                                 (b + 1) * rows_per_band)])
                    for b in range(bands)
                ]
            )
        ).alias("band", "bh"),
    )


def minhash_index_write(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
) -> None:
    """Persist the corpus side of the minhash-LSH pipeline so NEW batches
    dedupe against a 100-TB corpus WITHOUT rescanning its text: a new crawl
    joins the stored band index (candidates) and the stored shingle sets
    (exact-Jaccard verify) — cost O(new batch + candidates), not O(corpus).

    Layout: ``{path}/bands`` = (id, n, band, bh) bucketed into band files;
    ``{path}/sets`` = (id, sh) plus the minhash signature columns (readers
    column-prune what they don't need). ``{path}/meta`` records the hash
    parameters — an incremental query MUST use the same ones (enforced on
    read).

    Build cost is ONE pass over the corpus text: the combined aggregate
    (signatures + shingle sets) lands in ``sets``, and ``bands`` derives
    from the STORED signature columns — the former two-aggregation shape
    ran the full shingle explode twice (once per output)."""
    comb = _combined_minhash(df, text_col, id_col, n_hashes, shingle_k)
    comb.write.mode("overwrite").parquet(f"{path}/sets")
    spark = df.sparkSession
    stored = spark.read.parquet(f"{path}/sets").drop("sh")
    _bands_of(stored, n_hashes, bands).repartition(
        F.col("band"), F.col("bh")
    ).write.mode("overwrite").parquet(f"{path}/bands")
    meta = spark.createDataFrame(
        [(n_hashes, bands, shingle_k)], "n_hashes int, bands int, shingle_k int"
    )
    meta.write.mode("overwrite").parquet(f"{path}/meta")


def minhash_lsh_pairs_incremental(
    new_docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """(corpus_id, new_id, jaccard) near-duplicates of ``new_docs`` against a
    PERSISTED corpus index — the incremental dedup path for ingest pipelines
    (dedupe each new crawl against everything already kept). Hash parameters
    come from the index's meta, so bands are computed identically to the
    batch path: the result equals the cross-pair subset of
    ``minhash_lsh_pairs(corpus ∪ new)`` exactly (pytest-asserted)."""
    spark = new_docs.sparkSession
    meta = spark.read.parquet(f"{index_path}/meta").first()
    # one shingle pass over the new batch, materialized once (batch-sized —
    # the ingest-crawl contract): both the band join and the verify join
    # consume it, where the former shape re-ran the explode+agg per side
    comb_new = _combined_minhash(
        new_docs, text_col, id_col, meta["n_hashes"], meta["shingle_k"]
    ).localCheckpoint()
    banded_new = _bands_of(comb_new, meta["n_hashes"], meta["bands"])
    sets_new = comb_new.select("id", "sh")
    corpus_bands = spark.read.parquet(f"{index_path}/bands")
    corpus_sets = spark.read.parquet(f"{index_path}/sets")
    cands = (
        corpus_bands.select(F.col("id").alias("a"), F.col("n").alias("na"), "band", "bh")
        .join(
            banded_new.select(F.col("id").alias("b"), F.col("n").alias("nb"),
                              "band", "bh"),
            ["band", "bh"],
        )
        .filter(F.col("a") != F.col("b"))
        .filter(F.least("na", "nb") >= F.lit(threshold) * F.greatest("na", "nb"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    pairs = (
        cands.join(corpus_sets.select(F.col("id").alias("a"), F.col("sh").alias("sh_a")), "a")
        .join(sets_new.select(F.col("id").alias("b"), F.col("sh").alias("sh_b")), "b")
    )
    return pairs.withColumn("jaccard", F.round(_jaccard("sh_a", "sh_b"), 6)).filter(
        F.col("jaccard") >= threshold
    ).select(F.col("a").alias("corpus_id"), F.col("b").alias("new_id"), "jaccard")


# ----------------------------------------------------------------- simhash
def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              shingle_k: int = 4) -> DataFrame:
    """(id, simhash:long) — per-bit majority vote over the doc's distinct
    shingle hashes, as 64 JVM ``sum`` aggregates in ONE pass (each map-side
    combined). No Python/pandas anywhere: the bit-unpack is shift/and
    arithmetic, which codegen handles better than an Arrow round-trip."""
    # hash BEFORE the distinct: the dedup shuffle then carries 8-byte longs
    # instead of raw shingle strings (same distinct set absent xxhash64
    # collisions — the suite's standing assumption; votes consume only the
    # hash anyway)
    h = (
        exploded_shingles(df, text_col, id_col, shingle_k)
        .select("id", F.xxhash64("s").alias("h"))
        .dropDuplicates(["id", "h"])
    )
    votes = h.groupBy("id").agg(
        *[
            F.sum(
                F.shiftrightunsigned("h", b).bitwiseAND(F.lit(1)) * F.lit(2) - F.lit(1)
            ).alias(f"v{b}")
            for b in range(64)
        ]
    )
    bit_terms = [
        F.when(F.col(f"v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
            F.lit(0).cast("long")
        )
        for b in range(64)
    ]
    sim = bit_terms[0]
    for t in bit_terms[1:]:
        sim = sim.bitwiseOR(t)
    return votes.select("id", sim.alias("simhash"))


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
    # materialize the (tiny: id + 64-bit hash) signature table once — the
    # chunk self-join would otherwise execute the whole shingle+vote
    # pipeline on BOTH sides
    sims = simhash64(df, text_col, id_col, shingle_k).localCheckpoint()
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
) -> DataFrame:
    """Exact Jaccard with GEOMETRIC size-band blocking — recall 1.0 at any
    threshold by construction. Returns (a, b, jaccard) with jaccard ≥ t.

    Why geometric: Jaccard ≥ t bounds the shingle-set size *ratio*
    (min(|A|,|B|)/max(|A|,|B|) ≥ J), not the absolute size difference, so
    fixed-width length bands lose long near-duplicates (10,000 vs 10,100
    chars is J≈0.98 yet several 32-char bands apart). Banding on
    ``floor(ln|S| / ln(1/t))`` makes any qualifying pair differ by at most
    one band id (|ln n_a − ln n_b| ≤ ln(1/t)); exploding each doc into its
    band and the next one therefore co-blocks every pair with J ≥ t.

    Scale caveat (inherent to exact-recall blocking): every similar-sized
    doc pair is a candidate, so the block join degrades toward quadratic on
    size-homogeneous corpora. That is the price of guaranteed recall — use
    ``minhash_lsh_pairs`` (same exact-Jaccard verify, probabilistic recall)
    as the 100-TB path and keep this as the exact oracle / verifier."""
    if not 0 < threshold <= 1:
        raise ValueError("threshold must be in (0, 1]")
    import math

    import numpy as np
    import pandas as pd

    w = max(math.log(1.0 / threshold), 1e-9)  # t→1 degrades to size-equality bands
    ex = exploded_shingles(df, text_col, id_col, shingle_k)
    base = ex.groupBy("id").agg(F.collect_set(F.xxhash64("s")).alias("sh"))
    sized = base.select("id", "sh", F.size("sh").alias("n"))
    band = F.floor(F.log(F.col("n").cast("double")) / F.lit(w))
    blocked = sized.select(
        "id", "sh", "n", F.explode(F.array(band, band + 1)).alias("blk")
    )
    id_type = df.schema[id_col].dataType.simpleString()

    # One numpy kernel per block replaces the former (id, n) block self-join
    # + TWO shingle-array re-attach joins + per-pair JVM array_intersect: the
    # qualifying pair count is quadratic in block size, so attaching a ~3 KB
    # hash array to each side of every candidate row shuffled ~100× the bytes
    # of shipping each doc's array once per block (guide §2.3/§8 — decide on
    # proxies, move heavy bytes once). Same candidate universe (within-block
    # pairs passing the size-ratio prefilter), same exact jaccard arithmetic
    # (integer intersection/union, double divide, round-6).
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        ns = pdf["n"].to_numpy()
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({"a": np.array([], dtype=ids.dtype),
                                 "b": np.array([], dtype=ids.dtype),
                                 "jaccard": np.array([], dtype=np.float64)})
        arrs = [np.sort(np.asarray(a, dtype=np.int64)) for a in pdf["sh"]]
        out_a, out_b, out_j = [], [], []
        step = max(1, 8_000_000 // m)  # bound the chunked candidate mask
        for i0 in range(0, m, step):
            blk = slice(i0, min(i0 + step, m))
            lo = np.minimum(ns[blk, None], ns[None, :]).astype(np.float64)
            hi = np.maximum(ns[blk, None], ns[None, :]).astype(np.float64)
            cand = (ids[blk, None] < ids[None, :]) & (lo >= threshold * hi)
            ii, jj = np.nonzero(cand)
            from ..functions.numeric import round6_half_up

            raw = []
            pij = []
            for i, j in zip((ii + i0).tolist(), jj.tolist()):
                inter = np.intersect1d(arrs[i], arrs[j], assume_unique=True).size
                union = int(ns[i]) + int(ns[j]) - inter
                raw.append(inter / union if union > 0 else 0.0)
                pij.append((i, j))
            if raw:
                jr = round6_half_up(np.asarray(raw))
                keep = jr >= threshold
                for t, (i, j) in enumerate(pij):
                    if keep[t]:
                        out_a.append(ids[i])
                        out_b.append(ids[j])
                        out_j.append(jr[t])
        return pd.DataFrame({"a": np.asarray(out_a, dtype=ids.dtype),
                             "b": np.asarray(out_b, dtype=ids.dtype),
                             "jaccard": np.asarray(out_j, dtype=np.float64)})

    pairs = blocked.groupBy("blk").applyInPandas(
        kernel, f"a {id_type}, b {id_type}, jaccard double"
    )
    # a pair sharing both its blocks scores identically in each — dedup last
    return pairs.dropDuplicates(["a", "b"])
