"""Similarity search over ``array<float>`` embedding columns.

- ``brute_force_topk`` : exact cosine top-k — JVM higher-order-function dot
  products, per-query top-k via window. The correctness baseline.
- ``lsh_topk``         : sign-random-projection LSH — deterministic
  hyperplanes from a seeded hash, bucket join on bit-prefix, exact re-rank
  inside buckets. The scale path: candidate count ~ corpus/2^bits per probe.
- ``ivf_topk``         : IVF-flat — deterministic centroid sample, vectors
  assigned to nearest centroid (numpy over Arrow batches), queries probe the
  ``n_probe`` nearest centroid lists only.
- ``embedding_near_dup_pairs`` : near-duplicate detection at threshold via
  the LSH buckets (the embedding-cosine entry of the dedup suite).

At 100 TB the corpus side is bucketed once and reused across query batches;
all three paths avoid a full cross-join except the deliberately-exact
baseline, whose cross join is partition-parallel (corpus × query-broadcast).
"""

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine, cosine_prenormed, norm


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cos) exact top-k per query (self-match
    excluded). Query side is broadcast: each corpus partition scores its own
    rows — no shuffle until the (tiny) per-query top-k reduction. Norms are
    attached per side BEFORE the cross join, so each of the |C|×|Q| scored
    pairs pays one HOF aggregate (the dot), not three."""
    from .dedup_suite import _FANOUT_MIN_BYTES_HEAVY, _ensure_parallelism

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    c = _ensure_parallelism(corpus, _FANOUT_MIN_BYTES_HEAVY).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id", "neighbor_id",
        F.round(cosine_prenormed(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


_SRP_WEIGHT_CACHE: dict[tuple[int, int, int], list[list[float]]] = {}


def _srp_weights(spark, n_bits: int, dim: int, seed: int) -> list[list[float]]:
    """Materialize the deterministic hyperplane weights
    h[b][d] = (pmod(xxhash64(seed,b,d), 2000001) − 10^6)/10^6 ∈ [−1, 1)
    ONCE, with a single tiny Spark job over n_bits×dim rows — the per-ROW
    recompute this replaces cost n_bits×dim hash calls per input vector
    (≈6k/row at dim 768). Evaluating the identical JVM expression keeps the
    weights (and therefore every bucket id) bit-identical to the inline form."""
    key = (n_bits, dim, seed)
    if key not in _SRP_WEIGHT_CACHE:
        b = (F.col("id") / F.lit(dim)).cast("int")
        d = F.pmod(F.col("id"), F.lit(dim)).cast("int")
        w = (
            F.pmod(F.xxhash64(F.lit(seed), b, d), F.lit(2_000_001)) - F.lit(1_000_000)
        ) / F.lit(1_000_000.0)
        rows = spark.range(n_bits * dim).select(F.col("id"), w.alias("w")).collect()
        flat = [r["w"] for r in sorted(rows, key=lambda r: r["id"])]
        _SRP_WEIGHT_CACHE[key] = [flat[i * dim:(i + 1) * dim] for i in range(n_bits)]
    return _SRP_WEIGHT_CACHE[key]


def _srp_bits(spark, vec_col: str, n_bits: int, dim: int, seed: int) -> F.Column:
    """Sign-random-projection bucket id: deterministic pseudo-random
    hyperplanes embedded as LITERAL weight arrays (precomputed once by
    ``_srp_weights``); per row only the dot products remain. The zip_with +
    left-fold aggregate structure is unchanged, so results are bit-identical
    to the previous per-row-hash form."""
    if n_bits == 0:
        # degenerate single-bucket configuration: every vector shares bucket
        # 0, so candidates = all pairs — the exhaustive (exact, brute-force-
        # equivalent) setting used by the oracle-checked contract query
        return F.lit(0).cast("long")
    v = F.col(vec_col)
    weights = _srp_weights(spark, n_bits, dim, seed)
    bits = []
    for b in range(n_bits):
        plane = F.array(*[F.lit(w) for w in weights[b]])
        dot = F.aggregate(
            F.zip_with(v, plane, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(1 << b))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    n_tables: int = 2,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = same SRP bucket in ANY of ``n_tables``
    tables; exact cosine re-rank inside candidates. ``n_bits=0`` is the
    exhaustive configuration (single bucket → all pairs → exactly brute
    force — the oracle-checkable setting).

    Scale shape: the bucket self-join carries ONLY (id, tbl, bucket) — the
    embedding vectors must not ride the ×n_tables explode nor either shuffle
    side (at dim 768 that serializes each vector n_tables× and shuffles it
    twice before pair dedup); they are re-attached once per side AFTER the
    candidate pairs are deduped — the same slimming as
    ``dedup_suite.minhash_lsh_pairs``. Pass ``dim`` (embedding width) to
    skip the one-row probe job that otherwise infers it."""
    if dim is None and n_bits > 0:
        dim = len(corpus.select(vec_col).first()[0])

    def bucketed_ids(df: DataFrame, ident: str) -> DataFrame:
        # bucket ids are computed from the vector in the projection, but the
        # vector column is dropped before the explode output
        return df.select(
            F.col(id_col).alias(ident),
            F.posexplode(
                F.array(*[
                    _srp_bits(df.sparkSession, vec_col, n_bits, dim, seed + t)
                    for t in range(n_tables)
                ])
            ).alias("tbl", "bucket"),
        )

    cb = bucketed_ids(corpus, "neighbor_id")
    qb = bucketed_ids(queries, "query_id")
    cands = (
        cb.join(qb, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        cands.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id", "neighbor_id",
            F.round(cosine_prenormed(F.col("qv"), F.col("cv"),
                                     F.col("qn"), F.col("cn")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def _assign_udf(cmat: np.ndarray, cids: np.ndarray):
    """Arrow-batched nearest-centroid assignment: one numpy matmul per batch
    against the broadcast centroid matrix."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def _assign(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int64")
        m = np.asarray(vs.tolist(), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(cids[np.argmax(m @ cmat.T, axis=1)])

    return _assign


def ivf_assign(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 2,
    sample_per_centroid: int = 256,
) -> tuple[DataFrame, DataFrame]:
    """IVF index build: centroids train on a bounded DETERMINISTIC hash-min
    sample (``sample_per_centroid × n_centroids`` rows, one distributed
    top-K-by-hash job — ``TakeOrdered`` map-side top-K, never a full sort),
    then the corpus is assigned to its nearest centroid exactly ONCE (lazy
    Arrow-matmul pass). Standard IVF practice: Lloyd refinement runs in
    numpy on the driver over the collected sample — at 10^10 rows the index
    build costs one bounded sample scan + one assignment pass, never
    ``n_iters`` full-corpus training passes. Deterministic end to end: no
    RNG; seeds = the ``n_centroids`` hash-smallest sample rows (identical to
    the pre-sampling seed selection), fixed iteration count.

    What refinement buys at scale: BALANCED lists (max-list size drops with
    iterations) — the bound on worst-case probe cost; recall at fixed
    n_probe is data-dependent. Returns (assigned corpus df + 'list_id',
    centroids df)."""
    n_sample = max(n_centroids, n_centroids * sample_per_centroid)
    sample_rows = (
        corpus.select(id_col, vec_col)
        .withColumn("_h", F.xxhash64(F.col(id_col).cast("string")))
        .orderBy("_h")
        .limit(n_sample)
        .collect()
    )
    smat = np.asarray([r[vec_col] for r in sample_rows], dtype=np.float64)
    smat = smat / np.maximum(np.linalg.norm(smat, axis=1, keepdims=True), 1e-12)
    # seeds: the hash-smallest n_centroids rows (sample_rows is already in
    # ascending _h order — same seeds the full-corpus variant picked)
    cmat = smat[:n_centroids].copy()
    cids = np.arange(len(cmat), dtype=np.int64)

    for _ in range(max(0, n_iters)):
        # driver-local Lloyd step over the sample: assign → per-list mean
        nearest = np.argmax(smat @ cmat.T, axis=1)
        new = cmat.copy()  # empty lists keep their previous centroid
        for lid in range(len(cmat)):
            members = smat[nearest == lid]
            if len(members):
                m = members.mean(axis=0)
                new[lid] = m / max(float(np.linalg.norm(m)), 1e-12)
        cmat = new

    centroids_df = corpus.sparkSession.createDataFrame(
        [(int(i), [float(x) for x in cmat[i]]) for i in range(len(cmat))],
        "list_id long, centroid array<double>",
    )
    assigned = corpus.withColumn("list_id", _assign_udf(cmat, cids)(F.col(vec_col)))
    return assigned, centroids_df


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat search: queries probe their ``n_probe`` nearest centroid
    lists; exact cosine re-rank within the probed lists."""
    assigned, centroids = ivf_assign(corpus, n_centroids, id_col, vec_col)
    qc = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    probe_scores = qc.join(F.broadcast(centroids)).select(
        "query_id", "qv", "qn", "list_id", cosine(F.col("qv"), F.col("centroid")).alias("cs")
    )
    wp = Window.partitionBy("query_id").orderBy(F.col("cs").desc(), F.col("list_id"))
    probes = (
        probe_scores.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "qv", "qn", "list_id")
    )
    cands = probes.join(
        assigned.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
                        norm(F.col(vec_col)).alias("cn"), "list_id"),
        "list_id",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cands.select(
        "query_id", "neighbor_id",
        F.round(cosine_prenormed(F.col("qv"), F.col("cv"),
                                 F.col("qn"), F.col("cn")), 6).alias("cos"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def ivf_index_write(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 2,
) -> None:
    """Persist an IVF index for build-once / query-many serving — the actual
    100-TB ANN shape (re-assigning a 10^10-row corpus per query batch is the
    anti-pattern the in-memory ``ivf_topk`` accepts for one-shot use).

    Layout: ``{path}/lists`` = the assigned corpus parquet PARTITIONED BY
    list_id (each posting list is its own partition directory, so a probe
    reads only its lists), with each vector's norm precomputed at write time;
    ``{path}/centroids`` = the tiny centroid table."""
    assigned, centroids = ivf_assign(corpus, n_centroids, id_col, vec_col, n_iters)
    (
        assigned.select(id_col, vec_col, "list_id", norm(F.col(vec_col)).alias("vnorm"))
        # cluster rows by list BEFORE partitionBy: without this every task
        # opens a writer per list (tasks x lists small files)
        .repartition(max(1, n_centroids // 4), F.col("list_id"))
        .write.partitionBy("list_id").mode("overwrite").parquet(f"{path}/lists")
    )
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_index_append(
    batch: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append NEW vectors to a persisted IVF index — the incremental
    maintenance path a corpus pipeline needs (the minhash-incremental twin):
    the batch is assigned against the STORED centroids and appended into the
    partitioned posting lists. Cost: one O(batch) assignment pass + one
    append write; the existing corpus is never rescanned, and probes keep
    their partition pruning (appended files land inside ``list_id=``
    directories).

    Centroids are FROZEN at build time — standard IVF practice (FAISS
    ``add`` after ``train``): retraining on the grown corpus would reassign
    every existing posting list, i.e. a full rebuild. By construction,
    append ≡ rebuilding the whole index with the same centroids over
    corpus ∪ batch (pytest-asserted)."""
    spark = batch.sparkSession
    rows = spark.read.parquet(f"{path}/centroids").orderBy("list_id").collect()
    cmat = np.asarray([r["centroid"] for r in rows], dtype=np.float64)
    cids = np.asarray([r["list_id"] for r in rows], dtype=np.int64)
    assigned = batch.withColumn("list_id", _assign_udf(cmat, cids)(F.col(vec_col)))
    (
        assigned.select(id_col, vec_col, "list_id", norm(F.col(vec_col)).alias("vnorm"))
        .repartition(max(1, len(cids) // 4), F.col("list_id"))
        .write.partitionBy("list_id").mode("append").parquet(f"{path}/lists")
    )


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k against a PERSISTED IVF index: probe selection broadcasts the
    centroid table, then the posting-list scan reads ONLY the probed
    ``list_id=`` partitions — static partition pruning via an explicit (and
    tiny, ≤ n_centroids) probed-list collect, never a full index scan.
    Bit-identical to ``ivf_topk`` over the same index build (pytest-asserted)."""
    centroids = spark.read.parquet(f"{path}/centroids")
    qc = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    probe_scores = qc.join(F.broadcast(centroids)).select(
        "query_id", "qv", "qn", "list_id", cosine(F.col("qv"), F.col("centroid")).alias("cs")
    )
    wp = Window.partitionBy("query_id").orderBy(F.col("cs").desc(), F.col("list_id"))
    probes = (
        probe_scores.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "qv", "qn", "list_id")
    )
    probed_lists = sorted(
        r["list_id"] for r in probes.select("list_id").distinct().collect()
    )
    lists = spark.read.parquet(f"{path}/lists").filter(
        F.col("list_id").isin(probed_lists)  # partition-pruned scan
    )
    cands = probes.join(
        lists.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
                     F.col("vnorm").alias("cn"), "list_id"),
        "list_id",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cands.select(
        "query_id", "neighbor_id",
        F.round(cosine_prenormed(F.col("qv"), F.col("cv"),
                                 F.col("qn"), F.col("cn")), 6).alias("cos"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def _pairs_within_groups(
    df: DataFrame,
    group_cols: list[str],
    threshold: float,
    id_col: str = "id",
    vec_col: str = "v",
) -> DataFrame:
    """All within-group vector pairs ``(a, b, cos)`` with ``a < b`` and
    ``round(cos, 6) >= threshold`` — ONE numpy gram matrix per group instead
    of an id self-join plus two vector re-attach joins plus a per-pair JVM
    higher-order-function cosine (guide §4.2: hand whole batches to
    vectorized native code). For a group of m vectors the old shape paid
    ~m²/2 join rows each allocating a zip_with array; this pays one chunked
    ``blk @ m.T`` BLAS call.

    Arithmetic parity with the JVM path: float32 values widen to float64
    exactly on both sides; the dot-sum order differs only in the last ulp,
    which ``round(·, 6)`` absorbs (a computed double can never sit exactly
    on a 1e-6 midpoint, so HALF_UP vs numpy HALF_EVEN cannot disagree);
    ``d > 0 ? dot/d : 0.0`` is mirrored verbatim.

    Memory: the whole group is materialized per task (m × dim float64), so
    group sizes must be bounded by construction — true for SemDeDup clusters
    (n_clusters scales with corpus) and SRP buckets (2^n_bits scales)."""
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols]
        + [f"a {id_type}", f"b {id_type}", "cos double"]
    )

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        ids = pdf[id_col].to_numpy()
        empty = {c: np.array([], dtype=np.int64) for c in group_cols}
        empty.update({"a": np.array([], dtype=ids.dtype),
                      "b": np.array([], dtype=ids.dtype),
                      "cos": np.array([], dtype=np.float64)})
        if n < 2:
            return pd.DataFrame(empty)
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]],
                       dtype=np.float64)
        norms = np.sqrt((m * m).sum(axis=1))
        step = max(1, 8_000_000 // n)  # ≤ ~64 MB of float64 dots per chunk
        frames = []
        from ..functions.numeric import round6_half_up

        for i0 in range(0, n, step):
            blk = slice(i0, min(i0 + step, n))
            dots = m[blk] @ m.T
            d = norms[blk, None] * norms[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(d > 0, dots / d, 0.0)
            cosr = round6_half_up(cos.ravel()).reshape(cos.shape)
            mask = (cosr >= threshold) & (ids[blk, None] < ids[None, :])
            r, c = np.nonzero(mask)
            if len(r):
                frames.append(pd.DataFrame({
                    "a": ids[blk][r], "b": ids[c], "cos": cosr[r, c]}))
        if not frames:
            return pd.DataFrame(empty)
        out = pd.concat(frames, ignore_index=True)
        for col, val in zip(group_cols, key):
            out[col] = val
        return out[group_cols + ["a", "b", "cos"]]

    return df.groupBy(*group_cols).applyInPandas(kernel, out_schema)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 6,
    n_tables: int = 3,
    seed: int = 11,
    dim: int | None = None,
) -> DataFrame:
    """(a, b, cos) embedding near-duplicates: SRP-bucket candidates, exact
    cosine verify at ``threshold``. The embedding-cosine member of the dedup
    suite.

    Scale shape: vectors ride the ×n_tables explode into one shuffle keyed
    by (tbl, bucket) and every bucket's pairs are scored by ONE numpy gram
    matrix (``_pairs_within_groups``); pair dedup across tables then carries
    only (a, b, cos). In the near-dup regime pairs-per-bucket ≫ rows-per-
    bucket, so shipping each vector n_tables× once is far cheaper than the
    former per-pair vector re-attach joins + per-pair JVM HOF cosine.
    Pass ``dim`` to skip the one-row probe job that otherwise infers it."""
    if dim is None and n_bits > 0:
        dim = len(df.select(vec_col).first()[0])
    from .dedup_suite import _FANOUT_MIN_BYTES_HEAVY, _ensure_parallelism

    base = _ensure_parallelism(df, _FANOUT_MIN_BYTES_HEAVY).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    bucketed = base.select(
        "id", "v",
        F.posexplode(
            F.array(*[
                _srp_bits(df.sparkSession, "v", n_bits, dim, seed + t)
                for t in range(n_tables)
            ])
        ).alias("tbl", "bucket"),
    )
    scored = _pairs_within_groups(bucketed, ["tbl", "bucket"], threshold)
    # a pair sharing several buckets scores identically in each (same kernel,
    # same inputs) — dedup AFTER scoring is equivalent to the old
    # dedup-then-score order
    return scored.select("a", "b", "cos").dropDuplicates(["a", "b"])


def group_centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    assemble: bool = True,
) -> DataFrame:
    """Element-wise mean vector per group — class prototypes / cluster
    centroids / a distributed IVF-centroid refinement step.

    Shape at 100 TB: ``posexplode`` flattens to (group, pos, val) and ONE
    hash aggregate on (group, pos) computes the means — ``avg`` is partially
    aggregated map-side, so the shuffle carries one partial per (group, pos,
    task), never the vectors themselves. No ``collect_list`` of arrays, no
    driver numpy. With ``assemble=True`` a second (tiny, |groups|-sized)
    aggregate reassembles ordered arrays via sort-then-transform.

    Returns ``(group, centroid, n_vecs)`` when assembled, else the flat
    ``(group, pos, mean_val, n_vecs)`` — ``n_vecs`` is the per-group vector
    count (constant across positions for rectangular input).
    """
    flat = (
        df.select(F.col(group_col), F.posexplode(F.col(vec_col)).alias("pos", "val"))
        .groupBy(group_col, "pos")
        .agg(
            F.avg(F.col("val").cast("double")).alias("mean_val"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
    )
    if not assemble:
        return flat
    return (
        flat.groupBy(group_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("mean_val")))
                ),
                lambda s: s["mean_val"],
            ).alias("centroid"),
            F.max("n_vecs").alias("n_vecs"),
        )
    )


def semantic_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 2,
    sample_per_centroid: int = 256,
    _with_assignment: bool = False,
):
    """SemDeDup candidate pairs (Abbas et al. 2023, arXiv:2303.09540):
    cluster the embeddings with the IVF machinery, then compute EXACT
    pairwise cosine only WITHIN each cluster — ``(a, b, cos)`` for every
    within-cluster pair at or above ``threshold``.

    Scale shape: clustering caps the quadratic term at Σ|cluster|² instead
    of |corpus|² (with balanced lists, |corpus|²/n_clusters), and the
    self-join runs on bare ``(id, list_id)`` rows — vectors are re-attached
    once per side only for surviving candidate pairs, mirroring
    ``embedding_near_dup_pairs``. Each vector lives in exactly ONE list, so
    no candidate dedup pass is needed (unlike multi-table LSH). Cosines are
    rounded to 6 places for cross-engine comparability.

    ``n_clusters=1`` is the exhaustive configuration: exact all-pairs
    cosine at threshold — the DuckDB-verifiable sibling of the clustered
    approximation (same trick as ``lsh_topk_exhaustive``)."""
    assigned, centroids = ivf_assign(
        df, n_clusters, id_col, vec_col, n_iters, sample_per_centroid
    )
    base = assigned.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "list_id"
    )
    # one numpy gram matrix per cluster (``_pairs_within_groups``) replaces
    # the former (id, list_id) self-join + two vector re-attach joins + per-
    # pair JVM HOF cosine: Σ|cluster|² pair rows never materialize in a
    # shuffle, and the quadratic arithmetic runs as chunked BLAS
    pairs = _pairs_within_groups(base, ["list_id"], threshold).select(
        "a", "b", "cos"
    )
    if _with_assignment:
        return pairs, assigned, centroids
    return pairs


def semantic_dedupe(
    df: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "marginal",
    n_iters: int = 2,
    sample_per_centroid: int = 256,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """SemDeDup survivors: drop all but one member of every semantic
    near-duplicate group. Groups are connected components over
    ``semantic_dedup_pairs`` (transitive: a chain of ≥threshold links is one
    group even when its endpoints are unlike each other — same contract as
    the text dedup suite).

    ``keep`` picks the survivor per group: ``"marginal"`` keeps the member
    LEAST similar to its cluster centroid — the SemDeDup paper's choice
    (retain the outlier; duplicates cluster tightly, the marginal point
    carries the most diversity); ``"min_id"`` keeps the smallest id (the
    deterministic choice the text suite uses, and the one a SQL oracle can
    express).

    Shape: components run on the pair graph only; centroid scores are
    computed just for pair participants (semi-join before the broadcast
    centroid join); the corpus is anti-joined against losers and never
    reshuffled (``near_dedupe``)."""
    import tempfile

    from .graph import near_dedupe

    pairs, assigned, centroids = semantic_dedup_pairs(
        df, threshold, n_clusters, id_col, vec_col, n_iters,
        sample_per_centroid, _with_assignment=True,
    )
    # materialize the pair plan ONCE: it is consumed up to three times below
    # (the components' edge snapshot + both participant projections), and
    # each execution would re-run the assignment UDF + gram kernel
    root = checkpoint_dir or tempfile.mkdtemp(prefix="dst_semdd_")
    pairs.write.mode("overwrite").parquet(f"{root}/pairs")
    pairs = df.sparkSession.read.parquet(f"{root}/pairs")
    if keep == "min_id":
        return near_dedupe(df, pairs, id_col=id_col,
                           checkpoint_dir=checkpoint_dir)
    if keep != "marginal":
        raise ValueError(f"keep must be 'marginal' or 'min_id', got {keep!r}")
    participants = pairs.select(F.col("a").alias(id_col)).union(
        pairs.select(F.col("b").alias(id_col))
    ).dropDuplicates()
    scored = (
        assigned.join(participants, id_col, "left_semi")
        .join(F.broadcast(centroids), "list_id")
        .select(
            F.col(id_col),
            F.col(vec_col).alias("v"),
            F.col("centroid").alias("c"),
        )
        .select(
            id_col,
            (-F.round(cosine_prenormed(F.col("v"), F.col("c"), norm(F.col("v")),
                                       norm(F.col("c"))), 6)).alias("_marginality"),
        )
    )
    df_scored = df.join(scored, id_col, "left")
    survivors = near_dedupe(
        df_scored, pairs, id_col=id_col, score_col="_marginality",
        checkpoint_dir=checkpoint_dir,
    )
    return survivors.drop("_marginality")
