"""Distributed linear text-quality classifier (fastText-style).

The CCNet / GPT-3-pipeline quality filter — score documents against a
reference class with a linear model over hashed bag-of-words features —
re-expressed Spark-first. The reference engine has no ML surface; this
belongs to the LLM-training-data suite.

Scale shape at 100 TB:

- **features** stay JVM-side: tokenize → one (doc, bucket) count
  aggregate (map-side combined) → per-doc aligned sparse arrays. The
  feature table is built once and cached/persisted; training never
  rescans text.
- **training** is full-batch logistic-regression gradient descent with
  bounded driver state: per iteration, residuals are computed
  row-parallel by ONE Arrow-batched pandas UDF against the broadcast
  weight vector (~256 KB at 2^15 buckets + bias), and the gradient
  reduces in ONE hash aggregate over exploded (bucket, val·residual)
  pairs — partially aggregated map-side, so shuffle traffic is
  O(n_features × tasks) partials, never corpus-sized. The driver holds
  only the weight vector, exactly like the IVF centroid build
  (``similarity.ivf_assign``).
- **scoring** reuses the same UDF (one pass, no shuffle), or — for an
  explicit token→weight map, e.g. a distilled/audited model — the pure
  JVM ``token_weight_score`` path with a broadcast weight table.

Floating-point note: distributed sums are order-dependent, so retrained
weights can differ across partitionings by ~1e-12 per step; tests pin
predictions exactly and weights to tolerance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    # same normalization contract as corpus.tokenize (dual-expressible in
    # DuckDB for the oracle queries); fanned out so the regex+explode never
    # runs on a 1-2-split small-file read
    from .dedup_suite import _ensure_parallelism

    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^0-9a-z]", " ")
    return (
        _ensure_parallelism(df)
        .select(F.col(id_col), F.explode(F.split(norm, " ")).alias("token"))
        .filter(F.col("token") != "")
    )


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str | None = None,
    n_features: int = 1 << 15,
    seed: int = 7,
    binarize: bool = False,
) -> DataFrame:
    """Per-doc hashed bag-of-words: ``(id, idx: array<int>, val:
    array<double>[, label])``. ``idx``/``val`` are aligned sparse arrays;
    values are term frequencies normalized by doc length (or 1.0 presence
    indicators with ``binarize``); a constant bias feature at index
    ``n_features`` is always appended, so weight vectors have
    ``n_features + 1`` entries."""
    toks = _tokens(df, text_col, id_col)
    bucket = F.pmod(F.xxhash64(F.lit(seed), F.col("token")), F.lit(n_features))
    counts = (
        toks.select(F.col(id_col), bucket.cast("int").alias("idx"))
        .groupBy(id_col, "idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    feats = (
        counts.groupBy(id_col)
        .agg(
            F.collect_list(F.struct(F.col("idx"), F.col("cnt"))).alias("_fs"),
            F.sum("cnt").cast("double").alias("_tot"),
        )
        .select(
            F.col(id_col),
            F.concat(
                F.transform(F.col("_fs"), lambda s: s["idx"]),
                F.array(F.lit(int(n_features))),
            ).alias("idx"),
            F.concat(
                F.expr(
                    "transform(_fs, s -> "
                    + ("cast(1.0 as double)" if binarize else "s.cnt / _tot")
                    + ")"
                ),
                F.array(F.lit(1.0)),
            ).alias("val"),
        )
    )
    if label_col is not None:
        feats = feats.join(df.select(id_col, label_col), id_col)
    return feats


def _flatten(idxs, vals) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sparse batch → (row lens, flat indices, flat values)."""
    lens = np.fromiter((len(a) for a in idxs), dtype=np.int64, count=len(idxs))
    if lens.sum() == 0:
        return lens, np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    flat_i = np.concatenate([np.asarray(a, dtype=np.int64) for a in idxs])
    flat_v = np.concatenate([np.asarray(a, dtype=np.float64) for a in vals])
    return lens, flat_i, flat_v


def _margins_np(
    w: np.ndarray, lens: np.ndarray, flat_i: np.ndarray, flat_v: np.ndarray
) -> np.ndarray:
    if len(flat_i) == 0:
        return np.zeros(len(lens))
    contrib = w[flat_i] * flat_v
    offsets = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    margins = np.add.reduceat(contrib, offsets)
    margins[lens == 0] = 0.0  # reduceat repeats on empty slices
    return margins


def _p_udf(weights_bc, out: str = "residual"):
    """Arrow-batched margin/probability kernel against broadcast weights.
    ``out``: 'residual' → p - y (training), 'p' → probability (scoring)."""

    def _margins(idxs: pd.Series, vals: pd.Series) -> np.ndarray:
        return _margins_np(weights_bc.value, *_flatten(idxs, vals))

    if out == "residual":

        @F.pandas_udf("double")
        def res(idxs: pd.Series, vals: pd.Series, labels: pd.Series) -> pd.Series:
            m = _margins(idxs, vals)
            p = 1.0 / (1.0 + np.exp(-m))
            return pd.Series(p - labels.astype("float64").to_numpy())

        return res

    @F.pandas_udf("double")
    def prob(idxs: pd.Series, vals: pd.Series) -> pd.Series:
        m = _margins(idxs, vals)
        return pd.Series(1.0 / (1.0 + np.exp(-m)))

    return prob


# Worker-side flattened-feature cache (guide §4.5): the GD loop runs
# n_iters jobs over the SAME persisted feature table, and with
# spark.python.worker.reuse (default on) the same worker processes see the
# same partitions again — caching the flattened numpy arrays per (training
# run, partition) makes every iteration after the first skip the
# Arrow→pandas→numpy conversion entirely. Keyed by a per-run token so a new
# training run invalidates the previous one; capped so a worker that sees
# many partitions of a huge table degrades to streaming, never OOM.
_GRAD_CACHE: dict = {"token": None, "parts": {}}
_GRAD_CACHE_MAX_PARTS = 64


def _make_grad_part(weights_bc, n_weights: int, cache_token: str | None = None):
    """Per-partition DENSE gradient partial (MLlib treeAggregate shape):
    residuals and the full bincount-accumulated gradient in one numpy pass;
    each partition emits exactly one length-``n_weights`` array row."""

    def part(batches):
        w = weights_bc.value
        pid = None
        if cache_token is not None:
            from pyspark import TaskContext

            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else None
            if _GRAD_CACHE["token"] != cache_token:
                _GRAD_CACHE["token"] = cache_token
                _GRAD_CACHE["parts"] = {}
        chunks = _GRAD_CACHE["parts"].get(pid) if pid is not None else None
        if chunks is None:
            chunks = []
            for pdf in batches:
                if not len(pdf):
                    continue
                lens, fi, fv = _flatten(pdf["idx"], pdf["val"])
                chunks.append((lens, fi, fv, pdf["_y"].to_numpy(dtype=np.float64)))
            if (
                pid is not None
                and len(_GRAD_CACHE["parts"]) < _GRAD_CACHE_MAX_PARTS
            ):
                _GRAD_CACHE["parts"][pid] = chunks
        g = np.zeros(n_weights, dtype=np.float64)
        for lens, fi, fv, y in chunks:
            m = _margins_np(w, lens, fi, fv)
            r = 1.0 / (1.0 + np.exp(-m)) - y
            if len(fi):
                g += np.bincount(fi, weights=fv * np.repeat(r, lens), minlength=n_weights)
        # ship the partial as raw float64 bytes: an array<double> row would
        # cross Arrow as n_weights boxed Python floats per partition per
        # iteration (measured: the dominant per-iteration cost at 2^15
        # features), a binary cell crosses as one buffer
        yield pd.DataFrame({"g": [g.tobytes()]})

    return part


def train_logreg(
    feats: DataFrame,
    label_col: str = "label",
    n_features: int = 1 << 15,
    n_iters: int = 30,
    lr: float = 1.0,
    l2: float = 0.0,
    dense_threshold: int = 1 << 18,
) -> np.ndarray:
    """Full-batch GD over a ``hashed_features`` table → weight vector of
    ``n_features + 1`` float64 (last entry = bias). One cached-table pass
    per iteration; deterministic up to float-sum ordering.

    Two gradient shapes, chosen by feature-vector size:

    - **dense partials** (default, ``n_features + 1 ≤ dense_threshold``):
      each partition emits ONE length-(n_features+1) gradient array from a
      single numpy pass (``mapInPandas`` — the MLlib ``treeAggregate``
      shape); the driver sums the partials. Zero shuffle, one job per
      iteration; driver traffic = partitions × 8·n_features bytes.
    - **exploded hash aggregate** (wide models): (bucket, val·residual)
      pairs partially aggregated map-side, so no task nor the driver ever
      holds a dense vector per partition — shuffle O(n_features × tasks)
      partials, result fetched via Arrow.
    """
    spark = feats.sparkSession
    feats = feats.select("idx", "val", F.col(label_col).cast("double").alias("_y"))
    feats.persist()
    try:
        n = feats.count()
        if n == 0:
            raise ValueError("cannot train on an empty feature table")
        # the iteration loop launches n_iters small jobs over this table.
        # Partitioning targets BOTH regimes: small tables spread across the
        # cores (≥2k rows per task so fixed task cost amortizes — a 50k-row
        # table must not train single-threaded), big tables pack toward
        # 50k-row partitions; inputs already ≥ the session parallelism keep
        # their layout untouched.
        dp = spark.sparkContext.defaultParallelism
        orig = feats.rdd.getNumPartitions()
        desired = max(
            1, min((n + 1_999) // 2_000, max(dp, (n + 49_999) // 50_000))
        )
        if orig > desired or orig < min(dp, desired):
            packed = feats.repartition(desired)
            packed.persist().count()
            feats.unpersist()
            feats = packed
        w = np.zeros(n_features + 1, dtype=np.float64)
        dense = n_features + 1 <= dense_threshold
        import uuid

        run_token = uuid.uuid4().hex
        for _ in range(n_iters):
            bc = spark.sparkContext.broadcast(w)
            if dense:
                parts = feats.mapInPandas(
                    _make_grad_part(bc, n_features + 1, run_token), "g binary"
                ).toPandas()
                g = (
                    np.sum(
                        [np.frombuffer(p, dtype=np.float64) for p in parts["g"]],
                        axis=0,
                    )
                    if len(parts)
                    else np.zeros_like(w)
                )
            else:
                res = _p_udf(bc, "residual")
                # Arrow toPandas, not collect(): the gradient is O(n_features)
                # rows; per-Row materialization costs more than the job itself
                gpdf = (
                    feats.withColumn("_r", res(F.col("idx"), F.col("val"), F.col("_y")))
                    .select(F.explode(F.arrays_zip("idx", "val")).alias("f"), "_r")
                    .groupBy(F.col("f.idx").alias("i"))
                    .agg(F.sum(F.col("f.val") * F.col("_r")).alias("g"))
                    .toPandas()
                )
                g = np.zeros_like(w)
                g[gpdf["i"].to_numpy(dtype=np.int64)] = gpdf["g"].to_numpy()
            g /= n
            if l2:
                reg = l2 * w
                reg[-1] = 0.0  # never regularize the bias
                g += reg
            w -= lr * g
            bc.unpersist()
        return w
    finally:
        feats.unpersist()


def score_logreg(
    feats: DataFrame,
    weights: np.ndarray,
    out_col: str = "p",
) -> DataFrame:
    """Attach the model probability to a ``hashed_features`` table — one
    Arrow pass, no shuffle."""
    bc = feats.sparkSession.sparkContext.broadcast(
        np.asarray(weights, dtype=np.float64)
    )
    return feats.withColumn(out_col, _p_udf(bc, "p")(F.col("idx"), F.col("val")))


def token_weight_score(
    df: DataFrame,
    weights: dict[str, float],
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "score",
) -> DataFrame:
    """Pure-JVM linear scorer for an EXPLICIT token→weight map (a
    distilled or hand-audited model): ``score = bias + Σ count(token) ×
    weight``. Broadcast map join + one per-doc aggregate — no Python in
    the path, and simple enough for a SQL oracle to replicate."""
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(t, float(v)) for t, v in sorted(weights.items())], "token string, _w double"
    )
    per_doc = (
        _tokens(df, text_col, id_col)
        .join(F.broadcast(wdf), "token")
        .groupBy(id_col)
        .agg(F.sum("_w").alias("_s"))
    )
    return df.join(per_doc, id_col, "left").withColumn(
        out_col, F.round(F.coalesce(F.col("_s"), F.lit(0.0)) + F.lit(bias), 6)
    ).drop("_s")
