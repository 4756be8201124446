"""Deterministic, fully-distributed synthetic binlog generator.

Produces a change-event stream over the transcript schema from
``BASELINE.json.input_hint`` — ``(conv_id, turn_idx, role, text, tool, ts)``
keyed by ``(conv_id, turn_idx)`` with monotone ``lsn`` and op ∈
{insert, update, delete} — plus a hot-conversation skew knob.

Design points (these are what make the generator honest at 10^10 events):
- Built on ``spark.range(n)`` + JVM hash arithmetic only: generation itself is
  distributed and codegen'd; no Python, no driver loop, no collected state.
  10^10 events is just ``spark.range(10**10)`` across executors.
- Determinism: every column is a pure function of ``(seed, id)`` via
  ``xxhash64`` — the same (seed, n, knobs) produce byte-identical streams on
  any cluster size or partition count, which is what makes the two-cluster
  scaling benchmark an apples-to-apples comparison.
- Skew: a ``hot_fraction`` of events lands on ``n_hot`` conversations
  (hot-conversation skew per the north rule); the rest is uniform over
  ``n_convs``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

CHANGE_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, lsn long"
)


def _u(seed: int, tag: int, id_col: Column, mod: int) -> Column:
    """Deterministic pseudo-uniform integer in [0, mod) from (seed, tag, id)."""
    return F.pmod(F.xxhash64(F.lit(seed), F.lit(tag), id_col), F.lit(mod))


def changelog_stream(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 10_000,
    max_turns: int = 64,
    hot_fraction: float = 0.2,
    n_hot: int = 4,
    insert_pct: int = 50,
    delete_pct: int = 10,
    payload_repeat: int = 1,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic change stream of ``n_events`` rows, lsn == id.

    ``hot_fraction`` of events hit one of ``n_hot`` hot conversations.
    Ops: first-touch events are inserts by construction of the mix knobs —
    semantically the engine treats insert/update identically (upsert), so the
    mix only matters for delete coverage and payload churn.
    ``payload_repeat`` scales bytes/row (text is repeated) to emulate real
    transcript payload sizes without changing the key distribution.
    """
    df = spark.range(0, n_events, numPartitions=num_partitions)
    idc = F.col("id")

    hot_bucket = _u(seed, 1, idc, 1_000_000)
    is_hot = hot_bucket < F.lit(int(hot_fraction * 1_000_000))
    conv = F.when(
        is_hot, F.concat(F.lit("hot-"), _u(seed, 2, idc, max(1, n_hot)).cast("string"))
    ).otherwise(F.concat(F.lit("conv-"), _u(seed, 3, idc, max(1, n_convs)).cast("string")))

    turn = _u(seed, 4, idc, max_turns).cast("int")
    opsel = _u(seed, 5, idc, 100)
    op = (
        F.when(opsel < F.lit(insert_pct), F.lit("insert"))
        .when(opsel < F.lit(100 - delete_pct), F.lit("update"))
        .otherwise(F.lit("delete"))
    )
    role = F.when(turn % 2 == 0, F.lit("user")).otherwise(F.lit("assistant"))
    tool = (
        F.when(_u(seed, 6, idc, 10) == 0, F.lit("search"))
        .when(_u(seed, 6, idc, 10) == 1, F.lit("browser"))
        .otherwise(F.lit(None).cast("string"))
    )
    base_text = F.concat(
        F.lit("turn "), turn.cast("string"), F.lit(" rev "), idc.cast("string"),
        F.lit(" payload "), _u(seed, 7, idc, 1_000_000_000).cast("string"),
    )
    text = F.array_join(F.array_repeat(base_text, payload_repeat), " | ")
    ts = F.timestamp_seconds(F.lit(1704067200) + idc)  # 2024-01-01 + lsn seconds

    return df.select(
        conv.alias("conv_id"),
        turn.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
        op.alias("op"),
        idc.alias("lsn"),
    )


def write_stream_chunks(
    changes: DataFrame,
    out_dir: str,
    n_chunks: int,
    lsn_col: str = "lsn",
) -> list[str]:
    """Materialize the stream as ``n_chunks`` lsn-ordered parquet chunk
    directories under ``out_dir`` — the on-disk analogue of a binlog the
    Structured Streaming file source tails (one chunk ≈ one WAL segment)."""
    import os

    bounds = changes.agg(
        F.min(lsn_col).alias("lo"), F.max(lsn_col).alias("hi")
    ).first()
    lo, hi = bounds["lo"], bounds["hi"] + 1
    step = max(1, (hi - lo + n_chunks - 1) // n_chunks)
    # single pass: directory-partition by chunk id instead of one filtered
    # write per chunk (which would rescan the generator n_chunks times)
    tmp = f"{out_dir}/_parts"
    (
        changes.withColumn(
            "_chunk", F.floor((F.col(lsn_col) - F.lit(lo)) / F.lit(step)).cast("int")
        )
        .write.partitionBy("_chunk")
        .mode("overwrite")
        .parquet(tmp)
    )
    paths = []
    base_mtime = os.stat(tmp).st_mtime
    for i in range((hi - lo + step - 1) // step):
        src = f"{tmp}/_chunk={i}"
        dst = f"{out_dir}/chunk-{i:05d}"
        if os.path.isdir(src):
            os.rename(src, dst)
            # strictly increasing mtimes: the streaming file source orders
            # files by modification time, and a single partitioned write
            # stamps every chunk within the same second — without this, chunk
            # ARRIVAL order is unstable and watermark lateness becomes
            # nondeterministic. A real binlog is written in lsn order; this
            # restores that property.
            for j, fn in enumerate(sorted(os.listdir(dst))):
                os.utime(os.path.join(dst, fn), (base_mtime + i * 1000 + j,) * 2)
            os.utime(dst, (base_mtime + i * 1000,) * 2)
            paths.append(dst)
    return paths
