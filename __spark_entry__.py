"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC replay end-to-end through the real
engine (changelog → micro-batch MERGE into a LakeTable → converged snapshot).
``queries()`` / ``oracle_sql()`` expose each implemented operator from
SURVEY.md §2 with a DuckDB-checkable ANSI-SQL oracle.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # repo-relative import safety

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_sync_tool_spark.operators.dedupe import lww_dedupe, replay_final_state
from data_sync_tool_spark.sources.lake import LakeTable
from data_sync_tool_spark.sources.registry import (
    CHANGELOG_SELECT_SQL,
    changelog,
    changelog_max_lsn,
    read_table,
    register_views,
)

_FINAL_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

# The changelog body is shared verbatim between Spark and DuckDB (ANSI-only
# constructs), so CDC oracles are WITH-wrapped around the same text.
_CHANGELOG_CTE = f"WITH changes AS ({CHANGELOG_SELECT_SQL})"


# --------------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: replay the sf0.001 change stream through 4 micro-batch
    MERGEs into a lake table; return the converged transcript snapshot."""
    sf_dir = "/root/testdata/sf0.001"
    ch = changelog(spark, sf_dir)
    table = LakeTable(
        spark, tempfile.mkdtemp(prefix="dst_entry_"), ["conv_id", "turn_idx"], n_buckets=16
    )
    n = changelog_max_lsn(spark, sf_dir) + 1
    step = max(1, n // 4)
    for i, lo in enumerate(range(0, n, step)):
        batch = ch.filter((F.col("lsn") >= lo) & (F.col("lsn") < lo + step))
        table.merge_into(batch, batch_id=f"entry-batch-{i}")
    return table.read().select(*_FINAL_COLS)


# ------------------------------------------------------------------- queries

def _q_cdc_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full engine path: micro-batched MERGE replay, converged final state."""
    ch = changelog(spark, sf_dir)
    table = LakeTable(
        spark, tempfile.mkdtemp(prefix="dst_q_"), ["conv_id", "turn_idx"],
        n_buckets=32, checksum=True,  # incremental digest: O(batch) per commit
    )
    n = changelog_max_lsn(spark, sf_dir) + 1
    step = max(1, n // 4)
    for i, lo in enumerate(range(0, n, step)):
        batch = ch.filter((F.col("lsn") >= lo) & (F.col("lsn") < lo + step))
        table.merge_into(batch, batch_id=f"q-batch-{i}")
    return table.read().select(*_FINAL_COLS)


def _q_cdc_collapse_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse-strategy replay (the ClickHouse sink protocol, reference
    adapters/clickhouse.py:93-105, run as VersionedCollapsingMergeTree):
    apply the change stream in lsn-ordered batches as append-only +1
    version rows; superseded versions annihilate at read — the live state
    must equal the LWW final state. (``read()`` performs the collapse
    resolution itself; the explicit ``collapse_live_view`` fold is the
    compact-time/raw-sign-data path, pytest-covered in test_cdc_core.)"""
    ch = changelog(spark, sf_dir)
    table = LakeTable(
        spark, tempfile.mkdtemp(prefix="dst_cl_"), ["conv_id", "turn_idx"], n_buckets=16
    )
    n = changelog_max_lsn(spark, sf_dir) + 1
    step = max(1, n // 4)
    for i, lo in enumerate(range(0, n, step)):
        batch = ch.filter((F.col("lsn") >= lo) & (F.col("lsn") < lo + step))
        table.merge_into(batch, batch_id=f"cl-batch-{i}", strategy="collapse")
    return table.read().select(*_FINAL_COLS)


def _q_windowed_turn_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window rollup (the streaming windows operator run
    on the bounded changelog — identical semantics, SQL-checkable: Spark's
    window(ts, '1 minute') start == epoch floored to 60s)."""
    from data_sync_tool_spark.streaming.windows import windowed_turn_counts

    return windowed_turn_counts(changelog(spark, sf_dir)).orderBy(
        "window_start", "conv_id"
    )


def _q_cdc_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass LWW dedupe + delete-filter over the change stream."""
    return replay_final_state(changelog(spark, sf_dir), ["conv_id", "turn_idx"]).select(
        *_FINAL_COLS
    )


def _q_cdc_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic events→changelog projection itself."""
    return changelog(spark, sf_dir)


def _q_cdc_last_per_conv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation head: latest surviving turn per conversation."""
    final = replay_final_state(changelog(spark, sf_dir), ["conv_id", "turn_idx"])
    latest = lww_dedupe(
        final.withColumn("_ord", F.col("turn_idx").cast("long")),
        ["conv_id"],
        lsn_col="_ord",
        op_col=None,
    )
    return latest.select("conv_id", "turn_idx", "role", "text")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from data_sync_tool_spark.queries import catalog

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "cdc_changelog": _q_cdc_changelog,
        "cdc_lww_final_state": _q_cdc_lww,
        "cdc_merge_replay": _q_cdc_replay,
        "cdc_collapse_replay": _q_cdc_collapse_replay,
        "cdc_last_turn_per_conv": _q_cdc_last_per_conv,
        "windowed_turn_counts": _q_windowed_turn_counts,
    }
    out.update({name: fn for name, (fn, _sql) in catalog().items()})
    return out


def oracle_sql() -> dict[str, str]:
    final_state_sql = f"""
        {_CHANGELOG_CTE},
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
          FROM changes
        )
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM ranked WHERE rn = 1 AND op <> 'delete'
    """
    from data_sync_tool_spark.queries import catalog

    out = {
        name: sql for name, (_fn, sql) in catalog().items() if sql is not None
    }
    return out | {
        "cdc_changelog": f"{_CHANGELOG_CTE} SELECT * FROM changes",
        "cdc_lww_final_state": final_state_sql,
        "cdc_merge_replay": final_state_sql,
        "cdc_collapse_replay": final_state_sql,
        "windowed_turn_counts": f"""
            {_CHANGELOG_CTE},
            b AS (
              SELECT make_timestamp(CAST(floor(epoch(ts) / 60) AS BIGINT) * 60 * 1000000)
                       AS window_start,
                     conv_id, op, lsn
              FROM changes
            )
            SELECT window_start,
                   window_start + INTERVAL 1 MINUTE AS window_end,
                   conv_id,
                   count(1) AS n_changes,
                   CAST(sum(CASE WHEN op = 'delete' THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_deletes,
                   min(lsn) AS lsn_min, max(lsn) AS lsn_max
            FROM b GROUP BY window_start, conv_id
            ORDER BY window_start, conv_id
        """,
        "cdc_last_turn_per_conv": f"""
            {_CHANGELOG_CTE},
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
              FROM changes
            ),
            final AS (
              SELECT conv_id, turn_idx, role, text
              FROM ranked WHERE rn = 1 AND op <> 'delete'
            ),
            heads AS (
              SELECT *, row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx DESC) AS rn2
              FROM final
            )
            SELECT conv_id, turn_idx, role, text FROM heads WHERE rn2 = 1
        """,
    }
