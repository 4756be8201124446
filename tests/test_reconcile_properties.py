"""Property-based reconcile invariants: for ANY random drift (deleted rows,
modified values, extra sink rows), the digest diff finds it and one repair
pass converges the sink to the source (hypothesis)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_sync_tool_spark.operators.reconcile import (
    ReconcileConfig,
    build_blocks,
    plan_repair,
    status_counts,
)

N_ROWS = 1_000

_spark = None
_source = None


@pytest.fixture(scope="module", autouse=True)
def _setup(spark):
    global _spark, _source
    _spark = spark
    _source = spark.range(1, N_ROWS + 1).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("Item "), F.col("id")).alias("name"),
        ((F.col("id") % 100) + (F.col("id") % 17) / 10.0).alias("value"),
    ).cache()
    _source.count()
    yield


def _cfg(max_block_size=100):
    return ReconcileConfig(
        partition_column="id", partition_column_type="int",
        fields=["id", "name", "value"],
        initial_partition_interval=1000, interval_reduction_factor=10,
        max_block_size=max_block_size,
    )


@settings(max_examples=3, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    drop_mod=st.integers(2, 50),
    tweak_mod=st.integers(2, 50),
    extra_mod=st.sampled_from([0, 7, 13]),
)
def test_random_drift_detected_and_repaired(drop_mod, tweak_mod, extra_mod):
    # drift the sink: drop ids % drop_mod, tweak values of ids % tweak_mod,
    # add phantom rows (ids shifted past the source range) when extra_mod > 0
    sink = _source.filter(F.col("id") % drop_mod != 0).withColumn(
        "value",
        F.when(F.col("id") % tweak_mod == 0, F.col("value") + 0.5).otherwise(F.col("value")),
    )
    if extra_mod:
        sink = sink.unionByName(
            _source.filter(F.col("id") % extra_mod == 0).withColumn(
                "id", (F.col("id") + N_ROWS).cast("int")
            )
        )
    cfg = _cfg()
    blocks, _ = build_blocks(_source, sink, cfg)
    counts = status_counts(blocks)
    assert counts["M"] + counts["A"] + counts["D"] > 0  # drift detected

    changes = plan_repair(_source, sink, cfg, blocks, unique_keys=["id"], lsn=1)
    # apply repair in-memory: LWW over sink ∪ changes
    repaired = (
        sink.withColumn("op", F.lit("upsert")).withColumn("lsn", F.lit(0).cast("long"))
        .unionByName(changes)
    )
    from data_sync_tool_spark.operators.dedupe import replay_final_state

    final = replay_final_state(repaired, ["id"])
    assert final.exceptAll(_source).count() == 0
    assert _source.exceptAll(final).count() == 0
    # re-diff: clean
    blocks2, _ = build_blocks(_source, final, cfg)
    c2 = status_counts(blocks2)
    assert c2["M"] == 0 and c2["A"] == 0 and c2["D"] == 0


@settings(max_examples=200, deadline=None)
@given(
    initial=st.integers(1, 10**12),
    factor=st.integers(2, 64),
    mbs=st.integers(1, 10**6),
)
def test_interval_ladder_nests_for_any_config(initial, factor, mbs):
    """Property: every ladder interval divides its parent exactly and the
    ladder is strictly decreasing — the invariant the drilldown's parent
    mapping depends on, for ANY (initial, factor, max_block_size)."""
    from data_sync_tool_spark.operators.reconcile import ReconcileConfig

    ladder = ReconcileConfig(
        partition_column="x", initial_partition_interval=initial,
        interval_reduction_factor=factor, max_block_size=mbs,
    ).intervals()
    assert ladder and ladder[-1] >= 1
    assert all(p % c == 0 and p > c for p, c in zip(ladder, ladder[1:]))
    # ladder depth matches the reference's repeated-floor-division loop
    depth, iv = 1, initial
    while iv > mbs:
        depth += 1
        iv //= factor
    assert len(ladder) == depth
