"""Property-based invariants (hypothesis): whatever the batching, ordering,
or duplication of the change stream, the merged table converges to the
one-pass LWW replay. These are the exactly-once / out-of-order guarantees as
PROPERTIES, not single examples."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_sync_tool_spark.operators.dedupe import replay_final_state
from data_sync_tool_spark.sources.lake import LakeTable

N_EVENTS = 300

_spark = None
_changes = None


@pytest.fixture(scope="module", autouse=True)
def _setup(spark):
    global _spark, _changes
    from data_sync_tool_spark.datagen import changelog_stream

    _spark = spark
    _changes = changelog_stream(spark, N_EVENTS, n_convs=12, max_turns=6,
                                num_partitions=4).cache()
    _changes.count()
    yield


def _expected():
    return replay_final_state(_changes, ["conv_id", "turn_idx"])


def _assert_converged(table):
    got = table.read().drop("_lsn", "_sign")
    exp = _expected()
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    cuts=st.lists(st.integers(1, N_EVENTS - 1), min_size=0, max_size=4, unique=True),
    order_seed=st.randoms(use_true_random=False),
    mode=st.sampled_from(["cow", "mor", "collapse"]),
    compact_mid=st.booleans(),
)
def test_any_batching_and_order_converges(tmp_path_factory, cuts, order_seed, mode,
                                          compact_mid):
    """Whatever the batch cuts, delivery order, merge mode — and for the
    deferred-cancel collapse strategy, with or without a compact landing in
    the middle of the run — the table converges to the one-pass LWW replay."""
    bounds = sorted({0, N_EVENTS, *cuts})
    batches = list(zip(bounds, bounds[1:]))
    order_seed.shuffle(batches)
    strategy = "collapse" if mode == "collapse" else "upsert"
    table = LakeTable(
        _spark, str(tmp_path_factory.mktemp("prop") / "t"), ["conv_id", "turn_idx"],
        n_buckets=4, checksum=False, track_stats=False,
        merge_mode=mode if mode != "collapse" else "mor",
    )
    for i, (lo, hi) in enumerate(batches):
        b = _changes.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))
        table.merge_into(b, batch_id=f"{lo}-{hi}", strategy=strategy)
        if compact_mid and i == len(batches) // 2:
            table.compact()
    _assert_converged(table)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    dup=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 2)), min_size=1, max_size=4),
)
def test_duplicate_delivery_converges(tmp_path_factory, dup):
    """At-least-once delivery: any batch may be redelivered any number of
    times under fresh batch ids — state must not change."""
    thirds = [(0, 100), (100, 200), (200, 300)]
    table = LakeTable(
        _spark, str(tmp_path_factory.mktemp("dup") / "t"), ["conv_id", "turn_idx"],
        n_buckets=4, checksum=True, track_stats=False,
    )
    for i, (lo, hi) in enumerate(thirds):
        table.merge_into(
            _changes.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi)),
            batch_id=f"base-{i}",
        )
    chk = table.lineage()[-1]["table_checksum"]
    for j, (which, _) in enumerate(dup):
        lo, hi = thirds[which]
        table.merge_into(
            _changes.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi)),
            batch_id=f"redeliver-{j}",
        )
        assert table.lineage()[-1]["table_checksum"] == chk
    _assert_converged(table)
