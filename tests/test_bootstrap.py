"""Bootstrap: initial snapshot load + binlog catch-up handoff.

The streaming analogue of the reference's first-run full reconcile
(`/root/reference/engine/pipeline.py:125-135`): snapshot at LSN X →
overwrite → tail the binlog with events lsn<=X scan-filtered. Pins

- convergence: bootstrap + catch-up ≡ from-scratch full replay,
- the LWW safety claim: replaying the ENTIRE stream over a bootstrapped
  table (filter disabled) is a no-op for pre-snapshot events, for both
  MoR-upsert and collapse strategies,
- idempotence + restart: a crash-rerun bootstrap is a no-op and the
  snapshot LSN is recoverable from the table's own lineage.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_sync_tool_spark.datagen import changelog_stream, write_stream_chunks
from data_sync_tool_spark.operators.dedupe import replay_final_state
from data_sync_tool_spark.sources.lake import LakeTable
from data_sync_tool_spark.streaming.cdc import CdcPipeline

N_EVENTS = 4_000


@pytest.fixture(scope="module")
def changelog(spark):
    return changelog_stream(
        spark, N_EVENTS, n_convs=100, max_turns=16, hot_fraction=0.3, n_hot=2
    ).cache()


@pytest.fixture(scope="module")
def stream_dir(changelog, tmp_path_factory):
    d = tmp_path_factory.mktemp("binlog")
    write_stream_chunks(changelog, str(d), n_chunks=8)
    return str(d)


@pytest.fixture(scope="module")
def expected_final(changelog):
    return replay_final_state(changelog, ["conv_id", "turn_idx"]).cache()


SNAPSHOT_LSN = N_EVENTS // 2  # lsn of the consistent source dump


@pytest.fixture(scope="module")
def snapshot(changelog):
    # what a consistent source extract at LSN X contains: the live rows
    # after every change with lsn <= X (deletes applied, no tombstones)
    return replay_final_state(
        changelog.filter(F.col("lsn") <= SNAPSHOT_LSN), ["conv_id", "turn_idx"]
    ).cache()


def _assert_same(a, b):
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_bootstrap_catchup_converges_and_skips_prefix(
    spark, tmp_path, stream_dir, snapshot, expected_final
):
    table = LakeTable(spark, str(tmp_path / "tbl"), ["conv_id", "turn_idx"], n_buckets=8)
    pipe = CdcPipeline(spark, f"{stream_dir}/chunk-*", table, str(tmp_path / "ckpt"),
                       name="boot")
    res = pipe.bootstrap(snapshot, SNAPSHOT_LSN)
    assert res is not None and res.applied
    pipe.run_available()
    _assert_same(table.read().drop("_lsn"), expected_final)
    # the scan filter really skipped the pre-snapshot prefix: every stream
    # batch's lineage offset range starts past the snapshot LSN, and the
    # stream processed roughly half the binlog
    stream_lineage = [e for e in table.lineage() if e.get("op", "").startswith("merge")]
    assert stream_lineage, "catch-up wrote no batches"
    assert all(e["offset_min"] > SNAPSHOT_LSN for e in stream_lineage)
    assert pipe.metrics.total_events < N_EVENTS * 0.75


@pytest.mark.parametrize("strategy", ["upsert", "collapse"])
def test_full_overlap_replay_is_noop(
    spark, tmp_path, stream_dir, snapshot, expected_final, strategy
):
    # the correctness claim behind the catch-up filter: replay the WHOLE
    # stream (filter disabled) over a bootstrapped table — stale events
    # lose to the snapshot's LWW stamp under every merge strategy
    table = LakeTable(spark, str(tmp_path / "tbl"), ["conv_id", "turn_idx"], n_buckets=8)
    pipe = CdcPipeline(spark, f"{stream_dir}/chunk-*", table, str(tmp_path / "ckpt"),
                       name=f"olap-{strategy}", merge_strategy=strategy)
    pipe.bootstrap(snapshot, SNAPSHOT_LSN)
    pipe.catchup_from_lsn = None  # deliberately replay the full history
    pipe.run_available()
    assert pipe.metrics.total_events == N_EVENTS
    _assert_same(table.read().drop("_lsn", "_sign"), expected_final)


def test_bootstrap_idempotent_and_lsn_recoverable(
    spark, tmp_path, stream_dir, snapshot, expected_final
):
    table = LakeTable(spark, str(tmp_path / "tbl"), ["conv_id", "turn_idx"], n_buckets=8)
    pipe = CdcPipeline(spark, f"{stream_dir}/chunk-*", table, str(tmp_path / "ckpt"),
                       name="boot2")
    assert pipe.bootstrap(snapshot, SNAPSHOT_LSN) is not None
    v_after = table.current_version()
    pipe.run_available(stop_after_batches=1)  # crash mid catch-up

    # operator reruns the whole entrypoint: bootstrap must be a no-op
    pipe2 = CdcPipeline(spark, f"{stream_dir}/chunk-*", table, str(tmp_path / "ckpt"),
                        name="boot2")
    assert pipe2.resume_catchup_lsn() == SNAPSHOT_LSN
    pipe2.catchup_from_lsn = pipe2.resume_catchup_lsn()
    assert pipe2.bootstrap(snapshot, SNAPSHOT_LSN) is None
    assert table.current_version() >= v_after  # no second overwrite commit
    assert not any(
        e.get("op") == "overwrite" and e.get("version", 0) > v_after
        for e in table.lineage()
    )
    pipe2.run_available()
    _assert_same(table.read().drop("_lsn"), expected_final)
    # exactly-once across the crash: no epoch applied twice
    applied = [b["epoch_id"] for b in pipe.metrics.batches if b["applied"]] + [
        b["epoch_id"] for b in pipe2.metrics.batches if b["applied"]
    ]
    assert len(applied) == len(set(applied))
