"""CHECK constraints on merge (Delta CHECK-constraint analogue + row-level
DLQ): error mode aborts pre-commit; quarantine mode diverts violating rows
so LWW serves the key's previous version; constraints are table properties
persisted in the manifest."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_sync_tool_spark.sources.lake import ConstraintViolationError, LakeTable

KEYS = ["conv_id", "turn_idx"]
CHECKS = {"text_nonempty": "length(text) > 0", "turn_nonneg": "turn_idx >= 0"}


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, lsn long, op string"
    )


def test_error_mode_aborts_before_commit_and_retry_succeeds(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), KEYS, n_buckets=2,
                  merge_mode="mor", constraints=CHECKS)
    t.merge_into(_mk(spark, [("a", 0, "ok", 1, "upsert")]), "b0")
    with pytest.raises(ConstraintViolationError, match="text_nonempty"):
        t.merge_into(_mk(spark, [("a", 1, "", 2, "upsert"),
                                 ("b", 0, "fine", 3, "upsert")]), "b1")
    # nothing committed: version unchanged, batch not marked applied
    assert "b1" not in t.committed_batch_ids()
    assert {r.conv_id for r in t.read().collect()} == {"a"}
    # the standard recovery: fix the producer and retry the SAME batch id
    t.merge_into(_mk(spark, [("a", 1, "fixed", 2, "upsert"),
                             ("b", 0, "fine", 3, "upsert")]), "b1")
    assert t.read().count() == 3


def test_quarantine_diverts_rows_and_lww_keeps_previous_version(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), KEYS, n_buckets=2,
                  merge_mode="mor", constraints=CHECKS,
                  on_violation="quarantine")
    t.merge_into(_mk(spark, [("a", 0, "v1", 1, "upsert")]), "b0")
    # an UPDATE that violates: the key must keep its previous value
    # (a quarantined version never arrived, as far as LWW is concerned);
    # deletes are exempt (no payload to validate)
    r = t.merge_into(_mk(spark, [("a", 0, "", 2, "upsert"),
                                 ("b", -1, "neg turn", 3, "upsert"),
                                 ("c", 0, "good", 4, "upsert"),
                                 ("a", 1, None, 5, "delete")]), "b1")
    assert r.applied
    got = {(x.conv_id, x.turn_idx, x.text) for x in t.read().collect()}
    assert got == {("a", 0, "v1"), ("c", 0, "good")}
    assert t.lineage()[-1]["rows_quarantined"] == 2
    q = t.quarantined()
    assert {(x.conv_id, tuple(x._violations)) for x in q.collect()} == {
        ("a", ("text_nonempty",)), ("b", ("turn_nonneg",)),
    }
    assert set(q.select("_batch_id").distinct().toPandas()["_batch_id"]) == {"b1"}
    # per-batch view
    assert t.quarantined("b1").count() == 2


def test_null_passes_sql_check_semantics(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), KEYS, n_buckets=2,
                  merge_mode="mor", constraints=CHECKS,
                  on_violation="quarantine")
    # NULL text → length(text) IS NULL → constraint not FALSE → passes
    t.merge_into(_mk(spark, [("a", 0, None, 1, "upsert")]), "b0")
    assert t.read().count() == 1
    assert t.lineage()[-1].get("rows_quarantined") is None


def test_constraints_are_table_properties_enforced_by_every_handle(spark, tmp_path):
    path = str(tmp_path / "t")
    t = LakeTable(spark, path, KEYS, n_buckets=2, merge_mode="mor",
                  constraints=CHECKS, on_violation="quarantine")
    t.merge_into(_mk(spark, [("a", 0, "v1", 1, "upsert")]), "b0")
    # a second handle that declared NOTHING follows the manifest
    other = LakeTable(spark, path, KEYS, n_buckets=2, merge_mode="mor")
    assert other.constraints == CHECKS and other.on_violation == "quarantine"
    other.merge_into(_mk(spark, [("x", 0, "", 2, "upsert")]), "b1")
    assert {r.conv_id for r in other.read().collect()} == {"a"}
    assert other.quarantined("b1").count() == 1


def test_quarantine_replay_is_idempotent(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), KEYS, n_buckets=2,
                  merge_mode="mor", constraints=CHECKS,
                  on_violation="quarantine")
    batch = _mk(spark, [("a", 0, "ok", 1, "upsert"), ("a", 1, "", 2, "upsert")])
    t.merge_into(batch, "b0")
    # a crash-replay of the same batch id: merge no-ops via the idempotence
    # window, and the quarantine dir was written mode=overwrite — no dupes
    t.merge_into(batch, "b0")
    assert t.quarantined().count() == 1
    assert t.read().count() == 1

def test_streaming_pipeline_quarantines_through_foreachbatch(spark, tmp_path):
    """Constraints are table properties, so the streaming loop enforces them
    with zero wiring: a constrained table behind CdcPipeline diverts
    violating rows per micro-batch and the converged state equals LWW over
    the valid versions only."""
    from data_sync_tool_spark.datagen import changelog_stream, write_stream_chunks
    from data_sync_tool_spark.operators.dedupe import replay_final_state
    from data_sync_tool_spark.streaming.cdc import CdcPipeline

    ch = changelog_stream(spark, 2_000, n_convs=60, max_turns=12).cache()
    d = str(tmp_path / "binlog")
    write_stream_chunks(ch, d, n_chunks=4)
    check = {"text_len": "length(text) <= 18"}
    table = LakeTable(spark, str(tmp_path / "tbl"), KEYS, n_buckets=8,
                      checksum=False, constraints=check,
                      on_violation="quarantine")
    CdcPipeline(spark, f"{d}/chunk-*", table, str(tmp_path / "ckpt"),
                name="qgate").run_available()
    valid = ch.filter(
        (F.col("op") == "delete") | F.coalesce(F.length("text") <= 18, F.lit(True))
    )
    want = replay_final_state(valid, KEYS)
    got = table.read().drop("_lsn")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    n_bad = ch.filter(
        (F.col("op") != "delete") & (F.length("text") > 18)
    ).count()
    assert table.quarantined().count() == n_bad > 0
    ch.unpersist()

def test_row_ttl_enforced_at_compact(spark, tmp_path):
    """Declarative row TTL (ClickHouse analogue): expired versions drop
    during the compact fold; reads may serve them until then; the expired
    count lands in lineage; the property persists in the manifest; the
    incremental checksum stays audit-exact across the drop."""
    path = str(tmp_path / "t")
    t = LakeTable(spark, path, KEYS, n_buckets=2, merge_mode="mor",
                  ttl="turn_idx < 2")
    t.merge_into(_mk(spark, [("a", 0, "old0", 1, "upsert"),
                             ("a", 1, "old1", 2, "upsert"),
                             ("a", 5, "keep", 3, "upsert"),
                             ("b", 7, "keep2", 4, "upsert")]), "b0")
    # before compact: expired rows still served (ClickHouse pre-merge reads)
    assert t.read().count() == 4
    r = t.compact()
    assert r.applied
    assert t.lineage()[-1]["rows_expired"] == 2
    got = {(x.conv_id, x.turn_idx, x.text) for x in t.read().collect()}
    assert got == {("a", 5, "keep"), ("b", 7, "keep2")}
    # incremental digest followed the drop exactly
    assert t.lineage()[-1]["table_checksum"] == t.audit_checksum()
    # TTL is a table property: a fresh handle enforces it on its compacts
    other = LakeTable(spark, path, KEYS, n_buckets=2, merge_mode="mor")
    assert other.ttl == "turn_idx < 2"
    other.merge_into(_mk(spark, [("c", 0, "young-expired", 5, "upsert")]), "b1")
    other.compact()
    assert {x.conv_id for x in other.read().collect()} == {"a", "b"}
    assert other.lineage()[-1]["rows_expired"] == 1

def test_read_apply_ttl_hides_expired_rows_before_compact(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), KEYS, n_buckets=2,
                  merge_mode="mor", ttl="turn_idx < 2")
    t.merge_into(_mk(spark, [("a", 0, "expired", 1, "upsert"),
                             ("a", 5, "keep", 2, "upsert")]), "b0")
    assert t.read().count() == 2            # lazy enforcement (default)
    strict = t.read(apply_ttl=True)         # strict-retention read
    assert [(r.conv_id, r.turn_idx) for r in strict.collect()] == [("a", 5)]
