"""Incremental table-checksum maintenance: the per-commit lineage digest must
equal ``audit_checksum()``'s full recompute at every resolved commit — across
CoW runs (with deletes), MoR runs (deletes, compaction, tombstone expiry),
rescale, and additive schema evolution — while never re-scanning the table on
the hot path. Also: manifests stay O(idempotence_window) over many commits."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from data_sync_tool_spark.sources.lake import LakeTable
from data_sync_tool_spark.sources.registry import changelog


@pytest.fixture(scope="module")
def ch(spark, sf_small):
    return changelog(spark, sf_small).cache()


def _batches(ch, n):
    hi = ch.agg(F.max("lsn")).first()[0] + 1
    return [
        ch.filter((F.col("lsn") >= i * hi // n) & (F.col("lsn") < (i + 1) * hi // n))
        for i in range(n)
    ]


def test_cow_incremental_equals_audit_every_commit(spark, ch, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), ["conv_id", "turn_idx"], n_buckets=4)
    for i, b in enumerate(_batches(ch, 3)):
        t.merge_into(b, batch_id=f"b{i}")
        lin = t.lineage()[-1]
        assert lin["table_checksum"] == t.audit_checksum()
        assert "batch_checksum" in lin


def test_mor_deltas_then_compact_restores_exact_digest(spark, ch, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), ["conv_id", "turn_idx"],
                  n_buckets=4, merge_mode="mor")
    for i, b in enumerate(_batches(ch, 3)):
        t.merge_into(b, batch_id=f"b{i}")
        assert t.lineage()[-1]["table_checksum"] is None  # deltas pending
        assert t.lineage()[-1]["batch_checksum"] is not None
    t.compact()
    assert t.lineage()[-1]["table_checksum"] == t.audit_checksum()
    # tombstone expiry is a resolving rewrite too
    t.expire_tombstones(older_than_lsn=10_000_000)
    assert t.lineage()[-1]["table_checksum"] == t.audit_checksum()


def test_rescale_digest_is_incremental_and_exact(spark, ch, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), ["conv_id", "turn_idx"], n_buckets=4)
    t.merge_into(_batches(ch, 1)[0], batch_id="b0")
    chk = t.lineage()[-1]["table_checksum"]
    t.rescale(16)
    assert t.lineage()[-1]["table_checksum"] == chk == t.audit_checksum()


def test_schema_evolution_stale_digests_catch_up_at_compact(spark, ch, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), ["conv_id", "turn_idx"],
                  n_buckets=4, merge_mode="mor")
    b0, b1 = _batches(ch, 2)
    t.merge_into(b0, batch_id="b0")
    # additive evolution: later batches carry a new column
    t.merge_into(b1.withColumn("model", F.lit("m-2")), batch_id="b1")
    t.compact()
    # post-compact, every cached digest is under the evolved column set and
    # the incremental sum is exact again
    lin = t.lineage()[-1]
    assert lin["table_checksum"] is not None
    assert lin["table_checksum"] == t.audit_checksum()


def test_batch_checksum_real_on_schema_mismatch_delta_append(spark, ch, tmp_path):
    """A MoR delta append whose producer still emits the pre-evolution column
    set must record the commit's REAL row digest (read back under the manifest
    schema), never a silent 0 that reads as 'empty commit' in lineage."""
    t = LakeTable(spark, str(tmp_path / "t"), ["conv_id", "turn_idx"],
                  n_buckets=4, merge_mode="mor")
    b0, b1 = _batches(ch, 2)
    t.merge_into(b0.withColumn("model", F.lit("m-1")), batch_id="b0")
    files_before = set(t._files(t._load_manifest(), None))
    t.merge_into(b1, batch_id="b1")  # narrow batch: no 'model' column
    m = t._load_manifest()
    new_files = sorted(set(t._files(m, None)) - files_before)
    assert new_files
    expected = sum(t._file_digests(new_files, t._schema_of(m)).values())
    assert m["lineage"]["batch_checksum"] == expected
    assert m["lineage"]["batch_checksum"] != 0


def test_collapse_checksum_null_while_deltas_pend_exact_after_compact(spark, ch, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), ["conv_id", "turn_idx"], n_buckets=4)
    b0, b1 = _batches(ch, 2)
    t.merge_into(b0, batch_id="b0", strategy="collapse")
    # pending version deltas: live set is LWW-defined → no incremental value
    assert t.lineage()[-1]["table_checksum"] is None
    assert isinstance(t.audit_checksum(), int)
    # n_buckets persisted through the collapse commit (regression: the inline
    # manifest used to drop it, so a reopened handle fell back to the default)
    t2 = LakeTable(spark, str(tmp_path / "t"), ["conv_id", "turn_idx"], n_buckets=32)
    assert t2.n_buckets == 4
    # post-compact the base holds exactly the live rows: the incremental sum
    # is exact for collapse tables too (round 4 — was permanently null)
    t.compact()
    lin = t.lineage()[-1]
    assert lin["table_checksum"] is not None
    assert lin["table_checksum"] == t.audit_checksum()
    # next delta commit → null again; next compact → exact again
    t.merge_into(b1, batch_id="b1", strategy="collapse")
    assert t.lineage()[-1]["table_checksum"] is None
    t.compact()
    assert t.lineage()[-1]["table_checksum"] == t.audit_checksum()


def test_overwrite_rejects_raw_sign_data(spark, tmp_path):
    import pytest
    from data_sync_tool_spark.sources.lake import SIGN_COL

    t = LakeTable(spark, str(tmp_path / "t"), ["k"], n_buckets=2)
    raw = spark.createDataFrame([(1, "x", 1), (1, "x", -1)], f"k long, v string, {SIGN_COL} int")
    with pytest.raises(ValueError, match="raw sign data"):
        t.overwrite(raw)


def test_digest_cache_covers_only_live_files(spark, ch, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), ["conv_id", "turn_idx"], n_buckets=4)
    for i, b in enumerate(_batches(ch, 3)):
        t.merge_into(b, batch_id=f"b{i}")
    m = t._load_manifest()
    live = set(t._files(m, None))
    assert set(m["file_digests"]) == live


def test_manifest_stays_bounded_over_many_commits(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), ["k"], n_buckets=2,
                  checksum=False, track_stats=False, idempotence_window=5)
    one = spark.createDataFrame([("a", "upsert", 1)], "k string, op string, lsn long")
    for i in range(12):
        t.merge_into(one.withColumn("lsn", F.lit(i).cast("long")), batch_id=f"b{i}")
    m = t._load_manifest()
    assert len(m["committed_batch_ids"]) == 5
    assert m["committed_batch_ids"][-1] == "b11"
    # recent replays are still deduped; ancient ids have aged out by contract
    assert t.merge_into(one, batch_id="b11").applied is False
    assert t.merge_into(one, batch_id="b7").applied is False
    with open(t._manifest_path(t.current_version())) as f:
        assert len(json.load(f)["committed_batch_ids"]) <= 5


def test_changes_since_feed_and_file_pruning(spark, ch, tmp_path):
    """changes_since(X): exactly the stored row versions with _lsn > X, op
    tagged, and files whose commit lsn-bound is <= X never open."""
    t = LakeTable(spark, str(tmp_path / "t"), ["conv_id", "turn_idx"],
                  n_buckets=4, merge_mode="mor")
    batches = _batches(ch, 3)
    bounds = []
    for i, b in enumerate(batches):
        r = b.agg(F.min("lsn"), F.max("lsn")).first()
        bounds.append((r[0], r[1]))
        t.merge_into(b, batch_id=f"b{i}")
    cutoff = bounds[1][1]  # everything after batch 1
    feed = t.changes_since(cutoff)
    # merge_into dedupes each batch to one stored version per key (LWW within
    # the batch), so the feed carries batch 2's distinct keys
    exp = batches[2].select("conv_id", "turn_idx").distinct().count()
    assert feed.count() == exp
    assert feed.filter(F.col("_lsn") <= cutoff).count() == 0
    assert set(r["op"] for r in feed.select("op").distinct().collect()) <= {"upsert", "delete"}
    # pruning: only files from the last commit qualify
    m = t._load_manifest()
    stats = m["file_stats"]
    qualifying = [f for f in t._files(m, None)
                  if f not in stats or stats[f]["lsn_max"] > cutoff]
    assert 0 < len(qualifying) < len(t._files(m, None))
    # files written by earlier commits all carry bounds <= cutoff
    # post-compact: history collapses, feed returns latest-only versions
    t.compact()
    feed2 = t.changes_since(cutoff)
    assert feed2.filter(F.col("_lsn") <= cutoff).count() == 0
