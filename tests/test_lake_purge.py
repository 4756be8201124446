"""Privacy erasure (``LakeTable.purge_keys``): hard-delete of every stored
row version of a key — bounded rewrite via bucket/bloom pruning, history
truncation via vacuum, and no trace left in any on-disk parquet file."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from data_sync_tool_spark.sources.lake import LakeTable

KEYS = ["conv_id", "turn_idx"]


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, lsn long, op string"
    )


def _disk_values(table_path: str, column: str) -> set:
    """Every value of ``column`` in every parquet file under the table —
    the forensic check: erasure means the bytes are GONE, not hidden."""
    vals: set = set()
    for f in glob.glob(os.path.join(table_path, "**", "*.parquet"), recursive=True):
        t = pq.read_table(f, columns=[column])
        vals.update(t.column(column).to_pylist())
    return vals


def test_purge_removes_every_trace_and_truncates_history(spark, tmp_path):
    path = str(tmp_path / "t")
    t = LakeTable(spark, path, KEYS, n_buckets=4, merge_mode="mor")
    t.merge_into(
        _mk(spark, [("secret", 0, "pii v1", 1, "upsert"),
                    ("keep", 0, "fine", 2, "upsert")]), "b0",
    )
    t.merge_into(
        _mk(spark, [("secret", 0, "pii v2", 3, "upsert"),
                    ("secret", 1, "more pii", 4, "upsert"),
                    ("keep", 1, "also fine", 5, "upsert")]), "b1",
    )
    assert "secret" in _disk_values(path, "conv_id")
    report = t.purge_keys(["secret"])
    assert report["committed"] and report["rows_purged"] == 3
    assert report["vacuum"]["removed_files"] > 0
    # live view: only the other key, fully intact (LWW across its versions)
    got = {(r.conv_id, r.turn_idx, r.text) for r in t.read().collect()}
    assert got == {("keep", 0, "fine"), ("keep", 1, "also fine")}
    # deleted view too — purge removes tombstones and versions, not hides them
    assert "secret" not in {
        r.conv_id for r in t.read(include_deleted=True).collect()
    }
    # forensic: no parquet file under the table contains the key anywhere
    assert "secret" not in _disk_values(path, "conv_id")
    # history is truncated: pre-purge versions are unreadable
    with pytest.raises(ValueError, match="expired"):
        t.read(version=1)


def test_purge_rewrite_is_bounded_by_bucket_and_bloom_pruning(spark, tmp_path):
    t = LakeTable(
        spark, str(tmp_path / "t"), KEYS, n_buckets=8,
        merge_mode="mor", bloom_filters=True,
    )
    # 6 commits × 30 convs → many delta files spread over all buckets
    for batch in range(6):
        rows = [(f"c{i:03d}", batch, f"text {i} {batch}", batch * 100 + i, "upsert")
                for i in range(30)]
        t.merge_into(_mk(spark, rows), f"b{batch}")
    m = t._load_manifest()
    total_files = len(t._files(m, None))
    before_files = set(t._files(m, None))
    report = t.purge_keys(["c007"], vacuum_history=False)
    assert report["committed"]
    assert report["rows_purged"] == 6  # one row per commit
    # bucket pruning alone caps the rewrite at one bucket's files; blooms
    # prune further within it — far below the table's file count
    assert 0 < report["files_rewritten"] < total_files / 4
    # unaffected files are re-referenced verbatim (no churn outside the probe)
    m2 = t._load_manifest()
    after_files = set(t._files(m2, None))
    assert len(before_files - after_files) == report["files_rewritten"]
    # every remaining conversation still resolves
    assert {r.conv_id for r in t.read().collect()} == {
        f"c{i:03d}" for i in range(30) if i != 7
    }


def test_purge_preserves_pending_versions_and_checksum(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), KEYS, n_buckets=2, merge_mode="mor")
    t.merge_into(_mk(spark, [("a", 0, "v1", 1, "upsert"),
                             ("x", 0, "gone", 2, "upsert")]), "b0")
    # unresolved second version of 'a' pending in a delta file
    t.merge_into(_mk(spark, [("a", 0, "v2", 3, "upsert")]), "b1")
    t.purge_keys(["x"])
    assert [(r.conv_id, r.text) for r in t.read().collect()] == [("a", "v2")]
    # MoR machinery is intact post-purge: compact folds, checksum resolves
    t.compact()
    assert [(r.conv_id, r.text) for r in t.read().collect()] == [("a", "v2")]
    assert t.audit_checksum() == t.lineage(1)[0]["table_checksum"]


def test_purge_removes_expired_key_history_even_with_no_affected_files(spark, tmp_path):
    path = str(tmp_path / "t")
    t = LakeTable(spark, path, KEYS, n_buckets=2, merge_mode="mor")
    t.merge_into(_mk(spark, [("secret", 0, "pii", 1, "upsert"),
                             ("keep", 0, "fine", 2, "upsert")]), "b0")
    t.merge_into(_mk(spark, [("secret", 0, None, 3, "delete")]), "b1")
    t.compact()
    t.expire_tombstones(older_than_lsn=10)
    # the current snapshot no longer stores the key at all...
    assert "secret" not in {
        r.conv_id for r in t.read(include_deleted=True).collect()
    }
    # ...but historical files still do — purge must erase them via vacuum
    assert "secret" in _disk_values(path, "conv_id")
    report = t.purge_keys(["secret"])
    assert not report["committed"]  # no live file to rewrite
    assert "secret" not in _disk_values(path, "conv_id")
    assert {r.conv_id for r in t.read().collect()} == {"keep"}


def test_purge_without_vacuum_defers_history_truncation(spark, tmp_path):
    path = str(tmp_path / "t")
    t = LakeTable(spark, path, KEYS, n_buckets=2)
    t.merge_into(_mk(spark, [("secret", 0, "pii", 1, "upsert")]), "b0")
    t.purge_keys(["secret"], vacuum_history=False)
    assert t.read().count() == 0
    # old version still readable (and still holds the payload on disk)
    assert {r.conv_id for r in t.read(version=1).collect()} == {"secret"}
    assert "secret" in _disk_values(path, "conv_id")
    t.vacuum(keep_last=1)
    assert "secret" not in _disk_values(path, "conv_id")


def test_purge_noops_on_empty_input_and_empty_table(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), KEYS, n_buckets=2)
    assert t.purge_keys(["a"]) == {
        "version": 0, "committed": False, "files_rewritten": 0, "rows_purged": 0,
    }
    t.merge_into(_mk(spark, [("a", 0, "v", 1, "upsert")]), "b0")
    v = t.current_version()
    assert not t.purge_keys([])["committed"]
    assert t.current_version() == v  # no commit, no vacuum


def test_purge_on_collapse_strategy_removes_sign_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    t = LakeTable(spark, path, KEYS, n_buckets=2, merge_mode="mor")
    t.merge_into(_mk(spark, [("s", 0, "pii", 1, "upsert"),
                             ("k", 0, "fine", 2, "upsert")]),
                 "b0", strategy="collapse")
    t.merge_into(_mk(spark, [("s", 0, "pii v2", 3, "upsert")]),
                 "b1", strategy="collapse")
    report = t.purge_keys(["s"])
    assert report["committed"] and report["rows_purged"] >= 2
    assert "s" not in _disk_values(path, "conv_id")
    assert [(r.conv_id, r.text) for r in t.read().collect()] == [("k", "fine")]


def test_purge_where_resolves_keys_from_live_rows(spark, tmp_path):
    """Predicate purge is key-based: it erases keys whose LIVE row matches,
    including their non-matching old versions — and never touches keys
    whose only match is a superseded version (version-level removal would
    resurrect the older row)."""
    path = str(tmp_path / "t")
    t = LakeTable(spark, path, KEYS, n_buckets=2, merge_mode="mor")
    t.merge_into(_mk(spark, [
        ("gone", 0, "clean v1", 1, "upsert"),    # live row will match
        ("stays", 0, "pii draft", 2, "upsert"),  # old version matches...
        ("other", 0, "clean", 3, "upsert"),
    ]), "b0")
    t.merge_into(_mk(spark, [
        ("gone", 0, "pii final", 4, "upsert"),
        ("stays", 0, "clean v2", 5, "upsert"),   # ...but live row does not
    ]), "b1")
    import pyspark.sql.functions as F

    report = t.purge_where(F.col("text").contains("pii"))
    assert report["committed"]
    got = {(r.conv_id, r.text) for r in t.read().collect()}
    assert got == {("stays", "clean v2"), ("other", "clean")}
    # 'gone' erased entirely (both versions); 'stays' kept with live text.
    # Its matching OLD version survives only until compaction/vacuum of
    # history - which purge already ran - so no pii remains on disk:
    vals = _disk_values(path, "text")
    assert not any("pii final" in v for v in vals if v)
    assert ("gone", 0) not in {(r.conv_id, r.turn_idx)
                               for r in t.read(include_deleted=True).collect()}

    with pytest.raises(ValueError, match="more than"):
        t.purge_where(F.lit(True), max_keys=1)
