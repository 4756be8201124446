"""Concurrent-writer safety: a commit built against a stale manifest must
never silently drop another writer's files — maintenance (compact) REBASES
onto the advanced manifest; data merges fail loudly and retry."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_sync_tool_spark.sources.lake import ConcurrentWriteError, LakeTable

KEYS = ["conv_id", "turn_idx"]


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, lsn long, op string"
    )


def _inject_during_write(victim, action):
    """Run ``action`` once, between the victim's snapshot write and its
    manifest commit — the classic read-modify-write race window."""
    orig = victim._write_snapshot
    fired = [False]

    def hooked(df, **kw):
        out = orig(df, **kw)
        if not fired[0]:
            fired[0] = True
            action()
        return out

    victim._write_snapshot = hooked  # type: ignore[method-assign]
    return lambda: setattr(victim, "_write_snapshot", orig)


def test_merge_landing_during_compact_survives_via_rebase(spark, tmp_path):
    path = str(tmp_path / "t")
    a = LakeTable(spark, path, KEYS, n_buckets=2, merge_mode="mor")
    b = LakeTable(spark, path, KEYS, n_buckets=2, merge_mode="mor")
    a.merge_into(_mk(spark, [("x", 0, "v1", 1, "upsert"),
                             ("y", 0, "w1", 2, "upsert")]), "b0")
    a.merge_into(_mk(spark, [("x", 0, "v2", 3, "upsert")]), "b1")

    def racer():
        b.merge_into(_mk(spark, [("z", 0, "new", 4, "upsert"),
                                 ("x", 0, "v3", 5, "upsert")]), "race")

    restore = _inject_during_write(a, racer)
    try:
        res = a.compact()
    finally:
        restore()
    assert res.applied
    # the racer's rows survived the compact commit (rebase kept its delta)
    got = {(r.conv_id, r.text) for r in a.read().collect()}
    assert got == {("x", "v3"), ("y", "w1"), ("z", "new")}
    m = a._load_manifest()
    assert m["lineage"]["op"] == "compact"
    assert m["lineage"]["rebased_from"] < m["lineage"]["rebased_onto"]
    # folded pre-compact files are gone from the manifest; racer deltas pend
    assert any(e.get("delta") for e in m["buckets"].values())
    # and a follow-up compact (no race) folds the racer's delta too
    a.compact()
    assert {(r.conv_id, r.text) for r in a.read().collect()} == got


def test_stale_data_merge_raises_instead_of_clobbering(spark, tmp_path):
    path = str(tmp_path / "t")
    a = LakeTable(spark, path, KEYS, n_buckets=2, merge_mode="mor")
    b = LakeTable(spark, path, KEYS, n_buckets=2, merge_mode="mor")
    a.merge_into(_mk(spark, [("x", 0, "v1", 1, "upsert")]), "b0")

    def racer():
        b.merge_into(_mk(spark, [("r", 0, "racer", 2, "upsert")]), "race")

    restore = _inject_during_write(a, racer)
    try:
        with pytest.raises(ConcurrentWriteError, match="manifest advanced"):
            a.merge_into(_mk(spark, [("x", 0, "v2", 3, "upsert")]), "b1")
    finally:
        restore()
    # the racer's commit is intact; the stale merge left no manifest trace
    got = {(r.conv_id, r.text) for r in a.read().collect()}
    assert got == {("x", "v1"), ("r", "racer")}
    assert "b1" not in a.committed_batch_ids()
    # the standard recovery: retry the merge against the current state
    a.merge_into(_mk(spark, [("x", 0, "v2", 3, "upsert")]), "b1")
    assert {(r.conv_id, r.text) for r in a.read().collect()} == {
        ("x", "v2"), ("r", "racer")
    }

def test_compact_refuses_rebase_over_racing_purge(spark, tmp_path):
    """The optimistic rebase commutes only with additive merge appends. A
    purge landing mid-compact must ABORT the compact: its new base was
    built from the pre-purge snapshot, and blindly prepending it would
    resurrect the erased payload in the live view (RTBF violation)."""
    path = str(tmp_path / "t")
    a = LakeTable(spark, path, KEYS, n_buckets=2, merge_mode="mor")
    b = LakeTable(spark, path, KEYS, n_buckets=2, merge_mode="mor")
    a.merge_into(_mk(spark, [("x", 0, "secret", 1, "upsert"),
                             ("y", 0, "keep", 2, "upsert")]), "b0")
    a.merge_into(_mk(spark, [("y", 0, "keep2", 3, "upsert")]), "b1")

    restore = _inject_during_write(a, lambda: b.purge_keys(["x"]))
    try:
        with pytest.raises(ConcurrentWriteError, match="non-append"):
            a.compact()
    finally:
        restore()
    # purge won; the erased key never reappears — retry compacts cleanly
    assert {(r.conv_id, r.text) for r in a.read().collect()} == {("y", "keep2")}
    a.compact()
    assert {(r.conv_id, r.text) for r in a.read().collect()} == {("y", "keep2")}


def test_compact_refuses_rebase_over_racing_compact(spark, tmp_path):
    """Two compacts racing: the second rebase would prepend a SECOND base
    next to the first's (duplicate rows, and with no pending deltas read()
    skips the LWW resolve) — so the loser must raise, not rebase."""
    path = str(tmp_path / "t")
    a = LakeTable(spark, path, KEYS, n_buckets=2, merge_mode="mor")
    b = LakeTable(spark, path, KEYS, n_buckets=2, merge_mode="mor")
    a.merge_into(_mk(spark, [("x", 0, "v1", 1, "upsert")]), "b0")
    a.merge_into(_mk(spark, [("x", 0, "v2", 2, "upsert"),
                             ("y", 0, "w", 3, "upsert")]), "b1")

    restore = _inject_during_write(a, lambda: b.compact())
    try:
        with pytest.raises(ConcurrentWriteError, match="non-append"):
            a.compact()
    finally:
        restore()
    got = {(r.conv_id, r.text) for r in a.read().collect()}
    assert got == {("x", "v2"), ("y", "w")}
    # no duplicate rows served (the hazard a blind double-rebase creates)
    assert a.read().count() == 2


def test_manifest_publish_is_atomic_create_if_absent(spark, tmp_path):
    """The manifest publish must be create-if-absent (os.link semantics),
    not exists()+rename — rename silently clobbers a commit that landed
    between the check and the rename."""
    import os

    path = str(tmp_path / "t")
    a = LakeTable(spark, path, KEYS, n_buckets=2, merge_mode="mor")
    a.merge_into(_mk(spark, [("x", 0, "v1", 1, "upsert")]), "b0")
    # a racer publishes version 2 AFTER our current_version() read (pin the
    # read stale to land exactly in the check-then-publish window)
    nxt = a._manifest_path(2)
    with open(nxt, "w") as f:
        f.write('{"version": 2, "buckets": {}, "committed_batch_ids": []}')
    a.current_version = lambda: 1  # type: ignore[method-assign]
    with pytest.raises(RuntimeError, match="concurrent commit"):
        a._commit_manifest({"buckets": {}, "committed_batch_ids": []})
    # the racer's manifest was NOT overwritten, and no tmp files leak
    with open(nxt) as f:
        assert '"version": 2' in f.read()
    mdir = os.path.dirname(nxt)
    assert not [p for p in os.listdir(mdir) if p.startswith(".tmp-")]
