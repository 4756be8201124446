"""Lake→lake incremental sync (sources/sync.py): a downstream table follows
an upstream one through the pruned ``changes_since`` feed — convergence,
delete propagation, exactly-once idempotence, O(new commits) reads, atomic
watermark, schema evolution, and two-hop cascades."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_sync_tool_spark.sources.lake import LakeTable
from data_sync_tool_spark.sources.registry import changelog
from data_sync_tool_spark.sources.sync import (
    sync_step,
    sync_until_current,
    sync_watermark,
)

KEYS = ["conv_id", "turn_idx"]


@pytest.fixture(scope="module")
def ch(spark, sf_small):
    return changelog(spark, sf_small).cache()


def _batches(ch, n):
    hi = ch.agg(F.max("lsn")).first()[0] + 1
    return [
        ch.filter((F.col("lsn") >= i * hi // n) & (F.col("lsn") < (i + 1) * hi // n))
        for i in range(n)
    ]


def _rows(t: LakeTable):
    df = t.read()
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_sync_converges_per_step_and_propagates_deletes(spark, ch, tmp_path):
    src = LakeTable(spark, str(tmp_path / "src"), KEYS, n_buckets=4, merge_mode="mor")
    dst = LakeTable(spark, str(tmp_path / "dst"), KEYS, n_buckets=8, merge_mode="mor")
    for i, b in enumerate(_batches(ch, 3)):
        src.merge_into(b, batch_id=f"b{i}")
        res = sync_step(src, dst)
        assert res is not None and res.applied
        # after every step the follower's live state equals the leader's
        assert _rows(dst) == _rows(src)
    # the change stream contains deletes; they must have propagated, i.e.
    # the follower holds strictly fewer live rows than distinct keys seen
    n_keys = ch.select(*KEYS).distinct().count()
    assert dst.read().count() < n_keys
    # watermark reached the stream head
    assert sync_watermark(dst) == ch.agg(F.max("lsn")).first()[0]


def test_sync_step_is_idempotent_and_exactly_once(spark, ch, tmp_path):
    src = LakeTable(spark, str(tmp_path / "src"), KEYS, n_buckets=4, merge_mode="mor")
    dst = LakeTable(spark, str(tmp_path / "dst"), KEYS, n_buckets=4, merge_mode="mor")
    src.merge_into(_batches(ch, 2)[0], batch_id="b0")
    assert sync_step(src, dst) is not None
    v = dst.current_version()
    # nothing new → no-op, no commit
    assert sync_step(src, dst) is None
    assert dst.current_version() == v
    # a replayed batch id (crash-after-commit redelivery) also no-ops
    wm = sync_watermark(dst)
    res = dst.merge_into(
        src.changes_since(-1).withColumnRenamed("_lsn", "lsn"),
        batch_id=f"lake_sync:sync:lsn{wm}",
        op_col="op",
        lsn_col="lsn",
    )
    assert not res.applied
    assert dst.current_version() == v


def test_sync_reads_only_new_commits(spark, ch, tmp_path):
    """The feed probe + merge must open only files from commits newer than
    the watermark — O(new commits), not O(table)."""
    src = LakeTable(spark, str(tmp_path / "src"), KEYS, n_buckets=4, merge_mode="mor")
    dst = LakeTable(spark, str(tmp_path / "dst"), KEYS, n_buckets=4, merge_mode="mor")
    batches = _batches(ch, 4)
    for i, b in enumerate(batches[:3]):
        src.merge_into(b, batch_id=f"b{i}")
    sync_until_current(src, dst)
    src.merge_into(batches[3], batch_id="b3")
    opened: list[str] = []
    orig = src._read_files

    def spy(files, schema):
        opened.extend(files)
        return orig(files, schema)

    src._read_files = spy  # type: ignore[method-assign]
    try:
        assert sync_step(src, dst) is not None
    finally:
        src._read_files = orig  # type: ignore[method-assign]
    m = src._load_manifest()
    last_commit_files = {
        f for f, st in m["file_stats"].items()
        if st.get("lsn_max", 0) > sync_watermark(dst, "sync") - 1
    }
    all_files = set(src._files(m, None))
    # every opened file belongs to the new commit's lsn window (two jobs run
    # over the feed — probe + merge — so files may appear twice)
    assert set(opened) <= last_commit_files
    assert len(last_commit_files) < len(all_files)
    assert _rows(dst) == _rows(src)


def test_sync_schema_evolution_propagates(spark, ch, tmp_path):
    src = LakeTable(spark, str(tmp_path / "src"), KEYS, n_buckets=2, merge_mode="mor")
    dst = LakeTable(spark, str(tmp_path / "dst"), KEYS, n_buckets=2, merge_mode="mor")
    b0, b1 = _batches(ch, 2)
    src.merge_into(b0, batch_id="b0")
    sync_until_current(src, dst)
    assert "review_score" not in dst.read().columns
    src.merge_into(
        b1.withColumn("review_score", F.length("text").cast("double")),
        batch_id="b1",
    )
    sync_until_current(src, dst)
    assert "review_score" in dst.read().columns
    assert _rows(dst) == _rows(src)


def test_sync_cascade_two_hops(spark, ch, tmp_path):
    a = LakeTable(spark, str(tmp_path / "a"), KEYS, n_buckets=4, merge_mode="mor")
    b = LakeTable(spark, str(tmp_path / "b"), KEYS, n_buckets=4, merge_mode="mor")
    c = LakeTable(spark, str(tmp_path / "c"), KEYS, n_buckets=2, merge_mode="cow")
    for i, batch in enumerate(_batches(ch, 3)):
        a.merge_into(batch, batch_id=f"b{i}")
        sync_until_current(a, b, name="a_to_b")
        sync_until_current(b, c, name="b_to_c")
    assert _rows(a) == _rows(b) == _rows(c)
    # each hop keeps its own watermark in its own target manifest
    assert sync_watermark(b, "a_to_b") is not None
    assert sync_watermark(c, "b_to_c") is not None
    assert sync_watermark(c, "a_to_b") is None


def test_sync_survives_source_compaction(spark, ch, tmp_path):
    """Compacting the source between steps must not re-deliver or lose rows:
    the row-level _lsn filter (not file bounds) is authoritative."""
    src = LakeTable(spark, str(tmp_path / "src"), KEYS, n_buckets=4, merge_mode="mor")
    dst = LakeTable(spark, str(tmp_path / "dst"), KEYS, n_buckets=4, merge_mode="mor")
    batches = _batches(ch, 3)
    src.merge_into(batches[0], batch_id="b0")
    sync_until_current(src, dst)
    src.compact()
    # compaction produced no new row versions → nothing to sync
    assert sync_step(src, dst) is None
    src.merge_into(batches[1], batch_id="b1")
    src.merge_into(batches[2], batch_id="b2")
    src.compact()  # history collapses to latest-only versions — still > wm
    sync_until_current(src, dst)
    assert _rows(dst) == _rows(src)


def test_sync_key_mismatch_rejected(spark, tmp_path):
    src = LakeTable(spark, str(tmp_path / "src"), ["conv_id"], n_buckets=2)
    dst = LakeTable(spark, str(tmp_path / "dst"), KEYS, n_buckets=2)
    with pytest.raises(ValueError, match="matching keys"):
        sync_step(src, dst)


def test_filtered_replica_tracks_membership_changes(spark, tmp_path):
    """row_filter makes the follower a filtered replica: rows entering the
    predicate appear, rows leaving it are DELETED downstream (not left
    stale), and the final state equals the filtered LWW state."""
    src = LakeTable(spark, str(tmp_path / "src"), KEYS, n_buckets=2, merge_mode="mor")
    dst = LakeTable(spark, str(tmp_path / "dst"), KEYS, n_buckets=2, merge_mode="mor")
    flt = F.col("text").startswith("keep")

    def mk(rows):
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string, lsn long, op string"
        )

    src.merge_into(mk([("a", 0, "keep v1", 1, "upsert"),
                       ("b", 0, "drop v1", 2, "upsert")]), "b0")
    sync_until_current(src, dst, row_filter=flt)
    assert {r.conv_id for r in dst.read().collect()} == {"a"}
    # a leaves the filter; b enters it; c arrives in-filter then is deleted
    src.merge_into(mk([("a", 0, "drop v2", 3, "upsert"),
                       ("b", 0, "keep v2", 4, "upsert"),
                       ("c", 0, "keep v1", 5, "upsert")]), "b1")
    src.merge_into(mk([("c", 0, None, 6, "delete")]), "b2")
    sync_until_current(src, dst, row_filter=flt)
    got = {(r.conv_id, r.text) for r in dst.read().collect()}
    assert got == {("b", "keep v2")}
    # equals filtering the source's live state directly
    want = {(r.conv_id, r.text)
            for r in src.read().filter(flt).collect()}
    assert got == want

def test_bounded_sync_drains_fully_replayed_source_stepwise(spark, ch, tmp_path):
    """``max_lsn`` = Kafka endOffsets-style bounded catch-up: draining an
    ALREADY fully-replayed source window-by-window must produce, after each
    bound, the same follower state as a follower that synced interleaved
    with ingest — and the same final state."""
    src = LakeTable(spark, str(tmp_path / "src"), KEYS, n_buckets=4, merge_mode="mor")
    live = LakeTable(spark, str(tmp_path / "live"), KEYS, n_buckets=8, merge_mode="mor")
    batches = _batches(ch, 3)
    his = []
    for i, b in enumerate(batches):
        src.merge_into(b, batch_id=f"b{i}")
        his.append(b.agg(F.max("lsn")).first()[0])
    # interleaved reference follower
    for i, b in enumerate(batches):
        live.merge_into(b, batch_id=f"b{i}")
    # bounded follower: source is fully replayed BEFORE any sync runs
    dst = LakeTable(spark, str(tmp_path / "dst"), KEYS, n_buckets=8, merge_mode="mor")
    for hi in his:
        res = sync_step(src, dst, max_lsn=int(hi))
        assert res is not None and res.applied
        assert sync_watermark(dst) == int(hi)  # watermark stops AT the bound
    assert _rows(dst) == _rows(src) == _rows(live)
    # nothing left past the last bound
    assert sync_step(src, dst) is None


def test_bounded_sync_merges_no_rows_past_the_bound(spark, ch, tmp_path):
    src = LakeTable(spark, str(tmp_path / "src"), KEYS, n_buckets=4, merge_mode="mor")
    src.merge_into(ch, batch_id="all")
    mid = int(ch.agg(F.max("lsn")).first()[0]) // 2
    dst = LakeTable(spark, str(tmp_path / "dst"), KEYS, n_buckets=4, merge_mode="mor")
    sync_until_current(src, dst, max_lsn=mid)
    assert dst.read(include_deleted=True).filter(F.col("_lsn") > mid).count() == 0
    assert sync_watermark(dst) == mid or sync_watermark(dst) <= mid
