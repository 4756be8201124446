"""Incremental materialized aggregate views (``sources/agg_view.py``):
refresh re-aggregates only affected groups from the pruned change feed,
and the view always equals the full GROUP BY of the source's live state."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_sync_tool_spark.sources.agg_view import agg_view_watermark, refresh_agg_view
from data_sync_tool_spark.sources.lake import LakeTable

KEYS = ["conv_id", "turn_idx"]

def _aggs():
    # built lazily: Column construction needs an active SparkContext
    return {
        "n_turns": F.count(F.lit(1)),
        "total_chars": F.sum(F.length("text")),
        "max_turn": F.max("turn_idx"),  # retraction-hostile: shrinks on delete
    }


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, lsn long, op string"
    )


def _full(src):
    return {
        (r.conv_id, r.n_turns, r.total_chars, r.max_turn)
        for r in src.read()
        .groupBy("conv_id")
        .agg(*[expr.alias(out) for out, expr in _aggs().items()])
        .collect()
    }


def _view(view):
    return {
        (r.conv_id, r.n_turns, r.total_chars, r.max_turn)
        for r in view.read().collect()
    }


def _tables(spark, tmp_path, **src_kw):
    src = LakeTable(spark, str(tmp_path / "src"), KEYS,
                    n_buckets=4, merge_mode="mor", **src_kw)
    view = LakeTable(spark, str(tmp_path / "view"), ["conv_id"], n_buckets=2)
    return src, view


def test_bootstrap_and_incremental_match_full_recompute(spark, tmp_path):
    src, view = _tables(spark, tmp_path)
    src.merge_into(_mk(spark, [
        ("a", 0, "hello", 1, "upsert"), ("a", 1, "world!", 2, "upsert"),
        ("b", 0, "hi", 3, "upsert"),
    ]), "b0")
    assert refresh_agg_view(src, view, _aggs()) is not None
    assert _view(view) == _full(src) == {("a", 2, 11, 1), ("b", 1, 2, 0)}
    # update shrinks a contribution; delete removes the max turn of 'a'
    src.merge_into(_mk(spark, [
        ("a", 1, None, 4, "delete"), ("b", 0, "longer text", 5, "upsert"),
        ("c", 0, "new", 6, "upsert"),
    ]), "b1")
    assert refresh_agg_view(src, view, _aggs()) is not None
    assert _view(view) == _full(src) == {
        ("a", 1, 5, 0), ("b", 1, 11, 0), ("c", 1, 3, 0),
    }
    # nothing new -> no commit, watermark unchanged
    wm = agg_view_watermark(view)
    assert refresh_agg_view(src, view, _aggs()) is None
    assert agg_view_watermark(view) == wm == 6


def test_vanished_group_is_deleted_from_view(spark, tmp_path):
    src, view = _tables(spark, tmp_path)
    src.merge_into(_mk(spark, [("a", 0, "x", 1, "upsert"),
                               ("b", 0, "y", 2, "upsert")]), "b0")
    refresh_agg_view(src, view, _aggs())
    src.merge_into(_mk(spark, [("b", 0, None, 3, "delete")]), "b1")
    refresh_agg_view(src, view, _aggs())
    assert {r.conv_id for r in view.read().collect()} == {"a"}
    assert _view(view) == _full(src)


def test_refresh_reads_only_affected_groups(spark, tmp_path):
    """Post-bootstrap refreshes must not rescan the table: the feed is
    lsn-pruned and the recompute is bloom-pruned to the touched groups."""
    src, view = _tables(spark, tmp_path, bloom_filters=True)
    rows = [(f"c{i:03d}", t, f"text {i} {t}", i * 10 + t, "upsert")
            for i in range(40) for t in range(3)]
    src.merge_into(_mk(spark, rows), "b0")
    refresh_agg_view(src, view, _aggs())
    src.merge_into(_mk(spark, [("c007", 3, "new turn", 9999, "upsert")]), "b1")
    opened: list[str] = []
    orig = src._read_files

    def spy(files, schema):
        opened.extend(files)
        return orig(files, schema)

    src._read_files = spy  # type: ignore[method-assign]
    try:
        assert refresh_agg_view(src, view, _aggs()) is not None
    finally:
        src._read_files = orig  # type: ignore[method-assign]
    all_files = set(src._files(src._load_manifest(), None))
    # feed probe opens the new commit's files; the recompute opens c007's
    # bucket (bloom-pruned) — never the whole table
    assert len(set(opened)) < len(all_files)
    assert _view(view) == _full(src)


def test_semi_join_fallback_above_max_probe_keys(spark, tmp_path):
    src, view = _tables(spark, tmp_path)
    src.merge_into(_mk(spark, [(f"c{i}", 0, f"t{i}", i, "upsert")
                               for i in range(10)]), "b0")
    refresh_agg_view(src, view, _aggs())
    src.merge_into(_mk(spark, [(f"c{i}", 1, f"u{i}", 100 + i, "upsert")
                               for i in range(10)]), "b1")
    # 10 affected groups > max_probe_keys=3 -> scan + semi-join path
    assert refresh_agg_view(src, view, _aggs(), max_probe_keys=3) is not None
    assert _view(view) == _full(src)


def test_row_filter_defines_view_membership(spark, tmp_path):
    src, view = _tables(spark, tmp_path)
    src.merge_into(_mk(spark, [
        ("a", 0, "keep", 1, "upsert"), ("a", 1, "drop", 2, "upsert"),
        ("b", 0, "drop", 3, "upsert"),
    ]), "b0")
    flt = F.col("text") == "keep"
    refresh_agg_view(src, view, _aggs(), row_filter=flt)
    # 'b' has no qualifying rows -> no view row at all
    assert {(r.conv_id, r.n_turns) for r in view.read().collect()} == {("a", 1)}
    # an update moving a's last qualifying row out of the filter deletes it
    src.merge_into(_mk(spark, [("a", 0, "drop too", 4, "upsert")]), "b1")
    refresh_agg_view(src, view, _aggs(), row_filter=flt)
    assert view.read().count() == 0


def test_replayed_refresh_window_is_exactly_once(spark, tmp_path):
    src, view = _tables(spark, tmp_path)
    src.merge_into(_mk(spark, [("a", 0, "x", 1, "upsert")]), "b0")
    refresh_agg_view(src, view, _aggs())
    v = view.current_version()
    # crash-replay: same lsn window re-applied directly hits the batch-id
    # dedupe in the view's manifest
    batch = view.read().withColumn("op", F.lit("upsert")).withColumn("lsn", F.lit(1))
    res = view.merge_into(batch, batch_id="agg_view:aggview:lsn1")
    assert not res.applied and view.current_version() == v


def test_validates_view_keys_and_aggs(spark, tmp_path):
    src, _ = _tables(spark, tmp_path)
    bad = LakeTable(spark, str(tmp_path / "bad"), ["other"], n_buckets=2)
    with pytest.raises(ValueError, match="first key column"):
        refresh_agg_view(src, bad, _aggs())
    good = LakeTable(spark, str(tmp_path / "v2"), ["conv_id"], n_buckets=2)
    with pytest.raises(ValueError, match="at least one aggregate"):
        refresh_agg_view(src, good, {})
    # source never committed -> None, no view commit
    assert refresh_agg_view(src, good, _aggs()) is None


def test_streaming_pipeline_refreshes_view_per_epoch(spark, tmp_path):
    """CdcPipeline(agg_views=[spec]) keeps the rollup in lockstep with
    ingest, surviving a crash-resume mid-stream."""
    from data_sync_tool_spark.datagen import changelog_stream, write_stream_chunks
    from data_sync_tool_spark.sources.agg_view import AggViewSpec
    from data_sync_tool_spark.streaming.cdc import CdcPipeline

    d = tmp_path / "binlog"
    ch = changelog_stream(spark, 2_000, n_convs=60, max_turns=12)
    write_stream_chunks(ch, str(d), n_chunks=4)
    src = LakeTable(spark, str(tmp_path / "tbl"), KEYS, n_buckets=4,
                    merge_mode="mor", checksum=False)
    view = LakeTable(spark, str(tmp_path / "view"), ["conv_id"], n_buckets=2,
                     checksum=False)
    spec = AggViewSpec(view=view, aggs=_aggs())
    pipe = CdcPipeline(spark, f"{d}/chunk-*", src, str(tmp_path / "ckpt"),
                       name="av", agg_views=[spec])
    # crash after 2 epochs, then resume: the replayed epoch's refresh
    # dedupes by lsn-window batch id
    pipe.run_available(stop_after_batches=2)
    pipe2 = CdcPipeline(spark, f"{d}/chunk-*", src, str(tmp_path / "ckpt"),
                        name="av", agg_views=[spec])
    pipe2.run_available()
    assert _view(view) == _full(src)
    assert agg_view_watermark(view) is not None


def test_transcript_agg_view_matches_batch_assembler(spark, tmp_path):
    """transcript_agg inside refresh_agg_view renders exactly what the
    batch assembler renders over the same final state."""
    from data_sync_tool_spark.operators.transcripts import (
        assemble_transcripts,
        transcript_agg,
    )

    src, _ = _tables(spark, tmp_path)
    view = LakeTable(spark, str(tmp_path / "tv"), ["conv_id"], n_buckets=2)
    src.merge_into(_mk(spark, [
        ("a", 1, "world", 1, "upsert"), ("a", 0, "hello", 2, "upsert"),
        ("b", 0, "hi", 3, "upsert"),
    ]), "b0")
    # an update re-renders 'a'; deleting b's only turn removes its view row
    src.merge_into(_mk(spark, [("a", 1, "there", 4, "upsert"),
                               ("b", 0, None, 5, "delete")]), "b1")
    # the test schema has no role column — conv_id stands in for it
    refresh_agg_view(src, view, {"transcript": transcript_agg(role_col="conv_id",
                                                              text_col="text")})
    want = {
        (r.conv_id, r.transcript)
        for r in assemble_transcripts(src.read(), role_col="conv_id").select(
            "conv_id", "transcript").collect()
    }
    got = {(r.conv_id, r.transcript) for r in view.read().collect()}
    assert got == want == {("a", "a: hello\na: there")}

def test_bounded_refresh_stepwise_equals_interleaved(spark, tmp_path):
    """``max_lsn`` bounded refresh against a FULLY-replayed source: the
    bootstrap aggregates the LWW state as-of the bound (resolved from the
    bounded feed, since the live table is already past it), later windows
    refresh only their affected groups, and the final view equals the full
    GROUP BY of the final LWW state."""
    rows = [
        ("a", 0, "a0", 1, "upsert"),
        ("b", 0, "b0", 2, "upsert"),
        ("a", 1, "a1", 3, "upsert"),
        ("a", 0, "a0v2", 4, "upsert"),   # window 2: update
        ("b", 0, None, 5, "delete"),     # window 2: group vanishes
        ("c", 0, "c0", 6, "upsert"),     # window 3: new group
        ("a", 1, None, 7, "delete"),     # window 3: retraction-hostile max
    ]
    src = LakeTable(spark, str(tmp_path / "src"), KEYS, n_buckets=2, merge_mode="mor")
    # fully replayed up front, in the same commit windows the bounds target
    # (max_lsn is faithful at COMMIT granularity: a merge batch stores only
    # its within-batch LWW winners, like any table-format changelog)
    lo = 0
    for i, hi in enumerate((3, 5, 7)):
        src.merge_into(_mk(spark, [r for r in rows if lo < r[3] <= hi]),
                       batch_id=f"src-w{i}")
        lo = hi
    view = LakeTable(spark, str(tmp_path / "view"), ["conv_id"], n_buckets=2)
    for hi in (3, 5, 7):
        refresh_agg_view(src, view, _aggs(), max_lsn=hi)
        assert agg_view_watermark(view) == hi
    assert _view(view) == _full(src)
    # the first bounded refresh must NOT have seen past its bound: replay
    # the same windows into a fresh interleaved pair and compare per-step
    src2 = LakeTable(spark, str(tmp_path / "src2"), KEYS, n_buckets=2, merge_mode="mor")
    view2 = LakeTable(spark, str(tmp_path / "view2"), ["conv_id"], n_buckets=2)
    lo = 0
    for i, hi in enumerate((3, 5, 7)):
        batch = [r for r in rows if lo < r[3] <= hi]
        src2.merge_into(_mk(spark, batch), batch_id=f"w{i}")
        refresh_agg_view(src2, view2, _aggs())
        lo = hi
    assert _view(view2) == _view(view)


def test_bounded_refresh_bootstrap_state_is_as_of_bound(spark, tmp_path):
    """A view bootstrapped with max_lsn and never refreshed again must show
    the as-of-bound state, not the final one (the live read would)."""
    rows = [
        ("a", 0, "old", 1, "upsert"),
        ("a", 0, "new", 2, "upsert"),
        ("b", 0, "late", 3, "upsert"),
    ]
    src = LakeTable(spark, str(tmp_path / "src"), KEYS, n_buckets=2, merge_mode="mor")
    src.merge_into(_mk(spark, rows[:1]), batch_id="w0")
    src.merge_into(_mk(spark, rows[1:]), batch_id="w1")
    view = LakeTable(spark, str(tmp_path / "view"), ["conv_id"], n_buckets=2)
    refresh_agg_view(src, view, {"txt": F.max("text")}, max_lsn=1)
    got = {(r.conv_id, r.txt) for r in view.read().collect()}
    assert got == {("a", "old")}  # neither lsn 2's value nor group b leaked
