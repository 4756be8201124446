"""Snapshot export (``LakeTable.export_snapshot``): the resolved live view
published as plain parquet + a publication marker."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from data_sync_tool_spark.sources.lake import LakeTable

KEYS = ["conv_id", "turn_idx"]


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, lsn long, op string"
    )


def test_export_matches_live_view_and_time_travels(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), KEYS, n_buckets=4, merge_mode="mor")
    t.merge_into(
        _mk(spark, [("a", 0, "v1", 1, "upsert"), ("b", 0, "x", 2, "upsert")]), "b0"
    )
    t.merge_into(
        _mk(spark, [("a", 0, "v2", 3, "upsert"), ("b", 0, None, 4, "delete")]), "b1"
    )
    dest = str(tmp_path / "pub")
    marker = t.export_snapshot(dest)
    assert marker["rows"] == 1 and marker["source_version"] == t.current_version()
    got = spark.read.parquet(dest).collect()
    assert [(r.conv_id, r.turn_idx, r.text) for r in got] == [("a", 0, "v2")]
    # no system columns leak into the published schema
    assert not [c for c in spark.read.parquet(dest).columns if c.startswith("_")]
    # marker exists (publication signal)
    with open(os.path.join(dest, "_export.json")) as f:
        assert json.load(f)["rows"] == 1
    # time-traveled export: version 1 predates the update/delete
    dest1 = str(tmp_path / "pub_v1")
    m1 = t.export_snapshot(dest1, version=1)
    assert m1["rows"] == 2
    assert {r.text for r in spark.read.parquet(dest1).collect()} == {"v1", "x"}


def test_export_partitioned_and_empty_table_rejected(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), KEYS, n_buckets=2)
    with pytest.raises(ValueError, match="nothing to export"):
        t.export_snapshot(str(tmp_path / "nope"))
    rows = [(f"c{i}", 0, f"t{i}", i, "upsert") for i in range(20)]
    t.merge_into(_mk(spark, rows), "b0")
    dest = str(tmp_path / "pub")
    marker = t.export_snapshot(dest, partition_by=["conv_id"])
    assert marker["rows"] == 20
    df = spark.read.parquet(dest)
    assert df.count() == 20
    # partition pruning works on the published layout
    assert df.filter(F.col("conv_id") == "c7").count() == 1


def test_export_time_slice_via_ranges(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), KEYS, n_buckets=2,
                  merge_mode="mor", stats_columns=["turn_idx"])
    rows = [(f"c{i}", i, f"t{i}", i, "upsert") for i in range(40)]
    t.merge_into(_mk(spark, rows), "b0")
    t.compact()
    dest = str(tmp_path / "slice")
    marker = t.export_snapshot(dest, ranges={"turn_idx": [(10, 20)]})
    assert marker["rows"] == 10
    got = spark.read.parquet(dest)
    assert got.count() == 10
    assert {r.conv_id for r in got.collect()} == {f"c{i}" for i in range(10, 20)}

def test_export_as_of_marker_records_resolved_version(spark, tmp_path):
    """With as_of, the marker's source_version must be the RESOLVED (older)
    version the data came from, not the table's current version."""
    import time

    t = LakeTable(spark, str(tmp_path / "t"), KEYS, n_buckets=2, merge_mode="mor")
    t.merge_into(_mk(spark, [("a", 0, "v1", 1, "upsert")]), "b0")
    cut = time.time()
    time.sleep(0.05)
    t.merge_into(_mk(spark, [("a", 0, "v2", 2, "upsert")]), "b1")
    dest = str(tmp_path / "pub")
    marker = t.export_snapshot(dest, as_of=cut)
    assert marker["source_version"] == 1 != t.current_version()
    assert [r.text for r in spark.read.parquet(dest).collect()] == ["v1"]
    with open(os.path.join(dest, "_export.json")) as f:
        assert json.load(f)["source_version"] == 1
