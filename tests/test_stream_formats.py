"""Alternate binlog segment formats (JSON-lines, CSV) through the same CDC
loop — source-format coverage beyond parquet."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_sync_tool_spark.datagen import changelog_stream
from data_sync_tool_spark.operators.dedupe import replay_final_state
from data_sync_tool_spark.sources.lake import LakeTable
from data_sync_tool_spark.streaming.cdc import CdcPipeline


@pytest.fixture(scope="module")
def ch(spark):
    return changelog_stream(spark, 600, n_convs=15, max_turns=8, num_partitions=4).cache()


@pytest.mark.parametrize("fmt", ["json", "csv"])
def test_cdc_over_text_formats(spark, ch, tmp_path, fmt):
    d = tmp_path / "log"
    writer = ch.repartition(4).write.mode("overwrite")
    if fmt == "json":
        writer.json(str(d / "chunk-00000"))
    else:
        writer.option("header", "true").csv(str(d / "chunk-00000"))
    table = LakeTable(spark, str(tmp_path / "t"), ["conv_id", "turn_idx"], n_buckets=4,
                      checksum=False)
    pipe = CdcPipeline(
        spark, f"{d}/chunk-*", table, str(tmp_path / "ck"), name=f"fmt-{fmt}",
        source_format=fmt, max_files_per_trigger=None,
    )
    m = pipe.run_available()
    assert m.total_events == 600
    got = table.read().drop("_lsn")
    expect = replay_final_state(ch, ["conv_id", "turn_idx"])
    if fmt == "csv":
        # CSV has no native NULL: empty string round-trips as NULL already,
        # but timestamps keep microseconds via the default writer format
        pass
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0
