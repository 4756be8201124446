"""Mid-stream additive schema evolution: new tool/metadata columns appear in
later binlog segments; the standard Structured Streaming practice is to
restart the query with the evolved read schema (same checkpoint). The lake
table evolves additively and old rows read as NULL for new columns —
the north-star schema-evolution requirement, exercised end-to-end."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from data_sync_tool_spark.datagen import changelog_stream, write_stream_chunks
from data_sync_tool_spark.sources.lake import LakeTable
from data_sync_tool_spark.streaming.cdc import CHANGE_STREAM_SCHEMA, CdcPipeline

EVOLVED_SCHEMA = T.StructType(
    CHANGE_STREAM_SCHEMA.fields
    + [T.StructField("model", T.StringType()), T.StructField("meta_tokens", T.LongType())]
)


def test_stream_restart_with_evolved_schema(spark, tmp_path):
    ch = changelog_stream(spark, 1_000, n_convs=20, max_turns=8, num_partitions=4).cache()
    glob = f"{tmp_path}/seg-*/chunk-*"  # the log is a sequence of segment dirs
    # phase 1: original schema, first half of the stream
    write_stream_chunks(ch.filter(F.col("lsn") < 500), str(tmp_path / "seg-1"), n_chunks=2)
    table = LakeTable(spark, str(tmp_path / "t"), ["conv_id", "turn_idx"], n_buckets=4,
                      checksum=False)
    CdcPipeline(spark, glob, table, str(tmp_path / "ck"), name="evo").run_available()
    assert "model" not in table.read().columns

    # phase 2: producer evolves — later segments carry two new columns
    evolved = (
        ch.filter(F.col("lsn") >= 500)
        .withColumn("model", F.lit("m-2"))
        .withColumn("meta_tokens", (F.col("lsn") % 100).cast("long"))
    )
    write_stream_chunks(evolved, str(tmp_path / "seg-2"), n_chunks=2)
    # restart from the SAME checkpoint with the evolved read schema
    pipe2 = CdcPipeline(spark, glob, table, str(tmp_path / "ck"), name="evo",
                        schema=EVOLVED_SCHEMA)
    pipe2.run_available()

    out = table.read()
    assert {"model", "meta_tokens"} <= set(out.columns)
    # phase-1 rows read NULL for the new columns; phase-2 rows carry values
    assert out.filter(F.col("model").isNull() & (F.col("_lsn") < 500)).count() > 0
    assert out.filter((F.col("model") == "m-2") & (F.col("_lsn") >= 500)).count() > 0
    # no rows lost across the restart+evolution
    from data_sync_tool_spark.operators.dedupe import replay_final_state

    expect_keys = replay_final_state(ch, ["conv_id", "turn_idx"]).select("conv_id", "turn_idx")
    got_keys = out.select("conv_id", "turn_idx")
    assert got_keys.exceptAll(expect_keys).count() == 0
    assert expect_keys.exceptAll(got_keys).count() == 0


def test_history_dataframe(spark, tmp_path):
    ch = changelog_stream(spark, 400, n_convs=10, max_turns=8, num_partitions=2)
    t = LakeTable(spark, str(tmp_path / "t"), ["conv_id", "turn_idx"], n_buckets=4)
    t.merge_into(ch.filter(F.col("lsn") < 200), batch_id="a",
                 lineage_extra={"offset_min": 0, "offset_max": 199})
    t.merge_into(ch.filter(F.col("lsn") >= 200), batch_id="b",
                 lineage_extra={"offset_min": 200, "offset_max": 399})
    h = t.history()
    rows = {r.batch_id: r for r in h.collect()}
    assert rows["a"].version == 1 and rows["b"].version == 2
    assert rows["b"].offset_max == 399
    assert rows["a"].table_checksum is not None
