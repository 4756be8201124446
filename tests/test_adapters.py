"""Adapter registry, plugin loading, webhook sink batching, gated JDBC."""

from __future__ import annotations

import pytest

from data_sync_tool_spark.config import DatastoreConfig
from data_sync_tool_spark.sources.adapters import (
    get_adapter,
    load_custom_adapter,
    make_webhook_sink,
    register_adapter,
)
from data_sync_tool_spark.sources.lake import LakeTable


def test_parquet_and_lake_dispatch(spark, sf_small, tmp_path):
    ds = DatastoreConfig(name="f", type="parquet", path=sf_small)
    df = get_adapter(spark, ds, "region")
    assert df.count() > 0
    dsl = DatastoreConfig(
        name="l", type="lake", path=str(tmp_path),
        options={"unique_columns": "r_regionkey", "merge_mode": "mor"},
    )
    lake = get_adapter(spark, dsl, "region_mirror")
    assert isinstance(lake, LakeTable) and lake.merge_mode == "mor"


def test_custom_adapter_dotted_path(spark, sf_small):
    # os.path.join is a stand-in factory: proves dotted-path resolution
    fn = load_custom_adapter("os.path:join")
    assert fn("a", "b") == "a/b"
    ds = DatastoreConfig(
        name="c", type="whatever", path=sf_small,
        options={"adapter_class": "operator.itemgetter"},
    )
    getter = get_adapter(spark, ds, "x")  # itemgetter(spark, ds, "x") → callable
    assert callable(getter)


def test_unknown_type_raises(spark):
    with pytest.raises(KeyError, match="no adapter registered"):
        get_adapter(spark, DatastoreConfig(name="x", type="whatever"), "t")


def test_register_adapter_roundtrip(spark):
    register_adapter("unittest-type", lambda s, d, t: ("ok", t))
    ds = DatastoreConfig(name="u", type="whatever", options={})
    ds = ds.model_copy(update={"type": "unittest-type"})
    assert get_adapter(spark, ds, "tbl") == ("ok", "tbl")


def test_jdbc_gated_with_clear_error(spark):
    ds = DatastoreConfig(
        name="pg", type="jdbc",
        options={"url": "jdbc:postgresql://localhost/db", "driver": "org.postgresql.Driver"},
    )
    with pytest.raises(RuntimeError, match="driver jar"):
        get_adapter(spark, ds, "some_table")


def test_webhook_sink_batches_not_rows(spark):
    df = spark.createDataFrame([(i, f"n{i}") for i in range(1000)], "id int, name string")
    n_calls = spark.sparkContext.accumulator(0)
    n_rows = spark.sparkContext.accumulator(0)

    def fake_transport(url: str, rows: list[dict]) -> int:
        n_calls.add(1)
        n_rows.add(len(rows))
        return 200

    sink = make_webhook_sink("http://example.invalid/hook", transport=fake_transport,
                             batch_size=300)
    sink(df.coalesce(2), epoch_id=0)
    assert n_rows.value == 1000
    assert n_calls.value <= 8  # bulk posts, not 1000 per-row requests


def test_jdbc_parallel_read_option_plumbing():
    """partitionColumn + bounds + numPartitions must all reach the reader —
    the combination is what parallelizes the scan across executors (the
    reference reads single-threaded, adapters/postgres.py:103-127)."""
    from data_sync_tool_spark.config import DatastoreConfig
    from data_sync_tool_spark.sources.adapters import jdbc_reader_options

    ds = DatastoreConfig(
        name="pg", type="jdbc",
        options={
            "url": "jdbc:postgresql://db:5432/app",
            "user": "u", "password": "p",
            "partitionColumn": "id",
            "lowerBound": "0", "upperBound": "1000000", "numPartitions": "32",
            "fetchsize": "10000",
        },
    )
    opts = jdbc_reader_options(ds, "events")
    assert opts["dbtable"] == "events"
    assert opts["partitionColumn"] == "id" and opts["numPartitions"] == "32"
    assert opts["fetchsize"] == "10000" and opts["url"].startswith("jdbc:postgresql")


def test_jdbc_incomplete_parallel_options_rejected():
    import pytest as _pytest

    from data_sync_tool_spark.config import DatastoreConfig
    from data_sync_tool_spark.sources.adapters import jdbc_reader_options

    base = {"url": "jdbc:mysql://db/app"}
    with _pytest.raises(ValueError, match="partitionColumn requires"):
        jdbc_reader_options(
            DatastoreConfig(name="m", type="jdbc",
                            options=base | {"partitionColumn": "id"}), "t")
    with _pytest.raises(ValueError, match="no effect without"):
        jdbc_reader_options(
            DatastoreConfig(name="m", type="jdbc",
                            options=base | {"numPartitions": "8"}), "t")


def test_bus_sink_publishes_json_per_row(spark, tmp_path):
    """NATS-publish parity (adapters/nats.py:49-56): rows publish as JSON
    payloads to a validated subject, executor-side (never via the driver)."""
    import json as _json
    import os

    from data_sync_tool_spark.sources.adapters import make_bus_sink, safe_subject

    out_dir = str(tmp_path / "published")
    os.makedirs(out_dir, exist_ok=True)
    n_pub = spark.sparkContext.accumulator(0)

    def publish(subject, payload: bytes):
        # stand-in broker: append to a per-worker spool file (executor-side)
        n_pub.add(1)
        rec = _json.loads(payload)
        with open(os.path.join(out_dir, f"w{os.getpid()}.jsonl"), "a") as f:
            f.write(_json.dumps({"subject": subject, **rec}) + "\n")

    df = spark.createDataFrame([(i, f"n{i}") for i in range(500)], "id int, name string")
    sink = make_bus_sink("events.sync", publish=publish)
    sink(df, epoch_id=0)
    assert n_pub.value == 500
    rows = []
    for fn in os.listdir(out_dir):
        with open(os.path.join(out_dir, fn)) as f:
            rows += [_json.loads(l) for l in f]
    assert len(rows) == 500
    assert all(r["subject"] == "events.sync" for r in rows)
    assert sorted(r["id"] for r in rows) == list(range(500))

    with pytest.raises(ValueError, match="subject"):
        safe_subject("bad subject;drop")
    with pytest.raises(ValueError, match="subject"):
        make_bus_sink("bad one", publish=publish)


def test_bus_sink_shutdown_gate(spark):
    from data_sync_tool_spark.sources.adapters import make_bus_sink

    n_pub = spark.sparkContext.accumulator(0)
    sink = make_bus_sink(
        "events.sync",
        publish=lambda s, p: n_pub.add(1),
        drop_on_shutdown=lambda: True,  # draining: skip publishes (nats.py:50-52)
    )
    sink(spark.createDataFrame([(1,)], "id int"), epoch_id=0)
    assert n_pub.value == 0
