"""Live JDBC integration: the reconcile engine against a REAL Postgres,
mirroring the reference's dockerized integration suite
(``/root/reference/docker-compose.yml`` +
``/root/reference/test/engine/reconcile/init.sql``, golden counts
A=10000 D=10000 N=10437 M=9563).

Environment-gated: skips cleanly unless
- Postgres from the repo's docker-compose.yml is reachable
  (``docker compose up -d postgres``; override host/port with
  ``DST_PG_HOST`` / ``DST_PG_PORT``), and
- a Postgres JDBC driver jar is on the session classpath
  (``SPARK_GRAFT_EXTRA_JARS=/path/postgresql-42.x.jar`` — must be set
  before the first test builds the shared SparkSession).

The fixture is WRITTEN through Spark JDBC (df.write.jdbc), so this also
exercises the sink direction; the scan comes back through the same
partitioned-parallel reader options the config surface validates
(``jdbc_reader_options``), never a single-task read.
"""

from __future__ import annotations

import os
import socket

import pytest

PG_HOST = os.environ.get("DST_PG_HOST", "localhost")
PG_PORT = int(os.environ.get("DST_PG_PORT", "5433"))
PG_URL = (
    f"jdbc:postgresql://{PG_HOST}:{PG_PORT}/dst"
    "?user=dst&password=dst"
)


def _pg_reachable() -> bool:
    try:
        with socket.create_connection((PG_HOST, PG_PORT), timeout=0.5):
            return True
    except OSError:
        return False


pytestmark = pytest.mark.skipif(
    not (_pg_reachable() and os.environ.get("SPARK_GRAFT_EXTRA_JARS")),
    reason=(
        "live Postgres integration: start it with `docker compose up -d "
        "postgres` and set SPARK_GRAFT_EXTRA_JARS to a Postgres JDBC "
        "driver jar (see docker-compose.yml header)"
    ),
)

GOLDEN = {"A": 10_000, "D": 10_000, "N": 10_437, "M": 9_563}


def _load_fixture(spark):
    """The golden-count fixture (same generator as tests/test_reconcile.py)
    written INTO Postgres via JDBC."""
    from tests.test_reconcile import _side

    src = _side(spark, {1: 17, 2: 19, 3: 13})
    snk = _side(spark, {1: 17, 2: 23, 4: 11})
    for name, df in (("source_table", src), ("sink_table", snk)):
        df.write.mode("overwrite").format("jdbc").option("url", PG_URL).option(
            "dbtable", name
        ).save()


def _jdbc_scan(spark, table: str):
    from data_sync_tool_spark.config import DatastoreConfig
    from data_sync_tool_spark.sources.adapters import jdbc_reader_options

    ds = DatastoreConfig(
        name="pg", type="postgres",
        options={
            "url": PG_URL,
            "partitionColumn": "id",
            "lowerBound": "1",
            "upperBound": "40001",
            "numPartitions": "8",
        },
    )
    reader = spark.read.format("jdbc")
    for k, v in jdbc_reader_options(ds, table).items():
        reader = reader.option(k, v)
    return reader.load()


def test_reconcile_golden_counts_against_live_postgres(spark):
    from data_sync_tool_spark.operators.reconcile import (
        MD5_SUM_HASH,
        ReconcileConfig,
        build_blocks,
        status_counts,
    )

    _load_fixture(spark)
    src = _jdbc_scan(spark, "source_table")
    snk = _jdbc_scan(spark, "sink_table")
    # the partitioned read really is parallel (one range slice per task)
    assert src.rdd.getNumPartitions() == 8
    cfg = ReconcileConfig(
        partition_column="id",
        partition_column_type="int",
        strategy=MD5_SUM_HASH,
        fields=["id", "name", "value"],
        initial_partition_interval=10_000,
        interval_reduction_factor=10,
        max_block_size=1,
    )
    plan = build_blocks(src, snk, cfg)
    assert status_counts(plan) == GOLDEN


def test_jdbc_roundtrip_preserves_rows(spark):
    from tests.test_reconcile import _side

    want = _side(spark, {1: 17}).count()
    got = _jdbc_scan(spark, "source_table").filter("id <= 10000").count()
    assert got == want
