"""Table registry over the driver-generated parquet test tables, plus the
deterministic changelog / transcript views used by the CDC engine.

The changelog view maps the ``events`` table to a binlog/WAL-style change
stream over the transcript schema from ``BASELINE.json.input_hint``:
``(conv_id:string, turn_idx:int, role:string, text:string, tool:string,
ts:timestamp)`` keyed by ``(conv_id, turn_idx)`` with monotone ``lsn``.
The SAME mapping is expressed in ANSI SQL in ``__spark_entry__.oracle_sql``,
which is what makes the full CDC replay oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# One change row per event. Deterministic, integer-only string building (no
# float formatting, which differs between engines).
#   op:   signup → insert, error → delete, else update
#   text: carries op + value cents so updates actually change the payload.
CHANGELOG_SELECT_SQL = """
SELECT
  'conv-' || CAST(user_id AS STRING)                                   AS conv_id,
  CAST(event_id % 40 AS INTEGER)                                        AS turn_idx,
  CASE WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END           AS role,
  'msg ' || CAST(event_id AS STRING) || ' ' || event_type
        || ' ' || CAST(CAST(ROUND(value * 100) AS BIGINT) AS STRING)   AS text,
  CASE WHEN event_type = 'purchase' THEN 'search'
       WHEN event_type = 'click'    THEN 'browser'
       ELSE NULL END                                                    AS tool,
  ts                                                                    AS ts,
  CASE event_type WHEN 'signup' THEN 'insert'
                  WHEN 'error'  THEN 'delete'
                  ELSE 'update' END                                     AS op,
  event_id                                                              AS lsn
FROM events
"""


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    for t in tables or TPCH_TABLES:
        try:
            read_table(spark, sf_dir, t).createOrReplaceTempView(t)
        except Exception:
            pass  # smaller sf dirs may lack optional tables


def changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The binlog-style change stream derived from ``events``."""
    read_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(CHANGELOG_SELECT_SQL)


def changelog_max_lsn(spark: SparkSession, sf_dir: str) -> int:
    """Exact max lsn of the change stream without a Spark job where
    possible: ``lsn == event_id`` by construction (CHANGELOG_SELECT_SQL),
    and parquet footers carry exact min/max statistics for int64 columns —
    a driver-side metadata read replaces the full-scan ``agg(max(lsn))``
    every replay harness otherwise pays before batching. Falls back to the
    scan when stats are missing or the layout is unexpected."""
    import os

    try:
        import pyarrow.parquet as pq

        path = f"{sf_dir}/events.parquet"
        files = (
            [os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")]
            if os.path.isdir(path)
            else [path]
        )
        mx: int | None = None
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().get_field_index("event_id")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    raise ValueError("missing column stats")
                mx = int(st.max) if mx is None else max(mx, int(st.max))
        if mx is not None:
            return mx
    except Exception:  # noqa: BLE001 — stats probe is best-effort
        pass
    from pyspark.sql import functions as F

    return changelog(spark, sf_dir).agg(F.max("lsn")).first()[0]
