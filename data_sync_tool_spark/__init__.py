"""data_sync_tool_spark — a from-scratch PySpark-native CDC / incremental-ingest
engine with the query and data-processing capabilities of
``free4ages/data-sync-tool`` (reference snapshot at ``/root/reference``).

This is NOT a port. The reference is a single-threaded, row-at-a-time Python
sync tool (see ``/root/reference/engine/reconcile.py``); this package
re-expresses the same *semantics* — hierarchical hash reconciliation,
config-declared pipelines, transform/enrich, merge strategies
(upsert / delete_insert / collapse) — as declarative Spark DataFrame plans,
Structured Streaming micro-batches, and vectorized pandas/Arrow UDFs, designed
for 1000-executor clusters over ~100 TB lake tables.

Layout
------
- ``session``    : SparkSession factory (UTC, Arrow, AQE, shuffle sizing).
- ``functions``  : hash/bucket/text/vector column-expression builders.
- ``sources``    : lake table (manifest-tracked parquet snapshots, Iceberg-style
                   copy-on-write MERGE), table registry, changelog views.
- ``operators``  : dedupe (LWW), merge strategies, hierarchical reconcile,
                   transform/enrich, dedup suite, similarity search.
- ``streaming``  : the CDC loop (readStream → foreachBatch MERGE), checkpoints,
                   lineage and metrics.
- ``plans``      : declarative Query IR (fields/filters/joins/group/order/limit)
                   compiled to DataFrame plans, mirroring the reference's
                   ``core/query.py`` + ``engine/sql_builder.py`` surface.
"""

__version__ = "0.1.0"
