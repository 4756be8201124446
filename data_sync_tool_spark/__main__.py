"""CLI entry point — the working version of the reference's WIP ``main.py``
(``/root/reference/main.py:5`` imports a commented-out function).

    python -m data_sync_tool_spark reconcile --config c.yaml --pipeline p --name full
    python -m data_sync_tool_spark incremental --config c.yaml --pipeline p --name incr
    python -m data_sync_tool_spark stream --source 'binlog/chunk-*' --table t \
        --keys conv_id,turn_idx --checkpoint ckpt

On a cluster: ``spark-submit --py-files data_sync_tool_spark.zip -m ...`` —
``build_session`` defers to the submit-provided master.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="data_sync_tool_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    rec = sub.add_parser("reconcile", help="hierarchical digest diff + repair merge")
    rec.add_argument("--config", required=True)
    rec.add_argument("--pipeline", required=True)
    rec.add_argument("--name", required=True)
    rec.add_argument("--dry-run", action="store_true", help="report counts, no merge")
    rec.add_argument(
        "--collect-settled", action="store_true",
        help="materialize matched (N) blocks on the driver too — debug aid; "
        "the default keeps them a distributed aggregate",
    )

    inc = sub.add_parser("incremental", help="updated_at watermark sync")
    inc.add_argument("--config", required=True)
    inc.add_argument("--pipeline", required=True)
    inc.add_argument("--name", required=True)

    st = sub.add_parser("stream", help="streaming CDC replay into a lake table")
    st.add_argument("--source", required=True, help="glob of binlog chunk dirs")
    st.add_argument("--table", required=True, help="lake table path")
    st.add_argument("--keys", required=True, help="comma-separated key columns")
    st.add_argument("--checkpoint", required=True)
    st.add_argument("--mode", default="mor", choices=["cow", "mor"])
    st.add_argument("--buckets", type=int, default=32)
    st.add_argument("--compact-every", type=int, default=None)
    st.add_argument("--continuous", action="store_true",
                    help="keep tailing (processingTime trigger) until SIGTERM/SIGINT")

    ix = sub.add_parser(
        "index", help="build a persisted dedup/ANN index (build-once / "
        "query-many) from a parquet table")
    ix.add_argument("--kind", required=True,
                    choices=["minhash", "ivf", "pq", "ivfpq"])
    ix.add_argument("--input", required=True, help="input parquet path")
    ix.add_argument("--output", required=True, help="index root dir")
    ix.add_argument("--id-col", default=None)
    ix.add_argument("--column", default=None, help="text/embedding column")
    ix.add_argument("--n-centroids", type=int, default=16)
    ix.add_argument("--pq-m", type=int, default=8, help="PQ subspaces")
    ix.add_argument("--pq-k", type=int, default=16, help="PQ codewords/subspace")

    rb = sub.add_parser(
        "rollback", help="reinstate a prior table version as a new commit "
        "(Iceberg rollback_to_snapshot: zero data IO, history moves forward)")
    rb.add_argument("--table", required=True, help="lake table path")
    rb.add_argument("--keys", required=True, help="comma-separated key columns")
    rb.add_argument("--version", type=int, required=True)

    hi = sub.add_parser(
        "history", help="print the table's commit lineage (DESCRIBE HISTORY)")
    hi.add_argument("--table", required=True, help="lake table path")
    hi.add_argument("--keys", required=True, help="comma-separated key columns")
    hi.add_argument("--last", type=int, default=20,
                    help="only the N most recent commits (bounded manifest reads)")

    pg = sub.add_parser(
        "purge", help="privacy erasure: physically remove every stored row "
        "version of the given keys (bounded bucket/bloom-pruned rewrite), "
        "then truncate history so old files cannot resurrect the payload")
    pg.add_argument("--table", required=True, help="lake table path")
    pg.add_argument("--keys", required=True, help="comma-separated key columns")
    pg.add_argument("--values", required=True,
                    help="comma-separated first-key values to erase")
    pg.add_argument("--keep-history", action="store_true",
                    help="skip the vacuum (erasure INCOMPLETE until vacuum runs)")

    rv = sub.add_parser(
        "refresh-view", help="run one incremental refresh of a materialized "
        "aggregate view (per-group rollup following the source's change feed)")
    rv.add_argument("--src", required=True, help="source lake table path")
    rv.add_argument("--src-keys", required=True, help="comma-separated key columns")
    rv.add_argument("--view", required=True, help="view lake table path")
    rv.add_argument("--aggs", required=True,
                    help="';'-separated name=SQL-aggregate list, e.g. "
                    "\"n_turns=count(1); last_ts=max(ts)\"")
    rv.add_argument("--where", default=None, help="SQL predicate over source rows")
    rv.add_argument("--name", default="aggview")

    sy = sub.add_parser(
        "sync", help="lake→lake incremental follower catch-up: apply the "
        "leader's pruned change feed through MERGE, watermark in the "
        "follower's own manifest (cron-able, exactly-once)")
    sy.add_argument("--src", required=True, help="leader lake table path")
    sy.add_argument("--dst", required=True, help="follower lake table path")
    sy.add_argument("--keys", required=True, help="comma-separated key columns (both tables)")
    sy.add_argument("--dst-buckets", type=int, default=32,
                    help="follower bucket count when creating it fresh")
    sy.add_argument("--where", default=None,
                    help="SQL predicate: follower becomes a FILTERED replica "
                    "(out-of-filter versions propagate as deletes)")
    sy.add_argument("--name", default="sync")
    sy.add_argument("--max-lsn", type=int, default=None,
                    help="bounded catch-up: drain only through this source lsn")

    ex = sub.add_parser(
        "export", help="publish the resolved live view (or a pinned/as-of "
        "version) as plain parquet for file-reading consumers")
    ex.add_argument("--table", required=True, help="lake table path")
    ex.add_argument("--keys", required=True, help="comma-separated key columns")
    ex.add_argument("--dest", required=True, help="output parquet dir")
    ex.add_argument("--partition-by", default=None, help="comma-separated columns")
    ex.add_argument("--version", type=int, default=None)

    mt = sub.add_parser(
        "maintain", help="table maintenance: fold MoR deltas (optionally "
        "z-ordered) and/or expire old versions")
    mt.add_argument("--table", required=True, help="lake table path")
    mt.add_argument("--keys", required=True, help="comma-separated key columns")
    mt.add_argument("--compact", action="store_true")
    mt.add_argument("--zorder-by", default=None, help="comma-separated columns")
    mt.add_argument("--max-file-rows", type=int, default=None)
    mt.add_argument("--vacuum-keep-last", type=int, default=None)
    mt.add_argument("--vacuum-older-than-hours", type=float, default=None)
    mt.add_argument("--vacuum-orphan-grace-hours", type=float, default=1.0,
                    help="age before never-referenced files (possibly a "
                    "concurrent writer's staged snapshot) are removed")

    sub.add_parser(
        "canary", help="fixed-work host-speed probe (numpy bandwidth + "
        "Spark shuffle) — run beside any benchmark so its numbers are "
        "comparable across hosts/recording windows")

    qj = sub.add_parser(
        "query", help="run a stored JSON query config (the reference api.py "
        "persistence form) against a directory of parquet tables")
    qj.add_argument("--config", required=True, help="JSON file or inline JSON")
    qj.add_argument("--data", required=True, help="dir containing <table>.parquet files")
    qj.add_argument("--output", default=None, help="write result parquet here")
    qj.add_argument("--show", type=int, default=20, help="print up to N rows as JSON lines")

    args = ap.parse_args(argv)

    if args.cmd == "history":
        # manifest-only: no Spark session, instant on a laptop or driver
        from .sources.lake import LakeTable

        for rec in LakeTable(None, args.table, args.keys.split(",")).lineage(
            last=args.last
        ):
            print(json.dumps(rec, default=str))
        return 0

    from .session import build_session

    spark = build_session(f"dst-{args.cmd}")

    if args.cmd == "canary":
        import os as _os
        import sys as _sys

        # bench.py lives at the repo root beside the package; children of
        # the spawn pool re-import it by name, so it must be a real module
        # on sys.path, not an exec'd file
        _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
        import bench as _bench

        print(json.dumps(_bench.host_canary(spark)))
        return 0

    if args.cmd == "rollback":
        from .sources.lake import LakeTable

        table = LakeTable(spark, args.table, args.keys.split(","))
        res = table.rollback(args.version)
        print(json.dumps({
            "rolled_back_to": args.version, "new_version": res.version,
            "batch_id": res.batch_id,
        }))
        return 0

    if args.cmd == "sync":
        from pyspark.sql import functions as F

        from .sources.lake import LakeTable
        from .sources.sync import sync_until_current, sync_watermark

        keys = args.keys.split(",")
        src_t = LakeTable(spark, args.src, keys)
        dst_t = LakeTable(spark, args.dst, keys, n_buckets=args.dst_buckets,
                          merge_mode="mor")
        steps = sync_until_current(
            src_t, dst_t, name=args.name,
            row_filter=F.expr(args.where) if args.where else None,
            max_lsn=args.max_lsn,
        )
        print(json.dumps({
            "steps": steps,
            "watermark": sync_watermark(dst_t, args.name),
            "dst_version": dst_t.current_version(),
        }))
        return 0

    if args.cmd == "refresh-view":
        from pyspark.sql import functions as F

        from .sources.agg_view import agg_view_watermark, parse_agg_spec, refresh_agg_view
        from .sources.lake import LakeTable

        src_keys = args.src_keys.split(",")
        src_t = LakeTable(spark, args.src, src_keys)
        view_t = LakeTable(spark, args.view, [src_keys[0]])
        res = refresh_agg_view(
            src_t, view_t, parse_agg_spec(args.aggs), name=args.name,
            row_filter=F.expr(args.where) if args.where else None,
        )
        print(json.dumps({
            "applied": bool(res and res.applied),
            "view_version": view_t.current_version(),
            "watermark": agg_view_watermark(view_t, args.name),
        }))
        return 0

    if args.cmd == "export":
        from .sources.lake import LakeTable

        table = LakeTable(spark, args.table, args.keys.split(","))
        marker = table.export_snapshot(
            args.dest,
            partition_by=args.partition_by.split(",") if args.partition_by else None,
            version=args.version,
        )
        print(json.dumps(marker))
        return 0

    if args.cmd == "maintain":
        from .sources.lake import LakeTable

        table = LakeTable(spark, args.table, args.keys.split(","))
        out: dict = {}
        if args.compact or args.zorder_by:
            res = table.compact(
                zorder_by=args.zorder_by.split(",") if args.zorder_by else None,
                max_file_rows=args.max_file_rows,
            )
            out["compact"] = {"version": res.version, "applied": res.applied,
                              "rows_written": res.rows_written}
        if args.vacuum_keep_last is not None or args.vacuum_older_than_hours is not None:
            out["vacuum"] = table.vacuum(
                keep_last=args.vacuum_keep_last or 1,
                orphan_grace_seconds=args.vacuum_orphan_grace_hours * 3600.0,
                older_than_seconds=(
                    args.vacuum_older_than_hours * 3600.0
                    if args.vacuum_older_than_hours is not None else None
                ),
            )
        print(json.dumps(out))
        return 0

    if args.cmd == "purge":
        from pyspark.sql import types as T

        from .sources.lake import LakeTable

        table = LakeTable(spark, args.table, args.keys.split(","))
        m = table._load_manifest()
        vals: list = args.values.split(",")
        if m is not None:  # coerce CLI strings to the key column's type
            kt = table._schema_of(m)[table.key_cols[0]].dataType
            if isinstance(kt, T.IntegralType):
                vals = [int(v) for v in vals]
            elif isinstance(kt, (T.FloatType, T.DoubleType)):
                vals = [float(v) for v in vals]
        report = table.purge_keys(vals, vacuum_history=not args.keep_history)
        print(json.dumps(report))
        return 0

    if args.cmd == "index":
        df = spark.read.parquet(args.input)
        if args.kind == "minhash":
            from .operators.dedup_suite import minhash_index_write

            minhash_index_write(
                df, args.output,
                text_col=args.column or "text", id_col=args.id_col or "doc_id",
            )
        elif args.kind == "ivf":
            from .operators.similarity import ivf_index_write

            ivf_index_write(
                df, args.output, n_centroids=args.n_centroids,
                id_col=args.id_col or "vec_id", vec_col=args.column or "embedding",
            )
        elif args.kind == "pq":
            from .operators.pq import pq_index_write

            pq_index_write(
                df, args.output, m=args.pq_m, k=args.pq_k,
                id_col=args.id_col or "vec_id", vec_col=args.column or "embedding",
            )
        else:  # ivfpq
            from .operators.pq import ivfpq_index_write

            ivfpq_index_write(
                df, args.output, n_centroids=args.n_centroids,
                m=args.pq_m, k=args.pq_k,
                id_col=args.id_col or "vec_id", vec_col=args.column or "embedding",
            )
        print(json.dumps({"kind": args.kind, "output": args.output, "rows": df.count()}))
        return 0

    if args.cmd == "query":
        import os

        from .plans.config_io import load_query_config
        from .plans.query import build_dataframe

        q = load_query_config(args.config)
        tables = {}
        for fn in os.listdir(args.data):
            if fn.endswith(".parquet"):
                tables[fn[:-8]] = spark.read.parquet(os.path.join(args.data, fn))
        df = build_dataframe(spark, q, tables)
        if args.output:
            df.write.mode("overwrite").parquet(args.output)
        for r in df.limit(args.show).collect():
            print(json.dumps(r.asDict(recursive=True), default=str))
        print(json.dumps({"rows": df.count()}))
        return 0

    if args.cmd in ("reconcile", "incremental"):
        from .config import Config
        from .pipeline import Pipeline

        pipe = Pipeline(spark, Config.load(args.config), args.pipeline)
        if args.cmd == "reconcile":
            out = pipe.run_reconciliation(
                args.name, apply=not args.dry_run,
                collect_settled=args.collect_settled,
            )
        else:
            out = pipe.run_incremental(args.name)
        print(json.dumps(out, default=str))
        return 0

    from .sources.lake import LakeTable
    from .streaming.cdc import CdcPipeline

    table = LakeTable(
        spark, args.table, args.keys.split(","),
        n_buckets=args.buckets, merge_mode=args.mode,
    )
    pipe = CdcPipeline(
        spark, args.source, table, args.checkpoint,
        name="cli", max_files_per_trigger=None,
        compact_every=args.compact_every,
    )
    if args.continuous:
        from .streaming.cdc import install_shutdown_handler

        install_shutdown_handler(spark)  # SIGTERM/SIGINT → graceful drain
        q = pipe.start()
        q.awaitTermination()
        m = pipe.metrics
    else:
        m = pipe.run_available()
    print(json.dumps({
        "events": m.total_events,
        "seconds": round(m.total_seconds, 3),
        "events_per_sec": round(m.events_per_sec, 1),
        "batches": len(m.batches),
        "table_version": table.current_version(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
