"""Collapse-strategy soak probe (round-4 verdict #5): replay a multi-batch
change stream through ``strategy="collapse"`` and record PER-BATCH wall time
and target-table bytes/files read while the table grows.

What it must show (and asserts): per-batch merge cost stays FLAT as the live
table grows, because the deferred-cancel design appends O(batch) version
rows and reads ZERO stored files at merge time — resolution is paid once at
``compact()`` / read, not per batch. (The round-3 eager design scanned every
dirty-bucket file per batch to synthesize cancel rows: per-batch cost grew
with table size; ``cdc_collapse_replay`` was the slowest contract query.)

Bytes/files read are measured, not assumed: ``LakeTable._read_files`` is
wrapped to attribute every stored-file open (and its on-disk size) to the
phase that triggered it.

Writes ``BENCH/COLLAPSE_SOAK.md`` and prints one JSON line.

Usage: python bench_collapse.py [--events 12000000] [--batches 12]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=12_000_000)
    ap.add_argument("--batches", type=int, default=12)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from data_sync_tool_spark.datagen import changelog_stream
    from data_sync_tool_spark.session import build_session
    from data_sync_tool_spark.sources.lake import LakeTable

    spark = build_session("dst-collapse-soak")
    spark.sparkContext.setLogLevel("ERROR")

    # attribute every stored-file open to the current phase
    reads = {"phase": "idle", "by_phase": {}}
    orig_read_files = LakeTable._read_files

    def counting_read_files(self, files, schema):
        ent = reads["by_phase"].setdefault(reads["phase"], {"files": 0, "bytes": 0})
        ent["files"] += len(files)
        ent["bytes"] += sum(os.path.getsize(f) for f in files if os.path.exists(f))
        return orig_read_files(self, files, schema)

    LakeTable._read_files = counting_read_files

    work = tempfile.mkdtemp(prefix="dst_soak_")
    ch = changelog_stream(
        spark, args.events, n_convs=200_000, max_turns=64,
        hot_fraction=0.2, n_hot=4, num_partitions=64,
    )
    table = LakeTable(spark, f"{work}/tbl", ["conv_id", "turn_idx"],
                      n_buckets=32, checksum=False, track_stats=False)
    step = args.events // args.batches + 1
    batches = []
    for i in range(args.batches):
        b = ch.filter((F.col("lsn") >= i * step) & (F.col("lsn") < (i + 1) * step))
        reads["phase"] = f"merge_{i}"
        t0 = time.time()
        r = table.merge_into(b, batch_id=f"soak-{i}", strategy="collapse")
        wall = time.time() - t0
        ent = reads["by_phase"].get(f"merge_{i}", {"files": 0, "bytes": 0})
        batches.append({
            "batch": i, "wall_sec": round(wall, 3), "rows_written": r.rows_written,
            "target_files_read": ent["files"], "target_bytes_read": ent["bytes"],
        })
        print(json.dumps(batches[-1]), flush=True)

    reads["phase"] = "compact"
    t0 = time.time()
    table.compact()
    compact_sec = round(time.time() - t0, 3)
    reads["phase"] = "final_read"
    t0 = time.time()
    final_rows = table.read().count()
    read_sec = round(time.time() - t0, 3)

    walls = [b["wall_sec"] for b in batches]
    # flatness: the mean of the last third vs the first third (JIT warmup
    # excluded by comparing thirds, not first batch)
    third = max(1, len(walls) // 3)
    growth = round(sum(walls[-third:]) / third / (sum(walls[:third]) / third), 3)
    assert all(b["target_files_read"] == 0 for b in batches), \
        "collapse merge opened stored files — deferred-cancel contract broken"

    result = {
        "metric": "collapse_soak_per_batch_flatness",
        "events": args.events,
        "batches": args.batches,
        "per_batch_wall_sec": walls,
        "last_third_over_first_third": growth,
        "target_bytes_read_per_batch": 0,
        "compact_sec": compact_sec,
        "final_read_sec": read_sec,
        "final_rows": final_rows,
        "compact_files_read": reads["by_phase"].get("compact", {}).get("files", 0),
        "cores": os.environ.get("SPARK_GRAFT_CPUS", "all"),
    }
    print(json.dumps(result), flush=True)

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/COLLAPSE_SOAK.md", "w") as f:
        f.write(
            "# Collapse soak probe — per-batch cost vs table growth\n\n"
            f"{args.events:,} events replayed as {args.batches} collapse "
            "batches into one lake table (32 buckets, deferred-cancel "
            "design). Per-batch wall time and stored-file reads, measured "
            "by instrumenting `LakeTable._read_files`:\n\n"
            "| batch | wall (s) | rows written | target files read | target bytes read |\n"
            "|---|---|---|---|---|\n"
            + "".join(
                f"| {b['batch']} | {b['wall_sec']} | {b['rows_written']:,} "
                f"| {b['target_files_read']} | {b['target_bytes_read']} |\n"
                for b in batches
            )
            + f"\nMean wall, last third / first third: **{growth}×** "
            "(1.0 = flat; the table grows linearly over the run while "
            "per-batch reads stay at ZERO bytes by construction — cancels "
            "are deferred to compact).\n\n"
            f"Resolution cost paid once: compact {compact_sec}s "
            f"({reads['by_phase'].get('compact', {}).get('files', 0)} files), "
            f"final resolved read {read_sec}s, {final_rows:,} live rows.\n\n"
            f"Run: `python bench_collapse.py --events {args.events} "
            f"--batches {args.batches}` on local["
            f"{os.environ.get('SPARK_GRAFT_CPUS', 'all')}].\n"
        )


if __name__ == "__main__":
    main()
