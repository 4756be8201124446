"""Agg-view + lake-sync soak probe (round-4 verdict #6): replay a
multi-batch change stream into a leader lake and, after EVERY leader
commit, (a) drain one follower ``sync_step`` and (b) run one
``refresh_agg_view``; record per-batch wall time and stored-file
bytes/files read attributed to each phase.

What it must show:

- **sync is O(new commits), not O(table)**: per-step source bytes read
  track the batch size and stay FLAT while the table grows 12× over the
  run (the ``changes_since`` lsn-bound file pruning at soak scale —
  previously pytest-instrumented only at fixture scale).
- **view refresh is O(changed groups)**: wide windows (every conversation
  active) legitimately take the scan+semi-join fallback, so phase 2
  applies NARROW batches (~1% of conversations, fresh lsns) on top of the
  full-grown table and shows refresh bytes collapsing to the changed
  groups' point lookups — far below the wide-window refreshes despite the
  larger table.

Writes ``BENCH/VIEW_SYNC_SOAK.md`` and prints one JSON line.

Usage: python bench_view_sync.py [--events 12000000] [--batches 12]
       [--narrow-batches 6]
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
    ap.add_argument("--narrow-batches", type=int, default=6)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from data_sync_tool_spark.datagen import changelog_stream
    from data_sync_tool_spark.session import build_session
    from data_sync_tool_spark.sources.agg_view import refresh_agg_view
    from data_sync_tool_spark.sources.lake import LakeTable
    from data_sync_tool_spark.sources.sync import sync_step

    spark = build_session("dst-view-sync-soak")
    spark.sparkContext.setLogLevel("ERROR")

    reads = {"phase": "idle", "by_phase": {}}
    orig_read_files = LakeTable._read_files

    def counting_read_files(self, files, schema):
        ent = reads["by_phase"].setdefault(reads["phase"], {"files": 0, "bytes": 0})
        ent["files"] += len(files)
        ent["bytes"] += sum(os.path.getsize(f) for f in files if os.path.exists(f))
        return orig_read_files(self, files, schema)

    LakeTable._read_files = counting_read_files

    work = tempfile.mkdtemp(prefix="dst_vs_soak_")
    n_convs = 200_000
    ch = changelog_stream(
        spark, args.events, n_convs=n_convs, max_turns=64,
        hot_fraction=0.2, n_hot=4, num_partitions=64,
    )
    src = LakeTable(spark, f"{work}/src", ["conv_id", "turn_idx"],
                    n_buckets=32, checksum=False, merge_mode="mor",
                    track_stats=False)
    dst = LakeTable(spark, f"{work}/dst", ["conv_id", "turn_idx"],
                    n_buckets=32, checksum=False, merge_mode="mor",
                    track_stats=False)
    view = LakeTable(spark, f"{work}/view", ["conv_id"], n_buckets=16,
                     checksum=False, track_stats=False)
    aggs = {
        "n_turns": F.count(F.lit(1)),
        "total_chars": F.sum(F.length("text")),
        "last_ts": F.max("ts"),
    }

    def one_round(tag: str, batch, bid: str):
        rec = {"batch": tag}
        reads["phase"] = f"merge_{tag}"
        t0 = time.time()
        src.merge_into(batch, batch_id=bid)
        rec["merge_sec"] = round(time.time() - t0, 3)
        reads["phase"] = f"sync_{tag}"
        t0 = time.time()
        sync_step(src, dst)
        rec["sync_sec"] = round(time.time() - t0, 3)
        e = reads["by_phase"].get(f"sync_{tag}", {"files": 0, "bytes": 0})
        rec["sync_files_read"], rec["sync_bytes_read"] = e["files"], e["bytes"]
        reads["phase"] = f"refresh_{tag}"
        t0 = time.time()
        refresh_agg_view(src, view, aggs, max_probe_keys=10_000)
        rec["refresh_sec"] = round(time.time() - t0, 3)
        e = reads["by_phase"].get(f"refresh_{tag}", {"files": 0, "bytes": 0})
        rec["refresh_files_read"], rec["refresh_bytes_read"] = e["files"], e["bytes"]
        print(json.dumps(rec), flush=True)
        return rec

    step = args.events // args.batches + 1
    wide = []
    for i in range(args.batches):
        b = ch.filter((F.col("lsn") >= i * step) & (F.col("lsn") < (i + 1) * step))
        wide.append(one_round(f"wide_{i}", b, f"soak-w{i}"))

    # phase 2: narrow windows — ~1% of conversations active, fresh lsns,
    # applied on top of the FULL-grown table (the steady-state production
    # shape: most conversations idle between refreshes)
    narrow = []
    upd = changelog_stream(
        spark, 200_000, n_convs=n_convs, max_turns=64,
        hot_fraction=0.0, n_hot=1, num_partitions=16,
    ).filter(F.xxhash64("conv_id") % 128 == 0)
    nstep = 200_000 // args.narrow_batches + 1
    base_lsn = args.events + 10
    for i in range(args.narrow_batches):
        b = upd.filter(
            (F.col("lsn") >= i * nstep) & (F.col("lsn") < (i + 1) * nstep)
        ).withColumn("lsn", (F.col("lsn") + base_lsn).cast("long"))
        narrow.append(one_round(f"narrow_{i}", b, f"soak-n{i}"))

    LakeTable._read_files = orig_read_files

    def flatness(xs):
        third = max(1, len(xs) // 3)
        lo = sum(xs[:third]) / third
        return round((sum(xs[-third:]) / third) / lo, 3) if lo else 0.0

    sync_bytes = [b["sync_bytes_read"] for b in wide]
    sync_flat = flatness(sync_bytes)
    wide_refresh_bytes = [b["refresh_bytes_read"] for b in wide]
    narrow_refresh_bytes = [b["refresh_bytes_read"] for b in narrow]
    narrow_vs_wide = round(
        max(narrow_refresh_bytes) / max(wide_refresh_bytes[-1], 1), 4
    )
    assert sync_flat < 2.0, (
        f"sync bytes-read grew {sync_flat}x while the table grew "
        f"{args.batches}x — changes_since pruning is not O(new commits)"
    )
    assert narrow_vs_wide < 0.25, (
        f"narrow-window refresh read {narrow_vs_wide:.0%} of a wide refresh "
        f"— the O(changed groups) point-lookup path did not engage"
    )

    result = {
        "metric": "view_sync_soak",
        "events": args.events,
        "wide_batches": args.batches,
        "narrow_batches": args.narrow_batches,
        "sync_bytes_per_batch": sync_bytes,
        "sync_bytes_last_third_over_first_third": sync_flat,
        "sync_sec_per_batch": [b["sync_sec"] for b in wide],
        "refresh_sec_wide": [b["refresh_sec"] for b in wide],
        "refresh_bytes_wide": wide_refresh_bytes,
        "refresh_sec_narrow": [b["refresh_sec"] for b in narrow],
        "refresh_bytes_narrow": narrow_refresh_bytes,
        "narrow_refresh_bytes_over_wide": narrow_vs_wide,
        "cores": os.environ.get("SPARK_GRAFT_CPUS", "all"),
    }
    print(json.dumps(result), flush=True)

    os.makedirs("BENCH", exist_ok=True)
    rows = "".join(
        f"| {b['batch']} | {b['merge_sec']} | {b['sync_sec']} "
        f"| {b['sync_bytes_read']:,} | {b['refresh_sec']} "
        f"| {b['refresh_bytes_read']:,} |\n"
        for b in wide + narrow
    )
    with open("BENCH/VIEW_SYNC_SOAK.md", "w") as f:
        f.write(
            "# Agg-view + lake-sync soak — per-batch cost vs table growth\n\n"
            f"{args.events:,} events replayed as {args.batches} wide batches "
            "(every conversation active) into a leader lake; after every "
            "leader commit one follower `sync_step` and one "
            f"`refresh_agg_view` run. Then {args.narrow_batches} NARROW "
            "batches (~1% of conversations, fresh lsns) land on the "
            "full-grown table. Bytes attributed by instrumenting "
            "`LakeTable._read_files`:\n\n"
            "| batch | merge (s) | sync (s) | sync bytes read | refresh (s) "
            "| refresh bytes read |\n|---|---|---|---|---|---|\n"
            + rows
            + f"\n- **sync is O(new commits)**: per-step source bytes read, "
            f"last third / first third of the wide phase = **{sync_flat}×** "
            "(1.0 = flat) while the table grew "
            f"{args.batches}× — the `changes_since` lsn-bound file pruning "
            "holds at soak scale.\n"
            f"- **refresh is O(changed groups)**: a narrow-window refresh "
            f"reads **{narrow_vs_wide:.1%}** of the last wide-window "
            "refresh's bytes despite the larger table — the bloom-pruned "
            "point-lookup path engages when the affected-group set is "
            "small; wide windows legitimately take the scan+semi-join "
            "fallback (documented near-rebuild shape).\n\n"
            f"Run: `python bench_view_sync.py --events {args.events} "
            f"--batches {args.batches} --narrow-batches "
            f"{args.narrow_batches}` on local["
            f"{os.environ.get('SPARK_GRAFT_CPUS', 'all')}].\n"
        )


if __name__ == "__main__":
    main()
