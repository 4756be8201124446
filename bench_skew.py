"""Hot-conversation skew probe (north-star requirement: salted/skew-safe
key-partitioned shuffle): replay the SAME event volume uniform vs extreme-hot
(90% of events on ONE conversation) and report the throughput ratio.

Why the engine holds: LWW dedupe is a hash AGGREGATE (``max(struct)``) with
map-side partial combine — every input partition pre-reduces its own copies
of the hot key, so the shuffle carries at most (n_partitions) rows for the
hot conversation, never its 10^7 updates into one task. A window
(row_number) formulation would collapse under the same input. Explicit
salting (``functions.hashes.salted_key``) remains available for downstream
JOINS on skewed keys, where aggregation cannot pre-reduce.

Writes ``BENCH/SKEW.md`` and prints one JSON line.

Usage: python bench_skew.py [--events 4000000]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))


def replay(spark, n_events: int, hot_fraction: float, n_hot: int, reps: int = 2) -> float:
    from data_sync_tool_spark.datagen import changelog_stream, write_stream_chunks
    from data_sync_tool_spark.sources.lake import LakeTable
    from data_sync_tool_spark.streaming.cdc import CdcPipeline

    work = tempfile.mkdtemp(prefix=f"dst_skew_{int(hot_fraction * 100)}_")
    ch = changelog_stream(
        spark, n_events, n_convs=50_000, max_turns=64,
        hot_fraction=hot_fraction, n_hot=n_hot, num_partitions=64,
    )
    write_stream_chunks(ch, f"{work}/binlog", 8)
    best = float("inf")
    for rep in range(reps):
        table = LakeTable(
            spark, f"{work}/table-{rep}", ["conv_id", "turn_idx"],
            n_buckets=64, checksum=False, merge_mode="mor", track_stats=False,
        )
        pipe = CdcPipeline(
            spark, f"{work}/binlog/chunk-*", table, f"{work}/ckpt-{rep}",
            name=f"skew{rep}", max_files_per_trigger=None, track_offsets=False,
        )
        t0 = time.time()
        pipe.run_available()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=int(os.environ.get("DST_BENCH_EVENTS", "4000000")))
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "SKEW.md"))
    args = ap.parse_args()

    import sys

    sys.path.insert(0, REPO)
    from data_sync_tool_spark.session import build_session

    spark = build_session("skew-probe", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    # untimed warmup
    replay(spark, 100_000, 0.0, 1, reps=1)

    # INTERLEAVED best-of-2: this host's throughput drifts minute-to-minute
    # (hypervisor neighbors) — measuring the two cases back-to-back in
    # alternation keeps the ratio honest
    uniform, hot = float("inf"), float("inf")
    for _ in range(2):
        uniform = min(uniform, replay(spark, args.events, 0.0, 1, reps=1))
        hot = min(hot, replay(spark, args.events, 0.9, 1, reps=1))
    res = {
        "events": args.events,
        "uniform_sec": round(uniform, 3),
        "hot90_one_conv_sec": round(hot, 3),
        "uniform_events_per_sec": round(args.events / uniform, 1),
        "hot90_events_per_sec": round(args.events / hot, 1),
        "hot_over_uniform_ratio": round(hot / uniform, 3),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(
            "# Hot-key skew probe\n\n"
            "Identical volume, uniform keys vs 90%% of events on ONE conversation.\n"
            "Aggregate-based LWW dedupe pre-reduces the hot key map-side, so the\n"
            "shuffle never funnels the hot conversation into a single task.\n\n"
            "```json\n%s\n```\n" % json.dumps(res, indent=1)
        )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
