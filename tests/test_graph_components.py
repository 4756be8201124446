"""Connected components + near-dedup survivor selection (operators/graph.py).

Correctness gates: hand fixtures covering the shapes that break naive label
propagation (multiple local minima, chains, cycles), a hypothesis sweep vs a
pure-Python union-find oracle, and convergence-rate pins for the pointer
jumping (O(log diameter), not O(diameter))."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_sync_tool_spark.operators.graph import connected_components, near_dedupe


def _cc(spark, edge_list, **kw):
    df = spark.createDataFrame(edge_list, "a long, b long")
    out = connected_components(df, **kw)
    return {r["id"]: r["component"] for r in out.collect()}


def _uf_oracle(edge_list):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_chain_with_interior_local_min(spark):
    # path 2-10-1: node 2 is a local minimum (smaller than its only
    # neighbor) but NOT the component min — the case where parent-forest
    # pointer jumping alone never merges
    assert _cc(spark, [(2, 10), (10, 1)]) == {1: 1, 2: 1, 10: 1}


def test_two_components_and_cycle(spark):
    edges = [(5, 6), (6, 7), (7, 5), (100, 200)]  # triangle + pair
    assert _cc(spark, edges) == {5: 5, 6: 5, 7: 5, 100: 100, 200: 100}


def test_self_loops_and_duplicate_edges_ignored(spark):
    edges = [(3, 3), (1, 2), (2, 1), (1, 2)]
    assert _cc(spark, edges) == {1: 1, 2: 1}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "a long, b long")
    assert connected_components(df).count() == 0


def test_string_ids(spark):
    df = spark.createDataFrame(
        [("b", "c"), ("c", "a"), ("x", "y")], "a string, b string"
    )
    out = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_long_path_converges_in_log_rounds(spark):
    # path of 64 nodes reversed (worst case for min propagation: the min sits
    # at one end); pointer jumping must beat the 63-round diameter bound
    edges = [(i + 1, i) for i in range(1, 64)]
    stats: dict = {}
    labels = _cc(spark, edges, stats=stats)
    assert labels == {i: 1 for i in range(1, 65)}
    assert stats["iterations"] <= 10, stats


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)), min_size=1, max_size=50
    )
)
def test_components_match_union_find(spark, edges):
    real = [e for e in edges if e[0] != e[1]]
    expected = _uf_oracle(real)
    got = _cc(spark, edges) if real else {}
    assert got == expected


def test_near_dedupe_min_id_survivor(spark):
    docs = spark.createDataFrame(
        [(i, f"text{i}") for i in range(1, 8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(3, 5), (5, 7), (2, 6)], "a long, b long")
    kept = sorted(r["doc_id"] for r in near_dedupe(docs, pairs).collect())
    # clusters {3,5,7} → keep 3; {2,6} → keep 2; 1 and 4 unpaired
    assert kept == [1, 2, 3, 4]


def test_near_dedupe_score_survivor(spark):
    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.1), (9, 0.5)],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 9)], "a long, b long")
    kept = sorted(
        r["doc_id"]
        for r in near_dedupe(docs, pairs, score_col="quality").collect()
    )
    # {1,2,3}: max quality 0.9 tie between 2 and 3 → min id 2; {4,9} → 9
    assert kept == [2, 9]


def test_components_scale_shape(spark):
    """No collect of data-sized results: the labels DataFrame stays
    distributed and per-iteration work is joins + partial-aggregated mins.
    Checked structurally: a 2k-node random-ish graph converges and the
    result partitions by id without a driver materialization."""
    edges = spark.range(2000).select(
        F.col("id").alias("a"), ((F.col("id") * 7919 + 13) % 2000).alias("b")
    )
    stats: dict = {}
    comp = connected_components(edges, stats=stats)
    n_nodes = comp.count()
    assert n_nodes == 2000
    # 17 measured (cycle-heavy functional graph: edge propagation dominates,
    # jumping can't accelerate a cycle frontier); far below the ~O(cycle
    # length) a jump-free propagation would need
    assert stats["iterations"] <= 20
    # every component label is the component's own min member
    bad = (
        comp.groupBy("component").agg(F.min("id").alias("mn"))
        .filter(F.col("component") != F.col("mn")).count()
    )
    assert bad == 0
