"""SemDeDup (cluster-then-prune semantic dedup) — exhaustive-config parity
with numpy, planted-cluster survivor checks, and the paper's keep-the-
marginal-member rule."""

from __future__ import annotations

import math

import numpy as np
import pytest

from data_sync_tool_spark.operators.similarity import (
    semantic_dedup_pairs,
    semantic_dedupe,
)


def _vecs_df(spark, vecs, ids=None):
    ids = ids if ids is not None else range(len(vecs))
    rows = [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


def test_exhaustive_pairs_equal_numpy(spark):
    rng = np.random.RandomState(7)
    vecs = [_unit(rng.randn(8)) for _ in range(40)]
    # plant two near-dup pairs
    vecs[1] = _unit(vecs[0] + 0.01 * rng.randn(8))
    vecs[11] = _unit(vecs[10] + 0.01 * rng.randn(8))
    df = _vecs_df(spark, vecs)
    got = {
        (r["a"], r["b"])
        for r in semantic_dedup_pairs(df, threshold=0.95, n_clusters=1).collect()
    }
    m = np.asarray(vecs)
    sims = np.round(m @ m.T, 6)
    want = {
        (i, j)
        for i in range(len(vecs))
        for j in range(i + 1, len(vecs))
        if sims[i, j] >= 0.95
    }
    assert got == want
    assert {(0, 1), (10, 11)} <= got


def test_planted_copies_dedupe_across_clusters(spark):
    # 4 well-separated groups (near one-hot axes); exact copies planted in
    # each — identical vectors always share a cluster, so clustering can
    # never split a true duplicate group
    rng = np.random.RandomState(3)
    vecs, ids = [], []
    next_id = 0
    expected_keep = set()
    for axis in range(4):
        base = np.zeros(16)
        base[axis] = 1.0
        group = []
        for k in range(3):  # 3 exact copies per group
            vecs.append(base)
            group.append(next_id)
            next_id += 1
        expected_keep.add(min(group))
        # plus 2 singletons near (but not above threshold of) the axis
        for _ in range(2):
            vecs.append(_unit(base + 0.6 * rng.randn(16)))
            expected_keep.add(next_id)
            next_id += 1
    df = _vecs_df(spark, vecs)
    out = semantic_dedupe(df, threshold=0.999, n_clusters=4, keep="min_id")
    assert {r["vec_id"] for r in out.collect()} == expected_keep


def test_marginal_keep_retains_outlier(spark):
    # three chained near-dups at angles {0, t, 3t} from e1: the normalized
    # mean sits at ~4t/3, so id=2 (angle 3t) is the most marginal member —
    # the SemDeDup paper keeps exactly that one
    t = 0.05
    vecs = [
        [1.0, 0.0, 0.0, 0.0],
        [math.cos(t), math.sin(t), 0.0, 0.0],
        [math.cos(3 * t), math.sin(3 * t), 0.0, 0.0],
    ]
    df = _vecs_df(spark, vecs)
    out = semantic_dedupe(df, threshold=0.98, n_clusters=1, keep="marginal")
    rows = out.collect()
    assert [r["vec_id"] for r in rows] == [2]
    assert out.columns == ["vec_id", "embedding"]  # helper score dropped


def test_no_pairs_returns_corpus_unchanged(spark):
    vecs = [np.eye(8)[i] for i in range(5)]
    df = _vecs_df(spark, vecs)
    out = semantic_dedupe(df, threshold=0.99, n_clusters=2, keep="marginal")
    assert sorted(r["vec_id"] for r in out.collect()) == [0, 1, 2, 3, 4]


def test_bad_keep_raises(spark):
    df = _vecs_df(spark, [np.eye(4)[0]])
    with pytest.raises(ValueError, match="keep"):
        semantic_dedupe(df, keep="largest")
