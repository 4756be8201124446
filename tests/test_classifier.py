"""Hashed-feature logistic regression: numpy-reference parity, planted
separability, partitioning determinism, and the JVM token-weight scorer."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_sync_tool_spark.operators.classifier import (
    hashed_features,
    score_logreg,
    token_weight_score,
    train_logreg,
)

D = 1 << 10  # small hash space keeps the dense numpy reference cheap


def _docs(spark):
    rows = []
    for i in range(60):
        good = i % 3 != 0
        words = ["alpha", "beta"] if i % 2 else ["gamma", "delta", "beta"]
        if good:
            words = words + ["goodword", "quality"]
        else:
            words = words + ["spamword"] * 2
        rows.append((i, " ".join(words * 3), 1 if good else 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def _dense(feats_rows, n_features):
    x = np.zeros((len(feats_rows), n_features + 1))
    y = np.zeros(len(feats_rows))
    for r, row in enumerate(sorted(feats_rows, key=lambda r: r["doc_id"])):
        x[r, np.asarray(row["idx"])] = np.asarray(row["val"])
        y[r] = row["label"]
    return x, y


def _numpy_gd(x, y, n_iters, lr, l2=0.0):
    w = np.zeros(x.shape[1])
    for _ in range(n_iters):
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        g = x.T @ (p - y) / len(y)
        if l2:
            reg = l2 * w
            reg[-1] = 0.0
            g = g + reg
        w -= lr * g
    return w


def test_train_matches_dense_numpy_reference(spark):
    feats = hashed_features(_docs(spark), label_col="label", n_features=D)
    w = train_logreg(feats, n_features=D, n_iters=15, lr=2.0, l2=0.01)
    x, y = _dense(feats.collect(), D)
    w_ref = _numpy_gd(x, y, n_iters=15, lr=2.0, l2=0.01)
    np.testing.assert_allclose(w, w_ref, atol=1e-8)


def test_separable_corpus_reaches_perfect_accuracy(spark):
    feats = hashed_features(
        _docs(spark), label_col="label", n_features=D, binarize=True
    ).cache()
    w = train_logreg(feats, n_features=D, n_iters=40, lr=4.0)
    scored = score_logreg(feats, w)
    preds = {
        r["doc_id"]: (1 if r["p"] >= 0.5 else 0, r["label"])
        for r in scored.collect()
    }
    assert all(p == y for p, y in preds.values())


def test_training_invariant_to_partitioning(spark):
    base = _docs(spark)
    w1 = train_logreg(
        hashed_features(base.repartition(2), label_col="label", n_features=D),
        n_features=D, n_iters=10, lr=2.0,
    )
    w2 = train_logreg(
        hashed_features(base.repartition(13), label_col="label", n_features=D),
        n_features=D, n_iters=10, lr=2.0,
    )
    # float sums reorder across partitionings; weights agree to tolerance
    # and decisions agree exactly
    np.testing.assert_allclose(w1, w2, atol=1e-9)


def test_bias_feature_present_and_empty_text_scored(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, "???")], "doc_id long, text string"
    )
    feats = hashed_features(df, n_features=D)
    rows = {r["doc_id"]: r for r in feats.collect()}
    assert rows[0]["idx"][-1] == D and rows[0]["val"][-1] == 1.0
    # doc 1 tokenizes to nothing → no feature row (no tokens): absent
    assert 1 not in rows
    w = np.zeros(D + 1)
    w[-1] = 2.0  # bias only
    scored = score_logreg(feats, w).collect()
    assert all(abs(r["p"] - 1.0 / (1.0 + np.exp(-2.0))) < 1e-12 for r in scored)


def test_token_weight_score_exact(spark):
    df = spark.createDataFrame(
        [(0, "Fast, fast and SLOW!"), (1, "nothing matches here")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["score"]
        for r in token_weight_score(
            df, {"fast": 2.0, "slow": -1.5}, bias=0.25
        ).collect()
    }
    assert out[0] == pytest.approx(2 * 2.0 - 1.5 + 0.25)
    assert out[1] == pytest.approx(0.25)  # unmatched docs keep the bias


def test_empty_feature_table_raises(spark):
    df = spark.createDataFrame([], "doc_id long, text string, label int")
    feats = hashed_features(df, label_col="label", n_features=D)
    with pytest.raises(ValueError, match="empty"):
        train_logreg(feats, n_features=D, n_iters=1)


def test_incremental_scoring_via_lake_change_feed(spark, tmp_path):
    """Continuous quality scoring: train once on the bootstrap corpus, then
    score ONLY each ingest batch's new/changed documents from the lake's
    change feed — scores for the delta must equal what a full-table rescore
    produces for those docs (same frozen weights), so historical text is
    never re-featurized. The deploy shape for the classifier: model frozen,
    features+scores computed per delta."""
    from data_sync_tool_spark.sources.lake import LakeTable

    t = LakeTable(
        spark, str(tmp_path / "docs"), ["doc_id"], n_buckets=4,
        merge_mode="mor", checksum=False,
    )
    boot = _docs(spark)
    t.merge_into(
        boot.selectExpr("doc_id", "text", "label", "'upsert' as op",
                        "doc_id as lsn"),
        batch_id="boot",
    )
    feats = hashed_features(t.read(), label_col="label", n_features=D, binarize=True)
    w = train_logreg(feats, n_features=D, n_iters=40, lr=4.0)  # frozen model
    last = t.read().agg(F.max("_lsn")).first()[0]
    new_rows = [
        (1000, "goodword quality alpha " * 3, 1),
        (1001, "spamword spamword beta " * 3, 0),
    ]
    t.merge_into(
        spark.createDataFrame(new_rows, "doc_id long, text string, label int")
        .selectExpr("doc_id", "text", "label", "'upsert' as op", "doc_id + 100000 as lsn"),
        batch_id="delta",
    )
    delta = t.changes_since(last).filter(F.col("op") == "upsert")
    assert delta.count() == 2  # feed carries only the new batch
    delta_scores = {
        r["doc_id"]: r["p"]
        for r in score_logreg(
            hashed_features(delta, n_features=D, binarize=True), w
        ).collect()
    }
    full_scores = {
        r["doc_id"]: r["p"]
        for r in score_logreg(
            hashed_features(t.read(), label_col="label", n_features=D, binarize=True), w
        ).collect()
    }
    assert set(delta_scores) == {1000, 1001}
    for k, v in delta_scores.items():
        assert v == pytest.approx(full_scores[k], abs=1e-12)
    assert delta_scores[1000] > 0.5 > delta_scores[1001]  # model generalizes
