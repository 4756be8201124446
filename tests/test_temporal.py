"""asof_join: merge-as-of semantics vs hand-computed expectations and a
pandas merge_asof cross-check."""

from __future__ import annotations

import pandas as pd
import pytest

from data_sync_tool_spark.operators.temporal import asof_join


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            ("u1", 10, "l-a"),
            ("u1", 20, "l-b"),
            ("u1", 5, "l-early"),   # before any right row → NULL
            ("u2", 7, "l-c"),
            ("u3", 9, "l-nokey"),   # key absent from right → NULL
            ("u1", None, "l-nullts"),
        ],
        "uid string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [
            ("u1", 10, "r-exact"),   # == left ts → inclusive match
            ("u1", 12, "r-mid"),
            ("u2", 3, "r-old"),
            ("u2", None, "r-null"),  # dropped
        ],
        "uid string, ts long, val string",
    )
    return left, right


def _by_tag(df):
    return {r.tag: r.val for r in df.collect()}


def test_asof_backward_inclusive(spark, sides):
    left, right = sides
    out = asof_join(left, right, on="ts", by=["uid"])
    assert _by_tag(out) == {
        "l-a": "r-exact",   # ties are inclusive
        "l-b": "r-mid",     # latest ≤ 20
        "l-early": None,
        "l-c": "r-old",
        "l-nokey": None,
        "l-nullts": None,
    }
    assert out.count() == left.count()  # left-join: every left row survives


def test_asof_forward_and_tolerance(spark, sides):
    left, right = sides
    fwd = asof_join(left, right, on="ts", by=["uid"], direction="forward")
    assert _by_tag(fwd) == {
        "l-a": "r-exact",   # inclusive at-or-after
        "l-b": None,        # nothing ≥ 20
        "l-early": "r-exact",
        "l-c": None,
        "l-nokey": None,
        "l-nullts": None,
    }
    tol = asof_join(left, right, on="ts", by=["uid"], tolerance=4)
    assert _by_tag(tol) == {
        "l-a": "r-exact",
        "l-b": None,        # 20-12=8 > 4 → nulled
        "l-early": None,
        "l-c": "r-old",     # 7-3=4 ≤ 4
        "l-nokey": None,
        "l-nullts": None,
    }


def test_asof_suffix_and_collision(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="collide"):
        # right carries a 'ts' value column colliding with left's
        asof_join(left, right, on="ts", by=["uid"], value_cols=["val", "ts"])
    out = asof_join(left, right, on="ts", by=["uid"],
                    value_cols=["val", "ts"], suffix="_r")
    row = {r.tag: (r.val_r, r.ts_r) for r in out.collect()}
    assert row["l-b"] == ("r-mid", 12)


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas merge_asof (the de-facto
    reference semantics) on a few hundred rows."""
    import numpy as np

    rng = np.random.RandomState(7)
    lpd = pd.DataFrame({
        "k": rng.randint(0, 5, 300).astype(str),
        "t": rng.randint(0, 10_000, 300).astype("int64"),
    })
    lpd["lid"] = range(300)
    rpd = pd.DataFrame({
        "k": rng.randint(0, 5, 200).astype(str),
        "t": rng.randint(0, 10_000, 200).astype("int64"),
    })
    rpd = rpd.drop_duplicates(["k", "t"])
    rpd["rid"] = range(len(rpd))
    expect = pd.merge_asof(
        lpd.sort_values("t"), rpd.sort_values("t"),
        on="t", by="k", direction="backward",
    ).set_index("lid")["rid"]
    out = asof_join(
        spark.createDataFrame(lpd), spark.createDataFrame(rpd),
        on="t", by=["k"],
    )
    got = {r.lid: r.rid for r in out.collect()}
    assert len(got) == 300
    for lid, rid in expect.items():
        want = None if pd.isna(rid) else int(rid)
        assert got[lid] == want, lid
