"""M2: hierarchical hash reconciliation — the reference's golden-count
fixture (``/root/reference/test/engine/reconcile/init.sql`` +
``test_prepare_data_blocks.py:438-589``) rebuilt on DataFrames.

Fixture: ids 1..40000 in four 10k regions —
  1..10000  : identical both sides                       → N
  10001..20000: value differs (mod-19 vs mod-23; 437 ids agree) → M/N
  20001..30000: source-only                              → A
  30001..40000: sink-only                                → D
Golden totals at max_block_size=1 (full drilldown):
  A=10000  D=10000  N=10437  M=9563
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_sync_tool_spark.operators.reconcile import (
    HASH_MD5_HASH,
    MD5_SUM_HASH,
    Block,
    ReconcileConfig,
    build_blocks,
    get_data_range,
    merge_adjacent,
    plan_repair,
    status_counts,
)
from data_sync_tool_spark.sources.lake import LakeTable

GOLDEN = {"A": 10_000, "D": 10_000, "N": 10_437, "M": 9_563}


def _side(spark, regions: dict[int, int]):
    """Build one side: {region_no: mod} — value = id%100 + (id%mod)/10,
    ts = region-specific base + id minutes (mirrors init.sql)."""
    bases = {1: "2023-01-01 00:00:00", 2: "2023-01-07 23:40:00",
             3: "2023-01-14 23:20:00", 4: "2023-01-21 23:00:00"}
    parts = []
    for region, mod in regions.items():
        lo, hi = (region - 1) * 10_000 + 1, region * 10_000
        df = spark.range(lo, hi + 1).select(
            F.col("id").cast("int").alias("id"),
            F.concat(F.lit("Item "), F.col("id")).alias("name"),
            ((F.col("id") % 100) + (F.col("id") % mod) / 10.0).alias("value"),
            (F.to_timestamp(F.lit(bases[region]))
             + F.make_interval(mins=F.col("id"))).alias("created_at"),
        )
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@pytest.fixture(scope="module")
def source(spark):
    return _side(spark, {1: 17, 2: 19, 3: 13}).cache()


@pytest.fixture(scope="module")
def sink(spark):
    return _side(spark, {1: 17, 2: 23, 4: 11}).cache()


def _cfg(**kw):
    base = dict(
        partition_column="id",
        partition_column_type="int",
        strategy=MD5_SUM_HASH,
        fields=["id", "name", "value"],
        initial_partition_interval=10_000,
        interval_reduction_factor=10,
        max_block_size=1,
    )
    base.update(kw)
    return ReconcileConfig(**base)


def test_golden_counts_int_md5sum(spark, source, sink):
    blocks, statuses = build_blocks(source, sink, _cfg())
    assert status_counts(blocks) == GOLDEN


def test_golden_counts_int_ordered_hash(spark, source, sink):
    blocks, _ = build_blocks(
        source, sink, _cfg(strategy=HASH_MD5_HASH, order_column="id")
    )
    assert status_counts(blocks) == GOLDEN


def test_golden_counts_datetime(spark, source, sink):
    cfg = _cfg(
        partition_column="created_at",
        partition_column_type="datetime",
        initial_partition_interval=7 * 24 * 3600,  # 1 week
        max_block_size=1000,
    )
    blocks, _ = build_blocks(source, sink, cfg)
    c = status_counts(blocks)
    assert c["A"] == GOLDEN["A"] and c["D"] == GOLDEN["D"]
    # coarser leaf blocks: every mismatching id is inside an M block, every
    # region-1 id inside an N block; totals conserve
    assert c["N"] + c["M"] == GOLDEN["N"] + GOLDEN["M"]
    assert c["M"] >= GOLDEN["M"]


def test_region_purity(spark, source, sink):
    """Per-range purity like the reference's per-region asserts
    (test_prepare_data_blocks.py:235-295)."""
    blocks, _ = build_blocks(source, sink, _cfg(max_block_size=100))
    for b in blocks:
        if b.end <= 10_001:
            assert b.status == "N", b
        elif 20_000 < b.start and b.end <= 30_001:
            assert b.status == "A", b
        elif 30_000 < b.start:
            assert b.status == "D", b


def test_block_size_cap(spark, source, sink):
    """No emitted M/A block exceeds max_block_size unless it is a leaf-level
    block (reference cap invariant, test_prepare_data_blocks.py:297-331)."""
    cfg = _cfg(max_block_size=100)
    leaf_level = len(cfg.intervals())
    for b, s in zip(*build_blocks(source, sink, cfg)):
        if s in ("M", "A") and b.level < leaf_level:
            assert b.num_rows <= 100


def test_precomputed_hash_column(spark, source, sink):
    """hash_column shortcut (adapters/postgres.py:58-59): digest uses the
    stored checksum; a stored-hash mismatch shows up as M even when other
    fields would match."""
    from data_sync_tool_spark.functions.hashes import rowhash_int32

    s = source.withColumn("h", rowhash_int32("id", "name", "value"))
    k = sink.withColumn("h", rowhash_int32("id", "name", "value"))
    blocks, _ = build_blocks(s, k, _cfg(hash_column="h", fields=[]))
    assert status_counts(blocks) == GOLDEN


def test_data_range_union_and_clamp(spark, source, sink):
    cfg = _cfg()
    lo, hi = get_data_range(source, sink, cfg)
    assert (lo, hi) == (1, 40_001)  # union of sides + exclusive-end +1
    lo, hi = get_data_range(source, sink, _cfg(start=5_000, end=12_000))
    assert (lo, hi) == (5_000, 12_000)


def test_merge_adjacent_reference_semantics():
    blocks = [
        Block(0, 10, 2, 40, "M"),
        Block(10, 20, 2, 50, "M"),   # merges: 90 <= 100
        Block(20, 30, 2, 20, "M"),   # does not: 110 > 100
        Block(30, 40, 2, 10, "A"),   # status switch: no merge
        Block(40, 50, 2, 10, "A"),   # merges with previous A
        Block(50, 60, 2, 99, "N"),   # N never merges
        Block(60, 70, 2, 1, "N"),
    ]
    out, statuses = merge_adjacent(blocks, 100)
    assert [(b.start, b.end, b.num_rows) for b in out] == [
        (0, 20, 90), (20, 30, 20), (30, 50, 20), (50, 60, 99), (60, 70, 1)
    ]
    assert statuses == ["M", "M", "A", "N", "N"]


def test_interval_ladder_always_nests():
    """Every ladder interval exactly divides its parent — the invariant the
    drilldown's floor(bucket/ratio) parent mapping depends on. The reference's
    repeated-floor-division ladder violates it (e.g. 1y seconds at factor 10
    leaves 3153‖315), silently mapping boundary children to the wrong parent."""
    cases = [
        dict(initial_partition_interval=365 * 24 * 3600, max_block_size=1000,
             interval_reduction_factor=10),
        dict(initial_partition_interval=1000, max_block_size=10,
             interval_reduction_factor=7),
        dict(initial_partition_interval=999_983, max_block_size=3,
             interval_reduction_factor=13),
    ]
    for kw in cases:
        ladder = ReconcileConfig(partition_column="id", **kw).intervals()
        assert ladder == sorted(ladder, reverse=True)
        for parent, child in zip(ladder, ladder[1:]):
            assert parent % child == 0, (kw, ladder)


def test_boundary_mismatch_not_lost(spark):
    """One mismatched row adjacent to a coarse-bucket boundary must surface as
    exactly one M row at the leaf level, for ladders whose raw floor-division
    form misaligns (regression for the parent-mapping drop bug)."""
    src = spark.range(0, 5000).select(
        F.col("id").cast("int").alias("id"), F.col("id").cast("string").alias("v")
    )
    for bad_id in (685, 686, 999, 3429):  # around old misaligned boundaries
        snk = src.withColumn(
            "v", F.when(F.col("id") == bad_id, F.lit("CORRUPT")).otherwise(F.col("v"))
        )
        cfg = ReconcileConfig(
            partition_column="id", fields=["id", "v"],
            initial_partition_interval=1000, interval_reduction_factor=7,
            max_block_size=10,
        )
        c = status_counts(build_blocks(src, snk, cfg))
        assert c["M"] >= 1 and c["M"] <= cfg.intervals()[-1], (bad_id, c)
        assert c["A"] == 0 and c["D"] == 0
        assert c["N"] + c["M"] == 5000


def test_collect_settled_false_matches_golden(spark, source, sink):
    """Distributed-N mode: same golden totals, but N rows never reach the
    driver as per-bucket rows — plan.blocks holds only M/A/D."""
    plan = build_blocks(source, sink, _cfg(), collect_settled=False)
    assert status_counts(plan) == GOLDEN
    assert all(b.status != "N" for b in plan.blocks)
    assert plan.settled_n_rows == GOLDEN["N"]
    # repair plan from the N-free block list is identical in coverage:
    # M/A/D blocks are what plan_repair consumes
    assert status_counts(plan.blocks)["M"] == GOLDEN["M"]


def test_hash_column_hex_string(spark, source, sink):
    """A hex-md5 hash_column must NOT null out under the sum strategy
    (Spark's non-ANSI cast of hex → NULL would report every block 'M'...
    or worse, all-N when both sides go NULL)."""
    s = source.withColumn("h", F.md5(F.concat_ws("\x1f", "id", "name", "value")))
    k = sink.withColumn("h", F.md5(F.concat_ws("\x1f", "id", "name", "value")))
    blocks, _ = build_blocks(s, k, _cfg(hash_column="h", fields=[]))
    assert status_counts(blocks) == GOLDEN


def test_hash_column_bad_type_raises(spark, source, sink):
    s = source.withColumn("h", F.array(F.lit(1)))
    with pytest.raises(ValueError, match="hash_column"):
        build_blocks(s, s, _cfg(hash_column="h", fields=[]))


def test_repair_converges_to_all_N(spark, source, sink, tmp_path):
    """The load phase the reference never implemented: plan_repair → MERGE →
    re-reconcile shows zero M/A/D."""
    cfg = _cfg(max_block_size=500)
    lake = LakeTable(spark, str(tmp_path / "sink"), ["id"], n_buckets=8, checksum=False)
    lake.overwrite(sink, batch_id="seed", lsn=0)

    blocks, _ = build_blocks(source, lake.read().drop("_lsn"), cfg)
    changes = plan_repair(source, lake.read().drop("_lsn"), cfg, blocks, unique_keys=["id"], lsn=1)
    lake.merge_into(changes, batch_id="repair")

    blocks2, _ = build_blocks(source, lake.read().drop("_lsn"), cfg)
    c = status_counts(blocks2)
    assert c["M"] == 0 and c["A"] == 0 and c["D"] == 0
    assert c["N"] == 30_000  # full source now mirrored


def test_str_partition_column_hash_drilldown(spark, tmp_path):
    """str/uuid keys reconcile over the xxhash64 image of the key — the
    codepath the reference declares but raises on (adapters/postgres.py:52-53,
    its str test is disabled). Diffs localize in hash space; repair converges."""
    n = 20_000
    src = spark.range(n).select(
        F.format_string("u-%08d", F.col("id")).alias("uid"),
        (F.col("id") % 1000).alias("v"),
    )
    # 3 corrupt values + 5 sink-only keys + 5 source-only keys
    snk = (
        src.filter(~F.col("uid").isin(*[f"u-{i:08d}" for i in range(5)]))  # A
        .withColumn("v", F.when(F.col("uid").isin("u-00007777", "u-00008888",
                                                  "u-00009999"), -1)
                    .otherwise(F.col("v")))  # M
        .unionByName(spark.range(n, n + 5).select(
            F.format_string("u-%08d", F.col("id")).alias("uid"),
            F.lit(0).alias("v")))  # D
    )
    # max_block_size=1: full drilldown to single-key hash leaves, where
    # source-only/sink-only keys surface as A/D (at coarser leaves a hash
    # bucket mixes keys from both sides, so diffs settle as M blocks)
    cfg = ReconcileConfig(
        partition_column="uid", partition_column_type="str",
        fields=["uid", "v"], max_block_size=1,
    )
    plan = build_blocks(src, snk, cfg, collect_settled=False)
    c = status_counts(plan)
    assert c["A"] == 5 and c["D"] == 5 and c["M"] == 3
    assert c["N"] == n - 5 - 3

    lake = LakeTable(spark, str(tmp_path / "snk"), ["uid"], n_buckets=8, checksum=False)
    lake.overwrite(snk, batch_id="seed", lsn=0)
    cfg2 = ReconcileConfig(partition_column="uid", partition_column_type="str",
                           fields=["uid", "v"], max_block_size=200)
    blocks, _ = build_blocks(src, lake.read().drop("_lsn"), cfg2)
    changes = plan_repair(src, lake.read().drop("_lsn"), cfg2, blocks,
                          unique_keys=["uid"], lsn=1)
    lake.merge_into(changes, batch_id="repair")
    c2 = status_counts(build_blocks(src, lake.read().drop("_lsn"), cfg2))
    assert c2["M"] == 0 and c2["A"] == 0 and c2["D"] == 0 and c2["N"] == n
