"""LakeTable — manifest-tracked parquet snapshots with Iceberg-style
copy-on-write MERGE, exactly-once commits, additive schema evolution, and
per-commit lineage.

Why not real Iceberg: this sandbox has no Iceberg runtime jar (no network
installs), so the engine implements the same physical design directly over
parquet. On a cluster with ``iceberg-spark-runtime`` on the classpath the
``merge_into`` body is replaceable by a single ``MERGE INTO`` statement — the
surrounding protocol (idempotence manifest, lineage, bucket pruning) is
identical.

Physical design (mirrors Iceberg v2 copy-on-write):
- Rows are hash-bucketed on the first key column:
  ``bucket_id = pmod(xxhash64(key), n_buckets)`` — Iceberg's
  ``bucket(N, key)`` partition transform.
- Each commit writes new parquet files under ``data/snap-{version}/`` and an
  atomic manifest ``_manifests/v{version}.json`` mapping bucket_id → file
  list. Buckets untouched by a commit carry their previous file entries
  forward — only dirty buckets are rewritten (copy-on-write at bucket
  granularity, the analogue of Iceberg rewriting only matched data files).
- Readers resolve the latest manifest and read exactly its file list:
  snapshot isolation; bucket pruning = selecting manifest entries, the
  analogue of Iceberg manifest-level partition pruning. At 100 TB this means a
  MERGE touching 2% of conversations reads/writes ~2% of the table.
- Exactly-once: every commit carries a ``batch_id``; ``merge_into`` is a no-op
  for an already-committed batch_id, so Structured Streaming retries /
  checkpoint replays cannot double-apply (reference analogue: none — the
  reference autocommits per row, ``/root/reference/adapters/postgres.py:115-117``).
- Lineage: each manifest records source offset range, op counts, and an
  order-independent table checksum (sum-of-rowhash; see
  ``functions.hashes.blockhash_sum``) — SURVEY §2.8 / north-star requirement.

Merge strategies (reference ``core/config.py:158-160``, README "Merge
Strategies"):
- ``upsert``        : last-writer-wins by monotone ``lsn``; deletes drop rows
                      when ``allow_delete`` (MERGE ... WHEN MATCHED DELETE).
- ``delete_insert`` : all target rows for keys present in the batch are
                      removed, then batch rows inserted.
- ``collapse``      : append-only sinks — a "nullify" cancel row (sign=-1)
                      is appended before each replacing insert
                      (ClickHouse CollapsingMergeTree protocol).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashes import rowhash_int32

# System columns stored in the table alongside user columns.
LSN_COL = "_lsn"  # monotone writer sequence — LWW authority + idempotent replay
BUCKET_COL = "_bucket"  # derived, directory-encoded at write, never stored in files
SIGN_COL = "_sign"  # collapse strategy only: +1 live row, -1 cancel row
DELETED_COL = "_deleted"  # tombstone marker: deletes are retained with their LSN so a
# late-arriving OLDER change cannot resurrect a deleted key (out-of-order
# delivery safety). Tombstone compaction is a maintenance op, not a merge op.

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


@dataclass
class MergeResult:
    version: int
    batch_id: str
    applied: bool  # False when batch_id was already committed (idempotent skip)
    touched_buckets: list[int] = field(default_factory=list)
    rows_written: int = 0
    stats: dict[str, Any] = field(default_factory=dict)


class LakeTable:
    """A single lake table rooted at ``path`` with key ``key_cols``."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        n_buckets: int = 32,
        checksum: bool = True,
    ) -> None:
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.n_buckets = n_buckets
        self.checksum = checksum
        os.makedirs(os.path.join(path, _MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(path, _DATA_DIR), exist_ok=True)

    # ------------------------------------------------------------- manifests
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, _MANIFEST_DIR, f"v{version:012d}.json")

    def current_version(self) -> int:
        names = [
            n for n in os.listdir(os.path.join(self.path, _MANIFEST_DIR))
            if n.startswith("v") and n.endswith(".json")
        ]
        return max((int(n[1:-5]) for n in names), default=0)

    def _load_manifest(self, version: int | None = None) -> dict[str, Any] | None:
        v = self.current_version() if version is None else version
        if v == 0:
            return None
        with open(self._manifest_path(v)) as f:
            return json.load(f)

    def _commit_manifest(self, manifest: dict[str, Any]) -> int:
        """Atomic commit: write temp file, rename to the next version. A
        os.rename to an existing path would clobber — single-writer protocol
        (the streaming driver); on a shared object store this would be a
        compare-and-swap / catalog commit, exactly Iceberg's commit path."""
        version = self.current_version() + 1
        manifest["version"] = version
        tmp = os.path.join(self.path, _MANIFEST_DIR, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        final = self._manifest_path(version)
        if os.path.exists(final):  # pragma: no cover - single-writer guard
            os.unlink(tmp)
            raise RuntimeError(f"concurrent commit detected at version {version}")
        os.rename(tmp, final)
        return version

    def committed_batch_ids(self) -> set[str]:
        m = self._load_manifest()
        return set(m.get("committed_batch_ids", [])) if m else set()

    def lineage(self) -> list[dict[str, Any]]:
        """Full lineage log: one record per commit, oldest first."""
        out = []
        for v in range(1, self.current_version() + 1):
            m = self._load_manifest(v)
            if m is not None:
                out.append(m.get("lineage", {}) | {"version": v})
        return out

    # ----------------------------------------------------------------- reads
    def _bucket_col(self) -> F.Column:
        return F.pmod(F.xxhash64(F.col(self.key_cols[0]).cast("string")), F.lit(self.n_buckets)).cast("int")

    def _schema(self) -> T.StructType | None:
        m = self._load_manifest()
        if m is None or not m.get("schema"):
            return None
        return T.StructType.fromJson(json.loads(m["schema"]))

    def read(
        self,
        buckets: list[int] | None = None,
        version: int | None = None,
        include_deleted: bool = False,
    ) -> DataFrame:
        """Snapshot read of the latest (or a pinned) version, optionally
        pruned to a bucket subset via the manifest (no file listing, no
        directory scan — the manifest IS the file index). Tombstones are
        filtered out unless ``include_deleted`` (merge internals need them)."""
        m = self._load_manifest(version)
        if m is None:
            schema = self._schema() or T.StructType([])
            return self.spark.createDataFrame([], schema)
        entries = m["buckets"]
        if buckets is not None:
            wanted = {str(b) for b in buckets}
            files = [f for b, fs in entries.items() if b in wanted for f in fs]
        else:
            files = [f for fs in entries.values() for f in fs]
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        if not files:
            return self.spark.createDataFrame([], schema)
        # mergeSchema handles additive evolution across snapshots; the manifest
        # schema is authoritative for column order and new columns.
        df = self.spark.read.schema(schema).option("mergeSchema", "true").parquet(*files)
        if not include_deleted and DELETED_COL in df.columns:
            df = df.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False))).drop(DELETED_COL)
        return df

    # ---------------------------------------------------------------- writes
    def _write_snapshot(self, df: DataFrame, version_hint: int) -> dict[str, list[str]]:
        """Write ``df`` (which must carry BUCKET_COL) partitioned by bucket
        under a fresh snapshot dir; return bucket_id → absolute file list."""
        snap = os.path.join(self.path, _DATA_DIR, f"snap-{version_hint:012d}-{uuid.uuid4().hex[:8]}")
        df.write.partitionBy(BUCKET_COL).mode("errorifexists").parquet(snap)
        out: dict[str, list[str]] = {}
        for entry in sorted(os.listdir(snap)):
            if not entry.startswith(f"{BUCKET_COL}="):
                continue
            b = entry.split("=", 1)[1]
            d = os.path.join(snap, entry)
            out[b] = sorted(
                os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
            )
        return out

    @staticmethod
    def _count_rows(files: list[str]) -> int:
        import pyarrow.parquet as pq

        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)

    def _table_checksum(self, df: DataFrame, cols: list[str]) -> int:
        """Order-independent table digest: sum of int32 rowhashes over all
        data columns — comparable across engines and across cluster sizes."""
        row = df.select(F.coalesce(F.sum(rowhash_int32(*cols)), F.lit(0)).alias("c")).first()
        return int(row["c"])

    def overwrite(self, df: DataFrame, batch_id: str = "overwrite", lsn: int = 0) -> MergeResult:
        """Full-table replace (initial load). Adds LSN_COL if absent."""
        if LSN_COL not in df.columns:
            df = df.withColumn(LSN_COL, F.lit(lsn).cast("long"))
        df = df.withColumn(BUCKET_COL, self._bucket_col())
        data_schema = df.drop(BUCKET_COL).schema
        buckets = self._write_snapshot(df, self.current_version() + 1)
        files = [f for fs in buckets.values() for f in fs]
        n = self._count_rows(files)
        manifest = {
            "buckets": buckets,
            "schema": json.dumps(data_schema.jsonValue()),
            "committed_batch_ids": sorted(self.committed_batch_ids() | {batch_id}),
            "lineage": {"batch_id": batch_id, "op": "overwrite", "rows_written": n},
        }
        v = self._commit_manifest(manifest)
        return MergeResult(v, batch_id, True, [int(b) for b in buckets], n)

    # ----------------------------------------------------------------- merge
    def merge_into(
        self,
        batch_df: DataFrame,
        batch_id: str,
        op_col: str = "op",
        lsn_col: str = "lsn",
        strategy: str = "upsert",
        allow_delete: bool = True,
        lineage_extra: dict[str, Any] | None = None,
    ) -> MergeResult:
        """Apply one change batch. ``batch_df`` columns = data columns +
        ``op_col`` ∈ {insert, update, upsert, delete} + monotone ``lsn_col``.

        Execution plan (one shuffle + one partitioned write):
        1. idempotence gate on ``batch_id``;
        2. bucket the batch; collect the (small) set of dirty bucket ids;
        3. union dirty-bucket target rows (authority = stored ``_lsn``) with
           batch rows and reduce per key with ``max_by(struct, lsn)`` —
           a hash aggregate with map-side partial combine, so a hot
           conversation key is pre-reduced on every input partition before
           the shuffle (skew-safe without explicit salting; AQE skew-join
           covers the residual);
        4. drop rows whose winning op is delete (when allowed);
        5. rewrite ONLY dirty buckets into a new snapshot; carry the rest
           forward in the manifest.
        """
        if batch_id in self.committed_batch_ids():
            return MergeResult(self.current_version(), batch_id, False)
        if strategy not in ("upsert", "delete_insert", "collapse"):
            raise ValueError(f"unknown merge strategy: {strategy}")

        data_cols = [c for c in batch_df.columns if c not in (op_col, lsn_col)]
        batch = (
            batch_df.withColumn(LSN_COL, F.col(lsn_col).cast("long"))
            .withColumn("_op", F.col(op_col))
            .drop(op_col, lsn_col)
            .withColumn(BUCKET_COL, self._bucket_col())
        )
        if strategy == "collapse":
            return self._merge_collapse(batch, data_cols, batch_id, allow_delete, lineage_extra)

        dirty = [r[BUCKET_COL] for r in batch.select(BUCKET_COL).distinct().collect()]
        target = self.read(buckets=dirty, include_deleted=True)
        all_data_cols = list(dict.fromkeys(
            [c for c in target.columns if c not in (LSN_COL, DELETED_COL)] + data_cols
        ))

        if strategy == "delete_insert":
            # remove every target row whose key matches a batch key, then
            # insert batch rows: left_anti + union (both bucket-pruned).
            # NOTE: physical-removal semantics (no tombstones) — this strategy
            # assumes in-order delivery, matching the reference's
            # delete-then-insert contract (README "Merge Strategies").
            keys = batch.select(*self.key_cols).distinct()
            survivors = target.join(F.broadcast(keys), on=self.key_cols, how="left_anti")
            inserts = (
                batch.filter(F.col("_op") != F.lit("delete"))
                .drop("_op", BUCKET_COL)
                .withColumn(DELETED_COL, F.lit(False))
            )
            resolved = survivors.unionByName(inserts, allowMissingColumns=True)
            resolved = resolved.withColumn(
                DELETED_COL, F.coalesce(F.col(DELETED_COL), F.lit(False))
            )
        else:  # upsert (LWW)
            if DELETED_COL in target.columns:
                tgt = target.withColumn(
                    "_op",
                    F.when(F.coalesce(F.col(DELETED_COL), F.lit(False)), F.lit("delete"))
                    .otherwise(F.lit("upsert")),
                ).drop(DELETED_COL)
            else:
                tgt = target.withColumn("_op", F.lit("upsert"))
            src = batch.drop(BUCKET_COL)
            if not allow_delete:
                # deletes are ignored entirely (reference MergeStrategyConfig
                # allow_delete=False, core/config.py:158-160): drop them before
                # the reduce so the previous live row keeps winning.
                src = src.filter(F.col("_op") != F.lit("delete"))
            unioned = tgt.unionByName(src, allowMissingColumns=True)
            # winner per key = row with max (_lsn, op_rank). op_rank breaks the
            # (never-expected) lsn tie deterministically: delete > upsert, so a
            # tied delete wins — documented LWW tiebreak (SURVEY §7 hard parts).
            op_rank = F.when(F.col("_op") == "delete", 2).otherwise(1)
            payload = F.struct(
                F.col(LSN_COL), op_rank.alias("_op_rank"), F.col("_op"),
                *[F.col(c) for c in all_data_cols],
            )
            winner = unioned.groupBy(*self.key_cols).agg(F.max(payload).alias("w"))
            resolved = winner.select(
                *self.key_cols,
                *[F.col(f"w.{c}").alias(c) for c in all_data_cols if c not in self.key_cols],
                F.col(f"w.{LSN_COL}").alias(LSN_COL),
                # deletes become TOMBSTONES, not removals: a late-arriving
                # change with a smaller lsn must lose to the delete.
                (F.col("w._op") == F.lit("delete")).alias(DELETED_COL),
            )

        resolved = resolved.withColumn(BUCKET_COL, self._bucket_col())
        data_schema = resolved.drop(BUCKET_COL).schema
        new_entries = self._write_snapshot(resolved, self.current_version() + 1)
        # carry forward untouched buckets; dirty buckets map to the new files
        # (a dirty bucket that resolved to zero rows maps to no files — that is
        # the copy-on-write delete).
        prev = self._load_manifest()
        buckets = dict(prev["buckets"]) if prev else {}
        for b in dirty:
            buckets.pop(str(b), None)
        buckets.update(new_entries)

        new_files = [f for fs in new_entries.values() for f in fs]
        rows_written = self._count_rows(new_files)
        stats: dict[str, Any] = {
            "op_counts": {
                r["_op"]: r["n"]
                for r in batch.groupBy("_op").agg(F.count(F.lit(1)).alias("n")).collect()
            },
        }
        lineage = {
            "batch_id": batch_id,
            "op": f"merge:{strategy}",
            "touched_buckets": sorted(int(b) for b in new_entries),
            "rows_written": rows_written,
            **stats,
            **(lineage_extra or {}),
        }
        if self.checksum:
            chk_cols = [
                c for c in data_schema.fieldNames() if c not in (LSN_COL, DELETED_COL, SIGN_COL)
            ]
            all_files = [f for fs in buckets.values() for f in fs]
            full = (
                self.spark.read.schema(data_schema).option("mergeSchema", "true").parquet(*all_files)
                if all_files
                else self.spark.createDataFrame([], data_schema)
            )
            if DELETED_COL in full.columns:
                full = full.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False)))
            lineage["table_checksum"] = self._table_checksum(full, chk_cols)
        manifest = {
            "buckets": buckets,
            "schema": json.dumps(data_schema.jsonValue()),
            "committed_batch_ids": sorted(self.committed_batch_ids() | {batch_id}),
            "lineage": lineage,
        }
        v = self._commit_manifest(manifest)
        return MergeResult(v, batch_id, True, sorted(int(b) for b in new_entries), rows_written, stats)

    def _merge_collapse(
        self,
        batch: DataFrame,
        data_cols: list[str],
        batch_id: str,
        allow_delete: bool,
        lineage_extra: dict[str, Any] | None,
    ) -> MergeResult:
        """Collapse strategy: append-only. For each incoming change, append a
        cancel row (_sign=-1) mirroring the currently-live row (if any), then
        the new row with _sign=+1 (deletes append only the cancel row).
        Readers reconstruct live state by summing signs per (key, lsn) — the
        ClickHouse CollapsingMergeTree protocol the reference targets for its
        append-only ClickHouse sink (``/root/reference/adapters/clickhouse.py:93-105``)."""
        dirty = [r[BUCKET_COL] for r in batch.select(BUCKET_COL).distinct().collect()]
        target = self.read(buckets=dirty)
        if not target.columns:  # fresh table: empty frame with the batch's shape
            target = batch.drop(BUCKET_COL, "_op").withColumn(SIGN_COL, F.lit(1)).limit(0)
        live = collapse_live_view(target, self.key_cols) if SIGN_COL in target.columns else target
        op_rank = F.when(F.col("_op") == "delete", 2).otherwise(1)
        latest = (
            batch.groupBy(*self.key_cols)
            .agg(F.max(F.struct(F.col(LSN_COL), op_rank.alias("_r"), F.col("_op"),
                                *[F.col(c) for c in data_cols if c not in self.key_cols])).alias("w"))
            .select(*self.key_cols,
                    *[F.col(f"w.{c}").alias(c) for c in data_cols if c not in self.key_cols],
                    F.col(f"w.{LSN_COL}").alias(LSN_COL), F.col("w._op").alias("_op"))
        )
        cancels = (
            live.join(latest.select(*self.key_cols), on=self.key_cols, how="left_semi")
            .withColumn(SIGN_COL, F.lit(-1))
        )
        inserts = (
            latest.filter(F.col("_op") != F.lit("delete")).drop("_op").withColumn(SIGN_COL, F.lit(1))
        )
        appended = cancels.unionByName(inserts, allowMissingColumns=True)
        existing_sign = target if SIGN_COL in target.columns else target.withColumn(SIGN_COL, F.lit(1))
        resolved = existing_sign.unionByName(appended, allowMissingColumns=True)
        resolved = resolved.withColumn(BUCKET_COL, self._bucket_col())
        data_schema = resolved.drop(BUCKET_COL).schema
        new_entries = self._write_snapshot(resolved, self.current_version() + 1)
        prev = self._load_manifest()
        buckets = dict(prev["buckets"]) if prev else {}
        for b in dirty:
            buckets.pop(str(b), None)
        buckets.update(new_entries)
        rows_written = self._count_rows([f for fs in new_entries.values() for f in fs])
        manifest = {
            "buckets": buckets,
            "schema": json.dumps(data_schema.jsonValue()),
            "committed_batch_ids": sorted(self.committed_batch_ids() | {batch_id}),
            "lineage": {"batch_id": batch_id, "op": "merge:collapse",
                        "rows_written": rows_written, **(lineage_extra or {})},
        }
        v = self._commit_manifest(manifest)
        return MergeResult(v, batch_id, True, sorted(int(b) for b in new_entries), rows_written)

    # ------------------------------------------------------------- utilities
    def destroy(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)


def collapse_live_view(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Reconstruct live rows from a collapse-strategy table: per (key, lsn)
    keep rows whose sign sum is +1 (cancel rows annihilate their original)."""
    cols = [c for c in df.columns if c != SIGN_COL]
    return (
        df.groupBy(*cols)
        .agg(F.sum(SIGN_COL).alias("_s"))
        .filter(F.col("_s") > 0)
        .drop("_s")
    )
