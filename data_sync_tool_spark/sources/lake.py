"""LakeTable — manifest-tracked parquet snapshots with Iceberg-style MERGE
(copy-on-write AND merge-on-read), exactly-once commits, additive schema
evolution, and per-commit lineage.

Why not real Iceberg: this sandbox has no Iceberg runtime jar (no network
installs), so the engine implements the same physical design directly over
parquet. On a cluster with ``iceberg-spark-runtime`` on the classpath the
``merge_into`` body is replaceable by ``MERGE INTO`` (CoW) or equality-delete
writes (MoR); the surrounding protocol (idempotence manifest, lineage, bucket
pruning) is identical.

Physical design (mirrors Iceberg v2):
- Rows are hash-bucketed on the first key column:
  ``bucket_id = pmod(xxhash64(key), n_buckets)`` — Iceberg's
  ``bucket(N, key)`` partition transform.
- Each commit writes new parquet files under ``data/snap-*/`` and an atomic
  manifest ``_manifests/v{version}.json`` mapping bucket_id → {base files,
  delta files}. Untouched buckets carry their previous entries forward.
- Readers resolve the latest manifest and read exactly its file list:
  snapshot isolation; bucket pruning = selecting manifest entries (Iceberg
  manifest-level partition pruning). A MERGE touching 2% of conversations
  reads/writes ~2% of the table.
- **CoW mode** (``merge_mode="cow"``): dirty buckets are rewritten per batch —
  reads stay cheap (base files are fully resolved), writes cost
  O(dirty-bucket size). Right when batches are rare/large or reads dominate.
- **MoR mode** (``merge_mode="mor"``): each batch appends its (deduped,
  tombstone-carrying) rows as DELTA files — write cost O(batch), independent
  of table size; reads LWW-resolve base∪delta on the fly (Iceberg equality
  deletes). ``compact()`` folds deltas back into base. Right for high-rate
  CDC ingest — the 10^10-event design point.
- Exactly-once: every commit carries a ``batch_id``; ``merge_into`` is a no-op
  for an already-committed batch_id, so Structured Streaming checkpoint
  replays cannot double-apply (reference autocommits per row with no such
  guard: ``/root/reference/adapters/postgres.py:115-117``).
- Deletes are TOMBSTONES (``_deleted`` + the delete's LSN): a late-arriving
  older change can never resurrect a deleted key. Tombstone GC is a
  maintenance op, deliberately not part of merge.
- Lineage: each manifest records batch offsets, op counts, a batch checksum
  (sum-of-rowhash over the rows this commit wrote) and — whenever the table
  is in a fully-resolved state — an exact live-table checksum.

Checksum design (incremental, never O(table) on the hot path):
- Every data file's digest (sum of xxhash64 rowhashes over its non-deleted
  rows) is computed ONCE, when the file is first committed — an O(new files)
  scan — and cached in the manifest next to the file list.
- ``table_checksum`` (order-independent digest of LIVE rows, comparable
  across merge modes / bucket counts / engines) is the SUM of the cached
  per-file digests. That sum is exact precisely when every live file holds
  fully-resolved rows: CoW commits, overwrite, compact, expire, rescale.
  While MoR delta files are pending (upsert AND collapse — pending version
  deltas make the live set LWW-defined), the commit records
  ``table_checksum: null`` and the next resolving commit (compact) restores
  the exact value — still from cached + newly-written file digests only.
  Collapse tables participate fully: their post-compact base holds exactly
  the live rows, and ``overwrite`` rejects raw ±1 sign imports (a cancel
  pair would double-count in a digest sum instead of annihilating).
- ``batch_checksum`` rides every commit's lineage regardless (digest of the
  rows the commit wrote — the per-batch lineage contract).
- ``audit_checksum()`` is the explicit full-recompute op (works in any
  state); tests assert it equals the incremental value at every resolved
  commit.
- After additive schema evolution, cached digests computed under the old
  column set go stale (the rowhash spans all data columns). Stale files are
  re-digested lazily at the next resolving commit — one bounded catch-up
  read, never a per-commit penalty.

Merge strategies (reference ``core/config.py:158-160``, README "Merge
Strategies"):
- ``upsert``        : last-writer-wins by monotone ``lsn``.
- ``delete_insert`` : target rows for batch keys removed, then batch inserted
                      (CoW only — needs key-match removal).
- ``collapse``      : append-only sinks, DEFERRED-cancel: each batch appends
                      its latest version per key as ``_sign=+1`` delta rows
                      (deletes as tombstone-marked version rows) and reads
                      NOTHING — superseded versions annihilate at read time
                      (LWW by ``_lsn``) and physically at ``compact()``,
                      which rewrites survivors as +1 base. This is exactly
                      ClickHouse VersionedCollapsingMergeTree: versioned +1
                      inserts collapse by (key, version) at background-merge
                      time, because synthesizing cancel rows at insert time
                      costs a point lookup per key — at a 10^10-row table an
                      O(live-rows) probe per micro-batch (what an eager
                      cancel emitter must pay). Engine-written collapse
                      tables therefore never contain ``_sign=-1`` rows;
                      ``collapse_live_view`` still folds externally-supplied
                      raw sign data (and is the identity on engine tables).
                      Caveat: do NOT import a raw cancel-pair (+1/-1) stream
                      via ``overwrite`` and then merge on top — unannihilated
                      imported pairs are not LWW-resolvable; fold them first.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashes import rowhash_xxhash64


def _row_digest(*cols):
    """Per-row digest term: 32-bit-reduced xxhash64. Long sums of these
    never overflow below 2^31 rows per file, so every aggregation stays a
    primitive long buffer (decimal accumulators measured ~2x slower in the
    write-job observe path); Python carries the unbounded cross-file sums."""
    return F.shiftrightunsigned(rowhash_xxhash64(*cols), 32)

# System columns stored in the table alongside user columns.
LSN_COL = "_lsn"  # monotone writer sequence — LWW authority + idempotent replay
BUCKET_COL = "_bucket"  # derived, directory-encoded at write, never stored in files
SIGN_COL = "_sign"  # collapse strategy only: +1 live row, -1 cancel row
DELETED_COL = "_deleted"  # tombstone marker (see module docstring)

_SYSTEM_COLS = (LSN_COL, DELETED_COL, SIGN_COL)
# observe()-based digests build n_buckets aggregate expressions into the
# write job; beyond this, fall back to the file-grouped read in
# _maintain_digests (plan size / codegen limits)
_OBSERVE_DIGEST_MAX_BUCKETS = 256
_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"

# Per-file key bloom filters (opt-in, ``bloom_filters=True``): point-lookup
# file skipping WITHIN a bucket — the index zone maps cannot provide for
# hash-random keys. Positions are computed once at _BLOOM_M_MAX resolution
# and folded (pow2 halving ORs) down to the smallest size meeting the
# false-positive target for the file's row count, so tiny delta files carry
# tiny blooms. k hash functions via double hashing over xxhash64 — the SAME
# engine-side expressions serve build and probe, so there is no Python
# reimplementation to drift.
_BLOOM_K = 3
_BLOOM_M_MAX = 1 << 17  # 16 KiB of bits; exact fp target up to ~10k keys/file
_BLOOM_M_MIN = 1 << 10
_BLOOM_BITS_PER_KEY = 13  # m ≈ 13n with k=3 → fp ≈ 1%


class ConstraintViolationError(ValueError):
    """A merge batch contains rows failing the table's CHECK constraints
    and the table is configured ``on_violation="error"``."""


class ConcurrentWriteError(RuntimeError):
    """Another writer committed between this operation's manifest read and
    its commit; committing the stale bucket map would silently drop the
    other writer's files. The operation was NOT applied — retry it."""


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
        merge_mode: str = "cow",
        track_stats: bool = True,
        idempotence_window: int = 10_000,
        bloom_filters: bool = False,
        stats_columns: list[str] | None = None,
        constraints: dict[str, str] | None = None,
        on_violation: str = "error",
        ttl: str | None = None,
    ) -> None:
        if merge_mode not in ("cow", "mor"):
            raise ValueError(f"merge_mode must be cow|mor, got {merge_mode}")
        if on_violation not in ("error", "quarantine"):
            raise ValueError(
                f"on_violation must be error|quarantine, got {on_violation}"
            )
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.n_buckets = n_buckets
        self.checksum = checksum
        self.merge_mode = merge_mode
        # per-batch op-count lineage costs one extra scan of the batch;
        # max-throughput ingest turns it off (offsets/rows still recorded)
        self.track_stats = track_stats
        # opt-in per-file key blooms: each commit pays one keys-only
        # column-pruned read-back of its NEW files (O(batch)); point-lookup
        # reads then skip bucket files that cannot contain the probed keys
        self.bloom_filters = bloom_filters
        # opt-in per-file min/max zone maps for NON-key columns (Delta/Iceberg
        # "data skipping" stats): harvested from parquet footers at commit
        # time (metadata-only, O(new files)); ``read(ranges=...)`` prunes
        # files on resolved buckets. Persisted in the manifest so every
        # reader skips with the same index.
        self.stats_columns = list(stats_columns or [])
        # exactly-once memory: how many recent batch_ids each manifest
        # retains. Bounded so manifests stay O(1) over 10^6 commits; safe
        # because a checkpointed source can only re-deliver batches within
        # its replay horizon (Structured Streaming replays at most the last
        # uncommitted epoch — a horizon of 1).
        self.idempotence_window = idempotence_window
        os.makedirs(os.path.join(path, _MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(path, _DATA_DIR), exist_ok=True)
        # the manifest is authoritative for the bucket count (rescale
        # persists it); a constructor mismatch silently follows the manifest
        # CHECK constraints (Delta CHECK-constraint analogue): name → SQL
        # boolean expression over data columns, enforced on every merge for
        # non-delete rows. A row violates when the expression is FALSE
        # (NULL passes, SQL CHECK semantics). on_violation="error" aborts
        # the batch (nothing committed); "quarantine" diverts violating
        # rows to {path}/_quarantine/<batch_id> (the row-level DLQ) and
        # merges the rest, recording rows_quarantined in lineage — so a
        # quarantined VERSION is as if it never arrived: LWW serves the
        # key's previous value. Cost: one extra O(batch) job per merge
        # (the violation probe / quarantine write); zero when unset.
        self.constraints = dict(constraints or {})
        self.on_violation = on_violation
        # declarative row TTL (ClickHouse TTL analogue): SQL boolean over
        # data columns; TRUE = expired. Enforced at compact() — expired
        # versions are dropped during the fold (zero extra jobs: the filter
        # rides the rewrite) and rows_expired lands in lineage. Reads may
        # serve expired rows until the next compact, exactly like ClickHouse
        # SELECTs before a background merge. Same retention caveat as
        # expire_tombstones: only expire past the source's replay horizon,
        # or a late-arriving OLDER version of an expired key resurrects.
        self.ttl = ttl
        m = self._load_manifest()
        if m is not None and m.get("n_buckets"):
            self.n_buckets = int(m["n_buckets"])
        if m is not None and not self.stats_columns:
            # follow the manifest like n_buckets; an explicit constructor
            # list still wins (enables stats on an existing table)
            self.stats_columns = list(m.get("stats_columns", []))
        if m is not None and not self.constraints:
            # constraints are TABLE properties: persisted in the manifest so
            # every writer handle enforces them, not just the declaring one
            self.constraints = dict(m.get("constraints", {}))
            self.on_violation = m.get("on_violation", self.on_violation)
        if m is not None and self.ttl is None:
            self.ttl = m.get("ttl")

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
        try:
            with open(self._manifest_path(v)) as f:
                return json.load(f)
        except FileNotFoundError:  # vacuumed (expired) version
            return None

    def _commit_manifest(self, manifest: dict[str, Any]) -> int:
        """Atomic commit: write temp file, rename to the next version.
        Single-writer protocol (the streaming driver); on a shared object
        store this is a catalog compare-and-swap — exactly Iceberg's commit."""
        version = self.current_version() + 1
        manifest["version"] = version
        # wall-clock commit time: powers read(as_of=...) and age-based
        # vacuum. Informational only — ordering authority is the version
        # number (monotonic single-writer), never the clock.
        manifest["committed_at"] = time.time()
        tmp = os.path.join(self.path, _MANIFEST_DIR, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        final = self._manifest_path(version)
        # Atomic create-if-absent publish: os.link fails with EEXIST if a
        # racing writer already claimed this version number, whereas an
        # exists()-check + rename would let the later rename silently
        # clobber the earlier commit (POSIX rename overwrites). This is
        # the filesystem analogue of Iceberg's catalog compare-and-swap.
        try:
            os.link(tmp, final)
        except FileExistsError:
            raise RuntimeError(f"concurrent commit detected at version {version}")
        finally:
            os.unlink(tmp)
        return version

    def version_as_of(self, ts: Any) -> int:
        """Latest version committed at or before ``ts`` (epoch seconds, a
        datetime — naive means UTC, the engine convention — or an ISO
        string): Iceberg's snapshot-as-of-timestamp resolution. Bounded
        backward walk over retained manifests; raises if ``ts`` predates
        the vacuum horizon (like any expired version)."""
        import datetime as _dt

        if isinstance(ts, str):
            ts = _dt.datetime.fromisoformat(ts)
        if isinstance(ts, _dt.datetime):
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=_dt.timezone.utc)
            ts = ts.timestamp()
        for v in range(self.current_version(), 0, -1):
            m = self._load_manifest(v)
            if m is None:  # vacuumed horizon
                break
            if float(m.get("committed_at", 0.0)) <= float(ts):
                return v
        raise ValueError(
            f"no retained version committed at or before {ts} "
            f"(expired by vacuum, or the table is younger)"
        )

    def committed_batch_ids(self) -> set[str]:
        m = self._load_manifest()
        return set(m.get("committed_batch_ids", [])) if m else set()

    def history(self, last: int | None = None) -> DataFrame:
        """Commit history as a DataFrame (Iceberg ``table.history`` /
        ``DESCRIBE HISTORY`` analogue): one row per commit with op, batch_id,
        rows_written, offsets, checksum."""
        rows = [
            {
                "version": rec.get("version"),
                "committed_at": rec.get("committed_at"),
                "op": rec.get("op"),
                "batch_id": rec.get("batch_id"),
                "rows_written": rec.get("rows_written"),
                "offset_min": rec.get("offset_min"),
                "offset_max": rec.get("offset_max"),
                "table_checksum": rec.get("table_checksum"),
            }
            for rec in self.lineage(last=last)
        ]
        schema = (
            "version long, committed_at double, op string, batch_id string, "
            "rows_written long, offset_min long, offset_max long, "
            "table_checksum long"
        )
        return self.spark.createDataFrame(rows, schema)

    def lineage(self, last: int | None = None) -> list[dict[str, Any]]:
        """Lineage log, oldest first. ``last=N`` reads only the N most recent
        manifests — O(N) driver-side JSON reads instead of O(versions); use
        it on long-lived tables (a 10^6-commit table must not open a million
        manifests to answer "what happened recently")."""
        out = []
        current = self.current_version()
        lo = max(1, current - last + 1) if last is not None else 1
        for v in range(lo, current + 1):
            m = self._load_manifest(v)
            if m is not None:
                out.append(m.get("lineage", {}) | {
                    "version": v, "committed_at": m.get("committed_at"),
                })
        return out

    # ---------------------------------------------------------------- common
    def _bucket_col(self) -> F.Column:
        return F.pmod(
            F.xxhash64(F.col(self.key_cols[0]).cast("string")), F.lit(self.n_buckets)
        ).cast("int")

    # ----------------------------------------------------------- key blooms
    def _bloom_positions(self, key: F.Column) -> list[F.Column]:
        """The k bloom bit positions of ``key`` at ``_BLOOM_M_MAX`` resolution,
        as engine-side expressions (double hashing g_i = h1 + i*h2 over
        xxhash64 — Kirsch-Mitzenmacher). Build and probe share THESE exact
        expressions, so the two sides can never disagree. Operands are
        reduced mod m before combining — no ANSI long overflow."""
        ks = key.cast("string")
        b1 = F.pmod(F.xxhash64(ks), F.lit(_BLOOM_M_MAX))
        b2 = F.pmod(F.xxhash64(F.lit("_bloom"), ks), F.lit(_BLOOM_M_MAX))
        return [
            F.pmod(b1 + F.lit(i) * b2, F.lit(_BLOOM_M_MAX)) for i in range(_BLOOM_K)
        ]

    def _file_blooms(self, files: list[str], schema: T.StructType) -> dict[str, dict[str, Any]]:
        """Per-file bloom over the FIRST key column for exactly ``files`` —
        ONE keys-only, column-pruned scan (grouped by ``input_file_name``,
        sparse (file, word) partial aggregates; no wide aggregate row). Each
        file's bloom is folded from the max resolution down to the smallest
        pow2 meeting the ~1% fp target for its row count, so small delta
        files carry small blooms. Zero-row files get no bloom (always read)."""
        if not files:
            return {}
        import base64
        from urllib.parse import unquote, urlparse

        key = self.key_cols[0]
        df = self.spark.read.schema(schema).parquet(*files).select(
            F.input_file_name().alias("_f"), F.col(key)
        )
        pos = F.array(*self._bloom_positions(F.col(key)))
        rows = (
            df.select("_f", F.explode(pos).alias("p"))
            .select(
                "_f",
                F.shiftright(F.col("p"), 6).alias("w"),
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("b"),
            )
            .groupBy("_f", "w")
            .agg(F.bit_or("b").alias("bits"), F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        per: dict[str, dict[int, int]] = {}
        n_pos: dict[str, int] = {}
        for r in rows:
            p = r["_f"]
            if p.startswith("file:"):
                p = unquote(urlparse(p).path)
            per.setdefault(p, {})[int(r["w"])] = r["bits"] & 0xFFFFFFFFFFFFFFFF
            n_pos[p] = n_pos.get(p, 0) + int(r["cnt"])
        out: dict[str, dict[str, Any]] = {}
        for f in files:
            words = per.get(f)
            if not words:
                continue
            n = max(1, n_pos[f] // _BLOOM_K)  # rows ≥ distinct keys: conservative m
            m = _BLOOM_M_MIN
            while m < _BLOOM_M_MAX and m < _BLOOM_BITS_PER_KEY * n:
                m *= 2
            buf = bytearray(_BLOOM_M_MAX // 8)
            for w, bits in words.items():
                buf[w * 8:(w + 1) * 8] = bits.to_bytes(8, "little")
            while len(buf) * 8 > m:  # pow2 fold: bit p at 2m ORs into p mod m
                half = len(buf) // 2
                buf = bytearray(a | b for a, b in zip(buf[:half], buf[half:]))
            out[f] = {
                "bloom": base64.b64encode(bytes(buf)).decode("ascii"),
                "bloom_m": m,
                "bloom_k": _BLOOM_K,
            }
        return out

    def _probe_keys(
        self, keys: list[Any], key_type: T.DataType,
        n_buckets: int | None = None,
    ) -> list[tuple[Any, int, list[int]]]:
        """(key, bucket, bloom positions) for each probe key — ONE tiny job
        over the bounded key list, using the same bucket/bloom expressions
        as the write path. ``n_buckets`` MUST come from the manifest being
        probed, not the constructor cache: a long-lived handle used after
        another process rescale()s would otherwise prune to wrong buckets
        and silently miss rows (hash-bucket pruning is not conservative
        under a stale bucket count, unlike range/bloom pruning)."""
        kt = self.spark.createDataFrame(
            [(k,) for k in keys], T.StructType([T.StructField("k", key_type)])
        )
        bucket = F.pmod(
            F.xxhash64(F.col("k").cast("string")),
            F.lit(int(n_buckets if n_buckets is not None else self.n_buckets)),
        ).cast("int")
        rows = kt.select(
            F.col("k"), bucket.alias("b"),
            F.array(*self._bloom_positions(F.col("k"))).alias("p"),
        ).collect()
        return [(r["k"], int(r["b"]), [int(x) for x in r["p"]]) for r in rows]

    @staticmethod
    def _bloom_may_contain(
        st: dict[str, Any] | None, probes: list[tuple[Any, int, list[int]]]
    ) -> bool:
        """True if the file might contain ANY probed key. Files without a
        bloom entry are always read (conservative); no false negatives —
        every version of a probed key lives in a bloom-positive file."""
        if not st or "bloom" not in st:
            return True
        import base64

        buf = base64.b64decode(st["bloom"])
        m = int(st["bloom_m"])
        for _k, _b, pos in probes:
            if all((buf[(p % m) >> 3] >> ((p % m) & 7)) & 1 for p in pos):
                return True
        return False

    def export_snapshot(
        self,
        dest: str,
        partition_by: list[str] | None = None,
        version: int | None = None,
        as_of: Any | None = None,
        ranges: dict[str, list[tuple[Any, Any]]] | None = None,
    ) -> dict[str, Any]:
        """Publish the resolved live view as plain parquet under ``dest`` —
        the snapshot-export / CREATE-TABLE-AS step for consumers that read
        files, not manifests (training jobs, serving scans). ONE job:
        ``read()`` (manifest file list, LWW resolve, tombstone filter) →
        write; the row count rides the write via ``observe``. A
        ``_export.json`` marker (source path/version, rows) is written
        AFTER the data — its presence is the publication signal, so a
        crashed export is never half-visible. System columns are dropped;
        the output is engine-agnostic. ``as_of``/``ranges`` compose: export
        a past state by commit timestamp, or a slice ("last week's
        conversations") served through the zone-map file pruning."""
        # Resolve the exported version up front so the marker records the
        # version the data actually came from (with as_of, read() would
        # resolve an older version internally while the marker naively
        # claimed current_version()).
        if as_of is not None:
            version = self.version_as_of(as_of)
            as_of = None
        elif version is None:
            version = self.current_version()
        df = self.read(version=version, as_of=as_of, ranges=ranges)
        if not df.columns:
            raise ValueError("nothing to export: table has no committed version")
        df = df.drop(*[c for c in _SYSTEM_COLS + (BUCKET_COL,) if c in df.columns])
        from pyspark.sql import Observation

        obs = Observation()
        out = df.observe(obs, F.count(F.lit(1)).alias("n"))
        w = out.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(dest)
        got = obs.get.get("n")
        marker = {
            "source_path": self.path,
            "source_version": int(version),
            "rows": int(got) if got is not None else 0,
        }
        with open(os.path.join(dest, "_export.json"), "w") as f:
            json.dump(marker, f)
        return marker

    def build_blooms(self) -> int:
        """Backfill blooms for every live file lacking one (one keys-only
        scan of those files) and commit a metadata-only version — turns
        point-lookup pruning on for tables written before
        ``bloom_filters=True``. Returns the number of files indexed."""
        m = self._load_manifest()
        if m is None:
            return 0
        stats = dict(m.get("file_stats", {}))
        todo = [f for f in self._files(m, None) if "bloom" not in stats.get(f, {})]
        if not todo:
            return 0
        for f, st in self._file_blooms(todo, self._schema_of(m)).items():
            stats[f] = {**stats.get(f, {}), **st}
        manifest = {k: v for k, v in m.items() if k != "version"}
        manifest["file_stats"] = stats
        manifest["lineage"] = {"op": "build_blooms", "files_indexed": len(todo)}
        self._commit_manifest(manifest)
        return len(todo)

    @staticmethod
    def _entry(m: dict[str, Any] | None, b: str) -> dict[str, list[str]]:
        if m is None:
            return {"base": [], "delta": []}
        e = m["buckets"].get(b, {})
        return {"base": list(e.get("base", [])), "delta": list(e.get("delta", []))}

    def _files(
        self, m: dict[str, Any] | None, buckets: list[int] | None, kind: str | None = None
    ) -> list[str]:
        if m is None:
            return []
        wanted = None if buckets is None else {str(b) for b in buckets}
        out: list[str] = []
        for b, e in m["buckets"].items():
            if wanted is not None and b not in wanted:
                continue
            for k in ("base", "delta"):
                if kind in (None, k):
                    out.extend(e.get(k, []))
        return out

    def _schema_of(self, m: dict[str, Any]) -> T.StructType:
        return T.StructType.fromJson(json.loads(m["schema"]))

    def _read_files(self, files: list[str], schema: T.StructType) -> DataFrame:
        if not files:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).option("mergeSchema", "true").parquet(*files)

    def _resolve_lww(self, df: DataFrame) -> DataFrame:
        """Reduce to one row per key: max (_lsn, deleted-rank). Hash aggregate
        with map-side partial combine — the skew-safe reduction (SURVEY §7)."""
        data_cols = [c for c in df.columns if c not in self.key_cols]
        del_rank = (
            F.when(F.coalesce(F.col(DELETED_COL), F.lit(False)), F.lit(2)).otherwise(F.lit(1))
            if DELETED_COL in df.columns
            else F.lit(1)
        )
        payload = F.struct(
            F.col(LSN_COL).alias("_o1"), del_rank.alias("_o2"),
            *[F.col(c) for c in data_cols],
        )
        won = df.groupBy(*self.key_cols).agg(F.max(payload).alias("_w"))
        return won.select(
            *self.key_cols, *[F.col(f"_w.{c}").alias(c) for c in data_cols]
        )

    # ----------------------------------------------------------------- reads
    def read(
        self,
        buckets: list[int] | None = None,
        version: int | None = None,
        include_deleted: bool = False,
        key_ranges: list[tuple[Any, Any]] | None = None,
        keys: list[Any] | None = None,
        ranges: dict[str, list[tuple[Any, Any]]] | None = None,
        as_of: Any | None = None,
        key_ranges_col: str | None = None,
        apply_ttl: bool = False,
        cluster_first_key: bool = False,
    ) -> DataFrame:
        """Snapshot read of the latest (or pinned) version, optionally pruned
        to a bucket subset via the manifest (no directory listing — the
        manifest IS the file index). In MoR state, base∪delta are LWW-resolved
        on the fly. Tombstones filtered unless ``include_deleted``.

        ``key_ranges``: half-open ``[lo, hi)`` ranges over a KEY column —
        the first by default, any other via ``key_ranges_col`` (per-column
        commit zone maps cover every key column, so a composite key whose
        first column is low-cardinality still prunes on the selective one).
        Files whose manifest key zone map cannot intersect any range are
        skipped entirely (conservative: stats-less files always read),
        then rows are filtered to the ranges. LWW stays correct under
        pruning: every version of an in-range key lives in a file whose
        bounds cover that key, so no version is dropped before the resolve.

        ``keys``: point lookup on the FIRST key column — the "fetch these
        conversations" serving path. Prunes to the keys' hash buckets
        (1/n_buckets of the table), then — on ``bloom_filters`` tables —
        skips bucket files whose bloom excludes every probed key, then
        filters rows exactly. A lookup on a 10^10-row table touches one
        bucket's files, minus the bloom-negative deltas; LWW correctness is
        preserved because blooms have no false negatives.

        ``ranges``: half-open ``[lo, hi)`` ranges over NON-key columns
        (``{col: [(lo, hi), ...]}`` — the Delta/Iceberg data-skipping
        read). Files on RESOLVED buckets whose ``stats_columns`` zone map
        cannot intersect are skipped; buckets with pending delta files are
        never file-pruned, because a key's LATEST version may sit in a file
        whose stats exclude the range while a stale version matches —
        pruning it would resurrect the stale row. (Key-based pruning has no
        such hazard: a key never changes across versions.) The row filter
        applies AFTER the LWW resolve for the same reason.

        ``as_of``: time travel by commit timestamp instead of version
        number (epoch seconds / datetime / ISO string)."""
        if as_of is not None:
            if version is not None:
                raise ValueError("pass version or as_of, not both")
            version = self.version_as_of(as_of)
        m = self._load_manifest(version)
        if m is None:
            if version is not None and version > 0:
                raise ValueError(
                    f"version {version} is expired (vacuumed) or unknown; "
                    f"current version is {self.current_version()}"
                )
            return self.spark.createDataFrame([], T.StructType([]))
        schema = self._schema_of(m)
        probe_map: dict[int, list[tuple[Any, int, list[int]]]] | None = None
        if keys is not None:
            keys = list(keys)
            key_type = schema[self.key_cols[0]].dataType
            probe_map = {}
            mb = int(m.get("n_buckets", self.n_buckets))
            for pk in (self._probe_keys(keys, key_type, n_buckets=mb) if keys else []):
                probe_map.setdefault(pk[1], []).append(pk)
            kb = sorted(probe_map)
            buckets = kb if buckets is None else sorted(set(buckets) & set(kb))
        base_files = self._files(m, buckets, "base")
        delta_files = self._files(m, buckets, "delta")
        if probe_map is not None:
            stats = m.get("file_stats", {})
            fb = {
                f: int(b)
                for b, e in m["buckets"].items()
                for kind in ("base", "delta")
                for f in e.get(kind, [])
            }

            def bloom_keep(f: str) -> bool:
                return self._bloom_may_contain(stats.get(f), probe_map.get(fb[f], []))

            base_files = [f for f in base_files if bloom_keep(f)]
            delta_files = [f for f in delta_files if bloom_keep(f)]
        if key_ranges:
            kr_col = key_ranges_col or self.key_cols[0]
            if kr_col not in self.key_cols:
                # only KEY columns are MoR-safe to file-prune with pending
                # deltas (a key never changes across its versions); non-key
                # columns go through ranges= (resolved-bucket pruning only)
                raise ValueError(
                    f"key_ranges_col must be a key column {self.key_cols}, "
                    f"got {kr_col!r}"
                )
            stats = m.get("file_stats", {})
            first_key = kr_col == self.key_cols[0]

            def may_intersect(f: str) -> bool:
                st = stats.get(f) or {}
                # both sources may exist (loose commit-level kzm + tight
                # per-file footer key_min/key_max after a clustered compact):
                # intersect — each is a sound cover, so their intersection is
                # the tightest sound bound
                bounds = (st.get("kzm") or {}).get(kr_col)
                if first_key and "key_max" in st:
                    pf = (st["key_min"], st["key_max"])
                    bounds = pf if bounds is None else (
                        max(bounds[0], pf[0]), min(bounds[1], pf[1])
                    )
                if bounds is None:
                    return True  # stats-less file: always read (conservative)
                mn, mx = bounds
                return any(
                    (hi is None or mn < hi) and (lo is None or mx >= lo)
                    for lo, hi in key_ranges
                )

            base_files = [f for f in base_files if may_intersect(f)]
            delta_files = [f for f in delta_files if may_intersect(f)]
        if ranges:
            stats = m.get("file_stats", {})
            unresolved = {
                b for b, e in m["buckets"].items() if e.get("delta")
            }
            fb = {
                f: b
                for b, e in m["buckets"].items()
                for kind in ("base", "delta")
                for f in e.get(kind, [])
            }

            def range_keep(f: str) -> bool:
                if fb[f] in unresolved:
                    return True  # see docstring: MoR staleness hazard
                cs = stats.get(f, {}).get("cs", {})
                for col, rs in ranges.items():
                    if col not in cs:
                        continue  # no stats for this column — can't prune
                    flo, fhi = cs[col]
                    if not any(
                        (hi is None or flo < self._norm_bound(hi))
                        and (lo is None or fhi >= self._norm_bound(lo))
                        for lo, hi in rs
                    ):
                        return False
                return True

            base_files = [f for f in base_files if range_keep(f)]
            delta_files = [f for f in delta_files if range_keep(f)]
        df = self._read_files(base_files + delta_files, schema)
        if key_ranges and df.columns:
            df = self._apply_key_ranges(df, key_ranges,
                                        col=key_ranges_col or self.key_cols[0])
        if keys is not None and df.columns:
            k0 = F.col(self.key_cols[0])
            if not keys:
                df = df.filter(F.lit(False))
            elif len(keys) <= 512:
                df = df.filter(k0.isin(keys))
            else:  # large key lists: broadcast semi-join, not a 10k-term IN
                kt = self.spark.createDataFrame(
                    [(k,) for k in keys],
                    T.StructType([T.StructField(self.key_cols[0], key_type)]),
                )
                df = df.join(F.broadcast(kt), on=self.key_cols[0], how="left_semi")
        if delta_files:
            # LWW by _lsn resolves EVERY delta format, collapse included:
            # deferred-cancel sign deltas are versioned +1 rows (never -1),
            # so max-(lsn, deleted-rank) per key is the collapse fold too.
            # This also makes a strategy switch safe — a table carrying
            # unresolved MoR upsert deltas that starts receiving collapse
            # batches resolves all pending versions in one rule.
            if cluster_first_key:
                # pre-partition the resolve by the FIRST key column: hash-
                # partitioning on a key subset satisfies the full-key
                # clustering the LWW aggregate needs, so a consumer that
                # groups/joins by the first key afterwards (agg-view
                # recompute, transcript render) rides this one exchange
                # instead of paying a second. Shuffle bytes are unchanged —
                # each commit lands a key's versions in different files, so
                # the aggregate exchange's map-side partials almost never
                # combine anything anyway.
                df = df.repartition(F.col(self.key_cols[0]))
            df = self._resolve_lww(df)
        if not include_deleted and DELETED_COL in df.columns:
            df = df.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False))).drop(DELETED_COL)
        if apply_ttl and self.ttl and df.columns:
            # strict-retention read: hide expired-but-not-yet-compacted rows
            # (compact is where they physically drop); post-resolve filter,
            # same hazard-free position as ranges
            df = df.filter(~F.coalesce(F.expr(self.ttl), F.lit(False)))
        if ranges and df.columns:
            # row-level restriction AFTER the resolve (a pre-resolve filter
            # could drop a key's latest out-of-range version and serve a
            # stale in-range one)
            for col, rs in ranges.items():
                cond = None
                for lo, hi in rs:
                    c = F.lit(True)
                    if lo is not None:
                        c = c & (F.col(col) >= F.lit(lo))
                    if hi is not None:
                        c = c & (F.col(col) < F.lit(hi))
                    cond = c if cond is None else (cond | c)
                if cond is not None:
                    df = df.filter(cond)
        return df

    def _apply_key_ranges(
        self, df: DataFrame, key_ranges: list[tuple[Any, Any]],
        col: str | None = None,
    ) -> DataFrame:
        """Exact row-level restriction to half-open key ranges. Few ranges
        compile to an OR chain (codegen-friendly, pushes to the scan); a
        diff-sized list (reconcile repair of a very drifted table) becomes a
        broadcast range semi-join instead of a 10k-term expression tree."""
        kc = col or self.key_cols[0]
        key = F.col(kc)
        bounded = [r for r in key_ranges if r[0] is not None and r[1] is not None]
        if len(key_ranges) > 128 and len(bounded) == len(key_ranges):
            rng = self.spark.createDataFrame(
                bounded, T.StructType([
                    T.StructField("r_lo", df.schema[kc].dataType),
                    T.StructField("r_hi", df.schema[kc].dataType),
                ])
            )
            return df.join(
                F.broadcast(rng),
                on=[(key >= rng["r_lo"]) & (key < rng["r_hi"])],
                how="left_semi",
            )
        cond = None
        for lo, hi in key_ranges:
            c = F.lit(True)
            if lo is not None:
                c = c & (key >= F.lit(lo))
            if hi is not None:
                c = c & (key < F.lit(hi))
            cond = c if cond is None else (cond | c)
        return df.filter(cond) if cond is not None else df

    # ---------------------------------------------------------------- writes
    def _write_snapshot(
        self,
        df: DataFrame,
        per_file_digests: bool = True,
        sort_by_key: bool = False,
        max_records_per_file: int | None = None,
        sort_cols: list[str] | None = None,
    ) -> tuple[dict[str, list[str]], dict[str, dict[str, Any]], dict[str, Any] | None]:
        """Write ``df`` (must carry BUCKET_COL) partitioned by bucket under a
        fresh snapshot dir; return (bucket_id → absolute file list,
        file → digest).

        Digests (checksum=True) are aggregated from ``df``'s OWN plan right
        after the write: the write job leaves its shuffle files behind, so
        the digest job's heavy stages are skipped (shuffle reuse) and only
        the per-bucket sum runs — cheaper than re-reading the just-written
        parquet. Each bucket writes exactly one file per commit (see the
        repartition note below), which is what makes bucket digests ≡ file
        digests; the unexpected multi-file case falls back to a file-grouped
        read in ``_maintain_digests``."""
        snap = os.path.join(
            self.path, _DATA_DIR,
            f"snap-{self.current_version() + 1:012d}-{uuid.uuid4().hex[:8]}",
        )
        # cluster rows by bucket BEFORE the partitioned write: without this,
        # every shuffle task opens a writer per bucket (tasks × buckets small
        # files — the classic partitionBy explosion, and it gets WORSE with
        # more cores); with it, each task writes whole buckets (≤1 file per
        # bucket per commit) and the per-batch file count is O(n_buckets),
        # independent of parallelism.
        clustered = df.repartition(self.n_buckets, F.col(BUCKET_COL))
        order = list(sort_cols or ([self.key_cols[0]] if sort_by_key else []))
        if order:
            # clustered rewrite (compact/rescale maintenance): sort each
            # bucket by the given columns (default: first key) so that,
            # combined with ``max_records_per_file``, every output file
            # covers a TIGHT band in sort order — the per-file footer zone
            # maps harvested after the write then prune range reads even
            # for hash-random keys (where commit-level bounds are always
            # full-range). Sorting rides the same shuffle's task-side sort,
            # no extra exchange. Helper sort columns prefixed ``_zo`` (the
            # z-order interleave value) are dropped before the write — the
            # projection preserves intra-partition order.
            clustered = clustered.sortWithinPartitions(BUCKET_COL, *order)
            helpers = [c for c in order if c.startswith("_zo")]
            if helpers:
                clustered = clustered.drop(*helpers)
        obs = None
        cols_key = ""
        to_write = clustered
        # per-bucket digests ride the WRITE job itself via observe(): zero
        # extra jobs, zero re-reads. (A separate digest action would re-run
        # the whole batch pipeline — shuffle output is not reused across
        # actions — and re-reading the written parquet costs a full batch
        # scan; both measured 25-190% slower on the MoR ingest path.) The
        # row hash is projected ONCE into a helper column (dropped above the
        # CollectMetrics node, so it is never written), and the per-bucket
        # sums are primitive long aggregates over it.
        per_file = per_file_digests and self.n_buckets <= _OBSERVE_DIGEST_MAX_BUCKETS
        want_digests = self.checksum
        want_lsn = LSN_COL in clustered.columns
        if want_digests or want_lsn:
            from pyspark.sql import Observation

            obs = Observation()
            aggs = []
            src = clustered
            if want_digests:
                cols = [c for c in clustered.columns
                        if c not in _SYSTEM_COLS and c != BUCKET_COL]
                cols_key = _digest_cols_key(clustered.schema, cols)
                live_row = (
                    ~F.coalesce(F.col(DELETED_COL), F.lit(False))
                    if DELETED_COL in clustered.columns else F.lit(True)
                )
                src = clustered.withColumn(
                    "_rh_obs", F.when(live_row, _row_digest(*cols))
                )
                # per-file mode (resolved rewrites): one sum per bucket. Delta
                # appends (MoR hot path) only need the batch total — per-file
                # digests of delta files are never summed (deltas are removed
                # at compact), so the hot path pays ONE long sum, not
                # n_buckets.
                aggs.append(F.sum(F.col("_rh_obs")).alias("dt"))
                if per_file:
                    aggs += [
                        F.sum(F.when(F.col(BUCKET_COL) == b, F.col("_rh_obs"))).alias(f"d{b}")
                        for b in range(self.n_buckets)
                    ]
            key_stats = False
            if want_lsn:
                # commit-level lsn bounds: every file of this commit gets the
                # batch's [lsn_min, lsn_max] — a sound (conservative) file-
                # pruning index for changes_since(); two scalar aggregates
                aggs += [F.min(LSN_COL).alias("lsn_min"), F.max(LSN_COL).alias("lsn_max")]
                # key zone maps (same trick, same cost): commit-level min/max
                # of EVERY key column, JSON-storable types only. Prunes
                # key-range reads (reconcile repair) when ingest has key
                # locality — watermark-ordered int keys land each commit's
                # delta files in a narrow key band. Per-column (not just the
                # first key) so a composite key whose first column is
                # low-cardinality still prunes on the selective column.
                # Hash-bucketed random keys give full-range bounds and prune
                # nothing (inherent to any zone map); pruning is conservative
                # either way. Cost: two scalar aggregates per key column,
                # riding the write job's existing observe().
                key_zone_cols = [
                    kc for kc in self.key_cols
                    if kc in clustered.columns and isinstance(
                        clustered.schema[kc].dataType,
                        (T.IntegralType, T.FloatType, T.DoubleType, T.StringType),
                    )
                ]
                if key_zone_cols:
                    key_stats = True
                    for i, kc in enumerate(key_zone_cols):
                        aggs += [F.min(kc).alias(f"kzmin{i}"),
                                 F.max(kc).alias(f"kzmax{i}")]
            to_write = src.observe(obs, *aggs)
            if want_digests:
                to_write = to_write.drop("_rh_obs")
        writer = to_write.write
        if max_records_per_file:
            # split each bucket into bounded files (Spark's writer-side
            # counter, no extra shuffle); with sort_by_key the splits fall on
            # key-order boundaries, giving disjoint per-file key ranges
            writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
        writer.partitionBy(BUCKET_COL).mode("errorifexists").parquet(snap)
        out: dict[str, list[str]] = {}
        for entry in sorted(os.listdir(snap)):
            if not entry.startswith(f"{BUCKET_COL}="):
                continue
            b = entry.split("=", 1)[1]
            d = os.path.join(snap, entry)
            out[b] = sorted(
                os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
            )
        digests: dict[str, dict[str, Any]] = {}
        total: dict[str, Any] = {}
        if want_digests or want_lsn:
            got = obs.get
            if want_digests:
                t = got.get("dt")
                total["d"] = int(t) if t is not None else 0
                total["cols"] = cols_key
                if per_file:
                    for b, files in out.items():
                        if len(files) == 1:
                            v = got.get(f"d{b}")
                            digests[files[0]] = {"d": int(v) if v is not None else 0,
                                                 "cols": cols_key}
            if want_lsn and got.get("lsn_max") is not None:
                total["lsn_min"] = int(got["lsn_min"])
                total["lsn_max"] = int(got["lsn_max"])
                if key_stats:
                    kzm = {
                        kc: [got[f"kzmin{i}"], got[f"kzmax{i}"]]
                        for i, kc in enumerate(key_zone_cols)
                        if got.get(f"kzmax{i}") is not None
                    }
                    if kzm:
                        total["kzm"] = kzm
                        # first-key bounds also kept under the legacy names
                        # (older manifests / readers use key_min/key_max)
                        if self.key_cols[0] in kzm:
                            total["key_min"] = kzm[self.key_cols[0]][0]
                            total["key_max"] = kzm[self.key_cols[0]][1]
        return out, digests, total or None

    @staticmethod
    def _count_rows(files: list[str]) -> int:
        import pyarrow.parquet as pq

        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)

    def _file_key_stats(self, files: list[str]) -> dict[str, dict[str, Any]]:
        """Per-file key zone maps harvested from parquet FOOTERS — a
        metadata-only read (O(files) tiny IOs, no data pages). Returns
        ``{file: {"key_min": v, "key_max": v}}`` for the first key column.

        Used after key-clustered rewrites, where each file covers a narrow
        key band, to replace the conservative commit-level bounds in the
        manifest. Parquet stat truncation (long strings) is pruning-safe by
        construction: a truncated min is a prefix ≤ the true min and a
        truncated max has its last byte incremented ≥ the true max, so the
        recorded interval always CONTAINS the true one. Files whose stats
        are absent or not JSON-storable (bytes) are skipped — they keep
        their commit-level entry and are always read (conservative)."""
        import pyarrow.parquet as pq

        key = self.key_cols[0]
        out: dict[str, dict[str, Any]] = {}
        for f in files:
            md = pq.ParquetFile(f).metadata
            mins: list[Any] = []
            maxs: list[Any] = []
            ok = True
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                col = next(
                    (row_group.column(i) for i in range(row_group.num_columns)
                     if row_group.column(i).path_in_schema == key),
                    None,
                )
                st = col.statistics if col is not None else None
                if st is None or not st.has_min_max:
                    ok = False
                    break
                if not (isinstance(st.min, (int, float, str))
                        and isinstance(st.max, (int, float, str))):
                    ok = False  # bytes/temporal stats — not JSON-storable
                    break
                mins.append(st.min)
                maxs.append(st.max)
            if ok and mins:
                out[f] = {"key_min": min(mins), "key_max": max(maxs)}
        return out

    @staticmethod
    def _norm_bound(v: Any) -> Any:
        """JSON-storable, order-preserving image of a stats bound. Datetimes
        become fixed-width strings (lexicographic == chronological — the
        variable-width isoformat would mis-order fractional seconds against
        whole ones and over-prune); numbers and strings pass through."""
        import datetime as _dt

        if isinstance(v, _dt.datetime):
            return v.strftime("%Y-%m-%d %H:%M:%S.%f")
        if isinstance(v, _dt.date):
            return v.isoformat()
        return v

    def _file_col_stats(
        self, files: list[str], cols: list[str]
    ) -> dict[str, dict[str, Any]]:
        """Per-file min/max zone maps for arbitrary columns, harvested from
        parquet FOOTERS (metadata-only, O(files) tiny IOs). Returns
        ``{file: {"cs": {col: [min, max]}}}``; a column is recorded only
        when every row group has usable stats (else it is omitted and the
        file is always read for that column — conservative). String stats
        are pruning-safe under parquet truncation (see _file_key_stats)."""
        import pyarrow.parquet as pq

        out: dict[str, dict[str, Any]] = {}
        for f in files:
            md = pq.ParquetFile(f).metadata
            cs: dict[str, Any] = {}
            for col in cols:
                mins: list[Any] = []
                maxs: list[Any] = []
                ok = True
                for rg in range(md.num_row_groups):
                    row_group = md.row_group(rg)
                    c = next(
                        (row_group.column(i) for i in range(row_group.num_columns)
                         if row_group.column(i).path_in_schema == col),
                        None,
                    )
                    st = c.statistics if c is not None else None
                    if st is None or not st.has_min_max:
                        ok = False
                        break
                    lo, hi = self._norm_bound(st.min), self._norm_bound(st.max)
                    if not (isinstance(lo, (int, float, str))
                            and isinstance(hi, (int, float, str))):
                        ok = False
                        break
                    mins.append(lo)
                    maxs.append(hi)
                if ok and mins:
                    cs[col] = [min(mins), max(maxs)]
            if cs:
                out[f] = {"cs": cs}
        return out

    def _table_checksum(self, m_buckets: dict[str, Any], schema: T.StructType) -> int:
        """Order-independent digest of LIVE rows: sum of xxhash64 rowhashes
        over data columns — mode/layout/cluster-size independent. (xxhash64,
        not md5: the digest is engine-internal and sits on the ingest hot
        path; cross-engine comparisons go through content-level oracles.) Full
        recompute: O(table). Used by ``audit_checksum`` only, never per-commit."""
        files = [f for e in m_buckets.values() for k in ("base", "delta") for f in e.get(k, [])]
        df = self._read_files(files, schema)
        if any(e.get("delta") for e in m_buckets.values()):
            df = self._resolve_lww(df)  # versioned deltas, sign tables included
        if DELETED_COL in df.columns:
            df = df.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False)))
        if SIGN_COL in df.columns:
            # folds externally-imported raw sign data; identity on resolved
            # engine-written collapse tables (all +1, one row per key)
            df = collapse_live_view(df, self.key_cols)
        cols = [c for c in df.columns if c not in _SYSTEM_COLS]
        row = df.select(
            F.coalesce(F.sum(_row_digest(*cols).cast("decimal(38,0)")), F.lit(0)).alias("c")
        ).first()
        return int(row["c"])

    def audit_checksum(self) -> int:
        """Explicit full-scan recompute of the live-table checksum. Works in
        any state (MoR deltas resolved, collapse signs folded). The audit
        counterpart of the incrementally-maintained lineage value."""
        m = self._load_manifest()
        if m is None:
            return 0
        return self._table_checksum(m["buckets"], self._schema_of(m))

    def _file_digests(self, files: list[str], schema: T.StructType) -> dict[str, int]:
        """Per-file digest (sum of xxhash64 rowhashes over non-deleted rows) for
        exactly ``files`` — ONE distributed scan of those files, grouped by
        ``input_file_name``. Zero-live-row files digest to 0."""
        if not files:
            return {}
        df = self._read_files(files, schema)
        if DELETED_COL in df.columns:
            df = df.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False)))
        cols = [c for c in df.columns if c not in _SYSTEM_COLS]
        rows = (
            df.select(F.input_file_name().alias("_f"),
                      _row_digest(*cols).cast("decimal(38,0)").alias("_h"))
            .groupBy("_f").agg(F.sum("_h").alias("_d"))
            .collect()
        )
        from urllib.parse import unquote, urlparse

        got = {}
        for r in rows:
            p = r["_f"]
            if p.startswith("file:"):
                p = unquote(urlparse(p).path)
            got[p] = int(r["_d"])
        return {f: got.get(f, 0) for f in files}

    def _maintain_digests(
        self,
        buckets: dict[str, Any],
        data_schema: T.StructType,
        new_digests: dict[str, dict[str, Any]] | None = None,
        batch_total: dict[str, Any] | None = None,
    ) -> tuple[dict[str, Any], int | None, int]:
        """Carry the per-file digest cache forward across a commit.

        Returns (cache, table_checksum, batch_checksum):
        - digests for files new in this commit are computed (O(new files));
        - ``table_checksum`` = Σ cached digests when every live file is
          resolved under the current column set and no deltas/signs pend,
          else None;
        - ``batch_checksum`` = Σ digests of this commit's new files.

        Files cached under an outdated column set (pre-schema-evolution) are
        re-digested only when the table is otherwise resolved — a one-time
        catch-up at the next compact, never a per-commit tax.
        """
        data_cols = [f.name for f in data_schema.fields if f.name not in _SYSTEM_COLS]
        cols_key = _digest_cols_key(data_schema, data_cols)
        prev = self._load_manifest()
        cache_prev: dict[str, Any] = prev.get("file_digests", {}) if prev else {}
        live = self._files({"buckets": buckets}, None)
        has_delta = any(e.get("delta") for e in buckets.values())
        has_sign = SIGN_COL in {f.name for f in data_schema.fields}

        new_digests = new_digests or {}
        cache: dict[str, Any] = {}
        new_files, stale, fresh_new = [], [], set()
        base_files = self._files({"buckets": buckets}, None, "base")
        delta_files = set(live) - set(base_files)
        for f in live:
            e = new_digests.get(f) or cache_prev.get(f)
            if f in new_digests:  # digested inside the write job (observe)
                new_files.append(f)
                if e.get("cols") == cols_key:
                    cache[f] = e
                    fresh_new.add(f)
                # else: written under a narrower column set than the merged
                # schema — recompute under the manifest schema below
            elif e is None:
                if f in delta_files:
                    continue  # delta digests are never summed; skip entirely
                new_files.append(f)
            elif e.get("cols") != cols_key:
                stale.append(f)
                cache[f] = e  # carried forward; excluded from any sum
            else:
                cache[f] = e
        to_compute = [f for f in new_files if f not in fresh_new]
        if stale and not has_delta:  # resolving commit: catch stale files up
            to_compute += stale
        if has_sign and has_delta:
            # collapse hot path: pending version deltas make the live set
            # LWW-defined, so per-file digests can't sum yet — don't pay a
            # read-back for digests that can't be used. Post-compact the
            # base holds exactly the live rows (overwrite rejects raw sign
            # imports), and the normal incremental machinery applies.
            to_compute = []
        computed = self._file_digests(to_compute, data_schema)
        for f, d in computed.items():
            cache[f] = {"d": d, "cols": cols_key}

        if batch_total is not None and batch_total.get("cols") == cols_key:
            batch_checksum = batch_total["d"]
        else:
            # the observe-path total was computed under a different column
            # set (e.g. a producer still emitting the pre-evolution schema).
            # New DELTA files were excluded from ``new_files`` above, and new
            # base files of sign tables skip ``to_compute`` — summing only
            # cached entries would silently record 0 ("empty commit") in
            # lineage. Read back exactly this commit's undigested files under
            # the manifest schema instead: bounded (O(batch)), rare (only on
            # schema-mismatch commits), and keeps the per-batch contract.
            prev_live = set(self._files(prev, None)) if prev else set()
            new_delta = [f for f in delta_files if f not in prev_live]
            pending = sorted(set(new_files + new_delta) - set(cache))
            extra = self._file_digests(pending, data_schema)
            batch_checksum = sum(
                cache[f]["d"] for f in new_files if f in cache
            ) + sum(extra.values())
        fresh = all(
            f in cache and cache[f].get("cols") == cols_key for f in base_files
        )
        # sign tables included: their base files hold exactly the live rows
        # (compact folds; overwrite rejects raw sign data), so the per-file
        # digest sum is exact once no deltas pend
        table_checksum = (
            sum(cache[f]["d"] for f in base_files)
            if (not has_delta and fresh)
            else None
        )
        return cache, table_checksum, batch_checksum

    def _commit(
        self,
        buckets: dict[str, Any],
        data_schema: T.StructType,
        batch_id: str,
        lineage: dict[str, Any],
        new_digests: dict[str, dict[str, Any]] | None = None,
        batch_total: dict[str, Any] | None = None,
        extra_file_stats: dict[str, dict[str, Any]] | None = None,
        base_version: int | None = None,
        rebase: Any = None,
    ) -> int:
        """``base_version``: the manifest version the caller BUILT ``buckets``
        from. If another writer committed in between, the stale bucket map
        would silently drop their files — so a mismatch either raises
        :class:`ConcurrentWriteError` (caller retries its whole operation)
        or, when ``rebase`` is given, rebuilds ``buckets`` against the
        current manifest (``rebase(current_buckets) -> buckets``) — the
        optimistic path for maintenance ops whose edits commute with
        concurrent ingest (compact: replace folded files, keep new deltas)."""
        prev = self._load_manifest()
        if base_version is not None:
            cur_v = int(prev["version"]) if prev else 0
            if cur_v != base_version:
                if rebase is None:
                    raise ConcurrentWriteError(
                        f"manifest advanced v{base_version} -> v{cur_v} while "
                        f"'{lineage.get('op', batch_id)}' was running; retry the "
                        f"operation against the current state"
                    )
                # The optimistic rebase commutes ONLY with additive merge
                # appends (the racer's delta files LWW-supersede our new
                # base on read). A racing compact/rescale would leave two
                # bases for the same rows (duplicates, and read() skips the
                # LWW resolve with no pending deltas); a racing purge would
                # resurrect erased rows from our pre-purge snapshot. Walk
                # the intervening commits and refuse to rebase over any
                # non-merge op — the caller retries from fresh state.
                for iv in range(base_version + 1, cur_v + 1):
                    ivm = self._load_manifest(iv)
                    iop = str((ivm or {}).get("lineage", {}).get("op", ""))
                    if not iop.startswith("merge:"):
                        raise ConcurrentWriteError(
                            f"manifest advanced v{base_version} -> v{cur_v} with a "
                            f"non-append commit '{iop or 'unknown'}' at v{iv}; "
                            f"'{lineage.get('op', batch_id)}' cannot rebase over it — "
                            f"retry against the current state"
                        )
                buckets = rebase(dict(prev["buckets"]) if prev else {})
                lineage = {**lineage, "rebased_from": base_version,
                           "rebased_onto": cur_v}
        recent = [b for b in (prev or {}).get("committed_batch_ids", []) if b != batch_id]
        recent.append(batch_id)
        # per-file lsn bounds (conservative: a commit's files inherit the
        # commit's [lsn_min, lsn_max]) — the changes_since() pruning index.
        # Files with no stats entry (legacy/lsn-less writes) are always read.
        prev_stats = (prev or {}).get("file_stats", {})
        live_files = self._files({"buckets": buckets}, None)
        file_stats = {f: prev_stats[f] for f in live_files if f in prev_stats}
        if batch_total and "lsn_max" in batch_total:
            bounds = {"lsn_min": batch_total["lsn_min"], "lsn_max": batch_total["lsn_max"]}
            if "key_max" in batch_total:  # key zone map rides the same entry
                bounds["key_min"] = batch_total["key_min"]
                bounds["key_max"] = batch_total["key_max"]
            if "kzm" in batch_total:  # per-key-column zone maps, same entry
                bounds["kzm"] = batch_total["kzm"]
            for f in live_files:
                file_stats.setdefault(f, bounds)
        # per-file overrides (key-clustered compact footers, rollback
        # reinstating a prior version's stats) are TIGHTER than the
        # commit-level bounds — overlay them last, only for live files
        live_set = set(live_files)
        for f, st in (extra_file_stats or {}).items():
            if f in live_set:
                file_stats[f] = {**file_stats.get(f, {}), **st}
        prev_files = set(self._files(prev, None))
        if self.bloom_filters:
            # key blooms for files NEW in this commit (rollback re-references
            # old files whose blooms arrive via extra_file_stats — skipped):
            # one keys-only read-back of the just-written batch, O(batch)
            todo = [
                f for f in live_files
                if f not in prev_files and "bloom" not in file_stats.get(f, {})
            ]
            for f, st in self._file_blooms(todo, data_schema).items():
                file_stats[f] = {**file_stats.get(f, {}), **st}
        if self.stats_columns:
            # non-key column zone maps for NEW files: parquet footer reads
            # only (metadata, no data pages) — O(new files) per commit
            schema_cols = {f.name for f in data_schema.fields}
            want = [c for c in self.stats_columns if c in schema_cols]
            todo = [
                f for f in live_files
                if f not in prev_files and "cs" not in file_stats.get(f, {})
            ]
            if want:
                for f, st in self._file_col_stats(todo, want).items():
                    file_stats[f] = {**file_stats.get(f, {}), "cs": {
                        **file_stats.get(f, {}).get("cs", {}), **st["cs"],
                    }}
        # incremental-sync watermarks carry forward in EVERY manifest, so
        # resuming a long-lived table reads one JSON file, never a lineage
        # scan over O(commits) versions
        watermarks = dict((prev or {}).get("watermarks", {}))
        if "reconciliation" in lineage and "watermark" in lineage:
            watermarks[str(lineage["reconciliation"])] = lineage["watermark"]
        manifest = {
            "buckets": buckets,
            "schema": json.dumps(data_schema.jsonValue()),
            "n_buckets": self.n_buckets,
            "stats_columns": self.stats_columns,
            "constraints": self.constraints,
            "on_violation": self.on_violation,
            "ttl": self.ttl,
            "committed_batch_ids": recent[-self.idempotence_window:],
            "file_stats": file_stats,
            "watermarks": watermarks,
            "lineage": lineage,
        }
        if self.checksum:
            cache, table_checksum, batch_checksum = self._maintain_digests(
                buckets, data_schema, new_digests, batch_total
            )
            manifest["file_digests"] = cache
            lineage["table_checksum"] = table_checksum
            lineage["batch_checksum"] = batch_checksum
        return self._commit_manifest(manifest)

    def overwrite(self, df: DataFrame, batch_id: str = "overwrite", lsn: int = 0) -> MergeResult:
        """Full-table replace (initial load). Adds system columns if absent.

        CHECK constraints are a merge-path gate (change batches are where
        bad data arrives one version at a time); an initial full load is
        validated by the caller — run ``df.filter(...)`` with the same
        expressions, or land it through ``merge_into`` to enforce.

        Raw sign-carrying data is rejected: unannihilated ``+1/-1`` cancel
        pairs are not LWW-resolvable and would also break the incremental
        live-table checksum (a pair double-counts instead of cancelling in
        the per-file digest sum). Fold external CollapsingMergeTree exports
        with ``collapse_live_view`` first, then load the live rows — after
        which every engine-written sign-table base file holds exactly live
        rows and the checksum machinery treats collapse tables uniformly."""
        if SIGN_COL in df.columns:
            raise ValueError(
                f"overwrite() does not accept raw sign data ({SIGN_COL} column): "
                "fold it with collapse_live_view(...) and load the live rows"
            )
        if LSN_COL not in df.columns:
            df = df.withColumn(LSN_COL, F.lit(lsn).cast("long"))
        if DELETED_COL not in df.columns:
            df = df.withColumn(DELETED_COL, F.lit(False))
        df = df.withColumn(BUCKET_COL, self._bucket_col())
        data_schema = df.drop(BUCKET_COL).schema
        new, dig, tot = self._write_snapshot(df)
        buckets = {b: {"base": fs, "delta": []} for b, fs in new.items()}
        n = self._count_rows([f for fs in new.values() for f in fs])
        lineage = {"batch_id": batch_id, "op": "overwrite", "rows_written": n}
        v = self._commit(buckets, data_schema, batch_id, lineage, dig, tot)
        return MergeResult(v, batch_id, True, [int(b) for b in new], n)

    # ----------------------------------------------------------------- merge
    def _enforce_constraints(
        self, batch: DataFrame, batch_id: str
    ) -> tuple[DataFrame, int]:
        """Apply the table's CHECK constraints to a change batch (non-delete
        rows only — a delete carries no payload to validate). Violation =
        expression evaluates FALSE (NULL passes, SQL CHECK semantics).

        ``error``: raise :class:`ConstraintViolationError` with a bounded
        row sample before anything is written — the batch retries after the
        producer fixes it (exactly-once is unaffected: nothing committed).
        ``quarantine``: violating rows are written to
        ``{path}/_quarantine/<batch_id>`` with a ``_violations`` reason
        array + ``_batch_id`` (the row-level dead-letter shape; overwrite
        mode keeps batch replays idempotent), the rest merge normally. A
        quarantined VERSION never arrived as far as LWW is concerned.
        One extra O(batch) job either way; zero cost with no constraints."""
        flags = {
            name: (F.col("_op") != F.lit("delete"))
            & (F.expr(sql) == F.lit(False))
            for name, sql in self.constraints.items()
        }
        is_bad = F.lit(False)
        for flag in flags.values():
            is_bad = is_bad | F.coalesce(flag, F.lit(False))
        bad = batch.filter(is_bad).drop(BUCKET_COL)
        if self.on_violation == "error":
            sample = bad.limit(3).collect()
            if sample:
                shown = [
                    {k: v for k, v in r.asDict().items() if not k.startswith("_")}
                    for r in sample
                ]
                raise ConstraintViolationError(
                    f"batch {batch_id!r} violates CHECK constraints "
                    f"{sorted(self.constraints)}; first rows: {shown}. "
                    f"Fix the producer and retry, or declare "
                    f"on_violation='quarantine' to divert bad rows."
                )
            return batch, 0
        from pyspark.sql import Observation

        reasons = F.array_compact(F.array(*[
            F.when(F.coalesce(flag, F.lit(False)), F.lit(name))
            for name, flag in flags.items()
        ]))
        obs = Observation()
        qdir = os.path.join(
            self.path, "_quarantine",
            "".join(c if c.isalnum() or c in "-_." else "_" for c in batch_id),
        )
        (
            bad.withColumn("_violations", reasons)
            .withColumn("_batch_id", F.lit(batch_id))
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite").parquet(qdir)
        )
        n = int(obs.get.get("n") or 0)
        if n == 0:
            shutil.rmtree(qdir, ignore_errors=True)
        return batch.filter(~is_bad), n

    def quarantined(self, batch_id: str | None = None) -> DataFrame:
        """Rows diverted by ``on_violation="quarantine"`` (all batches, or
        one), each carrying ``_violations`` (failed constraint names) and
        ``_batch_id`` — the inspection/replay surface of the row-level DLQ."""
        root = os.path.join(self.path, "_quarantine")
        paths = (
            [os.path.join(root, batch_id)] if batch_id is not None
            else [os.path.join(root, d) for d in sorted(os.listdir(root))]
            if os.path.isdir(root) else []
        )
        paths = [p for p in paths if os.path.isdir(p)]
        if not paths:
            return self.spark.createDataFrame([], T.StructType([]))
        return self.spark.read.parquet(*paths)

    def merge_into(
        self,
        batch_df: DataFrame,
        batch_id: str,
        op_col: str = "op",
        lsn_col: str = "lsn",
        strategy: str = "upsert",
        allow_delete: bool = True,
        lineage_extra: dict[str, Any] | None = None,
        unique_keys: bool = False,
    ) -> MergeResult:
        """Apply one change batch. ``batch_df`` columns = data columns +
        ``op_col`` ∈ {insert, update, upsert, delete} + monotone ``lsn_col``.

        upsert/CoW : union dirty-bucket target rows with the deduped batch,
                     LWW-reduce, rewrite only dirty buckets.
        upsert/MoR : append the deduped batch as delta files — write cost is
                     O(batch) regardless of table size; reads resolve.

        ``unique_keys``: the caller guarantees the batch already holds at
        most ONE row per key (e.g. it is the output of a per-key aggregate).
        Skips the within-batch LWW dedupe — one full shuffle of the batch —
        on the upsert path. Purely an optimization hint; a violated
        guarantee degrades to both versions landing as deltas and the READ
        side's LWW resolve picking one, never a corrupt table.
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
        if not allow_delete:
            # deletes ignored entirely (reference MergeStrategyConfig
            # allow_delete=False, core/config.py:158-160)
            batch = batch.filter(F.col("_op") != F.lit("delete"))
        rows_quarantined = 0
        if self.constraints:
            batch, rows_quarantined = self._enforce_constraints(batch, batch_id)
            if rows_quarantined:
                lineage_extra = {**(lineage_extra or {}),
                                 "rows_quarantined": rows_quarantined}

        # ONE pre-scan of the batch serves both the op-count lineage stats and
        # the dirty-bucket list (delete_insert/CoW need it; MoR upsert and
        # collapse learn their buckets from the write itself) — two separate
        # jobs here would scan the batch twice per commit
        need_dirty = strategy == "delete_insert" or (
            strategy == "upsert" and self.merge_mode == "cow"
        )
        stats: dict[str, Any] = {}
        dirty: list[int] | None = None
        obs_ops = None
        if need_dirty:
            pre = batch.groupBy("_op", BUCKET_COL).agg(F.count(F.lit(1)).alias("n")).collect()
            dirty = sorted({r[BUCKET_COL] for r in pre})
            if self.track_stats:
                op_counts: dict[str, int] = {}
                for r in pre:
                    op_counts[r["_op"]] = op_counts.get(r["_op"], 0) + r["n"]
                stats["op_counts"] = op_counts
        elif self.track_stats:
            # hot paths (MoR upsert, collapse): op counts ride the WRITE job
            # via observe() — a separate groupBy action would scan the batch
            # twice per commit
            from pyspark.sql import Observation

            obs_ops = Observation()
            batch = batch.observe(
                obs_ops,
                *[
                    F.sum((F.col("_op") == F.lit(op)).cast("long")).alias(op)
                    for op in ("insert", "update", "upsert", "delete")
                ],
            )
        if strategy == "collapse":
            return self._merge_collapse(
                batch, data_cols, batch_id, stats, lineage_extra, obs_ops
            )
        if strategy == "delete_insert":
            return self._merge_delete_insert(batch, batch_id, stats, lineage_extra, dirty)

        # -------- upsert: dedupe batch to one row per key with tombstones
        tombstoned = batch.withColumn(
            DELETED_COL, F.col("_op") == F.lit("delete")
        ).drop("_op")
        deduped = (
            tombstoned if unique_keys else self._resolve_lww(tombstoned)
        ).withColumn(BUCKET_COL, self._bucket_col())

        m = self._load_manifest()
        if self.merge_mode == "mor":
            assert dirty is None  # MoR: no pre-read, buckets come from the write
            # no pre-read, no dirty-bucket job: the write itself reveals which
            # buckets got deltas (dir listing), so MoR ingest is exactly ONE
            # scan + one shuffle + one write per batch.
            data_schema = deduped.drop(BUCKET_COL).schema
            if m is not None:  # additive + type-widening schema evolution
                data_schema = _merge_schemas(self._schema_of(m), data_schema)
                deduped = _conform_types(deduped, data_schema)
            new, dig, tot = self._write_snapshot(deduped, per_file_digests=False)
            buckets = dict(m["buckets"]) if m else {}
            for b, fs in new.items():
                e = self._entry(m, b)
                e["delta"] = e["delta"] + fs
                buckets[b] = e
        else:
            # dirty buckets of the deduped batch == those of the raw batch
            # (LWW only drops rows within a key, never a bucket)
            target = self.read(buckets=dirty, include_deleted=True)
            if not target.columns:
                target = deduped.drop(BUCKET_COL).limit(0)
            # additive + type-widening evolution, same rules as MoR: both
            # sides conform to the merged schema so the union never leans on
            # implicit coercion (and conflicts fail with a clear error)
            merged = _merge_schemas(target.schema, deduped.drop(BUCKET_COL).schema)
            unioned = _conform_types(target, merged).unionByName(
                _conform_types(deduped.drop(BUCKET_COL), merged),
                allowMissingColumns=True,
            )
            resolved = self._resolve_lww(unioned).withColumn(BUCKET_COL, self._bucket_col())
            new, dig, tot = self._write_snapshot(resolved)
            buckets = dict(m["buckets"]) if m else {}
            for b in dirty:  # dirty bucket resolving to zero rows = CoW delete
                buckets.pop(str(b), None)
            for b, fs in new.items():
                buckets[b] = {"base": fs, "delta": []}
            data_schema = resolved.drop(BUCKET_COL).schema

        rows_written = self._count_rows([f for fs in new.values() for f in fs])
        self._fill_op_counts(stats, obs_ops, rows_written)
        lineage = {
            "batch_id": batch_id,
            "op": f"merge:{strategy}:{self.merge_mode}",
            "touched_buckets": sorted(int(b) for b in new),
            "rows_written": rows_written,
            **stats,
            **(lineage_extra or {}),
        }
        v = self._commit(buckets, data_schema, batch_id, lineage, dig, tot,
                         base_version=(int(m["version"]) if m else 0))
        return MergeResult(v, batch_id, True, sorted(int(b) for b in new), rows_written, stats)

    @staticmethod
    def _fill_op_counts(
        stats: dict[str, Any], obs_ops, rows_written: int
    ) -> None:
        """Read the per-op observe counters after the write job ran. On an
        empty batch, PropagateEmptyRelation optimizes the metrics node away
        and ``Observation.get`` would fail — but a zero-row write implies a
        zero-row batch, so the counts are known without reading it."""
        if obs_ops is None:
            return
        if rows_written == 0:
            stats["op_counts"] = {}
        else:
            stats["op_counts"] = {
                k: int(v) for k, v in obs_ops.get.items()
                if v is not None and int(v) > 0
            }

    def _merge_delete_insert(
        self,
        batch: DataFrame,
        batch_id: str,
        stats: dict[str, Any],
        lineage_extra: dict[str, Any] | None,
        dirty: list[int],
    ) -> MergeResult:
        """delete_insert (CoW only): remove every target row whose key matches
        a batch key, insert batch rows. Physical-removal semantics (no
        tombstones) per the reference's delete-then-insert contract —
        assumes in-order delivery."""
        target = self.read(buckets=dirty, include_deleted=True)
        inserts = (
            batch.filter(F.col("_op") != F.lit("delete"))
            .drop("_op", BUCKET_COL)
            .withColumn(DELETED_COL, F.lit(False))
        )
        if not target.columns:
            target = inserts.limit(0)
        keys = batch.select(*self.key_cols).distinct()
        survivors = target.join(F.broadcast(keys), on=self.key_cols, how="left_anti")
        resolved = (
            survivors.unionByName(inserts, allowMissingColumns=True)
            .withColumn(DELETED_COL, F.coalesce(F.col(DELETED_COL), F.lit(False)))
            .withColumn(BUCKET_COL, self._bucket_col())
        )
        new, dig, tot = self._write_snapshot(resolved)
        m = self._load_manifest()
        buckets = dict(m["buckets"]) if m else {}
        for b in dirty:
            buckets.pop(str(b), None)
        for b, fs in new.items():
            buckets[b] = {"base": fs, "delta": []}
        data_schema = resolved.drop(BUCKET_COL).schema
        rows_written = self._count_rows([f for fs in new.values() for f in fs])
        lineage = {
            "batch_id": batch_id, "op": "merge:delete_insert",
            "touched_buckets": sorted(int(b) for b in new),
            "rows_written": rows_written, **stats, **(lineage_extra or {}),
        }
        v = self._commit(buckets, data_schema, batch_id, lineage, dig, tot,
                         base_version=(int(m["version"]) if m else 0))
        return MergeResult(v, batch_id, True, sorted(int(b) for b in new), rows_written, stats)

    def _merge_collapse(
        self,
        batch: DataFrame,
        data_cols: list[str],
        batch_id: str,
        stats: dict[str, Any],
        lineage_extra: dict[str, Any] | None,
        obs_ops,
    ) -> MergeResult:
        """Collapse: APPEND-ONLY with DEFERRED cancels — the batch's latest
        version per key lands as ``_sign=+1`` DELTA rows (deletes as
        tombstone-marked version rows) and the target table is NEVER read:
        per-batch cost is O(batch) in both writes and reads, independent of
        table size. This is ClickHouse VersionedCollapsingMergeTree (the
        production form of the CollapsingMergeTree sink the reference
        targets, ``/root/reference/adapters/clickhouse.py:93-105``): it
        exists precisely because synthesizing a cancel row at insert time
        needs the key's current live row — a point lookup per key that
        becomes an O(live-rows) probe per micro-batch on a hash-bucketed
        10^10-row table. Instead, superseded versions annihilate

        - at READ time: the same LWW-by-``_lsn`` resolver as MoR upsert
          (``read()``), and
        - physically at ``compact()``: the fold a CollapsingMergeTree
          background merge performs — superseded versions vanish, survivors
          rewrite as ``_sign=+1`` base rows. Delete markers persist as
          tombstones until ``expire_tombstones`` (unlike ClickHouse's
          physical removal — see ``compact``'s comment: dropping them lets
          late stale updates resurrect deleted keys).

        Engine-written collapse tables therefore never contain ``-1`` rows;
        ``collapse_live_view`` remains the fold for externally-supplied raw
        sign data and is the identity on resolved engine tables."""
        op_rank = F.when(F.col("_op") == "delete", 2).otherwise(1)
        latest = (
            batch.groupBy(*self.key_cols)
            .agg(F.max(F.struct(F.col(LSN_COL), op_rank.alias("_r"), F.col("_op"),
                                *[F.col(c) for c in data_cols if c not in self.key_cols])).alias("w"))
            .select(*self.key_cols,
                    *[F.col(f"w.{c}").alias(c) for c in data_cols if c not in self.key_cols],
                    F.col(f"w.{LSN_COL}").alias(LSN_COL), F.col("w._op").alias("_op"))
        )
        versions = (
            latest.withColumn(DELETED_COL, F.col("_op") == F.lit("delete"))
            .drop("_op")
            .withColumn(SIGN_COL, F.lit(1))
            .withColumn(BUCKET_COL, self._bucket_col())
        )
        m = self._load_manifest()
        data_schema = versions.drop(BUCKET_COL).schema
        if m is not None:  # additive + type-widening schema evolution
            data_schema = _merge_schemas(self._schema_of(m), data_schema)
            versions = _conform_types(versions, data_schema)
        # sign tables never have a summable live digest: batch total only
        new, dig, tot = self._write_snapshot(versions, per_file_digests=False)
        buckets = dict(m["buckets"]) if m else {}
        for b, fs in new.items():
            e = self._entry(m, b)
            e["delta"] = e["delta"] + fs
            buckets[b] = e
        rows_written = self._count_rows([f for fs in new.values() for f in fs])
        self._fill_op_counts(stats, obs_ops, rows_written)
        lineage = {
            "batch_id": batch_id, "op": "merge:collapse",
            "touched_buckets": sorted(int(b) for b in new),
            "rows_written": rows_written, **stats, **(lineage_extra or {}),
        }
        # through _commit like every other strategy: persists n_buckets (a
        # rescale()d table must not fall back to the constructor default) and
        # maintains the file-digest cache / batch checksum
        v = self._commit(buckets, data_schema, batch_id, lineage, dig, tot,
                         base_version=(int(m["version"]) if m else 0))
        return MergeResult(v, batch_id, True, sorted(int(b) for b in new), rows_written, stats)

    def changes_since(self, lsn: int, max_lsn: int | None = None) -> DataFrame:
        """Incremental change feed (Delta-CDF / Iceberg-changelog analogue,
        and the lake-native version of the reference's updated_at incremental
        strategy, ``otel.py:83-84``): every stored row version with
        ``_lsn > lsn``, tagged ``op ∈ {upsert, delete}``.

        Files are PRUNED via the manifest's per-commit lsn bounds — a
        downstream consumer polling a 10^10-row table reads O(new commits),
        not O(table). Semantics: MoR tables may emit superseded versions
        (consumers LWW by key+_lsn); history older than the last
        compaction/rewrite is not replayable (files inherit the REWRITE
        commit's bounds), exactly like table-format changelogs after a
        rewrite.

        ``max_lsn`` bounds the window from above (Kafka endOffsets-style
        bounded consumption: replay "up to here", not "to current") — files
        entirely past the bound are pruned the same way. The bound is
        faithful at COMMIT granularity: a merge batch stores only its
        within-batch LWW winners, so a bound cutting through the middle of
        one commit's lsn range cannot recover versions that commit already
        superseded (same contract as replaying a table-format changelog)."""
        m = self._load_manifest()
        if m is None:
            return self.spark.createDataFrame([], T.StructType([]))
        stats = m.get("file_stats", {})
        files = [
            f for f in self._files(m, None)
            if (f not in stats or stats[f].get("lsn_max", lsn + 1) > lsn)
            and (max_lsn is None or f not in stats
                 or stats[f].get("lsn_min", max_lsn) <= max_lsn)
        ]
        df = self._read_files(files, self._schema_of(m)).filter(F.col(LSN_COL) > lsn)
        if max_lsn is not None and df.columns:
            df = df.filter(F.col(LSN_COL) <= max_lsn)
        if DELETED_COL in df.columns:
            op = F.when(F.coalesce(F.col(DELETED_COL), F.lit(False)), F.lit("delete")) \
                .otherwise(F.lit("upsert"))
            return df.withColumn("op", op).drop(DELETED_COL)
        return df.withColumn("op", F.lit("upsert"))

    # ------------------------------------------------------------ compaction
    @staticmethod
    def _bounds_from_stats(
        m: dict[str, Any], files: list[str], cols: list[str], df: DataFrame
    ) -> dict[str, tuple[float, float]]:
        """Numeric (min, max) per column derived from the manifest's
        per-file zone maps — min-of-mins/max-of-maxes over ``files``, with
        stored datetime images parsed back to epoch seconds. A column is
        returned only when EVERY file carries its stats (else the caller
        falls back to a bounds aggregate); string columns never qualify
        (their stats don't scale numerically)."""
        import datetime as _dt

        stats = m.get("file_stats", {})
        out: dict[str, tuple[float, float]] = {}
        for c in cols:
            t = df.schema[c].dataType if c in df.columns else None
            if isinstance(t, T.StringType) or t is None:
                continue

            def num(v: Any) -> float | None:
                if isinstance(v, (int, float)):
                    return float(v)
                if isinstance(v, str):
                    try:
                        d = _dt.datetime.fromisoformat(v)
                    except ValueError:
                        return None
                    return d.replace(tzinfo=_dt.timezone.utc).timestamp()
                return None

            los: list[float] = []
            his: list[float] = []
            ok = bool(files)
            for f in files:
                cs = stats.get(f, {}).get("cs", {})
                if c not in cs:
                    ok = False
                    break
                lo, hi = num(cs[c][0]), num(cs[c][1])
                if lo is None or hi is None:
                    ok = False
                    break
                los.append(lo)
                his.append(hi)
            if ok:
                out[c] = (min(los), max(his))
        return out

    @staticmethod
    def _zorder_double(df: DataFrame, c: str) -> F.Column:
        """Numeric image of a z-orderable column: timestamps (NTZ included)
        and dates go through an epoch-seconds cast — TIMESTAMP_NTZ/DATE
        cannot cast to double directly."""
        t = df.schema[c].dataType
        col = F.col(c)
        if isinstance(t, (T.TimestampNTZType, T.DateType)):
            col = col.cast("timestamp")
        return col.cast("double")

    @classmethod
    def _zorder_value(
        cls, df: DataFrame, cols: list[str],
        bounds: dict[str, tuple[float, float]],
    ) -> F.Column:
        """16-bit-per-column Morton (Z-order) interleave: each column is
        min-max scaled to [0, 65535] (one tiny bounds aggregate, computed by
        the caller) and its bits are interleaved, so sorting by the result
        clusters rows that are close in EVERY dimension. Pure JVM bit
        expressions (16 × n_cols OR terms, whole-stage codegen); nulls sort
        first (scaled 0). Timestamps scale via their epoch seconds."""
        scaled = []
        for c in cols:
            lo, hi = bounds[c]
            x = cls._zorder_double(df, c)
            span = hi - lo
            s = ((x - F.lit(lo)) / F.lit(span) * 65535.0) if span > 0 else F.lit(0.0)
            scaled.append(
                F.coalesce(
                    F.least(F.greatest(s, F.lit(0.0)), F.lit(65535.0)), F.lit(0.0)
                ).cast("long")
            )
        n = len(scaled)
        z = F.lit(0).cast("long")
        for i in range(16):
            for j, x in enumerate(scaled):
                bit = F.shiftright(x, i).bitwiseAND(F.lit(1))
                z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
        return z

    def compact(
        self,
        buckets: list[int] | None = None,
        batch_id: str | None = None,
        min_delta_files: int = 1,
        cluster_by_key: bool = False,
        max_file_rows: int | None = None,
        zorder_by: list[str] | None = None,
    ) -> MergeResult:
        """Fold delta files into base for the given (default: all
        delta-bearing) buckets: read base∪delta, LWW-resolve (for collapse
        tables this is the version fold — superseded versions vanish,
        survivors rewrite as +1 rows), rewrite as base.
        The MoR maintenance op — run on a schedule or when delta/base ratio
        crosses a threshold; at cluster scale this is a background job that
        never blocks ingest (it commits a new snapshot like any writer).
        Scoping is by BUCKET only: key zone maps deliberately do not apply
        here — a key-subset rewrite of a bucket would duplicate its base
        rows across files, so compact always folds whole buckets.

        ``cluster_by_key`` + ``max_file_rows``: sort each bucket by the
        first key column during the rewrite and split it into bounded files
        whose PER-FILE key bounds (harvested from parquet footers — a
        metadata-only read) replace the commit-level zone map in the
        manifest. This is the Z-order/sort-compaction analogue for a
        single-key table: key-range reads (reconcile repair,
        ``read(key_ranges=...)``) then prune to ~(range_width/key_span) of
        each bucket's files even when keys are hash-random across commits —
        the one layout commit-level bounds can never prune. Cost: the sort
        rides the rewrite's existing shuffle (task-side sort, no extra
        exchange); multi-file buckets forgo the free observe() digests, so
        with checksum on the new base files are re-read once for their
        per-file digests (bounded, compact-only — never on the ingest
        path).

        ``zorder_by``: multi-dimensional clustering (Delta OPTIMIZE ZORDER
        BY): rows sort within each bucket by a 16-bit-per-column Morton
        interleave of the given numeric/timestamp columns, so per-file zone
        maps become tight in EVERY listed dimension and ``read(ranges=...)``
        prunes on any of them — the layout a single-column sort cannot give
        (sorting by ts makes conv-range reads scan everything, and vice
        versa). Costs one tiny bounds aggregate over the rewritten buckets;
        the sort rides the rewrite shuffle. Mutually exclusive with
        ``cluster_by_key``; per-file stats for the z-ordered columns (plus
        any configured ``stats_columns``) are harvested from the footers."""
        if zorder_by and cluster_by_key:
            raise ValueError("zorder_by and cluster_by_key are mutually exclusive")
        m = self._load_manifest()
        if m is None:
            return MergeResult(0, batch_id or "compact", False)
        dirty = [
            int(b) for b, e in m["buckets"].items()
            if len(e.get("delta", [])) >= min_delta_files
            and (buckets is None or int(b) in set(buckets))
        ]
        if not dirty:
            return MergeResult(m["version"], batch_id or "compact", False)
        schema = self._schema_of(m)
        df = self._read_files(self._files(m, dirty), schema)
        # ONE resolution rule for every strategy: LWW picks each key's latest
        # version (collapse deltas are versioned +1 rows — the
        # CollapsingMergeTree background-merge fold); survivors of a sign
        # table rewrite as +1 base. Delete markers are RETAINED as tombstones
        # in all modes (hidden by read, physically removed by
        # expire_tombstones) — a deliberate strengthening over ClickHouse's
        # physical removal, which cannot survive out-of-order redelivery:
        # drop the marker and a late-arriving STALE update resurrects the
        # deleted key (hypothesis-pinned in
        # test_any_batching_and_order_converges with a mid-run compact).
        resolved = self._resolve_lww(df)
        if SIGN_COL in df.columns:
            resolved = resolved.withColumn(SIGN_COL, F.lit(1))
        ttl_obs = None
        if self.ttl:
            # row TTL enforcement point (see __init__): the expired-count
            # observe and the drop filter both ride the rewrite job
            from pyspark.sql import Observation

            expired = F.coalesce(F.expr(self.ttl), F.lit(False))
            ttl_obs = Observation()
            resolved = resolved.observe(
                ttl_obs, F.sum(expired.cast("long")).alias("n_expired")
            ).filter(~expired)
        resolved = resolved.withColumn(BUCKET_COL, self._bucket_col())
        sort_cols = None
        if zorder_by:
            missing = [c for c in zorder_by if c not in resolved.columns]
            if missing:
                raise ValueError(f"zorder_by columns not in table: {missing}")
            # bounds for the scaling lattice: prefer the manifest zone maps
            # (min-of-mins over the dirty files — free) and only pay a
            # bounds aggregate (an extra read of the dirty buckets) when a
            # file lacks stats for some column. Approximate bounds would be
            # fine for clustering; these are exact when stats cover.
            bounds = self._bounds_from_stats(
                m, self._files(m, dirty), zorder_by, resolved
            )
            need = [c for c in zorder_by if c not in bounds]
            if need:
                b_aggs = []
                for c in need:
                    x = self._zorder_double(resolved, c)
                    b_aggs += [F.min(x).alias(f"lo_{c}"), F.max(x).alias(f"hi_{c}")]
                row = resolved.agg(*b_aggs).first()
                for c in need:
                    bounds[c] = (row[f"lo_{c}"] or 0.0, row[f"hi_{c}"] or 0.0)
            resolved = resolved.withColumn(
                "_zo", self._zorder_value(resolved, zorder_by, bounds)
            )
            sort_cols = ["_zo"]
        new, dig, tot = self._write_snapshot(
            resolved, sort_by_key=cluster_by_key,
            max_records_per_file=max_file_rows, sort_cols=sort_cols,
        )
        out = dict(m["buckets"])
        for b in dirty:
            out.pop(str(b), None)
        for b, fs in new.items():
            out[b] = {"base": fs, "delta": []}
        new_files = [f for fs in new.values() for f in fs]
        key_stats = self._file_key_stats(new_files) if cluster_by_key else None
        if zorder_by:
            want = sorted(set(zorder_by) | set(self.stats_columns))
            key_stats = self._file_col_stats(new_files, want)
        bid = batch_id or f"compact-v{m['version']}"
        rows = self._count_rows(new_files)
        lineage = {"batch_id": bid, "op": "compact", "rows_written": rows,
                   "compacted_buckets": sorted(dirty)}
        if ttl_obs is not None:
            lineage["rows_expired"] = int(ttl_obs.get.get("n_expired") or 0)
        # optimistic rebase: compact is the maintenance op that runs beside
        # live ingest ("a background job that never blocks ingest"). If a
        # merge committed while we rewrote, the folded state is still valid
        # — it covers everything up to our read — and the racer's files must
        # survive: per dirty bucket, replace exactly the files we folded
        # with the new base and KEEP any delta the racer appended since (it
        # LWW-supersedes the folded base on read, like any pending delta).
        folded = set(self._files(m, dirty))

        def rebase(cur: dict[str, Any]) -> dict[str, Any]:
            out2 = {b: {"base": list(e.get("base", [])),
                        "delta": list(e.get("delta", []))}
                    for b, e in cur.items()}
            for b in dirty:
                e = out2.get(str(b), {"base": [], "delta": []})
                e["base"] = [f for f in e["base"] if f not in folded]
                e["delta"] = [f for f in e["delta"] if f not in folded]
                out2[str(b)] = e
            for b, fs in new.items():
                e = out2.setdefault(b, {"base": [], "delta": []})
                e["base"] = fs + e["base"]
            return {b: e for b, e in out2.items()
                    if e.get("base") or e.get("delta")}

        v = self._commit(out, schema, bid, lineage, dig, tot,
                         extra_file_stats=key_stats,
                         base_version=int(m["version"]), rebase=rebase)
        return MergeResult(v, bid, True, sorted(int(b) for b in new), rows)

    # ------------------------------------------------------------- utilities
    def delta_ratio(self) -> float:
        """delta-file fraction of the current snapshot — the MoR compaction
        trigger signal (0.0 = fully compacted)."""
        m = self._load_manifest()
        if m is None:
            return 0.0
        n_base = sum(len(e.get("base", [])) for e in m["buckets"].values())
        n_delta = sum(len(e.get("delta", [])) for e in m["buckets"].values())
        total = n_base + n_delta
        return n_delta / total if total else 0.0

    def expire_tombstones(self, older_than_lsn: int, batch_id: str | None = None) -> MergeResult:
        """Drop delete tombstones with ``_lsn < older_than_lsn`` (full
        compaction included). Safe once the source guarantees no change older
        than that LSN can still arrive — the retention contract every CDC
        system needs (Debezium's tombstone window, Cassandra's gc_grace)."""
        m = self._load_manifest()
        if m is None:
            return MergeResult(0, batch_id or "gc", False)
        schema = self._schema_of(m)
        df = self._read_files(self._files(m, None), schema)
        resolved = self._resolve_lww(df) if any(
            e.get("delta") for e in m["buckets"].values()
        ) else df
        kept = resolved.filter(
            ~(
                F.coalesce(F.col(DELETED_COL), F.lit(False))
                & (F.col(LSN_COL) < F.lit(older_than_lsn))
            )
        ).withColumn(BUCKET_COL, self._bucket_col())
        new, dig, tot = self._write_snapshot(kept)
        buckets = {b: {"base": fs, "delta": []} for b, fs in new.items()}
        bid = batch_id or f"gc-v{m['version']}"
        rows = self._count_rows([f for fs in new.values() for f in fs])
        lineage = {"batch_id": bid, "op": "expire_tombstones", "rows_written": rows,
                   "older_than_lsn": older_than_lsn}
        v = self._commit(buckets, schema, bid, lineage, dig, tot,
                         base_version=int(m["version"]))
        return MergeResult(v, bid, True, sorted(int(b) for b in new), rows)

    def purge_keys(
        self,
        keys: list[Any],
        batch_id: str | None = None,
        vacuum_history: bool = True,
    ) -> dict[str, Any]:
        """Privacy erasure (right-to-be-forgotten): physically remove EVERY
        stored row version of ``keys`` — live rows, superseded versions,
        tombstones, sign rows — from the table's data files. A tombstone
        delete hides a key but leaves its payload readable in the files and
        via time travel; purge is the hard-delete twin.

        - **Bounded rewrite.** The probe reuses the point-lookup index
          (hash-bucket pruning + per-file key blooms), so only files that
          MAY contain a purged key are rewritten; unaffected files are
          re-referenced verbatim. Rewritten files keep every other row
          as-is — no LWW fold, base stays base, delta stays delta — so MoR
          semantics and pending versions of other keys are untouched.
        - **History truncation.** Prior manifests still reference the old
          files, so by default the purge finishes with
          ``vacuum(keep_last=1)``: historical data files (every old copy of
          the purged payload) and manifests are deleted, and time travel /
          rollback restart at the purge commit. ``vacuum_history=False``
          defers that — the purge is NOT complete until ``vacuum`` runs.
        - **Downstream copies are not touched.** A follower table that
          already synced the keys retains them (the rows are gone from the
          change feed, so erasure cannot propagate); purge each table.
          Follower sync itself stays correct: the rewrite commit carries
          conservative lsn bounds and sync's row-level ``_lsn`` probe finds
          no new versions.

        Reference parity: the reference's deletes are ClickHouse sign
        cancels (adapters/clickhouse.py:93-105) which keep the payload in
        the cancel row; it has no erasure op. This is the GDPR-grade
        operation a conversation store needs.
        """
        keys = list(keys)
        report: dict[str, Any] = {
            "version": self.current_version(), "committed": False,
            "files_rewritten": 0, "rows_purged": 0,
        }
        m = self._load_manifest()
        if m is None or not keys:
            return report
        schema = self._schema_of(m)
        key0 = self.key_cols[0]
        key_type = schema[key0].dataType
        probe_map: dict[int, list[tuple[Any, int, list[int]]]] = {}
        mb = int(m.get("n_buckets", self.n_buckets))
        for pk in self._probe_keys(keys, key_type, n_buckets=mb):
            probe_map.setdefault(pk[1], []).append(pk)
        stats = m.get("file_stats", {})
        affected: dict[str, dict[str, list[str]]] = {}
        for b_str, e in m["buckets"].items():
            if int(b_str) not in probe_map:
                continue
            for kind in ("base", "delta"):
                hit = [
                    f for f in e.get(kind, [])
                    if self._bloom_may_contain(stats.get(f), probe_map[int(b_str)])
                ]
                if hit:
                    affected.setdefault(b_str, {})[kind] = hit
        if not affected:
            # no current file can hold the keys — but historical versions
            # still might (insert → delete → expire_tombstones), so the
            # history truncation must still run
            if vacuum_history:
                report["vacuum"] = self.vacuum(keep_last=1)
            return report

        k0 = F.col(key0)

        def drop_keys(df: DataFrame) -> DataFrame:
            if len(keys) <= 512:
                # null-keyed rows (never produced by merge, conceivable in
                # imported files) are kept: isin is NULL for them
                return df.filter(~F.coalesce(k0.isin(keys), F.lit(False)))
            kt = self.spark.createDataFrame(
                [(k,) for k in keys],
                T.StructType([T.StructField(key0, key_type)]),
            )
            return df.join(F.broadcast(kt), on=key0, how="left_anti")

        out_buckets = {
            b: {"base": list(e.get("base", [])), "delta": list(e.get("delta", []))}
            for b, e in m["buckets"].items()
        }
        all_digests: dict[str, dict[str, Any]] = {}
        totals: list[dict[str, Any]] = []
        new_files_all: list[str] = []
        rows_before = rows_after = n_rewritten = 0
        for kind in ("base", "delta"):
            files = [f for e in affected.values() for f in e.get(kind, [])]
            if not files:
                continue
            n_rewritten += len(files)
            rows_before += self._count_rows(files)
            kept = drop_keys(self._read_files(files, schema)).withColumn(
                BUCKET_COL, self._bucket_col()
            )
            new, dig, tot = self._write_snapshot(kept)
            all_digests.update(dig)
            if tot:
                totals.append(tot)
            for b_str, e in affected.items():
                if kind in e:
                    gone = set(e[kind])
                    out_buckets[b_str][kind] = [
                        f for f in out_buckets[b_str][kind] if f not in gone
                    ]
            for b, fs in new.items():
                out_buckets.setdefault(b, {"base": [], "delta": []})[kind] = (
                    out_buckets.get(b, {}).get(kind, []) + fs
                )
                new_files_all.extend(fs)
            rows_after += self._count_rows([f for fs in new.values() for f in fs])
        out_buckets = {
            b: e for b, e in out_buckets.items() if e.get("base") or e.get("delta")
        }
        batch_total: dict[str, Any] | None = None
        if totals:
            batch_total = dict(totals[0])
            for t in totals[1:]:
                if "d" in t:
                    batch_total["d"] = batch_total.get("d", 0) + t["d"]
                for k, fold in (("lsn_min", min), ("lsn_max", max),
                                ("key_min", min), ("key_max", max)):
                    if k in t:
                        batch_total[k] = (
                            fold(batch_total[k], t[k]) if k in batch_total else t[k]
                        )
        bid = batch_id or f"purge-v{m['version']}"
        lineage = {
            "batch_id": bid, "op": "purge", "rows_written": rows_after,
            "rows_purged": rows_before - rows_after,
            "files_rewritten": n_rewritten, "n_keys": len(keys),
        }
        v = self._commit(
            out_buckets, schema, bid, lineage, all_digests, batch_total,
            extra_file_stats=self._file_key_stats(new_files_all),
            base_version=int(m["version"]),
        )
        report.update(
            version=v, committed=True, files_rewritten=n_rewritten,
            rows_purged=rows_before - rows_after,
        )
        if vacuum_history:
            report["vacuum"] = self.vacuum(keep_last=1)
        return report

    def purge_where(
        self,
        condition: F.Column,
        batch_id: str | None = None,
        vacuum_history: bool = True,
        max_keys: int = 1_000_000,
    ) -> dict[str, Any]:
        """Predicate erasure ("delete every conversation matching X"):
        resolve the keys whose LIVE row matches ``condition``, then
        :meth:`purge_keys` them. Deliberately key-based, never
        version-based — physically removing individual row VERSIONS that
        match a predicate on a mutable column would resurrect the
        next-older version of any key whose latest row matched. One
        filtered scan to find the keys (predicate pushes to the parquet
        scan on resolved tables), then the bounded bloom-pruned rewrite."""
        m = self._load_manifest()
        if m is None:
            return {"version": 0, "committed": False,
                    "files_rewritten": 0, "rows_purged": 0}
        key0 = self.key_cols[0]
        rows = (
            self.read().filter(condition).select(key0).distinct()
            .limit(max_keys + 1).collect()
        )
        if len(rows) > max_keys:
            raise ValueError(
                f"purge_where matched more than {max_keys} keys — this is a "
                f"table rewrite, not an erasure; use overwrite() or raise max_keys"
            )
        return self.purge_keys(
            [r[0] for r in rows], batch_id=batch_id, vacuum_history=vacuum_history
        )

    def rescale(self, n_buckets: int, batch_id: str | None = None) -> MergeResult:
        """Rewrite the table under a new bucket count (Iceberg
        REPLACE PARTITION FIELD + rewrite). One full read→write; subsequent
        merges prune against the new layout. The table object's
        ``n_buckets`` is updated in place and persisted in the manifest."""
        m = self._load_manifest()
        if m is None:
            self.n_buckets = n_buckets
            return MergeResult(0, batch_id or "rescale", False)
        schema = self._schema_of(m)
        df = self._read_files(self._files(m, None), schema)
        if any(e.get("delta") for e in m["buckets"].values()):
            # versioned deltas (collapse included) must resolve before the
            # all-base rewrite — multiple versions of a key written as base
            # would never LWW again on read
            df = self._resolve_lww(df)
        self.n_buckets = n_buckets
        rebucketed = df.withColumn(BUCKET_COL, self._bucket_col())
        new, dig, tot = self._write_snapshot(rebucketed)
        buckets = {b: {"base": fs, "delta": []} for b, fs in new.items()}
        bid = batch_id or f"rescale-{n_buckets}"
        rows = self._count_rows([f for fs in new.values() for f in fs])
        lineage = {"batch_id": bid, "op": "rescale", "rows_written": rows,
                   "n_buckets": n_buckets}
        v = self._commit(buckets, schema, bid, lineage, dig, tot,
                         base_version=int(m["version"]))
        return MergeResult(v, bid, True, sorted(int(b) for b in new), rows)

    def rollback(self, version: int, batch_id: str | None = None) -> MergeResult:
        """Reinstate the table state of ``version`` as a NEW commit —
        Iceberg's ``rollback_to_snapshot``: history only moves forward, the
        old version's data files are re-referenced verbatim (zero data IO),
        and every consumer contract survives (``read()`` serves the restored
        state, ``changes_since``/checksum/lineage see a normal commit). The
        recovery story for a bad upstream batch: roll back, fix the source,
        replay — exactly-once manifests dedupe any batch ids that were
        already applied pre-rollback only if they are still inside the
        idempotence window, so replay with FRESH batch ids (or widen the
        window) after rolling back past a committed batch.

        Fails if ``version`` (or any of its files) was vacuumed — time
        travel and rollback reach exactly as far as ``vacuum(keep_last)``
        retains. Restores ``n_buckets`` if a rescale happened since. Per-file
        digests and stats are carried from the target manifest, so the
        checksum path pays no read-back."""
        m = self._load_manifest(version)
        if m is None:
            raise ValueError(
                f"version {version} is expired (vacuumed) or unknown; "
                f"current version is {self.current_version()}"
            )
        files = self._files(m, None)
        missing = [f for f in files if not os.path.exists(f)]
        if missing:
            raise ValueError(
                f"cannot roll back to version {version}: {len(missing)} of its "
                f"data files were vacuumed (first: {missing[0]})"
            )
        self.n_buckets = int(m.get("n_buckets", self.n_buckets))
        schema = self._schema_of(m)
        bid = batch_id or f"rollback-v{version}"
        lineage = {
            "batch_id": bid, "op": "rollback", "to_version": version,
            "rows_written": 0, "files_reinstated": len(files),
        }
        v = self._commit(
            m["buckets"], schema, bid, lineage,
            new_digests=m.get("file_digests"),
            extra_file_stats=m.get("file_stats"),
        )
        return MergeResult(v, bid, True, rows_written=0)

    def vacuum(
        self, keep_last: int = 1, older_than_seconds: float | None = None,
        orphan_grace_seconds: float = 3600.0,
    ) -> dict[str, int]:
        """Delete data files not referenced by the retained manifests, and
        manifests older than that (Iceberg's expire_snapshots +
        remove_orphan_files). Time travel remains available for the kept
        versions. Never touches the live snapshot.

        ``older_than_seconds``: age-based retention — keep every version
        committed within the window (plus the live one) regardless of
        count; the standard "7-day time travel" policy.

        ``orphan_grace_seconds``: files never referenced by ANY manifest
        (retained or expired) may be a concurrent writer's staged-but-
        uncommitted snapshot — deleting them kills the in-flight commit
        (the classic VACUUM hazard Delta guards with its retention window).
        They are removed only once older than the grace. Files referenced
        by EXPIRED manifests are history and are removed immediately — so
        ``purge_keys``'s erase-now contract is unaffected."""
        current = self.current_version()
        if older_than_seconds is not None:
            cutoff = time.time() - older_than_seconds
            lo = current
            for v in range(current - 1, 0, -1):
                m = self._load_manifest(v)
                if m is None or float(m.get("committed_at", 0.0)) < cutoff:
                    break
                lo = v
            keep_versions = list(range(lo, current + 1))
        else:
            keep_versions = list(range(max(1, current - keep_last + 1), current + 1))
        referenced: set[str] = set()
        for v in keep_versions:
            m = self._load_manifest(v)
            if m:
                referenced.update(self._files(m, None))
        # files referenced only by EXPIRED manifests: true history, removable
        # now (collected before those manifests are unlinked below)
        expired_refs: set[str] = set()
        for v in range(1, keep_versions[0]):
            m = self._load_manifest(v)
            if m:
                expired_refs.update(self._files(m, None))
        expired_refs -= referenced
        now = time.time()
        data_root = os.path.join(self.path, _DATA_DIR)
        removed_files = 0
        for snap in sorted(os.listdir(data_root)):
            snap_dir = os.path.join(data_root, snap)
            for root, _dirs, files in os.walk(snap_dir, topdown=False):
                for fn in files:
                    p = os.path.join(root, fn)
                    if p.endswith(".parquet") and p not in referenced:
                        if p not in expired_refs:
                            # never referenced by any manifest: possibly a
                            # concurrent writer's staged snapshot — grace
                            try:
                                if now - os.path.getmtime(p) < orphan_grace_seconds:
                                    continue
                            except OSError:
                                continue
                        os.unlink(p)
                        removed_files += 1
                    elif not fn.endswith(".parquet") and fn.startswith(("_", ".")):
                        os.unlink(p)  # _SUCCESS / .crc markers
                if not os.listdir(root):
                    os.rmdir(root)
        # crashed commits leave .tmp-* staging files in the manifest dir
        # (the atomic link publish never exposes them as versions); sweep
        # ones past the same grace window
        mdir = os.path.join(self.path, _MANIFEST_DIR)
        for fn in os.listdir(mdir):
            if fn.startswith(".tmp-"):
                p = os.path.join(mdir, fn)
                try:
                    if now - os.path.getmtime(p) > orphan_grace_seconds:
                        os.unlink(p)
                except OSError:
                    pass
        removed_manifests = 0
        for v in range(1, keep_versions[0]):
            p = self._manifest_path(v)
            if os.path.exists(p):
                # safe: the latest manifest carries the idempotence window of
                # recent batch_ids, so exactly-once dedupe survives for every
                # batch a checkpointed source could still re-deliver
                os.unlink(p)
                removed_manifests += 1
        return {"removed_files": removed_files, "removed_manifests": removed_manifests}

    def destroy(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)


_INT_RANK: dict[type, int] = {
    T.ByteType: 1, T.ShortType: 2, T.IntegerType: 3, T.LongType: 4,
}


def _widen_type(a: T.DataType, b: T.DataType) -> T.DataType | None:
    """Numeric promotion for a column observed under two types (Iceberg's
    type-evolution rules, plus integer↔fractional → double which Spark's
    own union coercion applies): int ladder widens to the larger, float →
    double, decimal widens precision/scale. Returns None when no lossless
    promotion exists (string vs int, etc.) — callers turn that into a
    clear schema-evolution error instead of a mid-job parquet cast
    failure."""
    if a == b:
        return a
    int_a, int_b = type(a) in _INT_RANK, type(b) in _INT_RANK
    if int_a and int_b:
        return a if _INT_RANK[type(a)] >= _INT_RANK[type(b)] else b
    frac = (T.FloatType, T.DoubleType)
    if (int_a or isinstance(a, frac)) and (int_b or isinstance(b, frac)):
        return T.DoubleType()
    if isinstance(a, T.DecimalType) and isinstance(b, T.DecimalType):
        scale = max(a.scale, b.scale)
        integral = max(a.precision - a.scale, b.precision - b.scale)
        if integral + scale <= 38:
            return T.DecimalType(integral + scale, scale)
    return None


def _merge_schemas(old: T.StructType, new: T.StructType) -> T.StructType:
    """Schema evolution union: old field order, new fields appended,
    numeric type conflicts WIDENED (int→long, float→double, …). The
    parquet vectorized reader upcasts old narrow files to the widened
    manifest type on read, so no rewrite is needed; incoming batches are
    cast to the merged schema before write (``_conform_types``) so new
    files — and their in-write observe() digests — carry the wide type.
    Non-widenable conflicts raise immediately at merge time."""
    fields = {f.name: f for f in old.fields}
    for f in new.fields:
        cur = fields.get(f.name)
        if cur is None:
            fields[f.name] = f
        elif cur.dataType != f.dataType:
            widened = _widen_type(cur.dataType, f.dataType)
            if widened is None:
                raise TypeError(
                    f"incompatible schema evolution for column '{f.name}': "
                    f"table has {cur.dataType.simpleString()}, batch has "
                    f"{f.dataType.simpleString()} (only additive columns and "
                    "widening numeric promotions are supported)"
                )
            fields[f.name] = T.StructField(f.name, widened, True)
    return T.StructType(list(fields.values()))


def _conform_types(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Cast ``df``'s columns to ``schema``'s types where they differ
    (post-``_merge_schemas`` widening). Column order is left alone."""
    want = {f.name: f.dataType for f in schema.fields}
    have = {f.name: f.dataType for f in df.schema.fields}
    casts = [c for c in df.columns if c in want and have[c] != want[c]]
    if not casts:
        return df
    return df.withColumns({c: F.col(c).cast(want[c]) for c in casts})


def _digest_cols_key(schema: T.StructType, cols: list[str]) -> str:
    """Digest-cache validity key: column names AND types, in digest order.
    Types matter because the digest hashes each value's STRING image —
    identical for integer widenings, but a float read back as double can
    render differently (0.1f → 0.10000000149011612), so a type change must
    invalidate cached file digests and trigger the existing stale-file
    catch-up at the next resolving commit."""
    by = {f.name: f.dataType for f in schema.fields}
    return ",".join(f"{c}:{by[c].simpleString()}" for c in cols)


def collapse_live_view(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Reconstruct live rows from a collapse-strategy table: per full row,
    keep rows whose sign sum is positive (cancels annihilate originals).

    The group key is (key columns, 64-bit payload rowhash), NOT the raw
    payload: wide text columns must not ride the shuffle as grouping keys
    (hash-compare beats long-string compare, and the partial aggregation
    buffers stay slim). Payload values are recovered with ``max`` — within a
    group every payload is identical by construction (64-bit collisions
    within one key are negligible, the same stance as the dedup suite).
    Rows with a NULL sign (written before the table ever saw a collapse
    batch) count as live (+1)."""
    cols = [c for c in df.columns if c != SIGN_COL]
    payload = [c for c in cols if c not in key_cols]
    sign = F.sum(F.coalesce(F.col(SIGN_COL), F.lit(1))).alias("_s")
    if not payload:
        return df.groupBy(*cols).agg(sign).filter(F.col("_s") > 0).drop("_s")
    return (
        df.groupBy(*key_cols, rowhash_xxhash64(*payload).alias("_ph"))
        .agg(sign, *[F.max(c).alias(c) for c in payload])
        .filter(F.col("_s") > 0)
        .select(*cols)
    )
