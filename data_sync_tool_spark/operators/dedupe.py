"""Last-writer-wins dedupe of a change batch.

Reference analogue: the reference has no cross-row dedupe (it syncs row-by-row,
``/root/reference/otel.py:104-130``); this operator is what makes a REPLAYED
change stream converge to the same final state — SURVEY §2.8.

Scale design — why ``max_by`` aggregation and not a window ``row_number``:
a window over ``partitionBy(key) orderBy(lsn desc)`` must co-locate and SORT
every version of a hot key in one task; a hash aggregate with ``max(struct)``
gets map-side partial combine, so each input partition pre-reduces its own
copies of the hot key before the shuffle. For a conversation with 10^7 updates
across 10^4 partitions, the window shuffles 10^7 rows into one task; the
aggregate shuffles ≤10^4 pre-reduced rows. No salting needed for the reduce
itself (salting is still exposed via ``functions.hashes.salted_key`` for
downstream joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lww_dedupe(
    df: DataFrame,
    key_cols: list[str],
    lsn_col: str = "lsn",
    op_col: str | None = "op",
) -> DataFrame:
    """Keep, per key, the row with the greatest ``(lsn, op_rank)``.

    ``op_rank`` (delete=2 > others=1) is the documented deterministic
    tiebreak for equal LSNs; with unique LSNs it never engages.
    Output column order matches the input.
    """
    other = [c for c in df.columns if c not in key_cols]
    rank_fields = [F.col(lsn_col).cast("long").alias("_lsn_r")]
    if op_col is not None and op_col in df.columns:
        rank_fields.append(
            F.when(F.col(op_col) == "delete", F.lit(2)).otherwise(F.lit(1)).alias("_op_r")
        )
    payload = F.struct(*rank_fields, *[F.col(c) for c in other])
    won = df.groupBy(*key_cols).agg(F.max(payload).alias("_w"))
    return won.select(
        *[F.col(c) for c in df.columns if c in key_cols],
        *[F.col(f"_w.{c}").alias(c) for c in other],
    )


def replay_final_state(
    changes: DataFrame,
    key_cols: list[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
) -> DataFrame:
    """Final converged state after replaying a change stream in one pass:
    LWW per key, then drop keys whose last change was a delete. Equals the
    incremental result of merging every micro-batch in order (merge
    idempotence + LWW make batch boundaries irrelevant) — asserted by tests.
    """
    latest = lww_dedupe(changes, key_cols, lsn_col=lsn_col, op_col=op_col)
    return latest.filter(F.col(op_col) != F.lit("delete")).drop(op_col, lsn_col)
