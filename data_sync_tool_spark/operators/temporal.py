"""Temporal operators: as-of (nearest-event) joins.

The reference engine exposes equality joins only (core/apijson.py join
configs); an as-of join — "for each left row, the latest right row of the
same key at-or-before it" — is the temporal primitive a CDC/transcript
pipeline needs constantly (attribute a purchase to the signup that preceded
it, attach the config version active when a turn was produced, price a
trade at the last tick).

Spark-first design: NO range join and NO per-key loop. Both sides are
union-tagged and sorted once per key inside a single window — the classic
distributed merge-as-of:

    union(left, right) → window over (by) ordered by (on, side)
    → last(right payload, ignorenulls=True) carried forward → keep left rows

One shuffle on the ``by`` key, linear per-partition work (sort-based
window), no candidate blow-up — the same plan shape a 1000-executor run
wants at 10^10 rows. A join-based formulation (left join on key + right.ts
<= left.ts, then max) shuffles BOTH sides too but materializes the full
candidate cross-product per key before reducing; this never does.

Skew note: one window partition per key — a single pathologically hot key
serializes into one task, but the work is the sorted merge itself (linear),
not a quadratic candidate set, and AQE's skew handling does not split
windows; for hot-key workloads pre-bucket the left side by time range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SIDE = "_asof_side"
_ON = "_asof_on"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    suffix: str = "",
) -> DataFrame:
    """For each ``left`` row, attach the ``value_cols`` of the single
    ``right`` row with the same ``by`` key whose ``on`` is the latest
    at-or-before (``direction="backward"``) / earliest at-or-after
    (``"forward"``) the left row's ``on``. Left rows with no match keep
    NULL values (left-join semantics, pandas ``merge_asof`` / DuckDB
    ``ASOF JOIN`` with ``>=`` / ``<=``).

    ``on`` may be a timestamp or any orderable numeric; ``tolerance``
    (same unit as ``on``; seconds for timestamps) nulls matches further
    away than that. ``suffix`` renames the attached columns. Right rows
    must be unique per (``by``, ``on``) — ties among right rows at the
    same instant are otherwise resolved arbitrarily (pre-aggregate the
    right side to make results deterministic).

    Left rows whose ``on`` is NULL get NULL values; right rows with NULL
    ``on`` are dropped.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    vals = value_cols if value_cols is not None else [
        c for c in right.columns if c not in by and c != on
    ]
    missing = [c for c in vals if c not in right.columns]
    if missing:
        raise ValueError(f"value_cols not in right side: {missing}")
    out_vals = {c: c + suffix for c in vals}
    clash = [v for v in out_vals.values() if v in left.columns]
    if clash:
        raise ValueError(
            f"right value columns collide with left columns: {clash} "
            "(pass suffix=...)"
        )

    on_type = left.schema[on].dataType
    l_tag = left.withColumn(_SIDE, F.lit(1)).withColumn(_ON, F.col(on))
    for c, oc in out_vals.items():
        l_tag = l_tag.withColumn(oc, F.lit(None).cast(right.schema[c].dataType))
    left_payload = [c for c in left.columns if c not in by]
    r_tag = right.filter(F.col(on).isNotNull()).select(
        *by,
        F.col(on).cast(on_type).alias(_ON),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(oc) for c, oc in out_vals.items()],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=False)

    # merge order: right rows sort BEFORE left rows at the same instant, so
    # the carried value is inclusive (left.on == right.on matches)
    asc = direction == "backward"
    order: list[Column] = [
        F.col(_ON).asc_nulls_first() if asc else F.col(_ON).desc_nulls_first(),
        F.col(_SIDE).asc(),
    ]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned
    for oc in out_vals.values():
        carried = carried.withColumn(oc, F.last(oc, ignorenulls=True).over(w))
    if tolerance is not None:
        matched_on = F.last(
            F.when(F.col(_SIDE) == 0, F.col(_ON)), ignorenulls=True
        ).over(w)
        gap = F.abs(F.col(_ON).cast("double") - matched_on.cast("double"))
        keep = matched_on.isNotNull() & (gap <= F.lit(float(tolerance)))
        for oc in out_vals.values():
            carried = carried.withColumn(
                oc, F.when(keep, F.col(oc)).otherwise(F.lit(None))
            )
    return (
        carried.filter(F.col(_SIDE) == 1)
        .select(*left.columns, *[F.col(oc) for oc in out_vals.values()])
    )
