"""Declarative Query IR → DataFrame plan.

Reference parity: ``core/query.py:36-71`` (Query/Field/Filter/Join/Table
dataclasses) + ``engine/sql_builder.py:4-77`` (SQL rendering) + the richer
``sqlglot1.py`` surface (IN/BETWEEN/NOT, CASE, aggregate kinds, CTEs,
multi-column ORDER BY). The reference renders per-dialect SQL strings and
ships them to each database; here the IR compiles to a DataFrame logical plan
and Catalyst does predicate pushdown / column pruning / join planning — the
optimizations the reference hand-encodes in its config layer (SURVEY §4).

Virtual field types (``core/query.py:38``: column | rowhash | blockhash |
blockname) map to the expression builders in ``functions.hashes`` — the Spark
analogue of each adapter's ``_rewrite_query``
(``adapters/postgres.py:79-97``).

Expressions are Spark-SQL strings parsed by ``F.expr`` — the IR stays
declarative and dialect-free; no string SQL assembly, no injection surface
(the reference needs parameterized queries for that, ``sql_builder.py:52-74``).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.hashes import bucket_expr, epoch_seconds, rowhash_int32, rowhash_md5

_COMPARE_OPS = {"=", "==", "!=", "<>", "<", "<=", ">", ">="}


@dataclass
class Field:
    expr: str
    alias: str | None = None
    type: str = "column"  # column | rowhash | blockhash | blockname
    metadata: dict[str, Any] = dc_field(default_factory=dict)


@dataclass
class Filter:
    column: str
    operator: str  # = != < <= > >= in not_in between not_between like is_null is_not_null
    value: Any = None


@dataclass
class Join:
    table: str
    on: str  # boolean Spark-SQL expression, e.g. "u.id = o.user_id"
    alias: str | None = None
    # inner | left | right | full (reference surface, core/config.py:131-135)
    # + left_semi | left_anti (Spark-native extensions; the reference's block
    # diff A/D statuses are effectively anti-joins, SURVEY §2.3)
    type: str = "inner"
    # broadcast hint for a small right side (dimension tables): skips the
    # shuffle of the big side entirely — at 100 TB the difference between a
    # map-side hash join and a full repartition of the fact table. Catalyst
    # auto-broadcasts under the size threshold; the hint is for when stats
    # are absent (fresh parquet, no ANALYZE) or the planner guesses wrong.
    broadcast: bool = False


@dataclass
class RawSql:
    """A CTE given as a raw SQL string (the reference accepts both forms,
    ``apijson.py:4-10``). Compiled by registering the current table map as
    temp views and delegating to ``spark.sql`` — still a Catalyst plan."""

    sql: str


@dataclass
class SetOp:
    """Set operation appended to a query (Spark-native IR extension — the
    reference's engine lacks them but its pipelines emulate UNION ALL by
    running two configs into one sink). ``op``: union | union_all |
    intersect | except — ANSI distinct semantics except union_all."""

    op: str
    query: "Query"


@dataclass
class Pivot:
    """Wide rotation of one aggregate over an EXPLICIT value list (Spark
    ``groupBy().pivot(col, values)``; ANSI form is one FILTER aggregate per
    value). ``values`` is required — declared values keep the output schema
    deterministic and skip the values-discovery scan Spark otherwise runs
    over the whole input (an extra full pass at 100-TB scale). Combinations
    absent from the data yield NULL, exactly like a FILTER aggregate."""

    column: str  # pivot column (bare name)
    values: list[Any]  # explicit pivot values, output column order
    agg: str  # aggregate SQL expression, e.g. "round(sum(l_quantity), 2)"
    prefix: str = ""  # output columns are f"{prefix}{value}"


@dataclass
class Unpivot:
    """Long rotation (melt): keep ``ids``, turn each column of ``cols`` into
    a (``var_name``, ``value_name``) row — Spark ``DataFrame.unpivot`` /
    ANSI UNPIVOT / UNION ALL of per-column selects. Applied AFTER the
    select/aggregate stage, over its output column names. Value columns
    must share a common type (cast in the select)."""

    ids: list[str]
    cols: list[str]
    var_name: str = "key"
    value_name: str = "value"


@dataclass
class Query:
    select: list[Field]
    table: str
    table_alias: str | None = None
    joins: list[Join] = dc_field(default_factory=list)
    filters: list[Filter] = dc_field(default_factory=list)
    group_by: list[str] = dc_field(default_factory=list)
    # groups | rollup | cube | grouping_sets — subtotal grids over group_by
    # (Spark-native extension; absent in the reference engine)
    grouping: str = "groups"
    # grouping_sets mode only: each set is a subset of group_by expressions
    # (ANSI GROUP BY GROUPING SETS ((a,b),(a),()) semantics)
    grouping_sets: list[list[str]] = dc_field(default_factory=list)
    # post-aggregation filters over the SELECT output names (ANSI HAVING —
    # stored-config users of an analytics engine expect it)
    having: list[Filter] = dc_field(default_factory=list)
    distinct: bool = False  # SELECT DISTINCT
    order_by: list[tuple[str, str]] = dc_field(default_factory=list)  # (expr, asc|desc)
    limit: int | None = None
    # CTEs (reference apijson.py:4-10 / sqlglot1.py:109-118): name → subquery,
    # usable as `table` or a join target in this query. Compiled to plain
    # DataFrame subplans — Catalyst inlines or reuses them as it sees fit.
    with_tables: dict[str, "Query | RawSql"] = dc_field(default_factory=dict)
    # applied after select/group_by, before order_by/limit (ANSI ordering)
    set_ops: list[SetOp] = dc_field(default_factory=list)
    # wide/long rotations (Spark-native extensions; see Pivot/Unpivot).
    # pivot replaces the aggregate stage (grouping='groups' only); unpivot
    # applies over the select/aggregate output, before having/set_ops.
    pivot: "Pivot | None" = None
    unpivot: "Unpivot | None" = None


def _field_column(f: Field) -> Column:
    if f.type == "column":
        col = F.expr(f.expr)
    elif f.type == "rowhash":
        cols = [F.col(c) for c in f.metadata["fields"]]
        strat = f.metadata.get("strategy", "md5sum_hash")
        col = rowhash_int32(*cols) if strat == "md5sum_hash" else rowhash_md5(*cols)
    elif f.type == "blockhash":
        cols = [F.col(c) for c in f.metadata["fields"]]
        col = F.sum(rowhash_int32(*cols))
    elif f.type == "blockname":
        pc = F.col(f.metadata["partition_column"])
        if f.metadata.get("partition_column_type") == "datetime":
            pc = epoch_seconds(pc)
        col = bucket_expr(pc, f.metadata["interval"])
    else:
        raise ValueError(f"unknown field type: {f.type}")
    return col.alias(f.alias) if f.alias else col


def _filter_condition(flt: Filter) -> Column:
    c = F.expr(flt.column)
    op = flt.operator.lower()
    if op in _COMPARE_OPS:
        return {
            "=": c == F.lit(flt.value), "==": c == F.lit(flt.value),
            "!=": c != F.lit(flt.value), "<>": c != F.lit(flt.value),
            "<": c < F.lit(flt.value), "<=": c <= F.lit(flt.value),
            ">": c > F.lit(flt.value), ">=": c >= F.lit(flt.value),
        }[op]
    if op == "in":
        return c.isin(list(flt.value))
    if op == "not_in":
        return ~c.isin(list(flt.value))
    if op == "between":
        return c.between(flt.value[0], flt.value[1])
    if op == "not_between":
        return ~c.between(flt.value[0], flt.value[1])
    if op == "like":
        return c.like(flt.value)
    if op == "is_null":
        return c.isNull()
    if op == "is_not_null":
        return c.isNotNull()
    raise ValueError(f"unknown filter operator: {flt.operator}")


def _compile_raw_sql(
    spark: SparkSession, sql: str, tables: dict[str, DataFrame]
) -> DataFrame:
    """Compile a RawSql CTE without leaving session-global residue: temp
    views shadowed by the table map are snapshotted first and restored after
    ``spark.sql`` returns (which analyzes eagerly — the returned plan no
    longer needs the views), and views this function created are dropped.
    A pure query-build step must not corrupt concurrent users of the session."""
    prior_temp = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    shadowed = {n: spark.table(n) for n in tables if n in prior_temp}
    try:
        for tname, tdf in tables.items():
            tdf.createOrReplaceTempView(tname)
        return spark.sql(sql)
    finally:
        for tname in tables:
            if tname in shadowed:
                shadowed[tname].createOrReplaceTempView(tname)
            else:
                spark.catalog.dropTempView(tname)


def build_dataframe(
    spark: SparkSession, query: Query, tables: dict[str, DataFrame]
) -> DataFrame:
    """Compile the IR to a DataFrame plan.

    ``tables`` maps table names to DataFrames (the "datastore" boundary —
    reference ``core/db_factory.py``). Filters are applied before
    aggregation; Catalyst pushes them into the scans.
    """
    if query.with_tables:
        tables = dict(tables)
        for name, sub in query.with_tables.items():
            if isinstance(sub, RawSql):
                tables[name] = _compile_raw_sql(spark, sub.sql, tables)
            else:
                tables[name] = build_dataframe(spark, sub, tables)
    df = tables[query.table].alias(query.table_alias or query.table)
    for j in query.joins:
        right = tables[j.table].alias(j.alias or j.table)
        if j.broadcast:
            right = F.broadcast(right)
        df = df.join(right, on=F.expr(j.on), how=j.type)
    for flt in query.filters:
        df = df.filter(_filter_condition(flt))
    if query.pivot is not None:
        p = query.pivot
        if query.grouping != "groups":
            raise ValueError("pivot supports grouping='groups' only")
        if not query.group_by:
            raise ValueError("pivot requires a non-empty group_by")
        if not p.values:
            raise ValueError(
                "pivot requires an explicit non-empty values list (declared "
                "values keep the schema deterministic and avoid Spark's "
                "values-discovery scan over the full input)"
            )
        gb_alias = {g: f"_gb{i}" for i, g in enumerate(query.group_by)}
        gcols = [F.expr(g).alias(a) for g, a in gb_alias.items()]
        df = df.groupBy(*gcols).pivot(p.column, list(p.values)).agg(F.expr(p.agg))
        out_cols = []
        for f in query.select:
            if f.expr not in gb_alias:
                raise ValueError(
                    "a pivot query selects only group_by fields; the pivoted "
                    f"value columns are generated (got {f.expr!r})"
                )
            out_cols.append(F.col(gb_alias[f.expr]).alias(f.alias or f.expr))
        # single-agg pivot names output columns by the value's string image
        out_cols += [F.col(f"`{v}`").alias(f"{p.prefix}{v}") for v in p.values]
        df = df.select(*out_cols)
    elif query.group_by:
        agg_fields = [f for f in query.select if f.expr not in query.group_by]
        if query.grouping == "grouping_sets":
            # Spark's groupingSets matches set entries to grouping columns by
            # NAME — aliased/duplicated Column objects silently mis-match
            # (every output group column nulls out), so this mode requires
            # bare column names and passes them through untouched
            if not query.grouping_sets:
                # [] would reach df.groupingSets([]) and fail with an opaque
                # engine error (or a degenerate global aggregate) — reject the
                # stored-config typo at plan-build time instead
                raise ValueError(
                    "grouping='grouping_sets' requires a non-empty grouping_sets "
                    "list (use [[]] for the single global-aggregate set)"
                )
            bad = [g for g in query.group_by if not g.isidentifier()]
            if bad:
                raise ValueError(
                    f"grouping_sets requires bare column names in group_by: {bad}"
                )
            missing = [g for s in query.grouping_sets for g in s if g not in query.group_by]
            if missing:
                raise ValueError(f"grouping_sets entries must come from group_by: {missing}")
            gb_alias = {g: g for g in query.group_by}
            grouped = df.groupingSets(
                [list(s) for s in query.grouping_sets], *query.group_by
            )
        else:
            gb_alias = {g: f"_gb{i}" for i, g in enumerate(query.group_by)}
            gcols = [F.expr(g).alias(a) for g, a in gb_alias.items()]
            if query.grouping == "rollup":
                grouped = df.rollup(*gcols)
            elif query.grouping == "cube":
                grouped = df.cube(*gcols)
            elif query.grouping == "groups":
                grouped = df.groupBy(*gcols)
            else:
                raise ValueError(f"unknown grouping mode: {query.grouping}")
        # Mixing DISTINCT aggregates with holistic ones (percentile/median,
        # whose buffers hold every group value) makes Spark plan an Expand
        # that doubles the rows feeding the holistic buffers — measured 2×
        # the aggregation stage. Split: plain aggregates in one groupBy,
        # distinct aggregates in a second, joined null-safely on the group
        # keys (same key set on both sides by construction).
        _split = None
        if query.grouping == "groups":
            dist = [f for f in agg_fields if "distinct" in f.expr.lower()]
            holo = [
                f for f in agg_fields
                if "percentile" in f.expr.lower() or "median(" in f.expr.lower()
            ]
            if dist and holo and len(dist) < len(agg_fields):
                _split = (dist, [f for f in agg_fields if f not in dist])
        if _split is not None:
            dist, rest = _split
            g1 = grouped.agg(*[_field_column(f) for f in rest])
            d_alias = {g: f"{a}__d" for g, (_, a) in zip(
                gb_alias, gb_alias.items())}
            g2 = df.groupBy(
                *[F.expr(g).alias(d_alias[g]) for g in gb_alias]
            ).agg(*[_field_column(f) for f in dist])
            cond = None
            for g, a in gb_alias.items():
                c = g1[a].eqNullSafe(g2[d_alias[g]])
                cond = c if cond is None else (cond & c)
            df = g1.join(g2, cond).drop(*d_alias.values())
        else:
            df = grouped.agg(*[_field_column(f) for f in agg_fields])
        # re-project to requested select order/aliases (grouping expressions
        # are referenced via their grouping alias — the base columns are gone)
        out_cols = []
        for f in query.select:
            if f.expr in gb_alias:
                out_cols.append(F.col(gb_alias[f.expr]).alias(f.alias or f.expr))
            else:
                out_cols.append(F.col(f.alias or f.expr))
        df = df.select(*out_cols)
    else:
        df = df.select(*[_field_column(f) for f in query.select])
    if query.unpivot is not None:
        u = query.unpivot
        df = df.unpivot(
            [F.col(c) for c in u.ids], [F.col(c) for c in u.cols],
            u.var_name, u.value_name,
        )
    # HAVING: post-aggregation filter over the projected output names
    # (applies after the select so aggregate aliases are referencable)
    for flt in query.having:
        df = df.filter(_filter_condition(flt))
    if query.distinct:
        df = df.distinct()
    for so in query.set_ops:
        other = build_dataframe(spark, so.query, tables)
        if so.op == "union_all":
            df = df.unionByName(other)
        elif so.op == "union":
            df = df.unionByName(other).distinct()
        elif so.op == "intersect":
            df = df.intersect(other)
        elif so.op == "except":
            df = df.subtract(other)  # ANSI EXCEPT (distinct) semantics
        else:
            raise ValueError(f"unknown set op: {so.op}")
    if query.order_by:
        df = df.orderBy(
            *[
                F.expr(e).desc() if d.lower() == "desc" else F.expr(e).asc()
                for e, d in query.order_by
            ]
        )
    if query.limit is not None:
        df = df.limit(query.limit)
    return df
