"""JSON/dict pipeline-config → Query IR loader.

Reference parity: ``dict_to_query`` (``/root/reference/sqlglot1.py:164-178``)
over the dataclass surface in ``/root/reference/apijson.py:4-49`` — the
declarative form the reference's api.py persists for every stored pipeline:

- ``ctes``:    [{name, query}] — query is a nested config dict or a raw SQL
               string (both accepted, ``apijson.py:8-10``).
- ``select``:  [{expr, alias, type, hash_fields}] — typed Field kinds
               ``column | count | sum | case | if`` carry the expression in
               SQL form (``apijson.py:35-38``, e.g. ``SUM(o.amount)``);
               ``hash`` uses ``hash_fields`` and maps to the engine's rowhash
               virtual field.
- ``tables``:  [{table, primary, alias, type, on}] — exactly one primary;
               the rest become joins.
- ``filters``: [{column, operator, value}] — operators normalized
               case-insensitively (``IN``, ``NOT IN``, ``BETWEEN``, ``LIKE``,
               ``IS NULL``, …).
- ``order_by``: [{column, direction}]; ``group_by``: [str]; ``limit``: int;
  ``grouping``: groups|rollup|cube|grouping_sets (with ``grouping_sets``:
  [[str]] — subsets of group_by); ``having``: [{column, operator, value}]
  applied post-aggregation over the select aliases; ``distinct``: bool
  (Spark-native extensions).
- ``set_ops``: [{op, query}] — Spark-native extension (union | union_all |
               intersect | except), absent from the reference surface.
- ``pivot``:   {column, values, agg, prefix} — wide rotation over an explicit
  value list; ``unpivot``: {ids, cols, var_name, value_name} — long rotation
  over the select/aggregate output (Spark-native extensions).
"""

from __future__ import annotations

import json
from typing import Any

from .query import Field, Filter, Join, Pivot, Query, RawSql, SetOp, Unpivot

_FILTER_OPS = {
    "=": "=", "==": "=", "!=": "!=", "<>": "!=",
    "<": "<", "<=": "<=", ">": ">", ">=": ">=",
    "IN": "in", "NOT IN": "not_in",
    "BETWEEN": "between", "NOT BETWEEN": "not_between",
    "LIKE": "like", "IS NULL": "is_null", "IS NOT NULL": "is_not_null",
}

# typed Field kinds whose expr is already a SQL expression (apijson.py:35)
_EXPR_FIELD_TYPES = {"column", "count", "sum", "avg", "min", "max", "case", "if"}


def _parse_field(f: dict[str, Any]) -> Field:
    ftype = (f.get("type") or "column").lower()
    if ftype == "hash":
        return Field(
            expr=f.get("expr", ""),
            alias=f.get("alias"),
            type="rowhash",
            metadata={"fields": list(f.get("hash_fields", []))},
        )
    if ftype in ("rowhash", "blockhash", "blockname"):  # engine-native kinds
        return Field(
            expr=f.get("expr", ""), alias=f.get("alias"), type=ftype,
            metadata=dict(f.get("metadata", {})),
        )
    if ftype not in _EXPR_FIELD_TYPES:
        raise ValueError(f"unknown field type: {f.get('type')!r}")
    return Field(expr=f["expr"], alias=f.get("alias"), type="column")


def _parse_filter(f: dict[str, Any]) -> Filter:
    raw = str(f.get("operator", "=")).strip()
    op = _FILTER_OPS.get(raw) or _FILTER_OPS.get(raw.upper())
    if op is None:
        raise ValueError(f"unknown filter operator: {raw!r}")
    return Filter(column=f["column"], operator=op, value=f.get("value"))


def dict_to_query(d: dict[str, Any]) -> Query:
    """Build a ``Query`` from the reference's pipeline-config dict form."""
    tables = d.get("tables", [])
    primary = [t for t in tables if t.get("primary")]
    if len(primary) != 1:
        raise ValueError(f"config must have exactly one primary table, got {len(primary)}")
    joins = [
        Join(
            table=t["table"],
            on=t["on"],
            alias=t.get("alias"),
            type=(t.get("type") or "inner").lower(),
            broadcast=bool(t.get("broadcast", False)),
        )
        for t in tables
        if not t.get("primary")
    ]
    with_tables: dict[str, Query | RawSql] = {}
    for c in d.get("ctes", []):
        q = c["query"]
        with_tables[c["name"]] = dict_to_query(q) if isinstance(q, dict) else RawSql(str(q))
    return Query(
        select=[_parse_field(f) for f in d.get("select", [])],
        table=primary[0]["table"],
        table_alias=primary[0].get("alias"),
        joins=joins,
        filters=[_parse_filter(f) for f in d.get("filters", [])],
        group_by=list(d.get("group_by", [])),
        grouping=str(d.get("grouping", "groups")).lower(),
        grouping_sets=[list(s) for s in d.get("grouping_sets", [])],
        having=[_parse_filter(f) for f in d.get("having", [])],
        distinct=bool(d.get("distinct", False)),
        order_by=[
            (o["column"], str(o.get("direction", "asc")).lower())
            for o in d.get("order_by", [])
        ],
        limit=d.get("limit"),
        with_tables=with_tables,
        set_ops=[
            SetOp(op=str(s["op"]).lower(), query=dict_to_query(s["query"]))
            for s in d.get("set_ops", [])
        ],
        pivot=(
            Pivot(
                column=d["pivot"]["column"],
                values=list(d["pivot"]["values"]),
                agg=d["pivot"]["agg"],
                prefix=str(d["pivot"].get("prefix", "")),
            )
            if d.get("pivot") else None
        ),
        unpivot=(
            Unpivot(
                ids=list(d["unpivot"]["ids"]),
                cols=list(d["unpivot"]["cols"]),
                var_name=str(d["unpivot"].get("var_name", "key")),
                value_name=str(d["unpivot"].get("value_name", "value")),
            )
            if d.get("unpivot") else None
        ),
    )


def load_query_config(src: str) -> Query:
    """Parse a stored pipeline-config JSON document (the reference's api.py
    persistence format: ``{"name": ..., "config": {...}}``) or a bare config
    object, from a JSON string or a file path."""
    text = src
    if not src.lstrip().startswith("{"):
        with open(src) as f:
            text = f.read()
    doc = json.loads(text)
    return dict_to_query(doc.get("config", doc))
