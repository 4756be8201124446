"""JSON pipeline-config → Query IR loader (reference ``dict_to_query``,
``sqlglot1.py:164-178``; dataclass surface ``apijson.py:4-49``) + set ops."""

from __future__ import annotations

import json

import pytest

from data_sync_tool_spark.plans.config_io import dict_to_query, load_query_config
from data_sync_tool_spark.plans.query import (
    Field,
    Filter,
    Query,
    RawSql,
    SetOp,
    build_dataframe,
)

# the reference's own sample document (apijson.py:52-96 / sqlglot1.py's
# __main__ block), verbatim structure
REFERENCE_SAMPLE = """
{
  "name": "ingest_filtered_user_events",
  "config": {
    "select": [
      { "expr": "u.id",          "alias": "user_id",      "type": "column" },
      { "expr": "u.name",        "alias": "user_name",    "type": "column" },
      { "expr": "SUM(o.amount)", "alias": "total_amount", "type": "sum" },
      { "expr": "CASE WHEN u.age >= 21 THEN 'adult' ELSE 'minor' END",
        "alias": "age_group", "type": "case" }
    ],
    "tables": [
      { "table": "users",    "primary": true,  "alias": "u" },
      { "table": "orders",   "primary": false, "alias": "o", "type": "left",
        "on": "u.id = o.user_id" },
      { "table": "payments", "primary": false, "alias": "p", "type": "inner",
        "on": "u.id = p.user_id" }
    ],
    "filters": [
      { "column": "u.status", "operator": "=",  "value": "active" },
      { "column": "o.amount", "operator": ">=", "value": 21 }
    ],
    "group_by": ["u.id", "u.name"],
    "order_by": [ { "column": "user_id", "direction": "DESC" } ],
    "limit": 50
  }
}
"""


def test_reference_sample_round_trip():
    q = load_query_config(REFERENCE_SAMPLE)
    assert q.table == "users" and q.table_alias == "u"
    assert [(j.table, j.type, j.alias) for j in q.joins] == [
        ("orders", "left", "o"), ("payments", "inner", "p")
    ]
    assert [f.alias for f in q.select] == [
        "user_id", "user_name", "total_amount", "age_group"
    ]
    assert all(f.type == "column" for f in q.select)  # expr carries the SQL
    assert [(f.column, f.operator, f.value) for f in q.filters] == [
        ("u.status", "=", "active"), ("o.amount", ">=", 21)
    ]
    assert q.group_by == ["u.id", "u.name"]
    assert q.order_by == [("user_id", "desc")] and q.limit == 50


def test_cte_forms_and_hash_field():
    d = {
        "ctes": [
            {"name": "recent", "query": "SELECT * FROM events WHERE event_id > 5"},
            {"name": "nested", "query": {
                "select": [{"expr": "event_id", "type": "column"}],
                "tables": [{"table": "recent", "primary": True}],
            }},
        ],
        "select": [
            {"expr": "event_id", "type": "column"},
            {"type": "hash", "alias": "rh", "hash_fields": ["event_id", "event_type"]},
        ],
        "tables": [{"table": "nested", "primary": True}],
    }
    q = dict_to_query(d)
    assert isinstance(q.with_tables["recent"], RawSql)
    assert isinstance(q.with_tables["nested"], Query)
    hf = q.select[1]
    assert hf.type == "rowhash" and hf.metadata["fields"] == ["event_id", "event_type"]


def test_operator_normalization_and_errors():
    q = dict_to_query({
        "select": [{"expr": "a", "type": "column"}],
        "tables": [{"table": "t", "primary": True}],
        "filters": [
            {"column": "a", "operator": "NOT IN", "value": [1]},
            {"column": "a", "operator": "between", "value": [1, 2]},
            {"column": "a", "operator": "IS NULL"},
        ],
    })
    assert [f.operator for f in q.filters] == ["not_in", "between", "is_null"]
    with pytest.raises(ValueError, match="primary"):
        dict_to_query({"tables": [{"table": "a"}, {"table": "b"}]})
    with pytest.raises(ValueError, match="operator"):
        dict_to_query({
            "tables": [{"table": "t", "primary": True}],
            "filters": [{"column": "a", "operator": "~~"}],
        })
    with pytest.raises(ValueError, match="field type"):
        dict_to_query({
            "tables": [{"table": "t", "primary": True}],
            "select": [{"expr": "a", "type": "window"}],
        })


def test_json_config_executes_end_to_end(spark, sf_small):
    """The reference-sample shape against real tables: stored JSON → IR →
    DataFrame → rows (semantic check; the oracle-hash version runs in the
    contract gate as json_config_pipeline)."""
    from data_sync_tool_spark.queries import _JSON_PIPELINE_CONFIG, _tables

    q = load_query_config(_JSON_PIPELINE_CONFIG)
    df = build_dataframe(spark, q, _tables(spark, sf_small, ["orders", "customer"]))
    rows = df.collect()
    assert rows and list(rows[0].asDict()) == ["segment", "big_cnt", "total", "heat"]
    assert all(r["heat"] in ("hot", "cold") for r in rows)
    segs = [r["segment"] for r in rows]
    assert segs == sorted(segs) and "FURNITURE" not in segs


def test_set_ops_union_intersect_except(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "x long")
    lo = Query(select=[Field("x")], table="t", filters=[Filter("x", "<", 6)])
    hi = Query(select=[Field("x")], table="t", filters=[Filter("x", ">=", 4)])

    def run(op):
        q = Query(select=[Field("x")], table="t",
                  filters=hi.filters, set_ops=[SetOp(op, lo)],
                  order_by=[("x", "asc")])
        return [r["x"] for r in build_dataframe(spark, q, {"t": df}).collect()]

    assert run("union") == list(range(10))
    assert run("union_all") == sorted(list(range(4, 10)) + list(range(6)))
    assert run("intersect") == [4, 5]
    assert run("except") == [6, 7, 8, 9]
    with pytest.raises(ValueError, match="set op"):
        run("minus")


def test_cube_and_distinct_modes(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 4), ("a", "x", 8)],
        "g1 string, g2 string, v long",
    )
    cube_q = Query(
        select=[Field("g1"), Field("g2"), Field("sum(v)", "s")],
        table="t", group_by=["g1", "g2"], grouping="cube",
    )
    got = {
        (r["g1"], r["g2"]): r["s"]
        for r in build_dataframe(spark, cube_q, {"t": df}).collect()
    }
    assert got[(None, None)] == 15 and got[("a", None)] == 11
    assert got[(None, "x")] == 13 and got[("a", "x")] == 9

    dq = dict_to_query({
        "select": [{"expr": "g1", "type": "column"}],
        "tables": [{"table": "t", "primary": True}],
        "distinct": True,
    })
    assert dq.distinct is True
    assert sorted(r["g1"] for r in build_dataframe(spark, dq, {"t": df}).collect()) == ["a", "b"]

    bad = Query(select=[Field("g1")], table="t", group_by=["g1"], grouping="sets")
    with pytest.raises(ValueError, match="grouping"):
        build_dataframe(spark, bad, {"t": df})


def test_raw_sql_cte_leaves_no_view_residue(spark):
    """Compiling a RawSql CTE must not leave (or clobber) session temp views:
    pre-existing same-named views are restored, map-only names are dropped."""
    pre = spark.createDataFrame([(1,)], "x long")
    pre.createOrReplaceTempView("t_shadow")
    try:
        tables = {
            "t_shadow": spark.createDataFrame([(2,)], "x long"),
            "t_only_in_map": spark.createDataFrame([(3,)], "x long"),
        }
        q = Query(
            select=[Field("x")], table="c",
            with_tables={"c": RawSql("SELECT x FROM t_shadow")},
        )
        out = build_dataframe(spark, q, tables)
        assert [r["x"] for r in out.collect()] == [2]  # CTE saw the map's table
        # pre-existing view restored to its original plan
        assert spark.table("t_shadow").first()["x"] == 1
        # names that only existed in the table map are gone
        assert not any(
            t.name == "t_only_in_map" for t in spark.catalog.listTables()
        )
    finally:
        spark.catalog.dropTempView("t_shadow")


def test_having_and_grouping_sets_round_trip(spark):
    """HAVING + GROUPING SETS survive the JSON loader and compile (What's
    missing #4 in round-2 verdict)."""
    doc = {
        "select": [
            {"expr": "r", "type": "column"},
            {"expr": "sum(v)", "alias": "sv", "type": "sum"},
        ],
        "tables": [{"table": "t", "primary": True}],
        "group_by": ["r"],
        "having": [{"column": "sv", "operator": ">=", "value": 3}],
        "order_by": [{"column": "r", "direction": "asc"}],
    }
    q = dict_to_query(doc)
    assert q.having[0].column == "sv" and q.having[0].operator == ">="
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 1)], "r string, v int")
    out = build_dataframe(spark, q, {"t": df})
    assert [(r.r, r.sv) for r in out.collect()] == [("a", 3)]

    gs = dict_to_query({
        "select": [
            {"expr": "r", "type": "column"},
            {"expr": "s", "type": "column"},
            {"expr": "sum(v)", "alias": "sv", "type": "sum"},
        ],
        "tables": [{"table": "t", "primary": True}],
        "group_by": ["r", "s"],
        "grouping": "grouping_sets",
        "grouping_sets": [["r", "s"], ["r"], []],
    })
    assert gs.grouping == "grouping_sets" and gs.grouping_sets == [["r", "s"], ["r"], []]
    df2 = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3)], "r string, s string, v int"
    )
    got = {(r.r, r.s): r.sv for r in build_dataframe(spark, gs, {"t": df2}).collect()}
    # detail rows + r-subtotals + grand total, NO s-only rows (not a cube)
    assert got == {("a", "x"): 1, ("a", "y"): 2, ("b", "x"): 3,
                   ("a", None): 3, ("b", None): 3, (None, None): 6}

    with pytest.raises(ValueError, match="grouping_sets"):
        bad = dict_to_query({
            "select": [{"expr": "r"}], "tables": [{"table": "t", "primary": True}],
            "group_by": ["r"], "grouping": "grouping_sets",
            "grouping_sets": [["not_grouped"]],
        })
        build_dataframe(spark, bad, {"t": df})

    # stored-config typo: grouping_sets mode with an EMPTY set list must fail
    # at plan-build time, not with an opaque engine error
    with pytest.raises(ValueError, match="non-empty grouping_sets"):
        empty = dict_to_query({
            "select": [{"expr": "r"}], "tables": [{"table": "t", "primary": True}],
            "group_by": ["r"], "grouping": "grouping_sets", "grouping_sets": [],
        })
        build_dataframe(spark, empty, {"t": df})


def test_pivot_unpivot_from_stored_config(spark):
    """pivot/unpivot through the JSON stored-config surface: explicit value
    list, prefix naming, NULL cells for absent combos, unpivot round-trip
    (Spark keeps NULL cells — dropped here via post-rotation HAVING), and
    the plan-build validations."""
    import pytest
    from data_sync_tool_spark.plans.config_io import dict_to_query
    from data_sync_tool_spark.plans.query import build_dataframe

    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3), ("b", "x", 4)],
        "r string, s string, v int",
    )
    wide = dict_to_query({
        "select": [{"expr": "r"}],
        "tables": [{"table": "t", "primary": True}],
        "group_by": ["r"],
        "pivot": {"column": "s", "values": ["x", "y", "z"],
                  "agg": "sum(v)", "prefix": "v_"},
        "order_by": [{"column": "r"}],
    })
    out = build_dataframe(spark, wide, {"t": df})
    assert out.columns == ["r", "v_x", "v_y", "v_z"]
    rows = {t[0]: t[1:] for t in map(tuple, out.collect())}
    # absent combos (b,y) and all-z are NULL, like a FILTER aggregate
    assert rows == {"a": (1, 2, None), "b": (7, None, None)}

    melt = dict_to_query({
        "select": [{"expr": "r"}],
        "tables": [{"table": "t", "primary": True}],
        "group_by": ["r"],
        "pivot": {"column": "s", "values": ["x", "y"],
                  "agg": "sum(v)", "prefix": "v_"},
        "unpivot": {"ids": ["r"], "cols": ["v_x", "v_y"],
                    "var_name": "metric", "value_name": "val"},
        "having": [{"column": "val", "operator": "IS NOT NULL"}],
    })
    got = {(t[0], t[1]): t[2] for t in map(tuple, build_dataframe(spark, melt, {"t": df}).collect())}
    assert got == {("a", "v_x"): 1, ("a", "v_y"): 2, ("b", "v_x"): 7}

    base = {"select": [{"expr": "r"}], "tables": [{"table": "t", "primary": True}]}
    with pytest.raises(ValueError, match="group_by"):
        build_dataframe(spark, dict_to_query(
            base | {"pivot": {"column": "s", "values": ["x"], "agg": "sum(v)"}}
        ), {"t": df})
    with pytest.raises(ValueError, match="values list"):
        build_dataframe(spark, dict_to_query(
            base | {"group_by": ["r"],
                    "pivot": {"column": "s", "values": [], "agg": "sum(v)"}}
        ), {"t": df})
    with pytest.raises(ValueError, match="group_by fields"):
        build_dataframe(spark, dict_to_query(
            {"select": [{"expr": "r"}, {"expr": "sum(v)", "alias": "sv"}],
             "tables": [{"table": "t", "primary": True}], "group_by": ["r"],
             "pivot": {"column": "s", "values": ["x"], "agg": "sum(v)"}}
        ), {"t": df})
