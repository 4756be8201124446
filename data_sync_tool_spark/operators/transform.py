"""Field mapping / transform compilation — ``engine/transform.py`` +
``core/config.py:17-57`` semantics, vectorized.

The reference applies transforms one dict-row at a time
(``apply_transform``, ``engine/transform.py:10-22``; per-row loop
``otel.py:106-118``). Here every configured field compiles ONCE to either:

1. a native Column expression (templates and casts — the fast path, JVM-side,
   whole-stage codegen), or
2. an Arrow-batched pandas UDF (sandboxed ``lambda r:`` row functions — the
   general path; still zero row-at-a-time Python crossing the JVM boundary).

Dotted source paths (``glom(row, 'a.b.c')``, ``engine/transform.py:15``) map
to struct field access / ``get_json_object``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import VAR_RE, FieldConfig

_DTYPE_MAP = {
    "int": "long",
    "float": "double",
    "str": "string",
    "datetime": "timestamp",
    "date": "date",
    "decimal": "decimal(38,18)",  # bare 'decimal'; 'decimal(p,s)' passes through
}


def _spark_type(dtype: str) -> str:
    """Config dtype → Spark type string. ``decimal(p,s)`` (the reference test
    DDL uses ``DECIMAL(10,2)``, ``test/engine/reconcile/init.sql:2-8``) keeps
    its precision/scale; bare names map through ``_DTYPE_MAP``."""
    d = dtype.strip().lower()
    if d.startswith("decimal") and "(" in d:
        return d
    return _DTYPE_MAP[d]


def template_to_column(template: str) -> Column:
    """Compile ``{{ var }}`` interpolation to a concat of literals and column
    refs — vectorized Jinja-variable rendering. ``{{ a.b }}`` reaches into
    structs; ``__``-aliased names resolve as plain columns."""
    parts: list[Column] = []
    pos = 0
    for m in VAR_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos:m.start()]))
        parts.append(F.col(m.group(1)).cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    return F.concat(*parts) if len(parts) > 1 else parts[0].cast("string")


class _Bail(Exception):
    pass


def row_lambda_to_column(df: DataFrame, code: str) -> Column | None:
    """Best-effort NATIVE compilation of a sandboxed row lambda to a Column
    expression — the common config shapes (arithmetic on a couple of columns,
    string concat, ternaries, simple casts/methods) should not pay the Arrow
    round-trip. Returns None when the lambda uses anything outside the safe,
    type-checked subset; the caller falls back to the pandas-UDF path.

    Type safety: translation consults the DataFrame schema, because Python
    and SQL operators disagree by type — ``+`` concatenates Python strings
    but Spark would cast them to double. Only ops whose Python and Spark
    semantics provably coincide for the inferred operand types are compiled;
    notably ``%``, ``//`` and ``**`` always bail (sign/overflow semantics
    differ). NULL handling follows SQL three-valued logic on the native path
    (the pandas path would raise on None instead) — acceptable for config
    transforms, which the reference runs through SQL engines anyway.
    """
    import ast

    try:
        tree = ast.parse(code.strip(), mode="eval").body
    except SyntaxError:
        return None
    if not isinstance(tree, ast.Lambda):
        return None
    a = tree.args
    if (len(a.args) != 1 or a.posonlyargs or a.kwonlyargs or a.vararg
            or a.kwarg or a.defaults):
        return None
    arg = a.args[0].arg
    schema = {f.name: f.dataType for f in df.schema.fields}

    def ctype(dt: T.DataType) -> str:
        # "int" ⊂ "num": integral types keep their own tag because some
        # translations are only sound for them — str(float) disagrees between
        # Python ('1e+20') and Spark ('1.0E20'), str(int) never does.
        if isinstance(dt, T.IntegralType):
            return "int"
        if isinstance(dt, T.NumericType):
            return "num"
        if isinstance(dt, T.StringType):
            return "str"
        if isinstance(dt, T.BooleanType):
            return "bool"
        return "unknown"

    def is_num(t: str) -> bool:
        return t in ("int", "num")

    def col_ref(key: object) -> tuple[Column, str]:
        if not isinstance(key, str) or key not in schema:
            raise _Bail
        return F.col(key), ctype(schema[key])

    def conv(n: ast.AST) -> tuple[Column, str]:
        if isinstance(n, ast.Constant):
            v = n.value
            if isinstance(v, bool):
                return F.lit(v), "bool"
            if isinstance(v, int):
                return F.lit(v), "int"
            if isinstance(v, float):
                return F.lit(v), "num"
            if isinstance(v, str):
                return F.lit(v), "str"
            if v is None:
                return F.lit(None), "unknown"
            raise _Bail
        if (isinstance(n, ast.Subscript) and isinstance(n.value, ast.Name)
                and n.value.id == arg and isinstance(n.slice, ast.Constant)):
            return col_ref(n.slice.value)
        if isinstance(n, ast.Call):
            # r.get('col')
            if (isinstance(n.func, ast.Attribute) and n.func.attr == "get"
                    and isinstance(n.func.value, ast.Name) and n.func.value.id == arg
                    and len(n.args) == 1 and isinstance(n.args[0], ast.Constant)):
                return col_ref(n.args[0].value)
            # string methods on a translated str operand
            if isinstance(n.func, ast.Attribute) and not n.args and not n.keywords:
                base, t = conv(n.func.value)
                if t != "str":
                    raise _Bail
                meth = {"upper": F.upper, "lower": F.lower, "strip": F.trim}.get(n.func.attr)
                if meth is None:
                    raise _Bail
                return meth(base), "str"
            if isinstance(n.func, ast.Name) and not n.keywords:
                args = [conv(x) for x in n.args]
                fname = n.func.id
                # str() only for int/str operands: str(bool) yields
                # 'True'/'False' in Python but 'true'/'false' in Spark,
                # str(None) yields 'None' vs NULL, str(float) disagrees on
                # scientific-notation spelling — all bail to the UDF path
                if fname == "str" and len(args) == 1 and args[0][1] in ("int", "str"):
                    return args[0][0].cast("string"), "str"
                if fname == "int" and len(args) == 1 and is_num(args[0][1]):
                    # Python int() and Spark cast(long) both truncate toward 0
                    return args[0][0].cast("long"), "int"
                if fname == "float" and len(args) == 1 and (
                        is_num(args[0][1]) or args[0][1] == "str"):
                    return args[0][0].cast("double"), "num"
                if fname == "abs" and len(args) == 1 and is_num(args[0][1]):
                    return F.abs(args[0][0]), args[0][1]
                # round() deliberately NOT compiled: Python banker's rounding
                # vs Spark half-up — silent value drift
                if fname == "len" and len(args) == 1 and args[0][1] == "str":
                    return F.length(args[0][0]), "int"
            raise _Bail
        if isinstance(n, ast.BinOp):
            l, lt = conv(n.left)
            r, rt = conv(n.right)
            both_num = is_num(lt) and is_num(rt)
            num_out = "int" if lt == rt == "int" else "num"
            if isinstance(n.op, ast.Add):
                if both_num:
                    return l + r, num_out
                if lt == rt == "str":
                    return F.concat(l, r), "str"
                raise _Bail
            if both_num:
                if isinstance(n.op, ast.Sub):
                    return l - r, num_out
                if isinstance(n.op, ast.Mult):
                    return l * r, num_out
                if isinstance(n.op, ast.Div):
                    # Python / is true division; Spark / is double division
                    return l.cast("double") / r.cast("double"), "num"
            raise _Bail
        if isinstance(n, ast.Compare) and len(n.ops) == 1:
            l, lt = conv(n.left)
            op = n.ops[0]
            if isinstance(op, (ast.In, ast.NotIn)):
                if not isinstance(n.comparators[0], (ast.List, ast.Tuple, ast.Set)):
                    raise _Bail
                vals = []
                for e in n.comparators[0].elts:
                    if not isinstance(e, ast.Constant):
                        raise _Bail
                    vals.append(e.value)
                # membership must not rely on Spark's implicit casts: Python
                # '5' in [5] is False, Spark isin would coerce — require the
                # element types to match the operand type
                ok = (lt == "str" and all(isinstance(v, str) for v in vals)) or (
                    is_num(lt)
                    and all(isinstance(v, (int, float)) and not isinstance(v, bool)
                            for v in vals)
                )
                if not ok:
                    raise _Bail
                c = l.isin(vals)
                return (~c if isinstance(op, ast.NotIn) else c), "bool"
            r, rt = conv(n.comparators[0])
            if "unknown" in (lt, rt) or (lt != rt and not (is_num(lt) and is_num(rt))):
                raise _Bail
            ops = {ast.Eq: "__eq__", ast.NotEq: "__ne__", ast.Lt: "__lt__",
                   ast.LtE: "__le__", ast.Gt: "__gt__", ast.GtE: "__ge__"}
            m = ops.get(type(op))
            if m is None:
                raise _Bail
            return getattr(l, m)(r), "bool"
        if isinstance(n, ast.BoolOp):
            parts = [conv(v) for v in n.values]
            if any(t != "bool" for _c, t in parts):
                raise _Bail  # Python and/or return operands, not bools
            out = parts[0][0]
            for c, _t in parts[1:]:
                out = (out & c) if isinstance(n.op, ast.And) else (out | c)
            return out, "bool"
        if isinstance(n, ast.UnaryOp):
            v, t = conv(n.operand)
            if isinstance(n.op, ast.Not) and t == "bool":
                return ~v, "bool"
            if isinstance(n.op, ast.USub) and is_num(t):
                return -v, t
            raise _Bail
        if isinstance(n, ast.IfExp):
            t, tt = conv(n.test)
            if tt != "bool":
                raise _Bail
            yes, yt = conv(n.body)
            no, nt = conv(n.orelse)
            # branch types must agree (numeric widening allowed): mixed e.g.
            # int-vs-string branches coerce to string natively but stay int in
            # Python — bail instead of relying on Spark coercion. A literal
            # None branch is the exception: Python None and SQL NULL coincide.
            y_null = isinstance(n.body, ast.Constant) and n.body.value is None
            n_null = isinstance(n.orelse, ast.Constant) and n.orelse.value is None
            if y_null or n_null:
                out_t = nt if y_null else yt
            elif yt == nt:
                out_t = yt
            elif is_num(yt) and is_num(nt):
                out_t = "num"
            else:
                raise _Bail
            if out_t == "unknown":
                raise _Bail
            return F.when(t, yes).otherwise(no), out_t
        if isinstance(n, ast.JoinedStr):  # f-string → concat of casts
            parts = []
            for v in n.values:
                if isinstance(v, ast.Constant) and isinstance(v.value, str):
                    parts.append(F.lit(v.value))
                elif isinstance(v, ast.FormattedValue) and v.format_spec is None and v.conversion == -1:
                    # same rule as str(): Spark's string rendering diverges
                    # from Python for float ('1.0E20' vs '1e+20'), bool
                    # ('true' vs 'True') and NULL (concat propagates NULL vs
                    # Python 'None') — only int/str operands compile natively
                    c, t = conv(v.value)
                    if t not in ("int", "str"):
                        raise _Bail
                    parts.append(c.cast("string"))
                else:
                    raise _Bail
            return (F.concat(*parts) if parts else F.lit("")), "str"
        raise _Bail

    try:
        col, _t = conv(tree.body)
        return col
    except _Bail:
        return None


def lambda_to_column(df: DataFrame, fn, out_dtype: str | None) -> Column:
    """Wrap a sandboxed row lambda as a pandas UDF over a struct of the
    input columns. Arrow ships whole batches; Python sees pandas rows —
    the reference's ``lambda r: r['a'] + r['b']`` works unchanged."""
    try:
        spark_type = _spark_type(out_dtype or "str")
    except KeyError:
        spark_type = "string"
    ret_type = T._parse_datatype_string(spark_type)
    cols = df.columns

    @F.pandas_udf(ret_type)
    def _udf(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        for pdf in batch_iter:
            yield pdf.apply(lambda r: fn(r.to_dict()), axis=1)

    # struct-of-all-columns input; the iterator form keeps batches streaming
    return _udf(F.struct(*[F.col(c) for c in cols]))


def cast_column(col: Column, dtype: str | None) -> Column:
    """dtype coercion (``engine/transform.py:17-22``): isoparse-style
    datetime parsing is ``cast(timestamp)`` — Spark accepts ISO-8601."""
    if dtype is None:
        return col
    return col.cast(_spark_type(dtype))


def source_ref_to_column(ref: str) -> Column:
    """Plain or dotted source reference. ``a.b.c`` is struct/alias access —
    ``F.col`` already resolves both (``get_json_object`` for JSON strings is
    the caller's choice via ``json:`` prefix)."""
    if ref.startswith("json:"):
        path = ref[len("json:"):]
        root, _, rest = path.partition(".")
        return F.get_json_object(F.col(root), f"$.{rest}")
    return F.col(ref)


def compile_field(df: DataFrame, fc: FieldConfig) -> Column:
    """One configured field → one Column."""
    dv = fc.dynamic()
    if dv.kind == "template":
        col = template_to_column(dv.template)
    elif dv.kind == "row_lambda":
        # common shapes compile to native Columns (JVM, codegen); anything
        # outside the safe subset falls back to the Arrow-batched UDF
        col = row_lambda_to_column(df, str(dv.raw))
        if col is None:
            col = lambda_to_column(df, dv.fn, fc.dtype)
    elif dv.kind == "zero_arg":
        col = F.lit(dv.fn())
    else:
        col = source_ref_to_column(str(dv.raw))
    return cast_column(col, fc.dtype).alias(fc.alias or fc.column)


def apply_transform(df: DataFrame, fields: list[FieldConfig]) -> DataFrame:
    """The whole transform stage as ONE select — Catalyst prunes the scan to
    exactly the referenced columns (the reference achieves this by config
    back-propagation, ``core/config.py:187-207``; here it is free)."""
    if not fields:
        return df
    return df.select(*[compile_field(df, fc) for fc in fields])
