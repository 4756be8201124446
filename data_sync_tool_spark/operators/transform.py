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
}


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


def lambda_to_column(df: DataFrame, fn, out_dtype: str | None) -> Column:
    """Wrap a sandboxed row lambda as a pandas UDF over a struct of the
    input columns. Arrow ships whole batches; Python sees pandas rows —
    the reference's ``lambda r: r['a'] + r['b']`` works unchanged."""
    spark_type = _DTYPE_MAP.get(out_dtype or "str", "string")
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
    return col.cast(_DTYPE_MAP[dtype])


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
