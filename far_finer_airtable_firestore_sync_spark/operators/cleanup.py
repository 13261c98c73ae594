"""Recursive key exclusion + string cleanup (P6 parity).

Reference: ``exclude_keys`` (lib/utils.py:7-31) walks an arbitrary
dict/list tree dropping given keys at every depth and normalizing every
string (strip tabs, trim).

Spark-first: the tree is the column's *schema*, known at plan time —
so the recursion happens over ``StructType``/``ArrayType`` while
building a single ``select`` of nested ``struct``/``transform``
expressions. Everything stays codegen'd; no UDF.

For truly schemaless JSON strings (``events.props``) there is a
schema'd path (``exclude_json_keys`` via from_json with a pruned
schema) and an arbitrary-depth Pandas-UDF fallback
(``exclude_json_keys_udf``) — the only place the engine drops to
Python, mirroring SURVEY.md §2.6's analysis.
"""

from __future__ import annotations

import json
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _clean_string(col: Column) -> Column:
    # tab-strip + trim (lib/utils.py:26-28); chr(9) avoids backslash
    # escapes in the pattern.
    return F.trim(F.regexp_replace(col, F.expr("chr(9) || '+'"), F.lit("")))


def _rebuild(col: Column, dtype: T.DataType, exclude: set[str]) -> Column:
    if isinstance(dtype, T.StructType):
        fields = [
            _rebuild(col.getField(f.name), f.dataType, exclude).alias(f.name)
            for f in dtype.fields
            if f.name not in exclude
        ]
        if not fields:
            return F.lit(None)
        rebuilt = F.struct(*fields)
        return F.when(col.isNull(), F.lit(None)).otherwise(rebuilt)
    if isinstance(dtype, T.ArrayType):
        # transform with a lambda Column: use F.transform
        return F.transform(col, lambda x: _rebuild(x, dtype.elementType, exclude))
    if isinstance(dtype, T.MapType):
        filtered = F.map_filter(col, lambda k, v: ~k.isin(*exclude) if exclude else F.lit(True))
        if isinstance(dtype.valueType, (T.StructType, T.ArrayType, T.MapType, T.StringType)):
            return F.transform_values(
                filtered, lambda k, v: _rebuild(v, dtype.valueType, exclude)
            )
        return filtered
    if isinstance(dtype, T.StringType):
        return _clean_string(col)
    return col


def exclude_keys(df: DataFrame, keys_to_exclude: Sequence[str]) -> DataFrame:
    """Drop ``keys_to_exclude`` at every nesting depth and normalize
    every string leaf — the plan-time analog of lib/utils.py:7-31."""
    exclude = set(keys_to_exclude)
    out = []
    for f in df.schema.fields:
        if f.name in exclude:
            continue
        out.append(_rebuild(F.col(f.name), f.dataType, exclude).alias(f.name))
    return df.select(*out)


def exclude_json_keys(
    df: DataFrame,
    json_col: str,
    schema: T.StructType,
    keys_to_exclude: Sequence[str],
) -> DataFrame:
    """Schema'd JSON path: parse with the known schema minus excluded
    keys (pushdown-style pruning — dropped keys are never even
    parsed), clean strings, re-serialize."""
    keep = T.StructType(
        [f for f in schema.fields if f.name not in set(keys_to_exclude)]
    )
    parsed = F.from_json(F.col(json_col), keep)
    cleaned = _rebuild(parsed, keep, set())
    return df.withColumn(json_col, F.to_json(cleaned))


def exclude_json_keys_udf(
    df: DataFrame, json_col: str, keys_to_exclude: Sequence[str]
) -> DataFrame:
    """Arbitrary-depth schemaless fallback (Pandas UDF, Arrow-batched):
    the reference's exact recursion for JSON whose shape is unknown at
    plan time. Slow path by design — prefer :func:`exclude_json_keys`.
    """
    exclude = list(keys_to_exclude)

    @F.pandas_udf(T.StringType())
    def _excl(s):  # type: ignore[no-untyped-def]
        import re

        def walk(node):
            if isinstance(node, dict):
                return {
                    k: walk(v) for k, v in node.items() if k not in exclude
                }
            if isinstance(node, list):
                return [walk(x) for x in node]
            if isinstance(node, str):
                return re.sub("\t+", "", node).strip()
            return node

        return s.map(
            lambda x: None
            if x is None
            else json.dumps(walk(json.loads(x)), sort_keys=True)
        )

    return df.withColumn(json_col, _excl(F.col(json_col)))
