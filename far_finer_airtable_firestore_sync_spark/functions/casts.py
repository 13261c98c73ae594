"""Typed projection against a field-type catalog (P1/P2 parity).

Reference: ``DataProcessor.process_data`` /
``_convert_value_to_firestore_type`` (lib/DataProcessor.py:17-63)
convert each field of each record per an Airtable-type catalog, with
unknown fields defaulting to string (lib/DataProcessor.py:31) and NULL
short-circuiting (:42-43).

Here the whole projection is ONE ``select`` of cast expressions —
columnar, codegen'd, null-preserving by construction. A dual-dialect
emitter exists so DuckDB oracles can reproduce the projection exactly.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from far_finer_airtable_firestore_sync_spark.functions.canonical import DUCKDB, SPARK

#: Airtable field type -> canonical Field kind after conversion.
CONVERTED_KIND = {
    "singleLineText": "string",
    "multilineText": "string",
    "number": "double",
    "checkbox": "boolean",
    "date": "date",
    "dateTime": "timestamp",
    "multipleAttachments": "array<string>",
    "multipleSelects": "array<string>",
}


def convert_sql(col_ref: str, airtable_type: str, dialect: str = SPARK) -> str:
    """SQL expression converting one column per its Airtable type.

    Conversion table parity: lib/DataProcessor.py:44-63. Unknown types
    pass through unchanged (:62-63); *missing from catalog* is handled
    by the caller defaulting to ``singleLineText`` (:31).
    """
    if airtable_type in ("singleLineText", "multilineText"):
        return f"cast({col_ref} as string)"
    if airtable_type == "number":
        # Always double, never int/decimal (lib/DataProcessor.py:46-47).
        return f"cast({col_ref} as double)"
    if airtable_type == "checkbox":
        return f"cast({col_ref} as boolean)"
    if airtable_type == "date":
        # Permissive string parse -> date (lib/DataProcessor.py:50-53).
        if dialect == SPARK:
            return f"to_date(cast({col_ref} as string))"
        return f"cast(cast({col_ref} as string) as date)"
    if airtable_type == "dateTime":
        if dialect == SPARK:
            return f"to_timestamp(cast({col_ref} as string))"
        return f"cast(cast({col_ref} as string) as timestamp)"
    if airtable_type == "multipleAttachments":
        # Keep only each attachment's url (lib/DataProcessor.py:58-59).
        fn = "transform" if dialect == SPARK else "list_transform"
        return f"{fn}({col_ref}, a -> cast(a.url as string))"
    if airtable_type == "multipleSelects":
        fn = "transform" if dialect == SPARK else "list_transform"
        return f"{fn}({col_ref}, x -> cast(x as string))"
    # Unsupported type: passthrough (lib/DataProcessor.py:62-63).
    return col_ref


def typed_projection(df: DataFrame, catalog: Mapping[str, str]) -> DataFrame:
    """Project every column of ``df`` through the catalog's conversions.

    Columns absent from the catalog default to string
    (lib/DataProcessor.py:31). Output column order = input order.
    """
    exprs: list[Column] = []
    for name in df.columns:
        at_type = catalog.get(name, "singleLineText")
        exprs.append(F.expr(convert_sql(f"`{name}`", at_type, SPARK)).alias(name))
    return df.select(*exprs)


def typed_projection_sql(
    columns: list[str],
    catalog: Mapping[str, str],
    relation: str,
    dialect: str = DUCKDB,
) -> str:
    """Equivalent SQL text of :func:`typed_projection` for the oracle."""
    parts = []
    q = "`" if dialect == SPARK else '"'
    for name in columns:
        at_type = catalog.get(name, "singleLineText")
        parts.append(f"{convert_sql(q + name + q, at_type, dialect)} as {q}{name}{q}")
    return f"select {', '.join(parts)} from {relation}"
