"""CSV sink with priority-then-sorted column ordering (K8).

Reference: ``write_dict_to_csv`` (lib/utils.py:34-67): header = union
of keys across documents, priority fields first (in given order, only
if present), remaining fields sorted; missing values -> blank.

Spark-first: the column union is the frame's schema; ordering is a
``select``; the write is a distributed ``df.write.csv``. A
``single_file`` mode coalesces to one partition for small exports
(the reference's use case); leave False at scale.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame


def ordered_columns(
    columns: Sequence[str], priority_fields: Optional[Sequence[str]] = None
) -> list[str]:
    """Priority-then-sorted header order (lib/utils.py:48-56)."""
    cols = set(columns)
    if priority_fields:
        pri = [c for c in priority_fields if c in cols]
        rest = sorted(c for c in cols if c not in pri)
        return pri + rest
    return sorted(cols)


def write_csv(
    df: DataFrame,
    path: str,
    priority_fields: Optional[Sequence[str]] = None,
    single_file: bool = False,
) -> list[str]:
    """Write ``df`` as CSV with the reference's column ordering.

    Returns the ordered header for the caller's convenience.
    """
    order = ordered_columns(df.columns, priority_fields)
    out = df.select(*order)
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", True).csv(path)
    return order


def write_table_doc_csv(
    spark,
    table_json: str,
    path: str,
    priority_fields: Optional[Sequence[str]] = None,
) -> list[str]:
    """The reference's exact K8 use case: export a table-as-one-document
    JSON string (``{"pk": {field: value, ...}, ...}``) to CSV
    (lib/utils.py:34-67 consumes exactly this shape).

    Parsed driver-side by design — a table-doc is one row by contract
    (the reference also processes it in-process); the write itself is
    a normal distributed CSV write. Header = union of keys, priority
    fields first, rest sorted, missing values blank.
    """
    import json

    # strict=False: canonical table JSON leaves rare C0 control chars
    # unescaped (functions/canonical.py _json_escape) — accept them.
    data = json.loads(table_json, strict=False)
    if not data:
        return []
    fieldnames: set = set()
    for nested in data.values():
        fieldnames.update(nested.keys())
    order = ordered_columns(sorted(fieldnames), priority_fields)
    rows = [
        tuple(
            None if nested.get(c) is None else str(nested.get(c))
            for c in order
        )
        for nested in data.values()
    ]
    schema = ", ".join(f"`{c}` string" for c in order)
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
    return order
