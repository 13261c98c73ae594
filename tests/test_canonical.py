"""Checksum canonicalization: Spark vs DuckDB bit-parity, edge cases.

This is SURVEY.md §7 hard-part #1 — the whole oracle gate rests on the
canonical string being identical across engines.
"""

import duckdb
import pytest

from far_finer_airtable_firestore_sync_spark.functions.canonical import (
    DUCKDB,
    SPARK,
    Field,
    canonical_row_sql,
    checksum_sql,
    table_checksum_sql,
    table_json_sql,
)

FIELDS = [
    Field("name", "string"),
    Field("score", "double"),
    Field("n", "long"),
    Field("active", "boolean"),
    Field("d", "date"),
    Field("ts", "timestamp"),
    Field("tags", "array<string>"),
]

ROWS_SQL = """
select * from (values
  ('plain', 1.5, 42, true, date '2024-01-31', timestamp '2024-01-31 10:20:30.123456', null),
  ('quote " and \t tab', -0.000001, 0, false, null, null, null),
  (null, null, null, null, null, null, null),
  ('neg', -123456.789, -7, true, date '1970-01-01', timestamp '1999-12-31 23:59:59', null)
) as t(name, score, n, active, d, ts, tags)
"""


def _spark_rows(spark, sql):
    return [tuple(r) for r in spark.sql(sql).collect()]


def test_scalar_parity(spark):
    scalar_fields = [f for f in FIELDS if f.name != "tags"]
    s = _spark_rows(
        spark,
        f"select {canonical_row_sql(scalar_fields, SPARK)} as c, "
        f"{checksum_sql(scalar_fields, SPARK)} as cs from ({ROWS_SQL})",
    )
    d = duckdb.sql(
        f"select {canonical_row_sql(scalar_fields, DUCKDB)} as c, "
        f"{checksum_sql(scalar_fields, DUCKDB)} as cs from ({ROWS_SQL})"
    ).fetchall()
    assert s == [tuple(r) for r in d]
    # sanity: canonical text is a JSON-shaped object with sorted keys
    assert s[0][0].startswith('{"active":true,"d":"2024-01-31"')


def test_null_row_canonicalizes_to_nulls(spark):
    scalar_fields = [f for f in FIELDS if f.name != "tags"]
    rows = _spark_rows(
        spark,
        f"select {canonical_row_sql(scalar_fields, SPARK)} as c from ({ROWS_SQL}) where name is null",
    )
    assert rows[0][0] == '{"active":null,"d":null,"n":null,"name":null,"score":null,"ts":null}'


def test_array_parity(spark):
    arr_sql = """
    select * from (values
      (1, array('a','b"c')),
      (2, array()),
      (3, null)
    ) as t(id, tags)
    """
    duck_sql = """
    select * from (values
      (1, ['a','b"c']),
      (2, []),
      (3, null)
    ) as t(id, tags)
    """
    fields = [Field("id", "long"), Field("tags", "array<string>")]
    s = _spark_rows(
        spark, f"select {canonical_row_sql(fields, SPARK)} as c from ({arr_sql})"
    )
    d = duckdb.sql(
        f"select {canonical_row_sql(fields, DUCKDB)} as c from ({duck_sql})"
    ).fetchall()
    assert s == [tuple(r) for r in d]
    assert s[1][0] == '{"id":2,"tags":[]}'
    assert s[2][0] == '{"id":3,"tags":null}'


def test_checksum_is_order_insensitive_to_field_spec(spark):
    """Keys are emitted sorted regardless of the field-spec order
    (parity: reference sorts keys, lib/DataProcessor.py:111)."""
    f1 = [Field("a", "long"), Field("b", "string")]
    f2 = [Field("b", "string"), Field("a", "long")]
    base = "select 1 as a, 'x' as b"
    r1 = _spark_rows(spark, f"select {checksum_sql(f1, SPARK)} c from ({base})")
    r2 = _spark_rows(spark, f"select {checksum_sql(f2, SPARK)} c from ({base})")
    assert r1 == r2


def test_table_checksum_parity_and_determinism(spark):
    fields = [Field("k", "long"), Field("v", "string")]
    spark_rel = "(select * from (values (2,'b'),(1,'a'),(10,'j')) as t(k, v))"
    tj_s = table_json_sql(fields, "k", SPARK, spark_rel)
    tj_d = table_json_sql(fields, "k", DUCKDB, spark_rel)
    s = _spark_rows(
        spark,
        f"select {tj_s} as j, {table_checksum_sql(tj_s, 'tbl', 'v1')} as c",
    )[0]
    d = duckdb.sql(
        f"select {tj_d} as j, {table_checksum_sql(tj_d, 'tbl', 'v1')} as c"
    ).fetchall()[0]
    assert s == tuple(d)
    # keys sorted as strings: "1" < "10" < "2"
    assert s[0] == (
        '{"1":{"k":1,"v":"a"},"10":{"k":10,"v":"j"},"2":{"k":2,"v":"b"}}'
    )
