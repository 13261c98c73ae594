"""Strategy test scenarios over the driver's fixture tables, in BOTH
dialects.

The driver's correctness gate runs each ``queries()`` entry (PySpark)
against an ``oracle_sql()`` entry (DuckDB) on the same parquet tables.
Strategies need a (source batch S, target pre-state T) pair, so this
module derives both **deterministically from the ``customer`` table**
with modular-arithmetic row classes:

- T (pre-state)  = customers with ``c_custkey % 3 <> 0``; rows with
  ``c_custkey % 7 == 0`` have a perturbed ``c_acctbal`` (checksum
  drift), rows with ``c_custkey % 11 == 0`` are soft-deleted;
- S (batch)      = customers with ``c_custkey % 5 <> 0``.

That yields every row class the strategies branch on: unchanged,
changed, source-only (insert), target-only (delete/tombstone), and
soft-deleted-resurrect. The same derivation is emitted as Spark
DataFrame ops and as DuckDB CTE SQL so both engines compute identical
inputs — and therefore identical post-states.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from far_finer_airtable_firestore_sync_spark.config import SyncSpec, UpdateType
from far_finer_airtable_firestore_sync_spark.functions.canonical import (
    DUCKDB,
    Field,
    checksum_sql,
)

CUSTOMER_FIELDS = (
    Field("c_custkey", "long"),
    Field("c_name", "string"),
    Field("c_nationkey", "int"),
    Field("c_acctbal", "double"),
    Field("c_mktsegment", "string"),
)

PRE_TS = datetime(2020, 6, 1, 12, 0, 0)
RUN_TS = datetime(2026, 1, 1, 0, 0, 0)
RUN_VERSION = 100
PRE_VERSION = 7


def spec_for(update_type: UpdateType) -> SyncSpec:
    return SyncSpec(
        primary_key="c_custkey",
        update_type=update_type,
        payload_fields=CUSTOMER_FIELDS,
        table_name="customer",
        view_name="sync_view",
        run_ts=RUN_TS,
        version_id=RUN_VERSION,
    )


def read_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/customer.parquet")


def source_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S: the incoming batch (payload columns only)."""
    return read_customer(spark, sf_dir).filter("c_custkey % 5 <> 0")


def target_prestate(
    spark: SparkSession,
    sf_dir: str,
    update_type: UpdateType,
    with_version: bool = True,
    with_latest: bool = False,
    with_is_deleted: bool = False,
    with_history: bool = False,
) -> DataFrame:
    """T: simulated pre-existing target state with engine columns.

    ``with_history`` adds an older version row (version_id=3,
    latest=false, drifted payload) for keys with ``c_custkey % 13 == 0``
    — multi-version keys for the VERSIONED_* latest-resolution path.
    """
    df = (
        read_customer(spark, sf_dir)
        .filter("c_custkey % 3 <> 0")
        .withColumn(
            "c_acctbal",
            F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 1.0).otherwise(
                F.col("c_acctbal")
            ),
        )
        .withColumns(
            {
                "doc_id": F.md5(F.concat(F.lit("doc:"), F.col("c_custkey").cast("string"))),
                "update_type": F.lit(update_type.value),
                "write_timestamp": F.lit(PRE_TS).cast("timestamp"),
            }
        )
    )
    if with_version:
        df = df.withColumn("version_id", F.lit(PRE_VERSION).cast("bigint"))
    if with_latest:
        df = df.withColumn("latest", F.lit(True))
    if with_is_deleted:
        df = df.withColumn("is_deleted", F.col("c_custkey") % 11 == 0)
    if with_history:
        hist = (
            read_customer(spark, sf_dir)
            .filter("c_custkey % 3 <> 0 and c_custkey % 13 = 0")
            .withColumn("c_acctbal", F.col("c_acctbal") + 5.0)
            .withColumns(
                {
                    "doc_id": F.md5(
                        F.concat(F.lit("doc0:"), F.col("c_custkey").cast("string"))
                    ),
                    "update_type": F.lit(update_type.value),
                    "write_timestamp": F.lit(PRE_TS).cast("timestamp"),
                    "version_id": F.lit(3).cast("bigint"),
                }
            )
        )
        if with_latest:
            hist = hist.withColumn("latest", F.lit(False))
        if with_is_deleted:
            hist = hist.withColumn("is_deleted", F.lit(False))
        df = df.unionByName(hist)
    return df


# -- DuckDB-side CTE bodies (identical derivations) -------------------------

S_SQL = (
    "select c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment "
    "from customer where c_custkey % 5 <> 0"
)


def t_sql(
    update_type: UpdateType,
    with_version: bool = True,
    with_latest: bool = False,
    with_is_deleted: bool = False,
    with_history: bool = False,
) -> str:
    cols = [
        "c_custkey",
        "c_name",
        "c_nationkey",
        "case when c_custkey % 7 = 0 then c_acctbal + 1.0 else c_acctbal end as c_acctbal",
        "c_mktsegment",
        "md5('doc:' || cast(c_custkey as string)) as doc_id",
        f"'{update_type.value}' as update_type",
        f"timestamp '{PRE_TS:%Y-%m-%d %H:%M:%S}' as write_timestamp",
    ]
    if with_version:
        cols.append(f"cast({PRE_VERSION} as bigint) as version_id")
    if with_latest:
        cols.append("true as latest")
    if with_is_deleted:
        cols.append("(c_custkey % 11 = 0) as is_deleted")
    base = f"select {', '.join(cols)} from customer where c_custkey % 3 <> 0"
    if not with_history:
        return base
    hcols = [
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal + 5.0 as c_acctbal",
        "c_mktsegment",
        "md5('doc0:' || cast(c_custkey as string)) as doc_id",
        f"'{update_type.value}' as update_type",
        f"timestamp '{PRE_TS:%Y-%m-%d %H:%M:%S}' as write_timestamp",
        "cast(3 as bigint) as version_id",
    ]
    if with_latest:
        hcols.append("false as latest")
    if with_is_deleted:
        hcols.append("false as is_deleted")
    hist = (
        f"select {', '.join(hcols)} from customer "
        "where c_custkey % 3 <> 0 and c_custkey % 13 = 0"
    )
    return f"{base} union all {hist}"


def duck_cs(prefix: str = "") -> str:
    """DuckDB checksum expression over the customer payload fields."""
    return checksum_sql(CUSTOMER_FIELDS, DUCKDB, col_prefix=prefix)


PAYLOAD_COLS = "c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment"
RUN_TS_SQL = f"timestamp '{RUN_TS:%Y-%m-%d %H:%M:%S}'"


def new_doc_id_sql(update_type: UpdateType, pk_expr: str = "c_custkey") -> str:
    return (
        f"md5('ins:{update_type.value}:' || cast({pk_expr} as string) || ':{RUN_VERSION}')"
    )


# -- table-as-one-document prestates (M9/M10) --------------------------------

TABLE_DOC_SCHEMA = (
    "doc_id string, update_type string, write_timestamp timestamp, "
    "version_id bigint, table_checksum string, table_data string, "
    "metadata_name string, metadata_view string, latest boolean"
)


def table_doc_prestate(
    spark: SparkSession, update_type: UpdateType, keyed_by_name: bool
) -> DataFrame:
    """T for the table strategies: two stored versions (M9) or one
    named doc plus an unrelated doc (M10)."""
    if keyed_by_name:
        rows = [
            ("customer", update_type.value, PRE_TS, 7, "oldcs-1", "{}",
             "customer", "sync_view", None),
            ("othertable", update_type.value, PRE_TS, 7, "othercs", "{}",
             "othertable", "sync_view", None),
        ]
    else:
        rows = [
            ("tdoc1", update_type.value, PRE_TS, 7, "oldcs-1", "{}",
             "customer", "sync_view", True),
            ("tdoc0", update_type.value, PRE_TS, 3, "oldcs-0", "{}",
             "customer", "sync_view", False),
        ]
    df = spark.createDataFrame(rows, TABLE_DOC_SCHEMA)
    return df.drop("latest") if keyed_by_name else df


def table_doc_prestate_sql(update_type: UpdateType, keyed_by_name: bool) -> str:
    ts = f"timestamp '{PRE_TS:%Y-%m-%d %H:%M:%S}'"
    u = update_type.value
    if keyed_by_name:
        vals = (
            f"('customer','{u}',{ts},cast(7 as bigint),'oldcs-1','{{}}','customer','sync_view'),"
            f"('othertable','{u}',{ts},cast(7 as bigint),'othercs','{{}}','othertable','sync_view')"
        )
        cols = ("doc_id,update_type,write_timestamp,version_id,table_checksum,"
                "table_data,metadata_name,metadata_view")
    else:
        vals = (
            f"('tdoc1','{u}',{ts},cast(7 as bigint),'oldcs-1','{{}}','customer','sync_view',true),"
            f"('tdoc0','{u}',{ts},cast(3 as bigint),'oldcs-0','{{}}','customer','sync_view',false)"
        )
        cols = ("doc_id,update_type,write_timestamp,version_id,table_checksum,"
                "table_data,metadata_name,metadata_view,latest")
    return f"select * from (values {vals}) as t({cols})"
