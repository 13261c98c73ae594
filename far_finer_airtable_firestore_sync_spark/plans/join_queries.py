"""Driver-contract entries: temporal joins + permissive datetime parse.

The as-of oracle uses DuckDB's native ASOF JOIN — an independent
implementation of the same semantics, which makes it a strong check on
the union-sort-window formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from far_finer_airtable_firestore_sync_spark.operators import joins
from far_finer_airtable_firestore_sync_spark.plans.agg_queries import read_events


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's latest signup at-or-before
    its timestamp (classic event->state enrichment)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = read_events(spark, sf_dir)
    purchases = ev.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts", "value"
    )
    signups = ev.filter("event_type = 'signup'").select(
        "user_id",
        F.col("ts").alias("signup_ts"),
        F.col("event_id").alias("signup_event"),
    )
    return joins.asof_join(
        purchases, signups, on="user_id", left_ts="ts", right_ts="signup_ts"
    )


ASOF_JOIN_SQL = """
with purchases as (
  select event_id, user_id, ts, value from events where event_type = 'purchase'
),
signups as (
  select user_id, ts as signup_ts, event_id as signup_event
  from events where event_type = 'signup'
)
select p.event_id, p.user_id, p.ts, p.value, s.signup_ts, s.signup_event
from purchases p
asof left join signups s
  on p.user_id = s.user_id and s.signup_ts <= p.ts
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click events within 1 hour AFTER each purchase, same user."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = read_events(spark, sf_dir)
    purchases = ev.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter("event_type = 'click'").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    return joins.range_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        lower_us=0,
        upper_us=3_600_000_000,
    )


RANGE_JOIN_SQL = """
with purchases as (
  select event_id, user_id, ts from events where event_type = 'purchase'
),
clicks as (
  select user_id, event_id as click_id, ts as click_ts
  from events where event_type = 'click'
)
select p.event_id, p.user_id, p.ts, c.click_id as r_click_id,
       c.click_ts as r_click_ts
from purchases p join clicks c
  on p.user_id = c.user_id
 and epoch_us(c.click_ts) - epoch_us(p.ts) between 0 and 3600000000
"""

#: (spark pattern, duckdb pattern) pairs for the permissive parser
_DT_FORMATS = [
    ("yyyy-MM-dd HH:mm:ss", "%Y-%m-%d %H:%M:%S"),
    ("MM/dd/yyyy HH:mm:ss", "%m/%d/%Y %H:%M:%S"),
    ("dd.MM.yyyy", "%d.%m.%Y"),
    ("yyyy-MM-dd", "%Y-%m-%d"),
]


#: cheap shape tests that pick the right format without paying the
#: failed-parse path of a try_to_timestamp chain (~5x faster: parse
#: exceptions are expensive, regex prefilters are codegen'd)
_DT_SHAPES = [
    ("^[0-9]{4}-[0-9]{2}-[0-9]{2} ", "yyyy-MM-dd HH:mm:ss"),
    ("^[0-9]{2}/[0-9]{2}/[0-9]{4} ", "MM/dd/yyyy HH:mm:ss"),
    ("^[0-9]{2}[.][0-9]{2}[.][0-9]{4}$", "dd.MM.yyyy"),
    ("^[0-9]{4}-[0-9]{2}-[0-9]{2}$", "yyyy-MM-dd"),
]


def parse_datetime_any(col: str) -> str:
    """D5 parity (lib/DataProcessor.py:142-148): permissive multi-format
    datetime parse — the declarative analog of dateutil's fallback
    chain. Regex shape-dispatch to the matching format first (fast
    path, no parse exceptions), then a try_to_timestamp chain for
    anything the shapes miss."""
    shaped = " ".join(
        f"when {col} rlike '{rx}' then try_to_timestamp({col}, '{fmt}')"
        for rx, fmt in _DT_SHAPES
    )
    attempts = ", ".join(
        f"try_to_timestamp({col}, '{sp}')" for sp, _ in _DT_FORMATS
    )
    return f"coalesce(case {shaped} end, {attempts})"


def parse_datetime_any_duckdb(col: str) -> str:
    attempts = ", ".join(
        f"try_strptime({col}, '{du}')" for _, du in _DT_FORMATS
    )
    return f"coalesce({attempts})"


def q_datetime_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: format timestamps four different ways by key, parse
    them all back with the permissive parser."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    varied = orders.select(
        "o_orderkey",
        F.expr(
            "case cast(o_orderkey % 4 as int) "
            "when 0 then date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') "
            "when 1 then date_format(o_orderdate, 'MM/dd/yyyy HH:mm:ss') "
            "when 2 then date_format(o_orderdate, 'dd.MM.yyyy') "
            "else date_format(o_orderdate, 'yyyy-MM-dd') end"
        ).alias("raw"),
    )
    return varied.select(
        "o_orderkey", "raw", F.expr(parse_datetime_any("raw")).alias("parsed")
    )


def datetime_parse_oracle() -> str:
    return f"""
with varied as (
  select o_orderkey,
    case cast(o_orderkey % 4 as int)
      when 0 then strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
      when 1 then strftime(o_orderdate, '%m/%d/%Y %H:%M:%S')
      when 2 then strftime(o_orderdate, '%d.%m.%Y')
      else strftime(o_orderdate, '%Y-%m-%d') end as raw
  from orders
)
select o_orderkey, raw, {parse_datetime_any_duckdb("raw")} as parsed from varied
"""


JOIN_QUERIES = {
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "datetime_parse_multi": q_datetime_parse,
}

JOIN_ORACLES = {
    "asof_join": ASOF_JOIN_SQL,
    "range_join": RANGE_JOIN_SQL,
    "datetime_parse_multi": datetime_parse_oracle(),
}
