"""Driver-contract entries: temporal joins + permissive datetime parse.

The as-of oracle uses DuckDB's native ASOF JOIN — an independent
implementation of the same semantics, which makes it a strong check on
the union-sort-window formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from far_finer_airtable_firestore_sync_spark.operators import joins
from far_finer_airtable_firestore_sync_spark.plans.agg_queries import (
    _utc as _utc_tz,
)
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

#: (spark pattern, duckdb pattern, has_tz_offset) for the permissive
#: parser. Strings are pre-normalized (ISO 'T' separator -> space,
#: trailing 'Z' -> '+00:00', fraction right-padded/truncated to exactly
#: 6 digits) so one 'yyyy-MM-dd HH:mm:ss...' family covers Airtable's
#: own emission format 2024-12-23T10:00:00.000Z (reference accepts it
#: via dateutil, lib/DataProcessor.py:142-148). The fraction width is
#: pinned to 6 because the engines disagree off the 3/6-digit shapes:
#: Spark parses '.N+' as a decimal fraction of a second while DuckDB
#: %g is integer milliseconds and %f integer microseconds — they agree
#: only at exactly 3 (%g) and exactly 6 (%f) digits. Normalizing every
#: fraction to 6 digits makes any ISO width 1-9 parse to the same
#: microsecond value in both engines (dateutil-style truncation >6).
#: Optional 4th element: a DuckDB-side shape guard regex. Spark's
#: ``yyyy`` requires >= 4 digits while C-style ``%Y`` happily reads
#: ``99`` as year 0099 — the guard pins the DuckDB twin to the shapes
#: Spark accepts so a two-digit-year string parses in NEITHER engine
#: (dateutil's 50-year-window guess for those is not reproducible
#: cross-engine; documented residual, DIVERGENCES #12).
_DT_FORMATS = [
    ("yyyy-MM-dd HH:mm:ss.SSSSSSXXX", "%Y-%m-%d %H:%M:%S.%f%z", True),
    ("yyyy-MM-dd HH:mm:ssXXX", "%Y-%m-%d %H:%M:%S%z", True),
    ("yyyy-MM-dd HH:mm:ss.SSSSSS", "%Y-%m-%d %H:%M:%S.%f", False),
    ("yyyy-MM-dd HH:mm:ss", "%Y-%m-%d %H:%M:%S", False),
    ("MM/dd/yyyy HH:mm:ss", "%m/%d/%Y %H:%M:%S"),
    ("dd.MM.yyyy", "%d.%m.%Y"),
    ("yyyy-MM-dd", "%Y-%m-%d"),
    ("yyyy/MM/dd", "%Y/%m/%d"),
    ("MMM dd, yyyy", "%b %d, %Y"),
    ("dd MMM yyyy", "%d %b %Y"),
    # dateutil-grammar widening (coverage fuzz, tests/test_dateutil_
    # coverage.py): month names both widths, US dash/bare-slash dates,
    # 12-hour clock, compact/dotted ISO.
    ("MM/dd/yyyy hh:mm a", "%m/%d/%Y %I:%M %p", False,
     "^[0-9]{2}/[0-9]{2}/[0-9]{4} "),
    ("MM/dd/yyyy", "%m/%d/%Y", False, "^[0-9]{2}/[0-9]{2}/[0-9]{4}$"),
    ("MM-dd-yyyy", "%m-%d-%Y", False, "^[0-9]{2}-[0-9]{2}-[0-9]{4}$"),
    ("MMM dd yyyy", "%b %d %Y"),
    ("MMMM dd, yyyy", "%B %d, %Y"),
    ("dd MMMM yyyy", "%d %B %Y"),
    ("yyyy.MM.dd", "%Y.%m.%d"),
    ("yyyyMMdd", "%Y%m%d"),
]


#: Shape dispatch lives inline in parse_datetime_any: post-normalization
#: the ISO family is discriminated by LENGTH alone and the other shapes
#: by one separator character, so no regex prefilter list is needed.

#: ISO normalization: 'T' date/time separator -> space; trailing 'Z'
#: -> '+00:00' (DuckDB strptime %z rejects a literal Z); second
#: fraction truncated then right-padded to exactly 6 digits so both
#: engines read it with identical (decimal, microsecond) semantics.
#: Group ref is $1 in Spark but \1 in DuckDB — built with chr(92) to
#: keep the generated SQL free of backslash literals (dialect parsing
#: differs). The padding replacement '$10$2' / '\10\2' is parsed as
#: group-1 + literal '0' + group-2 in both engines (neither has a
#: group 10); the seconds-colon anchor keeps it off dd.MM.yyyy dates.
def _dt_normalize(col: str, dialect: str) -> str:
    if dialect == "spark":
        group, pad = "'$1 '", "'$10$2'"
        trunc = "'$1'"
    else:
        bs = "chr(92)"
        group = f"{bs} || '1 '"
        pad = f"{bs} || '10' || {bs} || '2'"
        trunc = f"{bs} || '1'"
    t_fixed = (
        f"regexp_replace({col}, '^([0-9]{{4}}-[0-9]{{2}}-[0-9]{{2}})T', {group})"
    )
    z_fixed = f"regexp_replace({t_fixed}, 'Z$', '+00:00')"
    f_trunc = (
        f"regexp_replace({z_fixed}, '(:[0-9]{{2}}[.][0-9]{{6}})[0-9]+', {trunc})"
    )
    pad_pat = "(:[0-9]{2}[.][0-9]{1,5})([+-][0-9]{2}:[0-9]{2})?$"
    out = f_trunc
    for _ in range(5):
        out = f"regexp_replace({out}, '{pad_pat}', {pad})"
    # Fast-path gate: every normalization rule triggers on a 'T'
    # separator, a trailing 'Z', or a '.'+digit fraction — strings with
    # none of those are provably unchanged by the 8 regex passes above,
    # so one cheap test skips them (most real shapes: plain dates,
    # space-separated timestamps, bare offsets). False positives (e.g.
    # an uppercase month containing 'T') just take the full path and
    # come out unchanged — the gate can only skip provably-identity
    # inputs, never alter a result.
    gate_rx = "[TZ]|[.][0-9]"
    if dialect == "spark":
        test = f"{col} rlike '{gate_rx}'"
    else:
        test = f"regexp_matches({col}, '{gate_rx}')"
    return f"case when {test} then {out} else {col} end"


def parse_datetime_any(col: str, pre_normalized: bool = False) -> str:
    """D5 parity (lib/DataProcessor.py:142-148): permissive multi-format
    datetime parse — the declarative analog of dateutil's fallback
    chain, covering the source system's own ISO-8601 emission (T
    separator, millisecond fraction, Z/±HH:MM offset; offsets are
    converted to UTC wall-clock via the UTC-pinned session). Regex
    shape-dispatch to the matching format first (fast path, no parse
    exceptions), then a try_to_timestamp chain for anything the shapes
    miss.

    The ISO normalization is referenced by every shape/format branch;
    a plain SQL expression cannot bind a local, so by default it is
    inlined ~18x. Hot paths can project it ONCE
    (``withColumn(c, F.expr(normalize_datetime_string(c)))``) and call
    with ``pre_normalized=True`` — a modest win (the parse attempts
    dominate; CASE short-circuits most normalization copies anyway)."""
    norm = _dt_normalize(col, "spark")
    # Constant-time dispatch: after normalization the ISO family has a
    # unique LENGTH per shape (fraction pinned to 6 digits, offset to
    # +HH:MM), and the non-ISO shapes are separated by one separator
    # char — so the happy path costs two substr + one length + one
    # try_to_timestamp, zero regex. A mis-dispatched string parses to
    # NULL and falls through to the full format chain below, so the
    # dispatch can only speed up, never change, the result.
    shaped = (
        "case substr(_dt, 3, 1) "
        "when '/' then case length(_dt) "
        "when 10 then try_to_timestamp(_dt, 'MM/dd/yyyy') "
        "else try_to_timestamp(_dt, 'MM/dd/yyyy HH:mm:ss') end "
        "when '.' then try_to_timestamp(_dt, 'dd.MM.yyyy') "
        "when ' ' then try_to_timestamp(_dt, 'dd MMM yyyy') "
        "else case substr(_dt, 5, 1) "
        "when '-' then case length(_dt) "
        "when 10 then try_to_timestamp(_dt, 'yyyy-MM-dd') "
        "when 19 then try_to_timestamp(_dt, 'yyyy-MM-dd HH:mm:ss') "
        "when 26 then try_to_timestamp(_dt, 'yyyy-MM-dd HH:mm:ss.SSSSSS') "
        "when 25 then try_to_timestamp(_dt, 'yyyy-MM-dd HH:mm:ssXXX') "
        "when 32 then try_to_timestamp(_dt, 'yyyy-MM-dd HH:mm:ss.SSSSSSXXX') "
        "end "
        "when '/' then try_to_timestamp(_dt, 'yyyy/MM/dd') "
        "else try_to_timestamp(_dt, 'MMM dd, yyyy') "
        "end end"
    )
    attempts = ", ".join(
        f"try_to_timestamp(_dt, '{f[0]}')" for f in _DT_FORMATS
    )
    chain = f"coalesce({shaped}, {attempts})"
    return chain.replace("_dt", f"`{col}`" if pre_normalized else f"({norm})")


def normalize_datetime_string(col: str, dialect: str = "spark") -> str:
    """Public form of the ISO normalization for pre-projection."""
    return _dt_normalize(col, dialect)


def parse_datetime_any_duckdb(col: str) -> str:
    norm = _dt_normalize(col, "duckdb")
    attempts = []
    for f in _DT_FORMATS:
        du, tz = f[1], (f[2] if len(f) > 2 else False)
        guard = f[3] if len(f) > 3 else None
        e = f"try_strptime(({norm}), '{du}')"
        if tz:
            # %z yields TIMESTAMPTZ; render as UTC wall-clock TIMESTAMP
            # (session-timezone independent) to match Spark.
            e = f"({e} at time zone 'UTC')"
        if guard:
            e = (
                f"(case when regexp_matches(({norm}), '{guard}')"
                f" then {e} end)"
            )
        attempts.append(e)
    return f"coalesce({', '.join(attempts)})"


def q_datetime_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: format timestamps nine different ways by key —
    including the source system's own ISO-8601 emission shapes
    (``2024-12-23T10:00:00.000Z``, explicit ``+05:30`` offset),
    month-name forms both ways, and slash dates — and parse them all
    back with the permissive parser."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    varied = orders.select(
        "o_orderkey",
        F.expr(
            "case cast(o_orderkey % 9 as int) "
            "when 0 then date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') "
            "when 1 then date_format(o_orderdate, 'MM/dd/yyyy HH:mm:ss') "
            "when 2 then date_format(o_orderdate, 'dd.MM.yyyy') "
            "when 3 then date_format(o_orderdate, 'yyyy-MM-dd') "
            "when 4 then date_format(o_orderdate, \"yyyy-MM-dd'T'HH:mm:ss.SSS\") || 'Z' "
            "when 5 then date_format(o_orderdate, \"yyyy-MM-dd'T'HH:mm:ss\") || '+05:30' "
            "when 6 then date_format(o_orderdate, 'yyyy/MM/dd') "
            "when 7 then date_format(o_orderdate, 'dd MMM yyyy') "
            "else date_format(o_orderdate, 'MMM dd, yyyy') end"
        ).alias("raw"),
    )
    return (
        varied.withColumn(
            "_norm", F.expr(normalize_datetime_string("raw"))
        )
        .select(
            "o_orderkey",
            "raw",
            F.expr(parse_datetime_any("_norm", pre_normalized=True)).alias(
                "parsed"
            ),
        )
    )


def datetime_parse_oracle() -> str:
    return f"""
with varied as (
  select o_orderkey,
    case cast(o_orderkey % 9 as int)
      when 0 then strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
      when 1 then strftime(o_orderdate, '%m/%d/%Y %H:%M:%S')
      when 2 then strftime(o_orderdate, '%d.%m.%Y')
      when 3 then strftime(o_orderdate, '%Y-%m-%d')
      when 4 then strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%g') || 'Z'
      when 5 then strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') || '+05:30'
      when 6 then strftime(o_orderdate, '%Y/%m/%d')
      when 7 then strftime(o_orderdate, '%d %b %Y')
      else strftime(o_orderdate, '%b %d, %Y') end as raw
  from orders
)
select o_orderkey, raw, {parse_datetime_any_duckdb("raw")} as parsed from varied
"""


def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: materialize a change
    log into validity intervals — valid_from/valid_to half-open
    ranges plus an is_current flag. This is the interval form of what
    the VERSIONED sync strategies keep as row history
    (`lib/UpdateStrategies.py` VERSIONED/VERSIONED_SET in the
    reference): the shape a warehouse dimension consumer reads.

    Orders stand in as the change log (pk=o_custkey, change
    ts=o_orderdate, version key=o_orderkey). Per-timestamp ties keep
    the highest version key (deterministic, the keep-latest rule).
    Both window passes share one (pk, ts) sort — a single shuffle."""
    _utc_tz(spark)
    from pyspark.sql import Window

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    v = orders.select(
        F.col("o_custkey").alias("pk"),
        F.col("o_orderdate").alias("valid_from"),
        F.col("o_orderkey").alias("version_key"),
        F.col("o_totalprice").alias("attr_price"),
        F.col("o_orderpriority").alias("attr_priority"),
    )
    tie = Window.partitionBy("pk", "valid_from").orderBy(
        F.col("version_key").desc()
    )
    dedup = (
        v.withColumn("_rn", F.row_number().over(tie))
        .filter("_rn = 1")
        .drop("_rn")
    )
    seqw = Window.partitionBy("pk").orderBy("valid_from", "version_key")
    nxt = F.lead("valid_from").over(seqw)
    return dedup.select(
        "pk",
        "version_key",
        "valid_from",
        nxt.alias("valid_to"),
        "attr_price",
        "attr_priority",
        nxt.isNull().alias("is_current"),
    )


SCD2_SQL = """
with dedup as (
  select * from (
    select o_custkey as pk, o_orderdate as valid_from,
           o_orderkey as version_key,
           o_totalprice as attr_price, o_orderpriority as attr_priority,
           row_number() over (
             partition by o_custkey, o_orderdate order by o_orderkey desc
           ) as rn
    from orders
  ) where rn = 1
)
select pk, version_key, valid_from,
       lead(valid_from) over (
         partition by pk order by valid_from, version_key
       ) as valid_to,
       attr_price, attr_priority,
       lead(valid_from) over (
         partition by pk order by valid_from, version_key
       ) is null as is_current
from dedup
"""


JOIN_QUERIES = {
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "datetime_parse_multi": q_datetime_parse,
    "scd2_build": q_scd2_build,
}

JOIN_ORACLES = {
    "asof_join": ASOF_JOIN_SQL,
    "range_join": RANGE_JOIN_SQL,
    "datetime_parse_multi": datetime_parse_oracle(),
    "scd2_build": SCD2_SQL,
}
