"""Analytic query entries: aggregations, windows, sessionization,
streaming — the 'engine exposes Spark's native query power over synced
tables' half of SURVEY.md §2.7.

Float-sum determinism: every SUM over a double column goes through
``decimal`` (exact, order-independent) and is cast back to double at
the end — partition order in Spark and scan order in DuckDB then
cannot perturb the value (float addition is not associative; this is
the only way a distributed sum can hash-match a single-node oracle
bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from far_finer_airtable_firestore_sync_spark.operators._util import (
    next_seq as _next_seq,
)


from far_finer_airtable_firestore_sync_spark.operators._util import (
    scratch_dir as _scratch_dir,
)


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events with `ts` normalized to a session-TZ (UTC) timestamp.

    Fixture generations differ in the physical type of `ts`: NANOS
    parquet timestamps surface as int64 under ``nanosAsLong`` (convert
    at µs precision — `ts div 1000` truncates exactly like DuckDB's
    ns->µs narrowing), newer fixtures carry timestamp[us] which Spark
    reads as TIMESTAMP_NTZ (cast to TIMESTAMP; with the session TZ
    pinned to UTC the wall-clock value is preserved bit-for-bit)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", _ts_as_timestamp(dict(df.dtypes)["ts"]))


def _ts_as_timestamp(dtype: str):
    """Expression normalizing an events `ts` column of the given dtype
    to TimestampType (µs precision, UTC session TZ)."""
    if dtype == "bigint":  # nanos-as-long fixtures
        return F.expr("timestamp_micros(ts div 1000)")
    return F.col("ts").cast("timestamp")


def _utc(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


_DEC = "decimal(18,2)"


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: 2-key groupBy, 7 aggregates.

    Whole plan is scan -> partial hash agg -> exchange(2 keys) ->
    final agg; the shuffle carries one row per (flag, status) per
    partition.
    """
    _utc(spark)
    li = _read(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "1998-09-02"
    )
    qty = F.col("l_quantity").cast(_DEC)
    ep = F.col("l_extendedprice").cast(_DEC)
    disc = F.col("l_discount").cast(_DEC)
    tax = F.col("l_tax").cast(_DEC)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(ep).cast("double").alias("sum_base_price"),
            F.sum(ep * (F.lit(1).cast(_DEC) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(ep * (F.lit(1).cast(_DEC) - disc) * (F.lit(1).cast(_DEC) + tax))
            .cast("double")
            .alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(disc).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = f"""
select l_returnflag, l_linestatus,
  cast(sum(cast(l_quantity as {_DEC})) as double) as sum_qty,
  cast(sum(cast(l_extendedprice as {_DEC})) as double) as sum_base_price,
  cast(sum(cast(l_extendedprice as {_DEC}) * (cast(1 as {_DEC}) - cast(l_discount as {_DEC}))) as double) as sum_disc_price,
  cast(sum(cast(l_extendedprice as {_DEC}) * (cast(1 as {_DEC}) - cast(l_discount as {_DEC})) * (cast(1 as {_DEC}) + cast(l_tax as {_DEC}))) as double) as sum_charge,
  cast(sum(cast(l_quantity as {_DEC})) as double) / count(*) as avg_qty,
  cast(sum(cast(l_discount as {_DEC})) as double) / count(*) as avg_disc,
  count(*) as count_order
from lineitem
where l_shipdate <= timestamp '1998-09-02 00:00:00'
group by l_returnflag, l_linestatus
"""


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-table star join + group, pre-aggregated on the fact's join
    key: lineitem collapses to one decimal per order BEFORE joining
    (map-side partial agg; the shuffle carries |orders| skinny rows,
    not |lineitem| wide ones), which also turns count(distinct
    o_orderkey) into a plain count — no Expand/double shuffle.
    Measured ~20% faster than the naive join-then-distinct at sf0.1;
    the gap widens with fact size. nation (25 rows at every SF) is
    broadcast-hinted; customer is left to AQE (broadcastable at test
    SFs, not at 100 TB)."""
    _utc(spark)
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    rev = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC))
    )
    per_order = li.groupBy("l_orderkey").agg(F.sum(rev).alias("_rev"))
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(cust.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum("_rev").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


REVENUE_BY_NATION_SQL = f"""
select n_name,
  cast(sum(cast(l_extendedprice as {_DEC}) * (cast(1 as {_DEC}) - cast(l_discount as {_DEC}))) as double) as revenue,
  count(distinct o_orderkey) as n_orders
from lineitem
join orders on l_orderkey = o_orderkey
join customer on o_custkey = c_custkey
join nation on c_nationkey = n_nationkey
group by n_name
"""


def q_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by total price (window + filter)."""
    _utc(spark)
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        _read(spark, sf_dir, "orders")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


TOPK_ORDERS_SQL = """
select o_custkey, o_orderkey, o_totalprice, cast(rk as int) as rk from (
  select o_custkey, o_orderkey, o_totalprice,
         row_number() over (
           partition by o_custkey
           order by o_totalprice desc, o_orderkey asc
         ) as rk
  from orders
) where rk <= 3
"""


def q_events_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate over the event stream table
    (batch form; the streaming form is `streaming_window_agg`)."""
    _utc(spark)
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


EVENTS_WINDOW_SQL = f"""
select date_trunc('hour', ts) as window_start, event_type,
       count(*) as n_events,
       cast(sum(cast(value as {_DEC})) as double) as total_value,
       count(distinct user_id) as n_users
from events
group by 1, 2
"""


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + cumulative
    sum of session breaks, then per-session rollup. Two window passes
    over the same (user_id, ts) partitioning — one shuffle, reused.
    """
    _utc(spark)
    ev = read_events(spark, sf_dir)
    ev.createOrReplaceTempView("_ffs_events")
    return ev.sparkSession.sql(SESSIONIZATION_BODY.format(rel="_ffs_events"))


SESSIONIZATION_BODY = """
with marked as (
  select user_id, ts, event_id, value,
    case when unix_micros(ts) - lag(unix_micros(ts)) over (
           partition by user_id order by ts, event_id
         ) > 1800000000 then 1
         when lag(ts) over (partition by user_id order by ts, event_id) is null then 1
         else 0 end as is_start
  from {rel}
),
sessions as (
  select user_id, ts, event_id, value,
    sum(is_start) over (
      partition by user_id order by ts, event_id
      rows between unbounded preceding and current row
    ) as session_idx
  from marked
)
select user_id, cast(session_idx as bigint) as session_idx,
       count(*) as n_events,
       min(ts) as session_start, max(ts) as session_end,
       cast(sum(cast(value as decimal(18,2))) as double) as session_value
from sessions
group by user_id, session_idx
"""

SESSIONIZATION_SQL = SESSIONIZATION_BODY.replace(
    "unix_micros(ts)", "epoch_us(ts)"
).format(rel="events")


def q_rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-sets aggregate (subtotals + grand total)."""
    _utc(spark)
    li = _read(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


ROLLUP_SQL = f"""
select l_returnflag, l_linestatus,
       cast(sum(cast(l_quantity as {_DEC})) as double) as sum_qty,
       count(*) as n
from lineitem
group by rollup (l_returnflag, l_linestatus)
"""


def q_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts: status rows x priority columns."""
    _utc(spark)
    orders = _read(spark, sf_dir, "orders")
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    return (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", pris)
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderstatus",
            *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(f"n_{p[0]}") for p in pris],
        )
    )


PIVOT_SQL = """
select o_orderstatus,
  count(*) filter (where o_orderpriority = '1-URGENT') as n_1,
  count(*) filter (where o_orderpriority = '2-HIGH') as n_2,
  count(*) filter (where o_orderpriority = '3-MEDIUM') as n_3,
  count(*) filter (where o_orderpriority = '4-NOT SPECIFIED') as n_4,
  count(*) filter (where o_orderpriority = '5-LOW') as n_5
from orders group by o_orderstatus
"""


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schemaless JSON access: extract props.k, bucket and aggregate."""
    _utc(spark)
    ev = read_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select((k % 10).alias("k_bucket"))
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


JSON_PROPS_SQL = """
select cast(json_extract_string(props, '$.k') as bigint) % 10 as k_bucket,
       count(*) as n
from events group by 1
"""


def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path end-to-end: build a nested JSON document
    per event, ``parse_json`` it into a VARIANT, and aggregate over
    typed ``variant_get`` path extractions. The oracle computes the
    same aggregate from the RAW columns — agreeing means the
    JSON→VARIANT→typed-path pipeline is lossless, which is the whole
    point of shredding semi-structured columns into VARIANT instead
    of string-typed JSON (binary-encoded paths, no per-access
    re-parse). Cents stay on the decimal grid (no doubles inside the
    JSON — engine float formatting differs)."""
    _utc(spark)
    ev = read_events(spark, sf_dir)
    ev.createOrReplaceTempView("_ffs_var_events")
    return spark.sql("""
select k_bucket, et,
       cast(count(*) as bigint) as n,
       cast(sum(cents) as bigint) as total_cents
from (
  select variant_get(v, '$.k', 'bigint') % 7 as k_bucket,
         cast(variant_get(v, '$.meta.et', 'string') as string) as et,
         variant_get(v, '$.meta.cents', 'bigint') as cents
  from (
    select parse_json(to_json(named_struct(
             'k', cast(get_json_object(props, '$.k') as bigint),
             'meta', named_struct(
               'et', event_type,
               'cents',
               cast(cast(value as decimal(18,2)) * 100 as bigint))))) as v
    from _ffs_var_events
  )
)
group by k_bucket, et
""")


VARIANT_EXTRACT_SQL = """
select cast(json_extract_string(props, '$.k') as bigint) % 7 as k_bucket,
       event_type as et,
       cast(count(*) as bigint) as n,
       cast(sum(cast(cast(value as decimal(18,2)) * 100 as bigint))
            as bigint) as total_cents
from events
group by 1, 2
"""


def q_streaming_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming execution: file stream -> watermarked
    tumbling windows -> complete-mode memory sink, driven to
    completion; the oracle checks the final table against batch SQL."""
    _utc(spark)
    from far_finer_airtable_firestore_sync_spark.streaming.sync import (
        read_event_stream,
        run_stream_to_memory,
        windowed_event_aggregates,
    )

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    agg = windowed_event_aggregates(stream, window="1 hour", watermark="30 minutes")
    _seq = _next_seq()
    return run_stream_to_memory(agg, f"_ffs_stream_{_seq}")


def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming dedup: every event arrives twice across distinct
    micro-batches (duplicated file stream, one file per trigger);
    watermarked dropDuplicates keeps the first-seen row per event_id.
    Oracle: plain DISTINCT over the batch table."""
    _utc(spark)
    from far_finer_airtable_firestore_sync_spark.streaming.sync import (
        read_event_stream_duplicated,
        run_stream_to_memory,
        streaming_dedup,
    )

    stream = read_event_stream_duplicated(
        spark, f"{sf_dir}/events.parquet", copies=2
    )
    deduped = streaming_dedup(stream, ["event_id"], watermark="1 hour").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    _seq = _next_seq()
    return run_stream_to_memory(
        deduped, f"_ffs_stream_dedup_{_seq}", output_mode="append"
    )


STREAMING_DEDUP_SQL = """
select event_id, ts, user_id, event_type, value from events
"""


def q_streaming_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-static enrichment: the file event stream broadcast-
    joins the static customer dimension inside every micro-batch —
    stateless (no state store, no watermark), append mode emits each
    enriched row exactly once. Oracle: the equivalent batch join."""
    _utc(spark)
    from far_finer_airtable_firestore_sync_spark.streaming.sync import (
        read_event_stream,
        run_stream_to_memory,
        stream_static_enrich,
    )

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    dim = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    enriched = stream_static_enrich(
        stream,
        dim,
        F.col("user_id") == F.col("c_custkey"),
        ["event_id", "user_id", "event_type", "value", "c_mktsegment"],
    )
    _seq = _next_seq()
    return run_stream_to_memory(
        enriched, f"_ffs_stream_enrich_{_seq}", output_mode="append"
    )


STREAMING_ENRICH_SQL = """
select e.event_id, e.user_id, e.event_type, e.value, c.c_mktsegment
from events e join customer c on e.user_id = c.c_custkey
"""


def q_streaming_rollup_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL continuously-maintained rollup, end to end: the event
    stream replayed as two time-split micro-batches (the boundary hour
    is touched by BOTH batches, exercising the update-mode
    re-aggregation + checksum-upsert store maintenance), then the
    materialized rollup read back FROM THE STORE. Oracle: the plain
    batch windowed aggregate — the store must hold exactly it."""
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from far_finer_airtable_firestore_sync_spark.sources.store import (
        DocumentStore,
    )
    from far_finer_airtable_firestore_sync_spark.streaming.sync import (
        continuous_rollup,
        read_event_stream,
    )

    _utc(spark)
    # 10% slice: the two-batch update-mode maintenance semantics are
    # fully exercised at any size; the full table only multiplies
    # fixed stateful-streaming overhead in the bench.
    src = pq.read_table(f"{sf_dir}/events.parquet")
    src = src.filter(pc.equal(pc.bit_wise_and(src["event_id"], 7), 0))
    mid = sorted(src["ts"].to_pylist())[len(src) // 2]
    src_dir = _scratch_dir(prefix="ffs-rollup-entry-")
    pq.write_table(src.filter(pc.less(src["ts"], mid)),
                   f"{src_dir}/part1.parquet")
    pq.write_table(src.filter(pc.greater_equal(src["ts"], mid)),
                   f"{src_dir}/part2.parquet")
    # Pin replay order explicitly: the file source orders batches by
    # mtime, and on coarse-mtime filesystems the two writes can tie —
    # part2 replaying first would drop part1's rows as late under the
    # 1-hour watermark (same fix as q_streaming_near_dedup).
    import os
    import time as _time

    now = _time.time()
    os.utime(f"{src_dir}/part1.parquet", (now, now))
    os.utime(f"{src_dir}/part2.parquet", (now + 1, now + 1))
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    store = DocumentStore(spark, _scratch_dir(prefix="ffs-rollup-store-"))
    # stateful queries freeze their state-store width at start — size
    # it to key pressure, not the 32-wide batch shuffle (see
    # run_stream_to_memory's rationale)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = continuous_rollup(
            stream, store, _scratch_dir(prefix="ffs-rollup-ck-"),
            window="1 day", watermark="1 hour",
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return store.read().select(
        "window_start", "event_type", "n_events", "total_value"
    )



def q_streaming_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming session windows: native session_window stateful
    operator in append mode; far-future sentinel events flush the
    watermark so every real session finalizes in the bounded replay.
    Oracle: batch gap-sessionization with the session_window boundary
    rule (a gap of exactly 30 min starts a new session)."""
    _utc(spark)
    from far_finer_airtable_firestore_sync_spark.streaming.sync import (
        read_event_stream_with_flush,
        run_stream_to_memory,
        streaming_session_aggregates,
    )

    stream = read_event_stream_with_flush(spark, f"{sf_dir}/events.parquet")
    sess = streaming_session_aggregates(
        stream, gap="30 minutes", watermark="30 minutes"
    )
    _seq = _next_seq()
    out = run_stream_to_memory(
        sess, f"_ffs_stream_sess_{_seq}", output_mode="append"
    )
    return out.filter("user_id >= 0")


#: batch replay of session_window semantics: [start, start+gap) is
#: half-open, so diff == gap starts a NEW session (>= not >)
STREAMING_SESSION_SQL = """
with marked as (
  select user_id, ts, event_id, value,
    case when epoch_us(ts) - lag(epoch_us(ts)) over (
           partition by user_id order by ts, event_id
         ) >= 1800000000 then 1
         when lag(ts) over (partition by user_id order by ts, event_id) is null then 1
         else 0 end as is_start
  from events
),
sessions as (
  select user_id, ts, value,
    sum(is_start) over (
      partition by user_id order by ts, event_id
      rows between unbounded preceding and current row
    ) as session_idx
  from marked
)
select user_id,
       min(ts) as session_start, max(ts) as session_last,
       count(*) as n_events,
       cast(sum(cast(value as decimal(18,2))) as double) as session_value
from sessions
group by user_id, session_idx
"""


def q_streaming_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-stream inner join: purchases joined to same-user
    clicks within 1 hour after, watermarked on both sides so join
    state is bounded. Oracle: the batch range join over the same
    events (identical semantics once the bounded replay drains)."""
    _utc(spark)
    from far_finer_airtable_firestore_sync_spark.streaming.sync import (
        read_event_stream,
        run_stream_to_memory,
        stream_stream_interval_join,
    )

    purchases = read_event_stream(spark, f"{sf_dir}/events.parquet").filter(
        "event_type = 'purchase'"
    )
    clicks = read_event_stream(spark, f"{sf_dir}/events.parquet").filter(
        "event_type = 'click'"
    )
    joined = stream_stream_interval_join(purchases, clicks, horizon="1 hour")
    _seq = _next_seq()
    return run_stream_to_memory(
        joined, f"_ffs_stream_rj_{_seq}", output_mode="append"
    )

def q_streaming_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL left-outer stream-stream join: every purchase emits, with
    NULL click columns when no same-user click lands within 1 hour —
    the emission requires watermark progress past ts + horizon, so
    both replays push flush sentinels (see
    stream_stream_interval_join_left). Oracle: the batch LEFT range
    join over the same events."""
    _utc(spark)
    from far_finer_airtable_firestore_sync_spark.streaming.sync import (
        read_event_stream_with_flush,
        run_stream_to_memory,
        stream_stream_interval_join_left,
    )

    # sentinels (user_id < 0) must SURVIVE the type filters so the
    # watermark still reaches year 2100 on both sides
    purchases = read_event_stream_with_flush(
        spark, f"{sf_dir}/events.parquet"
    ).filter("event_type = 'purchase' or user_id < 0")
    clicks = read_event_stream_with_flush(
        spark, f"{sf_dir}/events.parquet"
    ).filter("event_type = 'click' or user_id < 0")
    joined = stream_stream_interval_join_left(
        purchases, clicks, horizon="1 hour"
    )
    _seq = _next_seq()
    out = run_stream_to_memory(
        joined, f"_ffs_stream_loj_{_seq}", output_mode="append"
    )
    return out.filter("user_id >= 0")


STREAMING_LEFT_OUTER_SQL = """
with purchases as (
  select event_id, user_id, ts from events where event_type = 'purchase'
),
clicks as (
  select user_id, event_id as click_id, ts as click_ts
  from events where event_type = 'click'
)
select p.event_id, p.user_id, p.ts, c.click_id as r_click_id,
       c.click_ts as r_click_ts
from purchases p left join clicks c
  on p.user_id = c.user_id
 and epoch_us(c.click_ts) - epoch_us(p.ts) between 0 and 3600000000
"""



STREAMING_WINDOW_SQL = f"""
select date_trunc('hour', ts) as window_start, event_type,
       count(*) as n_events,
       cast(sum(cast(value as {_DEC})) as double) as total_value
from events
group by 1, 2
"""


STREAMING_ROLLUP_SLICE_SQL = f"""
select cast(date_trunc('day', ts) as timestamp) as window_start, event_type,
       count(*) as n_events,
       cast(sum(cast(value as {_DEC})) as double) as total_value
from events
where (event_id & 7) = 0
group by 1, 2
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over key sets (§2.7 set operations)."""
    _utc(spark)
    cust = _read(spark, sf_dir, "customer")
    a = cust.filter("c_custkey % 2 = 0").select("c_custkey")
    b = cust.filter("c_custkey % 3 = 0").select("c_custkey")
    return (
        a.union(b).distinct().withColumn("op", F.lit("union"))
        .unionByName(a.intersect(b).withColumn("op", F.lit("intersect")))
        .unionByName(a.exceptAll(b).distinct().withColumn("op", F.lit("except")))
    )


SET_OPS_SQL = """
with a as (select c_custkey from customer where c_custkey % 2 = 0),
b as (select c_custkey from customer where c_custkey % 3 = 0)
select c_custkey, 'union' as op from (select * from a union select * from b)
union all
select c_custkey, 'intersect' as op from (select * from a intersect select * from b)
union all
select c_custkey, 'except' as op from (select * from a except select * from b)
"""


def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all subtotal combinations)."""
    _utc(spark)
    orders = _read(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("total"),
    )


CUBE_SQL = f"""
select o_orderstatus, o_orderpriority, count(*) as n,
       cast(sum(cast(o_totalprice as {_DEC})) as double) as total
from orders group by cube (o_orderstatus, o_orderpriority)
"""


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary — the
    classic CRM cohorting): per-customer stats, rank-exact quintile
    cuts (the ccnet 1+(rn-1)*5 div n idiom, NOT ntile whose
    uneven-group placement is an engine detail), segment = the three
    quintile digits, reported as segment sizes + value. One
    per-customer aggregate, one 1-row global-max-date broadcast gate,
    three skinny windows over customer-grain rows."""
    _utc(spark)
    _read(spark, sf_dir, "orders").createOrReplaceTempView("_ffs_rfm_orders")
    return spark.sql(f"""
with per_cust as (
  select o_custkey,
         max(cast(o_orderdate as date)) as last_d,
         cast(count(*) as bigint) as freq,
         sum(cast(o_totalprice as {_DEC})) as spend
  from _ffs_rfm_orders group by o_custkey
),
gate as (select max(last_d) as max_d from per_cust),
r as (
  select o_custkey, freq, spend,
         count(*) over () as n,
         row_number() over (order by datediff(g.max_d, last_d) asc,
                            o_custkey asc) as rn_r,
         row_number() over (order by freq desc, o_custkey asc) as rn_f,
         row_number() over (order by spend desc, o_custkey asc) as rn_m
  from per_cust cross join gate g
)
select 1 + (rn_r - 1) * 5 div n as r_q,
       1 + (rn_f - 1) * 5 div n as f_q,
       1 + (rn_m - 1) * 5 div n as m_q,
       cast(count(*) as bigint) as n_customers,
       cast(sum(spend) as double) as segment_value
from r group by 1, 2, 3
""")


RFM_SEGMENTS_SQL = f"""
with per_cust as (
  select o_custkey,
         max(cast(o_orderdate as date)) as last_d,
         cast(count(*) as bigint) as freq,
         sum(cast(o_totalprice as {_DEC})) as spend
  from orders group by o_custkey
),
gate as (select max(last_d) as max_d from per_cust),
r as (
  select o_custkey, freq, spend,
         count(*) over () as n,
         row_number() over (order by datediff('day', last_d, g.max_d) asc,
                            o_custkey asc) as rn_r,
         row_number() over (order by freq desc, o_custkey asc) as rn_f,
         row_number() over (order by spend desc, o_custkey asc) as rn_m
  from per_cust cross join gate g
)
select 1 + (rn_r - 1) * 5 // n as r_q,
       1 + (rn_f - 1) * 5 // n as f_q,
       1 + (rn_m - 1) * 5 // n as m_q,
       cast(count(*) as bigint) as n_customers,
       cast(sum(spend) as double) as segment_value
from r group by 1, 2, 3
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with mixed arities + grouping() flags —
    the general form ROLLUP/CUBE specialize (one Expand + one
    aggregate, NOT a union of per-set scans; the flags disambiguate a
    subtotal NULL from a data NULL). Sets: (status, priority),
    (priority), ()."""
    _utc(spark)
    _read(spark, sf_dir, "orders").createOrReplaceTempView("_ffs_gs_orders")
    return spark.sql(f"""
select o_orderstatus, o_orderpriority,
       cast(grouping(o_orderstatus) as int) as g_status,
       cast(grouping(o_orderpriority) as int) as g_priority,
       count(*) as n,
       cast(sum(cast(o_totalprice as {_DEC})) as double) as total
from _ffs_gs_orders
group by grouping sets ((o_orderstatus, o_orderpriority),
                        (o_orderpriority), ())
""")


GROUPING_SETS_SQL = f"""
select o_orderstatus, o_orderpriority,
       cast(grouping(o_orderstatus) as int) as g_status,
       cast(grouping(o_orderpriority) as int) as g_priority,
       count(*) as n,
       cast(sum(cast(o_totalprice as {_DEC})) as double) as total
from orders
group by grouping sets ((o_orderstatus, o_orderpriority),
                        (o_orderpriority), ())
"""


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-user trailing-1-hour event count
    and value sum at every event — RANGE frames bound by the ORDER
    key's VALUE (epoch seconds), not row offsets, which is the
    correct semantics for irregular event spacing. Sum is exact
    integer 64ths — floor(value * 64): a power-of-two multiply is an
    exponent shift and floor has no tie semantics, bit-identical
    cross-engine on any data (r8 round-idiom sweep); the output
    projects a small slice but the window computes over the full
    stream."""
    _utc(spark)
    ev = read_events(spark, sf_dir)
    ev.createOrReplaceTempView("_ffs_rng_events")
    return spark.sql("""
select event_id, user_id, ts_s, n_1h, v64_1h
from (
  select event_id, user_id, ts_s, value,
         count(*) over w as n_1h,
         sum(v64) over w as v64_1h
  from (
    select event_id, user_id,
           cast(unix_timestamp(ts) as bigint) as ts_s,
           value,
           cast(floor(value * cast(64 as double)) as bigint) as v64
    from _ffs_rng_events
  )
  window w as (partition by user_id order by ts_s asc
               range between 3599 preceding and current row)
)
where value > 197
""")


WINDOW_RANGE_FRAME_SQL = """
select event_id, user_id, ts_s, n_1h, v64_1h
from (
  select event_id, user_id, ts_s, value,
         count(*) over w as n_1h,
         sum(v64) over w as v64_1h
  from (
    select event_id, user_id,
           -- floor, not cast: DuckDB double->bigint casts ROUND, but
           -- Spark's unix_timestamp truncates sub-second parts
           cast(floor(epoch(ts)) as bigint) as ts_s,
           value,
           cast(floor(value * cast(64 as double)) as bigint) as v64
    from events
  )
  window w as (partition by user_id order by ts_s asc
               range between 3599 preceding and current row)
)
where value > 197
"""


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar-function coverage in one projection."""
    _utc(spark)
    return _read(spark, sf_dir, "part").select(
        "p_partkey",
        F.expr("upper(p_brand)").alias("brand_u"),
        F.expr("lower(p_type)").alias("type_l"),
        F.expr("substring(p_name, 1, 8)").alias("name8"),
        F.expr("length(p_name)").alias("name_len"),
        F.expr("replace(p_type, ' ', '_')").alias("type_us"),
        F.expr("concat(p_brand, ':', cast(p_size as string))").alias("brand_size"),
        F.expr("abs(p_retailprice - 1000.0)").alias("price_dist"),
        F.expr("round(p_retailprice / 7.0, 2)").alias("price_div"),
        F.expr("cast(floor(sqrt(cast(p_size as double)) * 100) as bigint)").alias(
            "size_sqrt100"
        ),
        F.expr("pmod(p_partkey, 97)").alias("key_mod"),
        F.expr("greatest(p_size, 25)").alias("size_floor25"),
    )


SCALAR_FUNCS_SQL = """
select p_partkey,
  upper(p_brand) as brand_u,
  lower(p_type) as type_l,
  substring(p_name, 1, 8) as name8,
  length(p_name) as name_len,
  replace(p_type, ' ', '_') as type_us,
  concat(p_brand, ':', cast(p_size as string)) as brand_size,
  abs(p_retailprice - 1000.0) as price_dist,
  round(p_retailprice / 7.0, 2) as price_div,
  cast(floor(sqrt(cast(p_size as double)) * 100) as bigint) as size_sqrt100,
  p_partkey % 97 as key_mod,
  greatest(p_size, 25) as size_floor25
from part
"""


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple distinct aggregates in one group (expand-based plan)."""
    _utc(spark)
    li = _read(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


DISTINCT_AGG_SQL = """
select l_returnflag,
       count(distinct l_partkey) as n_parts,
       count(distinct l_suppkey) as n_supps,
       count(*) as n_rows
from lineitem group by l_returnflag
"""


def q_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode/flatten: classic word count over the documents corpus
    (explode is THE array-to-rows operator; shuffle on the word)."""
    _utc(spark)
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.expr("split(lower(text), ' ')")).alias("word"))
        .filter("word <> ''")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


WORD_COUNT_SQL = """
select word, count(*) as n from (
  select unnest(string_split(lower(text), ' ')) as word from documents
) where word <> ''
group by word
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide metric columns -> (key, metric, value) rows."""
    _utc(spark)
    cust = _read(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', c_acctbal, 'nationkey', cast(c_nationkey as double))"
        ).alias("metric", "value"),
    )


UNPIVOT_SQL = """
select c_custkey, 'acctbal' as metric, c_acctbal as value from customer
union all
select c_custkey, 'nationkey', cast(c_nationkey as double) from customer
"""


def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy dedup: customer-name pairs within edit distance 2, blocked
    on (nation, name prefix) so the quadratic comparison never crosses
    blocks — the classic blocking-key pattern for entity resolution.
    ``levenshtein`` is a built-in in both engines (identical ints)."""
    _utc(spark)
    cust = _read(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.expr("replace(c_name, '#', '')").alias("name"),
    )
    # fixed-width names: first 15 chars = 'Customer' + 6 leading digits
    # — a real blocking key (prefix-9 was constant across the table,
    # collapsing blocking to nation only: 4.5M comparisons at sf0.1).
    # Standard blocking recall tradeoff: pairs differing in a blocked
    # digit are not candidates (multi-key blocking would recover them).
    blocked = cust.withColumn("block", F.expr("substring(name, 1, 15)"))
    a, b = blocked.alias("a"), blocked.alias("b")
    lev = F.expr("levenshtein(a.name, b.name)")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("id_a"),
            F.col("b.c_custkey").alias("id_b"),
            lev.alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= 2)
    )


FUZZY_NAME_SQL = """
with cust as (
  select c_custkey, c_nationkey, replace(c_name, '#', '') as name
  from customer
),
blocked as (select *, substring(name, 1, 15) as block from cust)
select a.c_custkey as id_a, b.c_custkey as id_b,
       levenshtein(a.name, b.name) as edit_distance
from blocked a join blocked b
  on a.block = b.block and a.c_nationkey = b.c_nationkey
 and a.c_custkey < b.c_custkey
where levenshtein(a.name, b.name) <= 2
"""


def q_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median order price per status via rank selection (both
    engines pick identical middle elements; the two-middle average is
    one deterministic double operation)."""
    _utc(spark)
    orders = _read(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_ffs_orders_med")
    return spark.sql(MEDIAN_BODY.format(rel="_ffs_orders_med"))


MEDIAN_BODY = """
with ranked as (
  select o_orderstatus, o_totalprice,
         row_number() over (
           partition by o_orderstatus
           order by o_totalprice, o_orderkey
         ) as rn,
         count(*) over (partition by o_orderstatus) as n
  from {rel}
)
select o_orderstatus,
       (sum(case when rn in (cast(floor((n + 1) / 2) as int), cast(floor((n + 2) / 2) as int))
                 then o_totalprice else 0.0 end)
        / count(case when rn in (cast(floor((n + 1) / 2) as int), cast(floor((n + 2) / 2) as int))
                     then 1 end)) as median_price
from ranked
group by o_orderstatus
"""

MEDIAN_SQL = MEDIAN_BODY.format(rel="orders")


def q_unshipped_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: top-10 open orders by pending revenue for one
    market segment — selective dim filter, fact join, agg, top-k."""
    _utc(spark)
    cust = _read(spark, sf_dir, "customer").filter("c_mktsegment = 'BUILDING'")
    orders = _read(spark, sf_dir, "orders").filter("o_orderstatus = 'O'")
    li = _read(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


UNSHIPPED_REVENUE_SQL = f"""
select o_orderkey, o_orderdate, o_orderpriority,
  cast(sum(cast(l_extendedprice as {_DEC}) * (cast(1 as {_DEC}) - cast(l_discount as {_DEC}))) as double) as revenue
from lineitem
join orders on l_orderkey = o_orderkey
join customer on o_custkey = c_custkey
where c_mktsegment = 'BUILDING' and o_orderstatus = 'O'
group by o_orderkey, o_orderdate, o_orderpriority
order by revenue desc, o_orderkey asc
limit 10
"""


def q_order_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped: order-priority counts for one quarter of
    orders having at least one line item shipped >90 days after the
    order date — the big-big LEFT SEMI join. Semi join deduplicates
    the probe side by construction (no DISTINCT pass), the quarter
    filter pushes into the orders scan, and only (l_orderkey,
    l_shipdate) is read from lineitem (column pruning)."""
    _utc(spark)
    orders = _read(spark, sf_dir, "orders").filter(
        "o_orderdate >= timestamp'1996-01-01'"
        " and o_orderdate < timestamp'1996-04-01'"
    )
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (orders.o_orderkey == li.l_orderkey) & (
        li.l_shipdate.cast("date")
        > F.date_add(orders.o_orderdate.cast("date"), 90)
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORDER_PRIORITY_SEMI_SQL = """
select o_orderpriority, count(*) as order_count
from orders o
where o.o_orderdate >= timestamp '1996-01-01'
  and o.o_orderdate < timestamp '1996-04-01'
  and exists (
    select 1 from lineitem l
    where l.l_orderkey = o.o_orderkey
      and cast(l.l_shipdate as date) > cast(o.o_orderdate as date) + 90
  )
group by o_orderpriority
"""


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped: customers behind the largest orders — a
    HAVING aggregate on the fact table feeding a semi-restriction of
    the join. The lineitem groupBy runs FIRST (map-side partial sums,
    shuffle on orderkey), and only qualifying orderkeys reach the
    orders/customer joins — at scale the qualifying set is tiny, so
    both joins broadcast it."""
    _utc(spark)
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("_q"))
        .filter(F.col("_q") > 300)
        .select("l_orderkey", F.col("_q").cast("double").alias("total_qty"))
    )
    return (
        orders.join(
            F.broadcast(big), orders.o_orderkey == big.l_orderkey
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
    )


LARGE_ORDERS_SQL = f"""
select c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       cast(big._q as double) as total_qty
from orders
join (select l_orderkey, sum(cast(l_quantity as {_DEC})) as _q
      from lineitem group by l_orderkey
      having sum(cast(l_quantity as {_DEC})) > 300) big
  on o_orderkey = big.l_orderkey
join customer on o_custkey = c_custkey
"""


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped: share of one month's revenue from PROMO-type
    parts — month filter pushed to the lineitem scan, part dimension
    broadcast, conditional aggregate folded into one row. Sums stay
    decimal (order-independent); the final ratio is one IEEE division
    of two exactly-agreed doubles, then a commutative multiply —
    bit-identical cross-engine."""
    _utc(spark)
    li = _read(spark, sf_dir, "lineitem").filter(
        "l_shipdate >= timestamp'1996-03-01'"
        " and l_shipdate < timestamp'1996-04-01'"
    )
    part = _read(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC))
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(
            F.lit(0).cast(_DEC)
        )).cast("double").alias("promo_revenue"),
        F.sum(rev).cast("double").alias("total_revenue"),
    ).select(
        "promo_revenue",
        "total_revenue",
        F.expr("promo_revenue / total_revenue * 100").alias("promo_pct"),
    )


PROMO_REVENUE_SQL = f"""
with agg as (
  select
    cast(sum(case when p_type = 'PROMO'
      then cast(l_extendedprice as {_DEC}) * (cast(1 as {_DEC}) - cast(l_discount as {_DEC}))
      else cast(0 as {_DEC}) end) as double) as promo_revenue,
    cast(sum(cast(l_extendedprice as {_DEC}) * (cast(1 as {_DEC}) - cast(l_discount as {_DEC}))) as double) as total_revenue
  from lineitem join part on l_partkey = p_partkey
  where l_shipdate >= timestamp '1996-03-01'
    and l_shipdate < timestamp '1996-04-01'
)
select promo_revenue, total_revenue,
       promo_revenue / total_revenue * 100 as promo_pct
from agg
"""


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped: revenue under an OR of brand/size/quantity
    conjunction groups — the disjunctive-predicate join. Catalyst
    extracts the common `l_partkey = p_partkey` equi-condition and
    pushes the per-side conjuncts into the scans; the residual OR
    evaluates post-join."""
    _utc(spark)
    li = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part")
    rev = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC))
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        "(p_brand = 'Brand#1' and p_size between 1 and 15"
        " and l_quantity between 1 and 20)"
        " or (p_brand = 'Brand#7' and p_size between 10 and 30"
        " and l_quantity between 10 and 35)"
        " or (p_brand = 'Brand#20' and p_size between 20 and 50"
        " and l_quantity between 20 and 50)"
    )
    return joined.filter(cond).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


DISJUNCTIVE_REVENUE_SQL = f"""
select
  cast(sum(cast(l_extendedprice as {_DEC}) * (cast(1 as {_DEC}) - cast(l_discount as {_DEC}))) as double) as revenue,
  count(*) as n_lineitems
from lineitem join part on l_partkey = p_partkey
where (p_brand = 'Brand#1' and p_size between 1 and 15
       and l_quantity between 1 and 20)
   or (p_brand = 'Brand#7' and p_size between 10 and 30
       and l_quantity between 10 and 35)
   or (p_brand = 'Brand#20' and p_size between 20 and 50
       and l_quantity between 20 and 50)
"""


def q_customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped: distribution of customers by order count,
    including zero-order customers — LEFT OUTER join + two-level
    aggregation. count(o_orderkey) (not count(*)) makes the
    unmatched-row count 0; the first aggregate's shuffle key is the
    customer key, the second runs on the tiny histogram."""
    _utc(spark)
    cust = _read(spark, sf_dir, "customer").select("c_custkey")
    orders = _read(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


CUSTOMER_ORDER_HISTOGRAM_SQL = """
select c_count, count(*) as custdist
from (
  select c_custkey, count(o_orderkey) as c_count
  from customer left outer join orders on c_custkey = o_custkey
  group by c_custkey
)
group by c_count
"""


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped: scan-heavy filtered single aggregate — the
    pure predicate-pushdown + codegen showcase."""
    _utc(spark)
    li = _read(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast(_DEC)
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.02, 0.09))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n"))
    )


FORECAST_REVENUE_SQL = f"""
select cast(sum(cast(l_extendedprice as {_DEC}) * cast(l_discount as {_DEC})) as double) as revenue,
       count(*) as n
from lineitem
where l_shipdate >= timestamp '1995-01-01' and l_shipdate < timestamp '1997-01-01'
  and l_discount between 0.02 and 0.09 and l_quantity < 24
"""


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel per user: signup -> first click after signup ->
    first purchase after that click; stage counts. One shuffle on
    user_id, conditional min aggregates (no joins)."""
    _utc(spark)
    ev = read_events(spark, sf_dir)
    ev.createOrReplaceTempView("_ffs_funnel_events")
    return spark.sql(FUNNEL_BODY.format(rel="_ffs_funnel_events"))


FUNNEL_BODY = """
with per_user as (
  select user_id,
    min(case when event_type = 'signup' then ts end) as t_signup
  from {rel} group by user_id
),
with_click as (
  select p.user_id, p.t_signup,
    min(case when e.event_type = 'click' and e.ts >= p.t_signup then e.ts end) as t_click
  from per_user p join {rel} e on e.user_id = p.user_id
  where p.t_signup is not null
  group by p.user_id, p.t_signup
),
with_purchase as (
  select c.user_id, c.t_signup, c.t_click,
    min(case when e.event_type = 'purchase' and e.ts >= c.t_click then e.ts end) as t_purchase
  from with_click c join {rel} e on e.user_id = c.user_id
  group by c.user_id, c.t_signup, c.t_click
)
select
  count(*) as n_signed_up,
  count(t_click) as n_clicked_after,
  count(t_purchase) as n_purchased_after
from with_purchase
"""

FUNNEL_SQL = FUNNEL_BODY.format(rel="events")


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week x
    activity week with distinct-user counts."""
    _utc(spark)
    ev = read_events(spark, sf_dir)
    ev.createOrReplaceTempView("_ffs_cohort_events")
    return spark.sql(COHORT_BODY.format(rel="_ffs_cohort_events"))


COHORT_BODY = """
with first_seen as (
  select user_id, cast(date_trunc('week', min(ts)) as date) as cohort_week
  from {rel} group by user_id
)
select f.cohort_week, cast(date_trunc('week', e.ts) as date) as activity_week,
       count(distinct e.user_id) as active_users
from {rel} e join first_seen f on e.user_id = f.user_id
group by 1, 2
"""

COHORT_SQL = COHORT_BODY.format(rel="events")


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov model of user behavior: per-user event
    sequences (ordered by ts, event_id tie-break — total order, both
    engines agree) -> next-event transition counts and probabilities.
    One shuffle on user_id for the lead() window, one aggregation;
    probabilities are bigint-count ratios through ONE correctly-
    rounded double division (IEEE divide is exact cross-engine, unlike
    ln/pow)."""
    _utc(spark)
    ev = read_events(spark, sf_dir)
    ev.createOrReplaceTempView("_ffs_markov_events")
    return spark.sql(MARKOV_BODY.format(rel="_ffs_markov_events"))


MARKOV_BODY = """
with seq as (
  select event_type,
         lead(event_type) over (
           partition by user_id order by ts, event_id
         ) as next_type
  from {rel}
),
counts as (
  select event_type, next_type, cast(count(*) as bigint) as n
  from seq where next_type is not null
  group by event_type, next_type
)
select event_type, next_type, n,
       cast(n as double)
         / cast(sum(n) over (partition by event_type) as double) as p
from counts
"""

MARKOV_SQL = MARKOV_BODY.format(rel="events")


def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates (HLL distinct, approximate quantiles) — the
    100 TB statistics path (exact distinct/percentile shuffle all
    values; sketches are bounded-size mergeable state).

    Banded oracle (sketch internals are engine-specific, so raw sketch
    outputs can never hash-match): each engine asserts ITS OWN sketch
    against ITS OWN exact aggregate — HLL distinct within 3x the
    declared rsd, approximate quantiles within a rank tolerance — and
    emits the verdict booleans plus the exact distinct count. The
    booleans are deterministically true whenever the sketches honor
    their error contracts, and the exact count compares bit-exactly,
    so the driver's hash gate now covers this entry."""
    _utc(spark)
    li = _read(spark, sf_dir, "lineitem")
    # Keep the exact DISTINCT in its OWN aggregate: mixing it with the
    # sketch aggs makes Spark's distinct-rewrite carry a full
    # 10000-accuracy percentile digest per (flag, partkey) group —
    # ~20k serialized sketches through the shuffle instead of 3.
    sk = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("_apx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("_apx_med"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("_apx_p99"),
    )
    ex = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    ap = sk.join(ex, "l_returnflag")
    j = li.join(F.broadcast(ap), "l_returnflag")
    return (
        j.groupBy(
            "l_returnflag", "exact_parts", "_apx_parts", "_apx_med", "_apx_p99"
        )
        .agg(
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("_apx_med"), 1).otherwise(0)
            ).alias("_le_med"),
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("_apx_p99"), 1).otherwise(0)
            ).alias("_le_p99"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("_apx_parts") - F.col("exact_parts"))
                <= 0.06 * F.col("exact_parts")
            ).alias("parts_in_band"),
            (F.col("_le_med") / F.col("_n")).between(0.49, 0.51).alias(
                "median_in_band"
            ),
            (F.col("_le_p99") / F.col("_n")).between(0.98, 1.0).alias(
                "p99_in_band"
            ),
        )
    )


APPROX_STATS_SQL = """
with ap as (
  select l_returnflag,
         approx_count_distinct(l_partkey) as apx_parts,
         approx_quantile(l_extendedprice, 0.5) as apx_med,
         approx_quantile(l_extendedprice, 0.99) as apx_p99,
         count(distinct l_partkey) as exact_parts
  from lineitem group by 1
)
select a.l_returnflag, a.exact_parts,
       abs(a.apx_parts - a.exact_parts) <= 0.06 * a.exact_parts
         as parts_in_band,
       (sum(case when l.l_extendedprice <= a.apx_med then 1 else 0 end)
          * 1.0 / count(*)) between 0.49 and 0.51 as median_in_band,
       (sum(case when l.l_extendedprice <= a.apx_p99 then 1 else 0 end)
          * 1.0 / count(*)) between 0.98 and 1.0 as p99_in_band
from lineitem l join ap a using (l_returnflag)
group by 1, 2, a.apx_parts, a.apx_med, a.apx_p99
"""


def q_event_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day distribution-drift monitor on the event stream:
    total-variation distance between consecutive days' event-type
    mixes (the standard data-drift alarm for a training-data intake
    pipeline; TVD = half the L1 distance between the two share
    vectors)."""
    _utc(spark)
    ev = read_events(spark, sf_dir)
    ev.createOrReplaceTempView("_ffs_drift_events")
    return spark.sql(EVENT_DRIFT_BODY.format(rel="_ffs_drift_events"))


#: share-quantization grid (1e-12): shares become integers so the
#: cross-type SUM is order-independent (float sums are not
#: associative); one IEEE-exact double division at the end. Counts
#: never enter a product, so nothing can overflow at any data scale.
#: The tail below starts from a (day, event_type, c) counts relation
#: so the batch entry (counts from raw events) and the streaming
#: entry (counts materialized by a Structured Streaming aggregate)
#: share the exact same drift computation.
_DRIFT_TAIL = """
tot as (select day, sum(c) as t from d group by day),
grid as (
  select dy.day, et.event_type
  from (select distinct day from d) dy
  cross join (select distinct event_type from d) et
),
shares as (
  select g.day, g.event_type,
         cast(round((cast(coalesce(d.c, 0) as double) / cast(t.t as double))
                    * 1000000000000) as bigint) as share_e12
  from grid g
  join tot t on g.day = t.day
  left join d on d.day = g.day and d.event_type = g.event_type
),
lagged as (
  select day, event_type, share_e12,
         lag(share_e12) over (partition by event_type order by day) as prev_e12
  from shares
)
select day,
       cast(sum(abs(share_e12 - prev_e12)) as double)
         / cast(2000000000000 as double) as tvd,
       cast(sum(case when share_e12 > 0 then 1 else 0 end) as int)
         as n_active_types
from lagged
where prev_e12 is not null
group by day
"""

EVENT_DRIFT_BODY = (
    """
with d as (
  select cast(date_trunc('day', ts) as date) as day, event_type,
         cast(count(*) as bigint) as c
  from {rel} group by 1, 2
),"""
    + _DRIFT_TAIL
)

#: drift over a pre-aggregated (day, event_type, c) counts relation
EVENT_DRIFT_FROM_COUNTS = (
    "\nwith d as (select day, event_type, c from {rel}),"
    + _DRIFT_TAIL
)

EVENT_DRIFT_SQL = EVENT_DRIFT_BODY.format(rel="events")


def q_events_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile per event type: volume share
    and average value by weekday — the decomposition baseline a drift
    monitor subtracts before alarming (weekly periodicity is the #1
    false-drift source).

    Weekday comes from epoch-day arithmetic anchored on a known
    Monday — the engines disagree on dayofweek() numbering (Spark
    1=Sunday, DuckDB 0=Sunday), so neither builtin is portable.
    Shares are ppm integers (bigint-exact); avg goes through the
    decimal sum / count pair."""
    _utc(spark)
    ev = read_events(spark, sf_dir)
    ev.createOrReplaceTempView("_ffs_dow_events")
    return spark.sql(_dow_profile_body(SPARK_D, "_ffs_dow_events"))


def _dow_profile_body(dialect: str, rel: str) -> str:
    if dialect == SPARK_D:
        days = "datediff(cast(ts as date), cast('2024-01-01' as date))"
        intdiv = "div"
    else:
        days = "datediff('day', date '2024-01-01', cast(ts as date))"
        intdiv = "//"
    dow = f"cast((({days}) % 7 + 7) % 7 as int)"  # 0 = Monday
    return f"""
with d as (
  select event_type, {dow} as dow,
         cast(count(*) as bigint) as n_events,
         cast(sum(cast(value as decimal(18,2))) as double) as total_value
  from {rel} group by 1, 2
),
tot as (select event_type, sum(n_events) as t from d group by event_type)
select d.event_type, d.dow, d.n_events,
       cast((1000000 * d.n_events) {intdiv} t.t as bigint) as share_ppm,
       d.total_value / d.n_events as avg_value
from d join tot t on d.event_type = t.event_type
"""


def q_event_iqr_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (the UDAF extension surface):
    per-type interquartile range of event values computed by numpy
    percentiles inside an Arrow-batched GROUPED_AGG pandas_udf —
    value-pinned against a rank-selection SQL twin. Both sides
    interpolate on an exact INTEGER grid — floor(value * 64), a
    power-of-two multiply with no tie semantics (quartile fractions
    are quarters, so 4*a + (b-a)*k is exact bigint math; naive
    np.percentile vs percentile_cont differ in the last ulp) with one
    final identical /256 double division (an exact exponent shift).

    This is the surface demo — for plain percentiles the native
    `percentile()` expression is the production path (codegen, no
    Python); a GROUPED_AGG pandas UDF earns its Arrow transfer only
    when the per-group math needs numpy/scipy."""
    from far_finer_airtable_firestore_sync_spark.operators.udafs import (
        quartile_udafs,
    )

    _utc(spark)
    p25_udaf, p75_udaf = quartile_udafs()
    # all-null groups would emit a zero row here but be absent from
    # the SQL twin (its WHERE removes them before ranking) — filter
    # first so group membership matches
    ev = read_events(spark, sf_dir).filter("value is not null")
    agg = ev.groupBy("event_type").agg(
        p25_udaf("value").alias("p25"), p75_udaf("value").alias("p75")
    )
    return agg.select(
        "event_type", "p25", "p75", (F.col("p75") - F.col("p25")).alias("iqr")
    )


EVENT_IQR_SQL = """
with ranked as (
  select event_type,
         cast(floor(value * cast(64 as double)) as bigint) as v64,
         row_number() over (
           partition by event_type order by value, event_id
         ) as rn,
         count(*) over (partition by event_type) as n
  from events
  where value is not null
),
sel as (
  select event_type, n,
         max(case when rn - 1 = (n - 1) // 4 then v64 end) as a25,
         max(case when rn - 1 = (n - 1) // 4 + 1 then v64 end) as b25,
         max(case when rn - 1 = (3 * (n - 1)) // 4 then v64 end) as a75,
         max(case when rn - 1 = (3 * (n - 1)) // 4 + 1 then v64 end) as b75
  from ranked group by event_type, n
),
q as (
  select event_type,
         cast(4 * a25 + (coalesce(b25, a25) - a25) * ((n - 1) % 4)
              as double) / 256.0 as p25,
         cast(4 * a75 + (coalesce(b75, a75) - a75) * ((3 * (n - 1)) % 4)
              as double) / 256.0 as p75
  from sel
)
select event_type, p25, p75, (p75 - p25) as iqr from q
"""


#: k-anonymity threshold: a quasi-identifier combination shared by
#: fewer than K individuals is a re-identification risk
KANON_K = 6


def q_kanon_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer table: group sizes per
    quasi-identifier combination (nation x market segment) with a
    risk flag for groups under {KANON_K} — the governance companion
    of `text_pii_redact` (that one scrubs direct identifiers; this
    one measures re-identification risk from the indirect ones).

    Scale shape: one partial-aggregating groupBy on the QI tuple;
    the report is |QI-domain| rows regardless of table size."""
    _utc(spark)
    cust = _read(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).cast("bigint").alias("group_n"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "group_n",
            (F.col("group_n") < KANON_K).alias("risky"),
        )
    )


KANON_SQL = f"""
select c_nationkey, c_mktsegment,
       cast(count(*) as bigint) as group_n,
       count(*) < {KANON_K} as risky
from customer
group by c_nationkey, c_mktsegment
"""

#: distinct-l threshold for the l-diversity audit
LDIV_L = 3

LDIV_BODY = f"""
with banded as (
  select c_nationkey, c_mktsegment,
         case when c_acctbal < 0 then 'debt'
              when c_acctbal < 5000 then 'mid'
              else 'high' end as sensitive_band
  from {{rel}}
)
select c_nationkey, c_mktsegment,
       cast(count(*) as bigint) as group_n,
       cast(count(distinct sensitive_band) as bigint) as l_distinct,
       count(distinct sensitive_band) >= {LDIV_L} as diverse
from banded
group by c_nationkey, c_mktsegment
"""


def q_ldiversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al.): k-anonymity's
    group-size check misses homogeneity attacks — a group of 50 where
    every member shares the sensitive value re-identifies the
    attribute with certainty. Per quasi-identifier group, the number
    of DISTINCT sensitive values (banded account balance) and a
    diverse flag at l>={LDIV_L}. Same one-groupBy scale shape as the
    k-anonymity entry; count(distinct) partial-aggregates."""
    _utc(spark)
    _read(spark, sf_dir, "customer").createOrReplaceTempView(
        "_ffs_ldiv_customer"
    )
    return spark.sql(LDIV_BODY.format(rel="_ffs_ldiv_customer"))


LDIV_SQL = LDIV_BODY.format(rel="customer")

#: split-conformal miscoverage level: threshold is the
#: ceil((n+1)(1-alpha))-th smallest calibration score
CONFORMAL_ALPHA_NUM, CONFORMAL_ALPHA_DEN = 9, 10  # 1-alpha = 9/10

CONFORMAL_BODY = f"""
with calib as (
  select n_chars as s from {{rel}} where doc_id % 2 = 0
),
stats as (select cast(count(*) as bigint) as n from calib),
kth as (
  -- ceil((n+1)*num/den) in exact integer arithmetic; floor-then-cast
  -- because bare `/` is double in BOTH engines and cast(double as
  -- bigint) rounds in DuckDB but truncates in Spark (round-5 gotcha)
  select cast(floor(
           ((n + 1) * {CONFORMAL_ALPHA_NUM} + {CONFORMAL_ALPHA_DEN} - 1)
             / cast({CONFORMAL_ALPHA_DEN} as double)
         ) as bigint) as k, n
  from stats
),
thr as (
  select k, n, s as threshold
  from kth join (
    select s, row_number() over (order by s) as rn from calib
  ) r on r.rn = least(kth.k, kth.n)
),
test as (select n_chars as s from {{rel}} where doc_id % 2 = 1)
select thr.n as n_calib,
       cast(thr.threshold as bigint) as threshold,
       cast(count(*) as bigint) as n_test,
       cast(sum(case when test.s > thr.threshold then 1 else 0 end)
            as bigint) as n_flagged,
       cast(sum(case when test.s <= thr.threshold then 1 else 0 end)
            as double) / cast(count(*) as double) as coverage
from test cross join thr
group by thr.n, thr.threshold
"""


def q_conformal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal outlier gate (Vovk; Lei et al.): the
    calibration half's exact ceil((n+1)(1-alpha))-th order statistic
    becomes a finite-sample-valid threshold; the test half reports
    flags and empirical coverage. Everything is integer-exact (the
    ceil is integer arithmetic, the order statistic a row_number
    pick); the one double division is the coverage ratio.

    Scale shape: the order statistic is a single-column sort-free
    selection (row_number window on the score only); calibration and
    test halves are disjoint hash splits of one scan."""
    _utc(spark)
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "_ffs_conf_docs"
    )
    return spark.sql(CONFORMAL_BODY.format(rel="_ffs_conf_docs"))


CONFORMAL_SQL = CONFORMAL_BODY.format(rel="documents")


def _user_trend_body(dialect: str, rel: str) -> str:
    """Per-user OLS trend of event value over time, engine-exact.

    Closed-form simple regression from five integer sums: x is epoch
    MINUTES centered on the user's first event (bounds products —
    raw epoch squared would pass 2^63), y is the value on the 2^-10
    grid — floor(value * 2^10): a power-of-two multiply is an exact
    exponent shift and floor has no tie semantics, so the grid is
    bit-identical cross-engine on ANY input data (round-half on a
    double is the one idiom the r7 driver flagged; r8 sweep). All
    sums run in decimal(38,0)/hugeint (the table-checksum widening
    idiom); the closed-form combinations are then clamped back
    through BIGINT before the double cast: DuckDB's hugeint->double
    software conversion is NOT correctly rounded above 2^53 (measured
    1-ulp skew on -28334278284657830 this round), while int64->double
    is a correctly-rounded hardware op in both engines. Minute
    resolution + the 2^-10 grid keep every combination inside int64
    up to ~6700 events/user over the fixture window; past that the
    clamp cast fails LOUDLY in both engines instead of silently
    diverging. slope/intercept are then a fixed expression of IEEE
    double ops — bit-identical cross-engine (the bitext-margin
    recipe). Float sums would be partition-order-dependent; integer
    sums are not.

    Scale shape: one window (per-user min) sharing the partition key
    with the one aggregation; map-side partial aggregation collapses
    the five sums before the exchange — the corpus shuffles once,
    carrying six integers per row."""
    spark_d = dialect == SPARK_D
    wide = "decimal(38,0)" if spark_d else "hugeint"
    if spark_d:
        x = "(unix_timestamp(ts) div 60)"
    else:
        # Spark truncates to seconds; DuckDB epoch() keeps micros —
        # floor, never cast (cast ROUNDS; round-5 gotcha). Epochs are
        # positive, so // and div agree.
        x = "(cast(floor(epoch(ts)) as bigint) // 60)"
    yq = "cast(floor(value * cast(1024 as double)) as bigint)"
    num = "cast(cast(n * sxy - sx * sy as bigint) as double)"
    den = "cast(cast(n * sxx - sx * sx as bigint) as double)"
    return f"""
with base as (select user_id, {x} as x, {yq} as yq from {rel}),
cent as (
  select user_id,
         cast(x - min(x) over (partition by user_id) as {wide}) as xc,
         cast(yq as {wide}) as yq
  from base
),
agg as (
  select user_id, cast(count(*) as {wide}) as n,
         sum(xc) as sx, sum(yq) as sy,
         sum(xc * xc) as sxx, sum(xc * yq) as sxy
  from cent group by user_id
)
select user_id, cast(n as bigint) as n_events,
       cast({num} / {den}
            * cast(1440 as double) / cast(1024 as double)
            as double) as slope_per_day,
       cast((cast(cast(sy as bigint) as double)
             - {num} / {den}
               * cast(cast(sx as bigint) as double))
            / cast(cast(n as bigint) as double)
            / cast(1024 as double) as double) as intercept
from agg
where n >= 2 and n * sxx - sx * sx <> 0
"""


def q_events_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value-over-time OLS trend (slope per day + intercept)
    — the grouped model-fitting shape, done Spark-first as exact
    integer sums + closed form instead of a grouped-map UDF."""
    _utc(spark)
    read_events(spark, sf_dir).createOrReplaceTempView("_ffs_trend_events")
    return spark.sql(_user_trend_body(SPARK_D, "_ffs_trend_events"))


def _max_concurrency_body(dialect: str, rel: str) -> str:
    """Peak concurrent sessions per event type — the interval sweep
    line as ONE window pass: each event opens a session occupying the
    CLOSED integer-second interval [t0, t0 + floor(value)] — i.e.
    floor(value) + 1 seconds (floor, not round: floor of a double has
    no tie semantics, so the length is bit-identical cross-engine on
    any data; r8 round-idiom sweep), with the -1 boundary point placed
    end-exclusively at t0 + floor(value) + 1 (a session whose last
    occupied second is t does not overlap one starting at t + 1).
    Intervals become +1/-1 boundary points on an integer-seconds
    timeline (epoch ints — no interval-type dialect drift), points
    collapse by (type, t, delta) so the running-sum ordering is total
    and engine-deterministic, ends sort before starts at ties, and
    the answer is max(running sum).

    Scale shape: 2 rows per event into one (type, t, delta) partial
    aggregate, then a single per-type window — timeline order is the
    partition sort Spark would need anyway; no self-join, no spine."""
    spark_d = dialect == SPARK_D
    if spark_d:
        x = "unix_timestamp(ts)"
    else:
        x = "cast(floor(epoch(ts)) as bigint)"
    return f"""
with iv as (
  select event_type, {x} as t0,
         {x} + cast(floor(value) as bigint) + 1 as t1
  from {rel}
  -- a session needs a timestamp and a duration; NULLs would also
  -- diverge cross-engine in the window ordering (Spark NULLS FIRST
  -- asc vs DuckDB NULLS LAST — review finding)
  where ts is not null and value is not null
),
pts as (
  select event_type, t0 as t, 1 as delta from iv
  union all
  select event_type, t1 as t, -1 as delta from iv
),
gp as (
  select event_type, t, delta, cast(sum(delta) as bigint) as dsum
  from pts group by event_type, t, delta
),
cum as (
  select event_type,
         sum(dsum) over (
           partition by event_type
           order by t asc, delta asc
           rows between unbounded preceding and current row
         ) as cc
  from gp
)
select event_type, cast(max(cc) as bigint) as peak_concurrency
from cum group by event_type
"""


def q_events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent value-length sessions per event type (interval
    sweep line, see ``_max_concurrency_body``)."""
    _utc(spark)
    read_events(spark, sf_dir).createOrReplaceTempView("_ffs_conc_events")
    return spark.sql(_max_concurrency_body(SPARK_D, "_ffs_conc_events"))


def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill + forward fill (LOCF): build the full
    daily calendar spine per event_type, left-join the daily
    aggregates, zero-fill counts, and carry the last observed daily
    total forward across gap days — the standard densification step
    before any window/forecast model, which Spark has no native
    operator for.

    Forward fill is the portable two-window idiom (no IGNORE NULLS
    dialect divergence): grp = running count of non-null observations
    (gap rows join their predecessor's group), then the group's max
    is the carried value. Daily sums go through decimal so partition
    order cannot perturb them.

    Scale shape: the spine is days x types (tiny, broadcast); the
    only corpus-wide work is the per-(type, day) partial aggregate;
    both window passes share the per-type partitioning."""
    _utc(spark)
    # sparse slice (high-value events) so gap days actually occur —
    # the filter pushes down to the scan
    ev = read_events(spark, sf_dir).filter("value > 190")
    ev.createOrReplaceTempView("_ffs_gapfill_events")
    return spark.sql(_gapfill_body(SPARK_D, "_ffs_gapfill_events"))


SPARK_D = "spark"
DUCK_D = "duckdb"


def _gapfill_body(dialect: str, rel: str) -> str:
    if dialect == SPARK_D:
        spine = (
            "select explode(sequence(b.d0, b.d1, interval 1 day)) as day"
            " from bounds b"
        )
    else:
        spine = (
            "select unnest(generate_series(b.d0, b.d1,"
            " interval 1 day))::date as day from bounds b"
        )
    return f"""
with d as (
  select event_type, cast(date_trunc('day', ts) as date) as day,
         cast(count(*) as bigint) as n_events,
         cast(sum(cast(value as decimal(18,2))) as double) as day_value
  from {rel} group by 1, 2
),
bounds as (
  select min(day) as d0, max(day) as d1 from d
),
spine as ({spine}),
grid as (
  select s.day, et.event_type
  from spine s cross join (select distinct event_type from d) et
),
joined as (
  select g.event_type, g.day,
         coalesce(d.n_events, 0) as n_events,
         d.day_value
  from grid g
  left join d on d.event_type = g.event_type and d.day = g.day
),
grouped as (
  select event_type, day, n_events, day_value,
         count(day_value) over (
           partition by event_type order by day
           rows between unbounded preceding and current row
         ) as grp
  from joined
)
select event_type, day, n_events,
       max(day_value) over (partition by event_type, grp) as value_ffill,
       (day_value is null) as was_gap
from grouped
"""


def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: per order year, each supplier
    nation's revenue share of the year total. Share-of-total via a
    window SUM over the small (year x nation) aggregate — the
    fact-table shuffle happens once, the share math on aggregate
    rows."""
    _utc(spark)
    from pyspark.sql import Window

    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    supp = _read(spark, sf_dir, "supplier")
    nat = _read(spark, sf_dir, "nation")
    rev = F.sum(
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC))
    ).alias("nrev")
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.col("n_name").alias("nation"),
        )
        .agg(rev)
    )
    w = Window.partitionBy("yr")
    return base.select(
        "yr",
        "nation",
        F.col("nrev").cast("double").alias("revenue"),
        (
            F.col("nrev").cast("double")
            / F.sum("nrev").over(w).cast("double")
        ).alias("share"),
    )


MARKET_SHARE_SQL = f"""
with rev as (
  select cast(year(o_orderdate) as int) as yr, n_name as nation,
         sum(cast(l_extendedprice as {_DEC})
             * (cast(1 as {_DEC}) - cast(l_discount as {_DEC}))) as nrev
  from lineitem
  join orders on l_orderkey = o_orderkey
  join supplier on l_suppkey = s_suppkey
  join nation on s_nationkey = n_nationkey
  group by 1, 2
)
select yr, nation,
       cast(nrev as double) as revenue,
       cast(nrev as double) / cast(sum(nrev) over (partition by yr) as double)
         as share
from rev
"""


def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped churn report: customers with above-average
    balance and NO orders since 2000, rolled up by market segment —
    scalar-subquery threshold (broadcast 1-row aggregate) + anti join
    against the date-filtered fact (the filter pushes to the orders
    scan). The avg is sum/count over exact decimal so partition order
    cannot move the threshold."""
    _utc(spark)
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders").filter(
        "o_orderdate >= timestamp'2000-01-01 00:00:00'"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("ab")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("ab")
    )
    idle = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cust"),
        F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("total_bal"),
    )


IDLE_RICH_SQL = f"""
with avg_bal as (
  select cast(sum(cast(c_acctbal as {_DEC})) as double)
           / cast(count(*) as double) as ab
  from customer where c_acctbal > 0
)
select c_mktsegment,
       cast(count(*) as bigint) as n_cust,
       cast(sum(cast(c_acctbal as {_DEC})) as double) as total_bal
from customer c cross join avg_bal a
where c.c_acctbal > a.ab
  and not exists (select 1 from orders o
                  where o.o_custkey = c.c_custkey
                    and o.o_orderdate >= timestamp '2000-01-01 00:00:00')
group by c_mktsegment
"""


def q_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking/distribution window-function family in one entry:
    ntile, percent_rank, cume_dist, lag, lead over the same
    (status, price) window — one shuffle, five functions sharing the
    sort."""
    _utc(spark)
    from pyspark.sql import Window

    orders = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
    )


WINDOW_SUITE_SQL = """
select o_orderkey, o_orderstatus, o_totalprice,
       ntile(4) over w as quartile,
       percent_rank() over w as pct_rank,
       cume_dist() over w as cume,
       lag(o_totalprice, 1) over w as prev_price,
       lead(o_totalprice, 1) over w as next_price
from orders
window w as (partition by o_orderstatus
             order by o_totalprice asc, o_orderkey asc)
"""


def q_streaming_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming monitoring pipeline: a Structured Streaming
    per-day/per-type count aggregate (complete mode, memory sink,
    driven to completion) feeds the SAME drift computation as the
    batch `event_mix_drift` (shared ``_DRIFT_TAIL``). This is the
    production shape — the stream maintains the cheap mergeable
    counts; the TVD report is a view over that materialized state.
    Oracle: the batch drift SQL over the full events table."""
    _utc(spark)
    from far_finer_airtable_firestore_sync_spark.streaming.sync import (
        read_event_stream,
        run_stream_to_memory,
    )

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    counts = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(
            F.expr("cast(date_trunc('day', ts) as date)").alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    _seq = _next_seq()
    name = f"_ffs_stream_drift_{_seq}"
    result = run_stream_to_memory(counts, name, output_mode="complete")
    result.createOrReplaceTempView(f"{name}_counts")
    return spark.sql(EVENT_DRIFT_FROM_COUNTS.format(rel=f"{name}_counts"))


def q_event_value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection on event values: per event_type, the
    exact median and MAD (median absolute deviation), then the count
    of events beyond the 3-MAD fence. MAD is the standard robust
    scale estimate — unlike stddev it is not itself dragged by the
    outliers it is meant to flag."""
    _utc(spark)
    ev = read_events(spark, sf_dir)
    ev.createOrReplaceTempView("_ffs_mad_events")
    return spark.sql(EVENT_MAD_BODY.format(rel="_ffs_mad_events"))


#: both medians use the rank-selection idiom of MEDIAN_BODY (identical
#: middle elements in both engines; the 1-or-2-element average is one
#: deterministic double operation). Scale shape: two windowed passes
#: partitioned on the same event_type key (shuffle reused) + one
#: broadcast-size (n_types rows) join back.
EVENT_MAD_BODY = """
with ranked as (
  select event_type, value, event_id,
         row_number() over (
           partition by event_type order by value, event_id
         ) as rn,
         count(*) over (partition by event_type) as n
  from {rel}
),
med as (
  select event_type,
         (sum(case when rn in (cast(floor((n + 1) / 2) as int),
                               cast(floor((n + 2) / 2) as int))
                   then value else 0.0 end)
          / count(case when rn in (cast(floor((n + 1) / 2) as int),
                                   cast(floor((n + 2) / 2) as int))
                       then 1 end)) as med
  from ranked group by event_type
),
dev as (
  select r.event_type, abs(r.value - m.med) as adev, r.event_id,
         row_number() over (
           partition by r.event_type order by abs(r.value - m.med), r.event_id
         ) as rn,
         count(*) over (partition by r.event_type) as n
  from {rel} r join med m on r.event_type = m.event_type
),
mad as (
  select event_type,
         (sum(case when rn in (cast(floor((n + 1) / 2) as int),
                               cast(floor((n + 2) / 2) as int))
                   then adev else 0.0 end)
          / count(case when rn in (cast(floor((n + 1) / 2) as int),
                                   cast(floor((n + 2) / 2) as int))
                       then 1 end)) as mad
  from dev group by event_type
)
select r.event_type, m.med, d.mad,
       cast(sum(case when abs(r.value - m.med) > 3 * d.mad then 1 else 0 end)
            as bigint) as n_outliers,
       cast(count(*) as bigint) as n_events
from {rel} r
join med m on r.event_type = m.event_type
join mad d on r.event_type = d.event_type
group by r.event_type, m.med, d.mad
"""

EVENT_MAD_SQL = EVENT_MAD_BODY.format(rel="events")


def _two_batch_replay(
    spark: SparkSession,
    sf_dir: str,
    residue: int,
    transform,
    sink_prefix: str,
) -> DataFrame:
    """Shared harness for the stateful-streaming entries: slice events
    to (event_id & 7) == ``residue`` (state semantics are
    size-independent; the full table only multiplies fixed
    micro-batch overhead), split at the ts median into two files
    ordered by mtime, replay ONE file per trigger through
    ``transform`` (so per-key state crosses the batch boundary through
    the state store), and return the update-mode memory-sink rows —
    one row per (key, batch); the caller selects the final state as
    the max-n_events row per key."""
    import os
    import tempfile
    import time as _time

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from far_finer_airtable_firestore_sync_spark.streaming.sync import (
        read_event_stream,
        run_stream_to_memory,
    )

    _utc(spark)
    src = pq.read_table(f"{sf_dir}/events.parquet")
    src = src.filter(pc.equal(pc.bit_wise_and(src["event_id"], 7), residue))
    mid = sorted(src["ts"].to_pylist())[len(src) // 2]
    src_dir = _scratch_dir(prefix=f"ffs-{sink_prefix}-entry-")
    pq.write_table(src.filter(pc.less(src["ts"], mid)),
                   f"{src_dir}/part1.parquet")
    pq.write_table(src.filter(pc.greater_equal(src["ts"], mid)),
                   f"{src_dir}/part2.parquet")
    now = _time.time()
    os.utime(f"{src_dir}/part1.parquet", (now, now))
    os.utime(f"{src_dir}/part2.parquet", (now + 1, now + 1))
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    return run_stream_to_memory(
        transform(stream),
        f"_ffs_stream_{sink_prefix}_{_next_seq()}",
        output_mode="update",
    )


def q_streaming_ewma_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL custom stateful streaming (applyInPandasWithState): per-
    user integer EWMA over a two-batch time-split replay — the per-key
    recurrence crosses the batch boundary through the state store
    (``_two_batch_replay``). Oracle: DuckDB list_reduce folding the
    SAME truncating recurrence over (ts, event_id)-ordered cents."""
    from far_finer_airtable_firestore_sync_spark.streaming.stateful import (
        ewma_profiles,
    )

    out = _two_batch_replay(spark, sf_dir, 0, ewma_profiles, "ewma")
    return (
        out.groupBy("user_id")
        .agg(F.max_by(F.struct("n_events", "ewma_q"), "n_events").alias("_s"))
        .select(
            "user_id",
            F.col("_s.n_events").alias("n_events"),
            F.col("_s.ewma_q").alias("ewma_q"),
        )
    )


_STREAMING_EWMA_SQL = """
with v as (
  select user_id, ts, event_id,
         cast(cast(value as decimal(18,2)) * 100 as bigint) as cents
  from events where (event_id & 7) = 0
)
select user_id,
       cast(count(*) as bigint) as n_events,
       list_reduce(list(cents order by ts asc, event_id asc),
                   (acc, x) -> (acc + x) // 2) as ewma_q
from v group by user_id
"""


def q_streaming_topk_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming #2: per-user streaming top-3 event
    types by exact count, state carried across a two-batch time-split
    replay (``_two_batch_replay`` +
    ``streaming/stateful.topk_type_profiles``). Final state per key =
    max-n_events update row. The oracle recomputes the same exact
    counts and (count desc, type asc) top-3 in batch SQL —
    ranked-ARRAY state value-verifies cross-engine."""
    from far_finer_airtable_firestore_sync_spark.streaming.stateful import (
        topk_type_profiles,
    )

    out = _two_batch_replay(
        spark, sf_dir, 1, lambda s: topk_type_profiles(s, k=3), "topk"
    )
    return (
        out.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("n_events", "top_types", "top_counts"), "n_events"
            ).alias("_s")
        )
        .select(
            "user_id",
            F.col("_s.n_events").alias("n_events"),
            F.col("_s.top_types").alias("top_types"),
            F.col("_s.top_counts").alias("top_counts"),
        )
    )


_STREAMING_TOPK_SQL = """
with v as (
  select user_id, event_type, cast(count(*) as bigint) as c
  from events where (event_id & 7) = 1
  group by user_id, event_type
)
select user_id,
       cast(sum(c) as bigint) as n_events,
       (list(event_type order by c desc, event_type asc))[1:3]
         as top_types,
       (list(c order by c desc, event_type asc))[1:3] as top_counts
from v group by user_id
"""


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: top-20 customers by revenue lost to returned
    items in a 6-month window. Scale shape: the date filter pushes to
    the orders scan and l_returnflag='R' to the lineitem scan BEFORE
    either join; the fact pre-aggregates per order key; nation is
    broadcast; the top-20 is TakeOrderedAndProject (heap per
    partition + driver merge of 20-row heads, never a full sort)."""
    _utc(spark)
    li = _read(spark, sf_dir, "lineitem").filter("l_returnflag = 'R'")
    orders = _read(spark, sf_dir, "orders").filter(
        "o_orderdate >= timestamp '1996-01-01' and "
        "o_orderdate < timestamp '1996-07-01'"
    )
    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    rev = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC))
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(rev).alias("_rev"), F.count(F.lit(1)).alias("_n")
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum("_rev").cast("double").alias("revenue"),
            F.sum("_n").cast("long").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_RETURNED_ITEMS_SQL = """
select c.c_custkey, c.c_name, n.n_name,
       cast(sum(cast(l.l_extendedprice as decimal(18,2))
                * (cast(1 as decimal(18,2))
                   - cast(l.l_discount as decimal(18,2)))) as double)
         as revenue,
       cast(count(*) as bigint) as n_items
from lineitem l
join orders o on l.l_orderkey = o.o_orderkey
join customer c on o.o_custkey = c.c_custkey
join nation n on c.c_nationkey = n.n_nationkey
where l.l_returnflag = 'R'
  and o.o_orderdate >= timestamp '1996-01-01'
  and o.o_orderdate < timestamp '1996-07-01'
group by c.c_custkey, c.c_name, n.n_name
order by revenue desc, c.c_custkey asc
limit 20
"""


def q_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped: yearly shipping volume between two nations, in
    both directions (supplier nation x customer nation). Scale shape:
    the two nation dimensions broadcast; supplier and customer joins
    key on the fact's own columns; the (supp_nation, cust_nation,
    year) aggregate is tiny and combines map-side. The nation-pair
    filter applies at the BROADCAST sides, so the fact never carries
    rows that can't qualify past the first join."""
    _utc(spark)
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    supp = _read(spark, sf_dir, "supplier")
    nation = _read(spark, sf_dir, "nation")
    n1 = nation.filter("n_name in ('NATION_3', 'NATION_7')").select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter("n_name in ('NATION_3', 'NATION_7')").select(
        F.col("n_nationkey").alias("_cn_key"), F.col("n_name").alias("cust_nation")
    )
    rev = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC))
    )
    return (
        li.join(supp.select("s_suppkey", "s_nationkey"),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sn_key"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_cn_key"))
        .filter("supp_nation <> cust_nation")
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(rev).cast("double").alias("volume"))
    )


_NATION_VOLUME_SQL = """
select sn.n_name as supp_nation, cn.n_name as cust_nation,
       cast(extract(year from l.l_shipdate) as int) as l_year,
       cast(sum(cast(l.l_extendedprice as decimal(18,2))
                * (cast(1 as decimal(18,2))
                   - cast(l.l_discount as decimal(18,2)))) as double)
         as volume
from lineitem l
join supplier s on l.l_suppkey = s.s_suppkey
join nation sn on s.s_nationkey = sn.n_nationkey
join orders o on l.l_orderkey = o.o_orderkey
join customer c on o.o_custkey = c.c_custkey
join nation cn on c.c_nationkey = cn.n_nationkey
where sn.n_name in ('NATION_3', 'NATION_7')
  and cn.n_name in ('NATION_3', 'NATION_7')
  and sn.n_name <> cn.n_name
group by 1, 2, 3
"""


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped: suppliers who were the SOLE late shipper on a
    multi-supplier order (fixture adaptation: 'late' = shipped more
    than 90 days after the order date; the fixture lacks receipt/
    commit dates). The classic correlated EXISTS + NOT EXISTS pair,
    expressed as one per-order aggregate instead of two correlated
    subqueries — Spark decorrelates those into joins anyway, and the
    aggregate form shuffles the (order, supplier) pairs exactly once.
    Top-20 by count with supplier-name tie-break."""
    _utc(spark)
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    pairs = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.expr(
                    "case when datediff(cast(l_shipdate as date),"
                    " cast(o_orderdate as date)) > 90 then 1 else 0 end"
                )
            ).alias("late")
        )
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late")
    )
    return (
        pairs.filter("late = 1")
        .join(per_order, "l_orderkey")
        .filter("n_supp > 1 and n_late = 1")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


_WAITING_SUPPLIERS_SQL = """
with pairs as (
  select l.l_orderkey, l.l_suppkey,
         max(case when datediff('day', cast(o.o_orderdate as date),
                                cast(l.l_shipdate as date)) > 90
                  then 1 else 0 end) as late
  from lineitem l join orders o on l.l_orderkey = o.o_orderkey
  group by l.l_orderkey, l.l_suppkey
),
per_order as (
  select l_orderkey, count(*) as n_supp, sum(late) as n_late
  from pairs group by l_orderkey
)
select s.s_name, cast(count(*) as bigint) as numwait
from pairs p
join per_order po on p.l_orderkey = po.l_orderkey
join supplier s on p.l_suppkey = s.s_suppkey
where p.late = 1 and po.n_supp > 1 and po.n_late = 1
group by s.s_name
order by numwait desc, s.s_name asc
limit 20
"""


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped: yearly revenue locked in small-quantity
    orders of one brand — lineitems whose quantity is under 20% of
    that part's average. The correlated scalar subquery (avg per
    part) decorrelates to one per-part aggregate joined back; the
    brand filter pushes to the part scan and prunes the fact via the
    join. Output is a 1-row gate aggregate (sum/7, the TPC-H form).

    Exactness: quantities are integral-valued doubles in the fixture,
    so the 20% test cross-multiplies integers (5*qty < sum/cnt scaled)
    instead of comparing float averages."""
    _utc(spark)
    li = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part").filter("p_brand = 'Brand#11'").select(
        "p_partkey"
    )
    fact = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    per_part = fact.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_sq"),
        F.count(F.lit(1)).alias("_nq"),
    )
    return (
        fact.join(per_part, "l_partkey")
        # qty < 0.2 * avg  ==  5 * qty * n < sum * ... all decimal-exact
        .filter(
            F.col("l_quantity").cast("decimal(18,2)") * 5 * F.col("_nq")
            < F.col("_sq")
        )
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast(_DEC))
                / F.lit(7.0)
            ).cast("double").alias("avg_yearly")
        )
    )


_SMALL_QTY_SQL = """
with fact as (
  select l.* from lineitem l
  join part p on l.l_partkey = p.p_partkey
  where p.p_brand = 'Brand#11'
),
per_part as (
  select l_partkey, sum(cast(l_quantity as decimal(18,2))) as sq,
         count(*) as nq
  from fact group by l_partkey
)
select cast(sum(cast(f.l_extendedprice as decimal(18,2))) / 7.0 as double)
         as avg_yearly
from fact f join per_part p on f.l_partkey = p.l_partkey
where cast(f.l_quantity as decimal(18,2)) * 5 * p.nq < p.sq
"""


def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped: distinct-supplier counts per (brand, type,
    size) for parts NOT supplied by a complaint-list supplier — the
    NOT IN anti-join + count(distinct) shape (the fixture derives the
    part-supplier relation from lineitem; the complaint list is the
    deterministic s_suppkey % 10 = 0 slice). The anti-join is a
    broadcast left-anti against the (small) blocklist; the distinct
    collapses (brand, type, size, suppkey) map-side before the final
    count shuffle."""
    _utc(spark)
    li = _read(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = _read(spark, sf_dir, "part").filter("p_size in (1, 5, 9, 13)")
    bad = (
        _read(spark, sf_dir, "supplier")
        .filter("s_suppkey % 10 = 0")
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"),
                "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count(F.lit(1)).cast("long").alias("supplier_cnt"))
    )


_SUPPLIER_PART_SQL = """
select p.p_brand, p.p_type, p.p_size,
       cast(count(distinct l.l_suppkey) as bigint) as supplier_cnt
from lineitem l
join part p on l.l_partkey = p.p_partkey
where p.p_size in (1, 5, 9, 13)
  and l.l_suppkey not in (
    select s_suppkey from supplier where s_suppkey % 10 = 0
  )
group by p.p_brand, p.p_type, p.p_size
"""


def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped: the supplier(s) with the maximum revenue over
    a 3-month shipping window (the classic revenue view + scalar-max
    subquery). The view is one per-supplier aggregate over the
    date-pruned fact; the max gate is a 1-row aggregate broadcast back
    (Spark decorrelates the scalar subquery to exactly this), and the
    supplier dim broadcasts. Revenue stays decimal-exact through the
    max-equality comparison — float maxima would make the tie test
    engine-dependent — and casts to double only at the output.

    Scale shape: one shuffle (the per-supplier aggregate, map-side
    combined); everything after operates on the tiny supplier-grain
    relation. Reference parity: read-side query surface of
    /root/reference/lib/AirtableDataFetcher.py:14-37 (scan+aggregate), TPC-H Q15
    adapted to fixture columns (no partsupp needed)."""
    _utc(spark)
    li = _read(spark, sf_dir, "lineitem").filter(
        "l_shipdate >= timestamp '1996-01-01'"
        " and l_shipdate < timestamp '1996-04-01'"
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast(_DEC)
            * (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC))
        ).alias("_rev")
    )
    gate = rev.agg(F.max("_rev").alias("_maxrev"))
    supp = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(gate), F.col("_rev") == F.col("_maxrev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("_rev").cast("double").alias("total_revenue"),
        )
    )


_TOP_SUPPLIER_SQL = """
with revenue as (
  select l_suppkey,
         sum(cast(l_extendedprice as decimal(18,2))
             * (cast(1 as decimal(18,2))
                - cast(l_discount as decimal(18,2)))) as rev
  from lineitem
  where l_shipdate >= timestamp '1996-01-01'
    and l_shipdate < timestamp '1996-04-01'
  group by l_suppkey
)
select s.s_suppkey, s.s_name, cast(r.rev as double) as total_revenue
from revenue r
join supplier s on r.l_suppkey = s.s_suppkey
where r.rev = (select max(rev) from revenue)
"""


def _ohlc_body(rel: str) -> str:
    """Hourly OHLC candlestick bars per event type — the resample
    step every time-series feature pipeline runs before modeling.
    Portable single body: open/close are row_number picks (first/last
    tick by (ts, event_id) — event_id breaks timestamp ties, so the
    pick is deterministic in both engines, unlike FIRST_VALUE whose
    null/tie semantics diverge), high/low are plain min/max (no
    arithmetic, bit-exact on the raw doubles), and the volume sum
    goes through decimal so partition order cannot perturb it."""
    return f"""
with pts as (
  select event_type, date_trunc('hour', ts) as hr, ts, event_id, value
  from {rel}
  where ts is not null and value is not null
),
rn as (
  select event_type, hr, value,
         row_number() over (
           partition by event_type, hr
           order by ts asc, event_id asc) as rf,
         row_number() over (
           partition by event_type, hr
           order by ts desc, event_id desc) as rl
  from pts
)
select event_type, hr,
       cast(count(*) as bigint) as n_ticks,
       max(case when rf = 1 then value end) as open,
       cast(max(value) as double) as high,
       cast(min(value) as double) as low,
       max(case when rl = 1 then value end) as close,
       cast(sum(cast(value as decimal(18,2))) as double) as volume
from rn
group by event_type, hr
"""


def q_events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type (see ``_ohlc_body``).

    Scale shape: the two window passes share one hash partitioning on
    (event_type, hr) — a single shuffle whose key count is bars, not
    ticks, then a partial-aggregating groupBy on the same key; output
    is |types| x |hours| rows regardless of tick volume. At 100 TB
    the bar grain keys are still tiny relative to ticks, so the plan
    stays one exchange + in-partition windows."""
    _utc(spark)
    read_events(spark, sf_dir).createOrReplaceTempView("_ffs_ohlc_events")
    return spark.sql(_ohlc_body("_ffs_ohlc_events"))


def _interp_body(dialect: str, rel: str) -> str:
    """Gap densification with LINEAR interpolation (the step beyond
    ``events_gapfill``'s LOCF): missing grid days get the straight
    line between their nearest observed neighbors, evaluated in
    integer cents so the interpolated value is engine-exact
    (``(prev*(next_i-i) + next*(i-prev_i)) intdiv (next_i-prev_i)``;
    Spark's ``div`` and DuckDB's ``//`` both truncate toward zero —
    probed ``-7 intdiv 2 = -3`` in each — so parity holds for
    negative daily sums too). Neighbor lookup is the
    portable two-window group trick in both directions (no IGNORE
    NULLS dialect divergence); leading/trailing gaps fall back to
    nearest-observation fill, tagged in ``fill_src``."""
    return _interp_from_daily(dialect, f"({_daily_cents_sql(rel)})")


def _daily_cents_sql(rel: str) -> str:
    """Shared daily-cents aggregate (the ONE corpus-grain pass of the
    interpolation pipeline) — split out so the Spark entry can
    materialize it once: the grid body references its daily relation
    three times, and Spark's CTE inlining would re-execute the
    corpus aggregate (and its scan) per reference — measured 4 full
    event scans in the single-body plan, 1 after materialization."""
    return f"""
select event_type, cast(date_trunc('day', ts) as date) as day,
       cast(floor(sum(cast(value as decimal(18,2))) * 100) as bigint)
         as v_cents
from {rel}
where ts is not null and value is not null
group by 1, 2
"""


def _interp_from_daily(dialect: str, drel: str) -> str:
    """Grid + interpolation over an already-aggregated daily relation
    (tiny: |types| x |days| rows — re-reference is harmless there)."""
    spark_d = dialect == SPARK_D
    if spark_d:
        spine = (
            "select explode(sequence(b.d0, b.d1, interval 1 day)) as day"
            " from bounds b"
        )
        idx = "datediff(s.day, b.d0)"
        idiv = "div"
    else:
        spine = (
            "select unnest(generate_series(b.d0, b.d1,"
            " interval 1 day))::date as day from bounds b"
        )
        idx = "(s.day - b.d0)"
        idiv = "//"
    return f"""
with d as (select * from {drel}),
bounds as (select min(day) as d0, max(day) as d1 from d),
spine as ({spine}),
grid as (
  select s.day, et.event_type, {idx} as i
  from spine s
  cross join (select distinct event_type from d) et
  cross join bounds b
),
g as (
  select gr.event_type, gr.day, gr.i, d.v_cents
  from grid gr
  left join d on d.event_type = gr.event_type and d.day = gr.day
),
fwd as (
  select event_type, day, i, v_cents,
         count(v_cents) over (
           partition by event_type order by i asc
           rows between unbounded preceding and current row) as fgrp
  from g
),
f2 as (
  select event_type, day, i, v_cents, fgrp,
         max(v_cents) over (partition by event_type, fgrp) as prev_v,
         max(case when v_cents is not null then i end)
           over (partition by event_type, fgrp) as prev_i
  from fwd
),
bwd as (
  select event_type, day, i, v_cents, prev_v, prev_i,
         count(v_cents) over (
           partition by event_type order by i desc
           rows between unbounded preceding and current row) as bgrp
  from f2
),
b2 as (
  select event_type, day, i, v_cents, prev_v, prev_i,
         max(v_cents) over (partition by event_type, bgrp) as next_v,
         min(case when v_cents is not null then i end)
           over (partition by event_type, bgrp) as next_i
  from bwd
)
select event_type, day,
       cast(case
         when v_cents is not null then v_cents
         when prev_v is not null and next_v is not null then
           (prev_v * (next_i - i) + next_v * (i - prev_i))
             {idiv} (next_i - prev_i)
         when prev_v is not null then prev_v
         else next_v end as bigint) as v_cents_filled,
       case when v_cents is not null then 'obs'
            when prev_v is not null and next_v is not null then 'interp'
            when prev_v is not null then 'locf'
            else 'bocf' end as fill_src
from b2
"""


def q_events_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation densification (see ``_interp_body``).

    Scale shape: the grid is days x types (tiny, built from one 2-row
    bounds aggregate); the corpus-wide work is one per-(type, day)
    partial aggregate, then four window passes that all share the
    per-type hash partitioning — Spark plans one exchange for the
    ascending pair and reuses sort order where it can. Row count out
    is the grid size, independent of event volume."""
    _utc(spark)
    # sparse slice so gap days actually occur (same trick as gapfill,
    # different threshold so the two entries exercise different grids)
    ev = read_events(spark, sf_dir).filter("value > 250")
    ev.createOrReplaceTempView("_ffs_interp_events")
    # materialize the one corpus-grain aggregate: the grid body
    # references it 3x and Spark's CTE inlining would re-run the scan
    # per reference (measured 4 event scans -> 1); the checkpoint is
    # |types| x |days| rows
    daily = spark.sql(
        _daily_cents_sql("_ffs_interp_events")
    ).localCheckpoint(eager=True)
    daily.createOrReplaceTempView("_ffs_interp_daily")
    return spark.sql(_interp_from_daily(SPARK_D, "_ffs_interp_daily"))


def _cusum_body(rel: str) -> str:
    """CUSUM changepoint detection per event type: the day whose
    cumulative deviation from the series mean is largest in absolute
    value (Page's statistic argmax). Kept integer-exact by scaling
    the mean away: ``n * prefix_sum(v) - i * total(v)`` equals
    ``n * cusum_i`` with v in cents — no float division anywhere, so
    the argmax (tie-broken by day) is engine-exact. Portable single
    body."""
    return f"""
with d as (
  select event_type, cast(date_trunc('day', ts) as date) as day,
         cast(floor(sum(cast(value as decimal(18,2))) * 100) as bigint) as v
  from {rel}
  where ts is not null and value is not null
  group by 1, 2
),
s as (
  select event_type, day, v,
         cast(row_number() over (
           partition by event_type order by day asc) as bigint) as i,
         sum(v) over (
           partition by event_type order by day asc
           rows between unbounded preceding and current row) as pre,
         sum(v) over (partition by event_type) as tot,
         cast(count(*) over (partition by event_type) as bigint) as n
  from d
),
c as (
  select event_type, day, n * pre - i * tot as cusum_scaled
  from s
),
r as (
  select event_type, day, cusum_scaled,
         row_number() over (
           partition by event_type
           order by abs(cusum_scaled) desc, day asc) as rk
  from c
)
select event_type, day as changepoint_day,
       cast(cusum_scaled as bigint) as cusum_scaled_by_n
from r where rk = 1
"""


def q_event_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint per event type (see ``_cusum_body``).

    Scale shape: one partial-aggregating groupBy to day grain, then
    windows over |days| rows per type — the expensive pass is the
    day-grain aggregate, everything after is per-type tiny. The
    argmax is a row_number top-1, not a self-join."""
    _utc(spark)
    read_events(spark, sf_dir).createOrReplaceTempView("_ffs_cusum_events")
    return spark.sql(_cusum_body("_ffs_cusum_events"))


#: t-closeness threshold, as a fraction num/den (Li et al. 2007)
TCLOSE_NUM, TCLOSE_DEN = 1, 5  # t = 0.2

TCLOSE_BODY = f"""
with b as (
  select c_nationkey, c_mktsegment,
         case when c_acctbal < 0 then 0
              when c_acctbal < 5000 then 1
              else 2 end as band
  from {{rel}}
),
g as (
  -- K=3 ordered bands PIVOTED to columns: one groupBy carries the
  -- whole per-group distribution, so no (group x band) grid, no
  -- zero-fill join, and the global marginals are one whole-relation
  -- window over the |QI-domain| rows (Spark re-executes an inlined
  -- CTE per reference; the 4-reference grid form planned 12
  -- exchanges, this plans 2)
  select c_nationkey, c_mktsegment,
         cast(sum(case when band = 0 then 1 else 0 end) as bigint) as c0,
         cast(sum(case when band = 1 then 1 else 0 end) as bigint) as c1,
         cast(sum(case when band = 2 then 1 else 0 end) as bigint) as c2
  from b group by 1, 2
),
w as (
  select c_nationkey, c_mktsegment, c0, c1, c2,
         c0 + c1 + c2 as grp_n,
         sum(c0) over () as g0,
         sum(c1) over () as g1,
         sum(c0 + c1 + c2) over () as tn
  from g
)
select c_nationkey, c_mktsegment, cast(grp_n as bigint) as grp_n,
       cast(abs(c0 * tn - g0 * grp_n)
            + abs((c0 + c1) * tn - (g0 + g1) * grp_n) as bigint)
         as emd_num,
       cast(2 * grp_n * tn as bigint) as emd_den,
       (abs(c0 * tn - g0 * grp_n)
        + abs((c0 + c1) * tn - (g0 + g1) * grp_n)) * {TCLOSE_DEN}
         <= 2 * grp_n * tn * {TCLOSE_NUM} as t_close
from w
"""


def q_tcloseness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li/Li/Venkatasubramanian 2007) — the third
    rung of the privacy-audit ladder after `kanon_risk_report` (group
    size) and `ldiversity_audit` (distinct sensitive values): a group
    can be large AND diverse yet still leak if its sensitive-value
    DISTRIBUTION diverges from the table's. Per quasi-identifier
    group, the Earth Mover's Distance between the group's and the
    global distribution over the ORDERED acctbal bands — for ordered
    1-D distributions with unit ground distance, EMD is the sum of
    absolute cumulative-probability gaps over the K-1 interior band
    boundaries, normalized by K-1. Kept as an exact integer fraction:
    numerator ``sum |cum_g*tn - cum_t*grp_n|``, denominator
    ``(K-1) * grp_n * tn`` (K=3), so the t<=0.2 flag is a pure
    integer comparison — engine-exact, no float EMD.

    Scale shape: ONE partial-aggregating groupBy with the K=3 band
    distribution pivoted to columns, then one whole-relation window
    for the global marginals — 2 exchanges total (the first grid-join
    draft planned 12: Spark re-executes an inlined CTE per
    reference). The unpartitioned window is over report-grain rows
    only (|QI domain|, never table-sized)."""
    _utc(spark)
    _read(spark, sf_dir, "customer").createOrReplaceTempView(
        "_ffs_tclose_customer"
    )
    return spark.sql(TCLOSE_BODY.format(rel="_ffs_tclose_customer"))


TCLOSE_SQL = TCLOSE_BODY.format(rel="customer")


AGG_QUERIES = {
    "agg_pricing_summary": q_pricing_summary,
    "agg_revenue_by_nation": q_revenue_by_nation,
    "window_topk_orders": q_topk_orders_per_customer,
    "events_window_agg": q_events_window_agg,
    "sessionization": q_sessionization,
    "agg_rollup": q_rollup_flag_status,
    "pivot_status_priority": q_pivot_status_by_priority,
    "json_props_extract": q_json_props,
    "variant_extract": q_variant_extract,
    "streaming_window_agg": q_streaming_window_agg,
    "streaming_dedup": q_streaming_dedup,
    "streaming_enrich_join": q_streaming_enrich_join,
    "streaming_rollup_store": q_streaming_rollup_store,
    "streaming_session_agg": q_streaming_session_agg,
    "streaming_range_join": q_streaming_range_join,
    "streaming_left_outer_join": q_streaming_left_outer_join,
    "returned_item_report": q_returned_items,
    "nation_volume_shipping": q_nation_volume_shipping,
    "waiting_suppliers": q_waiting_suppliers,
    "small_quantity_revenue": q_small_quantity_revenue,
    "supplier_part_counts": q_supplier_part_counts,
    "top_supplier_revenue": q_top_supplier_revenue,
    "streaming_ewma_state": q_streaming_ewma_state,
    "streaming_topk_state": q_streaming_topk_state,
    "set_ops": q_set_ops,
    "agg_cube": q_cube_agg,
    "agg_grouping_sets": q_grouping_sets,
    "rfm_segments": q_rfm_segments,
    "window_range_frame": q_window_range_frame,
    "scalar_functions": q_scalar_functions,
    "agg_multi_distinct": q_distinct_agg,
    "fuzzy_name_pairs": q_fuzzy_name_pairs,
    "agg_exact_median": q_exact_median,
    "word_count": q_word_count,
    "unpivot_metrics": q_unpivot,
    "approx_stats": q_approx_stats,
    "unshipped_revenue_topk": q_unshipped_revenue_topk,
    "order_priority_semi": q_order_priority_semi,
    "customer_order_histogram": q_customer_order_histogram,
    "large_orders": q_large_orders,
    "promo_revenue": q_promo_revenue,
    "disjunctive_revenue": q_disjunctive_revenue,
    "forecast_revenue": q_forecast_revenue,
    "event_funnel": q_funnel,
    "event_markov_transitions": q_markov_transitions,
    "ldiversity_audit": q_ldiversity,
    "calibration_conformal": q_conformal_outliers,
    "retention_cohorts": q_retention_cohorts,
    "event_mix_drift": q_event_mix_drift,
    "event_value_mad": q_event_value_mad,
    "streaming_drift": q_streaming_drift,
    "nation_market_share": q_nation_market_share,
    "idle_rich_customers": q_idle_rich_customers,
    "window_suite": q_window_suite,
    "events_gapfill": q_events_gapfill,
    "events_user_trend": q_events_user_trend,
    "events_max_concurrency": q_events_max_concurrency,
    "kanon_risk_report": q_kanon_risk,
    "events_dow_profile": q_events_dow_profile,
    "event_iqr_udaf": q_event_iqr_udaf,
    "events_ohlc_bars": q_events_ohlc,
    "events_interpolate": q_events_interpolate,
    "event_changepoint_cusum": q_event_changepoint,
    "tcloseness_audit": q_tcloseness,
}

AGG_ORACLES = {
    "agg_pricing_summary": PRICING_SUMMARY_SQL,
    "agg_revenue_by_nation": REVENUE_BY_NATION_SQL,
    "window_topk_orders": TOPK_ORDERS_SQL,
    "events_window_agg": EVENTS_WINDOW_SQL,
    "sessionization": SESSIONIZATION_SQL,
    "agg_rollup": ROLLUP_SQL,
    "pivot_status_priority": PIVOT_SQL,
    "json_props_extract": JSON_PROPS_SQL,
    "variant_extract": VARIANT_EXTRACT_SQL,
    "streaming_window_agg": STREAMING_WINDOW_SQL,
    "streaming_dedup": STREAMING_DEDUP_SQL,
    "streaming_enrich_join": STREAMING_ENRICH_SQL,
    "streaming_rollup_store": STREAMING_ROLLUP_SLICE_SQL,
    "streaming_session_agg": STREAMING_SESSION_SQL,
    "streaming_left_outer_join": STREAMING_LEFT_OUTER_SQL,
    "returned_item_report": _RETURNED_ITEMS_SQL,
    "nation_volume_shipping": _NATION_VOLUME_SQL,
    "waiting_suppliers": _WAITING_SUPPLIERS_SQL,
    "small_quantity_revenue": _SMALL_QTY_SQL,
    "supplier_part_counts": _SUPPLIER_PART_SQL,
    "top_supplier_revenue": _TOP_SUPPLIER_SQL,
    "streaming_ewma_state": _STREAMING_EWMA_SQL,
    "streaming_topk_state": _STREAMING_TOPK_SQL,
    "set_ops": SET_OPS_SQL,
    "agg_cube": CUBE_SQL,
    "agg_grouping_sets": GROUPING_SETS_SQL,
    "rfm_segments": RFM_SEGMENTS_SQL,
    "window_range_frame": WINDOW_RANGE_FRAME_SQL,
    "scalar_functions": SCALAR_FUNCS_SQL,
    "agg_multi_distinct": DISTINCT_AGG_SQL,
    "fuzzy_name_pairs": FUZZY_NAME_SQL,
    "agg_exact_median": MEDIAN_SQL,
    "word_count": WORD_COUNT_SQL,
    "unpivot_metrics": UNPIVOT_SQL,
    "approx_stats": APPROX_STATS_SQL,
    "unshipped_revenue_topk": UNSHIPPED_REVENUE_SQL,
    "order_priority_semi": ORDER_PRIORITY_SEMI_SQL,
    "customer_order_histogram": CUSTOMER_ORDER_HISTOGRAM_SQL,
    "large_orders": LARGE_ORDERS_SQL,
    "promo_revenue": PROMO_REVENUE_SQL,
    "disjunctive_revenue": DISJUNCTIVE_REVENUE_SQL,
    "forecast_revenue": FORECAST_REVENUE_SQL,
    "event_funnel": FUNNEL_SQL,
    "event_markov_transitions": MARKOV_SQL,
    "ldiversity_audit": LDIV_SQL,
    "calibration_conformal": CONFORMAL_SQL,
    "retention_cohorts": COHORT_SQL,
    "event_mix_drift": EVENT_DRIFT_SQL,
    "event_value_mad": EVENT_MAD_SQL,
    "streaming_drift": EVENT_DRIFT_SQL,
    "nation_market_share": MARKET_SHARE_SQL,
    "idle_rich_customers": IDLE_RICH_SQL,
    "window_suite": WINDOW_SUITE_SQL,
    "events_gapfill": _gapfill_body(
        DUCK_D, "(select * from events where value > 190)"
    ),
    "kanon_risk_report": KANON_SQL,
    "events_dow_profile": _dow_profile_body(DUCK_D, "events"),
    "events_user_trend": _user_trend_body(DUCK_D, "events"),
    "events_max_concurrency": _max_concurrency_body(DUCK_D, "events"),
    "event_iqr_udaf": EVENT_IQR_SQL,
    "events_ohlc_bars": _ohlc_body("events"),
    "events_interpolate": _interp_body(
        DUCK_D, "(select * from events where value > 250)"
    ),
    "event_changepoint_cusum": _cusum_body("events"),
    "tcloseness_audit": TCLOSE_SQL,
}


#: equi-depth histogram buckets
EQUIDEPTH_BUCKETS = 8

EQUIDEPTH_SQL = f"""
with ranked as (
  select value, event_id,
         row_number() over (order by value asc, event_id asc) as rn,
         count(*) over () as n
  from events where value is not null
)
select cast((rn - 1) * {EQUIDEPTH_BUCKETS} // n as int) as bucket,
       cast(count(*) as bigint) as n_rows,
       min(cast(floor(value * cast(64 as double)) as bigint)) as lo_64,
       max(cast(floor(value * cast(64 as double)) as bigint)) as hi_64
from ranked
group by 1
"""


def q_events_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth histogram of event values (8 buckets of equal
    row count, rank-cut boundaries) — the optimizer-statistics /
    data-profiling shape, built DISTRIBUTED:

    a naive ``row_number() over (order by value)`` collapses the whole
    table into ONE task (a global window has a single partition — the
    classic 100 TB scale killer). Here global ranks come from the
    distributed exact-rank recipe instead: range-repartition on the
    total order, sort within partitions, compute per-partition local
    ranks, and add the prefix sum of partition counts (a tiny
    O(partitions) broadcastable side). ``repartitionByRange`` samples
    its boundaries nondeterministically; ranks over a UNIQUE total
    order (value, event_id) are boundary-invariant ONLY when the
    offsets branch and the rank-join branch observe the SAME sampled
    boundaries — which is exactly what the eager localCheckpoint
    below pins (do NOT remove it as an 'optimization': without it the
    two consumers only agree while Spark's exchange reuse happens to
    kick in; r8 review finding). The DuckDB oracle runs the plain
    single-window SQL — same answer, two plan shapes.

    Bucket values are exact integers (floor(value*64) grid +
    rank-derived cuts), so the value hash is engine-stable on any
    data."""
    from pyspark.sql import Window

    _utc(spark)
    ev = (
        read_events(spark, sf_dir)
        .filter("value is not null")
        .select("value", "event_id")
    )
    # pid = the RANGE partition index (ordered: every value in pid i
    # sorts before every value in pid i+1); the per-pid window below
    # does its own local sort, so no sortWithinPartitions needed.
    # localCheckpoint: this plan feeds BOTH the offsets branch and the
    # rank join, and repartitionByRange samples its boundaries
    # nondeterministically — without pinning, the two branches only
    # see the SAME boundaries while Spark's exchange reuse happens to
    # kick in (r8 review finding; same pattern as the textrank pairs).
    parts = (
        ev.repartitionByRange(32, F.col("value"), F.col("event_id"))
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_local = Window.partitionBy("pid").orderBy("value", "event_id")
    local = parts.withColumn("lrn", F.row_number().over(w_local))
    sizes = local.groupBy("pid").agg(F.max("lrn").alias("cnt"))
    w_prefix = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = sizes.select(
        "pid",
        F.coalesce(F.sum("cnt").over(w_prefix), F.lit(0)).alias("off"),
        F.sum("cnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    ranked = local.join(F.broadcast(offsets), "pid").select(
        "value",
        (F.col("lrn") + F.col("off")).alias("rn"),
        "n",
    )
    return ranked.select(
        F.expr(
            f"cast((rn - 1) * {EQUIDEPTH_BUCKETS} div n as int)"
        ).alias("bucket"),
        F.expr("cast(floor(value * cast(64 as double)) as bigint)").alias(
            "v64"
        ),
    ).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("v64").alias("lo_64"),
        F.max("v64").alias("hi_64"),
    )


AGG_QUERIES["events_equidepth_hist"] = q_events_equidepth_hist
AGG_ORACLES["events_equidepth_hist"] = EQUIDEPTH_SQL
