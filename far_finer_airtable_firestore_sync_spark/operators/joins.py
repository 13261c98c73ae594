"""Temporal joins Spark lacks natively: as-of and range joins.

Not in the reference (SURVEY.md §2.4: "No theta/range/as-of/interval
joins exist in the reference"), but part of the engine's native query
surface — event/state enrichment is a staple of training-data and
sync pipelines (e.g. joining each event to the latest dimension
version produced by the VERSIONED strategies).

**As-of join, the scale-safe way:** the naive formulation (theta join
`r.ts <= l.ts` + keep latest) explodes to O(|L|·|R|) per key. The
union-sort trick keeps it linear: tag both sides, union them, and for
each left row take the running "last right row seen" with a window
`last_value(... ignore nulls)` ordered by (ts, side) — ONE shuffle on
the join key, no theta join anywhere. This is the standard
merge-asof-as-a-window pattern.

**Range join:** equi-join on a coarse time *bucket* (plus neighbor
bucket) then filter the exact predicate — turns the theta join into an
equi-join whose fan-out is bounded by bucket width, the same
bucketize-then-filter strategy Databricks' range-join optimization
applies.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance_us: Optional[int] = None,
) -> DataFrame:
    """For each left row: the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` key (and within
    ``tolerance_us`` microseconds, if given).

    Output: all left columns + right's non-key columns (null when no
    right row qualifies). Right-side ties on ``right_ts`` resolve to
    the row latest in the union sort order (deterministic given unique
    right (key, ts); callers needing stronger tie-breaks should
    pre-dedup the right side with keep_latest).
    """
    lcols = left.columns
    rcols = [c for c in right.columns if c != on]
    r_payload = F.struct(*[F.col(c) for c in rcols])

    tagged_l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(right.select(r_payload).schema[0].dataType).alias("_r"),
    )
    tagged_r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.select(F.struct(*lcols)).schema[0].dataType).alias("_l"),
        r_payload.alias("_r"),
    )
    unioned = tagged_l.unionByName(tagged_r)
    # right rows (side 0) sort before left rows at equal ts -> a right
    # row AT the left timestamp is visible to it (<= semantics).
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        unioned.withColumn("_last_r", F.last("_r", ignorenulls=True).over(w))
        .withColumn("_last_rts", F.last(
            F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True
        ).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance_us is not None:
        in_tol = (
            F.unix_micros(F.col("_ts")) - F.unix_micros(F.col("_last_rts"))
        ) <= tolerance_us
        matched = matched.withColumn(
            "_last_r", F.when(in_tol, F.col("_last_r"))
        )
    out = [F.col(f"_l.{c}").alias(c) for c in lcols]
    out += [F.col(f"_last_r.{c}").alias(c) for c in rcols]
    return matched.select(*out)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    bucket_us: Optional[int] = None,
) -> DataFrame:
    """Pairs (l, r) on the same key with
    ``lower_us <= right_ts - left_ts <= upper_us``.

    Bucketized: both sides are exploded onto coarse time buckets sized
    to the range span, equi-joined on (key, bucket), then the exact
    predicate filters — fan-out per row is ceil(span/bucket)+1, never
    the whole key group.
    """
    if bucket_us is None:
        bucket_us = max(upper_us - lower_us, 1)
    l = left.withColumn(
        "_lb", (F.unix_micros(F.col(left_ts)) + F.lit(lower_us)) / F.lit(bucket_us)
    ).withColumn(
        "_ub", (F.unix_micros(F.col(left_ts)) + F.lit(upper_us)) / F.lit(bucket_us)
    )
    l = l.withColumn(
        "_bucket",
        F.explode(
            F.sequence(F.floor("_lb").cast("long"), F.floor("_ub").cast("long"))
        ),
    ).drop("_lb", "_ub")
    r = right.withColumn(
        "_bucket", F.floor(F.unix_micros(F.col(right_ts)) / F.lit(bucket_us)).cast("long")
    )
    delta = F.unix_micros(F.col(f"r.{right_ts}")) - F.unix_micros(F.col(f"l.{left_ts}"))
    # a right row lands in exactly one bucket and the left covers each
    # bucket once, so no pair duplicates -> no distinct needed
    return (
        l.alias("l")
        .join(
            r.alias("r"),
            (F.col(f"l.{on}") == F.col(f"r.{on}"))
            & (F.col("l._bucket") == F.col("r._bucket")),
        )
        .filter((delta >= lower_us) & (delta <= upper_us))
        .select(
            *[F.col(f"l.{c}").alias(c) for c in left.columns],
            *[F.col(f"r.{c}").alias(f"r_{c}") for c in right.columns if c != on],
        )
    )
