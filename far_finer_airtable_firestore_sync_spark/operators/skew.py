"""Skew mitigation: salted aggregation and salted joins.

At 100 TB a handful of hot keys (boilerplate documents, null-ish
defaults, celebrity users) can pin a whole stage on one task. AQE's
skew-join splitting handles the join case at runtime; these operators
are the *plan-level* mitigation for aggregations (AQE does not split
skewed aggregation partitions) and for joins where the salt factor
should be chosen from domain knowledge.

Two-stage salted aggregate: stage 1 aggregates on (key, salt) — the
hot key's rows spread over ``salt_buckets`` tasks and collapse to
``salt_buckets`` partial rows; stage 2 merges partials per key. Works
for any algebraic aggregate (sum/count/min/max — pass the merge
function); result is identical to the unsalted plan.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: aggregate -> (stage1 fn, stage2 merge fn)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    key: str,
    aggs: Mapping[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe ``groupBy(key).agg(...)``.

    ``aggs``: output column -> (aggregate name, input column), e.g.
    ``{"total": ("sum", "value"), "n": ("count", "value")}``.
    """
    salt = (F.crc32(F.col(key).cast("string")) + F.spark_partition_id()) % salt_buckets
    stage1_cols: list[Column] = []
    stage2_cols: list[Column] = []
    for out, (agg_name, in_col) in aggs.items():
        s1, s2 = _ALGEBRAIC[agg_name]
        stage1_cols.append(s1(F.col(in_col)).alias(f"_p_{out}"))
        stage2_cols.append(s2(F.col(f"_p_{out}")).alias(out))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(*stage1_cols)
    )
    return partial.groupBy(key).agg(*stage2_cols)


def salted_join(
    left: DataFrame,
    right_small_per_key: DataFrame,
    on: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: salt the (large, skewed) left side and
    explode the right side across every salt bucket — right-side rows
    replicate ``salt_buckets``×, so use for sides that are small *per
    key* (dimension updates, key-level metadata)."""
    l = left.withColumn(
        "_salt",
        (F.crc32(F.col(on).cast("string")) + F.spark_partition_id()) % salt_buckets,
    )
    r = right_small_per_key.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast(l.schema["_salt"].dataType))
    return l.join(r, on=[on, "_salt"]).drop("_salt")
