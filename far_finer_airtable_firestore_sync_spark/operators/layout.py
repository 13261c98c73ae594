"""Storage-layout operators: Z-order (Morton) clustering keys.

Multi-dimensional data skipping: parquet/Delta prune row groups by
per-file min/max statistics, but sorting on one column destroys
locality on every other. Interleaving the bits of two dimensions into
one Morton key and range-partitioning on it gives every file a small
bounding BOX in (x, y) space, so predicates on EITHER dimension prune
files. This is the standard Z-ORDER layout (public Delta/Iceberg
feature); here it is a pure-SQL bit-interleave both engines compute
identically, so even the layout key is oracle-verifiable.

At 100 TB the write path is ``zorder_layout`` =
``repartitionByRange(zkey)`` + ``sortWithinPartitions`` — one range
shuffle at write time buys min/max pruning on every later scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from far_finer_airtable_firestore_sync_spark.functions.canonical import SPARK

#: magic masks of the classic 16-bit bit-spread (x -> even bit lanes)
_SPREAD_STEPS = (
    (8, 16711935),  # 0x00FF00FF
    (4, 252645135),  # 0x0F0F0F0F
    (2, 858993459),  # 0x33333333
    (1, 1431655765),  # 0x55555555
)


def _shl(expr: str, n: int, dialect: str) -> str:
    if dialect == SPARK:
        return f"shiftleft({expr}, {n})"
    return f"({expr} << {n})"


def _spread16(expr: str, dialect: str) -> str:
    """Spread the low 16 bits of ``expr`` into the even bit positions
    of a 32-bit lane (classic magic-mask cascade, integer-exact).

    The input is cast to bigint FIRST: an IntegerType input whose bit
    15 is set would otherwise reach bit 31 after the interleave shift
    and wrap negative under 32-bit shiftleft (Spark) while staying
    positive in DuckDB — breaking both key order and parity."""
    out = f"(cast({expr} as bigint) & 65535)"
    for n, mask in _SPREAD_STEPS:
        out = f"(({out} | {_shl(out, n, dialect)}) & {mask})"
    return out


def morton_key_expr(x: str, y: str, dialect: str) -> str:
    """32-bit Morton (Z-order) interleave of two 16-bit dimensions —
    bit i of x lands at position 2i, bit i of y at 2i+1. Pure
    shift/mask arithmetic on bigint: bit-identical in Spark and
    DuckDB."""
    return (
        f"({_spread16(x, dialect)} | "
        f"{_shl(_spread16(y, dialect), 1, dialect)})"
    )


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_files: int = 32,
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition on the Morton key of
    (x, y) and sort within partitions, so each output file covers a
    compact rectangle of the key space and its min/max column stats
    prune scans filtered on either dimension. Returns the clustered
    frame (caller writes it); ``_zkey`` is kept so tests can assert
    the range partitioning."""
    keyed = df.withColumn(
        "_zkey",
        F.expr(morton_key_expr(f"`{x_col}`", f"`{y_col}`", SPARK)),
    )
    return keyed.repartitionByRange(n_files, "_zkey").sortWithinPartitions(
        "_zkey"
    )


def zorder_bucket_profile(
    df: DataFrame,
    x_col: str,
    y_col: str,
    order_col: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Layout-quality profile: assign every row to one of ``n_buckets``
    equal-size buckets in Morton-key order (what range partitioning
    produces) and report each bucket's (x, y) bounding box + row
    count. Tight per-bucket boxes == effective data skipping.

    The global ``ntile`` is the profiling shortcut for a bounded
    report (fixture scale); the production write path is
    :func:`zorder_layout`'s range repartition, which needs no global
    sort. Ties in the key order break on ``order_col`` so bucket
    assignment is deterministic on any engine."""
    from pyspark.sql import Window

    keyed = df.select(
        F.col(x_col),
        F.col(y_col),
        F.expr(morton_key_expr(f"`{x_col}`", f"`{y_col}`", SPARK)).alias(
            "_zkey"
        ),
        F.col(order_col).alias("_ord"),
    )
    w = Window.orderBy(F.col("_zkey").asc(), F.col("_ord").asc())
    return (
        keyed.withColumn("bucket", F.ntile(n_buckets).over(w))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(x_col).alias("x_min"),
            F.max(x_col).alias("x_max"),
            F.min(y_col).alias("y_min"),
            F.max(y_col).alias("y_max"),
        )
    )


def zorder_bucket_profile_sql(
    x_expr: str,
    y_expr: str,
    order_col: str,
    table: str,
    dialect: str,
    n_buckets: int = 32,
) -> str:
    """Oracle twin of :func:`zorder_bucket_profile` (``x_expr`` /
    ``y_expr`` are the dimension expressions in the oracle dialect)."""
    zkey = morton_key_expr("x", "y", dialect)
    return f"""
with keyed as (
  select {x_expr} as x, {y_expr} as y, {order_col} as ord from {table}
),
zk as (select x, y, ord, {zkey} as zkey from keyed),
b as (
  select x, y,
         ntile({n_buckets}) over (order by zkey asc, ord asc) as bucket
  from zk
)
select bucket, count(*) as n_rows,
       min(x) as x_min, max(x) as x_max,
       min(y) as y_min, max(y) as y_max
from b group by bucket
"""


def compact_small_files(
    spark,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
):
    """Small-files compaction — the table-maintenance pass every
    long-running ingest needs (micro-batch sinks and per-epoch
    strategy commits accrete kilobyte parquet files whose per-file
    open/footer cost eventually dominates scans).

    Sizes the output file count from the INPUT byte total
    (ceil(bytes/target)), rewrites with a round-robin repartition
    (no shuffle key needed — compaction preserves no order contract),
    and returns a 1-row stats frame
    (files_before, files_after, bytes_before, n_rows).

    At 100 TB this runs per partition-directory, not per table, so
    each compaction job is bounded; pair with `zorder_layout` when
    the rewrite should also re-cluster. LOCAL-FILESYSTEM paths only
    (driver-side os.listdir sizing) — an object-store variant would
    size via the Hadoop FileSystem API instead.
    """
    import math
    import os

    if os.path.abspath(dst_dir) == os.path.abspath(src_dir):
        # overwrite would delete source files the lazy read still
        # needs — in-place compaction must go through a temp dir
        raise ValueError("compact_small_files: dst_dir must differ from src_dir")

    # Walk recursively: hive-partitioned / nested layouts keep their
    # parquet under subdirectories, and a top-level-only listing would
    # size the input at 0 bytes and coalesce everything into one file.
    files = [
        os.path.join(root, f)
        for root, _dirs, names in os.walk(src_dir)
        for f in names
        if f.endswith(".parquet")
    ]
    bytes_before = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(bytes_before / target_bytes))
    df = spark.read.parquet(src_dir)
    n_rows = df.count()
    df.repartition(n_out).write.mode("overwrite").parquet(dst_dir)
    out_files = [
        f for f in os.listdir(dst_dir) if f.endswith(".parquet")
    ]
    return spark.createDataFrame(
        [(len(files), len(out_files), bytes_before, n_rows)],
        "files_before int, files_after int, bytes_before long, n_rows long",
    )
