"""JSONL (newline-delimited JSON) source/sink — the interchange format
LLM corpora actually ship in (The Pile, Dolma, FineWeb all publish
JSONL/JSONL.gz shards).

Spark-first: JSONL IS Spark's native ``json`` source (one object per
line), so both directions are the built-in distributed reader/writer —
no Python in the data path. What this module adds on top:

- **Explicit schema on read** (never ``inferSchema`` at scale: schema
  inference is a full extra pass over 100 TB).
- **Corrupt-line quarantine**: PERMISSIVE mode + ``_corrupt_record``
  splits bad lines into an auditable dead-letter frame instead of
  failing the job or silently dropping data — same contract as the
  typed-projection quarantine (operators/casts.py).
- **Deterministic column order on write** (sorted, or caller-pinned),
  so shards are diffable across runs.

The gzip path is free: Spark reads ``.jsonl.gz`` transparently and
``compression="gzip"`` writes it; at scale prefer zstd.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: column Spark routes unparseable lines into (PERMISSIVE mode)
CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> Tuple[DataFrame, DataFrame]:
    """Read a JSONL directory/file with an explicit schema.

    Returns ``(good, quarantine)``: rows that parsed cleanly, and a
    dead-letter frame of ``(raw_line)`` for lines that didn't (bad
    JSON, or JSON whose fields can't cast to the schema).

    Implementation: ONE ``text`` scan + ``from_json``, not the native
    json reader. Spark disallows plans whose scan references only the
    corrupt column (SPARK-26228 — and column pruning reduces
    ``good.count()`` to exactly that); the documented ``.cache()``
    workaround is a non-starter at corpus scale. ``from_json`` is
    exempt, costs the same single line-parse pass JSONL always costs
    (a row format has no columnar pruning to lose), and the quarantine
    side needs the raw line materialized anyway. Each returned frame
    is an independent one-pass distributed plan over the same files.
    """
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = spark.read.text(path).select(
        "value",
        F.from_json(
            "value",
            with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_j"),
    )
    # Blank lines (trailing newlines, shard padding) are SKIPPED, same
    # as the native json reader — from_json returns a null struct for
    # them, which must not surface as an all-null "good" row. A null
    # struct for a NON-blank line is unexpected input -> quarantine.
    blank = F.trim(F.col("value")) == ""
    good = (
        parsed.filter(
            ~blank
            & F.col("_j").isNotNull()
            & F.col(f"_j.{CORRUPT_COL}").isNull()
        )
        .select("_j.*")
        .drop(CORRUPT_COL)
    )
    quarantine = parsed.filter(
        ~blank
        & (F.col("_j").isNull() | F.col(f"_j.{CORRUPT_COL}").isNotNull())
    ).select(F.col("value").alias("raw_line"))
    return good, quarantine


def write_jsonl(
    df: DataFrame,
    path: str,
    column_order: Optional[Sequence[str]] = None,
    compression: Optional[str] = None,
) -> list[str]:
    """Write ``df`` as JSONL with deterministic column order (sorted
    unless pinned by ``column_order``). Returns the order used.

    Distributed write — one shard per partition; pair with
    ``repartition(n)`` / ``corpus_shard_shuffle`` upstream to control
    shard count and size.
    """
    if column_order:
        missing = set(column_order) - set(df.columns)
        if missing:
            raise ValueError(f"column_order names absent columns: {missing}")
        order = list(column_order)
    else:
        order = sorted(df.columns)
    w = df.select(*order).write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
    return order
