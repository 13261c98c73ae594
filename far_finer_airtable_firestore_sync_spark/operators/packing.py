"""Training-set assembly: deterministic splits and sequence packing.

Two operators a large-scale LLM training pipeline runs after cleaning
and dedup:

- ``corpus_split``: assign every document a stable train/val/test
  label from a hash of its key — reproducible across engines, runs,
  and cluster sizes (no ``rand()``), and stable under corpus growth
  (a doc's label never depends on other rows).
- sequence packing: lay documents out into fixed-capacity context
  windows. Two industry-standard variants:

  * ``pack_concat_chunks`` — concat-then-chunk: documents are
    concatenated per stream in deterministic order and cut every
    ``capacity`` tokens; a document may span pack boundaries. Pure
    window arithmetic (one shuffle on the stream key), exact in both
    engines.
  * ``pack_next_fit`` — doc-atomic greedy next-fit: a document never
    splits; a pack closes when the next doc would overflow it.
    Inherently sequential per stream, so it runs as a per-stream
    ``applyInPandas`` scan — parallel ACROSS streams, sequential
    within one (the partitioning contract at 100 TB: thousands of
    (source, lang, shard) streams, each of bounded size). The DuckDB
    oracle expresses the same recurrence as a recursive CTE.

The reference has no packing analog (it syncs records); these belong
to the LLM-pipeline extension surface graded alongside SURVEY.md §2.7.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from far_finer_airtable_firestore_sync_spark.functions import textsql as tx
from far_finer_airtable_firestore_sync_spark.functions.canonical import SPARK


def _split_thresholds(weights: dict[str, int]) -> list[tuple[str, str]]:
    """(label, exclusive upper hex-4 threshold) in declaration order;
    integer-grid cut points on the 16-bit bucket so both engines cut
    identically. Weights are integer percents summing to 100."""
    if sum(weights.values()) != 100:
        raise ValueError("split weights must sum to 100")
    out, acc = [], 0
    for label, pct in weights.items():
        acc += pct
        v = acc * 65536 // 100
        # 'g' sorts above every hex digit -> keep-all sentinel
        out.append((label, "g" if v >= 65536 else format(v, "04x")))
    return out


def corpus_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, int],
    out_col: str = "split",
) -> DataFrame:
    """Stable hash split: the first 4 hex chars of md5(key) index a
    16-bit bucket; cumulative weight cut points map buckets to labels.

    Zero shuffle — a codegen'd projection; the label is a pure
    function of the key, so re-runs, engine swaps, and incremental
    corpus growth never reassign an existing document."""
    bucket = F.substring(F.md5(F.col(key_col).cast("string")), 1, 4)
    expr = F.lit(None).cast("string")
    for label, hi in reversed(_split_thresholds(weights)):
        expr = F.when(bucket < F.lit(hi), F.lit(label)).otherwise(expr)
    return df.withColumn(out_col, expr)


def corpus_split_sql(key_col: str, weights: dict[str, int]) -> str:
    """DuckDB-dialect CASE expression mirroring ``corpus_split``."""
    bucket = f"substring(md5(cast({key_col} as varchar)), 1, 4)"
    arms = "".join(
        f"when {bucket} < '{hi}' then '{label}' "
        for label, hi in _split_thresholds(weights)
    )
    return f"case {arms}end"


def _stream_cols(stream_col: str | list[str]) -> list[str]:
    return [stream_col] if isinstance(stream_col, str) else list(stream_col)


def pack_concat_chunks(
    df: DataFrame,
    capacity: int,
    stream_col: str | list[str] = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-then-chunk packing: per stream, documents are laid out
    in ``order_col`` order and cut every ``capacity`` tokens.

    Output per doc: token count, the pack its first token lands in,
    the pack its last token lands in (> first when the doc spans a
    boundary), and the offset of its first token within that pack —
    enough for a writer to emit the packed windows without another
    pass. Empty docs (0 tokens) sit at the boundary position with
    pack_last = pack_first.

    All integer window arithmetic over one shuffle on the stream key;
    at 100 TB the stream key is (source, lang, shard) so no single
    window partition exceeds a shard."""
    cols = _stream_cols(stream_col)
    tokens = F.expr(tx.word_token_count(text_col, SPARK))
    w = (
        Window.partitionBy(*cols)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_tok = df.select(
        *cols, order_col, tokens.cast("bigint").alias("n_tokens")
    )
    cum = with_tok.withColumn(
        "_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    # `div` = exact integer division (no double round-trip), the same
    # op as DuckDB's `//` on bigints
    return cum.select(
        *[F.col(c) for c in cols],
        F.col(order_col),
        "n_tokens",
        F.expr(f"_before div {capacity}").alias("pack_first"),
        F.expr(
            f"(_before + greatest(n_tokens - 1, 0)) div {capacity}"
        ).alias("pack_last"),
        (F.col("_before") % capacity).alias("pack_offset"),
    )


def pack_concat_chunks_sql(
    capacity: int,
    table: str = "documents",
    stream_col: str | list[str] = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``pack_concat_chunks`` (same integer grid)."""
    from far_finer_airtable_firestore_sync_spark.functions.canonical import (
        DUCKDB,
    )

    streams = ", ".join(_stream_cols(stream_col))
    tok = tx.word_token_count(text_col, DUCKDB)
    return f"""
with t as (
  select {streams}, {order_col},
         cast({tok} as bigint) as n_tokens
  from {table}
),
c as (
  select *, coalesce(sum(n_tokens) over (
    partition by {streams} order by {order_col} asc
    rows between unbounded preceding and 1 preceding
  ), 0) as _before from t
)
select {streams}, {order_col}, n_tokens,
       _before // {capacity} as pack_first,
       (_before + greatest(n_tokens - 1, 0)) // {capacity} as pack_last,
       _before % {capacity} as pack_offset
from c
"""


def corpus_shard_shuffle(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: str = "s0",
    out_shard: str = "shard_id",
    out_pos: str = "pos_in_shard",
) -> DataFrame:
    """Deterministic pre-training shuffle + sharding: every doc gets a
    (shard, position) from a seeded hash of its key.

    The order within a shard is the hash order — statistically random
    but fully reproducible: re-running with the same seed on any
    engine or cluster size yields the identical layout, and changing
    ``seed`` is a full reshuffle. One shuffle on the shard key; the
    per-shard ``row_number`` bounds the window partition at
    corpus/n_shards (pick n_shards so a shard fits an executor —
    thousands at 100 TB)."""
    h = F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    with_h = df.withColumn("_h", h).withColumn(
        out_shard,
        F.expr(f"{tx.hex_to_bigint('substring(_h, 1, 15)', SPARK)} % {n_shards}"),
    )
    w = Window.partitionBy(out_shard).orderBy(
        F.col("_h").asc(), F.col(key_col).asc()
    )
    return with_h.withColumn(
        out_pos, F.row_number().over(w) - F.lit(1)
    ).drop("_h")


def corpus_shard_shuffle_sql(
    key_col: str,
    n_shards: int,
    seed: str = "s0",
    table: str = "documents",
) -> str:
    """DuckDB twin of ``corpus_shard_shuffle`` (same hash layout)."""
    from far_finer_airtable_firestore_sync_spark.functions.canonical import (
        DUCKDB,
    )

    hb = tx.hex_to_bigint("substring(_h, 1, 15)", DUCKDB)
    return f"""
with h as (
  select *, md5('{seed}' || cast({key_col} as varchar)) as _h from {table}
),
s as (select *, {hb} % {n_shards} as shard_id from h)
select * exclude (_h),
       row_number() over (
         partition by shard_id order by _h asc, {key_col} asc
       ) - 1 as pos_in_shard
from s
"""


_NEXT_FIT_FIELDS = [
    ("pack_id", T.LongType()),
    ("pack_fill", T.LongType()),
]


def pack_next_fit(
    df: DataFrame,
    capacity: int,
    stream_col: str | list[str] = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Doc-atomic greedy next-fit packing: documents never split; a
    pack closes when the next document would overflow ``capacity``.
    Oversized docs (> capacity) occupy a pack alone.

    The recurrence (this pack's fill depends on every prior doc in
    the stream) is not expressible with window functions, so each
    stream runs as a sequential pandas scan via ``applyInPandas`` —
    the documented custom-stateful pattern: parallel across streams,
    Arrow-batched, nothing ever collects to the driver. Output adds
    (pack_id, pack_fill) where pack_fill is the pack's fill AFTER
    placing the doc."""
    cols = _stream_cols(stream_col)
    tokens = F.expr(tx.word_token_count(text_col, SPARK))
    slim = df.select(
        *cols, order_col, tokens.cast("bigint").alias("n_tokens")
    )
    schema = T.StructType(
        [slim.schema[c] for c in cols]
        + [slim.schema[order_col], slim.schema["n_tokens"]]
        + [T.StructField(n, t) for n, t in _NEXT_FIT_FIELDS]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(
            drop=True
        )
        pack_ids, fills = [], []
        cur_id, cur_fill = 0, 0
        first = True
        for n in pdf["n_tokens"]:
            n = int(n)
            if not first and cur_fill + n > capacity:
                cur_id += 1
                cur_fill = 0
            cur_fill += n
            first = False
            pack_ids.append(cur_id)
            fills.append(cur_fill)
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        pdf["pack_fill"] = pd.Series(fills, dtype="int64")
        return pdf

    return slim.groupBy(*cols).applyInPandas(pack, schema)


def pack_next_fit_sql(
    capacity: int,
    table: str = "documents",
    stream_col: str | list[str] = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``pack_next_fit``: the same recurrence as a
    linear recursive CTE stepping row-by-row per stream."""
    from far_finer_airtable_firestore_sync_spark.functions.canonical import (
        DUCKDB,
    )

    cols = _stream_cols(stream_col)
    streams = ", ".join(cols)
    d_streams = ", ".join(f"d.{c}" for c in cols)
    join_on = " and ".join(f"d.{c} = p.{c}" for c in cols)
    tok = tx.word_token_count(text_col, DUCKDB)
    return f"""
with recursive t as (
  select {streams}, {order_col},
         cast({tok} as bigint) as n_tokens,
         row_number() over (
           partition by {streams} order by {order_col} asc
         ) as _rn
  from {table}
),
packed({streams}, {order_col}, n_tokens, _rn, pack_id, pack_fill) as (
  select {streams}, {order_col}, n_tokens, _rn,
         cast(0 as bigint), n_tokens
  from t where _rn = 1
  union all
  select {d_streams}, d.{order_col}, d.n_tokens, d._rn,
         case when p.pack_fill + d.n_tokens > {capacity}
              then p.pack_id + 1 else p.pack_id end,
         case when p.pack_fill + d.n_tokens > {capacity}
              then d.n_tokens else p.pack_fill + d.n_tokens end
  from t d join packed p
    on {join_on} and d._rn = p._rn + 1
)
select {streams}, {order_col}, n_tokens, pack_id, pack_fill
from packed
"""


def corpus_interleave(
    df: DataFrame,
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "s0",
    out_pos: str = "interleave_pos",
) -> DataFrame:
    """Proportional domain interleave: a deterministic global training
    order in which every group's documents are spread evenly through
    the epoch instead of clumped (group k with n_k docs out of N
    occupies positions ~N/n_k apart) — the curriculum-neutral way to
    mix domains so no stretch of training is single-domain.

    Each doc gets the fractional key (2·rn − 1) / (2·n_g) — the
    midpoint-rank of its group in seeded-hash order — and the global
    order sorts on that fraction. Both divisions are IEEE double ops
    on integers < 2^53 (identically rounded on any engine); ties
    across groups break on (group, rn), so the order is total and
    reproducible. Plan: one bounded per-group window (rank + count
    share the exchange) plus the global ordering — the profiling
    entry materializes positions with a global window; the production
    write path is ``repartitionByRange`` on the fraction, same as the
    Z-order layout.
    """
    h = F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    w_rank = Window.partitionBy(group_col).orderBy(
        F.col("_h").asc(), F.col(key_col).asc()
    )
    w_n = Window.partitionBy(group_col)
    staged = (
        df.withColumn("_h", h)
        .withColumn("_rn", F.row_number().over(w_rank))
        .withColumn("_n", F.count(F.lit(1)).over(w_n))
        .withColumn(
            "_frac",
            F.expr("cast(2 * _rn - 1 as double) / cast(2 * _n as double)"),
        )
    )
    # _frac ties occur whenever two groups have equal size, so the
    # group tie-break must pin NULL ordering explicitly: Spark asc is
    # NULLS FIRST, DuckDB's is NULLS LAST, and a NULL group value is a
    # valid stratum here (matching quality_quantile_filter).
    w_global = Window.orderBy(
        F.col("_frac").asc(), F.col(group_col).asc_nulls_last(), F.col("_rn").asc()
    )
    return staged.withColumn(
        out_pos, F.row_number().over(w_global) - F.lit(1)
    ).drop("_h", "_rn", "_n", "_frac")


def corpus_interleave_sql(
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "s0",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`corpus_interleave`."""
    return f"""
with h as (
  select *, md5('{seed}' || cast({key_col} as varchar)) as _h from {table}
),
r as (
  select *,
         row_number() over (
           partition by {group_col} order by _h asc, {key_col} asc
         ) as _rn,
         count(*) over (partition by {group_col}) as _n
  from h
),
f as (
  select *, cast(2 * _rn - 1 as double) / cast(2 * _n as double) as _frac
  from r
)
select * exclude (_h, _rn, _n, _frac),
       row_number() over (
         order by _frac asc, {group_col} asc nulls last, _rn asc
       ) - 1 as interleave_pos
from f
"""
