"""Text-analysis operators for training-data pipelines.

North-star extensions (SURVEY.md §2.7): language-ID (stopword-vote
heuristic), quality scoring, token counting, and document
fingerprinting over a ``documents``-shaped table.

All metrics are single ``select`` projections of codegen'd built-in
expressions (functions/textsql.py) — no Python in the hot path, no
shuffle: at 100 TB these run embarrassingly parallel at scan speed and
pipeline into downstream filters (e.g. ``quality_score >= 0.5`` prunes
before any join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from far_finer_airtable_firestore_sync_spark.functions import textsql as tx
from far_finer_airtable_firestore_sync_spark.functions.canonical import SPARK


def _project(df: DataFrame, id_col: str, exprs: dict[str, str]) -> DataFrame:
    from far_finer_airtable_firestore_sync_spark.operators._util import spread

    df = spread(df)
    return df.select(
        F.col(id_col), *[F.expr(e).alias(name) for name, e in exprs.items()]
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace + word-regex token counts and char counts."""
    c = f"`{text_col}`"
    return _project(
        df,
        id_col,
        {
            "n_tokens_ws": tx.whitespace_token_count(c, SPARK),
            "n_tokens_word": tx.word_token_count(c, SPARK),
            "n_chars_no_ws": tx.char_count_no_ws(c, SPARK),
        },
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length/punctuation/stopword quality signals + composite score.

    Two-stage: the six base counts evaluate once, the ratios derive
    from them (Spark doesn't CSE across projection outputs — measured
    ~2x on the fixture corpus)."""
    base = tx.quality_base_exprs(f"`{text_col}`", SPARK)
    staged = _project(df, id_col, base)
    derived = tx.quality_derived_exprs({k: k for k in base})
    return staged.select(
        F.col(id_col),
        *[F.col(k) for k in base if not k.startswith("_")],
        *[F.expr(e).alias(k) for k, e in derived.items()],
    )


def quality_classify(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_milli: int = 550,
) -> DataFrame:
    """Model-based quality gate: fixed-weight integer-grid linear
    classifier (see ``textsql.quality_classifier_exprs``). Zero
    shuffle — a codegen'd projection; the keep/drop verdict is
    bit-identical across engines and cluster sizes.

    Two-stage: the base counts (splits/regexes) evaluate ONCE, the
    score derives from the staged columns (Spark doesn't CSE across
    projection outputs — the one-shot form re-ran the stopword split
    per feature reference)."""
    base = tx.quality_base_exprs(f"`{text_col}`", SPARK)
    staged = df.select(
        F.col(id_col), *[F.expr(e).alias(k) for k, e in base.items()]
    )
    exprs = tx.quality_classifier_from_base(
        {k: k for k in base}, SPARK, threshold_milli
    )
    return staged.select(
        F.col(id_col),
        *[F.expr(e).alias(k) for k, e in exprs.items()],
    )


def repetition_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition filters: duplicate-word
    fraction, top-word fraction, duplicate 2/3-gram fractions.

    Two-stage select: the word array materializes once per row, then
    every metric folds over it (Spark doesn't CSE the split across
    projection outputs). Zero shuffle — pure scan-speed projection
    that pipelines into a downstream `dup_2gram_frac < 0.2` filter.
    """
    from far_finer_airtable_firestore_sync_spark.operators._util import spread

    staged = spread(df).select(
        F.col(id_col),
        F.expr(tx.split_ws_safe(f"`{text_col}`", SPARK)).alias("_w"),
    )
    exprs = tx.repetition_metric_exprs("_w", SPARK)
    return staged.select(
        F.col(id_col), *[F.expr(e).alias(k) for k, e in exprs.items()]
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language prediction with deterministic ties."""
    return _project(df, id_col, tx.langid_exprs(f"`{text_col}`", SPARK))


def pii_redact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Regex PII scrub: count + redact email-shaped tokens and
    555-exchange phone numbers. Zero-shuffle codegen'd projection —
    the scrub runs at scan speed and the counts feed an audit sink."""
    return _project(df, id_col, tx.pii_exprs(f"`{text_col}`", SPARK))


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content hash + winnowing-style min-shingle hash per document."""
    return _project(df, id_col, tx.doc_fingerprint(f"`{text_col}`", SPARK))


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash (hex) per document.

    Two-stage select: token hashes materialize once per row, then the
    64 bit-votes fold over that array — keeps the md5 work O(tokens)
    instead of O(64 * tokens).
    """
    from far_finer_airtable_firestore_sync_spark.operators._util import spread

    hashed = spread(df).select(
        F.col(id_col),
        F.expr(tx.token_hashes(f"`{text_col}`", SPARK)).alias("_th"),
    )
    return hashed.select(
        F.col(id_col),
        F.expr(tx.simhash64_from_hashes("_th", SPARK)).alias("simhash"),
    )


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate_pct: int,
    strata_rates: dict[str, int] | None = None,
    strata_col: str | None = None,
) -> DataFrame:
    """Deterministic hash sampling: keep a row iff the first byte of
    md5(key) falls under the rate threshold.

    Unlike rand()-based sampling this is reproducible across engines,
    runs, and cluster sizes — the property a training pipeline needs so
    a sample (or train/val/test split) is stable under re-execution.
    ``strata_rates`` overrides the rate per stratum (stratified
    sampling); rates are integer percents mapped to a hex threshold
    (pct * 256 / 100 first-byte values).
    """

    def thresh(pct: int) -> str:
        # 'g' sorts above every hex digit -> keep-all sentinel (a
        # 3-char '100' would sort BELOW most 2-char buckets)
        v = pct * 256 // 100
        return "g" if v >= 256 else format(v, "02x")

    bucket = F.substring(F.md5(F.col(key_col).cast("string")), 1, 2)
    if strata_rates:
        if strata_col is None:
            raise ValueError("strata_rates requires strata_col")
        expr = None
        for val, pct in strata_rates.items():
            c = (F.col(strata_col) == val) & (bucket < thresh(pct))
            expr = c if expr is None else expr | c
        # NULL strata must take the default rate: `col.isin(...)` is NULL
        # for NULL input, which would silently drop every NULL-stratum row
        # from the sample even at rate 100.
        not_in = ~F.coalesce(
            F.col(strata_col).isin(list(strata_rates)), F.lit(False)
        )
        other = not_in & (bucket < thresh(rate_pct))
        return df.filter(expr | other)
    return df.filter(bucket < thresh(rate_pct))


def hash_sample_sql(
    key_col: str, rate_pct: int, strata_rates: dict[str, int] | None = None,
    strata_col: str | None = None,
) -> str:
    """WHERE-clause fragment mirroring :func:`hash_sample` (dialect
    neutral: md5/substring/string compare behave identically)."""

    def thresh(pct: int) -> str:
        v = pct * 256 // 100
        return "g" if v >= 256 else format(v, "02x")

    bucket = f"substring(md5(cast({key_col} as varchar)), 1, 2)"
    if not strata_rates:
        return f"{bucket} < '{thresh(rate_pct)}'"
    parts = [
        f"({strata_col} = '{v}' and {bucket} < '{thresh(p)}')"
        for v, p in strata_rates.items()
    ]
    quoted = ", ".join(f"'{v}'" for v in strata_rates)
    parts.append(
        f"(not coalesce({strata_col} in ({quoted}), false) "
        f"and {bucket} < '{thresh(rate_pct)}')"
    )
    return "(" + " or ".join(parts) + ")"


def class_balance_cap(
    df: DataFrame,
    group_col: str | list[str],
    cap: int,
    order_col: str = "doc_id",
) -> DataFrame:
    """Cap every group at ``cap`` rows (deterministic keep order) —
    downsampling over-represented classes/sources before training.
    One window shuffle on the group key. Multi-column groups are
    partitioned on the column tuple directly (NULL-safe, no separator
    collisions a string-concat composite key would allow)."""
    from pyspark.sql import Window

    cols = [group_col] if isinstance(group_col, str) else list(group_col)
    w = Window.partitionBy(*cols).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def mixture_weights(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.5,
    target_total: int = 10000,
) -> DataFrame:
    """Temperature-style domain mixing: weight_s ∝ n_s^alpha,
    normalized across sources — the standard up/down-weighting of
    corpus domains before sampling a training mix.

    For ``alpha=0.5`` every step is bit-portable: sqrt is
    IEEE-exactly-rounded, weights quantize onto an integer grid
    (floor(sqrt(n)·10^6)), the normalizer is an exact bigint sum, and
    expected doc counts use bigint floor division. Other alphas go
    through ``pow``, which is NOT guaranteed identically rounded
    across engines — fine for production, excluded from the oracle.

    Plan: one groupBy (partial count), then a 1-row broadcast cross
    join for the normalizer — the K-source frame never shuffles again.
    """
    agg = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    root = (
        "sqrt(cast(n_docs as double))"
        if alpha == 0.5
        else f"power(cast(n_docs as double), {alpha})"
    )
    q = agg.withColumn(
        "_qw", F.expr(f"cast(floor({root} * 1000000) as bigint)")
    )
    total = q.agg(F.sum("_qw").alias("_total"))
    return (
        q.crossJoin(F.broadcast(total))
        .select(
            group_col,
            "n_docs",
            F.expr("cast(_qw as double) / _total").alias("weight"),
            F.expr(f"_qw * {target_total} div _total").alias("expected_docs"),
        )
    )


def chunk_text(
    df: DataFrame,
    chunk_chars: int = 200,
    stride: int = 150,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping fixed-size character windows —
    sequence packing for training. Output: (doc_id, chunk_no,
    chunk_text, n_chunks). Pure explode projection: no shuffle, chunk
    rows stay on the scan partition.

    NULL text coalesces to '' (one empty chunk) so the doc survives
    the stage with an audit trail — posexplode over a NULL array would
    silently drop the row, breaking count reconciliation across
    pipeline stages (same convention as split_ws_safe).
    """
    c = f"coalesce(`{text_col}`, '')"
    n_chunks = (
        f"cast(greatest(ceil((length({c}) - {chunk_chars}) / {stride}.0), 0) "
        "+ 1 as int)"
    )
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {n_chunks} - 1), "
                f"i -> substring({c}, i * {stride} + 1, {chunk_chars}))"
            )
        ).alias("chunk_no", "chunk_text"),
        F.expr(n_chunks).alias("n_chunks"),
    )


def quality_quantile_filter(
    df: DataFrame,
    group_col: str = "lang",
    keep_milli: int = 300,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group DYNAMIC quality gate: keep the top ``keep_milli``/1000
    fraction of each group's documents by classifier score — the
    threshold adapts to each group's score distribution instead of a
    single global cutoff (low-resource languages aren't wiped out by a
    threshold tuned on English).

    Scale design — the corpus never goes through a window: (1) score is
    a codegen'd integer projection; (2) a groupBy on (group, score)
    builds a per-group score HISTOGRAM with map-side partial counts, so
    the shuffle carries at most groups x distinct-scores rows (scores
    live on a 0..1000 grid — bounded regardless of corpus size); (3) a
    running sum over the tiny histogram picks each group's threshold
    score; (4) thresholds broadcast back onto the corpus as a plain
    filter. A row is kept iff strictly more than (1000-keep_milli)/1000
    of its group's rows score <= it: ``cum * 1000 > (1000-keep) *
    total`` — bigint-exact, so the verdict is bit-identical across
    engines and partitionings. Ties at the threshold score all keep
    (the cut is on score VALUE, not row rank).

    NULL text coalesces to '' before scoring (the split_ws_safe
    convention), so score_milli is never NULL — a NULL histogram row
    would sort NULLS FIRST in Spark but NULLS LAST in DuckDB and break
    the threshold parity.
    """
    from pyspark.sql import Window

    base = tx.quality_base_exprs(f"coalesce(`{text_col}`, '')", SPARK)
    staged = df.select(
        F.col(id_col),
        F.col(group_col),
        *[F.expr(e).alias(k) for k, e in base.items()],
    )
    score = tx.quality_classifier_from_base({k: k for k in base}, SPARK)[
        "clf_score_milli"
    ]
    scored = staged.select(
        F.col(id_col),
        F.col(group_col),
        F.expr(score).alias("score_milli"),
    )
    hist = scored.groupBy(group_col, "score_milli").agg(
        F.count(F.lit(1)).alias("_n")
    )
    # running count and group total come out of ONE exchange on the
    # histogram (same partition key, two frames) — the corpus is
    # scanned exactly once for the threshold side
    w_cum = Window.partitionBy(group_col).orderBy("score_milli")
    w_tot = Window.partitionBy(group_col)
    thresholds = (
        hist.select(
            F.col(group_col),
            F.col("score_milli"),
            F.sum("_n").over(w_cum).alias("_cum"),
            F.sum("_n").over(w_tot).alias("_total"),
        )
        .filter(
            F.expr(f"_cum * 1000 > ({1000 - keep_milli}) * _total")
        )
        .groupBy(group_col)
        .agg(F.min("score_milli").alias("_keep_from"))
    )
    # null-safe equality: a NULL group is a stratum like any other
    # (it built its own histogram row); plain equi-join would silently
    # drop every NULL-group doc
    th = thresholds.withColumnRenamed(group_col, "_g")
    return (
        scored.join(
            F.broadcast(th), scored[group_col].eqNullSafe(th["_g"])
        )
        .filter(F.col("score_milli") >= F.col("_keep_from"))
        .select(id_col, group_col, "score_milli")
    )


def quality_quantile_filter_sql(
    dialect_score: str,
    group_col: str = "lang",
    keep_milli: int = 300,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """Oracle twin of :func:`quality_quantile_filter` (same histogram
    construction; ``dialect_score`` is the classifier score expression
    in the oracle dialect)."""
    return f"""
with scored as (
  select {id_col}, {group_col}, {dialect_score} as score_milli from {table}
),
hist as (
  select {group_col}, score_milli, count(*) as n
  from scored group by 1, 2
),
cum as (
  select {group_col}, score_milli,
         cast(sum(n) over (partition by {group_col} order by score_milli) as bigint) as cum,
         cast(sum(n) over (partition by {group_col}) as bigint) as total
  from hist
),
th as (
  select {group_col}, min(score_milli) as keep_from
  from cum where cum * 1000 > ({1000 - keep_milli}) * total
  group by 1
)
select s.{id_col}, s.{group_col}, s.score_milli
from scored s
join th on s.{group_col} is not distinct from th.{group_col}
where s.score_milli >= th.keep_from
"""


def token_budget_allocation(
    df: DataFrame,
    budget: int = 1_000_000,
    group_cols: tuple[str, str] = ("lang", "source"),
    text_col: str = "text",
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a global token
    budget across corpus cells, proportional to each cell's token
    count — the planning step of "train on B tokens drawn across
    domains" that turns a mixture into concrete per-cell token quotas
    which sum to EXACTLY the budget (floor-divide alone undershoots).

    Every step is bigint-exact: per-cell whitespace-token sums (one
    map-side-combined groupBy over the corpus), ``base = B*n div
    total``, remainders ranked on the K-cell frame (K = number of
    domain cells, tiny at any corpus size — the only window runs
    there), and the leftover ``B - sum(base)`` cells with the largest
    remainders get +1. Deterministic tie-break: (remainder DESC,
    group_cols ASC).
    """
    from pyspark.sql import Window

    g1, g2 = group_cols
    tok = tx.quality_base_exprs(f"`{text_col}`", SPARK)["n_tokens_ws"]
    cells = (
        df.select(F.col(g1), F.col(g2), F.expr(tok).alias("_t"))
        .groupBy(g1, g2)
        .agg(F.sum("_t").alias("n_tokens"))
    )
    total = cells.agg(F.sum("n_tokens").alias("_total"))
    # n_tokens * budget runs in decimal(38,0): at 100 TB a cell can
    # hold ~1e13 tokens, and 1e13 * 1e6 overflows int64. The mod is
    # exact on decimals (no scale expansion) and the division
    # (num - rem) / total is exactly divisible, so the decimal result
    # is integral — no rounding anywhere. DuckDB's oracle twin gets
    # the same values via hugeint.
    based = cells.crossJoin(F.broadcast(total)).select(
        g1,
        g2,
        "n_tokens",
        F.expr(
            f"cast((cast(n_tokens as decimal(38,0)) * {budget}"
            f" - (cast(n_tokens as decimal(38,0)) * {budget}) % _total)"
            " / _total as bigint)"
        ).alias("_base"),
        F.expr(
            f"(cast(n_tokens as decimal(38,0)) * {budget}) % _total"
        ).alias("_rem"),
    )
    leftover = based.agg(
        (F.lit(budget) - F.sum("_base")).alias("_leftover")
    )
    # Pin NULL ordering on every key: Spark's desc is NULLS LAST /
    # asc NULLS FIRST while DuckDB defaults differ, and a NULL group
    # cell (or NULL _rem from an all-NULL-text cell) would otherwise
    # rank differently cross-engine and shift the +1 allocations.
    w = Window.orderBy(
        F.col("_rem").desc_nulls_last(),
        F.col(g1).asc_nulls_last(),
        F.col(g2).asc_nulls_last(),
    )
    return (
        based.withColumn("_rk", F.row_number().over(w))
        .crossJoin(F.broadcast(leftover))
        .select(
            g1,
            g2,
            "n_tokens",
            F.expr(
                "cast(_base + (case when _rk <= _leftover then 1 else 0 end)"
                " as bigint)"
            ).alias("alloc_tokens"),
        )
    )


def token_budget_allocation_sql(
    dialect_tokens: str,
    budget: int = 1_000_000,
    group_cols: tuple[str, str] = ("lang", "source"),
    table: str = "documents",
) -> str:
    """Oracle twin of :func:`token_budget_allocation`."""
    g1, g2 = group_cols
    return f"""
with tok as (select {g1}, {g2}, {dialect_tokens} as t from {table}),
cells as (
  select {g1}, {g2}, cast(sum(t) as bigint) as n_tokens
  from tok group by 1, 2
),
tot as (select cast(sum(n_tokens) as bigint) as total from cells),
b as (
  select {g1}, {g2}, n_tokens,
         cast((n_tokens::hugeint * {budget}) // total as bigint) as base,
         (n_tokens::hugeint * {budget}) % total as rem
  from cells cross join tot
),
lo as (select {budget} - cast(sum(base) as bigint) as leftover from b),
r as (
  select *, row_number() over (
    order by rem desc nulls last, {g1} asc nulls last, {g2} asc nulls last
  ) as rk from b
)
select {g1}, {g2}, n_tokens,
       cast(base + (case when rk <= leftover then 1 else 0 end) as bigint)
         as alloc_tokens
from r cross join lo
"""


def lm_bigram_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    grid: int = 1_000_000,
    max_chars: int | None = 256,
    passthrough_cols: list[str] | None = None,
) -> DataFrame:
    """CCNet-style statistical-LM quality scoring (Wenzek et al. 2020,
    arXiv:1911.00359 use a KenLM n-gram model; this is the same shape
    with a self-trained character-bigram model): score every document
    by its average negative log-likelihood under add-one-smoothed
    bigram statistics of the corpus itself. High ``avg_nll`` = text
    whose character transitions are unlike the corpus (mojibake,
    binary spill, boilerplate soup) — the classic perplexity filter.

    Cross-engine exactness: per-bigram log-probs are quantized to a
    1/``grid`` integer (the tf-idf idiom), per-doc totals are exact
    integer sums, and the single final division back to double is
    IEEE-exact. P(b) = (c2(b)+1) / (c1(prefix)+V) with V = distinct
    bigram count (add-one over the observed bigram vocabulary).

    Scale shape: the model is two partial aggregations keyed on the
    bigram (alphabet-squared cardinality — tiny), broadcast back; the
    scoring pass is explode -> broadcast join -> per-doc sum. The
    corpus shuffles only (bigram, count) pairs and per-doc partials,
    never text. At 100 TB, train the model on a hash-sample
    (sample_hash) and score the full corpus with the same plan.
    """
    # max_chars bounds the per-doc fold (the transform lambda is
    # interpreted, not codegen'd): train and score on each doc's
    # prefix — the CCNet move of scoring a bounded unit rather than
    # unbounded documents. The SQL twin applies the same cap.
    base = (
        f"substring(`{text_col}`, 1, {max_chars})"
        if max_chars
        else f"`{text_col}`"
    )
    # Hoist the normalization into its own projection: char_bigrams
    # references its argument inside the per-element lambda, so an
    # inline lower(substring(...)) would re-normalize the whole prefix
    # once PER BIGRAM (CollapseProject keeps non-cheap exprs staged).
    pre = df.select(F.col(id_col), F.expr(f"lower({base})").alias("_t"))
    grams = pre.select(
        F.col(id_col),
        F.explode(F.expr(tx.char_bigrams("_t", SPARK))).alias("b"),
    )
    # One shuffle over (doc, bigram) counts feeds BOTH the model and
    # the scoring pass; materialized so the explode doesn't re-execute
    # per branch. Downstream rows are docs x distinct-bigrams-per-doc,
    # far smaller than the raw bigram stream.
    doc_b = (
        grams.groupBy(id_col, "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    c2 = doc_b.groupBy("b").agg(F.sum("n").alias("c2"))
    c1 = (
        c2.groupBy(F.expr("substring(b, 1, 1)").alias("p"))
        .agg(F.sum("c2").alias("c1"))
    )
    v = c2.agg(F.count(F.lit(1)).alias("v"))
    model = (
        c2.withColumn("p", F.expr("substring(b, 1, 1)"))
        .join(c1, "p")
        .crossJoin(F.broadcast(v))
        .select(
            "b",
            F.expr(
                f"cast(round(ln((c2 + 1.0) / (c1 + v)) * {grid}) as bigint)"
            ).alias("q"),
        )
    )
    scored = (
        doc_b.join(F.broadcast(model), "b")
        .groupBy(id_col)
        .agg(
            F.sum("n").cast("long").alias("n_bigrams"),
            (-F.sum(F.col("n") * F.col("q"))).alias("_nll_q"),
        )
    )
    # Docs too short for one bigram never reach `grams`; restore them
    # with NULL scores (a length filter is a different operator's job).
    # `passthrough_cols` ride this restore join so consumers (ccnet
    # buckets) don't need a second scan+join just to re-attach them.
    extra = list(passthrough_cols or [])
    return (
        df.select(id_col, *extra)
        .join(scored, id_col, "left_outer")
        .select(
            id_col,
            *extra,
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            (
                F.col("_nll_q").cast("double")
                / F.col("n_bigrams")
                / F.lit(float(grid))
            ).alias("avg_nll"),
        )
    )


def lm_bigram_score_sql(
    text_col: str = "text",
    id_col: str = "doc_id",
    table: str = "documents",
    grid: int = 1_000_000,
    max_chars: int | None = 256,
) -> str:
    """DuckDB twin of :func:`lm_bigram_score`."""
    from far_finer_airtable_firestore_sync_spark.functions.canonical import (
        DUCKDB,
    )

    base = (
        f"substring({text_col}, 1, {max_chars})" if max_chars else text_col
    )
    norm = f"lower({base})"
    bigrams = tx.char_bigrams(norm, DUCKDB)
    return f"""
with grams as (
  select {id_col}, unnest({bigrams}) as b from {table}
),
c2 as (select b, count(*) as c2 from grams group by b),
c1 as (select substring(b, 1, 1) as p, sum(c2) as c1 from c2 group by 1),
v as (select count(*) as v from c2),
model as (
  select b,
         cast(round(ln((c2 + 1.0) / (c1 + v)) * {grid}) as bigint) as q
  from c2 join c1 on substring(c2.b, 1, 1) = c1.p cross join v
),
scored as (
  select g.{id_col},
         cast(count(*) as bigint) as n_bigrams,
         -sum(q) as nll_q
  from grams g join model using (b)
  group by 1
)
select d.{id_col},
       coalesce(s.n_bigrams, 0) as n_bigrams,
       cast(s.nll_q as double) / s.n_bigrams / {grid}.0 as avg_nll
from {table} d left join scored s using ({id_col})
"""


def ccnet_buckets(
    df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    scored: DataFrame | None = None,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020,
    arXiv:1911.00359, public paper): within each group rank documents
    by LM perplexity (:func:`lm_bigram_score` — their KenLM, our
    self-trained bigram model) and cut into thirds. 'head' = the most
    corpus-like third (lowest avg_nll), the slice CCNet keeps for
    pretraining; 'tail' = the least. The downstream selection knob is
    then "take head+middle of every language/source", which unlike a
    global threshold cannot starve low-resource groups.

    Bucket arithmetic is rank-exact (1 + (rn-1)*3 div n), not ntile
    (whose uneven-group placement is an engine implementation detail);
    the order pins ties by doc_id and NULL scores (too-short docs)
    sort last into the tail.

    Scale shape: scoring is the lm_bigram_score plan (model broadcast,
    text never shuffled); the split adds one per-group window over
    (score, id) pairs — rows of 3 columns, not documents.

    Composition: a pipeline that already materialized the scored frame
    (cache/checkpoint/table) passes it via ``scored`` — must carry
    (id_col, group_col, avg_nll) — and the bucketing reuses it instead
    of re-running the whole scoring plan (the standalone entry pays
    the scoring cost once either way; re-scoring only hurts when the
    scores feed several consumers)."""
    if scored is not None:
        if df is not None:
            raise ValueError(
                "ccnet_buckets: pass df OR scored, not both (a stale "
                "scored frame would silently win over df)"
            )
        missing = {id_col, group_col, "avg_nll"} - set(scored.columns)
        if missing:
            raise ValueError(
                f"ccnet_buckets: scored frame lacks {sorted(missing)}"
            )
        joined = scored
    else:
        if df is None:
            raise ValueError("ccnet_buckets needs either df or scored")
        joined = lm_bigram_score(
            df, text_col=text_col, id_col=id_col,
            passthrough_cols=[group_col],
        )
    w = (
        f"(partition by `{group_col}` "
        f"order by avg_nll asc nulls last, `{id_col}` asc)"
    )
    return joined.select(
        id_col,
        group_col,
        "avg_nll",
        F.expr(
            f"case 1 + ((row_number() over {w} - 1) * 3)"
            f" div count(*) over (partition by `{group_col}`)"
            " when 1 then 'head' when 2 then 'middle' else 'tail' end"
        ).alias("bucket"),
    )


def ccnet_buckets_sql(
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`ccnet_buckets`."""
    inner = lm_bigram_score_sql(text_col=text_col, id_col=id_col, table=table)
    return f"""
with scores as ({inner})
select d.{id_col}, d.{group_col}, s.avg_nll,
       case 1 + ((row_number() over (
                    partition by d.{group_col}
                    order by s.avg_nll asc nulls last, d.{id_col} asc
                  ) - 1) * 3)
            // count(*) over (partition by d.{group_col})
            when 1 then 'head' when 2 then 'middle' else 'tail' end as bucket
from {table} d join scores s using ({id_col})
"""


def heavy_hitter_words(
    df: DataFrame,
    text_col: str = "text",
    k: int = 200,
) -> DataFrame:
    """EXACT corpus-wide heavy hitters (words with global count
    strictly greater than total_words / ``k``) via the scalable
    two-pass candidate/verify plan (Misra & Gries 1982's summary
    bound, applied per partition — public algorithm).

    Pass 1 (candidates): count words per SCAN PARTITION and keep any
    word whose within-partition count exceeds that partition's share
    of the threshold (``c_p * k > n_p``). By a pigeonhole/averaging
    argument this union is a guaranteed SUPERSET of every global heavy
    hitter: if ``c * k > n`` with ``c = Σ c_p`` and ``n = Σ n_p``,
    some partition must have ``c_p * k > n_p``. Pass 2 (verify):
    exactly count ONLY the candidates (broadcast semi-join) and apply
    the global threshold — so the result is exact and, despite the
    partition-dependent pass 1, fully partition-invariant.

    Output: (word, n_occ, ppm) — exact counts and exact-integer
    parts-per-million share.

    Scale shape: pass 1 aggregates (partition, word) with map-side
    combine — the only full-width shuffle carries per-partition word
    counts, already combined; pass 2 re-scans but shuffles only the
    candidate words that survive the broadcast semi-join. Nothing ever
    collects to the driver; the total and the candidate set flow as
    1-row/broadcast frames (the repo's aggregate-gate idiom).
    """
    words = df.select(
        F.explode(F.expr(tx.split_ws_safe(f"`{text_col}`", SPARK))).alias(
            "word"
        )
    )
    per = (
        words.withColumn("part", F.spark_partition_id())
        .groupBy("part", "word")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)  # pass-1 counts feed 3 branches
    )
    ptot = per.groupBy("part").agg(F.sum("c").alias("pn"))
    cand = (
        per.join(ptot, "part")
        .filter(F.col("c") * k > F.col("pn"))
        .select("word")
        .distinct()
    )
    total = per.agg(F.sum("c").cast("long").alias("n_total"))
    return (
        words.join(F.broadcast(cand), "word", "left_semi")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_occ") * k > F.col("n_total"))
        .select(
            "word",
            "n_occ",
            # decimal(38,0) product: 1e6 * n_occ wraps int64 once the
            # corpus passes ~9e12 words — the documented target scale
            # (the DuckDB oracle twin widens to hugeint the same way)
            F.expr(
                "cast((cast(1000000 as decimal(38,0)) * n_occ)"
                " div n_total as bigint)"
            ).alias("ppm"),
        )
    )


def chunk_text_udtf(
    df: DataFrame,
    chunk_chars: int = 200,
    stride: int = 150,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Python UDTF twin of :func:`chunk_text` — same windows, same
    output schema, computed by a Spark 4 arrow-optimized Python UDTF
    invoked via LATERAL join. The expression form above is the
    production path (whole-stage codegen, no Python); this twin
    exists to exercise the UDTF extension surface and is value-pinned
    to the SAME DuckDB oracle as the expression form — any semantic
    drift between the two execution paths fails the hash gate.

    Scale note: per-row Python with Arrow batching — acceptable for
    genuinely imperative chunkers (sentence/semantic splitters that
    need a model); for fixed windows always prefer the expression
    form."""
    import math

    from pyspark.sql.functions import udtf

    cc, st = chunk_chars, stride

    @udtf(returnType="chunk_no int, chunk_text string, n_chunks int")
    class _Chunker:
        def eval(self, text):  # noqa: ANN001 (UDTF protocol)
            t = text or ""
            n = int(max(math.ceil((len(t) - cc) / float(st)), 0) + 1)
            for i in range(n):
                yield i, t[i * st : i * st + cc], n

    from far_finer_airtable_firestore_sync_spark.operators._util import next_seq

    spark = df.sparkSession
    # Per-invocation names: a fixed session-global name would let two
    # interleaved invocations with different chunk_chars/stride clobber
    # each other's lazily-evaluated plans (ADVICE r4).
    seq = next_seq()
    fn_name = f"_ffs_chunker_{seq}"
    view_name = f"_ffs_udtf_in_{seq}"
    spark.udtf.register(fn_name, _Chunker)
    df.select(id_col, text_col).createOrReplaceTempView(view_name)
    return spark.sql(
        f"select i.{id_col}, c.chunk_no, c.chunk_text, c.n_chunks "
        f"from {view_name} i, lateral {fn_name}(i.{text_col}) c"
    )
