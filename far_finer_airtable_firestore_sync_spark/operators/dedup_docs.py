"""Document-level deduplication families for training-data pipelines.

North-star extensions (SURVEY.md §2.7 / BASELINE.json): exact dedup,
MinHash+LSH near-dup candidate generation, n-gram Jaccard
verification, SimHash near-dup bucketing.

Scale design (the 100 TB story):
- **exact**: one hash-groupBy on a 32-byte digest — the shuffle carries
  (digest, id), never the document text; map-side partial aggregation
  collapses same-partition copies before the exchange.
- **MinHash+LSH**: signatures are per-row projections (scan-speed);
  the only shuffle is the band-bucket self-join, whose fan-out is
  bounded by bucket size, not corpus size (classic LSH contract:
  candidates ~ true near-dups + tunable noise). Skewed buckets (e.g.
  boilerplate) are handled by AQE skew-join splitting.
- **verification**: Jaccard runs only on candidate pairs — the
  expensive O(|doc|) comparison never touches the full N² space.
- hash functions: ``md5`` (portable, oracle-checkable) or
  ``xxhash64`` (Spark-native, ~5x faster — the production default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from far_finer_airtable_firestore_sync_spark.functions import textsql as tx
from far_finer_airtable_firestore_sync_spark.functions.canonical import SPARK


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: one row per distinct content hash with the kept
    (minimum) id and the duplicate count."""
    return (
        df.select(
            F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col)
        )
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("kept_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup applied: keep the min-id representative per content.

    max_by/min_by-free formulation: semi-join back on (hash, kept id)
    so the full rows never ride the aggregation shuffle.
    """
    groups = exact_dedup_groups(df, text_col, id_col)
    keyed = df.withColumn("content_hash", F.md5(F.col(text_col)))
    return (
        keyed.join(
            groups.select("content_hash", F.col("kept_id").alias(id_col)),
            on=["content_hash", id_col],
            how="left_semi",
        ).drop("content_hash")
    )


def chunk_dedup(
    df: DataFrame,
    chunk_words: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style duplicate-chunk removal across the whole corpus
    (Raffel et al. 2020 §2.2 dedupe rule, word-chunk variant): split
    each document into non-overlapping ``chunk_words``-word chunks,
    keep only the first corpus-wide occurrence of each chunk (min
    (doc_id, chunk_no)), and rebuild documents from their surviving
    chunks. Documents whose every chunk appeared earlier drop out.

    Scale shape: two shuffles — a groupBy on the chunk digest whose
    partial ``min(struct)`` collapses same-partition copies before the
    exchange, then a per-doc rebuild groupBy. The digest groupBy keys
    on a uniform 32-byte hash, so it cannot skew; the rebuild shuffle
    carries only surviving chunks.
    """
    from far_finer_airtable_firestore_sync_spark.operators._util import spread

    staged = spread(df).select(
        F.col(id_col),
        F.expr(tx.split_ws_safe(f"`{text_col}`", SPARK)).alias("_w"),
    )
    exploded = staged.select(
        F.col(id_col),
        F.posexplode(
            F.expr(tx.word_chunks("_w", chunk_words, SPARK))
        ).alias("chunk_no", "chunk"),
    )
    keeper = (
        exploded.groupBy(F.md5(F.col("chunk")).alias("_d"))
        .agg(F.min(F.struct(id_col, "chunk_no", "chunk")).alias("k"))
        .select("k.*")
    )
    return keeper.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_no", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("text_kept"),
    )


def with_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 9,
    max_chars: int | None = 256,
) -> DataFrame:
    """(id, _sh) with the distinct character-n-gram set per doc —
    computed ONCE and shared by signatures and Jaccard verification.
    Input is spread across the cluster first (byte-split parquet can
    land high-compute text on a few partitions — see _util.spread)."""
    from far_finer_airtable_firestore_sync_spark.operators._util import spread

    df = spread(df)
    return df.select(
        F.col(id_col),
        F.expr(tx.shingles(f"`{text_col}`", shingle_n, SPARK, max_chars)).alias(
            "_sh"
        ),
    )


def signatures_from_shingles(shingled: DataFrame, seeds: int = 8) -> DataFrame:
    """MinHash signature columns ``s0..s{k-1}`` from a shingle array.

    Kirsch-Mitzenmacher family: ONE md5 per shingle, then each seed's
    hash is an integer fold ``(a + i*b) mod P`` over the digest-derived
    (a, b) pairs — md5 dominates minhash cost, so this is ~5x cheaper
    than k seeded digests while remaining DuckDB-oracle-portable
    (functions/textsql.py km_* emitters)."""
    id_col = shingled.columns[0]
    ab = tx.km_digest_pairs("_sh", SPARK)
    staged = shingled.withColumn("_ab", F.expr(ab))
    sigs = [
        F.expr(e).alias(f"s{i}")
        for i, e in enumerate(tx.km_signature_exprs("_ab", seeds, SPARK))
    ]
    return staged.select(F.col(id_col), F.col("_sh"), *sigs)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 9,
    seeds: int = 8,
    max_chars: int | None = 256,
) -> DataFrame:
    """Per-doc MinHash signature columns ``s0..s{k-1}`` (md5-hex min)."""
    return signatures_from_shingles(
        with_shingles(df, text_col, id_col, shingle_n, max_chars), seeds
    ).drop("_sh")


def _pairs_from_bands(bands: DataFrame, id_col: str) -> DataFrame:
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 9,
    seeds: int = 8,
    rows_per_band: int = 4,
    max_chars: int | None = 256,
    cache: bool = True,
) -> DataFrame:
    """MinHash-LSH near-dup candidates: distinct (id_a < id_b) pairs
    sharing at least one signature band.

    Plan shape: project signatures -> explode band keys (seeds /
    rows_per_band rows per doc) -> self-join on the band key. The join
    key is a 32-char digest: uniform, broadcast-unfriendly by design,
    and the shuffle is proportional to bands * N, not N².

    Parameter note (measured on the fixture corpus, small vocabulary):
    2-row bands produced ~1M candidates from 5.5k docs (576-doc
    buckets); 9-char shingles with 4-row bands cut that to ~500 while
    still catching every synthesized near-dup. Band selectivity IS the
    scale knob: candidates ~ sum(bucket^2).

    ``cache`` persists the exploded band table so the self-join's two
    sides don't recompute the signatures (Spark would otherwise
    re-evaluate the whole minhash per join input).
    """
    sigs = minhash_signatures(df, text_col, id_col, shingle_n, seeds, max_chars)
    keys = tx.band_keys([f"s{i}" for i in range(seeds)], rows_per_band)
    bands = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(*[F.expr(k) for k in keys])
        ).alias("band_key"),
    )
    if cache:
        bands = bands.persist()
    return _pairs_from_bands(bands, id_col)


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 9,
    max_chars: int | None = 256,
    threshold: float = 0.5,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Verify candidate pairs with exact n-gram Jaccard similarity.

    Joins shingle sets onto the (small) candidate-pair table — at
    scale both joins broadcast the pair side. Jaccard is an integer
    ratio (exact across engines). Pass ``shingled`` (from
    :func:`with_shingles`, persisted) to reuse shingle arrays already
    computed for the LSH stage.
    """
    sh = (
        shingled
        if shingled is not None
        else with_shingles(df, text_col, id_col, shingle_n, max_chars)
    )
    j = (
        pairs.join(
            sh.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("sh_a")),
            "id_a",
        ).join(
            sh.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("sh_b")),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / F.greatest(union, F.lit(1))
    return (
        j.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def signatures_from_shingles_fast(
    shingled: DataFrame, seeds: int = 8
) -> DataFrame:
    """Production fast path: xxhash64-based minhash (JVM-native 64-bit
    hash, ~5x cheaper than md5). Same LSH semantics; numeric
    signatures. Not oracle-checked (DuckDB has no xxhash64) — the md5
    variant is the cross-engine-verified twin."""
    id_col = shingled.columns[0]
    sigs = [
        F.expr(f"array_min(transform(_sh, x -> xxhash64(x, {s})))").alias(f"s{s}")
        for s in range(seeds)
    ]
    return shingled.select(F.col(id_col), F.col("_sh"), *sigs)


def lsh_candidate_pairs_fast(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 9,
    seeds: int = 8,
    rows_per_band: int = 4,
    max_chars: int | None = 256,
) -> DataFrame:
    """xxhash64 LSH candidates — identical pipeline shape to
    :func:`lsh_candidate_pairs`, numeric band keys."""
    sigs = signatures_from_shingles_fast(
        with_shingles(df, text_col, id_col, shingle_n, max_chars), seeds
    ).drop("_sh")
    band_exprs = []
    for b in range(0, seeds, rows_per_band):
        group = [f"s{i}" for i in range(b, min(b + rows_per_band, seeds))]
        band_exprs.append(f"xxhash64({', '.join(group)}, {b})")
    bands = sigs.select(
        F.col(id_col),
        F.explode(F.array(*[F.expr(k) for k in band_exprs])).alias("band_key"),
    ).persist()
    return _pairs_from_bands(bands, id_col)


def near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 9,
    seeds: int = 8,
    rows_per_band: int = 4,
    max_chars: int | None = 256,
    threshold: float = 0.5,
    hash_family: str = "md5",
) -> DataFrame:
    """Full near-dup pipeline: shingle once -> minhash -> LSH bucket
    self-join -> exact Jaccard verification, with the shingle arrays
    persisted and shared across stages (one pass over the text).

    ``hash_family``: ``"md5"`` (oracle-portable) or ``"xxhash64"``
    (production fast path). The families bucket differently so their
    *candidate* sets differ, but the Jaccard-verified output is the
    same >=threshold pair set (asserted by
    tests/test_round2_fixes.py::test_lsh_hash_families_agree_post_jaccard).
    """
    if hash_family not in ("md5", "xxhash64"):
        raise ValueError(f"unknown hash_family {hash_family!r}")
    shingled = with_shingles(df, text_col, id_col, shingle_n, max_chars).persist()
    if hash_family == "md5":
        sigs = signatures_from_shingles(shingled, seeds).drop("_sh")
        keys = tx.band_keys([f"s{i}" for i in range(seeds)], rows_per_band)
    else:
        sigs = signatures_from_shingles_fast(shingled, seeds).drop("_sh")
        keys = []
        for b in range(0, seeds, rows_per_band):
            group = [f"s{i}" for i in range(b, min(b + rows_per_band, seeds))]
            keys.append(f"cast(xxhash64({', '.join(group)}, {b}) as string)")
    bands = sigs.select(
        F.col(id_col),
        F.explode(F.array(*[F.expr(k) for k in keys])).alias("band_key"),
    ).persist()
    pairs = _pairs_from_bands(bands, id_col)
    return ngram_jaccard_pairs(
        df, pairs, text_col, id_col, shingle_n, max_chars, threshold,
        shingled=shingled,
    )


def apply_near_dedup(
    corpus: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    broadcast_members: bool = True,
) -> DataFrame:
    """Apply near-dup removal: every cluster keeps only its min-id
    representative (``component`` label from ``connected_components``);
    docs in no cluster pass through untouched.

    Plan: anti-join the corpus against the non-representative cluster
    members on the id. The member list is proportional to the near-dup
    count — orders of magnitude smaller than the corpus — so it
    broadcasts and the corpus never shuffles (set
    ``broadcast_members=False`` for pathologically duplicate-heavy
    corpora and let AQE pick the strategy)."""
    losers = components.filter(
        F.col(id_col) != F.col("component")
    ).select(id_col)
    if broadcast_members:
        losers = F.broadcast(losers)
    return corpus.join(losers, on=id_col, how="left_anti")


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 9,
    max_chars: int | None = 256,
    df_cap: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """ASYMMETRIC near-dup detection: containment C = |A∩B| / min(|A|,
    |B|) of the smaller shingle set in the larger (Broder 1997's
    containment measure) — catches a short document quoted inside a
    long one, which Jaccard structurally misses (a perfect 20%-length
    quote has J ≈ 0.2 but C = 1.0).

    Candidates come from RARE-shingle postings blocking: only shingles
    with document frequency <= ``df_cap`` join, so the self-join cost
    is Σ df² <= df_cap · |postings| — linear in the corpus, and hot
    boilerplate shingles (the skew case) are excluded by construction.
    Minhash-LSH is the wrong candidate generator here: its collision
    probability tracks Jaccard, exactly the measure containment is
    escaping.

    Output: (id_small, id_big, containment) for pairs clearing the
    threshold; the smaller set is the contained side (id-asc on size
    ties — deterministic)."""
    from far_finer_airtable_firestore_sync_spark.operators._util import spread

    # shingle arrays feed BOTH sides of the verification join —
    # checkpoint so the corpus explode runs once (round 12, guide §5)
    sh = with_shingles(
        df, text_col, id_col, shingle_n, max_chars
    ).localCheckpoint(eager=True)
    # postings via posexplode-then-substring, NOT the shingle arrays:
    # the per-element substring runs in whole-stage codegen after the
    # explode, where the array-transform lambda is interpreted —
    # measured 3.5x faster warm at sf0.1 (the r3 HOF-hoisting gotcha
    # cuts this way here because the exploded payload is narrow and
    # the per-element expression is cheap). The gram derivation is
    # tx.shingle_base — the SAME base tx.shingles builds on (no
    # lower/coalesce: a case-normalized blocking gram set silently
    # diverged from the verification set, review finding) — pinned by
    # test_containment_postings_match_shingles. NULL text yields a
    # NULL gram, which never equi-joins: NULL docs block nothing,
    # matching their [NULL] shingle array.
    base = tx.shingle_base(f"`{text_col}`", max_chars)
    post = (
        spread(df)
        .select(F.col(id_col), F.expr(base).alias("_t"))
        .select(
            F.col(id_col),
            F.expr(
                f"explode(sequence(1, greatest(length(_t) - {shingle_n - 1},"
                " 1)))"
            ).alias("_i"),
            "_t",
        )
        .select(F.col(id_col), F.expr(f"substring(_t, _i, {shingle_n})").alias("s"))
        .distinct()
        # materialize ONCE (round 12, guide §5): the postings feed the
        # df-cap aggregate AND both sides of the candidate self-join —
        # Spark re-plans the scan+explode per consumer (the r12 plan
        # audit found 24 scans / 8 explodes in this entry, zero
        # ReusedExchange under AQE broadcast shapes)
        .localCheckpoint(eager=True)
    )
    rare = (
        post.groupBy("s")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= df_cap)
        .select("s")
    )
    pr = post.join(rare, "s")
    pa = pr.select("s", F.col(id_col).alias("id_a"))
    pb = pr.select("s", F.col(id_col).alias("id_b"))
    pairs = (
        pa.join(pb, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    j = pairs.join(
        sh.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("sh_a")),
        "id_a",
    ).join(
        sh.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("sh_b")),
        "id_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    la, lb = F.size("sh_a"), F.size("sh_b")
    cont = inter.cast("double") / F.least(la, lb)
    return (
        j.select(
            F.when(la <= lb, F.col("id_a")).otherwise(F.col("id_b")).alias(
                "id_small"
            ),
            F.when(la <= lb, F.col("id_b")).otherwise(F.col("id_a")).alias(
                "id_big"
            ),
            cont.alias("containment"),
        )
        .filter(F.col("containment") >= F.lit(threshold))
    )


def keep_best_representatives(
    components: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "clf_score_milli",
) -> DataFrame:
    """Quality-aware canonical selection: per near-dup cluster, keep
    the member with the BEST quality score (doc-id-asc tie-break)
    instead of :func:`apply_near_dedup`'s min-id policy — the policy a
    training pipeline actually wants when a cluster mixes a clean
    original with truncated/mutated copies.

    Returns (component, kept_id, n_members, kept_score). The argmax is
    one ``max(struct(score, -id))`` aggregate — partial-aggregable
    map-side, no window over the corpus; ``scores`` joins to the
    cluster members first, so only the (small) member set ever
    aggregates. The score must be integer-grid
    (``clf_score_milli``-style) so the argmax is exact on any engine —
    near-dup members have near-identical text, so float scores WOULD
    tie and the winner would be engine-dependent."""
    members = components.join(scores, id_col)
    return (
        members.groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.max(
                F.struct(
                    F.col(score_col).alias("s"),
                    (-F.col(id_col)).alias("negid"),
                )
            ).alias("_w"),
        )
        .select(
            "component",
            (-F.col("_w.negid")).cast("long").alias("kept_id"),
            "n_members",
            F.col("_w.s").cast("long").alias("kept_score"),
        )
    )


def apply_keep_best(
    corpus: DataFrame,
    components: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "clf_score_milli",
) -> DataFrame:
    """End-to-end quality-aware near-dup REMOVAL: every cluster member
    that is not its cluster's best-quality representative
    (:func:`keep_best_representatives`) drops; docs in no cluster pass
    through. Same scale shape as :func:`apply_near_dedup` — the loser
    list is proportional to the near-dup count, so it broadcasts and
    the corpus never shuffles."""
    winners = keep_best_representatives(
        components, scores, id_col, score_col
    ).select(F.col("kept_id").alias(id_col))
    losers = components.join(winners, id_col, "left_anti").select(id_col)
    return corpus.join(F.broadcast(losers), on=id_col, how="left_anti")


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Dedup clusters from a near-dup pair list: (doc_id, component)
    where component = min doc id reachable through the pair graph.

    A training pipeline keeps ONE doc per component, not one per pair
    — pairs alone over-delete when dups chain (a~b, b~c).

    Iterative min-label propagation (the standard large-graph CC
    shape): each round joins labels across edges and keeps the
    per-node min; converges in O(component diameter) rounds — near-dup
    clusters are shallow (dup chains, not long paths), so the bound is
    small in practice. ``localCheckpoint`` truncates the plan between
    rounds (iterative lineage would otherwise grow exponentially).
    Raises after ``max_iters`` rather than returning a half-propagated
    labeling.
    """
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .unionByName(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        .persist()
    )
    labels = edges.groupBy("u").agg(F.min("v").alias("lbl"))
    labels = labels.select(
        "u", F.least(F.col("u"), F.col("lbl")).alias("lbl")
    ).localCheckpoint()
    for _ in range(max_iters):
        # neighbor labels -> per-node min (including own label)
        via_edges = (
            edges.join(labels.withColumnRenamed("u", "v"), "v")
            .select("u", "lbl")
        )
        new_labels = (
            labels.unionByName(via_edges)
            .groupBy("u")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            edges.unpersist()
            return labels.select(
                F.col("u").alias("doc_id"), F.col("lbl").alias("component")
            )
    edges.unpersist()
    raise RuntimeError(f"connected_components did not converge in {max_iters} rounds")


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs within Hamming distance ``max_hamming``.

    Scale path: block on the four 16-bit quarters of the simhash — two
    docs within Hamming distance 3 of each other must agree exactly on
    at least one quarter (pigeonhole), so the self-join key is a
    16-bit block, never the full N² comparison.
    """
    from far_finer_airtable_firestore_sync_spark.operators.text_analysis import simhash

    sh = simhash(df, text_col, id_col)
    return hex_hamming_pairs(sh, "simhash", id_col, max_hamming)


def hex_hamming_pairs(
    hashed: DataFrame,
    hash_col: str,
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Generic Hamming-distance self-join over a 16-hex-char (64-bit)
    hash column: (id_a, id_b, hamming<=max_hamming). Shared by the
    text SimHash path and the image perceptual-hash path — any
    64-bit fingerprint gets the same quarter-block pigeonhole plan.
    ``max_hamming`` must be <= 3: four 16-bit blocks guarantee a
    shared block only up to distance 3 (d+1 blocks for distance d)."""
    if max_hamming > 3:
        raise ValueError("quarter-block pigeonhole covers max_hamming <= 3")
    # localCheckpoint: the self-join evaluates its input ONCE instead
    # of re-running the (often Python-decode) upstream per join side —
    # same lesson as lsh_candidate_pairs' cached band table (measured
    # on the video path: join leg 4.8s -> ~2s). Checkpoint, not
    # persist(): a persist here had no matching unpersist, leaking a
    # cached table per call for the session lifetime; checkpointed
    # blocks are released by the ContextCleaner once the returned
    # plan is dropped. Tradeoff: lineage is cut, so an executor loss
    # re-fails instead of recomputing — acceptable for a bounded
    # fingerprint table (same call as kmeans_refine's guard).
    hashed = hashed.localCheckpoint(eager=True)
    quarters = hashed.select(
        F.col(id_col),
        F.col(hash_col).alias("_hh"),
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"q{i}:"),
                        F.expr(tx.simhash_block(f"`{hash_col}`", i)),
                    )
                    for i in range(4)
                ]
            )
        ).alias("block"),
    )
    a, b = quarters.alias("a"), quarters.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a._hh").alias("sh_a"),
            F.col("b._hh").alias("sh_b"),
        )
        .distinct()
    )
    # Hamming distance via the shared dual-dialect emitter (the same
    # expression the oracles run — one implementation, zero drift).
    ham = F.expr(tx.hamming_hex("sh_a", "sh_b", SPARK))
    return cand.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 9,
    max_chars: int | None = 256,
) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing at least one
    character n-gram with any benchmark doc, with the count of
    distinct benchmark docs hit. Training sets must drop (or flag)
    these rows or eval numbers are contaminated.

    Plan: both sides shingle once (scan-side projection), explode to
    (shingle, id) postings, equi-join on the shingle. The benchmark
    side is small by definition — Spark broadcasts it, so the corpus
    never shuffles; output is (doc_id, n_benchmark_hits).
    """
    c_sh = with_shingles(corpus, text_col, id_col, shingle_n, max_chars)
    b_sh = with_shingles(benchmark, text_col, id_col, shingle_n, max_chars)
    c_post = c_sh.select(F.col(id_col), F.explode("_sh").alias("gram"))
    b_post = b_sh.select(
        F.col(id_col).alias("_bench_id"), F.explode("_sh").alias("gram")
    )
    return (
        c_post.join(F.broadcast(b_post), "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("_bench_id").alias("n_benchmark_hits"))
    )


def bloom_positions_exprs(
    gram_col: str,
    m_bits: int,
    k: int,
    dialect: str,
    hash_family: str = "md5",
) -> list[str]:
    """The k Bloom bit positions of one n-gram: hash once, derive
    (a, b), positions ((a + i*b) mod P) mod m (Kirsch-Mitzenmacher
    family, same basis the minhash path uses). Pure integer
    arithmetic after the hash.

    ``hash_family``: ``"md5"`` (two 14-hex-digit digest windows —
    bit-identical across engines, the oracle-portable form) or
    ``"xxhash64"`` (two seeded JVM-native hashes, Spark-only — the
    production fast path, ~5x less hashing cost; same one-sided-error
    contract because only the hash family changes, not the
    all-k-positions-set rule)."""
    if hash_family == "xxhash64":
        if dialect != SPARK:
            raise ValueError("xxhash64 bloom positions are Spark-only")
        a = f"pmod(xxhash64({gram_col}, 1), {tx.KM_MOD})"
        b = f"pmod(xxhash64({gram_col}, 2), {tx.KM_MOD})"
    elif hash_family == "md5":
        a = tx.hex_to_bigint(f"substring(md5({gram_col}), 1, 14)", dialect)
        b = tx.hex_to_bigint(f"substring(md5({gram_col}), 15, 14)", dialect)
    else:
        raise ValueError(f"unknown hash_family: {hash_family}")
    return [
        f"((({a} + {i + 1} * {b}) % {tx.KM_MOD}) % {m_bits})"
        for i in range(k)
    ]


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 9,
    m_bits: int = 1 << 18,
    k: int = 2,
    max_chars: int | None = 256,
    hash_family: str = "md5",
) -> DataFrame:
    """Bloom-filter benchmark decontamination — the 100 TB path for
    "flag every training doc sharing an n-gram with the benchmark".

    The exact join (:func:`contamination_hits`) broadcasts the
    benchmark's raw grams — G grams x ~shingle_n bytes each. The Bloom
    form collapses them to at most k*G integer bit positions in
    [0, m_bits): a fixed-size broadcast no matter how long the grams
    are, probed with k bigint semi-joins. Error is ONE-SIDED: a gram
    is flagged iff ALL k of its positions are set, so every truly
    shared gram is flagged (the exact hit set is always a subset —
    test-asserted) and false positives are bounded by
    (1 - e^(-kG/m))^k.

    Determinism: positions come from the md5 Kirsch-Mitzenmacher
    family, so even this *approximate* structure is value-verified
    against the DuckDB oracle — not a rows-only entry.

    Output: (doc_id, n_suspect_grams) for corpus docs with >= 1
    flagged gram.
    """
    b_grams = (
        with_shingles(benchmark, text_col, id_col, shingle_n, max_chars)
        .select(F.explode("_sh").alias("gram"))
        .distinct()
    )
    pos_exprs = bloom_positions_exprs("gram", m_bits, k, SPARK, hash_family)
    bench_pos = None
    for e in pos_exprs:
        part = b_grams.select(F.expr(e).alias("pos"))
        bench_pos = part if bench_pos is None else bench_pos.unionByName(part)
    bench_pos = bench_pos.distinct()

    c_grams = with_shingles(corpus, text_col, id_col, shingle_n, max_chars)
    probe = c_grams.select(
        F.col(id_col), F.explode("_sh").alias("gram")
    ).select(
        F.col(id_col),
        F.col("gram"),
        *[F.expr(e).alias(f"_p{i}") for i, e in enumerate(pos_exprs)],
    )
    for i in range(k):
        probe = probe.join(
            F.broadcast(bench_pos.withColumnRenamed("pos", f"_p{i}")),
            f"_p{i}",
            "left_semi",
        )
    return probe.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_suspect_grams")
    )


def bloom_decontaminate_sql(
    corpus_sql: str,
    benchmark_sql: str,
    shingle_n: int = 9,
    m_bits: int = 1 << 18,
    k: int = 2,
    max_chars: int | None = 256,
) -> str:
    """Oracle twin of :func:`bloom_decontaminate` (DuckDB dialect).
    ``corpus_sql`` / ``benchmark_sql`` are subqueries yielding
    (doc_id, text)."""
    from far_finer_airtable_firestore_sync_spark.functions.canonical import (
        DUCKDB,
    )

    sh = tx.shingles("text", shingle_n, DUCKDB, max_chars)
    pos = bloom_positions_exprs("gram", m_bits, k, DUCKDB)
    pos_union = " union ".join(
        f"select {e} as pos from bg" for e in pos
    )
    probes = " and ".join(
        f"{e} in (select pos from bench_pos)" for e in pos
    )
    return f"""
with bg as (
  select distinct unnest({sh}) as gram from ({benchmark_sql})
),
bench_pos as ({pos_union}),
cg as (
  select doc_id, unnest({sh}) as gram from ({corpus_sql})
)
select doc_id, count(*) as n_suspect_grams
from cg where {probes}
group by doc_id
"""


def lsh_eval(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 9,
    seeds: int = 8,
    rows_per_band: int = 4,
    max_chars: int | None = 256,
    threshold: float = 0.5,
) -> DataFrame:
    """Banding-quality evaluation of MinHash-LSH: recall and precision
    of the candidate pairs against the EXACT Jaccard-above-threshold
    truth set. One summary row:
    (n_truth, n_cand, n_hits, recall, precision).

    Recall is THE tuning metric for the band knobs (seeds /
    rows_per_band) — the fraction of true near-dup pairs the bands
    catch; precision is candidate efficiency (verification work per
    true pair). The truth side enumerates pairs via a shingle-postings
    self-join (a pair with zero shared shingles has Jaccard 0, so
    co-shingle pairs are the complete truth support) with intersection
    sizes falling out of the groupBy count — no all-pairs cross join.

    Scale: postings-join cost concentrates on hot shingles
    (boilerplate) exactly like the contamination joins — at 100 TB run
    the eval on a hash-sampled slice (`sample_hash`), which estimates
    recall unbiasedly since banding is per-document-pair. The shingle
    table is computed once and shared by both sides.
    """
    sh = with_shingles(df, text_col, id_col, shingle_n, max_chars).persist()
    post = sh.select(F.col(id_col), F.explode("_sh").alias("_s"))
    sizes = sh.select(F.col(id_col), F.size("_sh").alias("_n"))
    a, b = post.alias("a"), post.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a._s") == F.col("b._s"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("_ninter"))
    )
    # sizes is one row per doc — broadcast so the (large) intersection
    # table never re-shuffles for the two size lookups
    truth = (
        inter.join(
            F.broadcast(
                sizes.select(
                    F.col(id_col).alias("id_a"), F.col("_n").alias("_na")
                )
            ),
            "id_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col(id_col).alias("id_b"), F.col("_n").alias("_nb")
                )
            ),
            "id_b",
        )
        .filter(
            (
                F.col("_ninter").cast("double")
                / F.greatest(
                    F.col("_na") + F.col("_nb") - F.col("_ninter"), F.lit(1)
                )
            )
            >= threshold
        )
        .select("id_a", "id_b")
    )
    sigs = signatures_from_shingles(sh, seeds)
    keys = tx.band_keys([f"s{i}" for i in range(seeds)], rows_per_band)
    bands = sigs.select(
        F.col(id_col),
        F.explode(F.array(*[F.expr(k) for k in keys])).alias("band_key"),
    )
    cand = _pairs_from_bands(bands, id_col)
    merged = truth.withColumn("_t", F.lit(1)).join(
        cand.withColumn("_c", F.lit(1)), ["id_a", "id_b"], "full_outer"
    )
    counts = merged.agg(
        F.sum(F.coalesce(F.col("_t"), F.lit(0))).cast("bigint").alias("n_truth"),
        F.sum(F.coalesce(F.col("_c"), F.lit(0))).cast("bigint").alias("n_cand"),
        F.sum(
            F.when((F.col("_t") == 1) & (F.col("_c") == 1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_hits"),
    )
    return counts.select(
        "n_truth",
        "n_cand",
        "n_hits",
        (
            F.col("n_hits").cast("double")
            / F.greatest(F.col("n_truth"), F.lit(1)).cast("double")
        ).alias("recall"),
        (
            F.col("n_hits").cast("double")
            / F.greatest(F.col("n_cand"), F.lit(1)).cast("double")
        ).alias("precision"),
    )


#: PageRank integer unit: ranks live on a 1e-12 grid so every
#: operation (init split, per-degree division, damping) is exact
#: bigint arithmetic — no float sums to perturb cross-engine parity
PR_UNIT = 1_000_000_000_000


def pagerank(
    pairs: DataFrame,
    iterations: int = 3,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Integer-exact PageRank over an undirected pair graph (Brin &
    Page 1998; damping 0.85) — the canonical-selection complement of
    :func:`connected_components`: within a near-dup cluster the
    highest-rank node is the most-connected (most "central") copy,
    the one dedup should keep.

    Determinism: ranks are bigint micro-units (PR_UNIT grid); each
    step is `(15*UNIT) div (100*N) + (85 * sum(r_u div deg_u)) div
    100` — pure integer ops, identical in any engine and under any
    partitioning. The DuckDB oracle unrolls the same recurrence.

    Scale shape: per-iteration cost is one join on the edge key plus
    a groupBy on the destination — the standard distributed PR step;
    `localCheckpoint` truncates lineage each round exactly like the
    CC operator. Iterations are fixed (ranking stabilizes long before
    convergence for dedup-cluster graphs, which are shallow)."""
    # w=1 reduces the weighted recurrence to exactly this one:
    # (r * 1) div wd == r div deg — delegate so the two operators
    # can never drift (review finding).
    return weighted_pagerank(
        pairs.select(F.col(id_a), F.col(id_b), F.lit(1).alias("_pr_w")),
        iterations=iterations,
        id_a=id_a,
        id_b=id_b,
        weight="_pr_w",
    ).select(F.col("node").alias("doc_id"), F.col("pr_micro"))


def weighted_pagerank(
    pairs: DataFrame,
    iterations: int = 3,
    id_a: str = "id_a",
    id_b: str = "id_b",
    weight: str = "w",
) -> DataFrame:
    """Integer-exact WEIGHTED PageRank over an undirected weighted
    pair graph — the TextRank recurrence (Mihalcea & Tarau, EMNLP'04:
    vote mass splits proportionally to edge weight instead of evenly).

    Determinism: identical idiom to :func:`pagerank`, with the
    per-edge contribution `(r_u * w_uv) div W_u` (multiply BEFORE the
    integer division — one truncation per edge, not per unit) where
    W_u is u's total incident weight. r <= PR_UNIT (1e12) and fixture
    weights are small ints, so the product stays far inside bigint.

    Scale shape: per iteration one join on the edge key + one groupBy
    on the destination, lineage truncated per round — same plan as
    the unweighted operator."""
    edges = (
        pairs.select(
            F.col(id_a).alias("u"),
            F.col(id_b).alias("v"),
            F.col(weight).cast("long").alias("w"),
        )
        .unionByName(
            pairs.select(
                F.col(id_b).alias("u"),
                F.col(id_a).alias("v"),
                F.col(weight).cast("long").alias("w"),
            )
        )
        .distinct()
        .localCheckpoint()
    )
    wdeg = edges.groupBy("u").agg(F.sum("w").alias("wd"))
    n = wdeg.agg(F.count(F.lit(1)).alias("nn"))
    ranks = (
        wdeg.crossJoin(F.broadcast(n))
        .select("u", F.expr(f"{PR_UNIT} div nn").alias("r"))
        .localCheckpoint()
    )
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, "u")
            .join(wdeg, "u")
            .select(F.col("v"), F.expr("(r * w) div wd").alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            wdeg.join(contrib, wdeg.u == contrib.v, "left")
            .crossJoin(F.broadcast(n))
            .select(
                wdeg.u.alias("u"),
                F.expr(
                    f"(15 * {PR_UNIT}) div (100 * nn)"
                    " + (85 * coalesce(s, 0)) div 100"
                ).alias("r"),
            )
            .localCheckpoint()
        )
    return ranks.select(F.col("u").alias("node"), F.col("r").alias("pr_micro"))


def edit_distance_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dist: int = 2,
    key_chars: int = 24,
) -> DataFrame:
    """Edit-distance similarity join: (id_a, id_b, edit_dist) for all
    pairs whose lowercased ``key_chars``-char text prefix is within
    levenshtein distance ``max_dist`` — the title/name-dedup shape.

    Scale path (PassJoin, Li et al. 2011, public paper): partition
    each key into ``max_dist + 1`` fixed-width segments — with at most
    d edits, at least one segment is edit-free (pigeonhole) and its
    image in the other string is the IDENTICAL substring shifted by at
    most d. So the index side emits d+1 segments per doc and the probe
    side emits the substrings at each segment start shifted by
    [-d, +d]; the equi-join on (segment_no, substring) fans out
    ~(d+1)(2d+2) rows per doc, never N² — and unlike q-gram blocking
    it stays selective on low-entropy text (measured on the fixture:
    110k candidates vs 5.3M for rarest-3-gram prefixes at sf0.1).
    Exact ``levenshtein`` (built-in in BOTH engines) verifies.

    Domain: keys shorter than ``key_chars`` are excluded — fixed-width
    segmentation needs full-width keys; per-length segment bounds (the
    full PassJoin index) are the extension for short-string corpora.
    Gram blocking first tried and measured: rarest-(d*q+1) 3-gram
    prefixes produced 5.3M candidates on the word-salad fixture
    openings (320 gram types across all prefixes) — a documented dead
    end for this data shape.
    """
    n_seg = max_dist + 1
    if key_chars % n_seg:
        raise ValueError("key_chars must be divisible by max_dist + 1")
    w = key_chars // n_seg
    keys = (
        df.select(
            F.col(id_col),
            F.expr(
                f"lower(substring(`{text_col}`, 1, {key_chars}))"
            ).alias("_k"),
        )
        .filter(F.length("_k") == key_chars)
    )
    segs = keys.select(
        F.col(id_col).alias("id_a"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {n_seg - 1}),"
                f" s -> substring(_k, 1 + {w} * s, {w}))"
            )
        ).alias("_s", "_seg"),
    )
    # probe substrings at each segment start shifted by [-d, +d],
    # clamped to valid full-width starts
    probe_entries = []
    for s_no in range(n_seg):
        for delta in range(-max_dist, max_dist + 1):
            pos = 1 + w * s_no + delta
            if 1 <= pos <= key_chars - w + 1:
                probe_entries.append(
                    f"struct({s_no} as _s, substring(_k, {pos}, {w}) as _seg)"
                )
    probes = keys.select(
        F.col(id_col).alias("id_b"),
        F.expr(f"explode(array({', '.join(probe_entries)}))").alias("_e"),
    ).select("id_b", "_e._s", "_e._seg")
    # One directed leg suffices: for ANY qualifying (a, b) the
    # pigeonhole applies to a's own segmentation (each edit breaks at
    # most one of a's d+1 segments), so a's edit-free segment appears
    # among b's shifted probes — no symmetric leg needed, and the
    # id_a < id_b filter canonicalizes the pair once.
    cand = (
        segs.join(probes, ["_s", "_seg"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )
    ka = keys.select(F.col(id_col).alias("id_a"), F.col("_k").alias("_ka"))
    kb = keys.select(F.col(id_col).alias("id_b"), F.col("_k").alias("_kb"))
    return (
        cand.join(ka, "id_a")
        .join(kb, "id_b")
        .withColumn("edit_dist", F.expr("levenshtein(_ka, _kb)").cast("int"))
        .filter(F.col("edit_dist") <= max_dist)
        .select("id_a", "id_b", "edit_dist")
    )
