"""Similarity search over embedding columns (array<float>).

North-star extension (SURVEY.md §2.7): approximate nearest neighbor.

Three tiers, slowest-exact to fastest-approximate:

1. **Brute-force quantized** (`cosine_topk`) — the oracle-checkable
   baseline. Vectors are quantized to a fixed integer grid so dot
   products are exact integer folds (order-independent — float sums
   are not associative across engines/partitions); one final IEEE
   division yields bit-identical cosines in Spark and DuckDB.
2. **Brute-force Arrow** (`cosine_topk_pandas`) — same semantics, the
   production fast path: queries broadcast to every partition, numpy
   matmul per Arrow batch via mapInPandas, top-k per partition then a
   tiny global top-k. The corpus is never shuffled at all — the only
   movement is (queries x k) rows per partition to the final reduce.
3. **IVF-lite** (`ivf_topk`) — the 100 TB path: a deterministic
   centroid subset partitions the corpus into buckets (one shuffle,
   done once at index build); queries probe only the ``nprobe``
   nearest buckets, so per-query work drops from O(N) to
   O(nprobe * N / n_centroids). Recall < 1 by construction — that is
   the ANN contract.
4. **Product quantization** (`pq_encode` / `pq_topk`) — the
   compressed-index path: each vector stored as M sub-codes, queries
   rank by LUT-summed asymmetric distances (O(M) per pair, the scan
   never touches raw vectors). Composes with IVF (probe buckets,
   then ADC-rank inside them).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from far_finer_airtable_firestore_sync_spark.functions import textsql as tx
from far_finer_airtable_firestore_sync_spark.functions.canonical import SPARK


def _quantized(df: DataFrame, vec_col: str, out: str) -> DataFrame:
    return df.withColumn(out, F.expr(tx.quantize(f"`{vec_col}`", SPARK)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (quantized-portable).

    Output: (query_id, neighbor_id, cosine, rank). Self-matches are
    excluded. Ties broken by neighbor id (deterministic).
    """
    c = _quantized(corpus, vec_col, "_qv").select(
        F.col(id_col).alias("neighbor_id"), "_qv"
    )
    q = _quantized(queries, vec_col, "_qq").select(
        F.col(id_col).alias("query_id"), "_qq"
    )
    cos = F.expr(tx.cosine_quantized("_qq", "_qv", SPARK))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Arrow/numpy brute-force top-k — the single-node-speed baseline.

    Per partition: one matmul (batch x dim) @ (dim x n_queries), then
    per-partition top-k; global top-k finishes on (partitions * q * k)
    rows only.
    """
    import numpy as np  # noqa: PLC0415

    q_rows = queries.select(id_col, vec_col).collect()  # small by contract
    q_ids = [r[0] for r in q_rows]
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    spark = corpus.sparkSession
    bq = spark.sparkContext.broadcast((q_ids, q_norm))

    schema = "query_id long, neighbor_id long, cosine double"

    def part(it):
        import pandas as pd  # noqa: PLC0415

        ids, qn = bq.value
        for pdf in it:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ qn.T  # (rows, n_queries)
            nid = pdf[id_col].to_numpy()
            out = []
            for j, qid in enumerate(ids):
                col = sims[:, j]
                mask = nid != qid
                cand_idx = np.nonzero(mask)[0]
                top = cand_idx[np.argsort(-col[cand_idx], kind="stable")[:k]]
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, "neighbor_id": nid[top], "cosine": col[top]}
                    )
                )
            if out:
                yield pd.concat(out)

    partial = corpus.select(id_col, vec_col).mapInPandas(part, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return partial.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """Assign every vector to its nearest centroid (quantized cosine,
    deterministic argmax by (cosine desc, centroid id asc)).

    This is the one-time index build: a broadcast of the centroid set
    against the corpus scan, one small shuffle if the caller
    repartitions by ``centroid_id`` afterwards (bucketed layout).
    """
    c = _quantized(corpus, vec_col, "_qv")
    cents = _quantized(centroids, vec_col, "_qc").select(
        F.col(id_col).alias(centroid_id), "_qc"
    )
    cos = F.expr(tx.cosine_quantized("_qv", "_qc", SPARK))
    scored = c.crossJoin(F.broadcast(cents)).withColumn("_cos", cos)
    w = Window.partitionBy(id_col).orderBy(
        F.col("_cos").desc(), F.col(centroid_id).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_qc", "_cos")
    )


def ivf_filtered_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    predicate: str,
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Filtered vector search: IVF ANN restricted to corpus rows
    matching a metadata ``predicate`` (the "filtered ANN" mode every
    production vector store exposes — FAISS IDSelector / Milvus expr).

    PRE-filter semantics: the predicate restricts the candidate set
    BEFORE scoring, so top-k ranks only among matching rows (recall is
    measured against the filtered ground truth, not the full corpus).
    A vector's centroid assignment is independent of other vectors, so
    filter-then-assign ≡ assign-then-filter — Catalyst pushes the
    predicate below the assignment projection into the parquet scan
    (PushedFilters), meaning non-matching vectors are never even
    scored against centroids. Selective predicates thin the probed
    buckets; raise ``nprobe`` to hold recall when the filter keeps
    only a small fraction of each bucket.
    """
    return ivf_topk(
        corpus.filter(predicate), queries, centroids, k, nprobe,
        vec_col, id_col,
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    near_dup_cosine: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Hard-negative mining for retrieval/embedding training: per
    query, the top-k most similar corpus vectors BELOW the near-dup
    ceiling — similar enough to be hard, not so similar they are
    duplicates/positives in disguise (the standard in-batch-negatives
    upgrade, e.g. DPR, Karpukhin et al. 2020, arXiv:2004.04906 §3.2).

    Output: (query_id, negative_id, cosine, rank).

    Scale shape: identical to ``cosine_topk`` (broadcast query set
    over one corpus scan, bounded per-query window); the ceiling is a
    scan-side filter. Swap the scan for the IVF probe at index scale.
    """
    c = _quantized(corpus, vec_col, "_qv").select(
        F.col(id_col).alias("negative_id"), "_qv"
    )
    q = _quantized(queries, vec_col, "_qq").select(
        F.col(id_col).alias("query_id"), "_qq"
    )
    cos = F.expr(tx.cosine_quantized("_qq", "_qv", SPARK))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("negative_id") != F.col("query_id"))
        .select("query_id", "negative_id", cos.alias("cosine"))
        .filter(F.col("cosine") < F.lit(near_dup_cosine))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("negative_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def training_triples(
    corpus: DataFrame,
    queries: DataFrame,
    n_negatives: int = 3,
    negative_offset: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Contrastive training-triple mining (the DPR/InfoNCE data prep,
    Karpukhin et al. 2020, arXiv:2004.04906): per query, pair its
    nearest neighbor (the positive) with ``n_negatives`` hard
    negatives drawn from ranks ``negative_offset+1 ...`` — close
    enough to be informative, far enough (the rank margin) not to be
    alternative positives. One ranked-neighbors pass feeds both roles.

    Output: (query_id, positive_id, negative_id, pos_cosine,
    neg_cosine, margin, neg_rank); margin = pos - neg is the triplet
    training signal.

    Scale shape: identical to ``cosine_topk`` (broadcast query set
    over one corpus scan); ONE per-query window ranks neighbors and
    both the positive (rank 1) and the negatives (ranks offset+1..)
    are slices of it — no second scan, no self-join of results."""
    c = _quantized(corpus, vec_col, "_qv").select(
        F.col(id_col).alias("neighbor_id"), "_qv"
    )
    q = _quantized(queries, vec_col, "_qq").select(
        F.col(id_col).alias("query_id"), "_qq"
    )
    cos = F.expr(tx.cosine_quantized("_qq", "_qv", SPARK))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    ranked = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(
            (F.col("rank") == 1)
            | (
                (F.col("rank") > negative_offset)
                & (F.col("rank") <= negative_offset + n_negatives)
            )
        )
    )
    pos = ranked.filter("rank = 1").select(
        "query_id",
        F.col("neighbor_id").alias("positive_id"),
        F.col("cosine").alias("pos_cosine"),
    )
    neg = ranked.filter("rank > 1").select(
        "query_id",
        F.col("neighbor_id").alias("negative_id"),
        F.col("cosine").alias("neg_cosine"),
        F.col("rank").cast("int").alias("neg_rank"),
    )
    return pos.join(neg, "query_id").select(
        "query_id", "positive_id", "negative_id",
        "pos_cosine", "neg_cosine",
        (F.col("pos_cosine") - F.col("neg_cosine")).alias("margin"),
        "neg_rank",
    )


def write_ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Materialize the IVF index as parquet partitioned by
    ``centroid_id`` — the production layout step SCALE.md describes:
    once on disk, a probe of ``nprobe`` buckets is a PARTITION-PRUNED
    scan (the `centroid_id IN (...)` filter never touches the other
    buckets' files), so per-query cost is O(nprobe·N/C) rows read,
    not a full-index scan. Plan-verified by
    tests/test_extensions.py::test_ivf_index_probe_is_partition_pruned.
    """
    ivf_assign(corpus, centroids, vec_col, id_col).write.mode(
        "overwrite"
    ).partitionBy("centroid_id").parquet(path)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-style ANN: probe only the ``nprobe`` nearest buckets.

    Recall is approximate; determinism is exact (quantized scores,
    id tie-breaks), so the result is still oracle-checkable.
    """
    assigned = ivf_assign(corpus, centroids, vec_col, id_col)
    # queries -> their nprobe nearest centroids (query vector kept for
    # the in-bucket rescore)
    probes = _probe_buckets(
        queries, centroids, nprobe, vec_col, id_col, keep_query_vec=True
    )
    # search only the probed buckets: equi-join on centroid_id
    cos = F.expr(tx.cosine_quantized("_qq", "_qv", SPARK))
    scored = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id", F.col(id_col).alias("neighbor_id"), cos.alias("cosine")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def embedding_dim_stats(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-dimension corpus statistics (mean, variance) for embedding
    preprocessing — centering, whitening, quantizer calibration.

    Exactness: values fold on the quantized integer grid (bigint
    sum(qv), sum(qv²)), and each output is ONE IEEE division of exact
    integers — mean = s1/(n·scale), var = (n·s2 − s1²)/(n²·scale²) —
    so both engines agree bit-for-bit regardless of partitioning.

    Plan: posexplode projection + one (dim)-keyed partial aggregation;
    the shuffle carries dims × input-partitions partial rows, never
    the vectors."""
    per = _quantized(df, vec_col, "_qv").select(
        F.posexplode("_qv").alias("dim", "qv")
    )
    agg = per.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("qv").alias("_s1"),
        F.sum(F.expr("qv * qv")).alias("_s2"),
    )
    return agg.select(
        "dim",
        "n_vecs",
        F.expr("cast(_s1 as double) / (n_vecs * 1000)").alias("mean"),
        # numerator in decimal(38,0): n*s2 ~ n^2*1e6 exceeds int64 at
        # ~3M vectors (DuckDB's sum() is already hugeint; this keeps
        # the Spark side exact to ~1e16 vectors)
        F.expr(
            "cast(cast(n_vecs as decimal(38,0)) * _s2"
            " - cast(_s1 as decimal(38,0)) * _s1 as double)"
            " / (cast(n_vecs as double) * n_vecs * 1000000)"
        ).alias("variance"),
    )


def kmeans_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd iterations of (spherical-ish) k-means: refine an initial
    centroid set against the corpus — the real IVF index build, not
    just a deterministic seed subset.

    Every step is exact and cross-engine portable: assignment uses
    quantized-cosine argmax (integer dots, id tie-break); the new
    centroid is the per-dimension MEAN of member vectors computed in
    integer space (bigint sums / count — one exact IEEE division per
    dimension); re-quantization rounds back onto the integer grid.
    Empty clusters keep their previous centroid.

    Plan shape per iteration: one broadcast of the K centroids, one
    (id)-windowed argmax, one (centroid, dim) partial aggregation —
    shuffle rows ~ K * dims, never the corpus. Output:
    (vec_id, embedding) rows usable anywhere a centroid set is.
    """
    cents = centroids.select(id_col, vec_col)
    for _ in range(iters):
        assigned = ivf_assign(corpus, cents, vec_col, id_col)
        per_dim = (
            assigned.select(
                "centroid_id", F.posexplode("_qv").alias("pos", "qval")
            )
            .groupBy("centroid_id", "pos")
            .agg(
                F.sum("qval").alias("qsum"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        # reassemble: per-dim mean back to a double array in pos order,
        # de-quantized off the integer grid (quantize() scale = 1000)
        refined = (
            per_dim.groupBy("centroid_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, "
                    "(cast(qsum as double) / n) / 1000.0 as dim))), p -> p.dim)"
                ).alias("_new_emb")
            )
        )
        cents = (
            cents.withColumnRenamed(id_col, "centroid_id")
            .join(refined, "centroid_id", "left_outer")
            .select(
                F.col("centroid_id").alias(id_col),
                F.coalesce(F.col("_new_emb"), F.col(vec_col)).alias(vec_col),
            )
        )
        # Materialize the K-row centroid frame and truncate lineage:
        # without this, iteration N's broadcast re-executes every prior
        # iteration, and the downstream consumer re-executes them all
        # again (measured ~2x on the sf0.1 index build).
        cents = cents.localCheckpoint(eager=True)
    return cents


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    centroids: Optional[DataFrame] = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= threshold).

    With ``centroids`` given, pairs are only searched within the same
    IVF bucket (the scale path: near-identical vectors land in the
    same bucket); without, a full self-join (test scale only).
    """
    if centroids is not None:
        assigned = ivf_assign(corpus, centroids, vec_col, id_col)
    else:
        assigned = _quantized(corpus, vec_col, "_qv")
    # Precompute each vector's norm ONCE: higher-order-function folds
    # are interpreted (not codegen'd), and a vector participates in
    # many pairs — inlining the self-norms in the pair expression was
    # ~3x the fold work (measured 27s -> ~8s at sf0.1).
    assigned = assigned.withColumn(
        "_norm", F.expr(f"sqrt(cast({tx.dot_int('_qv', '_qv', SPARK)} as double))")
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    if centroids is not None:
        join_cond = (F.col("a.centroid_id") == F.col("b.centroid_id")) & (
            F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
        )
    else:
        join_cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    dot = F.expr(tx.dot_int("a._qv", "b._qv", SPARK))
    cos = dot.cast("double") / (F.col("a._norm") * F.col("b._norm"))
    return (
        a.join(b, join_cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus with k-means buckets, then
    within each cluster drop every vector that has a near-duplicate
    (quantized cosine >= ``threshold``) ranked ahead of it under the
    deterministic keep-order (cosine-to-centroid ASC — SemDeDup keeps
    the example FARTHEST from the centroid — id ASC tie-break).

    Returns the surviving rows: (id, centroid_id, cos_to_centroid).

    Scale shape: one broadcast centroid assignment (no corpus
    shuffle), then a self-join keyed on ``centroid_id`` — cost is
    sum over clusters of |cluster|^2, the SemDeDup contract (cluster
    count is chosen so clusters stay small). No all-pairs join; the
    dropped-set anti-join is on the id key. All comparisons run on
    the integer quantization grid, so results are engine-exact.
    """
    assigned = ivf_assign(corpus, centroids, vec_col, id_col)
    cents = _quantized(centroids, vec_col, "_qc").select(
        F.col(id_col).alias("centroid_id"), "_qc"
    )
    cos_c = F.expr(tx.cosine_quantized("_qv", "_qc", SPARK))
    # Precompute each vector's norm ONCE (same rationale as
    # embedding_near_dup_pairs: higher-order-function folds are
    # interpreted, and each vector joins into many pairs — inlining
    # cosine_quantized per pair is 3 folds/pair instead of 1). The
    # pair cosine dot/(norm_a*norm_b) evaluates the exact same double
    # expression the SQL twin's inline form does.
    scored = (
        assigned.join(F.broadcast(cents), "centroid_id")
        .withColumn("cos_to_centroid", cos_c)
        .drop("_qc")
        .withColumn(
            "_norm",
            F.expr(f"sqrt(cast({tx.dot_int('_qv', '_qv', SPARK)} as double))"),
        )
    )
    a, b = scored.alias("a"), scored.alias("b")
    keep_before = (
        (F.col("a.cos_to_centroid") < F.col("b.cos_to_centroid"))
        | (
            (F.col("a.cos_to_centroid") == F.col("b.cos_to_centroid"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        )
    )
    pair_dot = F.expr(tx.dot_int("a._qv", "b._qv", SPARK))
    pair_cos = pair_dot.cast("double") / (F.col("a._norm") * F.col("b._norm"))
    dropped = (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id")) & keep_before,
        )
        .filter(pair_cos >= F.lit(threshold))
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
    )
    return scored.join(dropped, id_col, "left_anti").select(
        id_col, "centroid_id", "cos_to_centroid"
    )


def truncate_normalize(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """Matryoshka-style truncation: keep the first ``dim`` dimensions
    and L2-renormalize — the standard way to trade embedding quality
    for index size when the model was trained with nested losses.

    Output components are renormalized onto a ``scale`` integer grid:
    q_i * scale / sqrt(sum q^2) with exact bigint numerators, one
    correctly-rounded sqrt and one division — bit-identical across
    engines. Zero shuffle (pure projection); all-zero truncations
    yield NULL components (no 0/0)."""
    q = F.expr(tx.quantize(f"slice(`{vec_col}`, 1, {dim})", SPARK))
    with_q = df.select(F.col(id_col), q.alias("_qt"))
    norm = f"sqrt(cast({tx.dot_int('_qt', '_qt', SPARK)} as double))"
    comp = (
        f"transform(_qt, x -> cast(round(cast(x as bigint) * {scale} / "
        f"nullif({norm}, 0.0)) as bigint))"
    )
    return with_q.select(
        F.col(id_col), F.expr(comp).alias("_nv")
    )


def truncate_normalize_sql(
    dim: int,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of ``truncate_normalize`` (exploded per-dim rows:
    the driver hasher takes scalars, not arrays)."""
    from far_finer_airtable_firestore_sync_spark.functions.canonical import (
        DUCKDB,
    )

    q = tx.quantize(f"({vec_col})[1:{dim}]", DUCKDB)
    norm = f"sqrt(cast({tx.dot_int('qt', 'qt', DUCKDB)} as double))"
    return f"""
with q as (select {id_col}, {q} as qt from {table}),
n as (select {id_col}, qt, {norm} as nrm from q)
select {id_col},
       unnest(generate_series(0, len(qt) - 1)) as pos,
       unnest(list_transform(qt, x -> cast(round(
         cast(x as bigint) * {scale} / nullif(nrm, 0.0)) as bigint)))
         as q_val
from n
"""


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    m_subspaces: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization index build: split each vector into
    ``m_subspaces`` contiguous subspaces and store, per vector, the id
    of the nearest codebook entry in each subspace (squared-L2 on the
    integer grid; ties break on codebook id). Output: (vec_id, codes)
    with ``codes`` an m-length int array — the classic PQ compressed
    index, M small ints per vector instead of D floats.

    Codebook entries are the subspace slices of the ``codebooks``
    rows (one shared seed set; per-subspace codebooks fall out of the
    slicing). The assignment is a broadcast of M x C tiny sub-vectors
    against the corpus scan — no corpus shuffle beyond the final
    groupBy that packs M codes back into one array per vector.
    """
    if dim % m_subspaces:
        raise ValueError(
            f"m_subspaces={m_subspaces} must divide dim={dim} evenly "
            "— trailing dimensions would be silently dropped from "
            "every code and distance"
        )
    ds = dim // m_subspaces
    sub = (
        f"explode(transform(sequence(0, {m_subspaces - 1}), "
        f"m -> struct(m as m, slice(_qv, m * {ds} + 1, {ds}) as sub)))"
    )
    c_sub = (
        _quantized(corpus, vec_col, "_qv")
        .select(F.col(id_col), F.expr(sub).alias("_e"))
        .select(id_col, F.col("_e.m").alias("m"), F.col("_e.sub").alias("_sv"))
    )
    k_sub = (
        _quantized(codebooks, vec_col, "_qv")
        .select(F.col(id_col).alias("_code"), F.expr(sub).alias("_e"))
        .select("_code", F.col("_e.m").alias("m"), F.col("_e.sub").alias("_kv"))
    )
    d2 = F.expr(tx.l2sq_int("_sv", "_kv", SPARK))
    w = Window.partitionBy(id_col, "m").orderBy(
        F.col("_d2").asc(), F.col("_code").asc()
    )
    coded = (
        c_sub.join(F.broadcast(k_sub), "m")
        .withColumn("_d2", d2)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "m", "_code")
    )
    return coded.groupBy(id_col).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(m, _code))),"
            " s -> s._code)"
        ).alias("codes")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    k: int = 10,
    m_subspaces: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ/ADC approximate nearest neighbors: rank corpus vectors by
    the asymmetric distance sum_m ||q_sub_m - codebook[m][code_m]||^2
    — the query compares against each vector's M codes via a
    precomputed lookup table, O(M) per pair instead of O(D).

    The LUT (per query: M x C squared distances, integer-exact) is a
    tiny broadcast; the corpus side carries only (vec_id, codes), so
    the scan reads the compressed index, never the raw vectors — at
    100 TB that is the difference between scanning M bytes and D
    floats per vector. Approximation error comes from quantizing to
    codebook cells; determinism is exact (bigint distances, id
    tie-breaks), so the result remains value-verifiable cross-engine.

    Output: (query_id, neighbor_id, approx_d2, rank).
    """
    codes = pq_encode(
        corpus, codebooks, m_subspaces, dim, vec_col, id_col
    )
    lut = _adc_lut(queries, codebooks, m_subspaces, dim, vec_col, id_col)
    scored = (
        codes.crossJoin(F.broadcast(lut))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            _adc_sum().alias("approx_d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2").asc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _adc_sum():
    """ADC distance: zip each vector's codes with the per-subspace LUT
    rows and sum the matching entries — O(M) filter+sum per
    (query, vector). Shared by pq_topk and ivfpq_topk. (A function,
    not a module constant: F.expr needs an active SparkContext.)"""
    return F.expr(
        "aggregate(zip_with(codes, _lut, (cd, row) ->"
        " filter(row, e -> e.code = cd)[0].d2),"
        " cast(0 as bigint), (acc, v) -> acc + v)"
    )


def _adc_lut(
    queries: DataFrame,
    codebooks: DataFrame,
    m_subspaces: int,
    dim: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Per-query ADC lookup table (query_id, _lut) with
    ``_lut[m][code_rank] = d2``: codebook ids sorted so positions match
    the code values' rank — the single definition pq_topk and
    ivfpq_topk both broadcast."""
    ds = dim // m_subspaces
    sub = (
        f"explode(transform(sequence(0, {m_subspaces - 1}), "
        f"m -> struct(m as m, slice(_qv, m * {ds} + 1, {ds}) as sub)))"
    )
    q_sub = (
        _quantized(queries, vec_col, "_qv")
        .select(F.col(id_col).alias("query_id"), F.expr(sub).alias("_e"))
        .select(
            "query_id", F.col("_e.m").alias("m"), F.col("_e.sub").alias("_sv")
        )
    )
    k_sub = (
        _quantized(codebooks, vec_col, "_qv")
        .select(F.col(id_col).alias("_code"), F.expr(sub).alias("_e"))
        .select("_code", F.col("_e.m").alias("m"), F.col("_e.sub").alias("_kv"))
    )
    d2 = F.expr(tx.l2sq_int("_sv", "_kv", SPARK))
    lut_rows = q_sub.join(F.broadcast(k_sub), "m").select(
        "query_id", "m", "_code", d2.alias("_d2")
    )
    return (
        lut_rows.groupBy("query_id", "m")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(_code, _d2))),"
                " s -> struct(s._code as code, s._d2 as d2))"
            ).alias("_row")
        )
        .groupBy("query_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(m, _row))),"
                " s -> s._row)"
            ).alias("_lut")
        )
    )


def _probe_buckets(
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    vec_col: str,
    id_col: str,
    keep_query_vec: bool = False,
) -> DataFrame:
    """Each query's ``nprobe`` nearest coarse buckets (quantized
    cosine, deterministic tie-breaks) — shared by ivf_topk (which also
    carries the query vector for the in-bucket rescore) and
    ivfpq_topk (which only needs the bucket ids)."""
    q = _quantized(queries, vec_col, "_qq").select(
        F.col(id_col).alias("query_id"), "_qq"
    )
    cents = _quantized(centroids, vec_col, "_qc").select(
        F.col(id_col).alias("centroid_id"), "_qc"
    )
    qcos = F.expr(tx.cosine_quantized("_qq", "_qc", SPARK))
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_qcos").desc(), F.col("centroid_id").asc()
    )
    out = ["query_id", "centroid_id"] + (["_qq"] if keep_query_vec else [])
    return (
        q.crossJoin(F.broadcast(cents))
        .withColumn("_qcos", qcos)
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select(*out)
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    m_subspaces: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF + PQ composed — the production ANN shape (FAISS IVFPQ):
    coarse centroids partition the corpus into buckets; inside the
    probed buckets, ranking uses the PQ compressed codes via the ADC
    lookup table. Per query: O(nprobe * N / n_centroids) candidates x
    O(M) work each, reading only (bucket, codes) — never raw vectors.

    Both stages are the already-verified primitives (`ivf_assign`,
    `pq_encode`, the LUT build of `pq_topk`), so the composition
    stays integer-exact and oracle-checkable end to end.

    Output: (query_id, neighbor_id, approx_d2, rank).
    """
    bucketed = ivf_assign(corpus, centroids, vec_col, id_col).select(
        id_col, "centroid_id"
    )
    codes = pq_encode(corpus, codebooks, m_subspaces, dim, vec_col, id_col)
    indexed = codes.join(bucketed, id_col)
    probes = _probe_buckets(queries, centroids, nprobe, vec_col, id_col)
    lut = _adc_lut(queries, codebooks, m_subspaces, dim, vec_col, id_col)
    scored = (
        indexed.join(F.broadcast(probes), "centroid_id")
        .join(F.broadcast(lut), "query_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            _adc_sum().alias("approx_d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2").asc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def srp_weights(planes: int = 16, dims: int = 64) -> list[list[int]]:
    """Deterministic ±1 hyperplanes for signed-random-projection LSH:
    sign bits derived from md5(plane:dim) parity, computed ONCE in
    Python and emitted as literals into BOTH the Spark plan and the
    DuckDB oracle (the dcg_weight_case idiom) — so the signatures,
    buckets and candidate sets are bit-identical cross-engine, unlike
    seeded-RNG hyperplanes (the reason `similarity_brp_lsh_topk` is
    rows-only)."""
    import hashlib  # noqa: PLC0415

    return [
        [
            1
            if hashlib.md5(f"srp:{p}:{d}".encode()).digest()[0] % 2 == 0
            else -1
            for d in range(dims)
        ]
        for p in range(planes)
    ]


def _srp_band_exprs(
    qv: str, dialect: str, planes: int, band_bits: int, dims: int
) -> list[str]:
    """Band-value expressions (one per band) from sign bits of the
    ±1-hyperplane dots. Charikar 2002 SimHash-for-cosine: P(bits
    agree) = 1 - angle/pi, so banding trades recall for candidate
    count exactly like minhash banding."""
    w = srp_weights(planes, dims)
    bits = []
    for p in range(planes):
        lits = ",".join(str(v) for v in w[p])
        arr = f"array({lits})" if dialect == SPARK else f"[{lits}]"
        dot = tx.dot_int(qv, arr, dialect)
        bits.append(f"(case when {dot} >= 0 then 1 else 0 end)")
    bands = []
    for b in range(0, planes, band_bits):
        group = bits[b : b + band_bits]
        val = " + ".join(
            f"{bit} * {1 << (len(group) - 1 - i)}"
            for i, bit in enumerate(group)
        )
        bands.append(f"({val})")
    return bands


def srp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 16,
    band_bits: int = 4,
    dims: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k via signed-random-projection LSH with EXACT-cosine
    rerank: candidates = corpus vectors sharing ≥1 signature band with
    the query, reranked by the quantized-exact cosine. Deterministic
    hyperplanes (:func:`srp_weights`) make this the value-oracled ANN
    tier — same recall/cost trade as the MLlib BRP entry, but every
    intermediate is reproducible in SQL.

    Scale shape: signatures are a projection (planes × dims integer
    ops per row, no shuffle); the band join keys on (band_no,
    band_val) — 2^band_bits × planes/band_bits buckets; candidates
    per query are bucket-bounded, so the rerank never scans the
    corpus. Output: (query_id, neighbor_id, cosine, rank)."""
    c = _quantized(corpus, vec_col, "_qv").select(
        F.col(id_col).alias("neighbor_id"), "_qv"
    )
    q = _quantized(queries, vec_col, "_qq").select(
        F.col(id_col).alias("query_id"), "_qq"
    )
    cb = _srp_band_exprs("_qv", SPARK, planes, band_bits, dims)
    qb = _srp_band_exprs("_qq", SPARK, planes, band_bits, dims)
    c_bands = c.select(
        "neighbor_id",
        F.posexplode(F.expr(f"array({','.join(cb)})")).alias(
            "band_no", "band_val"
        ),
    )
    q_bands = q.select(
        "query_id",
        F.posexplode(F.expr(f"array({','.join(qb)})")).alias(
            "band_no", "band_val"
        ),
    )
    cand = (
        c_bands.join(F.broadcast(q_bands), ["band_no", "band_val"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    cos = F.expr(tx.cosine_quantized("_qq", "_qv", SPARK))
    scored = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("int"))
    )


def brp_weights(tables: int = 8, dims: int = 64) -> list[list[int]]:
    """Deterministic integer projection vectors for Euclidean
    bucketed-random-projection LSH (Datar et al. 2004 p-stable LSH,
    the family behind MLlib's BucketedRandomProjectionLSH): components
    in [-16, 15] from md5(brp:t:d) bytes, computed ONCE in Python and
    emitted as literals into BOTH the Spark plan and the DuckDB oracle
    (the ``srp_weights`` idiom) — so buckets and candidate sets are
    bit-identical cross-engine, unlike MLlib's JVM-internal seeded
    hyperplane draw (the reason the old entry was rows-only)."""
    import hashlib  # noqa: PLC0415

    return [
        [
            hashlib.md5(f"brp:{t}:{d}".encode()).digest()[0] % 32 - 16
            for d in range(dims)
        ]
        for t in range(tables)
    ]


def brp_offsets(tables: int, width: int) -> list[int]:
    """Deterministic per-table bucket offsets in [0, width) — the
    `b` in h(v) = floor((v·r + b) / w); md5-derived like the
    weights so both engines share them as literals."""
    import hashlib  # noqa: PLC0415

    return [
        int.from_bytes(
            hashlib.md5(f"brpoff:{t}".encode()).digest()[:8], "big"
        )
        % width
        for t in range(tables)
    ]


#: quantized-projection magnitude bound: |dot| <= dims(64) * 16 *
#: 1e6-grid components (~5.3e5 for unit vectors) ~= 5.4e8; adding
#: 2^31 keeps every dividend positive so truncating integer division
#: (Spark `div`, DuckDB `//`) IS floor division in both engines.
_BRP_SHIFT = 1 << 31


def _brp_bucket_exprs(
    qv: str, dialect: str, tables: int, dims: int, width: int
) -> list[str]:
    """One integer bucket expression per hash table:
    (v·r_t + b_t + 2^31) intdiv width over the 1e6-quantized vector —
    fully integer, portable, and identical cross-engine."""
    w = brp_weights(tables, dims)
    offs = brp_offsets(tables, width)
    intdiv = "div" if dialect == SPARK else "//"
    out = []
    for t in range(tables):
        lits = ",".join(str(v) for v in w[t])
        arr = f"array({lits})" if dialect == SPARK else f"[{lits}]"
        dot = tx.dot_int(qv, arr, dialect)
        out.append(
            f"(({dot} + {offs[t] + _BRP_SHIFT}) {intdiv} {width})"
        )
    return out


def brp_lsh_topk_literal(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    tables: int = 8,
    dims: int = 64,
    width: int = 16_000_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k via Euclidean bucketed-random-projection LSH with
    EXACT-cosine rerank: candidates = corpus vectors sharing any hash
    table's bucket with the query (OR-amplification across ``tables``
    single-projection tables, MLlib BucketedRandomProjectionLSH's
    shape), reranked by the quantized-exact cosine. Deterministic
    literal projections (:func:`brp_weights` / :func:`brp_offsets`)
    make this the value-oracled form of the BRP tier.

    ``width`` tunes the recall/candidate trade: the fixture embeddings
    have weakly-similar true neighbors (cosine ~0.25), so the default
    keeps buckets wide (per-table collision ~0.4, 8-table coverage
    ~98%); a corpus with genuinely close duplicates prunes hard at a
    fraction of this width. Scale shape: bucket ids are a projection
    (tables × dims integer ops per row, no shuffle); the candidate
    join keys on (table_no, bucket) — never all-pairs; the rerank
    touches only bucket-mates. Output: (query_id, neighbor_id,
    cosine, rank)."""
    c = _quantized(corpus, vec_col, "_qv").select(
        F.col(id_col).alias("neighbor_id"), "_qv"
    )
    q = _quantized(queries, vec_col, "_qq").select(
        F.col(id_col).alias("query_id"), "_qq"
    )
    cb = _brp_bucket_exprs("_qv", SPARK, tables, dims, width)
    qb = _brp_bucket_exprs("_qq", SPARK, tables, dims, width)
    c_bands = c.select(
        "neighbor_id",
        F.posexplode(F.expr(f"array({','.join(cb)})")).alias(
            "table_no", "bucket"
        ),
    )
    q_bands = q.select(
        "query_id",
        F.posexplode(F.expr(f"array({','.join(qb)})")).alias(
            "table_no", "bucket"
        ),
    )
    cand = (
        c_bands.join(F.broadcast(q_bands), ["table_no", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    cos = F.expr(tx.cosine_quantized("_qq", "_qv", SPARK))
    scored = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("int"))
    )


def bitext_margin_pairs(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    margin_threshold: float = 1.0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Margin-based parallel-pair mining (Artetxe & Schwenk 2019,
    "Margin-based Parallel Corpus Mining with Multilingual Sentence
    Embeddings", arXiv:1811.01136): a candidate (x, y) scores by the
    RATIO margin cos(x,y) / mean(avgNN_k(x), avgNN_k(y)) — how much
    closer the pair is than each side's typical neighborhood — and a
    pair is emitted iff it is the MUTUAL best match and clears the
    margin threshold. Output: (src_id, tgt_id, cosine, margin).

    Exactness: per-pair cosines quantize to a 1e-6 bigint grid, so the
    top-k neighborhood SUMS are exact integers (float sums are
    order-dependent) and the margin is one final IEEE division
    ``cos_q * 2k / (sx + sy)`` — bit-identical cross-engine. Ranking
    uses (cos_q, id): the grid collapses float near-ties into exact
    ties broken deterministically.

    Scale shape: norms precompute per ROW (one interpreted fold per
    pair, not three); the SRC (query-language) side broadcasts — by
    the mining convention it is the smaller corpus, matching
    :func:`hard_negatives`'s broadcast-queries shape — while the tgt
    corpus streams; the two bounded windows shuffle only the candidate
    pairs, once per direction. The all-pairs candidate set is the
    oracle baseline — at index scale the scan swaps for the IVF probe
    exactly as in :func:`hard_negatives`.

    Degenerate-direction guard: the ratio margin assumes positive
    similarity (Artetxe & Schwenk §3.2's scores are cosines of real
    translation candidates); with a negative best cosine AND negative
    neighborhood sums the ratio inverts (worse pairs score higher), so
    pairs with cos_q <= 0 are dropped before the margin test."""
    s = (
        _quantized(src, vec_col, "_qs")
        .select(F.col(id_col).alias("src_id"), "_qs")
        .withColumn(
            "_ns",
            F.expr(f"sqrt(cast({tx.dot_int('_qs', '_qs', SPARK)} as double))"),
        )
    )
    t = (
        _quantized(tgt, vec_col, "_qt")
        .select(F.col(id_col).alias("tgt_id"), "_qt")
        .withColumn(
            "_nt",
            F.expr(f"sqrt(cast({tx.dot_int('_qt', '_qt', SPARK)} as double))"),
        )
    )
    dot = tx.dot_int("_qs", "_qt", SPARK)
    scored = t.crossJoin(F.broadcast(s)).select(
        "src_id",
        "tgt_id",
        F.expr(
            f"cast(round(cast({dot} as double) / (_ns * _nt) * 1000000)"
            " as bigint)"
        ).alias("cos_q"),
    )
    wx = Window.partitionBy("src_id").orderBy(
        F.col("cos_q").desc(), F.col("tgt_id").asc()
    )
    wy = Window.partitionBy("tgt_id").orderBy(
        F.col("cos_q").desc(), F.col("src_id").asc()
    )
    # neighborhood sums as whole-partition window aggregates on the
    # SAME partition keys as the ranks: one shuffle per direction, one
    # pass over the candidate set — the groupBy+join form re-reads the
    # expensive cross-join once per consumer
    kq = F.when(F.col("rkx") <= k, F.col("cos_q"))
    kq_y = F.when(F.col("rky") <= k, F.col("cos_q"))
    ranked = (
        scored.withColumn("rkx", F.row_number().over(wx))
        .withColumn("_sx", F.sum(kq).over(Window.partitionBy("src_id")))
        .withColumn("rky", F.row_number().over(wy))
        .withColumn("_sy", F.sum(kq_y).over(Window.partitionBy("tgt_id")))
    )
    margin = F.expr(
        f"cast(cos_q * {2 * k} as double) / cast(_sx + _sy as double)"
    )
    return (
        ranked.filter("rkx = 1 and rky = 1 and cos_q > 0")
        .select(
            "src_id",
            "tgt_id",
            (F.col("cos_q").cast("double") / F.lit(1000000.0)).alias("cosine"),
            margin.alias("margin"),
        )
        .filter(F.col("margin") >= F.lit(margin_threshold))
    )


def dcg_weight_case(rank_col: str, k: int = 10) -> str:
    """DCG discount 1/log2(rank+1) pre-quantized to bigint
    round(1e9 / log2(rank+1)) literals.

    The literals are computed ONCE in Python and emitted verbatim into
    both the Spark plan and the DuckDB oracle, so the per-query DCG /
    IDCG accumulations are order-independent bigint sums and the final
    single IEEE division is bit-identical cross-engine (the same
    integer-grid convention as `cosine_topk`).
    """
    import math  # noqa: PLC0415

    arms = " ".join(
        f"when {r} then {round(1e9 / math.log2(r + 1))}"
        for r in range(1, k + 1)
    )
    return f"(case {rank_col} {arms} end)"


def retrieval_eval(
    truth: DataFrame, cand: DataFrame, k: int = 10
) -> DataFrame:
    """Retrieval-quality evaluation: per-query recall@k, MRR and
    binary-relevance nDCG@k of a candidate (ANN) result against an
    exact ground-truth top-k.

    Both inputs carry (query_id, neighbor_id, rank); relevance is
    membership in the truth set, the ideal DCG is the truth ranking's
    own DCG (truth IS the ideal ordering). Queries with zero hits get
    mrr = ndcg = 0.0 rather than NULL.

    Scale: both inputs are (n_queries x k) rows — everything here is
    post-reduction metric algebra on tiny relations; the heavy lifting
    stays in the upstream topk plans. Output:
    (query_id, n_truth, n_hits, recall_at_k, mrr, ndcg_at_k).
    """
    wcase = dcg_weight_case("rank", k)
    t = truth.filter(F.col("rank") <= k).select(
        "query_id", "neighbor_id", F.expr(wcase).alias("_w")
    )
    c = cand.filter(F.col("rank") <= k).select(
        "query_id",
        "neighbor_id",
        F.col("rank").alias("_crank"),
        F.expr(wcase).alias("_cw"),
    )
    per_t = t.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_truth"),
        F.sum("_w").alias("_idcg"),
    )
    # both metric relations are (n_queries x k) rows by construction —
    # broadcast so the eval never shuffles, whatever the corpus size
    marked = c.join(
        F.broadcast(
            t.select("query_id", "neighbor_id").withColumn("_rel", F.lit(1))
        ),
        ["query_id", "neighbor_id"],
        "left",
    )
    per_c = marked.groupBy("query_id").agg(
        F.sum(F.coalesce(F.col("_rel"), F.lit(0)))
        .cast("bigint")
        .alias("n_hits"),
        F.min(F.when(F.col("_rel") == 1, F.col("_crank"))).alias("_frank"),
        F.sum(
            F.when(F.col("_rel") == 1, F.col("_cw")).otherwise(F.lit(0))
        ).alias("_dcg"),
    )
    return per_t.join(F.broadcast(per_c), "query_id", "left").select(
        "query_id",
        "n_truth",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
        (
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
            / F.least(F.col("n_truth"), F.lit(k)).cast("double")
        ).alias("recall_at_k"),
        F.coalesce(
            F.lit(1.0) / F.col("_frank").cast("double"), F.lit(0.0)
        ).alias("mrr"),
        F.coalesce(
            F.col("_dcg").cast("double") / F.col("_idcg").cast("double"),
            F.lit(0.0),
        ).alias("ndcg_at_k"),
    )


def sq8_codes(
    df: DataFrame,
    mn: list[int],
    span: list[int],
    vec_col: str = "_qv",
    out: str = "_qc",
) -> DataFrame:
    """Asymmetric int8 scalar quantization: per-dimension affine map
    of the milli-grid vector onto [0, 255] codes,
    ``((x - mn_d) * 255) intdiv span_d`` — all-integer (exact in both
    engines; x >= mn_d by construction so truncation semantics never
    engage a negative dividend). The calibration (mn/span literals)
    comes from `sq8_stats`."""
    mn_sql = ", ".join(f"cast({v} as bigint)" for v in mn)
    sp_sql = ", ".join(f"cast({v} as bigint)" for v in span)
    return df.withColumn(
        out,
        F.expr(
            f"zip_with(zip_with({vec_col}, array({mn_sql}),"
            f" (x, m) -> x - m), array({sp_sql}),"
            f" (a, s) -> (a * 255) div s)"
        ),
    )


def sq8_decoded(
    df: DataFrame,
    mn: list[int],
    span: list[int],
    codes_col: str = "_qc",
    out: str = "_qd",
) -> DataFrame:
    """Bucket-midpoint reconstruction of SQ8 codes on a x510 integer
    grid: ``510*mn_d + (2c+1)*span_d`` == ``510 * (mn_d +
    (c + 0.5) * span_d / 255)`` — all-integer, so decoded dot
    products are engine-exact."""
    mn510 = ", ".join(f"cast({510 * v} as bigint)" for v in mn)
    sp_sql = ", ".join(f"cast({v} as bigint)" for v in span)
    return df.withColumn(
        out,
        F.expr(
            f"zip_with(zip_with({codes_col}, array({sp_sql}),"
            f" (c, s) -> (2 * c + 1) * s), array({mn510}),"
            f" (t, m) -> t + m)"
        ),
    )


def sq8_stats(
    corpus: DataFrame, vec_col: str = "_qv", dim: int = 64
) -> tuple[list[int], list[int]]:
    """Per-dimension (min, span) of the milli-quantized corpus — the
    SQ8 calibration pass. One distributed posexplode + groupBy(dim);
    the collect is `dim` rows (bounded by the embedding width, never
    by corpus size). Spans clamp to >= 1 so constant dimensions map
    to code 0 instead of dividing by zero."""
    stats = (
        corpus.select(F.posexplode(vec_col).alias("p", "x"))
        .groupBy("p")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .orderBy("p")
        .collect()
    )
    assert len(stats) == dim, (len(stats), dim)
    mn = [int(r.mn) for r in stats]
    span = [max(1, int(r.mx) - int(r.mn)) for r in stats]
    return mn, span


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Int8 scalar-quantized top-k by integer dot product — the
    4x-memory-compression ANN tier between brute-force floats and
    product quantization: each 64-dim float vector becomes 64 one-byte
    codes calibrated per dimension, and ranking is an exact integer
    dot over codes (SIMD-friendly byte arithmetic on a real cluster;
    the scan side never touches raw floats).

    Ranking decodes the codes back to the (scaled) value grid before
    the dot product — scoring RAW unsigned codes is the classic
    asymmetric-SQ mistake: ``sum((x-mn)(y-mn))`` carries cross terms
    in ``sum(x)``/``sum(y)`` that scramble the order (measured recall
    0.1 vs exact on this fixture; decoded scoring restores it). The
    decode stays all-integer: ``d' = 510*mn_d + (2c+1)*span_d`` is
    ``510 * (mn + (c + 0.5) * span/255)`` — the FAISS-style
    bucket-midpoint reconstruction on a x510 grid, so `dot8` is the
    exact integer decoded dot (scaled by 510^2), engine-exact.

    Output: (query_id, neighbor_id, dot8, rank); ties break by
    neighbor id. Scale shape: calibration is one bounded posexplode
    aggregate; scoring broadcasts the (tiny by contract) query side
    and never shuffles the corpus."""
    c = _quantized(corpus, vec_col, "_qv")
    mn, span = sq8_stats(c, dim=dim)
    cc = sq8_decoded(sq8_codes(c, mn, span), mn, span).select(
        F.col(id_col).alias("neighbor_id"), F.col("_qd").alias("_cc")
    )
    qc = sq8_decoded(
        sq8_codes(_quantized(queries, vec_col, "_qv"), mn, span), mn, span
    ).select(F.col(id_col).alias("query_id"), F.col("_qd").alias("_qcodes"))
    dot = F.expr(tx.dot_int("_qcodes", "_cc", SPARK))
    scored = (
        cc.crossJoin(F.broadcast(qc))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", dot.alias("dot8"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot8").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= k)


def sq8_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    shortlist: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """The standard two-stage ANN serving pattern: a cheap SQ8 code
    scan shortlists `shortlist` candidates per query, then ONLY those
    pairs are re-ranked with the exact quantized cosine — the
    expensive metric touches (queries x shortlist) rows instead of
    (queries x corpus). Both stages are engine-exact (integer dot,
    then one final IEEE division), so the whole cascade value-oracles.

    Output: (query_id, neighbor_id, cosine, rank)."""
    short = sq8_topk(
        corpus, queries, k=shortlist, vec_col=vec_col,
        id_col=id_col, dim=dim,
    ).select("query_id", "neighbor_id")
    c = _quantized(corpus, vec_col, "_qv").select(
        F.col(id_col).alias("neighbor_id"), F.col("_qv").alias("_cv")
    )
    q = _quantized(queries, vec_col, "_qv").select(
        F.col(id_col).alias("query_id"), F.col("_qv").alias("_qq")
    )
    cos = F.expr(tx.cosine_quantized("_qq", "_cv", SPARK))
    rer = (
        short.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return rer.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= k)


def knn_outliers(
    corpus: DataFrame,
    k: int = 8,
    top_n: int = 20,
    anchor_mod: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-space outlier screen — the OOD-pruning companion of
    semantic dedup: SemDeDup-style curation drops near-DUPLICATES;
    this drops isolates whose k-NN neighborhood is unusually FAR
    (noise, corrupt embeddings, wrong-domain strays). Score = sum of
    the k smallest quantized squared L2 distances to the LANDMARK
    subset (every ``anchor_mod``-th vector) — the standard
    anchor/landmark kNN approximation: every vector is scored, but
    against N/m anchors instead of all N (full all-pairs measured
    40 s at sf0.1 — the interpreted per-pair fold is the cost;
    landmarks cut pairs m-fold with the same isolation ordering on
    anything that is not pathologically anchor-adjacent). Distances
    are exact integers, so the top-N ranking (ties by id) is
    engine-stable. The 100 TB swap is the IVF-bucketed join
    `embedding_near_dup_pairs` uses. Output: (vec_id, knn_d2_sum,
    rank) for the top_n most isolated vectors."""
    q = _quantized(corpus, vec_col, "_qv").select(
        F.col(id_col).alias("_id"), "_qv"
    )
    a = q.alias("a")
    b = q.filter(F.col("_id") % anchor_mod == 0).alias("b")
    d2 = F.expr(tx.l2sq_int("a._qv", "b._qv", SPARK))
    pairs = (
        a.join(F.broadcast(b), F.col("a._id") != F.col("b._id"))
        .select(
            F.col("a._id").alias("vec_id"),
            F.col("b._id").alias("other_id"),
            d2.alias("_d2"),
        )
    )
    wk = Window.partitionBy("vec_id").orderBy(
        F.col("_d2").asc(), F.col("other_id").asc()
    )
    knn = (
        pairs.withColumn("_rk", F.row_number().over(wk))
        .filter(F.col("_rk") <= k)
        .groupBy("vec_id")
        .agg(F.sum("_d2").cast("long").alias("knn_d2_sum"))
    )
    wo = Window.orderBy(F.col("knn_d2_sum").desc(), F.col("vec_id").asc())
    return (
        knn.withColumn("rank", F.row_number().over(wo).cast("int"))
        .filter(F.col("rank") <= top_n)
    )
