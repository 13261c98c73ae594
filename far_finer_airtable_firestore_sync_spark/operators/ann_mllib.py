"""MLlib-backed ANN: BucketedRandomProjectionLSH over embeddings.

A production alternative to the hand-rolled IVF path
(similarity_search.py): Spark ML's random-hyperplane LSH buckets the
corpus once (fit = draw hyperplanes from a fixed seed; transform =
scan-side projection), and `approxSimilarityJoin` joins only
within-bucket candidates — the same candidates-not-N² contract as the
MinHash text path, here for dense vectors.

Vectors are L2-normalized first so Euclidean distance is a monotone
function of cosine (||a-b||² = 2 - 2·cos for unit vectors): BRP-LSH
is a Euclidean family, normalization makes its buckets cosine-valid.

Not DuckDB-reproducible (MLlib's hyperplane draw is JVM-internal), so
the driver entry is rows-only; correctness is pinned by the recall
test against the exact quantized top-k (tests/test_extensions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _normalized_vectors(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    norm = F.expr(
        f"sqrt(aggregate({vec_col}, cast(0.0 as double), (a, x) -> a + x * x))"
    )
    unit = F.expr(
        f"transform({vec_col}, x -> cast(x as double) / _n)"
    )
    return (
        df.select(F.col(id_col), F.col(vec_col), norm.alias("_n"))
        .filter(F.col("_n") > 0)
        .select(F.col(id_col), unit.alias("_unit"))
        .select(F.col(id_col), array_to_vector("_unit").alias("features"))
    )


def brp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_length: float = 0.5,
    num_hash_tables: int = 8,
    max_distance: float = 1.5,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine neighbors via BRP-LSH.

    ``max_distance`` bounds the similarity join (unit vectors:
    distance 1.5 ≈ cosine -0.125 — wide enough that weakly-similar
    fixture neighbors, cosine ~0.25, stay inside the radius).
    Output: (query_id, neighbor_id, cosine, rank); deterministic given
    the seed (hyperplanes are seed-derived, ties break on neighbor id).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    c = _normalized_vectors(corpus, vec_col, id_col)
    q = _normalized_vectors(queries, vec_col, id_col)
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="_hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(c)
    joined = model.approxSimilarityJoin(c, q, max_distance, distCol="_dist")
    # unit vectors: cos = 1 - d²/2 (exact algebra, one fused expression)
    scored = joined.select(
        F.col(f"datasetB.{id_col}").alias("query_id"),
        F.col(f"datasetA.{id_col}").alias("neighbor_id"),
        (1 - F.col("_dist") * F.col("_dist") / 2).alias("cosine"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
