"""Semantics checks for the retrieval / data-selection entries added in
round 3: BM25 ranked search, the cross-source overlap matrix, and DSIR
importance weights.

The DuckDB oracle gate covers cross-engine value parity; these pin the
*behavior* on tiny hand-built corpora (length normalization actually
normalizes, overlap is actually Jaccard, DSIR actually prefers
target-looking documents).
"""

from pyspark.sql import Row

from far_finer_airtable_firestore_sync_spark.functions.canonical import SPARK
from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
    _bm25_body,
    _dsir_body,
    _source_overlap_body,
)


def _docs_view(spark, rows, name):
    spark.createDataFrame(rows).createOrReplaceTempView(name)
    return name


def test_bm25_tf_monotone_and_length_normalized(spark):
    rel = _docs_view(
        spark,
        [
            # same length, more query-term hits -> higher score
            Row(doc_id=1, source="s", text="spark a b c d e f g"),
            Row(doc_id=2, source="s", text="spark spark b c d e f g"),
            # same tf as doc 1 but much longer -> lower score (the BM25
            # b-term; plain TF-IDF would tie these two)
            Row(
                doc_id=3,
                source="s",
                text="spark " + " ".join(["pad"] * 30),
            ),
            Row(doc_id=4, source="s", text="nothing relevant here at all"),
        ],
        "_t_bm25",
    )
    out = {
        r["doc_id"]: r["bm25"]
        for r in spark.sql(_bm25_body(SPARK, rel)).collect()
    }
    assert 4 not in out  # no query term, no row
    assert out[2] > out[1] > out[3] > 0.0


def test_source_overlap_jaccard_bounds(spark):
    rel = _docs_view(
        spark,
        [
            Row(doc_id=1, source="a", text="w1 w2 w3 w4 w5"),
            Row(doc_id=2, source="b", text="w1 w2 w3 w4 w5"),  # == a
            Row(doc_id=3, source="c", text="x1 x2 x3 x4 x5"),  # disjoint
            Row(doc_id=4, source="d", text="w1 w2 w3 x9 x8"),  # partial vs a
        ],
        "_t_overlap",
    )
    rows = spark.sql(_source_overlap_body(SPARK, rel)).collect()
    by_pair = {(r["source_a"], r["source_b"]): r for r in rows}
    # identical gram sets -> jaccard exactly 1.0
    assert by_pair[("a", "b")]["jaccard"] == 1.0
    # zero-overlap pairs never materialize (inner join on shared grams)
    assert ("a", "c") not in by_pair and ("b", "c") not in by_pair
    # partial overlap strictly between 0 and 1, counts consistent
    r = by_pair[("a", "d")]
    assert 0.0 < r["jaccard"] < 1.0
    assert r["n_shared"] <= min(r["grams_a"], r["grams_b"])
    # pair key is canonicalized source_a < source_b
    assert all(r["source_a"] < r["source_b"] for r in rows)


def test_dsir_prefers_target_looking_docs(spark):
    # target sources talk about "alpha beta"; raw noise doc doesn't.
    rows = []
    for i in range(8):
        rows.append(
            Row(doc_id=i, source="src0" if i % 2 else "src1",
                text="alpha beta alpha beta gamma")
        )
    rows.append(Row(doc_id=100, source="web", text="alpha beta alpha beta"))
    rows.append(Row(doc_id=101, source="web", text="zeta eta theta iota kappa"))
    rel = _docs_view(spark, rows, "_t_dsir")
    out = {
        r["doc_id"]: r["dsir_logw"]
        for r in spark.sql(_dsir_body(SPARK, rel)).collect()
    }
    # every doc gets a weight (smoothing covers unseen buckets)
    assert set(out) == {*range(8), 100, 101}
    # the target-looking raw doc outranks the dissimilar one
    assert out[100] > out[101]
