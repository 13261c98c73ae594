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


from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (  # noqa: E402
    SPAN_WORDS,
    UNIMAX_EPOCH_CAP,
    _hybrid_rrf_body,
    _repeated_spans_body,
    _unimax_body,
)


def test_repeated_spans_merge_and_unique_docs_excluded(spark):
    shared = "one two three four five six seven"  # 7 words, window 5
    rel = _docs_view(
        spark,
        [
            Row(doc_id=1, text=f"{shared} tail1 a b c"),
            Row(doc_id=2, text=f"head1 head2 {shared} x y"),
            Row(doc_id=3, text="totally unique words nothing here repeats q r"),
            # within-doc repetition: the same 5-gram twice in one doc
            Row(doc_id=4, text="p q r s t filler p q r s t"),
        ],
        "_t_spans",
    )
    rows = spark.sql(_repeated_spans_body(SPARK, "_t_spans")).collect()
    spans = {}
    for r in rows:
        spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_words"])
        )
    assert 3 not in spans
    # the 3 overlapping flagged windows of the 7-word phrase merge into
    # ONE maximal span per doc
    assert spans[1] == [(1, 7, 7)]
    assert spans[2] == [(3, 9, 7)]
    # within-doc: both occurrences flagged, disjoint -> two spans
    assert sorted(spans[4]) == [(1, 5, 5), (7, 11, 5)]
    # width invariant
    assert all(
        e - s + 1 == w and w >= SPAN_WORDS
        for sp in spans.values()
        for (s, e, w) in sp
    )


def test_unimax_waterfill_invariants(spark):
    rel = _docs_view(
        spark,
        [
            # tiny source: capacity below the fair share -> fully used
            Row(doc_id=1, source="tiny", text="a b"),
            # two big sources soak up the rest equally
            Row(doc_id=2, source="big1", text=" ".join(["w"] * 40)),
            Row(doc_id=3, source="big2", text=" ".join(["v"] * 40)),
        ],
        "_t_unimax",
    )
    rows = {r["source"]: r for r in spark.sql(_unimax_body(SPARK, "_t_unimax")).collect()}
    total = 2 + 40 + 40
    budget = total // 2  # 41
    # budget exhausted exactly, nobody over cap, epochs capped
    assert abs(sum(r["alloc_tokens"] for r in rows.values()) - budget) < 1e-9
    for r in rows.values():
        assert r["alloc_tokens"] <= r["cap_tokens"] + 1e-9
        assert r["epochs"] <= UNIMAX_EPOCH_CAP + 1e-9
    # tiny source saturates its epoch cap; the big two split the rest
    assert rows["tiny"]["alloc_tokens"] == rows["tiny"]["cap_tokens"] == 8.0
    assert rows["big1"]["alloc_tokens"] == rows["big2"]["alloc_tokens"] == 16.5


def test_hybrid_rrf_rewards_agreement(spark):
    # doc 1: strong text match; doc 2: nothing; embeddings make doc 1
    # ALSO the nearest neighbor of the query vector (vec 0).
    _docs_view(
        spark,
        [
            Row(doc_id=0, text="query doc about spark window merge"),
            Row(doc_id=1, text="spark window merge spark window"),
            Row(doc_id=2, text="irrelevant filler words only here"),
            Row(doc_id=3, text="spark mentioned once somewhere deep"),
        ],
        "_t_rrf_docs",
    )
    emb = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.99, 0.1, 0.0, 0.0]),
        Row(vec_id=2, embedding=[0.0, 1.0, 0.0, 0.0]),
        Row(vec_id=3, embedding=[0.0, 0.0, 1.0, 0.0]),
    ]
    spark.createDataFrame(emb).selectExpr(
        "vec_id", "cast(embedding as array<float>) as embedding"
    ).createOrReplaceTempView("_t_rrf_emb")
    rows = spark.sql(
        _hybrid_rrf_body(SPARK, "_t_rrf_docs", "_t_rrf_emb")
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    # doc 1 fuses both arms and must rank first overall
    assert rows[0]["doc_id"] == 1
    assert by_id[1]["r_text"] is not None and by_id[1]["r_vec"] is not None
    # fusion arithmetic: rrf == 1/(60+r_text) + 1/(60+r_vec)
    r = by_id[1]
    assert abs(r["rrf"] - (1 / (60 + r["r_text"]) + 1 / (60 + r["r_vec"]))) < 1e-12
    # doc 2 never matches the text arm
    assert by_id[2]["r_text"] is None and by_id[2]["r_vec"] is not None


def test_c4_rules_flags(spark):
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        _c4_rules_body,
    )

    rel = _docs_view(
        spark,
        [
            Row(doc_id=1, text="a clean document with enough words here done."),
            Row(doc_id=2, text="too short."),
            Row(doc_id=3, text="has code function() { inside and many words done."),
            Row(doc_id=4, text="lorem ipsum dolor sit amet padding words done."),
            Row(doc_id=5, text="no terminal punctuation but plenty of words"),
            Row(doc_id=6, text=None),
        ],
        "_t_c4",
    )
    rows = {r["doc_id"]: r for r in spark.sql(_c4_rules_body(SPARK, rel)).collect()}
    assert rows[1]["kept"] is True
    assert rows[2]["kept"] is False and rows[2]["words_ok"] is False
    assert rows[3]["kept"] is False and rows[3]["no_brace"] is False
    assert rows[4]["kept"] is False and rows[4]["no_lorem"] is False
    assert rows[5]["kept"] is False and rows[5]["ends_terminal"] is False
    assert rows[6]["kept"] is False and rows[6]["n_words"] == 1  # '' token


def test_hash_embed_composes_with_semantic_dedup(spark):
    """Hashed text embeddings feed the existing vector operators
    unchanged: exact text duplicates get identical vectors (cosine 1)
    so SemDeDup drops one of each planted pair; the embedding is
    invariant to word order (bag semantics) but not to word changes."""
    from far_finer_airtable_firestore_sync_spark.operators import (
        similarity_search,
    )
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        _hash_embed_body,
    )

    rel = _docs_view(
        spark,
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="dog lazy the over jumps fox brown quick the"),
            Row(doc_id=3, text="an entirely different document about spark sql"),
            Row(doc_id=4, text="sql spark about document different entirely an"),
            Row(doc_id=5, text="completely unrelated text mentioning nothing"),
        ],
        "_t_hembed",
    )
    emb = spark.sql(_hash_embed_body(SPARK, rel)).withColumnRenamed(
        "doc_id", "vec_id"
    )
    vecs = {r["vec_id"]: tuple(r["embedding"]) for r in emb.collect()}
    assert vecs[1] == vecs[2] and vecs[3] == vecs[4]  # order-invariant
    assert vecs[1] != vecs[3] != vecs[5]
    kept = {
        r["vec_id"]
        for r in similarity_search.semantic_dedup(
            emb, emb.filter("vec_id in (1, 3, 5)"), threshold=0.99
        ).collect()
    }
    # one survivor per identical-bag pair, the unique doc survives
    assert len(kept & {1, 2}) == 1
    assert len(kept & {3, 4}) == 1
    assert 5 in kept


def test_leakage_safe_split_keeps_clusters_together(spark):
    """The property the entry exists for: a near-dup pair can never
    straddle the split boundary."""
    from far_finer_airtable_firestore_sync_spark.operators import (
        dedup_docs, packing,
    )
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        MAX_CHARS, ROWS_PER_BAND, SEEDS, SHINGLE_N, dedup_corpus,
    )
    from pyspark.sql import functions as F

    corpus = dedup_corpus(spark, "/root/testdata/sf0.001")
    pairs = dedup_docs.near_dup_pairs(
        corpus, shingle_n=SHINGLE_N, seeds=SEEDS,
        rows_per_band=ROWS_PER_BAND, max_chars=MAX_CHARS, threshold=0.5,
    ).persist()
    comps = dedup_docs.connected_components(pairs)
    keyed = corpus.join(comps, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_key"),
    )
    out = packing.corpus_split(
        keyed, "cluster_key", {"train": 90, "val": 5, "test": 5}
    )
    split_of = {r["doc_id"]: r["split"] for r in out.collect()}
    checked = 0
    for r in pairs.collect():
        assert split_of[r["id_a"]] == split_of[r["id_b"]], (r, )
        checked += 1
    assert checked > 0  # the synthesized corpus must yield real pairs


def test_hard_negatives_excludes_near_dups(spark):
    """Mined negatives are similar but never above the near-dup
    ceiling, and the exact duplicate of a query is excluded while the
    merely-similar vector ranks first."""
    from far_finer_airtable_firestore_sync_spark.operators import (
        similarity_search,
    )

    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 0.0]),   # query
        Row(vec_id=1, embedding=[1.0, 0.0, 0.0, 0.0]),   # exact dup
        Row(vec_id=2, embedding=[0.9, 0.4, 0.0, 0.0]),   # hard negative
        Row(vec_id=3, embedding=[0.2, 0.9, 0.0, 0.0]),   # easier negative
        Row(vec_id=4, embedding=[0.0, 0.0, 1.0, 0.0]),   # orthogonal
    ]
    emb = spark.createDataFrame(rows).selectExpr(
        "vec_id", "cast(embedding as array<float>) as embedding"
    )
    out = similarity_search.hard_negatives(
        emb, emb.filter("vec_id = 0"), k=3, near_dup_cosine=0.95
    ).collect()
    ids = [r["negative_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert 1 not in ids            # dup is above the ceiling
    assert ids[0] == 2             # hardest first
    assert all(r["cosine"] < 0.95 for r in out)
