"""Round-4 operators: two-pass exact heavy hitters, repeated-span
removal, and deterministic weighted sampling (Efraimidis-Spirakis).
"""

import hashlib
import math
import random

import pyarrow as pa
import pyarrow.parquet as pq

from far_finer_airtable_firestore_sync_spark.operators import text_analysis


WORDS = ["the", "of", "and", "spark", "merge", "cat", "x", "y", "z", "rare"]


def _write_docs(tmp_path, texts, name="hh_docs"):
    path = str(tmp_path / f"{name}.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        path,
    )
    return path


def _brute_heavy_hitters(texts, k):
    counts: dict[str, int] = {}
    n = 0
    for t in texts:
        for w in (t or "").split(" "):
            counts[w] = counts.get(w, 0) + 1
            n += 1
    return {
        w: (c, (1_000_000 * c) // n)
        for w, c in counts.items()
        if c * k > n
    }


def test_heavy_hitters_exact_vs_brute_force(spark, tmp_path):
    rng = random.Random(7)
    # Zipf-ish: 'the' dominates, tail words stay under any threshold.
    texts = [
        " ".join(rng.choices(WORDS, weights=[50, 30, 20, 8, 5, 4, 2, 2, 1, 1],
                             k=rng.randint(3, 40)))
        for _ in range(300)
    ] + [None, ""]
    df = spark.read.parquet(_write_docs(tmp_path, texts))
    k = 20
    got = {
        r["word"]: (r["n_occ"], r["ppm"])
        for r in text_analysis.heavy_hitter_words(df, k=k).collect()
    }
    # brute force treats None as '' — same split_ws_safe contract
    want = _brute_heavy_hitters([t if t is not None else "" for t in texts], k)
    assert got == want
    assert got, "threshold produced no heavy hitters (weak test)"
    assert "rare" not in got


def test_heavy_hitters_partition_invariant(spark, tmp_path):
    """Pass 1 is partition-dependent (spark_partition_id), but the
    verified output must be identical under any partitioning."""
    rng = random.Random(11)
    texts = [
        " ".join(rng.choices(WORDS, k=rng.randint(1, 30)))
        for _ in range(200)
    ]
    df = spark.read.parquet(_write_docs(tmp_path, texts))
    results = []
    for parts in (1, 7, 32):
        rows = text_analysis.heavy_hitter_words(
            df.repartition(parts), k=25
        ).collect()
        results.append(sorted((r["word"], r["n_occ"], r["ppm"]) for r in rows))
    assert results[0] == results[1] == results[2]
    assert results[0]


def test_strip_spans_passthrough_and_removal(spark, tmp_path):
    """Docs without flagged spans pass through verbatim (rejoin of the
    split is identity for single-space text); planted duplicate spans
    are excised from BOTH carriers."""
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        _strip_spans_body,
    )
    from far_finer_airtable_firestore_sync_spark.functions.canonical import (
        SPARK,
    )

    # tails must differ in EVERY word: a 5-gram window reaching past
    # the shared prefix into a shared tail word is itself duplicated
    # and legitimately extends the span
    dup = "alpha beta gamma delta epsilon zeta"
    texts = [
        f"{dup} cats chase yarn one",
        f"{dup} dogs fetch balls two",
        "an entirely distinct document with no repeats at all",
        "",
    ]
    spark.read.parquet(
        _write_docs(tmp_path, texts, "strip_docs")
    ).createOrReplaceTempView("_t_strip_docs")
    rows = {
        r["doc_id"]: r
        for r in spark.sql(
            _strip_spans_body(SPARK, "_t_strip_docs")
        ).collect()
    }
    assert len(rows) == 4
    # the shared 6-word prefix is >= SPAN_WORDS and occurs twice -> cut
    assert rows[0]["n_removed"] == 6
    assert rows[0]["text_clean"] == "cats chase yarn one"
    assert rows[1]["n_removed"] == 6
    assert rows[1]["text_clean"] == "dogs fetch balls two"
    # span-free docs pass through verbatim
    assert rows[2]["n_removed"] == 0
    assert rows[2]["text_clean"] == texts[2]
    assert rows[3]["n_removed"] == 0
    assert rows[3]["text_clean"] == ""


def test_weighted_sample_matches_brute_force(spark, tmp_path):
    """The Spark top-k must equal a from-scratch Python recomputation
    of the quantized Efraimidis-Spirakis keys."""
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        ES_HASH_SPACE,
        _weighted_sample_body,
    )
    from far_finer_airtable_firestore_sync_spark.functions.canonical import (
        SPARK,
    )

    rng = random.Random(3)
    n_chars = [rng.randint(0, 5000) for _ in range(400)]
    path = str(tmp_path / "es_docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(n_chars)), pa.int64()),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        ),
        path,
    )
    spark.read.parquet(path).createOrReplaceTempView("_t_es_docs")
    k = 50
    got = [
        (r["doc_id"], r["weight"], r["es_key"])
        for r in spark.sql(
            _weighted_sample_body(SPARK, "_t_es_docs", k=k)
        ).collect()
    ]

    def key(doc_id, w):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:14], 16)
        u = (float(h) + 1.0) / float(ES_HASH_SPACE + 1)
        lnq = int(round(math.log(u) * 1_000_000))
        return float(lnq) / float(w)

    brute = sorted(
        (
            (i, max(w, 1), key(i, max(w, 1)))
            for i, w in enumerate(n_chars)
        ),
        key=lambda t: (-t[2], t[0]),
    )[:k]
    assert got == brute
    # weight-proportionality smoke: the sample's mean weight must
    # exceed the population's (heavier docs are more likely picked)
    mean_sample = sum(w for _, w, _ in got) / len(got)
    mean_pop = sum(max(w, 1) for w in n_chars) / len(n_chars)
    assert mean_sample > mean_pop


def test_round4_plan_shapes(spark, tmp_path):
    """Scale-shape pins: ES sampling plans a top-k (TakeOrderedAndProject,
    never a global Sort+Limit shuffle); heavy hitters' verify pass joins
    the candidate set by BROADCAST (the corpus side never shuffles for
    the semi-join)."""
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        _weighted_sample_body,
    )
    from far_finer_airtable_firestore_sync_spark.functions.canonical import (
        SPARK,
    )

    rng = random.Random(5)
    texts = [" ".join(rng.choices(WORDS, k=10)) for _ in range(50)]
    path = _write_docs(tmp_path, texts, "plan_docs")
    df = spark.read.parquet(path)
    df.selectExpr(
        "doc_id", "length(text) as n_chars"
    ).createOrReplaceTempView("_t_plan_docs")

    def plan(d):
        s = d._jdf.queryExecution().executedPlan().toString()
        return s.split("== Initial Plan ==")[0]

    es = plan(spark.sql(_weighted_sample_body(SPARK, "_t_plan_docs", k=5)))
    assert "TakeOrderedAndProject" in es
    assert "GlobalLimit" not in es

    hh = plan(text_analysis.heavy_hitter_words(df, k=10))
    assert "BroadcastHashJoin" in hh and "LeftSemi" in hh


def test_ivf_filtered_topk_binds_and_pushes_down(spark):
    """The metadata predicate must (a) restrict every returned
    neighbor, (b) actually change the result vs unfiltered, and
    (c) reach the parquet scan as a pushed filter."""
    from far_finer_airtable_firestore_sync_spark.operators import (
        similarity_search,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter("vec_id < 5")
    cents = emb.filter("vec_id % 100 = 0")
    filtered = similarity_search.ivf_filtered_topk(
        emb, queries, cents, "label % 3 = 0", k=10, nprobe=2
    )
    plain = similarity_search.ivf_topk(emb, queries, cents, k=10, nprobe=2)

    ok_labels = {
        r["vec_id"] for r in emb.filter("label % 3 = 0").select("vec_id").collect()
    }
    got = [(r["query_id"], r["neighbor_id"]) for r in filtered.collect()]
    assert got, "filtered search returned nothing"
    assert all(n in ok_labels for _, n in got)
    assert set(got) != {
        (r["query_id"], r["neighbor_id"]) for r in plain.collect()
    }

    plan = filtered._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "PushedFilters" in plan and "label" in plan
