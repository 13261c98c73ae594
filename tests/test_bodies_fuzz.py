"""Randomized cross-engine parity for the round-3 dual-dialect bodies
(BM25, source overlap, DSIR, repeated spans, UniMax, hybrid RRF).

The oracle gate proves parity on the fixture corpus; this fuzz proves
it on adversarial corpora — NULL/empty texts, single-word docs, NULL
sources, duplicate spans by construction, tied capacities. Any
NULL-ordering, decimal-vs-double, or sequence-direction drift between
the engines shows up as a row mismatch.
"""

import math
import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from far_finer_airtable_firestore_sync_spark.functions.canonical import DUCKDB, SPARK
from far_finer_airtable_firestore_sync_spark.plans.agg_queries import (
    DUCK_D,
    EVENT_DRIFT_BODY,
    EVENT_MAD_BODY,
    SPARK_D,
    _dow_profile_body,
    _gapfill_body,
)
from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
    C4_CORPUS_BODY,
    _bm25_body,
    _entropy_body,
    _cms_body,
    _curate_v2_body,
    _pmi_body,
    _ppjoin_body,
    _rm3_body,
    _hash_embed_body,
    _keyword_body,
    _kmv_body,
    _mmr_body,
    _novelty_body,
    _quality_ensemble_body,
    _c4_rules_body,
    _dsir_body,
    _hybrid_rrf_body,
    _repeated_spans_body,
    _source_overlap_body,
    _strip_spans_body,
    _unimax_body,
    _weighted_sample_body,
    _bpe_body,
    _hll_body,
    _hrw_body,
    _phrase_body,
    _span_corruption_body,
    _span_corruption_apply_body,
    _winnowing_body,
    _bpe_encode_oracle,
    _kmv_intersect_body,
    _line_dedup_body,
    _preference_pairs_body,
    _readability_body,
    _sentiment_body,
)

WORDS = ["spark", "window", "merge", "the", "cat", "sat", "a", "b", "c",
         "data", "x", "y", "z", "value", "row",
         # multibyte: both engines count CODEPOINTS (incl. astral-plane
         # emoji) and md5 UTF-8 bytes — probed identical; these pin it
         # across every shingle/substring/length body
         "héllo", "naïve", "日本語", "😀ok", "Überß"]


def _random_corpus(n=120, seed=23):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        if rng.random() < 0.05:
            text = None
        elif rng.random() < 0.05:
            text = ""
        elif rng.random() < 0.08:
            text = rng.choice(WORDS)  # single word: below span window
        else:
            k = rng.randint(2, 25)
            sep = "  " if rng.random() < 0.1 else " "  # empty tokens
            text = sep.join(rng.choices(WORDS, k=k))
            if rng.random() < 0.05:
                text = " " + text + " "  # leading/trailing space
        # planted duplicate spans: every 9th doc shares a 6-word prefix
        # (above the 5-word window, so spans MUST be found)
        if i % 9 == 0 and i > 0:
            text = "alpha beta gamma delta epsilon zeta " + (text or "")
        source = None if rng.random() < 0.07 else f"s{rng.randint(0, 4)}"
        # make capacity ties likely: sources draw from few doc shapes
        rows.append({"doc_id": i, "source": source, "text": text})
    # planted exact + one-word-suffix copies so the exact similarity
    # join (ppjoin) has pairs above its 0.8 threshold
    for r in [r for r in rows if r["doc_id"] % 11 == 0 and r["text"]]:
        rows.append(
            {"doc_id": r["doc_id"] + 7000, "source": r["source"],
             "text": r["text"]}
        )
    for r in [r for r in rows if r["doc_id"] % 13 == 0 and r["text"]]:
        rows.append(
            {"doc_id": r["doc_id"] + 9000, "source": r["source"],
             "text": r["text"] + " qq"}
        )
    return rows


def _random_embeddings(n=120, seed=29, dim=8):
    rng = random.Random(seed)
    return [
        {"vec_id": i, "embedding": [rng.uniform(-1, 1) for _ in range(dim)]}
        for i in range(n)
    ]


def _norm(rows):
    out = []
    for r in rows:
        t = []
        for v in r:
            if isinstance(v, float):
                assert not math.isnan(v), f"NaN leaked: {rows[:2]}"
                t.append(round(v, 9))
            else:
                t.append(v)
        out.append(tuple(t))
    return sorted(out, key=repr)


def test_fuzz_body_parity(spark, tmp_path):
    docs = _random_corpus()
    dpath = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array([r["doc_id"] for r in docs], pa.int64()),
            "source": pa.array([r["source"] for r in docs], pa.string()),
            "text": pa.array([r["text"] for r in docs], pa.string()),
        }),
        dpath,
    )
    emb = _random_embeddings()
    epath = str(tmp_path / "emb.parquet")
    pq.write_table(
        pa.table({
            "vec_id": pa.array([r["vec_id"] for r in emb], pa.int64()),
            "embedding": pa.array(
                [r["embedding"] for r in emb], pa.list_(pa.float32())
            ),
        }),
        epath,
    )

    spark.read.parquet(dpath).createOrReplaceTempView("fz_docs")
    spark.read.parquet(epath).createOrReplaceTempView("fz_emb")
    con = duckdb.connect()
    con.execute(f"create view fz_docs as select * from read_parquet('{dpath}')")
    con.execute(f"create view fz_emb as select * from read_parquet('{epath}')")

    bodies = {
        "bm25": (_bm25_body(SPARK, "fz_docs"), _bm25_body(DUCKDB, "fz_docs")),
        "overlap": (
            _source_overlap_body(SPARK, "fz_docs"),
            _source_overlap_body(DUCKDB, "fz_docs"),
        ),
        "dsir": (_dsir_body(SPARK, "fz_docs"), _dsir_body(DUCKDB, "fz_docs")),
        "spans": (
            _repeated_spans_body(SPARK, "fz_docs"),
            _repeated_spans_body(DUCKDB, "fz_docs"),
        ),
        "unimax": (
            _unimax_body(SPARK, "fz_docs"),
            _unimax_body(DUCKDB, "fz_docs"),
        ),
        "rrf": (
            _hybrid_rrf_body(SPARK, "fz_docs", "fz_emb"),
            _hybrid_rrf_body(DUCKDB, "fz_docs", "fz_emb"),
        ),
        "c4": (
            _c4_rules_body(SPARK, f"({C4_CORPUS_BODY.format(rel='fz_docs')})"),
            _c4_rules_body(DUCKDB, f"({C4_CORPUS_BODY.format(rel='fz_docs')})"),
        ),
        "hash_embed": (
            _hash_embed_body(SPARK, "fz_docs"),
            _hash_embed_body(DUCKDB, "fz_docs"),
        ),
        "ensemble": (
            _quality_ensemble_body(
                SPARK, "(select *, 'en' as lang from fz_docs)"
            ),
            _quality_ensemble_body(
                DUCKDB, "(select *, 'en' as lang from fz_docs)"
            ),
        ),
        "strip_spans": (
            _strip_spans_body(SPARK, "fz_docs"),
            _strip_spans_body(DUCKDB, "fz_docs"),
        ),
        # weight 0/NULL floors to 1; k=40 cuts mid-corpus so rank-
        # boundary keys are exercised
        "es_sample": (
            _weighted_sample_body(
                SPARK,
                "(select doc_id, coalesce(length(text), 0) as n_chars"
                " from fz_docs)",
                k=40,
            ),
            _weighted_sample_body(
                DUCKDB,
                "(select doc_id, coalesce(length(text), 0) as n_chars"
                " from fz_docs)",
                k=40,
            ),
        ),
        "readability": (
            _readability_body(SPARK, "fz_docs"),
            _readability_body(DUCKDB, "fz_docs"),
        ),
        "line_dedup": (
            _line_dedup_body(SPARK, "fz_docs"),
            _line_dedup_body(DUCKDB, "fz_docs"),
        ),
        "pref_pairs": (
            _preference_pairs_body(SPARK, "fz_docs"),
            _preference_pairs_body(DUCKDB, "fz_docs"),
        ),
        "kmv": (_kmv_body(SPARK, "fz_docs"), _kmv_body(DUCKDB, "fz_docs")),
        "entropy": (
            _entropy_body(SPARK, "fz_docs"),
            _entropy_body(DUCKDB, "fz_docs"),
        ),
        "keyword": (
            _keyword_body(SPARK, "fz_docs"),
            _keyword_body(DUCKDB, "fz_docs"),
        ),
        "novelty": (
            _novelty_body(SPARK, "fz_docs"),
            _novelty_body(DUCKDB, "fz_docs"),
        ),
        "mmr": (_mmr_body(SPARK, "fz_emb"), _mmr_body(DUCKDB, "fz_emb")),
        "ppjoin": (
            _ppjoin_body(SPARK, "fz_docs"),
            _ppjoin_body(DUCKDB, "fz_docs"),
        ),
        "pmi": (_pmi_body(SPARK, "fz_docs"), _pmi_body(DUCKDB, "fz_docs")),
        "rm3": (_rm3_body(SPARK, "fz_docs"), _rm3_body(DUCKDB, "fz_docs")),
        "cms": (_cms_body(SPARK, "fz_docs"), _cms_body(DUCKDB, "fz_docs")),
        "curate_v2": (
            _curate_v2_body(SPARK, "fz_docs"),
            _curate_v2_body(DUCKDB, "fz_docs"),
        ),
        "hll": (_hll_body(SPARK, "fz_docs"), _hll_body(DUCKDB, "fz_docs")),
        # NULL n_chars (NULL text) exercises the coalesce(0) leg
        "hrw": (
            _hrw_body(
                SPARK,
                "(select doc_id, length(text) as n_chars from fz_docs)",
            ),
            _hrw_body(
                DUCKDB,
                "(select doc_id, length(text) as n_chars from fz_docs)",
            ),
        ),
        # 2-token vocab words -> adjacency hits exist in the fuzz corpus
        "phrase": (
            _phrase_body(SPARK, "fz_docs", terms=["the", "cat"]),
            _phrase_body(DUCKDB, "fz_docs", terms=["the", "cat"]),
        ),
        "bpe": (_bpe_body(SPARK, "fz_docs"), _bpe_body(DUCKDB, "fz_docs")),
        "spancor": (
            _span_corruption_body(SPARK, "fz_docs"),
            _span_corruption_body(DUCKDB, "fz_docs"),
        ),
        "spanapply": (
            _span_corruption_apply_body(SPARK, "fz_docs"),
            _span_corruption_apply_body(DUCKDB, "fz_docs"),
        ),
        # multibyte words exercise substring/length codepoint parity
        # inside the k-gram/pack arithmetic
        "winnow": (
            _winnowing_body(SPARK, "fz_docs"),
            _winnowing_body(DUCKDB, "fz_docs"),
        ),
        # fuzz sources are 's0'..'s4'/NULL: the numeric-suffix parse
        # must NULL identically in both engines (try_cast), never
        # error one-sided; the small-union exact branch also fires
        "kmvi": (
            _kmv_intersect_body(SPARK, "fz_docs"),
            _kmv_intersect_body(DUCKDB, "fz_docs"),
        ),
        # NULL/empty texts must score 0/'neutral' via the left join,
        # and the per-token division floor must agree
        "sentiment": (
            _sentiment_body(SPARK, "fz_docs"),
            _sentiment_body(DUCKDB, "fz_docs"),
        ),
    }
    for name, (s_sql, d_sql) in bodies.items():
        s_rows = _norm([tuple(r) for r in spark.sql(s_sql).collect()])
        d_rows = _norm(con.execute(d_sql).fetchall())
        assert s_rows == d_rows, (
            f"{name}: {len(s_rows)} vs {len(d_rows)} rows; "
            f"first spark={s_rows[:2]} duck={d_rows[:2]}"
        )
        assert s_rows, f"{name}: fuzz corpus produced no rows (weak test)"


def test_fuzz_event_bodies_parity(spark, tmp_path):
    """Drift/MAD parity on an adversarial event stream: duplicate
    values (rank ties pinned by event_id), negative/zero values, days
    where a type vanishes entirely (share 0 legs)."""
    import datetime as dt

    rng = random.Random(41)
    types = ["a", "b", "c"]
    rows = []
    for day in range(8):
        active = types if day % 3 else types[:2]  # 'c' vanishes periodically
        for _ in range(rng.randint(4, 25)):
            rows.append(
                (
                    dt.datetime(2024, 5, 1 + day, rng.randint(0, 23), 15),
                    rng.choice(active),
                    rng.choice([0.0, -2.5, 1.0, 1.0, 7.25, 100.0]),
                )
            )
    epath = str(tmp_path / "fz_events.parquet")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            }
        ),
        epath,
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.read.parquet(epath).createOrReplaceTempView("fz_events")
    con = duckdb.connect()
    con.execute(
        f"create view fz_events as select * from read_parquet('{epath}')"
    )
    pairs = [
        ("drift", EVENT_DRIFT_BODY.format(rel="fz_events"),
         EVENT_DRIFT_BODY.format(rel="fz_events")),
        ("mad", EVENT_MAD_BODY.format(rel="fz_events"),
         EVENT_MAD_BODY.format(rel="fz_events")),
        ("gapfill", _gapfill_body(SPARK_D, "fz_events"),
         _gapfill_body(DUCK_D, "fz_events")),
        ("dow", _dow_profile_body(SPARK_D, "fz_events"),
         _dow_profile_body(DUCK_D, "fz_events")),
    ]
    for name, s_sql, d_sql in pairs:
        s_rows = _norm([tuple(r) for r in spark.sql(s_sql).collect()])
        d_rows = _norm(con.execute(d_sql).fetchall())
        assert s_rows == d_rows, (
            f"{name}: {len(s_rows)} vs {len(d_rows)} rows; "
            f"first spark={s_rows[:2]} duck={d_rows[:2]}"
        )
        assert s_rows, f"{name}: fuzz events produced no rows (weak test)"


def test_fuzz_retrieval_eval_parity(spark, tmp_path):
    """Spark `retrieval_eval` (the production DataFrame plan) vs the
    DuckDB metric twin on adversarial rank tables: sub-k truth sets,
    queries entirely missing from the candidate side, zero-overlap
    candidates, and k-boundary ranks."""
    from far_finer_airtable_firestore_sync_spark.operators import (
        similarity_search,
    )
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        retrieval_metrics_sql,
    )

    rng = random.Random(41)
    k = 5
    t_rows, c_rows = [], []
    for q in range(12):
        pool = list(range(100, 130))
        rng.shuffle(pool)
        n_truth = rng.randint(1, k)  # sub-k truth sets
        truth_ids = pool[:n_truth]
        for r, n in enumerate(truth_ids, start=1):
            t_rows.append({"query_id": q, "neighbor_id": n, "rank": r})
        if q % 5 == 4:
            continue  # query missing from cand entirely
        n_cand = rng.randint(1, k)
        if q % 5 == 3:
            cand_ids = pool[20:20 + n_cand]  # zero overlap
        else:
            mix = truth_ids + pool[n_truth:]
            rng.shuffle(mix)
            cand_ids = mix[:n_cand]
        for r, n in enumerate(cand_ids, start=1):
            c_rows.append({"query_id": q, "neighbor_id": n, "rank": r})

    def write(rows, name):
        path = str(tmp_path / f"{name}.parquet")
        pq.write_table(
            pa.table({
                "query_id": pa.array([r["query_id"] for r in rows], pa.int64()),
                "neighbor_id": pa.array(
                    [r["neighbor_id"] for r in rows], pa.int64()
                ),
                "rank": pa.array([r["rank"] for r in rows], pa.int32()),
            }),
            path,
        )
        return path

    tp, cp = write(t_rows, "truth"), write(c_rows, "cand")
    got = similarity_search.retrieval_eval(
        spark.read.parquet(tp), spark.read.parquet(cp), k=k
    )
    s_rows = _norm([tuple(r) for r in got.select(sorted(got.columns)).collect()])

    con = duckdb.connect()
    con.execute(f"create view fz_truth as select * from read_parquet('{tp}')")
    con.execute(f"create view fz_cand as select * from read_parquet('{cp}')")
    d_sql = retrieval_metrics_sql("fz_truth", "fz_cand", k)
    res = con.execute(
        f"select * from ({d_sql}) order by 1"
    )
    d_cols = [c[0] for c in res.description]
    order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    d_rows = _norm([tuple(r[i] for i in order) for r in res.fetchall()])
    assert s_rows == d_rows, f"first spark={s_rows[:2]} duck={d_rows[:2]}"
    assert len(s_rows) == 12


def test_fuzz_bpe_encode_parity(spark, tmp_path):
    """The Python mapInPandas merge loop vs the unrolled SQL oracle on
    an adversarial corpus (NULL/empty texts, multibyte words, runs):
    the full token histogram must match, not just the fixture's
    top-20."""
    from far_finer_airtable_firestore_sync_spark.operators import tokenize

    docs = _random_corpus(seed=31)
    # planted overlap runs for the (g,g) parity rule and chained merges
    docs.append({"doc_id": 9001, "source": "s0", "text": "gggg ggggg agga"})
    docs.append({"doc_id": 9002, "source": "s0", "text": "the merge window"})
    dpath = str(tmp_path / "bpe_docs.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array([r["doc_id"] for r in docs], pa.int64()),
            "source": pa.array([r["source"] for r in docs], pa.string()),
            "text": pa.array([r["text"] for r in docs], pa.string()),
        }),
        dpath,
    )
    sdf = spark.read.parquet(dpath)
    got = _norm([
        tuple(r)
        for r in tokenize.token_counts(sdf, top_k=10**6).collect()
    ])
    con = duckdb.connect()
    con.execute(
        f"create view fz_bpe as select * from read_parquet('{dpath}')"
    )
    want = _norm(
        con.execute(_bpe_encode_oracle("fz_bpe", top_k=10**6)).fetchall()
    )
    assert got == want and got


def test_fuzz_round8b_event_bodies_parity(spark, tmp_path):
    """OHLC / linear-interp / CUSUM / t-closeness parity on adversarial
    data: NEGATIVE and zero values (interp's intdiv and CUSUM's
    deviations go negative — both engines must truncate toward zero
    identically), duplicate timestamps inside an hour (OHLC open/close
    tie-break via event_id), vanishing event types, and singleton QI
    groups (t-closeness grp_n=1)."""
    import datetime as dt

    from far_finer_airtable_firestore_sync_spark.plans.agg_queries import (
        TCLOSE_BODY,
        _cusum_body,
        _interp_body,
        _ohlc_body,
    )

    rng = random.Random(47)
    types = ["a", "b", "c"]
    rows = []
    for day in range(10):
        active = types if day % 4 else types[:1]
        for _ in range(rng.randint(3, 18)):
            # duplicate ts on purpose: minute pinned to a coarse grid
            ts = dt.datetime(2024, 5, 1 + day, rng.randint(0, 5),
                             rng.choice([0, 30]))
            rows.append((ts, rng.choice(active),
                         rng.choice([-250.5, -1.0, 0.0, 3.25, 7.0, 300.0])))
    epath = str(tmp_path / "fz8b_events.parquet")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            }
        ),
        epath,
    )
    cpath = str(tmp_path / "fz8b_customer.parquet")
    crows = []
    for i in range(90):
        crows.append(
            (i, f"n{i}", rng.randint(0, 3),
             rng.choice([-500.0, 0.0, 120.75, 4999.99, 5000.0, 20000.0]),
             rng.choice(["AUTO", "BLDG"]) if i else "SINGLETON")
        )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([r[0] for r in crows], pa.int64()),
                "c_name": pa.array([r[1] for r in crows], pa.string()),
                "c_nationkey": pa.array([r[2] for r in crows], pa.int32()),
                "c_acctbal": pa.array([r[3] for r in crows], pa.float64()),
                "c_mktsegment": pa.array([r[4] for r in crows], pa.string()),
            }
        ),
        cpath,
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.read.parquet(epath).createOrReplaceTempView("fz8b_events")
    spark.read.parquet(cpath).createOrReplaceTempView("fz8b_customer")
    con = duckdb.connect()
    con.execute(
        f"create view fz8b_events as select * from read_parquet('{epath}')"
    )
    con.execute(
        f"create view fz8b_customer as select * from read_parquet('{cpath}')"
    )
    pairs = [
        ("ohlc", _ohlc_body("fz8b_events"), _ohlc_body("fz8b_events")),
        ("interp", _interp_body(SPARK_D, "fz8b_events"),
         _interp_body(DUCK_D, "fz8b_events")),
        ("cusum", _cusum_body("fz8b_events"), _cusum_body("fz8b_events")),
        ("tclose", TCLOSE_BODY.format(rel="fz8b_customer"),
         TCLOSE_BODY.format(rel="fz8b_customer")),
    ]
    for name, s_sql, d_sql in pairs:
        s_rows = _norm([tuple(r) for r in spark.sql(s_sql).collect()])
        d_rows = _norm(con.execute(d_sql).fetchall())
        assert s_rows == d_rows, (
            f"{name}: {len(s_rows)} vs {len(d_rows)} rows; "
            f"first spark={s_rows[:2]} duck={d_rows[:2]}"
        )
        assert s_rows, f"{name}: fuzz produced no rows (weak test)"
