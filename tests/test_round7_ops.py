"""Round-7 regression/feature tests.

First up: the de-flaked zone-map contract entry (r6 driver record had
one hash-mismatch row, ``store_zone_map_scan``, unreproducible
locally). The entry's only nondeterministic step was
``repartitionByRange`` (rdd.id-seeded boundary sampling); it now
hash-partitions on a fixed-width range bucket, which is stable across
runs. These tests pin (a) run-to-run result identity, (b) run-to-run
LAYOUT identity (same surviving partition indexes after pruning), and
(c) equality with the plain full-scan answer.
"""

import re

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_zone_scan_entry_repeat_run_stable(spark):
    """The store_zone_map_scan contract entry, executed 4 times with
    fresh store roots, must return byte-identical results AND prune to
    the same partition indexes every time (determinism of the
    bucket-hash clustering that replaced repartitionByRange)."""
    import __spark_entry__ as e

    q = e.queries()["store_zone_map_scan"]
    results = []
    for _ in range(4):
        results.append(_canon(q(spark, SF_DIR)))
    assert results[0] == results[1] == results[2] == results[3]
    assert len(results[0]) > 0


def test_zone_scan_layout_deterministic(spark, tmp_path):
    """Two commits of the same bucket-partitioned frame produce the
    same per-file zone manifest (modulo file-name UUIDs): same file
    count, same set of (partition-index, user_id-zone) pairs — the
    property repartitionByRange could not give."""
    from pyspark.sql import functions as F

    from far_finer_airtable_firestore_sync_spark.sources.store import (
        DocumentStore,
        write_zone_manifest,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").selectExpr(
        "event_id", "user_id"
    )
    mn, mx = ev.agg(F.min("user_id"), F.max("user_id")).first()
    width = max(1, (int(mx) - int(mn) + 8) // 8)
    layouts = []
    for i in range(2):
        store = DocumentStore(spark, str(tmp_path / f"z{i}"), "event_id")
        vdir = store.commit(
            ev.repartition(
                8, F.expr(f"cast((user_id - {int(mn)}) div {width} as int)")
            )
        )
        manifest = write_zone_manifest(vdir)
        layout = set()
        for rel, meta in manifest.items():
            m = re.search(r"part-(\d+)", rel)
            zone = meta["columns"].get("user_id")
            layout.add((m.group(1) if m else rel, tuple(zone or [])))
        layouts.append(layout)
    assert layouts[0] == layouts[1]


def test_zone_scan_equals_full_scan(spark):
    """Pruned-read aggregate == full-scan aggregate (the oracle's
    shape) on the entry itself."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    got = _canon(e.queries()["store_zone_map_scan"](spark, SF_DIR))
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = _canon(
        ev.filter("user_id between 10 and 19")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(
                F.expr("cast(floor(value * cast(64 as double)) as bigint)")
            )
            .cast("long")
            .alias("value_64ths"),
        )
    )
    assert got == want


def test_diff_frames_reserved_column_guard(spark, tmp_path):
    """_diff_frames raises on user columns that collide with its
    internal presence markers instead of silently clobbering them
    (ADVICE r6)."""
    from far_finer_airtable_firestore_sync_spark.sources.store import (
        DocumentStore,
    )

    store = DocumentStore(spark, str(tmp_path / "s"), "k")
    ok = spark.createDataFrame([(1, "a")], "k int, v string")
    bad = spark.createDataFrame(
        [(1, "a", 1)], "k int, v string, _ffs_diff_o int"
    )
    v1 = store.commit(ok)
    with pytest.raises(ValueError, match="_ffs_diff_o"):
        DocumentStore._diff_frames(ok, bad, "k")
    with pytest.raises(ValueError, match="_ffs_diff_o"):
        DocumentStore._diff_frames(bad, ok, "k")
    # the normal path still works
    v2 = store.commit(ok.withColumn("v", ok.v.substr(1, 1)))
    assert store.diff_versions(v1, v2).count() == 0


def test_audio_chroma_fingerprint_matches_closed_form(spark):
    """Real WAV decode -> square-wave band energies -> bit pack must
    equal the pure-Python closed form from the id; exact copies hash
    identically; undecodable bytes quarantine to NULL."""
    from pyspark.sql import Row

    from far_finer_airtable_firestore_sync_spark.operators import multimodal
    from far_finer_airtable_firestore_sync_spark.operators.multimodal import (
        CFP_BANDS,
        CFP_FRAME_LEN,
        CFP_FRAMES,
        gradient_pcm_sample,
    )

    ids = [0, 1, 17, 255, 256, 4999, 500010, 1000017]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    hashed = {
        r["media_id"]: r["cfp"]
        for r in multimodal.audio_chroma_fingerprint(
            multimodal.synth_gradient_wav_blobs(df)
        ).collect()
    }

    def expect(i: int) -> str:
        def e(f, h):
            c = sum(
                (1 if (j // h) % 2 == 0 else -1)
                * gradient_pcm_sample(i, f * CFP_FRAME_LEN + j)
                for j in range(CFP_FRAME_LEN)
            )
            return c * c

        val = 0
        for f in range(CFP_FRAMES - 1):
            for h in CFP_BANDS:
                val = (val << 1) | (1 if e(f + 1, h) > e(f, h) else 0)
        return f"{val:016x}"

    assert hashed == {i: expect(i) for i in ids}
    assert hashed[1000017] == hashed[17]
    # spectral and time-domain views are genuinely different filters
    afp = {
        r["media_id"]: r["afp"]
        for r in multimodal.audio_energy_fingerprint(
            multimodal.synth_gradient_wav_blobs(df)
        ).collect()
    }
    assert any(afp[i] != hashed[i] for i in ids)
    bad = spark.createDataFrame(
        [Row(media_id=1, content=b"RIFFnope", media_type="audio/wav")]
    )
    assert (
        multimodal.audio_chroma_fingerprint(bad).collect()[0]["cfp"] is None
    )


def test_triangle_body_hand_graph(spark):
    """TRIANGLE_BODY on a hand graph: K3 plus a pendant edge —
    1 triangle, 5 wedges, clustering 0.6."""
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        TRIANGLE_BODY,
    )

    spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "id_a long, id_b long"
    ).createOrReplaceTempView("_t7_tri")
    r = spark.sql(TRIANGLE_BODY.format(pairs="_t7_tri")).collect()[0]
    assert (
        r["n_nodes"],
        r["n_edges"],
        r["n_triangles"],
        float(r["n_wedges"]),
    ) == (4, 4, 1, 5.0)
    assert abs(r["global_clustering"] - 0.6) < 1e-12


def test_markov_body_hand_sequence(spark):
    """MARKOV_BODY on a fixed two-user sequence: counts and row-exact
    probabilities."""
    from far_finer_airtable_firestore_sync_spark.plans.agg_queries import (
        MARKOV_BODY,
    )

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"),
        (2, 1, "a"), (2, 2, "b"), (2, 3, "b"),
    ]
    spark.createDataFrame(
        [(u, float(t), e) for u, t, e in rows],
        "user_id long, ts double, event_type string",
    ).selectExpr(
        "user_id",
        "cast(timestamp_seconds(ts) as timestamp) ts",
        "event_type",
        "cast(user_id * 10 + ts as long) as event_id",
    ).createOrReplaceTempView("_t7_markov")
    got = {
        (r["event_type"], r["next_type"]): (r["n"], r["p"])
        for r in spark.sql(MARKOV_BODY.format(rel="_t7_markov")).collect()
    }
    assert got == {
        ("a", "b"): (2, 2 / 3),
        ("a", "c"): (1, 1 / 3),
        ("b", "a"): (1, 1 / 2),
        ("b", "b"): (1, 1 / 2),
    }


def test_knn_shapley_hand_example(spark):
    """5-train-point KNN-Shapley against the Jia et al. recurrence
    computed by hand: I = [1,0,1,0,0] with K=5 gives
    s = [0.2, 0, 0.2, 0, 0]."""
    from far_finer_airtable_firestore_sync_spark.functions.canonical import (
        SPARK as SPARK_D,
    )
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        _knn_shapley_body,
    )

    rows = [(0, [0.0], 1)] + [
        (10 + i, [0.001 * (i + 1)], lab)
        for i, lab in enumerate([1, 0, 1, 0, 0])
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).createOrReplaceTempView("_t7_shap")
    got = {
        r["train_id"]: (r["rank"], r["shapley"])
        for r in spark.sql(_knn_shapley_body(SPARK_D, "_t7_shap")).collect()
    }
    # expected 1/5 on the engines' exact 1e-6 micro grid: the scaled
    # integer D/5 is floor-divided to micros, then one int64->double
    # cast and one IEEE division by 1e6 (the r8 exact-output recipe —
    # no wide hugeint->double cast, which DuckDB mis-rounds past 2^53)
    import math

    D = math.lcm(*range(1, 65))
    fifth = float(((D // 5) * 1_000_000) // D) / 1e6
    assert got == {
        10: (1, fifth),
        11: (2, 0.0),
        12: (3, fifth),
        13: (4, 0.0),
        14: (5, 0.0),
    }


def test_change_feed_matches_pairwise_diffs(spark, tmp_path):
    """change_feed == union of consecutive diff_versions, stamped with
    the right commit; single-version stores yield an EMPTY feed with
    the full schema; non-version bounds raise."""
    from far_finer_airtable_firestore_sync_spark.sources.store import (
        DocumentStore,
    )

    store = DocumentStore(spark, str(tmp_path / "cdf"), "k")
    v1 = store.commit(spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"))
    feed0 = store.change_feed()
    assert feed0.count() == 0
    assert set(feed0.columns) >= {"change_type", "k", "commit_ms"}
    v2 = store.commit(spark.createDataFrame(
        [(1, "a"), (3, "c")], "k long, v string"))
    v3 = store.commit(spark.createDataFrame(
        [(1, "A"), (3, "c")], "k long, v string"))
    feed = {
        (r["k"], r["change_type"], r["v"])
        for r in store.change_feed().collect()
    }
    assert feed == {
        (2, "delete", None),
        (3, "insert", "c"),
        (1, "update", "A"),
    }
    # commit stamps are the version dirs' epoch ms, strictly increasing
    ms = sorted(
        r["commit_ms"] for r in store.change_feed().collect()
    )
    import os

    assert ms[0] == int(os.path.basename(v2).split("-")[1])
    assert ms[-1] == int(os.path.basename(v3).split("-")[1])
    # bounded range: only the last hop
    last = store.change_feed(from_dir=v2).collect()
    assert {(r["k"], r["change_type"]) for r in last} == {(1, "update")}
    import pytest as _pt

    with _pt.raises(ValueError, match="committed versions"):
        store.change_feed(from_dir="/nope")
    with _pt.raises(ValueError, match="newer"):
        store.change_feed(from_dir=v3, to_dir=v1)


def test_soundex_expr_matches_native_and_duckdb(spark):
    """The portable soundex pipeline must equal Spark's NATIVE
    soundex() on classic fixtures + a random alpha corpus, and the
    DuckDB rendering must agree with the Spark rendering (RE2 has no
    backreferences — the per-digit collapse chain is the portable
    form)."""
    import random
    import string

    import duckdb

    from far_finer_airtable_firestore_sync_spark.functions.canonical import (
        DUCKDB,
        SPARK as SPARK_D,
    )
    from far_finer_airtable_firestore_sync_spark.functions.textsql import (
        soundex_expr,
    )

    random.seed(7)
    words = [
        "Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak",
        "Pfister", "Honeyman", "Holmes", "Hmm", "Tybbs", "Jackson",
        "Wwwx", "Yy", "Aeiou",
    ] + [
        "".join(random.choices(string.ascii_letters, k=random.randint(1, 12)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    mine = {
        r["w"]: r["sx"]
        for r in df.selectExpr(
            "w", f"{soundex_expr('w', SPARK_D)} as sx"
        ).collect()
    }
    native = {
        r["w"]: r["sx"]
        for r in df.selectExpr("w", "soundex(w) as sx").collect()
    }
    assert mine == native
    # the HW-first classics specifically
    assert mine["Ashcraft"] == "A261" and mine["Hmm"] == "H500"
    con = duckdb.connect()
    con.execute(
        "create table t as select * from (values "
        + ",".join(f"('{w}')" for w in words)
        + ") v(w)"
    )
    duck = dict(
        con.execute(f"select w, {soundex_expr('w', DUCKDB)} from t").fetchall()
    )
    assert duck == mine


def test_kcenter_hand_example(spark):
    """Greedy farthest-point on 4 one-dimensional points: the picks
    and coverage radii are checkable by hand."""
    from far_finer_airtable_firestore_sync_spark.functions.canonical import (
        SPARK as SPARK_D,
    )
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        _kcenter_body,
    )

    pts = [(0, [0.0]), (5, [0.010]), (10, [0.003]), (15, [0.006])]
    spark.createDataFrame(
        pts, "vec_id long, embedding array<float>"
    ).createOrReplaceTempView("_t7_kc")
    rows = {
        r["step"]: (r["center_id"], r["radius_sq"])
        for r in spark.sql(_kcenter_body(SPARK_D, "_t7_kc", k=4)).collect()
    }
    # seed=0; farthest is 10 units away (id 5, r=100); then id 15
    # (min-dist 4 units, r=16); then id 10 (r=9)
    assert rows == {
        0: (0, None),
        1: (5, 100),
        2: (15, 16),
        3: (10, 9),
    }


def test_fuzz_round7_bodies_parity(spark, tmp_path):
    """Adversarial cross-engine parity for the round-7 dual-dialect
    bodies: Markov transitions (ts ties pinned by event_id), triangle
    stats (duplicate edges), l-diversity (NULL/boundary balances),
    conformal threshold (tied scores), KNN-Shapley and k-center
    (random embeddings with duplicate vectors)."""
    import datetime as dt
    import random

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from far_finer_airtable_firestore_sync_spark.functions.canonical import (
        DUCKDB,
        SPARK as SPARK_D,
    )
    from far_finer_airtable_firestore_sync_spark.plans.agg_queries import (
        CONFORMAL_BODY,
        LDIV_BODY,
        MARKOV_BODY,
    )
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        TRIANGLE_BODY,
        _kcenter_body,
        _knn_shapley_body,
    )

    rng = random.Random(77)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    con = duckdb.connect()

    def stage(name, table):
        p = str(tmp_path / f"{name}.parquet")
        pq.write_table(table, p)
        spark.read.parquet(p).createOrReplaceTempView(name)
        con.execute(
            f"create view {name} as select * from read_parquet('{p}')"
        )

    # events with deliberate ts ties
    ev = []
    for i in range(300):
        ev.append(
            (
                i,
                rng.randint(0, 5),
                dt.datetime(2024, 3, 1 + rng.randint(0, 5),
                            rng.randint(0, 23), rng.choice([0, 30])),
                rng.choice(["a", "b", "c"]),
            )
        )
    stage(
        "fz7_events",
        pa.table(
            {
                "event_id": pa.array([e[0] for e in ev], pa.int64()),
                "user_id": pa.array([e[1] for e in ev], pa.int64()),
                "ts": pa.array([e[2] for e in ev], pa.timestamp("us")),
                "event_type": pa.array([e[3] for e in ev], pa.string()),
            }
        ),
    )
    # edge list with duplicates
    edges = [(a, b) for _ in range(80)
             for a, b in [sorted(rng.sample(range(15), 2))]]
    stage(
        "fz7_edges",
        pa.table(
            {
                "id_a": pa.array([e[0] for e in edges], pa.int64()),
                "id_b": pa.array([e[1] for e in edges], pa.int64()),
            }
        ),
    )
    # customers with NULL and boundary balances
    bal = [None, -1.0, 0.0, 4999.99, 5000.0, 7000.0]
    stage(
        "fz7_customer",
        pa.table(
            {
                "c_nationkey": pa.array(
                    [rng.randint(0, 3) for _ in range(120)], pa.int32()
                ),
                "c_mktsegment": pa.array(
                    [rng.choice(["X", "Y"]) for _ in range(120)], pa.string()
                ),
                "c_acctbal": pa.array(
                    [rng.choice(bal) for _ in range(120)], pa.float64()
                ),
            }
        ),
    )
    # documents with heavily tied scores
    stage(
        "fz7_docs",
        pa.table(
            {
                "doc_id": pa.array(range(150), pa.int64()),
                "n_chars": pa.array(
                    [rng.choice([10, 10, 20, 30, 30, 30, 99])
                     for _ in range(150)],
                    pa.int64(),
                ),
            }
        ),
    )
    # embeddings with duplicate vectors and both labels
    vecs = [[rng.choice([0.0, 0.25, -0.5, 1.0]) for _ in range(4)]
            for _ in range(40)]
    stage(
        "fz7_emb",
        pa.table(
            {
                "vec_id": pa.array(range(40), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(
                    [rng.randint(0, 1) for _ in range(40)], pa.int32()
                ),
            }
        ),
    )

    pairs = [
        ("markov", MARKOV_BODY.format(rel="fz7_events"),
         MARKOV_BODY.format(rel="fz7_events")),
        ("triangle", TRIANGLE_BODY.format(pairs="fz7_edges"),
         TRIANGLE_BODY.format(pairs="fz7_edges")),
        ("ldiv", LDIV_BODY.format(rel="fz7_customer"),
         LDIV_BODY.format(rel="fz7_customer")),
        ("conformal", CONFORMAL_BODY.format(rel="fz7_docs"),
         CONFORMAL_BODY.format(rel="fz7_docs")),
        ("shapley", _knn_shapley_body(SPARK_D, "fz7_emb"),
         _knn_shapley_body(DUCKDB, "fz7_emb")),
        ("kcenter", _kcenter_body(SPARK_D, "fz7_emb"),
         _kcenter_body(DUCKDB, "fz7_emb")),
    ]
    for name, s_sql, d_sql in pairs:
        s_rows = sorted(map(repr, (tuple(r) for r in spark.sql(s_sql).collect())))
        d_rows = sorted(map(repr, (tuple(r) for r in con.execute(d_sql).fetchall())))
        assert s_rows == d_rows, (
            f"{name}: {len(s_rows)} vs {len(d_rows)}; "
            f"spark={s_rows[:2]} duck={d_rows[:2]}"
        )
        assert s_rows, f"{name}: fuzz produced no rows (weak test)"


def test_video_scene_cuts_matches_closed_form(spark):
    """Real Y4M parse -> luma-sum deltas -> cut flags must equal the
    pure-Python closed form; undecodable bytes -> NULLs."""
    from pyspark.sql import Row

    from far_finer_airtable_firestore_sync_spark.operators import multimodal
    from far_finer_airtable_firestore_sync_spark.operators.multimodal import (
        SCENE_CUT_THRESHOLD,
        VFP_FRAMES,
        VFP_H,
        VFP_W,
        gradient_luma,
    )

    ids = [0, 3, 255, 4999]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["media_id"]: (r["n_cuts"], r["first_cut"])
        for r in multimodal.video_scene_cuts(
            multimodal.synth_gradient_y4m_blobs(df)
        ).collect()
    }

    def expect(i):
        sums = [
            sum(
                gradient_luma(i, f, x, y)
                for x in range(VFP_W)
                for y in range(VFP_H)
            )
            for f in range(VFP_FRAMES)
        ]
        cuts = [
            f + 1
            for f in range(VFP_FRAMES - 1)
            if abs(sums[f + 1] - sums[f]) > SCENE_CUT_THRESHOLD
        ]
        return (len(cuts), cuts[0] if cuts else None)

    assert got == {i: expect(i) for i in ids}
    assert any(v[0] > 0 for v in got.values())
    bad = spark.createDataFrame(
        [Row(media_id=1, content=b"nope", media_type="video/x")]
    )
    r = multimodal.video_scene_cuts(bad).collect()[0]
    assert r["n_cuts"] is None and r["first_cut"] is None


def test_fuzz_textrank_parity(spark, tmp_path):
    """Full TextRank pipeline parity on an adversarial corpus: empty
    texts, single-word docs, heavy duplication (dense graphs),
    isolated sentences. Spark = shared pairs SQL + DataFrame
    weighted_pagerank; DuckDB = the hand-unrolled oracle recurrence —
    the two implementations must agree row-exactly."""
    import random

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from far_finer_airtable_firestore_sync_spark.functions.canonical import (
        SPARK as SPARK_D,
    )
    from far_finer_airtable_firestore_sync_spark.operators import dedup_docs
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        TEXTRANK_SID_BASE,
        TEXTRANK_TOP,
        _textrank_pairs_sql,
        textrank_oracle,
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(99)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    texts = []
    for i in range(40):
        n = rng.choice([0, 1, 11, 12, 13, 30, 60])
        texts.append(" ".join(rng.choice(vocab) for _ in range(n)))
    p = str(tmp_path / "txr_docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(0, 200, 5), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        p,
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.read.parquet(p).createOrReplaceTempView("fz_txr")
    pairs = spark.sql(
        "with " + _textrank_pairs_sql(SPARK_D, "fz_txr")
        + " select * from tr_pairs"
    ).localCheckpoint(eager=True)
    ranks = dedup_docs.weighted_pagerank(pairs, iterations=3)
    got = (
        ranks.select(
            F.expr(f"node div {TEXTRANK_SID_BASE}").alias("doc_id"),
            F.expr(f"node % {TEXTRANK_SID_BASE}").cast("int").alias(
                "sentence_idx"
            ),
            F.col("pr_micro"),
        )
        .withColumn(
            "pick",
            F.row_number()
            .over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("pr_micro").desc(), F.col("sentence_idx").asc()
                )
            )
            .cast("int"),
        )
        .filter(F.col("pick") <= TEXTRANK_TOP)
    )
    s_rows = sorted(tuple(r) for r in got.collect())
    con = duckdb.connect()
    con.execute(f"create view fz_txr as select * from read_parquet('{p}')")
    d_rows = sorted(
        tuple(r) for r in con.execute(textrank_oracle("fz_txr")).fetchall()
    )
    assert s_rows == d_rows
    assert s_rows, "fuzz corpus produced no summary rows (weak test)"


def test_weighted_pagerank_matches_python_replica(spark):
    """weighted_pagerank on a small weighted graph == an independent
    pure-Python replay of the integer recurrence; and pagerank (which
    now delegates with w=1) still equals its own replica."""
    from far_finer_airtable_firestore_sync_spark.operators import dedup_docs
    from far_finer_airtable_firestore_sync_spark.operators.dedup_docs import (
        PR_UNIT,
    )

    pairs = [(1, 2, 3), (1, 3, 1), (2, 4, 2)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long, w long")
    got = {
        r["node"]: r["pr_micro"]
        for r in dedup_docs.weighted_pagerank(df, iterations=3).collect()
    }

    edges = {}
    for a, b, w in pairs:
        edges.setdefault(a, []).append((b, w))
        edges.setdefault(b, []).append((a, w))
    wd = {u: sum(w for _v, w in nbrs) for u, nbrs in edges.items()}
    n = len(wd)
    r = {u: PR_UNIT // n for u in wd}
    for _ in range(3):
        s = {u: 0 for u in wd}
        for u, nbrs in edges.items():
            for v, w in nbrs:
                s[v] += (r[u] * w) // wd[u]
        r = {u: (15 * PR_UNIT) // (100 * n) + (85 * s[u]) // 100
             for u in wd}
    assert got == r
    # the delegation: unweighted == weighted with w=1
    got_unw = {
        x["doc_id"]: x["pr_micro"]
        for x in dedup_docs.pagerank(
            df.select("id_a", "id_b"), iterations=2
        ).collect()
    }
    edges1 = {}
    for a, b, _w in pairs:
        edges1.setdefault(a, []).append(b)
        edges1.setdefault(b, []).append(a)
    deg = {u: len(v) for u, v in edges1.items()}
    r1 = {u: PR_UNIT // n for u in deg}
    for _ in range(2):
        s = {u: 0 for u in deg}
        for u, nbrs in edges1.items():
            for v in nbrs:
                s[v] += r1[u] // deg[u]
        r1 = {u: (15 * PR_UNIT) // (100 * n) + (85 * s[u]) // 100
              for u in deg}
    assert got_unw == r1


def test_soundex_groups_fixture_is_rich(spark):
    """The blocking entry must exercise MANY multi-member collision
    groups (r7 VERDICT: the raw part-word corpus had exactly one thin
    red/rod group) — the vowel-flattened variant corpus guarantees a
    collision per consonant-initial vowel-bearing word."""
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        q_soundex_groups,
    )

    rows = q_soundex_groups(spark, SF_DIR).collect()
    assert len(rows) >= 5, [tuple(r) for r in rows]
    assert all(r["n_words"] >= 2 for r in rows)
