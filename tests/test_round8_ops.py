"""Round-8 feature/regression tests: Z-order store skipping,
partition-layout evolution, and the distributed exact equi-depth
histogram."""

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_zorder_entry_repeat_run_stable(spark):
    """store_zorder_scan twice with fresh roots: identical results
    (murmur3-tile layout is run-deterministic) and non-empty."""
    import __spark_entry__ as e

    q = e.queries()["store_zorder_scan"]
    a, b = _canon(q(spark, SF_DIR)), _canon(q(spark, SF_DIR))
    assert a == b and len(a) > 0


def test_zorder_entry_equals_direct_scan(spark):
    """The pruned Z-order aggregate == the same filter computed from
    the raw parquet (the in-entry assert already enforces it against
    the store round-trip; this pins it against the fixture too)."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    got = _canon(e.queries()["store_zorder_scan"](spark, SF_DIR))
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").selectExpr(
        "user_id", "unix_timestamp(ts) div 86400 as d", "value"
    )
    mnd, mxd = ev.agg(F.min("d"), F.max("d")).first()
    dhi = int(mnd) + (int(mxd) - int(mnd)) // 4
    want = _canon(
        ev.filter(f"user_id between 10 and 19 and d between {mnd} and {dhi}")
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


def test_partition_evolution_entry_and_plan_pruning(spark, tmp_path):
    """Both layouts answer identically (entry), and a filtered read of
    a hive-partitioned version carries real PartitionFilters in its
    plan — directory-level skipping, not a post-scan filter."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    from far_finer_airtable_firestore_sync_spark.sources.store import (
        DocumentStore,
    )

    rows = _canon(e.queries()["store_partition_evolution"](spark, SF_DIR))
    assert {r[0] for r in rows} == {"by_type", "by_day"}
    assert all(r[1] > 0 for r in rows)

    store = DocumentStore(spark, str(tmp_path / "pevo"), "event_id")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    vdir = store.commit(ev, partition_by=["event_type"])
    et = ev.agg(F.min("event_type")).first()[0]
    plan = (
        store.read_version(vdir)
        .filter(F.col("event_type") == et)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    head = plan.split("== Initial Plan ==")[0]
    assert "PartitionFilters" in head
    # the filter must actually reach the partition-filter slot
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", head)
    assert m and "event_type" in m.group(1), head[:2000]


def test_equidepth_distributed_matches_global_window(spark):
    """The range-partition + prefix-offset exact-rank recipe must
    equal the single-window formulation row-for-row, and bucket sizes
    must be floor-balanced (max-min <= 1)."""
    from far_finer_airtable_firestore_sync_spark.plans.agg_queries import (
        EQUIDEPTH_BUCKETS,
        q_events_equidepth_hist,
    )

    got = _canon(q_events_equidepth_hist(spark, SF_DIR))
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev.createOrReplaceTempView("_r8_eq_events")
    want = _canon(
        spark.sql(
            f"""
            with ranked as (
              select value, event_id,
                     row_number() over (
                       order by value asc, event_id asc) as rn,
                     count(*) over () as n
              from _r8_eq_events where value is not null
            )
            select cast((rn - 1) * {EQUIDEPTH_BUCKETS} div n as int)
                     as bucket,
                   cast(count(*) as bigint) as n_rows,
                   min(cast(floor(value * cast(64 as double)) as bigint))
                     as lo_64,
                   max(cast(floor(value * cast(64 as double)) as bigint))
                     as hi_64
            from ranked group by 1
            """
        )
    )
    assert got == want
    sizes = [r[1] for r in got]
    assert len(got) == EQUIDEPTH_BUCKETS
    assert max(sizes) - min(sizes) <= 1
    # bucket ranges are non-overlapping and ordered
    ordered = sorted(got)
    for (b1, _n1, _lo1, hi1), (b2, _n2, lo2, _hi2) in zip(
        ordered, ordered[1:]
    ):
        # rank cuts keep value order: the next bucket starts at or
        # above where the previous one ended (ties may share the cell)
        assert b2 == b1 + 1 and lo2 >= hi1


def test_equidepth_fuzz_duplicates_and_negatives(spark):
    """Adversarial value distributions (heavy ties, negatives, tiny
    fractions) keep the distributed and window formulations equal."""
    import random

    from far_finer_airtable_firestore_sync_spark.plans.agg_queries import (
        EQUIDEPTH_BUCKETS,
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(8)
    vals = (
        [0.0] * 40
        + [-1.25] * 17
        + [rng.uniform(-5, 5) for _ in range(150)]
        + [3.0000001, 2.9999999, 0.015625]
    )
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "event_id long, value double"
    )
    # distributed recipe inline (mirrors q_events_equidepth_hist,
    # incl. the checkpoint pin — the two consuming branches must see
    # the same sampled range boundaries)
    parts = (
        df.repartitionByRange(8, F.col("value"), F.col("event_id"))
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    local = parts.withColumn(
        "lrn",
        F.row_number().over(Window.partitionBy("pid").orderBy(
            "value", "event_id")),
    )
    sizes = local.groupBy("pid").agg(F.max("lrn").alias("cnt"))
    off = sizes.select(
        "pid",
        F.coalesce(
            F.sum("cnt").over(
                Window.orderBy("pid").rowsBetween(
                    Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("off"),
        F.sum("cnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    dist = _canon(
        local.join(F.broadcast(off), "pid")
        .select(
            F.expr(
                f"cast((lrn + off - 1) * {EQUIDEPTH_BUCKETS} div n as int)"
            ).alias("bucket"),
            F.expr(
                "cast(floor(value * cast(64 as double)) as bigint)"
            ).alias("v64"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("v64").alias("lo_64"),
            F.max("v64").alias("hi_64"),
        )
    )
    df.createOrReplaceTempView("_r8_eq_fuzz")
    want = _canon(
        spark.sql(
            f"""
            with ranked as (
              select value, event_id,
                     row_number() over (
                       order by value asc, event_id asc) as rn,
                     count(*) over () as n
              from _r8_eq_fuzz where value is not null
            )
            select cast((rn - 1) * {EQUIDEPTH_BUCKETS} div n as int)
                     as bucket,
                   cast(count(*) as bigint) as n_rows,
                   min(cast(floor(value * cast(64 as double)) as bigint))
                     as lo_64,
                   max(cast(floor(value * cast(64 as double)) as bigint))
                     as hi_64
            from ranked group by 1
            """
        )
    )
    assert dist == want


def test_audio_dynamics_matches_closed_form(spark):
    """Real WAV decode -> dynamics stats must equal the pure-Python
    closed form from the id; undecodable bytes quarantine to NULLs."""
    from pyspark.sql import Row

    from far_finer_airtable_firestore_sync_spark.operators import multimodal
    from far_finer_airtable_firestore_sync_spark.operators.multimodal import (
        AFP_N_SAMPLES,
        gradient_pcm_sample,
    )

    ids = [0, 3, 17, 255, 256, 4999]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["media_id"]: (r["peak_abs"], r["n_loud"], r["n_quiet"], r["dc_sum"])
        for r in multimodal.audio_dynamics(
            multimodal.synth_gradient_wav_blobs(df)
        ).collect()
    }

    def expect(i):
        s = [gradient_pcm_sample(i, j) for j in range(AFP_N_SAMPLES)]
        return (
            max(abs(x) for x in s),
            sum(1 for x in s if abs(x) >= 512),
            sum(1 for x in s if abs(x) <= 64),
            sum(s),
        )

    assert got == {i: expect(i) for i in ids}
    bad = spark.createDataFrame(
        [Row(media_id=1, content=b"RIFFnope", media_type="audio/wav")]
    )
    r = multimodal.audio_dynamics(bad).collect()[0]
    assert (r["peak_abs"], r["n_loud"], r["n_quiet"], r["dc_sum"]) == (
        None, None, None, None,
    )


def test_bucketed_entry_join_is_shuffle_free(spark, tmp_path):
    """The contract entry's full plan carries at most ONE SHUFFLE
    exchange — the final groupBy's — because the bucketed scans
    already satisfy the join distribution (write-time shuffle, paid
    once). At fixture scale AQE may legitimately broadcast the tiny
    dim side instead (BroadcastExchange is not a shuffle), so only
    hash-partitioning exchanges count; the scans must still read as
    Bucketed."""
    import __spark_entry__ as e

    df = e.queries()["bucketed_colocated_join"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    head = plan.split("== Initial Plan ==")[0]
    assert head.count("Exchange hashpartitioning") <= 1, head[:3000]
    assert "Bucketed: true" in head
    assert df.count() > 0


def test_zipf_profile_octaves_conserve_vocabulary(spark):
    """Octave k holds exactly 2^k ranks (except the tail octave), the
    octaves partition the vocabulary, and max_freq never increases as
    rank grows."""
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        q_zipf_profile,
    )

    rows = sorted(
        (r["rank_octave"], r["n_words"], r["max_freq"], r["min_freq"])
        for r in q_zipf_profile(spark, SF_DIR).collect()
    )
    assert rows, "empty profile"
    total = sum(n for _o, n, _mx, _mn in rows)
    for (o, n, _mx, _mn) in rows[:-1]:
        assert n == 2 ** o, rows
    assert rows[-1][1] <= 2 ** rows[-1][0]
    # frequency is non-increasing across octaves
    for (_o1, _n1, _mx1, mn1), (_o2, _n2, mx2, _mn2) in zip(
        rows, rows[1:]
    ):
        assert mx2 <= mn1
    # octaves 0..k are dense
    assert [o for o, *_ in rows] == list(range(len(rows)))
    # vocabulary conservation against a direct distinct count
    vocab = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter("doc_id % 11 = 0")
        .selectExpr("explode(split(text, ' ')) as w")
        .selectExpr("lower(w) as w")
        .filter("length(w) > 0")
        .select("w")
        .distinct()
        .count()
    )
    assert total == vocab


def test_diff_frames_schema_evolution(spark, tmp_path):
    """Added and dropped columns across versions: typed-NULL backfill,
    union-of-columns comparison, payload = new snapshot's view; the
    feed unions heterogeneous steps by name."""
    from far_finer_airtable_firestore_sync_spark.sources.store import (
        DocumentStore,
    )

    store = DocumentStore(spark, str(tmp_path / "sevo"), "k")
    v1 = store.commit(spark.createDataFrame([(1, "a"), (2, "b")],
                                            "k long, v string"))
    v2 = store.commit(
        spark.createDataFrame(
            [(1, "a", 5.0), (3, "c", 7.0)], "k long, v string, bal double"
        )
    )
    d = {r["k"]: r for r in store.diff_versions(v1, v2).collect()}
    # k=1: only change is the NEW column gaining a value -> update
    assert d[1]["change_type"] == "update" and d[1]["bal"] == 5.0
    assert d[2]["change_type"] == "delete"
    assert d[3]["change_type"] == "insert"
    # drop the v column in v3: surviving rows update, payload v=NULL
    v3 = store.commit(
        spark.createDataFrame([(1, 5.0), (3, 7.0)], "k long, bal double")
    )
    d2 = {r["k"]: r for r in store.diff_versions(v2, v3).collect()}
    assert d2[1]["change_type"] == "update" and d2[1]["v"] is None
    # the 3-commit feed spans both evolutions in one plan
    feed = store.change_feed()
    assert feed.count() == len(d) + len(d2)
    assert {"k", "change_type", "v", "bal", "commit_ms"} <= set(feed.columns)


def test_restore_and_read_as_of_roundtrip(spark, tmp_path):
    """read_as_of at a commit's exact epoch returns that snapshot;
    restore republishes an old snapshot as a NEW version (append-only
    history)."""
    from far_finer_airtable_firestore_sync_spark.sources.store import (
        DocumentStore,
        version_commit_ms,
    )

    store = DocumentStore(spark, str(tmp_path / "tt"), "k")
    d1 = store.commit(spark.createDataFrame([(1, "a")], "k long, v string"))
    d2 = store.commit(spark.createDataFrame([(2, "b")], "k long, v string"))
    store.commit(spark.createDataFrame([(3, "c")], "k long, v string"))
    assert [tuple(r) for r in store.read_as_of(
        version_commit_ms(d2)).collect()] == [(2, "b")]
    n_before = len(store.list_versions())
    store.restore(d1)
    assert [tuple(r) for r in store.read().collect()] == [(1, "a")]
    assert len(store.list_versions()) == n_before + 1


def test_diff_frames_case_drift_is_not_schema_evolution(spark, tmp_path):
    """A column renamed only in CASE across versions ('Bal' -> 'bal')
    is the SAME column under Spark's default case-insensitive
    resolution — the schema-evolution backfill must not treat it as
    added+dropped (which would NULL both sides and silently drop every
    value change from the diff; r8 second-wave review finding)."""
    from far_finer_airtable_firestore_sync_spark.sources.store import (
        DocumentStore,
    )

    store = DocumentStore(spark, str(tmp_path / "case"), "k")
    v1 = store.commit(spark.createDataFrame([(1, 100.0)],
                                            "k long, Bal double"))
    v2 = store.commit(spark.createDataFrame([(1, 200.0)],
                                            "k long, bal double"))
    d = store.diff_versions(v1, v2).collect()
    assert len(d) == 1
    assert d[0]["change_type"] == "update"
    assert d[0]["bal"] == 200.0
