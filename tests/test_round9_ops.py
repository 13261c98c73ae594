"""Round-9 operator tests: aggregate-over-join IVM, explicit dim-key
plumbing, and (further down, added with the store work) the composed
deletion-vector read path and the vacuum x time-travel x checkpoint
lifecycle."""

import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _ivm_fixture(spark):
    """The round-8b hand case (every join-IVM leg: insert, delete,
    payload update, fk move, dim delete, dim attr update), shared by
    the refresh and rollup tests."""
    from far_finer_airtable_firestore_sync_spark.sources.store import (
        DocumentStore,
    )

    f0 = spark.createDataFrame(
        [
            Row(k=1, fk=10, v=100),
            Row(k=2, fk=10, v=200),
            Row(k=3, fk=20, v=300),
            Row(k=4, fk=40, v=400),
            Row(k=5, fk=50, v=500),
            Row(k=6, fk=10, v=600),
        ]
    )
    f1 = spark.createDataFrame(
        [
            Row(k=1, fk=10, v=111),
            Row(k=3, fk=30, v=300),
            Row(k=4, fk=40, v=400),
            Row(k=5, fk=50, v=500),
            Row(k=6, fk=10, v=600),
            Row(k=7, fk=20, v=700),
        ]
    )
    d0 = spark.createDataFrame(
        [Row(dk=10, a="x"), Row(dk=20, a="y"), Row(dk=30, a="z"),
         Row(dk=40, a="w"), Row(dk=50, a="v")]
    )
    d1 = spark.createDataFrame(
        [Row(dk=10, a="x"), Row(dk=20, a="y"), Row(dk=30, a="z"),
         Row(dk=50, a="V")]
    )
    fs = DocumentStore(spark, tempfile.mkdtemp(prefix="ivmr_f_"), "k")
    ds = DocumentStore(spark, tempfile.mkdtemp(prefix="ivmr_d_"), "dk")
    fv0, fv1 = fs.commit(f0), fs.commit(f1)
    dv0, dv1 = ds.commit(d0), ds.commit(d1)
    fact1, dim1 = fs.read_version(fv1), ds.read_version(dv1)
    fact0, dim0 = fs.read_version(fv0), ds.read_version(dv0)
    m0 = fact0.join(dim0, fact0["fk"] == dim0["dk"]).select(
        "k", "fk", "v", "a"
    )
    return (
        m0, fact1, dim1,
        fs.diff_versions(fv0, fv1), ds.diff_versions(dv0, dv1),
    )


def test_incremental_join_rollup_hand_case(spark):
    """The maintained SELECT a, count(*), sum(v) GROUP BY a over the
    join view must equal the full recompute after a change mix that
    exercises every leg — including a dim delete (fact rows leave the
    summary with NO fact-side change) and an fk move (retraction in
    one group, addition in another)."""
    from far_finer_airtable_firestore_sync_spark.operators.ivm import (
        incremental_join_rollup,
    )

    m0, fact1, dim1, fch, dch = _ivm_fixture(spark)
    s0 = m0.groupBy("a").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    view1, s1 = incremental_join_rollup(
        s0, m0, fact1, dim1, fch, dch,
        fact_key="k", dim_fk="fk", dim_key="dk",
        group_col="a", count_col="n", sum_map={"sv": "v"},
    )
    full_view = fact1.join(dim1, fact1["fk"] == dim1["dk"]).select(
        "k", "fk", "v", "a"
    )
    full_summary = full_view.groupBy("a").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    assert sorted(map(tuple, view1.collect())) == sorted(
        map(tuple, full_view.collect())
    )
    assert sorted(map(tuple, s1.collect())) == sorted(
        map(tuple, full_summary.collect())
    )
    # the dim-delete group ('w') must have VANISHED, not gone to zero
    assert ("w",) not in {(r["a"],) for r in s1.collect()}


def test_incremental_join_rollup_noop_changelogs(spark):
    """Empty changelogs must return the prior view and summary
    unchanged (the idempotence base case the persisted-view entry's
    checksum gate rides on)."""
    from far_finer_airtable_firestore_sync_spark.operators.ivm import (
        incremental_join_rollup,
    )

    m0, fact1, dim1, fch, dch = _ivm_fixture(spark)
    s0 = m0.groupBy("a").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    view1, s1 = incremental_join_rollup(
        s0, m0, fact1, dim1,
        fch.filter(F.lit(False)), dch.filter(F.lit(False)),
        fact_key="k", dim_fk="fk", dim_key="dk",
        group_col="a", count_col="n", sum_map={"sv": "v"},
    )
    assert sorted(map(tuple, view1.collect())) == sorted(
        map(tuple, m0.collect())
    )
    assert sorted(map(tuple, s1.collect())) == sorted(
        map(tuple, s0.collect())
    )


def test_affected_fact_keys_explicit_dim_key_column_order(spark):
    """r8 ADVICE: the dim changelog's key column is named explicitly,
    not inferred positionally. A changelog with the key NOT first must
    still maintain the right rows (the old columns[0] inference would
    silently pick 'change_type' here)."""
    from far_finer_airtable_firestore_sync_spark.operators.ivm import (
        incremental_join_refresh,
    )

    m0, fact1, dim1, fch, dch = _ivm_fixture(spark)
    dch_reordered = dch.select("change_type", "a", "dk")
    m1 = incremental_join_refresh(
        m0, fact1, dim1, fch, dch_reordered,
        fact_key="k", dim_fk="fk", dim_key="dk",
    )
    full = fact1.join(dim1, fact1["fk"] == dim1["dk"]).select(
        "k", "fk", "v", "a"
    )
    assert sorted(map(tuple, m1.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_join_ivm_no_forced_broadcast_hint(spark):
    """r8 VERDICT what's-wrong #3: the affected-key set must not be
    unconditionally broadcast (driver OOM on a backfill-sized CDC
    batch) — AQE picks the strategy at runtime. Pin: the analyzed
    plan carries no broadcast hint node."""
    from far_finer_airtable_firestore_sync_spark.operators.ivm import (
        incremental_join_refresh,
    )

    m0, fact1, dim1, fch, dch = _ivm_fixture(spark)
    m1 = incremental_join_refresh(
        m0, fact1, dim1, fch, dch,
        fact_key="k", dim_fk="fk", dim_key="dk",
    )
    analyzed = m1._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    assert "UnresolvedHint" not in analyzed


# ---------------------------------------------------------------------------
# Composed deletion-vector read path (r8 VERDICT #1 + ADVICE)
# ---------------------------------------------------------------------------


def _dv_store(spark, tmp_path, n=200, files=4):
    from far_finer_airtable_firestore_sync_spark.sources.store import (
        DocumentStore,
    )

    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 10).alias("grp"),
        (F.col("id") * 3).alias("val"),
    )
    store = DocumentStore(spark, str(tmp_path / "dvstore"), "doc_id")
    store.commit(df.repartition(files, F.col("doc_id")))
    return store, df


def test_delete_where_masks_every_read_path(spark, tmp_path):
    """Row identity across ALL store read paths after delete_where:
    read, read_version, read_where (zone), read_where_eq (bloom),
    get_document — one consistent view (reference analog:
    /root/reference/lib/FirestoreWrapper.py:72-100)."""
    store, df = _dv_store(spark, tmp_path)
    vd, n_deleted = store.delete_where("doc_id % 7 = 0")
    survivors = df.filter("doc_id % 7 != 0")
    n_expected = survivors.count()
    assert n_deleted == 200 - n_expected

    want = sorted(tuple(r) for r in survivors.collect())
    assert sorted(tuple(r) for r in store.read().collect()) == want
    assert sorted(tuple(r) for r in store.read_version(vd).collect()) == want
    rw = store.read_where("doc_id", 0, 199)
    assert sorted(tuple(r) for r in rw.collect()) == want
    # bloom point path: a deleted key must NOT resurrect
    assert store.read_where_eq("doc_id", [14]).count() == 0
    assert store.get_document(14) is None
    got = store.get_document(15)
    assert got is not None and got["val"] == 45
    # raw physical rows still reachable for forensics
    assert store.read_version(vd, apply_deletion_vectors=False).count() == 200


def test_delete_where_accumulates_and_preserves_history(spark, tmp_path):
    """Deletes ACCUMULATE across delete_where commits (r8 ADVICE low:
    overwrite-mode DVs dropped the prior mask); history stays
    append-only — time travel to each pre-delete version sees its own
    state."""
    store, df = _dv_store(spark, tmp_path)
    v1 = store.current_version_dir()
    v2, n2 = store.delete_where("doc_id % 7 = 0")
    v3, n3 = store.delete_where("doc_id % 5 = 0")
    assert n3 > n2  # total masked grew (union, not overwrite)
    want = df.filter("doc_id % 7 != 0 and doc_id % 5 != 0")
    assert sorted(map(tuple, store.read().collect())) == sorted(
        map(tuple, want.collect())
    )
    # pre-delete and mid-delete snapshots intact
    assert store.read_version(v1).count() == 200
    assert store.read_version(v2).count() == df.filter(
        "doc_id % 7 != 0"
    ).count()
    hist = {r["version_dir"]: r["n_rows"] for r in
            store.describe_history().collect()}
    import os
    assert hist[os.path.basename(v1)] == 200
    assert hist[os.path.basename(v3)] == want.count()


def test_delete_where_empty_predicate_is_noop(spark, tmp_path):
    """A predicate adding no new positions commits NOTHING (review
    finding: no-op maintenance deletes must not churn history or
    shift the vacuum window) and never corrupts the version (r8
    ADVICE low: an empty overwrite left an unreadable sidecar)."""
    store, df = _dv_store(spark, tmp_path)
    before = store.current_version_dir()
    vd, n = store.delete_where("doc_id < 0")
    assert n == 0 and vd == before
    assert len(store.list_versions()) == 1
    assert store.read().count() == 200
    # ... and an empty follow-up on a version that HAS a mask keeps it
    vd2, n2 = store.delete_where("doc_id % 7 = 0")
    vd3, n3 = store.delete_where("doc_id < 0")
    assert n3 == n2 and vd3 == vd2
    assert len(store.list_versions()) == 2
    assert store.read().count() == df.filter("doc_id % 7 != 0").count()


def test_dv_interrupted_swap_self_heals(spark, tmp_path):
    """A crash between the sidecar swap's two renames must never be
    served as 'no mask' — the masked read self-heals from the
    residue (review finding)."""
    import os

    store, df = _dv_store(spark, tmp_path)
    vd, _n = store.delete_where("doc_id % 7 = 0")
    live = os.path.join(vd, "_deletion_vectors")
    # simulate the crash window: live dir renamed away, tmp lost
    os.rename(live, live + ".old-deadbeef")
    assert store.read().count() == df.filter("doc_id % 7 != 0").count()
    assert os.path.isdir(live)  # recovered
    assert not os.path.isdir(live + ".old-deadbeef")


def test_legacy_absolute_dv_sidecar_rerooted_on_delete(spark, tmp_path):
    """An inherited r8-format sidecar (absolute file URIs naming the
    PREDECESSOR version) is re-rooted when delete_where links it into
    a new version — without legacy_dir re-rooting those entries match
    nothing and every old delete resurrects (review finding)."""
    import os

    from pyspark.sql import Row as R

    store, df = _dv_store(spark, tmp_path)
    v1 = store.current_version_dir()
    # hand-write a legacy-format sidecar: absolute URIs of v1's files
    masked = (
        spark.read.parquet(v1)
        .filter("doc_id % 7 = 0")
        .select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.row_index").alias("row_index"),
        )
    )
    rows = masked.collect()
    assert rows and all(r["file_path"].startswith("file:") for r in rows)
    spark.createDataFrame(rows).write.parquet(
        os.path.join(v1, "_deletion_vectors")
    )
    # in-place legacy mask applies (same-directory normalization)
    assert store.read().count() == df.filter("doc_id % 7 != 0").count()
    # a new delete inherits + re-roots it across the link-tree commit
    _v2, _n = store.delete_where("doc_id % 5 = 0")
    want = df.filter("doc_id % 7 != 0 and doc_id % 5 != 0")
    assert sorted(map(tuple, store.read().collect())) == sorted(
        map(tuple, want.collect())
    )


def test_change_feed_emits_dv_deletes(spark, tmp_path):
    """The change feed over a delete_where commit emits the masked
    rows as 'delete' rows — DV deletes are CDC events like any
    rewrite-delete (r8 VERDICT #1 'the feed emits DV deletes')."""
    store, df = _dv_store(spark, tmp_path)
    v1 = store.current_version_dir()
    v2, _n = store.delete_where("doc_id % 7 = 0")
    feed = store.change_feed(v1, v2)
    by_type = {
        r["change_type"]: r["n"]
        for r in feed.groupBy("change_type").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert by_type == {"delete": df.filter("doc_id % 7 = 0").count()}


def test_compact_materializes_deletion_vectors(spark, tmp_path):
    """Compaction after delete_where materializes the mask: the new
    version holds only survivors and carries NO sidecar — compaction
    can never bake deleted rows back in (the r8 VERDICT #1 failure
    mode)."""
    import os

    store, df = _dv_store(spark, tmp_path)
    store.delete_where("doc_id % 7 = 0")
    cdir = store.compact(target_rows_per_file=1_000_000)
    assert not os.path.isdir(os.path.join(cdir, "_deletion_vectors"))
    want = sorted(map(tuple, df.filter("doc_id % 7 != 0").collect()))
    assert sorted(map(tuple, store.read().collect())) == want
    # physical rows == live rows in the compacted version
    assert store.read_version(cdir, apply_deletion_vectors=False).count() \
        == len(want)


def test_shallow_clone_preserves_deletes(spark, tmp_path):
    """r8 ADVICE (medium): DV positions are version-relative, so a
    shallow clone's copied sidecar masks the clone's rows — deletes
    survive the clone instead of silently resurrecting."""
    from far_finer_airtable_firestore_sync_spark.sources.store import (
        shallow_clone,
    )

    store, df = _dv_store(spark, tmp_path)
    store.delete_where("doc_id % 7 = 0")
    clone = shallow_clone(spark, store, str(tmp_path / "dvclone"))
    want = sorted(map(tuple, df.filter("doc_id % 7 != 0").collect()))
    assert sorted(map(tuple, clone.read().collect())) == want


def test_dv_sidecar_paths_are_relative(spark, tmp_path):
    store, _df = _dv_store(spark, tmp_path)
    vd, _n = store.delete_where("doc_id % 7 = 0")
    import os

    dv = spark.read.parquet(os.path.join(vd, "_deletion_vectors"))
    paths = [r["file_path"] for r in dv.select("file_path").distinct().collect()]
    assert paths, "mask must not be empty"
    for p in paths:
        assert not p.startswith(("file:", "/")), p


def test_delete_where_on_partitioned_version(spark, tmp_path):
    """DV masking composes with hive partitioning: relative paths
    include the partition subdirs, and the partition columns survive
    the masked read."""
    from far_finer_airtable_firestore_sync_spark.sources.store import (
        DocumentStore,
    )

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).alias("part"),
        (F.col("id") * 2).alias("val"),
    )
    store = DocumentStore(spark, str(tmp_path / "dvpart"), "doc_id")
    store.commit(df, partition_by=["part"])
    store.delete_where("doc_id % 4 = 0")
    want = sorted(
        (r["doc_id"], r["part"], r["val"])
        for r in df.filter("doc_id % 4 != 0").collect()
    )
    got = sorted(
        (r["doc_id"], r["part"], r["val"])
        for r in store.read().select("doc_id", "part", "val").collect()
    )
    assert got == want


def test_delete_where_concurrency_guard(spark, tmp_path):
    from far_finer_airtable_firestore_sync_spark.sources.store import (
        ConcurrentCommitError,
    )

    store, df = _dv_store(spark, tmp_path)
    stale = store.current_version_dir()
    store.commit(df.filter("doc_id < 50"))
    with pytest.raises(ConcurrentCommitError):
        store.delete_where("doc_id % 7 = 0", expected_version=stale)


def test_update_where_masks_old_and_appends_new(spark, tmp_path):
    """Row-level UPDATE via DV + append: matching rows carry the new
    image, everything else is untouched; an update that does not
    change its own predicate columns must not mask its appended
    images (the mask-before-append ordering)."""
    store, df = _dv_store(spark, tmp_path)
    vd, n = store.update_where("grp = 3", {"val": "val + 1000000"})
    want_n = df.filter("grp = 3").count()
    assert n == want_n
    want = df.withColumn(
        "val",
        F.expr("case when grp = 3 then val + 1000000 else val end"),
    )
    assert sorted(map(tuple, store.read().collect())) == sorted(
        map(tuple, want.collect())
    )
    # physical layout: linked originals + a small appended file,
    # masked positions cover exactly the old images
    import os

    assert os.path.isdir(os.path.join(vd, "_deletion_vectors"))


def test_update_where_cdc_reports_updates(spark, tmp_path):
    """diff/change_feed see a DV+append update as an UPDATE row with
    the post-image — no special casing."""
    store, df = _dv_store(spark, tmp_path)
    v1 = store.current_version_dir()
    v2, n = store.update_where("grp = 7", {"val": "val * 2"})
    feed = store.change_feed(v1, v2)
    by_type = {
        r["change_type"]: r["n"]
        for r in feed.groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by_type == {"update": n}
    post = {r["doc_id"]: r["val"] for r in feed.collect()}
    for r in df.filter("grp = 7").collect():
        assert post[r["doc_id"]] == r["val"] * 2


def test_update_where_composes_with_delete_and_compact(spark, tmp_path):
    """delete -> update -> compact: deleted rows never resurrect as
    updates, and compaction materializes both DMLs."""
    import os

    store, df = _dv_store(spark, tmp_path)
    store.delete_where("doc_id % 7 = 0")
    store.update_where("grp = 2", {"val": "val + 5"})
    want = (
        df.filter("doc_id % 7 != 0")
        .withColumn(
            "val", F.expr("case when grp = 2 then val + 5 else val end")
        )
    )
    got = store.read()
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    cdir = store.compact()
    assert not os.path.isdir(os.path.join(cdir, "_deletion_vectors"))
    assert sorted(map(tuple, store.read().collect())) == sorted(
        map(tuple, want.collect())
    )


def test_update_where_empty_match_is_noop(spark, tmp_path):
    store, _df = _dv_store(spark, tmp_path)
    before = store.current_version_dir()
    vd, n = store.update_where("doc_id < 0", {"val": "val + 1"})
    assert n == 0 and vd == before
    assert len(store.list_versions()) == 1


def test_update_where_invalidates_stale_skip_manifests(spark, tmp_path):
    """The linked zone manifest does not cover appended files — it
    must be dropped so read_where cannot lossily prune the updated
    images."""
    store, df = _dv_store(spark, tmp_path)
    # build the zone manifest on the pre-update version, then update
    store.read_where("doc_id", 0, 10).count()
    vd, _n = store.update_where("doc_id = 4", {"val": "val + 777"})
    got = store.read_where("doc_id", 0, 10)
    want = df.filter("doc_id between 0 and 10").withColumn(
        "val", F.expr("case when doc_id = 4 then val + 777 else val end")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_update_where_partitioned_version(spark, tmp_path):
    """Partition-aware append: a hive-partitioned version stays
    readable after update_where, including a partition-value-moving
    update."""
    from far_finer_airtable_firestore_sync_spark.sources.store import (
        DocumentStore,
    )

    df = spark.range(60).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).alias("part"),
        (F.col("id") * 2).alias("val"),
    )
    store = DocumentStore(spark, str(tmp_path / "updpart"), "doc_id")
    store.commit(df, partition_by=["part"])
    # move doc 9 to another partition AND bump its value
    store.update_where(
        "doc_id = 9", {"part": "cast(0 as bigint)", "val": "val + 1"}
    )
    want = {
        (r["doc_id"], 0 if r["doc_id"] == 9 else r["part"],
         r["val"] + (1 if r["doc_id"] == 9 else 0))
        for r in df.collect()
    }
    got = {
        (r["doc_id"], r["part"], r["val"])
        for r in store.read().select("doc_id", "part", "val").collect()
    }
    assert got == want


def test_incremental_snowflake_refresh_hand_case(spark):
    """orders -> customer -> nation chain: a NATION change must reach
    fact rows THROUGH customer (rename ripples into the view; a
    nation delete removes every downstream fact row with no
    fact/customer-side change), alongside the usual fact and
    customer legs."""
    from far_finer_airtable_firestore_sync_spark.operators.ivm import (
        incremental_snowflake_refresh,
    )
    from far_finer_airtable_firestore_sync_spark.sources.store import (
        DocumentStore,
    )

    f0 = spark.createDataFrame(
        [
            Row(k=1, cfk=10, v=1),   # payload update
            Row(k=2, cfk=10, v=2),   # deleted
            Row(k=3, cfk=20, v=3),   # cfk moves 20->30
            Row(k=4, cfk=40, v=4),   # customer 40 deleted
            Row(k=5, cfk=50, v=5),   # customer 50 renamed nation-fk
            Row(k=6, cfk=60, v=6),   # nation of customer 60 RENAMED
            Row(k=7, cfk=70, v=7),   # nation of customer 70 DELETED
            Row(k=8, cfk=10, v=8),   # fully untouched
        ]
    )
    f1 = spark.createDataFrame(
        [
            Row(k=1, cfk=10, v=11),
            Row(k=3, cfk=30, v=3),
            Row(k=4, cfk=40, v=4),
            Row(k=5, cfk=50, v=5),
            Row(k=6, cfk=60, v=6),
            Row(k=7, cfk=70, v=7),
            Row(k=8, cfk=10, v=8),
            Row(k=9, cfk=20, v=9),  # insert
        ]
    )
    c0 = spark.createDataFrame(
        [Row(ck=10, nfk=100), Row(ck=20, nfk=100), Row(ck=30, nfk=100),
         Row(ck=40, nfk=100), Row(ck=50, nfk=100), Row(ck=60, nfk=200),
         Row(ck=70, nfk=300)]
    )
    c1 = spark.createDataFrame(
        [Row(ck=10, nfk=100), Row(ck=20, nfk=100), Row(ck=30, nfk=100),
         Row(ck=50, nfk=200),  # 40 deleted; 50 moves nation 100->200
         Row(ck=60, nfk=200), Row(ck=70, nfk=300)]
    )
    n0 = spark.createDataFrame(
        [Row(nk=100, nn="alpha"), Row(nk=200, nn="beta"),
         Row(nk=300, nn="gamma")]
    )
    n1 = spark.createDataFrame(
        [Row(nk=100, nn="alpha"), Row(nk=200, nn="BETA")]
        # 300 deleted: k=7 leaves through the CHAIN; 200 renamed:
        # k=6 (and now k=5) rewrite through the chain
    )
    fs = DocumentStore(spark, tempfile.mkdtemp(prefix="snow_f_"), "k")
    cs = DocumentStore(spark, tempfile.mkdtemp(prefix="snow_c_"), "ck")
    ns = DocumentStore(spark, tempfile.mkdtemp(prefix="snow_n_"), "nk")
    fv0, fv1 = fs.commit(f0), fs.commit(f1)
    cv0, cv1 = cs.commit(c0), cs.commit(c1)
    nv0, nv1 = ns.commit(n0), ns.commit(n1)
    fact0, fact1 = fs.read_version(fv0), fs.read_version(fv1)
    dc0, dc1 = cs.read_version(cv0), cs.read_version(cv1)
    dn0, dn1 = ns.read_version(nv0), ns.read_version(nv1)
    cols = ["k", "cfk", "v", "nfk", "nn"]

    def snow(f, dc, dn):
        return (
            f.join(dc, f["cfk"] == dc["ck"])
            .join(dn, dc["nfk"] == dn["nk"])
            .select(*cols)
        )

    m0 = snow(fact0, dc0, dn0)
    m1 = incremental_snowflake_refresh(
        m0,
        fact1,
        chain=[
            (dc1, cs.diff_versions(cv0, cv1), "cfk", "ck"),
            (dn1, ns.diff_versions(nv0, nv1), "nfk", "nk"),
        ],
        fact_changes=fs.diff_versions(fv0, fv1),
        fact_key="k",
    )
    got = sorted(map(tuple, m1.collect()))
    want = sorted(map(tuple, snow(fact1, dc1, dn1).collect()))
    assert got == want
    rows = {r[0]: r for r in got}
    assert 7 not in rows           # left through the deleted nation
    assert rows[6][4] == "BETA"    # nation rename rippled via chain
    assert rows[5][4] == "BETA"    # customer's nation move rippled


def test_optimize_zorder_store_api(spark, tmp_path):
    """OPTIMIZE ZORDER BY as a store API: after a delete_where, the
    re-cluster materializes the mask (no sidecar, survivors only) and
    the new layout's zone manifest prunes on BOTH clustered
    dimensions; read_where rides it and returns exactly the
    survivors."""
    import os

    from far_finer_airtable_firestore_sync_spark.sources.store import (
        DocumentStore,
        prune_files_by_zone,
    )

    n = 4096
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        # hash-scatter both dims so the PRE-cluster layout has no
        # locality: every file spans the whole (x, y) domain
        (F.col("id") * 2654435761 % 1000).alias("x"),
        (F.col("id") * 40503 % 365).alias("y"),
        (F.col("id") * 7).alias("val"),
    )
    store = DocumentStore(spark, str(tmp_path / "zstore"), "doc_id")
    store.commit(df.repartition(8, F.col("doc_id")))
    store.delete_where("doc_id % 5 = 0")
    vd = store.optimize_zorder("x", "y", n_files=8)
    assert not os.path.isdir(os.path.join(vd, "_deletion_vectors"))
    survivors = df.filter("doc_id % 5 != 0")
    assert sorted(map(tuple, store.read().collect())) == sorted(
        map(tuple, survivors.collect())
    )
    keep_x, total = prune_files_by_zone(vd, "x", 0, 99)
    keep_y, _ = prune_files_by_zone(vd, "y", 0, 39)
    assert 0 < len(keep_x) < total, (len(keep_x), total)
    assert 0 < len(keep_y) < total, (len(keep_y), total)
    got = store.read_where("x", 0, 99)
    want = survivors.filter("x between 0 and 99")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


# ---------------------------------------------------------------------------
# Vacuum x time-travel x checkpoint lifecycle (r8 VERDICT #5)
# ---------------------------------------------------------------------------


def test_vacuum_time_travel_lifecycle(spark, tmp_path):
    """The composed retention lifecycle: vacuum past versions, travel
    inside the window still works, travel outside fails LOUDLY (or
    returns None for as-of-before-history), the change feed over a
    partially-vacuumed range refuses rather than lying."""
    from far_finer_airtable_firestore_sync_spark.sources.store import (
        DocumentStore,
        version_commit_ms,
    )

    df = spark.range(60).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("val")
    )
    store = DocumentStore(spark, str(tmp_path / "vtstore"), "doc_id")
    v1 = store.commit(df.filter("doc_id % 2 = 0"))
    v2 = store.commit(df.filter("doc_id % 3 = 0"))
    v3 = store.commit(df.filter("doc_id % 4 = 0"))
    v4 = store.commit(df.filter("doc_id % 5 = 0"))
    removed = store.vacuum(keep_last=2)
    assert sorted(removed) == sorted([v1, v2])
    # inside the window: exact as-of still served
    asof = store.read_as_of(version_commit_ms(v3))
    assert asof.count() == df.filter("doc_id % 4 = 0").count()
    # before the window: as-of has NO candidate — None, never wrong data
    assert store.read_as_of(version_commit_ms(v1)) is None
    # direct read of a vacuumed version fails loudly
    with pytest.raises(Exception):
        store.read_version(v1).count()
    # change feed over a partially-vacuumed range: loud refusal
    with pytest.raises(ValueError):
        store.change_feed(v1, v4)
    # the surviving range still feeds
    assert store.change_feed(v3, v4).count() > 0
    # history shows exactly the surviving versions, current flagged
    hist = store.describe_history().collect()
    assert len(hist) == 2
    assert {r["version_dir"] for r in hist} == {
        v.rsplit("/", 1)[-1] for v in (v3, v4)
    }


def test_backend_checkpoint_survives_orphan_vacuum(spark, tmp_path):
    """TransactionalParquetBackend: after enough commits to roll the
    `_last_checkpoint` hint, vacuum_orphans removes ONLY unreferenced
    data dirs; the checkpointed log still resolves latest(), reads
    serve the newest snapshot, and a fresh backend instance (cold
    probe from the hint) agrees."""
    import os

    from far_finer_airtable_firestore_sync_spark.sources.backends import (
        TransactionalParquetBackend,
    )

    root = str(tmp_path / "txn")
    be = TransactionalParquetBackend(spark, root, "doc_id")
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    for i in range(12):  # crosses the CHECKPOINT_INTERVAL=10 boundary
        be.commit(df.withColumn("v", F.lit(i)))
    assert be._checkpoint_version() == 10
    # a crashed writer's orphan: data written, record never linked
    orphan = os.path.join(root, "v-orphan-deadbeef")
    os.makedirs(orphan)
    os.utime(orphan, (0, 0))
    removed = be.vacuum_orphans(min_age_s=1.0)
    assert removed == [orphan]
    v, rec = be.latest()
    assert v == 12 and rec is not None
    assert be.read().agg(F.max("v")).first()[0] == 11
    # cold instance probes forward from the checkpoint hint
    be2 = TransactionalParquetBackend(spark, root, "doc_id")
    assert be2.latest()[0] == 12
    # checkpoint hint still valid after GC; one more commit rolls on
    be2.commit(df.withColumn("v", F.lit(99)))
    assert be2.latest()[0] == 13


def test_backend_delete_where_basic_and_noop(spark, tmp_path):
    """DV deletes on the lock-free log: masked reads through the
    backend, commit_with re-derives from the MASKED view, and a
    no-new-positions delete publishes nothing."""
    from far_finer_airtable_firestore_sync_spark.sources.backends import (
        TransactionalParquetBackend,
    )

    be = TransactionalParquetBackend(spark, str(tmp_path / "txnd"), "doc_id")
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("val")
    )
    be.commit(df)
    handle, n = be.delete_where("doc_id % 4 = 0")
    assert handle == "txn://2" and n == 25
    assert be.read().count() == 75
    # no-op: nothing published, version unchanged
    handle2, n2 = be.delete_where("doc_id % 4 = 0")
    assert handle2 == "txn://2" and n2 == 25
    assert be.latest()[0] == 2
    # a later derived commit starts from the masked view
    be.commit_with(lambda cur: cur.filter("doc_id % 3 != 0"))
    assert be.read().count() == df.filter(
        "doc_id % 4 != 0 and doc_id % 3 != 0"
    ).count()


def test_backend_delete_where_rederives_after_rival(spark, tmp_path):
    """The CAS loop: a rival owning the next version invalidates the
    positional mask, so delete_where must discard and RE-DERIVE from
    the winner — the delete lands on the rival's snapshot with no
    lost update."""
    import json
    import os

    from far_finer_airtable_firestore_sync_spark.sources.backends import (
        TransactionalParquetBackend,
    )

    root = str(tmp_path / "txnr")
    be = TransactionalParquetBackend(spark, root, "doc_id")
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("val")
    )
    be.commit(df)
    # plant a rival's version 2: a different snapshot (rows 0..49
    # only), fully published by hand via the record path
    rival_rel = "v-rival00000000000000000000000000000"
    df.filter("doc_id < 50").write.parquet(os.path.join(root, rival_rel))
    with open(os.path.join(root, "_log", "_tmp-rival.json"), "w") as fh:
        json.dump(
            {"version_dir": rival_rel, "writer": "rival", "ts_ms": 0,
             "txns": {}},
            fh,
        )
    os.link(
        os.path.join(root, "_log", "_tmp-rival.json"),
        be._record_path(2),
    )
    os.unlink(os.path.join(root, "_log", "_tmp-rival.json"))

    # monkeypatch latest() to report version 1 on the FIRST call (the
    # stale base the deleter derived from), then behave normally —
    # deterministic interleave of "rival wins between read and link"
    real_latest = be.latest
    calls = {"n": 0}

    def stale_once():
        calls["n"] += 1
        if calls["n"] == 1:
            with open(be._record_path(1)) as fh:
                return 1, json.load(fh)
        return real_latest()

    be.latest = stale_once
    handle, n = be.delete_where("doc_id % 4 = 0")
    be.latest = real_latest
    # delete landed on the RIVAL's 50-row snapshot, not the stale base
    assert handle == "txn://3"
    assert n == df.filter("doc_id < 50 and doc_id % 4 = 0").count()
    assert be.read().count() == df.filter(
        "doc_id < 50 and doc_id % 4 != 0"
    ).count()


def test_backend_update_where_basic_and_rival(spark, tmp_path):
    """Cross-host UPDATE: masked+appended images publish via CAS; a
    rival winning the version forces a re-derive so the update lands
    on the winner's snapshot (no lost update)."""
    import json
    import os

    from far_finer_airtable_firestore_sync_spark.sources.backends import (
        TransactionalParquetBackend,
    )

    root = str(tmp_path / "txnu")
    be = TransactionalParquetBackend(spark, root, "doc_id")
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("val")
    )
    be.commit(df)
    handle, n = be.update_where("doc_id % 10 = 0", {"val": "val + 7"})
    assert handle == "txn://2" and n == 10
    want = df.withColumn(
        "val", F.expr("case when doc_id % 10 = 0 then val + 7 else val end")
    )
    assert sorted(map(tuple, be.read().collect())) == sorted(
        map(tuple, want.collect())
    )
    # empty match publishes nothing
    h2, n2 = be.update_where("doc_id < 0", {"val": "val + 1"})
    assert h2 == "txn://2" and n2 == 0 and be.latest()[0] == 2

    # rival race: plant version 3 by hand, serve a stale latest() once
    rival_rel = "v-rivalupd0000000000000000000000000"
    df.filter("doc_id < 40").write.parquet(os.path.join(root, rival_rel))
    with open(os.path.join(root, "_log", "_tmp-r.json"), "w") as fh:
        json.dump({"version_dir": rival_rel, "writer": "rival",
                   "ts_ms": 0, "txns": {}}, fh)
    os.link(os.path.join(root, "_log", "_tmp-r.json"), be._record_path(3))
    os.unlink(os.path.join(root, "_log", "_tmp-r.json"))
    real_latest = be.latest
    calls = {"n": 0}

    def stale_once():
        calls["n"] += 1
        if calls["n"] == 1:
            with open(be._record_path(2)) as fh:
                return 2, json.load(fh)
        return real_latest()

    be.latest = stale_once
    handle3, n3 = be.update_where("doc_id % 10 = 0", {"val": "val + 100"})
    be.latest = real_latest
    assert handle3 == "txn://4"
    assert n3 == 4  # rival snapshot has doc_id < 40: 0,10,20,30
    got = {r["doc_id"]: r["val"] for r in be.read().collect()}
    assert len(got) == 40
    assert got[10] == 30 + 100 and got[11] == 33


def test_expectation_rule_name_quote_escaped(spark):
    """r8 ADVICE: a rule name containing a quote must render valid
    SQL in both engines (names are inert labels)."""
    from far_finer_airtable_firestore_sync_spark.operators.expectations import (
        split_expectations,
        violation_sql,
    )

    df = spark.range(10).select(F.col("id").alias("v"))
    rules = [("can't be negative", "v >= 0"), ("it's small", "v < 5")]
    valid, quarantined = split_expectations(df, rules)
    assert valid.count() == 5
    names = {r["_violation"] for r in quarantined.collect()}
    assert names == {"it's small"}
    import duckdb

    con = duckdb.connect()
    got = con.execute(
        f"select {violation_sql(rules)} from (select 7 as v)"
    ).fetchone()[0]
    assert got == "it's small"


def test_incremental_star_refresh_hand_case(spark):
    """Two-dimension star IVM, every leg: fact insert/delete/payload
    update, an fk MOVE on each dimension, a dim delete (fact rows
    leave via EITHER dim with no fact-side change), and a dim attr
    update on each dimension."""
    from far_finer_airtable_firestore_sync_spark.operators.ivm import (
        incremental_star_refresh,
    )
    from far_finer_airtable_firestore_sync_spark.sources.store import (
        DocumentStore,
    )

    f0 = spark.createDataFrame(
        [
            Row(k=1, a_fk=10, b_fk=100, v=1),   # payload update
            Row(k=2, a_fk=10, b_fk=100, v=2),   # deleted
            Row(k=3, a_fk=20, b_fk=100, v=3),   # a_fk moves 20->30
            Row(k=4, a_fk=10, b_fk=200, v=4),   # b_fk moves 200->300
            Row(k=5, a_fk=40, b_fk=100, v=5),   # dim-a row 40 deleted
            Row(k=6, a_fk=10, b_fk=400, v=6),   # dim-b row 400 deleted
            Row(k=7, a_fk=50, b_fk=100, v=7),   # dim-a attr update (50)
            Row(k=8, a_fk=10, b_fk=500, v=8),   # dim-b attr update (500)
            Row(k=9, a_fk=10, b_fk=100, v=9),   # fully untouched
        ]
    )
    f1 = spark.createDataFrame(
        [
            Row(k=1, a_fk=10, b_fk=100, v=11),
            Row(k=3, a_fk=30, b_fk=100, v=3),
            Row(k=4, a_fk=10, b_fk=300, v=4),
            Row(k=5, a_fk=40, b_fk=100, v=5),
            Row(k=6, a_fk=10, b_fk=400, v=6),
            Row(k=7, a_fk=50, b_fk=100, v=7),
            Row(k=8, a_fk=10, b_fk=500, v=8),
            Row(k=9, a_fk=10, b_fk=100, v=9),
            Row(k=10, a_fk=20, b_fk=200, v=10),  # insert
        ]
    )
    a0 = spark.createDataFrame(
        [Row(ak=10, an="x"), Row(ak=20, an="y"), Row(ak=30, an="z"),
         Row(ak=40, an="w"), Row(ak=50, an="v")]
    )
    a1 = spark.createDataFrame(
        [Row(ak=10, an="x"), Row(ak=20, an="y"), Row(ak=30, an="z"),
         Row(ak=50, an="V")]  # 40 deleted, 50 updated
    )
    b0 = spark.createDataFrame(
        [Row(bk=100, bn="p"), Row(bk=200, bn="q"), Row(bk=300, bn="r"),
         Row(bk=400, bn="s"), Row(bk=500, bn="t")]
    )
    b1 = spark.createDataFrame(
        [Row(bk=100, bn="p"), Row(bk=200, bn="q"), Row(bk=300, bn="r"),
         Row(bk=500, bn="T")]  # 400 deleted, 500 updated
    )
    fs = DocumentStore(spark, tempfile.mkdtemp(prefix="star_f_"), "k")
    as_ = DocumentStore(spark, tempfile.mkdtemp(prefix="star_a_"), "ak")
    bs = DocumentStore(spark, tempfile.mkdtemp(prefix="star_b_"), "bk")
    fv0, fv1 = fs.commit(f0), fs.commit(f1)
    av0, av1 = as_.commit(a0), as_.commit(a1)
    bv0, bv1 = bs.commit(b0), bs.commit(b1)
    fact1 = fs.read_version(fv1)
    da1, db1 = as_.read_version(av1), bs.read_version(bv1)
    fact0 = fs.read_version(fv0)
    da0, db0 = as_.read_version(av0), bs.read_version(bv0)
    cols = ["k", "a_fk", "b_fk", "v", "an", "bn"]

    def star(f, da, db):
        return (
            f.join(da, f["a_fk"] == da["ak"])
            .join(db, f["b_fk"] == db["bk"])
            .select(*cols)
        )

    m0 = star(fact0, da0, db0)
    m1 = incremental_star_refresh(
        m0,
        fact1,
        dims=[
            (da1, as_.diff_versions(av0, av1), "a_fk", "ak"),
            (db1, bs.diff_versions(bv0, bv1), "b_fk", "bk"),
        ],
        fact_changes=fs.diff_versions(fv0, fv1),
        fact_key="k",
    )
    got = sorted(map(tuple, m1.collect()))
    want = sorted(map(tuple, star(fact1, da1, db1).collect()))
    assert got == want
    keys = {r[0] for r in got}
    # k=2 deleted; k=5 left with dim-a 40; k=6 left with dim-b 400
    assert keys == {1, 3, 4, 7, 8, 9, 10}


def test_view_fingerprint_order_independent_and_sensitive(spark):
    from far_finer_airtable_firestore_sync_spark.operators.ivm import (
        view_fingerprint,
    )

    a = spark.createDataFrame([Row(k=1, v="x"), Row(k=2, v="y")])
    b = spark.createDataFrame([Row(k=2, v="y"), Row(k=1, v="x")])
    c = spark.createDataFrame([Row(k=1, v="x"), Row(k=2, v="z")])
    expr = "cast(k as string) || '|' || coalesce(v, '<null>')"
    assert view_fingerprint(a, expr) == view_fingerprint(b, expr)
    assert view_fingerprint(a, expr) != view_fingerprint(c, expr)
    # NULL renderings still contribute (coalesce sentinel inside)
    d = spark.createDataFrame([Row(k=1, v=None), Row(k=2, v="y")])
    assert view_fingerprint(a, expr) != view_fingerprint(d, expr)
