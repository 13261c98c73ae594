"""Round-5 ADVICE regressions: hive-partitioned compaction sizing,
interleaved UDTF invocations with distinct params, bench estimator
disclosure, and the under-lock commit version re-check."""

import json
import os
import subprocess
import sys


def test_compact_small_files_hive_partitioned_source(spark, tmp_path):
    """A partitioned source keeps its parquet under subdirectories; the
    sizing walk must see those bytes (ADVICE r4: non-recursive listdir
    reported bytes_before=0 and silently coalesced to one file)."""
    from far_finer_airtable_firestore_sync_spark.operators import layout

    src = str(tmp_path / "partitioned")
    dst = str(tmp_path / "compacted")
    df = spark.range(0, 20000).selectExpr("id", "id % 4 as part", "id % 97 as v")
    df.repartition(16).write.partitionBy("part").parquet(src)
    # no top-level parquet at all — everything lives under part=*/
    assert not [f for f in os.listdir(src) if f.endswith(".parquet")]

    stats = layout.compact_small_files(spark, src, dst, target_bytes=10**9).collect()[0]
    assert stats["bytes_before"] > 0
    assert stats["files_before"] >= 16
    assert stats["n_rows"] == 20000
    a = sorted(tuple(r) for r in spark.read.parquet(src).select("id", "v").collect())
    b = sorted(tuple(r) for r in spark.read.parquet(dst).select("id", "v").collect())
    assert a == b


def test_chunk_text_udtf_interleaved_invocations(spark):
    """Two lazily-evaluated invocations with different chunk params in
    one session must not clobber each other's registered UDTF/view
    (ADVICE r4: fixed session-global names)."""
    from far_finer_airtable_firestore_sync_spark.operators.text_analysis import (
        chunk_text_udtf,
    )

    df = spark.createDataFrame(
        [(1, "a" * 10), (2, "b" * 25)], "doc_id long, text string"
    )
    wide = chunk_text_udtf(df, chunk_chars=20, stride=15)   # plan built, not run
    narrow = chunk_text_udtf(df, chunk_chars=5, stride=5)   # would clobber before fix
    # evaluate the FIRST plan last — with shared names it would have
    # picked up the second registration's params
    n_narrow = {r["doc_id"]: r["n_chunks"] for r in narrow.collect()}
    n_wide = {r["doc_id"]: r["n_chunks"] for r in wide.collect()}
    assert n_wide == {1: 1, 2: 2}   # 25 chars / (20,15) -> 2 windows
    assert n_narrow == {1: 2, 2: 5}  # 10/5 -> 2, 25/5 -> 5


def test_bench_estimator_field():
    """BENCH payloads must disclose which statistic produced the
    numbers so budget-degraded runs are distinguishable (ADVICE r4)."""
    src = open(os.path.join(os.path.dirname(__file__), "..", "bench.py")).read()
    assert '"estimator"' in src and '"median"' in src and '"min"' in src


def test_commit_version_recheck_is_under_lock():
    """The post-write expected_version re-check must run inside the
    flock'd section — outside it, a concurrent pointer flip between
    the check and os.replace is silently clobbered (ADVICE r4)."""
    import inspect

    from far_finer_airtable_firestore_sync_spark.sources.store import DocumentStore

    # r9: the flip (lock + re-check + replace) is factored into
    # _flip_pointer, shared by commit and delete_where — the ordering
    # invariant moves with it, and BOTH commit paths must ride it.
    src = inspect.getsource(DocumentStore._flip_pointer)
    lock_at = src.index("fcntl.flock")
    recheck_at = src.index("pointer moved past", lock_at)
    replace_at = src.index("os.replace", recheck_at)
    assert lock_at < recheck_at < replace_at
    assert "_flip_pointer" in inspect.getsource(DocumentStore.commit)
    assert "_flip_pointer" in inspect.getsource(DocumentStore.delete_where)


def test_commit_expected_version_conflict_raises_and_cleans(spark, tmp_path):
    """Behavioral leg: a commit whose expected_version is stale must
    raise and leave no orphan version directory behind."""
    import pytest

    from far_finer_airtable_firestore_sync_spark.sources.store import (
        ConcurrentCommitError,
        DocumentStore,
    )

    store = DocumentStore(spark, str(tmp_path / "store"))
    df = spark.createDataFrame([(1, "a")], "pk long, v string")
    v1 = store.commit(df)
    store.commit(df.selectExpr("pk", "'b' as v"))  # concurrent writer moves pointer
    before = set(store.list_versions())
    with pytest.raises(ConcurrentCommitError):
        store.commit(df.selectExpr("pk", "'c' as v"), expected_version=v1)
    assert set(store.list_versions()) == before  # orphan dir removed


def test_ccnet_buckets_reuses_scored_frame(spark):
    """A composed pipeline passes the materialized scored frame; the
    bucketing must reuse it (cached scan, no re-scoring) and agree
    with the self-scoring path."""
    from far_finer_airtable_firestore_sync_spark.operators import (
        text_analysis as ta,
    )

    docs = spark.createDataFrame(
        [(i, ("the merge window " * (1 + i % 3)).strip(), f"s{i % 2}")
         for i in range(12)],
        "doc_id long, text string, source string",
    )
    scored = ta.lm_bigram_score(
        docs, passthrough_cols=["source"]
    ).cache()
    try:
        direct = ta.ccnet_buckets(docs).collect()
        reused_df = ta.ccnet_buckets(scored=scored)
        reused = reused_df.collect()
        assert sorted(map(tuple, direct)) == sorted(map(tuple, reused))
        # the reused plan reads the cache, it does not re-score
        plan = reused_df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
        assert "Generate" not in plan  # no explode = no bigram rescore
    finally:
        scored.unpersist()


def test_ccnet_buckets_requires_input():
    from far_finer_airtable_firestore_sync_spark.operators import (
        text_analysis as ta,
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ta.ccnet_buckets()
