"""Round-4 ADVICE regressions:

1. store pointer txn map — a replay marker must survive interleaved
   commits by other writers (ADVICE r3: single tag slot erased the
   marker, letting an APPEND epoch double-apply).
2. streaming near-dedup replay — a truncated part file left by a crash
   mid-registry-write of the CURRENT epoch must not wedge the replay
   (ADVICE r3: spark.read.parquet(registry_dir) read its footer before
   the epoch filter could prune it).
3. DSIR bucket weights — the ln() ratio factors must be cast to double
   BEFORE multiplying (ADVICE r3: bigint product wraps at ~1e13-token
   corpus scale in non-ANSI Spark).
"""

import glob
import os
import shutil
import time

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from far_finer_airtable_firestore_sync_spark.sources.store import DocumentStore
from far_finer_airtable_firestore_sync_spark.streaming import sync as streaming


def test_txn_map_survives_interleaved_commits(spark, tmp_path):
    store = DocumentStore(spark, str(tmp_path / "store"))
    df = spark.createDataFrame([Row(doc_id=1, v="a")])

    store.commit(df, txn=("stream_a", "5"))
    assert store.last_txn("stream_a") == "5"

    # An untagged commit by another writer must NOT erase the marker.
    store.commit(spark.createDataFrame([Row(doc_id=2, v="b")]))
    assert store.last_txn("stream_a") == "5"

    # A different stream's txn coexists rather than overwriting.
    store.commit(spark.createDataFrame([Row(doc_id=3, v="c")]),
                 txn=("stream_b", "9"))
    assert store.last_txn("stream_a") == "5"
    assert store.last_txn("stream_b") == "9"
    assert store.last_txn("unknown") is None


def test_continuous_sync_replay_skip_survives_interleaving(spark, tmp_path):
    """The exact ADVICE scenario: after the APPEND stream's epoch-0
    commit, ANOTHER writer commits to the same store; a fresh
    checkpoint then replays epoch 0 — it must still be skipped."""
    from far_finer_airtable_firestore_sync_spark.config import (
        Field,
        SyncSpec,
        UpdateType,
    )

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    rows = [Row(event_id=i, ts=10**18 + i, user_id=i, event_type="a",
                value=1.0, props="{}") for i in range(10)]
    tmp = tmp_path / "_stage"
    spark.createDataFrame(rows).coalesce(1).write.parquet(str(tmp))
    shutil.copy(glob.glob(str(tmp / "part-*.parquet"))[0],
                src_dir / "f.parquet")

    spec = SyncSpec(
        primary_key="pk",
        update_type=UpdateType.APPEND,
        payload_fields=(
            Field("pk", "long"),
            Field("event_type", "string"),
            Field("value", "double"),
        ),
    )
    store = DocumentStore(spark, str(tmp_path / "store"))

    def run(ck: str) -> None:
        events = streaming.read_event_stream(spark, str(src_dir))
        batch = events.select(
            F.col("event_id").alias("pk"), F.col("event_type"),
            F.col("value"),
        )
        q = streaming.continuous_sync(batch, spec, store,
                                      str(tmp_path / ck))
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run("ck0")
    assert store.read().count() == 10

    # Interleaved commit by a different writer (untagged batch write) —
    # with the old single tag slot this erased the replay marker.
    snapshot = store.read().localCheckpoint()
    store.commit(snapshot)

    run("ck1")  # fresh checkpoint replays the same file as epoch 0
    assert store.read().count() == 10  # not 20: replay still skipped


def test_continuous_sync_fresh_checkpoint_multi_epoch_replay(spark, tmp_path):
    """A fresh checkpoint replays the WHOLE history from epoch 0; every
    epoch at or below the recorded txn version must be skipped (an
    equality-only check would skip just the latest and double-apply
    the earlier epochs)."""
    import time

    from far_finer_airtable_firestore_sync_spark.config import (
        Field,
        SyncSpec,
        UpdateType,
    )

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    tmp = tmp_path / "_stage"
    for j in range(2):
        rows = [Row(event_id=100 * j + i, ts=10**18 + i, user_id=i,
                    event_type="a", value=1.0, props="{}")
                for i in range(10)]
        spark.createDataFrame(rows).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp))
        dst = src_dir / f"{j}.parquet"
        shutil.copy(glob.glob(str(tmp / "part-*.parquet"))[0], dst)
        mt = time.time() + j
        os.utime(dst, (mt, mt))

    spec = SyncSpec(
        primary_key="pk",
        update_type=UpdateType.APPEND,
        payload_fields=(
            Field("pk", "long"),
            Field("event_type", "string"),
            Field("value", "double"),
        ),
    )
    store = DocumentStore(spark, str(tmp_path / "store"))

    def run(ck: str) -> None:
        # one file per trigger: fresh-checkpoint epoch numbering
        # reproduces the original run's (the documented contract)
        events = streaming.read_event_stream(
            spark, str(src_dir), max_files_per_trigger=1
        )
        batch = events.select(
            F.col("event_id").alias("pk"), F.col("event_type"),
            F.col("value"),
        )
        q = streaming.continuous_sync(batch, spec, store,
                                      str(tmp_path / ck))
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run("ck0")  # epochs 0 and 1
    assert store.read().count() == 20
    assert store.last_txn("continuous_sync") == "1"

    run("ck1")  # fresh checkpoint: replays epochs 0 AND 1
    assert store.read().count() == 20  # neither double-applied

    # a genuinely new file arrives -> epoch 2 must still apply
    rows = [Row(event_id=300 + i, ts=10**18 + i, user_id=i,
                event_type="a", value=1.0, props="{}") for i in range(5)]
    spark.createDataFrame(rows).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp))
    dst = src_dir / "2.parquet"
    shutil.copy(glob.glob(str(tmp / "part-*.parquet"))[0], dst)
    mt = time.time() + 10
    os.utime(dst, (mt, mt))

    run("ck1")  # same checkpoint continues: only the new file applies
    assert store.read().count() == 25


def test_near_dedup_replay_ignores_partial_current_epoch(spark, tmp_path):
    """A truncated part file in the CURRENT epoch's registry dir (crash
    mid-write) must not fail the prior-epoch registry read on replay."""
    docs = [
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog "
                           "again and again tonight", lang="en",
            source="s", n_chars=70),
        Row(doc_id=2, text="an entirely different document about spark "
                           "partitioning strategies at scale", lang="en",
            source="s", n_chars=70),
    ]
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    tmp = tmp_path / "_stage"
    spark.createDataFrame(docs).coalesce(1).write.parquet(str(tmp))
    shutil.copy(glob.glob(str(tmp / "part-*.parquet"))[0],
                src_dir / "000-a.parquet")

    registry = str(tmp_path / "registry")
    out = str(tmp_path / "out")

    def run(ck: str) -> None:
        stream = (
            spark.readStream.schema(
                "doc_id long, text string, lang string, source string, "
                "n_chars long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir))
        )
        q = streaming.continuous_near_dedup(
            stream, registry, out, str(tmp_path / ck),
            shingle_n=3, seeds=4, rows_per_band=2,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run("ck0")  # epoch 0 committed
    assert os.path.isdir(os.path.join(registry, "epoch=0"))

    # Simulate a crash mid-registry-write of epoch 1: a truncated,
    # unreadable part file is left behind.
    bad = os.path.join(registry, "epoch=1")
    os.makedirs(bad, exist_ok=True)
    with open(os.path.join(bad, "part-00000-crashed.parquet"), "wb") as fh:
        fh.write(b"PAR1 this is not a complete parquet file")

    # New file arrives; fresh checkpoint replays from scratch. Epoch 1
    # re-processes with the corrupt dir present — the registry read must
    # touch ONLY epoch=0 and succeed.
    docs2 = [Row(doc_id=3, text="a third unrelated text about minhash "
                                "banding and jaccard verification",
                 lang="en", source="s", n_chars=60)]
    spark.createDataFrame(docs2).coalesce(1).write.mode("overwrite").parquet(
        str(tmp)
    )
    dst = src_dir / "001-b.parquet"
    shutil.copy(glob.glob(str(tmp / "part-*.parquet"))[0], dst)
    mt = time.time() + 5
    os.utime(dst, (mt, mt))

    run("ck1")
    kept = spark.read.parquet(out)
    # All three docs are mutually non-duplicate → all kept.
    assert kept.select("doc_id").distinct().count() == 3


def test_dsir_weight_factors_cast_to_double_before_multiply():
    """Regression guard for the bigint-wrap fix: the generated SQL must
    multiply double-cast factors, never bigint products."""
    from far_finer_airtable_firestore_sync_spark.plans import ext_queries

    import inspect

    src = inspect.getsource(ext_queries)
    i = src.find("as lr_q")
    assert i != -1
    window = src[max(0, i - 600):i]
    assert "cast(k.ct + 1 as double)" in window
    assert "cast(k.cr + 1 as double)" in window
    # The old wrapping form must be gone.
    assert "(k.ct + 1) * (tt.r_total" not in window


def test_dsir_weights_still_match_duckdb(spark, tmp_path):
    """Value-level check of the rewritten expression at fixture scale
    (both engines run the same dual-dialect body — the rewrite must not
    perturb the hash contract)."""
    import duckdb

    import pyarrow as pa
    import pyarrow.parquet as pq

    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        _dsir_body,
    )
    from far_finer_airtable_firestore_sync_spark.functions.canonical import (
        DUCKDB,
        SPARK,
    )

    texts = [
        (1, "en", "web", "spark makes distributed queries simple"),
        (2, "en", "wiki", "the quick brown fox jumps over the dog"),
        (3, "en", "web", "importance resampling selects target like data"),
        (4, "en", "books", "a long treatise on partitioning and shuffles"),
    ]
    path = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([t[0] for t in texts], pa.int64()),
                "lang": pa.array([t[1] for t in texts], pa.string()),
                "source": pa.array([t[2] for t in texts], pa.string()),
                "text": pa.array([t[3] for t in texts], pa.string()),
            }
        ),
        path,
    )
    spark.read.parquet(path).createOrReplaceTempView("_r4_dsir_docs")
    got = {
        r["doc_id"]: r["dsir_logw"]
        for r in spark.sql(_dsir_body(SPARK, "_r4_dsir_docs")).collect()
    }
    con = duckdb.connect()
    con.execute(f"create view _r4_dsir_docs as select * from '{path}'")
    want = {
        r[0]: r[2]
        for r in con.execute(_dsir_body(DUCKDB, "_r4_dsir_docs")).fetchall()
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k] == pytest.approx(want[k], abs=1e-9)
