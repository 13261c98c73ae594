"""Streaming continuous sync, nested exclude_keys, multimodal plumbing."""

import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from far_finer_airtable_firestore_sync_spark.config import SyncSpec, UpdateType
from far_finer_airtable_firestore_sync_spark.functions.canonical import Field
from far_finer_airtable_firestore_sync_spark.operators import cleanup, multimodal
from far_finer_airtable_firestore_sync_spark.sources.store import DocumentStore
from far_finer_airtable_firestore_sync_spark.streaming import sync as streaming


def test_continuous_sync_foreachbatch(spark, tmp_path):
    """Each micro-batch replays the strategy; final store state equals
    a batch run over the same data."""
    src_dir = tmp_path / "stream-in"
    src_dir.mkdir()
    events = streaming.read_event_stream(spark, str(src_dir))
    # project a sync-shaped batch out of the raw stream
    batch = events.select(
        F.col("event_id").alias("pk"), F.col("event_type"), F.col("value")
    )
    spec = SyncSpec(
        primary_key="pk",
        update_type=UpdateType.UPSERT_CHECKSUM,
        payload_fields=(
            Field("pk", "long"),
            Field("event_type", "string"),
            Field("value", "double"),
        ),
    )
    store = DocumentStore(spark, str(tmp_path / "store"))
    q = streaming.continuous_sync(
        batch, spec, store, str(tmp_path / "ckpt")
    )
    try:
        # stage the fixture file as the first (and only) stream input
        import shutil

        shutil.copy(
            "/root/testdata/sf0.001/events.parquet", src_dir / "events.parquet"
        )
        q.processAllAvailable()
    finally:
        q.stop()
    out = store.read()
    assert out.count() == 1000  # one doc per distinct event_id
    assert out.filter("update_type = 'upsert_checksum'").count() == 1000


def test_windowed_event_aggregates_matches_batch(spark):
    stream = streaming.read_event_stream(
        spark, "/root/testdata/sf0.001/events.parquet"
    )
    agg = streaming.windowed_event_aggregates(stream)
    result = streaming.run_stream_to_memory(agg, "t_stream_win")
    from far_finer_airtable_firestore_sync_spark.plans.agg_queries import (
        read_events,
    )

    ev = read_events(spark, "/root/testdata/sf0.001")
    batch = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )
    assert sorted(map(tuple, result.collect())) == sorted(map(tuple, batch.collect()))


def test_exclude_keys_nested(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("secret", T.StringType()),
            T.StructField(
                "payload",
                T.StructType(
                    [
                        T.StructField("keep", T.StringType()),
                        T.StructField("secret", T.StringType()),
                        T.StructField(
                            "items",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("name", T.StringType()),
                                        T.StructField("secret", T.LongType()),
                                    ]
                                )
                            ),
                        ),
                    ]
                ),
            ),
        ]
    )
    df = spark.createDataFrame(
        [
            (
                1,
                "tok",
                {
                    "keep": "\t hello\tworld \t",
                    "secret": "x",
                    "items": [{"name": " a\t", "secret": 9}],
                },
            )
        ],
        schema,
    )
    out = cleanup.exclude_keys(df, ["secret"])
    assert out.columns == ["id", "payload"]
    row = out.collect()[0]
    assert row["payload"]["keep"] == "helloworld"  # tabs stripped, trimmed
    assert row["payload"].asDict().keys() == {"keep", "items"}
    assert row["payload"]["items"][0].asDict() == {"name": "a"}


def test_exclude_json_keys_both_paths(spark):
    # \\t: the JSON text carries an escaped tab (a literal control char
    # would be invalid JSON and rejected by both parsers)
    df = spark.createDataFrame(
        [Row(id=1, props='{"k": 5, "note": "\\thi ", "drop_me": 1}')]
    )
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("note", T.StringType()),
            T.StructField("drop_me", T.LongType()),
        ]
    )
    schemad = cleanup.exclude_json_keys(df, "props", schema, ["drop_me"]).collect()[0]
    assert '"drop_me"' not in schemad["props"] and '"k":5' in schemad["props"]
    udf_out = cleanup.exclude_json_keys_udf(df, "props", ["drop_me"]).collect()[0]
    assert udf_out["props"] == '{"k": 5, "note": "hi"}'


def test_multimodal_feature_extraction(spark):
    docs = spark.createDataFrame(
        [Row(text="hello media world"), Row(text="another blob of bytes here")]
    )
    media = multimodal.attach_media_columns(docs, "text")
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 2
    for r in feats:
        assert len(r["feature"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
        assert r["n_bytes"] > 0 and len(r["content_hash"]) == 32
    # determinism: same bytes -> same features
    again = multimodal.extract_features(media).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))


@pytest.mark.skipif(
    multimodal._PILImage is not None, reason="Pillow installed"
)
def test_multimodal_pillow_decoder_absent_raises(spark):
    """Without Pillow the 'pillow' decoder is unregistered and asking
    for it names the missing dependency instead of failing mid-job."""
    docs = spark.createDataFrame([Row(text="x")])
    media = multimodal.attach_media_columns(docs, "text")
    with pytest.raises(NotImplementedError):
        multimodal.extract_features(media, decoder="pillow")


@pytest.mark.skipif(
    multimodal._PILImage is None, reason="Pillow not installed"
)
def test_multimodal_pillow_decoder_real_png(spark):
    """With Pillow present, real PNG bytes decode to [w, h, band
    means] through the same mapInPandas plumbing as the PPM path."""
    import io

    img = multimodal._PILImage.new("RGB", (4, 2), (255, 0, 128))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    docs = spark.createDataFrame([Row(blob=bytearray(buf.getvalue()))])
    media = multimodal.attach_media_columns(docs, "blob", "image/png")
    feats = multimodal.extract_features(media, decoder="pillow").collect()
    assert len(feats) == 1
    w, h, r, g, b = feats[0]["feature"]
    assert (w, h) == (4.0, 2.0)
    assert abs(r - 1.0) < 1e-6 and abs(g) < 1e-6 and abs(b - 128 / 255) < 1e-6
    # garbage bytes quarantine as NULL feature, not a job failure
    bad = multimodal.attach_media_columns(
        spark.createDataFrame([Row(blob=bytearray(b"not an image"))]), "blob"
    )
    out = multimodal.extract_features(bad, decoder="pillow").collect()
    assert out[0]["feature"] is None


def test_frame_sample(spark):
    docs = spark.createDataFrame([Row(text="b" * 300)])
    media = multimodal.attach_media_columns(docs, "text")
    frames = multimodal.frame_sample(media, every_n_bytes=64, max_frames=8).collect()
    assert len(frames) == 5  # ceil-ish: offsets 0..4 for 300 bytes
    assert all(len(bytes(f["frame_bytes"])) <= 64 for f in frames)


# -- real decoders (round 2): PPM images, WAV audio ---------------------------


def _ppm_bytes(w, h, rgb=(10, 20, 30), maxval=255):
    return f"P6\n{w} {h}\n{maxval}\n".encode() + bytes(rgb) * (w * h)


def _wav_bytes(rate=8000, n=800, amplitude=16384):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(struct.pack(f"<{n}h", *([amplitude] * n)))
    return buf.getvalue()


def _media_df(spark, blobs, media_type):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("media_type", T.StringType()),
        ]
    )
    return spark.createDataFrame(
        [(i, b, media_type) for i, b in enumerate(blobs)], schema
    )


def test_ppm_decode_real_pixels(spark):
    """The PPM decoder reads actual pixel data: known 4x2 image with
    uniform RGB(10,20,30) -> exact channel means. Edge rows (null,
    empty, corrupt header, truncated raster, large blob) yield NULL
    features without failing the job."""
    good = _ppm_bytes(4, 2)
    large = _ppm_bytes(200, 100)  # 60 kB raster
    truncated = _ppm_bytes(4, 2)[:-5]
    blobs = [good, large, truncated, b"", None, b"JFIF not a ppm"]
    out = {
        r["media_id"]: r
        for r in multimodal.extract_features(
            _media_df(spark, blobs, "image/x-portable-pixmap"), decoder="ppm"
        ).collect()
    }
    assert out[0]["feature"] == [4.0, 2.0, 10 / 255, 20 / 255, 30 / 255]
    assert out[1]["feature"][:2] == [200.0, 100.0]
    assert out[1]["n_bytes"] > 60000
    for bad in (2, 3, 4, 5):
        assert out[bad]["feature"] is None
    assert out[4]["n_bytes"] == 0  # null payload treated as empty


def test_ppm_resize_roundtrip(spark):
    """resize -> decode round-trip: output dims change, uniform color
    survives nearest-neighbor exactly."""
    media = _media_df(spark, [_ppm_bytes(8, 4), None], "image/x-portable-pixmap")
    resized = multimodal.resize_ppm(media, 2, 2)
    feats = {
        r["media_id"]: r["feature"]
        for r in multimodal.extract_features(resized, decoder="ppm").collect()
    }
    assert feats[0] == [2.0, 2.0, 10 / 255, 20 / 255, 30 / 255]
    assert feats[1] is None


def test_wav_decode_real_audio(spark):
    """The WAV decoder reads real PCM: constant half-scale amplitude
    -> mean_abs 0.5; duration from frames/rate."""
    blobs = [_wav_bytes(rate=8000, n=800), b"", b"RIFFgarbage"]
    out = {
        r["media_id"]: r["feature"]
        for r in multimodal.extract_features(
            _media_df(spark, blobs, "audio/wav"), decoder="wav"
        ).collect()
    }
    nch, rate, dur_ms, mean_abs = out[0]
    assert (nch, rate, dur_ms) == (1.0, 8000.0, 100.0)
    assert abs(mean_abs - 0.5) < 1e-9
    assert out[1] is None and out[2] is None


def test_continuous_rollup_matches_batch(spark, tmp_path):
    """Hypertable-style continuous aggregate: events replayed in two
    micro-batches (time-split files, boundary window touched by both)
    must leave the store holding exactly the batch rollup."""
    import pyarrow.parquet as pq

    src = pq.read_table("/root/testdata/sf0.001/events.parquet")
    cut = sorted(src["ts"].to_pylist())[len(src) // 2]
    src_dir = tmp_path / "rollup-in"
    src_dir.mkdir()
    pq.write_table(src.filter(__import__("pyarrow").compute.less(src["ts"], cut)),
                   src_dir / "part1.parquet")
    pq.write_table(src.filter(__import__("pyarrow").compute.greater_equal(src["ts"], cut)),
                   src_dir / "part2.parquet")

    stream = streaming.read_event_stream(spark, str(src_dir),
                                         max_files_per_trigger=1)
    store = DocumentStore(spark, str(tmp_path / "rollup-store"))
    q = streaming.continuous_rollup(stream, store, str(tmp_path / "rollup-ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["bucket_id"]): (r["n_events"], r["total_value"])
        for r in store.read().collect()
    }
    batch = streaming.windowed_event_aggregates(
        streaming.read_event_stream(spark, "/root/testdata/sf0.001/events.parquet")
    )
    expect = {}
    for r in streaming.run_stream_to_memory(batch, "t_rollup_batch").collect():
        key = f"{r['window_start']:%Y-%m-%d %H:%M:%S}|{r['event_type']}"
        expect[key] = (r["n_events"], r["total_value"])
    assert got == expect


def test_stream_static_enrich_stateless_and_matches_batch(spark, tmp_path):
    """Stream-static enrichment: per-batch broadcast join, stateless
    (no state-store rows reported), inner-join semantics drop
    unmatched stream rows, result equals the batch join."""
    src_dir = tmp_path / "enrich-in"
    src_dir.mkdir()
    rows = [
        Row(event_id=i, ts=1_700_000_000_000_000_000 + i, user_id=i % 4,
            event_type="click", value=float(i), props="{}")
        for i in range(20)
    ]
    spark.createDataFrame(rows).write.parquet(str(src_dir), mode="overwrite")
    stream = streaming.read_event_stream(spark, str(src_dir))
    dim = spark.createDataFrame(
        [Row(c_custkey=0, seg="A"), Row(c_custkey=1, seg="B")]
    )
    enriched = streaming.stream_static_enrich(
        stream, dim, F.col("user_id") == F.col("c_custkey"),
        ["event_id", "user_id", "value", "seg"],
    )
    # stateless: the streaming plan has no stateful operator to report
    q = (
        enriched.writeStream.outputMode("append")
        .format("memory").queryName("t_enrich").start()
    )
    try:
        q.processAllAvailable()
        progress = q.lastProgress
        assert progress is None or progress["stateOperators"] == []
    finally:
        q.stop()
    got = {(r["event_id"], r["seg"]) for r in spark.table("t_enrich").collect()}
    want = {(i, "A" if i % 4 == 0 else "B") for i in range(20) if i % 4 in (0, 1)}
    assert got == want


def test_continuous_sync_restart_from_checkpoint(spark, tmp_path):
    """Kill-and-restart resilience: a second query started on the SAME
    checkpoint + store must not reprocess the already-committed file
    (APPEND strategy would visibly duplicate rows if it did), and must
    pick up files that arrived while the query was down."""
    src_dir = tmp_path / "restart-in"
    src_dir.mkdir()
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
    ckpt = str(tmp_path / "ckpt")

    def start_query():
        events = streaming.read_event_stream(spark, str(src_dir))
        batch = events.select(
            F.col("event_id").alias("pk"), F.col("event_type"), F.col("value")
        )
        return streaming.continuous_sync(batch, spec, store, ckpt)

    import glob
    import shutil

    def stage_file(rows, name):
        tmp = tmp_path / f"_stage_{name}"
        spark.createDataFrame(rows).coalesce(1).write.parquet(str(tmp))
        part = glob.glob(str(tmp / "part-*.parquet"))[0]
        shutil.copy(part, src_dir / name)

    rows1 = [Row(event_id=i, ts=10**18 + i, user_id=i, event_type="a",
                 value=1.0, props="{}") for i in range(50)]
    rows2 = [Row(event_id=1000 + i, ts=10**18 + i, user_id=i, event_type="b",
                 value=2.0, props="{}") for i in range(30)]
    stage_file(rows1, "f1.parquet")
    q = start_query()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert store.read().count() == 50

    # file lands while the query is DOWN; restart from the checkpoint
    stage_file(rows2, "f2.parquet")
    q = start_query()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = store.read()
    # 50 + 30, file 1 NOT re-appended by the restarted query
    assert out.count() == 80
    assert out.filter("event_type = 'a'").count() == 50
    assert out.filter("event_type = 'b'").count() == 30


def test_continuous_near_dedup_cross_batch(spark, tmp_path):
    """Streaming greedy near-dedup: within-batch near-dup loses to the
    min-id doc, cross-batch near-dup of an earlier doc is dropped via
    the persistent band registry, and unique docs always survive."""
    import glob
    import shutil

    src_dir = tmp_path / "nd-in"
    src_dir.mkdir()

    base = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).orderBy("doc_id").limit(3).collect()
    t0, t1, t2 = (r["text"] for r in base)
    # a 3-char suffix on a ~128-char doc keeps shingle-Jaccard ~0.97,
    # and rows_per_band=2 (4 bands) makes a band collision near-certain
    sfx = " xx"

    def stage(rows, name):
        tmp = tmp_path / f"_nd_{name}"
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(tmp))
        shutil.copy(
            glob.glob(str(tmp / "part-*.parquet"))[0], src_dir / name
        )

    reg = str(tmp_path / "registry")
    out = str(tmp_path / "kept")

    def run_batch(rows, name):
        stage(rows, name)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir))
        )
        q = streaming.continuous_near_dedup(
            stream, reg, out, str(tmp_path / "ckpt"), rows_per_band=2
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # batch 1: doc 1 and its near-dup doc 2; unique doc 3
    run_batch([(1, t0), (2, t0 + sfx), (3, t1)], "b1.parquet")
    # batch 2: near-dup of doc 1 (cross-batch drop) + fresh unique doc
    run_batch([(10, t0 + sfx), (11, t2)], "b2.parquet")

    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {1, 3, 11}
    # registry holds only digests, never text
    regdf = spark.read.parquet(reg)
    assert set(regdf.columns) <= {"band_key", "epoch"}


def test_continuous_near_dedup_batch_retry_idempotent(spark, tmp_path):
    """A replayed batch (same epoch id, e.g. crash between the registry
    write and the checkpoint commit) must be idempotent: the epoch
    filter on the registry read keeps the replay from dropping its own
    docs as self-collisions, and the per-epoch overwrite prevents
    duplicate output."""
    import glob
    import shutil

    import far_finer_airtable_firestore_sync_spark.streaming.sync as ss

    rows = [(1, "alpha beta gamma delta epsilon zeta eta theta " * 3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    reg = str(tmp_path / "reg")
    out = str(tmp_path / "out")
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    tmp = tmp_path / "_stage"
    df.coalesce(1).write.parquet(str(tmp))
    shutil.copy(
        glob.glob(str(tmp / "part-*.parquet"))[0], stream_dir / "f.parquet"
    )

    # two fresh checkpoints replay the same file as epoch 0 twice —
    # exactly the state a mid-commit crash leaves behind
    for attempt in range(2):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(str(stream_dir))
        )
        h = ss.continuous_near_dedup(
            stream, reg, out, str(tmp_path / f"ck{attempt}"), rows_per_band=2
        )
        try:
            h.processAllAvailable()
        finally:
            h.stop()

    kept = [r["doc_id"] for r in spark.read.parquet(out).collect()]
    assert kept == [1]  # survived the replay; no duplicates either
    reg_epochs = {
        r["epoch"] for r in spark.read.parquet(reg).select("epoch").collect()
    }
    assert reg_epochs == {0}


def test_continuous_sync_replayed_epoch_skipped(spark, tmp_path):
    """Replaying an already-committed epoch (crash between store commit
    and checkpoint advance) must not re-apply the strategy: the commit
    tag makes APPEND exactly-once."""
    import glob
    import shutil

    src_dir = tmp_path / "replay-in"
    src_dir.mkdir()
    rows = [Row(event_id=i, ts=10**18 + i, user_id=i, event_type="a",
                value=1.0, props="{}") for i in range(10)]
    tmp = tmp_path / "_stage_r"
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

    # two fresh checkpoints replay the same file as epoch 0 twice
    for attempt in range(2):
        events = streaming.read_event_stream(spark, str(src_dir))
        batch = events.select(
            F.col("event_id").alias("pk"), F.col("event_type"), F.col("value")
        )
        q = streaming.continuous_sync(
            batch, spec, store, str(tmp_path / f"ck{attempt}")
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    assert store.read().count() == 10  # not 20: replay skipped
    assert store.last_txn("continuous_sync") == "0"
