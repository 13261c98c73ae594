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


def test_multimodal_real_decoder_is_stubbed(spark):
    docs = spark.createDataFrame([Row(text="x")])
    media = multimodal.attach_media_columns(docs, "text")
    with pytest.raises(NotImplementedError):
        multimodal.extract_features(media, decoder="pillow")


def test_frame_sample(spark):
    docs = spark.createDataFrame([Row(text="b" * 300)])
    media = multimodal.attach_media_columns(docs, "text")
    frames = multimodal.frame_sample(media, every_n_bytes=64, max_frames=8).collect()
    assert len(frames) == 5  # ceil-ish: offsets 0..4 for 300 bytes
    assert all(len(bytes(f["frame_bytes"])) <= 64 for f in frames)
