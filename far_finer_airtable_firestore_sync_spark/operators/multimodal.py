"""Multimodal (image/audio/video) column plumbing.

North-star extension: treat media as opaque ``binary`` columns with a
typed metadata struct, and run decode / feature-extract / resize /
frame-sample as Arrow-batched ``mapInPandas`` stages.

The decode step itself is STUBBED (no image/audio libs in this
container): ``decoder="fake"`` is a deterministic byte-level stand-in
so the Spark-side contract — schema, batch shape, partitioning, null
handling — is real and tested; ``decoder="pillow"`` raises
``NotImplementedError`` until a real codec is wired in.

Scale notes: media rows are large, so the operators avoid shuffling
binary payloads — every stage is a mapInPandas projection (no
exchange), and feature vectors (small) are what downstream joins ever
see. Partition sizing: keep ``spark.sql.files.maxPartitionBytes`` low
enough that one Arrow batch of blobs fits executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, content binary, media_type string, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, content_hash string, "
    "feature array<double>"
)


def attach_media_columns(
    df: DataFrame, payload_col: str, media_type: str = "image/fake"
) -> DataFrame:
    """Wrap an existing column's bytes as a media row (fixture helper:
    the test tables carry no real media, so text bytes stand in)."""
    return df.select(
        F.monotonically_increasing_id().alias("media_id"),
        F.col(payload_col).cast("binary").alias("content"),
        F.lit(media_type).alias("media_type"),
        F.expr(
            "named_struct('width', cast(null as int), 'height', cast(null as int),"
            " 'sample_rate', cast(null as int), 'duration_ms', cast(null as int))"
        ).alias("meta"),
    )


def _fake_decode(content: bytes) -> list[float]:
    """Deterministic stand-in 'decoder': 8 features from the digest.

    NOT a real decode — a byte-stable fake so the distributed plumbing
    is testable without codecs.
    """
    h = hashlib.sha256(content).digest()
    return [b / 255.0 for b in h[:8]]


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas.

    One projection stage: no shuffle, blobs never leave their
    partition; output rows are small feature vectors.
    """
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder {decoder!r}: real media codecs are not available in "
            "this environment; wire Pillow/torchaudio here and keep the "
            "same mapInPandas contract"
        )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            feats, hashes, sizes = [], [], []
            for content in pdf["content"]:
                b = bytes(content) if content is not None else b""
                feats.append(_fake_decode(b))
                hashes.append(hashlib.md5(b).hexdigest())
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": sizes,
                    "content_hash": hashes,
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """'Frame sampling' over the opaque payload: emit one row per
    sampled offset (byte-level stand-in for video frame extraction —
    the explode pattern and output cardinality contract are the real
    thing)."""
    idx = F.expr(
        f"sequence(0, least(int(length(content) / {every_n_bytes}), {max_frames - 1}))"
    )
    return df.select(
        "media_id",
        F.explode(idx).alias("frame_no"),
        F.expr(
            f"substring(content, frame_no * {every_n_bytes} + 1, {every_n_bytes})"
        ).alias("frame_bytes"),
    )
