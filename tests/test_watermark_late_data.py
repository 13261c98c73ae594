"""Watermark / late-data semantics for the streaming window aggregate.

Two micro-batches: batch 2 carries an event whose timestamp is older
than (max event time - watermark delay) after batch 1 — in append mode
the closed window must NOT reopen for it, while an in-watermark late
event must still be counted.
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from far_finer_airtable_firestore_sync_spark.streaming import sync as streaming


def _write_events(path, rows):
    """rows: (event_id, ts_nanos, user_id, event_type, value, props)."""
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, path)


H = 3_600_000_000_000  # 1h in ns


def test_append_mode_drops_too_late_events(spark, tmp_path):
    src = tmp_path / "stream-src"
    src.mkdir()
    stream = streaming.read_event_stream(
        spark, str(src), max_files_per_trigger=1
    )
    agg = streaming.windowed_event_aggregates(
        stream, window="1 hour", watermark="30 minutes"
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # batch 1: hours 0 and 3 -> watermark advances to 02:30
        _write_events(
            src / "b1.parquet",
            [
                (1, 0 * H + 10, 1, "click", 1.0, "{}"),
                (2, 0 * H + 20, 2, "click", 2.0, "{}"),
                (3, 3 * H + 10, 3, "click", 4.0, "{}"),
            ],
        )
        q.processAllAvailable()
        # batch 2: one too-late event (hour 0 < watermark) that must be
        # dropped, one in-flight event (hour 3, window not yet closed)
        _write_events(
            src / "b2.parquet",
            [
                (4, 0 * H + 30, 4, "click", 100.0, "{}"),
                (5, 3 * H + 20, 5, "click", 8.0, "{}"),
            ],
        )
        q.processAllAvailable()
        # batch 3: push event time far ahead so hour-3 window closes
        _write_events(
            src / "b3.parquet",
            [(6, 10 * H, 6, "click", 0.5, "{}")],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    out = {
        r["window_start"].hour: (r["n_events"], r["total_value"])
        for r in spark.table("t_late").collect()
    }
    # hour-0 window: emitted with the ON-TIME events only; the late
    # event 4 (value 100) was dropped by the watermark
    assert out[0] == (2, 3.0)
    # hour-3 window: in-watermark late event 5 WAS merged before close
    assert out[3] == (2, 12.0)
