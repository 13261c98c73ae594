"""Round-2 hardening: schema-evolution checksum backfill, optimistic
store commits, control-char JSON escaping, ISO-8601 datetime parsing."""

from datetime import datetime

import duckdb
import json
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from far_finer_airtable_firestore_sync_spark.config import SyncSpec, UpdateType
from far_finer_airtable_firestore_sync_spark.functions.canonical import (
    DUCKDB,
    SPARK,
    Field,
    canonical_row_sql,
)
from far_finer_airtable_firestore_sync_spark.operators import strategies as st
from far_finer_airtable_firestore_sync_spark.plans.join_queries import (
    parse_datetime_any,
    parse_datetime_any_duckdb,
)
from far_finer_airtable_firestore_sync_spark.sources.store import (
    ConcurrentCommitError,
    DocumentStore,
)

RUN_TS = datetime(2026, 1, 1, 0, 0, 0)


def _spec(payload):
    return SyncSpec(
        primary_key="name",
        update_type=UpdateType.UPSERT_CHECKSUM,
        payload_fields=payload,
        table_name="tbl",
        view_name="v",
        run_ts=RUN_TS,
        version_id=100,
    )


def test_payload_schema_evolution_backfills_target(spark):
    """A payload field added to the spec after the target was written
    must not raise — old docs checksum-differ and get updated
    (reference parity: lib/DataProcessor.py:111 skips absent keys)."""
    spec = _spec((Field("name", "string"), Field("score", "double"),
                  Field("tier", "string")))
    source = spark.createDataFrame(
        [Row(name="a", score=1.0, tier="gold"), Row(name="b", score=2.0, tier=None)]
    )
    # Stored target predates the 'tier' field entirely.
    target = spark.createDataFrame(
        [Row(name="a", score=1.0, doc_id="d1",
             update_type=UpdateType.UPSERT_CHECKSUM.value,
             write_timestamp=datetime(2020, 1, 1), version_id=7)]
    )
    out = {r["name"]: r.asDict() for r in
           st.upsert_checksum(source, target, spec).collect()}
    # 'a' was updated (tier gold arrived => checksum differed)
    assert out["a"]["tier"] == "gold"
    assert out["a"]["write_timestamp"] == RUN_TS
    assert out["a"]["doc_id"] == "d1"  # merge keeps identity
    assert out["b"]["tier"] is None


def test_payload_schema_evolution_null_tier_is_noop_on_rerun(spark):
    """Second run with the evolved spec over the already-backfilled
    post-state writes nothing (checksums now agree)."""
    spec = _spec((Field("name", "string"), Field("score", "double"),
                  Field("tier", "string")))
    source = spark.createDataFrame([Row(name="a", score=1.0, tier="gold")])
    target = spark.createDataFrame(
        [Row(name="a", score=1.0, doc_id="d1",
             update_type=UpdateType.UPSERT_CHECKSUM.value,
             write_timestamp=datetime(2020, 1, 1), version_id=7)]
    )
    once = st.upsert_checksum(source, target, spec)
    twice = st.upsert_checksum(source, once, spec)
    rows = {r["name"]: r.asDict() for r in twice.collect()}
    assert rows["a"]["write_timestamp"] == RUN_TS  # from run 1, untouched


def test_commit_optimistic_concurrency(spark, tmp_path):
    store = DocumentStore(spark, str(tmp_path / "s"))
    df = spark.createDataFrame([Row(doc_id="a", v=1)])
    store.commit(df)
    base = store.current_version_dir()
    store.commit(spark.createDataFrame([Row(doc_id="a", v=2)]))  # writer 2 wins
    with pytest.raises(ConcurrentCommitError):
        store.commit(df, expected_version=base)
    # pointer still at writer 2's version
    assert store.read().collect()[0]["v"] == 2


def test_control_chars_escaped_and_parseable(spark):
    """Canonical JSON escapes \\n \\r \\t \\b \\f identically in both
    emitters AND the result is parseable JSON (ADVICE round 1)."""
    fields = [Field("k", "string"), Field("txt", "string")]
    rows = (
        "select * from (values ('a', 'line1' || chr(10) || 'line2' || chr(9) "
        "|| chr(13) || chr(8) || chr(12) || chr(34) || chr(92))) as t(k, txt)"
    )
    s = spark.sql(
        f"select {canonical_row_sql(fields, SPARK)} as c from ({rows})"
    ).collect()[0]["c"]
    d = duckdb.sql(
        f"select {canonical_row_sql(fields, DUCKDB)} as c from ({rows})"
    ).fetchone()[0]
    assert s == d
    parsed = json.loads(s)
    assert parsed["txt"] == 'line1\nline2\t\r\b\f"\\'


def test_lsh_hash_families_agree_post_jaccard(spark):
    """md5 and xxhash64 LSH bucket differently (different candidate
    sets) but after exact-Jaccard verification both families must
    recover the same >=threshold pair set (VERDICT round-1 item 3)."""
    from far_finer_airtable_firestore_sync_spark.operators import dedup_docs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    md5_pairs = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in dedup_docs.near_dup_pairs(docs, hash_family="md5").collect()
    }
    xx_pairs = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in dedup_docs.near_dup_pairs(docs, hash_family="xxhash64").collect()
    }
    assert md5_pairs, "fixture should contain near-dup documents"
    assert md5_pairs == xx_pairs


ISO_CASES = [
    ("2024-12-23T10:00:00.000Z", datetime(2024, 12, 23, 10, 0, 0)),
    ("2024-12-23T10:00:00Z", datetime(2024, 12, 23, 10, 0, 0)),
    ("2024-12-23T10:00:00+05:30", datetime(2024, 12, 23, 4, 30, 0)),
    ("2024-12-23T10:00:00.123+00:00", datetime(2024, 12, 23, 10, 0, 0, 123000)),
    ("2024-12-23T10:00:00.123456", datetime(2024, 12, 23, 10, 0, 0, 123456)),
    # off-grid fraction widths (1/2/4/5/7/9 digits): normalized to 6
    # digits pre-parse so both engines read identical microseconds
    ("2024-12-23T10:00:00.1Z", datetime(2024, 12, 23, 10, 0, 0, 100000)),
    ("2024-12-23T10:00:00.12", datetime(2024, 12, 23, 10, 0, 0, 120000)),
    ("2024-12-23T10:00:00.1234+00:00", datetime(2024, 12, 23, 10, 0, 0, 123400)),
    ("2024-12-23T10:00:00.12345", datetime(2024, 12, 23, 10, 0, 0, 123450)),
    ("2024-12-23T10:00:00.1234567Z", datetime(2024, 12, 23, 10, 0, 0, 123456)),
    ("2024-12-23T10:00:00.123456789", datetime(2024, 12, 23, 10, 0, 0, 123456)),
    ("Dec 23, 2024", datetime(2024, 12, 23)),
    ("2024-12-23", datetime(2024, 12, 23)),
    ("not a date", None),
]


def test_parse_datetime_iso_shapes(spark):
    """The source system's own emission format (ISO-8601 with T, ms
    fraction, Z/offset) parses to UTC wall-clock — in BOTH engines."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    vals = ", ".join(f"('{s}')" for s, _ in ISO_CASES)
    rows = f"select * from (values {vals}) as t(raw)"
    got_s = [
        r["p"] for r in spark.sql(
            f"select {parse_datetime_any('raw')} as p from ({rows})"
        ).collect()
    ]
    got_d = [
        r[0] for r in duckdb.sql(
            f"select {parse_datetime_any_duckdb('raw')} as p from ({rows})"
        ).fetchall()
    ]
    want = [w for _, w in ISO_CASES]
    assert got_s == want
    assert got_d == want


def test_typed_projection_quarantine(spark):
    from far_finer_airtable_firestore_sync_spark.functions.casts import (
        typed_projection_with_quarantine,
    )

    df = spark.createDataFrame(
        [
            Row(id="1", amount="12.5", day="2024-01-31"),
            Row(id="2", amount="not-a-number", day="2024-01-31"),
            Row(id="3", amount="7", day="Jan32-bogus"),
            Row(id="4", amount=None, day=None),  # NULLs are fine, not corrupt
        ]
    )
    catalog = {"id": "singleLineText", "amount": "number", "day": "date"}
    good, bad = typed_projection_with_quarantine(df, catalog)
    good_rows = {r["id"]: r for r in good.collect()}
    assert set(good_rows) == {"1", "4"}
    assert good_rows["1"]["amount"] == 12.5
    assert good_rows["4"]["amount"] is None
    bad_rows = {r["id"]: r["_bad_fields"] for r in bad.collect()}
    assert bad_rows == {"2": ["amount"], "3": ["day"]}
    # quarantine keeps the original raw values for audit
    raw = {r["id"]: r["amount"] for r in bad.collect()}
    assert raw["2"] == "not-a-number"


def test_store_compact_reduces_files(spark, tmp_path):
    import glob

    from far_finer_airtable_firestore_sync_spark.sources.store import (
        DocumentStore,
    )

    store = DocumentStore(spark, str(tmp_path / "s"))
    df = spark.range(1000).selectExpr("cast(id as string) as doc_id", "id as v")
    store.commit(df.repartition(16))  # fragmented: 16 small files
    frag = len(glob.glob(store.current_version_dir() + "/*.parquet"))
    assert frag >= 16
    store.compact(target_rows_per_file=1_000_000)
    compacted = len(glob.glob(store.current_version_dir() + "/*.parquet"))
    assert compacted == 1
    assert store.read().count() == 1000


def test_missing_source_payload_column_fails_loudly(spark):
    """A SOURCE feed missing a spec payload column is an upstream
    regression: it must raise at plan time, not silently backfill NULL
    and overwrite real target values on every matched row."""
    from pyspark.sql.utils import AnalysisException

    spec = _spec((Field("name", "string"), Field("score", "double"),
                  Field("tier", "string")))
    source = spark.createDataFrame([Row(name="a", score=1.0)])  # no tier
    target = spark.createDataFrame(
        [Row(name="a", score=1.0, tier="gold", doc_id="d1",
             update_type=UpdateType.UPSERT_CHECKSUM.value,
             write_timestamp=datetime(2020, 1, 1), version_id=7)]
    )
    with pytest.raises(AnalysisException):
        st.upsert_checksum(source, target, spec).collect()
