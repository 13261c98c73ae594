"""Regression tests for the round-2 review fixes: NULL-stratum
sampling, NULL-safe class balancing, PII count/redaction consistency,
PPM 2-byte-sample rejection, and post-write commit conflict cleanup."""

import os

import duckdb
import pytest
from pyspark.sql import Row

from far_finer_airtable_firestore_sync_spark.functions.textsql import (
    pii_exprs,
)
from far_finer_airtable_firestore_sync_spark.operators import multimodal
from far_finer_airtable_firestore_sync_spark.operators.text_analysis import (
    class_balance_cap,
    hash_sample,
    hash_sample_sql,
)
from far_finer_airtable_firestore_sync_spark.sources.store import (
    ConcurrentCommitError,
    DocumentStore,
)


def test_hash_sample_null_stratum_takes_default_rate(spark):
    """Rows whose stratum is NULL must be sampled at the default rate,
    not silently dropped (col.isin(...) is NULL for NULL input)."""
    docs = spark.createDataFrame(
        [Row(doc_id=f"d{i}", lang=None if i % 2 else "en") for i in range(40)]
    )
    out = hash_sample(
        docs, "doc_id", 100, strata_rates={"en": 100}, strata_col="lang"
    )
    # rate 100 everywhere => every row kept, including NULL-lang rows
    assert out.count() == 40

    # The DuckDB-dialect SQL emitter (oracle side) agrees with the
    # DataFrame emitter row-for-row, including the NULL stratum.
    con = duckdb.connect()
    con.execute("create table hs_docs(doc_id varchar, lang varchar)")
    con.executemany(
        "insert into hs_docs values (?, ?)",
        [(f"d{i}", None if i % 2 else "en") for i in range(40)],
    )
    where = hash_sample_sql("doc_id", 37, strata_rates={"en": 83}, strata_col="lang")
    via_sql = {
        r[0]
        for r in con.execute(
            f"select doc_id from hs_docs where {where}"
        ).fetchall()
    }
    via_df = {
        r["doc_id"]
        for r in hash_sample(
            docs, "doc_id", 37, strata_rates={"en": 83}, strata_col="lang"
        ).collect()
    }
    assert via_sql == via_df
    # NULL-stratum rows actually present at a partial default rate
    got_null = {d for d in via_df if int(d[1:]) % 2}
    assert 0 < len(got_null) < 20


def test_class_balance_cap_null_and_collision_groups(spark):
    """Multi-column groups partition on the tuple: ('a|b', NULL) and
    ('a', 'b') are DIFFERENT groups, and NULL tuples form their own
    group — string-concat composite keys got both wrong."""
    rows = []
    for i in range(5):
        rows.append(Row(doc_id=f"x{i}", lang="a|b", source=None))
        rows.append(Row(doc_id=f"y{i}", lang="a", source="b"))
        rows.append(Row(doc_id=f"z{i}", lang=None, source=None))
    df = spark.createDataFrame(rows)
    out = class_balance_cap(df, ["lang", "source"], 3)
    by_group = {
        (r["lang"], r["source"]): 0 for r in out.collect()
    }
    for r in out.collect():
        by_group[(r["lang"], r["source"])] += 1
    assert by_group == {("a|b", None): 3, ("a", "b"): 3, (None, None): 3}


def _pii_rows(spark, text):
    df = spark.createDataFrame([Row(t=text)])
    df.createOrReplaceTempView("pii_t")
    ex = pii_exprs("t", "spark")
    sel = ", ".join(f"{sql} as {name}" for name, sql in ex.items())
    return spark.sql(f"select {sel} from pii_t").collect()[0].asDict()


def test_pii_counts_match_substitutions(spark):
    """n_phones equals the number of <PHONE> tokens actually written:
    a phone-shaped run inside an email DOMAIN (hyphens are legal there)
    is consumed by the email redaction and must not be counted as a
    phone."""
    text = "mail bob@555-1234.com and call 555-9876 now"
    got = _pii_rows(spark, text)
    assert got["n_emails"] == 1
    assert got["n_phones"] == 1  # only the standalone 555-9876
    assert got["text_redacted"] == "mail <EMAIL> and call <PHONE> now"
    assert got["text_redacted"].count("<PHONE>") == got["n_phones"]

    # dialect parity on the same input
    d = duckdb.sql(
        "select "
        + ", ".join(
            f"{sql} as {name}"
            for name, sql in pii_exprs("t", "duckdb").items()
        )
        + f" from (values ('{text}')) s(t)"
    ).fetchall()[0]
    assert d[0] == got["n_emails"] and d[1] == got["n_phones"]
    assert d[2] == got["text_redacted"]


def test_parse_ppm_rejects_two_byte_samples():
    """maxval > 255 means 2-byte big-endian samples (P6 spec); the
    1-byte reader must refuse rather than misread the raster."""
    ok = b"P6 2 1 255 " + bytes(6)
    wide = b"P6 2 1 65535 " + bytes(12)
    assert multimodal.parse_ppm(ok) is not None
    assert multimodal.parse_ppm(wide) is None


def test_commit_conflict_after_write_removes_orphan(spark, tmp_path):
    """A pointer that moves during the parquet write raises AND removes
    the just-written orphan version dir (vacuum/list_versions must
    never see a never-committed snapshot)."""
    store = DocumentStore(spark, str(tmp_path / "s"), "k")
    df = spark.createDataFrame([Row(k="a", v=1)])
    v1 = store.commit(df)

    # Simulate a concurrent pointer flip landing mid-write: the
    # pre-write check passes, the post-write check sees a moved pointer.
    calls = {"n": 0}
    real = store.current_version_dir

    def racy():
        calls["n"] += 1
        return real() if calls["n"] == 1 else real() + "-moved"

    store.current_version_dir = racy
    before = set(store.list_versions())
    with pytest.raises(ConcurrentCommitError):
        store.commit(df, expected_version=v1)
    store.current_version_dir = real
    assert set(store.list_versions()) == before
    assert store.current_version_dir() == v1
