"""Round-6 additions: ADVICE fixes + new operators."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# bucket_drift NULL semantics (round-5 ADVICE)
# ---------------------------------------------------------------------------


def test_bucket_drift_null_row_string_visible(spark, tmp_path):
    """A row whose rendered row-string is NULL must still contribute a
    digest: drift confined to such rows was previously invisible
    (NULL md5 skipped by sum() while count(*) matched)."""
    from far_finer_airtable_firestore_sync_spark.sources.store import (
        DocumentStore,
    )

    store = DocumentStore(spark, str(tmp_path / "bdnull"), "pk")
    # `name` concatenated raw: NULL name -> NULL rendered row string
    row_expr = "cast(pk as string) || '|' || name"
    key_expr = "cast(pk as string)"
    old = spark.createDataFrame(
        [(1, None), (2, "b")], "pk long, name string"
    )
    new = spark.createDataFrame(
        [(1, "was-null"), (2, "b")], "pk long, name string"
    )
    v1, v2 = store.commit(old), store.commit(new)
    # same counts per bucket, content differs ONLY in the NULL-rendered
    # row -> must still be reported
    drift = store.bucket_drift(v1, v2, row_expr, key_expr).collect()
    assert len(drift) == 1
    # and two identical snapshots (both with the NULL-rendered row)
    # report nothing
    v1b = store.commit(old)
    assert store.bucket_drift(v1, v1b, row_expr, key_expr).count() == 0


def test_bucket_drift_null_key_joins(spark, tmp_path):
    """Identical NULL-key populations on both sides must NOT be
    reported as diverging (NULL bucket previously never equi-joined)."""
    from far_finer_airtable_firestore_sync_spark.sources.store import (
        DocumentStore,
    )

    store = DocumentStore(spark, str(tmp_path / "bdkey"), "pk")
    row_expr = "coalesce(cast(pk as string), '<null>') || '|' || name"
    key_expr = "cast(pk as string)"
    df = spark.createDataFrame(
        [(None, "x"), (1, "a")], "pk long, name string"
    )
    v1, v2 = store.commit(df), store.commit(df)
    assert store.bucket_drift(v1, v2, row_expr, key_expr).count() == 0
    # and a drift in the NULL-key row IS seen
    df2 = spark.createDataFrame(
        [(None, "x-changed"), (1, "a")], "pk long, name string"
    )
    v3 = store.commit(df2)
    assert store.bucket_drift(v1, v3, row_expr, key_expr).count() == 1
