"""StoreBackend seam proof (SCALE.md claim): strategies + SyncPipeline
run unmodified against a second, MERGE-semantics backend and converge
to the same snapshots as the parquet DocumentStore.
"""

from datetime import datetime

import pytest

from far_finer_airtable_firestore_sync_spark.config import (
    SyncSpecBuilder,
    UpdateType,
)
from far_finer_airtable_firestore_sync_spark.plans.pipeline import SyncPipeline
from far_finer_airtable_firestore_sync_spark.sources.backends import (
    MergeSemanticsBackend,
    StoreBackend,
)
from far_finer_airtable_firestore_sync_spark.sources.store import DocumentStore

SCHEMA = "Name string, Created string, notes string, score string"
CATALOG = {
    "Name": "singleLineText",
    "Created": "dateTime",
    "notes": "multilineText",
    "score": "number",
}


def _spec(ut, version_id=100):
    spec = (
        SyncSpecBuilder()
        .with_primary_key("Name")
        .with_update_type(ut)
        .with_field("Name", "string")
        .with_field("Created", "timestamp")
        .with_field("notes", "string")
        .with_field("score", "double")
        .with_table("seam", "main_view")
        .with_run(datetime(2026, 1, 1), version_id)
        .build()
    )
    return spec


def _batch1(spark):
    return spark.createDataFrame(
        [
            ("a", "2024-01-01 00:00:00", "alpha", "1"),
            ("b", "2024-01-01 00:00:00", "beta", "2"),
            ("c", "2024-01-01 00:00:00", "gamma", "3"),
        ],
        SCHEMA,
    )


def _batch2(spark):
    # a unchanged, b mutated, c gone, d new
    return spark.createDataFrame(
        [
            ("a", "2024-01-01 00:00:00", "alpha", "1"),
            ("b", "2024-02-01 00:00:00", "BETA", "20"),
            ("d", "2024-02-01 00:00:00", "delta", "4"),
        ],
        SCHEMA,
    )


def _snapshot(backend):
    return {
        r["Name"]: {k: v for k, v in r.asDict().items()}
        for r in backend.read().collect()
    }


def test_both_backends_satisfy_protocol(spark, tmp_path):
    assert isinstance(DocumentStore(spark, str(tmp_path / "s")), StoreBackend)
    assert isinstance(MergeSemanticsBackend(spark), StoreBackend)


@pytest.mark.parametrize(
    "ut",
    [UpdateType.UPSERT_CHECKSUM, UpdateType.UPSERT_CHECKSUM_WITH_DELETE],
)
def test_strategy_e2e_parity_across_backends(spark, tmp_path, ut):
    """Same spec, same two batches, zero strategy-code changes: the
    MERGE-applying backend must converge to the parquet store's exact
    snapshot after every run."""
    parquet = DocumentStore(spark, str(tmp_path / "store"))
    merge = MergeSemanticsBackend(spark, key_col="Name")

    for backend in (parquet, merge):
        SyncPipeline(
            _spec(ut), backend, catalog=CATALOG, dedup_order_col="Created"
        ).run(_batch1(spark))
        SyncPipeline(
            _spec(ut, version_id=200),
            backend,
            catalog=CATALOG,
            dedup_order_col="Created",
        ).run(_batch2(spark))

    snap_p, snap_m = _snapshot(parquet), _snapshot(merge)
    assert snap_p == snap_m
    expected = {"a", "b", "d"} if ut == UpdateType.UPSERT_CHECKSUM_WITH_DELETE else {
        "a", "b", "c", "d"
    }
    assert set(snap_p) == expected
    assert snap_p["b"]["notes"] == "BETA" and snap_p["b"]["score"] == 20.0

    # the second commit really decomposed into MERGE ops: b updated,
    # d inserted, c deleted only under the with-delete strategy —
    # a's behavior depends on the strategy's no-op detection (checksum
    # match keeps the stored row image, so 'a' must NOT be an update)
    ops = merge.last_merge_ops
    assert ops["insert"] == 1
    assert ops["update"] >= 1
    assert ops["delete"] == (1 if ut == UpdateType.UPSERT_CHECKSUM_WITH_DELETE else 0)


def test_merge_backend_full_refresh(spark):
    """FULL_REFRESH through the merge backend = delete-all + insert-all
    derived ops, landing on exactly the new batch."""
    merge = MergeSemanticsBackend(spark, key_col="Name")
    SyncPipeline(
        _spec(UpdateType.FULL_REFRESH),
        merge,
        catalog=CATALOG,
        dedup_order_col="Created",
    ).run(_batch1(spark))
    assert set(_snapshot(merge)) == {"a", "b", "c"}
    SyncPipeline(
        _spec(UpdateType.FULL_REFRESH, version_id=200),
        merge,
        catalog=CATALOG,
        dedup_order_col="Created",
    ).run(_batch2(spark))
    assert set(_snapshot(merge)) == {"a", "b", "d"}


@pytest.mark.parametrize(
    "ut",
    [
        UpdateType.FULL_REFRESH,
        UpdateType.REPLACE,
        UpdateType.SOFT_DELETE,
        UpdateType.VERSIONED,
        UpdateType.VERSIONED_CHECKSUM,
        UpdateType.VERSIONED_SET,
        UpdateType.APPEND,
    ],
)
def test_all_strategy_families_parity_across_backends(spark, tmp_path, ut):
    """The seam claim, strategy by strategy: every update-type family
    converges to an identical snapshot (full row multiset, doc_id
    keyed) on both backends with zero strategy-code changes. doc_id is
    the MERGE key — unique per logical row for every family, including
    the versioned ones where Name repeats across versions."""
    parquet = DocumentStore(spark, str(tmp_path / "store"))
    merge = MergeSemanticsBackend(spark, key_col="doc_id")

    for backend in (parquet, merge):
        SyncPipeline(
            _spec(ut), backend, catalog=CATALOG, dedup_order_col="Created"
        ).run(_batch1(spark))
        SyncPipeline(
            _spec(ut, version_id=200),
            backend,
            catalog=CATALOG,
            dedup_order_col="Created",
        ).run(_batch2(spark))

    def rows(backend):
        return sorted(
            (tuple(sorted(r.asDict().items())) for r in backend.read().collect()),
            key=repr,
        )

    assert rows(parquet) == rows(merge)
    assert len(rows(parquet)) > 0
