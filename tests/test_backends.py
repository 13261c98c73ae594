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


# ---------------------------------------------------------------------------
# TransactionalParquetBackend: lock-free multi-writer CAS (round 7)
# ---------------------------------------------------------------------------

from far_finer_airtable_firestore_sync_spark.sources.backends import (  # noqa: E402
    TransactionalParquetBackend,
)
from far_finer_airtable_firestore_sync_spark.sources.store import (  # noqa: E402
    ConcurrentCommitError,
)


def test_txn_backend_satisfies_protocol(spark, tmp_path):
    assert isinstance(
        TransactionalParquetBackend(spark, str(tmp_path / "t")), StoreBackend
    )


@pytest.mark.parametrize(
    "ut",
    [
        UpdateType.UPSERT_CHECKSUM,
        UpdateType.UPSERT_CHECKSUM_WITH_DELETE,
        UpdateType.VERSIONED_CHECKSUM,
        UpdateType.APPEND,
    ],
)
def test_strategy_parity_txn_backend(spark, tmp_path, ut):
    """The seam claim for the log-structured backend: every strategy
    family lands on the identical snapshot as the pointer-flip store,
    zero strategy-code changes."""
    parquet = DocumentStore(spark, str(tmp_path / "store"))
    txnb = TransactionalParquetBackend(
        spark, str(tmp_path / "txn"), key_col="doc_id"
    )
    for backend in (parquet, txnb):
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
            (
                tuple(sorted(r.asDict().items()))
                for r in backend.read().collect()
            ),
            key=repr,
        )

    assert rows(parquet) == rows(txnb)
    assert len(rows(txnb)) > 0


def test_txn_backend_two_writer_interleaved_no_lost_update(spark, tmp_path):
    """Two independent writer instances (no shared state, no locks —
    the cross-host shape) interleave read-modify-write commits; the
    CAS detects the conflict and the bounded-retry loop re-derives, so
    BOTH writers' rows land and the log is a gap-free version chain."""
    root = str(tmp_path / "mw")
    a = TransactionalParquetBackend(spark, root, writer_id="A")
    b = TransactionalParquetBackend(spark, root, writer_id="B")

    def upsert(new_rows):
        def build(cur):
            fresh = spark.createDataFrame(new_rows, "k long, who string")
            if cur is None:
                return fresh
            return cur.join(fresh.select("k"), "k", "left_anti").unionByName(
                fresh
            )

        return build

    # both writers capture the SAME (empty) base — "txn://0" is the
    # explicit empty-base CAS handle (None would mean blind commit)
    base_a = a.current_version() or "txn://0"
    build_a = upsert([(i, "A") for i in range(0, 10, 2)])
    # ...B commits first and wins
    b.commit_with(upsert([(i, "B") for i in range(1, 10, 2)]))
    # A's CAS against its stale base must fail...
    with pytest.raises(ConcurrentCommitError):
        a.commit(build_a(None), expected_version=base_a)
    # ...and its retry loop must land on top of B's state
    a.commit_with(build_a)

    snap = {r["k"]: r["who"] for r in a.read().collect()}
    assert snap == {i: ("A" if i % 2 == 0 else "B") for i in range(10)}
    versions = [r["version"] for r in a.history().collect()]
    assert versions == sorted(versions) and versions == list(
        range(1, len(versions) + 1)
    )
    writers = {r["writer"] for r in a.history().collect()}
    assert writers == {"A", "B"}


def test_txn_backend_three_writer_counter_stress(spark, tmp_path):
    """3 writers x 3 increments each of a single-row counter, fully
    interleaved: lost updates would make the final count < 9."""
    root = str(tmp_path / "ctr")
    writers = [
        TransactionalParquetBackend(spark, root, writer_id=w)
        for w in ("w0", "w1", "w2")
    ]

    def incr(cur):
        if cur is None:
            return spark.createDataFrame([(1,)], "n long")
        return cur.selectExpr("n + 1 as n")

    for _round in range(3):
        for w in writers:
            w.commit_with(incr)
    assert writers[0].read().collect()[0]["n"] == 9
    assert [r["version"] for r in writers[0].history().collect()] == list(
        range(1, 10)
    )


def test_txn_backend_txn_map_survives_interleaving(spark, tmp_path):
    """The per-app replay map (txnAppId/txnVersion) merges forward
    through conflicting writers: a retry that lands AFTER another
    app's commit preserves both markers."""
    root = str(tmp_path / "txns")
    a = TransactionalParquetBackend(spark, root, writer_id="A")
    b = TransactionalParquetBackend(spark, root, writer_id="B")
    one = spark.createDataFrame([(1, "x")], "k long, v string")
    a.commit(one, txn=("appA", "5"))
    b.commit(one, txn=("appB", "7"))
    # blind commit (no expected_version) from A must retry internally
    # if racing, and must carry BOTH markers forward
    a.commit(one)
    assert a.last_txn("appA") == "5"
    assert a.last_txn("appB") == "7"
    assert b.last_txn("appA") == "5"


def test_txn_backend_cas_exhaustion_raises(spark, tmp_path):
    """A build function whose base is ALWAYS stale (a rival commits
    between read and publish every time) exhausts the bounded retries
    with ConcurrentCommitError instead of spinning forever."""
    root = str(tmp_path / "exh")
    a = TransactionalParquetBackend(spark, root, writer_id="A")
    b = TransactionalParquetBackend(spark, root, writer_id="B")
    one = spark.createDataFrame([(1,)], "n long")
    a.commit(one)

    def hostile(cur):
        b.commit(one)  # rival always lands first
        return one

    with pytest.raises(ConcurrentCommitError, match="after 3 attempts"):
        a.commit_with(hostile, max_retries=2)


def test_txn_backend_true_thread_concurrency(spark, tmp_path):
    """REAL concurrent writers (threads submitting Spark jobs in
    parallel, genuinely racing on the commit log) — not a scripted
    interleaving: 3 threads x 3 commit_with increments each must land
    all 9 without a lost update, and the log must be the contiguous
    chain 1..9."""
    import threading

    root = str(tmp_path / "threads")
    errs = []

    def incr(cur):
        if cur is None:
            return spark.createDataFrame([(1,)], "n long")
        return cur.selectExpr("n + 1 as n")

    def worker(wid):
        b = TransactionalParquetBackend(spark, root, writer_id=wid)
        try:
            for _ in range(3):
                b.commit_with(incr, max_retries=20)
        except Exception as exc:  # noqa: BLE001
            errs.append((wid, exc))

    threads = [
        threading.Thread(target=worker, args=(f"t{i}",)) for i in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    reader = TransactionalParquetBackend(spark, root)
    assert reader.read().collect()[0]["n"] == 9
    versions = [r["version"] for r in reader.history().collect()]
    assert versions == list(range(1, 10))


# ---------------------------------------------------------------------------
# r8: log checkpointing (latest() is O(tail), not O(commits)) + orphan GC
# ---------------------------------------------------------------------------


def _synth_log(root: str, n: int) -> None:
    """Write n dense synthetic commit records straight into _log/
    (no parquet — these tests exercise the LOG protocol, not data)."""
    import json
    import os

    log = os.path.join(root, TransactionalParquetBackend._LOG)
    os.makedirs(log, exist_ok=True)
    w = TransactionalParquetBackend._WIDTH
    for v in range(1, n + 1):
        with open(os.path.join(log, f"{v:0{w}d}.json"), "w") as fh:
            json.dump(
                {"version_dir": f"v-{v:08x}", "writer": "s", "ts_ms": v,
                 "txns": {}},
                fh,
            )


def test_txn_latest_is_o_tail_with_checkpoint(spark, tmp_path, monkeypatch):
    """At 1e4 synthetic commits with a fresh checkpoint, latest() must
    resolve with a BOUNDED number of existence probes (no directory
    listing) — the r7 VERDICT scale gap: O(commits) listing on every
    read and CAS retry."""
    import os

    root = str(tmp_path / "big")
    n = 10_000
    _synth_log(root, n)
    b = TransactionalParquetBackend(spark, root, writer_id="r")
    b._write_checkpoint(n)

    real_exists = os.path.exists
    calls = {"n": 0}

    def counting_exists(p):
        calls["n"] += 1
        return real_exists(p)

    monkeypatch.setattr(os.path, "exists", counting_exists)
    real_listdir = os.listdir

    def no_listdir(p):  # pragma: no cover - failure path
        raise AssertionError(f"latest() must not list {p}")

    monkeypatch.setattr(os, "listdir", no_listdir)
    v, rec = b.latest()
    monkeypatch.setattr(os, "listdir", real_listdir)
    assert v == n and rec["version_dir"] == f"v-{n:08x}"
    # 1 probe validates the checkpoint, 1 finds n+1 missing
    assert calls["n"] <= 3, calls


def test_txn_latest_stale_or_missing_checkpoint_falls_back(spark, tmp_path):
    """A stale hint probes forward to the true head; a hint naming a
    nonexistent record (or no hint at all) falls back to probing from
    0 — a checkpoint is advisory, never load-bearing."""
    import json
    import os

    root = str(tmp_path / "stale")
    _synth_log(root, 25)
    b = TransactionalParquetBackend(spark, root, writer_id="r")
    b._write_checkpoint(10)  # stale: head is 25
    assert b.latest()[0] == 25
    with open(b._checkpoint_path(), "w") as fh:
        json.dump({"version": 999}, fh)  # names a missing record
    assert b.latest()[0] == 25
    os.unlink(b._checkpoint_path())
    assert b.latest()[0] == 25
    with open(b._checkpoint_path(), "w") as fh:
        fh.write("{corrupt")  # unreadable hint
    assert b.latest()[0] == 25


def test_txn_commit_rolls_checkpoint_at_interval(spark, tmp_path):
    """CHECKPOINT_INTERVAL real commits auto-publish _last_checkpoint,
    and the multi-writer protocol stays intact across it."""
    import json
    import os

    root = str(tmp_path / "roll")
    b = TransactionalParquetBackend(spark, root, "k", writer_id="a")
    one = spark.createDataFrame([(1, 1)], "k long, n long")
    for i in range(TransactionalParquetBackend.CHECKPOINT_INTERVAL):
        b.commit_with(lambda cur, i=i: one.selectExpr("k", f"{i} as n"))
    assert os.path.exists(b._checkpoint_path())
    with open(b._checkpoint_path()) as fh:
        assert json.load(fh)["version"] == b.CHECKPOINT_INTERVAL
    v, rec = b.latest()
    assert v == b.CHECKPOINT_INTERVAL
    assert b.read().collect()[0]["n"] == b.CHECKPOINT_INTERVAL - 1


def test_txn_vacuum_orphans_removes_only_old_unreferenced(spark, tmp_path):
    """An orphaned v-* dir (crash between parquet write and publish)
    is removed once old enough; referenced dirs and young orphans
    survive (young = possibly a concurrent writer's in-flight data)."""
    import os
    import time

    root = str(tmp_path / "gc")
    b = TransactionalParquetBackend(spark, root, "k", writer_id="a")
    h = b.commit(spark.createDataFrame([(1, "x")], "k long, v string"))
    assert h == "txn://1"
    live = b.latest()[1]["version_dir"]
    old_orphan = os.path.join(root, "v-deadbeef")
    young_orphan = os.path.join(root, "v-cafebabe")
    os.makedirs(old_orphan)
    os.makedirs(young_orphan)
    past = time.time() - 7200
    os.utime(old_orphan, (past, past))
    removed = b.vacuum_orphans(min_age_s=3600)
    assert removed == [old_orphan]
    assert not os.path.exists(old_orphan)
    assert os.path.exists(young_orphan)
    assert os.path.exists(os.path.join(root, live))
    assert b.read().count() == 1


def test_pipeline_cas_rederives_on_concurrent_commit(spark, tmp_path):
    """The flagship E1 path on the transactional backend: while
    pipeline A derives its post-state, a rival commits first. run()
    must detect the CAS conflict and re-derive against the WINNER's
    snapshot — both writers' rows land; and metrics come from the
    winning attempt."""
    root = str(tmp_path / "race")
    ours = TransactionalParquetBackend(spark, root, "Name", writer_id="A")
    rival = TransactionalParquetBackend(spark, root, "Name", writer_id="B")
    ut = UpdateType.UPSERT_CHECKSUM

    # seed version 1 through the pipeline itself (empty-store path)
    res0 = SyncPipeline(
        _spec(ut), ours, catalog=CATALOG, dedup_order_col="Created"
    ).run(_batch1(spark))
    assert res0.committed_path == "txn://1"
    assert res0.metrics["sync_out"]["rows"] == 3

    # Deterministic race: wrap our backend's commit() so the rival
    # appends key z to the store between our snapshot read and our
    # first publish attempt — the first attempt MUST lose its CAS.
    calls = {"n": 0}
    real_commit = ours.commit

    def racing_commit(post, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            rival.commit_with(
                lambda cur: cur.unionByName(
                    spark.createDataFrame([("z",)], "Name string").selectExpr(
                        "Name",
                        *[
                            f"cast(null as {f.dataType.simpleString()})"
                            f" as `{f.name}`"
                            for f in cur.schema.fields
                            if f.name != "Name"
                        ],
                    )
                )
            )
        return real_commit(post, **kw)

    ours.commit = racing_commit
    try:
        res = SyncPipeline(
            _spec(ut, version_id=200),
            ours,
            catalog=CATALOG,
            dedup_order_col="Created",
        ).run(_batch2(spark))
    finally:
        ours.commit = real_commit
    assert calls["n"] >= 2, "first attempt must have hit the CAS conflict"
    names = {r["Name"] for r in ours.read().collect()}
    # batch2 keys upserted AND the rival's z survived the re-derive
    assert {"a", "b", "c", "d", "z"} <= names
    assert res.metrics["sync_out"]["rows"] >= 5
