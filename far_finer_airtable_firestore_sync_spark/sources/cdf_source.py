"""``store_cdf``: a Spark 4 Python DataSource that tails a
DocumentStore's Change Data Feed — the streaming consumer contract the
r9 VERDICT asked for (#4/#3): ``readStream`` the store's own CDC with
exactly-once version offsets, the way a downstream pipeline actually
tails a synced table (Delta's ``readChangeFeed`` shape; the reference
has no incremental consumer at all — every sync re-reads the world,
lib/AirtableDataFetcher.py:14-37).

Design: commits made with ``cdf=True`` (``DocumentStore.commit`` /
``delete_where`` / ``update_where``) write their OWN row-level changes
as a ``_changes/`` parquet sidecar inside the version directory, in
the ``diff_frames(include_old=True)`` schema (key, change_type,
post-image columns, ``old_<col>`` pre-images). This source then never
diffs anything:

- **offset** = the basename of the newest consumed version directory
  (name order == commit order — fixed-width epoch ms; the same
  name-boundary rule the record-feed source uses, so a replayed batch
  re-reads exactly the recorded version range no matter what has
  landed since);
- **micro-batch** = the change files of the versions in
  ``(start, end]``, ONE InputPartition PER CHANGE FILE — executors
  read their files in parallel (pyarrow), nothing funnels through the
  driver;
- ``commit_ms`` (parsed from the version name) is appended to every
  row, so consumers can order/window by commit time.

Fail-loud contract: a version inside the offset range that lacks a
``_changes/`` sidecar raises — it was committed without ``cdf=True``,
and silently skipping it would serve a feed with holes. Vacuumed
versions inside a not-yet-consumed range fail the same way Delta CDF
does after VACUUM passes the retention window.

Scale shape: offsets are O(1) directory-name comparisons; each batch
opens only its own versions' sidecar files (sliver-sized for DML
commits — predicate DML writes its delta directly, no diff join); the
per-file partitioning parallelizes reads across executors.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Optional

from pyspark.sql import types as T

from far_finer_airtable_firestore_sync_spark.sources.store import (
    _CHANGES_DIR,
    _POINTER,
    version_commit_ms,
)

try:  # pyspark >= 4
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    _HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover - older pyspark
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceReader = object  # type: ignore[assignment,misc]
    DataSourceStreamReader = object  # type: ignore[assignment,misc]
    InputPartition = object  # type: ignore[assignment,misc]
    _HAS_DATASOURCE_API = False


def _current_rel(root: str) -> Optional[str]:
    """The store pointer's current version basename (no DocumentStore
    instance needed — the reader must stay picklable/driver-light)."""
    try:
        with open(os.path.join(root, _POINTER)) as fh:
            return json.load(fh)["version_dir"]
    except FileNotFoundError:
        return None


def _committed_versions(root: str) -> list[str]:
    """Version basenames committed AT OR BEFORE the current pointer,
    oldest first. Bounding by the pointer matters: a version directory
    exists on disk BEFORE its pointer flip (data, then sidecars, then
    flip), so an unbounded listing could read a commit that is still
    in flight — the flip is the commit point, exactly like the store's
    own readers."""
    cur = _current_rel(root)
    if cur is None:
        return []
    return sorted(
        d
        for d in os.listdir(root)
        if d.startswith("v-")
        and os.path.isdir(os.path.join(root, d))
        and d <= cur
    )


def _change_files(root: str, version: str) -> list[str]:
    ch = os.path.join(root, version, _CHANGES_DIR)
    if not os.path.isdir(ch):
        raise ValueError(
            f"store version {version!r} has no {_CHANGES_DIR}/ sidecar: "
            "it was committed without cdf=True (or vacuumed); the "
            "change feed cannot serve a range with holes"
        )
    return sorted(
        os.path.join(ch, f)
        for f in os.listdir(ch)
        if f.endswith(".parquet")
    )


def _arrow_ddl(field) -> str:
    """Arrow field -> Spark DDL type for the CDF sidecar columns (the
    sidecars are written by Spark itself, so only Spark-writable
    primitive types appear)."""
    import pyarrow as pa

    t = field.type
    if pa.types.is_int64(t):
        return "bigint"
    if pa.types.is_int32(t):
        return "int"
    if pa.types.is_int16(t):
        return "smallint"
    if pa.types.is_int8(t):
        return "tinyint"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    raise ValueError(
        f"store_cdf: unsupported sidecar column type {t} "
        f"for column {field.name!r}"
    )


class ChangeFilePartition(InputPartition):
    """One change file of one committed version (picklable plain
    fields only — ships to executors)."""

    def __init__(self, path: str, commit_ms: int):
        self.path = path
        self.commit_ms = commit_ms


def _sidecar_batches(
    path: str, schema: T.StructType, extra: list[tuple[str, object]]
):
    """Executor-side read of one change file as ARROW RECORD BATCHES —
    the Python DataSource API's Arrow path: columns are projected BY
    NAME onto the query schema (an older sidecar missing a
    later-added column yields typed NULLs — additive schema evolution
    tolerated, and the MULTIPLEXED reader projects each feed's
    narrower sidecar onto the union schema the same way) and the
    per-partition constants in ``extra`` (commit_ms, commit_version,
    feed tag) are appended as constant columns (int64 or string by
    value type). Yielding ``pyarrow.RecordBatch`` instead of row
    tuples keeps the feed columnar end to end — no ``to_pylist``
    materialization and no per-row pickling across the Python/JVM
    boundary (optimization guide §4: batches, not rows, cross the
    boundary)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_type

    tbl = pq.read_table(path)
    n = tbl.num_rows
    arrays, fields = [], []
    payload = schema.fields[: len(schema.fields) - len(extra)]
    for f in payload:
        at = to_arrow_type(f.dataType)
        if f.name in tbl.column_names:
            col = tbl.column(f.name)
            if col.type != at:
                col = col.cast(at)
        else:
            col = pa.nulls(n, at)
        arrays.append(col)
        fields.append(pa.field(f.name, at))
    for name, value in extra:
        at = pa.string() if isinstance(value, str) else pa.int64()
        arrays.append(pa.repeat(pa.scalar(value, at), n))
        fields.append(pa.field(name, at))
    yield from pa.table(arrays, schema=pa.schema(fields)).to_batches()


def _newest_sidecar_fields(root: str) -> list:
    """Arrow fields of the NEWEST committed sidecar — the per-root
    schema anchor (additive schema evolution means later sidecars
    carry a SUPERSET of columns; anchoring on the first would
    silently hide every later-added column; anchoring on the newest
    projects older files by name with typed NULLs — the read path's
    contract)."""
    import pyarrow.parquet as pq

    for v in reversed(_committed_versions(root)):
        ch = os.path.join(root, v, _CHANGES_DIR)
        if os.path.isdir(ch):
            files = [
                f for f in os.listdir(ch) if f.endswith(".parquet")
            ]
            if files:
                return list(pq.read_schema(os.path.join(ch, files[0])))
    raise ValueError(
        f"store {root!r} has no cdf-enabled commits: commit with "
        "cdf=True before reading the change feed"
    )


#: feed-tag column the MULTIPLEXED reader appends (same name the
#: consumers' hand-built tagged union used, so downstream code is
#: byte-identical either way)
_FEED_COL = "_ffs_feed"


class StoreCDFDataSource(DataSource):
    """``spark.read/readStream.format("store_cdf").option("path",
    store_root)`` — batch reads the full recorded feed; streaming
    tails it with exactly-once version-name offsets.

    MULTIPLEXED form (round 11, optimization):
    ``.option("paths", "root1,root2,...")` with
    ``.option("tags", "fact,dim0,...")`` tails SEVERAL stores'
    feeds through ONE source — the schema is the by-name union of
    the per-root sidecar schemas (typed NULLs where a feed lacks a
    column — exactly the ``unionByName(allowMissingColumns=True)``
    frame consumers previously built from N separate sources) plus
    ``commit_ms`` and a ``_ffs_feed`` tag column. Every Python
    streaming source costs one dedicated runner PROCESS per query
    start (~1-1.5 s each: interpreter + pyspark import + handshake;
    guide §4 — the Python boundary's fixed costs); a star consumer
    tailing N+1 feeds through one multiplexed source pays that once
    instead of N+1 times, at every (re)start. Offsets are per-tag
    version names, so exactly-once replay semantics are unchanged
    feed by feed."""

    @classmethod
    def name(cls) -> str:
        return "store_cdf"

    def _mux(self) -> Optional[tuple[list[str], list[str]]]:
        if "paths" not in self.options:
            return None
        roots = [p for p in self.options["paths"].split(",") if p]
        tags = [
            t
            for t in self.options.get(
                "tags",
                ",".join(f"feed{i}" for i in range(len(roots))),
            ).split(",")
            if t
        ]
        if len(tags) != len(roots):
            raise ValueError(
                "store_cdf: 'tags' must name one tag per path"
            )
        # duplicate tags would collapse the per-tag offset map (one
        # store's version window compared against another's names —
        # silent replay loss/duplication). Commas inside a path/tag
        # are rejected in load_feeds, before the options are joined
        # (r11 ADVICE).
        if len(set(tags)) != len(tags):
            raise ValueError(
                "store_cdf: duplicate feed tags — each multiplexed "
                "feed needs a distinct tag (offsets are per tag)"
            )
        return roots, tags

    def schema(self) -> str:
        mux = self._mux()
        if mux is None:
            fields = _newest_sidecar_fields(self.options["path"])
            cols = ", ".join(
                f"`{f.name}` {_arrow_ddl(f)}" for f in fields
            )
            return f"{cols}, commit_ms bigint"
        roots, _tags = mux
        # by-name union across feeds, first occurrence anchors the
        # type — the unionByName(allowMissingColumns) shape
        seen: dict[str, str] = {}
        order: list[str] = []
        for root in roots:
            for f in _newest_sidecar_fields(root):
                if f.name not in seen:
                    seen[f.name] = _arrow_ddl(f)
                    order.append(f.name)
        cols = ", ".join(f"`{n}` {seen[n]}" for n in order)
        return f"{cols}, commit_ms bigint, `{_FEED_COL}` string"

    def reader(self, schema: T.StructType) -> "StoreCDFBatchReader":
        if self._mux() is not None:
            raise ValueError(
                "store_cdf: the multiplexed form is streaming-only"
            )
        return StoreCDFBatchReader(self.options["path"], schema)

    def streamReader(
        self, schema: T.StructType
    ) -> "DataSourceStreamReader":
        mux = self._mux()
        if mux is not None:
            return StoreCDFMuxStreamReader(mux[0], mux[1], schema)
        return StoreCDFStreamReader(self.options["path"], schema)


class StoreCDFBatchReader(DataSourceReader):
    """The whole recorded feed as one batch frame (every committed
    version's sidecar) — the batch twin of the stream."""

    def __init__(self, root: str, schema: T.StructType):
        self.root = root
        self.schema_ = schema

    def partitions(self) -> list[ChangeFilePartition]:
        parts = []
        for v in _committed_versions(self.root):
            ms = version_commit_ms(v)
            for path in _change_files(self.root, v):
                parts.append(ChangeFilePartition(path, ms))
        return parts

    def read(self, partition: ChangeFilePartition):
        return _sidecar_batches(
            partition.path, self.schema_,
            [("commit_ms", partition.commit_ms)],
        )


class StoreCDFStreamReader(DataSourceStreamReader):
    """Exactly-once CDF tail: offset = newest consumed version NAME.

    Name-boundary slicing (not counts) makes every replayed batch
    read exactly the recorded version range regardless of later
    commits — the lesson the record-feed source's offset already
    encodes. Offsets are checkpointed by Spark; a forced restart
    resumes from the last committed batch's end offset."""

    def __init__(self, root: str, schema: T.StructType):
        self.root = root
        self.schema_ = schema

    def initialOffset(self) -> dict:
        return {"last": ""}

    def latestOffset(self) -> dict:
        versions = _committed_versions(self.root)
        return {"last": versions[-1] if versions else ""}

    def partitions(
        self, start: dict, end: dict
    ) -> list[ChangeFilePartition]:
        lo, hi = start.get("last", ""), end.get("last", "")
        parts = []
        for v in _committed_versions(self.root):
            if not (v > lo and v <= hi):
                continue
            ms = version_commit_ms(v)
            for path in _change_files(self.root, v):
                parts.append(ChangeFilePartition(path, ms))
        return parts

    def read(self, partition: ChangeFilePartition):
        return _sidecar_batches(
            partition.path, self.schema_,
            [("commit_ms", partition.commit_ms)],
        )

    def commit(self, end: dict) -> None:
        # offsets live in Spark's checkpoint; the source keeps no
        # state of its own (versions are immutable until vacuum)
        pass


class MuxChangeFilePartition(InputPartition):
    """One change file of one committed version of one multiplexed
    feed (picklable plain fields only)."""

    def __init__(self, path: str, commit_ms: int, tag: str):
        self.path = path
        self.commit_ms = commit_ms
        self.tag = tag


class StoreCDFMuxStreamReader(DataSourceStreamReader):
    """Exactly-once CDF tail over SEVERAL stores through one source:
    the offset is a per-tag map of newest consumed version names, so
    each feed keeps the exact name-boundary replay semantics of the
    single-feed reader — one runner process per query instead of one
    per feed (see :class:`StoreCDFDataSource`)."""

    def __init__(
        self, roots: list[str], tags: list[str], schema: T.StructType
    ):
        self.roots = roots
        self.tags = tags
        self.schema_ = schema

    def initialOffset(self) -> dict:
        return {"last": {t: "" for t in self.tags}}

    def latestOffset(self) -> dict:
        out = {}
        for t, r in zip(self.tags, self.roots):
            versions = _committed_versions(r)
            out[t] = versions[-1] if versions else ""
        return {"last": out}

    def partitions(
        self, start: dict, end: dict
    ) -> list[MuxChangeFilePartition]:
        lo_map = start.get("last", {})
        hi_map = end.get("last", {})
        parts = []
        for t, r in zip(self.tags, self.roots):
            lo, hi = lo_map.get(t, ""), hi_map.get(t, "")
            for v in _committed_versions(r):
                if not (v > lo and v <= hi):
                    continue
                ms = version_commit_ms(v)
                for path in _change_files(r, v):
                    parts.append(MuxChangeFilePartition(path, ms, t))
        return parts

    def read(self, partition: MuxChangeFilePartition):
        return _sidecar_batches(
            partition.path, self.schema_,
            [
                ("commit_ms", partition.commit_ms),
                (_FEED_COL, partition.tag),
            ],
        )

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint


def load_feeds(
    spark, roots: list[str], tags: list[str]
) -> tuple["DataFrame", list[list[str]]]:  # noqa: F821
    """One MULTIPLEXED change-feed stream over ``roots`` (tag column
    ``_ffs_feed``), plus each feed's standalone column list (sidecar
    columns + ``commit_ms``) — what the star/join consumers need to
    slice the tagged union back into per-feed frames. Equivalent to N
    separate ``readStream.format("store_cdf")`` loads unioned
    ``allowMissingColumns`` — but one Python runner process per query
    start instead of N (guide §4)."""
    bad = [x for x in [*roots, *tags] if "," in x]
    if bad:
        raise ValueError(
            f"load_feeds: {bad} contain ',' — the multiplexed "
            "options are comma-separated and cannot encode them"
        )
    feed_cols = [
        [f.name for f in _newest_sidecar_fields(r)] + ["commit_ms"]
        for r in roots
    ]
    stream = (
        spark.readStream.format("store_cdf")
        .option("paths", ",".join(roots))
        .option("tags", ",".join(tags))
        .load()
    )
    return stream, feed_cols


def register(spark) -> bool:
    """Register the connector on a session; returns False when the
    pyspark.sql.datasource API is unavailable (pyspark < 4)."""
    if not _HAS_DATASOURCE_API:
        return False
    spark.dataSource.register(StoreCDFDataSource)
    return True


# -- CDF over the LOCK-FREE MULTI-WRITER LOG ----------------------------------
#
# The TransactionalParquetBackend's commit log gives the feed an even
# stronger offset than version NAMES: versions are DENSE INTEGERS
# (exactly one writer owns N+1), so the stream offset is simply the
# newest consumed log version. Maintenance commits (compact /
# optimize_zorder) are LOGICAL NO-OPS and are skipped — Delta CDF
# skips OPTIMIZE commits the same way; any other commit in a consumed
# range that lacks a sidecar fails loudly (a feed with silent holes
# is worse than no feed).

_TXN_MAINTENANCE_KINDS = {"compact", "optimize_zorder", "optimize_binpack"}


def _txn_version_index(root: str) -> dict[int, str]:
    """version -> record path for a ``TransactionalParquetBackend``
    log: ONE directory listing, no JSON parsing — the streaming hot
    path (``latestOffset`` fires every trigger) must not re-parse an
    O(total commits) record set just to learn the head."""
    log = os.path.join(root, "_log")
    if not os.path.isdir(log):
        raise ValueError(f"{root!r} has no _log/: not a transactional store")
    index = {}
    for f in os.listdir(log):
        if not f.endswith(".json") or f.startswith("_"):
            continue
        try:
            index[int(f[:-5])] = os.path.join(log, f)
        except ValueError:
            continue
    return index


def _txn_records(
    root: str, lo: int = 0, hi: Optional[int] = None
) -> list[tuple[int, dict]]:
    """Committed log records with ``lo < version <= hi``, version
    order — JSON is parsed ONLY for the requested range, so a
    micro-batch pays for its own versions, never the table's
    lifetime."""
    index = _txn_version_index(root)
    out = []
    for v in sorted(index):
        if v <= lo or (hi is not None and v > hi):
            continue
        with open(index[v]) as fh:
            out.append((v, json.load(fh)))
    return out


class TxnChangeFilePartition(InputPartition):
    """One change file of one committed log version."""

    def __init__(self, path: str, commit_ms: int, commit_version: int):
        self.path = path
        self.commit_ms = commit_ms
        self.commit_version = commit_version


def _txn_feed_partitions(
    root: str, recs: list[tuple[int, dict]]
) -> list[TxnChangeFilePartition]:
    parts = []
    for v, rec in recs:
        kind = (rec.get("op") or {}).get("kind", "snapshot")
        if kind in _TXN_MAINTENANCE_KINDS:
            continue  # logical no-op: nothing to feed, nothing to fail
        ch = os.path.join(root, rec["version_dir"], _CHANGES_DIR)
        if not os.path.isdir(ch):
            raise ValueError(
                f"log version {v} ({kind}) has no {_CHANGES_DIR}/ "
                "sidecar (not committed with cdf=True, or its data "
                "was retention-vacuumed): start the feed past it "
                "with .option('startingVersion', N) — a feed with "
                "silent holes would under-maintain every consumer"
            )
        files = sorted(
            os.path.join(ch, f)
            for f in os.listdir(ch)
            if f.endswith(".parquet")
        )
        for path in files:
            parts.append(
                TxnChangeFilePartition(path, int(rec["ts_ms"]), v)
            )
    return parts


class TxnCDFDataSource(DataSource):
    """``spark.read/readStream.format("store_cdf_txn").option("path",
    backend_root)`` — the change feed of the lock-free multi-writer
    log; streaming offsets are the dense integer log versions."""

    @classmethod
    def name(cls) -> str:
        return "store_cdf_txn"

    def _starting_version(self) -> int:
        """First version the feed serves (default 1). Versions below
        are never opened — the escape hatch for retention-vacuumed or
        pre-CDF history."""
        return int(self.options.get("startingVersion", 1))

    def schema(self) -> str:
        import pyarrow.parquet as pq

        root = self.options["path"]
        # newest sidecar anchors the schema (additive evolution —
        # same argument as StoreCDFDataSource.schema)
        for _v, rec in reversed(_txn_records(root)):
            ch = os.path.join(root, rec["version_dir"], _CHANGES_DIR)
            if os.path.isdir(ch):
                files = [
                    f for f in os.listdir(ch) if f.endswith(".parquet")
                ]
                if files:
                    sch = pq.read_schema(os.path.join(ch, files[0]))
                    cols = ", ".join(
                        f"`{f.name}` {_arrow_ddl(f)}" for f in sch
                    )
                    return (
                        f"{cols}, commit_ms bigint, commit_version bigint"
                    )
        raise ValueError(
            f"transactional store {root!r} has no cdf-enabled commits: "
            "commit with cdf=True before reading the change feed"
        )

    def reader(self, schema: T.StructType) -> "TxnCDFBatchReader":
        return TxnCDFBatchReader(
            self.options["path"], schema, self._starting_version()
        )

    def streamReader(self, schema: T.StructType) -> "TxnCDFStreamReader":
        return TxnCDFStreamReader(
            self.options["path"], schema, self._starting_version()
        )


class TxnCDFBatchReader(DataSourceReader):
    def __init__(
        self, root: str, schema: T.StructType, starting_version: int = 1
    ):
        self.root = root
        self.schema_ = schema
        self.starting_version = starting_version

    def partitions(self) -> list[TxnChangeFilePartition]:
        return _txn_feed_partitions(
            self.root, _txn_records(self.root, lo=self.starting_version - 1)
        )

    def read(self, partition: TxnChangeFilePartition):
        return _sidecar_batches(
            partition.path, self.schema_,
            [
                ("commit_ms", partition.commit_ms),
                ("commit_version", partition.commit_version),
            ],
        )


class TxnCDFStreamReader(DataSourceStreamReader):
    """Exactly-once CDF tail over the commit log: offset = newest
    consumed log VERSION (dense integers — exactly one writer owns
    N+1, so boundary slicing is exact no matter how many rivals land
    between batches or during a restart). ``startingVersion`` begins
    the feed past retention-vacuumed or pre-CDF history."""

    def __init__(
        self, root: str, schema: T.StructType, starting_version: int = 1
    ):
        self.root = root
        self.schema_ = schema
        self.starting_version = starting_version

    def initialOffset(self) -> dict:
        return {"v": self.starting_version - 1}

    def latestOffset(self) -> dict:
        # one directory listing, no JSON parse — fires every trigger
        index = _txn_version_index(self.root)
        return {"v": max(index) if index else 0}

    def partitions(
        self, start: dict, end: dict
    ) -> list[TxnChangeFilePartition]:
        lo, hi = int(start.get("v", 0)), int(end.get("v", 0))
        return _txn_feed_partitions(
            self.root, _txn_records(self.root, lo=lo, hi=hi)
        )

    def read(self, partition: TxnChangeFilePartition):
        return _sidecar_batches(
            partition.path, self.schema_,
            [
                ("commit_ms", partition.commit_ms),
                ("commit_version", partition.commit_version),
            ],
        )

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; log records are immutable


def register_txn(spark) -> bool:
    """Register the transactional-log CDF connector; False when the
    pyspark.sql.datasource API is unavailable (pyspark < 4)."""
    if not _HAS_DATASOURCE_API:
        return False
    spark.dataSource.register(TxnCDFDataSource)
    return True
