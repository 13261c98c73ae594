"""Store backend seam (SCALE.md: "a Delta/Iceberg backend slots in
without touching strategy code").

Strategies are pure post-state builders (DataFrame, DataFrame, spec) ->
DataFrame; the only storage contract :class:`~..plans.pipeline.
SyncPipeline` relies on is the three-method :class:`StoreBackend`
protocol below. ``DocumentStore`` (versioned parquet + pointer flip)
is the default implementation; :class:`MergeSemanticsBackend` here is
a second, deliberately different one that stores a single logical
table and applies every commit as **row-level MERGE operations**
(derive insert/update/delete vs the current snapshot, then apply them
Delta-``MERGE``-shaped: WHEN MATCHED UPDATE, WHEN NOT MATCHED INSERT,
WHEN NOT MATCHED BY SOURCE DELETE). A real Delta/Iceberg adapter is
this class with the apply step swapped for ``DeltaTable.merge`` /
``MERGE INTO`` — the op derivation and the pipeline wiring stay as-is.
"""

from __future__ import annotations

from typing import Optional, Protocol, runtime_checkable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@runtime_checkable
class StoreBackend(Protocol):
    """What SyncPipeline needs from a storage layer — nothing more."""

    def read(self) -> Optional[DataFrame]:
        """Current snapshot, or None if the store is empty."""

    def read_or_empty(self, like: DataFrame) -> DataFrame:
        """Current snapshot, or an empty frame shaped like ``like``."""

    def commit(
        self,
        post_state: DataFrame,
        partition_by: Optional[list[str]] = None,
        expected_version: Optional[str] = None,
    ) -> str:
        """Persist ``post_state`` as the new current snapshot and
        return an opaque committed-version handle."""


class MergeSemanticsBackend:
    """In-memory MERGE-applying backend proving the StoreBackend seam.

    Unlike ``DocumentStore`` (which persists the post-state wholesale),
    each commit here is decomposed into the row-level operations a
    transactional MERGE backend would receive:

    - rows in post but not current (by key)    -> INSERT
    - rows in both with any column changed     -> UPDATE
    - rows in current but not post             -> DELETE

    and then *applied* to the stored snapshot (matched rows replaced,
    unmatched inserted, absent-from-source deleted) rather than the
    post-state being adopted directly — so the test asserting this
    backend converges to the same snapshot as DocumentStore is real
    evidence the strategies' post-states are MERGE-expressible.

    ``last_merge_ops`` keeps the op counts of the most recent commit
    for assertions. Driver-side state is only the version counter; the
    snapshot lives in a (local-checkpointed) DataFrame.
    """

    def __init__(self, spark: SparkSession, key_col: str = "doc_id"):
        self.spark = spark
        self.key_col = key_col
        self._state: Optional[DataFrame] = None
        self._version = 0
        self.last_merge_ops: Optional[dict] = None

    def read(self) -> Optional[DataFrame]:
        return self._state

    def read_or_empty(self, like: DataFrame) -> DataFrame:
        if self._state is not None:
            return self._state
        return self.spark.createDataFrame([], like.schema)

    def current_version(self) -> Optional[str]:
        return f"mem://{self._version}" if self._version else None

    def _derive_ops(self, current: DataFrame, post: DataFrame) -> DataFrame:
        """One full-outer join on the key -> tagged MERGE source."""
        key = self.key_col
        cols = [c for c in post.columns if c != key]
        cur = current.alias("c")
        new = post.alias("p")
        j = cur.join(new, F.col(f"c.{key}") == F.col(f"p.{key}"), "full_outer")
        same = F.lit(True)
        for c in cols:
            same = same & F.col(f"c.{c}").eqNullSafe(F.col(f"p.{c}"))
        op = (
            F.when(F.col(f"c.{key}").isNull(), F.lit("insert"))
            .when(F.col(f"p.{key}").isNull(), F.lit("delete"))
            .when(~same, F.lit("update"))
        )
        return (
            j.withColumn("_op", op)
            .filter(F.col("_op").isNotNull())
            .select(
                "_op",
                F.coalesce(F.col(f"p.{key}"), F.col(f"c.{key}")).alias(key),
                *[F.col(f"p.{c}").alias(c) for c in cols],
            )
        )

    def commit(
        self,
        post_state: DataFrame,
        partition_by: Optional[list[str]] = None,
        expected_version: Optional[str] = None,
    ) -> str:
        key = self.key_col
        # Materialize the plan once, like a physical table write would
        # (strategies may reference the previous snapshot, so the new
        # state must not stay lazy over mutable backend internals).
        post = post_state.localCheckpoint(eager=True)
        if self._state is None:
            ops = post.select(F.lit("insert").alias("_op"), *post.columns)
            merged = post
        else:
            ops = self._derive_ops(self._state, post).localCheckpoint(eager=True)
            # MERGE application against the CURRENT snapshot:
            #   matched UPDATE / NOT-matched-by-source DELETE -> drop the
            #   keyed rows, then insert the upsert side's new images.
            touched = ops.select(key)
            upserts = ops.filter(F.col("_op") != "delete").drop("_op")
            merged = (
                self._state.join(touched, key, "left_anti")
                .unionByName(upserts)
                .localCheckpoint(eager=True)
            )
        counts = {r["_op"]: r["n"] for r in ops.groupBy("_op").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        self.last_merge_ops = {
            "insert": counts.get("insert", 0),
            "update": counts.get("update", 0),
            "delete": counts.get("delete", 0),
        }
        self._state = merged
        self._version += 1
        return f"mem://{self._version}"
