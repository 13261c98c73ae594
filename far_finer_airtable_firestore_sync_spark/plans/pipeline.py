"""End-to-end sync pipeline (E1 parity).

Reference: ``AirtableToDatastore.run_pipeline``
(lib/AirtableToDatastore.py:28-49): fetch -> typed projection ->
keep-latest dedup -> strategy update. Here the same lifecycle is one
lazy DataFrame plan finished by a single store commit:

    source df -> typed_projection -> filter_valid_pk -> keep_latest
              -> strategy post-state -> DocumentStore.commit

Catalyst pipelines the stages (the reference materializes each one);
the only shuffles are the dedup aggregation and the strategy join,
both keyed on the primary key.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping, Optional

from pyspark.sql import DataFrame

from far_finer_airtable_firestore_sync_spark.config import SyncSpec
from far_finer_airtable_firestore_sync_spark.functions.casts import typed_projection
from far_finer_airtable_firestore_sync_spark.operators.dedup import (
    filter_valid_pk,
    keep_latest,
)
from far_finer_airtable_firestore_sync_spark.operators.strategies import get_strategy
from far_finer_airtable_firestore_sync_spark.sources.store import DocumentStore


@dataclass
class SyncResult:
    post_state: DataFrame
    committed_path: Optional[str]


class SyncPipeline:
    """Builds and executes the strategy plan for one sync run."""

    def __init__(
        self,
        spec: SyncSpec,
        store: DocumentStore,
        catalog: Optional[Mapping[str, str]] = None,
        dedup_order_col: Optional[str] = "Created",
        dedup_tiebreak_col: Optional[str] = None,
    ):
        self.spec = spec
        self.store = store
        self.catalog = catalog
        self.dedup_order_col = dedup_order_col
        self.dedup_tiebreak_col = dedup_tiebreak_col

    def build_post_state(self, source: DataFrame) -> DataFrame:
        """The full lazy plan, no side effects (useful for .explain)."""
        df = source
        if self.catalog is not None:
            df = typed_projection(df, self.catalog)
        df = filter_valid_pk(df, self.spec.primary_key)
        if self.dedup_order_col is not None and self.dedup_order_col in df.columns:
            df = keep_latest(
                df,
                self.spec.primary_key,
                order_col=self.dedup_order_col,
                tiebreak_col=self.dedup_tiebreak_col,
            )
        target = self.store.read()
        if target is None:
            target = df.sparkSession.createDataFrame([], df.schema)
        strategy = get_strategy(self.spec.update_type)
        return strategy(df, target, self.spec)

    def run(self, source: DataFrame, commit: bool = True) -> SyncResult:
        post = self.build_post_state(source)
        path = self.store.commit(post) if commit else None
        return SyncResult(post_state=post, committed_path=path)
