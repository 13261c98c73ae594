"""PySpark-native sync/analytics engine.

A ground-up re-expression of the capabilities of
antquinonez/Far-Finer-Airtable-Firestore-Sync (see SURVEY.md) as a
library of *plan builders* over Spark DataFrames:

- typed projection against a field-type catalog (DataProcessor parity),
- keep-latest dedup, canonical-JSON row/table checksums,
- ten declarative merge strategies (+ APPEND) as pure functions
  ``(source_df, target_df, spec) -> post-state DataFrame``,
- a parquet-backed keyed document store with MERGE-style apply,
- plus large-scale training-data-pipeline operators (dedup families,
  similarity search, text analysis) the reference does not have.

Everything is deterministic by construction: wall clocks and server
timestamps are replaced by injected ``run_ts`` / ``version_id``
(reference: lib/UpdateStrategies.py:25, lib/FirestoreWrapper.py:46).
"""

from far_finer_airtable_firestore_sync_spark.config import (
    SyncSpec,
    SyncSpecBuilder,
    UpdateType,
)

__all__ = ["SyncSpec", "SyncSpecBuilder", "UpdateType"]
__version__ = "0.1.0"
