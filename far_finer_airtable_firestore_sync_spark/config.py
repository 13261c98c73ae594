"""Job specs: update-type enum, field catalog, sync spec + fluent builder.

Parity notes (reference file:line):
- ``UpdateType`` mirrors lib/AirtablePipelineConfigs.py:5-15, plus
  ``APPEND`` which the reference documents but never implemented
  (reference README.md:58-59).
- ``SyncSpec`` plays the role of ``PipelineConfig``
  (lib/AirtablePipelineConfigs.py:38-49) minus the service-credential
  blocks (out of engine scope), plus the injected determinism knobs
  ``run_ts`` / ``version_id`` that replace the reference's module-level
  wall clock (lib/UpdateStrategies.py:24-25) and Firestore
  SERVER_TIMESTAMP sentinels (lib/FirestoreWrapper.py:46,57).
- ``SyncSpecBuilder`` mirrors lib/AirtableToDatastoreBuilder.py:16-61.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from datetime import datetime, timezone
from enum import Enum
from typing import Optional, Sequence

from far_finer_airtable_firestore_sync_spark.functions.canonical import Field


class UpdateType(Enum):
    """Declarative merge strategies (lib/AirtablePipelineConfigs.py:5-15)."""

    FULL_REFRESH = "full_refresh"
    REPLACE = "replace"
    VERSIONED = "versioned"
    UPSERT_CHECKSUM = "upsert_checksum"
    SOFT_DELETE = "soft_delete"
    UPSERT_CHECKSUM_WITH_DELETE = "upsert_checksum_with_delete"
    VERSIONED_SET = "versioned_set"
    VERSIONED_CHECKSUM = "versioned_checksum"
    VERSIONED_TABLE_CHECKSUM = "versioned_table_checksum"
    UPSERT_TABLE_CHECKSUM = "upsert_table_checksum"
    # Documented-but-unimplemented upstream (reference README.md:58-59);
    # implemented here as insert-if-absent.
    APPEND = "append"


#: Engine-managed columns a strategy may stamp on outgoing rows
#: (lib/UpdateStrategies.py:49-53, 90-95, 129-137, 167-173, 228-233).
ENGINE_COLUMNS = (
    "doc_id",
    "update_type",
    "write_timestamp",
    "version_id",
    "latest",
    "is_deleted",
    "start_date",
    "end_date",
)

DEFAULT_RUN_TS = datetime(2026, 1, 1, 0, 0, 0, tzinfo=timezone.utc)


@dataclass(frozen=True)
class SyncSpec:
    """Declarative spec for one sync run.

    ``payload_fields`` is the typed field catalog of the *source* batch
    — the fields that participate in checksums (the reference computes
    checksums over ``set(record.keys())`` of the incoming record,
    lib/UpdateStrategies.py:217, 144, 86).
    """

    primary_key: str
    update_type: UpdateType
    payload_fields: tuple[Field, ...]
    table_name: str = "table"
    view_name: Optional[str] = None
    run_ts: datetime = DEFAULT_RUN_TS
    version_id: int = 1

    def __post_init__(self) -> None:
        if not self.primary_key:
            raise ValueError("primary_key must be set")
        names = [f.name for f in self.payload_fields]
        if self.primary_key not in names:
            raise ValueError(
                f"primary_key {self.primary_key!r} must be one of the "
                f"payload fields {names}"
            )
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate payload field names in {names}")

    @property
    def payload_names(self) -> list[str]:
        return [f.name for f in self.payload_fields]

    def with_update_type(self, update_type: UpdateType) -> "SyncSpec":
        return replace(self, update_type=update_type)


class SyncSpecBuilder:
    """Fluent builder (parity: lib/AirtableToDatastoreBuilder.py:16-61)."""

    def __init__(self) -> None:
        self._primary_key: Optional[str] = None
        self._update_type: Optional[UpdateType] = None
        self._fields: list[Field] = []
        self._table_name: str = "table"
        self._view_name: Optional[str] = None
        self._run_ts: datetime = DEFAULT_RUN_TS
        self._version_id: int = 1

    def with_primary_key(self, pk: str) -> "SyncSpecBuilder":
        self._primary_key = pk
        return self

    def with_update_type(self, ut: UpdateType) -> "SyncSpecBuilder":
        self._update_type = ut
        return self

    def with_field(self, name: str, kind: str) -> "SyncSpecBuilder":
        self._fields.append(Field(name, kind))
        return self

    def with_fields(self, fields: Sequence[Field]) -> "SyncSpecBuilder":
        self._fields.extend(fields)
        return self

    def with_table(self, table_name: str, view_name: Optional[str] = None) -> "SyncSpecBuilder":
        self._table_name = table_name
        self._view_name = view_name
        return self

    def with_run(self, run_ts: datetime, version_id: int) -> "SyncSpecBuilder":
        self._run_ts = run_ts
        self._version_id = version_id
        return self

    def build(self) -> SyncSpec:
        missing = [
            n
            for n, v in (
                ("primary_key", self._primary_key),
                ("update_type", self._update_type),
                ("fields", self._fields or None),
            )
            if v is None
        ]
        if missing:
            raise ValueError(f"SyncSpecBuilder missing: {missing}")
        return SyncSpec(
            primary_key=self._primary_key,
            update_type=self._update_type,
            payload_fields=tuple(self._fields),
            table_name=self._table_name,
            view_name=self._view_name,
            run_ts=self._run_ts,
            version_id=self._version_id,
        )
