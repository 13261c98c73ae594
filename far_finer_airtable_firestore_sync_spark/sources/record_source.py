"""A Spark 4 Python DataSource for Airtable-shaped record feeds.

The reference's source is a REST API returning
``[{"id": ..., "createdTime": ..., "fields": {...}}, ...]``
(lib/AirtableDataFetcher.py:14-37). This module implements that
contract as a first-class **custom connector** via
``pyspark.sql.datasource`` (public Spark 4 API): the scan plans one
InputPartition per page/shard, executors fetch + unwrap their pages in
parallel, and the declared schema gives Catalyst column pruning over
the unwrapped fields.

Offline stand-in: pages live in a directory of JSON-lines files (one
file = one page = one partition) — exactly the paged-REST layout; a
live connector only swaps `_read_page` for an HTTP call per page, the
planning/unwrap/typing machinery is identical. No instructions are
taken from the reference; only the record envelope format is mirrored.

Also provides :func:`unwrap_records` — the batch-DataFrame form of the
same unwrap (P1's ``record['fields']`` projection,
lib/DataProcessor.py:30) for sources already loaded as DataFrames.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pyspark >= 4
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    _HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover - older pyspark
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceReader = object  # type: ignore[assignment,misc]
    InputPartition = object  # type: ignore[assignment,misc]
    _HAS_DATASOURCE_API = False


class RecordFeedDataSource(DataSource):
    """``spark.read.format("record_feed").option("path", dir)``.

    Options:
      path       directory of ``page-*.jsonl`` files (one per partition)
      fields     comma-separated field names to unwrap (the schema);
                 every unwrapped field is read as string — the typed
                 projection stage applies the field-type catalog after
                 (same two-stage shape as the reference: fetch, then
                 DataProcessor casts).
    """

    @classmethod
    def name(cls) -> str:
        return "record_feed"

    def schema(self) -> str:
        fields = [f.strip() for f in self.options["fields"].split(",")]
        cols = ", ".join(f"`{f}` string" for f in fields)
        return f"_record_id string, _created_time string, {cols}"

    def reader(self, schema: T.StructType) -> "RecordFeedReader":
        return RecordFeedReader(self.options["path"], schema)


class PagePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class RecordFeedReader(DataSourceReader):
    def __init__(self, path: str, schema: T.StructType):
        self.path = path
        self.schema = schema

    def partitions(self) -> list[PagePartition]:
        # one partition per page file -> executor-parallel fetch
        pages = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.startswith("page-")
        )
        return [PagePartition(p) for p in pages]

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        field_names = [f.name for f in self.schema.fields[2:]]
        for rec in _read_page(partition.path):
            fields = rec.get("fields", {})
            yield (
                rec.get("id"),
                rec.get("createdTime"),
                *[
                    None if fields.get(n) is None else str(fields.get(n))
                    for n in field_names
                ],
            )


def _read_page(path: str) -> Iterator[dict]:
    """One 'page fetch'. A live connector replaces this with the HTTP
    GET for the page's offset token."""
    with open(path) as fh:
        for line in fh:
            if line.strip():
                yield json.loads(line)


def register(spark) -> bool:
    """Register the connector on a session; returns False when the
    pyspark.sql.datasource API is unavailable (pyspark < 4)."""
    if not _HAS_DATASOURCE_API:
        return False
    spark.dataSource.register(RecordFeedDataSource)
    return True


def unwrap_records(df: DataFrame, fields_col: str = "fields") -> DataFrame:
    """Batch-DataFrame unwrap of the record envelope: project every
    field of the ``fields`` struct to a top-level column
    (P1 parity: lib/DataProcessor.py:30 iterates record['fields'])."""
    dtype = dict(df.dtypes).get(fields_col)
    if dtype is None or not dtype.startswith("struct"):
        raise ValueError(f"{fields_col!r} must be a struct column, got {dtype}")
    inner = [
        f.name
        for f in df.schema[fields_col].dataType.fields  # type: ignore[union-attr]
    ]
    return df.select(
        *[c for c in df.columns if c != fields_col],
        *[F.col(f"{fields_col}.`{n}`").alias(n) for n in inner],
    )
