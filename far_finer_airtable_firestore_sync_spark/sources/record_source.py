"""A Spark 4 Python DataSource for Airtable-shaped record feeds.

The reference's source is a REST API returning
``[{"id": ..., "createdTime": ..., "fields": {...}}, ...]``
(lib/AirtableDataFetcher.py:14-37). This module implements that
contract as a first-class **custom connector** via
``pyspark.sql.datasource`` (public Spark 4 API): the scan plans one
InputPartition per page/shard, executors fetch + unwrap their pages in
parallel, and the declared schema gives Catalyst column pruning over
the unwrapped fields.

Two fetch modes:

- **JSONL pages** (``option("path", dir)``): pages live in a directory
  of JSON-lines files (one file = one page = one InputPartition) —
  the paged-REST layout frozen to disk; executor-parallel, the scale
  path for replayed feeds.
- **Live HTTP** (``option("url", endpoint)``): the connector GETs the
  endpoint with the standard offset-token paging contract — response
  ``{"records": [...], "offset": "<token>"}``, request
  ``?offset=<token>``, last page omits the token — with bounded
  retry + backoff on 429/5xx (public REST pattern; behavioral parity
  with lib/AirtableDataFetcher.py:14-37). Token paging is inherently
  sequential (page N's response carries page N+1's token), so HTTP
  mode plans ONE partition that walks the chain; freeze feeds to
  JSONL pages for parallel re-reads.

The fetch hook itself (:class:`HttpPageFetcher` /
:func:`iter_record_pages`) is pluggable and picklable — tests inject a
fake fetcher; a real deployment points it at its gateway. No
instructions are taken from the reference; only the record envelope
format is mirrored.

Also provides :func:`unwrap_records` — the batch-DataFrame form of the
same unwrap (P1's ``record['fields']`` projection,
lib/DataProcessor.py:30) for sources already loaded as DataFrames.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pyspark >= 4
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceWriter,
        InputPartition,
        SimpleDataSourceStreamReader,
        WriterCommitMessage,
    )

    _HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover - older pyspark
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceReader = object  # type: ignore[assignment,misc]
    InputPartition = object  # type: ignore[assignment,misc]
    SimpleDataSourceStreamReader = object  # type: ignore[assignment,misc]
    DataSourceWriter = object  # type: ignore[assignment,misc]
    WriterCommitMessage = object  # type: ignore[assignment,misc]
    _HAS_DATASOURCE_API = False


class HttpPageFetcher:
    """Fetch one page of the record feed over HTTP with bounded retry.

    Callable ``(offset_token | None) -> {"records": [...], "offset"?:
    str}``. Retries 429 and 5xx responses and transport errors up to
    ``max_retries`` times with linear backoff (attempt * backoff_s);
    4xx other than 429 raise immediately (client bugs should not burn
    the retry budget). Picklable: holds only plain config, so it ships
    to executors inside an InputPartition.
    """

    def __init__(
        self,
        url: str,
        headers: Optional[dict] = None,
        max_retries: int = 3,
        backoff_s: float = 1.0,
        timeout_s: float = 30.0,
    ):
        self.url = url
        self.headers = dict(headers or {})
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.timeout_s = timeout_s

    def __call__(self, offset: Optional[str]) -> dict:
        import time
        import urllib.error
        import urllib.parse
        import urllib.request

        url = self.url
        if offset:
            sep = "&" if "?" in url else "?"
            url = f"{url}{sep}offset={urllib.parse.quote(offset)}"
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            if attempt:
                time.sleep(self.backoff_s * attempt)
            try:
                req = urllib.request.Request(url, headers=self.headers)
                with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                    return json.loads(resp.read().decode("utf-8"))
            except urllib.error.HTTPError as e:
                if e.code != 429 and e.code < 500:
                    raise
                last_err = e
            except urllib.error.URLError as e:
                last_err = e
        raise RuntimeError(
            f"record feed fetch failed after {self.max_retries + 1} attempts: "
            f"{last_err}"
        ) from last_err


def iter_record_pages(
    fetch_page, max_pages: int = 100_000
) -> Iterator[list[dict]]:
    """Walk the offset-token chain: call ``fetch_page(token)`` starting
    at ``None``, follow each response's ``offset`` until a page omits
    it. ``fetch_page`` is any callable with the page contract —
    :class:`HttpPageFetcher` or an injected fake. ``max_pages`` bounds
    a server that keeps echoing tokens (defensive, not expected)."""
    token: Optional[str] = None
    for _ in range(max_pages):
        page = fetch_page(token)
        yield page.get("records", [])
        token = page.get("offset")
        if not token:
            return
    raise RuntimeError(f"record feed did not terminate within {max_pages} pages")


class RecordFeedDataSource(DataSource):
    """``spark.read.format("record_feed").option(...)``.

    Options (exactly one of ``path`` / ``url``):
      path        directory of ``page-*.jsonl`` files (one per partition)
      url         HTTP endpoint with offset-token paging (one partition,
                  sequential chain walk — see module docstring)
      fields      comma-separated field names to unwrap (the schema);
                  every unwrapped field is read as string — the typed
                  projection stage applies the field-type catalog after
                  (same two-stage shape as the reference: fetch, then
                  DataProcessor casts).
      maxRetries / backoffS / timeoutS / headerAuthorization
                  HTTP fetch knobs (url mode only).
    """

    @classmethod
    def name(cls) -> str:
        return "record_feed"

    def schema(self) -> str:
        fields = [f.strip() for f in self.options["fields"].split(",")]
        cols = ", ".join(f"`{f}` string" for f in fields)
        return f"_record_id string, _created_time string, {cols}"

    def simpleStreamReader(
        self, schema: T.StructType
    ) -> "RecordFeedStreamReader":
        """``spark.readStream.format("record_feed")`` — the INCREMENTAL
        form of the connector (public Spark 4 Python streaming
        DataSource API): the page directory is an append-only feed,
        the stream offset is the count of page files consumed, and
        each micro-batch reads only the NEW pages. This is the
        continuous-sync ingestion shape the reference polls for
        (lib/AirtableDataFetcher.py re-fetches the whole table per
        run); here arrivals flow through watermarks/strategies with
        exactly-once replay (readBetweenOffsets serves a replayed
        batch from its recorded offset range).

        Producer contract: pages must be PUBLISHED ATOMICALLY (write
        to a temp name, rename into ``page-*``) and never appended to
        afterwards — the offset counts pages, so a file read mid-write
        would be marked consumed with its later lines lost, and a
        replay would return more rows than the committed batch (the
        same atomic-publication rule Spark's own file source has)."""
        if "path" not in self.options:
            raise ValueError(
                "record_feed streaming requires option('path', dir): "
                "token-paged HTTP has no replayable offsets — freeze "
                "the feed to JSONL pages for streaming reads"
            )
        return RecordFeedStreamReader(self.options["path"], schema)

    def writer(self, schema: T.StructType, overwrite: bool) -> "RecordFeedWriter":
        """``df.write.format("record_feed")`` — K8-family sink as a
        first-class connector: envelopes staged per task, published
        atomically by the driver commit (see RecordFeedWriter)."""
        if "path" not in self.options:
            raise ValueError("record_feed writes require option('path', dir)")
        return RecordFeedWriter(dict(self.options), overwrite)

    def reader(self, schema: T.StructType) -> "RecordFeedReader":
        if "url" in self.options:
            headers = {}
            if "headerAuthorization" in self.options:
                headers["Authorization"] = self.options["headerAuthorization"]
            fetcher = HttpPageFetcher(
                self.options["url"],
                headers=headers,
                max_retries=int(self.options.get("maxRetries", 3)),
                backoff_s=float(self.options.get("backoffS", 1.0)),
                timeout_s=float(self.options.get("timeoutS", 30.0)),
            )
            return RecordFeedReader(None, schema, fetcher)
        return RecordFeedReader(self.options["path"], schema, None)


class PagePartition(InputPartition):
    def __init__(self, path: Optional[str], fetcher=None):
        self.path = path
        self.fetcher = fetcher


class RecordFeedReader(DataSourceReader):
    def __init__(
        self, path: Optional[str], schema: T.StructType, fetcher=None
    ):
        self.path = path
        self.schema = schema
        self.fetcher = fetcher

    def partitions(self) -> list[PagePartition]:
        if self.fetcher is not None:
            # token paging is sequential: one partition walks the chain
            return [PagePartition(None, self.fetcher)]
        # one partition per page file -> executor-parallel fetch
        pages = sorted(
            (
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.startswith("page-")
            ),
            key=_page_sort_key,
        )
        return [PagePartition(p) for p in pages]

    def _records(self, partition: PagePartition) -> Iterator[dict]:
        if partition.fetcher is not None:
            for records in iter_record_pages(partition.fetcher):
                yield from records
        else:
            yield from _read_page(partition.path)

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        field_names = [f.name for f in self.schema.fields[2:]]
        for rec in self._records(partition):
            yield _unwrap_tuple(rec, field_names)


def _unwrap_tuple(rec: dict, field_names: list[str]) -> tuple:
    """Record envelope -> schema-shaped tuple (ONE unwrap shared by the
    batch reader and the stream reader, so both surfaces agree)."""
    fields = rec.get("fields", {})
    return (
        rec.get("id"),
        rec.get("createdTime"),
        *[
            None if fields.get(n) is None else str(fields.get(n))
            for n in field_names
        ],
    )


def _page_rows(path: str, field_names: list[str]) -> Iterator[tuple]:
    for rec in _read_page(path):
        yield _unwrap_tuple(rec, field_names)


def _page_sort_key(path: str) -> tuple:
    """Numeric-aware sort key for ``page-N[.ext]`` files.

    Lexicographic order breaks offset tracking once N reaches two
    digits ('page-10' sorts between 'page-1' and 'page-2', shifting
    every count-based index and replaying/skipping pages). Parse the
    numeric suffix so 'page-10' sorts after 'page-9'; non-numeric
    suffixes sort after all numeric ones, by name, so a mixed
    directory is still totally ordered and appended-monotone producers
    keep new pages strictly after consumed ones."""
    base = os.path.basename(path)
    stem = base[len("page-"):].split(".", 1)[0]
    if stem.isdigit():
        return (0, int(stem), base)
    return (1, 0, base)


class RecordFeedStreamReader(SimpleDataSourceStreamReader):
    """Incremental page-directory reader.

    Offset = ``{"n_pages": int, "last_page": basename | None}``: the
    number of pages consumed plus the NAME of the newest consumed page.
    Slicing is by page name (numeric-aware sort, ``_page_sort_key``),
    never by count into the current listing — a count is wrong twice
    over: lexicographic order interleaves 'page-10' between 'page-1'
    and 'page-2', and even with a stable order, indices into a listing
    that has since grown make readBetweenOffsets replay a different
    slice than the committed batch. Name-boundary slicing re-reads
    exactly the recorded pages regardless of later arrivals —
    exactly-once without the source keeping any state of its own.
    ``n_pages`` is kept in the offset for legacy checkpoints written
    by the count-based reader (used only when last_page is absent).

    The simple-reader contract (driver-side reads) fits the feed's
    sequential token paging; Spark checkpoints the (start, end) offset
    range per batch and replays a failed batch via readBetweenOffsets."""

    def __init__(self, path: str, schema: T.StructType):
        self.path = path
        self.field_names = [f.name for f in schema.fields[2:]]

    def _pages(self) -> list[str]:
        return sorted(
            (
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.startswith("page-")
            ),
            key=_page_sort_key,
        )

    @staticmethod
    def _slice(pages: list[str], start: dict, end: dict | None) -> list[str]:
        """Pages strictly after start's boundary and (when end is
        given) at-or-before end's boundary. The start and end bounds
        are applied INDEPENDENTLY — each by name key when its offset
        carries ``last_page``, by count otherwise (legacy checkpoint)
        — so a mixed replay (e.g. legacy initial start + legacy first
        end, or legacy start + new-style end) slices exactly the
        committed range rather than ignoring one bound (review
        finding: replaying batch 0 of a legacy checkpoint returned
        EVERY page because the start-is-zero path dropped the end
        bound)."""
        lo = start.get("last_page")
        if lo is not None:
            lo_key = _page_sort_key(lo)
            pages = [p for p in pages if _page_sort_key(p) > lo_key]
        elif start.get("n_pages", 0) > 0:
            pages = pages[start["n_pages"]:]
        if end is not None:
            hi = end.get("last_page")
            if hi is not None:
                hi_key = _page_sort_key(hi)
                pages = [p for p in pages if _page_sort_key(p) <= hi_key]
            else:
                n = end.get("n_pages", 0) - start.get("n_pages", 0)
                pages = pages[: max(0, n)]
        return pages

    def initialOffset(self) -> dict:
        return {"n_pages": 0, "last_page": None}

    def read(self, start: dict) -> tuple:
        pages = self._pages()
        batch = self._slice(pages, start, None)
        rows: list[tuple] = []
        for p in batch:
            rows.extend(_page_rows(p, self.field_names))
        last = (
            os.path.basename(batch[-1])
            if batch
            else start.get("last_page")
        )
        return iter(rows), {
            "n_pages": start.get("n_pages", 0) + len(batch),
            "last_page": last,
        }

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        for p in self._slice(self._pages(), start, end):
            yield from _page_rows(p, self.field_names)


def _read_page(path: str) -> Iterator[dict]:
    """One frozen 'page fetch' from a JSONL page file."""
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


class PageCommitMessage(WriterCommitMessage):
    """Per-task commit message: the temp file the task staged and its
    row count (picklable plain fields only)."""

    def __init__(self, tmp_name: str, n_rows: int):
        self.tmp_name = tmp_name
        self.n_rows = n_rows


class RecordFeedWriter(DataSourceWriter):
    """Batch writer: ``df.write.format("record_feed").option("path",
    dir).mode(...).save()`` — the INVERSE of the reader's unwrap.

    Each task stages its partition as an UNCOMMITTED temp file
    (``_tmp-<uuid>.jsonl``) of record envelopes
    ``{"id", "createdTime", "fields": {...}}``; the driver's commit
    renames staged files to zero-padded ``page-NNNNN.jsonl`` names in
    partition order (append mode continues after the existing max
    page number) and abort removes them — write-audit-publish, the
    same atomic-publication contract the stream reader documents for
    producers, so a reader/stream never observes a half-written page.
    On an object store the rename step becomes the store's multipart
    commit; the task/driver split is unchanged.

    Input contract: columns ``_record_id``, ``_created_time``, then
    field columns (the reader's schema shape); missing id/created
    columns write null envelope heads.
    """

    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator) -> "PageCommitMessage":
        import uuid

        tmp = f"_tmp-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, tmp), "w") as fh:
            for row in iterator:
                d = row.asDict()
                rid = d.pop("_record_id", None)
                created = d.pop("_created_time", None)
                fh.write(
                    json.dumps(
                        {"id": rid, "createdTime": created, "fields": d}
                    )
                    + "\n"
                )
                n += 1
        return PageCommitMessage(tmp, n)

    def _existing_pages(self) -> list[str]:
        return sorted(
            (f for f in os.listdir(self.path) if f.startswith("page-")),
            key=_page_sort_key,
        )

    def commit(self, messages) -> None:
        if self.overwrite:
            for f in self._existing_pages():
                os.remove(os.path.join(self.path, f))
            next_no = 0
        else:
            pages = self._existing_pages()
            next_no = (
                _page_sort_key(pages[-1])[1] + 1
                if pages and _page_sort_key(pages[-1])[0] == 0
                else len(pages)
            )
        for m in messages:
            os.rename(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, f"page-{next_no:05d}.jsonl"),
            )
            next_no += 1

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(os.path.join(self.path, m.tmp_name))
            except FileNotFoundError:
                pass
