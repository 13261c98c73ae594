"""Round-3 ADVICE regressions: NULL-group cross-engine parity in the
global-ordered operators, and the stream schema peek's error handling.
"""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from far_finer_airtable_firestore_sync_spark.functions.canonical import (
    DUCKDB,
)
from far_finer_airtable_firestore_sync_spark.functions import textsql as tx
from far_finer_airtable_firestore_sync_spark.operators import (
    packing,
    text_analysis,
)


def _write_docs(tmp_path, rows):
    """rows: list of (doc_id, lang, source, text) with None allowed."""
    path = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "lang": pa.array([r[1] for r in rows], pa.string()),
                "source": pa.array([r[2] for r in rows], pa.string()),
                "text": pa.array([r[3] for r in rows], pa.string()),
            }
        ),
        path,
    )
    return path


def test_corpus_interleave_null_group_parity(spark, tmp_path):
    """Equal-sized groups make every _frac value tie, so the global
    order falls to the group tie-break — which must pin NULL ordering
    identically in Spark and DuckDB (ADVICE r2: Spark asc is NULLS
    FIRST, DuckDB's is NULLS LAST)."""
    rows = []
    doc = 0
    for src in ["alpha", None, "beta"]:  # NULL group, all equal size
        for _ in range(8):
            rows.append((doc, "en", src, "w"))
            doc += 1
    path = _write_docs(tmp_path, rows)

    got_s = {
        r["doc_id"]: r["interleave_pos"]
        for r in packing.corpus_interleave(
            spark.read.parquet(path), group_col="source"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{path}')"
    )
    got_d = dict(
        con.execute(
            "select doc_id, interleave_pos from ("
            + packing.corpus_interleave_sql(group_col="source")
            + ")"
        ).fetchall()
    )
    assert got_s == got_d
    assert sorted(got_s.values()) == list(range(doc))


def test_token_budget_null_group_parity(spark, tmp_path):
    """A NULL group cell and an all-NULL-text cell must rank (and so
    receive their +1 remainder allocations) identically cross-engine
    (ADVICE r2: desc NULL placement differs between engines)."""
    rows = [
        # three cells with identical token counts -> remainder ties,
        # broken only by the (g1, g2) order including a NULL source
        (0, "en", "web", "w w w"),
        (1, "en", None, "w w w"),
        (2, "en", "book", "w w w"),
        # all-NULL-text cell: NULL n_tokens, NULL remainder
        (3, "xx", "null-cell", None),
    ]
    path = _write_docs(tmp_path, rows)
    budget = 101  # not divisible by 3: forces +1 remainder rounds

    got_s = {
        (r["lang"], r["source"]): (r["n_tokens"], r["alloc_tokens"])
        for r in text_analysis.token_budget_allocation(
            spark.read.parquet(path), budget=budget
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{path}')"
    )
    toks = tx.quality_base_exprs("text", DUCKDB)["n_tokens_ws"]
    got_d = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            text_analysis.token_budget_allocation_sql(toks, budget=budget)
        ).fetchall()
    }
    assert got_s == got_d
    alloc = [v[1] for v in got_s.values() if v[1] is not None]
    assert sum(alloc) == budget


def test_read_event_stream_empty_dir_falls_back(spark, tmp_path):
    """An empty landing directory (files arrive later) uses the assumed
    nanos schema instead of failing."""
    from far_finer_airtable_firestore_sync_spark.streaming import sync

    empty = tmp_path / "landing"
    empty.mkdir()
    stream = sync.read_event_stream(spark, str(empty))
    assert stream.isStreaming
    assert stream.schema["ts"].dataType.simpleString() == "timestamp"


def test_read_event_stream_corrupt_footer_propagates(spark, tmp_path):
    """A corrupt parquet footer must raise, not silently fall back to
    the nanos schema and mis-normalize ts (ADVICE r2)."""
    from far_finer_airtable_firestore_sync_spark.streaming import sync

    bad_dir = tmp_path / "bad"
    bad_dir.mkdir()
    with open(os.path.join(str(bad_dir), "part-0.parquet"), "wb") as f:
        f.write(b"PAR1 this is not a parquet footer")
    with pytest.raises(Exception):
        sync.read_event_stream(spark, str(bad_dir))
