"""Randomized cross-engine parity for the text-analysis emitters.

The DuckDB oracle gate proves parity on the fixture corpus; this fuzz
proves it on adversarial text — empty strings, runs of spaces (empty
tokens), PII-like near-misses ("a@b.", "@@", trailing hyphens/dots),
unicode, punctuation soup. Any regex-dialect or list-function drift
between Spark (Java regex) and DuckDB (RE2) shows up as a row mismatch.
"""

import random
import string

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from far_finer_airtable_firestore_sync_spark.functions import textsql as tx
from far_finer_airtable_firestore_sync_spark.functions.canonical import DUCKDB, SPARK

TRICKY = [
    "", " ", "   ", "a", "a b", "a  b", " leading", "trailing ",
    "user@example.com", "a@b.", "@@", "a@-", "x@y-", "bob..s@ex..com",
    "555-0199", "555-123", "x555-00000", "pre555-1234post",
    "the the the", "a.b@c.d more a.b@c.d",
    "日本語 テキスト here", "emoji 🎉 mid", "punct!?.,;: soup",
    "der die das und", "el la de y es", "the a of and",
]

WORDS = ["the", "cat", "sat", "a", "b", "Data", "x9", "user@h.io",
         "555-0000", "!", "?!", "..", "émile", "汉", "-", "@"]


def _random_texts(n=400, seed=11):
    rng = random.Random(seed)
    texts = []
    for _ in range(n):
        if rng.random() < 0.03:
            texts.append(None)  # null text ≡ empty doc contract
            continue
        if rng.random() < 0.25:
            texts.append(rng.choice(TRICKY))
            continue
        k = rng.randint(0, 30)
        parts = []
        for _ in range(k):
            if rng.random() < 0.15:
                parts.append(rng.choice(TRICKY).replace(" ", "_") or "_")
            elif rng.random() < 0.2:
                parts.append(
                    "".join(rng.choices(string.printable[:94], k=rng.randint(1, 8)))
                    .replace(" ", "~")
                )
            else:
                parts.append(rng.choice(WORDS))
        sep = "  " if rng.random() < 0.1 else " "
        texts.append(sep.join(parts))
    return texts


def _exprs(dialect: str) -> dict[str, str]:
    out = dict(tx.pii_exprs("text", dialect))
    warr = tx.split_ws_safe("text", dialect)
    out.update(tx.repetition_metric_exprs(warr, dialect))
    out["n_chunks"] = tx.lsize(tx.word_chunks(warr, 5, dialect), dialect)
    out["rejoined"] = tx.ljoin(tx.word_chunks(warr, 5, dialect), " ", dialect)
    out["lang_pred"] = tx.langid_exprs("text", dialect)["lang_pred"]
    return out


def test_fuzz_text_emitter_parity(spark, tmp_path):
    texts = _random_texts()
    path = str(tmp_path / "texts.parquet")
    pq.write_table(
        pa.table({
            "id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }),
        path,
    )

    s_cols = ", ".join(f"{v} as {k}" for k, v in _exprs(SPARK).items())
    spark.read.parquet(path).createOrReplaceTempView("t_fuzz")
    s_rows = {
        r["id"]: tuple(r)[1:]
        for r in spark.sql(f"select id, {s_cols} from t_fuzz").collect()
    }

    d_cols = ", ".join(f"{v} as {k}" for k, v in _exprs(DUCKDB).items())
    con = duckdb.connect()
    con.execute(f"create view t_fuzz as select * from read_parquet('{path}')")
    d_rows = {r[0]: r[1:] for r in con.execute(
        f"select id, {d_cols} from t_fuzz").fetchall()}

    mismatches = [
        (i, texts[i], s_rows[i], d_rows[i])
        for i in s_rows
        if s_rows[i] != d_rows[i]
    ]
    assert not mismatches, f"{len(mismatches)} mismatches, first: {mismatches[:3]}"


def test_chunk_dedup_idempotent(spark):
    """Property: after corpus chunk dedup, no chunk appears twice —
    re-running the operator on the rebuilt corpus is the identity."""
    from pyspark.sql import functions as F

    from far_finer_airtable_firestore_sync_spark.operators.dedup_docs import (
        chunk_dedup,
    )
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        dedup_corpus,
    )

    once = chunk_dedup(
        dedup_corpus(spark, "/root/testdata/sf0.001"), chunk_words=10
    ).persist()
    again = chunk_dedup(
        once.select(F.col("doc_id"), F.col("text_kept").alias("text")),
        chunk_words=10,
    )
    a = {(r["doc_id"], r["text_kept"]) for r in once.collect()}
    b = {(r["doc_id"], r["text_kept"]) for r in again.collect()}
    assert a == b


def test_fuzz_vector_emitter_parity(spark, tmp_path):
    """dot_int / l2sq_int cross-engine parity on seeded-random
    vectors including the edge shapes: empty arrays (DuckDB
    list_sum([]) is NULL vs Spark's 0 seed — coalesced) and NULL
    arrays (both engines must return NULL, not 0). cosine_quantized
    is checked on the well-formed rows only (0-norm/empty vectors hit
    IEEE 0/0, whose NULL-vs-NaN rendering is engine-specific and not
    part of the operator contract)."""
    rng = random.Random(77)
    vecs = []
    for i in range(60):
        if i % 19 == 0:
            vecs.append(None)
        elif i % 13 == 0:
            vecs.append([])
        else:
            n = rng.randint(1, 8)
            vecs.append([rng.uniform(-2, 2) for _ in range(n)])
    # pair each row with a same-length partner (or same null/empty)
    partners = [
        None if v is None else [rng.uniform(-2, 2) for _ in v] for v in vecs
    ]
    tbl = pa.table(
        {
            "i": pa.array(range(len(vecs)), pa.int64()),
            "a": pa.array(vecs, pa.list_(pa.float64())),
            "b": pa.array(partners, pa.list_(pa.float64())),
        }
    )
    f = str(tmp_path / "vecs.parquet")
    pq.write_table(tbl, f)

    qa, qb = tx.quantize("a", SPARK), tx.quantize("b", SPARK)
    s_rows = {
        r["i"]: (r["dot"], r["l2"])
        for r in spark.read.parquet(f)
        .selectExpr(
            "i",
            f"{tx.dot_int(qa, qb, SPARK)} as dot",
            f"{tx.l2sq_int(qa, qb, SPARK)} as l2",
        )
        .collect()
    }
    da, db = tx.quantize("a", DUCKDB), tx.quantize("b", DUCKDB)
    d_rows = {
        i: (dot, l2)
        for i, dot, l2 in duckdb.sql(
            f"select i, {tx.dot_int(da, db, DUCKDB)} as dot, "
            f"{tx.l2sq_int(da, db, DUCKDB)} as l2 "
            f"from '{f}'"
        ).fetchall()
    }
    assert s_rows == d_rows
    # sanity on the edges: NULL stays NULL, empty is 0
    assert s_rows[0] == (None, None)     # i=0 is a NULL row (0 % 19)
    assert s_rows[13] == (0, 0)          # i=13 is an empty row

    # cosine parity on well-formed rows (non-null, non-empty)
    ok = "a is not null and b is not null and len(a) > 0"
    s_cos = {
        r["i"]: r["c"]
        for r in spark.read.parquet(f)
        .where("a is not null and b is not null and size(a) > 0")
        .selectExpr("i", f"{tx.cosine_quantized(qa, qb, SPARK)} as c")
        .collect()
    }
    d_cos = {
        i: c
        for i, c in duckdb.sql(
            f"select i, {tx.cosine_quantized(da, db, DUCKDB)} as c "
            f"from '{f}' where {ok}"
        ).fetchall()
    }
    assert s_cos == d_cos
