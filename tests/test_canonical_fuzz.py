"""Bulk randomized cross-engine parity for the canonical checksum.

500 seeded-random rows with adversarial content — quotes, backslashes,
newlines, tabs, unicode (CJK/emoji/combining), huge/tiny/negative
doubles, edge dates — checksummed by Spark and DuckDB over the same
parquet file. Any canonicalization drift (escaping, float formatting,
timestamp rendering, encoding) shows up as a digest mismatch.
"""

import random
import string
from datetime import datetime, timedelta

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from far_finer_airtable_firestore_sync_spark.functions.canonical import (
    DUCKDB,
    SPARK,
    Field,
    checksum_sql,
)

TRICKY = [
    '"', "\\", "\\\\", '\\"', "\n", "\t", "\r", "'", "''",
    "日本語テキスト", "emoji 🎉🚀", "é combining", "null", "None",
    "{}", "[1,2]", "a||b", "chr(34)", "%s %.6f", "", " ", "  padded  ",
]

FIELDS = [
    Field("id", "long"),
    Field("s", "string"),
    Field("x", "double"),
    Field("ts", "timestamp"),
    Field("flag", "boolean"),
]


def _random_rows(n=500, seed=42):
    rng = random.Random(seed)
    rows = []
    base = datetime(2000, 1, 1)
    for i in range(n):
        parts = []
        for _ in range(rng.randint(0, 6)):
            if rng.random() < 0.5:
                parts.append(rng.choice(TRICKY))
            else:
                parts.append(
                    "".join(rng.choices(string.printable[:94], k=rng.randint(1, 12)))
                )
        s = "".join(parts) if parts else None
        x = rng.choice(
            [
                None,
                0.0,
                -0.0,
                rng.uniform(-1e12, 1e12),
                rng.uniform(-1e-6, 1e-6),
                float(rng.randint(-10**9, 10**9)),
                rng.uniform(-1e16, 1e16),          # big tier
                rng.uniform(-1e40, 1e40),          # e30 tier
                rng.uniform(-1e200, 1e200),        # e130/e271 tiers
                float("inf"), float("-inf"), float("nan"),
                1 / 2**19,                          # dyadic tie candidate
                2.0**52 + 0.5,
            ]
        )
        ts = (
            None
            if rng.random() < 0.1
            else base + timedelta(seconds=rng.randint(0, 10**9),
                                  microseconds=rng.randint(0, 999999))
        )
        rows.append((i, s, x, ts, rng.choice([None, True, False])))
    return rows


def test_fuzz_checksum_parity(spark, tmp_path):
    rows = _random_rows()
    table = pa.table(
        {
            "id": pa.array([r[0] for r in rows], pa.int64()),
            "s": pa.array([r[1] for r in rows], pa.string()),
            "x": pa.array([r[2] for r in rows], pa.float64()),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
            "flag": pa.array([r[4] for r in rows], pa.bool_()),
        }
    )
    path = str(tmp_path / "fuzz.parquet")
    pq.write_table(table, path)

    sdf = spark.read.parquet(path)
    sdf.createOrReplaceTempView("fuzz")
    s_rows = dict(
        spark.sql(
            f"select id, {checksum_sql(FIELDS, SPARK)} as cs from fuzz"
        ).collect()
    )
    con = duckdb.connect()
    con.execute(f"create view fuzz as select * from read_parquet('{path}')")
    d_rows = dict(
        con.execute(
            f"select id, {checksum_sql(FIELDS, DUCKDB)} as cs from fuzz"
        ).fetchall()
    )
    mismatches = [i for i in s_rows if s_rows[i] != d_rows[i]]
    assert not mismatches, f"{len(mismatches)} digest mismatches, first: {mismatches[:5]}"


def test_fuzz_datetime_parse_parity(spark, tmp_path):
    """Seeded-random timestamps rendered in every supported input
    shape, parsed by BOTH engines — any format-list drift (fraction
    digits, offset handling, month names) shows up as a mismatch."""
    from far_finer_airtable_firestore_sync_spark.plans.join_queries import (
        parse_datetime_any,
        parse_datetime_any_duckdb,
    )

    rng = random.Random(7)
    base = datetime(1995, 1, 1)
    shapes = [
        lambda d: d.strftime("%Y-%m-%d %H:%M:%S"),
        lambda d: d.strftime("%m/%d/%Y %H:%M:%S"),
        lambda d: d.strftime("%d.%m.%Y"),
        lambda d: d.strftime("%Y-%m-%d"),
        lambda d: d.strftime("%Y-%m-%dT%H:%M:%S") + f".{rng.randrange(1000):03d}Z",
        lambda d: d.strftime("%Y-%m-%dT%H:%M:%S")
        + f".{rng.randrange(1000000):06d}"
        + rng.choice(["+00:00", "+05:30", "-08:00"]),
        lambda d: d.strftime("%b %d, %Y"),
        lambda d: "garbage-" + str(rng.randrange(10**6)),
    ]
    raws = []
    for i in range(400):
        d = base + timedelta(seconds=rng.randrange(10**9))
        raws.append(shapes[i % len(shapes)](d))
    path = str(tmp_path / "dtfuzz.parquet")
    pq.write_table(pa.table({"raw": raws}), path)

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    got_s = [
        r["p"]
        for r in spark.read.parquet(path)
        .selectExpr(f"{parse_datetime_any('raw')} as p")
        .collect()
    ]
    con = duckdb.connect()
    got_d = [
        r[0]
        for r in con.execute(
            f"select {parse_datetime_any_duckdb('raw')} as p "
            f"from read_parquet('{path}')"
        ).fetchall()
    ]
    assert got_s == got_d
    # garbage shape parses to NULL, everything else parses
    for raw, v in zip(raws, got_s):
        assert (v is None) == raw.startswith("garbage-"), raw
