"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Each query is executed via a noop write that forces full evaluation
without collecting result rows to the driver. The suite runs
$SPARK_GRAFT_REPEATS times (default 3) and reports the per-query
MEDIAN — this host is a shared VM with heavy run-to-run variance, so
single-shot numbers are not attributable (VERDICT round-1 item 9).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ffs-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "32g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    # Warm the JVM/codegen paths so the first timed query doesn't pay
    # session startup (bench measures queries, not JIT).
    spark.range(1_000_000).selectExpr("md5(cast(id as string)) h").agg(
        {"h": "max"}
    ).collect()

    qs = e.queries()
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))
    # Soft wall-clock budget: the suite has grown past 150 queries, and
    # an external kill (driver harness timeout) loses the WHOLE line.
    # Passes after the first stop early once the budget is spent — a
    # complete 1-sample bench always beats a truncated 3-sample one.
    # 560: three ~200 s passes fit (the round-5 driver run sustained
    # ~600 s wall for median-of-3); the check runs BEFORE each pass,
    # so worst case is budget + one pass.
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "560"))
    bench_t0 = time.perf_counter()
    samples: dict[str, list[float]] = {name: [] for name in qs}
    # Round-robin whole-suite passes (not back-to-back per query) so a
    # transient host-load spike cannot poison all of one query's runs.
    for rep in range(repeats):
        if rep > 0 and time.perf_counter() - bench_t0 > budget_s:
            break
        for name, fn in qs.items():
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # Force full evaluation of every column (not just count paths).
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
            # Drop intermediates persisted by pipeline operators so queries
            # don't contend for storage memory across measurements.
            spark.catalog.clearCache()

    # Median of 3 discards the cold first pass; with budget-degraded
    # 1-2 samples median would average the cold pass in, so take MIN
    # there (the standard degraded-sampling estimator — closest to
    # what median-of-3 reports on a quiet host).
    def est(t: list[float]) -> float:
        return statistics.median(t) if len(t) >= 3 else min(t)

    timings = {n: round(est(t), 2) for n, t in samples.items()}
    total = round(sum(est(t) for t in samples.values()), 2)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    min_samples = min(len(t) for t in samples.values())
    payload = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "repeats": min_samples,
        # Which statistic produced the numbers: budget truncation degrades
        # median-of-3 to min-of-1/2, and cross-round BENCH_r* comparisons
        # must be able to tell the two apart (ADVICE r4).
        "estimator": "median" if min_samples >= 3 else "min",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # Streaming entries pay an inherent per-entry micro-batch replay
    # bootstrap (~3 s each: real readStream/writeStream lifecycle per
    # invocation, not a plan cost) — disclosed so the total reads
    # fairly vs batch-only rounds (VERDICT r5 item 6).
    streaming = [n for n in timings if n.startswith(("streaming_",
                                                     "stateful_"))]
    payload["stream_n"] = len(streaming)
    payload["stream_sec"] = round(sum(timings[n] for n in streaming), 2)
    # 8-hex digest of the FULL per-query map: ties the driver-captured
    # stdout line (which trims to the slowest entries) to the complete
    # BENCH_LOCAL.json committed each round (VERDICT r5 item 7).
    import hashlib

    payload["full_md5"] = hashlib.md5(
        json.dumps(timings, sort_keys=True, separators=(",", ":")).encode()
    ).hexdigest()[:8]
    # Full-precision per-sample artifact for local auditing; stdout keeps
    # only the compact line so the driver's ~4KB tail capture parses it
    # (round-2 BENCH artifact had parsed:null from head truncation).
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"),
            "w",
        ) as f:
            json.dump({**payload, "samples": samples}, f, indent=1)
    except OSError:
        pass
    spark.stop()
    # The driver's tail capture is ~2000 chars (BENCH_r03 proved a 3.2KB
    # line loses its head, so "parsed" stays null). Emit a line that is
    # GUARANTEED to fit: totals + as many per-query timings as fit in the
    # budget, slowest first (the ones the perf gate cares about). The full
    # per-query map lives in BENCH_LOCAL.json, committed each round.
    budget = int(os.environ.get("SPARK_GRAFT_LINE_BUDGET", "1900"))
    ranked = sorted(timings.items(), key=lambda kv: -kv[1])
    kept: dict[str, float] = {}
    base = {k: v for k, v in payload.items() if k != "queries"}
    base["queries_total"] = len(timings)
    for name, t in ranked:
        trial = dict(base)
        trial["queries_omitted"] = len(timings) - len(kept) - 1
        trial["queries"] = {**kept, name: t}
        if len(json.dumps(trial, separators=(",", ":"))) > budget:
            break
        kept[name] = t
    base["queries_omitted"] = len(timings) - len(kept)
    base["queries"] = kept
    line = json.dumps(base, separators=(",", ":"))
    assert len(line) <= budget, len(line)
    print(line, flush=True)


if __name__ == "__main__":
    main()
