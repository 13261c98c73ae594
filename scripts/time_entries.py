"""Time a list of queries() entries under the bench session config.

Usage: python scripts/time_entries.py <entry> [<entry> ...]
Env: TIME_REPEATS (default 2), SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.

Prints per-entry sample lists (cold first) — the controlled A/B
harness for optimization rounds: run on two code states back to back,
same host, same session shape, compare warm samples.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeats = int(os.environ.get("TIME_REPEATS", "2"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ffs-time")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            os.environ.get("SPARK_GRAFT_CACHE_AQE_PARTITIONING", "true"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "32g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    spark.range(1_000_000).selectExpr("md5(cast(id as string)) h").agg(
        {"h": "max"}
    ).collect()
    qs = e.queries()
    out = {}
    for name in names:
        fn = qs[name]
        samples = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 2))
            spark.catalog.clearCache()
        out[name] = samples
        print(f"TIMED {name}: {samples}", flush=True)
    print("JSON " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
