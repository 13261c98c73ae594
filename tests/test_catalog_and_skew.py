"""Field-type catalog (S3), schema drift (D7), skew mitigation."""

import pytest
from pyspark.sql import functions as F

from far_finer_airtable_firestore_sync_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)
from far_finer_airtable_firestore_sync_spark.sources.tables import (
    fetch_field_types,
    schema_drift,
)


def test_fetch_field_types_maps_spark_to_catalog(spark):
    df = spark.createDataFrame(
        [],
        "name string, score double, ok boolean, d date, ts timestamp, "
        "tags array<string>, att array<struct<url:string>>, n int",
    )
    cat = fetch_field_types(df)
    assert cat == {
        "name": "singleLineText",
        "score": "number",
        "ok": "checkbox",
        "d": "date",
        "ts": "dateTime",
        "tags": "multipleSelects",
        "att": "multipleAttachments",
        "n": "singleLineText",  # unknown -> string default
    }


def test_schema_drift_report():
    rep = schema_drift(["a", "b", "c"], ["b", "c", "d"])
    assert rep == {
        "added_fields": ["d"],
        "removed_fields": ["a"],
        "symmetric_difference": ["a", "d"],
    }


@pytest.fixture()
def skewed(spark):
    # one hot key (90%) + long tail
    return spark.range(0, 10000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 50).cast("string")))
        .alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_salted_aggregate_matches_plain(spark, skewed):
    plain = {
        (r["k"]): (r["total"], r["n"])
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count("v").alias("n"))
        .collect()
    }
    salted = {
        (r["k"]): (r["total"], r["n"])
        for r in salted_aggregate(
            skewed, "k", {"total": ("sum", "v"), "n": ("count", "v")}
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B")], "k string, label string"
    )
    plain = sorted(
        map(tuple, skewed.join(dim, "k").select("k", "v", "label").collect())
    )
    salted = sorted(
        map(
            tuple,
            salted_join(skewed, dim, "k").select("k", "v", "label").collect(),
        )
    )
    assert salted == plain


def test_approx_stats_error_bounds(spark):
    """Sketch aggregates stay within declared error of exact values."""
    from far_finer_airtable_firestore_sync_spark.plans.agg_queries import (
        q_approx_stats,
    )

    sf = "/root/testdata/sf0.01"
    rows = {r["l_returnflag"]: r for r in q_approx_stats(spark, sf).collect()}
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r["parts"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("parts"))
        .collect()
    }
    assert set(rows) == set(exact)
    for flag, r in rows.items():
        # the banded verdicts the oracle hashes must actually hold
        assert r["exact_parts"] == exact[flag]
        assert r["parts_in_band"] is True
        assert r["median_in_band"] is True
        assert r["p99_in_band"] is True


def test_skew_hot_key_entries_agree_and_plan_shapes(spark):
    """The 30%-hot-key bench twins: identical results, and the salted
    plan really is the two-stage shape (partial on (k, salt) then
    merge on k -> 2 exchanges) while the unsalted plan hashes straight
    to one exchange on k, hot key on a single reducer."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    un = e._q_skew_hot_unsalted(spark, sf)
    sa = e._q_skew_hot_salted(spark, sf)
    got_un = {r["k"]: (r["revenue"], r["n_items"]) for r in un.collect()}
    got_sa = {r["k"]: (r["revenue"], r["n_items"]) for r in sa.collect()}
    assert got_un == got_sa
    # the hot key really is hot: roughly a third of all rows (sparse
    # orderkeys make the mod-10 split uneven at tiny SF)
    n_total = sum(v[1] for v in got_un.values())
    assert 0.2 <= got_un[0][1] / n_total <= 0.45

    def final_plan(df):
        # AQE plan strings append an "== Initial Plan ==" section that
        # would double-count exchanges
        s = df._jdf.queryExecution().executedPlan().toString()
        return s.split("== Initial Plan ==")[0]

    plan_un, plan_sa = final_plan(un), final_plan(sa)
    assert plan_un.count("Exchange") == 1
    assert plan_sa.count("Exchange") == 2
    assert "_salt" in plan_sa and "_salt" not in plan_un


def test_round3_entry_plan_shapes(spark):
    """Plan-shape regressions for the round-3 retrieval/selection
    entries: no cartesian products, no Python in the data path, no
    runaway exchange counts, and DSIR's single-subtree rewrite keeps
    its ReusedExchange."""
    import __spark_entry__ as e

    qs = e.queries()
    sf = "/root/testdata/sf0.001"

    def final_plan(name):
        df = qs[name](spark, sf)
        df.collect()
        s = df._jdf.queryExecution().executedPlan().toString()
        return s.split("== Initial Plan ==")[0]

    budgets = {  # max Exchange count per entry (measured + 1 headroom)
        "text_bm25_search": 7,
        "dedup_repeated_spans": 3,
        "search_hybrid_rrf": 7,
        "dsir_importance_weights": 8,
        "source_overlap_matrix": 7,
        "text_c4_rules": 1,
        "mixture_unimax": 6,
    }
    for name, budget in budgets.items():
        plan = final_plan(name)
        n_ex = plan.count("Exchange hashpartitioning") + plan.count(
            "Exchange rangepartitioning"
        ) + plan.count("Exchange SinglePartition")
        assert n_ex <= budget, f"{name}: {n_ex} exchanges > {budget}"
        assert "CartesianProduct" not in plan, name
        assert "EvalPython" not in plan, name
        # 1-row scalar broadcasts are the only nested-loop joins allowed
        if "BroadcastNestedLoopJoin" in plan:
            assert name != "text_c4_rules"
    plan = final_plan("dsir_importance_weights")
    assert "ReusedExchange" in plan


def test_recommended_conf_scaling_invariants(spark):
    """Sizing rules: shuffle width tracks data at ~128 MiB per
    partition, floors at total cores, caps at the scheduler-pressure
    bound; media scans shrink; streaming narrows state width; AQE and
    skew handling always on."""
    from far_finer_airtable_firestore_sync_spark.conf import (
        MAX_SHUFFLE_PARTITIONS,
        apply_conf,
        recommended_conf,
    )

    gib = 1024**3
    # 100 TB across 1000 executors x 4 cores
    big = recommended_conf(100_000 * gib, executors=1000)
    assert int(big["spark.sql.shuffle.partitions"]) == MAX_SHUFFLE_PARTITIONS
    # 1 TB: ceil(1 TiB / 128 MiB) = 8192 partitions > 4000 cores
    mid = recommended_conf(1024 * gib, executors=1000)
    assert int(mid["spark.sql.shuffle.partitions"]) == 8192
    # tiny data on a big cluster: floor at total cores, no idle slots
    small = recommended_conf(1 * gib, executors=1000)
    assert int(small["spark.sql.shuffle.partitions"]) == 4000
    for c in (big, mid, small):
        assert c["spark.sql.adaptive.enabled"] == "true"
        assert c["spark.sql.adaptive.skewJoin.enabled"] == "true"
    # media halves-squared the scan partition size
    media = recommended_conf(1024 * gib, executors=10, workload="media")
    assert int(media["spark.sql.files.maxPartitionBytes"]) == 32 * 1024**2
    # streaming narrows the state-store width
    stream = recommended_conf(1024 * gib, executors=10, workload="streaming")
    assert int(stream["spark.sql.shuffle.partitions"]) <= 64
    # applies cleanly to a live session (runtime-settable keys only)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        apply_conf(spark, {"spark.sql.shuffle.partitions": "7"})
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_dynamic_partition_pruning(spark, tmp_path):
    """A fact partitioned on the join key must be pruned at RUNTIME by
    the dim-side filter (DPP): the fact scan carries a dynamicpruning
    subquery and reads only the matching partition directories — the
    100 TB pattern where the dim filter, not a static literal, decides
    which partitions exist in the scan."""
    fact = spark.range(0, 10000).selectExpr(
        "id", "cast(id % 8 as int) as pk", "id * 2 as v"
    )
    fact.write.mode("overwrite").partitionBy("pk").parquet(
        str(tmp_path / "fact")
    )
    dim = spark.createDataFrame(
        [(i, "keep" if i < 2 else "drop") for i in range(8)],
        "pk int, tag string",
    )
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))
    f = spark.read.parquet(str(tmp_path / "fact"))
    d = spark.read.parquet(str(tmp_path / "dim")).filter("tag = 'keep'")
    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try:
        joined = f.join(d, "pk").groupBy("tag").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the pruning subquery is attached to the fact scan
        assert "dynamicpruning" in plan.lower()
        rows = {r["tag"]: r["count"] for r in joined.collect()}
        assert rows == {"keep": 2500}  # pk 0 and 1 -> 1250 rows each
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", prev
        )
