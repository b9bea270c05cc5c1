"""Skew-stress tests: a deliberately hot key (one key = 50% of rows)
through the flagship shapes — the 100× scale risk the uniform synthetic
tables never exercise.  Each test measures ACTUAL post-shuffle
partition row counts (``spark_partition_id`` evaluates before the next
exchange) or pins the structural defense (map-side partial
aggregation) that makes the shape skew-immune."""

from __future__ import annotations

import statistics

from pyspark.sql import functions as F

HOT_USER = 7
N_EVENTS = 40_000


def _partition_counts(df) -> list[int]:
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    return sorted(r["n"] for r in rows)


def _imbalance(counts: list[int]) -> float:
    """max/median over non-empty partitions — the task-time balance
    proxy: one task owning the hot key shows up as a huge ratio."""
    return max(counts) / statistics.median(counts)


def _skewed_events(spark):
    """50% of events on one hot user, the rest uniform over 1000."""
    return spark.range(N_EVENTS).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 2 == 0, F.lit(HOT_USER))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(1000)))
        .cast("long")
        .alias("user_id"),
        (F.col("id") % 97).cast("double").alias("value"),
    )


def _no_aqe_no_broadcast(spark):
    """Force a real shuffle join with static partitioning so partition
    counts are attributable: AQE coalescing/skew-split and broadcast
    would otherwise mask what the test measures."""
    return {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # the test session runs 4 shuffle partitions for speed; skew
        # contrast needs a realistic reduce-side fan-out
        "spark.sql.shuffle.partitions": "32",
    }


def _with_confs(spark, overrides):
    saved = {k: spark.conf.get(k) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    return saved


def test_salted_join_balances_hot_key(spark):
    saved = _with_confs(spark, _no_aqe_no_broadcast(spark))
    try:
        from scats_transis_kinesis_spark.operators.relational import (
            salted_join,
        )

        events = _skewed_events(spark).repartition(32, "event_id")
        dim = spark.range(1000).select(
            F.col("id").alias("c_custkey"),
            (F.col("id") % 25).alias("c_nationkey"),
        )
        plain = events.join(dim, events.user_id == dim.c_custkey)
        salted = salted_join(
            events, dim, "user_id", "c_custkey", salt_on=["event_id"]
        )
        plain_counts = _partition_counts(plain)
        salted_counts = _partition_counts(salted)
        # identical results, radically different physical distribution:
        # the plain join puts the hot user's 20k rows in ONE partition
        assert salted.count() == plain.count() == N_EVENTS
        assert _imbalance(plain_counts) > 15, plain_counts
        assert _imbalance(salted_counts) < 8, salted_counts
        assert max(salted_counts) < max(plain_counts) / 4
    finally:
        _with_confs(spark, saved)


def test_top_k_per_group_skew_safe_parity_and_bound(spark):
    from scats_transis_kinesis_spark.operators.relational import (
        top_k_per_group,
    )

    events = _skewed_events(spark).repartition(32, "event_id")
    keys, order, k = ["user_id"], [F.desc("value"), F.asc("event_id")], 5

    plain = top_k_per_group(events, keys, order, k)
    safe = top_k_per_group(events, keys, order, k, skew_safe=True)
    want = {tuple(r) for r in plain.collect()}
    got = {tuple(r) for r in safe.collect()}
    assert got == want and len(want) > 5 * 100  # real multi-group output

    # the boundedness claim: after the per-partition partial top-k, the
    # hot group enters the final window with <= k rows per input
    # partition instead of 50% of the table in one task
    from pyspark.sql import Window as W

    pw = W.partitionBy("_pid", *keys).orderBy(*order)
    prefiltered = (
        events.withColumn("_pid", F.spark_partition_id())
        .withColumn("_prn", F.row_number().over(pw))
        .where(F.col("_prn") <= k)
    )
    hot_rows = prefiltered.where(F.col("user_id") == HOT_USER).count()
    n_parts = events.rdd.getNumPartitions()
    assert hot_rows <= k * n_parts, (hot_rows, n_parts)
    assert hot_rows < N_EVENTS // 2 / 10  # vs 20k rows unfiltered


def test_exact_dedup_partial_agg_under_hot_key(spark):
    """dedup_exact's defense is map-side partial aggregation: each map
    task pre-collapses the hot hash to ONE row before the exchange, so
    the reduce task for the hot key receives num_partitions rows, not
    50% of the corpus.  Pinned structurally (partial agg functions
    below the exchange) plus end-to-end correctness on skewed input."""
    from scats_transis_kinesis_spark.operators.dedup import (
        exact_dedup_groups,
    )

    docs = spark.range(N_EVENTS).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit("the one hot duplicated text"))
        .otherwise(F.concat(F.lit("unique text "), F.col("id")))
        .alias("text"),
    ).repartition(32, "doc_id")
    groups = exact_dedup_groups(docs)

    plan = groups._sc._jvm.PythonSQLUtils.explainString(
        groups._jdf.queryExecution(), "formatted"
    )
    assert "partial_count" in plan, plan  # map-side combine below the shuffle

    hot = groups.where(F.col("n_copies") > 1).collect()
    assert len(hot) == 1 and hot[0]["n_copies"] == N_EVENTS // 2
    assert hot[0]["keep_id"] == 0
    assert groups.count() == N_EVENTS // 2 + 1


def test_windowed_traffic_partial_agg_under_hot_region(spark):
    """The flagship windowed aggregation under a hot group key: groupBy
    (region, window) partial-aggregates map-side, so the hot region
    adds one row per (map task, window) to the shuffle, not 50% of
    records; counts stay exact."""
    from scats_transis_kinesis_spark.operators.aggregation import (
        sites_per_window,
    )

    records = spark.range(N_EVENTS).select(
        F.when(F.col("id") % 2 == 0, F.lit("ROZ"))
        .otherwise(F.concat(F.lit("R"), F.pmod(F.col("id"), F.lit(50))))
        .alias("region"),
        (F.lit(1570081380) + (F.col("id") % 12) * 300).alias(
            "collection_end_ts_plus_3m"
        ),
        (F.col("id") % 4000).cast("string").alias("site_id"),
    ).repartition(32)
    agg = sites_per_window(records)
    plan = agg._sc._jvm.PythonSQLUtils.explainString(
        agg._jdf.queryExecution(), "formatted"
    )
    assert "partial_count" in plan, plan
    total = agg.agg(F.sum("records_in_doc")).collect()[0][0]
    assert total == N_EVENTS
    hot = agg.where(F.col("region") == "ROZ")
    # even ids land on the 6 even window slots: one output row per
    # (region, window), not per record
    assert hot.count() == 6
    hot_total = hot.agg(F.sum("records_in_doc")).collect()[0][0]
    assert hot_total == N_EVENTS // 2
