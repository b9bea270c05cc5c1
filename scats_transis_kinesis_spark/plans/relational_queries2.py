"""Second batch of relational-surface queries: selective scan-heavy
aggregation (TPC-H q6 shape), conditional aggregation (q12 shape),
HAVING over a grouped subquery (q18 shape), and an explicitly salted
skew-proof join that returns bit-identical results to the plain join."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table
from .registry import register


@register(
    "q6_forecast_revenue",
    oracle="""
        SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc="""TPC-H q6 shape: highly selective conjunctive filter + global
    aggregate.  Every predicate (date range, discount band, quantity)
    reaches the parquet scan as a pushed filter — at 100 TB with
    date-partitioned layout this prunes partitions before reading;
    the aggregate is a single partial+final sum, no keyed shuffle.""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q12_priority_shipping",
    oracle="""
        SELECT l.l_returnflag,
               sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
               sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS low_line_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY l.l_returnflag
    """,
    doc="""TPC-H q12 shape: fact-fact equi-join + conditional aggregation
    (CASE inside SUM).  The orders⋈lineitem join shuffles both sides on
    the order key once; the conditional sums are partial-aggregated
    map-side so the final exchange carries 3 rows per partition.""",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q18_large_volume_orders",
    oracle="""
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
               round(agg.total_qty, 4) AS total_qty
        FROM orders o
        JOIN (
            SELECT l_orderkey, sum(l_quantity) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(l_quantity) > 250
        ) agg ON o.o_orderkey = agg.l_orderkey
    """,
    doc="""TPC-H q18 shape: grouped subquery with HAVING, joined back to
    the parent table.  The quantity rollup aggregates lineitem down to
    |orders| rows *before* the join (aggregate pushdown by
    construction); the HAVING filter then shrinks the join's build side
    to the rare heavy orders — at 100 TB that side becomes
    broadcastable and the orders scan never shuffles.""",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    agg = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    return o.join(agg, o.o_orderkey == agg.l_orderkey).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.round("total_qty", 4).alias("total_qty"),
    )


SALT_BUCKETS = 8


@register(
    "salted_join_skew",
    oracle="""
        SELECT c.c_nationkey,
               count(*) AS n_events,
               round(sum(e.value), 4) AS total_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c.c_nationkey
    """,
    doc="""Skew-proof salted join: the fact side gets a deterministic
    salt in [0, 8), the dimension side is exploded 8× so every
    (key, salt) combination exists, and the join runs on the composite
    key — a hot user's rows spread over 8 shuffle partitions instead of
    one.  Salting is purely a physical strategy: the result is
    bit-identical to the plain join the oracle runs.  (AQE skew-join
    handles moderate skew automatically; explicit salting is the tool
    for pathological single-key hotspots.)""",
)
def salted_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import salted_join

    e = load_table(spark, "events", sf_dir)
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    return (
        salted_join(
            e, c, "user_id", "c_custkey",
            salt_on=["event_id"], buckets=SALT_BUCKETS,
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


_CORRELATED_SQL = """
    SELECT o.o_orderkey, o.o_custkey,
           round(o.o_totalprice, 4) AS total_price
    FROM orders o
    WHERE o.o_totalprice > (
        SELECT 1.5 * avg(o2.o_totalprice)
        FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
"""


@register(
    "correlated_subquery_orders",
    oracle=_CORRELATED_SQL,
    doc="""Correlated scalar subquery (orders 1.5× above their
    customer's average), same ANSI text in both engines.  Catalyst
    decorrelates it into an aggregate + self-join on o_custkey — one
    keyed shuffle, no per-row re-execution; the plan is the same shape
    a hand-written window/join would produce.""",
)
def correlated_subquery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders")
    return spark.sql(_CORRELATED_SQL)
