"""Relational coverage queries — the operator categories the reference
lacks entirely (SURVEY.md §2.7), exercised on the TPC-H-ish star schema.

Scale notes baked into each plan:
- Dimension joins (region/nation/supplier) are broadcast — no shuffle of
  the fact table.
- Fact-fact joins (orders⋈lineitem) shuffle on the join key once; AQE
  handles skew.
- Window queries shuffle once on the partition key and reuse the sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.relational import asof_join, sessionize, top_k_per_group
from ..sources.loaders import load_table
from .registry import register


@register(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               round(sum(l_extendedprice), 4) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2024-11-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="""TPC-H Q1 shape — the canonical grouped aggregation: 2 keys,
    8 aggregates, predicate pushed to the scan.  Partial aggregation
    map-side means the shuffle carries ~|groups|×|partitions| rows.""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2024-11-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_top_revenue",
    oracle="""
        SELECT o.o_orderkey,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
               o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY o.o_orderkey, o.o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    doc="""TPC-H Q3 shape — selective dim filter, 3-way join, grouped
    agg, global top-k with deterministic tiebreak.  The customer side is
    broadcast (post-filter it is small); orders⋈lineitem shuffles on
    orderkey.  TakeOrderedAndProject replaces a full sort for the
    LIMIT.""",
)
def q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir).where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", "o_orderpriority")
    )


@register(
    "q5_nation_revenue",
    oracle="""
        SELECT n.n_name,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
    """,
    doc="""TPC-H Q5 shape — star join through two broadcast dims with a
    region filter.  The fact table never shuffles for the joins; only
    the final small aggregation shuffles.""",
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).where(F.col("r_name") == "ASIA")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )


@register(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400)
    """,
    doc="Left-semi join (EXISTS) — emits each customer at most once.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).where(F.col("o_totalprice") > 400)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 490000)
    """,
    doc="""Left-anti join (NOT EXISTS) — customers with no order above
    490k (threshold chosen so the result is non-empty at sf0.01).""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).where(F.col("o_totalprice") > 490000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_outer_counts",
    oracle="""
        SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
               round(coalesce(sum(o.o_totalprice), 0), 4) AS total_spend
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    """,
    doc="Left-outer join + grouped agg, nulls counted as zero.",
)
def join_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias("total_spend"),
        )
    )


@register(
    "setops_users",
    oracle="""
        (SELECT user_id FROM events WHERE event_type = 'click'
         INTERSECT
         SELECT user_id FROM events WHERE event_type = 'purchase')
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'error'
        GROUP BY user_id HAVING count(*) > 20
    """,
    doc="""Set operations: INTERSECT + EXCEPT (distinct set semantics);
    the EXCEPT side is thresholded so the result is non-empty at
    sf0.01.""",
)
def setops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    clickers = ev.where(F.col("event_type") == "click").select("user_id")
    buyers = ev.where(F.col("event_type") == "purchase").select("user_id")
    noisy = (
        ev.where(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 20)
        .select("user_id")
    )
    return clickers.intersect(buyers).exceptAll(noisy)


@register(
    "union_type_pairs",
    oracle="""
        SELECT user_id, 'click_or_view' AS kind FROM events
        WHERE event_type IN ('click', 'view')
        UNION
        SELECT user_id, 'buyer' AS kind FROM events WHERE event_type = 'purchase'
    """,
    doc="UNION (distinct) of two labeled selections.",
)
def union_type_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    a = ev.where(F.col("event_type").isin("click", "view")).select(
        "user_id", F.lit("click_or_view").alias("kind")
    )
    b = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.lit("buyer").alias("kind")
    )
    return a.union(b).distinct()


@register(
    "window_order_ranks",
    oracle="""
        SELECT * FROM (
            SELECT o_custkey, o_orderkey,
                   row_number() OVER w AS rn,
                   lag(o_orderkey) OVER w AS prev_order,
                   lead(o_orderkey) OVER w AS next_order,
                   round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                       AS running_spend
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ) t WHERE rn <= 3
    """,
    doc="""Window functions — row_number/lag/lead + running frame sum over
    one shared sort (single shuffle on the partition key).""",
)
def window_order_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.lag("o_orderkey").over(w).alias("prev_order"),
            F.lead("o_orderkey").over(w).alias("next_order"),
            F.round(
                F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 4
            ).alias("running_spend"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "rollup_status_priority",
    oracle="""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n, round(sum(o_totalprice), 4) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="ROLLUP hierarchy totals (status → status+priority → grand).",
)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 4).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


@register(
    "cube_status_priority",
    oracle="""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE — all grouping-set combinations.",
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
        )
    )


@register(
    "topk_orders_per_customer",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) t WHERE rn <= 3
    """,
    doc="Top-k per group (k=3) with deterministic tiebreak.",
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return top_k_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        3,
    ).select("o_custkey", "o_orderkey", "o_totalprice")


@register(
    "orderby_limit_global",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    doc="""Global sort + limit — Spark plans TakeOrderedAndProject
    (per-partition top-k then merge at the driver), never a full sort.""",
)
def orderby_limit_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "range_join_ship_lag",
    oracle="""
        SELECT o.o_orderpriority, count(*) AS n_items,
               round(sum(l.l_quantity), 4) AS total_qty
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         AND l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate <= o.o_orderdate + INTERVAL 7 DAY
        GROUP BY o.o_orderpriority
    """,
    doc="""Equi + range join — the equi key carries the shuffle; the
    range predicate evaluates post-join (never a cartesian).""",
)
def range_join_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= o.o_orderdate + F.expr("INTERVAL 7 DAY"))
    )
    return (
        li.join(o, cond)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"), F.round(F.sum("l_quantity"), 4).alias("total_qty"))
    )


@register(
    "asof_purchase_last_click",
    oracle="""
        SELECT p.event_id, p.user_id,
               floor(epoch(c.ts))::BIGINT AS asof_click_epoch
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="""As-of join — for each purchase, the latest click at or before
    it per user.  Implemented as union + last-ignorenulls over one window
    sort (operators/relational.py:asof_join): one shuffle, no range
    explosion.""",
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts", right_value_cols=["ts"]
    )
    return joined.select(
        "event_id", "user_id", F.unix_timestamp("asof_ts").alias("asof_click_epoch")
    )


@register(
    "pivot_event_counts",
    oracle="""
        SELECT user_id,
               count(*) FILTER (event_type = 'click') AS click,
               count(*) FILTER (event_type = 'view') AS view,
               count(*) FILTER (event_type = 'purchase') AS purchase,
               count(*) FILTER (event_type = 'signup') AS signup,
               count(*) FILTER (event_type = 'error') AS error
        FROM events GROUP BY user_id
    """,
    doc="Pivot — event-type counts as columns per user.",
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .count()
        .na.fill(0, subset=types)
    )


@register(
    "sessionize_users",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        )
        SELECT user_id, sum(is_new)::BIGINT AS n_sessions, count(*) AS n_events
        FROM flagged GROUP BY user_id
    """,
    doc="""Sessionization — 30-min-gap sessions via lag + running sum
    (operators/relational.py:sessionize); streaming twin uses
    session_window.""",
)
def sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select("user_id", "ts")
    sessions = sessionize(ev, key="user_id", ts="ts", gap_minutes=30)
    return sessions.groupBy("user_id").agg(
        F.max("session_seq").alias("n_sessions"), F.count("*").alias("n_events")
    )


@register(
    "distinct_exact",
    oracle="SELECT count(DISTINCT user_id) AS n_users, count(DISTINCT event_type) AS n_types FROM events",
    doc="Exact distinct aggregation (expand + two-phase count).",
)
def distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
    )


@register(
    "approx_distinct",
    oracle="""
        SELECT event_type,
               count(DISTINCT user_id) AS exact_users,
               TRUE AS approx_within_5pct
        FROM events GROUP BY event_type
    """,
    doc="""approx_count_distinct (HyperLogLog++, rsd=0.01).  Sketch
    estimates differ across engines, but the estimate is DETERMINISTIC
    for a fixed input — so the hash-checked contract is a bounded-error
    assertion: the approx estimate must land within 5% of the exact
    count (measured deterministic error ≤ 0.7% at sf 0.001/0.01/0.1 —
    huge margin).  The oracle carries the exact counts plus the
    always-true bound.""",
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("approx_within_5pct"),
    )
