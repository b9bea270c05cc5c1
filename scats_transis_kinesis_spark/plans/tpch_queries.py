"""Third batch of TPC-H-shaped relational coverage: EXISTS semi-join
(q4), outer-join count distribution (q13), conditional-ratio aggregate
(q14), distinct-count with exclusion subquery (q16), disjunctive join
predicate (q19), and a manual width-bucket histogram."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table
from .registry import register


@register(
    "q4_priority_exists",
    oracle="""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
        )
        GROUP BY o_orderpriority
    """,
    doc="""TPC-H q4 shape: EXISTS correlated subquery → left-semi join.
    The semi join emits each order at most once regardless of matching
    lineitem multiplicity — the build side deduplicates in the join
    itself, no distinct needed.""",
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    cond = (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate)
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "q13_order_count_distribution",
    oracle="""
        WITH per_cust AS (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey
        )
        SELECT c_count, count(*) AS custdist
        FROM per_cust GROUP BY c_count
    """,
    doc="""TPC-H q13 shape: left outer join + two-level aggregation —
    customers with zero orders survive the outer join (count of a NULL
    key = 0) and land in the c_count=0 bucket.  The distribution
    aggregate runs over |customers| rows, already reduced.""",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_revenue_ratio",
    oracle="""
        SELECT round(
                 100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
    doc="""TPC-H q14 shape: conditional-ratio aggregate over a fact⋈dim
    join — the part side broadcasts, both sums partial-aggregate
    map-side, the final exchange carries two doubles per partition.""",
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"))
    )


@register(
    "q16_supplier_count_excluding",
    oracle="""
        SELECT p.p_brand, p.p_size,
               count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
        )
        GROUP BY p.p_brand, p.p_size
    """,
    doc="""TPC-H q16 shape: NOT IN exclusion subquery (anti join against
    a tiny filtered build side) + grouped distinct count.  The distinct
    aggregates via partial sets per partition — the exchange carries
    (brand, size, suppkey) triples, not raw lineitem rows.""",
)
def q16_supplier_count_excluding(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    bad = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q19_disjunctive_predicate_join",
    oracle="""
        SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
               count(*) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="""TPC-H q19 shape: OR-of-ANDs predicate across both join sides.
    Catalyst keeps the equi-key (partkey) as the join condition and
    evaluates the disjunction post-join; the common subexpressions
    (brand checks) stay on the broadcast side.""",
)
def q19_disjunctive_predicate_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    q = F.col("l_quantity")
    b = F.col("p_brand")
    pred = (
        ((b == "Brand#1") & q.between(1, 11))
        | ((b == "Brand#2") & q.between(10, 20))
        | ((b == "Brand#3") & q.between(20, 30))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .where(pred)
        .agg(F.round(F.sum(rev), 4).alias("revenue"), F.count("*").alias("n_lines"))
    )


HIST_BUCKETS = 10
HIST_LO, HIST_HI = 0.0, 500_000.0


@register(
    "histogram_order_totals",
    oracle=f"""
        SELECT least(floor((o_totalprice - {HIST_LO}) * {HIST_BUCKETS}
                           / ({HIST_HI} - {HIST_LO})), {HIST_BUCKETS - 1})::BIGINT
                   AS bucket,
               count(*) AS n_orders,
               round(min(o_totalprice), 4) AS lo,
               round(max(o_totalprice), 4) AS hi
        FROM orders
        GROUP BY 1
    """,
    doc="""Equi-width histogram via an explicit bucket formula (identical
    IEEE arithmetic in both engines) — the profiling primitive behind
    range-partition planning and skew detection.  One grouped aggregate;
    the bucket expression is codegen'd into the scan stage.""",
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    bucket = F.least(
        F.floor(
            (F.col("o_totalprice") - HIST_LO) * HIST_BUCKETS / (HIST_HI - HIST_LO)
        ),
        F.lit(HIST_BUCKETS - 1),
    ).cast("long")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 4).alias("lo"),
            F.round(F.max("o_totalprice"), 4).alias("hi"),
        )
    )


@register(
    "grouped_percentiles",
    oracle="""
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
               round(quantile_cont(o_totalprice, 0.99), 4) AS p99
        FROM orders GROUP BY o_orderpriority
    """,
    doc="""Exact grouped percentiles (linear interpolation — Spark
    ``percentile`` and DuckDB ``quantile_cont`` agree bit-for-bit at
    round-4).  Exact percentiles require the full sorted group; the
    scale path swaps in approx_percentile (t-digest) per the
    approx_distinct pattern when groups stop fitting.""",
)
def grouped_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


@register(
    "grouped_percentiles_approx",
    oracle="""
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.5), 4) AS exact_p50,
               round(quantile_cont(o_totalprice, 0.95), 4) AS exact_p95,
               TRUE AS approx_within_2pct
        FROM orders GROUP BY o_orderpriority
    """,
    doc="""Approximate grouped percentiles (GK sketch via
    ``percentile_approx``) under the same hash-checkable bounded-error
    contract as ``approx_distinct``: the sketch estimate is
    DETERMINISTIC for a fixed input, and the checked claim is that it
    lands within 2% (relative) of the exact percentile the oracle
    carries.  The sketch is mergeable — partial aggregation map-side,
    O(accuracy) state per group instead of the full sorted group the
    exact form needs, which is why it is the 100 TB default.""",
)
def grouped_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    agg = o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("exact_p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("exact_p95"),
        F.expr("percentile_approx(o_totalprice, 0.5, 10000)").alias("a50"),
        F.expr("percentile_approx(o_totalprice, 0.95, 10000)").alias("a95"),
    )
    within = (
        (F.abs(F.col("a50") - F.col("exact_p50")) <= 0.02 * F.abs(F.col("exact_p50")))
        & (F.abs(F.col("a95") - F.col("exact_p95")) <= 0.02 * F.abs(F.col("exact_p95")))
    )
    return agg.select(
        "o_orderpriority",
        "exact_p50",
        "exact_p95",
        within.alias("approx_within_2pct"),
    )


@register(
    "upsert_snapshot_changes",
    oracle="""
        WITH changes AS (
            SELECT c_custkey, c_name, c_nationkey,
                   round(c_acctbal + 1000.0, 4) AS c_acctbal, c_mktsegment
            FROM customer WHERE c_custkey % 10 = 0
            UNION ALL
            SELECT c_custkey + 1000000, c_name, c_nationkey,
                   round(c_acctbal, 4), c_mktsegment
            FROM customer WHERE c_custkey < 5
        ),
        tagged AS (
            SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 4) AS c_acctbal,
                   c_mktsegment, 0 AS _src
            FROM customer
            UNION ALL
            SELECT *, 1 AS _src FROM changes
        )
        SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY c_custkey ORDER BY _src DESC) AS _rn
            FROM tagged
        ) WHERE _rn = 1
    """,
    doc="""Snapshot + change-set merge (MERGE INTO semantics): updates
    replace, unmatched changes insert — the operation the reference's
    topology-delta pull feeds (getTopologyChangesFromDate, reference:
    transis_consumer.py:157-164).  Union + per-key latest-wins: one
    shuffle on the key (operators/relational.py:upsert).  The change
    set here is a deterministic derivation (every 10th customer's
    balance bumped, five re-keyed inserts) so both engines build the
    identical delta.""",
)
def upsert_snapshot_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import upsert

    c = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_nationkey",
        F.round("c_acctbal", 4).alias("c_acctbal"), "c_mktsegment",
    )
    updates = c.where(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.round(F.col("c_acctbal") + 1000.0, 4)
    )
    inserts = c.where(F.col("c_custkey") < 5).withColumn(
        "c_custkey", F.col("c_custkey") + 1_000_000
    )
    return upsert(c, updates.unionByName(inserts), "c_custkey")


@register(
    "q17_small_quantity_revenue",
    oracle="""
        SELECT round(sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
          AND l.l_quantity < (
              SELECT 0.2 * avg(l2.l_quantity)
              FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
          )
    """,
    doc="""TPC-H q17 shape: correlated average subquery against the same
    fact table.  Catalyst decorrelates into a per-partkey aggregate
    joined back — the aggregate side is |parts| rows, broadcastable;
    the fact table is scanned twice but shuffled once each on the same
    key (a CTE/cache would share the scan at a real deployment).""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(p.where(F.col("p_brand") == "Brand#1"), li.l_partkey == p.p_partkey)
        .join(thresholds, li.l_partkey == thresholds.t_partkey)
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@register(
    "q21_waiting_orders_multi_exists",
    oracle="""
        SELECT s.s_name, count(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > l1.l_shipdate
          )
        GROUP BY s.s_name
    """,
    doc="""TPC-H q21 shape: EXISTS + NOT EXISTS against the same fact
    table (the last supplier to ship on a multi-supplier order).  Two
    self-joins on the order key, planned as a semi then an anti join —
    both shuffles share the l_orderkey partitioning, so AQE reuses the
    exchange; the supplier/orders dims broadcast.""",
)
def q21_waiting_orders_multi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, "supplier", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    l1 = li.alias("l1")
    l2 = li.alias("l2")
    l3 = li.alias("l3")
    has_other = l1.join(
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    not_later = has_other.alias("l1").join(
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
        & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
        "left_anti",
    )
    return (
        not_later.join(o.where(F.col("o_orderstatus") == "F"), F.col("l_orderkey") == o.o_orderkey)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "q22_idle_customers_not_exists",
    oracle="""
        SELECT substr(c.c_name, 10, 2) AS cntrycode,
               count(*) AS numcust,
               round(sum(c.c_acctbal), 4) AS totacctbal
        FROM customer c
        WHERE c.c_acctbal > (
            SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
        )
        GROUP BY 1
    """,
    doc="""TPC-H q22 shape: uncorrelated scalar subquery (global
    average, one row broadcast) + NOT EXISTS anti join (customers
    with no urgent orders) + substring grouping.  The anti join's build side is the orders key set; at
    scale the distinct o_custkey projection shrinks it before the
    broadcast.""",
)
def q22_idle_customers_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            o.where(F.col("o_orderpriority") == "1-URGENT"),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy(F.substring("c_name", 10, 2).alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


@register(
    "window_frames_running",
    oracle="""
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                   AS running_total,
               round(avg(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
                   AS moving_avg_3,
               ntile(4) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                   AS quartile
        FROM orders WHERE o_custkey < 200
    """,
    doc="""Window frame surface: running total (unbounded preceding),
    3-row moving average, and ntile quartiles — per-customer frames over
    a deterministic (date, key) order.  One shuffle on the partition
    key; all three functions share the same sort, so Spark evaluates
    them in a single Window operator.""",
)
def window_frames_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_table(spark, "orders", sf_dir).where(F.col("o_custkey") < 200)
    order = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = order.rowsBetween(W.unboundedPreceding, W.currentRow)
    moving = order.rowsBetween(-2, W.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(running), 4).alias("running_total"),
        F.round(F.avg("o_totalprice").over(moving), 4).alias("moving_avg_3"),
        F.ntile(4).over(order).alias("quartile"),
    )


@register(
    "q7_nation_trade_volume",
    oracle="""
        SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
               year(l.l_shipdate) AS ship_year,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS volume
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        WHERE cn.n_nationkey < 2 AND sn.n_nationkey < 2
          AND cn.n_nationkey <> sn.n_nationkey
        GROUP BY 1, 2, 3
    """,
    doc="""TPC-H q7 shape: five-way join resolving both trading nations
    of each line item, grouped by (customer nation, supplier nation,
    year).  The one fact-fact shuffle is orders⋈lineitem on the order
    key; customer/supplier/nation all broadcast, and the nation filters
    prune before the join.""",
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    cn = n.where(F.col("n_nationkey") < 2).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.where(F.col("n_nationkey") < 2).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(cn, c.c_nationkey == F.col("cn_key"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(sn, s.s_nationkey == F.col("sn_key"))
        .where(F.col("cn_key") != F.col("sn_key"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(F.round(F.sum(rev), 4).alias("volume"))
    )


@register(
    "q10_returned_revenue_top20",
    oracle="""
        SELECT c.c_custkey, c.c_name, n.n_name,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    doc="""TPC-H q10 shape: revenue lost to returns per customer, top
    20.  The returnflag filter pushes to the lineitem scan; one
    orders⋈lineitem shuffle; customer/nation broadcast; the global
    top-20 is a TakeOrdered (per-partition heads merged at the driver),
    never a full sort.""",
)
def q10_returned_revenue_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).where(F.col("l_returnflag") == "R")
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q15_top_supplier_by_revenue",
    oracle="""
        WITH sup_rev AS (
            SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 4)
                       AS total_revenue
            FROM lineitem GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s
        JOIN sup_rev r ON r.l_suppkey = s.s_suppkey
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM sup_rev)
    """,
    doc="""TPC-H q15 shape: aggregate view + equality-to-max filter (all
    suppliers achieving the maximum revenue — robust to ties, unlike a
    LIMIT 1).  The revenue rollup reduces lineitem to |suppliers| rows;
    the scalar max broadcasts back over that reduced frame.""",
)
def q15_top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    sup_rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_revenue"
        )
    )
    max_rev = sup_rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        s.join(sup_rev, s.s_suppkey == sup_rev.l_suppkey)
        .crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q2_min_per_group_suppliers",
    oracle="""
        SELECT s.s_suppkey, s.s_name, n.n_name, round(s.s_acctbal, 4) AS s_acctbal
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE s.s_acctbal = (
            SELECT min(s2.s_acctbal) FROM supplier s2
            WHERE s2.s_nationkey = s.s_nationkey
        )
    """,
    doc="""TPC-H q2 shape: correlated min-per-group equality filter (the
    lowest-balance supplier of each nation, ties kept).  Catalyst
    decorrelates into a per-nation min aggregate joined back — the
    aggregate side is |nations| rows, broadcast; no window sort
    needed.""",
)
def q2_min_per_group_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    mins = s.groupBy(F.col("s_nationkey").alias("m_key")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(mins), s.s_nationkey == F.col("m_key"))
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            "s_suppkey", "s_name", "n_name", F.round("s_acctbal", 4).alias("s_acctbal")
        )
    )


@register(
    "q8_market_share",
    oracle="""
        WITH all_trade AS (
            SELECT year(l.l_shipdate) AS yr,
                   l.l_extendedprice * (1 - l.l_discount) AS volume,
                   sn.n_nationkey AS supp_nation
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        )
        SELECT yr,
               round(sum(CASE WHEN supp_nation = 0 THEN volume ELSE 0 END)
                     / sum(volume), 6) AS nation0_share
        FROM all_trade GROUP BY yr
    """,
    doc="""TPC-H q8 shape: market-share ratio per year (one nation's
    volume over total volume) — a conditional-sum ratio over a
    fact⋈dim⋈dim join.  Both sums share one aggregation; supplier and
    nation broadcast; round-6 keeps the cross-engine ratio exact.""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(s, li.l_suppkey == s.s_suppkey).join(
        n, s.s_nationkey == n.n_nationkey
    )
    nat0 = F.when(F.col("n_nationkey") == 0, vol).otherwise(0.0)
    return (
        joined.groupBy(F.year("l_shipdate").alias("yr"))
        .agg(F.round(F.sum(nat0) / F.sum(vol), 6).alias("nation0_share"))
    )


@register(
    "q11_important_stock_share",
    oracle="""
        WITH sup_val AS (
            SELECT s.s_nationkey, round(sum(l.l_extendedprice * l.l_quantity), 4)
                       AS value
            FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
            GROUP BY s.s_nationkey
        )
        SELECT s_nationkey, value
        FROM sup_val
        WHERE value > (SELECT 0.05 * sum(value) FROM sup_val)
    """,
    doc="""TPC-H q11 shape: groups whose share exceeds a fraction of the
    global total (HAVING against an uncorrelated scalar aggregate of the
    same rollup).  The rollup runs once; the scalar total broadcasts
    back over |nations| rows.""",
)
def q11_important_stock_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    sup_val = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 4).alias(
                "value"
            )
        )
    )
    total = sup_val.agg((0.05 * F.sum("value")).alias("threshold"))
    return (
        sup_val.crossJoin(F.broadcast(total))
        .where(F.col("value") > F.col("threshold"))
        .select("s_nationkey", "value")
    )


@register(
    "q20_nested_in_chain",
    oracle="""
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        WHERE s.s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE '%a%'
            )
            GROUP BY l_suppkey
            HAVING sum(l_quantity) > 100
        )
        ORDER BY s.s_suppkey
    """,
    doc="""TPC-H q20 shape: two-level nested IN (suppliers who moved
    >100 units of matching parts) — planned as a chain of semi joins
    with the grouped HAVING filter in between.  Every level shrinks the
    key set before the next join; the final semi join's build side is
    the surviving supplier keys.""",
)
def q20_nested_in_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, "supplier", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    matching_parts = p.where(F.col("p_name").like("%a%")).select("p_partkey")
    heavy_suppliers = (
        li.join(matching_parts, li.l_partkey == matching_parts.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(heavy_suppliers, s.s_suppkey == heavy_suppliers.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "stats_correlation",
    oracle="""
        SELECT l_returnflag,
               round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
               round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
               round(regr_slope(l_extendedprice, l_quantity), 4) AS price_per_unit_slope,
               round(stddev_samp(l_extendedprice), 4) AS price_stddev
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="""Statistical aggregate surface: Pearson correlation, sample
    covariance, regression slope, and sample stddev per group — all
    single-pass partial-aggregable moments (sum, sum², sum·xy), so the
    shuffle carries a handful of doubles per group regardless of input
    size; both engines' two-pass-free formulas agree at round-4/6.""",
)
def stats_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias(
            "price_per_unit_slope"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
    )


@register(
    "listagg_order_priorities",
    oracle="""
        SELECT o_orderstatus,
               string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
                   AS priorities,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderstatus
    """,
    doc="""Ordered string aggregation (LISTAGG shape): the distinct
    priorities seen per order status, joined in sorted order —
    collect_set + sort_array + array_join on the Spark side makes the
    concatenation deterministic regardless of partitioning (an unsorted
    collect_list would be partition-order-dependent and could never
    hash-match).""",
)
def listagg_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy("o_orderstatus").agg(
        F.array_join(
            F.sort_array(F.collect_set("o_orderpriority")), ","
        ).alias("priorities"),
        F.count("*").alias("n_orders"),
    )


@register(
    "date_arithmetic_orders",
    oracle="""
        SELECT o_orderkey,
               datediff('day', o_orderdate, TIMESTAMP '2002-01-01')
                   AS age_days,
               (2002 - year(o_orderdate)) * 12 - month(o_orderdate) + 1
                   AS age_months,
               last_day(o_orderdate)::DATE AS month_end,
               quarter(o_orderdate) AS qtr
        FROM orders WHERE o_orderkey < 1000
    """,
    doc="""Calendar arithmetic surface: day-precision age against a
    fixed reference, integer calendar-month index difference (avoids
    the engines' divergent fractional months_between semantics),
    month-end boundary, quarter — all integer-exact expressions pushed
    into the scan stage.""",
)
def date_arithmetic_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir).where(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.datediff(F.lit("2002-01-01").cast("date"), F.to_date("o_orderdate")).alias(
            "age_days"
        ),
        (
            (F.lit(2002) - F.year("o_orderdate")) * 12
            - F.month("o_orderdate")
            + 1
        ).alias("age_months"),
        F.last_day("o_orderdate").alias("month_end"),
        F.quarter("o_orderdate").alias("qtr"),
    )


@register(
    "q9_product_profit",
    oracle="""
        SELECT n.n_name AS nation,
               year(o.o_orderdate) AS yr,
               round(sum(l.l_extendedprice * (1 - l.l_discount)
                         - p.p_retailprice * 0.1 * l.l_quantity), 4)
                   AS profit
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY n.n_name, year(o.o_orderdate)
    """,
    doc="""TPC-H q9 shape (product-type profit by nation and year): a
    5-way join fanning out from lineitem with a LIKE filter on part
    names, conditional profit arithmetic, and a (nation, year) rollup.
    The testdata has no partsupp table, so supply cost is derived as
    10% of p_retailprice — the join/aggregation topology (the point of
    q9) is unchanged.  part/supplier/nation broadcast; orders⋈lineitem
    is the one fact-fact shuffle; the LIKE predicate prunes part before
    the join fan-out.""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).where(F.col("p_name").like("%red%"))
    s = load_table(spark, "supplier", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * 0.1 * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr"))
        .agg(F.round(F.sum(profit), 4).alias("profit"))
    )
