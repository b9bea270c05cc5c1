"""Round-5 privacy/compliance audits — the governance side of a
training-data platform.

- ``k_anonymity_audit`` — k-anonymity of the customer table under the
  quasi-identifier (nation, market segment): equivalence-class sizes,
  classes below k, rows at re-identification risk, l-diversity of the
  account-balance band, and the same screen after ONE generalization
  step (drop the segment) showing how coarsening restores k.  The
  standard privacy screen run before a demographic column ships into a
  training corpus (Sweeney '02; Machanavajjhala '07 for l-diversity).
- ``erasure_cascade_audit`` — right-to-be-forgotten propagation: a
  deletion request set (customers flagged by predicate) cascades
  through orders to line items; the audit reports, per table, total
  rows, rows to erase, and an identity checksum over the erased keys —
  the verification artifact an erasure job must reproduce.
- ``quantile_normalize_by_source`` — cross-source quantile
  normalization of document length (Bolstad '03 batch-effect
  correction applied to corpus curation): rank within source, replace
  with the cross-source mean at the rank.

Scale shapes: k-anonymity is two grouped aggregations over the
dimension (the QI class frame is |classes| rows — trivially
driver-safe); the erasure cascade is semi-join key propagation — the
request set broadcasts (requests are tiny by nature), the
orders→lineitem hop is a keyed shuffle semi-join at 100 TB (a
broadcast here only because the flagged order set is small at test
scale), and the full-table totals ride the SAME scan as the erased
counts (conditional aggregation, not a second pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table
from .registry import register

# k-anonymity threshold and the account-balance banding used as the
# sensitive attribute for l-diversity (low/mid/high thirds of the
# TPC-H acctbal range).
K_ANON = 10
ACCTBAL_BANDS = (0.0, 5000.0)

# Erasure request predicate: deeply negative balances (~0.7% of
# customers) stand in for an explicit deletion-request list.
ERASE_BAL = -900.0

_BAND_SQL = (
    f"CASE WHEN c_acctbal < {ACCTBAL_BANDS[0]} THEN 'low' "
    f"WHEN c_acctbal < {ACCTBAL_BANDS[1]} THEN 'mid' ELSE 'high' END"
)


@register(
    "k_anonymity_audit",
    oracle=f"""
        WITH cls AS (
            SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS sz,
                   count(DISTINCT {_BAND_SQL})::BIGINT AS l_div
            FROM customer GROUP BY c_nationkey, c_mktsegment
        ), fine AS (
            SELECT count(*)::BIGINT AS n_classes,
                   sum(sz)::BIGINT AS n_rows,
                   count(*) FILTER (WHERE sz < {K_ANON})::BIGINT
                       AS n_violating_classes,
                   coalesce(sum(sz) FILTER (WHERE sz < {K_ANON}), 0)::BIGINT
                       AS n_rows_at_risk,
                   min(sz)::BIGINT AS min_class_size,
                   min(l_div)::BIGINT AS min_l
            FROM cls
        ), coarse AS (
            SELECT count(*)::BIGINT AS n_classes_coarse,
                   count(*) FILTER (WHERE sz < {K_ANON})::BIGINT
                       AS n_violating_coarse,
                   min(sz)::BIGINT AS min_class_size_coarse
            FROM (
                SELECT c_nationkey, count(*)::BIGINT AS sz
                FROM customer GROUP BY c_nationkey
            )
        )
        SELECT {K_ANON}::BIGINT AS k, fine.*, coarse.* FROM fine, coarse
    """,
    doc=f"""k-anonymity / l-diversity screen (k = {K_ANON}) of the
    customer table under QI = (nation, segment), plus the one-step
    generalization (QI = nation alone) that shows coarsening restoring
    k.  Two grouped aggregations over the dimension; the class frame
    is |nations × segments| rows, the audit a single row.  At 100 TB
    the QI groupBy is one keyed shuffle over the dimension table —
    the fact tables never participate.""",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    band = (
        F.when(F.col("c_acctbal") < ACCTBAL_BANDS[0], "low")
        .when(F.col("c_acctbal") < ACCTBAL_BANDS[1], "mid")
        .otherwise("high")
    )
    cls = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("sz"),
        F.countDistinct(band).alias("l_div"),
    )
    fine = cls.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("sz").alias("n_rows"),
        F.count(F.when(F.col("sz") < K_ANON, 1)).alias("n_violating_classes"),
        F.coalesce(
            F.sum(F.when(F.col("sz") < K_ANON, F.col("sz"))), F.lit(0)
        ).alias("n_rows_at_risk"),
        F.min("sz").alias("min_class_size"),
        F.min("l_div").alias("min_l"),
    )
    coarse = (
        cust.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.count(F.lit(1)).alias("n_classes_coarse"),
            F.count(F.when(F.col("sz") < K_ANON, 1)).alias("n_violating_coarse"),
            F.min("sz").alias("min_class_size_coarse"),
        )
    )
    return fine.crossJoin(F.broadcast(coarse)).select(
        F.lit(K_ANON).cast("long").alias("k"),
        "n_classes",
        "n_rows",
        "n_violating_classes",
        "n_rows_at_risk",
        "min_class_size",
        "min_l",
        "n_classes_coarse",
        "n_violating_coarse",
        "min_class_size_coarse",
    )


@register(
    "erasure_cascade_audit",
    oracle=f"""
        WITH forget AS (
            SELECT c_custkey FROM customer WHERE c_acctbal < {ERASE_BAL}
        ), eo AS (
            SELECT o_orderkey FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM forget)
        )
        SELECT 'customer' AS tbl, count(*)::BIGINT AS n_total,
               count(*) FILTER (WHERE c_acctbal < {ERASE_BAL})::BIGINT
                   AS n_erased,
               coalesce(sum(c_custkey)
                        FILTER (WHERE c_acctbal < {ERASE_BAL}), 0)::BIGINT
                   AS erased_key_checksum
        FROM customer
        UNION ALL
        SELECT 'orders', count(*)::BIGINT,
               count(*) FILTER (WHERE o_orderkey IN
                                (SELECT o_orderkey FROM eo))::BIGINT,
               coalesce(sum(o_orderkey)
                        FILTER (WHERE o_orderkey IN
                                (SELECT o_orderkey FROM eo)), 0)::BIGINT
        FROM orders
        UNION ALL
        SELECT 'lineitem', count(*)::BIGINT,
               count(*) FILTER (WHERE l_orderkey IN
                                (SELECT o_orderkey FROM eo))::BIGINT,
               coalesce(sum(l_orderkey + l_linenumber)
                        FILTER (WHERE l_orderkey IN
                                (SELECT o_orderkey FROM eo)), 0)::BIGINT
        FROM lineitem
    """,
    doc=f"""Right-to-be-forgotten cascade audit: customers flagged by
    the request predicate (acctbal < {ERASE_BAL}) cascade through
    orders to line items; per table the audit reports total rows, rows
    to erase, and an identity checksum over the erased keys — the
    artifact the erasure job must reproduce before and after deletion.
    Scale shape: the request set broadcasts (requests are tiny by
    nature); each fact table is scanned ONCE with an erased flag
    attached by join, so totals and erased counts share the scan; the
    orders→lineitem hop is a keyed semi-join that shuffles at 100 TB
    (the broadcast here reflects the flagged-order set staying small —
    requests × orders-per-customer).""",
)
def erasure_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    forget = cust.where(F.col("c_acctbal") < ERASE_BAL).select("c_custkey")

    def _audit(df: DataFrame, tbl: str, flag, checksum) -> DataFrame:
        return df.agg(
            F.lit(tbl).alias("tbl"),
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(flag, 1)).alias("n_erased"),
            F.coalesce(F.sum(F.when(flag, checksum)), F.lit(0))
            .cast("long")
            .alias("erased_key_checksum"),
        ).select("tbl", "n_total", "n_erased", "erased_key_checksum")

    c_flagged = cust.select(
        "c_custkey", "c_acctbal", (F.col("c_acctbal") < ERASE_BAL).alias("er")
    )
    o_flagged = orders.join(
        F.broadcast(forget), orders.o_custkey == forget.c_custkey, "left"
    ).select("o_orderkey", F.col("c_custkey").isNotNull().alias("er"))
    erased_orders = o_flagged.where("er").select("o_orderkey")
    l_flagged = li.join(
        F.broadcast(erased_orders.withColumnRenamed("o_orderkey", "eok")),
        li.l_orderkey == F.col("eok"),
        "left",
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.col("eok").isNotNull().alias("er"),
    )
    return (
        _audit(c_flagged, "customer", F.col("er"), F.col("c_custkey"))
        .unionByName(_audit(o_flagged, "orders", F.col("er"), F.col("o_orderkey")))
        .unionByName(
            _audit(
                l_flagged,
                "lineitem",
                F.col("er"),
                F.col("l_orderkey") + F.col("l_linenumber"),
            )
        )
    )


@register(
    "quantile_normalize_by_source",
    oracle="""
        WITH ranked AS (
            SELECT doc_id, source, n_chars,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars, doc_id) AS rk
            FROM documents
        ), targets AS (
            SELECT rk, round(avg(n_chars) * 1e6)::BIGINT AS qnorm_micros
            FROM ranked GROUP BY rk
            HAVING count(*) = (SELECT count(DISTINCT source) FROM documents)
        )
        SELECT r.doc_id, r.source, r.n_chars, r.rk, t.qnorm_micros
        FROM ranked r JOIN targets t ON r.rk = t.rk
    """,
    doc="""Quantile normalization of document length across sources
    (the batch-effect correction standard in expression analysis,
    Bolstad '03, applied to corpus curation): rank within source, then
    replace each value with the cross-source mean at its rank, so
    every source ends up with the SAME length distribution — the
    pre-mixing step that stops one source's length profile from
    leaking through a mixture.  Ranks not present in every source are
    dropped (the defined behavior when group sizes differ).  Scale
    shape: one per-source window (partitioned — never global), one
    |ranks|-keyed aggregation, one rank-keyed join back; a single
    source too large for one partition's window switches to the
    hierarchical rank machinery (``bucketed_prefix_sums``) unchanged.
    The 1-row source-count aggregate broadcasts into the HAVING.""",
)
def quantile_normalize_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "source", "n_chars"
    )
    rk = F.row_number().over(
        W.partitionBy("source").orderBy("n_chars", "doc_id")
    )
    ranked = docs.withColumn("rk", rk)
    n_sources = docs.agg(
        F.countDistinct("source").alias("ns")
    )
    targets = (
        ranked.groupBy("rk")
        .agg(
            F.round(F.avg("n_chars") * 1e6).cast("long").alias("qnorm_micros"),
            F.count(F.lit(1)).alias("n_at_rank"),
        )
        .crossJoin(F.broadcast(n_sources))
        .where(F.col("n_at_rank") == F.col("ns"))
        .select("rk", "qnorm_micros")
    )
    return ranked.join(targets, "rk").select(
        "doc_id", "source", "n_chars", "rk", "qnorm_micros"
    )
