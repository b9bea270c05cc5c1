"""Round-5 batch: nonparametric inference at full-table rank scale,
storage coalescing, and decomposition diagnostics:

- ``kruskal_wallis_priority_spend`` — the Kruskal–Wallis rank ANOVA
  ('52) across the five order-priority groups: the nonparametric twin
  of ``anova_f_priority_spend`` on the SAME question, so the pair
  shows parametric and rank-based inference agreeing (or not) on one
  dataset.  Its engine story: exact tie-averaged midranks over the
  FULL fact table computed hierarchically (bucketed windows + a
  bounded bucket-prefix join) — never an unpartitioned window, never
  a quadratic rank join.
- ``compaction_coalesce_plan`` — AQE-style small-files coalescing:
  hash shards roll up to byte sizes, contiguous shards merge until a
  target byte budget (total/8) — the plan a compaction job would
  execute verbatim, with per-group fill ratios.
- ``seasonal_strength_audit`` — Hyndman's strength-of-trend /
  strength-of-seasonality (FPP: 1 − Var(R)/Var(component + R)) per
  event type over the additive decomposition
  ``trend_seasonal_decompose`` already computes — the one-number
  summary that says whether the seasonal model is worth keeping.

Determinism contracts: midranks are exact integers via the 2×midrank
identity; Kruskal–Wallis combines exact int64 rank sums / tie terms
in one fixed-order double expression (ANOVA-pivot convention);
compaction is pure integer arithmetic; strengths quantize components
to milli-ints and compute variances from exact integer sufficient
statistics before one fixed double expression per type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.hashing import duckdb_hash32_sql, portable_hash32
from ..sources.loaders import load_table
from .pipeline_queries7 import trend_seasonal_decompose
from .pipeline_queries13 import _idiv
from .pipeline_queries17 import _PRIO_SHORT, _PRIORITIES
from .probes import probe_min_max
from .registry import register

# --- Kruskal–Wallis --------------------------------------------------------

_KW_BUCKETS = 32
# chi².95 with k−1 = 4 degrees of freedom.
_KW_CRIT = 9.487729


def _kw_oracle() -> str:
    pivots = ",\n                ".join(
        f"max(CASE WHEN grp = '{p}' THEN {c} END) AS {c}{i}"
        for i, p in enumerate(_PRIORITIES, 1)
        for c in ("r2j", "nj")
    )
    s_term = " + ".join(
        f"(r2j{i}::DOUBLE * r2j{i}) / (4 * nj{i})" for i in range(1, 6)
    )
    mean_cols = ", ".join(
        f"round((r2j{i}::DOUBLE / 2) / nj{i}, 4) AS mean_rank_{s}"
        for i, s in enumerate(_PRIO_SHORT, 1)
    )
    return f"""
        WITH x AS (
            SELECT o_orderpriority AS grp,
                   CAST(round(o_totalprice) AS BIGINT) AS xd
            FROM orders
        ), vals AS (
            SELECT xd, count(*)::BIGINT AS c FROM x GROUP BY xd
        ), ranks AS (
            SELECT xd,
                   (2 * (sum(c) OVER (ORDER BY xd
                                      ROWS UNBOUNDED PRECEDING) - c)
                    + c + 1)::BIGINT AS r2
            FROM vals
        ), gv AS (
            SELECT xd, grp, count(*)::BIGINT AS cnt
            FROM x GROUP BY xd, grp
        ), gstats AS (
            SELECT gv.grp, (sum(gv.cnt * ranks.r2))::BIGINT AS r2j,
                   (sum(gv.cnt))::BIGINT AS nj
            FROM gv JOIN ranks ON gv.xd = ranks.xd GROUP BY gv.grp
        ), ties AS (
            SELECT (sum(c * c * c - c))::BIGINT AS tie,
                   (sum(c))::BIGINT AS n
            FROM vals
        ), w AS (
            SELECT {pivots}
            FROM gstats
        ), e AS (
            SELECT *, ties.n AS n_total, ties.tie AS tie,
                   ({s_term}) AS s_term
            FROM w, ties
        ), h AS (
            SELECT n_total,
                   ((12.0 / (n_total::DOUBLE * (n_total + 1))) * s_term
                    - 3.0 * (n_total + 1))
                   / (1 - tie::DOUBLE
                          / (n_total::DOUBLE * n_total * n_total - n_total))
                       AS h_stat,
                   {mean_cols}
            FROM e
        )
        SELECT n_total, round(h_stat, 6) AS h_stat, 4::BIGINT AS df,
               (h_stat > {_KW_CRIT}) AS reject_95,
               {", ".join(f"mean_rank_{s}" for s in _PRIO_SHORT)}
        FROM h
    """


@register(
    "kruskal_wallis_priority_spend",
    oracle=_kw_oracle(),
    doc=f"""Kruskal–Wallis H test across the five order-priority groups
    on dollar-rounded spend — the rank-based (outlier-proof) twin of
    anova_f_priority_spend, with the tie correction 1 − Σ(t³−t)/(N³−N)
    and per-group mean ranks.  Determinism: tie-averaged midranks are
    exact integers (2·midrank = 2·|below| + |ties| + 1), group rank
    sums and the tie term are exact int64, and H is one fixed-order
    double expression on the 5-group pivot row.  Scale shape — the
    engine story: global midranks over the FULL fact table run
    hierarchically (the hierarchical_row_number pattern): distinct
    values range-bucket into {_KW_BUCKETS} equi-width buckets from a
    2-scalar driver probe, the cumulative count runs per bucket (a
    PARTITIONED window), and only {_KW_BUCKETS} bucket subtotals join
    back as prefix offsets (bounded nested loop, declared) — no
    unpartitioned window, no O(d²) rank join, at any data scale.""",
)
def kruskal_wallis_priority_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    x = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.round("o_totalprice").cast("long").alias("xd"),
    )
    # Pinned distinct-value frame (change-8 waist): the min/max probe,
    # the in-bucket window, both prefix-join sides and the tie
    # aggregate all read it — without the cut each re-derived the
    # grouped fact scan.  Eager: the probe collect follows immediately.
    vals = x.groupBy("xd").agg(F.count("*").alias("c")).localCheckpoint(
        eager=True
    )
    lo, hi = probe_min_max(
        vals, "xd", query="kruskal_wallis_priority_spend", sf_dir=sf_dir
    )
    width = max((hi - lo) / _KW_BUCKETS, 1e-9)
    bucket = F.least(
        F.lit(_KW_BUCKETS - 1),
        F.floor((F.col("xd") - F.lit(float(lo))) / F.lit(width)),
    ).alias("bucket")
    vb = vals.select("xd", "c", bucket)
    wnd = W.partitionBy("bucket").orderBy("xd").rowsBetween(
        W.unboundedPreceding, 0
    )
    within = vb.select(
        "xd", "c", "bucket", (F.sum("c").over(wnd) - F.col("c")).alias("less_in")
    )
    btot = vb.groupBy("bucket").agg(F.sum("c").alias("bc"))
    a, b = btot.alias("a"), btot.alias("b")
    prefix = (
        a.join(b, F.col("b.bucket") < F.col("a.bucket"), "left")
        .groupBy(F.col("a.bucket").alias("bucket"))
        .agg(F.coalesce(F.sum("b.bc"), F.lit(0)).alias("pb"))
    )
    ranks = within.join(F.broadcast(prefix), "bucket").select(
        "xd",
        (2 * (F.col("pb") + F.col("less_in")) + F.col("c") + 1).alias("r2"),
    )
    gv = x.groupBy("xd", "grp").agg(F.count("*").alias("cnt"))
    gstats = (
        gv.join(ranks, "xd")
        .groupBy("grp")
        .agg(
            F.sum(F.col("cnt") * F.col("r2")).alias("r2j"),
            F.sum("cnt").alias("nj"),
        )
    )
    ties = vals.agg(
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")).alias("tie"),
        F.sum("c").alias("n"),
    )
    w = gstats.agg(
        *[
            F.max(F.when(F.col("grp") == p, F.col(c))).alias(f"{c}{i}")
            for i, p in enumerate(_PRIORITIES, 1)
            for c in ("r2j", "nj")
        ]
    ).crossJoin(F.broadcast(ties))
    d = F.col
    s_term = (d("r2j1").cast("double") * d("r2j1")) / (4 * d("nj1"))
    for i in range(2, 6):
        s_term = s_term + (d(f"r2j{i}").cast("double") * d(f"r2j{i}")) / (
            4 * d(f"nj{i}")
        )
    n = d("n")
    h_stat = (
        (F.lit(12.0) / (n.cast("double") * (n + 1))) * s_term
        - F.lit(3.0) * (n + 1)
    ) / (
        1 - d("tie").cast("double") / (n.cast("double") * n * n - n)
    )
    return w.select(
        n.alias("n_total"),
        F.round(h_stat, 6).alias("h_stat"),
        F.lit(4).cast("long").alias("df"),
        (h_stat > _KW_CRIT).alias("reject_95"),
        *[
            F.round(
                (d(f"r2j{i}").cast("double") / 2) / d(f"nj{i}"), 4
            ).alias(f"mean_rank_{s_}")
            for i, s_ in enumerate(_PRIO_SHORT, 1)
        ],
    )


# --- compaction coalescing ---------------------------------------------------

_COMPACT_SHARDS = 64
_COMPACT_GROUPS = 8


@register(
    "compaction_coalesce_plan",
    oracle=f"""
        WITH sizes AS (
            SELECT ({duckdb_hash32_sql("'shard:' || doc_id")})
                       % {_COMPACT_SHARDS} AS shard,
                   (sum(n_chars))::BIGINT AS bytes
            FROM documents
            GROUP BY 1
        ), tot AS (
            SELECT greatest((sum(bytes) + {_COMPACT_GROUPS - 1})
                            // {_COMPACT_GROUPS}, 1)::BIGINT AS target
            FROM sizes
        ), cum AS (
            SELECT a.shard, any_value(a.bytes) AS bytes,
                   coalesce(sum(b.bytes), 0)::BIGINT AS cum_before
            FROM sizes a LEFT JOIN sizes b ON b.shard < a.shard
            GROUP BY a.shard
        ), assigned AS (
            SELECT shard, bytes, (cum_before // tot.target) AS group_id,
                   tot.target AS target
            FROM cum, tot
        )
        SELECT group_id, count(*)::BIGINT AS n_shards,
               (sum(bytes))::BIGINT AS group_bytes,
               min(shard)::BIGINT AS first_shard,
               max(shard)::BIGINT AS last_shard,
               ((sum(bytes) * 1000000) // any_value(target))::BIGINT
                   AS fill_micros
        FROM assigned GROUP BY group_id
        ORDER BY group_id
    """,
    doc=f"""Small-files compaction plan, the AQE-coalescing algorithm as
    an auditable table: {_COMPACT_SHARDS} hash shards roll up to byte
    sizes, and CONTIGUOUS shards merge by cumulative byte offset into
    ~{_COMPACT_GROUPS} target-sized groups (group = ⌊cum_bytes /
    target⌋ — exactly how Spark's AQE coalesces shuffle partitions and
    how a parquet compaction job plans rewrites).  Output: per merged
    group its shard span, byte total, and fill ratio vs target.
    Determinism: pure integer arithmetic.  Scale shape: one grouped
    byte rollup over the corpus (keyed shuffle), then ALL planning runs
    on the {_COMPACT_SHARDS}-row shard frame — the cumulative offset is
    a bounded non-equi self-join (declared) because the frame is fixed
    by configuration, not data size.""",
)
def compaction_coalesce_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    sizes = docs.groupBy(
        (
            portable_hash32(
                F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))
            )
            % _COMPACT_SHARDS
        ).alias("shard")
    ).agg(F.sum("n_chars").alias("bytes"))
    tot = sizes.agg(
        F.greatest(
            _idiv(F.sum("bytes") + (_COMPACT_GROUPS - 1), F.lit(_COMPACT_GROUPS)),
            F.lit(1),
        ).alias("target")
    )
    a, b = sizes.alias("a"), sizes.alias("b")
    cum = (
        a.join(b, F.col("b.shard") < F.col("a.shard"), "left")
        .groupBy(F.col("a.shard").alias("shard"))
        .agg(
            F.first("a.bytes").alias("bytes"),
            F.coalesce(F.sum("b.bytes"), F.lit(0)).alias("cum_before"),
        )
    )
    assigned = cum.crossJoin(F.broadcast(tot)).select(
        "shard",
        "bytes",
        _idiv(F.col("cum_before"), F.col("target")).alias("group_id"),
        "target",
    )
    return (
        assigned.groupBy("group_id")
        .agg(
            F.count("*").alias("n_shards"),
            F.sum("bytes").alias("group_bytes"),
            F.min("shard").alias("first_shard"),
            F.max("shard").alias("last_shard"),
            _idiv(F.sum("bytes") * 1_000_000, F.first("target")).alias(
                "fill_micros"
            ),
        )
        .orderBy("group_id")
    )


# --- strength of trend / seasonality ----------------------------------------

_DECOMP_ORACLE_CTES = """
        hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   count(*)::BIGINT AS observed
            FROM events GROUP BY 1, 2
        ), t AS (
            SELECT event_type, hour, observed,
                   round(avg(observed) OVER (
                       PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING), 6)
                       AS trend
            FROM hourly
        ), s AS (
            SELECT event_type, extract(hour FROM hour) AS hod,
                   round(sum(round((observed - trend) * 1000000))::DOUBLE
                         / count(*) / 1000000.0, 6) AS seasonal
            FROM t GROUP BY 1, 2
        ), comp AS (
            SELECT t.event_type,
                   round(1000 * s.seasonal)::BIGINT AS sm,
                   round(1000 * round(t.observed - t.trend - s.seasonal, 6))
                       ::BIGINT AS rm
            FROM t JOIN s ON s.event_type = t.event_type
                         AND s.hod = extract(hour FROM t.hour)
        )
"""


@register(
    "seasonal_strength_audit",
    oracle=f"""
        WITH {_DECOMP_ORACLE_CTES},
        agg AS (
            SELECT event_type, count(*)::BIGINT AS n,
                   (sum(rm))::BIGINT AS sr, (sum(rm * rm))::BIGINT AS qr,
                   (sum(sm + rm))::BIGINT AS ss,
                   (sum((sm + rm) * (sm + rm)))::BIGINT AS qs
            FROM comp GROUP BY event_type
        )
        SELECT event_type, n AS n_hours,
               round(greatest(0.0,
                   1 - ((qr::DOUBLE - sr::DOUBLE * sr / n) / (n - 1))
                       / ((qs::DOUBLE - ss::DOUBLE * ss / n) / (n - 1))),
                   6) AS seasonal_strength
        FROM agg
        ORDER BY event_type
    """,
    doc="""Hyndman's strength of seasonality (FPP: max(0, 1 −
    Var(remainder)/Var(seasonal + remainder))) per event type, over
    the SAME additive decomposition trend_seasonal_decompose emits —
    the one-number answer to "is the hour-of-day cycle real or is the
    seasonal component fitting noise?" (≈0 → drop the seasonal model
    from the capacity forecast; ≈1 → the cycle dominates).
    Determinism: decomposition components are the already-pinned
    round-6 doubles; they milli-quantize to exact ints, variances come
    from exact integer sufficient statistics (Σx, Σx²), and the
    strength is one fixed-order double expression per type.  Scale
    shape: identical to the decomposition (hourly pre-aggregate
    bounds the frame by CALENDAR, one partitioned window, one grouped
    aggregate) plus a per-type 1-row reduction.""",
)
def seasonal_strength_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = trend_seasonal_decompose(spark, sf_dir).select(
        "event_type",
        F.round(1000 * F.col("seasonal")).cast("long").alias("sm"),
        F.round(1000 * F.col("residual")).cast("long").alias("rm"),
    )
    agg = comp.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("rm").alias("sr"),
        F.sum(F.col("rm") * F.col("rm")).alias("qr"),
        F.sum(F.col("sm") + F.col("rm")).alias("ss"),
        F.sum((F.col("sm") + F.col("rm")) * (F.col("sm") + F.col("rm"))).alias(
            "qs"
        ),
    )
    d = F.col
    var_r = (d("qr").cast("double") - d("sr").cast("double") * d("sr") / d("n")) / (
        d("n") - 1
    )
    var_s = (d("qs").cast("double") - d("ss").cast("double") * d("ss") / d("n")) / (
        d("n") - 1
    )
    return agg.select(
        "event_type",
        d("n").alias("n_hours"),
        F.round(F.greatest(F.lit(0.0), 1 - var_r / var_s), 6).alias(
            "seasonal_strength"
        ),
    ).orderBy("event_type")
