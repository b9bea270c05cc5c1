"""Round-5 batch: statistical inference, robust trend estimation,
forecast backtesting, graph structure, and sequence-pattern mining —
the classical-analytics layer a data-quality team runs WEEKLY over a
100 TB warehouse:

- ``welch_t_test_orders`` — Welch's unequal-variance two-sample t-test
  (the default two-group comparison; Welch '47): does urgent-priority
  spend differ from low-priority spend?  Sufficient-statistics only.
- ``theil_sen_trend_daily`` — Theil–Sen robust slope (median of all
  pairwise slopes; Sen '68): the outlier-proof trend estimate over the
  1995 daily-revenue series, with the median-residual intercept.
- ``forecast_backtest_mase`` — walk-forward backtest of the three
  standard baseline forecasters (naive, seasonal-naive lag-7, trailing
  7-day mean) scored by MAE and MASE (Hyndman & Koehler '06) — the
  scale-free forecast-accuracy contract every capacity-planning
  pipeline starts from.
- ``degree_assortativity_copurchase`` — Newman's degree-assortativity
  coefficient ('02): Pearson r of endpoint degrees over the symmetrized
  edge set — do hub products co-sell with hubs (r>0) or with niche
  parts (r<0)?
- ``local_clustering_topk`` — Watts–Strogatz local clustering
  coefficient per vertex (triangles / possible wedges), top-20 densest
  neighborhoods — the per-node companion to the global triangle count.
- ``event_regex_funnel`` — sequence-pattern mining via regular
  expressions over per-(user, day) event strings (the poor man's
  MATCH_RECOGNIZE): each session compresses to a character string
  ordered by time, funnel patterns become regexes, coverage becomes a
  conditional count.

Determinism contracts: every statistic is computed from EXACT integer
sufficient statistics (dollar-rounded amounts, counts, degree sums,
squared integer deviations) and only then combined in IEEE doubles —
both engines evaluate the identical double expression on identical
integer inputs, so ``round(…, 6)`` is bit-stable (the repo's
exact-integer-anchor convention).  Scale shapes are noted per query;
the only nested-loop joins are over frames bounded by construction
(365 daily rows; 1-row aggregate broadcasts), declared in the plan
sweep allowlist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table
from .pipeline_queries5 import _COPURCHASE_EDGE_CTES, _copurchase_edges
from .pipeline_queries13 import _idiv
from .registry import register

# --- Welch's t-test ------------------------------------------------------

_WELCH_A = "1-URGENT"
_WELCH_B = "5-LOW"
# Two-sided 95% normal critical value (df is ~6000 here, so the normal
# approximation to the t quantile is exact to 4 decimals).
_WELCH_CRIT = 1.959964


@register(
    "welch_t_test_orders",
    oracle=f"""
        WITH x AS (
            SELECT o_orderpriority AS grp,
                   round(o_totalprice)::BIGINT AS xd
            FROM orders
            WHERE o_orderpriority IN ('{_WELCH_A}', '{_WELCH_B}')
        ), s AS (
            SELECT grp, count(*)::BIGINT AS n, sum(xd)::BIGINT AS s
            FROM x GROUP BY grp
        ), m AS (
            SELECT grp, n, s, (s // n) AS mf, (s % n) AS r FROM s
        ), q AS (
            SELECT x.grp, any_value(m.n) AS n, any_value(m.s) AS s,
                   any_value(m.r) AS r,
                   sum((x.xd - m.mf) * (x.xd - m.mf))::BIGINT AS ssq
            FROM x JOIN m ON x.grp = m.grp GROUP BY x.grp
        ), w AS (
            SELECT
                max(CASE WHEN grp = '{_WELCH_A}' THEN n END) AS na,
                max(CASE WHEN grp = '{_WELCH_B}' THEN n END) AS nb,
                max(CASE WHEN grp = '{_WELCH_A}' THEN s END) AS sa,
                max(CASE WHEN grp = '{_WELCH_B}' THEN s END) AS sb,
                max(CASE WHEN grp = '{_WELCH_A}' THEN r END) AS ra,
                max(CASE WHEN grp = '{_WELCH_B}' THEN r END) AS rb,
                max(CASE WHEN grp = '{_WELCH_A}' THEN ssq END) AS qa,
                max(CASE WHEN grp = '{_WELCH_B}' THEN ssq END) AS qb
            FROM q
        )
        SELECT na AS n_urgent, nb AS n_low,
               round(sa::DOUBLE / na, 4) AS mean_urgent,
               round(sb::DOUBLE / nb, 4) AS mean_low,
               round((sa::DOUBLE / na - sb::DOUBLE / nb)
                     / sqrt((qa::DOUBLE - ra::DOUBLE * (ra::DOUBLE / na))
                                / (na - 1) / na
                            + (qb::DOUBLE - rb::DOUBLE * (rb::DOUBLE / nb))
                                / (nb - 1) / nb), 6) AS t_stat,
               round(
                   pow((qa::DOUBLE - ra::DOUBLE * (ra::DOUBLE / na))
                           / (na - 1) / na
                       + (qb::DOUBLE - rb::DOUBLE * (rb::DOUBLE / nb))
                           / (nb - 1) / nb, 2)
                   / (pow((qa::DOUBLE - ra::DOUBLE * (ra::DOUBLE / na))
                              / (na - 1) / na, 2) / (na - 1)
                      + pow((qb::DOUBLE - rb::DOUBLE * (rb::DOUBLE / nb))
                              / (nb - 1) / nb, 2) / (nb - 1)), 2)
                   AS df_welch,
               abs((sa::DOUBLE / na - sb::DOUBLE / nb)
                   / sqrt((qa::DOUBLE - ra::DOUBLE * (ra::DOUBLE / na))
                              / (na - 1) / na
                          + (qb::DOUBLE - rb::DOUBLE * (rb::DOUBLE / nb))
                              / (nb - 1) / nb)) > {_WELCH_CRIT}
                   AS reject_95
        FROM w
    """,
    doc=f"""Welch's unequal-variance two-sample t-test of order spend,
    '{_WELCH_A}' vs '{_WELCH_B}' priorities: t statistic, Welch–
    Satterthwaite degrees of freedom, and the 95% two-sided decision.
    Determinism: amounts round to exact integer dollars; each group's
    mean splits into exact floor + remainder (s = n·mf + r), and the
    centered second moment Σ(x−mf)² is an exact int64 sum, corrected to
    the true-mean moment by the identity Σ(x−μ)² = Σ(x−mf)² − r·(r/n) —
    so t and df are identical IEEE expressions over identical integers
    in both engines.  Scale shape: one filtered scan, two grouped
    partial aggregations joined through a 2-row broadcast, a 1-row
    report — the canonical sufficient-statistics pattern (no raw data
    ever leaves the executors, works unchanged at 100 TB).""",
)
def welch_t_test_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    x = orders.where(F.col("o_orderpriority").isin(_WELCH_A, _WELCH_B)).select(
        F.col("o_orderpriority").alias("grp"),
        F.round("o_totalprice").cast("long").alias("xd"),
    )
    s = x.groupBy("grp").agg(F.count("*").alias("n"), F.sum("xd").alias("s"))
    m = s.select(
        "grp",
        "n",
        "s",
        _idiv(F.col("s"), F.col("n")).alias("mf"),
        (F.col("s") % F.col("n")).alias("r"),
    )
    q = (
        x.join(F.broadcast(m), "grp")
        .groupBy("grp")
        .agg(
            F.first("n").alias("n"),
            F.first("s").alias("s"),
            F.first("r").alias("r"),
            F.sum((F.col("xd") - F.col("mf")) * (F.col("xd") - F.col("mf"))).alias(
                "ssq"
            ),
        )
    )
    is_a = F.col("grp") == _WELCH_A
    is_b = F.col("grp") == _WELCH_B
    w = q.agg(
        F.max(F.when(is_a, F.col("n"))).alias("na"),
        F.max(F.when(is_b, F.col("n"))).alias("nb"),
        F.max(F.when(is_a, F.col("s"))).alias("sa"),
        F.max(F.when(is_b, F.col("s"))).alias("sb"),
        F.max(F.when(is_a, F.col("r"))).alias("ra"),
        F.max(F.when(is_b, F.col("r"))).alias("rb"),
        F.max(F.when(is_a, F.col("ssq"))).alias("qa"),
        F.max(F.when(is_b, F.col("ssq"))).alias("qb"),
    )
    na, nb = F.col("na"), F.col("nb")
    d = F.col
    va = (d("qa").cast("double") - d("ra").cast("double") * (d("ra").cast("double") / na)) / (
        na - 1
    ) / na
    vb = (d("qb").cast("double") - d("rb").cast("double") * (d("rb").cast("double") / nb)) / (
        nb - 1
    ) / nb
    mean_a = d("sa").cast("double") / na
    mean_b = d("sb").cast("double") / nb
    t = (mean_a - mean_b) / F.sqrt(va + vb)
    df_w = F.pow(va + vb, 2) / (F.pow(va, 2) / (na - 1) + F.pow(vb, 2) / (nb - 1))
    return w.select(
        na.alias("n_urgent"),
        nb.alias("n_low"),
        F.round(mean_a, 4).alias("mean_urgent"),
        F.round(mean_b, 4).alias("mean_low"),
        F.round(t, 6).alias("t_stat"),
        F.round(df_w, 2).alias("df_welch"),
        (F.abs(t) > _WELCH_CRIT).alias("reject_95"),
    )


# --- Theil–Sen robust trend ----------------------------------------------

_TS_YEAR_START = "1995-01-01"
_TS_YEAR_END = "1996-01-01"


@register(
    "theil_sen_trend_daily",
    oracle=f"""
        WITH daily AS (
            SELECT date_diff('day', DATE '{_TS_YEAR_START}',
                             o_orderdate)::BIGINT AS d,
                   sum(round(o_totalprice)::BIGINT)::BIGINT AS y
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '{_TS_YEAR_START}'
              AND o_orderdate < TIMESTAMP '{_TS_YEAR_END}'
            GROUP BY 1
        ), slopes AS (
            SELECT (b.y - a.y)::DOUBLE / (b.d - a.d) AS slope
            FROM daily a JOIN daily b ON b.d > a.d
        ), med AS (
            SELECT round(median(slope), 6) AS ts_slope,
                   count(*)::BIGINT AS n_pairs
            FROM slopes
        )
        SELECT (SELECT count(*) FROM daily)::BIGINT AS n_days,
               n_pairs, ts_slope,
               (SELECT round(median(y - med.ts_slope * d), 4)
                FROM daily) AS ts_intercept
        FROM med
    """,
    doc=f"""Theil–Sen robust trend over the 1995 daily-revenue series:
    slope = median of all pairwise slopes (breakdown point 29% — a
    month of outlier days cannot move it, unlike OLS), intercept =
    median residual at the estimated slope.  Determinism: daily revenue
    is an exact integer-dollar sum; every pairwise slope is one IEEE
    division of integers, both engines sort the identical multiset, and
    the even-count median averages the same two doubles; the intercept
    re-uses the ROUNDED slope so its residuals are identical
    expressions.  Scale shape: the raw scan collapses to ≤365 daily
    rows FIRST (grouped partial agg), and only that bounded frame
    self-joins (365² / 2 ≈ 66k slope rows — constant, independent of
    fact-table size); the pair join and the 1-row slope broadcast are
    bounded-by-construction nested loops, declared in the plan
    allowlist.  At 100 TB the daily frame is still 365 rows — the
    pattern is "aggregate to the statistical frame, then do exact
    robust statistics on the frame".""",
)
def theil_sen_trend_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    daily = (
        orders.where(
            (F.col("o_orderdate") >= F.lit(_TS_YEAR_START).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(_TS_YEAR_END).cast("timestamp"))
        )
        .groupBy(
            F.datediff(
                F.col("o_orderdate"), F.lit(_TS_YEAR_START).cast("date")
            )
            .cast("long")
            .alias("d")
        )
        .agg(F.sum(F.round("o_totalprice").cast("long")).alias("y"))
        .localCheckpoint(eager=True)
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(F.broadcast(b), F.col("b.d") > F.col("a.d")).select(
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.d") - F.col("a.d"))
        ).alias("slope")
    )
    med = slopes.agg(
        F.round(F.median("slope"), 6).alias("ts_slope"),
        F.count("*").alias("n_pairs"),
    )
    n_days = daily.agg(F.count("*").alias("n_days"))
    resid = daily.crossJoin(F.broadcast(med)).select(
        "ts_slope",
        "n_pairs",
        (F.col("y") - F.col("ts_slope") * F.col("d")).alias("res"),
    )
    out = resid.groupBy("ts_slope", "n_pairs").agg(
        F.round(F.median("res"), 4).alias("ts_intercept")
    )
    return (
        F.broadcast(n_days)
        .crossJoin(out)
        .select("n_days", "n_pairs", "ts_slope", "ts_intercept")
    )


# --- Forecast backtest (MASE) --------------------------------------------

_MASE_WARMUP = 7  # evaluation starts once every baseline has history


@register(
    "forecast_backtest_mase",
    oracle=f"""
        WITH daily AS (
            SELECT date_diff('day', DATE '{_TS_YEAR_START}',
                             o_orderdate)::BIGINT AS d,
                   count(*)::BIGINT AS c
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '{_TS_YEAR_START}'
              AND o_orderdate < TIMESTAMP '{_TS_YEAR_END}'
            GROUP BY 1
        ), ma AS (
            SELECT daily.d + k.k AS d,
                   ((sum(c) * 1000000) // 7) AS pred_micros,
                   count(*) AS n_src
            FROM daily, (SELECT unnest(generate_series(1, 7)) AS k) k
            GROUP BY daily.d + k.k
        ), err AS (
            SELECT y.d,
                   abs(y.c - n.c) * 1000000 AS e_naive,
                   abs(y.c - s.c) * 1000000 AS e_snaive,
                   abs(y.c * 1000000 - m.pred_micros) AS e_ma7
            FROM daily y
            JOIN daily n ON n.d = y.d - 1
            JOIN daily s ON s.d = y.d - 7
            JOIN ma m ON m.d = y.d AND m.n_src = 7
            WHERE y.d >= {_MASE_WARMUP}
        ), mae AS (
            SELECT method,
                   CASE WHEN ne > 0 THEN (se // ne) END AS mae_micros,
                   naive_mae
            FROM (
                SELECT count(*)::BIGINT AS ne,
                       sum(e_naive)::BIGINT AS s_naive,
                       sum(e_snaive)::BIGINT AS s_snaive,
                       sum(e_ma7)::BIGINT AS s_ma7
                FROM err
            ) t, LATERAL (
                SELECT * FROM (VALUES
                    ('naive', t.s_naive,
                     CASE WHEN t.ne > 0 THEN (t.s_naive // t.ne) END),
                    ('seasonal_naive_7', t.s_snaive,
                     CASE WHEN t.ne > 0 THEN (t.s_naive // t.ne) END),
                    ('trailing_mean_7', t.s_ma7,
                     CASE WHEN t.ne > 0 THEN (t.s_naive // t.ne) END)
                ) v(method, se, naive_mae)
            )
        )
        SELECT method, mae_micros,
               CASE WHEN naive_mae > 0
                    THEN ((mae_micros * 1000000) // naive_mae)
               END AS mase_micros
        FROM mae
        ORDER BY method
    """,
    doc=f"""Walk-forward backtest of the three standard baseline
    forecasters over the 1995 daily order-count series — naive (carry
    yesterday), seasonal-naive (carry the same weekday), trailing
    7-day mean — scored by MAE and by MASE (MAE scaled by the naive
    MAE, the scale-free accuracy measure of Hyndman & Koehler '06;
    MASE < 1e6 micros beats naive).  Determinism: counts are exact
    ints, the trailing mean is an exact floor-division in micros, and
    every |error| and both MAE/MASE ratios are integer floor divisions
    — zero FP anywhere.  Scale shape: the fact scan collapses to ≤365
    daily rows first; the three predictors are EQUI-joins on shifted
    day keys (the trailing mean fans each day to its 7 target days via
    explode — no range join, no window over an unpartitioned frame);
    the only nested loop is the 1-row naive-MAE broadcast, declared in
    the allowlist.""",
)
def forecast_backtest_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    daily = (
        orders.where(
            (F.col("o_orderdate") >= F.lit(_TS_YEAR_START).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(_TS_YEAR_END).cast("timestamp"))
        )
        .groupBy(
            F.datediff(
                F.col("o_orderdate"), F.lit(_TS_YEAR_START).cast("date")
            )
            .cast("long")
            .alias("d")
        )
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    ma = (
        daily.select(
            "d", "c", F.explode(F.sequence(F.lit(1), F.lit(7))).alias("k")
        )
        .select((F.col("d") + F.col("k")).alias("d"), "c")
        .groupBy("d")
        .agg(
            _idiv(F.sum("c") * F.lit(1_000_000), F.lit(7)).alias("pred_micros"),
            F.count("*").alias("n_src"),
        )
        .where(F.col("n_src") == 7)
    )
    y = daily.alias("y")
    n = daily.alias("n")
    s = daily.alias("s")
    err = (
        y.where(F.col("y.d") >= _MASE_WARMUP)
        .join(n, F.col("n.d") == F.col("y.d") - 1)
        .join(s, F.col("s.d") == F.col("y.d") - 7)
        .join(ma, ma["d"] == F.col("y.d"))
        .select(
            (F.abs(F.col("y.c") - F.col("n.c")) * 1_000_000).alias("e_naive"),
            (F.abs(F.col("y.c") - F.col("s.c")) * 1_000_000).alias("e_snaive"),
            F.abs(F.col("y.c") * 1_000_000 - F.col("pred_micros")).alias("e_ma7"),
        )
    )
    t = err.agg(
        F.count("*").alias("ne"),
        F.sum("e_naive").alias("s_naive"),
        F.sum("e_snaive").alias("s_snaive"),
        F.sum("e_ma7").alias("s_ma7"),
    )
    # Degenerate-series guards: an empty backtest window (ne = 0) or a
    # constant series (naive_mae = 0) reports NULL cleanly instead of
    # an engine-dependent divide-by-zero; mirrored by the oracle CASEs.
    rows = t.select(
        F.expr(
            "stack(3, 'naive', s_naive, 'seasonal_naive_7', s_snaive, "
            "'trailing_mean_7', s_ma7) AS (method, se)"
        ),
        "ne",
        F.when(
            F.col("ne") > 0, _idiv(F.col("s_naive"), F.col("ne"))
        ).alias("naive_mae"),
    )
    mae = F.when(F.col("ne") > 0, _idiv(F.col("se"), F.col("ne")))
    return rows.select(
        "method",
        mae.alias("mae_micros"),
        F.when(
            F.col("naive_mae") > 0,
            _idiv(mae * F.lit(1_000_000), F.col("naive_mae")),
        ).alias("mase_micros"),
    ).orderBy("method")


# --- Degree assortativity ------------------------------------------------


@register(
    "degree_assortativity_copurchase",
    oracle=f"""
        WITH {_COPURCHASE_EDGE_CTES}, deg AS (
            SELECT x AS vertex, count(*)::BIGINT AS d
            FROM (SELECT u AS x FROM edges UNION ALL SELECT v FROM edges)
            GROUP BY x
        ), pairs AS (
            SELECT du.d AS x, dv.d AS y
            FROM edges e
            JOIN deg du ON e.u = du.vertex
            JOIN deg dv ON e.v = dv.vertex
            UNION ALL
            SELECT dv.d, du.d
            FROM edges e
            JOIN deg du ON e.u = du.vertex
            JOIN deg dv ON e.v = dv.vertex
        ), s AS (
            SELECT count(*)::BIGINT AS n,
                   sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                   sum(x * y)::BIGINT AS sxy,
                   sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
            FROM pairs
        )
        SELECT (SELECT count(*)::BIGINT FROM deg) AS n_vertices,
               (SELECT count(*)::BIGINT FROM edges) AS n_edges,
               round((n::DOUBLE * sxy - sx::DOUBLE * sy)
                     / sqrt((n::DOUBLE * sxx - sx::DOUBLE * sx)
                            * (n::DOUBLE * syy - sy::DOUBLE * sy)), 6)
                   AS assortativity
        FROM s
    """,
    doc="""Newman's degree-assortativity coefficient over the 1995
    co-purchase graph: Pearson correlation of endpoint degrees across
    the symmetrized edge list — positive means hub parts co-sell with
    hubs (social-network shape), negative means hubs bridge niche parts
    (technological/dependency shape).  The sign drives partitioning
    strategy for graph workloads: disassortative hubs are the skew keys
    worth salting.  Determinism: all five sufficient sums are exact
    int64 over integer degrees; the correlation is one identical IEEE
    expression.  Scale shape: degree table via one grouped count;
    endpoint degrees via two hash equi-joins; sums partial-aggregate to
    a single row — no windows, no driver data, a textbook two-shuffle
    graph statistic at any scale.""",
)
def degree_assortativity_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _copurchase_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("u").alias("vertex"))
        .unionAll(edges.select(F.col("v").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count("*").alias("d"))
    )
    du, dv = deg.alias("du"), deg.alias("dv")
    both = (
        edges.join(du, edges.u == F.col("du.vertex"))
        .join(dv, edges.v == F.col("dv.vertex"))
        .select(F.col("du.d").alias("x"), F.col("dv.d").alias("y"))
    )
    pairs = both.unionAll(both.select(F.col("y").alias("x"), F.col("x").alias("y")))
    s = pairs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nv = deg.agg(F.count("*").alias("n_vertices"))
    ne = edges.agg(F.count("*").alias("n_edges"))
    nd = F.col("n").cast("double")
    r = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / F.sqrt(
        (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return (
        F.broadcast(nv)
        .crossJoin(F.broadcast(ne))
        .crossJoin(F.broadcast(s.select(F.round(r, 6).alias("assortativity"))))
    )


# --- Local clustering coefficient ----------------------------------------

_LCC_MIN_DEG = 5
_LCC_TOPK = 20


@register(
    "local_clustering_topk",
    oracle=f"""
        WITH {_COPURCHASE_EDGE_CTES}, tri AS (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM edges e1
            JOIN edges e2 ON e2.u = e1.v
            JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
        ), membership AS (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ), tcnt AS (
            SELECT node, count(*)::BIGINT AS triangles
            FROM membership GROUP BY node
        ), deg AS (
            SELECT x AS node, count(*)::BIGINT AS degree
            FROM (SELECT u AS x FROM edges UNION ALL SELECT v FROM edges)
            GROUP BY x
        )
        SELECT d.node, d.degree,
               coalesce(t.triangles, 0)::BIGINT AS triangles,
               ((coalesce(t.triangles, 0) * 2 * 1000000)
                // (d.degree * (d.degree - 1))) AS lcc_micros
        FROM deg d LEFT JOIN tcnt t ON d.node = t.node
        WHERE d.degree >= {_LCC_MIN_DEG}
        ORDER BY lcc_micros DESC, triangles DESC, d.node
        LIMIT {_LCC_TOPK}
    """,
    doc=f"""Watts–Strogatz local clustering coefficient per vertex over
    the 1995 co-purchase graph — triangles(v) / (deg(v) choose 2), the
    per-node "how clique-like is this neighborhood" signal behind
    community seeding and recommender confidence — reported as the
    top-{_LCC_TOPK} among vertices with degree ≥ {_LCC_MIN_DEG}
    (coefficient in exact integer micros; ties break by triangle count
    then id).  The Spark side enumerates each triangle once via the
    id-ordered u<v<w three-way equi-join over the u<v edge list, then
    explodes the three memberships; per-node counts and degrees are
    grouped sums; the coefficient is an exact floor division.  Scale
    shape: triangle enumeration is the triangle-count join family
    (equi-joins only — at power-law scale the operator library's
    degree-oriented variant bounds wedge fan-out; the id-ordered form
    keeps the ORACLE identical, and the edge frame here is bounded);
    report is TakeOrdered top-{_LCC_TOPK}.""",
)
def local_clustering_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _copurchase_edges(spark, sf_dir)
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    membership = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    tcnt = membership.groupBy("node").agg(F.count("*").alias("triangles"))
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    out = (
        deg.where(F.col("degree") >= _LCC_MIN_DEG)
        .join(tcnt, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
            _idiv(
                F.coalesce(F.col("triangles"), F.lit(0)) * 2 * F.lit(1_000_000),
                F.col("degree") * (F.col("degree") - 1),
            ).alias("lcc_micros"),
        )
    )
    return out.orderBy(
        F.desc("lcc_micros"), F.desc("triangles"), "node"
    ).limit(_LCC_TOPK)


# --- Regex sequence mining over event sessions ---------------------------

# (pattern name, regex) — applied UNANCHORED to the per-(user, day)
# event-initial string (c=click, e=error, p=purchase, s=signup, v=view).
_FUNNEL_PATTERNS: tuple[tuple[str, str], ...] = (
    ("browse_only", "^[vc]+$"),
    ("error_before_purchase", "e.*p"),
    ("signup_then_purchase", "s.*p"),
    ("view_click_purchase", "v.*c.*p"),
    ("view_to_purchase_direct", "vp"),
)


def _funnel_oracle() -> str:
    checks = ",\n                ".join(
        f"count(*) FILTER (regexp_matches(seq, '{rx}'))::BIGINT AS m{i}"
        for i, (_, rx) in enumerate(_FUNNEL_PATTERNS)
    )
    rows = ",\n                ".join(
        f"('{name}', m{i})" for i, (name, _) in enumerate(_FUNNEL_PATTERNS)
    )
    return f"""
        WITH sessions AS (
            SELECT user_id, ts::DATE AS day,
                   string_agg(substr(event_type, 1, 1), ''
                              ORDER BY ts, event_id) AS seq
            FROM events GROUP BY user_id, ts::DATE
        ), agg AS (
            SELECT count(*)::BIGINT AS total,
                {checks}
            FROM sessions
        )
        SELECT v.pattern, v.n_sessions,
               ((v.n_sessions * 1000000) // agg.total) AS pct_micros
        FROM agg, LATERAL (
            SELECT * FROM (VALUES
                {rows}
            ) t(pattern, n_sessions)
        ) v
        ORDER BY v.pattern
    """


@register(
    "event_regex_funnel",
    oracle=_funnel_oracle(),
    doc="""Sequence-pattern mining via regexes over per-(user, day)
    event strings — the portable MATCH_RECOGNIZE: each session
    compresses to a character string (one initial per event, ordered by
    time with event-id tiebreak), funnel/behavior patterns become
    regular expressions (browse-only sessions, signup→purchase,
    view→click→purchase, error-before-purchase, adjacent
    view→purchase), and coverage is a conditional count with an exact
    integer-micros share.  Determinism: the string is built from a
    totally-ordered struct sort (ts, event_id); regex match semantics
    are identical (unanchored search both engines).  Scale shape: one
    grouped collect per session key (sessions are short — bounded
    struct arrays, the sessionize family's state shape), one scan of
    the session strings computes ALL patterns as conditional partial
    aggregates in a single 1-row frame, then a 5-row stack — adding a
    pattern is free; no joins, no windows, no second scan of the fact
    table.""",
)
def event_regex_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    sessions = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("ts"),
                                F.col("event_id"),
                                F.substring("event_type", 1, 1).alias("i"),
                            )
                        )
                    ),
                    lambda x: x["i"],
                ),
                "",
            ).alias("seq")
        )
    )
    aggs = [F.count("*").alias("total")] + [
        F.sum(F.when(F.col("seq").rlike(rx), 1).otherwise(0)).alias(f"m{i}")
        for i, (_, rx) in enumerate(_FUNNEL_PATTERNS)
    ]
    agg = sessions.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', m{i}" for i, (name, _) in enumerate(_FUNNEL_PATTERNS)
    )
    rows = agg.select(
        F.expr(
            f"stack({len(_FUNNEL_PATTERNS)}, {stack_args})"
            " AS (pattern, n_sessions)"
        ),
        "total",
    )
    return rows.select(
        "pattern",
        "n_sessions",
        _idiv(F.col("n_sessions") * F.lit(1_000_000), F.col("total")).alias(
            "pct_micros"
        ),
    ).orderBy("pattern")
