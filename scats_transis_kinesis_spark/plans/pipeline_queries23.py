"""Round-5 batch: large-scale experimentation statistics — the three
tools that make fleet-wide metric testing honest at 100 TB:

- ``fdr_bh_screen`` — Benjamini–Hochberg step-up FDR control ('95)
  over the 25 per-nation "does this nation's mean order value differ?"
  tests, with distribution-free Chebyshev p-values (p = min(1, 1/z²))
  so no special function (erf) is needed in either engine and the
  screen stays conservative — the multiple-testing correction every
  per-segment metric dashboard owes its readers.
- ``poisson_bootstrap_se`` — the Poisson(1) bootstrap standard error
  of the mean (Chamandy et al., Google '12): 32 hash-deterministic
  replicate weights per row in one pass — THE standard-error method
  that works on data too large to resample by index, checked against
  the analytic s/√n.
- ``cuped_adjusted_ab`` — CUPED variance reduction (Deng et al.
  WSDM '13): user-level post-period spend adjusted by pre-period
  spend (θ = cov/var), hash-split arms, reporting the raw vs adjusted
  effect and the variance reduction won — the technique that makes
  small effects detectable without more traffic.

Determinism contracts: all p-value / weight / θ arithmetic reduces to
exact int64 sufficient statistics; BH runs ENTIRELY on integers
(Chebyshev p in micros vs the exact r·α/m = 2000·r micros cut);
bootstrap uniforms are exact md5-hash ratios against literal
Poisson-CDF thresholds embedded in both plans; replicate means
quantize to micros before the cross-replicate variance.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import duckdb_hash32_sql, portable_hash32
from ..sources.loaders import ensure_parallelism, load_table
from .pipeline_queries13 import _idiv
from .registry import register

# --- Benjamini–Hochberg screen -------------------------------------------------

_BH_ALPHA_MICROS = 50_000  # alpha = 0.05


@register(
    "fdr_bh_screen",
    oracle=f"""
        WITH x AS (
            SELECT c.c_nationkey AS nk,
                   CAST(round(o.o_totalprice) AS BIGINT) AS xd
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ), g AS (
            SELECT nk, count(*)::BIGINT AS n, (sum(xd))::BIGINT AS s,
                   (sum(xd * xd))::BIGINT AS q
            FROM x GROUP BY nk
        ), tot AS (
            SELECT (sum(n))::BIGINT AS nn, (sum(s))::BIGINT AS ss,
                   (sum(q))::BIGINT AS qq
            FROM g
        ), z AS (
            SELECT g.nk, g.n,
                   (g.s::DOUBLE / g.n - tot.ss::DOUBLE / tot.nn)
                   / sqrt(((tot.qq::DOUBLE - tot.ss::DOUBLE * tot.ss
                            / tot.nn) / (tot.nn - 1)) / g.n) AS zv
            FROM g, tot
        ), p AS (
            SELECT nk, n, zv,
                   CASE WHEN zv * zv <= 1 THEN 1000000
                        ELSE round(1000000 / (zv * zv))::BIGINT
                   END AS p_micros
            FROM z
        ), r AS (
            SELECT a.nk, any_value(a.n) AS n, any_value(a.zv) AS zv,
                   any_value(a.p_micros) AS p_micros,
                   (1 + coalesce(sum(CASE WHEN b.p_micros < a.p_micros
                                          OR (b.p_micros = a.p_micros
                                              AND b.nk < a.nk)
                                     THEN 1 ELSE 0 END), 0))::BIGINT AS rnk,
                   (SELECT count(*) FROM p)::BIGINT AS m
            FROM p a LEFT JOIN p b ON a.nk <> b.nk
            GROUP BY a.nk
        ), cut AS (
            SELECT coalesce(max(rnk), 0)::BIGINT AS rstar
            FROM r WHERE p_micros * m <= {_BH_ALPHA_MICROS} * rnk
        )
        SELECT n.n_name AS nation, r.n AS n_orders,
               round(r.zv, 6) AS z_stat, r.p_micros AS p_cheb_micros,
               r.rnk AS p_rank,
               (({_BH_ALPHA_MICROS} * r.rnk) // r.m) AS bh_cut_micros,
               (r.rnk <= cut.rstar) AS rejected
        FROM r JOIN nation n ON r.nk = n.n_nationkey, cut
        ORDER BY nation
    """,
    doc=f"""Benjamini–Hochberg step-up FDR screen (α = 0.05) over the
    25 per-nation one-vs-all mean-spend z tests, using the
    distribution-free Chebyshev bound p = min(1, 1/z²) as the p-value
    (conservative, and free of erf in both engines) — the multiple-
    testing correction that keeps a 25-segment dashboard from crying
    wolf on {int(0.05 * 25 * 100) / 100} segments per refresh by
    chance.  Determinism: z comes from exact integer sufficient
    statistics through one fixed double expression; p quantizes to
    micros; the BH comparison p·m ≤ α_micros·rank and the step-up cut
    are PURE INTEGER arithmetic; rank ties break on the nation key.
    Scale shape: one fact-dim equi-join (customer is SF-scaled, so the
    join carries no broadcast hint — AQE broadcasts while it fits and
    shuffles on the key past that), one grouped aggregate, then
    everything lives on the |nations|-row frame (bounded rank
    self-join and 1-row cut broadcast, declared).""",
)
def fdr_bh_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    # customer grows with scale factor, so no broadcast HINT here: AQE
    # broadcasts it while it fits and falls back to a key-partitioned
    # shuffle join past that — the only join shape that survives 100 TB.
    x = orders.join(
        cust.select("c_custkey", "c_nationkey"),
        orders.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_nationkey").alias("nk"),
        F.round("o_totalprice").cast("long").alias("xd"),
    )
    # Materialize the |nations|-row sufficient-stats frame ONCE: every
    # downstream frame (tot, p twice via the rank self-join, m, cut,
    # the final select) re-derives from g, and without the cut the
    # fact-dim join + aggregate re-ran per reference — the before plan
    # showed 50 parquet scans with zero ReusedExchange (guide §1.2
    # step 1 / §5 localCheckpoint-to-truncate).  One scan after.
    g = x.groupBy("nk").agg(
        F.count("*").alias("n"),
        F.sum("xd").alias("s"),
        F.sum(F.col("xd") * F.col("xd")).alias("q"),
    ).localCheckpoint(eager=True)
    tot = g.agg(
        F.sum("n").alias("nn"), F.sum("s").alias("ss"), F.sum("q").alias("qq")
    )
    d = F.col
    zv = (
        d("s").cast("double") / d("n") - d("ss").cast("double") / d("nn")
    ) / F.sqrt(
        (
            (d("qq").cast("double") - d("ss").cast("double") * d("ss") / d("nn"))
            / (d("nn") - 1)
        )
        / d("n")
    )
    p = g.crossJoin(F.broadcast(tot)).select(
        "nk",
        "n",
        zv.alias("zv"),
        F.when(zv * zv <= 1, F.lit(1_000_000).cast("long"))
        .otherwise(F.round(1_000_000 / (zv * zv)).cast("long"))
        .alias("p_micros"),
    )
    m = p.agg(F.count("*").alias("m"))
    a, b = p.alias("a"), p.alias("b")
    r = (
        a.join(F.broadcast(b), F.col("a.nk") != F.col("b.nk"), "left")
        .groupBy(F.col("a.nk").alias("nk"))
        .agg(
            F.first("a.n").alias("n"),
            F.first("a.zv").alias("zv"),
            F.first("a.p_micros").alias("p_micros"),
            (
                1
                + F.coalesce(
                    F.sum(
                        F.when(
                            (F.col("b.p_micros") < F.col("a.p_micros"))
                            | (
                                (F.col("b.p_micros") == F.col("a.p_micros"))
                                & (F.col("b.nk") < F.col("a.nk"))
                            ),
                            1,
                        ).otherwise(0)
                    ),
                    F.lit(0),
                )
            ).alias("rnk"),
        )
        .crossJoin(F.broadcast(m))
    )
    cut = r.where(
        F.col("p_micros") * F.col("m") <= _BH_ALPHA_MICROS * F.col("rnk")
    ).agg(F.coalesce(F.max("rnk"), F.lit(0)).alias("rstar"))
    return (
        r.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            r.nk == F.col("n_nationkey"),
        )
        .crossJoin(F.broadcast(cut))
        .select(
            F.col("n_name").alias("nation"),
            F.col("n").alias("n_orders"),
            F.round("zv", 6).alias("z_stat"),
            F.col("p_micros").alias("p_cheb_micros"),
            F.col("rnk").alias("p_rank"),
            _idiv(F.lit(_BH_ALPHA_MICROS) * F.col("rnk"), F.col("m")).alias(
                "bh_cut_micros"
            ),
            (F.col("rnk") <= F.col("rstar")).alias("rejected"),
        )
        .orderBy("nation")
    )


# --- Poisson bootstrap -----------------------------------------------------------

_PB_REPLICATES = 32
# Poisson(1) CDF thresholds at k = 0..4 (weights cap at 5) — literal
# constants embedded in BOTH plans so the inverse-CDF is identical.
_PB_CDF: tuple[float, ...] = tuple(
    sum(math.exp(-1) / math.factorial(i) for i in range(k + 1))
    for k in range(5)
)


def _pb_weight_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t!r} THEN {k}" for k, t in enumerate(_PB_CDF)
    )
    return f"(CASE {branches} ELSE 5 END)"


@register(
    "poisson_bootstrap_se",
    oracle=f"""
        WITH x AS (
            SELECT o_orderkey AS okey,
                   CAST(round(o_totalprice) AS BIGINT) AS xd
            FROM orders
        ), rep AS (
            SELECT x.okey, x.xd, b.b,
                   (({duckdb_hash32_sql("'pb:' || b.b || ':' || x.okey")})
                    ::DOUBLE / 4294967296.0) AS u
            FROM x CROSS JOIN (
                SELECT unnest(generate_series(0, {_PB_REPLICATES - 1})) AS b
            ) b
        ), w AS (
            SELECT b, xd, {_pb_weight_sql("u")} AS wt FROM rep
        ), means AS (
            SELECT b,
                   round(1000 * ((sum(wt * xd))::DOUBLE / sum(wt)))
                       ::BIGINT AS m_milli
            FROM w GROUP BY b HAVING sum(wt) > 0
        ), boot AS (
            SELECT count(*)::BIGINT AS nb,
                   (sum(m_milli))::BIGINT AS sm,
                   (sum(m_milli * m_milli))::BIGINT AS qm
            FROM means
        ), base AS (
            SELECT count(*)::BIGINT AS n, (sum(xd))::BIGINT AS s,
                   (sum(xd * xd))::BIGINT AS q
            FROM x
        )
        SELECT base.n AS n_rows, boot.nb AS n_replicates,
               round(base.s::DOUBLE / base.n, 4) AS mean_dollars,
               round(sqrt((boot.qm::DOUBLE - boot.sm::DOUBLE * boot.sm
                           / boot.nb) / (boot.nb - 1)) / 1000, 4)
                   AS se_boot_dollars,
               round(sqrt(((base.q::DOUBLE - base.s::DOUBLE * base.s
                            / base.n) / (base.n - 1)) / base.n), 4)
                   AS se_analytic_dollars
        FROM base, boot
    """,
    doc=f"""Poisson(1) bootstrap standard error of mean order value
    (Chamandy et al. '12 — the resampling method for data too large to
    index): each row draws a deterministic Poisson weight per
    replicate from the portable hash (u = h/2³², inverted through the
    literal Poisson CDF thresholds embedded in both plans, capped at
    5), {_PB_REPLICATES} replicates computed in ONE pass, and the
    spread of replicate means is reported against the analytic s/√n
    (they should agree — that agreement IS the audit).  Determinism:
    uniforms are exact dyadic ratios of exact hashes; weights are
    integer CASE branches; weighted sums are exact int64; replicate
    means quantize to milli-dollars BEFORE the cross-replicate variance
    (dollar-rounded values keep every Σx² inside int64 at any SF).
    Scale shape: a bounded ×{_PB_REPLICATES} fan-out (declared) into a
    {_PB_REPLICATES}-group aggregate with map-side partial
    aggregation — the shuffle carries {_PB_REPLICATES} partials per
    task, not rows; this is exactly how planet-scale means get error
    bars.""",
)
def poisson_bootstrap_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    x = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.round("o_totalprice").cast("long").alias("xd"),
    )
    # Round-10 fan-out rework (guide §1.2 step 2, §3.6; measured).  The
    # ×32 replicate fan-out was a crossJoin(broadcast(reps)) — a
    # BroadcastNestedLoopJoin whose per-row copy machinery, running on
    # the ONE partition a small parquet scan produces, dominated the
    # whole query (5.4 s isolated; the pure hash floor for the same
    # 4.8M rows is 0.33 s).  Now: fan the scan out across cores first
    # (tiny shuffle of two longs per row), then emit the replicates
    # with a codegen'd explode over a 32-element literal array — no
    # join machinery at all.  The replicate-constant "pb:<b>" prefix
    # and the row-constant ":<okey>" suffix are each built once on
    # their own side, so the hash input bytes — and every weight — are
    # bit-identical to the old 4-way concat.
    xs = ensure_parallelism(x, bytes_per_slot=1).select(
        "xd", F.concat(F.lit(":"), F.col("okey").cast("string")).alias("_sfx")
    )
    reps_arr = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("b"),
                F.lit(f"pb:{b}").alias("_pfx"),
            )
            for b in range(_PB_REPLICATES)
        ]
    )
    rep = xs.select("xd", "_sfx", F.explode(reps_arr).alias("r")).select(
        F.col("r.b").alias("b"),
        "xd",
        (
            portable_hash32(F.concat(F.col("r._pfx"), F.col("_sfx")))
            .cast("double")
            / F.lit(4294967296.0)
        ).alias("u"),
    )
    wt = F.lit(5)
    for k in range(len(_PB_CDF) - 1, -1, -1):
        wt = F.when(F.col("u") < _PB_CDF[k], F.lit(k)).otherwise(wt)
    w = rep.select("b", "xd", wt.alias("wt"))
    means = (
        w.groupBy("b")
        .agg(
            F.sum(F.col("wt") * F.col("xd")).alias("swx"),
            F.sum("wt").alias("sw"),
        )
        .where(F.col("sw") > 0)
        .select(
            F.round(1000 * (F.col("swx").cast("double") / F.col("sw")))
            .cast("long")
            .alias("m_milli")
        )
    )
    boot = means.agg(
        F.count("*").alias("nb"),
        F.sum("m_milli").alias("sm"),
        F.sum(F.col("m_milli") * F.col("m_milli")).alias("qm"),
    )
    base = x.agg(
        F.count("*").alias("n"),
        F.sum("xd").alias("s"),
        F.sum(F.col("xd") * F.col("xd")).alias("q"),
    )
    d = F.col
    return base.crossJoin(F.broadcast(boot)).select(
        d("n").alias("n_rows"),
        d("nb").alias("n_replicates"),
        F.round(d("s").cast("double") / d("n"), 4).alias("mean_dollars"),
        F.round(
            F.sqrt(
                (d("qm").cast("double") - d("sm").cast("double") * d("sm") / d("nb"))
                / (d("nb") - 1)
            )
            / 1000,
            4,
        ).alias("se_boot_dollars"),
        F.round(
            F.sqrt(
                (
                    (d("q").cast("double") - d("s").cast("double") * d("s") / d("n"))
                    / (d("n") - 1)
                )
                / d("n")
            ),
            4,
        ).alias("se_analytic_dollars"),
    )


# --- CUPED ------------------------------------------------------------------------

_CUPED_CUTOVER = "2024-01-16"


@register(
    "cuped_adjusted_ab",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   (({duckdb_hash32_sql("'arm:' || user_id")}) % 2) AS arm,
                   (sum(CASE WHEN ts < TIMESTAMP '{_CUPED_CUTOVER}'
                        THEN CAST(round(value * 100) AS BIGINT)
                        ELSE 0 END))::BIGINT AS xc,
                   (sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUTOVER}'
                        THEN CAST(round(value * 100) AS BIGINT)
                        ELSE 0 END))::BIGINT AS yc
            FROM events GROUP BY user_id
        ), s AS (
            SELECT count(*)::BIGINT AS n,
                   (sum(xc))::BIGINT AS sx, (sum(yc))::BIGINT AS sy,
                   (sum(xc * xc))::BIGINT AS qx,
                   (sum(yc * yc))::BIGINT AS qy,
                   (sum(xc * yc))::BIGINT AS sxy,
                   (sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END))::BIGINT AS na,
                   (sum(CASE WHEN arm = 0 THEN yc ELSE 0 END))::BIGINT AS sya,
                   (sum(CASE WHEN arm = 0 THEN xc ELSE 0 END))::BIGINT AS sxa,
                   (sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END))::BIGINT AS nb,
                   (sum(CASE WHEN arm = 1 THEN yc ELSE 0 END))::BIGINT AS syb,
                   (sum(CASE WHEN arm = 1 THEN xc ELSE 0 END))::BIGINT AS sxb
            FROM per_user
        ), t AS (
            SELECT *,
                   (sxy::DOUBLE - sx::DOUBLE * sy / n)
                   / (qx::DOUBLE - sx::DOUBLE * sx / n) AS theta,
                   (qy::DOUBLE - sy::DOUBLE * sy / n) / (n - 1) AS var_y,
                   (qx::DOUBLE - sx::DOUBLE * sx / n) / (n - 1) AS var_x,
                   (sxy::DOUBLE - sx::DOUBLE * sy / n) / (n - 1) AS cov_xy
            FROM s
        )
        SELECT n AS n_users, na AS n_arm_a, nb AS n_arm_b,
               round(theta, 6) AS theta,
               round((syb::DOUBLE / nb - sya::DOUBLE / na) / 100, 4)
                   AS diff_raw_dollars,
               round(((syb::DOUBLE / nb - theta * (sxb::DOUBLE / nb))
                      - (sya::DOUBLE / na - theta * (sxa::DOUBLE / na)))
                     / 100, 4) AS diff_cuped_dollars,
               round(1000000 * (cov_xy * cov_xy / (var_x * var_y)))
                   ::BIGINT AS var_reduction_micros
        FROM t
    """,
    doc=f"""CUPED variance reduction (Deng et al. WSDM '13) on a
    hash-split A/B over users: Y = post-{_CUPED_CUTOVER} spend,
    covariate X = pre-period spend, θ = cov(X,Y)/var(X), adjusted
    effect = Δmean(Y − θX) — and the variance reduction actually won,
    ρ² = cov²/(var_x·var_y) (the fraction of metric variance the
    covariate explains).  The pre-period is untouched by any
    treatment, so the adjustment is unbiased — this is the standard
    trick that shrinks experiment runtimes severalfold.  Determinism:
    per-user cent totals and all cross-moments are exact int64; θ and
    every mean are fixed double expressions on the ONE pivoted
    sufficient-statistics row.  Scale shape: one user-keyed grouped
    aggregate (the arm and both periods fold into the same pass), one
    1-row reduction — the fact table is scanned exactly once at any
    scale.""",
)
def cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    pre = F.when(F.col("ts") < F.lit(_CUPED_CUTOVER).cast("timestamp"), cents).otherwise(
        F.lit(0)
    )
    post = F.when(
        F.col("ts") >= F.lit(_CUPED_CUTOVER).cast("timestamp"), cents
    ).otherwise(F.lit(0))
    per_user = events.groupBy("user_id").agg(
        F.sum(pre).alias("xc"), F.sum(post).alias("yc")
    ).select(
        (
            portable_hash32(
                F.concat(F.lit("arm:"), F.col("user_id").cast("string"))
            )
            % 2
        ).alias("arm"),
        "xc",
        "yc",
    )
    is_a = F.col("arm") == 0
    is_b = F.col("arm") == 1
    s = per_user.agg(
        F.count("*").alias("n"),
        F.sum("xc").alias("sx"),
        F.sum("yc").alias("sy"),
        F.sum(F.col("xc") * F.col("xc")).alias("qx"),
        F.sum(F.col("yc") * F.col("yc")).alias("qy"),
        F.sum(F.col("xc") * F.col("yc")).alias("sxy"),
        F.sum(F.when(is_a, 1).otherwise(0)).alias("na"),
        F.sum(F.when(is_a, F.col("yc")).otherwise(0)).alias("sya"),
        F.sum(F.when(is_a, F.col("xc")).otherwise(0)).alias("sxa"),
        F.sum(F.when(is_b, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(is_b, F.col("yc")).otherwise(0)).alias("syb"),
        F.sum(F.when(is_b, F.col("xc")).otherwise(0)).alias("sxb"),
    )
    d = F.col
    theta = (d("sxy").cast("double") - d("sx").cast("double") * d("sy") / d("n")) / (
        d("qx").cast("double") - d("sx").cast("double") * d("sx") / d("n")
    )
    var_y = (d("qy").cast("double") - d("sy").cast("double") * d("sy") / d("n")) / (
        d("n") - 1
    )
    var_x = (d("qx").cast("double") - d("sx").cast("double") * d("sx") / d("n")) / (
        d("n") - 1
    )
    cov_xy = (d("sxy").cast("double") - d("sx").cast("double") * d("sy") / d("n")) / (
        d("n") - 1
    )
    return s.select(
        d("n").alias("n_users"),
        d("na").alias("n_arm_a"),
        d("nb").alias("n_arm_b"),
        F.round(theta, 6).alias("theta"),
        F.round(
            (d("syb").cast("double") / d("nb") - d("sya").cast("double") / d("na"))
            / 100,
            4,
        ).alias("diff_raw_dollars"),
        F.round(
            (
                (
                    d("syb").cast("double") / d("nb")
                    - theta * (d("sxb").cast("double") / d("nb"))
                )
                - (
                    d("sya").cast("double") / d("na")
                    - theta * (d("sxa").cast("double") / d("na"))
                )
            )
            / 100,
            4,
        ).alias("diff_cuped_dollars"),
        F.round(1_000_000 * (cov_xy * cov_xy / (var_x * var_y)))
        .cast("long")
        .alias("var_reduction_micros"),
    )
