"""Round-5 batch: group-comparison inference, rank correlation,
chance-corrected agreement, and training-shard shuffle quality — the
evaluation statistics a data platform runs over labeled slices:

- ``anova_f_priority_spend`` — one-way ANOVA F-test (Fisher '25)
  across the five order-priority groups on dollar-rounded spend: the
  k-group generalization of ``welch_t_test_orders``, computed from
  exact integer sufficient statistics only.
- ``spearman_daily_kpis`` — Spearman rank correlation (with exact
  average-tie midranks) between the daily-revenue and daily-order-count
  series, reported next to the Pearson r on the raw values — the
  rank/linear divergence is the standard outlier/nonlinearity probe.
- ``lang_id_agreement_ari`` — pair-counting evaluation of the cheap
  stopword-density language detector against the labeled corpus:
  pairwise precision/recall/F1, Rand index, and the chance-corrected
  Adjusted Rand Index (Hubert & Arabie '85) — the scalar companions to
  ``lang_id_confusion``'s full matrix.
- ``shard_shuffle_quality`` — training-shard shuffle audit: after
  hash-assigning documents to shards and hash-ordering within each
  shard, the rate of adjacent same-source pairs vs the expected rate
  under a uniform random order.  Poorly shuffled shards feed a trainer
  correlated batches; this is the audit that catches it BEFORE a run.

Determinism contracts: every statistic reduces to exact int64
sufficient statistics (counts, dollar/cent sums, squared integer
deviations around the integer floor-mean, pair counts n·(n−1)/2,
2×midranks) and only then combines in a FIXED-ORDER double expression
evaluated identically by both engines; ``corr`` over small-integer
rank pairs is pinned cross-engine at round-6 since round 4 (the
``acf_hourly_traffic`` precedent).  Shard/order hashes are the
portable md5 family (`functions/hashing.py`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.hashing import (
    duckdb_hash32_sql,
    duckdb_hash64_sql,
    portable_hash32,
    portable_hash64,
)
from ..sources.loaders import load_table
from .extension_queries import _STOPLIST_SQL
from .pipeline_queries13 import _idiv
from .registry import register

# --- one-way ANOVA --------------------------------------------------------

_PRIORITIES: tuple[str, ...] = (
    "1-URGENT",
    "2-HIGH",
    "3-MEDIUM",
    "4-NOT SPECIFIED",
    "5-LOW",
)
_PRIO_SHORT: tuple[str, ...] = ("urgent", "high", "medium", "notspec", "low")


def _anova_oracle() -> str:
    pivots = ",\n                ".join(
        f"max(CASE WHEN grp = '{p}' THEN {c} END) AS {c}{i}"
        for i, p in enumerate(_PRIORITIES, 1)
        for c in ("n", "s", "r", "qf")
    )
    means = " ".join(
        f"(s{i}::DOUBLE / n{i}) AS m{i}," for i in range(1, 6)
    ).rstrip(",")
    gm = "((s1+s2+s3+s4+s5)::DOUBLE / (n1+n2+n3+n4+n5))"
    ssb = " + ".join(f"n{i}*(m{i} - gm)*(m{i} - gm)" for i in range(1, 6))
    ssw = " + ".join(
        f"(qf{i}::DOUBLE - r{i}::DOUBLE*(r{i}::DOUBLE / n{i}))"
        for i in range(1, 6)
    )
    mean_cols = ", ".join(
        f"round(m{i}, 4) AS mean_{s}" for i, s in enumerate(_PRIO_SHORT, 1)
    )
    return f"""
        WITH x AS (
            SELECT o_orderpriority AS grp,
                   CAST(round(o_totalprice) AS BIGINT) AS xd
            FROM orders
        ), s AS (
            SELECT grp, count(*)::BIGINT AS n, (sum(xd))::BIGINT AS s
            FROM x GROUP BY grp
        ), m AS (
            SELECT grp, n, s, (s // n) AS mf, (s % n) AS r FROM s
        ), q AS (
            SELECT x.grp, any_value(m.n) AS n, any_value(m.s) AS s,
                   any_value(m.r) AS r,
                   (sum((x.xd - m.mf) * (x.xd - m.mf)))::BIGINT AS qf
            FROM x JOIN m ON x.grp = m.grp GROUP BY x.grp
        ), w AS (
            SELECT {pivots}
            FROM q
        ), e AS (
            SELECT *, {means}, {gm} AS gm,
                   (n1+n2+n3+n4+n5) AS n_total
            FROM w
        ), f AS (
            SELECT n_total, ({ssb}) AS ssb, ({ssw}) AS ssw, {mean_cols}
            FROM e
        )
        SELECT n_total,
               round((ssb / 4.0) / (ssw / (n_total - 5)), 6) AS f_stat,
               round(ssb / (ssb + ssw), 6) AS eta_sq,
               {", ".join(f"mean_{s}" for s in _PRIO_SHORT)}
        FROM f
    """


@register(
    "anova_f_priority_spend",
    oracle=_anova_oracle(),
    doc="""One-way ANOVA across the five order-priority groups on
    dollar-rounded order totals: F statistic, eta-squared effect size,
    and the per-group means — the k-group generalization of the Welch
    pair test.  Determinism: per group only exact int64 sufficient
    statistics travel (n, sum, remainder vs the integer floor-mean, and
    the squared-deviation sum around that floor-mean — the Welch
    convention, so within-group SS reconstructs exactly as
    qf − r·(r/n)); the 20 scalars pivot into ONE row and SSB/SSW/F are
    a fixed-order double expression both engines evaluate identically.
    Scale shape: one grouped aggregate over the fact table, one
    broadcast equi-join back for the squared deviations (the group
    frame is |k| rows), one 5-row pivot aggregate — no window, no
    nested loop; at any scale the fact table is scanned exactly
    twice.""",
)
def anova_f_priority_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    x = orders.select(
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
            F.sum(
                (F.col("xd") - F.col("mf")) * (F.col("xd") - F.col("mf"))
            ).alias("qf"),
        )
    )
    w = q.agg(
        *[
            F.max(F.when(F.col("grp") == p, F.col(c))).alias(f"{c}{i}")
            for i, p in enumerate(_PRIORITIES, 1)
            for c in ("n", "s", "r", "qf")
        ]
    )
    d = F.col
    means = [d(f"s{i}").cast("double") / d(f"n{i}") for i in range(1, 6)]
    gm = sum(d(f"s{i}") for i in range(1, 6)).cast("double") / sum(
        d(f"n{i}") for i in range(1, 6)
    )
    n_total = sum(d(f"n{i}") for i in range(1, 6))
    ssb = d("n1") * (means[0] - gm) * (means[0] - gm)
    for i in range(2, 6):
        ssb = ssb + d(f"n{i}") * (means[i - 1] - gm) * (means[i - 1] - gm)
    ssw = d("qf1").cast("double") - d("r1").cast("double") * (
        d("r1").cast("double") / d("n1")
    )
    for i in range(2, 6):
        ssw = ssw + (
            d(f"qf{i}").cast("double")
            - d(f"r{i}").cast("double") * (d(f"r{i}").cast("double") / d(f"n{i}"))
        )
    return w.select(
        n_total.alias("n_total"),
        F.round((ssb / F.lit(4.0)) / (ssw / (n_total - 5)), 6).alias("f_stat"),
        F.round(ssb / (ssb + ssw), 6).alias("eta_sq"),
        *[
            F.round(means[i - 1], 4).alias(f"mean_{s_}")
            for i, s_ in enumerate(_PRIO_SHORT, 1)
        ],
    )


# --- Spearman rank correlation --------------------------------------------


@register(
    "spearman_daily_kpis",
    oracle="""
        WITH daily AS (
            SELECT o_orderdate AS d,
                   (sum(CAST(round(o_totalprice * 100) AS BIGINT)))::BIGINT
                       AS rev_c,
                   count(*)::BIGINT AS n_orders
            FROM orders GROUP BY o_orderdate
        ), gx AS (
            SELECT rev_c AS v, count(*)::BIGINT AS c FROM daily GROUP BY rev_c
        ), rx AS (
            SELECT a.v,
                   (2 * coalesce(sum(b.c), 0) + any_value(a.c) + 1)::BIGINT
                       AS r2
            FROM gx a LEFT JOIN gx b ON b.v < a.v GROUP BY a.v
        ), gy AS (
            SELECT n_orders AS v, count(*)::BIGINT AS c
            FROM daily GROUP BY n_orders
        ), ry AS (
            SELECT a.v,
                   (2 * coalesce(sum(b.c), 0) + any_value(a.c) + 1)::BIGINT
                       AS r2
            FROM gy a LEFT JOIN gy b ON b.v < a.v GROUP BY a.v
        ), j AS (
            SELECT daily.rev_c, daily.n_orders,
                   rx.r2 AS r2x, ry.r2 AS r2y
            FROM daily
            JOIN rx ON daily.rev_c = rx.v
            JOIN ry ON daily.n_orders = ry.v
        ), st AS (
            SELECT count(*)::BIGINT AS n_days,
                   sum(r2x::HUGEINT) AS srx,
                   sum(r2y::HUGEINT) AS sry,
                   sum(r2x::HUGEINT * r2y) AS srxy,
                   sum(r2x::HUGEINT * r2x) AS srxx,
                   sum(r2y::HUGEINT * r2y) AS sryy,
                   sum(rev_c::HUGEINT) AS sx,
                   sum(n_orders::HUGEINT) AS sy,
                   sum(rev_c::HUGEINT * n_orders) AS sxy,
                   sum(rev_c::HUGEINT * rev_c) AS sxx,
                   sum(n_orders::HUGEINT * n_orders) AS syy
            FROM j
        )
        SELECT n_days,
               CASE WHEN (n_days::HUGEINT * srxx - srx * srx) > 0
                     AND (n_days::HUGEINT * sryy - sry * sry) > 0
                    THEN round((n_days::HUGEINT * srxy - srx * sry)::DOUBLE
                         / sqrt((n_days::HUGEINT * srxx - srx * srx)::DOUBLE)
                         / sqrt((n_days::HUGEINT * sryy - sry * sry)::DOUBLE),
                         6)
               END AS spearman_rho,
               CASE WHEN (n_days::HUGEINT * sxx - sx * sx) > 0
                     AND (n_days::HUGEINT * syy - sy * sy) > 0
                    THEN round((n_days::HUGEINT * sxy - sx * sy)::DOUBLE
                         / sqrt((n_days::HUGEINT * sxx - sx * sx)::DOUBLE)
                         / sqrt((n_days::HUGEINT * syy - sy * sy)::DOUBLE),
                         6)
               END AS pearson_r
        FROM st
    """,
    doc="""Spearman rank correlation between the daily-revenue and
    daily-order-count series, with exact average-tie midranks, next to
    the Pearson r on the raw values — when the two diverge the
    relationship is nonlinear or outlier-driven (the standard robust
    check before trusting a linear KPI model).  Determinism: midranks
    are exact integers via the 2×midrank identity
    (2·|values below| + |ties| + 1), built from a per-distinct-value
    count frame, so no floating rank ever exists; Spearman is Pearson
    on those integer ranks (affine-invariant, so the ×2 cancels); BOTH
    correlations are computed from EXACT integer sufficient statistics
    (n, Σx, Σy, Σxy, Σx², Σy² in decimal(38)/HUGEINT) through one
    fixed-order double expression, so no decimal-boundary flip can
    appear at any scale, and a zero-variance (constant) series yields
    NULL in both engines instead of an ANSI divide-by-zero (round-7
    guard).  Scale shape:
    the fact table collapses to the
    calendar-bounded daily frame first (≤ |days| rows at ANY data
    scale); the rank computation is a non-equi self-join of the
    distinct-VALUE frame, also calendar-bounded, declared in the plan
    sweep's bounded nested-loop allowlist; then two broadcast
    equi-joins back and one 1-row aggregate.""",
)
def spearman_daily_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c"),
        F.count("*").alias("n_orders"),
    )

    def midranks(col: str) -> DataFrame:
        g = daily.groupBy(F.col(col).alias("v")).agg(F.count("*").alias("c"))
        a, b = g.alias("a"), g.alias("b")
        return (
            a.join(b, F.col("b.v") < F.col("a.v"), "left")
            .groupBy(F.col("a.v").alias("v"))
            .agg(
                (
                    2 * F.coalesce(F.sum("b.c"), F.lit(0))
                    + F.first("a.c")
                    + 1
                ).alias("r2")
            )
        )

    rx = midranks("rev_c").withColumnRenamed("r2", "r2x")
    ry = midranks("n_orders").withColumnRenamed("r2", "r2y")
    j = daily.join(
        F.broadcast(rx), daily.rev_c == rx.v
    ).join(F.broadcast(ry), daily.n_orders == ry.v)
    # Pearson over ~1e9-magnitude cent values would be one-ulp fragile
    # through the builtin ``corr`` (partial-aggregation order varies),
    # so BOTH correlations are computed from EXACT integer sufficient
    # statistics — decimal(38,0) sums here, HUGEINT in the oracle —
    # folded through ONE fixed-order double expression, the
    # welch_t/anova pattern.  Spearman's inputs are the small integer
    # midranks, so its sufficient statistics are exact too (and the
    # affine ×2 in the midrank identity cancels in the correlation).
    xd = F.col("rev_c").cast("decimal(19,0)")
    yd = F.col("n_orders").cast("decimal(19,0)")
    rxd = F.col("r2x").cast("decimal(19,0)")
    ryd = F.col("r2y").cast("decimal(19,0)")
    st = j.agg(
        F.count("*").alias("n_days"),
        F.sum(rxd).alias("srx"),
        F.sum(ryd).alias("sry"),
        F.sum(rxd * ryd).alias("srxy"),
        F.sum(rxd * rxd).alias("srxx"),
        F.sum(ryd * ryd).alias("sryy"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
    )
    n = F.col("n_days").cast("decimal(38,0)")

    def corr_guarded(sxy: str, sxx: str, syy: str, sx: str, sy: str):
        # Zero-variance guard (round-7 ADVICE): a constant series makes
        # a cross-moment exactly zero (exact integers, so the comparison
        # is engine-independent) and the division would be an
        # engine-dependent inf/NaN/divide-by-zero (ANSI mode raises) —
        # emit NULL, mirrored by the oracle's CASE WHEN, matching the
        # lang_id_agreement_ari ARI-denominator pattern.
        cxy = (n * F.col(sxy) - F.col(sx) * F.col(sy)).cast("double")
        cxx = (n * F.col(sxx) - F.col(sx) * F.col(sx)).cast("double")
        cyy = (n * F.col(syy) - F.col(sy) * F.col(sy)).cast("double")
        return F.when(
            (cxx > 0) & (cyy > 0),
            F.round(cxy / F.sqrt(cxx) / F.sqrt(cyy), 6),
        )

    return st.select(
        "n_days",
        corr_guarded("srxy", "srxx", "sryy", "srx", "sry").alias("spearman_rho"),
        corr_guarded("sxy", "sxx", "syy", "sx", "sy").alias("pearson_r"),
    )


# --- pair-counting agreement (Rand / ARI) ----------------------------------


@register(
    "lang_id_agreement_ari",
    oracle=f"""
        WITH pred AS (
            SELECT lang AS true_lang,
                   CASE WHEN len(list_filter(string_split(text, ' '),
                            t -> t IN ({_STOPLIST_SQL})))::DOUBLE
                            / len(string_split(text, ' ')) > 0.05
                        THEN 'en' ELSE 'und' END AS lang_guess
            FROM documents
        ), cells AS (
            SELECT true_lang, lang_guess, count(*)::BIGINT AS nij
            FROM pred GROUP BY true_lang, lang_guess
        ), mt AS (
            SELECT (sum((nij * (nij - 1)) // 2))::BIGINT AS matched,
                   (sum(nij))::BIGINT AS n_docs
            FROM cells
        ), ta AS (
            SELECT (sum((ai * (ai - 1)) // 2))::BIGINT AS true_pairs
            FROM (SELECT (sum(nij))::BIGINT AS ai FROM cells
                  GROUP BY true_lang)
        ), tb AS (
            SELECT (sum((bj * (bj - 1)) // 2))::BIGINT AS pred_pairs
            FROM (SELECT (sum(nij))::BIGINT AS bj FROM cells
                  GROUP BY lang_guess)
        ), z AS (
            SELECT n_docs, matched, true_pairs, pred_pairs,
                   ((n_docs * (n_docs - 1)) // 2) AS tot
            FROM mt, ta, tb
        )
        SELECT n_docs, matched AS matched_pairs, true_pairs, pred_pairs,
               CASE WHEN pred_pairs > 0
                    THEN ((matched * 1000000) // pred_pairs)
               END AS precision_micros,
               CASE WHEN true_pairs > 0
                    THEN ((matched * 1000000) // true_pairs)
               END AS recall_micros,
               CASE WHEN true_pairs + pred_pairs > 0
                    THEN ((2 * matched * 1000000)
                          // (true_pairs + pred_pairs))
               END AS f1_micros,
               CASE WHEN tot > 0
                    THEN (((matched + tot - true_pairs - pred_pairs
                            + matched) * 1000000) // tot)
               END AS rand_index_micros,
               CASE WHEN tot > 0
                     AND ((true_pairs + pred_pairs) / 2.0
                          - true_pairs::DOUBLE * pred_pairs / tot) > 0
                    THEN round((matched
                                - true_pairs::DOUBLE * pred_pairs / tot)
                               / ((true_pairs + pred_pairs) / 2.0
                                  - true_pairs::DOUBLE * pred_pairs / tot),
                               6)
               END AS ari
        FROM z
    """,
    doc="""Pair-counting agreement between the labeled languages and
    the cheap stopword-density detector: pairwise precision / recall /
    F1 (a predicted same-language pair vs a true same-language pair),
    the Rand index, and the chance-corrected Adjusted Rand Index
    (Hubert & Arabie '85) — the scalar summary lang_id_confusion's
    matrix cannot give, and the standard way to score ANY partition
    against labels (dedup clusters, blocking keys, topic buckets)
    without enumerating pairs.  Determinism: everything reduces to
    exact integer pair counts n·(n−1)/2 over the contingency cells;
    only the final ARI ratio is a fixed-order double expression.
    Scale shape: one grouped count to the |langs|·|guesses| cell frame,
    then three 1-row aggregates combined by broadcast (declared
    bounded nested-loop) — no pair is ever materialized, so the audit
    costs one scan at any corpus size (pair counts exceed int64 past
    ~3e9 docs per label; the decimal(38) variant is the same plan).""",
)
def lang_id_agreement_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import stopword_ratio

    docs = load_table(spark, "documents", sf_dir)
    pred = docs.select(
        F.col("lang").alias("true_lang"),
        F.when(stopword_ratio("text") > 0.05, F.lit("en"))
        .otherwise(F.lit("und"))
        .alias("lang_guess"),
    )
    cells = pred.groupBy("true_lang", "lang_guess").agg(
        F.count("*").alias("nij")
    )

    def pairs(c: Column) -> Column:
        return _idiv(c * (c - 1), F.lit(2))

    mt = cells.agg(
        F.sum(pairs(F.col("nij"))).alias("matched"),
        F.sum("nij").alias("n_docs"),
    )
    ta = (
        cells.groupBy("true_lang")
        .agg(F.sum("nij").alias("ai"))
        .agg(F.sum(pairs(F.col("ai"))).alias("true_pairs"))
    )
    tb = (
        cells.groupBy("lang_guess")
        .agg(F.sum("nij").alias("bj"))
        .agg(F.sum(pairs(F.col("bj"))).alias("pred_pairs"))
    )
    z = (
        mt.crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .withColumn("tot", _idiv(F.col("n_docs") * (F.col("n_docs") - 1), F.lit(2)))
    )
    d = F.col
    exp_idx = d("true_pairs").cast("double") * d("pred_pairs") / d("tot")
    ari_den = (d("true_pairs") + d("pred_pairs")) / F.lit(2.0) - exp_idx
    # Degenerate-partition guards (mirrored by the oracle CASEs): a
    # single-cluster or single-doc input zeroes pred_pairs /
    # true_pairs / tot / the ARI denominator — report NULL cleanly
    # rather than an engine-dependent divide-by-zero.
    return z.select(
        "n_docs",
        d("matched").alias("matched_pairs"),
        "true_pairs",
        "pred_pairs",
        F.when(
            d("pred_pairs") > 0,
            _idiv(d("matched") * 1_000_000, d("pred_pairs")),
        ).alias("precision_micros"),
        F.when(
            d("true_pairs") > 0,
            _idiv(d("matched") * 1_000_000, d("true_pairs")),
        ).alias("recall_micros"),
        F.when(
            d("true_pairs") + d("pred_pairs") > 0,
            _idiv(
                2 * d("matched") * 1_000_000,
                d("true_pairs") + d("pred_pairs"),
            ),
        ).alias("f1_micros"),
        F.when(
            d("tot") > 0,
            _idiv(
                (d("matched") + d("tot") - d("true_pairs") - d("pred_pairs")
                 + d("matched"))
                * 1_000_000,
                d("tot"),
            ),
        ).alias("rand_index_micros"),
        F.when(
            (d("tot") > 0) & (ari_den > 0),
            F.round((d("matched") - exp_idx) / ari_den, 6),
        ).alias("ari"),
    )


# --- training-shard shuffle quality ----------------------------------------

_SHUFFLE_SHARDS = 16


@register(
    "shard_shuffle_quality",
    oracle=f"""
        WITH ordered AS (
            SELECT source,
                   ({duckdb_hash32_sql("'shard:' || doc_id")})
                       % {_SHUFFLE_SHARDS} AS shard,
                   {duckdb_hash64_sql("'shuf:' || doc_id")} AS pos_h,
                   doc_id
            FROM documents
        ), lagged AS (
            SELECT source,
                   lag(source) OVER (PARTITION BY shard
                                     ORDER BY pos_h, doc_id) AS prev_source
            FROM ordered
        ), obs AS (
            SELECT (sum(CASE WHEN source = prev_source THEN 1 ELSE 0 END))
                       ::BIGINT AS same_adjacent,
                   (sum(CASE WHEN prev_source IS NOT NULL THEN 1 ELSE 0 END))
                       ::BIGINT AS n_adjacent
            FROM lagged
        ), exp AS (
            SELECT (sum(c * (c - 1)))::BIGINT AS same_num,
                   (sum(c))::BIGINT AS n_docs
            FROM (SELECT count(*)::BIGINT AS c FROM documents
                  GROUP BY source)
        ), z AS (
            SELECT n_docs, n_adjacent, same_adjacent,
                   CASE WHEN n_adjacent > 0
                        THEN ((same_adjacent * 1000000) // n_adjacent)
                        ELSE 0 END AS observed_same_micros,
                   ((same_num * 1000000) // (n_docs * (n_docs - 1)))
                       AS expected_same_micros
            FROM obs, exp
        )
        SELECT n_docs, n_adjacent, same_adjacent,
               observed_same_micros, expected_same_micros,
               CASE WHEN expected_same_micros > 0
                    THEN ((observed_same_micros * 1000000)
                          // expected_same_micros)
                    END AS ratio_micros
        FROM z
    """,
    doc=f"""Training-shard shuffle-quality audit: documents hash-assign
    to {_SHUFFLE_SHARDS} shards and hash-order within each shard (the
    exact layout corpus_shard_assignment feeds a trainer), then the
    rate of ADJACENT same-source pairs is compared to the expectation
    under a uniform random order (Σ n_s·(n_s−1) / (N·(N−1))).  A ratio
    near 1e6 certifies the shuffle decorrelated sources; a high ratio
    means consecutive training batches over-sample one source — the
    silent gradient-correlation bug this audit exists to catch before
    a run burns compute.  Determinism: shard and order come from the
    portable md5 hashes, adjacency from one lag window PARTITIONED by
    shard, and every rate is an exact integer floor-ratio in micros.
    Scale shape: one window keyed by shard (each partition is
    |docs|/{_SHUFFLE_SHARDS}, and a production shard count grows with
    the corpus so partitions stay bounded), one per-source grouped
    count, two 1-row aggregates combined by broadcast (declared);
    N·(N−1) exceeds int64 past ~3e9 docs — the decimal(38) variant is
    the same plan.""",
)
def shard_shuffle_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    ordered = docs.select(
        "source",
        (
            portable_hash32(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
            % _SHUFFLE_SHARDS
        ).alias("shard"),
        portable_hash64(
            F.concat(F.lit("shuf:"), F.col("doc_id").cast("string"))
        ).alias("pos_h"),
        "doc_id",
    )
    w = W.partitionBy("shard").orderBy("pos_h", "doc_id")
    lagged = ordered.select(
        "source", F.lag("source").over(w).alias("prev_source")
    )
    obs = lagged.agg(
        F.sum(
            F.when(F.col("source") == F.col("prev_source"), 1).otherwise(0)
        ).alias("same_adjacent"),
        F.sum(F.when(F.col("prev_source").isNotNull(), 1).otherwise(0)).alias(
            "n_adjacent"
        ),
    )
    exp = (
        docs.groupBy("source")
        .agg(F.count("*").alias("c"))
        .agg(
            F.sum(F.col("c") * (F.col("c") - 1)).alias("same_num"),
            F.sum("c").alias("n_docs"),
        )
    )
    z = obs.crossJoin(F.broadcast(exp)).select(
        "n_docs",
        "n_adjacent",
        "same_adjacent",
        F.when(
            F.col("n_adjacent") > 0,
            _idiv(F.col("same_adjacent") * 1_000_000, F.col("n_adjacent")),
        )
        .otherwise(F.lit(0))
        .alias("observed_same_micros"),
        _idiv(
            F.col("same_num") * 1_000_000,
            F.col("n_docs") * (F.col("n_docs") - 1),
        ).alias("expected_same_micros"),
    )
    return z.withColumn(
        "ratio_micros",
        F.when(
            F.col("expected_same_micros") > 0,
            _idiv(
                F.col("observed_same_micros") * 1_000_000,
                F.col("expected_same_micros"),
            ),
        ),
    )
