"""Round-5 closing additions: the statistical-inference audits a
curation pipeline runs before acting on its own metrics.

- ``chi2_lang_source_independence`` — is language mix independent of
  source?  Decides whether per-source language budgets can be tuned
  separately or the mixture must be planned jointly.
- ``quality_gains_by_band`` — the cumulative gains/lift curve of the
  quality ranking: what share of 'en' documents each score cutoff
  captures, and at what selectivity.  Completes the ranking-evaluation
  family (confusion cells → one cutoff → AUC → every banded cutoff
  with volumes attached — the curve a selection budget is actually
  read off of).
- ``jackknife_ci_order_total`` — delete-one-block jackknife standard
  error and 95% CI of the mean order total: the uncertainty attached
  to any mean the other audits report, computed in one pass + a
  32-row combine (the block-resampling scheme that, unlike the
  bootstrap, needs no per-replicate re-draw of the corpus).

Scale shapes: every query is groupBy-aggregates over bounded group
counts (|langs|·|sources| cells, 33 score bands, 32 jackknife blocks)
plus broadcast 1-row totals — no unpartitioned window, no data
collect, no nested loop beyond declared scalar crossJoins.

FP discipline as everywhere in the registry: money quantizes to
integer cents, per-cell chi-squared terms and per-block jackknife
deviations quantize to fixed-point BEFORE the cross-engine sum, so
double accumulation order can never flip a rounded digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash32
from ..sources.loaders import load_table
from .extension_queries import _STOPLIST_SQL
from .registry import register

# Equi-width score bands for the gains curve (quality lives in [0,1]).
GAINS_BANDS = 32

# Jackknife block count: enough blocks for a stable variance estimate,
# few enough that the combine stays a broadcast-size frame.
JK_BLOCKS = 32


@register(
    "chi2_lang_source_independence",
    oracle="""
        WITH cell AS (
            SELECT lang, source, count(*)::BIGINT AS o
            FROM documents GROUP BY lang, source
        ), rm AS (
            SELECT lang, sum(o)::BIGINT AS rt FROM cell GROUP BY lang
        ), cm AS (
            SELECT source, sum(o)::BIGINT AS ct FROM cell GROUP BY source
        ), tot AS (
            SELECT sum(o)::BIGINT AS n,
                   (SELECT count(*) FROM rm)::BIGINT AS r,
                   (SELECT count(*) FROM cm)::BIGINT AS c
            FROM cell
        ), terms AS (
            SELECT round(cell.o::DOUBLE * cell.o * tot.n
                         / (rm.rt::DOUBLE * cm.ct) * 1000000)::BIGINT
                       AS term_micros
            FROM cell
            JOIN rm USING (lang) JOIN cm USING (source) CROSS JOIN tot
        )
        SELECT tot.n AS n_docs, tot.r AS n_langs, tot.c AS n_sources,
               ((tot.r - 1) * (tot.c - 1))::BIGINT AS dof,
               round((sum(terms.term_micros) - tot.n * 1000000)
                     / 1000000.0, 6) AS chi2,
               round(sqrt((sum(terms.term_micros) - tot.n * 1000000)
                          / 1000000.0
                          / (tot.n * least(tot.r - 1, tot.c - 1))), 6)
                   AS cramers_v
        FROM terms CROSS JOIN tot
        GROUP BY tot.n, tot.r, tot.c
    """,
    doc="""Chi-squared test of independence between document language
    and source, with Cramér's V effect size — the audit that decides
    whether per-source language budgets can be tuned independently
    (independence holds) or the mixture must be planned jointly (a few
    sources carry all of one language).  Uses the identity
    chi2 = sum(o^2/e) - n over OBSERVED cells only (zero-observed
    cells contribute 0 to o^2/e), so no dense r x c expansion is ever
    materialized.  Scale shape: one (lang, source) aggregate — the
    cell table is bounded by |langs| x |sources| regardless of corpus
    size — then broadcast marginal joins and one scalar combine; the
    per-cell terms quantize to micros before the sum, so the result
    is accumulation-order-proof.  At 100 TB the only full-scan cost is
    the first groupBy; counts ride in doubles inside the term (o^2 * n
    would overflow int64 at petabyte row counts).""",
)
def chi2_lang_source_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    cell = docs.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("o")
    )
    rm = cell.groupBy("lang").agg(F.sum("o").cast("long").alias("rt"))
    cm = cell.groupBy("source").agg(F.sum("o").cast("long").alias("ct"))
    tot = cell.agg(
        F.sum("o").cast("long").alias("n"),
        F.count_distinct("lang").cast("long").alias("r"),
        F.count_distinct("source").cast("long").alias("c"),
    )
    term = F.round(
        F.col("o").cast("double")
        * F.col("o")
        * F.col("n")
        / (F.col("rt").cast("double") * F.col("ct"))
        * 1_000_000
    ).cast("long")
    chi2_raw = (F.sum("term_micros") - F.col("n") * 1_000_000) / 1_000_000.0
    return (
        cell.join(F.broadcast(rm), "lang")
        .join(F.broadcast(cm), "source")
        .crossJoin(F.broadcast(tot))
        .select(term.alias("term_micros"), "n", "r", "c")
        .groupBy("n", "r", "c")
        .agg(
            F.round(chi2_raw, 6).alias("chi2"),
            F.round(
                F.sqrt(
                    chi2_raw / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
                ),
                6,
            ).alias("cramers_v"),
        )
        .select(
            F.col("n").alias("n_docs"),
            F.col("r").alias("n_langs"),
            F.col("c").alias("n_sources"),
            ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
            "chi2",
            "cramers_v",
        )
    )


@register(
    "quality_gains_by_band",
    oracle=f"""
        WITH scored AS (
            SELECT least(floor(round(
                       0.4 * least(len(string_split(text, ' ')) / 100.0, 1.0)
                       + 0.3 * (len(list_filter(string_split(text, ' '),
                                    t -> t IN ({_STOPLIST_SQL})))::DOUBLE
                                / len(string_split(text, ' ')))
                       + 0.3 * (1 - length(regexp_replace(lower(text),
                                    '[a-z0-9 ]', '', 'g'))::DOUBLE
                                    / length(text)), 6)
                       * {GAINS_BANDS})::BIGINT, {GAINS_BANDS - 1}) AS band,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
            FROM documents
        ), band_agg AS (
            SELECT band, count(*)::BIGINT AS n, sum(pos)::BIGINT AS npos
            FROM scored GROUP BY band
        ), fan AS (
            SELECT unnest(generate_series(0, band)) AS band_cut, n, npos
            FROM band_agg
        ), cum AS (
            SELECT band_cut, sum(n)::BIGINT AS n_selected,
                   sum(npos)::BIGINT AS n_positive
            FROM fan GROUP BY band_cut
        ), tot AS (
            SELECT count(*)::BIGINT AS nt, sum(pos)::BIGINT AS pt FROM scored
        )
        SELECT cum.band_cut,
               round(cum.band_cut / {GAINS_BANDS}.0, 6) AS cut_quality,
               cum.n_selected, cum.n_positive,
               round(cum.n_selected::DOUBLE / tot.nt, 6) AS selected_share,
               round(cum.n_positive::DOUBLE / tot.pt, 6) AS recall,
               round(cum.n_positive::DOUBLE * tot.nt
                     / (cum.n_selected * tot.pt), 6) AS lift
        FROM cum CROSS JOIN tot
    """,
    doc=f"""Cumulative gains/lift curve of the quality ranking against
    the 'en' label, banded into {GAINS_BANDS} equi-width score cutoffs:
    for each cutoff, the selected volume, the share of all positives
    captured (recall), and the lift over random selection.  The curve a
    selection budget is read off of — AUC says the ranking works,
    this says WHERE to cut.  The cumulative-from-the-top sums use the
    bounded fan-out pattern (each band row explodes to the cutoffs it
    satisfies, ≤{GAINS_BANDS} rows each, then one equi-groupBy) —
    never an unpartitioned window, exactly like decayed_hourly_traffic;
    the fan-out input is the ≤{GAINS_BANDS}-row band aggregate, so the
    explode is O(bands²) regardless of corpus size.  Counts are exact
    integers; every ratio is one deterministic double division.""",
)
def quality_gains_by_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import quality_expr

    docs = load_table(spark, "documents", sf_dir)
    # One projection instead of scan + scan + 1:1 self-join on doc_id
    # (round-10, session 3 — the quality_auc_en pattern).
    scored = docs.select(quality_expr("text").alias("quality"), "lang")
    band = F.least(
        F.floor(F.col("quality") * GAINS_BANDS).cast("long"),
        F.lit(GAINS_BANDS - 1),
    )
    # Pin the ≤GAINS_BANDS-row band aggregate: the totals row and the
    # cumulative fan-out both hang off it, and each re-derived the full
    # text-scoring scan (change-8 waist; eager — both consumers sit in
    # the same final action, so there is no earlier job to ride).
    band_agg = scored.select(
        band.alias("band"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    ).groupBy("band").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("npos"),
    ).localCheckpoint(eager=True)
    tot = band_agg.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("npos").cast("long").alias("pt"),
    )
    cum = (
        band_agg.select(
            F.explode(F.sequence(F.lit(0), F.col("band"))).alias("band_cut"),
            "n",
            "npos",
        )
        .groupBy("band_cut")
        .agg(
            F.sum("n").cast("long").alias("n_selected"),
            F.sum("npos").cast("long").alias("n_positive"),
        )
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        "band_cut",
        F.round(F.col("band_cut") / float(GAINS_BANDS), 6).alias("cut_quality"),
        "n_selected",
        "n_positive",
        F.round(F.col("n_selected").cast("double") / F.col("nt"), 6).alias(
            "selected_share"
        ),
        F.round(F.col("n_positive").cast("double") / F.col("pt"), 6).alias(
            "recall"
        ),
        F.round(
            F.col("n_positive").cast("double")
            * F.col("nt")
            / (F.col("n_selected") * F.col("pt")),
            6,
        ).alias("lift"),
    )


@register(
    "jackknife_ci_order_total",
    oracle=f"""
        WITH blk AS (
            SELECT (('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::BIGINT
                    % {JK_BLOCKS}) AS b,
                   count(*)::BIGINT AS n_i,
                   sum(round(o_totalprice * 100))::BIGINT AS s_i
            FROM orders GROUP BY b
        ), tot AS (
            SELECT sum(n_i)::BIGINT AS n, sum(s_i)::BIGINT AS s,
                   count(*)::BIGINT AS nb
            FROM blk
        ), theta AS (
            SELECT round((tot.s - blk.s_i)
                         / (100.0 * (tot.n - blk.n_i)) * 1000000)::BIGINT
                       AS th_micros,
                   tot.n, tot.s, tot.nb
            FROM blk CROSS JOIN tot
        ), tsum AS (
            SELECT sum(th_micros)::BIGINT AS t, max(n) AS n, max(s) AS s,
                   max(nb) AS nb
            FROM theta
        ), dev AS (
            SELECT round((theta.th_micros - tsum.t / tsum.nb::DOUBLE)
                         / 10000)::BIGINT AS dev_cents,
                   tsum.n, tsum.s, tsum.nb
            FROM theta CROSS JOIN tsum
        )
        SELECT max(n) AS n_orders, max(nb)::BIGINT AS n_blocks,
               round(max(s) / (100.0 * max(n)), 6) AS mean_total,
               round(sqrt(sum(dev_cents * dev_cents) / 10000.0
                          * (max(nb) - 1) / max(nb)), 6) AS se_jack,
               round(max(s) / (100.0 * max(n))
                     - 1.96 * sqrt(sum(dev_cents * dev_cents) / 10000.0
                                   * (max(nb) - 1) / max(nb)), 6) AS ci_lo,
               round(max(s) / (100.0 * max(n))
                     + 1.96 * sqrt(sum(dev_cents * dev_cents) / 10000.0
                                   * (max(nb) - 1) / max(nb)), 6) AS ci_hi
        FROM dev
    """,
    doc=f"""Delete-one-block jackknife standard error and 95% CI of the
    mean order total (Quenouille/Tukey; the block form is the standard
    cluster-resampling scheme): rows hash into {JK_BLOCKS} blocks, each
    leave-one-block-out mean theta_i = (S - s_i)/(N - n_i) comes from
    the SAME one-pass per-block (sum, count) frame, and
    var_jack = (B-1)/B * sum((theta_i - theta_bar)^2).  Unlike a
    bootstrap there is no per-replicate re-draw — one corpus pass plus
    a {JK_BLOCKS}-row combine prices the uncertainty of every mean the
    other audits report.  FP discipline: money sums in integer cents
    (exact), each theta_i quantizes to micros and each deviation to
    cents BEFORE the cross-engine sum of squares, so double
    accumulation order cannot flip a rounded digit (deviation² stays
    inside double's exact-integer range, which raw micros² would not).
    Scale shape: one shuffle on a {JK_BLOCKS}-ary key, then scalar
    crossJoins over the {JK_BLOCKS}-row frame — declared BNL sites,
    bounded by construction.""",
)
def jackknife_ci_order_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    blk = orders.groupBy(
        (portable_hash32(F.col("o_orderkey").cast("string")) % JK_BLOCKS).alias("b")
    ).agg(
        F.count("*").cast("long").alias("n_i"),
        F.sum(F.round(F.col("o_totalprice") * 100)).cast("long").alias("s_i"),
    )
    tot = blk.agg(
        F.sum("n_i").cast("long").alias("n"),
        F.sum("s_i").cast("long").alias("s"),
        F.count("*").cast("long").alias("nb"),
    )
    theta = blk.crossJoin(F.broadcast(tot)).select(
        F.round(
            (F.col("s") - F.col("s_i"))
            / (100.0 * (F.col("n") - F.col("n_i")))
            * 1_000_000
        )
        .cast("long")
        .alias("th_micros"),
        "n",
        "s",
        "nb",
    )
    tsum = theta.agg(
        F.sum("th_micros").cast("long").alias("t"),
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        F.max("nb").alias("nb"),
    )
    dev = theta.select("th_micros").crossJoin(F.broadcast(tsum)).select(
        F.round(
            (F.col("th_micros") - F.col("t") / F.col("nb").cast("double"))
            / 10_000
        )
        .cast("long")
        .alias("dev_cents"),
        "n",
        "s",
        "nb",
    )
    se = F.sqrt(
        F.sum(F.col("dev_cents") * F.col("dev_cents")) / 10_000.0
        * (F.max("nb") - 1)
        / F.max("nb")
    )
    mean = F.max("s") / (100.0 * F.max("n"))
    return dev.agg(
        F.max("n").alias("n_orders"),
        F.max("nb").cast("long").alias("n_blocks"),
        F.round(mean, 6).alias("mean_total"),
        F.round(se, 6).alias("se_jack"),
        F.round(mean - 1.96 * se, 6).alias("ci_lo"),
        F.round(mean + 1.96 * se, 6).alias("ci_hi"),
    )
