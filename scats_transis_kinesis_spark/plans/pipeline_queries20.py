"""Round-5 batch: supervised calibration and model-screening
primitives — the statistics between "we scored the data" and "we can
act on the scores":

- ``pav_calibration_bins`` — exact isotonic regression (pool-adjacent
  violators) of a binary outcome on 10 equal-width spend bands, via
  the minimax identity f(i) = max_{j≤i} min_{k≥i} avg(y[j..k]) over
  the bounded band frame — the calibration step behind reliability
  curves and monotone score mappings (Zadrozny & Elkan '02).
- ``conformal_coverage_audit`` — split-conformal prediction (Vovk;
  Angelopoulos & Bates '21 tutorial form): centroids fit on the train
  third, the 90% nonconformity quantile q̂ = ⌈(n+1)·0.9⌉-th smallest
  calibration score, and the EMPIRICAL coverage of {score ≤ q̂} on the
  held-out test third — the distribution-free guarantee check.  The
  engine story: the exact k-th order statistic over an unbounded score
  column runs hierarchically (bucket counts → bounded prefix →
  in-bucket partitioned rank), never an unpartitioned window.
- ``decision_stump_split`` — Gini-impurity screening of a numeric
  feature against a binary label across 9 equal-width thresholds:
  per-threshold weighted impurity drop and the argmax flag — the
  one-feature CART step (Breiman '84) that ranks candidate quality
  features before training anything.

Determinism contracts: every count/sum is exact int64; band and
threshold edges derive from exact integer min/max through the same
double expression in both engines; PAV interval means, Gini drops and
coverage shares are fixed-order double expressions rounded to micros
at the end; the conformal k is pure integer arithmetic
⌈9(n+1)/10⌉ = (9(n+1)+9)//10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..sources.loaders import load_table
from .pipeline_queries13 import _idiv
from .probes import probe_min_max
from .registry import register

# --- isotonic calibration (PAV via minimax) ---------------------------------

_PAV_BANDS = 10


@register(
    "pav_calibration_bins",
    oracle=f"""
        WITH x AS (
            SELECT CAST(round(o_totalprice) AS BIGINT) AS xd,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
            FROM orders
        ), mm AS (
            SELECT min(xd)::BIGINT AS lo,
                   greatest((max(xd) - min(xd))::DOUBLE / {_PAV_BANDS},
                            1e-9) AS w
            FROM x
        ), banded AS (
            SELECT least({_PAV_BANDS - 1},
                         floor((x.xd - mm.lo) / mm.w))::BIGINT AS band,
                   x.y
            FROM x, mm
        ), bands AS (
            SELECT band, count(*)::BIGINT AS n, (sum(y))::BIGINT AS pos
            FROM banded GROUP BY band
        ), pre AS (
            SELECT a.band, any_value(a.n) AS n, any_value(a.pos) AS pos,
                   coalesce(sum(b.n), 0)::BIGINT AS pre_n,
                   coalesce(sum(b.pos), 0)::BIGINT AS pre_pos
            FROM bands a LEFT JOIN bands b ON b.band < a.band
            GROUP BY a.band
        ), iv AS (
            SELECT j.band AS j, k.band AS k,
                   ((k.pre_pos + k.pos - j.pre_pos)::DOUBLE
                    / (k.pre_n + k.n - j.pre_n)) AS avg_jk
            FROM pre j JOIN pre k ON j.band <= k.band
        ), fit AS (
            SELECT band, max(mn) AS fitted
            FROM (
                SELECT p.band, iv.j, min(iv.avg_jk) AS mn
                FROM pre p JOIN iv
                  ON iv.j <= p.band AND iv.k >= p.band
                GROUP BY p.band, iv.j
            )
            GROUP BY band
        )
        SELECT pre.band, pre.n,
               ((pre.pos * 1000000) // pre.n) AS rate_micros,
               round(1000000 * fit.fitted)::BIGINT AS iso_micros
        FROM pre JOIN fit ON pre.band = fit.band
        ORDER BY pre.band
    """,
    doc=f"""Exact isotonic calibration of P(order is finalized) on
    {_PAV_BANDS} equal-width spend bands: the pool-adjacent-violators
    fit computed by the minimax identity f(i) = max_{{j≤i}} min_{{k≥i}}
    mean(y over bands j..k) — no sequential pooling loop, so the whole
    fit is three bounded joins over the {_PAV_BANDS}-row band frame
    (prefix sums → all {_PAV_BANDS * (_PAV_BANDS + 1) // 2} interval
    means → per-band minimax).  Output: raw vs isotonic rate per band
    (the isotonic column is monotone by construction — the reliability
    curve a score consumer is allowed to invert).  Determinism: band
    edges from exact integer min/max through one shared double
    expression; interval means are exact-int ratios; comparisons
    happen on identical IEEE doubles.  Scale shape: one banded count
    over the fact table; everything after is O(bands³) on a
    config-bounded frame (declared bounded nested loops).""",
)
def pav_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    x = orders.select(
        F.round("o_totalprice").cast("long").alias("xd"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    mm = x.agg(
        F.min("xd").alias("lo"),
        F.greatest(
            (F.max("xd") - F.min("xd")).cast("double") / _PAV_BANDS,
            F.lit(1e-9),
        ).alias("w"),
    )
    banded = x.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.lit(_PAV_BANDS - 1),
            F.floor((F.col("xd") - F.col("lo")) / F.col("w")),
        )
        .cast("long")
        .alias("band"),
        "y",
    )
    # Pinned ≤_PAV_BANDS-row band tally (change-8 waist): it feeds both
    # sides of the prefix self-join, and `pre` in turn feeds the
    # interval frame twice, the band list and the final join — without
    # the cut every reference re-derived the banded corpus scan (12
    # effective scans in the before plan).
    bands = banded.groupBy("band").agg(
        F.count("*").alias("n"), F.sum("y").alias("pos")
    ).localCheckpoint(eager=True)
    a, b = bands.alias("a"), bands.alias("b")
    pre = (
        a.join(F.broadcast(b), F.col("b.band") < F.col("a.band"), "left")
        .groupBy(F.col("a.band").alias("band"))
        .agg(
            F.first("a.n").alias("n"),
            F.first("a.pos").alias("pos"),
            F.coalesce(F.sum("b.n"), F.lit(0)).alias("pre_n"),
            F.coalesce(F.sum("b.pos"), F.lit(0)).alias("pre_pos"),
        )
    )
    j, k = pre.alias("j"), pre.alias("k")
    iv = j.join(F.broadcast(k), F.col("j.band") <= F.col("k.band")).select(
        F.col("j.band").alias("ivj"),
        F.col("k.band").alias("ivk"),
        (
            (F.col("k.pre_pos") + F.col("k.pos") - F.col("j.pre_pos")).cast(
                "double"
            )
            / (F.col("k.pre_n") + F.col("k.n") - F.col("j.pre_n"))
        ).alias("avg_jk"),
    )
    p = pre.select(F.col("band").alias("pband"))
    fit = (
        p.join(
            F.broadcast(iv),
            (F.col("ivj") <= F.col("pband")) & (F.col("ivk") >= F.col("pband")),
        )
        .groupBy("pband", "ivj")
        .agg(F.min("avg_jk").alias("mn"))
        .groupBy("pband")
        .agg(F.max("mn").alias("fitted"))
    )
    return (
        pre.join(fit, pre.band == fit.pband)
        .select(
            "band",
            "n",
            _idiv(F.col("pos") * 1_000_000, F.col("n")).alias("rate_micros"),
            F.round(1_000_000 * F.col("fitted")).cast("long").alias("iso_micros"),
        )
        .orderBy("band")
    )


# --- split-conformal coverage -------------------------------------------------

_CONF_BUCKETS = 32


@register(
    "conformal_coverage_audit",
    oracle="""
        WITH m AS (
            SELECT vec_id, label, (vec_id % 3) AS part,
                   round(x * 1000)::BIGINT AS v, i::BIGINT AS i
            FROM (
                SELECT vec_id, label, unnest(embedding)::DOUBLE AS x,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings
            )
        ), cent AS (
            SELECT label, i,
                   round((sum(v))::DOUBLE / count(*))::BIGINT AS c
            FROM m WHERE part = 0 GROUP BY label, i
        ), sc AS (
            SELECT m.vec_id, any_value(m.part) AS part,
                   (sum((m.v - cent.c) * (m.v - cent.c)))::BIGINT AS score
            FROM m JOIN cent ON m.label = cent.label AND m.i = cent.i
            WHERE m.part IN (1, 2)
            GROUP BY m.vec_id
        ), cal AS (
            SELECT score, row_number() OVER (ORDER BY score, vec_id) AS rn
            FROM sc WHERE part = 1
        ), nk AS (
            SELECT count(*)::BIGINT AS n_cal,
                   ((9 * (count(*) + 1) + 9) // 10)::BIGINT AS k
            FROM cal
        ), qh AS (
            SELECT cal.score AS qhat FROM cal, nk WHERE cal.rn = nk.k
        ), cov AS (
            SELECT count(*)::BIGINT AS n_test,
                   (sum(CASE WHEN sc.score <= qh.qhat THEN 1 ELSE 0 END))
                       ::BIGINT AS covered
            FROM sc, qh WHERE sc.part = 2
        )
        SELECT nk.n_cal, nk.k, qh.qhat, cov.n_test, cov.covered,
               ((cov.covered * 1000000) // cov.n_test) AS coverage_micros,
               900000::BIGINT AS target_micros
        FROM nk, qh, cov
    """,
    doc=f"""Split-conformal prediction audit at 90% (Vovk's
    distribution-free guarantee): class centroids fit on the vec_id%3=0
    third, nonconformity scores are exact integer squared distances to
    the own-class centroid, q̂ is the ⌈(n+1)·0.9⌉-th smallest
    calibration score (%3=1), and the empirical coverage of
    {{score ≤ q̂}} on the untouched test third (%3=2) is reported
    against the 900000-micro target — the check that certifies "the
    90% set really covers ~90%" before anyone ships thresholded
    predictions.  Determinism: centroids round to exact milli-ints,
    scores are exact int64, k is integer arithmetic, coverage is a
    floor-micros ratio.  Scale shape — the engine story: the k-th
    order statistic runs hierarchically on the Spark side
    ({_CONF_BUCKETS} range buckets from a 2-scalar probe, bounded
    prefix join locates the k-th bucket, ONE partitioned in-bucket
    rank window reads it out) — no unpartitioned window at any scale;
    the oracle's global row_number states the same semantics.""",
)
def conformal_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    m = emb.select(
        "vec_id",
        "label",
        (F.col("vec_id") % 3).alias("part"),
        F.posexplode(
            F.transform(
                "embedding",
                lambda e: F.round(e.cast("double") * 1000).cast("long"),
            )
        ).alias("pos", "v"),
    ).select("vec_id", "label", "part", (F.col("pos") + 1).alias("i"), "v")
    cent = (
        m.where(F.col("part") == 0)
        .groupBy("label", "i")
        .agg(
            F.round(F.sum("v").cast("double") / F.count("*"))
            .cast("long")
            .alias("c")
        )
    )
    # Pinned per-vector score frame (change-8 waist; 3 slim columns,
    # one row per calibration/test vector): the calibration branch
    # reads it three ways (count/k probe, range probe, in-bucket rank)
    # and the test branch once more — without the cut each reference
    # re-derived the dimension explode + centroid join + per-vector
    # aggregate (10 effective scans in the before plan).
    sc = (
        m.where(F.col("part").isin(1, 2))
        .join(F.broadcast(cent), ["label", "i"])
        .groupBy("vec_id")
        .agg(
            F.first("part").alias("part"),
            F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))).alias(
                "score"
            ),
        )
        .localCheckpoint(eager=True)
    )
    cal = sc.where(F.col("part") == 1).select("vec_id", "score")
    nk = cal.agg(
        F.count("*").alias("n_cal"),
        _idiv(9 * (F.count("*") + 1) + 9, F.lit(10)).alias("k"),
    )
    # Hierarchical k-th order statistic: bucket by range, prefix-count,
    # rank only inside the bucket that contains rank k.
    lo, hi = probe_min_max(
        cal, "score", query="conformal_coverage_audit", sf_dir=sf_dir
    )
    width = max((hi - lo) / _CONF_BUCKETS, 1e-9)
    bucket = F.least(
        F.lit(_CONF_BUCKETS - 1),
        F.floor((F.col("score") - F.lit(float(lo))) / F.lit(width)),
    ).alias("bucket")
    cb = cal.select("vec_id", "score", bucket)
    btot = cb.groupBy("bucket").agg(F.count("*").alias("bc"))
    a, b = btot.alias("a"), btot.alias("b")
    prefix = (
        a.join(b, F.col("b.bucket") < F.col("a.bucket"), "left")
        .groupBy(F.col("a.bucket").alias("bucket"))
        .agg(
            F.first("a.bc").alias("bc"),
            F.coalesce(F.sum("b.bc"), F.lit(0)).alias("pb"),
        )
    )
    target_bucket = (
        prefix.crossJoin(F.broadcast(nk))
        .where((F.col("pb") < F.col("k")) & (F.col("pb") + F.col("bc") >= F.col("k")))
        .select("bucket", "pb", "k", "n_cal")
    )
    wnd = W.partitionBy("bucket").orderBy("score", "vec_id")
    qh = (
        cb.join(F.broadcast(target_bucket), "bucket")
        .withColumn("rn", F.row_number().over(wnd))
        .where(F.col("pb") + F.col("rn") == F.col("k"))
        .select("n_cal", "k", F.col("score").alias("qhat"))
    )
    test = sc.where(F.col("part") == 2)
    cov = test.crossJoin(F.broadcast(qh)).agg(
        F.first("n_cal").alias("n_cal"),
        F.first("k").alias("k"),
        F.first("qhat").alias("qhat"),
        F.count("*").alias("n_test"),
        F.sum(
            F.when(F.col("score") <= F.col("qhat"), 1).otherwise(0)
        ).alias("covered"),
    )
    return cov.select(
        "n_cal",
        "k",
        "qhat",
        "n_test",
        "covered",
        _idiv(F.col("covered") * 1_000_000, F.col("n_test")).alias(
            "coverage_micros"
        ),
        F.lit(900_000).cast("long").alias("target_micros"),
    )


# --- decision stump -----------------------------------------------------------

_STUMP_CUTS = 9


@register(
    "decision_stump_split",
    oracle=f"""
        WITH x AS (
            SELECT n_chars::BIGINT AS xv,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM documents
        ), mm AS (
            SELECT min(xv)::BIGINT AS lo,
                   greatest((max(xv) - min(xv))::DOUBLE / {_STUMP_CUTS + 1},
                            1e-9) AS w
            FROM x
        ), cuts AS (
            SELECT t::BIGINT AS cut_no,
                   (mm.lo + round(t * mm.w))::BIGINT AS threshold
            FROM (SELECT unnest(generate_series(1, {_STUMP_CUTS})) AS t), mm
        ), tot AS (
            SELECT count(*)::BIGINT AS n, (sum(y))::BIGINT AS pos FROM x
        ), split AS (
            SELECT c.cut_no, any_value(c.threshold) AS threshold,
                   (sum(CASE WHEN x.xv <= c.threshold THEN 1 ELSE 0 END))
                       ::BIGINT AS n_left,
                   (sum(CASE WHEN x.xv <= c.threshold THEN x.y ELSE 0 END))
                       ::BIGINT AS pos_left
            FROM cuts c CROSS JOIN x
            GROUP BY c.cut_no
        ), g AS (
            SELECT s.cut_no, s.threshold, s.n_left,
                   (tot.n - s.n_left) AS n_right,
                   (1 - (tot.pos::DOUBLE / tot.n) * (tot.pos::DOUBLE / tot.n)
                      - (1 - tot.pos::DOUBLE / tot.n)
                        * (1 - tot.pos::DOUBLE / tot.n))
                   - CASE WHEN s.n_left = 0 OR s.n_left = tot.n THEN
                       (1 - (tot.pos::DOUBLE / tot.n)
                            * (tot.pos::DOUBLE / tot.n)
                          - (1 - tot.pos::DOUBLE / tot.n)
                            * (1 - tot.pos::DOUBLE / tot.n))
                     ELSE
                       (s.n_left::DOUBLE / tot.n)
                       * (1 - (s.pos_left::DOUBLE / s.n_left)
                              * (s.pos_left::DOUBLE / s.n_left)
                            - (1 - s.pos_left::DOUBLE / s.n_left)
                              * (1 - s.pos_left::DOUBLE / s.n_left))
                       + ((tot.n - s.n_left)::DOUBLE / tot.n)
                       * (1 - ((tot.pos - s.pos_left)::DOUBLE
                               / (tot.n - s.n_left))
                              * ((tot.pos - s.pos_left)::DOUBLE
                                 / (tot.n - s.n_left))
                            - (1 - (tot.pos - s.pos_left)::DOUBLE
                                   / (tot.n - s.n_left))
                              * (1 - (tot.pos - s.pos_left)::DOUBLE
                                     / (tot.n - s.n_left)))
                     END AS gini_drop
            FROM split s, tot
        ), best AS (SELECT max(gini_drop) AS mx FROM g)
        SELECT g.cut_no, g.threshold, g.n_left, g.n_right,
               round(1000000 * g.gini_drop)::BIGINT AS gini_drop_micros,
               (g.gini_drop = best.mx) AS is_best
        FROM g, best
        ORDER BY g.cut_no
    """,
    doc=f"""Decision-stump feature screen: Gini impurity drop of
    splitting "is this document English?" on n_chars at {_STUMP_CUTS}
    equal-width thresholds, with the argmax flagged — the CART
    one-feature step that ranks candidate quality features before any
    model training (a near-zero best drop says the feature is useless;
    compare against mutual_information_lang_source's information view).
    Determinism: thresholds derive from exact integer min/max through
    one shared expression; left/right counts are exact ints; each Gini
    drop is one fixed-order double expression (empty-side splits fall
    back to zero drop via the parent impurity).  Scale shape: the
    {_STUMP_CUTS}-row threshold frame broadcasts against the fact scan
    (one pass computes ALL split tallies — the classic single-scan
    histogram trick), then everything is a {_STUMP_CUTS}-row frame.""",
)
def decision_stump_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    x = docs.select(
        F.col("n_chars").cast("long").alias("xv"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    # ONE probe scan for min/max AND the totals (round-10, session 3:
    # the old shape ran separate mm and tot aggregates over the same
    # projection — two scans where one suffices; the expressions are
    # unchanged, so every derived value is identical).
    stats = x.agg(
        F.min("xv").alias("lo"),
        F.greatest(
            (F.max("xv") - F.min("xv")).cast("double") / (_STUMP_CUTS + 1),
            F.lit(1e-9),
        ).alias("w"),
        F.count("*").alias("n"),
        F.sum("y").alias("pos"),
    )
    cuts = (
        spark.range(1, _STUMP_CUTS + 1)
        .select(F.col("id").alias("cut_no"))
        .crossJoin(F.broadcast(stats))
        .select(
            "cut_no",
            (F.col("lo") + F.round(F.col("cut_no") * F.col("w")))
            .cast("long")
            .alias("threshold"),
            "n",
            "pos",
        )
    )
    # Pinned ≤_STUMP_CUTS-row tally (change-8 waist): the Gini frame
    # feeds both the argmax and the final select, and without the cut
    # each re-derived the broadcast-tally corpus scan.  The totals ride
    # the cuts frame, so no separate tot crossJoin re-scans the corpus.
    split = (
        F.broadcast(cuts)
        .crossJoin(x)
        .groupBy("cut_no")
        .agg(
            F.first("threshold").alias("threshold"),
            F.first("n").alias("n"),
            F.first("pos").alias("pos"),
            F.sum(F.when(F.col("xv") <= F.col("threshold"), 1).otherwise(0)).alias(
                "n_left"
            ),
            F.sum(
                F.when(F.col("xv") <= F.col("threshold"), F.col("y")).otherwise(0)
            ).alias("pos_left"),
        )
        .localCheckpoint(eager=True)
    )
    g0 = split
    d = F.col
    p = d("pos").cast("double") / d("n")
    parent = 1 - p * p - (1 - p) * (1 - p)
    pl = d("pos_left").cast("double") / d("n_left")
    gl = 1 - pl * pl - (1 - pl) * (1 - pl)
    nr = d("n") - d("n_left")
    pr = (d("pos") - d("pos_left")).cast("double") / nr
    gr = 1 - pr * pr - (1 - pr) * (1 - pr)
    child = (d("n_left").cast("double") / d("n")) * gl + (
        nr.cast("double") / d("n")
    ) * gr
    drop = F.when(
        (d("n_left") == 0) | (d("n_left") == d("n")), parent - parent
    ).otherwise(parent - child)
    g = g0.select(
        "cut_no",
        "threshold",
        "n_left",
        nr.alias("n_right"),
        drop.alias("gini_drop"),
    )
    best = g.agg(F.max("gini_drop").alias("mx"))
    return (
        g.crossJoin(F.broadcast(best))
        .select(
            "cut_no",
            "threshold",
            "n_left",
            "n_right",
            F.round(1_000_000 * F.col("gini_drop"))
            .cast("long")
            .alias("gini_drop_micros"),
            (F.col("gini_drop") == F.col("mx")).alias("is_best"),
        )
        .orderBy("cut_no")
    )
