"""Round-5 batch: graph partition quality, optimizer self-use, and
embedding-space supervised evaluation:

- ``modularity_brand_copurchase`` — Newman–Girvan modularity ('04) of
  the part-BRAND partition over the 1995 co-purchase graph: do
  same-brand parts co-sell more than a degree-preserving random graph
  would predict?  The partition-quality scalar behind every community
  detection result (LPA's labels get judged by exactly this number),
  computed here for a KNOWN partition so the oracle needs no
  iteration.
- ``selectivity_estimate_audit`` — the optimizer loop closed: build a
  10-band histogram of the price column, estimate three range
  predicates' cardinalities by band interpolation (exactly how a
  cost-based optimizer uses statistics), and report each estimate
  against the TRUE count — the audit that says whether the statistic
  is good enough to trust for join planning.
- ``nearest_centroid_accuracy`` — nearest-class-centroid
  classification of held-out embeddings (Rocchio): centroids fit on
  the train third, accuracy measured on the rest against the
  majority-class baseline — the 5-minute answer to "do these
  embeddings separate the labels at all?", the supervised companion
  to ``embedding_anisotropy_audit`` and ``conformal_coverage_audit``.

Determinism contracts: modularity reduces to three exact integers
(intra-community edges, Σ degree², edge count) and one fixed double
expression; selectivity estimates sum per-band micro-row integers
(each band's interpolated contribution rounds to micros BEFORE the
cross-band sum); centroid distances are exact int64 with integer
argmin tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table
from .pipeline_queries5 import _COPURCHASE_EDGE_CTES, _copurchase_edges
from .pipeline_queries13 import _idiv
from .registry import register

# --- modularity -----------------------------------------------------------------


@register(
    "modularity_brand_copurchase",
    oracle=f"""
        WITH {_COPURCHASE_EDGE_CTES}, lbl AS (
            SELECT p_partkey AS pk, p_brand AS c FROM part
        ), deg AS (
            SELECT x AS vertex, count(*)::BIGINT AS d
            FROM (SELECT u AS x FROM edges UNION ALL SELECT v FROM edges)
            GROUP BY x
        ), dc AS (
            SELECT lbl.c, (sum(deg.d))::BIGINT AS d_c
            FROM deg JOIN lbl ON deg.vertex = lbl.pk GROUP BY lbl.c
        ), agg AS (
            SELECT (SELECT count(*)::BIGINT FROM edges) AS m,
                   (SELECT count(*)::BIGINT FROM (
                        SELECT 1 FROM edges e
                        JOIN lbl a ON e.u = a.pk
                        JOIN lbl b ON e.v = b.pk
                        WHERE a.c = b.c)) AS intra,
                   (SELECT (sum(d_c * d_c))::BIGINT FROM dc) AS sum_dc2,
                   (SELECT count(*)::BIGINT FROM dc) AS n_comm,
                   (SELECT count(*)::BIGINT FROM deg) AS n_vertices
        )
        SELECT n_vertices, m AS n_edges, n_comm AS n_communities,
               ((intra * 1000000) // m) AS intra_share_micros,
               round(intra::DOUBLE / m
                     - sum_dc2::DOUBLE / (4.0 * m * m), 6) AS modularity
        FROM agg
    """,
    doc="""Newman–Girvan modularity of the part-brand partition over
    the 1995 co-purchase graph: Q = intra/m − Σ_c d_c²/(4m²) — above 0
    means same-brand parts co-sell more than a degree-preserving null
    model predicts (shard dedup/recommendation by brand); near 0 means
    the partition is noise.  This is the scalar every community
    detection (LPA, CC clusters) is judged by, computed on a KNOWN
    partition so both engines agree without iteration.  Determinism:
    intra-community edge count, per-community degree sums, and m are
    exact int64; Q is one fixed double expression.  Scale shape:
    reuses the checkpointed co-purchase edge list, one degree
    aggregate, two broadcast label joins (part dim), a |brands|-row
    rollup — no new heavy shuffle beyond the shared edge build.""",
)
def modularity_brand_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    lbl = F.broadcast(
        part.select(F.col("p_partkey").alias("pk"), F.col("p_brand").alias("c"))
    )
    edges = _copurchase_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("u").alias("vertex"))
        .unionAll(edges.select(F.col("v").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count("*").alias("d"))
    )
    dc = (
        deg.join(lbl, deg.vertex == lbl.pk)
        .groupBy("c")
        .agg(F.sum("d").alias("d_c"))
    )
    la = lbl.select(F.col("pk").alias("pa"), F.col("c").alias("ca"))
    lb = lbl.select(F.col("pk").alias("pb"), F.col("c").alias("cb"))
    intra = (
        edges.join(F.broadcast(la), edges.u == F.col("pa"))
        .join(F.broadcast(lb), edges.v == F.col("pb"))
        .where(F.col("ca") == F.col("cb"))
        .agg(F.count("*").alias("intra"))
    )
    m = edges.agg(F.count("*").alias("m"))
    nv = deg.agg(F.count("*").alias("n_vertices"))
    rollup = dc.agg(
        F.sum(F.col("d_c") * F.col("d_c")).alias("sum_dc2"),
        F.count("*").alias("n_comm"),
    )
    d = F.col
    return (
        m.crossJoin(F.broadcast(intra))
        .crossJoin(F.broadcast(rollup))
        .crossJoin(F.broadcast(nv))
        .select(
            "n_vertices",
            d("m").alias("n_edges"),
            d("n_comm").alias("n_communities"),
            _idiv(d("intra") * 1_000_000, d("m")).alias("intra_share_micros"),
            F.round(
                d("intra").cast("double") / d("m")
                - d("sum_dc2").cast("double") / (F.lit(4.0) * d("m") * d("m")),
                6,
            ).alias("modularity"),
        )
    )


# --- selectivity audit -------------------------------------------------------------

_SEL_BANDS = 10
# Range predicates on l_extendedprice (dollars): [lo, hi) half-open.
_SEL_PREDICATES: tuple[tuple[str, int, int], ...] = (
    ("low_tail", 0, 10_000),
    ("mid_band", 30_000, 60_000),
    ("high_tail", 90_000, 2_000_000),
)


def _sel_oracle() -> str:
    pred_rows = ", ".join(
        f"('{lbl}', {lo}, {hi})" for lbl, lo, hi in _SEL_PREDICATES
    )
    return f"""
        WITH x AS (
            SELECT CAST(round(l_extendedprice) AS BIGINT) AS v FROM lineitem
        ), mm AS (
            SELECT min(v)::BIGINT AS lo,
                   greatest((max(v) - min(v))::DOUBLE / {_SEL_BANDS}, 1e-9)
                       AS w
            FROM x
        ), bands AS (
            SELECT least({_SEL_BANDS - 1},
                         floor((x.v - mm.lo) / mm.w))::BIGINT AS band,
                   count(*)::BIGINT AS n
            FROM x, mm GROUP BY 1
        ), preds AS (
            SELECT * FROM (VALUES {pred_rows}) t(pred, plo, phi)
        ), contrib AS (
            SELECT p.pred, any_value(p.plo) AS plo, any_value(p.phi) AS phi,
                   (sum(round(1000000 * b.n * greatest(0.0, least(
                        (least(p.phi::DOUBLE, mm.lo + (b.band + 1) * mm.w)
                         - greatest(p.plo::DOUBLE, mm.lo + b.band * mm.w))
                        / mm.w, 1.0)))))::BIGINT AS est_micro_rows
            FROM preds p CROSS JOIN bands b CROSS JOIN mm
            GROUP BY p.pred
        ), actual AS (
            SELECT p.pred,
                   (sum(CASE WHEN x.v >= p.plo AND x.v < p.phi
                        THEN 1 ELSE 0 END))::BIGINT AS actual_rows
            FROM preds p CROSS JOIN x GROUP BY p.pred
        )
        SELECT c.pred, c.plo AS lo_dollars, c.phi AS hi_dollars,
               (c.est_micro_rows // 1000000) AS est_rows,
               a.actual_rows,
               CASE WHEN a.actual_rows > 0 THEN
                   (abs(c.est_micro_rows - a.actual_rows * 1000000)
                    // a.actual_rows)
               END AS rel_err_micros
        FROM contrib c JOIN actual a ON c.pred = a.pred
        ORDER BY c.pred
    """


@register(
    "selectivity_estimate_audit",
    oracle=_sel_oracle(),
    doc=f"""The optimizer-statistics loop, closed: a {_SEL_BANDS}-band
    equi-width histogram of line price is built, three range
    predicates are estimated by band interpolation (uniform-within-
    band — exactly the textbook cost-based-optimizer selectivity
    model), and each estimate meets the TRUE count with its relative
    error — the audit that decides whether the statistic is
    trustworthy for join planning, and the companion that gives
    equidepth_histogram_stats its purpose.  Determinism: band edges
    derive from exact integer min/max; each band's interpolated
    contribution rounds to integer MICRO-ROWS before the cross-band
    sum (no double accumulation); actuals are exact counts.  Scale
    shape: one banded count over the fact table, one predicate-tally
    pass (both single scans with bounded fan-out, declared), then
    {_SEL_BANDS}·|preds| bounded arithmetic.""",
)
def selectivity_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    x = li.select(F.round("l_extendedprice").cast("long").alias("v"))
    mm = x.agg(
        F.min("v").alias("lo"),
        F.greatest(
            (F.max("v") - F.min("v")).cast("double") / _SEL_BANDS, F.lit(1e-9)
        ).alias("w"),
    )
    # ONE banded tally pass carries the histogram counts, the (lo, w)
    # scalars AND the per-predicate exact counts (round-10, session 3):
    # the old shape scanned the fact column three times (min/max probe
    # duplicated under both consumers, banded counts, per-predicate
    # actuals).  The per-band conditional sums add up to the exact
    # per-predicate counts (Σ_band Σ_rows-in-band [pred] = Σ_rows
    # [pred], exact integers), and the pinned ≤_SEL_BANDS-row tally
    # feeds both the estimator and the actuals — 2 scans total, then
    # bounded arithmetic.
    bands = (
        x.crossJoin(F.broadcast(mm))
        .groupBy(
            F.least(
                F.lit(_SEL_BANDS - 1),
                F.floor((F.col("v") - F.col("lo")) / F.col("w")),
            )
            .cast("long")
            .alias("band")
        )
        .agg(
            F.count("*").alias("n"),
            F.first("lo").alias("lo"),
            F.first("w").alias("w"),
            *[
                F.sum(
                    F.when(
                        (F.col("v") >= F.lit(plo)) & (F.col("v") < F.lit(phi)),
                        1,
                    ).otherwise(0)
                ).alias(f"_a{i}")
                for i, (_, plo, phi) in enumerate(_SEL_PREDICATES)
            ],
        )
        .localCheckpoint(eager=True)
    )
    preds = spark.createDataFrame(
        list(_SEL_PREDICATES), "pred string, plo long, phi long"
    )
    band_lo = F.col("lo") + F.col("band") * F.col("w")
    band_hi = F.col("lo") + (F.col("band") + 1) * F.col("w")
    frac = F.greatest(
        F.lit(0.0),
        F.least(
            (
                F.least(F.col("phi").cast("double"), band_hi)
                - F.greatest(F.col("plo").cast("double"), band_lo)
            )
            / F.col("w"),
            F.lit(1.0),
        ),
    )
    contrib = (
        F.broadcast(preds)
        .crossJoin(bands)
        .groupBy("pred")
        .agg(
            F.first("plo").alias("plo"),
            F.first("phi").alias("phi"),
            F.sum(F.round(1_000_000 * F.col("n") * frac).cast("long")).alias(
                "est_micro_rows"
            ),
        )
    )
    actual = bands.agg(
        *[
            F.sum(F.col(f"_a{i}")).cast("long").alias(f"_a{i}")
            for i in range(len(_SEL_PREDICATES))
        ]
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lbl).alias("pred"),
                        F.col(f"_a{i}").alias("actual_rows"),
                    )
                    for i, (lbl, _, _) in enumerate(_SEL_PREDICATES)
                ]
            )
        ).alias("s")
    ).select("s.*")
    return (
        contrib.join(actual, "pred")
        .select(
            "pred",
            F.col("plo").alias("lo_dollars"),
            F.col("phi").alias("hi_dollars"),
            _idiv(F.col("est_micro_rows"), F.lit(1_000_000)).alias("est_rows"),
            "actual_rows",
            F.when(
                F.col("actual_rows") > 0,
                _idiv(
                    F.abs(
                        F.col("est_micro_rows")
                        - F.col("actual_rows") * 1_000_000
                    ),
                    F.col("actual_rows"),
                ),
            ).alias("rel_err_micros"),
        )
        .orderBy("pred")
    )


# --- nearest-centroid evaluation ------------------------------------------------------


@register(
    "nearest_centroid_accuracy",
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
            SELECT label AS cand, i,
                   round((sum(v))::DOUBLE / count(*))::BIGINT AS c
            FROM m WHERE part = 0 GROUP BY label, i
        ), dist AS (
            SELECT m.vec_id, any_value(m.label) AS true_label, cent.cand,
                   (sum((m.v - cent.c) * (m.v - cent.c)))::BIGINT AS d2
            FROM m JOIN cent ON m.i = cent.i
            WHERE m.part <> 0
            GROUP BY m.vec_id, cent.cand
        ), best AS (
            SELECT d.vec_id, any_value(d.true_label) AS true_label,
                   min(d.cand) AS pred_label
            FROM dist d
            JOIN (SELECT vec_id, min(d2) AS md FROM dist GROUP BY vec_id) mn
              ON d.vec_id = mn.vec_id AND d.d2 = mn.md
            GROUP BY d.vec_id
        ), maj AS (
            SELECT max(cnt)::BIGINT AS majority
            FROM (SELECT count(*)::BIGINT AS cnt
                  FROM (SELECT DISTINCT vec_id, true_label FROM dist)
                  GROUP BY true_label)
        )
        SELECT count(*)::BIGINT AS n_eval,
               (sum(CASE WHEN true_label = pred_label THEN 1 ELSE 0 END))
                   ::BIGINT AS n_correct,
               ((sum(CASE WHEN true_label = pred_label THEN 1 ELSE 0 END)
                 * 1000000) // count(*))::BIGINT AS accuracy_micros,
               ((maj.majority * 1000000) // count(*))
                   AS majority_baseline_micros
        FROM best, maj
        GROUP BY maj.majority
    """,
    doc="""Nearest-class-centroid (Rocchio) classification of held-out
    embeddings: 10 class centroids fit on the vec_id%3=0 third, every
    other vector is assigned its squared-distance argmin centroid, and
    accuracy is reported against the majority-class baseline — the
    cheapest supervised answer to "do these embeddings separate the
    labels?", and the accuracy twin of conformal_coverage_audit's
    coverage view over the same geometry.  Determinism: centroids are
    milli-int rounded means, distances exact int64, argmin ties break
    to the smallest label (min-join), shares are floor micros.  Scale
    shape: one explode pass, one broadcast centroid join (|labels|·64
    rows), two grouped aggregates — the distance fan-out is
    |labels|-bounded per vector and shuffles only (vec, cand)
    partials.""",
)
def nearest_centroid_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        .groupBy(F.col("label").alias("cand"), "i")
        .agg(
            F.round(F.sum("v").cast("double") / F.count("*"))
            .cast("long")
            .alias("c")
        )
    )
    # Pinned |eval vectors| × |labels| distance frame (change-8 waist):
    # the per-vector min, the argmin join and the majority baseline all
    # read it, and without the cut each re-derived the dimension
    # explode + centroid join + per-pair aggregate.
    dist = (
        m.where(F.col("part") != 0)
        .join(F.broadcast(cent), "i")
        .groupBy("vec_id", "cand")
        .agg(
            F.first("label").alias("true_label"),
            F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))).alias(
                "d2"
            ),
        )
        .localCheckpoint(eager=True)
    )
    mn = dist.groupBy("vec_id").agg(F.min("d2").alias("md"))
    best = (
        dist.join(mn, "vec_id")
        .where(F.col("d2") == F.col("md"))
        .groupBy("vec_id")
        .agg(
            F.first("true_label").alias("true_label"),
            F.min("cand").alias("pred_label"),
        )
    )
    maj = (
        dist.select("vec_id", "true_label")
        .distinct()
        .groupBy("true_label")
        .agg(F.count("*").alias("cnt"))
        .agg(F.max("cnt").alias("majority"))
    )
    correct = F.when(F.col("true_label") == F.col("pred_label"), 1).otherwise(0)
    return best.crossJoin(F.broadcast(maj)).agg(
        F.count("*").alias("n_eval"),
        F.sum(correct).alias("n_correct"),
        _idiv(F.sum(correct) * 1_000_000, F.count("*")).alias("accuracy_micros"),
        _idiv(F.first("majority") * 1_000_000, F.count("*")).alias(
            "majority_baseline_micros"
        ),
    )
