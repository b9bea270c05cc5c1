"""Round-5 batch: curation explainability and optimizer-statistics
audits — the layer that makes the engine's decisions inspectable:

- ``curation_decision_log`` — the per-document EXPLAIN of
  ``corpus_clean_pipeline``: every document gets its fate and the
  first rule that sealed it (non_english → low_quality → exact_dup →
  kept), under exactly the pipeline's formulas and precedence, so
  "why was my document dropped?" is one lookup instead of a rerun.
  The kept rows of this log ARE the pipeline's output (pinned by
  test).
- ``equidepth_histogram_stats`` — exact equi-depth (decile) histogram
  boundaries of the lineitem price column — the optimizer statistic
  behind selectivity estimation and the data-profiling cousin of
  ``grouped_percentiles``: exact ranks k = ⌈q·n/10⌉ located by the
  hierarchical cumulative-count pattern, never a global sort.
- ``blocking_cost_audit`` — candidate-pair cost prediction for two
  blocking keys: actual pairs Σc·(c−1)/2 per key (computed from
  GROUP COUNTS — no pair is ever materialized), the uniform-key
  estimate n²/(2·ndv) the textbook estimator would give, their skew
  ratio, and the single hottest key's share — the number that decides
  whether a dedup blocking key will explode before the join runs.

Determinism contracts: the log reuses the pinned round-6 quality /
stop-ratio doubles and the portable 60-bit content hash; histogram
ranks and boundaries are exact integers; blocking costs are exact
int64 pair counts with floor-micros ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.hashing import portable_hash64
from ..operators.text import quality_expr, stopword_ratio
from ..sources.loaders import load_table
from .analytics_queries import QUALITY_MIN
from .extension_queries import _H64, _STOPLIST_SQL
from .pipeline_queries13 import _idiv
from .probes import probe_min_max
from .registry import register

# --- curation decision log ---------------------------------------------------


@register(
    "curation_decision_log",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, text,
                   string_split(text, ' ') AS w,
                   len(list_filter(string_split(text, ' '),
                       t -> t IN ({_STOPLIST_SQL})))::DOUBLE
                       / len(string_split(text, ' ')) AS stop_r,
                   length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                       ::DOUBLE / length(text) AS punct_r
            FROM documents
        ), scored AS (
            SELECT doc_id, stop_r,
                   round(0.4 * least(len(w) / 100.0, 1.0)
                         + 0.3 * stop_r + 0.3 * (1 - punct_r), 6) AS quality,
                   {_H64.format(e='text')} AS h
            FROM t
        ), canon AS (
            SELECT h, min(doc_id) AS keeper FROM scored GROUP BY h
        )
        SELECT s.doc_id,
               CASE WHEN s.stop_r <= 0.05 THEN 'non_english'
                    WHEN s.quality < {QUALITY_MIN} THEN 'low_quality'
                    WHEN s.doc_id <> c.keeper THEN 'exact_dup'
                    ELSE 'kept' END AS reason,
               (s.stop_r > 0.05 AND s.quality >= {QUALITY_MIN}
                AND s.doc_id = c.keeper) AS kept,
               s.quality
        FROM scored s JOIN canon c ON s.h = c.h
        ORDER BY s.doc_id
    """,
    doc=f"""Per-document EXPLAIN of corpus_clean_pipeline: the same
    three rules, same formulas, same precedence (language filter →
    quality ≥ {QUALITY_MIN} → exact-dup canonical-keeper), emitted as
    (doc_id, first-failing-reason, kept, quality) for EVERY document —
    the audit trail a curation platform owes its data suppliers, and
    the frame quality-drift dashboards aggregate.  The kept rows
    reproduce the pipeline's output exactly (pinned by test).
    Determinism: reuses the pinned round-6 quality doubles and the
    portable 60-bit content hash; the canonical keeper is min(doc_id)
    per hash.  Scale shape: identical to the pipeline it explains —
    scan-local scoring plus ONE content-hash groupBy joined back; the
    reason CASE adds zero shuffles.""",
)
def curation_decision_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    # One projection carries stop_r, the content hash AND quality
    # (round-10, session 3): the old shape scanned documents twice and
    # 1:1-self-joined the halves on doc_id.  Persisted because BOTH the
    # canonical-keeper aggregate and the decision join read it — the
    # minhash-pipeline persist pattern; one text-scoring scan total.
    scored = docs.select(
        "doc_id",
        stopword_ratio("text").alias("stop_r"),
        portable_hash64("text").alias("h"),
        quality_expr("text").alias("quality"),
    ).persist()
    canon = scored.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    s = scored.join(canon, "h")
    reason = (
        F.when(F.col("stop_r") <= 0.05, F.lit("non_english"))
        .when(F.col("quality") < QUALITY_MIN, F.lit("low_quality"))
        .when(F.col("doc_id") != F.col("keeper"), F.lit("exact_dup"))
        .otherwise(F.lit("kept"))
    )
    kept = (
        (F.col("stop_r") > 0.05)
        & (F.col("quality") >= QUALITY_MIN)
        & (F.col("doc_id") == F.col("keeper"))
    )
    return s.select(
        "doc_id", reason.alias("reason"), kept.alias("kept"), "quality"
    ).orderBy("doc_id")


# --- equi-depth histogram ------------------------------------------------------

_HIST_BUCKETS = 32
_HIST_DECILES = tuple(range(1, 10))


@register(
    "equidepth_histogram_stats",
    oracle=f"""
        WITH x AS (
            SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
            FROM lineitem
        ), vals AS (
            SELECT v, count(*)::BIGINT AS c FROM x GROUP BY v
        ), cum AS (
            SELECT v,
                   (sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING))
                       ::BIGINT AS cum_end
            FROM vals
        ), nn AS (SELECT (sum(c))::BIGINT AS n FROM vals),
        ks AS (
            SELECT q::BIGINT AS decile,
                   ((q * nn.n + 9) // 10)::BIGINT AS k
            FROM (SELECT unnest(generate_series(1, 9)) AS q), nn
        )
        SELECT ks.decile, ks.k AS k_rank,
               min(cum.v)::BIGINT AS boundary_cents
        FROM ks JOIN cum ON cum.cum_end >= ks.k
        GROUP BY ks.decile, ks.k
        ORDER BY ks.decile
    """,
    doc=f"""Exact equi-depth histogram of the lineitem price column:
    the 9 decile boundaries (the value at exact rank ⌈q·n/10⌉) — the
    optimizer statistic selectivity estimation runs on, built without
    a global sort.  Determinism: ranks are pure integer arithmetic
    and each boundary is min(v : cumulative count ≥ k) over exact
    integer cumulative counts.  Scale shape — the engine story: the
    distinct-value frame gets cumulative counts HIERARCHICALLY
    ({_HIST_BUCKETS} range buckets from a 2-scalar probe, partitioned
    in-bucket running sums, a bounded {_HIST_BUCKETS}-row prefix
    join), then the 9-rank frame broadcasts against it (bounded 9×
    fan-out, declared) — no unpartitioned window, no global sort, at
    any scale.""",
)
def equidepth_histogram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    x = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v")
    )
    # Materialize the distinct-value frame once: the bound probe, the
    # in-bucket window, BOTH sides of the bucket-prefix join and the nn
    # total each re-derived it, so the lineitem scan + grouped count ran
    # 8× (before plan: 8 parquet scans).  One scan after; every
    # downstream frame reads the |distinct v|-row checkpoint.
    vals = x.groupBy("v").agg(F.count("*").alias("c")).localCheckpoint(eager=True)
    lo, hi = probe_min_max(
        vals, "v", query="equidepth_histogram_stats", sf_dir=sf_dir
    )
    width = max((hi - lo) / _HIST_BUCKETS, 1e-9)
    bucket = F.least(
        F.lit(_HIST_BUCKETS - 1),
        F.floor((F.col("v") - F.lit(float(lo))) / F.lit(width)),
    ).alias("bucket")
    vb = vals.select("v", "c", bucket)
    wnd = W.partitionBy("bucket").orderBy("v").rowsBetween(
        W.unboundedPreceding, 0
    )
    within = vb.select("v", "c", "bucket", F.sum("c").over(wnd).alias("cum_in"))
    btot = vb.groupBy("bucket").agg(F.sum("c").alias("bc"))
    a, b = btot.alias("a"), btot.alias("b")
    prefix = (
        a.join(F.broadcast(b), F.col("b.bucket") < F.col("a.bucket"), "left")
        .groupBy(F.col("a.bucket").alias("bucket"))
        .agg(F.coalesce(F.sum("b.bc"), F.lit(0)).alias("pb"))
    )
    cum = within.join(F.broadcast(prefix), "bucket").select(
        "v", (F.col("pb") + F.col("cum_in")).alias("cum_end")
    )
    nn = vals.agg(F.sum("c").alias("n"))
    ks = (
        spark.range(1, 10)
        .select(F.col("id").alias("decile"))
        .crossJoin(F.broadcast(nn))
        .select(
            "decile",
            _idiv(F.col("decile") * F.col("n") + 9, F.lit(10)).alias("k"),
        )
    )
    return (
        cum.join(F.broadcast(ks), F.col("cum_end") >= F.col("k"))
        .groupBy("decile", F.col("k").alias("k_rank"))
        .agg(F.min("v").alias("boundary_cents"))
        .orderBy("decile")
    )


# --- blocking cost audit --------------------------------------------------------


@register(
    "blocking_cost_audit",
    oracle="""
        WITH keys AS (
            SELECT 'o_custkey' AS blocking_key,
                   o_custkey::VARCHAR AS k
            FROM orders
            UNION ALL
            SELECT 'o_orderdate', o_orderdate::VARCHAR FROM orders
        ), grp AS (
            SELECT blocking_key, k, count(*)::BIGINT AS c
            FROM keys GROUP BY blocking_key, k
        ), agg AS (
            SELECT blocking_key,
                   (sum(c))::BIGINT AS n_rows,
                   count(*)::BIGINT AS ndv,
                   (sum((c * (c - 1)) // 2))::BIGINT AS actual_pairs,
                   max(c)::BIGINT AS top_key_size
            FROM grp GROUP BY blocking_key
        )
        SELECT blocking_key, n_rows, ndv, actual_pairs,
               ((n_rows * n_rows) // (2 * ndv)) AS est_uniform_pairs,
               CASE WHEN actual_pairs > 0 THEN
                   ((actual_pairs * 1000000)
                    // ((n_rows * n_rows) // (2 * ndv)))
               END AS skew_ratio_micros,
               top_key_size,
               ((top_key_size * (top_key_size - 1)) // 2) AS top_key_pairs
        FROM agg
        ORDER BY blocking_key
    """,
    doc="""Candidate-pair cost audit for two blocking-key choices
    (customer key vs order date): the ACTUAL pair count Σ c·(c−1)/2
    computed from group counts alone — no pair is ever materialized —
    against the uniform-key textbook estimate n²/(2·ndv), their ratio
    (the skew penalty an optimizer's uniformity assumption hides), and
    the hottest key's own pair load.  This is the number that predicts
    whether a dedup/entity-resolution blocking key explodes BEFORE the
    self-join runs — the planning complement to key_skew_audit's
    runtime view and fuzzy_match_blocked's SymSpell blocking.
    Determinism: pure integer arithmetic end-to-end (floor-micros
    ratio).  Scale shape: one grouped count per key choice (keyed
    shuffles with partial aggregation), then 1-row arithmetic —
    auditing another candidate key adds one UNION branch, not a join.
    (Pair counts exceed int64 past ~3e9 rows per key; the decimal(38)
    variant is the same plan.)""",
)
def blocking_cost_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    keys = orders.select(
        F.lit("o_custkey").alias("blocking_key"),
        F.col("o_custkey").cast("string").alias("k"),
    ).unionAll(
        orders.select(
            F.lit("o_orderdate").alias("blocking_key"),
            F.col("o_orderdate").cast("string").alias("k"),
        )
    )
    grp = keys.groupBy("blocking_key", "k").agg(F.count("*").alias("c"))
    agg = grp.groupBy("blocking_key").agg(
        F.sum("c").alias("n_rows"),
        F.count("*").alias("ndv"),
        F.sum(_idiv(F.col("c") * (F.col("c") - 1), F.lit(2))).alias(
            "actual_pairs"
        ),
        F.max("c").alias("top_key_size"),
    )
    est = _idiv(F.col("n_rows") * F.col("n_rows"), 2 * F.col("ndv"))
    return agg.select(
        "blocking_key",
        "n_rows",
        "ndv",
        "actual_pairs",
        est.alias("est_uniform_pairs"),
        F.when(
            F.col("actual_pairs") > 0,
            _idiv(F.col("actual_pairs") * 1_000_000, est),
        ).alias("skew_ratio_micros"),
        "top_key_size",
        _idiv(F.col("top_key_size") * (F.col("top_key_size") - 1), F.lit(2)).alias(
            "top_key_pairs"
        ),
    ).orderBy("blocking_key")
