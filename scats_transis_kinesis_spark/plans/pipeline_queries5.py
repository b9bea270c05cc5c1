"""Training-data pipeline queries, round 4: decayed traffic counters,
distributed triangle counting, per-document token entropy, reciprocal-
rank fusion of lexical + embedding retrieval, and a Kneser-Ney bigram
language model.

Same contract discipline as the sibling modules: declarative plans,
partitioned-only shuffles, exact DuckDB oracles, FP-accumulating sums
carried as per-term integer micros (round BEFORE the sum, so the
cross-engine total is exact integer math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.loaders import load_table
from .pipeline_queries4 import bm25_score_frame
from .registry import register

# Decayed-counter parameters: half-life decay per hour, bounded horizon.
# The 1/2 decay base is EXACT in binary floating point (the weight is a
# plain power-of-two scaling), so the per-term micro rounding is
# bit-identical across engines — no libm pow() in the contract.
# Single source of truth lives beside the streaming twin so the pinned
# batch/stream parity contract cannot drift on an edit to one side.
from ..streaming.stateful import DECAY_HORIZON  # noqa: E402

# Reciprocal-rank-fusion parameters (Cormack et al.: 1/(K + rank)).
RRF_K = 60
RRF_POOL = 50  # depth of each input ranking
RRF_TOPK = 10
RRF_QUERY_VEC_ID = 0  # embedding row used as the dense query

# Kneser-Ney discount (the standard 0.75) and report size.
KN_DISCOUNT = 0.75
KN_TOPK = 20

# Shared CTE text for the 1995 co-purchase graph, used by the triangle,
# community and association-rule oracles (ONE definition of the date
# window and basket/edge canonicalization — the Spark twin is
# _copurchase_lines/_copurchase_edges below).
_COPURCHASE_LINES_CTE = """lines AS (
            SELECT DISTINCT l.l_orderkey AS ok, l.l_partkey AS pk
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderdate >= DATE '1995-01-01'
              AND o.o_orderdate < DATE '1996-01-01'
        )"""
_COPURCHASE_EDGE_CTES = f"""{_COPURCHASE_LINES_CTE}, edges AS (
            SELECT DISTINCT a.pk AS u, b.pk AS v
            FROM lines a JOIN lines b ON a.ok = b.ok AND a.pk < b.pk
        )"""


@register(
    "decayed_hourly_traffic",
    oracle=f"""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   count(*)::BIGINT AS c
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        ), terms AS (
            SELECT event_type, h + to_hours(lag) AS target_h,
                   round(c * 1e6 / (1::BIGINT << lag))::BIGINT AS term_micros
            FROM hourly, (SELECT unnest(generate_series(0, {DECAY_HORIZON - 1}))
                          AS lag) l
        ), decayed AS (
            SELECT event_type, target_h AS h,
                   sum(term_micros)::BIGINT AS decayed_micros
            FROM terms GROUP BY event_type, target_h
        )
        SELECT d.event_type, d.h, hr.c AS n_events, d.decayed_micros
        FROM decayed d JOIN hourly hr
          ON d.event_type = hr.event_type AND d.h = hr.h
    """,
    doc=f"""Exponentially decayed hourly traffic counter (half-life decay
    per calendar hour, {DECAY_HORIZON}-hour horizon) — the streaming-
    analytics primitive behind trending/rate-limiting scores, evaluated
    at every observed hour.  Scale shape: the recursive EWMA form is
    inherently sequential per key; this is the parallel reformulation —
    each hourly count fans out to the ≤{DECAY_HORIZON} future hours it
    influences via ``explode(sequence(...))`` (a generator, not a
    join), then one keyed re-aggregation — two shuffles keyed by
    (event_type, hour), embarrassingly parallel.  The decay base 1/2
    makes every weight an exact power-of-two scaling, so per-term micro
    rounding is bit-identical across engines (no libm ``pow`` in the
    contract).""",
)
def decayed_hourly_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("c"))
    terms = hourly.select(
        "event_type",
        "h",
        "c",
        F.explode(F.sequence(F.lit(0), F.lit(DECAY_HORIZON - 1))).alias("lag"),
    ).select(
        "event_type",
        F.timestamp_add("HOUR", F.col("lag"), F.col("h")).alias("target_h"),
        F.round(F.col("c") * 1e6 / F.expr("shiftleft(CAST(1 AS BIGINT), lag)"))
        .cast("long")
        .alias("term_micros"),
    )
    decayed = terms.groupBy("event_type", F.col("target_h").alias("h")).agg(
        F.sum("term_micros").cast("long").alias("decayed_micros")
    )
    return decayed.join(hourly, ["event_type", "h"]).select(
        "event_type", "h", F.col("c").alias("n_events"), "decayed_micros"
    )


@register(
    "triangle_count_copurchase",
    oracle=f"""
        WITH {_COPURCHASE_EDGE_CTES}, deg AS (
            SELECT x AS vertex, count(*)::BIGINT AS d
            FROM (SELECT u AS x FROM edges UNION ALL SELECT v FROM edges)
            GROUP BY x
        ), oriented AS (
            SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END
                       AS src,
                   CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END
                       AS dst,
                   CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END
                       AS ddst
            FROM edges e
            JOIN deg du ON e.u = du.vertex
            JOIN deg dv ON e.v = dv.vertex
        ), wedges AS (
            SELECT o1.dst AS b, o2.dst AS c
            FROM oriented o1 JOIN oriented o2
              ON o1.src = o2.src
             AND (o1.ddst, o1.dst) < (o2.ddst, o2.dst)
        ), tri AS (
            SELECT count(*)::BIGINT AS n_triangles
            FROM wedges w JOIN oriented o ON w.b = o.src AND w.c = o.dst
        )
        SELECT (SELECT count(*)::BIGINT FROM deg) AS n_vertices,
               (SELECT count(*)::BIGINT FROM edges) AS n_edges,
               n_triangles
        FROM tri
    """,
    doc="""Distributed triangle counting over the 1995 co-purchase graph
    (parts are vertices; an edge joins two parts appearing in the same
    order) — the standard graph-health metric for recommender /
    link-analysis corpora.  Uses the degree-orientation algorithm
    (Cohen; Suri & Vassilvitskii's MR "last reducer" fix): every edge
    is directed from its lower-(degree, id) endpoint to the higher, so
    a vertex's out-degree is bounded by ~sqrt(|E|) regardless of how
    skewed the raw degree distribution is — the hub that would
    otherwise emit deg² wedge candidates emits almost none.  Wedge
    generation is an equi-join on the wedge center, closure is an
    equi-join on the (b, c) pair; no cartesian anywhere.  Each triangle
    is counted exactly once (its unique cyclic orientation).""",
)
def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import triangle_count

    return triangle_count(_copurchase_edges(spark, sf_dir))


@register(
    "token_entropy_quality",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term,
                   len(string_split(lower(text), ' ')) AS dl
            FROM documents
        ), tf AS (
            SELECT doc_id, dl, term, count(*)::BIGINT AS tf
            FROM tok GROUP BY doc_id, dl, term
        )
        SELECT doc_id, dl,
               count(*)::BIGINT AS n_distinct_tokens,
               sum(round(-(tf::DOUBLE / dl) * ln(tf::DOUBLE / dl) * 1e6))::BIGINT
                   AS entropy_micros
        FROM tf GROUP BY doc_id, dl
    """,
    doc="""Per-document Shannon entropy of the unigram token
    distribution — the information-density quality signal (low entropy
    = repetitive/templated text, a standard pre-training filter next to
    the repetition-ratio heuristics).  One tokenize-explode, one
    (doc, term) grouped count carrying the document length, one
    per-document re-aggregation — two keyed shuffles, fully
    partial-aggregated, no windows.  Each term's −p·ln p contribution
    rounds to integer micros before the sum (the integer-micro
    contract), so cross-engine totals are exact integer math.""",
)
def token_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    w = F.split(F.lower("text"), " ")
    tok = docs.select(
        "doc_id", F.size(w).alias("dl"), F.explode(w).alias("term")
    )
    tf = tok.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))
    p = F.col("tf").cast("double") / F.col("dl")
    term_micros = F.round(-p * F.log(p) * 1e6)
    return tf.groupBy("doc_id", "dl").agg(
        F.count("*").alias("n_distinct_tokens"),
        F.sum(term_micros).cast("long").alias("entropy_micros"),
    )


@register(
    "rrf_fusion_topk",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, string_split(text, ' ') AS w,
                   len(string_split(text, ' ')) AS dl
            FROM documents
        ), stats AS (
            SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base
        ), tf AS (
            SELECT doc_id, dl, tok, count(*)::DOUBLE AS tf
            FROM (SELECT doc_id, dl, unnest(w) AS tok FROM base)
            WHERE tok IN ('spark', 'window', 'stream')
            GROUP BY doc_id, dl, tok
        ), df AS (
            SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok
        ), bm25 AS (
            SELECT doc_id, sum(round(
                       ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1)
                       * t.tf * (1.2 + 1)
                       / (t.tf + 1.2 * (1 - 0.75 + 0.75 * t.dl / s.avgdl))
                       * 1e6))::BIGINT AS score_micros
            FROM tf t JOIN df d USING (tok) CROSS JOIN stats s
            GROUP BY doc_id
        ), qvec AS (
            SELECT embedding::DOUBLE[] AS q FROM embeddings
            WHERE vec_id = {RRF_QUERY_VEC_ID}
        ), cos AS (
            SELECT vec_id AS doc_id,
                   round(list_dot_product(embedding::DOUBLE[], q)
                         / (sqrt(list_dot_product(embedding::DOUBLE[],
                                                  embedding::DOUBLE[]))
                            * sqrt(list_dot_product(q, q))) * 1e6)::BIGINT
                       AS score_micros
            FROM embeddings CROSS JOIN qvec
            WHERE vec_id <> {RRF_QUERY_VEC_ID}
        ), pooled AS (
            SELECT 'bm25' AS ranking, doc_id, score_micros FROM bm25
            UNION ALL
            SELECT 'cosine' AS ranking, doc_id, score_micros FROM cos
        ), ranked AS (
            SELECT ranking, doc_id,
                   row_number() OVER (PARTITION BY ranking
                                      ORDER BY score_micros DESC, doc_id)
                       AS rnk
            FROM pooled
        )
        SELECT doc_id,
               count(*)::BIGINT AS n_rankings,
               sum(round(1e6 / ({RRF_K} + rnk)))::BIGINT AS rrf_micros
        FROM ranked WHERE rnk <= {RRF_POOL}
        GROUP BY doc_id
        ORDER BY rrf_micros DESC, doc_id LIMIT {RRF_TOPK}
    """,
    doc=f"""Reciprocal-rank fusion (Cormack et al.) of the lexical BM25
    ranking and the dense embedding-cosine ranking — the standard
    hybrid-retrieval combiner (score = Σ 1/({RRF_K}+rank) over the two
    top-{RRF_POOL} pools).  Scale shape: both rankings are bounded
    pools; the rank assignment is ONE window partitioned by ranking
    source (never unpartitioned — each ranking is its own partition),
    fusion is a keyed sum, final top-{RRF_TOPK} is ORDER BY + LIMIT
    (TakeOrderedAndProject).  The dense side broadcasts the 1-row query
    vector (bounded BNL, allowlisted); ranks are integers so the RRF
    terms round to micros deterministically.""",
)
def rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    bm25 = bm25_score_frame(docs).select(
        F.lit("bm25").alias("ranking"), "doc_id", "score_micros"
    )
    from ..operators.similarity import cosine

    q = emb.where(F.col("vec_id") == RRF_QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec")
    )
    cos = (
        emb.where(F.col("vec_id") != RRF_QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            F.lit("cosine").alias("ranking"),
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("embedding"), F.col("qvec")) * 1e6)
            .cast("long")
            .alias("score_micros"),
        )
    )
    pooled = bm25.unionAll(cos)
    rnk = F.row_number().over(
        Window.partitionBy("ranking").orderBy(
            F.desc("score_micros"), F.col("doc_id")
        )
    )
    ranked = pooled.select("ranking", "doc_id", rnk.alias("rnk")).where(
        F.col("rnk") <= RRF_POOL
    )
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_rankings"),
            F.sum(F.round(1e6 / (RRF_K + F.col("rnk"))))
            .cast("long")
            .alias("rrf_micros"),
        )
        .orderBy(F.desc("rrf_micros"), "doc_id")
        .limit(RRF_TOPK)
    )


@register(
    "kneser_ney_bigram_lm",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, string_split(lower(text), ' ') AS w
            FROM documents
        ), bigrams AS (
            SELECT p[1] AS w1, p[2] AS w2
            FROM (
                SELECT unnest(list_transform(
                           generate_series(1, len(w) - 1),
                           i -> [w[i], w[i + 1]])) AS p
                FROM base WHERE len(w) >= 2
            )
        ), bc AS (
            SELECT w1, w2, count(*)::BIGINT AS c FROM bigrams GROUP BY w1, w2
        ), ctx AS (
            SELECT w1, sum(c)::BIGINT AS c1, count(*)::BIGINT AS n1_fwd
            FROM bc GROUP BY w1
        ), cont AS (
            SELECT w2, count(*)::BIGINT AS n1_bwd FROM bc GROUP BY w2
        ), btot AS (
            SELECT count(*)::BIGINT AS b_types FROM bc
        ), top AS (
            SELECT w1, w2, c FROM bc
            ORDER BY c DESC, w1, w2 LIMIT {KN_TOPK}
        )
        SELECT t.w1, t.w2, t.c,
               round((greatest(t.c - {KN_DISCOUNT}, 0) / ctx.c1
                      + {KN_DISCOUNT} * ctx.n1_fwd / ctx.c1
                        * cont.n1_bwd / btot.b_types) * 1e6)::BIGINT
                   AS p_kn_micros
        FROM top t
        JOIN ctx USING (w1)
        JOIN cont USING (w2)
        CROSS JOIN btot
        ORDER BY t.c DESC, t.w1, t.w2
    """,
    doc=f"""Interpolated Kneser-Ney bigram language model (discount
    D={KN_DISCOUNT}) over the corpus, reported for the top-{KN_TOPK}
    bigrams: P(w2|w1) = max(c−D,0)/c(w1) + D·N1+(w1·)/c(w1) ·
    N1+(·w2)/|bigram types| — the smoothing used by every n-gram LM
    toolkit (KenLM/SRILM) and the perplexity-filter counterpart to
    unigram_perplexity_score.  Scale shape: bigram extraction is an
    array zip + explode (no self-join of the token stream); all model
    statistics are grouped counts over the bigram-count frame; the
    top-{KN_TOPK} report is TakeOrderedAndProject, then the tiny
    report frame BROADCASTS into the statistics joins (the corpus-scale
    frames are never re-shuffled for the report); the 1-row bigram-type
    total is a bounded broadcast (allowlisted).  All inputs to the
    probability are integer counts, one rounding at the end.""",
)
def kneser_ney_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    w = F.split(F.lower("text"), " ")
    base = docs.select(w.alias("w")).where(F.size("w") >= 2)
    pairs = base.select(
        F.explode(
            F.arrays_zip(
                F.expr("slice(w, 1, size(w) - 1)").alias("w1"),
                F.expr("slice(w, 2, size(w) - 1)").alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bc = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    ctx = bc.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count("*").alias("n1_fwd")
    )
    cont = bc.groupBy("w2").agg(F.count("*").alias("n1_bwd"))
    btot = bc.agg(F.count("*").alias("b_types"))
    top = bc.orderBy(F.desc("c"), "w1", "w2").limit(KN_TOPK)
    p_kn = (
        F.greatest(F.col("c") - KN_DISCOUNT, F.lit(0.0)) / F.col("c1")
        + KN_DISCOUNT
        * F.col("n1_fwd")
        / F.col("c1")
        * F.col("n1_bwd")
        / F.col("b_types")
    )
    return (
        F.broadcast(top)
        .join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(btot))
        .select(
            "w1",
            "w2",
            "c",
            F.round(p_kn * 1e6).cast("long").alias("p_kn_micros"),
        )
        .orderBy(F.desc("c"), "w1", "w2")
    )


PATH_TOPK = 10
LPA_ROUNDS = 2


@register(
    "event_path_trigrams",
    oracle=f"""
        WITH seq AS (
            SELECT event_type AS e1,
                   lead(event_type, 1) OVER w AS e2,
                   lead(event_type, 2) OVER w AS e3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT e1 || '>' || e2 || '>' || e3 AS path,
               count(*)::BIGINT AS n_paths
        FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        GROUP BY e1 || '>' || e2 || '>' || e3
        ORDER BY n_paths DESC, path LIMIT {PATH_TOPK}
    """,
    doc=f"""Sequential path mining: the top-{PATH_TOPK} most common
    3-step event-type paths across user journeys (the product-analytics
    "behavior flow" report; the k-step generalization of the 1-step
    event_transition_matrix).  Trigram extraction is two ``lead``s over
    ONE window partitioned by user (per-user state never leaves its
    partition; ties broken by event_id so the sequence is
    deterministic); counting is a grouped aggregation on the path
    string; the report is ORDER BY + LIMIT (TakeOrderedAndProject).""",
)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        seq.select(F.concat_ws(">", "e1", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("n_paths"))
        .orderBy(F.desc("n_paths"), "path")
        .limit(PATH_TOPK)
    )


def _copurchase_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 1995 ``(order, part)`` basket rows — the shared input
    behind the co-purchase graph and the market-basket queries.
    Eagerly checkpointed: every consumer reads it at least twice (both
    sides of a within-basket self-join)."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return (
        li.join(
            orders.where(
                (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
            ).select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
        .localCheckpoint(eager=True)
    )


def _copurchase_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each 1995 order's SORTED DISTINCT part array ``(ok, ps)`` — the
    round-10 basket representation behind the co-purchase pair
    builders (guide §2.4).  One exchange builds it (``collect_set``
    dedups inside the aggregate); flat basket rows come back with a
    narrow ``explode``, and within-basket pairs with chained
    generators (``_basket_pairs``) instead of an ok self-join — which,
    across a localCheckpoint (whose partitioning AQE forgets), paid
    TWO more full exchanges.  Eagerly checkpointed for consumers that
    read it more than once; per-basket memory is |basket| longs, so
    the whale-basket economics match the flat form."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return (
        li.join(
            orders.where(
                (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
            ).select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .localCheckpoint(eager=True)
    )


def _basket_pairs(baskets: DataFrame) -> DataFrame:
    """The ``u < v`` within-basket pairs of a ``(ok, ps)`` basket-array
    frame, one row per (basket, pair), as a narrow codegen'd
    generator pipeline: ``posexplode`` picks ``u`` and its position,
    ``slice(ps, i + 2, ...)`` yields exactly the strictly-greater
    elements (``ps`` is sorted).  Bit-identical to the old ok
    self-join's pair multiset (verified value-equal at sf0.1) with no
    join and no exchange."""
    return baskets.select("ps", F.posexplode("ps").alias("i", "u")).select(
        "u",
        F.explode(F.expr("slice(ps, i + 2, size(ps) - i - 1)")).alias("v"),
    )


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected 1995 co-purchase edges ``(u, v)`` with
    ``u < v`` — the shared graph behind the triangle and community
    queries.  Eagerly checkpointed: every consumer reads the edge list
    several times, and at 100 TB this is a written adjacency table, not
    a recomputed lineage."""
    # Round-10 optimization (guide §2.4 — remove shuffles outright):
    # the old shape materialized the distinct basket lines (one
    # exchange), then self-joined them on ok — and because a
    # localCheckpoint under AQE forgets its partitioning, the self-join
    # re-exchanged BOTH sides (verified: no ReusedExchange fires across
    # the checkpoint scan).  The basket-array build (one exchange) +
    # generator pair emission replaces all of that; the baskets are
    # built inline (not checkpointed) since this helper only reads
    # them once on the way to the edge checkpoint.  2.5 s → 1.5 s
    # isolated at sf0.1, bit-identical edge set (value-equal checked).
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    baskets = (
        li.join(
            orders.where(
                (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
            ).select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    )
    return _basket_pairs(baskets).distinct().localCheckpoint(eager=True)


@register(
    "lpa_community_labels",
    oracle=f"""
        WITH {_COPURCHASE_EDGE_CTES}, bi AS (
            SELECT u AS src, v AS dst FROM edges
            UNION ALL
            SELECT v AS src, u AS dst FROM edges
        ), l1 AS (
            SELECT src AS vertex, dst AS lbl
            FROM (
                SELECT src, dst, count(*) AS n FROM bi GROUP BY src, dst
                QUALIFY row_number() OVER (
                    PARTITION BY src ORDER BY n DESC, dst) = 1
            )
        ), l2 AS (
            SELECT src AS vertex, lbl AS community
            FROM (
                SELECT b.src, l.lbl, count(*) AS n
                FROM bi b JOIN l1 l ON b.dst = l.vertex
                GROUP BY b.src, l.lbl
                QUALIFY row_number() OVER (
                    PARTITION BY b.src ORDER BY n DESC, l.lbl) = 1
            )
        )
        SELECT vertex, community FROM l2
    """,
    doc=f"""Community detection via synchronous label propagation
    (Raghavan et al.), {LPA_ROUNDS} fixed rounds over the 1995
    co-purchase graph: every vertex adopts the most frequent label among
    its neighbors (ties → smallest label; labels start as vertex ids).
    The fixed round count makes the declared query oracle-able — LPA
    has no cross-engine-stable fixpoint (update order changes the
    answer), so the synchronous {LPA_ROUNDS}-round contract IS the
    semantic, the same trick as kmeans_embedding_clusters.  Per round:
    one equi-join (neighbor label lookup), one grouped count, one
    window partitioned by vertex for the argmax — all shuffles keyed by
    vertex, no cartesian, hub fan-in bounded by the grouped pre-count
    (a vertex receives one row per DISTINCT neighbor label, not per
    neighbor).""",
)
def lpa_community_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import lpa_communities

    return lpa_communities(_copurchase_edges(spark, sf_dir), rounds=LPA_ROUNDS)


@register(
    "skyline_pareto_orders",
    oracle="""
        SELECT o_orderkey, o_orderdate, o_totalprice
        FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM orders e
            WHERE e.o_orderdate < o.o_orderdate
              AND e.o_totalprice > o.o_totalprice
        )
    """,
    doc="""Skyline (Pareto-frontier) operator over orders: keep every
    order not dominated by a strictly earlier AND strictly
    higher-priced one (Börzsönyi et al.'s SKYLINE OF, the classic
    "best trade-offs" query).  The oracle is the O(n²) NOT EXISTS
    definition (DuckDB's IEJoin handles it at gate scale); the engine
    runs the DISTRIBUTED sweep: bucket orders by month, per-bucket max
    price is a grouped aggregate whose ~n_months rows collect to the
    driver (bounded, the pack_context_windows pattern) for an
    EXCLUSIVE running max that broadcast-joins back; within a bucket a
    window partitioned by bucket with a RANGE frame to 1 day before
    the current order date supplies the strictly-earlier same-bucket
    max.  An order survives iff neither max exceeds its price — two
    keyed shuffles + one bounded collect, no self-join, no
    unpartitioned window.""",
)
def skyline_pareto_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import skyline_2d

    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.datediff("o_orderdate", F.lit("1990-01-01").cast("date")).alias(
            "order_day"
        ),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("bucket"),
    )
    return skyline_2d(
        o, order_col="order_day", value_col="o_totalprice", bucket_col="bucket"
    ).select("o_orderkey", "o_orderdate", "o_totalprice")


# Shared by entity_fuzzy_clusters and survivorship_golden_record
# (pipeline_queries6): the recursive-closure ground truth for the
# customer entity clusters, as reusable CTE text ending in a `clusters`
# CTE of (member_id, cluster_id).
ER_CLUSTERS_CTES = """
        WITH RECURSIVE pairs AS (
            SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
            FROM customer a JOIN customer b
              ON a.c_custkey < b.c_custkey
             AND a.c_nationkey = b.c_nationkey
            WHERE levenshtein(a.c_name, b.c_name) <= 1
        ), bi AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION
            SELECT id_b AS src, id_a AS dst FROM pairs
        ), reach AS (
            SELECT src, dst FROM bi
            UNION
            SELECT r.src, e2.dst FROM reach r JOIN bi e2 ON r.dst = e2.src
        ), clusters AS (
            SELECT src AS member_id, least(src, min(dst)) AS cluster_id
            FROM reach GROUP BY src
        )
"""


def customer_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compound-blocked fuzzy customer pair generator behind
    entity_fuzzy_clusters AND survivorship_golden_record: exact-nation
    block AND SymSpell deletion-neighborhood block, then levenshtein
    <= 1 verification on candidates only (all equi-joins)."""
    c = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nation"),
    )
    # Block key i=0 is the string itself; i>=1 deletes the i-th char
    # (fuzzy_match_blocked's deletion neighborhood, plus the exact
    # nation attribute in the join key).
    variants = c.select(
        "id",
        "name",
        "nation",
        F.explode(F.sequence(F.lit(0), F.length("name"))).alias("i"),
    ).select(
        "id",
        "name",
        "nation",
        F.when(F.col("i") == 0, F.col("name"))
        .otherwise(
            F.expr(
                "concat(substring(name, 1, i - 1),"
                " substring(name, i + 1, length(name)))"
            )
        )
        .alias("block"),
    )
    a = variants.select(
        F.col("id").alias("id_a"), F.col("name").alias("name_a"),
        "nation", "block",
    )
    b = variants.select(
        F.col("id").alias("id_b"), F.col("name").alias("name_b"),
        "nation", "block",
    )
    return (
        a.join(b, ["nation", "block"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()
        .where(F.levenshtein("name_a", "name_b") <= 1)
    )


@register(
    "entity_fuzzy_clusters",
    oracle=ER_CLUSTERS_CTES
    + """
        SELECT member_id, cluster_id FROM clusters
    """,
    doc="""Entity resolution end-to-end: compound-blocked fuzzy matching
    feeds connected components (the alternating large/small-star
    operator), so transitively-linked record variants collapse into one
    entity cluster keyed by its minimum member id — the dedup-a-CRM
    pipeline as one declared query.  Blocking is COMPOUND, the standard
    ER design (Fellegi-Sunter / dedupe.io practice): a candidate pair
    must agree on a reliable exact attribute (nation) AND share a
    SymSpell deletion-neighborhood key of the name — both equi-join
    conditions, no theta join; only candidates get the exact
    levenshtein verify.  The exact-attribute block also keeps the
    match graph from degenerating into one giant component (the
    synthetic names differ pairwise by single digits), which is
    precisely the pathological shape real ER blocking exists to
    prevent.  The oracle replays the all-pairs ground truth with a
    recursive-CTE closure.""",
)
def entity_fuzzy_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components

    return connected_components(customer_match_pairs(spark, sf_dir))


ASSOC_TOPK = 20
ASSOC_MIN_PAIR = 2


@register(
    "association_rules_pairs",
    oracle=f"""
        WITH {_COPURCHASE_LINES_CTE}, n AS (
            SELECT count(DISTINCT ok)::BIGINT AS n_baskets FROM lines
        ), item AS (
            SELECT pk, count(*)::BIGINT AS c FROM lines GROUP BY pk
        ), pair AS (
            SELECT a.pk AS pk_a, b.pk AS pk_b, count(*)::BIGINT AS c_ab
            FROM lines a JOIN lines b ON a.ok = b.ok AND a.pk < b.pk
            GROUP BY a.pk, b.pk
        ), top AS (
            SELECT pk_a, pk_b, c_ab FROM pair
            WHERE c_ab >= {ASSOC_MIN_PAIR}
            ORDER BY c_ab DESC, pk_a, pk_b LIMIT {ASSOC_TOPK}
        )
        SELECT t.pk_a, t.pk_b, t.c_ab,
               round(1e6 * t.c_ab / n.n_baskets)::BIGINT AS support_micros,
               round(1e6 * t.c_ab / ia.c)::BIGINT AS confidence_micros,
               round(1e6 * t.c_ab * n.n_baskets / (ia.c * ib.c))::BIGINT
                   AS lift_micros
        FROM top t
        JOIN item ia ON t.pk_a = ia.pk
        JOIN item ib ON t.pk_b = ib.pk
        CROSS JOIN n
        ORDER BY t.c_ab DESC, t.pk_a, t.pk_b
    """,
    doc=f"""Association-rule mining (market-basket pairs, the Apriori
    k=2 report): the top-{ASSOC_TOPK} co-purchased part pairs of 1995
    with support, confidence(a→b) and lift.  Scale shape: pair
    counting is the within-basket self-join (bounded by per-basket
    item count squared, never |items|²), item supports and the basket
    total are grouped counts; the tiny top-{ASSOC_TOPK} report frame
    BROADCASTS into the support joins (the Kneser-Ney report pattern)
    and the 1-row basket total is a bounded broadcast (allowlisted).
    All metric inputs are integer counts; each metric rounds to micros
    once.""",
)
def association_rules_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Basket-array form (round-10, guide §2.4): one checkpointed
    # (ok, ps) build; n_baskets is the checkpoint's row count, item
    # supports explode narrowly, and the pair counts come from the
    # generator pipeline instead of the ok self-join (which paid two
    # post-checkpoint exchanges).  Identical counts by construction.
    baskets = _copurchase_baskets(spark, sf_dir)
    n = baskets.agg(F.count("*").alias("n_baskets"))
    lines = baskets.select("ok", F.explode("ps").alias("pk"))
    item = lines.groupBy(F.col("pk")).agg(F.count("*").alias("c"))
    pair = (
        _basket_pairs(baskets)
        .groupBy(F.col("u").alias("pk_a"), F.col("v").alias("pk_b"))
        .agg(F.count("*").alias("c_ab"))
    )
    top = (
        pair.where(F.col("c_ab") >= ASSOC_MIN_PAIR)
        .orderBy(F.desc("c_ab"), "pk_a", "pk_b")
        .limit(ASSOC_TOPK)
    )
    ia = item.select(F.col("pk").alias("pk_a"), F.col("c").alias("c_a"))
    ib = item.select(F.col("pk").alias("pk_b"), F.col("c").alias("c_b"))
    return (
        F.broadcast(top)
        .join(ia, "pk_a")
        .join(ib, "pk_b")
        .crossJoin(F.broadcast(n))
        .select(
            "pk_a",
            "pk_b",
            "c_ab",
            F.round(1e6 * F.col("c_ab") / F.col("n_baskets"))
            .cast("long")
            .alias("support_micros"),
            F.round(1e6 * F.col("c_ab") / F.col("c_a"))
            .cast("long")
            .alias("confidence_micros"),
            F.round(
                1e6 * F.col("c_ab") * F.col("n_baskets")
                / (F.col("c_a") * F.col("c_b"))
            )
            .cast("long")
            .alias("lift_micros"),
        )
        .orderBy(F.desc("c_ab"), "pk_a", "pk_b")
    )


@register(
    "winsorize_order_stats",
    oracle="""
        WITH q AS (
            SELECT o_orderpriority,
                   quantile_cont(o_totalprice, 0.05) AS p05,
                   quantile_cont(o_totalprice, 0.95) AS p95
            FROM orders GROUP BY o_orderpriority
        )
        SELECT o.o_orderpriority,
               count(*)::BIGINT AS n_orders,
               round(q.p05, 4) AS p05,
               round(q.p95, 4) AS p95,
               round(avg(least(greatest(o.o_totalprice, q.p05), q.p95)), 4)
                   AS winsorized_mean,
               round(avg(o.o_totalprice), 4) AS raw_mean
        FROM orders o JOIN q USING (o_orderpriority)
        GROUP BY o.o_orderpriority, q.p05, q.p95
    """,
    doc="""Winsorized robust statistics per order priority: clip each
    price to its group's exact [P05, P95] band, then average — the
    outlier-robust mean every metrics pipeline reports next to the raw
    one.  Two passes over the keyed data: an exact-quantile grouped
    aggregate (|groups| rows) that BROADCAST-joins back onto the scan,
    then one grouped average — no window, no sort of the fact table.
    Spark ``percentile`` ≡ DuckDB ``quantile_cont`` at round-4 (the
    quantiles_exact contract).""",
)
def winsorize_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderpriority", "o_totalprice"
    )
    q = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("p05"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
    )
    clipped = F.least(
        F.greatest(F.col("o_totalprice"), F.col("p05")), F.col("p95")
    )
    return (
        o.join(F.broadcast(q), "o_orderpriority")
        .groupBy("o_orderpriority", "p05", "p95")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg(clipped), 4).alias("winsorized_mean"),
            F.round(F.avg("o_totalprice"), 4).alias("raw_mean"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            F.round("p05", 4).alias("p05"),
            F.round("p95", 4).alias("p95"),
            "winsorized_mean",
            "raw_mean",
        )
    )


# Identical ANSI text for BOTH engines (the sql_interface_orders
# pattern): a WITH RECURSIVE hierarchy walk — Spark 4 executes
# recursive CTEs natively (UnionLoop; each step is a bounded
# materialized increment), DuckDB likewise.  The hierarchy is the
# derived decimal-digit forest over part keys: parent(pk) =
# floor(pk/10), roots pk < 10 — contiguous keys guarantee every parent
# exists and depth is bounded by the key's digit count (≤7 at 100 TB
# scale; the recursion is O(depth) keyed joins, never unbounded).
_RECURSIVE_HIERARCHY_SQL = """
    WITH RECURSIVE chain (pk, root, depth) AS (
        SELECT p_partkey AS pk, p_partkey AS root, 0 AS depth
        FROM part WHERE p_partkey < 10
        UNION ALL
        SELECT p.p_partkey AS pk, c.root, c.depth + 1 AS depth
        FROM part p JOIN chain c
          ON CAST(floor(p.p_partkey / 10) AS BIGINT) = c.pk
        WHERE p.p_partkey >= 10
    )
    SELECT depth,
           count(*) AS n_parts,
           min(root) AS min_root,
           max(root) AS max_root,
           CAST(sum(pk) AS BIGINT) AS sum_keys
    FROM chain GROUP BY depth
"""


@register(
    "recursive_cte_hierarchy",
    oracle=_RECURSIVE_HIERARCHY_SQL,
    doc="""Recursive CTE (Spark 4 WITH RECURSIVE, executed natively as
    a UnionLoop): per-depth rollup of the derived parent hierarchy over
    part keys (parent = floor(key/10)) — the org-chart / BOM-explosion
    traversal shape.  The EXACT same ANSI text runs through spark.sql
    and DuckDB (the sql_interface_orders pattern).  Scale shape: each
    recursion step is one keyed equi-join of the previous increment
    against the scan, depth bounded by the key's digit count — the
    declarative replacement for a driver-side iterative loop.""",
)
def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "part", sf_dir).createOrReplaceTempView("part")
    return spark.sql(_RECURSIVE_HIERARCHY_SQL)


@register(
    "variant_json_extract",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
               CAST(json_extract_string(props, '$.missing') AS BIGINT)
                   AS missing_is_null,
               CAST(coalesce(json_valid(props), false) AS INT) AS is_parseable
        FROM events
    """,
    doc="""Semi-structured VARIANT surface (Spark 4): ``parse_json``
    into the binary VARIANT encoding, typed path extraction via
    ``variant_get`` (missing path → NULL, the shredding-friendly
    fail-soft), parse validity via try_parse_json — the open-schema
    ingestion path for event payloads that evolve without migrations.
    VARIANT keeps the parsed tree in one binary column (no
    per-field top-level columns, no re-parse per access) — the Spark-4
    answer to the JSON-string column this table ships.  The oracle
    checks the same typed values through DuckDB's JSON functions.""",
)
def variant_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    # try_parse_json everywhere: a NULL or malformed props row (the rows
    # is_parseable exists to flag) must yield NULL extractions, never
    # fail the query — matching the oracle's fail-soft JSON functions.
    return ev.select(
        "event_id",
        F.expr("variant_get(try_parse_json(props), '$.k', 'bigint')").alias(
            "k_typed"
        ),
        F.expr(
            "variant_get(try_parse_json(props), '$.missing', 'bigint')"
        ).alias("missing_is_null"),
        F.expr("CAST(try_parse_json(props) IS NOT NULL AS INT)").alias(
            "is_parseable"
        ),
    )


@register(
    "sketch_mergeability_audit",
    oracle="""
        WITH monthly AS (
            SELECT date_trunc('month', o_orderdate) AS m,
                   count(DISTINCT o_custkey) AS md
            FROM orders GROUP BY date_trunc('month', o_orderdate)
        )
        SELECT (SELECT count(*) FROM monthly) AS n_months,
               (SELECT count(DISTINCT o_custkey) FROM orders)
                   AS exact_distinct,
               (SELECT quantile_cont(o_totalprice, 0.5) FROM orders) IS NOT
                   NULL AS kll_p50_ok,
               TRUE AS hll_merged_ok,
               TRUE AS theta_merged_ok,
               TRUE AS kll_p99_ok
    """,
    doc="""Mergeable-sketch audit (Apache DataSketches built-ins, Spark
    4): HLL and theta distinct sketches and a KLL quantile sketch are
    built PER MONTH over orders, then UNIONED across months — the
    re-aggregation property that makes sketches the 100 TB answer to
    distinct/quantile rollups (pre-aggregate per partition/day, merge
    for any ad-hoc range — never rescan).  Sketch internals are
    engine-specific, so the hash contract is the approx_distinct
    pattern: the merged HLL (lgK=14) and theta estimates must land
    within 5% of the exact distinct count, and the merged KLL p50/p99
    must sit between the exact neighboring order statistics with 2%
    rank tolerance — booleans the oracle carries as literal TRUE.""",
)
def sketch_mergeability_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir).select(
        F.date_trunc("month", "o_orderdate").alias("m"),
        "o_custkey",
        "o_totalprice",
    )
    monthly = o.groupBy("m").agg(
        F.hll_sketch_agg("o_custkey", F.lit(14)).alias("hll"),
        F.theta_sketch_agg("o_custkey").alias("theta"),
        F.kll_sketch_agg_double("o_totalprice").alias("kll"),
    )
    merged = monthly.agg(
        F.count("*").alias("n_months"),
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("hll_est"),
        F.theta_sketch_estimate(
            F.expr("theta_union_agg(theta)")
        ).alias("theta_est"),
        F.expr(
            "kll_sketch_get_quantile_double(kll_merge_agg_double(kll), 0.5)"
        ).alias("kll_p50"),
        F.expr(
            "kll_sketch_get_quantile_double(kll_merge_agg_double(kll), 0.99)"
        ).alias("kll_p99"),
    )
    exact = o.agg(
        F.countDistinct("o_custkey").alias("exact_distinct"),
        F.expr("percentile(o_totalprice, array(0.48, 0.52, 0.97, 1.0))")
        .alias("p_bounds"),
    )
    j = merged.crossJoin(F.broadcast(exact))
    within = lambda est: (  # noqa: E731
        F.abs(est - F.col("exact_distinct")) <= 0.05 * F.col("exact_distinct")
    )
    return j.select(
        "n_months",
        "exact_distinct",
        (
            (F.col("kll_p50") >= F.col("p_bounds")[0])
            & (F.col("kll_p50") <= F.col("p_bounds")[1])
        ).alias("kll_p50_ok"),
        within(F.col("hll_est")).alias("hll_merged_ok"),
        within(F.col("theta_est")).alias("theta_merged_ok"),
        (
            (F.col("kll_p99") >= F.col("p_bounds")[2])
            & (F.col("kll_p99") <= F.col("p_bounds")[3])
        ).alias("kll_p99_ok"),
    )


@register(
    "theta_overlap_audit",
    oracle="""
        WITH c AS (SELECT DISTINCT user_id FROM events
                   WHERE event_type = 'click'),
             p AS (SELECT DISTINCT user_id FROM events
                   WHERE event_type = 'purchase')
        SELECT (SELECT count(*) FROM c) AS exact_clickers,
               (SELECT count(*) FROM p) AS exact_purchasers,
               (SELECT count(*) FROM c JOIN p USING (user_id))
                   AS exact_both,
               (SELECT count(*) FROM c)
                   - (SELECT count(*) FROM c JOIN p USING (user_id))
                   AS exact_click_only,
               TRUE AS intersection_ok,
               TRUE AS difference_ok
    """,
    doc="""Theta-sketch SET ALGEBRA (audience-overlap analytics): the
    clicker and purchaser distinct-user sketches intersect and
    difference WITHOUT rescanning events — the capability HLL lacks
    (union-only) and the reason theta sketches exist (Dalvi et al. /
    DataSketches).  At 100 TB: one sketch per segment per day, any
    audience overlap answered from sketch algebra.  Engine-specific
    internals → the bounded-error contract: intersection and
    difference estimates within 10% (absolute 2) of the exact
    anti/semi-join counts, carried as always-true booleans.""",
)
def theta_overlap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    sketches = ev.agg(
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'click' THEN user_id"
            " END)"
        ).alias("s_click"),
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'purchase' THEN"
            " user_id END)"
        ).alias("s_purchase"),
        F.countDistinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("exact_clickers"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("exact_purchasers"),
    )
    c = ev.where(F.col("event_type") == "click").select("user_id").distinct()
    p = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    # exact_click_only = clickers − both (user_id is non-null), so one
    # semi-join aggregate covers both exact overlap numbers — no
    # anti-join, one fewer scan and one fewer broadcast.
    exact = c.join(p, "user_id").agg(F.count("*").alias("exact_both"))
    j = sketches.crossJoin(F.broadcast(exact)).withColumn(
        "exact_click_only", F.col("exact_clickers") - F.col("exact_both")
    )
    est_i = F.expr(
        "theta_sketch_estimate(theta_intersection(s_click, s_purchase))"
    )
    est_d = F.expr(
        "theta_sketch_estimate(theta_difference(s_click, s_purchase))"
    )
    tol = lambda est, ref: (  # noqa: E731
        F.abs(est - ref) <= F.greatest(F.lit(2.0), 0.10 * ref)
    )
    return j.select(
        "exact_clickers",
        "exact_purchasers",
        "exact_both",
        "exact_click_only",
        tol(est_i, F.col("exact_both")).alias("intersection_ok"),
        tol(est_d, F.col("exact_click_only")).alias("difference_ok"),
    )


@register(
    "sensor_outage_islands",
    oracle="""
        WITH hourly AS (
            SELECT DISTINCT event_type,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h
            FROM events
        ), grp AS (
            SELECT event_type, h,
                   h - row_number() OVER (PARTITION BY event_type
                                          ORDER BY h) AS island_key
            FROM hourly
        )
        SELECT event_type,
               min(h) AS island_start_hour,
               max(h) AS island_end_hour,
               count(*) AS n_hours
        FROM grp GROUP BY event_type, island_key
        HAVING count(*) >= 3
    """,
    doc="""Islands detection (gaps-and-islands): maximal runs of
    consecutive active hours per event type, reporting runs of 3+
    hours — the sensor-uptime / outage-boundary report (the dual of
    resample_gapfill's missing-hour filling).  The classic
    constant-difference trick: within a key, consecutive hours minus
    their row_number share one island key, so island extraction is ONE
    window partitioned by the stream key plus one grouped aggregate —
    no self-joins, no sequential scan dependency.""",
)
def sensor_outage_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    hourly = ev.select(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
    ).distinct()
    island_key = F.col("h") - F.row_number().over(
        Window.partitionBy("event_type").orderBy("h")
    )
    return (
        hourly.withColumn("island_key", island_key)
        .groupBy("event_type", "island_key")
        .agg(
            F.min("h").alias("island_start_hour"),
            F.max("h").alias("island_end_hour"),
            F.count("*").alias("n_hours"),
        )
        .where(F.col("n_hours") >= 3)
        .drop("island_key")
    )


@register(
    "weekly_growth_rates",
    oracle="""
        WITH weekly AS (
            SELECT event_type,
                   CAST(date_trunc('week', ts) AS DATE) AS wk,
                   count(*)::BIGINT AS n
            FROM events GROUP BY event_type, date_trunc('week', ts)
        )
        SELECT event_type, wk, n,
               lag(n) OVER (PARTITION BY event_type ORDER BY wk)
                   AS prev_n,
               CASE WHEN lag(n) OVER (PARTITION BY event_type
                                      ORDER BY wk) IS NULL THEN NULL
                    ELSE round((n - lag(n) OVER (PARTITION BY event_type
                                                 ORDER BY wk))
                               * 1e6 / lag(n) OVER (PARTITION BY event_type
                                                    ORDER BY wk))::BIGINT
               END AS wow_growth_micros
        FROM weekly
    """,
    doc="""Week-over-week growth (period-over-period reporting, the
    dashboard staple): weekly counts per event type with the previous
    week's value and the integer-micro growth rate.  One grouped
    aggregation to |keys × weeks| rows, then ONE lag window
    partitioned by event type — the window runs over the tiny
    aggregate, never the event log.  DuckDB's date_trunc('week')
    returns DATE (the round-1 gotcha), so Spark's is cast to match;
    growth uses integer counts with one micro rounding.""",
)
def weekly_growth_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    weekly = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("week", "ts")).alias("wk"),
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("wk")
    prev = F.lag("n").over(w)
    return weekly.select(
        "event_type",
        "wk",
        "n",
        prev.alias("prev_n"),
        F.when(prev.isNull(), F.lit(None).cast("long"))
        .otherwise(F.round((F.col("n") - prev) * 1e6 / prev).cast("long"))
        .alias("wow_growth_micros"),
    )


@register(
    "key_skew_audit",
    oracle="""
        WITH per_key AS (
            SELECT user_id, count(*)::BIGINT AS n
            FROM events GROUP BY user_id
        )
        SELECT count(*)::BIGINT AS n_keys,
               sum(n)::BIGINT AS n_rows,
               max(n)::BIGINT AS max_key_rows,
               round(quantile_cont(n, 0.5), 4) AS median_key_rows,
               round(max(n) * count(*) / sum(n)::DOUBLE, 4)
                   AS hot_key_ratio,
               round(sum(n::DOUBLE * n) * count(*)
                     / (sum(n)::DOUBLE * sum(n)), 6) AS imbalance_factor
        FROM per_key
    """,
    doc="""Partition-skew audit — the diagnostic run BEFORE choosing a
    join strategy at 100 TB: per-key row counts reduced to the skew
    statistics that decide salting (max/median ratio, the hot-key
    share) and the expected shuffle imbalance (sum(n²)·k/total² — the
    factor by which the largest hash partition exceeds uniform).  Two
    grouped aggregations, both fully partial-aggregated; the operator
    family it feeds (salted_join, skew-safe top-k) is pinned in
    tests/test_skew.py.""",
)
def key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    per_key = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    return per_key.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_key_rows"),
        F.round(F.expr("percentile(n, 0.5)"), 4).alias("median_key_rows"),
        F.round(
            F.max("n") * F.count("*") / F.sum("n").cast("double"), 4
        ).alias("hot_key_ratio"),
        # n² accumulates in DOUBLE: sum(n²)·k ≥ total² (Cauchy-Schwarz),
        # so a long accumulator overflows right at the event volumes the
        # audit targets; the oracle's HUGEINT never would, and the two
        # engines must round the same value.
        F.round(
            F.sum(F.col("n").cast("double") * F.col("n"))
            * F.count("*")
            / (F.sum("n").cast("double") * F.sum("n")),
            6,
        ).alias("imbalance_factor"),
    )
