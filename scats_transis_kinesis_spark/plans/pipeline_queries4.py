"""Training-data pipeline queries, round 3 batch 4: forward as-of
attribution, BM25 retrieval scoring, cross-document n-gram novelty,
and tokenizer vocabulary coverage.

Same contract discipline as the sibling modules: declarative plans,
partitioned-only shuffles, exact DuckDB oracles.  FP-accumulating steps
carry the integer-micro contract (per-term scores round to integral
micros BEFORE summing, so the cross-engine sum is exact integer math —
the same trick as unigram_perplexity_score).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import SHINGLE_N, shingle_sets
from ..operators.relational import asof_join
from ..operators.similarity import cosine, hard_negative_topk
from ..operators.text import tokens
from ..sources.loaders import load_table
from .registry import register


@register(
    "asof_click_next_purchase",
    oracle="""
        SELECT c.event_id, c.user_id,
               floor(epoch(p.ts))::BIGINT AS asof_purchase_epoch
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
    doc="""FORWARD as-of join — for each click, the EARLIEST purchase at
    or after it per user (click-to-conversion attribution; the mirror of
    asof_purchase_last_click, closing the formerly-declared backward-only
    limitation in operators/relational.py:asof_join).  Same plan shape:
    union + first-ignorenulls over one per-key window sort — one shuffle,
    no range explosion.  The carried value is the matched timestamp
    itself, so ties between equal-ts purchases cannot produce
    engine-dependent output.""",
)
def asof_click_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    joined = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["ts"],
        direction="forward",
    )
    return joined.select(
        "event_id", "user_id", F.unix_timestamp("asof_ts").alias("asof_purchase_epoch")
    )


# BM25 constants (the Lucene/Robertson defaults) and a fixed keyword
# query over the synthetic corpus vocabulary.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
BM25_QUERY = ("spark", "window", "stream")


_BM25_ORACLE = f"""
        WITH base AS (
            SELECT doc_id, string_split(text, ' ') AS w,
                   len(string_split(text, ' ')) AS dl
            FROM documents
        ), stats AS (
            SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base
        ), tf AS (
            SELECT doc_id, dl, tok, count(*)::DOUBLE AS tf
            FROM (SELECT doc_id, dl, unnest(w) AS tok FROM base)
            WHERE tok IN {BM25_QUERY!r}
            GROUP BY doc_id, dl, tok
        ), df AS (
            SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok
        ), scored AS (
            SELECT t.doc_id,
                   round(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1)
                         * t.tf * ({BM25_K1} + 1)
                         / (t.tf + {BM25_K1} * (1 - {BM25_B}
                               + {BM25_B} * t.dl / s.avgdl))
                         * 1e6)::BIGINT AS term_micros
            FROM tf t JOIN df d USING (tok) CROSS JOIN stats s
        )
        SELECT doc_id, sum(term_micros)::BIGINT AS score_micros
        FROM scored GROUP BY doc_id
        ORDER BY score_micros DESC, doc_id LIMIT {BM25_TOPK}
    """

_BM25_DOC = f"""BM25 top-{BM25_TOPK} retrieval (Robertson/Sparck Jones; the
    Lucene-style ``ln(1 + (N-df+0.5)/(df+0.5))`` idf) for a fixed
    keyword query — the classic search-infra scorer over the corpus.
    Scale shape: tokens are filtered to the query terms INSIDE the
    per-document array before any explode, so the exploded frame
    carries only |query|-term hits, not the corpus token stream; tf is
    one keyed groupBy; df aggregates the tf frame (|docs·terms| rows);
    the 1-row (n_docs, avgdl) aggregate broadcast-joins back (bounded
    BNL, allowlisted); top-k is ORDER BY + LIMIT — Spark executes
    TakeOrderedAndProject (per-partition partial top-k, no global
    sort materialization).  Per-term scores round to integer micros
    before summing, so cross-engine totals are exact integer math."""


def bm25_score_frame(docs: DataFrame) -> DataFrame:
    """``(doc_id, score_micros)`` BM25 scores for :data:`BM25_QUERY` —
    the shared scorer behind ``bm25_topk`` and the RRF fusion query
    (pipeline_queries5).  Only documents with at least one query-term
    hit appear."""
    w = tokens("text")
    # NOT persisted: the tokenized frame feeds both the (n_docs, avgdl)
    # corpus aggregate and the query-term hit extraction, but it is the
    # corpus token stream — at 100 TB you never cache that; two narrow
    # passes over the columnar scan are cheaper than writing + reading
    # a corpus-scale cache (and a persist here would sit in the
    # CacheManager for the process lifetime).
    base = docs.select("doc_id", w.alias("w"), F.size(w).alias("dl"))
    stats = base.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    hits = base.select(
        "doc_id",
        "dl",
        F.explode(
            F.filter("w", lambda t: t.isin(*BM25_QUERY))
        ).alias("tok"),
    )
    tf = hits.groupBy("doc_id", "dl", "tok").agg(
        F.count("*").cast("double").alias("tf")
    )
    df = tf.groupBy("tok").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    denom = F.col("tf") + BM25_K1 * (
        1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    term_micros = F.round(
        idf * F.col("tf") * (BM25_K1 + 1) / denom * 1e6
    ).cast("long")
    scored = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term_micros.alias("term_micros"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("term_micros").cast("long").alias("score_micros")
    )


@register("bm25_topk", oracle=_BM25_ORACLE, doc=_BM25_DOC)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return (
        bm25_score_frame(docs)
        .orderBy(F.desc("score_micros"), "doc_id")
        .limit(BM25_TOPK)
    )


@register(
    "ngram_novelty_decay",
    oracle=f"""
        WITH sets AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       generate_series(1, len(w) - {SHINGLE_N - 1}),
                       i -> array_to_string(w[i:i+{SHINGLE_N - 1}], ' '))) AS toks
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
            WHERE len(w) >= {SHINGLE_N}
        ), ex AS (
            SELECT doc_id, unnest(toks) AS shingle FROM sets
        ), first_seen AS (
            SELECT shingle, min(doc_id) AS first_doc FROM ex GROUP BY shingle
        )
        SELECT e.doc_id,
               count(*)::BIGINT AS n_shingles,
               sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)::BIGINT
                   AS n_novel,
               round(sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
                     ::DOUBLE / count(*), 6) AS novelty
        FROM ex e JOIN first_seen f USING (shingle)
        GROUP BY e.doc_id
    """,
    doc=f"""Cross-document n-gram novelty (the per-document statistic
    behind dataset "novelty decay" curves: later documents repeat
    earlier ones' {SHINGLE_N}-grams more and more as a corpus grows —
    a crawl-freshness / memorization signal).  Each distinct shingle is
    attributed to the smallest doc_id containing it; a document's
    novelty is the fraction of its distinct shingles it introduced.
    Scale shape: the same vocabulary-keyed shuffle as the dedup family —
    first-seen attribution is a ``min OVER (PARTITION BY shingle)``
    window, so the shingle stream shuffles ONCE (vs an aggregate +
    join-back, which shuffles it twice and re-sorts for the join);
    the per-document rollup is one keyed groupBy.  No all-pairs stage,
    no unpartitioned window, no collect.""",
)
def ngram_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    ex = shingle_sets(docs).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    first_doc = F.min("doc_id").over(W.partitionBy("shingle"))
    is_novel = (first_doc == F.col("doc_id")).cast("int")
    return (
        ex.select("doc_id", is_novel.alias("is_novel"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum("is_novel").cast("long").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_shingles"), 6).alias("novelty"),
        )
    )


# Fixed query ids for hard-negative mining (same seed set as the
# sim_topk family).
HN_QUERY_IDS = (0, 1, 2, 3, 4)
HN_K = 5

_COS6 = (
    "round(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
    "* sqrt(list_dot_product({b}, {b}))), 6)"
)


@register(
    "emb_hard_negatives",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
                   label AS qlabel
            FROM embeddings
            WHERE vec_id IN ({", ".join(map(str, HN_QUERY_IDS))})
        ), pairs AS (
            SELECT q.query_id, c.vec_id AS negative_id,
                   c.label AS negative_label,
                   {_COS6.format(a="q.qv", b="c.embedding::DOUBLE[]")}
                       AS cosine_sim
            FROM q JOIN embeddings c ON c.label <> q.qlabel
        )
        SELECT query_id, negative_id, negative_label, cosine_sim FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY cosine_sim DESC, negative_id) AS rn
            FROM pairs
        ) WHERE rn <= {HN_K}
    """,
    doc=f"""Hard-negative mining for contrastive training: for each of
    {len(HN_QUERY_IDS)} query vectors, the {HN_K} most cosine-similar
    corpus vectors with a DIFFERENT label
    (operators/similarity.py:hard_negative_topk).  Broadcast query set
    against one corpus scan (bounded BNL, allowlisted); sequential-fold
    double dot products round to 6 digits, matching DuckDB
    list_dot_product bit-for-bit.""",
)
def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hard_negative_topk(
        load_table(spark, "embeddings", sf_dir),
        query_ids=list(HN_QUERY_IDS),
        k=HN_K,
    )


@register(
    "embedding_label_margin",
    oracle="""
        WITH e AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        ), flat AS (
            SELECT label, unnest(generate_series(1, len(v))) AS idx, v
            FROM e
        ), cent AS (
            SELECT label,
                   list(cv ORDER BY idx) AS cvec
            FROM (
                SELECT label, idx, round(avg(v[idx]), 6) AS cv
                FROM flat GROUP BY label, idx
            ) GROUP BY label
        ), scored AS (
            SELECT e.vec_id, e.label, c.label AS clabel,
                   round(list_dot_product(e.v, c.cvec)
                         / (sqrt(list_dot_product(e.v, e.v))
                            * sqrt(list_dot_product(c.cvec, c.cvec))), 6)
                       AS sim
            FROM e CROSS JOIN cent c
        )
        SELECT vec_id, label,
               max(CASE WHEN clabel = label THEN sim END) AS own_sim,
               max(CASE WHEN clabel <> label THEN sim END) AS best_other_sim,
               round(max(CASE WHEN clabel = label THEN sim END)
                     - max(CASE WHEN clabel <> label THEN sim END), 6)
                   AS margin
        FROM scored GROUP BY vec_id, label
    """,
    doc="""Embedding-space quality audit: per-vector cosine margin
    between its own-label centroid and the best other-label centroid —
    the statistic behind embedding-quality dashboards and mislabel
    screens (negative margin = the vector sits closer to another
    class).  Scale shape: centroids are an exploded (label, dim) keyed
    aggregate — one shuffle of |vectors|·dims skinny rows, bounded
    output of |labels| rows that broadcasts back; per-vector scoring is
    a single corpus scan against the broadcast centroid set (bounded
    BNL, allowlisted).  Centroid elements round to 6 digits BEFORE the
    dot product (rounded-intermediate contract), so the engine-order
    of the per-dimension averages can never flip the round-6 margin.""",
)
def embedding_label_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    e = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    flat = e.select(
        "label", F.posexplode("v").alias("idx", "val")
    )
    cent = (
        flat.groupBy("label", "idx")
        .agg(F.round(F.avg("val"), 6).alias("cv"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "cv"))),
                lambda s: s["cv"],
            ).alias("cvec")
        )
        .select(F.col("label").alias("clabel"), "cvec")
    )
    scored = e.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "clabel",
        F.round(cosine(F.col("v"), F.col("cvec")), 6).alias("sim"),
    )
    own = F.max(F.when(F.col("clabel") == F.col("label"), F.col("sim")))
    other = F.max(F.when(F.col("clabel") != F.col("label"), F.col("sim")))
    return scored.groupBy("vec_id", "label").agg(
        own.alias("own_sim"),
        other.alias("best_other_sim"),
        F.round(own - other, 6).alias("margin"),
    )


# Length-bucketed batching: docs grouped into fixed-size batches of
# similar token length so per-batch padding (to the batch max) wastes
# the least compute — the standard inference/training batcher.
LB_BUCKET_WIDTH = 16
LB_BATCH_SIZE = 8


@register(
    "length_bucketed_batches",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
                   (len(string_split(text, ' ')) // {LB_BUCKET_WIDTH})::BIGINT
                       AS bucket
            FROM documents
        ), seq AS (
            SELECT doc_id, n_tokens, bucket,
                   (row_number() OVER (PARTITION BY bucket ORDER BY doc_id)
                       - 1) // {LB_BATCH_SIZE} AS batch_seq
            FROM t
        )
        SELECT bucket, batch_seq::BIGINT AS batch_seq,
               count(*)::BIGINT AS n_docs,
               max(n_tokens)::BIGINT AS max_len,
               sum(n_tokens)::BIGINT AS sum_len,
               (max(n_tokens) * count(*) - sum(n_tokens))::BIGINT
                   AS padding_waste,
               round(sum(n_tokens)::DOUBLE / (max(n_tokens) * count(*)), 6)
                   AS efficiency
        FROM seq GROUP BY bucket, batch_seq
    """,
    doc=f"""Length-bucketed batching (inference/training serving
    staple): documents are bucketed by token length
    (width {LB_BUCKET_WIDTH}) and packed into batches of
    {LB_BATCH_SIZE} in deterministic id order; each batch reports its
    padding waste (every sequence pads to the batch max).  Scale
    shape: the sequencing window partitions on the length bucket —
    bounded partitions, never a global sort; batch stats are one keyed
    groupBy with full map-side combine.""",
)
def length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    n = F.size(tokens("text"))
    t = docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.floor(n / LB_BUCKET_WIDTH).alias("bucket"),
    )
    w = W.partitionBy("bucket").orderBy("doc_id")
    seq = t.withColumn(
        "batch_seq",
        F.floor((F.row_number().over(w) - 1) / LB_BATCH_SIZE),
    )
    eff = F.col("sum_len") / (F.col("max_len") * F.col("n_docs"))
    return (
        seq.groupBy("bucket", "batch_seq")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.max("n_tokens").cast("long").alias("max_len"),
            F.sum("n_tokens").cast("long").alias("sum_len"),
        )
        .select(
            "bucket",
            "batch_seq",
            "n_docs",
            "max_len",
            "sum_len",
            (F.col("max_len") * F.col("n_docs") - F.col("sum_len"))
            .cast("long")
            .alias("padding_waste"),
            F.round(eff, 6).alias("efficiency"),
        )
    )


# Token budget for one training epoch of the mixture (the recipe math
# behind Pile/LLaMA-style source weighting).
MIX_TOKEN_BUDGET = 1_000_000
# Deterministic per-source target weight: source srcN gets weight
# (N+1) / sum(1..20) — a stand-in for a hand-tuned recipe table, kept
# as a formula so the oracle needs no 20-entry literal.
MIX_WEIGHT_DENOM = 210  # sum(1..20)


def _mixture_inventory(docs: DataFrame) -> DataFrame:
    """Shared recipe math for the mixture queries: per-source token
    inventory + the epoch token quota (``target_tokens``) — ONE
    definition so mixture_epoch_plan and mixture_materialize (and their
    oracles' shared CTE text) cannot silently diverge."""
    s = (
        docs.select(
            "source",
            (
                F.regexp_extract("source", r"src(\d+)", 1).cast("long") + 1
            ).alias("src_rank"),
            F.size(tokens("text")).alias("n_tokens"),
        )
        .groupBy("source", "src_rank")
        .agg(F.sum("n_tokens").cast("long").alias("source_tokens"))
    )
    target = F.round(
        F.lit(MIX_TOKEN_BUDGET) * F.col("src_rank") / MIX_WEIGHT_DENOM
    ).cast("long")
    return s.select(
        "source", "src_rank", "source_tokens", target.alias("target_tokens")
    )


@register(
    "mixture_epoch_plan",
    oracle=f"""
        WITH s AS (
            SELECT source,
                   regexp_extract(source, 'src(\\d+)', 1)::BIGINT + 1
                       AS src_rank,
                   sum(len(string_split(text, ' ')))::BIGINT
                       AS source_tokens
            FROM documents GROUP BY source
        )
        SELECT source, source_tokens,
               round(src_rank / {MIX_WEIGHT_DENOM}.0, 6) AS weight,
               round({MIX_TOKEN_BUDGET} * src_rank
                     / {MIX_WEIGHT_DENOM}.0)::BIGINT AS target_tokens,
               round(round({MIX_TOKEN_BUDGET} * src_rank
                           / {MIX_WEIGHT_DENOM}.0)
                     / source_tokens::DOUBLE, 6) AS epochs
        FROM s
    """,
    doc=f"""Data-mixture epoch plan (the Pile/LLaMA recipe math): given
    per-source token inventories and target mixture weights, compute
    each source's token quota for a {MIX_TOKEN_BUDGET}-token epoch and
    the repeat factor (epochs > 1 = upsample, < 1 = subsample) needed
    to hit it.  Scale shape: one keyed aggregate over the corpus for
    the inventory; the plan itself is |sources| rows of scalar math —
    the artifact a sampler (curriculum_mixture_sample,
    weighted_sample_ares) consumes.""",
)
def mixture_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    inv = _mixture_inventory(load_table(spark, "documents", sf_dir))
    return inv.select(
        "source",
        "source_tokens",
        F.round(F.col("src_rank") / MIX_WEIGHT_DENOM, 6).alias("weight"),
        "target_tokens",
        F.round(F.col("target_tokens") / F.col("source_tokens"), 6).alias(
            "epochs"
        ),
    )


@register(
    "quality_calibrate_by_source",
    oracle="""
        WITH q AS (
            SELECT doc_id, source,
                   round(0.4 * least(len(string_split(text, ' ')) / 100.0, 1.0)
                     + 0.3 * (len(list_filter(string_split(text, ' '),
                           t -> t IN ('a','and','for','in','is','of','on',
                                      'the','to','with')))
                         / len(string_split(text, ' ')))
                     + 0.3 * (1 - len(regexp_replace(lower(text),
                                      '[a-z0-9 ]', '', 'g'))::DOUBLE
                                  / len(text)), 6) AS quality
            FROM documents
        )
        SELECT doc_id, source, quality,
               round(percent_rank() OVER (PARTITION BY source
                                          ORDER BY quality, doc_id), 6)
                   AS source_pctile,
               (percent_rank() OVER (PARTITION BY source
                                     ORDER BY quality, doc_id)) >= 0.2
                   AS keep
        FROM q
    """,
    doc="""Per-source quality calibration (curation staple): a single
    global quality threshold over-prunes clean sources and under-prunes
    noisy ones, so each document is scored by its PERCENTILE WITHIN ITS
    SOURCE and the keep rule ("top 80% of each source") applies
    uniformly across sources.  Scale shape: the quality heuristic is
    the same codegen'd expression as text_quality (no UDF); the
    percentile is a window PARTITIONED by source — bounded partitions,
    never a global sort.  doc_id tiebreaks make the rank exact
    cross-engine.""",
)
def quality_calibrate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.text import quality_expr

    docs = load_table(spark, "documents", sf_dir)
    q = docs.select("doc_id", "source", quality_expr("text").alias("quality"))
    w = W.partitionBy("source").orderBy("quality", "doc_id")
    pct = F.percent_rank().over(w)
    return q.select(
        "doc_id",
        "source",
        "quality",
        F.round(pct, 6).alias("source_pctile"),
        (pct >= 0.2).alias("keep"),
    )


@register(
    "mixture_materialize",
    oracle=f"""
        WITH s AS (
            SELECT source,
                   regexp_extract(source, 'src(\\d+)', 1)::BIGINT + 1
                       AS src_rank,
                   sum(len(string_split(text, ' ')))::BIGINT
                       AS source_tokens
            FROM documents GROUP BY source
        ), plan AS (
            SELECT source,
                   round({MIX_TOKEN_BUDGET} * src_rank
                         / {MIX_WEIGHT_DENOM}.0)::BIGINT AS target_tokens,
                   source_tokens
            FROM s
        )
        SELECT d.doc_id, d.source, r.rep AS repeat_idx
        FROM documents d
        JOIN plan p ON d.source = p.source,
        LATERAL (
            SELECT unnest(generate_series(0,
                ((p.target_tokens // p.source_tokens)
                 + CASE WHEN ((d.doc_id % 1000000)
                              * (2654435761 % 1000000)) % 1000000
                          < ((p.target_tokens % p.source_tokens) * 1000000
                             // p.source_tokens)
                        THEN 1 ELSE 0 END) - 1)) AS rep) r
    """,
    doc=f"""Materialize the mixture plan: each document is emitted
    floor(epochs) times plus one more with probability frac(epochs),
    decided by a deterministic per-document hash draw — so the
    realized per-source token mass converges to the plan's quota
    (Poisson-rounded upsampling, the standard way repeat factors
    become an actual training set).  Scale shape: the |sources|-row
    plan broadcast-joins the corpus; repetition is explode(sequence)
    computed per row — no shuffle of repeated data (downstream
    shuffling happens post-explode only if the consumer needs it);
    the hash draw reuses the Knuth multiplicative constant for a
    uniform integer in [0, 1e6).""",
)
def mixture_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    plan = _mixture_inventory(docs).select(
        "source", "target_tokens", "source_tokens"
    )
    # Integer arithmetic end to end (div / %): FP division + truncation
    # can land one ulp under an exact integer ratio, and the oracle's
    # // is exact — so the Spark side must be exact too.
    base_reps = F.expr("target_tokens div source_tokens")
    frac_ppm = F.expr(
        "((target_tokens % source_tokens) * 1000000) div source_tokens"
    )
    # Modular reduction BEFORE the multiply: (a*b) mod m ==
    # ((a mod m)*(b mod m)) mod m, and the reduced product is < 1e6 *
    # 435761 < 2^39 — so the draw never wraps a 64-bit long no matter
    # how large doc_id grows (the naive doc_id * 2654435761 wraps
    # negative past doc_id ~3.47e9, admitting every doc), and the
    # oracle's BIGINT multiply cannot overflow-error either.
    draw = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(1_000_000))
        * F.lit(2654435761 % 1_000_000),
        F.lit(1_000_000),
    )
    n_reps = base_reps + F.when(draw < frac_ppm, 1).otherwise(0)
    return (
        docs.select("doc_id", "source")
        .join(F.broadcast(plan), "source")
        .where(n_reps > 0)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(0), n_reps - 1)).alias("repeat_idx"),
        )
        .select("doc_id", "source", "repeat_idx")
    )


# A token is in-vocabulary when it appears at least this many times in
# the corpus (the same heavy-hitter bound as the inverted index: the
# vocab size is structurally <= total_tokens / threshold, so the vocab
# frame always broadcasts).
VOCAB_MIN_COUNT = 200


@register(
    "vocab_oov_rate",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ), vocab AS (
            SELECT tok FROM toks GROUP BY tok
            HAVING count(*) >= {VOCAB_MIN_COUNT}
        )
        SELECT t.doc_id,
               count(*)::BIGINT AS n_tokens,
               sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)::BIGINT
                   AS n_oov,
               round(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)::DOUBLE
                     / count(*), 6) AS oov_rate
        FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
        GROUP BY t.doc_id
    """,
    doc=f"""Tokenizer vocabulary coverage: per-document out-of-vocabulary
    token rate against the corpus heavy-hitter vocabulary (count >=
    {VOCAB_MIN_COUNT}) — the statistic that decides whether a tokenizer
    vocab fits a new data source.  Scale shape: the vocabulary is
    bounded by construction (<= total_tokens / {VOCAB_MIN_COUNT}) so it
    broadcast-joins against the token stream; counts are one keyed
    groupBy per side; no window, no collect.""",
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    # NOT persisted: the token stream feeds both the vocabulary
    # aggregate and the join-back pass, but it is corpus-scale — the
    # 100 TB shape recomputes the narrow explode from the columnar scan
    # rather than caching the token stream (same rationale as
    # bm25_topk / boilerplate_shingle_prune).
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= VOCAB_MIN_COUNT)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    is_oov = F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(is_oov).cast("long").alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
        )
    )
