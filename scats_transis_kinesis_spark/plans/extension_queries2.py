"""Second batch of north-star extension queries: embedding-cosine
near-dup and BPE-style token counting."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


from ..sources.loaders import load_table
from .registry import register

# GPT-2-flavored coarse token classes: letter runs, digit runs, single
# other non-space symbols.  Same regex semantics in Java (Spark) and
# RE2 (DuckDB) for this class-only pattern.
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"

EMBED_DUP_THRESHOLD = 0.4  # tuned to the synthetic corpus (max pair ≈ 0.51)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        )
        SELECT id_a, id_b, cosine_sim FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine_sim
            FROM e a JOIN e b ON a.vec_id < b.vec_id
        ) WHERE cosine_sim >= {EMBED_DUP_THRESHOLD}
    """,
    doc="""Embedding-cosine near-duplicate pairs (north star).  Declared
    form is the exact all-pairs baseline (broadcast nested-loop —
    fine at sf, O(n²) by definition); the 100 TB path runs the same
    scoring inside IVF buckets (operators/similarity.py:
    cosine_topk_bucketed's assignment) so only same-cluster pairs are
    scored.""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Norms hoisted to per-row columns before the pair join (round-10,
    # similarity.cosine_with_norms): the interpreted norm fold runs
    # once per ROW instead of once per pair per side; bit-identical.
    from ..operators.similarity import _norm, cosine_with_norms

    e = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    a = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        _norm(F.col("embedding")).alias("_na"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        _norm(F.col("embedding")).alias("_nb"),
    )
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(
                cosine_with_norms(
                    F.col("va"), F.col("vb"), F.col("_na"), F.col("_nb")
                ),
                6,
            ).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= EMBED_DUP_THRESHOLD)
    )


@register(
    "text_bpe_tokens",
    oracle=f"""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_ws_tokens,
               len(regexp_extract_all(lower(text), '{BPE_PATTERN}')) AS n_bpe_tokens,
               round(length(text)::DOUBLE
                     / len(regexp_extract_all(lower(text), '{BPE_PATTERN}')), 6)
                   AS chars_per_token
        FROM documents
    """,
    doc="""Token counting two ways (north star): whitespace tokens and a
    BPE-ish regex class count (letter runs / digit runs / symbols) —
    the standard cheap proxy for LLM token budgeting.  Pure codegen'd
    column expressions.""",
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    bpe_count = F.regexp_count(F.lower("text"), F.lit(BPE_PATTERN))
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        bpe_count.alias("n_bpe_tokens"),
        F.round(F.length("text") / bpe_count, 6).alias("chars_per_token"),
    )


@register(
    "text_tfidf_top_terms",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
        ),
        dfreq AS (
            SELECT term, count(*) AS df FROM tf GROUP BY term
        ),
        n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id, term, tf, df,
               round(tf * ln(n_docs::DOUBLE / df), 4) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
        QUALIFY row_number() OVER (
            PARTITION BY doc_id ORDER BY tf DESC, df ASC, term ASC) <= 3
    """,
    doc="""Top-3 TF-IDF keywords per document (north star text
    analysis; operators/text.py:tfidf_top_terms).  Integer-only ranking
    (tf, df, term) so the reported float score never decides order.""",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import tfidf_top_terms

    return tfidf_top_terms(load_table(spark, "documents", sf_dir))


@register(
    "sim_topk_vectorized",
    # Same oracle as sim_topk_bruteforce: the vectorized operator is an
    # exact computation of the same top-k (round-6 scores, id tiebreak).
    oracle="""
        WITH q AS (
            SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
        ), pairs AS (
            SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
                   round(
                     list_dot_product(q.qv, c.embedding::DOUBLE[])
                     / (sqrt(list_dot_product(q.qv, q.qv))
                        * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
                     6) AS cosine_sim
            FROM q JOIN embeddings c ON c.vec_id <> q.qid
        )
        SELECT query_id, neighbor_id, cosine_sim FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rn
            FROM pairs
        ) WHERE rn <= 5
    """,
    doc="""Exact top-5 cosine via Arrow-batched numpy matmul with
    per-batch partial top-k (operators/similarity.py:
    cosine_topk_vectorized) — the extreme-throughput twin of
    sim_topk_bruteforce, hash-checked against the same independent
    oracle.  The one sanctioned ArrowEvalPython/MapInPandas stage
    besides the multimodal decode.""",
)
def sim_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_topk_vectorized

    return cosine_topk_vectorized(
        load_table(spark, "embeddings", sf_dir), query_ids=[0, 1, 2, 3, 4], k=5
    )


CHUNK_TOKENS = 50
CHUNK_STRIDE = 25


@register(
    "text_chunking",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        )
        SELECT doc_id, chunk_idx,
               array_to_string(w[chunk_idx * {CHUNK_STRIDE} + 1 :
                                 chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' ')
                   AS chunk_text,
               least(len(w) - chunk_idx * {CHUNK_STRIDE}, {CHUNK_TOKENS})
                   AS n_tokens
        FROM t, LATERAL (
            SELECT unnest(generate_series(
                0, greatest(0, (len(w) - 1) // {CHUNK_STRIDE})
            )) AS chunk_idx
        )
        WHERE chunk_idx * {CHUNK_STRIDE} < len(w)
          AND (chunk_idx = 0 OR chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS} - {CHUNK_STRIDE} < len(w))
    """,
    doc="""Overlapping token-window chunking (LLM training staple):
    each document splits into {CHUNK_TOKENS}-token chunks with stride
    {CHUNK_STRIDE}; trailing windows fully contained in the previous
    chunk are suppressed.  Pure sequence+slice expressions — the chunker
    runs in the scan stage, no shuffle, no Python.""",
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    w = F.split("text", " ")
    toks = docs.select("doc_id", w.alias("w"), F.size(w).alias("n"))
    max_idx = F.greatest(
        F.lit(0), ((F.col("n") - 1) / CHUNK_STRIDE).cast("int")
    )
    exploded = toks.select(
        "doc_id", "w", "n",
        F.explode(F.sequence(F.lit(0), max_idx)).alias("chunk_idx"),
    ).where(
        (F.col("chunk_idx") * CHUNK_STRIDE < F.col("n"))
        & (
            (F.col("chunk_idx") == 0)
            | (F.col("chunk_idx") * CHUNK_STRIDE + CHUNK_TOKENS - CHUNK_STRIDE < F.col("n"))
        )
    )
    return exploded.select(
        "doc_id",
        "chunk_idx",
        F.concat_ws(
            " ", F.slice("w", F.col("chunk_idx") * CHUNK_STRIDE + 1, CHUNK_TOKENS)
        ).alias("chunk_text"),
        F.least(
            F.col("n") - F.col("chunk_idx") * CHUNK_STRIDE, F.lit(CHUNK_TOKENS)
        ).alias("n_tokens"),
    )


PACK_BUDGET = 1024
# Bucket count for the hierarchical prefix sum in pack_context_windows.
# The driver collects exactly this many (bucket, total) scalars; at 1000
# executors raise it to ~4x the executor count so buckets stay small.
PACK_NUM_BUCKETS = 64


@register(
    "pack_context_windows",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, len(string_split(text, ' ')) AS n,
                   sum(len(string_split(text, ' '))) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
            FROM documents
        ),
        spans AS (
            SELECT doc_id, n, cum, cum - n AS start,
                   ((cum - n) // {PACK_BUDGET})::BIGINT AS first_w,
                   ((cum - 1) // {PACK_BUDGET})::BIGINT AS last_w
            FROM t
        )
        SELECT w AS window_id, doc_id,
               (least(cum, (w + 1) * {PACK_BUDGET})
                   - greatest(start, w * {PACK_BUDGET}))::BIGINT AS tokens_in_window
        FROM spans, LATERAL (
            SELECT unnest(generate_series(first_w, last_w)) AS w)
    """,
    doc="""Sequence packing (LLM pretraining staple): documents
    concatenated in id order and sliced into fixed {PACK_BUDGET}-token
    context windows; emits which windows each document spans and how
    many tokens it contributes to each.  The global cumsum is computed
    as an explicit HIERARCHICAL prefix sum (Spark single-partitions an
    ORDER-BY-only window, so we never use one): docs are bucketed into
    PACK_NUM_BUCKETS contiguous id ranges, the running sum is windowed
    PER BUCKET (bounded partitions), and only the per-bucket totals —
    exactly PACK_NUM_BUCKETS rows — are collected to the driver to
    compute cumulative offsets, which broadcast-join back.  Same
    summary-collect pattern as RDD.zipWithIndex; at 100 TB every stage
    stays partitioned and the driver sees O(buckets) scalars.  The
    bucket bounds come from parquet footer statistics (catalog stats at
    cluster scale), so exactly ONE Spark job runs before the main query
    — round 2 ran three (cache populate + min/max + totals) and paid
    ~11 s of orchestration overhead at sf0.1; round 4 measures 0.85 s.
    The remaining pre-job is irreducible without caching corpus-scale
    data: per-bucket TOKEN totals are computed from ``text`` (footer
    stats only cover stored columns), and materializing the tokenized
    frame to share it between the totals pass and the main pass is the
    cache-the-token-stream anti-pattern the engine deliberately avoids
    — two narrow scans beat a corpus-scale cache at 100 TB.""",
)
def pack_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..sources.loaders import parquet_column_minmax

    docs = load_table(spark, "documents", sf_dir)
    n = F.size(F.split("text", " "))
    base = docs.select("doc_id", n.alias("n"))

    # Order-preserving deterministic bucketing by id range: bucket k holds
    # doc_ids in [lo + k*width, lo + (k+1)*width), so bucket order == id
    # order and the per-bucket cumsum + bucket offset is the global cumsum.
    # Key bounds from footer stats — no scan job; fall back to one agg.
    bounds = parquet_column_minmax(f"{sf_dir}/documents.parquet", "doc_id")
    if bounds is None:
        bounds = base.agg(F.min("doc_id"), F.max("doc_id")).first()
    lo, hi = bounds
    width = max(1, -(-(int(hi) - int(lo) + 1) // PACK_NUM_BUCKETS))
    t = base.withColumn("bucket", F.floor((F.col("doc_id") - int(lo)) / width))

    totals = [
        (int(r["bucket"]), int(r["total"]))
        for r in t.groupBy("bucket").agg(F.sum("n").alias("total")).collect()
    ]
    running, offsets = 0, []
    for b, tot in sorted(totals):
        offsets.append((b, running))
        running += tot
    off_df = spark.createDataFrame(offsets, "bucket long, offset long")

    local_cum = F.sum("n").over(
        W.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    t = (
        t.withColumn("local_cum", local_cum)
        .join(F.broadcast(off_df), "bucket")
        .select("doc_id", "n", (F.col("local_cum") + F.col("offset")).alias("cum"))
    )
    spans = t.select(
        "doc_id", "n", "cum",
        (F.col("cum") - F.col("n")).alias("start"),
        F.floor((F.col("cum") - F.col("n")) / PACK_BUDGET).alias("first_w"),
        F.floor((F.col("cum") - 1) / PACK_BUDGET).alias("last_w"),
    )
    return spans.select(
        F.explode(F.sequence("first_w", "last_w")).alias("window_id"),
        "doc_id",
        "start",
        "cum",
    ).select(
        "window_id",
        "doc_id",
        (
            F.least(F.col("cum"), (F.col("window_id") + 1) * PACK_BUDGET)
            - F.greatest(F.col("start"), F.col("window_id") * PACK_BUDGET)
        ).alias("tokens_in_window"),
    )


def _sentiment_oracle() -> str:
    from ..operators.text import NEGATIVE_WORDS, POSITIVE_WORDS

    pos = ", ".join(f"'{w}'" for w in POSITIVE_WORDS)
    neg = ", ".join(f"'{w}'" for w in NEGATIVE_WORDS)
    return f"""
        WITH t AS (
            SELECT doc_id,
                   list_transform(string_split(text, ' '), w -> lower(w)) AS toks,
                   len(string_split(text, ' ')) AS n_toks
            FROM documents
        )
        SELECT doc_id,
               len(list_intersect(toks, [{pos}])) AS n_positive,
               len(list_intersect(toks, [{neg}])) AS n_negative,
               round((len(list_intersect(toks, [{pos}]))
                      - len(list_intersect(toks, [{neg}])))::DOUBLE / n_toks, 6)
                   AS sentiment
        FROM t
    """


@register(
    "text_sentiment_lexicon",
    oracle=_sentiment_oracle(),
    doc="""Lexicon-based sentiment scoring (north star text analysis;
    cf. PAPERS.md EDBT'16 Spark sentiment line): distinct positive /
    negative lexicon hits per document, score normalized by token
    count.  Array intersections against literal word lists — a pure
    narrow scan, no shuffle, no UDF
    (operators/text.py:sentiment_score).""",
)
def text_sentiment_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import sentiment_score

    return sentiment_score(load_table(spark, "documents", sf_dir))
