"""Training-data pipeline queries, round 2: quality/repetition signals
(Gopher-style), blocklist redaction, stratified sampling, n-gram
contamination checks, and int8 embedding quantization.

These extend the north-star families (dedup / text analysis / sampling /
similarity) with the remaining operations a 100 TB pretraining pipeline
runs between crawl and tokenizer — each one a single declarative plan
(array expressions and keyed aggregates; the only shuffles are on
doc_id / shingle keys), each oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table
from .registry import register


@register(
    "quality_repetition_signals",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS n
            FROM documents
        ),
        tok_counts AS (
            SELECT doc_id, tok, count(*) AS c
            FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
            GROUP BY doc_id, tok
        ),
        tok_stats AS (
            SELECT doc_id,
                   max(c) AS top_c,
                   sum(c) AS n,
                   count(*) AS n_distinct
            FROM tok_counts GROUP BY doc_id
        ),
        bigrams AS (
            SELECT doc_id,
                   list_transform(generate_series(1, n - 1),
                                  i -> toks[i] || ' ' || toks[i + 1]) AS bg
            FROM t WHERE n >= 2
        )
        SELECT s.doc_id,
               s.n::BIGINT AS n_tokens,
               round(s.n_distinct / s.n, 4) AS distinct_ratio,
               round(s.top_c / s.n, 4) AS top_token_frac,
               round(1.0 - len(list_distinct(b.bg)) / len(b.bg), 4)
                   AS dup_bigram_frac
        FROM tok_stats s JOIN bigrams b USING (doc_id)
    """,
    doc="""Repetition quality signals (Gopher / RefinedWeb filters):
    per-document type-token ratio, most-frequent-token fraction, and
    duplicate-bigram fraction — the standard screens for degenerate or
    boilerplate text before pretraining.  Bigram stats are pure array
    expressions (zero shuffle); token frequencies group on
    (doc_id, token), one keyed shuffle that AQE coalesces.  At 100 TB
    every stage is partitioned by doc_id.""",
)
def quality_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    t = docs.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).withColumn("n", F.size("toks"))
    tok_stats = (
        t.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(
            F.max("count").alias("top_c"),
            F.sum("count").alias("n"),
            F.count("*").alias("n_distinct"),
        )
    )
    bigrams = t.where(F.col("n") >= 2).select(
        "doc_id",
        F.expr(
            "transform(sequence(1, n - 1), i -> concat(toks[i-1], ' ', toks[i]))"
        ).alias("bg"),
    )
    return tok_stats.join(bigrams, "doc_id").select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.round(F.col("n_distinct") / F.col("n"), 4).alias("distinct_ratio"),
        F.round(F.col("top_c") / F.col("n"), 4).alias("top_token_frac"),
        F.round(
            1.0 - F.size(F.array_distinct("bg")) / F.size("bg"), 4
        ).alias("dup_bigram_frac"),
    )


# Stand-in blocklist: the synthetic corpus carries no real PII (no
# digits, emails, or names), so the redaction path is exercised with
# frequent corpus tokens.  Production swaps the pattern for the usual
# email/phone/SSN regexes — the plan is identical (one regexp pass,
# zero shuffle).
REDACT_PATTERN = r"\b(value|table|row)\b"
REDACT_TOKEN = "[REDACTED]"


@register(
    "pii_redact_blocklist",
    oracle=f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{REDACT_PATTERN}'))::BIGINT
                   AS n_redacted,
               md5(regexp_replace(text, '{REDACT_PATTERN}', '{REDACT_TOKEN}', 'g'))
                   AS redacted_hash
        FROM documents
    """,
    doc="""PII/blocklist redaction (scrubbing stage of every corpus
    pipeline): replace blocklisted spans with a redaction token and
    count the hits.  A single regexp pass per document — stays inside
    whole-stage codegen, no shuffle; the redacted text is compared by
    md5 so the oracle checks the full output without hauling text
    through the hasher.""",
)
def pii_redact_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(REDACT_PATTERN), F.lit(0)))
        .cast("long")
        .alias("n_redacted"),
        F.md5(F.regexp_replace("text", REDACT_PATTERN, REDACT_TOKEN)).alias(
            "redacted_hash"
        ),
    )


# Per-language sampling fractions (percent): the high-resource language
# is downsampled, the rest kept at a higher rate — the standard
# rebalancing move.  Membership is the same portable md5 bucket as
# dataset_split_train_test: a pure function of doc_id, reproducible
# across engines, partition layouts, and incremental growth.
STRATA_PCT = {"en": 30, "de": 80, "fr": 80, "es": 80, "zh": 80}


@register(
    "stratified_sample_by_lang",
    oracle=f"""
        WITH flagged AS (
            SELECT lang,
                   CASE lang
                       {' '.join(f"WHEN '{k}' THEN {v}" for k, v in STRATA_PCT.items())}
                       ELSE 0 END
                       > (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100)
                       AS keep
            FROM documents
        )
        SELECT lang,
               count(*) AS n_total,
               sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_sampled
        FROM flagged GROUP BY lang
    """,
    doc="""Stratified (per-language) deterministic sampling: each
    language keeps its own fraction via the portable hash bucket, so
    the high-resource stratum is downsampled without a shuffle — the
    keep-predicate is evaluated at the scan and the only aggregation is
    the per-stratum audit count.  Unlike ``sampleBy``'s RNG, membership
    is stable across reruns and engines (seedless reproducibility).""",
)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import portable_hash32

    docs = load_table(spark, "documents", sf_dir)
    pct = F.lit(0)
    for k, v in STRATA_PCT.items():
        pct = F.when(F.col("lang") == k, F.lit(v)).otherwise(pct)
    keep = pct > portable_hash32(F.col("doc_id").cast("string")) % 100
    return (
        docs.withColumn("keep", keep)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_sampled"),
        )
    )


# Shingle width for the contamination check.  Real benchmark-decontam
# uses 8–13-gram overlap; the synthetic corpus draws from a ~40-word
# vocabulary, so 3-grams are used to make collisions (and therefore the
# join path) actually exercisable at test scale.
CONTAM_NGRAM = 3
CONTAM_BENCH_DOCS = 20


@register(
    "ngram_contamination_check",
    oracle=f"""
        WITH shingled AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       generate_series(1, len(string_split(text, ' ')) - {CONTAM_NGRAM - 1}),
                       i -> array_to_string(
                           array_slice(string_split(text, ' '), i, i + {CONTAM_NGRAM - 1}),
                           ' ')))) AS shingle
            FROM documents
        ),
        bench AS (SELECT * FROM shingled WHERE doc_id < {CONTAM_BENCH_DOCS}),
        corpus AS (SELECT * FROM shingled WHERE doc_id >= {CONTAM_BENCH_DOCS})
        SELECT c.doc_id,
               count(DISTINCT c.shingle) AS n_shared_ngrams,
               count(DISTINCT b.doc_id) AS n_bench_docs
        FROM corpus c JOIN bench b ON c.shingle = b.shingle
        GROUP BY c.doc_id
    """,
    doc="""Benchmark-contamination check (decontamination stage): corpus
    documents sharing any {CONTAM_NGRAM}-gram with the benchmark set
    (stand-in: doc_id < {CONTAM_BENCH_DOCS}), with how many distinct
    shingles and benchmark docs each hits.  Shingling is an array
    expression; the only shuffle is the equi-join on the shingle key —
    the benchmark side is tiny and broadcasts, so at 100 TB this is a
    map-side probe of a broadcast hash set, the exact shape real
    decontam pipelines use (hash the shingles to fixed-width ints when
    the probe set outgrows broadcast).""",
)
def ngram_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    shingled = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, greatest(size(split(text, ' ')) - {CONTAM_NGRAM - 1}, 0)),"
                    f" i -> array_join(slice(split(text, ' '), i, {CONTAM_NGRAM}), ' '))"
                )
            )
        ).alias("shingle"),
    )
    bench = shingled.where(F.col("doc_id") < CONTAM_BENCH_DOCS).select(
        F.col("doc_id").alias("bench_doc_id"), "shingle"
    )
    corpus = shingled.where(F.col("doc_id") >= CONTAM_BENCH_DOCS)
    return (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_shared_ngrams"),
            F.countDistinct("bench_doc_id").alias("n_bench_docs"),
        )
    )


@register(
    "embedding_int8_quantization",
    oracle="""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        scaled AS (
            SELECT vec_id, v,
                   list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
            FROM e
        )
        SELECT vec_id,
               round(scale, 6) AS scale,
               round(list_max(list_transform(v,
                   x -> abs(x - floor(x / scale + 0.5) * scale))), 6)
                   AS max_abs_err,
               len(list_filter(v, x -> abs(floor(x / scale + 0.5)) >= 127))::BIGINT
                   AS n_saturated
        FROM scaled WHERE scale > 0
    """,
    doc="""Symmetric int8 embedding quantization audit (vector-store /
    retrieval-infra staple): per-vector scale = max|x|/127, quantized
    value floor(x/scale + 0.5) (explicit half-up — identical in both
    engines, unlike round()'s engine-specific ties), reporting the
    reconstruction error bound and saturation count.  Pure array
    expressions per row — zero shuffle, codegen throughout; the same
    expressions write the int8 column in a real export job.""",
)
def embedding_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    scaled = e.withColumn(
        "scale", F.expr("array_max(transform(v, x -> abs(x))) / 127.0")
    )
    return scaled.where(F.col("scale") > 0).select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.round(
            F.expr("array_max(transform(v, x -> abs(x - floor(x / scale + 0.5) * scale)))"),
            6,
        ).alias("max_abs_err"),
        F.expr("size(filter(v, x -> abs(floor(x / scale + 0.5)) >= 127))")
        .cast("long")
        .alias("n_saturated"),
    )
