"""Text-analysis operators for training-data pipelines (north star):
tokenization stats, quality scoring, language-ID heuristic, document
fingerprinting.

All pure column expressions (codegen'd, no UDFs): at 100 TB each of
these is a single narrow scan — no shuffle at all until a downstream
aggregation.  Tokenization is a plain single-space split, mirrored
exactly by the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64

# Tiny English stopword list shared with the oracle SQL (keep sorted).
EN_STOPWORDS = ("a", "and", "for", "in", "is", "of", "on", "the", "to", "with")


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token count, char count, mean token length."""
    toks = tokens(text_col)
    return df.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        F.length(text_col).alias("n_chars_measured"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t))
            / F.size(toks),
            6,
        ).alias("mean_token_len"),
    )


def stopword_ratio(text_col: str = "text") -> Column:
    toks = tokens(text_col)
    stop = F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))
    return F.size(stop) / F.size(toks)


def punct_ratio(text_col: str = "text") -> Column:
    """Fraction of characters outside [a-z0-9 ] (lowercased text)."""
    lowered = F.lower(F.col(text_col))
    stripped = F.regexp_replace(lowered, "[a-z0-9 ]", "")
    return F.length(stripped) / F.length(text_col)


def quality_expr(text_col: str = "text") -> Column:
    """The quality heuristic as a bare column expression — composable
    into any batch OR streaming projection (streaming needs the
    expression form: a stream can't route through the id-projected
    :func:`quality_score` frame and join back)."""
    toks = tokens(text_col)
    length_part = F.least(F.size(toks) / F.lit(100.0), F.lit(1.0))
    return F.round(
        0.4 * length_part
        + 0.3 * stopword_ratio(text_col)
        + 0.3 * (1 - punct_ratio(text_col)),
        6,
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic quality heuristic: length saturation + stopword
    presence + punctuation cleanliness, each in [0,1]."""
    toks = tokens(text_col)
    return df.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        F.round(stopword_ratio(text_col), 6).alias("stop_ratio"),
        F.round(punct_ratio(text_col), 6).alias("punct_ratio"),
        quality_expr(text_col).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """N-gram-free language-ID heuristic: English stopword density.

    A real deployment would score character n-grams against per-language
    profiles; the engine-relevant part — a deterministic, vectorized
    classification over tokens — is identical, and the oracle mirrors it
    exactly."""
    ratio = stopword_ratio(text_col)
    return df.select(
        id_col,
        F.round(ratio, 6).alias("en_stop_ratio"),
        F.when(ratio > 0.05, F.lit("en")).otherwise(F.lit("und")).alias("lang_guess"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """60-bit document fingerprints: raw and normalized (lowercase,
    punctuation stripped, whitespace collapsed) — the normalized one
    catches formatting-only duplicates."""
    normalized = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""), " +", " ")
    )
    return df.select(
        id_col,
        portable_hash64(text_col).alias("fp"),
        portable_hash64(normalized).alias("fp_norm"),
    )


def tfidf_top_terms(df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-k TF-IDF terms per document (keyword extraction).

    Two grouped aggregations (term frequency per doc, document frequency
    per term) + a per-doc window — every stage keyed and partial-agg
    friendly.  The corpus size joins in as a broadcast 1-row frame (no
    driver collect in the plan).  Ranking uses only integers
    (tf desc, df asc, term asc): the float score is reported but never
    decides order, so cross-engine log() ulp differences cannot flip
    rows."""
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col), F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4).alias("tfidf"),
        )
    )
    w = W.partitionBy(id_col).orderBy(F.desc("tf"), F.asc("df"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(id_col, "term", "tf", "df", "tfidf")
    )


# Tiny embedded sentiment lexicon (shared verbatim with the oracle SQL).
POSITIVE_WORDS = ("good", "great", "happy", "excellent", "love", "best", "nice")
NEGATIVE_WORDS = ("bad", "terrible", "sad", "awful", "hate", "worst", "poor")


def sentiment_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Lexicon-based sentiment (cf. PAPERS.md EDBT'16 Spark sentiment
    line): score = (positive hits − negative hits) / tokens, computed
    with array intersections against broadcast-literal word lists —
    a pure narrow scan, no join, no shuffle, no UDF."""
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    pos = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in POSITIVE_WORDS])))
    neg = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in NEGATIVE_WORDS])))
    return df.select(
        id_col,
        pos.alias("n_positive"),
        neg.alias("n_negative"),
        F.round((pos - neg) / F.size(tokens(text_col)), 6).alias("sentiment"),
    )
