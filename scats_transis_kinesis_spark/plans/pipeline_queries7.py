"""Round-5 late additions: distribution-matched data selection (DSIR),
context-window packing efficiency, embedding-space anisotropy, and
tokenizer fertility — the remaining curation/efficiency audits a
100 TB pretraining pipeline runs between dedup and training.

- ``dsir_importance_weights`` is the selection step itself (score every
  raw document against a target distribution, keep the top);
- ``packing_efficiency_audit`` prices the context-length choice before
  anyone packs a single batch;
- ``embedding_anisotropy_audit`` is the embedding-health screen run
  before trusting any cosine-based dedup/retrieval downstream;
- ``token_fertility_by_lang`` is the per-language tokenizer-cost audit
  that decides sampling budgets measured in tokens, not documents.

Conventions as everywhere in the registry: identical aliases both
sides, integer-micros quantization wherever a float sum's accumulation
order could flip a rounded digit, broadcast-only small sides, no
driver-side data collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import duckdb_hash32_sql, portable_hash32
from ..operators.text import tokens
from ..sources.loaders import load_table
from .extension_queries2 import BPE_PATTERN
from .registry import register

# Hashed-feature space for DSIR (Xie et al., "Data Selection for
# Language Models via Importance Resampling", NeurIPS'23 — public
# method): unigrams hash into B buckets, and both the target and raw
# distributions are estimated over the SAME bucketed vocabulary, so the
# per-bucket log-ratio table is a bounded B-row broadcast no matter how
# large the corpus vocabulary grows.
DSIR_BUCKETS = 256
DSIR_TARGET_LANG = "en"

# Candidate context lengths priced by packing_efficiency_audit.
PACK_CONTEXT_LENGTHS = (64, 128, 256, 512)


@register(
    "dsir_importance_weights",
    oracle=f"""
        WITH tok AS (
            SELECT d.doc_id, d.lang,
                   {duckdb_hash32_sql('t')} % {DSIR_BUCKETS} AS bucket
            FROM (SELECT doc_id, lang,
                         unnest(string_split(text, ' ')) AS t
                  FROM documents) d
        ), raw_c AS (
            SELECT bucket, count(*) AS cr FROM tok GROUP BY bucket
        ), tgt_c AS (
            SELECT bucket, count(*) AS ct FROM tok
            WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY bucket
        ), tot AS (
            SELECT (SELECT sum(cr) FROM raw_c) AS nr,
                   (SELECT coalesce(sum(ct), 0) FROM tgt_c) AS nt
        ), ratio AS (
            SELECT r.bucket,
                   round((ln((coalesce(t.ct, 0) + 1.0)
                             / (tot.nt + {DSIR_BUCKETS}))
                          - ln((r.cr + 1.0)
                               / (tot.nr + {DSIR_BUCKETS}))) * 1000000)::BIGINT
                       AS ratio_micros
            FROM raw_c r LEFT JOIN tgt_c t USING (bucket) CROSS JOIN tot
        )
        SELECT tok.doc_id,
               count(*)::BIGINT AS n_tokens,
               round(sum(ratio.ratio_micros)::DOUBLE / 1000000.0, 6)
                   AS log_weight
        FROM tok JOIN ratio USING (bucket)
        GROUP BY tok.doc_id
    """,
    doc=f"""DSIR importance weights (Xie et al., NeurIPS'23 — hashed
    n-gram importance resampling): estimate add-one-smoothed unigram
    models of the TARGET distribution (here lang =
    '{DSIR_TARGET_LANG}') and the RAW corpus over {DSIR_BUCKETS} hashed
    buckets, then score every raw document by its summed per-token
    log-likelihood ratio — the importance weight that, sampled
    proportionally, reshapes the raw corpus toward the target.  The
    per-bucket log-ratio is quantized to integer MICROS before the
    per-document sum (the unigram_perplexity_score trick), so partial
    aggregation order can never flip a rounded digit.  Scale shape:
    bucket counting is one {DSIR_BUCKETS}-key groupBy (map-side
    combine collapses it before the shuffle), the ratio table is a
    bounded {DSIR_BUCKETS}-row broadcast, and scoring is the token
    stream joined to that broadcast plus one doc-keyed aggregate — the
    same linear footprint at 100 TB, with no vocabulary-sized state
    anywhere.""",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(
        "doc_id", "lang", F.explode(tokens("text")).alias("t")
    ).select(
        "doc_id",
        "lang",
        (portable_hash32(F.col("t")) % DSIR_BUCKETS).alias("bucket"),
    )
    # ONE tally pass for BOTH unigram models (round-10, session 3: the
    # old shape ran separate raw and target groupBys over the token
    # stream plus a left join to line them up — the conditional count
    # inside one aggregate produces the identical (cr, ct) pairs, with
    # ct = 0 exactly where the old join's coalesce(NULL) landed).  The
    # ≤DSIR_BUCKETS-row tally is pinned: the totals row and the ratio
    # projection both read it, and the final scoring join is the only
    # other token-stream pass — 5 effective corpus scans → 2.
    tally = (
        tok.groupBy("bucket")
        .agg(
            F.count("*").alias("cr"),
            F.sum(
                F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
            ).alias("ct"),
        )
        .localCheckpoint(eager=True)
    )
    tot = tally.agg(
        F.sum("cr").alias("nr"),
        F.coalesce(F.sum("ct"), F.lit(0)).alias("nt"),
    )
    ratio = (
        tally.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                (
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                        / (F.col("nt") + F.lit(DSIR_BUCKETS))
                    )
                    - F.log(
                        (F.col("cr") + F.lit(1.0))
                        / (F.col("nr") + F.lit(DSIR_BUCKETS))
                    )
                )
                * 1_000_000
            )
            .cast("long")
            .alias("ratio_micros"),
        )
    )
    return (
        tok.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(
                F.sum("ratio_micros").cast("double") / 1_000_000.0, 6
            ).alias("log_weight"),
        )
    )


@register(
    "packing_efficiency_audit",
    oracle=f"""
        WITH doc_len AS (
            SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n
            FROM documents
        ), lens AS (
            SELECT unnest([{", ".join(map(str, PACK_CONTEXT_LENGTHS))}])
                AS context_len
        )
        SELECT l.context_len::BIGINT AS context_len,
               count(*)::BIGINT AS n_docs,
               sum(d.n)::BIGINT AS total_tokens,
               sum(((d.n + l.context_len - 1) // l.context_len)
                   * l.context_len)::BIGINT AS total_padded,
               round(sum(d.n)::DOUBLE
                     / sum(((d.n + l.context_len - 1) // l.context_len)
                           * l.context_len), 6) AS pad_efficiency,
               sum(CASE WHEN d.n > l.context_len THEN 1 ELSE 0 END)::BIGINT
                   AS oversize_docs,
               round(sum(CASE WHEN d.n > l.context_len
                              THEN d.n - l.context_len ELSE 0 END)::DOUBLE
                     / sum(d.n), 6) AS trunc_loss_frac
        FROM doc_len d CROSS JOIN lens l
        GROUP BY l.context_len
    """,
    doc=f"""Context-length pricing audit: for each candidate context
    length {PACK_CONTEXT_LENGTHS}, the corpus-wide padding efficiency
    under document-per-window packing (each doc occupies
    ceil(n/L) windows padded to L) and the truncation loss under
    single-window training (tokens beyond L dropped) — the two numbers
    that decide a pretraining context budget BEFORE anyone packs a
    batch (pack_context_windows then executes the chosen L).  All
    aggregates are integer sums, so the round-6 ratios are exact
    regardless of accumulation order.  Scale shape: one scan computes
    per-doc token counts, a {len(PACK_CONTEXT_LENGTHS)}-row literal
    array explodes each doc into its per-L row map-side (no join, no
    extra scan), and the final groupBy carries
    {len(PACK_CONTEXT_LENGTHS)} keys — map-side combine reduces it to
    per-partition scalars before the only shuffle.""",
)
def packing_efficiency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    doc_len = docs.select(
        F.size(tokens("text")).cast("long").alias("n"),
        F.explode(
            F.array(*[F.lit(length) for length in PACK_CONTEXT_LENGTHS])
        ).alias("context_len"),
    )
    padded = (
        F.floor(
            (F.col("n") + F.col("context_len") - 1) / F.col("context_len")
        )
        * F.col("context_len")
    )
    over = F.col("n") > F.col("context_len")
    return (
        doc_len.groupBy(F.col("context_len").cast("long").alias("context_len"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n").cast("long").alias("total_tokens"),
            F.sum(padded).cast("long").alias("total_padded"),
            F.round(
                F.sum("n").cast("double") / F.sum(padded), 6
            ).alias("pad_efficiency"),
            F.sum(over.cast("int")).cast("long").alias("oversize_docs"),
            F.round(
                F.sum(
                    F.when(over, F.col("n") - F.col("context_len")).otherwise(
                        F.lit(0)
                    )
                ).cast("double")
                / F.sum("n"),
                6,
            ).alias("trunc_loss_frac"),
        )
    )


@register(
    "embedding_anisotropy_audit",
    oracle="""
        WITH e AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        ), flat AS (
            SELECT label, unnest(generate_series(1, len(v))) AS idx, v
            FROM e
        ), cent AS (
            SELECT list(cv ORDER BY idx) AS cvec
            FROM (
                SELECT idx, round(avg(v[idx]), 6) AS cv
                FROM flat GROUP BY idx
            )
        ), scored AS (
            SELECT e.vec_id, e.label,
                   round(sqrt(list_dot_product(e.v, e.v)), 6) AS norm6,
                   round(list_dot_product(e.v, c.cvec)
                         / (sqrt(list_dot_product(e.v, e.v))
                            * sqrt(list_dot_product(c.cvec, c.cvec))), 6)
                       AS cos6
            FROM e CROSS JOIN cent c
        )
        SELECT label,
               count(*)::BIGINT AS n_vectors,
               round(avg(norm6), 6) AS avg_norm,
               round(avg(cos6), 6) AS avg_cos_centroid,
               min(cos6) AS min_cos_centroid,
               max(cos6) AS max_cos_centroid,
               round(avg(CASE WHEN cos6 < 0 THEN 1.0 ELSE 0.0 END), 6)
                   AS frac_negative_cos
        FROM scored GROUP BY label
    """,
    doc="""Embedding-space anisotropy audit (Ethayarajh EMNLP'19's
    contextual-anisotropy statistic, per label): every vector's cosine
    to the GLOBAL corpus centroid — a healthy isotropic space averages
    near zero, while a collapsed/anisotropic one (the classic failure
    that silently breaks cosine dedup and retrieval) pushes the average
    toward 1 — plus the norm distribution that exposes near-zero or
    exploding vectors before they poison IVF centroids.  The centroid's
    per-dimension averages round to 6 digits BEFORE the dot product and
    the per-label averages run over already-rounded per-vector values
    (the embedding_label_margin rounded-intermediate contract).  Scale
    shape: the centroid is one exploded (dim)-keyed aggregate —
    |vectors|·dims skinny rows collapsing map-side to dims partials —
    assembled into a single broadcast row; per-vector scoring is one
    corpus scan against that broadcast; the output is |labels| rows.""",
)
def embedding_anisotropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import anisotropy_stats

    return anisotropy_stats(load_table(spark, "embeddings", sf_dir))


@register(
    "token_fertility_by_lang",
    oracle=f"""
        SELECT lang,
               count(*)::BIGINT AS n_docs,
               sum(len(string_split(text, ' ')))::BIGINT AS total_words,
               sum(len(regexp_extract_all(lower(text),
                                          '{BPE_PATTERN}')))::BIGINT
                   AS total_bpe_tokens,
               round(sum(len(regexp_extract_all(lower(text),
                                                '{BPE_PATTERN}')))::DOUBLE
                     / sum(len(string_split(text, ' '))), 6) AS fertility,
               round(sum(length(text))::DOUBLE
                     / sum(len(regexp_extract_all(lower(text),
                                                  '{BPE_PATTERN}'))), 6)
                   AS chars_per_token
        FROM documents GROUP BY lang
    """,
    doc="""Tokenizer fertility by language: BPE-ish tokens per
    whitespace word and characters per token, aggregated per language —
    the audit that converts a document-count sampling budget into the
    token-count budget training actually consumes (languages with high
    fertility cost proportionally more context per word; the standard
    multilingual-mixture correction).  Reuses text_bpe_tokens' regex
    class count, so the two queries stay mutually consistent.  All
    aggregates are integer sums (exact under any accumulation order);
    the round-6 ratios derive from them.  Scale shape: pure codegen'd
    column expressions into a |langs|-key groupBy — map-side combine
    collapses the corpus to per-partition scalars before the only
    shuffle.""",
)
def token_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    words = F.size(F.split("text", " "))
    bpe = F.regexp_count(F.lower("text"), F.lit(BPE_PATTERN))
    return docs.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(words).cast("long").alias("total_words"),
        F.sum(bpe).cast("long").alias("total_bpe_tokens"),
        F.round(
            F.sum(bpe).cast("double") / F.sum(words), 6
        ).alias("fertility"),
        F.round(
            F.sum(F.length("text")).cast("double") / F.sum(bpe), 6
        ).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# Cross-source duplication, vocabulary coverage, embedding contamination.
# ---------------------------------------------------------------------------

from .extension_queries import _STOPLIST_SQL, _minhash_lsh_oracle  # noqa: E402
from .extension_queries2 import EMBED_DUP_THRESHOLD  # noqa: E402

# Vocabulary sizes priced by vocab_coverage_curve.
VOCAB_TOP_NS = (10, 100, 1000)

# The held-out "evaluation" slice for the embedding contamination
# check: one label plays the benchmark set, the rest are training data.
CONTAM_EVAL_LABEL = 9


@register(
    "cross_source_duplication_matrix",
    oracle=f"""
        WITH pairs AS ({_minhash_lsh_oracle()})
        SELECT least(da.source, db.source) AS source_a,
               greatest(da.source, db.source) AS source_b,
               count(*)::BIGINT AS n_pairs,
               round(avg(p.jaccard), 6) AS avg_jaccard
        FROM pairs p
        JOIN documents da ON da.doc_id = p.id_a
        JOIN documents db ON db.doc_id = p.id_b
        GROUP BY 1, 2
    """,
    doc="""Which sources duplicate each other: MinHash-LSH verified
    near-dup pairs rolled up into a (source, source) matrix — the audit
    that exposes two crawls scraping the same sites (off-diagonal mass)
    versus a source republishing itself (diagonal mass), which decides
    whether dedup must run across source boundaries or can shard by
    source.  Reuses the dedup_minhash_lsh pair machinery verbatim (one
    banding shuffle, candidates-only verification) plus two id-keyed
    joins to attach sources and a |sources|²-bounded aggregate.""",
)
def cross_source_duplication_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators import dedup as D

    docs = load_table(spark, "documents", sf_dir)
    pairs = D.minhash_lsh_near_dups(docs)
    src = docs.select("doc_id", "source")
    joined = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("id_a"), F.col("source").alias("sa")
            ),
            "id_a",
        ).join(
            src.select(
                F.col("doc_id").alias("id_b"), F.col("source").alias("sb")
            ),
            "id_b",
        )
    )
    return (
        joined.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.avg("jaccard"), 6).alias("avg_jaccard"),
        )
    )


@register(
    "vocab_coverage_curve",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS t FROM documents
        ), c AS (
            SELECT t, count(*) AS c FROM tok GROUP BY t
        ), r AS (
            SELECT t, c, row_number() OVER (ORDER BY c DESC, t) AS rn FROM c
        ), tot AS (
            SELECT sum(c)::BIGINT AS total, count(*)::BIGINT AS n_types
            FROM c
        ), lens AS (
            SELECT unnest([{", ".join(map(str, VOCAB_TOP_NS))}]) AS top_n
        )
        SELECT l.top_n::BIGINT AS top_n,
               tot.n_types AS n_types,
               sum(CASE WHEN r.rn <= l.top_n THEN r.c ELSE 0 END)::BIGINT
                   AS covered_tokens,
               tot.total AS total_tokens,
               round(sum(CASE WHEN r.rn <= l.top_n THEN r.c ELSE 0 END)::DOUBLE
                     / tot.total, 6) AS coverage
        FROM r CROSS JOIN lens l CROSS JOIN tot
        GROUP BY l.top_n, tot.n_types, tot.total
    """,
    doc=f"""Vocabulary coverage curve: what fraction of the token
    stream the top-N most frequent types cover, for N in
    {VOCAB_TOP_NS} — the statistic that prices a tokenizer vocabulary
    size (the marginal coverage of the next thousand types) and
    complements vocab_oov_rate's fixed-vocab view.  The global
    frequency rank uses the hierarchical row_number (range-bucketed
    per-bucket windows + a num_buckets-scalar offset collect — never an
    unpartitioned window), ties broken (count DESC, token ASC).  Scale
    shape: one token-keyed groupBy builds the frequency table; the
    curve itself is a {len(VOCAB_TOP_NS)}-key conditional aggregate
    over |vocab| skinny rows.""",
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import hierarchical_row_number

    docs = load_table(spark, "documents", sf_dir)
    counts = (
        docs.select(F.explode(tokens("text")).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c"))
    )
    ranked = hierarchical_row_number(
        counts, (-F.col("c")).cast("double"), "t", out="rn"
    )
    tot = counts.agg(
        F.sum("c").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_types"),
    )
    return (
        ranked.select(
            "c",
            "rn",
            F.explode(
                F.array(*[F.lit(n) for n in VOCAB_TOP_NS])
            ).alias("top_n"),
        )
        .groupBy(F.col("top_n").cast("long").alias("top_n"))
        .agg(
            F.sum(F.when(F.col("rn") <= F.col("top_n"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("covered_tokens")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "top_n",
            "n_types",
            "covered_tokens",
            F.col("total").alias("total_tokens"),
            F.round(
                F.col("covered_tokens").cast("double") / F.col("total"), 6
            ).alias("coverage"),
        )
    )


@register(
    "embedding_contamination_check",
    oracle=f"""
        WITH ev AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            WHERE label = {CONTAM_EVAL_LABEL}
        ), tr AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            WHERE label <> {CONTAM_EVAL_LABEL}
        ), scored AS (
            SELECT ev.vec_id AS eval_id, tr.vec_id AS train_id,
                   round(list_dot_product(ev.v, tr.v)
                         / (sqrt(list_dot_product(ev.v, ev.v))
                            * sqrt(list_dot_product(tr.v, tr.v))), 6)
                       AS cosine_sim
            FROM ev CROSS JOIN tr
        )
        SELECT eval_id, train_id AS best_train_id,
               cosine_sim AS best_sim,
               cosine_sim >= {EMBED_DUP_THRESHOLD} AS contaminated
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY eval_id
                ORDER BY cosine_sim DESC, train_id) AS rn
            FROM scored
        ) WHERE rn = 1
    """,
    doc=f"""Semantic train/eval contamination check: for every vector
    in the held-out slice (label {CONTAM_EVAL_LABEL} plays the
    benchmark set), its nearest training vector by cosine and whether
    that similarity crosses the near-dup threshold
    ({EMBED_DUP_THRESHOLD}) — the embedding-space complement to
    ngram_contamination_check (exact n-gram overlap misses paraphrased
    leakage; embedding similarity catches it).  Scored via the
    Arrow-batched BLAS scorer (operators/similarity.py:
    nearest_cross_vectorized — the sim_topk_vectorized machinery): the
    eval matrix ships in the UDF closure (|eval| rows is the only
    driver collect; benchmark sets are small by construction), each
    corpus batch emits its per-batch best per query, and a window picks
    the global winner — round-then-rank with train_id tie-break,
    matching the oracle exactly.  At 100 TB the same scoring runs
    IVF-bucketed (cosine_topk_bucketed) so only same-cluster pairs are
    scored.""",
)
def embedding_contamination_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.similarity import nearest_cross_vectorized

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    ev = emb.where(F.col("label") == CONTAM_EVAL_LABEL).select(
        F.col("vec_id").alias("eval_id"), "v"
    )
    tr = emb.where(F.col("label") != CONTAM_EVAL_LABEL).select(
        F.col("vec_id").alias("train_id"), "v"
    )
    best = nearest_cross_vectorized(tr, ev)
    return best.select(
        "eval_id",
        F.col("train_id").alias("best_train_id"),
        F.col("cosine_sim").alias("best_sim"),
        (F.col("cosine_sim") >= EMBED_DUP_THRESHOLD).alias("contaminated"),
    )


# Centered moving-average half-window for the trend component (hours):
# 12 preceding + current + 12 following = a 25-hour window, wide enough
# to absorb the daily cycle into the seasonal term.
DECOMP_HALF_WINDOW = 12


@register(
    "trend_seasonal_decompose",
    oracle=f"""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   count(*)::BIGINT AS observed
            FROM events GROUP BY 1, 2
        ), t AS (
            SELECT event_type, hour, observed,
                   round(avg(observed) OVER (
                       PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN {DECOMP_HALF_WINDOW} PRECEDING
                                AND {DECOMP_HALF_WINDOW} FOLLOWING), 6)
                       AS trend
            FROM hourly
        ), s AS (
            SELECT event_type, extract(hour FROM hour) AS hod,
                   round(sum(round((observed - trend) * 1000000))::DOUBLE
                         / count(*) / 1000000.0, 6) AS seasonal
            FROM t GROUP BY 1, 2
        )
        SELECT t.event_type, t.hour, t.observed, t.trend, s.seasonal,
               round(t.observed - t.trend - s.seasonal, 6) AS residual
        FROM t JOIN s ON s.event_type = t.event_type
                     AND s.hod = extract(hour FROM t.hour)
    """,
    doc=f"""Additive trend/seasonal/residual decomposition of the
    hourly event stream (the moving-average core of STL, per event
    type): trend = centered {2 * DECOMP_HALF_WINDOW + 1}-hour moving
    average (a rows-frame window PARTITIONED by type — never
    unpartitioned), seasonal = mean detrended value per (type,
    hour-of-day), residual = the rest — the decomposition behind
    capacity planning and anomaly baselines (anomaly_zscore_hours
    flags offsets from a STATIONARY mean; this separates the cyclic
    part first).  Cross-engine determinism is structural: observed is
    an integer count, so the frame average is an exact small-denominator
    rational in double (no accumulation-order hazard), and the seasonal
    mean runs over integer-micros quantized diffs.  Scale shape: one
    (type, hour)-keyed aggregate collapses the raw stream; everything
    after runs on |types|·|hours| skinny rows — one partitioned window,
    one {24}-key-per-type aggregate, one broadcast-sized join back.""",
)
def trend_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    events = load_table(spark, "events", sf_dir)
    hourly = (
        events.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(F.count("*").cast("long").alias("observed"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-DECOMP_HALF_WINDOW, DECOMP_HALF_WINDOW)
    )
    t = hourly.withColumn("trend", F.round(F.avg("observed").over(w), 6))
    s = (
        t.groupBy("event_type", F.hour("hour").alias("hod"))
        .agg(
            F.round(
                F.sum(
                    F.round((F.col("observed") - F.col("trend")) * 1_000_000)
                ).cast("double")
                / F.count("*")
                / 1_000_000.0,
                6,
            ).alias("seasonal")
        )
    )
    return (
        t.withColumn("hod", F.hour("hour"))
        .join(F.broadcast(s), ["event_type", "hod"])
        .select(
            "event_type",
            "hour",
            "observed",
            "trend",
            "seasonal",
            F.round(
                F.col("observed") - F.col("trend") - F.col("seasonal"), 6
            ).alias("residual"),
        )
    )


# Attribution lookback window (minutes) for multitouch_attribution.
ATTRIB_LOOKBACK_MIN = 60


@register(
    "multitouch_attribution",
    oracle=f"""
        WITH purchases AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase'
        ), touches AS (
            SELECT user_id, ts, event_type FROM events
            WHERE event_type IN ('click', 'view')
        ), joined AS (
            SELECT p.event_id, p.value, t.event_type AS touch_type,
                   count(*) OVER (PARTITION BY p.event_id) AS n_touch
            FROM purchases p
            JOIN touches t
              ON t.user_id = p.user_id
             AND t.ts < p.ts
             AND t.ts >= p.ts - INTERVAL {ATTRIB_LOOKBACK_MIN} MINUTE
        ), shares AS (
            SELECT touch_type,
                   round(p_value_micros / n_touch) AS share_micros
            FROM (SELECT touch_type, n_touch,
                         value * 1000000 AS p_value_micros
                  FROM joined)
        ), attributed AS (
            SELECT touch_type,
                   count(*)::BIGINT AS n_touches,
                   round(sum(share_micros)::DOUBLE / 1000000.0, 4)
                       AS attributed_revenue
            FROM shares GROUP BY touch_type
        ), direct AS (
            SELECT 'direct' AS touch_type,
                   count(*)::BIGINT AS n_touches,
                   round(sum(value), 4) AS attributed_revenue
            FROM purchases p
            WHERE NOT EXISTS (
                SELECT 1 FROM touches t
                WHERE t.user_id = p.user_id AND t.ts < p.ts
                  AND t.ts >= p.ts - INTERVAL {ATTRIB_LOOKBACK_MIN} MINUTE)
        )
        SELECT * FROM attributed UNION ALL SELECT * FROM direct
    """,
    doc=f"""Linear multi-touch revenue attribution: each purchase's
    value splits equally across the user's click/view touches in the
    preceding {ATTRIB_LOOKBACK_MIN} minutes, summed per touch type —
    with purchases that had no touches reported as 'direct' (the
    completeness row single-touch attribution silently drops).  The
    as-of family answers LAST-touch; this is the fractional-credit
    complement.  Per-touch shares quantize to integer micros BEFORE
    the per-type sum (HALF_UP both engines), so accumulation order
    never flips a digit.  Scale shape: the touch join is the
    range_join_ship_lag pattern — an equi-join on user_id with the
    time-band predicate evaluated post-join (never a cartesian; at
    100 TB both sides bucket by user) — the per-purchase touch count
    is a purchase-keyed window on the join output, and 'direct' is an
    anti-join of the same shape.""",
)
def multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    events = load_table(spark, "events", sf_dir)
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("pts"), "value"
    )
    touches = events.where(
        F.col("event_type").isin("click", "view")
    ).select("user_id", F.col("ts").alias("tts"), F.col("event_type").alias("touch_type"))
    band = (F.col("tts") < F.col("pts")) & (
        F.col("tts") >= F.col("pts") - F.expr(f"INTERVAL {ATTRIB_LOOKBACK_MIN} MINUTE")
    )
    joined = purchases.join(touches, ["user_id"]).where(band)
    w = W.partitionBy("event_id")
    shares = joined.select(
        "touch_type",
        F.round(
            (F.col("value") * 1_000_000) / F.count("*").over(w)
        ).alias("share_micros"),
    )
    attributed = shares.groupBy("touch_type").agg(
        F.count("*").cast("long").alias("n_touches"),
        F.round(F.sum("share_micros") / 1_000_000.0, 4).alias(
            "attributed_revenue"
        ),
    )
    touched_ids = joined.select("event_id").distinct()
    direct = (
        purchases.join(touched_ids, "event_id", "left_anti")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.round(F.sum("value"), 4).alias("attributed_revenue"),
        )
        .select(
            F.lit("direct").alias("touch_type"),
            "n_touches",
            "attributed_revenue",
        )
    )
    return attributed.unionByName(direct)


@register(
    "referential_integrity_audit",
    oracle="""
        SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
               (SELECT count(*) FROM lineitem)::BIGINT AS n_child,
               (SELECT count(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))::BIGINT
                   AS n_orphans
        UNION ALL
        SELECT 'orders.o_custkey->customer',
               (SELECT count(*) FROM orders)::BIGINT,
               (SELECT count(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))::BIGINT
        UNION ALL
        SELECT 'customer.c_nationkey->nation',
               (SELECT count(*) FROM customer)::BIGINT,
               (SELECT count(*) FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM nation n
                                  WHERE n.n_nationkey = c.c_nationkey))::BIGINT
    """,
    doc="""Referential-integrity audit across the fact spine: orphan
    counts for the three FK edges (lineitem→orders, orders→customer,
    customer→nation) — the cross-TABLE data-quality check
    dq_constraint_audit's per-column rules cannot see, and the first
    audit run after any ingest that can partially fail.  Each edge is
    one left-anti join: parent keys broadcast where bounded
    (nation, customer at their dimension scale); the lineitem→orders
    edge shuffles both sides on the key at 100 TB — the unavoidable
    full-scan DQ cost, paid as one pass per edge with only counts
    surviving.""",
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)

    def edge(name, child, key, parent, pkey, broadcast_parent):
        p = parent.select(F.col(pkey).alias(key)).distinct()
        if broadcast_parent:
            p = F.broadcast(p)
        orphans = child.select(key).join(p, key, "left_anti")
        return (
            child.agg(F.count("*").cast("long").alias("n_child"))
            .crossJoin(
                F.broadcast(
                    orphans.agg(F.count("*").cast("long").alias("n_orphans"))
                )
            )
            .select(F.lit(name).alias("fk_edge"), "n_child", "n_orphans")
        )

    return (
        edge(
            "lineitem.l_orderkey->orders", li, "l_orderkey", orders,
            "o_orderkey", False,
        )
        .unionByName(
            edge(
                "orders.o_custkey->customer", orders, "o_custkey", cust,
                "c_custkey", True,
            )
        )
        .unionByName(
            edge(
                "customer.c_nationkey->nation", cust, "c_nationkey", nation,
                "n_nationkey", True,
            )
        )
    )


@register(
    "lang_id_confusion",
    oracle=f"""
        WITH pred AS (
            SELECT doc_id, lang AS true_lang,
                   CASE WHEN len(list_filter(string_split(text, ' '),
                            t -> t IN ({_STOPLIST_SQL})))::DOUBLE
                            / len(string_split(text, ' ')) > 0.05
                        THEN 'en' ELSE 'und' END AS lang_guess
            FROM documents
        )
        SELECT true_lang, lang_guess,
               count(*)::BIGINT AS n_docs,
               round(count(*)::DOUBLE / sum(count(*))
                     OVER (PARTITION BY true_lang), 6) AS share_of_true
        FROM pred GROUP BY true_lang, lang_guess
    """,
    doc="""Language-ID confusion matrix: the stopword-density detector
    (text_lang_id) evaluated against the labeled corpus — per
    (true_lang, predicted) cell counts and the within-true-language
    share (row-normalized recall surface).  The evaluation query every
    classifier in the curation pipeline needs: text_lang_id ships the
    PREDICTIONS, this measures them — a detector regression (threshold
    drift, stoplist change) shows up here as mass moving off the 'en'
    diagonal cell while the prediction query itself stays green.  The
    share window is PARTITIONED by true_lang (bounded groups); counting
    is one |langs|·|guesses| aggregate.""",
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.text import lang_id

    docs = load_table(spark, "documents", sf_dir)
    pred = lang_id(docs).select("doc_id", "lang_guess")
    labeled = docs.select("doc_id", F.col("lang").alias("true_lang")).join(
        pred, "doc_id"
    )
    counts = labeled.groupBy("true_lang", "lang_guess").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    w = W.partitionBy("true_lang")
    return counts.select(
        "true_lang",
        "lang_guess",
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6).alias(
            "share_of_true"
        ),
    )


# Cutoff for the ranking-evaluation query.
PREC_AT_K = 100


@register(
    "quality_precision_at_k",
    oracle=f"""
        WITH scored AS (
            SELECT d.lang,
                   round(0.4 * least(len(string_split(d.text, ' ')) / 100.0,
                                     1.0)
                         + 0.3 * (len(list_filter(string_split(d.text, ' '),
                                      t -> t IN ({_STOPLIST_SQL})))::DOUBLE
                                  / len(string_split(d.text, ' ')))
                         + 0.3 * (1 - length(regexp_replace(lower(d.text),
                                      '[a-z0-9 ]', '', 'g'))::DOUBLE
                                      / length(d.text)), 6) AS quality,
                   d.doc_id
            FROM documents d
        ), top AS (
            SELECT lang FROM scored
            ORDER BY quality DESC, doc_id ASC LIMIT {PREC_AT_K}
        )
        SELECT {PREC_AT_K}::BIGINT AS k,
               count(*)::BIGINT AS n_retrieved,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT
                   AS n_positive,
               round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE
                     / count(*), 6) AS precision_at_k
        FROM top
    """,
    doc=f"""Precision@{PREC_AT_K} of the quality ranking against the
    'en' label — the ranking-evaluation companion to lang_id_confusion
    (that measures a CLASSIFIER cell-by-cell; this measures whether a
    SCORE orders the corpus usefully, the question a selection
    threshold actually asks).  The top-{PREC_AT_K} cut is a global
    (quality DESC, doc_id) order + limit — Spark plans it as
    TakeOrderedAndProject (per-partition top-k, then a {PREC_AT_K}-row
    merge on one reducer; the bm25_topk scale path, never a full
    sort) — followed by one scalar aggregate.""",
)
def quality_precision_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import quality_expr

    docs = load_table(spark, "documents", sf_dir)
    # One projection instead of scan + scan + 1:1 self-join on doc_id
    # (round-10, session 3 — the quality_auc_en pattern).
    scored = docs.select(
        "doc_id", quality_expr("text").alias("quality"), "lang"
    )
    top = scored.orderBy(F.desc("quality"), F.asc("doc_id")).limit(PREC_AT_K)
    pos = F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
    return top.agg(
        F.lit(PREC_AT_K).cast("long").alias("k"),
        F.count("*").cast("long").alias("n_retrieved"),
        pos.cast("long").alias("n_positive"),
        F.round(pos.cast("double") / F.count("*"), 6).alias(
            "precision_at_k"
        ),
    )


# Range-bucket fan-out for the hierarchical rank-sum (quality scores
# live in [0, 1]; 32 equi-width buckets keep every window partitioned).
AUC_BUCKETS = 32


@register(
    "quality_auc_en",
    oracle=f"""
        WITH scored AS (
            SELECT round(0.4 * least(len(string_split(text, ' ')) / 100.0,
                                     1.0)
                         + 0.3 * (len(list_filter(string_split(text, ' '),
                                      t -> t IN ({_STOPLIST_SQL})))::DOUBLE
                                  / len(string_split(text, ' ')))
                         + 0.3 * (1 - length(regexp_replace(lower(text),
                                      '[a-z0-9 ]', '', 'g'))::DOUBLE
                                      / length(text)), 6) AS quality,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
            FROM documents
        ), g AS (
            SELECT quality, count(*)::BIGINT AS n,
                   sum(pos)::BIGINT AS n_pos
            FROM scored GROUP BY quality
        ), ranked AS (
            SELECT quality, n, n_pos,
                   coalesce(sum(n) OVER (ORDER BY quality
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS cum_less
            FROM g
        ), tot AS (
            SELECT sum(n_pos) AS np, sum(n) - sum(n_pos) AS nn FROM g
        )
        SELECT tot.np::BIGINT AS n_positive,
               tot.nn::BIGINT AS n_negative,
               round((sum(ranked.n_pos * (ranked.cum_less
                                          + (ranked.n + 1) / 2.0))
                      - tot.np * (tot.np + 1) / 2.0)
                     / (tot.np * tot.nn), 6) AS auc
        FROM ranked CROSS JOIN tot
        GROUP BY tot.np, tot.nn
    """,
    doc=f"""Tie-corrected AUC (Mann-Whitney rank-sum with midranks) of
    the quality score against the 'en' label — the threshold-free
    ranking metric completing the evaluation family
    (lang_id_confusion = classifier cells, quality_precision_at_k =
    one cutoff, this = every cutoff at once).  The rank-sum needs a
    GLOBAL cumulative count over score order — computed hierarchically
    (the skyline/pack pattern): scores collapse to distinct-value
    groups first (bounded at ≤1e6+1 rows by the round-6 grid, no
    matter the corpus size), groups range-bucket by value into
    {AUC_BUCKETS} equi-width buckets, the within-bucket exclusive
    prefix runs in a bucket-PARTITIONED window, and only
    {AUC_BUCKETS} per-bucket totals collect to become broadcast
    offsets — never an unpartitioned window, never a data collect.
    Midranks are half-integers and counts are ints, so every sum is
    exact in double: no accumulation-order hazard anywhere.""",
)
def quality_auc_en(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.text import quality_expr

    docs = load_table(spark, "documents", sf_dir)
    # ONE projection carries quality AND the label (round-10, session
    # 3): the old shape scanned documents twice and equi-joined the two
    # halves back together on doc_id — a 1:1 self-join whose only
    # purpose was re-attaching `lang` to the score.
    scored = docs.select(quality_expr("text").alias("quality"), "lang")
    g = scored.groupBy("quality").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
    )
    bucket = F.least(
        F.floor(F.col("quality") * AUC_BUCKETS).cast("long"),
        F.lit(AUC_BUCKETS - 1),
    )
    # Pin the bounded distinct-score frame (≤ 1e6+1 rows by the
    # round-6 grid): the bucket-offset collect, the ranked window and
    # the totals row all hang off it, and without the cut each one
    # re-derived the full text-scoring scan — 4 effective corpus scans
    # in the before plan (the change-8 waist pattern).  Lazy: the
    # offset collect right below is the job that materializes it.
    g = g.withColumn("_b", bucket).localCheckpoint(eager=False)
    per_bucket = {
        int(r["_b"]): int(r["s"])
        for r in g.groupBy("_b").agg(F.sum("n").alias("s")).collect()
    }
    running, offsets = 0, []
    for b in sorted(per_bucket):
        offsets.append((b, running))
        running += per_bucket[b]
    off = spark.createDataFrame(offsets, "_b long, _off long")
    w = (
        W.partitionBy("_b")
        .orderBy("quality")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ranked = (
        g.join(F.broadcast(off), "_b")
        .withColumn(
            "cum_less",
            F.coalesce(F.sum("n").over(w), F.lit(0)) + F.col("_off"),
        )
    )
    tot = g.agg(
        F.sum("n_pos").cast("long").alias("np"),
        (F.sum("n") - F.sum("n_pos")).cast("long").alias("nn"),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy("np", "nn")
        .agg(
            F.round(
                (
                    F.sum(
                        F.col("n_pos")
                        * (F.col("cum_less") + (F.col("n") + 1) / 2.0)
                    )
                    - F.col("np") * (F.col("np") + 1) / 2.0
                )
                / (F.col("np") * F.col("nn")),
                6,
            ).alias("auc")
        )
        .select(
            F.col("np").alias("n_positive"),
            F.col("nn").alias("n_negative"),
            "auc",
        )
    )
