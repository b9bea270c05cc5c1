"""Training-data pipeline queries, round 2 batch 3: intra-corpus
boilerplate pruning, weighted reservoir sampling, and multi-dimension
Z-order layout.

Same contract discipline as the sibling modules: declarative plans,
partitioned-only shuffles, exact DuckDB oracles (FP steps carry the
rounded-intermediate contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import duckdb_hash32_sql, portable_hash32
from ..operators.dedup import SHINGLE_N, shingle_sets
from ..operators.text import EN_STOPWORDS, tokens
from ..sources.loaders import load_table
from .registry import register

# A shingle is "boilerplate" when it appears in at least this many
# distinct documents (C4/CCNet-style template detection: navigation
# chrome, license headers, cookie banners repeat across pages).
BP_MIN_DF = 5
# Documents whose shingles are mostly boilerplate get dropped.
BP_MAX_RATIO = 0.5


@register(
    "boilerplate_shingle_prune",
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
        ), dfc AS (
            SELECT shingle, count(*) AS df FROM ex GROUP BY shingle
        ), bp AS (
            SELECT shingle FROM dfc WHERE df >= {BP_MIN_DF}
        )
        SELECT e.doc_id,
               count(*)::BIGINT AS n_shingles,
               count(b.shingle)::BIGINT AS n_boilerplate,
               round(count(b.shingle)::DOUBLE / count(*), 6) AS bp_ratio,
               (count(b.shingle)::DOUBLE / count(*)) <= {BP_MAX_RATIO} AS keep
        FROM ex e LEFT JOIN bp b ON e.shingle = b.shingle
        GROUP BY e.doc_id
    """,
    doc=f"""Intra-corpus boilerplate detection (C4/CCNet template
    pruning): {SHINGLE_N}-gram shingles appearing in >= {BP_MIN_DF}
    distinct documents are boilerplate; each document reports its
    boilerplate shingle ratio and a keep/drop flag (drop when more
    than half the document is template text).  Scale shape: document
    frequency is ONE shuffled groupBy over per-doc-distinct shingles
    (the same vocabulary-keyed shuffle the minhash family already
    pays), and the boilerplate set is bounded by construction —
    |set| <= total_shingles / {BP_MIN_DF} and shrinks as the threshold
    scales with corpus size — so it broadcast-joins back to the
    per-document pass; no all-pairs stage, no global window.""",
)
def boilerplate_shingle_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    # Persisted: the exploded shingle frame feeds BOTH the document-
    # frequency aggregate and the join-back pass, and shingle
    # construction dominates the query (dropping this persist measured
    # 3.8 s → 5.6 s at sf0.1).  Cache lifetime is one query: bench.py
    # and tools/check_correctness.py clearCache() between queries, so
    # the entry never accumulates across a suite run; at 100 TB this
    # materialization is an explicit checkpoint of the shingle table
    # (disk-backed), not an executor-memory cache.
    ex = (
        shingle_sets(docs)
        .select("doc_id", F.explode("shingles").alias("shingle"))
        .persist()
    )
    # shingle_sets emits per-doc DISTINCT shingles, so count(*) per
    # shingle == distinct-document frequency.
    bp = (
        ex.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= BP_MIN_DF)
        .select("shingle", F.lit(1).alias("is_bp"))
    )
    ratio = F.col("n_boilerplate") / F.col("n_shingles")
    return (
        ex.join(F.broadcast(bp), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(F.coalesce("is_bp", F.lit(0))).cast("long").alias("n_boilerplate"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_boilerplate",
            F.round(ratio, 6).alias("bp_ratio"),
            (ratio <= BP_MAX_RATIO).alias("keep"),
        )
    )


# Per-language reservoir size for weighted sampling.
ARES_K = 20


@register(
    "weighted_sample_ares",
    oracle=f"""
        WITH k AS (
            SELECT lang, doc_id, n_chars,
                   round(pow(
                       ({duckdb_hash32_sql("doc_id::VARCHAR")} + 1)
                           / 4294967296.0,
                       1.0 / n_chars), 9) AS key
            FROM documents
        ), r AS (
            SELECT lang, doc_id, n_chars, key,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY key DESC, doc_id) AS rn
            FROM k
        )
        SELECT lang, doc_id, n_chars::BIGINT AS n_chars, key
        FROM r WHERE rn <= {ARES_K}
    """,
    doc=f"""Weighted reservoir sampling (Efraimidis–Spirakis A-Res) —
    the standard way to draw a fixed-size weighted sample in one
    distributed pass: each document gets key u^(1/w) with u a
    deterministic portable-hash uniform in (0,1] and w = n_chars, and
    the top-{ARES_K} keys per language ARE a proper weighted sample
    without replacement.  The rounded-key (round 9) + doc_id tiebreak
    make the draw reproducible cross-engine — the same contract trick
    as the kmeans distances.  Scale shape: key assignment is a pure
    projection; the top-k per language is a PARTITIONED window (per
    partial reservoir at 100 TB one would aggregate per-partition
    top-{ARES_K} first — Spark's rank + filter already does exactly
    that partial aggregation map-side via the window's rank limit
    pushdown).""",
)
def weighted_sample_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    u = (portable_hash32(F.col("doc_id").cast("string")) + 1) / F.lit(
        float(1 << 32)
    )
    keyed = docs.select(
        "lang",
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round(F.pow(u, 1.0 / F.col("n_chars")), 9).alias("key"),
    )
    w = Window.partitionBy("lang").orderBy(F.col("key").desc(), "doc_id")
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= ARES_K)
        .drop("rn")
    )


# Span length for cross-document repeated-substring coverage.
SPAN_N = 5

# Shared oracle CTEs for the repeated-span family (coverage + the
# round-8 islands extension): t/sh/flat enumerate every SPAN_N-token
# span with its 1-based position; rep keeps spans in >= 2 documents.
_SPAN_FLAT_CTES = f"""
        t AS (
            SELECT doc_id, string_split(text, ' ') AS w,
                   len(string_split(text, ' ')) AS n_toks
            FROM documents
        ), sh AS (
            SELECT doc_id, n_toks,
                   unnest(list_transform(
                       generate_series(1, len(w) - {SPAN_N - 1}),
                       i -> struct_pack(pos := i,
                                        g := array_to_string(
                                            w[i:i+{SPAN_N - 1}], ' ')))) AS s
            FROM t WHERE len(w) >= {SPAN_N}
        ), flat AS (
            SELECT doc_id, n_toks, s.pos AS pos, s.g AS g FROM sh
        ), rep AS (
            SELECT g FROM flat GROUP BY g
            HAVING count(DISTINCT doc_id) >= 2
        )
"""


def _repeated_span_flat(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Shared span machinery for the repeated-substring family: returns
    ``(flat, rep)`` where ``flat`` is one (doc_id, n_toks, pos, g) row
    per {SPAN_N}-token span and ``rep`` is the set of span texts seen in
    >= 2 distinct documents.  Extracted verbatim from
    ``repeated_span_coverage`` (value-neutral) so the round-8 span-merge
    extension (``repeated_span_islands``) reuses one definition."""
    toks = tokens("text")
    base = docs.select(
        "doc_id", F.size(toks).alias("n_toks"), toks.alias("w")
    )
    flat = (
        base.where(F.col("n_toks") >= SPAN_N)
        .select(
            "doc_id",
            "n_toks",
            F.explode(
                F.transform(
                    # Upper bound clamped to 1 (shingle_sets rationale):
                    # the explode's pushed-down size guard plus codegen
                    # CSE can evaluate this on rows the n_toks filter
                    # excludes, and a short doc's descending sequence
                    # would crash slice(start=0).
                    F.sequence(
                        F.lit(1),
                        F.greatest(
                            F.col("n_toks") - (SPAN_N - 1), F.lit(1)
                        ),
                    ),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.concat_ws(" ", F.slice("w", i, SPAN_N)).alias("g"),
                    ),
                )
            ).alias("s"),
        )
        .select("doc_id", "n_toks", "s.pos", "s.g")
    )
    # "Seen in >= 2 distinct documents" as min(doc_id) != max(doc_id) —
    # value-identical to countDistinct(doc_id) >= 2 (doc_id is non-null)
    # but a SINGLE partial-aggregated pass: countDistinct plans as a
    # two-phase distinct expansion (an extra aggregate + exchange over
    # (g, doc_id)) that this span-text-keyed shuffle paid on every
    # consumer (round-11, guide §2.3).
    rep = (
        flat.groupBy("g")
        .agg(F.min("doc_id").alias("_d0"), F.max("doc_id").alias("_d1"))
        .where(F.col("_d0") != F.col("_d1"))
        .select("g")
    )
    return flat, rep


@register(
    "repeated_span_coverage",
    oracle=f"""
        WITH {_SPAN_FLAT_CTES}, covered AS (
            SELECT DISTINCT f.doc_id, f.n_toks, cp.cp
            FROM flat f
            JOIN rep r ON f.g = r.g,
            LATERAL (SELECT unnest(generate_series(f.pos,
                                    f.pos + {SPAN_N - 1})) AS cp) cp
        ), cov AS (
            SELECT doc_id, n_toks, count(*) AS n_covered
            FROM covered GROUP BY doc_id, n_toks
        )
        SELECT t.doc_id,
               t.n_toks::BIGINT AS n_toks,
               coalesce(c.n_covered, 0)::BIGINT AS n_covered,
               round(coalesce(c.n_covered, 0)::DOUBLE / t.n_toks, 6)
                   AS coverage
        FROM t LEFT JOIN cov c ON t.doc_id = c.doc_id
    """,
    doc=f"""Cross-document repeated-substring coverage (the statistic
    behind exact-substring dedup, Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better"): every {SPAN_N}-token
    span occurring in ≥ 2 distinct documents marks its token positions
    as duplicated text; each document reports the fraction of its
    tokens covered by the union of such spans.  Scale shape: one
    span-keyed groupBy finds repeated spans (the same vocabulary-keyed
    shuffle as the dedup family — bounded two-pass pruning applies the
    same way as heavy_hitters_twopass), a semi-join keeps repeated
    occurrences, and coverage is a per-document distinct-position
    count — no all-pairs stage, no window.""",
)
def repeated_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    flat, rep = _repeated_span_flat(docs)
    cov = (
        flat.join(rep, "g", "left_semi")
        .select(
            "doc_id",
            "n_toks",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (SPAN_N - 1))
            ).alias("cp"),
        )
        .distinct()
        .groupBy("doc_id", "n_toks")
        .agg(F.count("*").alias("n_covered"))
    )
    return (
        docs.select("doc_id", F.size(tokens("text")).cast("long").alias("n_toks"))
        .join(cov.select("doc_id", "n_covered"), "doc_id", "left")
        .select(
            "doc_id",
            "n_toks",
            F.coalesce("n_covered", F.lit(0)).cast("long").alias("n_covered"),
            F.round(
                F.coalesce("n_covered", F.lit(0)) / F.col("n_toks"), 6
            ).alias("coverage"),
        )
    )


def _containment_oracle() -> str:
    from ..operators.dedup import CONTAINMENT_THRESHOLD
    from .extension_queries import _minhash_lsh_oracle

    base = _minhash_lsh_oracle()
    # Share the signature/banding/candidate CTEs with the minhash
    # oracle; only the verification metric differs.
    prefix = base[: base.index("SELECT id_a, id_b, jaccard")]
    return (
        prefix
        + f"""
        SELECT id_a, id_b, containment_a_in_b, containment_b_in_a FROM (
            SELECT c.id_a, c.id_b,
                   round(len(list_intersect(a.toks, b.toks))::DOUBLE
                         / len(a.toks), 6) AS containment_a_in_b,
                   round(len(list_intersect(a.toks, b.toks))::DOUBLE
                         / len(b.toks), 6) AS containment_b_in_a,
                   greatest(
                       len(list_intersect(a.toks, b.toks))::DOUBLE / len(a.toks),
                       len(list_intersect(a.toks, b.toks))::DOUBLE / len(b.toks)
                   ) AS cmax
            FROM cand c
            JOIN sets a ON a.doc_id = c.id_a
            JOIN sets b ON b.doc_id = c.id_b
        ) WHERE cmax >= {CONTAINMENT_THRESHOLD}
    """
    )


@register(
    "dedup_containment",
    oracle=_containment_oracle(),
    doc="""Asymmetric containment (quote/excerpt) detection
    (operators/dedup.py:containment_near_dups): the minhash-LSH
    candidate machinery with |A∩B|/|side| verification in both
    directions — catches a document being an excerpt of another even
    when symmetric Jaccard is modest.  Shares the one
    signature-banding shuffle with the near-dup pipeline; exact
    verification touches candidates only.""",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import containment_near_dups

    return containment_near_dups(load_table(spark, "documents", sf_dir))


def _containment_banded_oracle() -> str:
    from ..operators.dedup import CONTAINMENT_THRESHOLD as T

    inter = "len(list_intersect(a.toks, b.toks))::DOUBLE"
    return f"""
        WITH sets AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       generate_series(1, len(w) - {SHINGLE_N - 1}),
                       i -> array_to_string(w[i:i+{SHINGLE_N - 1}], ' '))) AS toks
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
            WHERE len(w) >= {SHINGLE_N}
        ), posting AS (
            SELECT doc_id AS pid, unnest(toks) AS sh FROM sets
        ), dfreq AS (
            SELECT sh, count(*) AS dfreq FROM posting GROUP BY sh
        ), ranked AS (
            SELECT p.pid, p.sh,
                   row_number() OVER (PARTITION BY p.pid
                                      ORDER BY d.dfreq, p.sh) AS rn,
                   count(*) OVER (PARTITION BY p.pid) AS n
            FROM posting p JOIN dfreq d USING (sh)
        ), pref AS (
            SELECT pid, sh FROM ranked WHERE rn <= floor({1.0 - T!r} * n) + 1
        ), cand AS (
            SELECT DISTINCT least(p.pid, q.pid) AS id_a,
                            greatest(p.pid, q.pid) AS id_b
            FROM pref p JOIN posting q USING (sh) WHERE p.pid <> q.pid
        )
        SELECT id_a, id_b, containment_a_in_b, containment_b_in_a FROM (
            SELECT c.id_a, c.id_b,
                   round({inter} / len(a.toks), 6) AS containment_a_in_b,
                   round({inter} / len(b.toks), 6) AS containment_b_in_a,
                   greatest({inter} / len(a.toks),
                            {inter} / len(b.toks)) AS cmax
            FROM cand c
            JOIN sets a ON a.doc_id = c.id_a
            JOIN sets b ON b.doc_id = c.id_b
        ) WHERE cmax >= {T}
    """


@register(
    "dedup_containment_banded",
    oracle=_containment_banded_oracle(),
    doc="""LOSSLESS excerpt-direction containment
    (operators/dedup.py:containment_prefix_pairs): every doc probes its
    floor((1-t)*n)+1 globally-RAREST shingles against the full corpus
    posting list — the prefix-filter guarantee means any pair whose
    smaller side is >= t contained in the larger becomes a candidate
    regardless of the size ratio, closing the tiny-excerpt-in-huge-doc
    recall gap inherent to the Jaccard-banded dedup_containment.
    Linear posting-list footprint, rare-shingle probes, equi-joins
    only; exact verification touches candidates only.""",
)
def dedup_containment_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import containment_prefix_pairs

    return containment_prefix_pairs(load_table(spark, "documents", sf_dir))


# The fixed phrase for positional phrase search (a frequent trigram in
# the synthetic corpus at every SF).
PHRASE = ("stream", "table", "hash")


@register(
    "phrase_search_positional",
    oracle=f"""
        WITH pos AS (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(w)),
                          i -> struct_pack(pos := i, tok := w[i]))) AS p
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        ), flat AS (
            SELECT doc_id, p.pos AS pos, p.tok AS tok FROM pos
        )
        SELECT a.doc_id, count(*)::BIGINT AS n_matches
        FROM flat a
        JOIN flat b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        JOIN flat c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
        WHERE a.tok = '{PHRASE[0]}' AND b.tok = '{PHRASE[1]}'
          AND c.tok = '{PHRASE[2]}'
        GROUP BY a.doc_id
    """,
    doc=f"""Exact phrase search over a positional inverted index (the
    query-side counterpart of ``inverted_index_postings``): tokenize
    with positions, keep only the phrase's terms (a per-term postings
    probe — at 100 TB each term selection is an index lookup, and the
    planner starts from the rarest term), then join on (doc_id,
    adjacent positions) to verify adjacency.  All joins are keyed
    equi-joins on (doc_id, pos) — no theta join, no window.  Finds
    every occurrence of "{' '.join(PHRASE)}" per document.""",
)
def phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    flat = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    a = flat.where(F.col("tok") == PHRASE[0]).select("doc_id", "pos")
    b = flat.where(F.col("tok") == PHRASE[1]).select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    c = flat.where(F.col("tok") == PHRASE[2]).select(
        "doc_id", (F.col("pos") - 2).alias("pos")
    )
    return (
        a.join(b, ["doc_id", "pos"])
        .join(c, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_matches"))
    )


# Columns profiled by table_profile (numeric min/max reported as
# DOUBLE; string columns carry NULL bounds so the output schema stays
# uniform without cross-engine string-rendering hazards).
_PROFILE_NUM = ("o_orderkey", "o_custkey", "o_totalprice")
_PROFILE_STR = ("o_orderstatus", "o_orderpriority")


def _profile_oracle() -> str:
    parts = [
        f"""SELECT '{c}' AS column_name,
                   count(*) - count({c}) AS n_nulls,
                   count(DISTINCT {c})::BIGINT AS n_distinct,
                   min({c})::DOUBLE AS min_value,
                   max({c})::DOUBLE AS max_value
            FROM orders"""
        for c in _PROFILE_NUM
    ] + [
        f"""SELECT '{c}' AS column_name,
                   count(*) - count({c}) AS n_nulls,
                   count(DISTINCT {c})::BIGINT AS n_distinct,
                   NULL::DOUBLE AS min_value,
                   NULL::DOUBLE AS max_value
            FROM orders"""
        for c in _PROFILE_STR
    ]
    return "\nUNION ALL\n".join(parts)


@register(
    "table_profile",
    oracle=_profile_oracle(),
    doc="""One-pass data profiling (the first thing run against any new
    100 TB table): per-column null count, exact distinct count, and
    numeric min/max, computed in a SINGLE scan — one wide aggregate
    over all profiled columns, pivoted to one row per column with a
    ``stack`` projection.  The oracle is the naive per-column UNION
    (five scans); the engine's one-pass plan produces identical
    values.  Multiple exact count-distincts share the scan via
    Catalyst's expand; for wider tables the approx_count_distinct
    twin (see approx_distinct's bounded-error contract) drops the
    expand entirely.""",
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    aggs = []
    for c in _PROFILE_NUM + _PROFILE_STR:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
        ]
    for c in _PROFILE_NUM:
        aggs += [
            F.min(c).cast("double").alias(f"mn_{c}"),
            F.max(c).cast("double").alias(f"mx_{c}"),
        ]
    one = orders.agg(*aggs)
    stack_args = []
    for c in _PROFILE_NUM:
        stack_args += [
            f"'{c}'", f"nn_{c}", f"nd_{c}", f"mn_{c}", f"mx_{c}",
        ]
    for c in _PROFILE_STR:
        stack_args += [
            f"'{c}'", f"nn_{c}", f"nd_{c}",
            "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
        ]
    n = len(_PROFILE_NUM) + len(_PROFILE_STR)
    return one.selectExpr(
        f"stack({n}, {', '.join(stack_args)}) AS "
        "(column_name, n_nulls, n_distinct, min_value, max_value)"
    )


# Fixed (published) logistic-regression weights for the document
# quality classifier: features are length saturation, stopword ratio,
# punctuation ratio, mean token length / 10.  Inference-at-scale shape:
# training happened offline; the engine applies the model as a pure
# columnar expression.
LOGREG_W = (1.8, 2.5, -3.0, 0.7)
LOGREG_B = -1.2
_STOPS_SQL = ", ".join(f"'{w}'" for w in EN_STOPWORDS)


@register(
    "quality_logreg_score",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   least(len(string_split(text, ' ')) / 100.0, 1.0) AS f_len,
                   len(list_filter(string_split(text, ' '),
                       t -> t IN ({_STOPS_SQL})))::DOUBLE
                       / len(string_split(text, ' ')) AS f_stop,
                   length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))::DOUBLE
                       / length(text) AS f_punct,
                   (list_sum(list_transform(string_split(text, ' '),
                       t -> length(t)))::DOUBLE
                       / len(string_split(text, ' '))) / 10.0 AS f_mtl
            FROM documents
        ), z AS (
            SELECT doc_id,
                   round({LOGREG_B} + {LOGREG_W[0]} * f_len
                         + {LOGREG_W[1]} * f_stop
                         + {LOGREG_W[2]} * f_punct
                         + {LOGREG_W[3]} * f_mtl, 6) AS logit
            FROM t
        )
        SELECT doc_id, logit,
               round(1.0 / (1.0 + exp(-logit)), 6) AS score,
               (1.0 / (1.0 + exp(-logit))) >= 0.5 AS keep
        FROM z
    """,
    doc="""Trained-model inference at scale: a fixed-weight logistic
    quality classifier (fastText/CCNet-style doc filter) applied as a
    pure columnar expression — feature engineering (length saturation,
    stopword ratio, punctuation ratio, mean token length), a
    left-to-right dot product, and a sigmoid, all inside whole-stage
    codegen.  No UDF, no shuffle: at 100 TB this is exactly one narrow
    scan, the shape model-based corpus filtering must take.  The logit
    is rounded (round 6) before the sigmoid on both engines so
    cross-engine exp() ulp differences cannot flip the keep
    decision.""",
)
def quality_logreg_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = tokens("text")
    f_len = F.least(F.size(toks) / F.lit(100.0), F.lit(1.0))
    f_stop = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))) / F.size(toks)
    f_punct = F.length(
        F.regexp_replace(F.lower(F.col("text")), "[a-z0-9 ]", "")
    ) / F.length("text")
    f_mtl = (
        F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t))
        / F.size(toks)
    ) / 10.0
    logit = F.round(
        F.lit(LOGREG_B)
        + LOGREG_W[0] * f_len
        + LOGREG_W[1] * f_stop
        + LOGREG_W[2] * f_punct
        + LOGREG_W[3] * f_mtl,
        6,
    )
    score = 1.0 / (1.0 + F.exp(-F.col("logit")))
    return (
        docs.select("doc_id", logit.alias("logit"))
        .select(
            "doc_id",
            "logit",
            F.round(score, 6).alias("score"),
            (score >= 0.5).alias("keep"),
        )
    )


# Z-order parameters: 8 bits per dimension, 16-bit Morton codes, 64
# codes per file — the audit emits per-file min/max ranges for BOTH
# dimensions (what a lakehouse data-skipping index stores).
Z_BITS = 8
Z_CODES_PER_FILE = 64


def _zorder_oracle() -> str:
    bx = "(o_custkey % 256)"
    by = "(datediff('day', DATE '1970-01-01', o_orderdate::DATE) % 256)"
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({bx} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({by} >> {i}) & 1) << {2 * i})")
    z = " | ".join(terms)
    return f"""
        WITH coded AS (
            SELECT o_orderkey, o_custkey,
                   datediff('day', DATE '1970-01-01', o_orderdate::DATE)
                       AS day_num,
                   ({z}) AS zcode
            FROM orders
        )
        SELECT (zcode // {Z_CODES_PER_FILE})::BIGINT AS file_id,
               count(*)::BIGINT AS n_rows,
               min(o_custkey % 256)::BIGINT AS min_cust_bucket,
               max(o_custkey % 256)::BIGINT AS max_cust_bucket,
               min(day_num % 256)::BIGINT AS min_day_bucket,
               max(day_num % 256)::BIGINT AS max_day_bucket
        FROM coded
        GROUP BY 1
    """


@register(
    "zorder_layout_audit",
    oracle=_zorder_oracle(),
    doc=f"""Z-order (Morton) clustering audit — the layout step behind
    lakehouse multi-column data skipping (Delta OPTIMIZE ZORDER BY):
    interleave {Z_BITS} bits of two dimension buckets (customer,
    order-day) into a Morton code, group rows into files of
    {Z_CODES_PER_FILE} consecutive codes, and report each file's
    min/max range in BOTH dimensions — exactly the per-file statistics
    a scan would prune on.  Because the curve preserves locality in
    both dimensions at once, every file's cust range AND day range are
    narrow (a linear sort gives narrow ranges in the sort key only).
    Scale shape: the code is a pure bitwise projection; the physical
    write would be ``repartitionByRange(file_id)`` (the same
    range-clustered write as ``compact_table``); the audit is one
    partial-aggregated groupBy.""",
)
def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
    bx = (F.col("o_custkey") % 256).cast("int")
    by = (day % 256).cast("int")
    z = F.lit(0)
    for i in range(Z_BITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(bx, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(by, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    coded = orders.select(
        bx.alias("cust_bucket"), by.alias("day_bucket"), z.alias("zcode")
    )
    return (
        coded.groupBy(
            F.floor(F.col("zcode") / Z_CODES_PER_FILE).cast("long").alias("file_id")
        )
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("cust_bucket").cast("long").alias("min_cust_bucket"),
            F.max("cust_bucket").cast("long").alias("max_cust_bucket"),
            F.min("day_bucket").cast("long").alias("min_day_bucket"),
            F.max("day_bucket").cast("long").alias("max_day_bucket"),
        )
    )


# Per-source document cap (domain balancing: no single source may
# contribute more than this many documents; selection is a
# deterministic portable-hash order so the "random" keep set is
# reproducible across engines and runs).
SOURCE_CAP = 15


@register(
    "source_cap_sample",
    oracle=f"""
        WITH r AS (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT,
                                doc_id) AS rn
            FROM documents
        )
        SELECT doc_id, source FROM r WHERE rn <= {SOURCE_CAP}
    """,
    doc=f"""Per-source document cap (domain balancing — the "no more
    than N pages per domain" rule of web-corpus curation): documents
    ordered by a portable hash WITHIN each source (a deterministic
    shuffle), keep the first {SOURCE_CAP}.  The window is PARTITIONED
    by source — never global — and the hash order makes the kept set
    reproducible across engines, runs, and file layouts (same property
    as sample_hash_bucket).""",
)
def source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    w = Window.partitionBy("source").orderBy(
        portable_hash32(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= SOURCE_CAP)
        .drop("rn")
    )


# Exponential time-decay scoring: reference date just past the events
# table's range; half-life ~7 days (lambda = 0.1/day).
DECAY_REF_DATE = "2024-02-01"
DECAY_LAMBDA = 0.1


@register(
    "time_decay_user_scores",
    oracle=f"""
        SELECT user_id,
               count(*)::BIGINT AS n_events,
               round(sum(value * round(
                   exp(-{DECAY_LAMBDA} * datediff('day', ts::DATE,
                                                  DATE '{DECAY_REF_DATE}')),
                   6)), 4) AS decayed_score
        FROM events
        GROUP BY user_id
    """,
    doc=f"""Recency-weighted (exponential time-decay) user scoring —
    the standard freshness weighting for engagement/quality signals:
    each event contributes value · exp(-λ · age_days) with λ =
    {DECAY_LAMBDA}/day against {DECAY_REF_DATE}.  The per-event decay
    factor is rounded (round 6) on both engines before the sum so
    cross-engine exp() ulp differences cannot accumulate; the grouped
    sum itself is fully map-side partial-aggregated — one keyed
    shuffle of (user, partial sums) regardless of event volume.""",
)
def time_decay_user_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    age = F.datediff(F.lit(DECAY_REF_DATE), F.to_date("ts"))
    decay = F.round(F.exp(-DECAY_LAMBDA * age), 6)
    return events.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum(F.col("value") * decay), 4).alias("decayed_score"),
    )


@register(
    "user_daily_streaks",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id,
                   datediff('day', DATE '1970-01-01', ts::DATE) AS day_num
            FROM events
        ), isl AS (
            SELECT user_id, day_num,
                   day_num - row_number() OVER (
                       PARTITION BY user_id ORDER BY day_num) AS island
            FROM days
        ), streaks AS (
            SELECT user_id, island, count(*) AS streak_len
            FROM isl GROUP BY user_id, island
        )
        SELECT user_id,
               count(*)::BIGINT AS n_streaks,
               max(streak_len)::BIGINT AS longest_streak,
               sum(streak_len)::BIGINT AS n_active_days
        FROM streaks GROUP BY user_id
    """,
    doc="""Gaps-and-islands: per-user longest consecutive-day activity
    streak via the classic day_number − row_number island id — a SQL
    idiom distinct from time-gap sessionization (sessionize_users
    groups by inactivity gaps on raw timestamps; this groups distinct
    CALENDAR DAYS into runs).  All windows and aggregates are
    partitioned by user — per-user state is bounded by the date range,
    never by event volume.""",
)
def user_daily_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    days = events.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day_num"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_num")
    streaks = (
        days.withColumn("island", F.col("day_num") - F.row_number().over(w))
        .groupBy("user_id", "island")
        .agg(F.count("*").alias("streak_len"))
    )
    return streaks.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_streaks"),
        F.max("streak_len").cast("long").alias("longest_streak"),
        F.sum("streak_len").cast("long").alias("n_active_days"),
    )


@register(
    "unigram_perplexity_score",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t
            FROM documents
        ), lm AS (
            SELECT t, count(*) AS c FROM tok GROUP BY t
        ), tot AS (
            SELECT sum(c) AS n FROM lm
        ), logp AS (
            SELECT t,
                   round(-ln(c::DOUBLE / (SELECT n FROM tot)) * 1000000)::BIGINT
                       AS nll_micros
            FROM lm
        )
        SELECT doc_id, n_tokens, mean_nll, round(exp(mean_nll), 4) AS ppl
        FROM (
            SELECT tok.doc_id,
                   count(*)::BIGINT AS n_tokens,
                   round(sum(logp.nll_micros)::DOUBLE / count(*) / 1000000.0, 6)
                       AS mean_nll
            FROM tok JOIN logp ON tok.t = logp.t
            GROUP BY tok.doc_id
        )
    """,
    doc="""LM-perplexity quality filtering (the CCNet/fastText corpus
    screen, here with the corpus's own unigram LM): per-token negative
    log-likelihood -ln(count/total) rounded to 6 (the cross-engine ln
    contract), joined back to the token stream on the vocabulary key,
    averaged per document, exponentiated to perplexity.  Unusually
    high ppl = gibberish / OOD text; unusually low = degenerate
    repetition.  The per-token NLL is quantized to integer MICROS so
    the per-document sum is exact integer arithmetic — immune to
    partial-aggregation order, the same trick as the DECIMAL sums in
    incremental_agg_maintenance.  Scale shape: the LM is one
    token-keyed groupBy (the dedup family's shuffle); scoring is a
    vocabulary-keyed join (broadcast once the vocabulary is bounded by
    a heavy-hitter prune) plus one per-document aggregate.  A real
    deployment swaps the unigram LM for KenLM scores — the Spark plan
    (build table → join → per-doc reduce) is identical.""",
)
def unigram_perplexity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("t"))
    lm = tok.groupBy("t").agg(F.count("*").alias("c"))
    total = lm.agg(F.sum("c").alias("n"))
    logp = lm.crossJoin(F.broadcast(total)).select(
        "t",
        F.round(-F.log(F.col("c") / F.col("n")) * 1_000_000)
        .cast("long")
        .alias("nll_micros"),
    )
    per_doc = (
        tok.join(logp, "t")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("nll_micros").alias("sum_micros"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.col("sum_micros").cast("double") / F.col("n_tokens") / 1e6, 6
            ).alias("mean_nll"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "mean_nll",
        F.round(F.exp("mean_nll"), 4).alias("ppl"),
    )
