"""Round-5 batch: supervised text classification, dimensionality
reduction, and storage-layout economics — three operators a training-
data platform runs between ingest and packing:

- ``naive_bayes_lang_eval`` — multinomial Naive Bayes language
  classifier trained on the even-id half of the corpus (Laplace +1
  smoothing) and evaluated on the held-out odd-id half, reported as
  the full confusion matrix.  The supervised complement of the
  heuristic ``text_lang_id`` / ``lang_id_confusion`` pair: same task,
  learned likelihoods instead of hand rules.
- ``jl_projection_distortion_audit`` — Johnson–Lindenstrauss random
  sign projection (Achlioptas '03 ±1 variant) of the 64-dim embeddings
  down to 16 dims, audited by the squared-distance distortion ratio
  over consecutive-id pairs — the check that decides whether the
  cheap projected space is safe for first-pass ANN/dedup at 100 TB.
- ``rle_compression_audit`` — run-length encoding economics of the
  lineitem sort order: runs per column under the (returnflag,
  linestatus) partition / (shipdate, orderkey, linenumber) order —
  the measurement behind choosing a table's sort/cluster keys (long
  runs → parquet RLE/dictionary pages shrink and min-max pruning
  sharpens; the empirical companion to ``zorder_layout_audit``).

Determinism contracts: NB log-likelihoods quantize to integer micros
per (term, lang) BEFORE any summation (the ``token_entropy_quality``
convention), so per-document scores are exact integer sums and the
argmax is integer comparison; the JL sign matrix is a module-level
constant (md5-derived, embedded literally in BOTH engines' plans) and
every projection / distance is exact int64 arithmetic over
milli-quantized coordinates; RLE runs are integer counts over a
totally tie-broken order.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..sources.loaders import load_table
from .pipeline_queries13 import _idiv
from .registry import register

# --- Naive Bayes language classifier -------------------------------------


@register(
    "naive_bayes_lang_eval",
    oracle="""
        WITH tok AS (
            SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS term
            FROM documents
        ), train AS (SELECT * FROM tok WHERE doc_id % 2 = 0),
        vocab AS (SELECT count(DISTINCT term)::BIGINT AS v FROM train),
        lang_tok AS (
            SELECT lang, count(*)::BIGINT AS n_tok FROM train GROUP BY lang
        ), ll AS (
            SELECT t.lang, t.term,
                   round(1e6 * ln((count(*) + 1)::DOUBLE
                                  / (any_value(lt.n_tok) + any_value(vb.v))))
                       ::BIGINT AS ll_micros
            FROM train t
            JOIN lang_tok lt ON t.lang = lt.lang
            CROSS JOIN vocab vb
            GROUP BY t.lang, t.term
        ), deflt AS (
            SELECT lt.lang,
                   round(1e6 * ln(1.0 / (lt.n_tok + vb.v)))::BIGINT AS d_micros
            FROM lang_tok lt CROSS JOIN vocab vb
        ), prior AS (
            SELECT d.lang,
                   round(1e6 * ln(count(DISTINCT d.doc_id)::DOUBLE
                                  / t.n_docs))::BIGINT AS p_micros
            FROM documents d
            CROSS JOIN (SELECT count(*)::BIGINT AS n_docs
                        FROM documents WHERE doc_id % 2 = 0) t
            WHERE d.doc_id % 2 = 0
            GROUP BY d.lang, t.n_docs
        ), test_tf AS (
            SELECT doc_id, lang AS true_lang, term, count(*)::BIGINT AS tf
            FROM tok WHERE doc_id % 2 = 1
            GROUP BY doc_id, lang, term
        ), scored AS (
            SELECT tt.doc_id, tt.true_lang, p.lang AS cand,
                   any_value(p.p_micros)
                   + sum(tt.tf * coalesce(ll.ll_micros, df.d_micros))
                       ::BIGINT AS score
            FROM test_tf tt
            CROSS JOIN prior p
            JOIN deflt df ON df.lang = p.lang
            LEFT JOIN ll ON ll.lang = p.lang AND ll.term = tt.term
            GROUP BY tt.doc_id, tt.true_lang, p.lang
        ), pred AS (
            SELECT doc_id, true_lang, cand AS pred_lang
            FROM scored
            QUALIFY row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, cand) = 1
        )
        SELECT true_lang, pred_lang, count(*)::BIGINT AS n_docs
        FROM pred GROUP BY true_lang, pred_lang
        ORDER BY true_lang, pred_lang
    """,
    doc="""Multinomial Naive Bayes language identification, trained on
    the even-doc-id half (Laplace +1 smoothed per-(term, lang)
    log-likelihoods, log-priors from class frequencies) and evaluated
    on the held-out odd-id half — reported as the confusion matrix
    (true_lang, pred_lang, n_docs).  The supervised companion to the
    heuristic lang-id queries: same task, learned parameters, honest
    train/test split.  Determinism: every log quantizes to integer
    micros at the (term, lang) grain (the token_entropy_quality
    convention); document scores are exact integer sums of tf·micros,
    so the per-document argmax (ties → smallest lang) is pure integer
    comparison.  Scale shape: training is two grouped counts over the
    token explode; scoring joins test term-frequencies to the
    likelihood table on (term, lang) — a hash equi-join keyed by term
    (the model is a table, NOT a driver-side object, so a 10⁹-term
    vocabulary shards like any fact table); the |langs|-row prior
    frame is the only nested-loop broadcast (declared); one
    doc-partitioned window picks the argmax.""",
)
def naive_bayes_lang_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    train = tok.where(F.col("doc_id") % 2 == 0)
    # ONE token-stream tally feeds vocabulary size, per-language token
    # totals AND the likelihood table (round-10, session 3): the old
    # shape re-exploded the training half three times (vocab count,
    # lang totals, lang-term counts).  The (lang, term) count frame is
    # the natural waist — vocab = its distinct terms, lang totals = its
    # per-lang sums, all exact integers — pinned because three
    # consumers read it.
    ltc = (
        train.groupBy("lang", "term")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    vocab = ltc.agg(F.countDistinct("term").alias("v"))
    lang_tok = ltc.groupBy("lang").agg(F.sum("c").alias("n_tok"))
    lang_stats = lang_tok.crossJoin(F.broadcast(vocab))
    ll = (
        ltc
        .join(F.broadcast(lang_stats), "lang")
        .select(
            "lang",
            "term",
            F.round(
                F.lit(1e6)
                * F.log(
                    (F.col("c") + 1).cast("double")
                    / (F.col("n_tok") + F.col("v"))
                )
            )
            .cast("long")
            .alias("ll_micros"),
        )
    )
    deflt = lang_stats.select(
        "lang",
        F.round(F.lit(1e6) * F.log(F.lit(1.0) / (F.col("n_tok") + F.col("v"))))
        .cast("long")
        .alias("d_micros"),
    )
    # One scan for the priors: the |langs|-row class-count frame also
    # yields the training-doc total (sum over its rows) — the old shape
    # scanned the training docs twice (total + grouped).
    lang_docs = (
        docs.where(F.col("doc_id") % 2 == 0)
        .groupBy("lang")
        .agg(F.count("*").alias("nl"))
        .localCheckpoint(eager=True)
    )
    n_train = lang_docs.agg(F.sum("nl").alias("n_docs"))
    prior = (
        lang_docs
        .crossJoin(F.broadcast(n_train))
        .select(
            "lang",
            F.round(
                F.lit(1e6)
                * F.log(F.col("nl").cast("double") / F.col("n_docs"))
            )
            .cast("long")
            .alias("p_micros"),
        )
    )
    cand = F.broadcast(
        prior.join(deflt, "lang").select(
            F.col("lang").alias("cand"), "p_micros", "d_micros"
        )
    )
    test_tf = (
        tok.where(F.col("doc_id") % 2 == 1)
        .groupBy("doc_id", F.col("lang").alias("true_lang"), "term")
        .agg(F.count("*").alias("tf"))
    )
    scored = (
        test_tf.alias("tt")
        .crossJoin(cand)
        .join(
            ll.alias("llx"),
            (F.col("llx.lang") == F.col("cand"))
            & (F.col("llx.term") == F.col("tt.term")),
            "left",
        )
        .groupBy("doc_id", "true_lang", "cand")
        .agg(
            (
                F.first("p_micros")
                + F.sum(
                    F.col("tt.tf")
                    * F.coalesce(F.col("llx.ll_micros"), F.col("d_micros"))
                )
            ).alias("score")
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), "cand")
    pred = scored.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    return (
        pred.groupBy("true_lang", F.col("cand").alias("pred_lang"))
        .agg(F.count("*").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


# --- Johnson–Lindenstrauss projection audit ------------------------------

_JL_IN_DIM = 64
_JL_OUT_DIM = 16


def _jl_sign(i: int, j: int) -> int:
    """Deterministic ±1 from md5 — a module-level CONSTANT matrix,
    embedded literally in both engines' plans (never recomputed from
    data, so cross-engine hash parity is structural)."""
    h = hashlib.md5(f"jl:{i}:{j}".encode()).digest()
    return 1 if h[0] % 2 == 0 else -1


_JL_SIGNS: list[list[int]] = [
    [_jl_sign(i, j) for i in range(_JL_IN_DIM)] for j in range(_JL_OUT_DIM)
]


def _jl_oracle() -> str:
    sign_rows = ",\n                ".join(
        f"({j}, {i}, {_JL_SIGNS[j][i]})"
        for j in range(_JL_OUT_DIM)
        for i in range(_JL_IN_DIM)
    )
    return f"""
        WITH m AS (
            SELECT vec_id, round(x * 1000)::BIGINT AS mv, i::BIGINT AS i
            FROM (
                SELECT vec_id, unnest(embedding)::DOUBLE AS x,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings
            )
        ), signs AS (
            SELECT * FROM (VALUES
                {sign_rows}
            ) s(j, i, sg)
        ), proj AS (
            SELECT m.vec_id, s.j, sum(m.mv * s.sg)::BIGINT AS p
            FROM m JOIN signs s ON m.i = s.i + 1
            GROUP BY m.vec_id, s.j
        ), dproj AS (
            SELECT a.vec_id AS va,
                   sum((a.p - b.p) * (a.p - b.p))::BIGINT AS d2p
            FROM proj a JOIN proj b
              ON b.vec_id = a.vec_id + 1 AND a.j = b.j
            GROUP BY a.vec_id
        ), dorig AS (
            SELECT a.vec_id AS va,
                   sum((a.mv - b.mv) * (a.mv - b.mv))::BIGINT AS d2o
            FROM m a JOIN m b ON b.vec_id = a.vec_id + 1 AND a.i = b.i
            GROUP BY a.vec_id
        ), ratios AS (
            SELECT round(1e6 * p.d2p / ({_JL_OUT_DIM}.0 * o.d2o))::BIGINT
                       AS r_micros
            FROM dproj p JOIN dorig o ON p.va = o.va
            WHERE o.d2o > 0
        )
        SELECT count(*)::BIGINT AS n_pairs,
               ((sum(r_micros)::BIGINT) // count(*)) AS mean_ratio_micros,
               ((count(*) FILTER (abs(r_micros - 1000000) <= 200000)
                 * 1000000) // count(*)) AS p_within_20_micros,
               min(r_micros)::BIGINT AS min_ratio_micros,
               max(r_micros)::BIGINT AS max_ratio_micros
        FROM ratios
    """


@register(
    "jl_projection_distortion_audit",
    oracle=_jl_oracle(),
    doc=f"""Johnson–Lindenstrauss random-sign projection audit
    (Achlioptas '03 database-friendly ±1 variant): embeddings
    milli-quantize to exact integers, project {_JL_IN_DIM}→
    {_JL_OUT_DIM} dims through a CONSTANT md5-derived sign matrix, and
    every consecutive-id pair reports the squared-distance distortion
    ratio ‖Ax−Ay‖²/(k·‖x−y‖²) in micros — mean, share within ±20%,
    min, max.  This is the go/no-go for running first-pass ANN /
    near-dup in the 4× cheaper projected space.  Determinism: the sign
    matrix is a module constant embedded literally in BOTH plans;
    projections and squared distances are exact int64; the only
    doubles are the final per-pair ratio (identical IEEE division)
    and summary floor-divisions.  Scale shape: projection is a
    zip-with fold per vector ({_JL_OUT_DIM} map-side expressions, no
    shuffle, no UDF); pairing is an equi-join on vec_id+1; the audit
    is one 1-row aggregate.  At 100 TB the same plan projects every
    embedding in one map pass — the matrix rides in the closure.""",
)
def jl_projection_distortion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    m = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda e: F.round(e.cast("double") * 1000).cast("long")
        ).alias("mv"),
    )

    def proj_col(j: int) -> Column:
        signs = F.array(*[F.lit(s) for s in _JL_SIGNS[j]])
        return F.aggregate(
            F.zip_with("mv", signs, lambda x, s: x * s),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias(f"p{j}")

    proj = m.select(
        "vec_id", "mv", *[proj_col(j) for j in range(_JL_OUT_DIM)]
    )
    a, b = proj.alias("a"), proj.alias("b")
    d2p = sum(
        (F.col(f"a.p{j}") - F.col(f"b.p{j}"))
        * (F.col(f"a.p{j}") - F.col(f"b.p{j}"))
        for j in range(_JL_OUT_DIM)
    )
    d2o = F.aggregate(
        F.zip_with("a.mv", "b.mv", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    ratios = (
        a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1)
        .select(d2p.alias("d2p"), d2o.alias("d2o"))
        .where(F.col("d2o") > 0)
        .select(
            F.round(
                F.lit(1e6)
                * F.col("d2p")
                / (F.lit(float(_JL_OUT_DIM)) * F.col("d2o"))
            )
            .cast("long")
            .alias("r_micros")
        )
    )
    return ratios.agg(
        F.count("*").alias("n_pairs"),
        _idiv(F.sum("r_micros"), F.count("*")).alias("mean_ratio_micros"),
        _idiv(
            F.sum(
                F.when(
                    F.abs(F.col("r_micros") - 1_000_000) <= 200_000, 1
                ).otherwise(0)
            )
            * F.lit(1_000_000),
            F.count("*"),
        ).alias("p_within_20_micros"),
        F.min("r_micros").alias("min_ratio_micros"),
        F.max("r_micros").alias("max_ratio_micros"),
    )


# --- RLE sort-order economics --------------------------------------------

_RLE_COLS: tuple[str, ...] = ("l_quantity", "l_discount", "l_tax", "ship_month")


@register(
    "rle_compression_audit",
    oracle=f"""
        WITH ordered AS (
            SELECT l_returnflag, l_linestatus,
                   l_quantity, l_discount, l_tax,
                   month(l_shipdate)::BIGINT AS ship_month,
                   lag(l_quantity) OVER w AS p_l_quantity,
                   lag(l_discount) OVER w AS p_l_discount,
                   lag(l_tax) OVER w AS p_l_tax,
                   lag(month(l_shipdate)::BIGINT) OVER w AS p_ship_month
            FROM lineitem
            WINDOW w AS (PARTITION BY l_returnflag, l_linestatus
                         ORDER BY l_shipdate, l_orderkey, l_linenumber,
                                  l_quantity, l_discount, l_tax)
        ), runs AS (
            SELECT count(*)::BIGINT AS n_rows,
                {", ".join(
                    f"sum(CASE WHEN p_{c} IS NULL OR {c} <> p_{c} "
                    f"THEN 1 ELSE 0 END)::BIGINT AS r_{c}"
                    for c in _RLE_COLS
                )}
            FROM ordered
        )
        SELECT v.col_name, runs.n_rows, v.n_runs,
               ((runs.n_rows * 1000000) // v.n_runs) AS rle_ratio_micros
        FROM runs, LATERAL (
            SELECT * FROM (VALUES
                {", ".join(f"('{c}', r_{c})" for c in _RLE_COLS)}
            ) t(col_name, n_runs)
        ) v
        ORDER BY v.col_name
    """,
    doc="""Run-length-encoding economics of the table sort order: under
    the (returnflag, linestatus) partition / (shipdate, orderkey,
    linenumber) order, each audited column reports its run count and
    rows-per-run ratio — the measurement that picks a table's
    sort/cluster keys (long runs → parquet RLE/dictionary pages shrink
    and min-max row-group pruning sharpens; the empirical companion to
    zorder_layout_audit's theoretical locality curves).  Determinism:
    (orderkey, linenumber) is NOT unique in this data, so the sort key
    extends with the audited value columns themselves — rows still
    tied are then identical in every audited column, making run counts
    order-invariant; a run starts where the lagged value is NULL
    (partition head) or differs.  Scale shape: one partitioned window (the
    partition keys are the proposed cluster keys, so the sort IS the
    layout being audited), all columns lagged in the same window pass,
    one 1-row aggregate, a 4-row stack — auditing another column adds
    one expression, not a scan.""",
)
def rle_compression_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).withColumn(
        "ship_month", F.month("l_shipdate").cast("long")
    )
    w = W.partitionBy("l_returnflag", "l_linestatus").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber",
        "l_quantity", "l_discount", "l_tax",
    )
    ordered = li.select(
        *_RLE_COLS,
        *[F.lag(c).over(w).alias(f"p_{c}") for c in _RLE_COLS],
    )
    runs = ordered.agg(
        F.count("*").alias("n_rows"),
        *[
            F.sum(
                F.when(
                    F.col(f"p_{c}").isNull() | (F.col(c) != F.col(f"p_{c}")),
                    1,
                ).otherwise(0)
            ).alias(f"r_{c}")
            for c in _RLE_COLS
        ],
    )
    stack_args = ", ".join(f"'{c}', r_{c}" for c in _RLE_COLS)
    rows = runs.select(
        F.expr(
            f"stack({len(_RLE_COLS)}, {stack_args}) AS (col_name, n_runs)"
        ),
        "n_rows",
    )
    return rows.select(
        "col_name",
        "n_rows",
        "n_runs",
        _idiv(F.col("n_rows") * F.lit(1_000_000), F.col("n_runs")).alias(
            "rle_ratio_micros"
        ),
    ).orderBy("col_name")
