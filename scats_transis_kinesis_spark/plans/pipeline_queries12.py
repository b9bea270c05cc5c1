"""Round-5 closing additions — sketch point-queries, graded retrieval
evaluation, native session windows, and the Spark-4 SQL/Python surface.

- ``countmin_error_audit`` — a Count-Min sketch (Cormode & Muthukrishnan
  '05) over the event stream's user keys, built as plain grouped
  aggregation on the portable hash family, point-queried for EVERY
  distinct key and audited against the exact counts: the one-sided
  error guarantee (estimate >= exact, overestimate bounded by
  collisions) reported as observed error statistics.  The canonical
  "frequency table that fits in one executor" answer at 100 TB.
- ``ndcg_quality_ranking`` — nDCG@k of the heuristic quality ranking
  against graded language relevance (en=3, de=1 gain tiers), completing
  the ranking-evaluation family (precision@k = one cutoff, AUC = every
  cutoff unweighted, nDCG = position-discounted graded).
- ``session_window_native`` — per-user activity sessions via Spark's
  NATIVE ``session_window`` aggregation (the streaming-capable merge of
  overlapping [ts, ts+gap) intervals), the built-in counterpart of the
  gaps-and-islands ``sessionize_users``; the streaming twin is pinned by
  a batch-parity pytest (tests/test_streaming.py).
- ``sql_pipe_surface`` — the Spark 4 SQL pipe-operator syntax
  (``FROM t |> WHERE |> AGGREGATE``, SPARK-49555) driving a real
  multi-step plan; the oracle is the equivalent ANSI form.
- ``udtf_chunk_spans`` — a Python arrow-batched user-defined TABLE
  function (Spark 4 ``@udtf(useArrow=True)``) planning context-window
  chunk spans (size 64, stride 48) per document via LATERAL — the
  set-returning-function surface, kept off the row-at-a-time path
  (plan shows ArrowEvalPythonUDTF, sanctioned by the engine's
  no-BatchEvalPython sweep).

Scale shapes: the sketch is two grouped aggregations (counters are
d·w <= 1024 rows — broadcast); nDCG is two TakeOrderedAndProject top-k
cuts and a window over a K-row bounded frame; session_window is one
keyed shuffle (the state-store-backed streaming form at 100 TB); the
UDTF is an arrow-batched projection with no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import MINHASH_P, duckdb_hash32_sql
from ..sources.loaders import load_table
from .registry import register

# --- Count-Min sketch geometry -------------------------------------
# d=4 independent universal-hash rows (same (a*h+b) mod p family as the
# minhash permutations: a < 2^30 keeps a*h inside int64 in both
# engines), w=256 buckets per row.  d*w = 1024 counters total.
CM_W = 256
CM_PARAMS: tuple[tuple[int, int, int], ...] = (
    (0, 479_001_599, 12_345),
    (1, 715_827_883, 67_891),
    (2, 122_949_829, 424_242),
    (3, 536_870_923, 777_777),
)

_CM_PARAMS_SQL = ", ".join(f"({j}, {a}, {b})" for j, a, b in CM_PARAMS)
_H32_USER = duckdb_hash32_sql("user_id::VARCHAR")


@register(
    "countmin_error_audit",
    oracle=f"""
        WITH p(j, a, b) AS (VALUES {_CM_PARAMS_SQL}),
        h AS (
            SELECT user_id, {_H32_USER} AS h32 FROM events
        ), pb AS (
            SELECT h.user_id, p.j,
                   ((h.h32 * p.a + p.b) % {MINHASH_P}) % {CM_W} AS bucket
            FROM h CROSS JOIN p
        ), counters AS (
            SELECT j, bucket, count(*)::BIGINT AS c
            FROM pb GROUP BY j, bucket
        ), keys AS (
            SELECT user_id, count(*)::BIGINT AS exact, min(h32) AS h32
            FROM h GROUP BY user_id
        ), kb AS (
            SELECT k.user_id, k.exact, p.j,
                   ((k.h32 * p.a + p.b) % {MINHASH_P}) % {CM_W} AS bucket
            FROM keys k CROSS JOIN p
        ), est AS (
            SELECT user_id, min(exact) AS exact, min(c) AS est
            FROM kb JOIN counters USING (j, bucket)
            GROUP BY user_id
        )
        SELECT {len(CM_PARAMS)}::BIGINT AS d, {CM_W}::BIGINT AS w,
               sum(exact)::BIGINT AS n_events,
               count(*)::BIGINT AS n_keys,
               sum(CASE WHEN est = exact THEN 1 ELSE 0 END)::BIGINT
                   AS n_exact_estimates,
               max(est - exact)::BIGINT AS max_overestimate,
               sum(est - exact)::BIGINT AS total_overestimate,
               round(1e6 * sum(est - exact) / count(*))::BIGINT
                   AS mean_over_ppm
        FROM est
    """,
    doc=f"""Count-Min sketch error audit (Cormode & Muthukrishnan '05)
    over the event stream's user keys: build a d={len(CM_PARAMS)},
    w={CM_W} counter table (each key increments one bucket per hash
    row — the same (a·h+b) mod p portable universal-hash family as the
    minhash permutations), point-query EVERY distinct key (estimate =
    min over rows of its bucket counter), and report the observed
    one-sided error against exact counts: keys answered exactly, max
    and total overestimate.  Estimate >= exact ALWAYS holds (each
    bucket counts a superset of the key's occurrences) — an estimate
    below exact would fail the hash.  Scale shape: the build is one
    grouped aggregation whose output is d·w = {len(CM_PARAMS) * CM_W}
    counters (broadcast to the point-query join); the audit join is
    per-DISTINCT-key, not per-event; nothing ever shuffles wider than
    the exact per-key count the audit needs anyway.  At 100 TB the
    sketch is the mergeable per-partition frequency summary (counters
    add across shards — the sketch_mergeability_audit contract), and
    the exact side of THIS audit is what you drop.""",
)
def countmin_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import countmin_estimates

    ev = load_table(spark, "events", sf_dir).select("user_id")
    est = countmin_estimates(ev, "user_id", CM_PARAMS, CM_W)
    over = F.col("est") - F.col("exact")
    return est.agg(
        F.lit(len(CM_PARAMS)).cast("long").alias("d"),
        F.lit(CM_W).cast("long").alias("w"),
        F.sum("exact").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(F.when(over == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_exact_estimates"),
        F.max(over).cast("long").alias("max_overestimate"),
        F.sum(over).cast("long").alias("total_overestimate"),
        F.round(F.lit(1e6) * F.sum(over) / F.count(F.lit(1)))
        .cast("long")
        .alias("mean_over_ppm"),
    )


# --- nDCG of the quality ranking ------------------------------------
# Graded gains by language tier (gain = 2^rel - 1 precomputed exactly:
# en rel=2 -> 3, de rel=1 -> 1, rest rel=0 -> 0).
NDCG_K = 100
_GAIN_SQL = "CASE lang WHEN 'en' THEN 3 WHEN 'de' THEN 1 ELSE 0 END"


def _quality_sql() -> str:
    from .extension_queries import _STOPLIST_SQL

    return f"""round(0.4 * least(len(string_split(text, ' ')) / 100.0, 1.0)
         + 0.3 * (len(list_filter(string_split(text, ' '),
                      t -> t IN ({_STOPLIST_SQL})))::DOUBLE
                  / len(string_split(text, ' ')))
         + 0.3 * (1 - length(regexp_replace(lower(text),
                      '[a-z0-9 ]', '', 'g'))::DOUBLE
                      / length(text)), 6)"""


def _ndcg_oracle() -> str:
    return f"""
        WITH scored AS (
            SELECT doc_id, {_GAIN_SQL} AS gain, {_quality_sql()} AS quality
            FROM documents
        ), top AS (
            SELECT gain,
                   row_number() OVER (ORDER BY quality DESC, doc_id) AS r
            FROM scored ORDER BY quality DESC, doc_id LIMIT {NDCG_K}
        ), ideal AS (
            SELECT gain, row_number() OVER (ORDER BY gain DESC) AS r
            FROM scored ORDER BY gain DESC LIMIT {NDCG_K}
        ), dcg AS (
            SELECT sum(round(1e6 * gain / log2(r + 1))::BIGINT) AS micros
            FROM top
        ), idcg AS (
            SELECT sum(round(1e6 * gain / log2(r + 1))::BIGINT) AS micros
            FROM ideal
        )
        SELECT {NDCG_K}::BIGINT AS k,
               dcg.micros::BIGINT AS dcg_micros,
               idcg.micros::BIGINT AS idcg_micros,
               round(dcg.micros::DOUBLE / idcg.micros, 6) AS ndcg
        FROM dcg CROSS JOIN idcg
    """


@register(
    "ndcg_quality_ranking",
    oracle=_ndcg_oracle(),
    doc=f"""nDCG@{NDCG_K} (Järvelin & Kekäläinen '02) of the heuristic
    quality ranking against graded language relevance (gain tiers
    en=3, de=1, rest 0) — the position-discounted member of the
    ranking-evaluation family (quality_precision_at_k = one binary
    cutoff, quality_auc_en = every cutoff unweighted).  Per-position
    terms gain/log2(rank+1) are rounded to integer MICROS before the
    sum, so both DCG and ideal-DCG are exact integer sums — no
    FP-accumulation-order hazard across partitions; the single FP
    division happens once on two integers.  Scale shape: both the
    ranked cut and the ideal cut are (ORDER BY, LIMIT {NDCG_K}) —
    TakeOrderedAndProject per-partition top-k, never a full sort — and
    the rank window runs over the already-bounded {NDCG_K}-row frame
    (constant partition key, explicitly bounded by the preceding
    limit).""",
)
def ndcg_quality_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import hierarchical_row_number
    from ..operators.text import quality_expr

    docs = load_table(spark, "documents", sf_dir)
    gain = (
        F.when(F.col("lang") == "en", 3)
        .when(F.col("lang") == "de", 1)
        .otherwise(0)
    )
    # One projection instead of scan + scan + 1:1 self-join on doc_id
    # (round-10, session 3 — the quality_auc_en pattern).
    scored = docs.select(
        "doc_id", quality_expr("text").alias("quality"), gain.alias("gain")
    )
    # Both cuts are bounded at NDCG_K rows BEFORE ranking; ranks come
    # from the engine's hierarchical row_number (never an unpartitioned
    # window, even over a bounded frame).  The cuts are eagerly
    # checkpointed: they are <= NDCG_K rows, and the ranker's sizing
    # probes would otherwise re-run the corpus quality scan per job.
    top = (
        scored.orderBy(F.desc("quality"), F.asc("doc_id"))
        .limit(NDCG_K)
        .localCheckpoint(eager=True)
    )
    top_r = hierarchical_row_number(
        top, -F.col("quality"), tiebreak="doc_id", out="r"
    )
    ideal = (
        scored.orderBy(F.desc("gain"), F.asc("doc_id"))
        .limit(NDCG_K)
        .localCheckpoint(eager=True)
    )
    ideal_r = hierarchical_row_number(
        ideal, -F.col("gain"), tiebreak="doc_id", out="r"
    )
    term = F.round(
        F.lit(1e6) * F.col("gain") / F.log2(F.col("r") + F.lit(1))
    ).cast("long")
    dcg = top_r.agg(F.sum(term).alias("dcg_micros"))
    idcg = ideal_r.agg(F.sum(term).alias("idcg_micros"))
    return (
        dcg.crossJoin(F.broadcast(idcg))
        .select(
            F.lit(NDCG_K).cast("long").alias("k"),
            F.col("dcg_micros").cast("long"),
            F.col("idcg_micros").cast("long"),
            F.round(
                F.col("dcg_micros").cast("double") / F.col("idcg_micros"), 6
            ).alias("ndcg"),
        )
    )


# --- Native session windows -----------------------------------------
SESSION_GAP_MIN = 30


@register(
    "session_window_native",
    oracle=f"""
        WITH m AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts > lag(ts) OVER w
                                + INTERVAL {SESSION_GAP_MIN} MINUTE
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
            SELECT user_id, ts, value,
                   sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
            FROM m
        )
        SELECT user_id, min(ts) AS session_start,
               max(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS session_end,
               count(*)::BIGINT AS n_events,
               round(sum(value) * 1e6)::BIGINT AS value_micros
        FROM s GROUP BY user_id, sid
    """,
    doc=f"""Per-user activity sessions via Spark's NATIVE
    ``session_window`` aggregation ({SESSION_GAP_MIN}-minute inactivity
    gap): merges overlapping [ts, ts+gap) intervals inside one keyed
    aggregation — the same operator Structured Streaming runs against
    the state store; the engine's streaming sessionizer
    (streaming/pipeline.py:sessionized_traffic) is THIS plan behind a
    watermark, parity pinned by tests/test_streaming.py::
    test_sessionized_traffic_streaming_matches_batch.  The
    gaps-and-islands ``sessionize_users`` is the window-function
    formulation of the same semantics; this is the one that scales to
    an unbounded stream.  An event exactly gap minutes after its
    predecessor still EXTENDS the session (merge condition is
    ts <= prev + gap — pinned by probe and mirrored in the oracle's
    strict-> break).  Scale shape: ONE shuffle by user key; session
    merge is within-partition; output is per-session rows.""",
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select("user_id", "ts", "value")
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value") * 1e6).cast("long").alias("value_micros"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "value_micros",
        )
    )


# --- Spark 4 SQL pipe-operator syntax --------------------------------
@register(
    "sql_pipe_surface",
    oracle="""
        SELECT o_orderpriority,
               count(*)::BIGINT AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        WHERE o_orderstatus = 'O'
        GROUP BY o_orderpriority
        HAVING count(*) > 10
        ORDER BY revenue DESC
        LIMIT 5
    """,
    doc="""The Spark 4 SQL pipe-operator syntax (SPARK-49555:
    ``FROM t |> WHERE |> AGGREGATE .. GROUP BY |> ORDER BY |> LIMIT``)
    driving a real multi-step aggregation over open orders — the
    pipelined-SQL surface a reference user writing sequential
    transformations would reach for.  The pipe form compiles to the
    IDENTICAL logical plan as the ANSI form (filter pushdown, partial
    aggregation, TakeOrderedAndProject all unchanged) — the oracle IS
    that ANSI form.""",
)
def sql_pipe_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders")
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE count(*) AS n_orders,
                     round(sum(o_totalprice), 2) AS revenue
           GROUP BY o_orderpriority
        |> WHERE n_orders > 10
        |> SELECT o_orderpriority, CAST(n_orders AS BIGINT) AS n_orders,
                  revenue
        |> ORDER BY revenue DESC
        |> LIMIT 5
        """
    )


# --- Python arrow UDTF: context-window chunk spans --------------------
CHUNK_SIZE = 64
CHUNK_STRIDE = 48


def _chunk_spans_udtf():
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="doc_id: long, chunk_idx: int, start_tok: int, n_toks: int",
        useArrow=True,
    )
    class ChunkSpans:
        """Emit (chunk_idx, start_tok, n_toks) covering [0, n_tokens)
        with CHUNK_SIZE windows advancing by CHUNK_STRIDE; the last
        chunk stops as soon as coverage is complete (no redundant
        tail that a previous chunk already covers)."""

        def eval(self, doc_id, n_tokens):  # noqa: ANN001
            if n_tokens is None or n_tokens <= 0:
                return
            i, idx = 0, 0
            while True:
                yield (doc_id, idx, i, min(CHUNK_SIZE, n_tokens - i))
                if i + CHUNK_SIZE >= n_tokens:
                    return
                i += CHUNK_STRIDE
                idx += 1

    return ChunkSpans


@register(
    "udtf_chunk_spans",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, len(string_split(text, ' ')) AS n
            FROM documents
        ), c AS (
            SELECT doc_id, n,
                   unnest(generate_series(0,
                       CASE WHEN n <= {CHUNK_SIZE} THEN 0
                            ELSE (n - {CHUNK_SIZE} + {CHUNK_STRIDE} - 1)
                                 // {CHUNK_STRIDE} END)) AS chunk_idx
            FROM t WHERE n > 0
        )
        SELECT doc_id, chunk_idx::INT AS chunk_idx,
               ({CHUNK_STRIDE} * chunk_idx)::INT AS start_tok,
               least({CHUNK_SIZE}, n - {CHUNK_STRIDE} * chunk_idx)::INT
                   AS n_toks
        FROM c
    """,
    doc=f"""Context-window chunk-span planning as a Python
    user-defined TABLE function (Spark 4 ``@udtf(useArrow=True)``),
    applied per document via LATERAL: spans of {CHUNK_SIZE} tokens
    advancing by {CHUNK_STRIDE} (overlap {CHUNK_SIZE - CHUNK_STRIDE}),
    stopping at full coverage.  Exercises the set-returning-function
    surface — registration, LATERAL correlation, arrow-batched
    evaluation (plan shows ArrowEvalPythonUDTF; the engine's
    no-row-wise-Python sweep sanctions exactly the Arrow path).  The
    heavy lifting (token counting) stays JVM-side; the UDTF sees only
    (doc_id, n_tokens) scalars and emits O(n/stride) span rows — the
    pattern for custom set-returning logic Spark lacks natively.
    The pack_context_windows / text_chunking queries are the pure-SQL
    formulations of the same planning step; this one exists for the
    API surface and is deliberately data-light.""",
)
def udtf_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import tokens

    spark.udtf.register("chunk_spans", _chunk_spans_udtf())
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.size(tokens("text")).alias("n_toks_total")
    )
    docs.createOrReplaceTempView("chunk_span_input")
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.start_tok, c.n_toks
        FROM chunk_span_input t,
        LATERAL chunk_spans(t.doc_id, t.n_toks_total) c
        """
    )


# --- Window distribution-function surface -----------------------------
@register(
    "window_distribution_stats",
    oracle="""
        WITH r AS (
            SELECT c_custkey, c_nationkey,
                   row_number() OVER w AS rn,
                   count(*) OVER (PARTITION BY c_nationkey) AS n,
                   ntile(10) OVER w AS balance_decile
            FROM customer
            WINDOW w AS (PARTITION BY c_nationkey
                         ORDER BY c_acctbal, c_custkey)
        )
        SELECT c_custkey, c_nationkey,
               CASE WHEN n > 1 THEN (((rn - 1) * 1000000) // (n - 1))
                    ELSE 0 END AS balance_pct_rank_micros,
               ((rn * 1000000) // n) AS balance_cume_micros,
               balance_decile
        FROM r
    """,
    doc="""The distribution window functions (percent_rank, cume_dist,
    ntile) over customer balances within each nation — the remaining
    members of the ANSI window surface after window_order_ranks
    (row_number/rank/dense_rank/lag/lead) and window_frames_running
    (frames).  The custkey tiebreak makes the order TOTAL, so
    percent_rank = (rn−1)/(n−1) and cume_dist = rn/n reduce to exact
    integer floor-micros ratios — round-6 doubles flipped one ulp at
    sf0.1 when the exact rational landed on the decimal half boundary
    (Spark's BigDecimal HALF_UP vs DuckDB's binary-double rounding),
    the same class the Holt fix closed; the integer contract removes
    the boundary entirely.  Every window is PARTITIONED by nation —
    the engine-wide no-unpartitioned-window invariant; at 100 TB each
    partition computes independently after one keyed shuffle.""",
)
def window_distribution_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from .pipeline_queries13 import _idiv

    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    nw = W.partitionBy("c_nationkey")
    base = load_table(spark, "customer", sf_dir).select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(nw).alias("n"),
        F.ntile(10).over(w).alias("balance_decile"),
    )
    return base.select(
        "c_custkey",
        "c_nationkey",
        F.when(
            F.col("n") > 1,
            _idiv((F.col("rn") - 1) * 1_000_000, F.col("n") - 1),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("balance_pct_rank_micros"),
        _idiv(F.col("rn") * 1_000_000, F.col("n")).alias("balance_cume_micros"),
        "balance_decile",
    )


# --- Map higher-order-function surface --------------------------------
# Month split for the per-user activity-shift maps.
MAP_HOF_SPLIT = "2024-01-16 00:00:00"


@register(
    "map_hof_surface",
    oracle=f"""
        WITH c AS (
            SELECT user_id, event_type,
                   sum(CASE WHEN ts < TIMESTAMP '{MAP_HOF_SPLIT}'
                            THEN 1 ELSE 0 END)::BIGINT AS c1,
                   sum(CASE WHEN ts >= TIMESTAMP '{MAP_HOF_SPLIT}'
                            THEN 1 ELSE 0 END)::BIGINT AS c2
            FROM events GROUP BY user_id, event_type
        ), t AS (
            SELECT user_id, sum(c1 + c2)::BIGINT AS tot FROM c
            GROUP BY user_id
        )
        SELECT c.user_id, c.event_type,
               (c.c2 - c.c1)::BIGINT AS delta,
               round(1e6 * (c.c2 - c.c1) / t.tot)::BIGINT AS delta_ppm
        FROM c JOIN t USING (user_id)
        WHERE c.c2 <> c.c1
    """,
    doc=f"""Per-user activity-shift maps via the MAP higher-order
    functions — the map-typed complement of hof_array_surface: each
    user's first-half and second-half event-type count maps
    (map_from_entries over grouped counts, zero entries dropped with
    map_filter so the key sets genuinely differ), diffed with
    map_zip_with over the KEY UNION (missing sides coalesce to 0),
    zero deltas dropped with a second map_filter, and the surviving
    values enriched via transform_values (delta plus delta as ppm of
    the user's total activity) before exploding back to rows.  The
    split is {MAP_HOF_SPLIT!r}.  Scale shape: maps are bounded at
    |event types| entries per user — one grouped aggregation and pure
    codegen'd map expressions after it; the oracle replays the same
    semantics relationally (conditional halves, full key union via the
    grouped base, c2 <> c1 filter).""",
)
def map_hof_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", "ts"
    )
    split = F.lit(MAP_HOF_SPLIT).cast("timestamp")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.sum(F.when(F.col("ts") < split, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("ts") >= split, 1).otherwise(0)).alias("c2"),
    )
    maps = counts.groupBy("user_id").agg(
        F.map_filter(
            F.map_from_entries(
                F.collect_list(F.struct("event_type", "c1"))
            ),
            lambda _, v: v > 0,
        ).alias("m1"),
        F.map_filter(
            F.map_from_entries(
                F.collect_list(F.struct("event_type", "c2"))
            ),
            lambda _, v: v > 0,
        ).alias("m2"),
        F.sum(F.col("c1") + F.col("c2")).alias("tot"),
    )
    delta = F.map_filter(
        F.map_zip_with(
            "m1",
            "m2",
            lambda _, a, b: F.coalesce(b, F.lit(0)) - F.coalesce(a, F.lit(0)),
        ),
        lambda _, v: v != 0,
    )
    enriched = F.transform_values(
        delta,
        lambda _, v: F.struct(
            v.cast("long").alias("delta"),
            F.round(F.lit(1e6) * v / F.col("tot")).cast("long").alias(
                "delta_ppm"
            ),
        ),
    )
    return (
        maps.select("user_id", F.explode(enriched).alias("event_type", "s"))
        .select("user_id", "event_type", "s.delta", "s.delta_ppm")
    )


# --- ANN recall audit --------------------------------------------------
def _ann_recall_oracle() -> str:
    from .extension_queries import _COS, _SIM_QUERY_IDS

    ids = ", ".join(map(str, _SIM_QUERY_IDS))
    return f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), q AS (
            SELECT vec_id AS query_id, v AS qvec FROM e
            WHERE vec_id IN ({ids})
        ), bf AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY {_COS.format(a="q.qvec", b="c.v")} DESC,
                                    c.vec_id) AS rn
                FROM q JOIN e c ON c.vec_id <> q.query_id
            ) WHERE rn <= 5
        ), cents AS (
            SELECT vec_id AS centroid_id, v AS cvec FROM e
            ORDER BY vec_id LIMIT 16
        ), assigned AS (
            SELECT vec_id, v, centroid_id FROM (
                SELECT e.vec_id, e.v, c.centroid_id,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_COS.format(a="e.v", b="c.cvec")} DESC,
                                    c.centroid_id ASC) AS rn
                FROM e CROSS JOIN cents c
            ) WHERE rn = 1
        ), probe AS (
            SELECT query_id, qvec, centroid_id FROM (
                SELECT q.query_id, q.qvec, c.centroid_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY {_COS.format(a="q.qvec", b="c.cvec")} DESC,
                                    c.centroid_id ASC) AS rn
                FROM q CROSS JOIN cents c
            ) WHERE rn <= 4
        ), ivf AS (
            SELECT query_id, neighbor_id FROM (
                SELECT s.query_id, s.neighbor_id,
                       row_number() OVER (
                           PARTITION BY s.query_id
                           ORDER BY s.cosine_sim DESC, s.neighbor_id) AS rn
                FROM (
                    SELECT p.query_id, a.vec_id AS neighbor_id,
                           {_COS.format(a="p.qvec", b="a.v")} AS cosine_sim
                    FROM probe p JOIN assigned a USING (centroid_id)
                    WHERE a.vec_id <> p.query_id
                ) s
            ) WHERE rn <= 5
        )
        SELECT bf.query_id, 5::BIGINT AS k,
               count(ivf.neighbor_id)::BIGINT AS n_hits,
               round(1e6 * count(ivf.neighbor_id) / 5)::BIGINT
                   AS recall_ppm
        FROM bf LEFT JOIN ivf
          ON ivf.query_id = bf.query_id
         AND ivf.neighbor_id = bf.neighbor_id
        GROUP BY bf.query_id
    """


@register(
    "ann_recall_audit",
    oracle=_ann_recall_oracle(),
    doc="""Recall@5 of the IVF-pruned approximate nearest-neighbor path
    against the exact brute-force ranking, per query — the
    similarity-search member of the estimate-vs-exact audit family
    (near_dup_agreement_audit for the dedup detectors, the
    sketch_mergeability/countmin audits for the sketches): the number a
    100 TB deployment watches when tuning (num_centroids, nprobe),
    computed IN-QUERY so a probe-routing regression flips the hashed
    result.  Reuses the production operators verbatim
    (operators/similarity.py:cosine_topk_bruteforce /
    cosine_topk_bucketed, both driver-green as standalone queries);
    the audit join is per-(query, neighbor) over two bounded
    |queries|·k frames.  The statistical side (recall floor across
    corpus draws) is pinned by test_ivf_recall_vs_bruteforce.""",
)
def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity as S
    from .extension_queries import _SIM_QUERY_IDS

    emb = load_table(spark, "embeddings", sf_dir)
    k = 5
    exact = S.cosine_topk_bruteforce(emb, query_ids=_SIM_QUERY_IDS, k=k)
    approx = S.cosine_topk_bucketed(
        emb, query_ids=_SIM_QUERY_IDS, k=k, num_centroids=16, nprobe=4
    )
    hits = exact.select("query_id", "neighbor_id").join(
        approx.select(
            "query_id", "neighbor_id", F.lit(1).alias("hit")
        ),
        ["query_id", "neighbor_id"],
        "left",
    )
    return hits.groupBy("query_id").agg(
        F.lit(k).cast("long").alias("k"),
        F.count("hit").cast("long").alias("n_hits"),
        F.round(F.lit(1e6) * F.count("hit") / F.lit(k))
        .cast("long")
        .alias("recall_ppm"),
    )


# --- Holt linear-trend smoothing ---------------------------------------
# Fixed smoothing weights alpha = beta = 1/2, realized as EXACT integer
# halving in micros: round-half-up(x/2) = floor((x+1)/2).  A
# round(.,6)-lockstep double contract is NOT safe here — dyadic weights
# put every intermediate exactly ON a .5e-7 decimal boundary, where
# Spark (BigDecimal HALF_UP on the binary double) and DuckDB
# (multiply-and-round) legitimately disagree; a one-ulp flip surfaced
# at sf0.001.  Integer micros make the recurrence bit-exact by
# construction.


@register(
    "holt_linear_daily",
    oracle="""
        WITH RECURSIVE d AS (
            SELECT event_type, ts::DATE AS day,
                   (count(*) * 1000000)::BIGINT AS ym,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY ts::DATE) AS i
            FROM events GROUP BY event_type, ts::DATE
        ), n AS (
            SELECT event_type, max(i) AS n_days FROM d GROUP BY event_type
        ), hw(event_type, i, l, t) AS (
            SELECT event_type, 1, ym, 0::BIGINT FROM d WHERE i = 1
            UNION ALL
            SELECT d.event_type, d.i,
                   floor((d.ym + hw.l + hw.t + 1) / 2.0)::BIGINT,
                   floor((floor((d.ym + hw.l + hw.t + 1) / 2.0)::BIGINT
                          - hw.l + hw.t + 1) / 2.0)::BIGINT
            FROM hw JOIN d ON d.event_type = hw.event_type
                          AND d.i = hw.i + 1
        )
        SELECT hw.event_type, n.n_days::BIGINT AS n_days,
               hw.l AS level_micros, hw.t AS trend_micros,
               (hw.l + hw.t)::BIGINT AS forecast_micros
        FROM hw JOIN n USING (event_type) WHERE hw.i = n.n_days
    """,
    doc="""Holt linear-trend exponential smoothing (Holt '57) of the
    daily event volume per type — a sequential level/trend recurrence
    (alpha = beta = 1/2), the class of per-key ORDERED folds SQL
    cannot express directly.  Engine side: one grouped count per (type,
    day), then the day series collects into a bounded per-key array
    (|days| entries — the LOCF/resample pattern) and the recurrence
    runs as a codegen'd ``aggregate`` fold with a struct accumulator.
    The state is EXACT INTEGER MICROS — each half-weight update is
    round-half-up(x/2) = floor((x+1)/2) on integers, so the contract
    has no FP anywhere (a round-6 double lockstep was tried first and
    flipped one ulp at sf0.001: dyadic weights put every value ON the
    decimal rounding boundary, where Spark's BigDecimal HALF_UP and
    DuckDB's multiply-and-round disagree).  The oracle replays the
    recurrence as a recursive CTE over day-indexed rows — NOT DuckDB's
    ``list_reduce``, whose struct accumulator exposes already-updated
    sibling fields (probed on v1.0.0).  Scale shape: state is (level,
    trend) scalars per key; the array is bounded by the date range,
    and a longer horizon chunks by (key, month) with carried state
    exactly like the incremental-aggregation queries.  Seeds: level =
    first day's count in micros, trend = 0.""",
)
def holt_linear_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg((F.count(F.lit(1)) * F.lit(1_000_000)).alias("ym"))
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "ym"))),
            lambda r: r["ym"],
        ).alias("ys"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )

    def half_up(x):
        # round-half-up(x/2) on integers; the double division is exact
        # below 2^53 micros and floor() restores the integer.
        return F.floor((x + F.lit(1)) / F.lit(2.0)).cast("long")

    def step(acc, ym):
        lvl = half_up(ym + acc["l"] + acc["t"])
        return F.struct(
            lvl.alias("l"),
            half_up(lvl - acc["l"] + acc["t"]).alias("t"),
        )

    state = F.aggregate(
        F.slice(F.col("ys"), F.lit(2), F.size("ys")),
        F.struct(
            F.element_at(F.col("ys"), 1).cast("long").alias("l"),
            F.lit(0).cast("long").alias("t"),
        ),
        step,
    )
    return series.select(
        "event_type",
        "n_days",
        state["l"].alias("level_micros"),
        state["t"].alias("trend_micros"),
        (state["l"] + state["t"]).cast("long").alias("forecast_micros"),
    )


# --- k-core peeling ----------------------------------------------------
KCORE_K = 12
KCORE_ROUNDS = 3


def _kcore_oracle() -> str:
    from .pipeline_queries5 import _COPURCHASE_EDGE_CTES

    ctes = [_COPURCHASE_EDGE_CTES, "e0 AS (SELECT u, v FROM edges)"]
    for r in range(KCORE_ROUNDS):
        ctes.append(
            f"""k{r} AS (
                SELECT x FROM (
                    SELECT u AS x FROM e{r}
                    UNION ALL SELECT v FROM e{r}
                ) GROUP BY x HAVING count(*) >= {KCORE_K}
            )"""
        )
        ctes.append(
            f"""e{r + 1} AS (
                SELECT u, v FROM e{r}
                WHERE u IN (SELECT x FROM k{r})
                  AND v IN (SELECT x FROM k{r})
            )"""
        )
    last = f"e{KCORE_ROUNDS}"
    return f"""
        WITH {", ".join(ctes)}
        SELECT x AS vertex, count(*)::BIGINT AS core_degree
        FROM (SELECT u AS x FROM {last} UNION ALL SELECT v FROM {last})
        GROUP BY x
    """


@register(
    "kcore_peel_copurchase",
    oracle=_kcore_oracle(),
    doc=f"""k-core peeling (Seidman '83) of the 1995 co-purchase graph,
    k={KCORE_K}, {KCORE_ROUNDS} synchronous rounds
    (operators/graph.py:kcore_peel): each round drops vertices whose
    degree in the SURVIVING subgraph fell below k, cascading — the
    graph-density screen that separates a dense recommendation core
    from peripheral long-tail parts (and, on dedup-cluster graphs,
    genuine duplicate cores from chance-collision tendrils).  The
    fixed round count is the deterministic contract (the LPA/k-means
    trick; the true core is the fixpoint of the same loop).  Per
    round: one grouped degree count + two vertex-keyed semi-joins,
    round edges eagerly checkpointed.  The oracle unrolls the
    {KCORE_ROUNDS} rounds as chained CTEs.""",
)
def kcore_peel_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import kcore_peel
    from .pipeline_queries5 import _copurchase_edges

    return kcore_peel(
        _copurchase_edges(spark, sf_dir), k=KCORE_K, rounds=KCORE_ROUNDS
    )


# --- Mean reciprocal rank ----------------------------------------------
@register(
    "mrr_quality_by_source",
    oracle="""
        WITH ranked AS (
            SELECT source, lang,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id) AS r
            FROM documents
        ), firsts AS (
            SELECT source, min(r) AS first_rel
            FROM ranked WHERE lang = 'en' GROUP BY source
        ), rr AS (
            SELECT s.source,
                   coalesce(round(1000000.0 / f.first_rel), 0)::BIGINT
                       AS rr_ppm
            FROM (SELECT DISTINCT source FROM documents) s
            LEFT JOIN firsts f USING (source)
        )
        SELECT count(*)::BIGINT AS n_queries,
               sum(CASE WHEN rr_ppm > 0 THEN 1 ELSE 0 END)::BIGINT
                   AS n_with_relevant,
               sum(rr_ppm)::BIGINT AS total_rr_ppm,
               round(sum(rr_ppm)::DOUBLE / count(*))::BIGINT AS mrr_ppm
        FROM rr
    """,
    doc="""Mean reciprocal rank of the first relevant ('en') document
    across per-source length rankings — each source acts as a query,
    the position of its first relevant hit contributes 1/rank
    (integer ppm; sources with no relevant doc contribute 0) — the
    last member of the ranking-evaluation family
    (quality_precision_at_k = one cutoff, quality_auc_en = every
    cutoff, ndcg_quality_ranking = graded positions, this = first-hit
    latency, the navigational-retrieval metric).  Scale shape: one
    source-PARTITIONED rank window, a grouped min, and a
    |sources|-row summary — no global window, no collect.""",
)
def mrr_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    r = F.row_number().over(
        W.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    )
    ranked = docs.select("source", "lang", r.alias("r"))
    firsts = (
        ranked.where(F.col("lang") == "en")
        .groupBy("source")
        .agg(F.min("r").alias("first_rel"))
    )
    rr = (
        docs.select("source")
        .distinct()
        .join(firsts, "source", "left")
        .select(
            F.coalesce(
                F.round(F.lit(1000000.0) / F.col("first_rel")), F.lit(0)
            )
            .cast("long")
            .alias("rr_ppm")
        )
    )
    return rr.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum(F.when(F.col("rr_ppm") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_with_relevant"),
        F.sum("rr_ppm").cast("long").alias("total_rr_ppm"),
        F.round(F.sum("rr_ppm").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("mrr_ppm"),
    )
