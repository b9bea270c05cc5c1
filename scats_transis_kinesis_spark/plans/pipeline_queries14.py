"""Round-5 batch: text-graph ranking, burst detection, and winnowing
fingerprints — three classics that close the text-mining surface:

- ``textrank_keywords`` — TextRank (Mihalcea & Tarau '04): PageRank
  over the token co-occurrence graph (adjacent heavy-hitter tokens),
  the unsupervised keyword extractor — corpus-level salient terms
  without any training, the standard pre-LLM keyword baseline.
- ``burst_detection_daily`` — Kleinberg-style burst detection ('02):
  a two-state (base/burst) rate automaton over per-type daily volume,
  solved by a FORWARD min-plus Viterbi fold in integer micros; the
  per-day margin V_base − V_burst flags the days where the burst
  state is strictly cheaper (crawl-spike / incident detection over
  ingest logs).
- ``winnowing_dup_pairs`` — winnowing document fingerprints (Schleimer
  et al., SIGMOD '03 — the MOSS algorithm): the min k-gram hash of
  every sliding window is a fingerprint; any shared substring of
  length ≥ w+k−1 GUARANTEES a shared fingerprint, the detection
  guarantee MinHash cannot give.  Shared-fingerprint doc pairs are
  the dedup report.

Scale shapes: the token graph is bounded by the heavy-hitter vocab
(broadcast semi-join — the domain_shift_kl economics) and iterates on
|vocab|-sized frames; the burst DP folds a bounded per-type day array
(the Holt/Kaplan–Meier recurrence class) after one row-scale grouped
count; winnowing is per-doc partitioned windows + a fingerprint
equi-join — banded-dedup economics, no pairwise scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.hashing import duckdb_hash32_sql, portable_hash32
from ..sources.loaders import load_table
from .pipeline_queries13 import _idiv
from .registry import register

# --- TextRank ------------------------------------------------------------

TR_HH = 200  # heavy-hitter vocabulary floor (domain_shift_kl's regime)
TR_TOPK = 20
TR_DAMPING = 0.85
TR_ITERS = 3


def _textrank_oracle() -> str:
    iters = []
    for k in range(1, TR_ITERS + 1):
        iters.append(
            f"""r{k} AS (
                SELECT n.node,
                       round((SELECT bs FROM base)
                             + {TR_DAMPING} * coalesce(
                                   sum(p.rank * e.wn), 0), 6) AS rank
                FROM nodes n
                LEFT JOIN nrm e ON e.v = n.node
                LEFT JOIN r{k - 1} p ON p.node = e.u
                GROUP BY n.node
            )"""
        )
    return f"""
        WITH toks AS (
            SELECT doc_id, tok, i
            FROM (
                SELECT doc_id,
                       unnest(string_split(text, ' ')) AS tok,
                       generate_subscripts(string_split(text, ' '), 1) AS i
                FROM documents
            )
        ), vocab AS (
            SELECT tok FROM toks GROUP BY tok HAVING count(*) >= {TR_HH}
        ), vt AS (
            SELECT toks.doc_id, toks.tok, toks.i FROM toks
            JOIN vocab ON toks.tok = vocab.tok
        ), co AS (
            SELECT least(a.tok, b.tok) AS u, greatest(a.tok, b.tok) AS v,
                   count(*)::DOUBLE AS w
            FROM vt a JOIN vt b
              ON a.doc_id = b.doc_id AND b.i = a.i + 1 AND a.tok <> b.tok
            GROUP BY 1, 2
        ), edges AS (
            SELECT u AS src, v AS dst, w FROM co
            UNION ALL
            SELECT v, u, w FROM co
        ), nodes AS (SELECT DISTINCT src AS node FROM edges),
        nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
        base AS (
            SELECT round((1 - {TR_DAMPING}) / n, 6) AS bs FROM nn
        ), nrm AS (
            SELECT src AS u, dst AS v,
                   w / sum(w) OVER (PARTITION BY src) AS wn
            FROM edges
        ), r0 AS (
            SELECT node, round(1.0 / (SELECT n FROM nn), 6) AS rank
            FROM nodes
        ), {", ".join(iters)}
        SELECT node AS token, rank FROM r{TR_ITERS}
        ORDER BY rank DESC, token LIMIT {TR_TOPK}
    """


@register(
    "textrank_keywords",
    oracle=_textrank_oracle(),
    doc=f"""TextRank keyword extraction (Mihalcea & Tarau '04):
    PageRank (damping {TR_DAMPING}, {TR_ITERS} rounds) over the
    undirected co-occurrence graph of ADJACENT heavy-hitter tokens
    (count ≥ {TR_HH}), edge weight = adjacency count — the
    unsupervised corpus-keyword baseline.  Unlike the nation-graph
    PageRank (25 nodes, final-round round-6), the token graph is
    hundreds of nodes with wide in-neighborhoods, so the lockstep
    contract rounds EVERY round to 6 decimals in both engines (the
    k-means convention) — FP addition-order noise cannot compound
    across rounds.  Scale shape: adjacent pairs are read straight off
    each row's token array by a narrow generator (no positional
    self-join, never |vocab|²); the vocabulary prune is two broadcast
    semi-joins on the heavy-hitter list (domain_shift_kl economics);
    each round is one keyed join + grouped sum on |vocab|-bounded
    frames; report is TakeOrdered top-{TR_TOPK}.""",
)
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    # Round-10 optimization (guide §3.6 — a join that can be a
    # generator should not be a join; §1.2 step 1).  Adjacency lives
    # inside each row's token ARRAY, so the old positional self-join
    # (explode all tokens, shuffle on (doc, i), join b.i = a.i + 1) is
    # a narrow generator instead: posexplode keeps the array, the
    # successor is element_at(tk, i0 + 2).  The vocabulary filter moves
    # AFTER pair emission (two broadcast semi-joins — same pair
    # multiset: a pair survives iff both endpoints are heavy hitters,
    # exactly the old both-sides-pre-filtered join condition).  The
    # tiny heavy-hitter list is checkpointed once (it feeds two
    # broadcasts); the co frame is the single eager materialization —
    # edges/nodes/nrm re-derive from it narrowly instead of each
    # paying an eager job.
    tk = docs.select(F.split("text", " ").alias("tk"))
    vocab = (
        tk.select(F.explode("tk").alias("tok"))
        .groupBy("tok")
        .count()
        .where(F.col("count") >= TR_HH)
        .select("tok")
        .localCheckpoint(eager=True)
    )
    bg = (
        tk.select("tk", F.posexplode("tk").alias("i0", "a"))
        .where(F.col("i0") + 2 <= F.size("tk"))
        .select("a", F.element_at("tk", F.col("i0") + 2).alias("b"))
        .where(F.col("a") != F.col("b"))
    )
    co = (
        bg.join(
            F.broadcast(vocab.select(F.col("tok").alias("a"))), "a", "left_semi"
        )
        .join(
            F.broadcast(vocab.select(F.col("tok").alias("b"))), "b", "left_semi"
        )
        .groupBy(
            F.least("a", "b").alias("u"),
            F.greatest("a", "b").alias("v"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .localCheckpoint(eager=True)
    )
    edges = co.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "w"
    ).unionAll(
        co.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w")
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError(
            "textrank_keywords: no token reaches the heavy-hitter floor "
            f"(TR_HH={TR_HH}) — corpus too small for a co-occurrence graph"
        )
    base = round((1 - TR_DAMPING) / n_nodes, 6)
    out_w = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    nrm = edges.join(out_w, "src").select(
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        (F.col("w") / F.col("ow")).alias("wn"),
    ).localCheckpoint(eager=True)
    ranks = nodes.select(
        "node", F.lit(round(1.0 / n_nodes, 6)).alias("rank")
    )
    for _ in range(TR_ITERS):
        contrib = (
            ranks.join(nrm, ranks.node == nrm.u)
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("wn")).alias("acc"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            F.round(
                F.lit(base) + TR_DAMPING * F.coalesce("acc", F.lit(0.0)), 6
            ).alias("rank"),
        )
    return (
        ranks.orderBy(F.desc("rank"), "node")
        .limit(TR_TOPK)
        .select(F.col("node").alias("token"), "rank")
    )


# --- Burst detection -----------------------------------------------------

BURST_GAMMA = 500_000  # state-switch penalty, micros
BURST_RATE_FACTOR = 2  # burst rate = factor × base rate


def _burst_oracle() -> str:
    return f"""
        WITH RECURSIVE bounds AS (
            SELECT date_trunc('day', min(ts)) AS d0,
                   date_trunc('day', max(ts)) AS d1
            FROM events
        ), grid AS (
            SELECT t.event_type,
                   unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS day
            FROM (SELECT DISTINCT event_type FROM events) t, bounds b
        ), actual AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   count(*)::BIGINT AS c
            FROM events GROUP BY 1, 2
        ), daily AS (
            SELECT g.event_type, g.day, coalesce(a.c, 0) AS c,
                   row_number() OVER (PARTITION BY g.event_type
                                      ORDER BY g.day) AS i
            FROM grid g LEFT JOIN actual a
              ON a.event_type = g.event_type AND a.day = g.day
        ), rates AS (
            SELECT event_type,
                   sum(c)::DOUBLE / count(*) AS r0,
                   {BURST_RATE_FACTOR} * sum(c)::DOUBLE / count(*) AS r1
            FROM daily GROUP BY event_type
        ), costed AS (
            SELECT d.event_type, d.day, d.c, d.i,
                   round(1000000 * (r.r0 - d.c * ln(r.r0)))::BIGINT AS k0,
                   round(1000000 * (r.r1 - d.c * ln(r.r1)))::BIGINT AS k1
            FROM daily d JOIN rates r USING (event_type)
        ), dp(event_type, i, day, v0, v1) AS (
            SELECT event_type, i, day, k0,
                   k1 + {BURST_GAMMA}
            FROM costed WHERE i = 1
            UNION ALL
            SELECT c.event_type, c.i, c.day,
                   c.k0 + least(dp.v0, dp.v1 + {BURST_GAMMA}),
                   c.k1 + least(dp.v1, dp.v0 + {BURST_GAMMA})
            FROM dp JOIN costed c
              ON c.event_type = dp.event_type AND c.i = dp.i + 1
        )
        SELECT event_type, day,
               (v0 - v1)::BIGINT AS burst_margin_micros,
               (v0 > v1) AS is_burst
        FROM dp
    """


@register(
    "burst_detection_daily",
    oracle=_burst_oracle(),
    doc=f"""Kleinberg-style burst detection ('02) over per-type daily
    event volume: a two-state rate automaton (base rate = the type's
    mean daily count, burst rate = {BURST_RATE_FACTOR}×), solved by a
    forward min-plus Viterbi recurrence with switch penalty
    {BURST_GAMMA} micros — the ingest-spike detector (crawl bursts,
    incident storms) that a plain threshold can't give hysteresis.
    Day costs quantize the Poisson negative log-likelihood (dropping
    the state-independent ln c! term) to integer micros ONCE, so the
    DP itself is EXACT integer min-plus — the sequential-recurrence
    contract class (Holt, Kaplan–Meier); the reported margin
    V_base − V_burst is positive exactly when ending the prefix in
    the burst state is strictly cheaper.  Scale shape: one row-scale
    grouped count per (type, day), a gap-filled per-type day grid
    (the resample pattern), then a codegen'd ``aggregate`` fold over
    each type's BOUNDED day array; the oracle replays the fold as a
    recursive CTE.""",
)
def burst_detection_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    actual = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    # Pinned: the gap-filled day grid is bounded at |types| × |days|
    # rows and BOTH the per-type base-rate aggregate and the day-cost
    # projection read it — without the cut each re-derived the
    # bounds probe + distinct-types + grouped-count event scans
    # (change-8 waist; 6 effective scans → 3).
    daily = grid.join(actual, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    ).localCheckpoint(eager=True)
    rates = daily.groupBy("event_type").agg(
        (F.sum("c").cast("double") / F.count(F.lit(1))).alias("r0")
    )
    costed = daily.join(F.broadcast(rates), "event_type").select(
        "event_type",
        "day",
        F.round(
            F.lit(1_000_000) * (F.col("r0") - F.col("c") * F.log(F.col("r0")))
        )
        .cast("long")
        .alias("k0"),
        F.round(
            F.lit(1_000_000)
            * (
                F.lit(float(BURST_RATE_FACTOR)) * F.col("r0")
                - F.col("c") * F.log(F.lit(float(BURST_RATE_FACTOR)) * F.col("r0"))
            )
        )
        .cast("long")
        .alias("k1"),
    )
    series = costed.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "k0", "k1"))).alias("xs")
    )
    g = F.lit(BURST_GAMMA)

    def step(acc, x):
        v0 = x["k0"] + F.least(acc["v0"], acc["v1"] + g)
        v1 = x["k1"] + F.least(acc["v1"], acc["v0"] + g)
        row = F.struct(
            x["day"].alias("day"),
            (v0 - v1).alias("burst_margin_micros"),
            (v0 > v1).alias("is_burst"),
        )
        return F.struct(
            v0.alias("v0"),
            v1.alias("v1"),
            F.array_append(acc["out"], row).alias("out"),
        )

    folded = series.select(
        "event_type",
        F.aggregate(
            F.slice(F.col("xs"), F.lit(2), F.size("xs")),
            F.struct(
                F.element_at(F.col("xs"), 1)["k0"].alias("v0"),
                (F.element_at(F.col("xs"), 1)["k1"] + g).alias("v1"),
                F.expr(
                    "array(struct("
                    "element_at(xs, 1).day AS day,"
                    "CAST(element_at(xs, 1).k0 - element_at(xs, 1).k1"
                    f" - {BURST_GAMMA} AS BIGINT) AS burst_margin_micros,"
                    "element_at(xs, 1).k0 > element_at(xs, 1).k1"
                    f" + {BURST_GAMMA} AS is_burst))"
                ).alias("out"),
            ),
            step,
            lambda acc: acc["out"],
        ).alias("out"),
    )
    return folded.select(
        "event_type", F.explode("out").alias("r")
    ).select("event_type", "r.*")


# --- Winnowing fingerprints ----------------------------------------------

WIN_K = 3  # k-gram size (tokens)
WIN_W = 4  # winnowing window (k-grams per window)
WIN_TOPK = 20
_WIN_HASH = duckdb_hash32_sql("gram")


@register(
    "winnowing_dup_pairs",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS tok,
                   generate_subscripts(string_split(text, ' '), 1) AS i
            FROM documents
        ), grams AS (
            SELECT doc_id, i,
                   tok || ' ' || lead(tok, 1) OVER w || ' '
                       || lead(tok, 2) OVER w AS gram,
                   count(*) OVER (PARTITION BY doc_id) AS n_toks
            FROM toks
            WINDOW w AS (PARTITION BY doc_id ORDER BY i)
            QUALIFY i + {WIN_K} - 1 <= n_toks
        ), hashed AS (
            SELECT doc_id, i, {_WIN_HASH} AS h,
                   count(*) OVER (PARTITION BY doc_id) AS n_grams
            FROM grams
        ), wmin AS (
            SELECT doc_id,
                   min(h) OVER (PARTITION BY doc_id ORDER BY i
                                ROWS BETWEEN CURRENT ROW
                                AND {WIN_W - 1} FOLLOWING) AS fp,
                   i, n_grams
            FROM hashed
            QUALIFY i + {WIN_W} - 1 <= n_grams
        ), fps AS (
            SELECT DISTINCT doc_id, fp FROM wmin
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*)::BIGINT AS shared_fps
        FROM fps a JOIN fps b
          ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        ORDER BY shared_fps DESC, doc_a, doc_b LIMIT {WIN_TOPK}
    """,
    doc=f"""Winnowing fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD '03 — the MOSS plagiarism detector): hash every {WIN_K}-token
    k-gram (portable md5 family), keep the MINIMUM hash of every
    {WIN_W}-gram sliding window as a document fingerprint, and report
    the top-{WIN_TOPK} doc pairs by shared distinct fingerprints.  The
    guarantee MinHash cannot give: any shared token run of length ≥
    {WIN_W + WIN_K - 1} produces a shared fingerprint with certainty
    (not probability), while the selected set is ~2/(w+1) of all
    k-grams — position-aware near-dup detection between the shingle
    and signature families.  Scale shape: k-gram construction and
    window minima are doc-partitioned windows (never global); the pair
    report is a fingerprint-keyed equi-join over the winnowed
    (≈ 2n/(w+1)) sets — banded-dedup economics; ubiquitous
    (boilerplate) fingerprints would be pruned exactly like hot
    shingles in boilerplate_shingle_prune.""",
)
def winnowing_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i0", "tok")
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "tok")
    wd = W.partitionBy("doc_id").orderBy("i")
    grams = (
        toks.select(
            "doc_id",
            "i",
            F.concat_ws(
                " ", "tok", F.lead("tok", 1).over(wd), F.lead("tok", 2).over(wd)
            ).alias("gram"),
            F.count(F.lit(1)).over(W.partitionBy("doc_id")).alias("n_toks"),
        )
        .where(F.col("i") + WIN_K - 1 <= F.col("n_toks"))
        .select("doc_id", "i", portable_hash32("gram").alias("h"))
    )
    wmin = (
        grams.select(
            "doc_id",
            "i",
            F.min("h")
            .over(wd.rowsBetween(W.currentRow, WIN_W - 1))
            .alias("fp"),
            F.count(F.lit(1)).over(W.partitionBy("doc_id")).alias("n_grams"),
        )
        .where(F.col("i") + WIN_W - 1 <= F.col("n_grams"))
    )
    fps = wmin.select("doc_id", "fp").distinct()
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .orderBy(F.desc("shared_fps"), "doc_a", "doc_b")
        .limit(WIN_TOPK)
    )
