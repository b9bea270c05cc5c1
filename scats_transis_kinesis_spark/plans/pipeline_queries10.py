"""Round-5 final additions: runtime-filter pruning, item-item
similarity, bounded graph traversal, semantic dedup, and diversified
retrieval.

- ``bloom_runtime_filter_audit`` — the semi-join pruning primitive for
  100 TB fact scans: an m-bit Bloom bitmap built over a selective
  dimension key set, broadcast into the fact scan as a LITERAL (no
  join, no shuffle on the fact side), probed with pure bitwise
  projection; the audit joins the exact membership back in to count
  realized false positives and prove zero false negatives in-query.
  The portable twin of Spark's own ``InjectRuntimeFilter``.
- ``copurchase_item_similarity`` — item-item collaborative-filtering
  similarity (squared cosine over the implicit order×part matrix):
  the classic recommender precompute, expressed as a within-basket
  self-join + two broadcast degree joins + global top-k.  The cosine²
  is reported in exact integer ppm (``1e6·c²/(dᵤ·dᵥ)``, one correctly
  rounded double division — no ``sqrt`` in the contract).
- ``bfs_hops_from_hub`` — bounded-depth breadth-first distances from
  the highest-degree vertex of the co-purchase graph: per-hop frontier
  expansion with an anti-join visited set, the building block of
  k-hop-neighborhood features.  The DuckDB oracle replays it as a
  recursive CTE with ``min(hop)`` semantics.
- ``semdedup_semantic_prune`` — SemDeDup (Abbas et al. 2023):
  k-means-bounded within-cluster cosine dedup, extending the
  rounded-lockstep Lloyd contract (``operators/dedup.py:
  semantic_prune_stats``).
- ``mmr_diversified_topk`` — maximal-marginal-relevance re-ranking
  (Carbonell & Goldstein '98): distributed pool scoring, exact-integer
  greedy over the bounded pool, 10-step unrolled MATERIALIZED-CTE
  oracle (plain chained CTEs inline EXPONENTIALLY in DuckDB — each
  step references its predecessor three times).

Scale discipline, as everywhere in the registry: the Bloom probe is a
projection (the ONLY fact-side join is the audit's exact-membership
check, which production pruning would not run); each BFS round is an
equi-join on the frontier with eager ``localCheckpoint`` (bounded
rounds, bounded scalar emptiness probes); the one 1-row hub collect
and the ``m/64``-long bitmap collect are bounded summaries; every
degree join is a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import bfs_distances
from ..operators.bloom import (
    BLOOM_K,
    BLOOM_M_BITS,
    bloom_position_sql,
    bloom_probe,
    build_bloom_words,
)
from ..sources.loaders import load_table
from .pipeline_queries5 import (
    _COPURCHASE_EDGE_CTES,
    _COPURCHASE_LINES_CTE,
    _basket_pairs,
    _copurchase_baskets,
    _copurchase_edges,
)
from .registry import register

# The selective dim predicate the runtime filter prunes the fact scan
# with: one of the five market segments (~20% of customers).
BLOOM_SEGMENT = "BUILDING"

# BFS report depth: 4 hops covers the co-purchase graph's effective
# diameter while keeping the oracle's recursive CTE bounded at
# |V| × (depth+1) working rows.
BFS_MAX_HOPS = 4

_BLOOM_BITS_CTE = " UNION ALL ".join(
    f"SELECT {bloom_position_sql('ck', j)} AS pos FROM keys"
    for j in range(BLOOM_K)
)
_BLOOM_PASS_EXPR = " AND ".join(
    f"{bloom_position_sql('o_custkey', j)} IN (SELECT pos FROM bits)"
    for j in range(BLOOM_K)
)


@register(
    "bloom_runtime_filter_audit",
    oracle=f"""
        WITH keys AS (
            SELECT c_custkey AS ck FROM customer
            WHERE c_mktsegment = '{BLOOM_SEGMENT}'
        ), bits AS (
            SELECT DISTINCT pos FROM ({_BLOOM_BITS_CTE})
        ), probe AS (
            SELECT ({_BLOOM_PASS_EXPR}) AS bloom_pass,
                   o_custkey IN (SELECT ck FROM keys) AS is_member
            FROM orders
        )
        SELECT count(*)::BIGINT AS n_fact,
               (SELECT count(*) FROM keys)::BIGINT AS n_keys,
               count(*) FILTER (WHERE bloom_pass)::BIGINT AS n_pass_bloom,
               count(*) FILTER (WHERE is_member)::BIGINT AS n_exact_match,
               count(*) FILTER (WHERE bloom_pass AND NOT is_member)::BIGINT
                   AS n_false_pos,
               bool_and(bloom_pass OR NOT is_member) AS no_false_negatives,
               {BLOOM_M_BITS}::BIGINT AS m_bits,
               {BLOOM_K}::BIGINT AS k_hashes
        FROM probe
    """,
    doc=f"""Bloom runtime-filter audit: build a {BLOOM_M_BITS}-bit /
    {BLOOM_K}-hash bitmap over the '{BLOOM_SEGMENT}'-segment customer
    keys, probe every order with a PROJECTION (the bitmap rides into
    codegen as a literal long array — the fact side is never joined or
    shuffled for the filter itself), then count realized false
    positives against exact membership and assert zero false
    negatives.  This is the semi-join pruning shape for 100 TB fact
    scans — the exact-membership join here exists only so the audit is
    self-verifying; production pruning runs the probe alone and
    finishes with an exact join on the tiny surviving subset.  Portable
    md5 hashing makes bitmap and probe bit-identical in DuckDB.""",
)
def bloom_runtime_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    keys = cust.where(F.col("c_mktsegment") == BLOOM_SEGMENT).select(
        F.col("c_custkey").alias("ck")
    )
    words = build_bloom_words(keys, "ck")
    orders = load_table(spark, "orders", sf_dir)
    probe = (
        orders.select(
            "o_custkey",
            bloom_probe(F.col("o_custkey"), words).alias("bloom_pass"),
        )
        .join(F.broadcast(keys), F.col("o_custkey") == F.col("ck"), "left")
        .select("bloom_pass", F.col("ck").isNotNull().alias("is_member"))
    )
    audit = probe.agg(
        F.count(F.lit(1)).alias("n_fact"),
        F.count(F.when(F.col("bloom_pass"), 1)).alias("n_pass_bloom"),
        F.count(F.when(F.col("is_member"), 1)).alias("n_exact_match"),
        F.count(F.when(F.col("bloom_pass") & ~F.col("is_member"), 1)).alias(
            "n_false_pos"
        ),
        F.bool_and(F.col("bloom_pass") | ~F.col("is_member")).alias(
            "no_false_negatives"
        ),
    )
    n_keys = keys.agg(F.count(F.lit(1)).alias("n_keys"))
    return audit.crossJoin(F.broadcast(n_keys)).select(
        "n_fact",
        "n_keys",
        "n_pass_bloom",
        "n_exact_match",
        "n_false_pos",
        "no_false_negatives",
        F.lit(BLOOM_M_BITS).cast("long").alias("m_bits"),
        F.lit(BLOOM_K).cast("long").alias("k_hashes"),
    )


@register(
    "copurchase_item_similarity",
    oracle=f"""
        WITH {_COPURCHASE_LINES_CTE}, deg AS (
            SELECT pk, count(*)::BIGINT AS d FROM lines GROUP BY pk
        ), pairs AS (
            SELECT a.pk AS u, b.pk AS v, count(*)::BIGINT AS co_count
            FROM lines a JOIN lines b ON a.ok = b.ok AND a.pk < b.pk
            GROUP BY a.pk, b.pk
        )
        SELECT p.u, p.v, p.co_count, du.d AS deg_u, dv.d AS deg_v,
               round(1000000.0 * p.co_count * p.co_count
                     / (du.d * dv.d))::BIGINT AS cos2_ppm
        FROM pairs p
        JOIN deg du ON p.u = du.pk
        JOIN deg dv ON p.v = dv.pk
        ORDER BY cos2_ppm DESC, p.u, p.v LIMIT 100
    """,
    doc="""Item-item collaborative-filtering similarity over the 1995
    co-purchase matrix (orders are implicit baskets): top-100 part
    pairs by squared cosine ``c²/(dᵤ·dᵥ)`` in exact integer ppm.
    Scale shape: candidate pairs come ONLY from the within-basket
    self-join (the inverted-index trick — parts never co-purchased are
    never paired; no |parts|² anywhere); the two degree attachments are
    broadcast joins against the |parts|-row degree table; the top-100
    is a TakeOrderedAndProject (per-partition heads, no global sort
    materialization).  Hot-basket skew is the LSH hot-band cap pattern
    if basket sizes grow super-linear; TPC-H baskets are ≤7 lines.
    Squaring the cosine keeps the contract in integer arithmetic plus
    ONE correctly rounded IEEE division — no ``sqrt`` drift across
    engines.""",
)
def copurchase_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Basket-array form (round-10, guide §2.4): degrees explode
    # narrowly off the one checkpointed (ok, ps) build and pair counts
    # come from the generator pipeline instead of the ok self-join.
    baskets = _copurchase_baskets(spark, sf_dir)
    lines = baskets.select("ok", F.explode("ps").alias("pk"))
    deg = lines.groupBy("pk").agg(F.count(F.lit(1)).alias("d"))
    pairs = (
        _basket_pairs(baskets)
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("co_count"))
    )
    sim = (
        pairs.join(
            F.broadcast(deg.select(F.col("pk").alias("u"), F.col("d").alias("deg_u"))),
            "u",
        )
        .join(
            F.broadcast(deg.select(F.col("pk").alias("v"), F.col("d").alias("deg_v"))),
            "v",
        )
        .withColumn(
            "cos2_ppm",
            F.round(
                F.lit(1000000.0)
                * F.col("co_count")
                * F.col("co_count")
                / (F.col("deg_u") * F.col("deg_v"))
            ).cast("long"),
        )
    )
    return (
        sim.orderBy(F.desc("cos2_ppm"), "u", "v")
        .limit(100)
        .select("u", "v", "co_count", "deg_u", "deg_v", "cos2_ppm")
    )


@register(
    "bfs_hops_from_hub",
    oracle=f"""
        WITH RECURSIVE {_COPURCHASE_EDGE_CTES}, bi AS (
            SELECT u AS src, v AS dst FROM edges
            UNION ALL
            SELECT v AS src, u AS dst FROM edges
        ), deg AS (
            SELECT src, count(*)::BIGINT AS d FROM bi GROUP BY src
        ), hub AS (
            SELECT src AS h FROM deg ORDER BY d DESC, src LIMIT 1
        ), walk(v, hop) AS (
            SELECT h, 0 FROM hub
            UNION
            SELECT b.dst, w.hop + 1
            FROM walk w JOIN bi b ON b.src = w.v
            WHERE w.hop < {BFS_MAX_HOPS}
        ), dist AS (
            SELECT v, min(hop) AS hop FROM walk GROUP BY v
        )
        SELECT hop, count(*)::BIGINT AS n_vertices,
               sum(v)::BIGINT AS vertex_checksum
        FROM dist GROUP BY hop
    """,
    doc=f"""Bounded-depth BFS from the highest-(degree, id)-ranked hub
    of the 1995 co-purchase graph: vertices reached per hop (≤
    {BFS_MAX_HOPS}) with an identity checksum (sum of vertex ids) so
    the contract pins the reached SET, not just its size.  Scale
    shape: each round is frontier ⋈ adjacency (keyed equi-join; AQE
    broadcasts while the frontier is small) followed by a distinct and
    an anti-join against the visited set, eagerly localCheckpoint-ed —
    bounded rounds, each emptiness probe a bounded scalar job; the
    1-row hub argmax is the only other collect.  The oracle replays
    the traversal as a recursive CTE (``min(hop)`` over the ≤
    |V|·(depth+1) working rows).""",
)
def bfs_hops_from_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _copurchase_edges(spark, sf_dir)
    bi = (
        edges.selectExpr("u AS src", "v AS dst")
        .unionByName(edges.selectExpr("v AS src", "u AS dst"))
        .localCheckpoint(eager=True)
    )
    deg = bi.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    hub = deg.orderBy(F.desc("d"), F.asc("src")).limit(1).collect()[0]["src"]
    visited = bfs_distances(bi, hub, BFS_MAX_HOPS)
    return visited.groupBy("hop").agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum("v").alias("vertex_checksum"),
    )


# SemDeDup threshold: squared cosine in ppm.  The synthetic embedding
# corpus tops out near cos² ≈ 0.26, so 0.15 (cos ≈ 0.39) yields a real
# but minority drop set — production text near-dup would sit at
# cos ≥ 0.95 with the SAME plan.
SEMDEDUP_TAU_PPM = 150_000


def _semdedup_oracle() -> str:
    from .pipeline_queries2 import KM_DIM, _kmeans_ctes

    ctes, last = _kmeans_ctes()
    dot = (
        f"round(list_reduce(list_transform(generate_series(1, {KM_DIM}),"
        " i -> a.v[i] * b.v[i]), (x, y) -> x + y), 6)"
    )
    ctes.append(
        f"""m AS (
            SELECT vec_id, cid, v,
                   round(list_reduce(list_transform(v, x -> x * x),
                                     (x, y) -> x + y), 6) AS n2
            FROM {last}
        )"""
    )
    ctes.append(
        f"""prs AS (
            SELECT a.cid, b.vec_id AS cand, {dot} AS dot,
                   a.n2 AS na, b.n2 AS nb
            FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id
        )"""
    )
    ctes.append(
        f"""dropped AS (
            SELECT DISTINCT cid, cand AS vec_id FROM prs
            WHERE dot > 0
              AND round(1000000.0 * dot * dot / (na * nb))::BIGINT
                  >= {SEMDEDUP_TAU_PPM}
        )"""
    )
    return (
        "WITH " + ",\n".join(ctes) + """
        , stats AS (SELECT cid, count(*)::BIGINT AS n_vecs FROM m GROUP BY cid),
        dr AS (
            SELECT cid, count(*)::BIGINT AS n_dropped,
                   sum(vec_id)::BIGINT AS dropped_checksum
            FROM dropped GROUP BY cid
        )
        SELECT s.cid AS cluster, s.n_vecs,
               coalesce(dr.n_dropped, 0)::BIGINT AS n_dropped,
               coalesce(dr.dropped_checksum, 0)::BIGINT AS dropped_checksum
        FROM stats s LEFT JOIN dr ON s.cid = dr.cid
    """
    )


@register(
    "semdedup_semantic_prune",
    oracle=_semdedup_oracle(),
    doc=f"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding corpus, then drop
    any vector with a lower-id within-cluster neighbor above the
    cosine threshold (squared-cosine ≥ {SEMDEDUP_TAU_PPM} ppm,
    sign-checked) — reported per cluster as kept/dropped counts with an
    identity checksum over the dropped set.  The greedy keep-lowest-id
    rule replaces the paper's keep-farthest-from-centroid tie-break to
    stay deterministic and oracle-replayable; the clustering is the
    engine's fixed-3-round Lloyd contract (every FP intermediate
    rounded to 6 in lockstep — the oracle extends the SAME unrolled
    CTE chain).  Scale shape: clustering first makes the pairwise
    stage O(Σ|cluster|²) instead of O(n²) — k is chosen ∝ n/target
    cluster size in production, and a within-cluster LSH band bounds
    the quadratic term if clusters still run hot (the dedup-family
    levers apply unchanged); the pair dot products are codegen'd
    zip_with folds, no Python, and the only driver traffic is the
    k·dim centroid summaries the k-means loop already pays.""",
)
def semdedup_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ml import kmeans_assign
    from .pipeline_queries2 import KM_DIM, KM_ITERS, KM_K

    e = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    asg = kmeans_assign(e, k=KM_K, iters=KM_ITERS, dim=KM_DIM).select(
        "vec_id", F.col("cluster").alias("cid")
    )
    from ..operators.dedup import semantic_prune_stats

    return semantic_prune_stats(asg.join(e, "vec_id"), SEMDEDUP_TAU_PPM)


# MMR parameters: candidate pool from the dense ranking, re-ranked
# greedily with relevance/diversity mixed at λ = 0.7 (exact milli
# integers — 700·rel − 300·max_sim, no FP in the greedy itself).
MMR_POOL = 20
MMR_K = 10
MMR_LAMBDA_MILLI = 700
MMR_QUERY_VEC_ID = 0  # embedding row used as the dense query (as RRF)

_COS_SQL = (
    "round(list_dot_product(a.v, b.v)"
    " / (sqrt(list_dot_product(a.v, a.v))"
    " * sqrt(list_dot_product(b.v, b.v))) * 1e6)::BIGINT"
)


def _mmr_oracle() -> str:
    lam, com = MMR_LAMBDA_MILLI, 1000 - MMR_LAMBDA_MILLI
    ctes = [
        f"""qvec AS MATERIALIZED (
            SELECT embedding::DOUBLE[] AS q FROM embeddings
            WHERE vec_id = {MMR_QUERY_VEC_ID}
        )""",
        f"""pool AS MATERIALIZED (
            SELECT vec_id AS doc_id, embedding::DOUBLE[] AS v,
                   round(list_dot_product(embedding::DOUBLE[], q)
                         / (sqrt(list_dot_product(embedding::DOUBLE[],
                                                  embedding::DOUBLE[]))
                            * sqrt(list_dot_product(q, q))) * 1e6)::BIGINT
                       AS rel
            FROM embeddings CROSS JOIN qvec
            WHERE vec_id <> {MMR_QUERY_VEC_ID}
            ORDER BY rel DESC, vec_id LIMIT {MMR_POOL}
        )""",
        f"""sims AS MATERIALIZED (
            SELECT a.doc_id AS i, b.doc_id AS j, {_COS_SQL} AS s
            FROM pool a JOIN pool b ON a.doc_id <> b.doc_id
        )""",
        f"""sel0 AS MATERIALIZED (
            SELECT 0 AS mmr_rank, doc_id, rel, {lam} * rel AS score
            FROM pool ORDER BY rel DESC, doc_id LIMIT 1
        )""",
        "acc0 AS MATERIALIZED (SELECT * FROM sel0)",
    ]
    for t in range(1, MMR_K):
        ctes.append(
            f"""sel{t} AS MATERIALIZED (
                SELECT {t} AS mmr_rank, p.doc_id, p.rel,
                       {lam} * p.rel - {com} * max(s.s) AS score
                FROM pool p
                JOIN sims s ON s.i = p.doc_id
                 AND s.j IN (SELECT doc_id FROM acc{t - 1})
                WHERE p.doc_id NOT IN (SELECT doc_id FROM acc{t - 1})
                GROUP BY p.doc_id, p.rel
                ORDER BY score DESC, p.doc_id LIMIT 1
            )"""
        )
        ctes.append(
            f"acc{t} AS MATERIALIZED (SELECT * FROM acc{t - 1} UNION ALL SELECT * FROM sel{t})"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT mmr_rank, doc_id, rel AS rel_micros, score
        FROM acc{MMR_K - 1}
    """
    )


@register(
    "mmr_diversified_topk",
    oracle=_mmr_oracle(),
    doc=f"""Maximal-marginal-relevance diversified top-{MMR_K}
    (Carbonell & Goldstein '98): greedily re-rank the dense top-
    {MMR_POOL} pool so each pick maximizes λ·relevance −
    (1−λ)·max-similarity-to-already-picked — the standard diversity
    re-rank for retrieval and for redundancy-aware training-sample
    selection.  Scale shape: the DISTRIBUTED work is scoring the
    corpus against the query and taking the top-{MMR_POOL}
    (TakeOrderedAndProject over one scan); the greedy loop then runs
    on the driver over a FIXED {MMR_POOL}-candidate pool —
    O(k·pool) integer comparisons on ≤{MMR_POOL}² collected
    similarity scalars (a bounded summary, like the k-means
    centroids), which is the only honest place for an inherently
    sequential k-step argmax.  All greedy arithmetic is exact milli/
    micro integers ({MMR_LAMBDA_MILLI}·rel − {1000 - MMR_LAMBDA_MILLI}
    ·max_sim), so the 10-step unrolled-CTE oracle cannot drift.""",
)
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.where(F.col("vec_id") == MMR_QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec")
    )
    pool = (
        emb.where(F.col("vec_id") != MMR_QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.col("embedding").alias("v"),
            F.round(cosine(F.col("embedding"), F.col("qvec")) * 1e6)
            .cast("long")
            .alias("rel"),
        )
        .orderBy(F.desc("rel"), "doc_id")
        .limit(MMR_POOL)
        .localCheckpoint(eager=True)
    )
    a, b = pool.alias("a"), pool.alias("b")
    sim_rows = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("i"),
            F.col("b.doc_id").alias("j"),
            F.round(cosine(F.col("a.v"), F.col("b.v")) * 1e6)
            .cast("long")
            .alias("s"),
        )
        .collect()
    )
    sims = {(r["i"], r["j"]): r["s"] for r in sim_rows}
    cands = {
        r["doc_id"]: r["rel"] for r in pool.select("doc_id", "rel").collect()
    }
    lam, com = MMR_LAMBDA_MILLI, 1000 - MMR_LAMBDA_MILLI
    first = max(cands, key=lambda d: (cands[d], -d))
    picked = [(0, first, cands[first], lam * cands[first])]
    selected = [first]
    # A pool smaller than k exhausts early — the oracle's empty sel{t}
    # steps agree (both emit |pool| rows).
    for t in range(1, min(MMR_K, len(cands))):
        remaining = [d for d in cands if d not in selected]
        scored = [
            (lam * cands[d] - com * max(sims[(d, s)] for s in selected), d)
            for d in remaining
        ]
        score, d = max(scored, key=lambda x: (x[0], -x[1]))
        picked.append((t, d, cands[d], score))
        selected.append(d)
    return spark.createDataFrame(
        picked, "mmr_rank int, doc_id long, rel_micros long, score long"
    )
