"""Round-10 (extended session) additions: the streaming twin of the
incremental EXACT-dedup state, and two quantizer-lifecycle audits —
retrain stability and seeding strategy.

Each consumes a candidate the round-10 vetting pinned in BACKLOG.md:

- ``incremental_exact_dedup_stream`` — the foreachBatch twin of the
  exact-dedup state table (operators/dedup.py:incremental_exact_dedup's
  seen-hash store, generalized to ``(content_hash -> min keep_id,
  n_copies)`` so the merge is ALGEBRAIC): each micro-batch hashes only
  its own documents and (min, sum)-merges its partial into the state;
  the final report joins the base corpus's seen-hash set.  Because min
  and sum are associative-commutative over disjoint doc sets, the state
  — and therefore the report — cannot depend on how the delta was split
  into batches, which is exactly what makes the continuous form safe.
  This completes the incremental arc for the dedup family the way
  ``incremental_span_coverage_stream`` did for spans.
- ``ivf_quantizer_stability_audit`` — retrain the coarse quantizer on
  a deterministic half of the corpus (``vec_id % 2 = 0``) and score the
  FULL corpus's assignment agreement against the full-corpus quantizer
  by pair counting (Rand / Adjusted Rand, the lang_id_agreement_ari
  machinery): the drift number a weekly retrain pipeline reads before
  swapping quantizers — cluster IDS are not comparable across
  trainings, pair agreement is.
- ``ivf_seeding_recall_audit`` — the seeding axis of the quantizer
  design table: 'seed' (smallest-id sample), 'kcenter' (deterministic
  farthest-point / derandomized k-means++ D² seeding,
  operators/ml.py:kcenter_centroids) and 'kmeans' (Lloyd-trained)
  through the SAME probe-sweep recall audit, so a deployment can see
  whether smart seeding ALONE closes the recall gap Lloyd training
  buys, before paying for the training loop.

Determinism: exact integer hashes/counts and floor-micros ratios
(``_idiv``); the k-means/k-center chains keep every FP intermediate
rounded to 6 in lockstep with their unrolled-CTE oracles; the one
final-ratio double (ARI) is a fixed-order expression over exact integer
pair counts, the lang_id_agreement_ari pattern (and the query joins the
FP_SENSITIVE sweep list for the same reason).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64
from ..operators import similarity as S
from ..operators.ml import kcenter_centroids, kmeans_centroids
from ..sources.loaders import load_table
from .extension_queries import _COS, _H64
from .pipeline_queries2 import KM_DIM, KM_ITERS, _kmeans_ctes
from .pipeline_queries13 import _idiv
from .pipeline_queries28 import (
    IVF_CENTROIDS,
    IVF_K,
    IVF_PROBES,
    SPAN_DELTA_MOD,
    _ivf_audit_frame,
)
from .pipeline_queries29 import (
    IVFK_QUERY_IDS,
    _assigned_cte,
    _audit_half_ctes,
    _audit_half_select,
    _quantizer_ctes,
    _trained_cents,
)
from .registry import register

_M = 1_000_000

# Micro-batches the dedup stream splits the delta into — a throughput
# knob, not semantics: the (min, sum) state merge is split-invariant.
DEDUP_STREAM_BATCHES = 3


# --- streaming twin of the incremental exact-dedup state --------------------


def _dedup_state_stream(
    spark: SparkSession, sf_dir: str, n_batches: int
) -> DataFrame:
    """The foreachBatch state-table maintenance behind
    incremental_exact_dedup_stream, with the micro-batch count exposed
    so the split-invariance test can sweep it."""
    import shutil
    import tempfile

    docs = load_table(spark, "documents", sf_dir)
    is_delta = F.col("doc_id") % SPAN_DELTA_MOD == 0

    # Yesterday's materialized state: the base corpus's seen-hash set
    # (incremental_exact_dedup's state-table column), built once and
    # pinned — base payloads are never rehashed per batch.
    base = (
        docs.where(~is_delta)
        .select(portable_hash64("text").alias("content_hash"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    state: dict[str, DataFrame | None] = {"agg": None}

    def absorb(batch_df: DataFrame, batch_id: int) -> None:
        # Per batch: hash ONLY the batch, reduce it to its partial
        # (hash -> min id, count) frame, and (min, sum)-merge into the
        # state.  localCheckpoint (not persist) cuts the lineage each
        # batch — otherwise batch N replays batches 1..N-1's hashing —
        # and sidesteps recacheByPath (the incremental_exact_dedup
        # lesson: a cached plan whose lineage reads a path being
        # appended to is silently re-evaluated).
        part = (
            batch_df.select(
                "doc_id", portable_hash64("text").alias("content_hash")
            )
            .groupBy("content_hash")
            .agg(
                F.min("doc_id").alias("keep_id"),
                F.count("*").cast("long").alias("n_copies"),
            )
        )
        merged = (
            part
            if state["agg"] is None
            else state["agg"]
            .unionByName(part)
            .groupBy("content_hash")
            .agg(
                F.min("keep_id").alias("keep_id"),
                F.sum("n_copies").cast("long").alias("n_copies"),
            )
        )
        state["agg"] = merged.localCheckpoint(eager=True)

    tmp = tempfile.mkdtemp(prefix="dedup_stream_")
    try:
        data_dir = f"{tmp}/delta"
        (
            docs.where(is_delta)
            .select("doc_id", "text")
            .repartition(n_batches, "doc_id")
            .write.parquet(data_dir)
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(data_dir)
        )
        query = (
            stream.writeStream.foreachBatch(absorb)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        # Everything the result depends on is checkpointed (lineage
        # cut), so the staging dir can go before the caller collects.
        shutil.rmtree(tmp, ignore_errors=True)

    agg = state["agg"]
    if agg is None:  # no delta docs at all
        agg = spark.createDataFrame(
            [], "content_hash long, keep_id long, n_copies long"
        )
    return agg.join(
        base.withColumn("_b", F.lit(1)), "content_hash", "left"
    ).select(
        "content_hash",
        "keep_id",
        "n_copies",
        F.col("_b").isNotNull().alias("in_base"),
    )


@register(
    "incremental_exact_dedup_stream",
    oracle=f"""
        WITH delta AS (
            SELECT doc_id, {_H64.format(e="text")} AS content_hash
            FROM documents WHERE doc_id % {SPAN_DELTA_MOD} = 0
        ), base AS (
            SELECT DISTINCT {_H64.format(e="text")} AS content_hash
            FROM documents WHERE doc_id % {SPAN_DELTA_MOD} <> 0
        ), g AS (
            SELECT content_hash, min(doc_id) AS keep_id,
                   count(*)::BIGINT AS n_copies
            FROM delta GROUP BY 1
        )
        SELECT g.content_hash, g.keep_id, g.n_copies,
               (b.content_hash IS NOT NULL) AS in_base
        FROM g LEFT JOIN base b ON g.content_hash = b.content_hash
    """,
    doc=f"""Structured-Streaming twin of the exact-dedup state table
    (operators/dedup.py:incremental_exact_dedup): the delta corpus
    (doc_id % {SPAN_DELTA_MOD} = 0) arrives as {DEDUP_STREAM_BATCHES}
    file-source micro-batches (availableNow) and foreachBatch maintains
    ``content_hash -> (min keep_id, n_copies)`` as a checkpointed state
    table — each batch hashes only its own documents and (min, sum)-
    merges its partial in.  The final report flags each delta hash
    against the base corpus's seen-hash set (``in_base``): a surviving
    delta document is ``keep_id`` where ``in_base`` is false.  The
    batch operator's first-seen-wins survivorship is ORDER-dependent
    across micro-batches; carrying (min id, count) instead makes the
    merge algebraic, so the state is independent of how the delta was
    split (batch counts 1/2/4 swept in tests/test_round10b_anchors.py;
    the m-way (min, sum) merge identity is a hypothesis property in
    tests/test_round10b_properties.py) — which is why the continuous
    form is safe to deploy.  Scale shape per batch: one narrow
    hash+groupBy over the batch plus one |state|-sized merge; the
    state is hash-keyed (at 100 TB: a keyed store bucketed by hash so
    the merge co-locates, exactly incremental_exact_dedup's posture),
    and payloads never enter the state.""",
)
def incremental_exact_dedup_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _dedup_state_stream(spark, sf_dir, DEDUP_STREAM_BATCHES)


# --- quantizer retrain stability ---------------------------------------------

# The deterministic retrain subset: every even vec_id (the hash-half a
# weekly retrain would sample).  Plain modulus so the oracle's filter is
# trivially identical.
STABILITY_HALF_WHERE = "embeddings WHERE vec_id % 2 = 0"


def _stability_oracle() -> str:
    h_ctes, h_last = _kmeans_ctes(
        k=IVF_CENTROIDS,
        iters=KM_ITERS,
        dim=KM_DIM,
        final_update=True,
        prefix="h",
        source=STABILITY_HALF_WHERE,
    )
    h_chain = ",\n".join(h_ctes)
    return f"""
        WITH {_quantizer_ctes()},
        {h_chain},
        hcents AS (SELECT cid::BIGINT AS centroid_id, c AS cvec
                   FROM {h_last}),
        {_assigned_cte("fq", "kcents")},
        {_assigned_cte("hq", "hcents")},
        cells AS (
            SELECT f.centroid_id AS ca, h.centroid_id AS cb,
                   count(*)::BIGINT AS nij
            FROM fq_assigned f JOIN hq_assigned h USING (vec_id)
            GROUP BY 1, 2
        ), mt AS (
            SELECT (sum((nij * (nij - 1)) // 2))::BIGINT AS matched,
                   (sum(nij))::BIGINT AS n_vectors
            FROM cells
        ), ta AS (
            SELECT (sum((ai * (ai - 1)) // 2))::BIGINT AS full_pairs
            FROM (SELECT (sum(nij))::BIGINT AS ai FROM cells GROUP BY ca)
        ), tb AS (
            SELECT (sum((bj * (bj - 1)) // 2))::BIGINT AS half_pairs
            FROM (SELECT (sum(nij))::BIGINT AS bj FROM cells GROUP BY cb)
        ), z AS (
            SELECT n_vectors, matched, full_pairs, half_pairs,
                   ((n_vectors * (n_vectors - 1)) // 2) AS tot
            FROM mt, ta, tb
        )
        SELECT n_vectors, matched AS matched_pairs, full_pairs, half_pairs,
               CASE WHEN tot > 0
                    THEN (((matched + tot - full_pairs - half_pairs
                            + matched) * 1000000) // tot)
               END AS rand_index_micros,
               CASE WHEN tot > 0
                     AND ((full_pairs + half_pairs) / 2.0
                          - full_pairs::DOUBLE * half_pairs / tot) > 0
                    THEN round((matched
                                - full_pairs::DOUBLE * half_pairs / tot)
                               / ((full_pairs + half_pairs) / 2.0
                                  - full_pairs::DOUBLE * half_pairs / tot),
                               6)
               END AS ari
        FROM z
    """


@register(
    "ivf_quantizer_stability_audit",
    oracle=_stability_oracle(),
    doc=f"""Quantizer RETRAIN stability: train the k-means coarse
    quantizer twice — on the full corpus and on the deterministic half
    ``vec_id % 2 = 0`` — assign the FULL corpus with both, and score
    the two partitions' agreement by pair counting: matched same-
    cluster pairs, per-quantizer pair totals, the Rand index in floor
    micros, and the chance-corrected Adjusted Rand Index (Hubert &
    Arabie '85, the lang_id_agreement_ari machinery).  Cluster IDs are
    NOT comparable across trainings (Lloyd renumbers freely), so raw
    label agreement is meaningless — pair agreement is the drift number
    a weekly retrain pipeline reads before swapping the quantizer in,
    and the third axis (after recall and balance) of the IVF design
    table.  Both trainings share the registry k-means contract
    (k={IVF_CENTROIDS}, {KM_ITERS} rounds + final update, rounded-6
    lockstep) and both assignments share assign_to_centroids'
    definition, so the number isolates training-set sensitivity.
    Determinism: exact integer pair counts n·(n−1)/2 over the
    contingency cells; floor-micros via ``_idiv``; the final ARI is
    ONE fixed-order double expression (FP_SENSITIVE-swept).  The
    micros pre-multiply stays in int64 up to ~4e6 vectors — past that
    the decimal(38) variant is the same plan.  Scale shape: two Lloyd
    loops (per-iteration broadcast scan + k-group aggregate), two
    assignment scans, one vec_id-keyed join folded to a
    |clusters|²-bounded cell frame, then three 1-row aggregates
    combined by broadcast — no pair is ever materialized.""",
)
def ivf_quantizer_stability_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.overlap import run_concurrently

    emb = load_table(spark, "embeddings", sf_dir)
    half = emb.where(F.col("vec_id") % 2 == 0).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # The two Lloyd trainings are independent driver-sequenced loops —
    # overlap them (guide §2.6 / operators/overlap.py); each exported
    # centroid frame is bit-identical to the serial build.
    full_cents, half_cents = run_concurrently(
        [
            lambda: _trained_cents(emb),
            lambda: kmeans_centroids(
                half, k=IVF_CENTROIDS, iters=KM_ITERS, dim=KM_DIM
            ).localCheckpoint(eager=True),
        ]
    )
    fa = S.assign_to_centroids(emb, full_cents).select(
        "vec_id", F.col("centroid_id").alias("ca")
    )
    ha = S.assign_to_centroids(emb, half_cents).select(
        "vec_id", F.col("centroid_id").alias("cb")
    )
    cells = (
        fa.join(ha, "vec_id")
        .groupBy("ca", "cb")
        .agg(F.count("*").cast("long").alias("nij"))
    )

    def pairs(c: Column) -> Column:
        return _idiv(c * (c - 1), F.lit(2))

    mt = cells.agg(
        F.sum(pairs(F.col("nij"))).alias("matched"),
        F.sum("nij").alias("n_vectors"),
    )
    ta = (
        cells.groupBy("ca")
        .agg(F.sum("nij").alias("ai"))
        .agg(F.sum(pairs(F.col("ai"))).alias("full_pairs"))
    )
    tb = (
        cells.groupBy("cb")
        .agg(F.sum("nij").alias("bj"))
        .agg(F.sum(pairs(F.col("bj"))).alias("half_pairs"))
    )
    z = (
        mt.crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .withColumn(
            "tot", _idiv(F.col("n_vectors") * (F.col("n_vectors") - 1), F.lit(2))
        )
    )
    d = F.col
    exp_idx = d("full_pairs").cast("double") * d("half_pairs") / d("tot")
    ari_den = (d("full_pairs") + d("half_pairs")) / F.lit(2.0) - exp_idx
    # Degenerate guards mirror the oracle CASEs: a 0/1-vector corpus
    # zeroes tot / the ARI denominator — NULL, not a divide-by-zero.
    return z.select(
        "n_vectors",
        d("matched").alias("matched_pairs"),
        "full_pairs",
        "half_pairs",
        F.when(
            d("tot") > 0,
            _idiv(
                (d("matched") + d("tot") - d("full_pairs") - d("half_pairs")
                 + d("matched"))
                * _M,
                d("tot"),
            ),
        ).alias("rand_index_micros"),
        F.when(
            (d("tot") > 0) & (ari_den > 0),
            F.round((d("matched") - exp_idx) / ari_den, 6),
        ).alias("ari"),
    )


# --- seeding-strategy recall audit -------------------------------------------


def _kcenter_ctes(k: int, dim: int) -> list[str]:
    """Exactly-unrolled farthest-point traversal as chained CTEs over
    the corpus CTE ``e``: ``kc0`` = smallest-id vector, then per round
    the min-distance column update ``kmd{t}`` and the argmax pick
    ``kc{t+1}`` (ORDER BY md DESC, vec_id LIMIT 1) — the rounded-6
    lockstep twin of operators/ml.py:kcenter_centroids.  Ends with
    ``kccents``, the picks as a (centroid_id, cvec) quantizer."""
    dist = (
        f"round(list_reduce(list_transform(generate_series(1, {dim}),"
        " i -> (m.v[i] - p.v[i]) * (m.v[i] - p.v[i])),"
        " (x, y) -> x + y), 6)"
    )
    # Each kmd{t} is consumed TWICE (by the next pick and the next
    # update) — MATERIALIZED stops DuckDB's CTE inlining from doubling
    # the chain per round (2^k inlined corpus scans exhausted the fd
    # limit; the Spark twin's localCheckpoint is the same cut).
    ctes = [
        "kc0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1)",
        f"""kmd0 AS MATERIALIZED (
            SELECT m.vec_id, m.v, {dist} AS md
            FROM e m CROSS JOIN kc0 p
        )""",
    ]
    for t in range(1, k):
        ctes.append(
            f"""kc{t} AS (
                SELECT vec_id, v FROM kmd{t - 1}
                ORDER BY md DESC, vec_id LIMIT 1
            )"""
        )
        if t + 1 < k:
            ctes.append(
                f"""kmd{t} AS MATERIALIZED (
                    SELECT m.vec_id, m.v, least(m.md, {dist}) AS md
                    FROM kmd{t - 1} m CROSS JOIN kc{t} p
                )"""
            )
    sel = "\n            UNION ALL ".join(
        f"SELECT {t}::BIGINT AS centroid_id, v AS cvec FROM kc{t}"
        for t in range(k)
    )
    ctes.append(f"kccents AS ({sel})")
    return ctes


def _ivf_seeding_audit_oracle() -> str:
    qids = ", ".join(map(str, IVFK_QUERY_IDS))
    kc_chain = ",\n".join(_kcenter_ctes(IVF_CENTROIDS, KM_DIM))
    return f"""
        WITH {_quantizer_ctes()},
        {kc_chain},
        q AS (
            SELECT vec_id AS query_id, v AS qvec FROM e
            WHERE vec_id IN ({qids})
        ),
        probes(nprobe) AS (
            VALUES {", ".join(f"({p})" for p in IVF_PROBES)}
        ),
        exact AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY {_COS.format(a="q.qvec", b="c.v")} DESC,
                                    c.vec_id ASC) AS rn
                FROM q JOIN e c ON c.vec_id <> q.query_id
            ) WHERE rn <= {IVF_K}
        ),
        corp AS (SELECT count(*)::BIGINT AS n FROM e),
        {_audit_half_ctes("seed", "scents")},
        {_audit_half_ctes("kct", "kccents")},
        {_audit_half_ctes("km", "kcents")}
        SELECT * FROM (
            {_audit_half_select("seed", "seed")}
            UNION ALL
            {_audit_half_select("kct", "kcenter")}
            UNION ALL
            {_audit_half_select("km", "kmeans")}
        )
    """


@register(
    "ivf_seeding_recall_audit",
    oracle=_ivf_seeding_audit_oracle(),
    doc=f"""The SEEDING axis of the IVF quantizer design table: the
    probe-sweep recall audit (probe counts {IVF_PROBES},
    recall@{IVF_K} vs the exact top-{IVF_K}, scored-candidate share)
    run over THREE quantizers — 'seed' (the {IVF_CENTROIDS} smallest-id
    vectors), 'kcenter' (deterministic farthest-point traversal, the
    derandomized k-means++ D² rule: operators/ml.py:kcenter_centroids)
    and 'kmeans' (Lloyd-trained from the naive init).  The table
    answers the design question ivf_kmeans_recall_audit raised: how
    much of the trained quantizer's recall lift is CENTROID SPREAD
    (which seeding alone buys, no training loop) vs actual density
    adaptation (which costs {KM_ITERS} Lloyd rounds)?  Assignment and
    probing share one definition across all three, so rows differ only
    by centroid placement.  Queries ({IVFK_QUERY_IDS}) stay disjoint
    from the seed sample (the round-10 bias rule).  Determinism:
    rounded-6 lockstep distances in both the traversal and the audit,
    id tiebreaks everywhere, exact counts, floor-micros ratios.  Scale
    shape: the traversal is k incremental least()-update scans with a
    1-row argmax collect each (k·dim driver scalars — the
    greedy_source_coverage collect class); per quantizer the audit
    keeps ONE max-probe candidate frame with probe rows as filters; the
    exact brute pass is computed once and shared by all three
    halves.""",
)
def ivf_seeding_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.overlap import run_concurrently

    emb = load_table(spark, "embeddings", sf_dir)
    seed_cents, _ = S.assign_centroids(emb, IVF_CENTROIDS)
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # One brute-force exact pass shared by all three halves.
    exact = (
        S.cosine_topk_bruteforce(emb, query_ids=list(IVFK_QUERY_IDS), k=IVF_K)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )

    # The three quantizer branches are INDEPENDENT driver-sequenced
    # pipelines (k-center's per-round argmax collects, the Lloyd loop's
    # per-iteration update collects, each audit's eager candidate
    # checkpoint).  Overlapping them on driver threads (guide §2.6 /
    # operators/overlap.py) fills each branch's job-floor gaps with the
    # others' tasks; every branch's frame — and therefore the union —
    # is bit-identical to the serial build (round-10 optimization:
    # 11.8 s → max-branch wall).
    def seed_half():
        return _ivf_audit_frame(
            spark, emb, seed_cents, exact, quantizer="seed",
            query_ids=IVFK_QUERY_IDS,
        )

    def kcenter_half():
        kc_cents = kcenter_centroids(
            e, k=IVF_CENTROIDS, dim=KM_DIM
        ).localCheckpoint(eager=True)
        return _ivf_audit_frame(
            spark, emb, kc_cents, exact, quantizer="kcenter",
            query_ids=IVFK_QUERY_IDS,
        )

    def kmeans_half():
        return _ivf_audit_frame(
            spark, emb, _trained_cents(emb), exact, quantizer="kmeans",
            query_ids=IVFK_QUERY_IDS,
        )

    halves = run_concurrently([seed_half, kcenter_half, kmeans_half])
    return halves[0].unionByName(halves[1]).unionByName(halves[2])
