"""Iterative ML on the engine: Lloyd's k-means over an embedding
column, written as a deterministic cross-engine contract.

Each iteration is (assign → update) expressed in pure DataFrame ops:

- **assign**: cross join against the k-row centroid frame (broadcast —
  k·dim scalars), squared-euclidean distance as a left-to-right fold
  over ``zip_with`` (identical association order to the oracle's
  ``list_reduce``), ROUNDED to 6 decimals, argmin via a row_number
  window PARTITIONED BY vec_id.
- **update**: per-dimension ``avg`` grouped by cluster, ROUNDED to 6
  before feeding the next iteration.

The rounding is what makes an iterative FP algorithm hash-checkable
against another engine: both engines agree on every rounded
intermediate, so divergence cannot compound across iterations (same
trick as the approx_distinct bounded-error contract).  Clusters that
receive no members drop out (both engines agree on that too).

Scale shape: the data-sized stages are one broadcast-join scan and one
groupBy per iteration; the driver only ever sees k·dim scalars per
round (the same footprint as ``RDD.zipWithIndex``'s summary collect).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mean_agg_cols(vec_col: str, dim: int) -> list[Column]:
    """The round-6 per-dimension centroid-update means — ONE definition
    shared by the Lloyd loop's between-round update and the
    :func:`kmeans_centroids` export, so the "one more update" contract
    with the oracle's ``_kmeans_ctes(final_update=True)`` chain cannot
    silently fork (a digit or cast change in one copy would break
    cross-engine equality with no compile-time signal)."""
    return [
        F.round(F.avg(F.col(vec_col)[i]), 6).alias(f"d{i}")
        for i in range(dim)
    ]


def _kmeans_final_assignment(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "v",
    tol: float | None = None,
) -> DataFrame:
    """The Lloyd loop shared by :func:`kmeans_assign` (which projects
    the assignment) and :func:`kmeans_centroids` (which exports the
    trained quantizer): returns the final-round assignment WITH the
    vector column, ``(id, vec, cid, dist)``."""
    from ..sources.loaders import ensure_parallelism

    # Fanned out + cached: a small parquet table scans as one split,
    # and the HOF-heavy distance evaluation would then run on one
    # core every round.  Each iteration's centroid-update job plus
    # the final result all rescan this frame; without the cache every
    # round re-reads and re-casts the parquet.
    vectors = ensure_parallelism(vectors).cache()
    first_k = (
        vectors.orderBy(id_col).limit(k).select(id_col, vec_col).collect()
    )
    cents = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(first_k)]

    assigned = None
    for it in range(iters):
        # Centroids inline as ONE literal array-of-structs and the
        # distance fold written ONCE inside a transform lambda: the
        # assignment is a pure narrow projection (argmin over k
        # distances) — no join, no row blowup, no shuffle — and the
        # expression tree stays O(k·dim) literals + O(1) lambdas
        # instead of O(k) copies of the fold (k separate zip_with
        # trees made analysis/codegen the dominant cost).  min over
        # (dist, cid) structs == ORDER BY dist, cid.
        cent_lit = F.array(
            *[
                F.struct(
                    F.lit(cid).cast("int").alias("cid"),
                    F.array(*[F.lit(x) for x in c]).alias("carr"),
                )
                for cid, c in cents
            ]
        )
        best = F.array_min(
            F.transform(
                cent_lit,
                lambda ce: F.struct(
                    F.round(
                        F.aggregate(
                            F.zip_with(
                                F.col(vec_col),
                                ce["carr"],
                                lambda x, y: (x - y) * (x - y),
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        ),
                        6,
                    ).alias("dist"),
                    ce["cid"].alias("cid"),
                ),
            )
        )
        assigned = vectors.select(
            id_col,
            vec_col,
            best["cid"].alias("cid"),
            best["dist"].alias("dist"),
        )
        # The only shuffle per iteration: k groups × dim partial-agg
        # means, rounded before they feed the next round.  The last
        # round's update feeds nothing (the contract returns the final
        # ASSIGNMENT) — skip that whole job.
        if it + 1 == iters:
            break
        new_cents = (
            assigned.groupBy("cid")
            .agg(*_mean_agg_cols(vec_col, dim))
            .collect()
        )
        prev = dict(cents)
        cents = sorted(
            (r["cid"], [r[f"d{i}"] for i in range(dim)]) for r in new_cents
        )
        if tol is not None:
            # Max squared movement over clusters alive in BOTH rounds
            # (a dropped cluster has no successor to move).  Driver-side
            # math over k·dim already-collected scalars.
            movement = max(
                (
                    sum((a - b) * (a - b) for a, b in zip(prev[cid], c))
                    for cid, c in cents
                    if cid in prev
                ),
                default=0.0,
            )
            if movement <= tol:
                break
    return assigned


def kmeans_assign(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "v",
    tol: float | None = None,
) -> DataFrame:
    """Run ``iters`` assignment rounds of Lloyd's k-means (centroids
    update between rounds) and return the final assignment
    ``(id, cluster, dist)``.

    Init: the ``k`` rows with the smallest ids, in id order (cid =
    rank), the deterministic seed both engines can reproduce.

    ``tol`` (BACKLOG "k-means beyond fixed iterations"): when set,
    ``iters`` becomes a CAP and the loop stops early once the maximum
    squared centroid movement of a round is <= tol.  The movement
    check is plain Python over the k·dim scalars the update already
    collects — zero extra cluster work per round.  With ``tol=None``
    (the registry contract) behavior is bit-identical to the fixed
    unrolled oracle; a converged run is oracle-able only per its
    realized round count, so the registry keeps the fixed form.
    """
    assigned = _kmeans_final_assignment(
        vectors, k, iters, dim, id_col, vec_col, tol
    )
    return assigned.select(
        id_col, F.col("cid").alias("cluster"), "dist"
    )


def kcenter_centroids(
    vectors: DataFrame,
    k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Deterministic farthest-point (Gonzalez k-center) seeding — the
    derandomized form of k-means++'s D² rule (pick the point FARTHEST
    from the chosen set instead of D²-proportionally at random): start
    from the smallest-id vector, then ``k-1`` rounds of argmax over
    each vector's min squared distance to the selected set, smallest-id
    tiebreak.  Returns the picks as a ``(centroid_id, cvec)`` quantizer
    frame (centroid_id = selection rank), the external-quantizer shape
    ``cosine_topk_bucketed`` / the IVF audits take.

    Distances use the k-means contract's rounded-6 left-fold squared
    euclidean, so the oracle's unrolled argmax chain
    (plans/pipeline_queries30.py:_kcenter_ctes) agrees bit-for-bit.

    Scale shape: the min-distance column is maintained INCREMENTALLY —
    each round is one narrow ``least(md, dist-to-new-pick)`` projection
    over the corpus plus a 1-row argmax collect (k·dim driver scalars
    total, the greedy_source_coverage collect class); lineage is cut
    per round.  O(k) scans, never O(k²) distance recomputation.  A
    production run over 100 TB would seed from a per-partition sample
    first; the traversal itself is the standard coreset/seeding
    primitive (Gonzalez '85).
    """
    from ..sources.loaders import ensure_parallelism

    vectors = ensure_parallelism(vectors).cache()

    def dist_to(pick: list[float]):
        arr = F.array(*[F.lit(x) for x in pick])
        return F.round(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col), arr, lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )

    first = (
        vectors.orderBy(id_col).limit(1).select(id_col, vec_col).collect()
    )
    if not first:
        raise ValueError("kcenter_centroids: empty corpus")
    picks = [[float(x) for x in first[0][vec_col]]]
    cur = vectors.select(
        id_col, vec_col, dist_to(picks[0]).alias("md")
    ).localCheckpoint(eager=True)
    for _ in range(1, k):
        nxt = (
            cur.orderBy(F.desc("md"), F.asc(id_col))
            .limit(1)
            .select(id_col, vec_col)
            .collect()
        )
        picks.append([float(x) for x in nxt[0][vec_col]])
        cur = cur.select(
            id_col,
            vec_col,
            F.least(F.col("md"), dist_to(picks[-1])).alias("md"),
        ).localCheckpoint(eager=True)
    vectors.unpersist(blocking=False)
    spark = cur.sparkSession
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(picks)],
        "centroid_id long, cvec array<double>",
    )


def kmeans_centroids(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Export the TRAINED quantizer: the per-cluster rounded-6 means of
    the final k-means assignment, as a ``(centroid_id, cvec)`` frame —
    the shape :func:`..operators.similarity.cosine_topk_bucketed` and
    the IVF audits take as an external coarse quantizer.

    This is one more centroid UPDATE after the last assignment round
    (the oracle unrolls it as CTE ``c{iters}`` via
    ``_kmeans_ctes(final_update=True)``), so the exported centroids use
    the full information of the final assignment.  Same determinism
    contract as the loop: every mean rounds to 6 before export.
    Clusters that lost all members drop out — the quantizer can be
    narrower than ``k`` and both engines agree.  Scale shape: the loop's
    per-iteration broadcast scan + k-group aggregate, then one more
    k-group aggregate; the result is k·dim scalars, broadcast-sized by
    construction."""
    assigned = _kmeans_final_assignment(
        vectors, k, iters, dim, id_col, vec_col, tol=None
    )
    means = assigned.groupBy("cid").agg(*_mean_agg_cols(vec_col, dim))
    return means.select(
        F.col("cid").cast("long").alias("centroid_id"),
        F.array(*[f"d{i}" for i in range(dim)]).alias("cvec"),
    )
