"""Iterative ML on the engine: Lloyd's k-means over an embedding
column, written as a deterministic cross-engine contract.

Each iteration is (assign → update):

- **assign**: an Arrow-batched numpy projection (``mapInPandas``, guide
  §4.2/§4.5 shape): per batch, the squared-euclidean distance to each
  of the k broadcast-in-closure centroids is accumulated dimension by
  dimension in float64 — the SAME IEEE operation sequence as the
  previous ``zip_with`` left fold and as the oracle's ``list_reduce``
  — then ROUNDED to 6 decimals with an exact emulation of Spark's
  ``round`` (``_round6_half_up``), argmin with first-match (= smallest
  cid) tiebreak.  No join, no row blowup, no shuffle; the interpreted
  higher-order-function fold this replaces cost ~0.8 s per scan at a
  2,000-row corpus (k=16·dim=64 lambda steps per row) vs ~0.1 s
  vectorized.
- **update**: per-dimension ``avg`` grouped by cluster (pure DataFrame
  agg — partial-aggregated map-side), ROUNDED to 6 before feeding the
  next iteration.

The rounding is what makes an iterative FP algorithm hash-checkable
against another engine: both engines agree on every rounded
intermediate, so divergence cannot compound across iterations (same
trick as the approx_distinct bounded-error contract).  Clusters that
receive no members drop out (both engines agree on that too).

Scale shape: the data-sized stages are one narrow Arrow projection and
one groupBy per iteration; the driver only ever sees k·dim scalars per
round (the same footprint as ``RDD.zipWithIndex``'s summary collect).
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SIX_PLACES = Decimal("0.000001")


def _round6_half_up(v: float) -> float:
    """Exact emulation of Spark's ``round(double, 6)``: Java's
    ``BigDecimal.valueOf(v)`` parses ``Double.toString(v)`` — the
    shortest round-trip decimal, which is exactly Python's ``repr`` —
    then ``setScale(6, HALF_UP)`` and back to double (correctly rounded
    decimal->binary on both VMs).  Two Java quirks replicated: NaN/Inf
    pass through unrounded, and BigDecimal has no signed zero, so -0.0
    inputs/results surface as +0.0."""
    if not math.isfinite(v):
        return v
    f = float(Decimal(repr(v)).quantize(_SIX_PLACES, rounding=ROUND_HALF_UP))
    return 0.0 if f == 0.0 else f


def _sql_double(x: float) -> str:
    """A SQL literal that parses back to EXACTLY the same IEEE double.

    ``repr(float)`` is the shortest decimal string that round-trips in
    Python; Spark's parser (Java ``Double.parseDouble`` semantics via
    the correctly-rounded decimal->binary conversion both JVMs share)
    recovers the identical bit pattern, so inlining centroids through
    SQL text instead of ``F.lit`` changes NOTHING about the arithmetic.
    The CAST keeps plain decimals (which Spark would otherwise parse as
    DECIMAL) on the double path; it constant-folds at analysis.

    Why SQL text at all: building a k*dim literal tree out of
    ``F.lit``/``F.array`` calls costs one py4j round-trip PER SCALAR —
    measured ~1.3 s of pure driver time per Lloyd iteration at
    k=16/dim=64 — while one ``F.expr`` string is a single round-trip.
    """
    if not math.isfinite(x):
        raise ValueError(f"non-finite centroid coordinate: {x!r}")
    return f"CAST({x!r} AS DOUBLE)"


def _sql_vec(vals: list[float]) -> str:
    return "array(" + ", ".join(_sql_double(float(x)) for x in vals) + ")"


def _dist6_sql(vec_col: str, pick: list[float]) -> Column:
    """Rounded-6 left-fold squared euclidean distance to a fixed point —
    the SAME expression tree as the previous ``F.zip_with``/
    ``F.aggregate`` builder (identical fold order, seed and rounding),
    constructed in one py4j call."""
    return F.expr(
        f"round(aggregate(zip_with(`{vec_col}`, {_sql_vec(pick)}, "
        "(x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x), 6)"
    )


def _assign_batches(
    cents: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
    dim: int,
):
    """The Arrow-batched argmin-over-centroids assignment (guide §4.2):
    per batch, distances accumulate dimension by dimension in float64 —
    ``acc = acc + (x_i - c_i)²`` vectorized across rows is the SAME
    left-to-right IEEE fold per row the zip_with form evaluated — then
    round via the exact ``_round6_half_up`` emulation; ``np.argmin``
    returns the FIRST minimum, and the centroid columns are ordered by
    ascending cid, so ties break to the smallest cid exactly like
    ``array_min`` over (dist, cid) structs.  Centroids ride the closure
    (k·dim scalars); the matrix is built once per task (§4.5)."""
    import numpy as np

    cids = [cid for cid, _ in cents]
    cvals = [list(map(float, c)) for _, c in cents]

    def fn(batches):
        import pandas as pd

        cmat = np.array(cvals, dtype=np.float64)  # (k, dim)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)  # (n, dim)
            n = len(x)
            dists = np.empty((n, len(cids)), dtype=np.float64)
            for j in range(cmat.shape[0]):
                acc = np.zeros(n, dtype=np.float64)
                for i in range(dim):
                    d = x[:, i] - cmat[j, i]
                    acc = acc + d * d
                dists[:, j] = [_round6_half_up(v) for v in acc]
            best = np.argmin(dists, axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "cid": [cids[b] for b in best],
                    "dist": dists[np.arange(n), best],
                }
            )

    return fn


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

    assign_schema = (
        f"`{id_col}` long, `{vec_col}` array<double>, cid int, dist double"
    )
    assigned = None
    for it in range(iters):
        # Assignment as ONE narrow Arrow-batched numpy projection
        # (round-10 optimization, see _assign_batches): no join, no row
        # blowup, no shuffle — and neither the per-scalar py4j literal
        # tree (~1.3 s of driver time per iteration at k=16/dim=64) nor
        # the interpreted zip_with fold (~0.8 s per scan) of the
        # earlier forms.  Arithmetic is bit-identical by construction.
        assigned = vectors.mapInPandas(
            _assign_batches(cents, id_col, vec_col, dim), assign_schema
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
    one ``least(md, dist-to-new-pick)`` update per round, each distance
    fold evaluated exactly once per row per round — and each round's
    frame is persisted LAZILY, so the round's single TakeOrdered argmax
    job both materializes the update and returns the pick (1-row
    collect; k·dim driver scalars total, the greedy_source_coverage
    collect class).  The previous round's cache is dropped as soon as
    its successor exists.  Round-10 optimization: the original form
    localCheckpoint-ed eagerly each round (2 jobs per round — one to
    materialize, one to argmax), and an intermediate rewrite as a pure
    ``least(...)`` expression chain over the base cache halved the jobs
    but re-evaluated ALL prior folds per row per round (O(k²·dim)
    interpreted work — measured 11.5 s vs 7 s at sf0.1).  Lazy persist
    keeps BOTH properties: 1 job per round and O(k·dim) per-row work;
    every md value — and therefore every pick — is bit-identical to
    both earlier forms (same left-nested least tree).  O(k) scans,
    never O(k²) distance recomputation.  A production run over 100 TB
    would seed from a per-partition sample first; the traversal itself
    is the standard coreset/seeding primitive (Gonzalez '85).
    """
    from ..sources.loaders import ensure_parallelism

    vectors = ensure_parallelism(vectors).cache()

    first = (
        vectors.orderBy(id_col).limit(1).select(id_col, vec_col).collect()
    )
    if not first:
        raise ValueError("kcenter_centroids: empty corpus")
    picks = [[float(x) for x in first[0][vec_col]]]
    cur = vectors.select(
        id_col, vec_col, _dist6_sql(vec_col, picks[0]).alias("md")
    ).persist()
    prev = None
    for t in range(1, k):
        # This argmax job ALSO materializes cur's cache (lazy persist),
        # so prev — which cur's lineage reads — may only be released
        # once the collect has run, never before.
        nxt = (
            cur.orderBy(F.desc("md"), F.asc(id_col))
            .limit(1)
            .select(id_col, vec_col)
            .collect()
        )
        if prev is not None:
            prev.unpersist(blocking=False)
        picks.append([float(x) for x in nxt[0][vec_col]])
        if t + 1 < k:
            prev, cur = cur, cur.select(
                id_col,
                vec_col,
                F.least(
                    F.col("md"), _dist6_sql(vec_col, picks[-1])
                ).alias("md"),
            ).persist()
    spark = vectors.sparkSession
    cur.unpersist(blocking=False)
    vectors.unpersist(blocking=False)
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
