"""Iterative graph operators beyond connected components.

PageRank here is the canonical fixed-iteration form: each round is ONE
keyed shuffle (rank join edges on src, re-aggregate on dst) — the same
loop shape as ``dedup.connected_components`` and exactly what a
1000-executor cluster runs per Pregel superstep.  The driver never sees
data rows; iteration count is a constant, so the whole plan is a static
chain Catalyst can pipeline.

Simplifications (documented, mirrored exactly by the SQL oracle):
rank mass entering sink nodes (no out-edges) leaks rather than being
redistributed, and there is no convergence test — fixed iterations,
which is how production batch PageRank is usually run anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    iterations: int = 3,
    damping: float = DAMPING,
) -> DataFrame:
    """Weighted PageRank over an edge list, ``iterations`` rounds.

    rank_{t+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} rank_t(u) * w(u,v)/out(u)

    Per round: one broadcast-or-shuffle join of the (node, rank) frame
    against the normalized edges on ``src`` and one grouped sum on
    ``dst`` — two keyed exchanges over data partitioned by node id, no
    driver collection, no global ordering anywhere.  At 100 TB the
    edge frame is the big side; it is normalized ONCE up front and
    re-used every round (cache it for iterative jobs).
    """
    # Loop invariants cached (same pattern as ml.kmeans_assign and
    # dedup.connected_components): every iteration joins `norm` and
    # `nodes`, so without the cache each round re-scans and re-normalizes
    # the edge list — 3 redundant full scans+joins at 100 TB.
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .cache()
    )
    out_w = edges.groupBy(src).agg(F.sum(weight).alias("_out_total"))
    norm = (
        edges.join(out_w, src)
        .select(
            F.col(src).alias("_u"),
            F.col(dst).alias("_v"),
            (F.col(weight) / F.col("_out_total")).alias("_w"),
        )
        .cache()
    )

    n_nodes = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    base = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        contrib = (
            ranks.join(norm, ranks.node == norm._u)
            .groupBy(F.col("_v").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("_w")).alias("_in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + damping * F.coalesce(F.col("_in"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
    # Materialize the final ranks once (node-count-sized, the small frame
    # of the algorithm) and truncate the 3-round lineage so the cached
    # loop inputs can be released before returning — otherwise they pin
    # executor memory for as long as the caller holds the lazy plan.
    ranks = ranks.localCheckpoint(eager=True)
    norm.unpersist(blocking=False)
    nodes.unpersist(blocking=False)
    return ranks
