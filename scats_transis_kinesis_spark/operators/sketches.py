"""Count-Min sketch (Cormode & Muthukrishnan '05) as plain grouped
aggregation over the portable universal-hash family.

The sketch is a d×w counter table: each key increments one bucket per
hash row; a point query answers min over rows of the key's bucket
counters.  The estimate is ONE-SIDED — every bucket counts a superset
of the key's occurrences, so estimate >= exact always — and the
overestimate is bounded by hash collisions (expected N/w per row,
min over d independent rows).

Engine shape: the build is one groupBy over d·w cells; the counter
table is tiny (d·w rows) and broadcasts into the point-query join.
At 100 TB the counters are the mergeable per-partition frequency
summary (cells add across shards — the same mergeability contract the
HLL/theta/KLL audits pin), and the exact side is what you drop.

Hash family: ``(a·h32 + b) mod p`` over :func:`portable_hash32`
(``a < 2^30`` keeps the product inside int64), identical in Spark and
DuckDB — see functions/hashing.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import MINHASH_P, portable_hash32


def _bucket_structs(
    h32: Column, params: tuple[tuple[int, int, int], ...], w: int
) -> Column:
    """Array of (j, bucket) structs — one per hash row."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (
                    (h32 * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P) % F.lit(w)
                ).alias("bucket"),
            )
            for j, a, b in params
        ]
    )


def countmin_estimates(
    df: DataFrame,
    key_col: str,
    params: tuple[tuple[int, int, int], ...],
    w: int,
) -> DataFrame:
    """Build a d×``w`` Count-Min sketch over ``df[key_col]`` occurrences
    and point-query every distinct key: returns ``(key, exact, est)``
    with ``est >= exact`` guaranteed.

    ``params`` is the hash-row family ``(j, a, b)`` with ``a < 2^30``;
    rows are independent universal hashes, so a family that PREFIXES
    another (same leading rows) can only tighten estimates: min over a
    superset of rows — the monotonicity the property tests pin.
    """
    h = df.select(
        F.col(key_col).alias("key"),
        portable_hash32(F.col(key_col).cast("string")).alias("h32"),
    )
    buckets = _bucket_structs(F.col("h32"), params, w)
    counters = (
        h.select(F.explode(buckets).alias("p"))
        .select("p.j", "p.bucket")
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    keys = h.groupBy("key").agg(
        F.count(F.lit(1)).alias("exact"), F.min("h32").alias("h32")
    )
    kb = keys.select("key", "exact", F.explode(buckets).alias("p")).select(
        "key", "exact", "p.j", "p.bucket"
    )
    return (
        kb.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy("key")
        .agg(F.min("exact").alias("exact"), F.min("c").alias("est"))
    )
