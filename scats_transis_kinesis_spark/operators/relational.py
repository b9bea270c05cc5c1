"""Relational operators the reference lacks (SURVEY.md §2.7), built as
reusable DataFrame compositions.

Spark has no native as-of join or sessionization operator; both are
expressed here as compositions of built-ins (union + window frames),
which keeps them inside Catalyst/Tungsten — no pandas fallback, one
shuffle each, scale-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` (backward) for the same key.

    Implemented as the union-of-streams trick: tag both sides, sort each
    key's rows by (ts, side) in one window pass, and carry the last seen
    right values forward with ``last(..., ignorenulls=True)``.  Cost: a
    single shuffle on the key + an in-partition sort — contrast with a
    naive range join which is O(n·m) per key.  At equal timestamps the
    right row sorts first, so equality matches (ASOF semantics).
    """
    if direction != "backward":
        raise NotImplementedError("only backward as-of supported")
    l_cols = left.columns
    tagged_r = right.select(
        F.col(on).alias(on),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c != on],
    )
    tagged_l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_value_cols],
        *[F.col(c) for c in l_cols if c != on],
    )
    unioned = tagged_r.unionByName(tagged_l)
    w = (
        W.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_is_right").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in right_value_cols
        ],
    )
    return (
        filled.where(F.col("_is_right") == 0)
        .select(
            F.col(on),
            *[F.col(c) for c in l_cols if c != on],
            *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in right_value_cols],
        )
    )


def sessionize(
    df: DataFrame, key: str, ts: str, gap_minutes: int = 30
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap to
    the previous event exceeds ``gap_minutes``.

    One shuffle on the key; the lag + running-sum both reuse the same
    window sort.  (Streaming twin: ``session_window`` in
    streaming/pipeline.py.)
    """
    w = W.partitionBy(key).orderBy(ts)
    gap_s = gap_minutes * 60
    is_new = (
        F.when(F.lag(ts).over(w).isNull(), 1)
        .when(
            F.unix_timestamp(ts) - F.unix_timestamp(F.lag(ts).over(w)) > gap_s, 1
        )
        .otherwise(0)
    )
    return df.withColumn("session_seq", F.sum(is_new).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    ))


def top_k_per_group(
    df: DataFrame, keys: list[str], order: list[Column], k: int
) -> DataFrame:
    """Top-k rows per group via row_number — the shuffle carries all rows
    but AQE-coalesced; for extreme k≪group-size at 100 TB, pre-filter
    with a per-partition partial top-k before the window if profiling
    demands it. ``order`` must include a deterministic tiebreaker."""
    w = W.partitionBy(*keys).orderBy(*order)
    return df.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)


def upsert(base: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """Merge a change set into a base snapshot: a change row replaces
    the base row with its key; unmatched change rows insert.  The
    reference's topology-delta pull (getTopologyChangesFromDate,
    reference: transis_consumer.py:157-164) exists precisely to be
    applied to the topology snapshot like this.

    Schema-generic: union + per-key keep-latest (change wins) — one
    shuffle on the key, no per-column coalesce list to maintain.  On a
    lakehouse table format this maps to MERGE INTO; the plan shape
    (shuffle on key, latest-wins) is identical."""
    from pyspark.sql import Window as W

    tagged = base.withColumn("_src", F.lit(0)).unionByName(
        changes.withColumn("_src", F.lit(1))
    )
    w = W.partitionBy(key).orderBy(F.desc("_src"))
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_src", "_rn")
    )
