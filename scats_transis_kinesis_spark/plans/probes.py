"""Driver-side scalar bound probes for the hierarchical-rank builders.

A few plans need two scalars (min/max of a derived column) BEFORE the
plan can be built — they size the range buckets of the hierarchical
rank / k-th-order-statistic / equi-depth-histogram machinery.  Footer
statistics (``parquet_column_minmax``) cover raw parquet columns, but
these probes run over DERIVED frames (rounded prices, conformal
scores), so an eager 2-scalar aggregate job is the only source.

This helper keeps that probe honest:

- **Empty-safe**: an empty (or all-null) input raises a clear
  ``ValueError`` instead of the opaque ``float(None)`` TypeError the
  raw ``.first()`` unpacking produced.
- **Cached per (query, sf_dir, col, plan)**: registry enumeration
  calls plan builders repeatedly (driver correctness sweeps, bench
  warm-up); the probed bounds of a static parquet input don't change,
  so each probe site pays the eager job once per process.  The key
  includes a semantic fingerprint of the probed frame's analyzed plan
  (round-7 ADVICE fix), so a query that probes two DIFFERENT derived
  frames sharing a column name gets two cache rows instead of one
  silently-wrong hit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BOUNDS_CACHE: dict[tuple[str, str, str, int], tuple[float, float]] = {}


def _plan_fingerprint(df: DataFrame) -> int:
    """Semantic hash of the frame's analyzed plan.

    ``semanticHash`` is stable across expression-ID renumbering, so
    re-building the same plan hits the cache, while a genuinely
    different derived frame (even with identical column names) gets its
    own key.  On non-JVM-backed frames (Spark Connect, no ``_jdf``) the
    fallback hashes the Connect proto plan (``df._plan``) — two derived
    frames that merely share a schema still get distinct keys (round-8
    ADVICE fix; the schema string alone collided exactly the frames the
    round-7 fix targeted).  Only a frame exposing neither handle
    degrades to the schema-string hash.
    """
    try:
        return int(df._jdf.queryExecution().analyzed().semanticHash())
    except Exception:
        pass
    try:
        # Connect: LogicalPlan proto repr is a plan-level identity (not
        # normalized across expr-id renumbering like semanticHash, so it
        # may under-cache — never wrongly share).
        return hash(str(df._plan.to_proto(df._session.client)))
    except Exception:
        return hash(df.schema.simpleString())


def probe_min_max(
    df: DataFrame, col: str, *, query: str, sf_dir: str
) -> tuple[float, float]:
    """Eagerly probe ``(min, max)`` of ``col`` as floats, memoised by
    ``(query, sf_dir, col, plan-fingerprint)``.  Raises ``ValueError``
    on an empty or all-null input so bucket sizing fails loudly, not
    with a ``float(None)`` TypeError three frames later."""
    key = (query, sf_dir, col, _plan_fingerprint(df))
    hit = _BOUNDS_CACHE.get(key)
    if hit is not None:
        return hit
    row = df.agg(
        F.min(F.col(col)).cast("double").alias("lo"),
        F.max(F.col(col)).cast("double").alias("hi"),
    ).first()
    lo = None if row is None else row["lo"]
    hi = None if row is None else row["hi"]
    if lo is None or hi is None:
        raise ValueError(
            f"{query}: bound probe over empty/all-null column {col!r} "
            f"({sf_dir}) — cannot size range buckets"
        )
    out = (float(lo), float(hi))
    _BOUNDS_CACHE[key] = out
    return out
