"""Deterministic Bloom-filter runtime filter (semi-join pruning).

The 100 TB pattern this implements: a selective dimension predicate
(say, one market segment) should prune the FACT scan before any
shuffle — but a real semi-join shuffles the fact side on the join key.
Instead, build an ``m``-bit Bloom bitmap over the dim-side keys (one
narrow groupBy over ``|keys| * k`` bit positions, collected as
``m/64`` bounded longs — 2 KiB at the default 16 Ki bits), broadcast
it into the fact scan as a literal array, and probe with pure bitwise
projection: NO join, NO shuffle touches the fact side.  Surviving rows
are a superset of the true matches — false positives are bounded by
the standard ``(1 - e^{-kn/m})^k``, false negatives are structurally
impossible — so a cheap exact join on the (much smaller) surviving
subset finishes the semi-join.  This is the portable, oracle-checkable
twin of Spark's own ``InjectRuntimeFilter`` bloom pushdown: hashes are
md5-based (:mod:`..functions.hashing`), bit-identical in DuckDB, so the
whole filter — bitmap, probe, FP count — is replayable in SQL.

Reference parity note: the reference engine has no runtime-filter
surface at all; this is part of the extension family (training-data
curation at scale), same status as the dedup/similarity operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import duckdb_hash64_sql, portable_hash64

# Default geometry: 16 Ki bits / 4 hashes → 256 longs of driver state.
# At |keys| = n the load factor is kn/m; the audit query reports the
# realized FP count against the exact membership so mis-sizing is
# visible in-query instead of silently degrading pruning.
BLOOM_M_BITS = 16384
BLOOM_K = 4


def bloom_position(key: Column, j: int, m_bits: int = BLOOM_M_BITS) -> Column:
    """Bit position of hash ``j`` for ``key`` — portable md5 domain."""
    return (
        portable_hash64(F.concat(F.lit(f"{j}:"), key.cast("string"))) % m_bits
    )


def bloom_position_sql(expr: str, j: int, m_bits: int = BLOOM_M_BITS) -> str:
    """DuckDB rendering of :func:`bloom_position` over SQL ``expr``."""
    tagged = f"'{j}:' || ({expr})::VARCHAR"
    return f"({duckdb_hash64_sql(tagged)} % {m_bits})"


def build_bloom_words(
    keys: DataFrame, key_col: str, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K
) -> list[int]:
    """Build the filter; returns ``m_bits / 64`` signed 64-bit words.

    One narrow aggregation job: ``|keys| * k`` (word, bit) rows shuffle
    into at most ``m_bits / 64`` groups; the collect is the BITMAP, a
    bounded driver transfer independent of data volume (the allowed
    bounded-summary collect pattern, like the k-means centroids).
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = keys.select(
        F.explode(
            F.array(*[bloom_position(F.col(key_col), j, m_bits) for j in range(k)])
        ).alias("pos")
    )
    rows = (
        pos.groupBy(F.shiftright("pos", 6).alias("word"))
        .agg(
            F.bit_or(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    F.col("pos").bitwiseAND(F.lit(63)).cast("int"),
                )
            ).alias("bits")
        )
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["word"]] = r["bits"]
    return words


def bloom_probe(
    key: Column, words: list[int], m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K
) -> Column:
    """Membership test against a built filter — a pure projection.

    The bitmap rides into codegen as a literal long array (broadcast by
    the plan serializer, not a join); each probe is ``k`` md5 hashes +
    ``k`` indexed bit tests.  No shuffle, no join, no Python.
    """
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    checks = []
    for j in range(k):
        pos = bloom_position(key, j, m_bits)
        word = F.element_at(arr, (F.shiftright(pos, 6) + F.lit(1)).cast("int"))
        mask = F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            pos.bitwiseAND(F.lit(63)).cast("int"),
        )
        checks.append(word.bitwiseAND(mask) != F.lit(0))
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out
