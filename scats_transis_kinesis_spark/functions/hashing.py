"""Portable hashing, shared by the dedup/similarity/fingerprint
extension operators.

Spark's native ``hash()``/``xxhash64()`` are fast but their exact values
are engine-specific, which would make the DuckDB oracle unverifiable.
Instead the extension operators hash via an ``md5`` hex prefix
interpreted as an integer: md5 is bit-identical everywhere and both
engines evaluate it with vectorized built-ins (Spark: codegen'd
``md5``+``conv``; DuckDB: ``md5``+hex cast).  At 100 TB this is one
pass of columnar hashing — no Python, no shuffle.

Widths:
- 60-bit (15 hex chars) for fingerprints / exact-dedup keys — collision
  odds negligible.
- 32-bit (8 hex chars) as the minhash base so the universal-hash
  permutation ``(a*h + b) mod p`` (a < 2^30, h < 2^32, p = 2^32+15)
  stays exactly representable in signed int64 in both engines while
  the product wraps the modulus ~2^29 times (see :data:`MINHASH_P`
  for why the modulus must sit close to the hash domain).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Modulus of the universal-hash permutation family (Broder '97
# min-wise resemblance estimation): the smallest prime ABOVE the 32-bit
# hash domain, 2^32 + 15.  The modulus must sit close to the domain:
# with coefficients a < 2^30 the product a*h reaches ~2^62, so a prime
# this size wraps ~2^29 times and (a*h + b) mod p is a genuinely
# scrambled pairwise-independent permutation.  (An earlier 2^61-1
# modulus exceeded a*h almost everywhere, leaving the map near-MONOTONE
# in h — every "permutation" shared the same argmin shingle, collapsing
# the k=32 signature into one correlated sample.  Banding + exact-verify
# masked it; the signature-estimated Jaccard verifier exposed it.)
MINHASH_P = (1 << 32) + 15


def portable_hash64(col: Column | str) -> Column:
    """Deterministic 60-bit non-negative hash of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def portable_hash32(col: Column | str) -> Column:
    """Deterministic 32-bit non-negative hash (minhash base)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def duckdb_hash64_sql(expr: str) -> str:
    """DuckDB-SQL rendering of :func:`portable_hash64` over ``expr``."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def duckdb_hash32_sql(expr: str) -> str:
    """DuckDB-SQL rendering of :func:`portable_hash32` over ``expr``."""
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def minhash_value(hash32_col: Column, a: int, b: int) -> Column:
    """One universal-hash permutation ``(a*h + b) mod p``.

    Callers draw ``a``/``b`` from a seeded RNG with ``1 <= a < 2^30``:
    ``a*h < 2^62`` cannot overflow int64, so Spark and DuckDB agree
    bit-for-bit.
    """
    return (hash32_col * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)


def minhash_value_sql(hash32_sql: str, a: int, b: int) -> str:
    """DuckDB-SQL rendering of :func:`minhash_value`."""
    return f"(({hash32_sql} * {a} + {b}) % {MINHASH_P})"
