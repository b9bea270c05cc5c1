"""The vectorized round-6 emulation must be bit-identical to the scalar
``Decimal(repr(v))`` HALF_UP emulation for EVERY input — including the
half-boundary band where the numpy fast path falls back to Decimal.
(Round-11 optimization: the per-value Decimal loop dominated every
Arrow assignment kernel.)"""

from __future__ import annotations

import math

import numpy as np
import pytest

from scats_transis_kinesis_spark.operators.ml import (
    _round6_half_up,
    _round6_half_up_arr,
)


def _agree(got: float, want: float) -> bool:
    if math.isnan(want):
        return math.isnan(got)
    return got == want and math.copysign(1.0, got) == math.copysign(1.0, want)


def _check(values) -> None:
    arr = np.asarray(values, dtype=np.float64)
    got = _round6_half_up_arr(arr)
    for g, x in zip(got, arr):
        w = _round6_half_up(float(x))
        assert _agree(float(g), w), (
            f"vectorized {float(g)!r} != scalar {w!r} for input {float(x)!r}"
        )


def test_uniform_random_ranges():
    rng = np.random.default_rng(7)
    _check(rng.uniform(-1, 1, 20000))
    _check(rng.uniform(-1e3, 1e3, 20000))
    _check(rng.normal(0, 1e6, 10000))
    _check(rng.uniform(-1e-7, 1e-7, 10000))


def test_generated_half_boundaries():
    """Values at and immediately adjacent to decimal x.xxxxxx5
    boundaries — the exact band where a float fast path diverges and
    the Decimal fallback must fire."""
    rng = np.random.default_rng(11)
    ks = rng.integers(-(10**7), 10**7, 20000)
    half = (ks * 10 + 5) / 1e7  # nearest doubles to k.xxxxxx5 decimals
    _check(half)
    _check(np.nextafter(half, np.inf))
    _check(np.nextafter(half, -np.inf))
    _check(half + 1e-13)
    _check(half - 1e-13)


def test_specials_and_extremes():
    _check(
        [
            0.0,
            -0.0,
            float("nan"),
            float("inf"),
            float("-inf"),
            5e-7,
            -5e-7,
            1.5e-6,
            -1.5e-6,
            2.5e-6,
            -2.5e-6,
            1e-300,
            -1e-300,
            5e-324,
            -5e-324,
            0.49999950000000004,
            -0.49999950000000004,
        ]
    )
    rng = np.random.default_rng(13)
    # spans the 2^52 scaled-integer cutoff where the fast path must bail
    _check(rng.uniform(4e9, 6e9, 10000))
    _check(rng.uniform(-1e16, 1e16, 10000))


def test_matches_spark_round(spark):
    """End-to-end pin against Spark's own round(double, 6) — the
    contract both emulations exist to reproduce."""
    rng = np.random.default_rng(17)
    vals = list(rng.uniform(-2, 2, 500)) + list(
        (rng.integers(-(10**6), 10**6, 200) * 10 + 5) / 1e7
    )
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    spark_rounded = [r[0] for r in df.selectExpr("round(v, 6)").collect()]
    ours = _round6_half_up_arr(np.asarray(vals, dtype=np.float64))
    for s, o, x in zip(spark_rounded, ours, vals):
        assert _agree(float(o), float(s)), (
            f"vectorized {float(o)!r} != spark {float(s)!r} for {float(x)!r}"
        )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
