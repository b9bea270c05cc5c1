"""spearman_daily_kpis at hostile magnitudes (round-6 ADVICE).

The pearson_r contract moved from builtin ``corr`` to exact integer
sufficient statistics specifically because ~1e9-magnitude cent values
could flip one ulp at an untested scale.  This test drives the query —
Spark AND its DuckDB oracle — on a synthetic orders table three orders
of magnitude beyond sf0.1 (daily revenues ~1e12 cents, Σx² ~1e27, far
past int64), and asserts:

- the decimal(38)/HUGEINT paths don't overflow to NULL,
- both engines produce byte-identical rounded values,
- the result matches an independent numpy float computation to 1e-6.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import numpy as np


def test_pearson_exact_stats_survive_1e12_magnitudes(spark, tmp_path):
    rng = np.random.RandomState(7)
    rows = []
    day_rev: dict[int, int] = {}
    day_n: dict[int, int] = {}
    for d in range(200):
        date = datetime.datetime(1995, 1, 1) + datetime.timedelta(days=d)
        n_orders = int(rng.randint(5, 15))
        for _ in range(n_orders):
            # ~1e10-cent orders -> ~1e11-1e12 cents per day.
            price = float(rng.randint(10_000_000, 200_000_000)) + 0.25
            rows.append((date, price))
            cents = int(round(price * 100))
            day_rev[d] = day_rev.get(d, 0) + cents
        day_n[d] = n_orders
    sdf = spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")
    sdf.write.parquet(f"{tmp_path}/orders.parquet")

    from scats_transis_kinesis_spark.plans.registry import REGISTRY

    spec = REGISTRY["spearman_daily_kpis"]

    srow = spec.fn(spark, str(tmp_path)).collect()[0]
    assert srow["n_days"] == 200
    assert srow["pearson_r"] is not None, "decimal(38) path overflowed"
    assert srow["spearman_rho"] is not None

    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB reads it via glob.
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"'{tmp_path}/orders.parquet/*.parquet'"
    )
    ocols = None
    res = con.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orow = dict(zip(ocols, res.fetchone()))
    assert orow["n_days"] == 200
    assert srow["pearson_r"] == orow["pearson_r"], "cross-engine flip"
    assert srow["spearman_rho"] == orow["spearman_rho"]

    # Independent float check: numpy Pearson on the exact daily sums.
    xs = np.array([day_rev[d] for d in sorted(day_rev)], dtype=float)
    ys = np.array([day_n[d] for d in sorted(day_n)], dtype=float)
    ref = float(np.corrcoef(xs, ys)[0, 1])
    assert math.isclose(srow["pearson_r"], round(ref, 6), abs_tol=2e-6)
