"""Gate: zero oracle output-type-family mismatches vs the Spark schema.

Round 7 shipped 3 driver-red queries because their DuckDB oracles emitted
HUGEINT (int128) columns — ``(sum(...) * k) // x`` without ``::BIGINT`` —
which the driver's pandas/Arrow fetch path renders as float64/object while
Spark emits LONG: same values, different canonical rendering, hash
mismatch (VERDICT r7 §What's wrong #1–2).  ``tools/type_sweep.py`` exists
precisely for this hazard but was not in the per-round gate; this test
wires it in.  It builds (never executes) every registered query on both
engines at sf0.001 and asserts the sweep comes back empty, so the int128
class — and any other family drift (float vs decimal, ts vs string) —
fails the suite before the driver ever sees it.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import type_sweep  # noqa: E402  (tools/type_sweep.py)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in type_sweep.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_no_oracle_type_family_mismatches(spark, duck):
    bad = type_sweep.collect_mismatches(spark, duck, SF_DIR)
    assert bad == {}, (
        "oracle/spark output type families diverged — the driver's hasher "
        "will red these even when values match:\n"
        + "\n".join(f"  {n}: {'; '.join(i)}" for n, i in sorted(bad.items()))
    )


def test_hugeint_detector_still_fires(spark, duck):
    """Self-test: the sweep's HUGEINT detector actually flags the round-7
    failure shape (sum(INTEGER) // k, uncast) — guards against the checker
    itself rotting into a silent always-pass."""
    rel = duck.sql("SELECT (sum(r_regionkey) * 1000000) // count(*) AS m FROM region")
    fam = type_sweep.duck_family(str(rel.types[0]))
    assert fam == "int128"
    assert type_sweep.duck_family("BIGINT") == "int"
    assert type_sweep.spark_family("bigint") == "int"
