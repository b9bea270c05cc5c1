"""plans/probes.py — the guarded, memoised plan-construction probe."""

from __future__ import annotations

import pytest

from scats_transis_kinesis_spark.plans import probes


def test_probe_returns_float_bounds(spark):
    df = spark.createDataFrame([(3,), (9,), (5,)], "v long")
    lo, hi = probes.probe_min_max(df, "v", query="t1", sf_dir="mem://a")
    assert (lo, hi) == (3.0, 9.0)
    assert isinstance(lo, float) and isinstance(hi, float)


def test_probe_empty_input_raises_cleanly(spark):
    df = spark.createDataFrame([], "v long")
    with pytest.raises(ValueError, match="empty/all-null"):
        probes.probe_min_max(df, "v", query="t2", sf_dir="mem://a")


def test_probe_all_null_raises_cleanly(spark):
    df = spark.createDataFrame([(None,), (None,)], "v long")
    with pytest.raises(ValueError, match="empty/all-null"):
        probes.probe_min_max(df, "v", query="t3", sf_dir="mem://a")


def test_probe_memoises_per_query_sfdir_col_plan(spark):
    df = spark.createDataFrame([(1,), (7,)], "v long")
    first = probes.probe_min_max(df, "v", query="t4", sf_dir="mem://a")
    assert first == (1.0, 7.0)
    # Re-probing the SAME frame hits the cache: prime a poisoned value
    # under this frame's key and observe it comes back verbatim.
    key = ("t4", "mem://a", "v", probes._plan_fingerprint(df))
    assert probes._BOUNDS_CACHE[key] == first
    probes._BOUNDS_CACHE[key] = (-1.0, -1.0)
    try:
        assert probes.probe_min_max(df, "v", query="t4", sf_dir="mem://a") == (
            -1.0,
            -1.0,
        )
    finally:
        probes._BOUNDS_CACHE[key] = first
    # A DIFFERENT frame under the same (query, sf_dir, col) must NOT
    # collide (round-7 ADVICE fix): its plan fingerprint differs, so it
    # re-probes and returns its own bounds.
    other = spark.createDataFrame([(100,), (200,)], "v long")
    assert probes.probe_min_max(other, "v", query="t4", sf_dir="mem://a") == (
        100.0,
        200.0,
    )
    # A different sf_dir also re-probes.
    assert probes.probe_min_max(
        other, "v", query="t4", sf_dir="mem://b"
    ) == (100.0, 200.0)


class _FakeSchema:
    def simpleString(self):  # noqa: N802 (PySpark casing)
        return "struct<v:bigint>"


class _FakeConnectPlan:
    """Mimics pyspark.sql.connect.plan.LogicalPlan's to_proto surface."""

    def __init__(self, ident: str):
        self._ident = ident

    def to_proto(self, client):
        return f"proto[{self._ident}] via {client}"


class _FakeConnectDF:
    """No _jdf (like a Connect frame); exposes _plan/_session instead."""

    def __init__(self, ident: str):
        self._plan = _FakeConnectPlan(ident)
        self._session = type("S", (), {"client": "client0"})()
        self.schema = _FakeSchema()


class _FakeBareDF:
    """Neither _jdf nor _plan: the terminal schema-string fallback."""

    def __init__(self):
        self.schema = _FakeSchema()


def test_fingerprint_connect_fallback_distinguishes_same_schema_plans():
    # Round-8 ADVICE fix: on Connect-like frames (no _jdf) two different
    # derived plans sharing one schema must NOT collide to one cache key.
    a = probes._plan_fingerprint(_FakeConnectDF("scan->filter"))
    b = probes._plan_fingerprint(_FakeConnectDF("scan->project"))
    assert a != b
    # Deterministic for the same plan.
    assert a == probes._plan_fingerprint(_FakeConnectDF("scan->filter"))
    # Only a frame exposing neither handle degrades to the schema hash —
    # where the documented collision is accepted.
    bare = probes._plan_fingerprint(_FakeBareDF())
    assert bare == hash("struct<v:bigint>")
