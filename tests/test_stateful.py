"""Stateful streaming tests: site-liveness state machine
(applyInPandasWithState) — data path via a real file-source stream,
timeout/budget path via a fake GroupState (deterministic, no clocks)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from scats_transis_kinesis_spark.streaming.stateful import (
    IDLE_TIMEOUT_MS,
    liveness_fn,
    site_liveness,
)

from datetime import datetime, timedelta

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _write_file(spark, path, rows):
    """Write one flat parquet file at ``path`` (one stream micro-batch)."""
    import glob
    import shutil

    staging = path + ".staging"
    spark.createDataFrame(rows, "site_id string, ts timestamp").coalesce(1).write.mode(
        "overwrite"
    ).parquet(staging)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    shutil.move(glob.glob(os.path.join(staging, "part-*.parquet"))[0], path)
    shutil.rmtree(staging)


def test_site_liveness_active_counts_accumulate_across_batches(spark):
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "events")
        f1 = [("A", T0), ("A", T0 + timedelta(minutes=1)), ("B", T0)]
        f2 = [("B", T0 + timedelta(minutes=2))]
        _write_file(spark, os.path.join(src, "f1.parquet"), f1)
        _write_file(spark, os.path.join(src, "f2.parquet"), f2)

        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = (
            site_liveness(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("liveness_out")
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM liveness_out").collect()
        finally:
            q.stop()

        # state persists across micro-batches: the max running count per
        # site equals its total events regardless of file split
        best = {}
        for r in rows:
            best[r["site_id"]] = max(best.get(r["site_id"], 0), r["n_messages"])
        assert best == {"A": 2, "B": 2}
        assert all(r["status"] == "active" for r in rows)


class FakeState:
    """Minimal GroupState stand-in for driving the timeout branch."""

    def __init__(self, value=None, timed_out=False, watermark_ms=0):
        self._value = value
        self.hasTimedOut = timed_out
        self._watermark_ms = watermark_ms
        self.removed = False
        self.timeout_ts = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        if self._value is None:
            raise ValueError("no state")
        return self._value

    def update(self, v):
        self._value = tuple(v)

    def remove(self):
        self.removed = True
        self._value = None

    def getCurrentWatermarkMs(self):
        return self._watermark_ms

    def setTimeoutTimestamp(self, ts_ms):
        self.timeout_ts = ts_ms


def _run(key, pdfs, state):
    return list(liveness_fn(key, iter(pdfs), state))


def test_liveness_data_resets_budget_and_arms_timeout():
    state = FakeState(value=(5, 1_000_000, 1))  # budget nearly exhausted
    pdf = pd.DataFrame({"ts": [T0, T0 + timedelta(minutes=1)]})
    [out] = _run(("A",), [pdf], state)
    assert out["status"][0] == "active"
    assert out["n_messages"][0] == 7
    assert out["budget_left"][0] == 3  # refilled on fresh data
    last_ms = int(out["last_seen_ms"][0])
    assert state.timeout_ts == last_ms + IDLE_TIMEOUT_MS


def test_liveness_timeout_decrements_budget_then_dies():
    # silent period 1: budget 3 -> 2
    state = FakeState(value=(7, 2_000_000, 3), timed_out=True, watermark_ms=9_000_000)
    [out] = _run(("A",), [], state)
    assert out["status"][0] == "silent" and out["budget_left"][0] == 2
    assert state.timeout_ts == 9_000_000 + IDLE_TIMEOUT_MS
    assert not state.removed

    # budget exhausted -> dead, state evicted
    state = FakeState(value=(7, 2_000_000, 1), timed_out=True, watermark_ms=9_000_000)
    [out] = _run(("A",), [], state)
    assert out["status"][0] == "dead" and out["budget_left"][0] == 0
    assert state.removed


def test_liveness_event_time_timeout_fires_in_stream(spark):
    # site A goes silent while site B keeps reporting; B's events push
    # the watermark past A's armed timeout -> A emits a 'silent' row.
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "events")
        _write_file(spark, os.path.join(src, "f1.parquet"), [("A", T0), ("B", T0)])
        _write_file(
            spark, os.path.join(src, "f2.parquet"), [("B", T0 + timedelta(minutes=30))]
        )
        _write_file(
            spark, os.path.join(src, "f3.parquet"), [("B", T0 + timedelta(minutes=31))]
        )

        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = (
            site_liveness(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("liveness_timeout_out")
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM liveness_timeout_out").collect()
        finally:
            q.stop()

        a_status = {r["status"] for r in rows if r["site_id"] == "A"}
        assert "silent" in a_status, f"expected A to go silent, got rows: {rows}"
        # the silent row keeps A's last counts and decrements the budget
        silent = [r for r in rows if r["site_id"] == "A" and r["status"] == "silent"]
        assert silent[0]["n_messages"] == 1 and silent[0]["budget_left"] == 2


def test_liveness_silent_to_dead_in_stream(spark):
    # A goes silent; B keeps advancing the watermark long enough for A's
    # budget (3) to drain: silent -> silent -> dead, state evicted.
    from scats_transis_kinesis_spark.streaming.stateful import site_liveness

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "events")
        _write_file(spark, os.path.join(src, "f1.parquet"), [("A", T0), ("B", T0)])
        # each later file advances event time by ~25 min; A's 20-min
        # timeout re-arms from the watermark after each firing
        for i, minutes in enumerate([30, 55, 80, 105, 130], start=2):
            _write_file(
                spark,
                os.path.join(src, f"f{i}.parquet"),
                [("B", T0 + timedelta(minutes=minutes))],
            )

        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = (
            site_liveness(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("liveness_dead_out")
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            a_rows = [
                (r["status"], r["budget_left"])
                for r in spark.sql(
                    "SELECT * FROM liveness_dead_out WHERE site_id = 'A'"
                ).collect()
            ]
        finally:
            q.stop()

        statuses = [s for s, _ in a_rows]
        assert statuses[0] == "active"
        assert "dead" in statuses, a_rows
        # budget drains monotonically through the silent firings to 0
        assert [b for s, b in a_rows if s == "silent"] == [2, 1], a_rows
        assert a_rows[-1] == ("dead", 0), a_rows
