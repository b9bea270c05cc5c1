"""Structured Streaming pipeline — the engine's form of the reference's
per-document driver loop (reference: transis_kinesis_connector.py:19-26).

The reference's stream is implicitly windowed at the source: one
document per 5-minute collection period, arriving ~3 minutes after the
window closes (field name ``collectionendtimestamp_plus_3_mins``,
reference: transis_response_models.py:25,38; SURVEY.md §1.4).  The
Spark form makes both explicit: tumbling ``window(ts, '5 minutes')`` +
``withWatermark`` sized to the systematic arrival delay with headroom
(10 minutes — first data can take ~10 min, reference:
transis_consumer.py:126).

Batch/streaming parity: these transforms accept either a batch or a
streaming DataFrame — the flagship registry query is the batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WATERMARK = "10 minutes"
WINDOW = "5 minutes"


def windowed_traffic(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Watermarked tumbling-window rollup per (window, event_type) —
    the streaming twin of ``flagship_window_traffic``.

    State size is bounded by the watermark: windows older than 10
    minutes of event time are finalized and evicted."""
    return (
        events.withWatermark(ts_col, WATERMARK)
        .groupBy(F.window(ts_col, WINDOW).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionized_traffic(events: DataFrame, ts_col: str = "ts", gap: str = "30 minutes") -> DataFrame:
    """Session-window aggregation per user — the streaming twin of the
    batch ``sessionize`` operator (operators/relational.py)."""
    return (
        events.withWatermark(ts_col, WATERMARK)
        .groupBy(F.session_window(ts_col, gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
