"""Event-time windowed aggregations with watermarks (SURVEY §2.5).

These are the streaming twins of catalog/streaming_batch.py; for aligned
windows and complete output, streaming results equal the batch results
(asserted in tests/test_streaming.py — the reference's both-drive-modes
parity test reborn, pipeline.d:1351-1356).

Scale: windowed aggs shuffle on (window, key) with partial agg; the
watermark bounds state (late rows beyond it are dropped —
dropDuplicatesWithinWatermark analogously bounds dedup state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    time_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling window count+sum per key (batch twin: stream_window)."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window).alias("w"), key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), key_col, "n_events", "sum_value")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    time_col: str = "ts",
) -> DataFrame:
    """Sliding window event counts (overlapping windows)."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("win_start"), F.col("w.end").alias("win_end"), "n_events")
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    time_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows: dynamic-gap sessions per key (batch twin:
    stream_session's gaps-and-islands)."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.session_window(time_col, gap).alias("w"), key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
