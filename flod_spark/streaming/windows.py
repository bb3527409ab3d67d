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


def with_event_time(df: DataFrame, time_col: str = "ts") -> DataFrame:
    """Make ``time_col`` watermark-eligible. Spark's event-time machinery
    (withWatermark / window / session_window state eviction) requires
    TIMESTAMP, but the engine's canonical event time is naive
    (TIMESTAMP_NTZ — io.load's normalization). Cast NTZ->LTZ here; with
    spark.sql.session.timeZone pinned to UTC (session.py + registry.query)
    the cast is a lossless bijection, and window bounds are cast back via
    :func:`as_naive` so every surfaced timestamp stays naive."""
    if dict(df.dtypes).get(time_col) == "timestamp_ntz":
        return df.withColumn(time_col, F.col(time_col).cast("timestamp"))
    return df


def as_naive(col):
    """Inverse of with_event_time's cast for output columns."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp_ntz")


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    time_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling window count+sum per key (batch twin: stream_window)."""
    return (
        with_event_time(events, time_col)
        .withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window).alias("w"), key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(as_naive("w.start").alias("win_start"), key_col, "n_events", "sum_value")
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
        with_event_time(events, time_col)
        .withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            as_naive("w.start").alias("win_start"),
            as_naive("w.end").alias("win_end"),
            "n_events",
        )
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
        with_event_time(events, time_col)
        .withWatermark(time_col, watermark)
        .groupBy(F.session_window(time_col, gap).alias("w"), key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            key_col,
            as_naive("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
