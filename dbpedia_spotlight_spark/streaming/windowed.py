"""Event-time windowed aggregation with watermarks (late-data handling).

The streaming form of ``queries.q_events_hourly``: tumbling event-time
windows over the events stream, with a watermark bounding state and
dropping data later than ``late_threshold``. Drained with
``trigger(availableNow=True)`` in tests and asserted equal to the batch
rollup (single-batch drain ⇒ nothing is late ⇒ stream ≡ batch).

Scale notes: state size = |open windows × event types|, bounded by the
watermark horizon — constant in stream length; the shuffle is on the
(window, event_type) key, map-side partial-aggregated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    late_threshold: str = "2 hours",
) -> DataFrame:
    """(hour, event_type, n_events, sum_value) over event-time windows.

    Works on both batch and streaming DataFrames (same code path — a
    batch frame simply ignores the watermark)."""
    # watermarks require TIMESTAMP (ltz); parquet loads ntz — cast in both
    # batch and stream paths so the two stay row-identical
    src = events.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    if events.isStreaming:
        src = src.withWatermark("ts", late_threshold)
    return (
        src.groupBy(F.window("ts", window_len).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
             .cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
             .alias("hour"),
            "event_type", "n_events", "sum_value",
        )
    )
