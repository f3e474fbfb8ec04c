"""Watermarked event-time windowed aggregation (build-brief streaming
requirement: "watermarks + windowed aggs for late data").

The reference has no event stream (D3 — its daemon is incremental batch
over files), so this is a beyond-reference operator: the streaming twin
of the batch ``queries_events.q_events_hourly`` aggregation. Append-mode
semantics: a window's row is emitted exactly once, when the watermark
(max observed event time minus the lateness allowance) passes the window
end; events arriving later than the allowance are dropped by the engine
— tests/test_streaming_windows.py pins both behaviors across
availableNow restarts (the watermark itself persists in the streaming
checkpoint).

Scale shape: one shuffle on (window, user_id); state store holds only
open windows (bounded by lateness allowance x event rate), never the
stream history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events_stream: DataFrame,
    window_len: str = "1 hour",
    lateness: str = "30 minutes",
) -> DataFrame:
    """Tumbling event-time windows per user over a stream with columns
    (event_id, user_id, ts, value)."""
    return (
        events_stream.withWatermark("ts", lateness)
        .groupBy(F.window("ts", window_len).alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
