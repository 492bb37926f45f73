"""Event-time windowed aggregation with a watermark late-data policy.

The reference has no event-time semantics (every OSC change applies,
SURVEY §2.8) — this is the engine's beyond-the-reference streaming
surface for training-data/event pipelines: tumbling-window counts with
bounded state.

Spark shape: `withWatermark` + `groupBy(window(...))` in APPEND mode —
the engine holds only open windows in state, finalizes a window when the
watermark (max event time − delay) passes its end, and DROPS events that
arrive later than the delay. State is bounded by (windows in flight ×
group keys), independent of stream length — the property that makes this
run forever on an unbounded 100 TB/day event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Tumbling-window per-key counts over an event-time stream.

    Returns (window_start, window_end, <key>, n, total_value) in append
    mode: a row is emitted exactly once, when its window finalizes; events
    later than `watermark_delay` past the max seen event time are dropped
    (the late-data policy)."""
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
            "total_value",
        )
    )


def session_windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    gap: str = "30 minutes",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Session-window per-key aggregation (dynamic-length windows that
    extend while events keep arriving within ``gap`` of the session, and
    close after a quiet period).

    Native `F.session_window`, so the state store MERGES adjacent
    sessions incrementally across micro-batches; a session finalizes
    (append mode, exactly once) when the watermark passes its end. This
    is the streaming form of the batch gaps-and-islands sessionization
    (`events_sessionize`); state is bounded by open sessions x keys."""
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n",
            "total_value",
        )
    )
