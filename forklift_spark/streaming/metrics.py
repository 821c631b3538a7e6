"""T1/T2 — event-time metrics taps: watermark + tumbling/sliding windows.

The operational per-epoch metrics live in `_metrics/` (operators/merge.py);
this module is the *stream-shaped* view the north star's "metrics" rows ask
for: events/sec and per-op counts over event-time windows, tolerant of the
bounded disorder in the feed (watermark evicts state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    *,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling (or sliding, if `slide` given) event-time counts per op.

    Works on both batch and streaming frames; on a stream the watermark
    bounds how long a window stays open for late events (T1), so state is
    O(open windows), not O(stream)."""
    w = F.window("event_ts", window, slide) if slide else F.window("event_ts", window)
    return (
        events.withWatermark("event_ts", watermark)
        .groupBy(w.alias("win"), F.col("op"))
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.approx_count_distinct("repo").alias("repos_touched"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "op",
            "events",
            "repos_touched",
        )
    )


def session_activity(events: DataFrame, gap: str = "30 seconds") -> DataFrame:
    """T3 — per-repo session windows (gap-closed bursts of changes)."""
    return (
        events.withWatermark("event_ts", "10 minutes")
        .groupBy(F.session_window("event_ts", gap).alias("sess"), F.col("repo"))
        .agg(F.count(F.lit(1)).alias("events"), F.max("seq").alias("max_seq"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "repo",
            "events",
            "max_seq",
        )
    )
