"""Stream-stream joins (Structured Streaming): the event-correlation
operator batch range/as-of joins (operators/asof.py) express offline —
impressions x clicks, request x response, change x acknowledgment.

State story (what makes this safe unbounded): BOTH sides carry a
watermark and the join predicate carries an explicit event-time bound, so
Spark's symmetric hash join evicts buffered rows once the watermark
passes `within` — state is O(events inside the correlation window), never
O(stream). Without the time bound a stream-stream join must buffer a side
forever; this module refuses to build one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    left_ts: str = "event_ts",
    right_ts: str = "event_ts",
    within: str = "10 minutes",
    left_watermark: str = "30 seconds",
    right_watermark: str = "30 seconds",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Correlate two event streams on equal keys where the right event
    lands inside `[left_ts, left_ts + within]` — the canonical
    impression->click shape. Works identically on batch frames (the
    watermarks are no-ops there), which is what the stream==batch
    equivalence tests exploit.

    `how="inner"` emits matches as soon as both sides arrive;
    `how="leftOuter"` additionally emits unmatched left rows (right
    columns NULL) once the watermark proves no match can still arrive —
    the standard funnel-analysis outer shape. Right columns (beyond the
    join keys) come back prefixed with `right_prefix` so the two events'
    payloads never collide.

    Scale: the join keys hash-partition both streams; state per task is
    bounded by the watermark + `within` horizon. Skewed keys behave like
    any skewed streaming aggregation (salt upstream if one key dominates).
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(
            f"stream_interval_join supports inner/leftOuter, got {how!r} "
            "(rightOuter is the mirror image — swap the sides)"
        )
    if not on:
        raise ValueError(
            "stream_interval_join requires equi-join keys: a time-bound "
            "without keys cross-correlates every pair of events in the "
            "window (quadratic state) — key the correlation"
        )
    l = left.withWatermark(left_ts, left_watermark).alias("l")
    r = right.withWatermark(right_ts, right_watermark).alias("r")
    rts = f"_r_{right_ts}" if right_ts == left_ts else right_ts
    if rts != right_ts:
        r = r.withColumnRenamed(right_ts, rts).alias("r")
    cond = F.lit(True)
    for k in on:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    cond = (
        cond
        & (F.col(f"r.{rts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{rts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}"))
    )
    j = l.join(r, cond, how)
    keep = [F.col(f"l.{c}").alias(c) for c in left.columns]
    keep += [
        F.col(f"r.{rts if c == right_ts else c}").alias(f"{right_prefix}{c}")
        for c in right.columns
        if c not in on
    ]
    return j.select(*keep)
