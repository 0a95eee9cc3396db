"""Sessionization: gap-based session assignment over an event stream.

Not present in the reference (its per-day buckets are the closest
analogue), but a core large-scale event-analytics operator and a
natural extension of the engine's activity model: lag(ts) per entity,
session boundary when the gap exceeds the threshold, running sum of
boundaries = session id. One shuffle on the entity key; Structured
Streaming gets the same semantics from session_window(ts, gap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    entity: str,
    ts: str = "ts",
    order_tiebreak: str | None = None,
    gap_minutes: int = 30,
) -> DataFrame:
    """Attach a per-entity session_id (1-based, in time order)."""
    order = [F.col(ts)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(entity).orderBy(*order)
    gap_s = gap_minutes * 60
    prev = F.lag(ts).over(w)
    is_new = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col(ts)) - F.unix_micros(prev)) / 1e6 > gap_s),
        1,
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )


def session_stats(
    events: DataFrame,
    entity: str,
    ts: str = "ts",
    order_tiebreak: str | None = None,
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session rollup: event count + duration seconds."""
    s = sessionize(events, entity, ts, order_tiebreak, gap_minutes)
    # millisecond rounding via integer division on microseconds:
    # rounding a double quotient differs across engines exactly at
    # decimal midpoints, integer `div` can't
    agg = s.groupBy(entity, "session_id").agg(
        F.count("*").alias("n_events"),
        (F.unix_micros(F.max(ts)) - F.unix_micros(F.min(ts))).alias("_dur_us"),
    )
    return agg.select(
        entity,
        "session_id",
        "n_events",
        (F.expr("(_dur_us + 500) div 1000").cast("double") / 1e3).alias("duration_s"),
    )
