"""Sessionization: split per-key event streams into sessions at inactivity
gaps, plus per-session aggregates.

The crawl engine's event analog of the reference's per-crawl metadata
(`enhanced_crawler.py` meta counters aggregate one synchronous run; a
distributed crawl has many concurrent per-host "runs" to segment): fetch
logs, politeness windows, and user clickstreams all need gap-based
segmentation before any per-session statistics make sense. This is the
classic batch sessionization shape — one shuffle on the key, two window
passes within each key partition, no Python:

1. ``lag(ts)`` over (key ORDER BY ts, id) marks rows whose gap from the
   previous event exceeds ``gap_sec`` (the first row of a key is always a
   session start);
2. a running ``sum`` of those start flags numbers the sessions 1..n.

The tie-break id column makes the result total-order deterministic under
any partitioning (two events on the same timestamp sessionize
identically on every run — the same discipline as the frontier's
first-enqueuer-wins dedup). Skew note: one hot key's events land in one
window partition; at 10^10-event scale pre-bucket by (key, day) first —
gap sessions cannot span a bucket boundary if the bucket is wider than
the gap plus the max session span you care about.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_sec: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Events + ``session_idx`` (1-based per key, in time order) and
    ``session_start`` (the flag that opened this row's session).

    Timestamps reduce to whole epoch seconds via ``unix_micros div 1e6``
    (floor): TIMESTAMP_NTZ has no direct long cast in Spark 4, and floor
    division is what DuckDB's ``epoch_us // 1000000`` oracle computes.
    """
    sec = f"(unix_micros(cast({ts_col} as timestamp)) div 1000000)"
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    gap = F.expr(sec) - F.lag(F.expr(sec)).over(w)
    started = F.when(
        gap.isNull() | (gap > F.lit(gap_sec)), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn("session_start", started).withColumn(
        "session_idx",
        F.sum("session_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("int"),
    )


def session_stats(
    events: DataFrame,
    gap_sec: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """One row per (key, session): event count, min/max event ids,
    duration in seconds. Rides the sessionize shuffle — the groupBy keys
    are a prefix extension of the window partition key, so no second
    exchange appears in the plan."""
    s = sessionize(events, gap_sec, key_col, ts_col, id_col)
    sec = f"(unix_micros(cast({ts_col} as timestamp)) div 1000000)"
    return s.groupBy(key_col, "session_idx").agg(
        F.count("*").cast("int").alias("n_events"),
        F.min(id_col).alias("min_event_id"),
        F.max(id_col).alias("max_event_id"),
        (F.max(F.expr(sec)) - F.min(F.expr(sec))).alias("duration_sec"),
    )
