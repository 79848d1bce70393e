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


def funnel(
    events: DataFrame,
    steps,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-step funnel: per user, the earliest time each step
    completes STRICTLY AFTER the previous step's completion (the standard
    strict-order funnel — a purchase logged before the first view does
    not convert).

    Output: one row per user who completed step 1, with
    ``t1..tN`` (epoch microseconds, BIGINT — exact and
    timezone-representation-free on both engines; NULL from the first
    uncompleted step on) and ``steps_completed``. By construction
    ``t{i}`` is non-null only when ``t{i-1}`` is, so
    ``steps_completed`` is a prefix length.

    Plan shape: one filtered min-aggregation per step plus one
    ``user``-keyed join against the previous step's (user, t) table —
    N-1 joins total, every frame user-count-sized after the first
    aggregation, no window over the full event stream and no per-user
    event buffering (the classic cascade; each stage's input partitioning
    on ``user`` is reused by AQE).
    """
    steps = list(steps)
    if not steps:
        raise ValueError("at least one funnel step required")
    us = f"unix_micros(cast({ts_col} as timestamp))"
    tables = []
    prev = None
    for i, s in enumerate(steps, 1):
        e = events.filter(F.col(type_col) == s).select(
            F.col(user_col), F.expr(us).alias("_t")
        )
        if prev is None:
            t = e.groupBy(user_col).agg(F.min("_t").alias(f"t{i}"))
        else:
            t = (
                e.join(prev, user_col)
                .filter(F.col("_t") > F.col(f"t{i-1}"))
                .groupBy(user_col)
                .agg(F.min("_t").alias(f"t{i}"))
            )
        tables.append(t)
        prev = t.select(user_col, f"t{i}")
    out = tables[0]
    for t in tables[1:]:
        out = out.join(t, user_col, "left")
    done = None
    for i in range(1, len(steps) + 1):
        d = F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
        done = d if done is None else done + d
    return out.withColumn("steps_completed", done.cast("int"))


def funnel_counts(
    events: DataFrame,
    steps,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-step conversion counts: ``(step_idx, step, n_users)`` — how
    many users reached at least step ``step_idx`` in order."""
    f = funnel(events, steps, user_col, ts_col, type_col)
    steps = list(steps)
    aggs = [
        F.sum(
            F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
        ).alias(f"_n{i}")
        for i in range(1, len(steps) + 1)
    ]
    row = f.agg(*aggs).first()
    spark = events.sparkSession
    return spark.createDataFrame(
        [
            (i, steps[i - 1], int(row[f"_n{i}"] or 0))
            for i in range(1, len(steps) + 1)
        ],
        "step_idx int, step string, n_users bigint",
    )
