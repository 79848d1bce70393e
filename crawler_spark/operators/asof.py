"""As-of join: for every left row, the latest right row with
``right.ts <= left.ts`` within the same key — the temporal lookup join
(price-as-of-trade, robots-snapshot-as-of-fetch, page-version-as-of-ts)
that Spark has no built-in operator for.

Implementation is the union-merge shape, not join-then-rank: tag both
inputs with a side bit, union, and take a running ``last(..., ignorenulls)``
of the right payload over (key ORDER BY ts, side, id). One shuffle of
|L| + |R| rows on the key; per-row state is a single struct. The naive
equi-join + filter + row_number alternative materializes |L_k| * |R_k|
rows per key before ranking — quadratic on hot keys, which is exactly
what a crawl's per-host streams are.

Tie rules (all deterministic under any partitioning):
- a right row at exactly ``left.ts`` matches (<=, not <): the side bit
  sorts right rows first within a timestamp;
- several right rows on one timestamp: the largest ``id_col`` wins (the
  window's last in (ts, side, id) order).

The DuckDB oracle (``__spark_entry__``) replays the same union-window
construction rather than DuckDB's native ASOF JOIN, so the same-timestamp
tie rules are pinned by construction, not by another engine's choice.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_cols: Optional[Sequence[str]] = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row, plus ``prefix + c`` for each right
    ``value_cols`` entry from the latest right row at or before the left
    row's timestamp (nulls when no right row precedes it).

    Both inputs need ``key_col``, ``ts_col`` and ``id_col``; ``id_col``
    only breaks timestamp ties, it never crosses sides.
    """
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (key_col, ts_col, id_col)
        ]
    r = right.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_tie"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_rv"),
    )
    l = left.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_tie"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    r = r.withColumn("_lrow", F.lit(None).cast(l.schema["_lrow"].dataType))
    w = Window.partitionBy("_k").orderBy("_ts", "_side", "_tie").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    merged = l.unionByName(r).withColumn(
        "_match", F.last("_rv", ignorenulls=True).over(w)
    )
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns] + [
        F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in value_cols
    ]
    return merged.filter(F.col("_side") == 1).select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    on: Optional[Sequence[str]] = None,
    chunk_sec: int = 3600,
) -> DataFrame:
    """Point-in-interval inner join: every ``points`` row paired with every
    ``intervals`` row whose ``[start_col, end_col]`` (inclusive) contains
    its ``ts_col``, optionally also matching equi-keys ``on`` — the
    attribution join (event-to-campaign, fetch-to-crawl-window,
    request-to-maintenance-window) that a naive ``BETWEEN`` theta-join
    makes quadratic.

    Scale shape: time is chunked into ``chunk_sec`` buckets. Each point
    lands in exactly ONE chunk; each interval explodes to the chunks it
    covers. The join is then a plain equi-join on ``(chunk, *on)`` — hash
    join, AQE-eligible, never a BroadcastNestedLoopJoin — followed by the
    exact containment filter. Because a point has a single chunk, every
    qualifying (point, interval) pair meets exactly once: no dedup pass.
    Cost rides on interval length: an interval explodes to
    ``span/chunk_sec`` rows, so pick ``chunk_sec`` near the typical
    interval span (rule of thumb: sum of spans / count). Intervals with
    ``end < start`` are dropped up front (they can match nothing).

    Column names must not collide across the two inputs (apart from
    ``on``); a collision raises rather than silently aliasing.
    """
    on = list(on) if on else []
    overlap = (set(points.columns) & set(intervals.columns)) - set(on)
    if overlap:
        raise ValueError(
            f"column collision between points and intervals: {sorted(overlap)}"
        )
    chunk_sec = int(chunk_sec)
    if chunk_sec <= 0:
        raise ValueError("chunk_sec must be positive")
    p = points.withColumn(
        "_chunk",
        F.expr(f"cast(unix_timestamp({ts_col}) as bigint) div {chunk_sec}"),
    )
    i = intervals.filter(F.col(end_col) >= F.col(start_col)).withColumn(
        "_chunk",
        F.explode(
            F.expr(
                f"sequence(cast(unix_timestamp({start_col}) as bigint) "
                f"div {chunk_sec}, "
                f"cast(unix_timestamp({end_col}) as bigint) div {chunk_sec})"
            )
        ),
    )
    return (
        p.join(i, ["_chunk"] + on)
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("_chunk")
    )
