"""Deterministic global visit-sequence assignment without a global sort.

The engine's total visit order inside a wave is the data-derived key
``(parent_seq, link_pos)`` (SURVEY §2.5 W1). A dense sequence number is
assigned with the scalable two-pass pattern: range-partition on the order
key, ``row_number`` within each partition, then add per-partition offsets
(a tiny driver-side cumulative sum over partition counts). No single
executor ever sorts the whole wave — this is what keeps the order
reproducible AND scalable at 10^10-frontier waves, where a plain
``Window.orderBy`` (single partition) would be the bottleneck.
"""

from __future__ import annotations

from typing import List, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_cols(order_cols: Sequence[Union[str, Column]]) -> List[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_cols]


def assign_seq(
    df: DataFrame,
    order_cols: Sequence[Union[str, Column]],
    offset: int = 0,
    out_col: str = "seq",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = offset + dense rank of the row under
    ``order_cols`` (which must be a total order — no ties). Entries may be
    column names or Column expressions (e.g. ``F.desc("priority")``) —
    both ``repartitionByRange`` and the window honor sort direction."""
    if num_partitions is None:
        num_partitions = max(df.sparkSession.sparkContext.defaultParallelism, 4)

    cols = _as_cols(order_cols)
    ranged = df.repartitionByRange(num_partitions, *cols)
    ranged = ranged.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(*cols)
    # persist: range boundaries come from sampling, and we run two actions
    # (counts, then the output) — both must see the same partitioning
    ranked = ranged.withColumn("_rn", F.row_number().over(w)).persist()

    counts = {r["_pid"]: r["cnt"] for r in
              ranked.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets: List[tuple] = []
    acc = offset
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]

    if not offsets:
        ranked.unpersist()
        out = df.withColumn(out_col, F.lit(None).cast("long"))
        out._assign_seq_total = 0  # type: ignore[attr-defined]
        return out

    mapping = F.create_map(
        *[x for pid, off in offsets for x in (F.lit(pid), F.lit(off))]
    )
    result = (
        ranked.withColumn(out_col, (mapping[F.col("_pid")] + F.col("_rn") - 1).cast("long"))
        .drop("_pid", "_rn")
    )
    # caller should materialize (e.g. commit to parquet) then unpersist
    result._assign_seq_cache = ranked  # type: ignore[attr-defined]
    # total row count comes free from the offset pass — callers must not
    # spend another count() job on it
    result._assign_seq_total = acc - offset  # type: ignore[attr-defined]
    return result
