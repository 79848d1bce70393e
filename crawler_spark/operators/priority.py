"""Composite crawl-priority scoring — blend any set of host-level signals
(PageRank, inbound-anchor relevance, source reputation, operator-supplied
lists) into one ``CrawlConfig.priority_scorer``.

Focused crawling in practice never runs on a single signal: the classic
frontier ranks by a weighted mix of link authority and topic relevance.
The single-signal adapters (`graph.pagerank_priority_scorer`,
`anchors.anchor_priority_scorer`) each broadcast one host table; this
module merges N such tables ONCE at scorer construction into a single
host-count-sized frame, so the per-wave cost stays exactly one broadcast
join no matter how many signals participate.

Blend rule: per host, ``score = Σ w_i·s_i / Σ w_i`` over the signals that
cover that host — a host missing from one table is scored by the others
at their re-normalized weights (missing ≠ zero: an unranked host is
unknown, not bad). Hosts covered by no signal keep the frontier's default
priority. Every signal must already be scaled to [0, 1] by its producer.
"""

from __future__ import annotations

from typing import Dict, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blend_host_signals(
    signals: Dict[str, Tuple[DataFrame, float]],
    host_col: str = "host",
    score_col: str = "score",
) -> DataFrame:
    """Merge ``{name: (table(host, score), weight)}`` into one
    ``(host, score)`` frame with the per-host re-normalized weighted mean.
    Signal iteration is name-sorted — the output is independent of dict
    insertion order."""
    if not signals:
        raise ValueError("at least one signal required")
    merged = None
    names = sorted(signals)
    for name in names:
        df, _w = signals[name]
        t = df.select(
            F.col(host_col).alias("host"),
            F.col(score_col).alias(f"_s_{name}"),
        )
        merged = t if merged is None else merged.join(t, "host", "full_outer")
    num = None
    den = None
    for name in names:
        _df, w = signals[name]
        present = F.col(f"_s_{name}").isNotNull()
        n_i = F.when(present, F.lit(float(w)) * F.col(f"_s_{name}")).otherwise(
            F.lit(0.0)
        )
        d_i = F.when(present, F.lit(float(w))).otherwise(F.lit(0.0))
        num = n_i if num is None else num + n_i
        den = d_i if den is None else den + d_i
    return merged.select(
        "host", (num / den).alias("score")
    ).filter(F.col("score").isNotNull())


def composite_priority_scorer(
    signals: Dict[str, Tuple[DataFrame, float]],
    host_col: str = "host",
    score_col: str = "score",
):
    """Adapt a signal blend into the W3 ``CrawlConfig.priority_scorer``
    seam (`frontier/bfs.py`): one broadcast join per wave, unknown hosts
    keep the default priority — the same contract as the single-signal
    adapters it composes."""
    table = blend_host_signals(signals, host_col, score_col).select(
        F.col("host").alias("_cp_host"), F.col("score").alias("_cp_score")
    )

    def scorer(new_rows: DataFrame) -> DataFrame:
        return (
            new_rows.join(
                F.broadcast(table),
                new_rows["host"] == table["_cp_host"],
                "left",
            )
            .withColumn(
                "priority", F.coalesce(F.col("_cp_score"), F.col("priority"))
            )
            .drop("_cp_host", "_cp_score")
        )

    return scorer
