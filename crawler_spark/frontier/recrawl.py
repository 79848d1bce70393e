"""Recrawl scheduling: per-URL change-rate estimation over fetch history.

A continuous crawler re-fetches pages at a rate matched to how often they
actually change (Cho & Garcia-Molina, "Estimating Frequency of Change",
ACM TOIT 2003). The input is the engine's own output: every wave commit
appends ``(url, warc_ts, content_hash)`` rows, so the fetch history IS the
frontier's lineage. This module turns that history into a schedule:

- :func:`change_stats` — per URL: number of observed fetches, number of
  *changes* (consecutive fetches whose content hash differs — one ``lag``
  window per URL, the only shuffle), total observed timespan, and the
  paper's bias-corrected change-rate estimator (its Sec. 4.2 form)
  ``lambda = -ln((n - X + 0.5) / (n + 0.5)) / (T / n)`` with ``n`` the
  interval count and ``X`` the observed changes — finite at ``X = n``
  (every sample changed) and exactly 0 at ``X = 0``.
- :func:`recrawl_schedule` — joins the stats with a freshness target:
  ``next_fetch_ts = last_fetch + interval`` where ``interval`` is bounded
  to ``[min_interval, max_interval]`` around ``target_changes / lambda``
  (pages that never changed drift toward ``max_interval``; hot pages pin
  at ``min_interval``). Also emits ``due`` against a caller-supplied
  ``now_ts`` — deterministic: the clock is an argument, never ``now()``.
- :func:`due_url_hashes` — the bridge to the URL-seen structures: the
  xxhash64 keys of due URLs, ready for ``cuckoo.delete_hashes`` (deletion
  makes exactly those URLs probe as new again — the recrawl lifecycle
  proven end-to-end in test_cuckoo).

Scale shape (10^10 URLs): one window shuffle keyed by url over the history
table (AQE-coalesced; history is append-only parquet partitioned by wave,
so the scan prunes to the lookback horizon), then a url-keyed groupBy that
reuses the same partitioning; the schedule is a projection. Everything is
JVM expressions; fixed-point arithmetic is NOT needed here because the
driver gate rounds the float estimator to 6 decimals on both engines from
identical integer inputs (same contract as lm.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_stats(
    history: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Per-URL change statistics from fetch history rows.

    Returns ``(url, n_fetches, n_changes, span_sec, last_fetch_ts,
    change_rate)`` — ``change_rate`` in changes/second, NULL when fewer
    than 2 fetches (no interval observed yet).

    ``n_changes`` counts consecutive-fetch hash transitions inside the
    window ordered by ``(ts, hash)``; epoch math is integer seconds so
    both engines agree exactly before the one float step.
    """
    w = Window.partitionBy("url").orderBy("ts", "h")
    marked = history.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("ts"),
        F.col(hash_col).alias("h"),
    ).withColumn(
        "changed",
        F.when(F.lag("h").over(w).isNull(), F.lit(0))
        .when(F.lag("h").over(w) != F.col("h"), F.lit(1))
        .otherwise(F.lit(0)),
    )
    agg = marked.groupBy("url").agg(
        F.count("*").cast("bigint").alias("n_fetches"),
        F.sum("changed").cast("bigint").alias("n_changes"),
        (
            F.max(F.expr("cast(unix_timestamp(ts) as bigint)"))
            - F.min(F.expr("cast(unix_timestamp(ts) as bigint)"))
        ).alias("span_sec"),
        F.max("ts").alias("last_fetch_ts"),
    )
    # lambda = -ln((n - X + 0.5) / (n + 0.5)) / (T/n), n = n_fetches - 1:
    # finite at X = n, exactly 0 at X = 0 (-> max_interval downstream).
    return agg.withColumn(
        "change_rate",
        F.expr(
            "CASE WHEN n_fetches < 2 OR span_sec <= 0 THEN NULL ELSE "
            "round(-ln((cast(n_fetches - 1 - n_changes as double) + 0.5) "
            "/ (cast(n_fetches - 1 as double) + 0.5)) "
            "/ (cast(span_sec as double) / cast(n_fetches - 1 as double)), "
            "10) END"
        ),
    )


def recrawl_schedule(
    history: DataFrame,
    min_interval_sec: int = 3600,
    max_interval_sec: int = 30 * 24 * 3600,
    target_changes: float = 0.5,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Stats + the schedule: ``interval_sec`` (bounded expected time for
    ``target_changes`` changes), ``next_fetch_ts``.

    Never-changed and single-fetch URLs get ``max_interval_sec`` — the
    conservative default for pages with no evidence of churn.
    """
    stats = change_stats(history, url_col, ts_col, hash_col)
    return stats.withColumn(
        "interval_sec",
        F.expr(
            f"CASE WHEN change_rate IS NULL OR change_rate <= 0 "
            f"THEN cast({max_interval_sec} as bigint) "
            f"ELSE cast(least(greatest("
            f"round({target_changes!r} / change_rate), "
            f"cast({min_interval_sec} as double)), "
            f"cast({max_interval_sec} as double)) as bigint) END"
        ),
    ).withColumn(
        "next_fetch_ts",
        F.expr("timestampadd(SECOND, interval_sec, last_fetch_ts)"),
    )


def latest_snapshot(
    history: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Latest-wins corpus view over an append-only fetch log: one row per
    URL — the most recent fetch's columns (all of them, html/text/etc.
    included) plus ``(n_fetches, n_changes, first_fetch_ts)``.

    The CDX-index question "what is the current revision of every page",
    the view every downstream curation stage should consume when the
    frontier recrawls (otherwise a 5×-recrawled page is 5× overweighted in
    dedup, mixing, and LM training). One Exchange keyed on the URL; both
    window passes and the per-URL aggregates ride it. Deterministic pick:
    ``(ts desc, content_hash desc)`` — two records sharing a timestamp
    cannot flip the result across partitionings or engines. ``n_changes``
    counts consecutive-fetch hash transitions in ``(ts, hash)`` ascending
    order — the same rule as :func:`change_stats`, so the two operators
    never disagree on what "changed" means.
    """
    w_asc = Window.partitionBy(url_col).orderBy(ts_col, hash_col)
    w_desc = Window.partitionBy(url_col).orderBy(
        F.desc(ts_col), F.desc(hash_col)
    )
    w_all = (
        Window.partitionBy(url_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    prev = F.lag(hash_col).over(w_asc)
    marked = history.withColumn(
        "_chg",
        F.when(prev.isNull(), F.lit(0))
        .when(prev != F.col(hash_col), F.lit(1))
        .otherwise(F.lit(0)),
    )
    return (
        marked.withColumn("_rn", F.row_number().over(w_desc))
        .withColumn("n_fetches", F.count("*").over(w_all).cast("bigint"))
        .withColumn("n_changes", F.sum("_chg").over(w_all).cast("bigint"))
        .withColumn("first_fetch_ts", F.min(ts_col).over(w_all))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_chg")
    )


def due_url_hashes(schedule: DataFrame, now_ts) -> DataFrame:
    """URL-hash keys (xxhash64 of the url, the engine's J1/F10 key) for
    every URL whose ``next_fetch_ts`` has passed ``now_ts`` — feed to
    ``frontier.cuckoo.delete_hashes`` so exactly these URLs probe as
    unseen on the next wave. ``now_ts`` is an explicit argument
    (datetime or ISO string): determinism contract, no wall clock.
    """
    return (
        schedule.filter(F.col("next_fetch_ts") <= F.lit(now_ts).cast("timestamp"))
        .select("url", F.xxhash64("url").alias("url_hash"))
    )


def snapshot_diffs(
    history: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    line_delim: str = "\n",
) -> DataFrame:
    """Line-level change magnitude between consecutive fetches of a URL —
    the *how much* companion to :func:`change_stats`' boolean *whether*
    (a news homepage rewriting its whole body and a page touching one
    timestamp line both count as "changed"; a scheduler that wants to
    separate them needs the diff size).

    Per consecutive snapshot pair (ordered ``(ts, text)`` — the same
    deterministic tie rule as ``change_stats``): distinct-line SET
    comparison (diffing is about which lines exist, repeats are layout),
    with empty lines ignored (the repo-wide line convention).

    Returns one row per fetch: ``(url, ts, prev_ts, n_lines, n_prev_lines,
    n_common, n_added, n_removed, line_jaccard, change_frac)`` — null
    diff columns on each URL's first fetch; ``line_jaccard`` is
    ``|old ∩ new| / |old ∪ new|`` (1.0 when both snapshots are empty — no
    lines changed) and ``change_frac = 1 - line_jaccard``, both rounded to
    6 decimals from exact integer set sizes.

    Scale shape: ONE url-keyed window shuffle carries the previous
    snapshot's text alongside the current row; everything after is
    per-row JVM column math (``array_distinct`` / ``array_intersect``
    higher-order expressions) — no explode, no self-join, no second
    Exchange. The fat text column moves once, which any per-URL diff must
    pay; nothing moves twice.
    """
    w = Window.partitionBy("url").orderBy("ts", "txt")
    lines = (
        f"array_distinct(filter(split(txt, '{line_delim}'), l -> l <> ''))"
    )
    prev_lines = (
        f"array_distinct(filter(split(prev_txt, '{line_delim}'), l -> l <> ''))"
    )
    base = (
        history.select(
            F.col(url_col).alias("url"),
            F.col(ts_col).alias("ts"),
            F.col(text_col).alias("txt"),
        )
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("prev_txt", F.lag("txt").over(w))
        .withColumn("_cur", F.expr(lines))
        .withColumn(
            "_prev",
            F.when(F.col("prev_txt").isNotNull(), F.expr(prev_lines)),
        )
        .withColumn("n_lines", F.expr("size(_cur)"))
        .withColumn(
            "n_prev_lines",
            F.when(F.col("_prev").isNotNull(), F.expr("size(_prev)")),
        )
        .withColumn(
            "n_common",
            F.when(
                F.col("_prev").isNotNull(),
                F.expr("size(array_intersect(_cur, _prev))"),
            ),
        )
    )
    union_sz = "n_lines + n_prev_lines - n_common"
    return base.select(
        "url",
        "ts",
        "prev_ts",
        F.col("n_lines").cast("bigint").alias("n_lines"),
        F.col("n_prev_lines").cast("bigint").alias("n_prev_lines"),
        F.col("n_common").cast("bigint").alias("n_common"),
        F.expr("n_lines - n_common").cast("bigint").alias("n_added"),
        F.expr("n_prev_lines - n_common").cast("bigint").alias("n_removed"),
        F.when(
            F.col("n_prev_lines").isNull(), F.lit(None).cast("double")
        )
        .when(F.expr(f"{union_sz} = 0"), F.lit(1.0))
        .otherwise(F.expr(f"round(n_common / ({union_sz}), 6)"))
        .alias("line_jaccard"),
        F.when(
            F.col("n_prev_lines").isNull(), F.lit(None).cast("double")
        )
        .when(F.expr(f"{union_sz} = 0"), F.lit(0.0))
        .otherwise(F.expr(f"round(1.0 - n_common / ({union_sz}), 6)"))
        .alias("change_frac"),
    )
