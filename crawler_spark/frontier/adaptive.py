"""Feedback-driven frontier planning: adaptive per-host politeness from
observed fetch behavior, and exact proportional wave-budget apportionment
from host signals.

The reference crawler's politeness is static — one rate limit for
everything (`/root/reference/crawler/web_crawler.py` sleeps a constant
between fetches) plus whatever robots.txt declares. A production frontier
closes the loop instead: hosts that answer fast get crawled faster, hosts
that error or slow down get backed off (the behavior every large crawler
documents — e.g. the politeness sections of Olston & Najork 2010, "Web
Crawling", Foundations and Trends in IR), and the next wave's per-host
fetch budgets come from the measured delay, not a guess. These operators
produce that feedback table from a fetch log and translate host
importance scores into integral per-host budgets that sum EXACTLY to the
wave's total — both consumed by the existing ``CrawlConfig.host_budget``
/ robots crawl_delay seams (`crawler_spark/frontier/bfs.py`).

Determinism contract (repo-wide): latency percentiles are
``percentile_disc``-style — the element at a fixed rank under a total
order with an id tie-break, never an interpolated float; backoff tiers
are integer count comparisons; apportionment is exact integer
largest-remainder. Every output is bit-identical across partitionings
and engines.

Scale shape: one groupBy(host) with map-side combine for the counters,
one per-host window for the rank statistic (host cardinality rows — at
10^8 hosts that is the shuffle you want), and the planner is a
host-table-sized window + one scalar total. Nothing corpus-sized moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# fixed-point scale for signal scores in the planner
_Q = 1_000_000


def adaptive_crawl_delay(
    fetch_log: DataFrame,
    host_col: str = "host",
    latency_ms_col: str = "latency_ms",
    error_col: str = "is_error",
    id_col: str = "fetch_id",
    pctl_num: int = 1,
    pctl_den: int = 2,
    multiplier: int = 2,
    min_delay_ms: int = 100,
    max_delay_ms: int = 30_000,
) -> DataFrame:
    """Per-host politeness delay from observed fetch latency + error rate.

    Rule (AIMD-flavored, all integer):

    - base = the host's ``pctl_num/pctl_den`` latency percentile
      (``percentile_disc``: the element at rank
      ``(n - 1) * num div den + 1`` under ``(latency, id)`` order — an
      actual observed value, deterministic under ties),
    - delay = ``base * multiplier`` clamped to
      ``[min_delay_ms, max_delay_ms]``,
    - error backoff: hosts with >= 25% errors quadruple the delay, >= 10%
      double it (integer cross-multiplication, no float rates), clamped
      again at ``max_delay_ms``.

    Returns ``(host, n_fetches, n_errors, base_ms, delay_ms)`` — feed to
    :func:`adaptive_host_budgets` or join onto the robots table's
    ``crawl_delay`` column (taking the max of declared and adapted).
    """
    ranked = fetch_log.select(
        F.col(host_col).alias("host"),
        F.col(latency_ms_col).cast("long").alias("lat"),
        F.col(error_col).cast("boolean").alias("err"),
        F.col(id_col).alias("fid"),
    ).withColumn("rn", F.row_number().over(Window.partitionBy("host").orderBy("lat", "fid")))
    stats = ranked.groupBy("host").agg(
        F.count("*").alias("n_fetches"),
        F.sum(F.expr("CASE WHEN err THEN 1 ELSE 0 END")).alias("n_errors"),
    )
    base = (
        ranked.join(stats, "host")
        .filter(
            F.col("rn")
            == F.expr(f"(n_fetches - 1) * {int(pctl_num)} div {int(pctl_den)} + 1")
        )
        .select("host", F.col("lat").alias("base_ms"))
    )
    return (
        stats.join(base, "host")
        .withColumn(
            "delay_ms",
            F.expr(
                f"least(greatest(base_ms * {int(multiplier)}, "
                f"{int(min_delay_ms)}L), {int(max_delay_ms)}L)"
            ),
        )
        .withColumn(
            "delay_ms",
            F.expr(
                f"least(CASE WHEN n_errors * 4 >= n_fetches THEN delay_ms * 4 "
                f"WHEN n_errors * 10 >= n_fetches THEN delay_ms * 2 "
                f"ELSE delay_ms END, {int(max_delay_ms)}L)"
            ),
        )
        .select("host", "n_fetches", "n_errors", "base_ms", "delay_ms")
    )


def adaptive_host_budgets(
    delays: DataFrame, wave_target_sec: int = 60
) -> DataFrame:
    """Translate adapted delays into per-wave fetch budgets — the same
    arithmetic the robots crawl_delay seam uses (`bfs.py`: a wave models
    ``wave_target_sec`` seconds of polite fetching), so the output joins
    straight into the budget column: ``budget = max(wave_ms div delay, 1)``
    (every live host gets at least one slot — deferred, never starved).
    """
    return delays.select(
        "host",
        F.expr(
            f"greatest({int(wave_target_sec) * 1000} div delay_ms, 1L)"
        ).alias("budget"),
    )


def apportion_budget(
    host_scores: DataFrame,
    total_budget: int,
    floor: int = 0,
    host_col: str = "host",
    score_col: str = "score",
) -> DataFrame:
    """Exact largest-remainder apportionment of an integral wave budget
    across hosts proportional to a non-negative signal (PageRank / OPIC /
    reputation / any ``blend_host_signals`` output).

    Every host first receives ``floor`` slots (no host starves — the
    deferred-not-dropped philosophy of the politeness layer), then the
    remaining ``total_budget - floor * n_hosts`` slots are split
    proportionally: ``base = R * s div T`` plus one extra slot to the
    hosts with the largest remainders (``R * s mod T``, ties by host), so
    the result sums to ``total_budget`` EXACTLY — integer arithmetic
    end-to-end, no float shares that drift at 10^8 hosts. Raises
    ``ValueError`` when ``total_budget < floor * n_hosts`` (silently
    violating the exact-sum contract would be worse); a corpus of
    all-zero scores splits the remainder equally, ties by host order.

    Overflow envelope: the per-host product ``R * score_q`` must fit
    BIGINT. The driver knows ``max(score_q)`` from the same 1-row
    aggregate that checks the precondition, and when ``R * max_q``
    approaches 2^63 every score is pre-divided by a single integer
    ``k`` (deterministic, same k everywhere — proportions shift by at
    most one part in ``max_q/k``, the exact-sum property is untouched
    because base/rem/leftover are recomputed from the rescaled total).
    Without this, a 10^12-char source scored as char-mass with a 10^6
    budget would wrap silently under non-ANSI arithmetic.

    Returns ``(host, score_q, budget)`` (``score_q`` is the UNSCALED
    fixed-point score).

    Scale shape: scores quantize row-locally; one 1-row scalar collect
    (the frontier's decide-from-a-count pattern) for the precondition /
    rescale decision; one host-table window for the remainder rank. The
    host table is the ONLY thing shuffled.
    """
    q = host_scores.select(
        F.col(host_col).alias("host"),
        F.expr(f"cast(round({score_col} * {_Q}) as bigint)").alias("score_q"),
    )
    trow = q.agg(
        F.sum("score_q").alias("t"),
        F.count("*").alias("n"),
        F.max("score_q").alias("mx"),
    ).collect()[0]
    n = int(trow["n"] or 0)
    t = int(trow["t"] or 0)
    mx = int(trow["mx"] or 0)
    if total_budget < floor * n:
        raise ValueError(
            f"total_budget={total_budget} cannot cover floor={floor} "
            f"for {n} hosts (needs >= {floor * n})"
        )
    r = int(total_budget) - int(floor) * n
    # rescale so r * max(score_q2) stays below 2^62 (Python ints are
    # arbitrary precision, so k itself is computed exactly)
    k = (mx * r) // (1 << 62) + 1 if (t > 0 and r > 0) else 1
    if k > 1:
        q = q.withColumn("score_q2", F.expr(f"score_q div {k}"))
        t2 = int(
            q.agg(F.sum("score_q2")).collect()[0][0] or 0
        )
    else:
        q = q.withColumn("score_q2", F.col("score_q"))
        t2 = t
    # t2 == 0 (every score zero, or all rescaled to zero) falls back to
    # an equal split — the largest-remainder invariant (leftover < n)
    # only holds when t2 > 0
    if t2 > 0:
        base_e = f"{r} * score_q2 div {t2}"
        rem_e = f"{r} * score_q2 % {t2}"
    else:
        base_e = f"{r} div {max(n, 1)}"
        rem_e = "0L"
    j = q.withColumn("base", F.expr(base_e)).withColumn("rem", F.expr(rem_e))
    w = Window.orderBy(F.desc("rem"), "host")
    # leftover = r - sum(base); the window rank hands out one extra slot
    # to the largest remainders. sum(base) is a 1-row aggregate — never a
    # driver collect of hosts. The remainder rank is the one GLOBAL
    # window here (single reducer over the host table); if the host
    # table itself outgrows a reducer, swap in the two-level distributed
    # prefix sum from sinks/shards.py — the rank only needs to be exact
    # around the leftover cutoff.
    left = j.agg((F.lit(r) - F.sum("base")).alias("leftover"))
    return (
        j.crossJoin(F.broadcast(left))
        .withColumn("rk", F.row_number().over(w))
        .select(
            "host",
            "score_q",
            (
                F.lit(int(floor))
                + F.col("base")
                + F.expr("CASE WHEN rk <= leftover THEN 1 ELSE 0 END")
            ).cast("long").alias("budget"),
        )
    )
