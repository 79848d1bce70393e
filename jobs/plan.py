"""spark-submit CLI: plan the next crawl wave's per-host budgets from
feedback and importance signals (frontier/adaptive.py), writing the
(host, budget) parquet that ``jobs/crawl.py --budget-table`` consumes.

Two composable inputs:

- ``--fetch-log`` parquet of (host, latency_ms, is_error, fetch_id):
  adaptive politeness — per-host delays from observed latency/errors,
  translated into per-wave budget CAPS (``adaptive_host_budgets``).
- ``--signals`` parquet of (host, score): importance apportionment —
  an integral total budget split exactly proportional to the signal
  (``apportion_budget``; PageRank / OPIC / reputation / any
  ``blend_host_signals`` output from jobs/rank.py).

With both, the plan is ``min(politeness cap, importance share)`` per
host — never fetch a host faster than it tolerates, never spend more of
the wave on it than its importance earns. Hosts present in only one
input keep that input's number (a politeness cap with no signal row, or
a share for a not-yet-measured host).

Usage:
  spark-submit --py-files crawler_spark.zip jobs/plan.py \
      --fetch-log runs/fetchlog.parquet --signals runs/host_rank.parquet \
      --total-budget 1000000 --floor 1 --wave-target-sec 60 \
      --out runs/budgets.parquet

Everything is deterministic (percentile_disc + integer backoff tiers;
largest-remainder integer apportionment) — replanning from the same
inputs writes the same table.
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F


def main() -> None:
    p = argparse.ArgumentParser(
        description="Plan per-host wave budgets from fetch feedback and "
        "importance signals"
    )
    p.add_argument("--fetch-log", default=None,
                   help="parquet (host, latency_ms, is_error, fetch_id)")
    p.add_argument("--signals", default=None,
                   help="parquet (host, score) importance signal")
    p.add_argument("--total-budget", type=int, default=None,
                   help="wave total for apportionment (required with "
                        "--signals)")
    p.add_argument("--floor", type=int, default=1,
                   help="minimum slots per signal host (default 1)")
    p.add_argument("--wave-target-sec", type=int, default=60)
    p.add_argument("--pctl", default="1/2",
                   help="latency percentile as num/den (default median)")
    p.add_argument("--out", required=True)
    args = p.parse_args()
    if args.fetch_log is None and args.signals is None:
        p.error("need --fetch-log and/or --signals")
    if args.signals is not None and args.total_budget is None:
        p.error("--signals requires --total-budget")

    from crawler_spark.frontier.adaptive import (
        adaptive_crawl_delay,
        adaptive_host_budgets,
        apportion_budget,
    )
    from crawler_spark.session import build_session

    spark = build_session(app_name="plan_budgets")

    caps = shares = None
    if args.fetch_log:
        num, den = (int(x) for x in args.pctl.split("/"))
        caps = adaptive_host_budgets(
            adaptive_crawl_delay(
                spark.read.parquet(args.fetch_log),
                pctl_num=num, pctl_den=den,
            ),
            wave_target_sec=args.wave_target_sec,
        ).withColumnRenamed("budget", "_cap")
    if args.signals:
        shares = apportion_budget(
            spark.read.parquet(args.signals),
            total_budget=args.total_budget,
            floor=args.floor,
        ).select("host", F.col("budget").alias("_share"))

    if caps is not None and shares is not None:
        plan = caps.join(shares, "host", "full_outer").select(
            "host",
            F.coalesce(
                F.least("_cap", "_share"), F.col("_cap"), F.col("_share")
            ).cast("int").alias("budget"),
        )
    else:
        only = caps if caps is not None else shares
        plan = only.select(
            "host", F.col(only.columns[1]).cast("int").alias("budget")
        )

    plan.write.mode("overwrite").parquet(args.out)
    n = plan.count()
    tot = plan.agg(F.sum("budget")).collect()[0][0]
    # no spark.stop(): spark-submit tears the session down on exit, and
    # the other jobs/ CLIs share this convention (it also lets the pytest
    # e2e drive main() on the suite's module session)
    print(f"wrote {n} host budgets (sum={tot}) to {args.out}")


if __name__ == "__main__":
    main()
