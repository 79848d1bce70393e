"""spark-submit entry point for the crawl engine (north_rule execution mode).

On a cluster:

    zip -r engine.zip crawler_spark
    spark-submit --py-files engine.zip jobs/crawl.py \
        --corpus s3://bucket/pages/ \
        --seeds https://example.com/ https://example.org/ \
        --depth 3 --max-pages 1000000 \
        --budget '*=200' --budget 'hot.example.com=50' \
        --robots s3://bucket/robots/ \
        --run-dir s3://bucket/runs/crawl-001 [--resume]

Locally (this sandbox): ``spark-submit jobs/crawl.py --corpus ... `` or plain
``python jobs/crawl.py ...`` (builds a local session).

The job is idempotent per run-dir: re-submitting with ``--resume`` continues
from the last committed wave without re-fetching seen URLs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
# Python UDF workers import the package too: local runs from any cwd need
# the repo on the workers' PYTHONPATH (clusters ship it via --py-files)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def parse_budget(items):
    out = {}
    for item in items or []:
        host, _, n = item.partition("=")
        out[host] = int(n)
    return out


def main() -> None:
    p = argparse.ArgumentParser(description="Distributed BFS crawl over a pages corpus")
    p.add_argument("--corpus", required=True, help="parquet/iceberg path of pages(url, warc_ts, html, ...)")
    p.add_argument("--seeds", nargs="+", required=True)
    p.add_argument("--depth", type=int, default=1)
    p.add_argument("--max-pages", type=int, default=None)
    p.add_argument("--instructions", default=None)
    p.add_argument("--follow-external-links", action="store_true")
    p.add_argument("--budget-table", default=None,
                   help="parquet of (host, budget) per-wave budgets — e.g. "
                        "jobs/plan.py output; composed with --budget via min")
    p.add_argument("--budget", action="append", default=[],
                   help="host=N per-wave fetch budget; '*'=default. Repeatable.")
    p.add_argument("--politeness-salt", type=int, default=1)
    p.add_argument("--robots", default=None,
                   help="parquet path of robots(host, disallow_prefixes, crawl_delay)")
    p.add_argument("--wave-target-sec", type=float, default=60.0,
                   help="seconds of polite fetching a wave models: a host with "
                        "robots crawl_delay=d gets per-wave budget "
                        "max(1, floor(wave_target_sec/d)); 0 disables")
    p.add_argument("--run-dir", required=True)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--no-bloom", action="store_true")
    p.add_argument("--host-histogram-topk", type=int, default=20,
                   help="record top-K per-host counts per wave manifest; 0 disables")
    p.add_argument("--redirects", default=None,
                   help="parquet of (url, redirect_to) edges: chains are "
                        "resolved (frontier/redirects.py) and candidate "
                        "urls rewrite to their terminals before dedup")
    p.add_argument("--redirect-max-hops", type=int, default=32)
    p.add_argument("--main-content", action="store_true",
                   help="also emit the boilerpipe main_text column "
                        "(computed on the crawl's one parse)")
    p.add_argument("--seen-exact-urls", action="store_true",
                   help="key the seen anti-join by url string (collision-free) "
                        "instead of xxhash64 (default accepts ~2.7 expected "
                        "collisions at 10^10 urls for an 8-byte key)")
    p.add_argument("--vacuum", action="store_true",
                   help="after the crawl commits, reclaim superseded "
                        "frontier/bloom waves + crash litter from the run "
                        "dir (WaveCommit.vacuum; seen/pages untouched)")
    p.add_argument("--rag-out", default=None,
                   help="optional parquet path to materialize rag_documents after the crawl")
    p.add_argument("--export-markdown", default=None,
                   help="optional path for the S4 markdown report")
    p.add_argument("--export-json", default=None,
                   help="optional directory for the JSON export (one object per page)")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from crawler_spark.frontier.bfs import CrawlConfig, crawl

    # under spark-submit the session/master comes from the submit command;
    # standalone python falls back to the local builder
    spark = SparkSession.getActiveSession()
    if spark is None:
        try:
            spark = SparkSession.builder.getOrCreate()
        except Exception:
            from crawler_spark.session import build_session

            spark = build_session()

    corpus = spark.read.parquet(args.corpus)
    robots = spark.read.parquet(args.robots) if args.robots else None
    cfg = CrawlConfig(
        instructions=args.instructions,
        depth=args.depth,
        follow_external_links=args.follow_external_links,
        max_pages=args.max_pages,
        host_budget=parse_budget(args.budget),
        politeness_salt=args.politeness_salt,
        use_bloom=not args.no_bloom,
        host_histogram_topk=args.host_histogram_topk,
        wave_target_sec=args.wave_target_sec or None,
        seen_exact_urls=args.seen_exact_urls,
        extract_main_content=args.main_content,
    )
    if args.budget_table:
        cfg.host_budget_df = spark.read.parquet(args.budget_table)
    if args.redirects:
        from crawler_spark.frontier.redirects import (
            redirect_url_rewriter,
            resolve_redirects,
        )

        cfg.url_rewriter = redirect_url_rewriter(
            resolve_redirects(
                spark.read.parquet(args.redirects),
                max_hops=args.redirect_max_hops,
            ).localCheckpoint(eager=False)
        )
    res = crawl(
        spark, corpus, args.seeds, cfg,
        robots=robots, run_dir=args.run_dir, resume=args.resume,
    )

    if args.vacuum:
        deleted = res.commit.vacuum()
        print(json.dumps({"vacuum": {k: len(v) for k, v in deleted.items()}}))

    if args.rag_out:
        from crawler_spark.sinks.rag import build_rag_documents

        build_rag_documents(res.pages(spark)).write.mode("overwrite").parquet(
            args.rag_out
        )

    if args.export_markdown:
        from crawler_spark.sinks.export import export_to_markdown

        export_to_markdown(
            res.pages(spark), args.export_markdown,
            meta={
                "url": args.seeds[0],
                "instructions": args.instructions,
                "depth": args.depth,
                "pages_crawled": res.pages_crawled,
            },
        )

    if args.export_json:
        from crawler_spark.sinks.export import export_to_json

        export_to_json(res.pages(spark), args.export_json)

    print(json.dumps({
        "run_dir": res.run_dir,
        "waves": res.waves,
        "pages_crawled": res.pages_crawled,
        "last_manifest": res.metrics()[-1]["counters"] if res.waves else {},
    }, default=str))


if __name__ == "__main__":
    main()
