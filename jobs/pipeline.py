"""spark-submit entry point: crawl -> training set, one command.

On a cluster:

    zip -r engine.zip crawler_spark
    spark-submit --py-files engine.zip jobs/pipeline.py \
        --corpus s3://bucket/pages/ --seeds https://example.com/ \
        --depth 2 --budget '*=200' --run-dir s3://bucket/runs/p1 \
        --token-budget 1000000 --min-quality 0.3 --langs en \
        [--eval s3://bucket/evaldocs/]   # benchmark decontamination
        [--seq-len 2048]                 # block-packed sequence bins
        [--main-content]                 # train on boilerpipe main_text
        --output s3://bucket/training/

Locally: ``python jobs/pipeline.py --corpus ... --seeds ... --run-dir ...
--token-budget ... --output ...``. Prints one JSON line of funnel counts.
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


def main() -> None:
    p = argparse.ArgumentParser(description="crawl -> training set")
    p.add_argument("--corpus", required=True)
    p.add_argument("--seeds", nargs="+", required=True)
    p.add_argument("--run-dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--token-budget", type=int, required=True)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--max-pages", type=int, default=None)
    p.add_argument("--budget", default=None,
                   help="per-host politeness, e.g. '*=200' or 'h1=5,h2=9'")
    p.add_argument("--min-quality", type=float, default=0.3)
    p.add_argument("--langs", nargs="+", default=None,
                   help="language allowlist; omit to disable the gate")
    p.add_argument("--eval", dest="eval_path", default=None,
                   help="documents-shaped parquet to decontaminate against")
    p.add_argument("--seq-len", type=int, default=None)
    p.add_argument("--main-content", action="store_true",
                   help="extract boilerpipe main_text during the crawl and "
                        "train on it instead of the structured markdown")
    args = p.parse_args()

    from pyspark.sql import functions as F

    from crawler_spark.frontier.bfs import CrawlConfig
    from crawler_spark.pipeline import crawl_to_training_set
    from crawler_spark.session import build_session

    host_budget = {}
    if args.budget:
        for part in args.budget.split(","):
            h, _, b = part.partition("=")
            host_budget[h.strip()] = int(b)

    spark = build_session(app_name="crawler_spark_pipeline")
    corpus = spark.read.parquet(args.corpus)
    eval_docs = (
        spark.read.parquet(args.eval_path) if args.eval_path else None
    )
    out = crawl_to_training_set(
        spark,
        corpus,
        args.seeds,
        CrawlConfig(
            depth=args.depth, max_pages=args.max_pages,
            host_budget=host_budget,
            extract_main_content=args.main_content,
        ),
        run_dir=args.run_dir,
        token_budget=args.token_budget,
        eval_docs=eval_docs,
        min_quality=args.min_quality,
        langs=tuple(args.langs) if args.langs else None,
        seq_len=args.seq_len,
        text_source="main_text" if args.main_content else "markdown",
    )
    out.write.mode("overwrite").parquet(args.output)
    done = spark.read.parquet(args.output)
    row = done.select(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.countDistinct("source").alias("sources"),
    ).collect()[0]
    print(json.dumps({
        "docs": int(row["docs"]),
        "tokens": int(row["tokens"] or 0),
        "sources": int(row["sources"]),
        "token_budget": args.token_budget,
        "output": args.output,
    }))


if __name__ == "__main__":
    main()
