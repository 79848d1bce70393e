"""spark-submit entry point: one-command corpus release.

Composes the full release lifecycle — crawl -> curate -> assemble ->
token-balanced shards -> per-source stats -> data card -> Z-order layout
— into one submit that emits a complete, manifest-committed release
directory (``release.json`` is written last, atomically: its existence
marks a finished release).

On a cluster:

    zip -r engine.zip crawler_spark
    spark-submit --py-files engine.zip jobs/corpus_release.py \
        --corpus s3://bucket/pages/ --seeds https://example.com/ \
        --run-dir s3://bucket/runs/r1 --out s3://bucket/release-v1 \
        --token-budget 1000000000 --tokens-per-shard 100000000 \
        [--depth 2] [--budget '*=200'] [--min-quality 0.3] [--langs en] \
        [--eval s3://bucket/evaldocs/] [--format parquet|json] \
        [--name my-corpus-v1]

Locally: ``python jobs/corpus_release.py --corpus ... --seeds ...
--run-dir ... --out ... --token-budget ... --tokens-per-shard ...``.
Prints the release manifest as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    p = argparse.ArgumentParser(description="one-command corpus release")
    p.add_argument("--corpus", required=True)
    p.add_argument("--seeds", nargs="+", required=True)
    p.add_argument("--run-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--token-budget", type=int, required=True)
    p.add_argument("--tokens-per-shard", type=int, required=True)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--max-pages", type=int, default=None)
    p.add_argument("--budget", default=None,
                   help="per-host politeness, e.g. '*=200' or 'h1=5,h2=9'")
    p.add_argument("--min-quality", type=float, default=0.3)
    p.add_argument("--langs", nargs="+", default=None)
    p.add_argument("--eval", dest="eval_path", default=None)
    p.add_argument("--format", dest="shard_format", default="parquet",
                   choices=("parquet", "json"))
    p.add_argument("--name", default="corpus")
    p.add_argument("--main-content", action="store_true")
    args = p.parse_args()

    from crawler_spark.frontier.bfs import CrawlConfig
    from crawler_spark.pipeline import corpus_release
    from crawler_spark.session import build_session

    host_budget = {}
    if args.budget:
        for part in args.budget.split(","):
            h, _, b = part.partition("=")
            host_budget[h.strip()] = int(b)

    spark = build_session(app_name="crawler_spark_release")
    release = corpus_release(
        spark,
        spark.read.parquet(args.corpus),
        args.seeds,
        CrawlConfig(
            depth=args.depth, max_pages=args.max_pages,
            host_budget=host_budget,
            extract_main_content=args.main_content,
        ),
        run_dir=args.run_dir,
        out_dir=args.out,
        token_budget=args.token_budget,
        tokens_per_shard=args.tokens_per_shard,
        eval_docs=(spark.read.parquet(args.eval_path)
                   if args.eval_path else None),
        min_quality=args.min_quality,
        langs=tuple(args.langs) if args.langs else None,
        shard_format=args.shard_format,
        name=args.name,
        text_source="main_text" if args.main_content else "markdown",
    )
    print(json.dumps({**release, "output": args.out}))


if __name__ == "__main__":
    main()
