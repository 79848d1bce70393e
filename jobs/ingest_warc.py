"""spark-submit entry point: WARC shards -> the canonical pages table.

The 100 TB input path: Common-Crawl-style archives land as ``*.warc.gz``
shards; this job parses them (sources/warc.py), dedups repeated fetches
(newest wins), optionally filters crawl traps, and writes the
``pages(url, warc_ts, html)`` parquet every other job consumes. With
``--extract`` it also writes the extracted page records (title/markdown/
links) next to it — WARC in, training-ready text out, one submit.

On a cluster:

    zip -r engine.zip crawler_spark
    spark-submit --py-files engine.zip jobs/ingest_warc.py \
        --input 's3a://bucket/cc/segments/*/warc/*.warc.gz' \
        --output s3a://bucket/pages/ \
        [--index s3a://bucket/cdx/]   # CDX parquet (path, offset, length):
                                      # record-range reads, record-granular
                                      # parallelism for sparse slices
        [--extract s3a://bucket/extracted/] [--drop-traps] [--strict]

Locally: ``python jobs/ingest_warc.py --input 'shards/*.warc.gz' ...``.
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
    p = argparse.ArgumentParser(description="Ingest WARC shards into the pages table")
    p.add_argument("--input", required=True,
                   help="glob of .warc/.warc.gz files (whole-file scan)")
    p.add_argument("--index", default=None, metavar="PATH",
                   help="CDX-style parquet (path, offset, length): read only "
                        "the indexed record byte-ranges instead of whole files")
    p.add_argument("--output", required=True, help="pages parquet destination")
    p.add_argument("--extract", default=None, metavar="PATH",
                   help="also write extracted page records (title, markdown, "
                        "links) to this path")
    p.add_argument("--drop-traps", action="store_true",
                   help="apply frontier.traps structural flags + skeleton-"
                        "explosion gate before writing")
    p.add_argument("--trap-min-urls", type=int, default=1000)
    p.add_argument("--strict", action="store_true",
                   help="fail on malformed WARC framing instead of skipping")
    p.add_argument("--partitions", type=int, default=None,
                   help="repartition width for indexed reads")
    args = p.parse_args()

    from crawler_spark.session import build_session
    from crawler_spark.sources.warc import (
        read_warc,
        read_warc_indexed,
        warc_to_pages,
    )

    spark = build_session(app_name="ingest_warc")
    if args.index:
        idx = spark.read.parquet(args.index)
        raw = read_warc_indexed(spark, idx, strict=args.strict,
                                partitions=args.partitions)
    else:
        raw = read_warc(spark, args.input, strict=args.strict)
    pages = warc_to_pages(raw)

    if args.drop_traps:
        from crawler_spark.frontier.traps import filter_trapped, trap_skeletons

        traps = trap_skeletons(pages, min_urls=args.trap_min_urls)
        pages = filter_trapped(pages, traps)

    pages.write.mode("overwrite").parquet(args.output)
    out = {"output": args.output,
           "n_pages": spark.read.parquet(args.output).count()}

    if args.extract:
        from crawler_spark.operators.extract import extract_pages

        ext = extract_pages(
            spark.read.parquet(args.output).select("url", "html"),
            carry=False,
        )
        ext.write.mode("overwrite").parquet(args.extract)
        out["extracted"] = args.extract
        out["n_extracted"] = spark.read.parquet(args.extract).count()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
