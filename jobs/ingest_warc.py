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
        [--cdxj s3a://bucket/cdxj/]   # CDX-J text shards instead of parquet;
                                      # [--host example.com] slices by SURT
                                      # prefix before a single WARC byte is
                                      # read
        [--extract s3a://bucket/extracted/] [--drop-traps] [--strict]
        [--main-content s3a://bucket/main/]  # boilerpipe main-text records
        [--write-cdxj PATH]           # sorted CDX-J index of the ingest
        [--write-wet PATH]            # WET derivative (needs --extract)
        [--write-wat PATH]            # WAT derivative (needs --extract)

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
    p.add_argument("--cdxj", default=None, metavar="PATH",
                   help="CDX-J text shards: drive record-range reads from "
                        "the archive's own index (alternative to --index)")
    p.add_argument("--host", default=None, metavar="HOST",
                   help="with --cdxj: SURT-prefix slice to this host/domain "
                        "(and subdomains) before any WARC bytes are read")
    p.add_argument("--write-cdxj", default=None, metavar="PATH",
                   help="write a sorted CDX-J index of the ingested pages")
    p.add_argument("--write-wet", default=None, metavar="PATH",
                   help="write the WET derivative (extracted text); "
                        "requires --extract")
    p.add_argument("--write-wat", default=None, metavar="PATH",
                   help="write the WAT derivative (title/links metadata); "
                        "requires --extract")
    p.add_argument("--main-content", default=None, metavar="PATH",
                   help="also write boilerpipe-style main-content records "
                        "(main_text + block stats, operators/maincontent.py) "
                        "— the structural boilerplate strip, next to the "
                        "reference-exact markdown of --extract")
    args = p.parse_args()
    if (args.write_wet or args.write_wat) and not args.extract:
        p.error("--write-wet/--write-wat require --extract")
    if args.write_cdxj and not args.write_wet:
        p.error("--write-cdxj indexes the WET archive this job writes; "
                "it requires --write-wet (an existing WARC's index is "
                "what --index/--cdxj consume, not what this job mints)")

    from crawler_spark.session import build_session
    from crawler_spark.sources.warc import (
        read_warc,
        read_warc_indexed,
        warc_to_pages,
    )

    spark = build_session(app_name="ingest_warc")
    if args.cdxj:
        from crawler_spark.sources.cdxj import (
            cdxj_to_index,
            host_slice,
            read_cdxj,
        )

        cdxj = read_cdxj(spark, args.cdxj, strict=args.strict)
        if args.host:
            cdxj = host_slice(cdxj, args.host)
        raw = read_warc_indexed(spark, cdxj_to_index(cdxj),
                                strict=args.strict,
                                partitions=args.partitions)
    elif args.index:
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

    if args.main_content:
        from crawler_spark.operators.maincontent import main_content

        pages_df = spark.read.parquet(args.output)
        # route the WARC transport charset through the same decode ladder
        # as --extract so both record families read the page identically
        mc = main_content(
            pages_df.select("url", "html", "charset"),
            charset_col="charset",
        ) if "charset" in pages_df.columns else main_content(
            pages_df.select("url", "html")
        )
        mc.write.mode("overwrite").parquet(args.main_content)
        out["main_content"] = args.main_content
        out["n_main_content"] = spark.read.parquet(args.main_content).count()

    if args.extract:
        from crawler_spark.operators.extract import extract_pages

        # warc_ts rides along so every record's timestamp (and the WET
        # records' WARC-Date) is the page's fetch time, not a blank;
        # charset routes non-UTF-8 pages through the decode ladder
        ext = extract_pages(
            spark.read.parquet(args.output).select(
                "url", "html", "warc_ts", "charset"
            ),
            carry=False,
        )
        ext.write.mode("overwrite").parquet(args.extract)
        out["extracted"] = args.extract
        out["n_extracted"] = spark.read.parquet(args.extract).count()

        from pyspark.sql import functions as F

        ext_df = spark.read.parquet(args.extract)
        shards = args.partitions or spark.sparkContext.defaultParallelism
        if args.write_wet:
            from crawler_spark.sources.wet import pages_to_wet_frame, write_wet

            wet_idx = write_wet(
                pages_to_wet_frame(ext_df).repartitionByRange(shards, "url"),
                args.write_wet,
            ).cache()
            out["wet"] = args.write_wet
            out["n_wet"] = wet_idx.count()  # materializes the shard writes
            if args.write_cdxj:
                from crawler_spark.sources.cdxj import build_cdxj, write_cdxj

                pages_ts = spark.read.parquet(args.output).select(
                    "url", "warc_ts"
                )
                write_cdxj(
                    build_cdxj(wet_idx.join(pages_ts, "url")),
                    args.write_cdxj,
                    shards=shards,
                )
                out["cdxj"] = args.write_cdxj
            wet_idx.unpersist()
        if args.write_wat:
            from crawler_spark.sources.wet import write_wat

            pages_df = spark.read.parquet(args.output)
            wat_in = ext_df.join(
                pages_df.select(
                    "url",
                    "warc_ts",
                    F.length("html").cast("bigint").alias("n_bytes"),
                ),
                "url",
            ).select("url", "warc_ts", "title", "links", "n_bytes")
            out["wat"] = args.write_wat
            out["n_wat"] = write_wat(
                wat_in.repartitionByRange(shards, "url"), args.write_wat
            ).count()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
