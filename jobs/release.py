"""spark-submit entry point: pages table -> a full Common-Crawl-style release.

One submit produces the artifact set CC publishes per crawl, each via a
distributed sink (one task writes one shard; the driver never sees a body):

    out/warc/        response (+ optional revisit) shards  [write_warc_shards]
    out/cdxj/        sorted CDX-J index of the WARC        [build_cdxj]
    out/extracted/   extraction frame parquet              [extract_pages]
    out/wet/         extracted-text conversion records     [write_wet]
    out/wat/         title/outlink metadata records        [write_wat]
    out/manifest.json  artifact paths + counts (also printed as one JSON line)

With ``--dedup-payloads`` the WARC stores each distinct body once and later
identical captures as ~300-byte revisit pointers (identical-payload-digest
profile) — the recrawl-archive storage win; readers recover the full stream
via ``read_warc_resolved``. The CDX-J indexes revisits as ``warc/revisit``.

On a cluster:

    zip -r engine.zip crawler_spark
    spark-submit --py-files engine.zip jobs/release.py \
        --pages s3a://bucket/pages/ --out s3a://bucket/release/CC-2025-01/ \
        [--shards 512] [--dedup-payloads] [--plain]

Locally: ``python jobs/release.py --pages pages.parquet --out /tmp/rel``.

Scale shape: everything downstream of the pages scan is one
``repartitionByRange(url)`` (stable shard layout) reused by every sink;
``--dedup-payloads`` adds exactly one extra exchange (the payload-digest
window). Counts come from the sinks' own index frames — no second scan of
what was just written.
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
    p = argparse.ArgumentParser(
        description="pages parquet -> WARC/CDX-J/WET/WAT release"
    )
    p.add_argument("--pages", required=True,
                   help="pages parquet: url, warc_ts, html "
                        "(+ optional http_status, mime, charset)")
    p.add_argument("--out", required=True, help="release directory")
    p.add_argument("--shards", type=int, default=None,
                   help="shard count for every artifact "
                        "(default: defaultParallelism)")
    p.add_argument("--dedup-payloads", action="store_true",
                   help="store each distinct body once; later identical "
                        "captures become revisit records")
    p.add_argument("--plain", action="store_true",
                   help="uncompressed .warc/.wet/.wat (default gzip "
                        "member-per-record)")
    args = p.parse_args()

    from pyspark.sql import functions as F

    from crawler_spark.session import build_session
    from crawler_spark.sources.cdxj import build_cdxj, write_cdxj
    from crawler_spark.sources.warc import write_warc_shards
    from crawler_spark.sources.wet import (
        pages_to_wet_frame,
        write_wat,
        write_wet,
    )

    spark = build_session(app_name="release")
    compress = not args.plain
    shards = args.shards or spark.sparkContext.defaultParallelism
    pages = (
        spark.read.parquet(args.pages)
        .repartitionByRange(shards, "url", "warc_ts")
    )

    out = {"out": args.out}

    # WARC + CDX-J: the sink's index IS the CDX input — no join back
    warc_dir = os.path.join(args.out, "warc")
    idx = write_warc_shards(
        pages, warc_dir, compress=compress,
        dedup_payloads=args.dedup_payloads,
    ).cache()
    out["warc"] = warc_dir
    out["n_records"] = idx.count()  # materializes the shard writes
    out["n_revisits"] = idx.filter(F.col("mime") == "warc/revisit").count()
    cdxj_dir = os.path.join(args.out, "cdxj")
    write_cdxj(build_cdxj(idx), cdxj_dir, shards=shards)
    out["cdxj"] = cdxj_dir
    idx.unpersist()

    # extraction frame (newest capture per url — the corpus view WET/WAT
    # derive from; with dedup the pages frame still carries every body)
    from pyspark.sql import Window

    from crawler_spark.operators.extract import extract_pages

    current = pages
    if "http_status" in current.columns:
        current = current.filter(
            (F.col("http_status") >= 200) & (F.col("http_status") < 300)
        )
    w = Window.partitionBy("url").orderBy(
        F.desc("warc_ts"), F.desc(F.xxhash64("html"))
    )
    current = (
        current.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    ext_dir = os.path.join(args.out, "extracted")
    ext_cols = ["url", "html", "warc_ts"] + (
        ["charset"] if "charset" in current.columns else []
    )
    extract_pages(current.select(*ext_cols), carry=False).write.mode(
        "overwrite"
    ).parquet(ext_dir)
    ext = spark.read.parquet(ext_dir)
    out["extracted"] = ext_dir
    out["n_extracted"] = ext.count()

    wet_dir = os.path.join(args.out, "wet")
    out["n_wet"] = write_wet(
        pages_to_wet_frame(ext).repartitionByRange(shards, "url"),
        wet_dir, compress=compress,
    ).count()
    out["wet"] = wet_dir

    wat_dir = os.path.join(args.out, "wat")
    wat_in = ext.join(
        current.select(
            "url", F.length("html").cast("bigint").alias("n_bytes")
        ),
        "url",
    ).select(
        "url",
        F.col("timestamp").cast("timestamp").alias("warc_ts"),
        "title", "links", "n_bytes",
    )
    out["n_wat"] = write_wat(
        wat_in.repartitionByRange(shards, "url"), wat_dir, compress=compress,
    ).count()
    out["wat"] = wat_dir

    blob = json.dumps(out, sort_keys=True)
    from crawler_spark.frontier.fs import run_fs

    fs = run_fs(args.out)
    fs.makedirs(args.out)
    fs.write_text_atomic(os.path.join(args.out, "manifest.json"), blob)
    print(blob)


if __name__ == "__main__":
    main()
