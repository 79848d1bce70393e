"""spark-submit entry point for the training-data curation pipeline.

On a cluster:

    zip -r engine.zip crawler_spark
    spark-submit --py-files engine.zip jobs/curate.py \
        --input s3://bucket/documents/ \
        --output s3://bucket/curated/ \
        --min-quality 0.5 --langs en es \
        [--text-col text --id-col doc_id] \
        [--partition-by lang_pred]

Locally: ``python jobs/curate.py --input ... --output ...``.

Runs the composed quality -> language -> exact-dedup dataflow
(crawler_spark.operators.curation) in one job — a single scan, a single
content-hash shuffle — writes the surviving rows, and prints the per-stage
funnel counters as one JSON line (the monitoring signal).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description="Quality/language/dedup curation")
    p.add_argument("--input", required=True, help="parquet path of documents(id, text, ...)")
    p.add_argument("--output", required=True, help="parquet path for curated rows")
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--langs", nargs="+", default=["en"])
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--partition-by", default=None,
                   help="optional output partition column (e.g. lang_pred)")
    args = p.parse_args()

    from crawler_spark.operators.curation import curate, curation_stats
    from crawler_spark.session import build_session

    spark = build_session(app_name="crawler_spark_curate")
    docs = spark.read.parquet(args.input)
    curated = curate(
        docs,
        min_quality=args.min_quality,
        langs=tuple(args.langs),
        text_col=args.text_col,
        id_col=args.id_col,
    )
    writer = curated.write.mode("overwrite")
    if args.partition_by:
        writer = writer.partitionBy(args.partition_by)
    writer.parquet(args.output)

    row = curation_stats(
        docs,
        min_quality=args.min_quality,
        langs=tuple(args.langs),
        text_col=args.text_col,
        id_col=args.id_col,
    ).collect()[0]
    print(json.dumps({
        "n_input": row["n_input"],
        "n_quality": row["n_quality"],
        "n_lang": row["n_lang"],
        "n_deduped": row["n_deduped"],
        "output": args.output,
    }))


if __name__ == "__main__":
    main()
