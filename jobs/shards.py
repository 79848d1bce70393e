"""spark-submit entry point: curated documents -> trainer-ready shards.

Token-balances the corpus (`sinks/shards.token_balanced_shards` — the
two-level distributed prefix sum) and writes one of three trainer
hand-off formats plus the integrity manifest:

    --format parquet   {out}/shards/shard=N/  parquet  [write_shards]
    --format json      {out}/shards/shard=N/  JSONL    [write_shards]
    --format tar       {out}/shard-NNNNNN.tar          [write_tar_shards]
                       (WebDataset-style: deterministic USTAR blobs,
                       POSIX-visible target only — see sinks/tar.py)

On a cluster:

    zip -r engine.zip crawler_spark
    spark-submit --py-files engine.zip jobs/shards.py \
        --input s3a://bucket/curated/ --out s3a://bucket/shards/ \
        --tokens-per-shard 100000000 [--format parquet]

Locally: ``python jobs/shards.py --input docs.parquet --out /tmp/shards
--tokens-per-shard 50000``. Prints the manifest summary as one JSON line.
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
    p = argparse.ArgumentParser(description="token-balanced trainer shards")
    p.add_argument("--input", required=True, help="curated documents parquet")
    p.add_argument("--out", required=True, help="shard output directory")
    p.add_argument("--tokens-per-shard", type=int, required=True)
    p.add_argument("--format", choices=["parquet", "json", "tar"],
                   default="parquet")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--groups", type=int, default=64,
                   help="prefix-sum segment count (parallelism of the "
                        "balancing windows)")
    args = p.parse_args()

    from pyspark.sql import functions as F

    from crawler_spark.session import build_session
    from crawler_spark.sinks.shards import token_balanced_shards, write_shards
    from crawler_spark.sinks.tar import write_tar_shards

    spark = build_session(app_name="crawler_spark_shards")
    docs = spark.read.parquet(args.input)
    assigned = token_balanced_shards(
        docs,
        tokens_per_shard=args.tokens_per_shard,
        id_col=args.id_col,
        text_col=args.text_col,
        groups=args.groups,
    )
    if args.format == "tar":
        manifest = write_tar_shards(
            assigned, args.out, id_col=args.id_col, text_col=args.text_col
        )
        n_tokens = None
    else:
        manifest = write_shards(
            assigned, args.out, id_col=args.id_col, fmt=args.format
        )
        n_tokens = int(
            manifest.agg(F.sum("n_tokens")).first()[0] or 0
        )
    n_shards, n_docs = manifest.agg(
        F.count("*"), F.sum(F.col("n_members" if args.format == "tar" else "n_docs"))
    ).first()
    out = {
        "shards": int(n_shards),
        "docs": int(n_docs or 0),
        "format": args.format,
        "out": args.out,
    }
    if n_tokens is not None:
        out["tokens"] = n_tokens
    print(json.dumps(out))
    # no spark.stop(): the session is shared when driven from tests
    # (jobs/release.py precedent); process exit reclaims it in CLI use


if __name__ == "__main__":
    main()
