"""spark-submit entry point: table layout maintenance (cluster / compact).

Two subcommands over a parquet table directory:

    cluster   rewrite curve-clustered so multi-predicate scans prune
              files on every listed dimension
              (sinks/layout.write_zordered: Morton any-D, Hilbert 2-D)
    compact   rewrite many small files into ~target-size ones
              (sinks/compact: metadata-planned, one-shuffle rewrite)

On a cluster:

    zip -r engine.zip crawler_spark
    spark-submit --py-files engine.zip jobs/layout.py cluster \
        --input s3a://bucket/pages/ --out s3a://bucket/pages_z/ \
        --dims "host:pmod(xxhash64(url), 1024)" --dims "len:length(text)" \
        [--bits 6] [--curve hilbert] [--n-files 4096]

    spark-submit --py-files engine.zip jobs/layout.py compact \
        --input s3a://bucket/pages/ --out s3a://bucket/pages_c/ \
        --target-mb 512 [--small-only-mb 384]

Locally: ``python jobs/layout.py cluster --input in.parquet --out /tmp/z
--dims "len:n_chars" --dims "host:pmod(doc_id, 64)"``. Each dim is
``name:sql_expr`` (numeric expr). Prints one JSON summary line.
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
    p = argparse.ArgumentParser(description="table layout maintenance")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("cluster", help="curve-clustered rewrite")
    c.add_argument("--input", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--dims", action="append", required=True,
                   metavar="NAME:EXPR",
                   help="numeric dimension as name:sql_expr (repeatable)")
    c.add_argument("--bits", type=int, default=6)
    c.add_argument("--curve", choices=["morton", "hilbert"],
                   default="morton")
    c.add_argument("--n-files", type=int, default=64)

    k = sub.add_parser("compact", help="small-file compaction rewrite")
    k.add_argument("--input", required=True)
    k.add_argument("--out", required=True)
    k.add_argument("--target-mb", type=float, required=True)
    k.add_argument("--small-only-mb", type=float, default=None,
                   help="leave files at/above this size untouched")

    args = p.parse_args()

    from pyspark.sql import functions as F

    from crawler_spark.session import build_session

    spark = build_session(app_name=f"crawler_spark_layout_{args.cmd}")
    if args.cmd == "cluster":
        from crawler_spark.sinks.layout import write_zordered

        dims = []
        for d in args.dims:
            name, _, expr = d.partition(":")
            if not expr:
                p.error(f"--dims wants name:sql_expr, got {d!r}")
            dims.append((name, expr))
        df = spark.read.parquet(args.input)
        th = write_zordered(
            df, args.out, dims, bits=args.bits, n_files=args.n_files,
            curve=args.curve,
        )
        out = {
            "cmd": "cluster",
            "curve": args.curve,
            "rows": spark.read.parquet(args.out).count(),
            "dims": [n for n, _ in dims],
            "thresholds_per_dim": (1 << args.bits) - 1,
            "out": args.out,
        }
    else:
        from crawler_spark.sinks.compact import compact_parquet, file_stats

        plan = compact_parquet(
            spark,
            args.input,
            args.out,
            target_bytes=int(args.target_mb * 1024 * 1024),
            small_only_below=(
                int(args.small_only_mb * 1024 * 1024)
                if args.small_only_mb is not None
                else None
            ),
        )
        n_in, n_pass = plan.count(), plan.where("bin = -1").count()
        out = {
            "cmd": "compact",
            "files_in": int(n_in),
            "files_passthrough": int(n_pass),
            "files_out": int(file_stats(spark, args.out).count()),
            "out": args.out,
        }
    print(json.dumps(out))
    # no spark.stop(): the session is shared when driven from tests
    # (jobs/release.py precedent); process exit reclaims it in CLI use


if __name__ == "__main__":
    main()
