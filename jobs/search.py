"""spark-submit entry point for the retrieval surface: build a positional
inverted index once, then serve BM25 / exact-phrase queries against it.

On a cluster:

    zip -r engine.zip crawler_spark
    # build: postings + doc-length sidecar + term stats, partitioned for
    # term-pruned reads
    spark-submit --py-files engine.zip jobs/search.py build \
        --input s3://bucket/curated/ --index s3://bucket/index/

    # query: only the query terms' posting buckets are read back
    spark-submit --py-files engine.zip jobs/search.py bm25 \
        --index s3://bucket/index/ --query "spark shuffle" [--k 10]
    spark-submit --py-files engine.zip jobs/search.py phrase \
        --index s3://bucket/index/ --query "exact phrase here"

Locally: ``python jobs/search.py build --input ... --index ...``.

Index layout: ``{index}/postings/`` is bucketed by ``pmod(xxhash64(term),
n_buckets)`` partition directories, so a query reads only its terms'
buckets (partition pruning on the scan — the served-index access shape);
``{index}/doclen/`` is the doc-length sidecar ``bm25_search`` takes
precomputed; ``{index}/stats/`` is the (term, df, cf) summary. Each query
prints result rows as JSON lines plus one trailing stats line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")

N_BUCKETS = 64


def _bucket_col(F):
    return F.pmod(F.xxhash64("term"), F.lit(N_BUCKETS)).cast("int")


def _read_postings(spark, index_dir: str, terms):
    """Read only the buckets the query terms can live in — the partition
    filter prunes every other directory from the scan."""
    from pyspark.sql import functions as F

    buckets = sorted(
        {hash_bucket for hash_bucket in _py_buckets(spark, terms)}
    )
    post = spark.read.parquet(f"{index_dir}/postings")
    return post.filter(F.col("bucket").isin(buckets))


def _py_buckets(spark, terms):
    # xxhash64 is JVM-side; one tiny local frame maps terms -> buckets
    from pyspark.sql import functions as F

    rows = (
        spark.createDataFrame([(t,) for t in terms], "term string")
        .select(_bucket_col(F).alias("b"))
        .collect()
    )
    return [r["b"] for r in rows]


def main() -> None:
    p = argparse.ArgumentParser(description="Inverted-index build + search")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build postings/doclen/stats")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--text-col", default="text")
    b.add_argument("--id-col", default="doc_id")

    for name in ("bm25", "phrase"):
        q = sub.add_parser(name)
        q.add_argument("--index", required=True)
        q.add_argument("--query", required=True)
        q.add_argument("--k", type=int, default=10)

    args = p.parse_args()

    from pyspark.sql import functions as F

    from crawler_spark.session import build_session

    spark = build_session(app_name="crawler_spark_search")

    if args.cmd == "build":
        from crawler_spark.operators.index import (
            doc_lengths,
            posting_lists,
            term_stats,
        )

        docs = spark.read.parquet(args.input)
        post = posting_lists(docs, id_col=args.id_col, text_col=args.text_col)
        post = post.withColumn("bucket", _bucket_col(F))
        post.write.mode("overwrite").partitionBy("bucket").parquet(
            f"{args.index}/postings"
        )
        # sidecars derive from the WRITTEN postings: one read, consistent
        written = spark.read.parquet(f"{args.index}/postings")
        doc_lengths(written, id_col=args.id_col).write.mode(
            "overwrite"
        ).parquet(f"{args.index}/doclen")
        term_stats(written, id_col=args.id_col).write.mode(
            "overwrite"
        ).parquet(f"{args.index}/stats")
        n_terms = spark.read.parquet(f"{args.index}/stats").count()
        n_docs = spark.read.parquet(f"{args.index}/doclen").count()
        print(json.dumps({"built": args.index, "n_terms": n_terms,
                          "n_docs": n_docs, "n_buckets": N_BUCKETS}))
        return

    terms = [t for t in args.query.lower().strip().split() if t]
    post = _read_postings(spark, args.index, terms)
    if args.cmd == "bm25":
        from crawler_spark.operators.index import bm25_search

        dl = spark.read.parquet(f"{args.index}/doclen")
        out = bm25_search(post, terms, k=args.k, doc_lens=dl).collect()
        for r in out:
            print(json.dumps({"doc_id": r[0], "n_terms": r["n_terms"],
                              "score": round(r["score"], 6)}))
        print(json.dumps({"query": terms, "mode": "bm25", "hits": len(out)}))
    else:
        from crawler_spark.operators.index import phrase_search

        out = (
            phrase_search(post, terms)
            .orderBy(F.desc("n_matches"), "doc_id")
            .limit(args.k)
            .collect()
        )
        for r in out:
            print(json.dumps({"doc_id": r[0], "n_matches": r["n_matches"],
                              "first_pos": r["first_pos"]}))
        print(json.dumps({"query": terms, "mode": "phrase", "hits": len(out)}))


if __name__ == "__main__":
    main()
