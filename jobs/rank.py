"""spark-submit entry point for link-graph signal tables: build host-level
PageRank / TrustRank / HITS / communities / reciprocity from extraction
output in one pass over the crawl, and write each as a parquet signal
table the frontier's composite priority scorer consumes.

On a cluster:

    zip -r engine.zip crawler_spark
    spark-submit --py-files engine.zip jobs/rank.py \
        --pages s3://bucket/run/pages/ --out s3://bucket/signals/ \
        [--iterations 5] [--communities] [--reciprocity] \
        [--trust-seeds hub.example.org,docs.example.org] [--hits]

Locally: ``python jobs/rank.py --pages runs/r1/pages --out /tmp/signals``.

Output layout (each optional table only when its flag is set):

- ``{out}/pagerank/``     (host, rank_q, rank)          — always
- ``{out}/hits/``         (host, auth_q, hub_q, auth, hub)
- ``{out}/trustrank/``    (host, rank_q, rank)
- ``{out}/communities/``  (host, community)
- ``{out}/reciprocity/``  (host, n_out, n_mutual, reciprocity)

The host link graph is built ONCE (one explode + one aggregation over
the pages table) and persisted; every requested signal reuses it, so
adding a signal costs its iterations, never another corpus scan. A
`operators/priority.py` ``blend_host_signals`` call over these tables is
the intended next step (see that module's docstring); this CLI stops at
the durable signal tables because priority blending is per-crawl-config,
not per-graph.
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
    p = argparse.ArgumentParser(description="Host link-graph signal tables")
    p.add_argument("--pages", required=True,
                   help="extraction-output parquet (host + link_hosts cols)")
    p.add_argument("--out", required=True)
    p.add_argument("--iterations", type=int, default=5)
    p.add_argument("--hits", action="store_true")
    p.add_argument("--communities", action="store_true")
    p.add_argument("--reciprocity", action="store_true")
    p.add_argument("--trust-seeds", default="",
                   help="comma-separated trusted hosts -> trustrank table")
    args = p.parse_args()

    from pyspark.sql import functions as F

    from crawler_spark.operators.graph import (
        hits,
        host_link_graph,
        label_propagation,
        pagerank,
        reciprocity_by_source,
    )
    from crawler_spark.session import build_session

    spark = build_session(app_name="crawler_spark_rank")
    pages = spark.read.parquet(args.pages)

    g = host_link_graph(pages).persist()
    n_edges = g.count()  # materialize once; every signal reuses this graph
    names = (
        g.select(F.col("src_host").alias("h"))
        .unionByName(g.select(F.col("dst_host").alias("h")))
        .distinct()
        .withColumn("hid", F.xxhash64("h"))
        .persist()
    )
    n_hosts = names.count()
    edges = g.select(
        F.xxhash64("src_host").alias("src"), F.xxhash64("dst_host").alias("dst")
    )

    def by_name(df, id_col="id"):
        return df.join(names, df[id_col] == names["hid"]).drop(id_col, "hid")

    written = {}

    pr = by_name(pagerank(edges, iterations=args.iterations)).select(
        F.col("h").alias("host"), "rank_q", "rank"
    )
    pr.write.mode("overwrite").parquet(f"{args.out}/pagerank")
    written["pagerank"] = f"{args.out}/pagerank"

    if args.hits:
        hs = by_name(hits(edges, iterations=max(args.iterations // 2, 1)))
        hs.select(F.col("h").alias("host"), "auth_q", "hub_q", "auth", "hub"
                  ).write.mode("overwrite").parquet(f"{args.out}/hits")
        written["hits"] = f"{args.out}/hits"

    if args.trust_seeds.strip():
        from crawler_spark.operators.graph import trustrank

        seed_hosts = [s.strip() for s in args.trust_seeds.split(",") if s.strip()]
        seed_ids = [
            r["hid"] for r in names.filter(F.col("h").isin(seed_hosts)).collect()
        ]
        if not seed_ids:
            raise SystemExit(f"no --trust-seeds found in the graph: {seed_hosts}")
        tr = by_name(trustrank(edges, seed_ids, iterations=args.iterations))
        tr.select(F.col("h").alias("host"), "rank_q", "rank"
                  ).write.mode("overwrite").parquet(f"{args.out}/trustrank")
        written["trustrank"] = f"{args.out}/trustrank"

    if args.communities:
        lp = by_name(label_propagation(edges, iterations=args.iterations))
        lnames = names.select(F.col("hid").alias("label"),
                              F.col("h").alias("community"))
        lp.select(F.col("h").alias("host"), "label").join(lnames, "label").select(
            "host", "community"
        ).write.mode("overwrite").parquet(f"{args.out}/communities")
        written["communities"] = f"{args.out}/communities"

    if args.reciprocity:
        rc = by_name(reciprocity_by_source(edges))
        rc.select(F.col("h").alias("host"), "n_out", "n_mutual", "reciprocity"
                  ).write.mode("overwrite").parquet(f"{args.out}/reciprocity")
        written["reciprocity"] = f"{args.out}/reciprocity"

    g.unpersist()
    names.unpersist()
    print(json.dumps({"n_hosts": n_hosts, "n_edges": n_edges, **written}))


if __name__ == "__main__":
    main()
