"""N-vs-4N scaling evidence for the LINK-GRAPH operators (crawl:
tools/scaling_bench.py; curation/dedup/LM: tools/pipeline_scaling.py;
this one covers the iterative graph family — PageRank and HyperBall
harmonic centrality, the two signals the frontier's priority blend
consumes).

Same discipline as the sibling harnesses: one pre-materialized edge
parquet (written once at full parallelism), the SAME dataflow at two
pinned core budgets in separate JVMs (``taskset`` +
``-XX:ActiveProcessorCount``), identical shuffle partitioning at both
sizes, best-of-N interleaved repeats, and a hard bit-identity assert on
the outputs — PageRank's exact fixed-point ranks AND HyperBall's
register-derived estimates must hash identically at every parallelism
before a throughput number is reported.

Workload per run:
  pagerank(iterations=4)          — 4 rank-join + dst-agg rounds
  hyperball_harmonic(3, p=6)      — 3 register-merge rounds at the
                                    web-scale sketch size (m=64)

Usage:
  python tools/graph_scaling.py [--nodes 300000] [--cpus 2,8] [--repeat 2]
  (internal) --worker --cpus N -> prints one JSON line
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def edges_path(n_nodes: int) -> str:
    return f"/tmp/crawler_spark_bench/edges_{n_nodes}.parquet"


def ensure_edges(n_nodes: int) -> str:
    """3-out-degree modular graph (the gate family's construction) written
    once at full parallelism; measured runs only read parquet."""
    path = edges_path(n_nodes)
    if os.path.exists(path):
        return path
    from pyspark.sql import functions as F

    from crawler_spark.session import build_session

    spark = build_session(
        master="local[32]", shuffle_partitions=64, app_name="graph_synth"
    )
    (
        spark.range(n_nodes)
        .select(
            F.col("id").alias("src"),
            F.expr(
                f"explode(transform(array(1, 2, 3), "
                f"j -> (id * 31 + j * 17) % {n_nodes}))"
            ).alias("dst"),
        )
        .write.mode("overwrite")
        .parquet(path)
    )
    spark.stop()
    return path


def worker(args) -> None:
    from pyspark.sql import functions as F

    from crawler_spark.operators.graph import hyperball_harmonic, pagerank
    from crawler_spark.session import build_session

    spark = build_session(
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.partitions,
        app_name=f"graph_scale_{args.cpus}",
        # register rows are ~72 B; the engine-wide Arrow batch default
        # (2048, sized for wide HTML rows) pays ~700 per-batch IPC
        # boundaries per merge partition. 64k batches are the documented
        # workload setting for hyperball_harmonic (see its docstring) —
        # measured ~8% wall at 1M nodes, identical output.
        extra_conf={"spark.driver.memory": "24g",
                    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536"},
    )
    edges = spark.read.parquet(edges_path(args.nodes))
    n_edges = edges.count()

    # Warm-up OUTSIDE the measured window: run the identical plan shapes
    # on a 20k-node graph so whole-stage-codegen compilation (Janino) and
    # JIT warm-up happen before t0. A fresh JVM otherwise pays ~2-3 s of
    # compile time inside the measurement — a size-independent serial
    # term that masquerades as poor scaling (measured on this box: a
    # shuffle-free xxhash scan "scales" at 1.6x from 2->8 cores cold and
    # ~4x warm). Steady-state throughput is what a long-lived executor
    # fleet delivers; the bit-identity assert still runs on the measured
    # output.
    wedges = spark.range(20_000).selectExpr(
        "id as src",
        f"explode(transform(array(1, 2, 3), j -> (id * 31 + j * 17) % "
        f"20000)) as dst",
    )
    if args.ops in ("both", "pagerank"):
        pagerank(wedges, iterations=2, num_partitions=args.partitions).agg(
            F.count("*")
        ).collect()
    if args.ops in ("both", "hyperball"):
        hyperball_harmonic(
            wedges, max_dist=2, p=6, num_partitions=args.partitions
        ).agg(F.count("*")).collect()
    spark.catalog.clearCache()

    t0 = time.perf_counter()
    pr_agg = hb_agg = {"n": 0, "h": 0}
    # explicit num_partitions: identical data layout at BOTH core budgets
    # (the default derives from defaultParallelism, which differs per run)
    if args.ops in ("both", "pagerank"):
        pr = pagerank(edges, iterations=4, num_partitions=args.partitions)
        pr_agg = pr.agg(
            F.count("*").alias("n"),
            F.expr(
                "bit_xor(xxhash64(concat(cast(id as string), ':', "
                "cast(rank_q as string))))"
            ).alias("h"),
        ).collect()[0]
    if args.ops in ("both", "hyperball"):
        hb = hyperball_harmonic(
            edges, max_dist=3, p=6, num_partitions=args.partitions
        )
        hb_agg = hb.agg(
            F.count("*").alias("n"),
            F.expr(
                "bit_xor(xxhash64(concat(cast(id as string), ':', "
                "cast(harmonic_est as string))))"
            ).alias("h"),
        ).collect()[0]
    wall = time.perf_counter() - t0

    out = {
        "cpus": args.cpus,
        "wall_sec": round(wall, 2),
        "nodes": args.nodes,
        "edges": int(n_edges),
        "edges_per_sec": round(n_edges / wall, 1),
        "result_hash": [
            int(pr_agg["n"]), int(pr_agg["h"]),
            int(hb_agg["n"]), int(hb_agg["h"]),
        ],
    }
    spark.stop()
    print("WORKER_JSON " + json.dumps(out))


def _pinned_cmd(cpus: int, inner: list) -> list:
    if shutil.which("taskset"):
        return ["taskset", "-c", f"0-{cpus - 1}"] + inner
    return inner


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=300_000)
    p.add_argument("--cpus", default="2,8")
    p.add_argument("--repeat", type=int, default=2)
    p.add_argument("--ops", default="both",
                   choices=("both", "pagerank", "hyperball"))
    p.add_argument("--partitions", type=int, default=32)
    p.add_argument("--worker", action="store_true")
    args = p.parse_args()
    if args.worker:
        args.cpus = int(args.cpus)
        worker(args)
        return

    ensure_edges(args.nodes)
    cpu_list = [int(x) for x in args.cpus.split(",")]
    samples: dict = {c: [] for c in cpu_list}
    for _ in range(args.repeat):
        for c in cpu_list:
            inner = [
                sys.executable, os.path.abspath(__file__), "--worker",
                "--cpus", str(c), "--nodes", str(args.nodes),
                "--ops", args.ops, "--partitions", str(args.partitions),
            ]
            env = dict(os.environ)
            env["JAVA_TOOL_OPTIONS"] = (
                env.get("JAVA_TOOL_OPTIONS", "")
                + f" -XX:ActiveProcessorCount={c}"
            ).strip()
            out = subprocess.run(
                _pinned_cmd(c, inner), capture_output=True, text=True,
                env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("WORKER_JSON ")]
            if not line:
                print(out.stdout[-3000:])
                print(out.stderr[-3000:])
                sys.exit(1)
            r = json.loads(line[-1][len("WORKER_JSON "):])
            print(json.dumps(r))
            samples[c].append(r)

    best = {c: max(rs, key=lambda r: r["edges_per_sec"])
            for c, rs in samples.items()}
    a, b = best[cpu_list[0]], best[cpu_list[-1]]
    all_runs = [r for rs in samples.values() for r in rs]
    assert all(r["result_hash"] == a["result_hash"] for r in all_runs), \
        "graph outputs differ across parallelism!"
    ratio = b["cpus"] / a["cpus"]
    eff = (b["edges_per_sec"] / a["edges_per_sec"]) / ratio
    print(json.dumps({
        "nodes": args.nodes,
        "edges": a["edges"],
        "N_cpus": a["cpus"],
        "4N_cpus": b["cpus"],
        "throughput_N_edges_per_sec": a["edges_per_sec"],
        "throughput_4N_edges_per_sec": b["edges_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "outputs_identical": True,
        "samples_edges_per_sec": {
            str(c): [r["edges_per_sec"] for r in rs]
            for c, rs in samples.items()
        },
    }))


if __name__ == "__main__":
    main()
