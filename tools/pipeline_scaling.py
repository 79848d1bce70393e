"""N-vs-4N scaling evidence for the training-data PIPELINE (the crawl has
its own harness, tools/scaling_bench.py — this one covers the curation /
dedup / LM operators the corpus filters are built from).

Runs the SAME pipeline on the SAME pre-materialized parquet corpus at two
local parallelism levels in separate subprocesses (separate JVMs),
asserts the surviving document set is identical (count + order-free
xxhash64 aggregate + exact fixed-point LM sums), and reports docs/sec at
both plus efficiency = (tp_4N / tp_N) / ratio.

Fairness notes (learned the hard way, see BENCH.md):
- the corpus is WRITTEN ONCE at full parallelism and read from parquet in
  every measured run — regenerating it inside the measured dataflow makes
  the benchmark measure string-allocation bandwidth, not the pipeline;
- each worker is pinned to its core budget (``taskset`` +
  ``-XX:ActiveProcessorCount``) so GC/JIT threads cannot borrow the other
  24 host cores and flatter the small configuration;
- the curated frame is localCheckpoint-ed before fanning out into the
  LSH/cluster/LM stages — the same materialize-between-stages discipline
  the assemble pipeline uses, otherwise Catalyst re-derives the quality
  gates once per consumer.

Workload per run (one dataflow, representative of the full corpus pass):
  quality + language gates + exact dedup (curate)
  -> MinHash signatures + banded LSH candidate pairs
  -> near-dup cluster resolution, keep min-id survivors
  -> corpus-bigram-LM scoring over the survivors

Usage:
  python tools/pipeline_scaling.py [--docs 200000] [--cpus 2,8] [--repeat 2]
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


def docs_path(n_docs: int) -> str:
    return f"/tmp/crawler_spark_bench/docs_{n_docs}.parquet"


def synth_docs(spark, n_docs: int, tokens_per_doc: int = 60):
    """Deterministic documents: token j of doc i is vocabulary word
    ``xxhash64(i|j) % 800``, with English marker words injected on a
    fixed stride so the language gate passes a stable subset. Every 20th
    doc repeats its predecessor's text plus one token — a planted
    near-duplicate for the LSH stage to find."""
    from pyspark.sql import functions as F

    base = "CASE WHEN id % 20 = 0 AND id > 0 THEN id - 1 ELSE id END"
    tok = (
        "CASE WHEN j % 7 = 0 THEN 'the' WHEN j % 11 = 3 THEN 'and' "
        "ELSE concat('w', pmod(xxhash64(concat(cast(b as string), '-', "
        "cast(j as string))), 800)) END"
    )
    text = (
        f"concat_ws(' ', transform(sequence(0, {tokens_per_doc - 1}), "
        f"j -> {tok}))"
    )
    extra = "CASE WHEN id % 20 = 0 AND id > 0 THEN ' nearly' ELSE '' END"
    return (
        spark.range(0, n_docs)
        .withColumn("b", F.expr(base))
        .select(
            F.col("id").alias("doc_id"),
            F.expr(f"concat({text}, {extra})").alias("text"),
            F.expr("concat('src', pmod(xxhash64(cast(id as string)), 16))").alias("source"),
        )
    )


def ensure_docs(n_docs: int) -> str:
    path = docs_path(n_docs)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    from crawler_spark.session import build_session

    spark = build_session(master="local[32]", shuffle_partitions=64,
                          app_name="pipeline_scale_datagen")
    try:
        synth_docs(spark, n_docs).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    finally:
        spark.stop()
    return path


def worker(args) -> None:
    from pyspark.sql import functions as F

    from crawler_spark.operators.curation import curate
    from crawler_spark.operators.dedup import minhash_lsh_pairs, near_dup_dedup
    from crawler_spark.operators.lm import lm_score
    from crawler_spark.session import build_session

    # identical shuffle partitioning at both core counts: same plan,
    # different executor slots (the scaling contract)
    spark = build_session(
        master=f"local[{args.cpus}]",
        shuffle_partitions=64,
        app_name=f"pipeline_scale_{args.cpus}",
        extra_conf={"spark.driver.memory": "24g"},
    )
    docs = spark.read.parquet(docs_path(args.docs))

    t0 = time.perf_counter()
    # persist, not localCheckpoint: same compute-once effect at the
    # fan-out, without funneling the frame through serialized checkpoint
    # blocks (a measurable serial cost at small core counts).
    # MATERIALIZE before planning downstream: Catalyst takes ~25 s of pure
    # driver (serial) time to optimize the minhash expression over the
    # unmaterialized gate plan vs 0.2 s over the in-memory relation — the
    # dominant Amdahl term behind the round-2 efficiency of 0.72 (the
    # engine's assemble_training_set applies the same barrier).
    curated = curate(docs, min_quality=0.4, langs=("en",)).persist()
    curated.count()
    pairs = minhash_lsh_pairs(curated, num_hashes=8, bands=4, shingle_k=3)
    survivors = near_dup_dedup(curated, pairs)
    scored = lm_score(survivors.select("doc_id", "text", "source"))
    agg = scored.select(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(cast(doc_id as string)))").alias("h"),
        F.sum("sum_logp_q").alias("lp"),
        F.sum("n_bigrams").alias("bg"),
    ).collect()[0]
    wall = time.perf_counter() - t0

    out = {
        "cpus": args.cpus,
        "wall_sec": round(wall, 2),
        "docs_in": args.docs,
        "survivors": int(agg["n"]),
        "docs_per_sec": round(args.docs / wall, 1),
        "result_hash": [int(agg["n"]), int(agg["h"]), int(agg["lp"]), int(agg["bg"])],
    }
    spark.stop()
    print("WORKER_JSON " + json.dumps(out))


def _pinned_cmd(cpus: int, inner: list) -> list:
    """Restrict the worker to its core budget when taskset exists."""
    if shutil.which("taskset"):
        return ["taskset", "-c", f"0-{cpus - 1}"] + inner
    return inner


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=200_000)
    p.add_argument("--cpus", default="2,8")
    p.add_argument("--repeat", type=int, default=2)
    p.add_argument("--worker", action="store_true")
    args = p.parse_args()
    if args.worker:
        args.cpus = int(args.cpus)
        worker(args)
        return

    ensure_docs(args.docs)
    cpu_list = [int(x) for x in args.cpus.split(",")]
    samples: dict = {c: [] for c in cpu_list}
    # interleave repeats and keep each config's best (multi-tenant host,
    # same rationale as scaling_bench.py)
    for _ in range(args.repeat):
        for c in cpu_list:
            inner = [
                sys.executable, os.path.abspath(__file__), "--worker",
                "--cpus", str(c), "--docs", str(args.docs),
            ]
            env = dict(os.environ)
            env["JAVA_TOOL_OPTIONS"] = (
                env.get("JAVA_TOOL_OPTIONS", "")
                + f" -XX:ActiveProcessorCount={c}"
            ).strip()
            out = subprocess.run(
                _pinned_cmd(c, inner), capture_output=True, text=True, env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("WORKER_JSON ")]
            if not line:
                print(out.stdout[-3000:])
                print(out.stderr[-3000:])
                sys.exit(1)
            r = json.loads(line[-1][len("WORKER_JSON "):])
            print(json.dumps(r))
            samples[c].append(r)

    best = {c: max(rs, key=lambda r: r["docs_per_sec"]) for c, rs in samples.items()}
    a, b = best[cpu_list[0]], best[cpu_list[-1]]
    all_runs = [r for rs in samples.values() for r in rs]
    assert all(r["result_hash"] == a["result_hash"] for r in all_runs), \
        "pipeline outputs differ across parallelism!"
    ratio = b["cpus"] / a["cpus"]
    eff = (b["docs_per_sec"] / a["docs_per_sec"]) / ratio
    print(json.dumps({
        "docs": args.docs,
        "N_cpus": a["cpus"],
        "4N_cpus": b["cpus"],
        "throughput_N": a["docs_per_sec"],
        "throughput_4N": b["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "outputs_identical": True,
        "survivors": a["survivors"],
        "samples_docs_per_sec": {
            str(c): [r["docs_per_sec"] for r in rs] for c, rs in samples.items()
        },
    }))


if __name__ == "__main__":
    main()
