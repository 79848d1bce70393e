"""N-vs-4N scaling evidence for the LAYOUT family (crawl:
tools/scaling_bench.py; pipeline: tools/pipeline_scaling.py; graph:
tools/graph_scaling.py; this one covers the Z-order/Hilbert keying +
file-skipping report — the table-maintenance pass that runs over the
full pages table, so its scan-shape matters as much as the crawl's).

Same discipline as the siblings: one pre-materialized row parquet
(written once at full parallelism), the SAME dataflow at two pinned core
budgets in separate JVMs (``taskset`` + ``-XX:ActiveProcessorCount``),
identical shuffle partitioning at both sizes, best-of-N interleaved
repeats, and a hard bit-identity assert — the Morton AND Hilbert key of
every row (xor-hashed) and the 64-file skipping report must be identical
at every parallelism before a throughput number is reported.

Workload per run (per core budget):
  dims_thresholds (one stacked sketch pass over both dims)
  zorder_keys_with + layout_report(64) + scan_flags  -> report hash
  hilbert_keys_with                                  -> key hash

Usage:
  python tools/layout_scaling.py [--rows 2000000] [--cpus 2,8] [--repeat 2]
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

DIMS = [("a", "xa"), ("b", "xb")]


def rows_path(n_rows: int) -> str:
    return f"/tmp/crawler_spark_bench/layout_rows_{n_rows}.parquet"


def ensure_rows(n_rows: int) -> str:
    """Two deterministic value columns — one log-skewed (document
    lengths), one uniform (host buckets) — written once at full
    parallelism; measured runs only read parquet."""
    path = rows_path(n_rows)
    if os.path.exists(path):
        return path
    from pyspark.sql import functions as F

    from crawler_spark.session import build_session

    spark = build_session(
        master="local[32]", shuffle_partitions=64, app_name="layout_synth"
    )
    (
        spark.range(n_rows)
        .select(
            F.col("id").alias("rid"),
            F.expr(
                "cast(pow(2.0, 6 + pmod(xxhash64(id), 997) / 99.7) as bigint)"
            ).alias("xa"),
            F.expr("pmod(xxhash64(id, 7), 4096)").alias("xb"),
        )
        .write.mode("overwrite")
        .parquet(path)
    )
    spark.stop()
    return path


def worker(args) -> None:
    from pyspark.sql import functions as F

    from crawler_spark.session import build_session
    from crawler_spark.sinks.layout import (
        dims_thresholds,
        hilbert_keys_with,
        layout_report,
        scan_flags,
        zorder_keys_with,
    )

    spark = build_session(
        master=f"local[{args.cpus}]",
        shuffle_partitions=64,
        app_name=f"layout_scale_{args.cpus}",
        extra_conf={
            "spark.driver.memory": "24g",
            # the compressed synthetic parquet is ~130 MB; the default
            # 128 MB split gives ~4 input partitions and 16 MB gives 8 —
            # exactly one wave of straggler-bound tasks at the 4N budget.
            # 4 MB yields ~32 splits so both sizes pipeline their scans
            # (the knob a real cluster turns for the same reason)
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
        },
    )
    rows = spark.read.parquet(rows_path(args.rows))
    n = rows.count()

    # untimed warmup over a 1/64 hash slice: the first execution of each
    # generated kernel pays JIT/C2 compilation — a constant that lands
    # entirely inside the small-N wall otherwise (measured ~8 s at any
    # core count; a real cluster job amortizes it over hours)
    warm = rows.where("pmod(xxhash64(rid), 64) = 0")
    th_w = dims_thresholds(warm, DIMS, bits=6)
    (
        hilbert_keys_with(
            zorder_keys_with(warm, DIMS, th_w, bits=6), DIMS, th_w, bits=6
        )
        .agg(
            F.expr("bit_xor(xxhash64(concat(cast(rid as string), ':', "
                   "cast(zkey as string), cast(hkey as string))))")
        )
        .collect()
    )

    # three jobs total: the sketch scan, ONE scan computing both curves'
    # keys (thresholds shared) with both verification hashes in the same
    # aggregate, and the report scan — per-job driver overhead was ~40%
    # of the 8-core wall in the 5-job first cut
    t0 = time.perf_counter()
    th = dims_thresholds(rows, DIMS, bits=6)
    zk = hilbert_keys_with(
        zorder_keys_with(rows, DIMS, th, bits=6), DIMS, th, bits=6
    )
    k_agg = zk.agg(
        F.expr(
            "bit_xor(xxhash64(concat(cast(rid as string), ':', "
            "cast(zkey as string))))"
        ).alias("hz"),
        F.expr(
            "bit_xor(xxhash64(concat(cast(rid as string), ':', "
            "cast(hkey as string))))"
        ).alias("hh"),
    ).collect()[0]
    rep = scan_flags(
        layout_report(
            zorder_keys_with(rows, DIMS, th, bits=6), DIMS,
            n_files=64, bits=6,
        ),
        [("a", 100, 400), ("b", 1024, 2047)],
    )
    rep_agg = rep.agg(
        F.count("*").alias("n"),
        F.expr(
            "bit_xor(xxhash64(concat(cast(file_id as string), ':', "
            "cast(n_rows as string), ':', cast(scanned as string))))"
        ).alias("h"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    z_agg = {"h": k_agg["hz"]}
    h_agg = {"h": k_agg["hh"]}

    out = {
        "cpus": args.cpus,
        "wall_sec": round(wall, 2),
        "rows": int(n),
        "rows_per_sec": round(n / wall, 1),
        "result_hash": [
            int(z_agg["h"]), int(rep_agg["n"]), int(rep_agg["h"]),
            int(h_agg["h"]),
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
    p.add_argument("--rows", type=int, default=2_000_000)
    p.add_argument("--cpus", default="2,8")
    p.add_argument("--repeat", type=int, default=2)
    p.add_argument("--worker", action="store_true")
    args = p.parse_args()
    if args.worker:
        args.cpus = int(args.cpus)
        worker(args)
        return

    ensure_rows(args.rows)
    cpu_list = [int(x) for x in args.cpus.split(",")]
    samples: dict = {c: [] for c in cpu_list}
    for _ in range(args.repeat):
        for c in cpu_list:
            inner = [
                sys.executable, os.path.abspath(__file__), "--worker",
                "--cpus", str(c), "--rows", str(args.rows),
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

    best = {c: max(rs, key=lambda r: r["rows_per_sec"])
            for c, rs in samples.items()}
    a, b = best[cpu_list[0]], best[cpu_list[-1]]
    all_runs = [r for rs in samples.values() for r in rs]
    assert all(r["result_hash"] == a["result_hash"] for r in all_runs), \
        "layout outputs differ across parallelism!"
    ratio = b["cpus"] / a["cpus"]
    eff = (b["rows_per_sec"] / a["rows_per_sec"]) / ratio
    print(json.dumps({
        "rows": a["rows"],
        "N_cpus": a["cpus"],
        "4N_cpus": b["cpus"],
        "throughput_N_rows_per_sec": a["rows_per_sec"],
        "throughput_4N_rows_per_sec": b["rows_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "outputs_identical": True,
    }))


if __name__ == "__main__":
    main()
