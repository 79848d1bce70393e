"""Checkpoint/resume and determinism-under-parallelism.

- resume: kill after wave k (simulated via max_waves), resume, final tables
  equal the uninterrupted run's; no URL fetched twice.
- crash: a partially-written uncommitted wave (no manifest) is ignored and
  cleanly overwritten on resume.
- parallelism: the same crawl at local[2] vs local[8] commits byte-identical
  outputs (the sandbox miniature of the N-vs-4N cluster criterion).
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

from crawler_spark.datagen import default_seeds
from crawler_spark.frontier import CrawlConfig, crawl


def crawl_outputs(spark, result):
    pages = result.pages(spark).orderBy("seq").collect()
    return [
        (r["seq"], r["url"], r["depth"], r["title"], r["markdown"], r["error"])
        for r in pages
    ]


@pytest.fixture(scope="module")
def full_run(spark, corpus_parquet, corpus_spec, tmp_path_factory):
    seeds = [s["url"] for s in default_seeds(corpus_spec)]
    cfg = CrawlConfig(depth=2, host_budget={"*": 5})
    pages = spark.read.parquet(corpus_parquet)
    result = crawl(spark, pages, seeds, config=cfg,
                   run_dir=str(tmp_path_factory.mktemp("full")))
    return seeds, cfg, result


def test_resume_after_interrupt(spark, corpus_parquet, full_run, tmp_path):
    seeds, cfg, full = full_run
    pages = spark.read.parquet(corpus_parquet)
    run_dir = str(tmp_path / "interrupted")

    # run only 2 waves, then "crash"
    part_cfg = CrawlConfig(**{**cfg.__dict__, "max_waves": 2})
    partial = crawl(spark, pages, seeds, config=part_cfg, run_dir=run_dir)
    assert partial.waves == 2
    assert partial.pages_crawled < full.pages_crawled

    # resume to completion
    resumed = crawl(spark, pages, seeds, config=cfg, run_dir=run_dir, resume=True)
    assert crawl_outputs(spark, resumed) == crawl_outputs(spark, full)

    # no URL fetched twice across the whole run
    seen = resumed.seen(spark)
    total = seen.count()
    assert seen.select("url").distinct().count() == total

    # manifest lineage counters match table contents
    for m in resumed.metrics():
        rows = sum(e["rows"] for e in m["lineage"]["pages"])
        assert rows == m["counters"]["taken"]


def test_uncommitted_partial_wave_ignored(spark, corpus_parquet, full_run, tmp_path):
    seeds, cfg, full = full_run
    pages = spark.read.parquet(corpus_parquet)
    run_dir = str(tmp_path / "crashed")

    part_cfg = CrawlConfig(**{**cfg.__dict__, "max_waves": 1})
    crawl(spark, pages, seeds, config=part_cfg, run_dir=run_dir)

    # simulate a crash mid-wave-1: partial parquet written, no manifest
    for table in ("pages", "seen"):
        d = os.path.join(run_dir, table, "wave=1")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "part-garbage.parquet"), "wb") as f:
            f.write(b"not parquet at all")

    resumed = crawl(spark, pages, seeds, config=cfg, run_dir=run_dir, resume=True)
    assert crawl_outputs(spark, resumed) == crawl_outputs(spark, full)


WORKER = """
import json, sys
from crawler_spark.session import build_session
from crawler_spark.frontier import CrawlConfig, crawl

corpus_parquet, run_dir, cores = sys.argv[1], sys.argv[2], sys.argv[3]
spark = build_session(master=f"local[{cores}]", shuffle_partitions=int(cores),
                      app_name=f"det_{cores}")
pages = spark.read.parquet(corpus_parquet)
seeds = json.loads(sys.argv[4])
cfg = CrawlConfig(depth=2, host_budget={"*": 5}, max_pages=60)
res = crawl(spark, pages, seeds, config=cfg, run_dir=run_dir)
rows = res.pages(spark).orderBy("seq").collect()
out = [(r["seq"], r["url"], r["depth"], r["title"], r["markdown"], r["error"]) for r in rows]
print(json.dumps(out))
spark.stop()
"""


@pytest.mark.slow
def test_parallelism_determinism(corpus_parquet, corpus_spec, tmp_path):
    seeds = [s["url"] for s in default_seeds(corpus_spec)]
    outs = {}
    for cores in ("2", "8"):
        proc = subprocess.run(
            [sys.executable, "-c", WORKER, corpus_parquet,
             str(tmp_path / f"run{cores}"), cores, json.dumps(seeds)],
            capture_output=True, text=True, timeout=600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        outs[cores] = json.loads(proc.stdout.strip().splitlines()[-1])
    assert outs["2"] == outs["8"]


def test_vacuum_reclaims_frontier_and_litter_resume_identical(
    spark, corpus_parquet, full_run, tmp_path
):
    from crawler_spark.frontier.checkpoint import WaveCommit

    seeds, cfg, full = full_run
    pages = spark.read.parquet(corpus_parquet)
    run_dir = str(tmp_path / "vac")

    part_cfg = CrawlConfig(**{**cfg.__dict__, "max_waves": 2})
    crawl(spark, pages, seeds, config=part_cfg, run_dir=run_dir)
    ck = WaveCommit(run_dir)
    committed = ck.committed_waves()
    assert len(committed) == 2

    # crash litter: an uncommitted wave dir beyond the last manifest
    litter = os.path.join(run_dir, "pages", "wave=9")
    os.makedirs(litter, exist_ok=True)
    with open(os.path.join(litter, "part-garbage.parquet"), "wb") as f:
        f.write(b"junk")

    deleted = ck.vacuum()
    # superseded frontier waves gone; the LIVE one (last+1, what resume
    # reads) kept
    live = committed[-1] + 1
    assert any("frontier" in p for p in deleted["frontier"])
    for w in range(1, live):
        assert not os.path.exists(
            os.path.join(run_dir, "frontier", f"wave={w}")
        )
    assert os.path.exists(os.path.join(run_dir, "frontier", f"wave={live}"))
    # litter gone; append tables untouched
    assert not os.path.exists(litter)
    for w in committed:
        assert os.path.exists(os.path.join(run_dir, "pages", f"wave={w}"))
        assert os.path.exists(os.path.join(run_dir, "seen", f"wave={w}"))
    # idempotent
    again = ck.vacuum()
    assert again == {"frontier": [], "bloom": [], "uncommitted": []}

    # and the vacuumed run resumes to the exact uninterrupted outputs
    resumed = crawl(spark, pages, seeds, config=cfg, run_dir=run_dir,
                    resume=True)
    assert crawl_outputs(spark, resumed) == crawl_outputs(spark, full)
