"""Storage-agnostic WaveCommit + seen-set integrity flags.

- ``file:`` URI run dirs exercise the Hadoop FileSystem code path end to
  end (FileSystem.get resolves LocalFileSystem for the scheme) — the same
  code that serves hdfs:// and s3a:// on a cluster; outputs and resume
  behavior must be byte-identical to a plain-path run.
- bloom coverage gap on resume (ADVICE r01): waves committed with
  use_bloom=False must not probe as definitely-new after resuming with
  use_bloom=True.
- seen_exact_urls: the collision-free url-string authority join produces
  the same crawl (no collisions at corpus scale, so identical output).
"""

import pytest

from crawler_spark.datagen import default_seeds
from crawler_spark.frontier import CrawlConfig, crawl


def outputs(spark, result):
    return [
        (r["seq"], r["url"], r["depth"], r["title"], r["markdown"], r["error"])
        for r in result.pages(spark).orderBy("seq").collect()
    ]


@pytest.fixture(scope="module")
def seeds(corpus_spec):
    return [s["url"] for s in default_seeds(corpus_spec)]


@pytest.fixture(scope="module")
def baseline(spark, corpus_parquet, seeds, tmp_path_factory):
    cfg = CrawlConfig(depth=2, host_budget={"*": 5})
    pages = spark.read.parquet(corpus_parquet)
    res = crawl(spark, pages, seeds, config=cfg,
                run_dir=str(tmp_path_factory.mktemp("plain")))
    return cfg, outputs(spark, res)


def test_file_uri_run_dir_matches_plain(
    spark, corpus_parquet, seeds, baseline, tmp_path
):
    cfg, base_out = baseline
    pages = spark.read.parquet(corpus_parquet)
    res = crawl(spark, pages, seeds, config=cfg,
                run_dir=f"file:{tmp_path}/uri_run")
    assert outputs(spark, res) == base_out
    # manifests went through the Hadoop path and are readable back
    assert res.commit.committed_waves() == list(range(res.waves))
    m = res.commit.read_manifest(0)
    assert sum(e["rows"] for e in m["lineage"]["pages"]) == m["counters"]["taken"]


def test_file_uri_resume(spark, corpus_parquet, seeds, baseline, tmp_path):
    cfg, base_out = baseline
    pages = spark.read.parquet(corpus_parquet)
    run_dir = f"file:{tmp_path}/uri_resume"
    part_cfg = CrawlConfig(**{**cfg.__dict__, "max_waves": 2})
    partial = crawl(spark, pages, seeds, config=part_cfg, run_dir=run_dir)
    assert partial.waves == 2
    resumed = crawl(spark, pages, seeds, config=cfg, run_dir=run_dir,
                    resume=True)
    assert outputs(spark, resumed) == base_out
    seen = resumed.seen(spark)
    assert seen.select("url").distinct().count() == seen.count()


def test_bloom_coverage_gap_on_resume(
    spark, corpus_parquet, seeds, baseline, tmp_path
):
    # waves 0-1 with bloom OFF, then resume with bloom ON: without the
    # coverage rebuild, every wave-0/1 URL probes definitely-new and gets
    # re-crawled (duplicate pages, broken dense-seq contract)
    cfg, base_out = baseline
    pages = spark.read.parquet(corpus_parquet)
    run_dir = str(tmp_path / "gap")
    off = CrawlConfig(**{**cfg.__dict__, "max_waves": 2, "use_bloom": False})
    crawl(spark, pages, seeds, config=off, run_dir=run_dir)
    on = CrawlConfig(**{**cfg.__dict__, "use_bloom": True})
    resumed = crawl(spark, pages, seeds, config=on, run_dir=run_dir, resume=True)
    assert outputs(spark, resumed) == base_out
    seen = resumed.seen(spark)
    assert seen.select("url").distinct().count() == seen.count()


def test_seen_exact_urls_equivalent(
    spark, corpus_parquet, seeds, baseline, tmp_path
):
    cfg, base_out = baseline
    pages = spark.read.parquet(corpus_parquet)
    exact = CrawlConfig(**{**cfg.__dict__, "seen_exact_urls": True})
    res = crawl(spark, pages, seeds, config=exact,
                run_dir=str(tmp_path / "exact"))
    assert outputs(spark, res) == base_out
