"""Bloom compaction: every K waves the blob set collapses to one snapshot;
crawl results and resume behavior are unchanged by compaction cadence."""

import tempfile

import pytest

from crawler_spark.frontier.bloom import BloomConfig


def _crawl(spark, corpus, seeds, compact_every, run_dir=None, resume=False):
    from crawler_spark.frontier.bfs import CrawlConfig, crawl

    cfg = CrawlConfig(
        depth=3,
        max_pages=70,
        host_budget={"*": 4},  # small budget -> many waves -> compaction fires
        bloom=BloomConfig(n_buckets=8, m_bits=1 << 12, n_hashes=4),
        bloom_compact_every=compact_every,
    )
    return crawl(
        spark, corpus, seeds, cfg,
        run_dir=run_dir or tempfile.mkdtemp(prefix="bloomc_"), resume=resume,
    )


@pytest.fixture(scope="module")
def setup(spark, corpus_parquet, corpus_spec):
    from crawler_spark.datagen import default_seeds

    corpus = spark.read.parquet(corpus_parquet)
    seeds = [s["url"] for s in default_seeds(corpus_spec, n_seeds=2)]
    return corpus, seeds


def _visits(spark, res):
    rows = res.pages(spark).select("seq", "url", "depth").collect()
    return sorted((r["seq"], r["url"], r["depth"]) for r in rows)


def test_compaction_preserves_results(spark, setup):
    corpus, seeds = setup
    never = _crawl(spark, corpus, seeds, compact_every=0)
    every2 = _crawl(spark, corpus, seeds, compact_every=2)
    assert never.waves == every2.waves and never.waves >= 4
    assert _visits(spark, never) == _visits(spark, every2)
    # compaction actually fired: the last manifest tracks fewer contributing
    # blob waves than the never-compacted run
    n_last = never.metrics()[-1]["counters"]["bloom_waves"]
    c_last = every2.metrics()[-1]["counters"]["bloom_waves"]
    assert len(n_last) == never.waves
    assert len(c_last) < len(n_last)


def test_resume_across_compaction(spark, setup):
    corpus, seeds = setup
    run_dir = tempfile.mkdtemp(prefix="bloomc_resume_")
    full = _crawl(spark, corpus, seeds, compact_every=2)

    # run a truncated crawl (stop after 3 waves via max_waves), then resume
    from crawler_spark.frontier.bfs import CrawlConfig, crawl

    cfg = CrawlConfig(
        depth=3, max_pages=70, host_budget={"*": 4},
        bloom=BloomConfig(n_buckets=8, m_bits=1 << 12, n_hashes=4),
        bloom_compact_every=2, max_waves=3,
    )
    crawl(spark, corpus, seeds, cfg, run_dir=run_dir)
    cfg2 = CrawlConfig(
        depth=3, max_pages=70, host_budget={"*": 4},
        bloom=BloomConfig(n_buckets=8, m_bits=1 << 12, n_hashes=4),
        bloom_compact_every=2,
    )
    resumed = crawl(spark, corpus, seeds, cfg2, run_dir=run_dir, resume=True)
    assert _visits(spark, resumed) == _visits(spark, full)
