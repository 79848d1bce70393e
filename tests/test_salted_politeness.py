"""Salted per-host politeness rank must be exactly equivalent to the
single-window form (the taken set, order keys, and deferred rows all
identical) — the budget is exact, not approximate, or crawl order would
diverge from the oracle (SURVEY §4.3 #2 watch-list)."""

import tempfile

import pytest

from crawler_spark.frontier.bloom import BloomConfig


def _visit(spark, corpus, seeds, salt):
    from crawler_spark.frontier.bfs import CrawlConfig, crawl

    cfg = CrawlConfig(
        depth=2,
        max_pages=60,
        host_budget={"*": 5, "h0.example.test": 3},
        politeness_salt=salt,
        bloom=BloomConfig(n_buckets=8, m_bits=1 << 12, n_hashes=4),
    )
    res = crawl(
        spark, corpus, seeds, cfg, run_dir=tempfile.mkdtemp(prefix="salt_eq_")
    )
    rows = res.pages(spark).select("seq", "url", "depth", "host").collect()
    return sorted((r["seq"], r["url"], r["depth"], r["host"]) for r in rows)


@pytest.mark.parametrize("salt", [2, 4, 7])
def test_salted_equals_unsalted(spark, corpus_parquet, corpus_spec, salt):
    from crawler_spark.datagen import default_seeds

    corpus = spark.read.parquet(corpus_parquet)
    seeds = [s["url"] for s in default_seeds(corpus_spec, n_seeds=2)]
    assert _visit(spark, corpus, seeds, salt) == _visit(spark, corpus, seeds, 1)
