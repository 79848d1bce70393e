"""Crawl equivalence: the Spark wave loop must reproduce the oracle's visit
sequence, URL-seen set, and per-page records exactly (and the oracle is
itself proven equal to the reference FIFO loop in
test_oracle_equivalence.py)."""

import math

import pytest

from crawler_spark.frontier import CrawlConfig, crawl
from tests.oracle import wave_crawl


def run_spark_crawl(spark, corpus_parquet, seeds, tmp_path, **kw):
    robots_rules = kw.pop("robots", None)
    robots_df = None
    if robots_rules is not None:
        robots_df = spark.createDataFrame(
            [(h, p, 0.0) for h, p in robots_rules.items()],
            "host string, disallow_prefixes array<string>, crawl_delay double",
        )
    cfg = CrawlConfig(**kw)
    pages = spark.read.parquet(corpus_parquet)
    return crawl(
        spark, pages, seeds, config=cfg, robots=robots_df,
        run_dir=str(tmp_path / "run"),
    )


def assert_matches_oracle(spark, result, corpus_dict, corpus_ts, seeds, **kw):
    max_pages = kw.pop("max_pages", None)
    oracle = wave_crawl(
        corpus_dict,
        seeds,
        instructions=kw.pop("instructions", None),
        depth=kw.pop("depth", 1),
        follow_external_links=kw.pop("follow_external_links", False),
        max_pages=max_pages if max_pages is not None else math.inf,
        robots=kw.pop("robots", None),
        host_budget=kw.pop("host_budget", None),
        corpus_ts=corpus_ts,
    )
    assert not kw, f"unused oracle args: {kw}"

    got = result.pages(result.commit and spark).orderBy("seq").collect()
    got_order = [(r["seq"], r["url"], r["depth"]) for r in got]
    assert got_order == oracle["visit_log"]

    seen_df = result.seen(spark)
    assert {r["url"] for r in seen_df.collect()} == oracle["seen"]

    by_url = {p["url"]: p for p in oracle["pages"]}
    for r in got:
        o = by_url[r["url"]]
        if "error" in o:
            assert r["error"] == o["error"]
            continue
        assert r["title"] == o["title"]
        assert r["markdown"] == o.get("markdown")
        assert r["links"] == o["links"]
        assert r["relevance"]["score"] == o["relevance"]["score"]
        assert r["relevance"]["reason"] == o["relevance"]["reason"]
        assert r["timestamp"] == o["timestamp"]


SCENARIOS = [
    dict(depth=0),
    dict(depth=1),
    dict(depth=2),
    dict(depth=1, max_pages=7),
    dict(depth=2, max_pages=20),
    dict(depth=2, follow_external_links=True),
    dict(depth=1, instructions="crawl frontier spark politeness"),
    dict(depth=2, host_budget={"*": 4}),
    dict(depth=2, host_budget={"h0.example.test": 2, "*": 6}),
    dict(depth=2, max_pages=15, host_budget={"*": 3}),
    dict(depth=2, robots={"h0.example.test": ["/private"], "h5.example.test": ["/"]}),
]


@pytest.mark.parametrize("scenario", SCENARIOS, ids=[str(s) for s in SCENARIOS])
def test_spark_crawl_matches_oracle(
    spark, corpus_parquet, corpus_dict, corpus_ts, corpus_spec, tmp_path, scenario
):
    from crawler_spark.datagen import default_seeds

    seeds = [s["url"] for s in default_seeds(corpus_spec)]
    result = run_spark_crawl(spark, corpus_parquet, seeds, tmp_path, **scenario)
    assert_matches_oracle(
        spark, result, corpus_dict, corpus_ts, seeds, **scenario
    )


def test_missing_seed_is_error_row(spark, corpus_parquet, corpus_dict, corpus_ts, tmp_path):
    seeds = ["https://h0.example.test/missing/never"]
    result = run_spark_crawl(spark, corpus_parquet, seeds, tmp_path, depth=1)
    rows = result.pages(spark).collect()
    assert len(rows) == 1
    assert rows[0]["error"].startswith("Failed to crawl page: Failed to crawl")
    assert_matches_oracle(spark, result, corpus_dict, corpus_ts, seeds, depth=1)


def test_sort_merge_fetch_path(spark, corpus_parquet, corpus_dict, corpus_ts, corpus_spec, tmp_path):
    # force the big-wave fetch strategy (threshold 0 -> SMJ left join)
    from crawler_spark.datagen import default_seeds

    seeds = [s["url"] for s in default_seeds(corpus_spec)]
    result = run_spark_crawl(
        spark, corpus_parquet, seeds, tmp_path, depth=2, fetch_broadcast_threshold=0
    )
    assert_matches_oracle(spark, result, corpus_dict, corpus_ts, seeds, depth=2)
