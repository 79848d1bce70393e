"""W3 priority queue + robots crawl_delay budgets.

The north_rule mandates a per-host *priority* queue; the reference's
no-scorer fallback is a constant 0.5 that degenerates to BFS enqueue order
(ai_processor.py:516-521). These tests pin both halves: the default exactly
reproduces reference order (also covered by every test_crawl_spark
scenario), and a non-default scorer reorders within the politeness budget.
crawl_delay maps to a per-wave budget max(1, floor(wave_target_sec/d)).
"""

import pytest
from pyspark.sql import functions as F

from crawler_spark.frontier import CrawlConfig, crawl


def _run(spark, corpus_parquet, seeds, run_dir, robots_df=None, **kw):
    cfg = CrawlConfig(**kw)
    pages = spark.read.parquet(corpus_parquet)
    return crawl(spark, pages, seeds, config=cfg, robots=robots_df,
                 run_dir=run_dir)


def _visit_log(spark, result):
    return [
        (r["seq"], r["url"])
        for r in result.pages(spark).orderBy("seq").collect()
    ]


@pytest.fixture(scope="module")
def seeds(corpus_spec):
    from crawler_spark.datagen import default_seeds

    return [s["url"] for s in default_seeds(corpus_spec)]


def docs_first_scorer(df):
    return df.withColumn(
        "priority",
        F.when(F.col("url").contains("/docs/"), F.lit(0.9)).otherwise(F.lit(0.1)),
    )


def test_constant_scorer_preserves_reference_order(
    spark, corpus_parquet, seeds, tmp_path
):
    base = _run(spark, corpus_parquet, seeds, str(tmp_path / "base"),
                depth=2, host_budget={"*": 4})
    const = _run(
        spark, corpus_parquet, seeds, str(tmp_path / "const"),
        depth=2, host_budget={"*": 4},
        priority_scorer=lambda df: df.withColumn("priority", F.lit(0.5)),
    )
    assert _visit_log(spark, base) == _visit_log(spark, const)


def test_scorer_reorders_within_budget(spark, corpus_parquet, seeds, tmp_path):
    base = _run(spark, corpus_parquet, seeds, str(tmp_path / "base"),
                depth=2, host_budget={"*": 3})
    scored = _run(
        spark, corpus_parquet, seeds, str(tmp_path / "scored"),
        depth=2, host_budget={"*": 3}, priority_scorer=docs_first_scorer,
    )
    base_log = _visit_log(spark, base)
    scored_log = _visit_log(spark, scored)
    assert base_log != scored_log  # the queue actually reordered

    # within every (wave, host) the taken rows must follow the queue key
    # (priority desc, parent_seq, link_pos); priority is recomputable from
    # the url because the scorer is a pure column expression
    rows = scored.pages(spark).select(
        "wave", "host", "seq", "url", "parent_seq", "link_pos", "depth"
    ).collect()
    by_group = {}
    for r in rows:
        by_group.setdefault((r["wave"], r["host"]), []).append(r)
    for grp in by_group.values():
        grp.sort(key=lambda r: r["seq"])
        keys = [
            (-(0.9 if "/docs/" in r["url"] else 0.1)
             if r["depth"] > 0 else -0.5,  # seeds carry the default priority
             r["parent_seq"], r["link_pos"])
            for r in grp
        ]
        assert keys == sorted(keys)

    # deferred-not-dropped: reordering must not lose reachable pages
    base_urls = {u for _, u in base_log}
    scored_urls = {u for _, u in scored_log}
    assert scored_urls == base_urls


def test_crawl_delay_budgets_hot_host(spark, corpus_parquet, seeds, tmp_path):
    # delay-only robots (no explicit budgets): h0 gets crawl_delay=30 and a
    # 60-second wave target -> at most 2 h0 fetches per wave
    robots = spark.createDataFrame(
        [("h0.example.test", [], 30.0)],
        "host string, disallow_prefixes array<string>, crawl_delay double",
    )
    base = _run(spark, corpus_parquet, seeds, str(tmp_path / "base"), depth=2)
    delayed = _run(
        spark, corpus_parquet, seeds, str(tmp_path / "delayed"),
        depth=2, robots_df=robots, wave_target_sec=60.0,
    )
    per_wave = (
        delayed.pages(spark)
        .filter(F.col("host") == "h0.example.test")
        .groupBy("wave").count().collect()
    )
    assert per_wave and all(r["count"] <= 2 for r in per_wave)
    assert delayed.waves > base.waves  # the hot host visibly deferred

    # deferred, never dropped: same reachable url set as the unthrottled run
    assert {u for _, u in _visit_log(spark, delayed)} == {
        u for _, u in _visit_log(spark, base)
    }


def test_crawl_delay_composes_with_budget_via_min(
    spark, corpus_parquet, seeds, tmp_path
):
    # explicit budget 5, delay budget 1 (delay > wave target -> floor 0 -> min 1)
    robots = spark.createDataFrame(
        [("h0.example.test", [], 120.0)],
        "host string, disallow_prefixes array<string>, crawl_delay double",
    )
    res = _run(
        spark, corpus_parquet, seeds, str(tmp_path / "run"),
        depth=2, host_budget={"*": 5}, robots_df=robots, wave_target_sec=60.0,
    )
    counts = (
        res.pages(spark).groupBy("wave", "host").count().collect()
    )
    for r in counts:
        if r["host"] == "h0.example.test":
            assert r["count"] <= 1
        else:
            assert r["count"] <= 5
