"""Composite priority scoring (`operators/priority.py`): weighted blend
of host-level signals with per-host weight re-normalization, one
broadcast join in the scorer seam."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.priority import (
    blend_host_signals,
    composite_priority_scorer,
)

CAND_SCHEMA = (
    "url string, host string, depth int, parent_seq long, "
    "link_pos int, priority double"
)


@pytest.fixture(scope="module")
def signals(spark):
    pr = spark.createDataFrame(
        [("a.test", 1.0), ("b.test", 0.5)], "host string, score double"
    )
    anchors = spark.createDataFrame(
        [("a.test", 0.2), ("c.test", 0.8)], "host string, score double"
    )
    rep = spark.createDataFrame(
        [("a.test", 0.6)], "host string, score double"
    )
    return {"pagerank": (pr, 2.0), "anchors": (anchors, 1.0), "rep": (rep, 1.0)}


def test_blend_renormalizes_over_present_signals(spark, signals):
    got = {r["host"]: r["score"] for r in blend_host_signals(signals).collect()}
    # a.test: all three signals -> (2*1.0 + 1*0.2 + 1*0.6) / 4
    assert got["a.test"] == pytest.approx(0.7)
    # b.test: pagerank only -> 0.5 (weight renormalizes, missing != 0)
    assert got["b.test"] == pytest.approx(0.5)
    # c.test: anchors only -> 0.8
    assert got["c.test"] == pytest.approx(0.8)
    assert set(got) == {"a.test", "b.test", "c.test"}


def test_blend_order_invariant(spark, signals):
    a = sorted(map(tuple, blend_host_signals(signals).collect()))
    rev = dict(reversed(list(signals.items())))
    b = sorted(map(tuple, blend_host_signals(rev).collect()))
    assert a == b


def test_blend_requires_signals(spark):
    with pytest.raises(ValueError):
        blend_host_signals({})


def test_composite_scorer_seam(spark, signals):
    cand = spark.createDataFrame(
        [
            ("u1", "a.test", 1, 0, 0, 0.5),
            ("u2", "c.test", 1, 0, 1, 0.5),
            ("u3", "unknown.test", 1, 0, 2, 0.5),
        ],
        CAND_SCHEMA,
    )
    out = composite_priority_scorer(signals)(cand)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    got = {r["url"]: r["priority"] for r in out.collect()}
    assert got["u1"] == pytest.approx(0.7)
    assert got["u2"] == pytest.approx(0.8)
    assert got["u3"] == 0.5  # uncovered host keeps the default
    assert out.columns == cand.columns  # seam contract: schema unchanged


def test_composite_scorer_drives_crawl_order(spark, signals):
    """End-to-end: the composite scorer reorders the crawl (high-blend
    hosts first within a wave) without dropping or adding URLs."""
    from crawler_spark.datagen import CorpusSpec, corpus_rows
    from crawler_spark.frontier.bfs import CrawlConfig, crawl

    rows = corpus_rows(CorpusSpec(n_pages=60, n_hosts=4, seed=7))
    corpus = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    hosts = sorted(
        r["h"]
        for r in corpus.select(
            F.expr("parse_url(url, 'HOST')").alias("h")
        ).distinct().collect()
    )
    boost = spark.createDataFrame(
        [(hosts[-1], 1.0)], "host string, score double"
    )
    seeds = [r["url"] for r in corpus.limit(3).collect()]
    base = crawl(
        spark, corpus, seeds, CrawlConfig(depth=2, max_pages=40)
    ).pages(spark)
    boosted = crawl(
        spark,
        corpus,
        seeds,
        CrawlConfig(
            depth=2,
            max_pages=40,
            priority_scorer=composite_priority_scorer(
                {"boost": (boost, 1.0)}
            ),
        ),
    ).pages(spark)
    s_rows = boosted.orderBy("seq").collect()
    # same page budget consumed; scoring reorders, it never drops
    assert len(s_rows) == base.count()
    # the boosted host is visited earlier on average than in the base run
    def mean_rank(rows_, host):
        seqs = [
            i for i, r in enumerate(rows_)
            if r["url"].startswith(f"https://{host}/")
        ]
        return sum(seqs) / len(seqs) if seqs else None

    base_rows = base.orderBy("seq").collect()
    mr_base = mean_rank(base_rows, hosts[-1])
    mr_boost = mean_rank(s_rows, hosts[-1])
    if mr_base is not None and mr_boost is not None:
        assert mr_boost <= mr_base
