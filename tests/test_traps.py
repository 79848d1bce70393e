"""Crawl-trap detection: structural flags, skeleton explosion, frontier gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.frontier.traps import (
    filter_trapped,
    flag_trap_urls,
    trap_skeletons,
    url_skeleton_expr,
)

URLS = [
    # (url, path_depth, max_seg_repeat, n_params)
    ("https://a.test/doc/17", 2, 1, 0),
    ("https://a.test/", 0, 0, 0),
    ("https://a.test/x/y/x/y/x/y/doc", 7, 3, 0),          # cycle
    ("https://b.test/p?a=1&b=2&c=3", 1, 1, 3),
    ("https://b.test/" + "/".join(["d%d" % i for i in range(14)]), 14, 1, 0),  # deep
    ("https://c.test/cal/2024/3/7?session=abc123", 4, 1, 1),
]


@pytest.fixture(scope="module")
def urls_df(spark):
    return spark.createDataFrame([(u,) for u, *_ in URLS], "url string")


def test_structural_flags_exact(spark, urls_df):
    got = {
        r["url"]: (r["path_depth"], r["max_seg_repeat"], r["n_params"])
        for r in flag_trap_urls(urls_df).collect()
    }
    for url, d, rep, p in URLS:
        assert got[url] == (d, rep, p), url
    flags = {
        r["url"]: (r["trap_depth"], r["trap_cycle"], r["trap_params"])
        for r in flag_trap_urls(urls_df, max_depth=12, max_cycle=2,
                                max_params=2).collect()
    }
    assert flags["https://a.test/x/y/x/y/x/y/doc"] == (False, True, False)
    assert flags["https://b.test/p?a=1&b=2&c=3"] == (False, False, True)
    assert flags[URLS[4][0]] == (True, False, False)
    assert flags["https://a.test/doc/17"] == (False, False, False)


def test_skeleton_collapses_digit_runs(spark):
    df = spark.createDataFrame(
        [("https://c.test/cal/2024/%d/%d" % (m, d),)
         for m in range(1, 5) for d in range(1, 11)]
        + [("https://c.test/about",)],
        "url string",
    )
    sk = df.select(F.expr(url_skeleton_expr("url")).alias("s")).distinct().collect()
    assert sorted(r["s"] for r in sk) == ["c.test/about", "c.test/cal/N/N/N"]
    traps = trap_skeletons(df, min_urls=10)
    rows = traps.collect()
    assert len(rows) == 1 and rows[0]["skeleton"] == "c.test/cal/N/N/N"
    assert rows[0]["n_urls"] == 40


def test_filter_trapped_gate(spark):
    cal = [("https://c.test/cal/2024/%d/%d" % (m, d),)
           for m in range(1, 5) for d in range(1, 11)]
    good = [("https://c.test/doc/%d" % i,) for i in range(5)]
    cyc = [("https://c.test/x/y/x/y/x/y",)]
    df = spark.createDataFrame(cal + good + cyc, "url string")
    traps = trap_skeletons(df, min_urls=10)
    kept = filter_trapped(df, traps)
    assert sorted(r["url"] for r in kept.collect()) == sorted(u for (u,) in good)
    assert kept.columns == ["url"]  # flags are internal


def test_partition_invariance(spark):
    df = spark.createDataFrame(
        [("https://h%d.test/p/%d/%d" % (i % 3, i % 7, i),) for i in range(200)],
        "url string",
    )
    a = sorted(map(tuple, flag_trap_urls(df).collect()))
    b = sorted(map(tuple, flag_trap_urls(df.repartition(7)).collect()))
    assert a == b
    ta = sorted(map(tuple, trap_skeletons(df, min_urls=50).collect()))
    tb = sorted(map(tuple, trap_skeletons(df.repartition(7), min_urls=50).collect()))
    assert ta == tb == [("h0.test", "h0.test/p/N/N", 67),
                        ("h1.test", "h1.test/p/N/N", 67),
                        ("h2.test", "h2.test/p/N/N", 66)]


def test_plan_jvm_only_and_broadcast(spark):
    df = spark.createDataFrame([("https://a.test/p/1",)], "url string")
    plan = flag_trap_urls(df)._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan and "BatchEvalPython" not in plan
    traps = trap_skeletons(df, min_urls=1)
    gate_plan = (
        filter_trapped(df, traps)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in gate_plan or "BroadcastNestedLoop" in gate_plan
