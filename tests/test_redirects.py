"""Redirect-chain resolution (pointer doubling) vs a pure-Python walk."""

import pytest

from crawler_spark.frontier.redirects import resolve_redirects, rewrite_to_terminal


def _walk(edges, max_hops):
    nxt = {u: v for u, v in edges if v is not None}
    out = {}
    for u, _ in edges:
        cur, hops = u, 0
        while cur in nxt and hops <= max_hops:
            cur, hops = nxt[cur], hops + 1
        if cur in nxt or hops > max_hops:  # cap hit mid-chain
            out[u] = (None, None, False)
        else:
            out[u] = (cur, hops, True)
    return out


EDGES = [
    ("a", "b"), ("b", "c"), ("c", None),
    ("d", "d"),                       # self-loop
    ("e", "f"), ("f", "e"),           # 2-cycle
    ("g", "zz"),                      # dangling target = terminal
    ("h", "i"), ("i", "j"), ("j", "k"), ("k", "l"), ("l", "m"), ("m", None),
]


@pytest.mark.parametrize("max_hops", [2, 4, 5, 32])
def test_matches_pure_python_walk(spark, max_hops):
    df = spark.createDataFrame(EDGES, "url string, redirect_to string")
    got = {
        r["url"]: (r["final_url"], r["hops"], r["resolved"])
        for r in resolve_redirects(df, max_hops=max_hops).collect()
    }
    assert got == _walk(EDGES, max_hops)


def test_long_chain_resolves_in_log_rounds(spark):
    n = 64
    edges = [(f"u{i}", f"u{i+1}") for i in range(n)] + [(f"u{n}", None)]
    df = spark.createDataFrame(edges, "url string, redirect_to string")
    got = {r["url"]: r for r in resolve_redirects(df, max_hops=64).collect()}
    assert got["u0"]["final_url"] == f"u{n}" and got["u0"]["hops"] == n
    assert all(got[f"u{i}"]["resolved"] for i in range(n + 1))


def test_partition_invariance(spark):
    df = spark.createDataFrame(EDGES, "url string, redirect_to string")
    a = sorted(map(tuple, resolve_redirects(df.repartition(1), max_hops=8).collect()))
    b = sorted(map(tuple, resolve_redirects(df.repartition(7), max_hops=8).collect()))
    assert a == b


def test_rewrite_to_terminal(spark):
    e = spark.createDataFrame(EDGES, "url string, redirect_to string")
    resolved = resolve_redirects(e, max_hops=8)
    frontier = spark.createDataFrame(
        [("a",), ("d",), ("q",), ("m",)], "url string"
    )
    got = sorted(r["url"] for r in rewrite_to_terminal(frontier, resolved).collect())
    # a -> c (chain), d unresolved -> unchanged, q unknown -> unchanged, m terminal -> m
    assert got == ["c", "d", "m", "q"]


def test_crawl_url_rewriter_collapses_aliases(spark, corpus_parquet, corpus_spec, tmp_path):
    """End-to-end: a redirect table plugged into CrawlConfig.url_rewriter
    makes the crawl fetch terminals instead of aliases, and an
    empty-table rewriter is byte-identical to no rewriter at all."""
    from crawler_spark.core import extract_links, parse_html
    from crawler_spark.frontier import CrawlConfig, crawl
    from crawler_spark.frontier.redirects import (
        redirect_url_rewriter,
        resolve_redirects,
    )

    from urllib.parse import urlparse

    from crawler_spark.datagen import default_seeds

    pages = spark.read.parquet(corpus_parquet)
    seed = default_seeds(corpus_spec)[0]["url"]
    seed_host = urlparse(seed).netloc
    seed_row = pages.filter(pages["url"] == seed).first()
    links = extract_links(parse_html(bytes(seed_row["html"])), seed)
    same_host = [u for u in links if urlparse(u).netloc == seed_host and u != seed]
    alias = same_host[0]
    # terminal: a real same-host page the seed does NOT link to
    linked = set(same_host)
    terminal = (
        pages.filter(
            pages["url"].startswith(f"https://{seed_host}/")
            & ~pages["url"].isin(list(linked) + [seed])
        )
        .orderBy("url")
        .first()["url"]
    )
    edges = spark.createDataFrame(
        [(alias, terminal), (terminal, None)], "url string, redirect_to string"
    )
    cfg = dict(depth=1, max_pages=20)
    with_rw = crawl(
        spark, pages, [seed],
        config=CrawlConfig(
            url_rewriter=redirect_url_rewriter(resolve_redirects(edges)), **cfg
        ),
        run_dir=str(tmp_path / "rw"),
    ).pages(spark)
    urls_rw = {r["url"] for r in with_rw.collect()}
    assert alias not in urls_rw and terminal in urls_rw

    # identity: empty redirect table == no rewriter, bit-for-bit
    empty = spark.createDataFrame([], "url string, redirect_to string")
    a = crawl(
        spark, pages, [seed],
        config=CrawlConfig(
            url_rewriter=redirect_url_rewriter(resolve_redirects(empty)), **cfg
        ),
        run_dir=str(tmp_path / "noop"),
    ).pages(spark)
    b = crawl(
        spark, pages, [seed], config=CrawlConfig(**cfg),
        run_dir=str(tmp_path / "base"),
    ).pages(spark)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_crawl_cli_redirects_flag(spark, corpus_parquet, corpus_spec, tmp_path, monkeypatch):
    """jobs/crawl.py --redirects: the alias url never appears in the
    committed pages table."""
    import sys

    import jobs.crawl as jc
    from crawler_spark.core import extract_links, parse_html
    from crawler_spark.datagen import default_seeds

    pages = spark.read.parquet(corpus_parquet)
    seed = default_seeds(corpus_spec)[0]["url"]
    seed_row = pages.filter(pages["url"] == seed).first()
    from urllib.parse import urlparse

    host = urlparse(seed).netloc
    alias = [
        u for u in extract_links(parse_html(bytes(seed_row["html"])), seed)
        if urlparse(u).netloc == host and u != seed
    ][0]
    terminal = (
        pages.filter(
            pages["url"].startswith(f"https://{host}/") & (pages["url"] != seed)
        ).orderBy("url").first()["url"]
    )
    redp = str(tmp_path / "redirects")
    spark.createDataFrame(
        [(alias, terminal), (terminal, None)], "url string, redirect_to string"
    ).write.parquet(redp)
    run_dir = str(tmp_path / "run")
    monkeypatch.setattr(sys, "argv", [
        "crawl.py", "--corpus", corpus_parquet, "--seeds", seed,
        "--depth", "1", "--run-dir", run_dir, "--redirects", redp,
    ])
    jc.main()
    from crawler_spark.frontier.checkpoint import WaveCommit

    committed = WaveCommit(run_dir).read_table(spark, "pages")
    out = {r["url"] for r in committed.collect()}
    assert alias not in out and terminal in out


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame(EDGES, "url string, redirect_to string")
    plan = (
        resolve_redirects(df, max_hops=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_compose_url_rewriters(spark):
    """Stages apply left to right; None stages skip; empty compose is
    identity."""
    from pyspark.sql import functions as F

    from crawler_spark.frontier.dust import dust_url_rewriter
    from crawler_spark.frontier.redirects import (
        compose_url_rewriters,
        redirect_url_rewriter,
        resolve_redirects,
    )

    edges = spark.createDataFrame(
        [("https://a.test/x", "https://b.test/y"), ("https://b.test/y", None)],
        "url string, redirect_to string",
    )
    rules = spark.createDataFrame(
        [("/y", "/z", 5)], "alpha string, beta string, support long"
    )
    rw = compose_url_rewriters(
        redirect_url_rewriter(resolve_redirects(edges)),
        None,
        dust_url_rewriter(rules),
    )
    cand = spark.createDataFrame(
        [("https://a.test/x", "a.test"), ("https://c.test/q", "c.test")],
        "url string, host string",
    )
    got = {r["url"]: r["host"] for r in rw(cand).collect()}
    # redirect a->b first, then the DUST rule rewrites /y -> /z
    assert got == {"https://b.test/z": "b.test", "https://c.test/q": "c.test"}
    ident = compose_url_rewriters()
    assert {r["url"] for r in ident(cand).collect()} == {
        "https://a.test/x", "https://c.test/q"
    }
