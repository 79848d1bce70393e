"""robots.txt parsing: pure-function cases + raw-bodies -> crawl wiring."""

import pytest

from crawler_spark.frontier.robots import parse_robots


class TestParseRobots:
    def test_star_group(self):
        txt = """
        User-agent: *
        Disallow: /private/
        Disallow: /tmp/
        Crawl-delay: 2
        """
        prefixes, delay = parse_robots(txt)
        assert prefixes == ["/private/", "/tmp/"]
        assert delay == 2.0

    def test_other_agent_ignored(self):
        txt = """
        User-agent: googlebot
        Disallow: /only-google/

        User-agent: *
        Disallow: /all/
        """
        prefixes, delay = parse_robots(txt)
        assert prefixes == ["/all/"]
        assert delay is None

    def test_shared_group_multiple_agents(self):
        txt = """
        User-agent: googlebot
        User-agent: *
        Disallow: /shared/
        """
        prefixes, _ = parse_robots(txt)
        assert prefixes == ["/shared/"]

    def test_new_group_resets_agents(self):
        txt = """
        User-agent: *
        Disallow: /a/

        User-agent: googlebot
        Disallow: /b/
        """
        prefixes, _ = parse_robots(txt)
        assert prefixes == ["/a/"]

    def test_empty_disallow_allows_all(self):
        prefixes, _ = parse_robots("User-agent: *\nDisallow:")
        assert prefixes == []

    def test_comments_and_junk(self):
        txt = "User-agent: * # generic\nDisallow: /x/ # hidden\nNoise line\nSitemap: https://a/b\n"
        prefixes, _ = parse_robots(txt)
        assert prefixes == ["/x/"]

    def test_bad_delay_ignored_largest_wins(self):
        txt = """
        User-agent: *
        Crawl-delay: abc
        Crawl-delay: 1.5
        Crawl-delay: 3
        """
        _, delay = parse_robots(txt)
        assert delay == 3.0

    def test_none_and_empty(self):
        assert parse_robots(None) == ([], None)
        assert parse_robots("") == ([], None)


def test_robots_table_feeds_crawl(spark, tmp_path):
    """Raw bodies -> robots_table -> crawl: disallowed URLs never crawled,
    byte-identical to handing the prepared table directly."""
    from crawler_spark.datagen import CorpusSpec, corpus_rows
    from crawler_spark.frontier.bfs import ROBOTS_SCHEMA, CrawlConfig, crawl
    from crawler_spark.frontier.robots import robots_table

    rows = corpus_rows(CorpusSpec(n_pages=40, n_hosts=2, seed=11))
    corpus = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    hosts = sorted({r["url"].split("/")[2] for r in rows})
    bodies = spark.createDataFrame(
        [
            (hosts[0], "User-agent: *\nDisallow: /p1\nCrawl-delay: 0.5\n"),
            (hosts[1], None),
        ],
        "host string, robots_txt string",
    )
    parsed = robots_table(bodies)
    got = {r["host"]: r for r in parsed.collect()}
    assert got[hosts[0]]["disallow_prefixes"] == ["/p1"]
    assert got[hosts[0]]["crawl_delay"] == 0.5
    assert got[hosts[1]]["disallow_prefixes"] == []

    prepared = spark.createDataFrame(
        [(hosts[0], ["/p1"], 0.5), (hosts[1], [], None)], ROBOTS_SCHEMA
    )
    seeds = sorted({r["url"] for r in rows})[:2]
    cfg = CrawlConfig(depth=3, wave_target_sec=None)
    res_a = crawl(spark, corpus, seeds, cfg, robots=parsed)
    res_b = crawl(spark, corpus, seeds, cfg, robots=prepared)
    urls_a = sorted(r["url"] for r in res_a.seen(spark).collect())
    urls_b = sorted(r["url"] for r in res_b.seen(spark).collect())
    assert urls_a == urls_b
    # prefix semantics: path.startswith('/p1') blocked; '/private/p1',
    # '/docs/p13' etc. are NOT (the prefix sits mid-path there)
    from urllib.parse import urlparse

    blocked = [
        u for u in urls_a
        if urlparse(u).netloc == hosts[0] and urlparse(u).path.startswith("/p1")
    ]
    assert blocked == []


# ---------------------------------------------------------------------------
# full RFC-9309 rules: Allow + Disallow, * / $ wildcards, longest-match
# ---------------------------------------------------------------------------

from crawler_spark.frontier.robots import parse_robots_rules, rule_allows


class TestRfc9309Rules:
    def test_groups_and_order_preserved(self):
        txt = ("User-agent: bot\nDisallow: /x\n"
               "User-agent: *\nDisallow: /\nAllow: /p\n"
               "Allow:\nDisallow:\nCrawl-delay: 2\n")
        rules, delay = parse_robots_rules(txt)
        # other-agent group ignored; empty-value directives are no-ops
        assert rules == ["D:/", "A:/p"] and delay == 2.0

    @pytest.mark.parametrize(
        "rules, path, want",
        [
            # RFC/Googlebot precedence examples
            (["D:/", "A:/p"], "/page", True),      # /p (2) beats / (1)
            (["D:/", "A:/p"], "/else", False),
            (["A:/folder", "D:/folder"], "/folder/page", True),  # tie -> allow
            (["A:/page", "D:/*.htm"], "/page.htm", False),       # 6 > 5
            (["A:/$", "D:/"], "/", True),           # exact root allowed
            (["A:/$", "D:/"], "/page", False),      # $ restricts to root
            # * spans path segments; unanchored patterns match any
            # continuation (Google's /fish*.php example)
            (["D:/fish*.php"], "/fishheads/catfish.php?x", False),
            (["D:/fish*.php"], "/fishheads/catfish.php", False),
            (["D:/fish*.php$"], "/fishheads/catfish.php?x", True),
            # no matching rule -> allowed; empty/None -> allowed
            (["D:/private"], "/public", True),
            ([], "/anything", True),
            (None, "/anything", True),
            # mid-pattern $ is literal
            (["D:/a$b"], "/a$b/c", False),
            (["D:/a$b"], "/ab", True),
        ],
    )
    def test_rule_allows(self, rules, path, want):
        assert rule_allows(path, rules) is want


def test_rules_table_feeds_crawl_with_wildcards(spark, tmp_path):
    """Full-rules robots table drives the same crawl: a wildcard-disallowed
    URL is never fetched, an Allow override survives a broad Disallow, and
    the legacy prefix table still works unchanged."""
    from datetime import datetime, timezone

    from crawler_spark.frontier.bfs import CrawlConfig, crawl
    from crawler_spark.frontier.robots import robots_rules_table

    ts = datetime(2025, 1, 1, tzinfo=timezone.utc)

    def page(links):
        body = "".join(f'<a href="{u}">l</a>' for u in links)
        return f"<html><head><title>t</title></head><body>{body}</body></html>".encode()

    pages = spark.createDataFrame(
        [
            ("http://h/", ts, page(["/keep", "/tmp/x.html", "/p/ok"])),
            ("http://h/keep", ts, page([])),
            ("http://h/tmp/x.html", ts, page([])),
            ("http://h/p/ok", ts, page([])),
        ],
        "url string, warc_ts timestamp, html binary",
    )
    bodies = spark.createDataFrame(
        [("h", "User-agent: *\nDisallow: /*.html\nDisallow: /p\nAllow: /p/ok$\n")],
        "host string, robots_txt string",
    )
    rules = robots_rules_table(bodies)
    res = crawl(
        spark, pages, ["http://h/"],
        config=CrawlConfig(depth=2),
        robots=rules,
        run_dir=str(tmp_path / "rules"),
    )
    urls = sorted(r["url"] for r in res.pages(spark).select("url").collect())
    # wildcard kills the .html page; Allow /p/ok$ overrides Disallow /p
    assert urls == ["http://h/", "http://h/keep", "http://h/p/ok"]
