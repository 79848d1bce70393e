"""RSS/Atom feed source: parser cases (both dialects, hostile XML, date
ladders), the Spark entries/seeds path, newest-wins dedup, autodiscovery,
and a feed-seeded crawl equivalence check."""

from __future__ import annotations

from datetime import datetime

import pytest

from crawler_spark.core.htmlparse import parse_html
from crawler_spark.core.text import extract_feed_links
from crawler_spark.frontier.feeds import feed_entries, feed_seeds, parse_feed

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>chan</title><link>http://h/</link>
  <item><title>one</title><link>http://h/a</link>
        <pubDate>Mon, 02 Jan 2006 15:04:05 GMT</pubDate></item>
  <item><title>two</title><link>http://h/b</link>
        <pubDate>not a date</pubDate></item>
  <item><title>no link, skipped</title></item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>f</title>
  <entry><title>e1</title>
    <link rel="self" href="http://h/self.xml"/>
    <link rel="alternate" href="http://h/x"/>
    <updated>2006-01-02T15:04:05Z</updated></entry>
  <entry><title>e2</title><link href="http://h/y"/>
    <published>2007-03-04T05:06:07+02:00</published></entry>
  <entry><title>no alternate link</title>
    <link rel="enclosure" href="http://h/file.mp3"/></entry>
</feed>"""


def test_parse_rss():
    got = parse_feed(RSS)
    assert got == [
        ("rss", "http://h/a", "one", datetime(2006, 1, 2, 15, 4, 5)),
        ("rss", "http://h/b", "two", None),  # bad date -> null, not fatal
    ]


def test_parse_atom():
    got = parse_feed(ATOM)
    # rel=self skipped; bare <link href> counts as alternate; tz-aware
    # stamps normalize to naive UTC; entries without an alternate link drop
    assert got == [
        ("atom", "http://h/x", "e1", datetime(2006, 1, 2, 15, 4, 5)),
        ("atom", "http://h/y", "e2", datetime(2007, 3, 4, 3, 6, 7)),
    ]


@pytest.mark.parametrize(
    "body",
    [
        None,
        "",
        "not xml at all <<<",
        "<urlset><url><loc>http://h/</loc></url></urlset>",  # sitemap, not feed
        '<!DOCTYPE r [<!ENTITY a "x">]><rss><channel/></rss>',  # DTD bomb
        "<rss>" + "x" * (50 * 1024 * 1024) + "</rss>",  # oversized
    ],
)
def test_hostile_or_foreign_bodies_yield_nothing(body):
    assert parse_feed(body) == []


def test_feed_entries_and_newest_wins_seeds(spark):
    # the same url syndicated in two feeds with different stamps: the
    # newest stamp wins deterministically
    rss2 = RSS.replace("Mon, 02 Jan 2006 15:04:05 GMT",
                       "Tue, 03 Jan 2006 00:00:00 GMT")
    bodies = spark.createDataFrame(
        [("h1", RSS), ("h2", rss2), ("h3", ATOM), ("h4", "broken <")],
        "host string, body string",
    )
    ents = feed_entries(bodies).collect()
    assert len(ents) == 2 + 2 + 2  # h4 contributes nothing
    seeds = {r["url"]: (r["host"], r["published_ts"])
             for r in feed_seeds(bodies).collect()}
    assert seeds["http://h/a"] == ("h2", datetime(2006, 1, 3, 0, 0, 0))
    assert seeds["http://h/b"][1] is None
    assert set(seeds) == {"http://h/a", "http://h/b",
                          "http://h/x", "http://h/y"}


def test_feed_seeds_partition_invariance(spark):
    bodies = spark.createDataFrame(
        [(f"h{i}", RSS if i % 2 else ATOM) for i in range(8)],
        "host string, body string",
    )
    a = sorted(map(tuple, feed_seeds(bodies.repartition(1)).collect()))
    b = sorted(map(tuple, feed_seeds(bodies.repartition(7)).collect()))
    assert a == b


def test_autodiscovery_from_html():
    html = (
        "<html><head>"
        '<link rel="alternate" type="application/rss+xml" href="/feed.xml">'
        '<link rel="alternate" type="application/atom+xml" href="http://h/atom">'
        '<link rel="alternate" type="text/html" href="/mobile">'
        '<link rel="stylesheet" href="/a.css">'
        '<link rel="ALTERNATE" type="APPLICATION/RSS+XML" href="/feed.xml">'
        "</head><body>b</body></html>"
    )
    got = extract_feed_links(parse_html(html), "http://h/page")
    # type-gated, case-insensitive, first-wins dedup, relative resolution
    assert got == ["http://h/feed.xml", "http://h/atom"]


def test_feed_seeded_crawl_equals_explicit_seeds(spark, tmp_path):
    from crawler_spark.frontier import CrawlConfig, crawl

    pages = spark.createDataFrame(
        [
            ("http://h/a", datetime(2025, 1, 1),
             b"<html><head><title>a</title></head><body>"
             b"<a href='/c'>c</a></body></html>"),
            ("http://h/b", datetime(2025, 1, 1),
             b"<html><head><title>b</title></head><body>x</body></html>"),
            ("http://h/c", datetime(2025, 1, 1),
             b"<html><head><title>c</title></head><body>y</body></html>"),
        ],
        "url string, warc_ts timestamp, html binary",
    )
    bodies = spark.createDataFrame([("h", RSS)], "host string, body string")
    seed_rows = feed_seeds(bodies).orderBy(
        "published_ts", "url").collect()
    seeds = [r["url"] for r in seed_rows]
    assert seeds == ["http://h/b", "http://h/a"]  # null ts first, then dated

    via_feed = crawl(spark, pages, seeds, config=CrawlConfig(depth=1),
                     run_dir=str(tmp_path / "feed"))
    explicit = crawl(spark, pages, ["http://h/b", "http://h/a"],
                     config=CrawlConfig(depth=1),
                     run_dir=str(tmp_path / "explicit"))
    fa = [(r["seq"], r["url"]) for r in
          via_feed.pages(spark).orderBy("seq").collect()]
    fb = [(r["seq"], r["url"]) for r in
          explicit.pages(spark).orderBy("seq").collect()]
    assert fa == fb and len(fa) == 3
