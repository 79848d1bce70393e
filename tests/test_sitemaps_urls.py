"""Sitemap ingestion (`frontier/sitemaps.py`) and aggressive URL
canonicalization (`core/urls.canonical_url_expr`)."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.core.urls import canonical_url_expr
from crawler_spark.frontier.sitemaps import (
    parse_sitemap,
    sitemap_entries,
    sitemap_lines,
    sitemap_seeds,
)

_NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def test_sitemap_lines_from_robots():
    body = (
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: https://h.example/sitemap.xml\n"
        "sitemap: https://h.example/sitemap2.xml  # comment\n"
        "Sitemap:\n"  # empty value ignored
    )
    assert sitemap_lines(body) == [
        "https://h.example/sitemap.xml",
        "https://h.example/sitemap2.xml",
    ]
    assert sitemap_lines(None) == []


def test_parse_sitemap_urlset_and_index():
    urlset = (
        f'<?xml version="1.0"?><urlset {_NS}>'
        "<url><loc>https://h/a</loc><lastmod>2024-01-01</lastmod></url>"
        "<url><loc> https://h/b </loc></url>"
        "<url><priority>0.5</priority></url>"  # no loc: skipped
        "</urlset>"
    )
    assert parse_sitemap(urlset) == [("url", "https://h/a"), ("url", "https://h/b")]
    index = (
        f'<sitemapindex {_NS}>'
        "<sitemap><loc>https://h/s1.xml</loc></sitemap>"
        "<sitemap><loc>https://h/s2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    assert parse_sitemap(index) == [
        ("sitemap", "https://h/s1.xml"),
        ("sitemap", "https://h/s2.xml"),
    ]
    assert parse_sitemap("<html>not a sitemap</html>") == []
    assert parse_sitemap("<<<broken") == []
    assert parse_sitemap("") == []


def test_parse_sitemap_refuses_hostile_xml():
    """Untrusted web XML must never kill or inflate a mapInPandas batch:
    DTD/entity declarations (billion-laughs vector) and oversized bodies
    are refused outright; arbitrary parser explosions are swallowed."""
    bomb = (
        '<?xml version="1.0"?><!DOCTYPE lolz ['
        '<!ENTITY lol "lol"><!ENTITY lol2 "&lol;&lol;&lol;&lol;">'
        ']><urlset><url><loc>&lol2;</loc></url></urlset>'
    )
    assert parse_sitemap(bomb) == []
    # lowercase / spaced markup declaration variants
    assert parse_sitemap("<!doctype x><urlset/>") == []
    assert parse_sitemap("<! ENTITY x 'y'><urlset/>") == []
    # protocol caps one sitemap at 50 MB — larger bodies are skipped
    # without being parsed at all
    big = "<urlset>" + " " * (50 * 1024 * 1024) + "</urlset>"
    assert parse_sitemap(big) == []
    # a clean urlset without the namespace still parses (tolerance intact)
    ok = "<urlset><url><loc>https://h/x</loc></url></urlset>"
    assert parse_sitemap(ok) == [("url", "https://h/x")]


def test_sitemap_seeds_spark_path(spark):
    bodies = spark.createDataFrame(
        [
            ("h1", f'<urlset {_NS}><url><loc>https://h1/x</loc></url></urlset>'),
            ("h2", f'<sitemapindex {_NS}><sitemap><loc>https://h2/s.xml</loc></sitemap></sitemapindex>'),
            ("h3", "garbage"),
        ],
        "host string, body string",
    )
    ent = {(r["host"], r["kind"], r["loc"]) for r in sitemap_entries(bodies).collect()}
    assert ent == {("h1", "url", "https://h1/x"), ("h2", "sitemap", "https://h2/s.xml")}
    seeds = sitemap_seeds(bodies).collect()
    assert [(r["url"], r["host"]) for r in seeds] == [("https://h1/x", "h1")]


def test_sitemap_seeded_crawl_equals_explicit_seeds(spark, corpus_parquet):
    """Seeds coming out of a sitemap body drive the crawl identically to
    the same seeds passed by hand."""
    from crawler_spark.frontier.bfs import CrawlConfig, crawl

    corpus = spark.read.parquet(corpus_parquet)
    urls = [r["url"] for r in corpus.select("url").orderBy("url").limit(3).collect()]
    xml = (
        f'<urlset {_NS}>'
        + "".join(f"<url><loc>{u}</loc></url>" for u in urls)
        + "</urlset>"
    )
    bodies = spark.createDataFrame([("h", xml)], "host string, body string")
    seeds_from_xml = [r["url"] for r in sitemap_seeds(bodies).collect()]
    assert seeds_from_xml == urls

    import tempfile

    cfg = CrawlConfig(depth=1, max_pages=10)
    r1 = crawl(spark, corpus, seeds_from_xml, cfg,
               run_dir=tempfile.mkdtemp(prefix="sm1_"))
    r2 = crawl(spark, corpus, urls, cfg,
               run_dir=tempfile.mkdtemp(prefix="sm2_"))
    p1 = sorted((row["seq"], row["url"]) for row in r1.pages(spark).collect())
    p2 = sorted((row["seq"], row["url"]) for row in r2.pages(spark).collect())
    assert p1 == p2 and p1


# ---------------------------------------------------------------------------
# canonical_url_expr
# ---------------------------------------------------------------------------


CASES = [
    ("HTTPS://ExAmple.COM/Path/One?b=2&utm_source=x&a=1#frag",
     "https://example.com/Path/One?a=1&b=2"),
    ("http://h.com/p?gclid=abc", "http://h.com/p"),
    ("http://h.com/p?z=1&fbclid=q&y=2", "http://h.com/p?y=2&z=1"),
    ("https://H.com/CaseSensitivePath", "https://h.com/CaseSensitivePath"),
    ("http://h.com/", "http://h.com/"),
    ("http://h.com/p?", "http://h.com/p"),
    ("http://H.com:8080/p?a=1", "http://h.com:8080/p?a=1"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [
        r["c"]
        for r in df.select(F.expr(canonical_url_expr("url")).alias("c")).collect()
    ]
    assert got == [want for _, want in CASES]


def test_canonical_url_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    once = df.select(F.expr(canonical_url_expr("url")).alias("c"))
    twice = once.select(F.expr(canonical_url_expr("c")).alias("c"))
    assert once.collect() == twice.collect()


# --------------------------------------------------------------------------
# sitemap freshness hints -> recrawl schedule
# --------------------------------------------------------------------------

_HINTED = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://h.test/fresh</loc><lastmod>2024-01-02</lastmod>
       <changefreq>daily</changefreq><priority>0.9</priority></url>
  <url><loc>https://h.test/stale</loc><changefreq>never</changefreq></url>
  <url><loc>https://h.test/bare</loc></url>
  <url><loc>https://h.test/bad</loc><priority>high</priority>
       <changefreq>sometimes</changefreq></url>
  <url><lastmod>2024-01-01</lastmod></url>
</urlset>"""


def test_parse_sitemap_hints():
    from crawler_spark.frontier.sitemaps import parse_sitemap_hints

    got = parse_sitemap_hints(_HINTED)
    assert got == [
        ("https://h.test/fresh", "2024-01-02", "daily", 0.9),
        ("https://h.test/stale", None, "never", None),
        ("https://h.test/bare", None, None, None),
        # unknown changefreq kept verbatim; unparseable priority -> None
        ("https://h.test/bad", None, "sometimes", None),
    ]
    assert parse_sitemap_hints("<sitemapindex></sitemapindex>") == []
    assert parse_sitemap_hints("<!DOCTYPE x [<!ENTITY a 'b'>]><urlset/>") == []


def test_hints_schedule_and_due_bridge(spark):
    from crawler_spark.frontier.recrawl import due_url_hashes
    from crawler_spark.frontier.sitemaps import hints_schedule, sitemap_hints

    bodies = spark.createDataFrame(
        [("h.test", _HINTED)], "host string, body string"
    )
    hints = sitemap_hints(bodies)
    sched = {
        r["url"]: r
        for r in hints_schedule(hints, "2024-01-10 00:00:00").collect()
    }
    day = 86_400
    assert sched["https://h.test/fresh"]["interval_sec"] == day
    # lastmod-based: 2024-01-02 + 1 day
    assert str(sched["https://h.test/fresh"]["next_fetch_ts"]).startswith(
        "2024-01-03"
    )
    # never/unknown/missing changefreq -> max bound from asof
    for u in ("stale", "bare", "bad"):
        assert sched[f"https://h.test/{u}"]["interval_sec"] == 30 * day
        assert str(
            sched[f"https://h.test/{u}"]["next_fetch_ts"]
        ).startswith("2024-02-09")
    # bridge: by 2024-01-05 only the lastmod-dated daily page is due
    due = due_url_hashes(
        hints_schedule(hints, "2024-01-10 00:00:00"), "2024-01-05 00:00:00"
    )
    assert [r["url"] for r in due.collect()] == ["https://h.test/fresh"]


def test_hints_schedule_dedups_across_files(spark):
    from crawler_spark.frontier.sitemaps import hints_schedule

    hints = spark.createDataFrame(
        [
            ("h", "https://h.test/x", None, "daily", None),
            ("h", "https://h.test/x", None, "monthly", None),
        ],
        "host string, url string, lastmod string, changefreq string, "
        "priority double",
    )
    out = hints_schedule(hints, "2024-01-01 00:00:00").collect()
    assert len(out) == 1
    assert out[0]["interval_sec"] == 86_400  # soonest fetch wins


# ---------------------------------------------------------------------------
# registrable domain (eTLD+1)
# ---------------------------------------------------------------------------

from crawler_spark.core.urls import registrable_domain_expr


def test_registrable_domain_cases(spark):
    from pyspark.sql import functions as F

    cases = {
        "a.shop.example.co.uk": "example.co.uk",
        "b.example.co.uk": "example.co.uk",
        "example.com": "example.com",
        "www.example.com": "example.com",
        "deep.sub.example.com.au": "example.com.au",
        "localhost": "localhost",
        "192.168.0.1": "192.168.0.1",
        "co.uk": "co.uk",           # bare suffix passes through (2 labels)
        "x.co.uk": "x.co.uk",       # the registrant itself
        "sub.x.co.jp": "x.co.jp",
        "a.b.c.example.org": "example.org",
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r["host"]: r["rd"]
        for r in df.selectExpr(
            "host", registrable_domain_expr("host") + " AS rd"
        ).collect()
    }
    assert got == cases


def test_registrable_domain_groups_mirror_subdomains(spark):
    # the politeness-bucket motivation: one registrant, many subdomains
    from pyspark.sql import functions as F

    hosts = [f"s{i}.crawl.example.co.uk" for i in range(5)] + [
        f"cdn{i}.other.com" for i in range(3)
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    counts = (
        df.selectExpr(registrable_domain_expr("host") + " AS rd")
        .groupBy("rd").count().collect()
    )
    got = {r["rd"]: r["count"] for r in counts}
    assert got == {"example.co.uk": 5, "other.com": 3}
