"""REP meta directives: <meta name="robots"> and rel=nofollow.

Page-level nofollow removes a page's whole link set from the frontier;
link-level rel=nofollow drops individual links; noindex excludes a page
from the publishable set (operators.extract.indexable) while it is still
crawled for its links. Default config preserves exact reference behavior
(no robots-meta handling at all).
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from crawler_spark.core.htmlparse import parse_html
from crawler_spark.core.text import (
    extract_link_rels,
    extract_links,
    extract_robots_directives,
)
from crawler_spark.frontier import CrawlConfig, crawl

TS = datetime(2025, 1, 1, tzinfo=timezone.utc)


# ---------------------------------------------------------------------------
# unit: directive parsing
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "html, want",
    [
        ("<html><body>x</body></html>", (False, False)),
        ('<meta name="robots" content="noindex">', (True, False)),
        ('<meta name="robots" content="nofollow">', (False, True)),
        ('<meta name="robots" content="noindex, nofollow">', (True, True)),
        ('<meta name="robots" content="NONE">', (True, True)),
        ('<meta name="ROBOTS" content="NoIndex , follow">', (True, False)),
        # multiple metas OR together (restrictive union)
        (
            '<meta name="robots" content="noindex">'
            '<meta name="robots" content="nofollow">',
            (True, True),
        ),
        # other meta names are not robots directives
        ('<meta name="googlebot" content="noindex">', (False, False)),
        ('<meta name="description" content="nofollow everything">', (False, False)),
    ],
)
def test_robots_directives(html, want):
    assert extract_robots_directives(parse_html(html)) == want


def test_link_rels_align_with_links_first_wins():
    html = (
        '<a href="/a" rel="nofollow">1</a>'
        '<a href="/b">2</a>'
        '<a href="/a">3</a>'  # dup: FIRST occurrence (nofollow) decides
        '<a href="/c" rel="ugc nofollow">4</a>'
        '<a href="/d" rel="sponsored">5</a>'
    )
    soup = parse_html(html)
    links = extract_links(soup, "http://h/")
    rels = extract_link_rels(soup, "http://h/")
    assert links == ["http://h/a", "http://h/b", "http://h/c", "http://h/d"]
    assert rels == [True, False, True, False]
    assert len(rels) == len(links)


# ---------------------------------------------------------------------------
# extraction columns + indexable filter
# ---------------------------------------------------------------------------


def _corpus(spark, pages):
    return spark.createDataFrame(
        [(u, TS, h.encode()) for u, h in pages.items()],
        "url string, warc_ts timestamp, html binary",
    )


PAGES = {
    "http://h/": (
        '<html><head><title>root</title></head><body>'
        '<a href="/open">o</a><a href="/closed" rel="nofollow">c</a>'
        "</body></html>"
    ),
    "http://h/open": (
        '<html><head><title>open</title>'
        '<meta name="robots" content="noindex"></head>'
        '<body><a href="/leaf">l</a></body></html>'
    ),
    "http://h/closed": "<html><head><title>closed</title></head><body>x</body></html>",
    "http://h/leaf": "<html><head><title>leaf</title></head><body>y</body></html>",
    "http://h/island": (
        '<html><head><title>island</title>'
        '<meta name="robots" content="nofollow"></head>'
        '<body><a href="/never">n</a></body></html>'
    ),
    "http://h/never": "<html><head><title>never</title></head><body>z</body></html>",
}


def test_extract_emits_robots_columns(spark):
    from crawler_spark.operators.extract import extract_pages, indexable

    ext = extract_pages(_corpus(spark, PAGES), carry=False)
    rows = {r["url"]: r for r in ext.collect()}
    assert rows["http://h/open"]["robots_noindex"] is True
    assert rows["http://h/open"]["robots_nofollow"] is False
    assert rows["http://h/island"]["robots_nofollow"] is True
    assert rows["http://h/"]["link_nofollow"] == [False, True]
    assert rows["http://h/"]["links"] == ["http://h/open", "http://h/closed"]
    pub = sorted(r["url"] for r in indexable(ext).select("url").collect())
    assert "http://h/open" not in pub and "http://h/" in pub
    # frames without the column pass through untouched
    assert indexable(ext.drop("robots_noindex")).count() == ext.count()


# ---------------------------------------------------------------------------
# crawl policy end-to-end
# ---------------------------------------------------------------------------


def _run(spark, tmp_path, name, **cfg_kw):
    pages = _corpus(spark, PAGES)
    res = crawl(
        spark,
        pages,
        ["http://h/", "http://h/island"],
        config=CrawlConfig(depth=3, **cfg_kw),
        run_dir=str(tmp_path / name),
    )
    return sorted(
        r["url"]
        for r in res.pages(res.commit and spark).select("url").collect()
    )


def test_crawl_default_ignores_meta_robots(spark, tmp_path):
    got = _run(spark, tmp_path, "default")
    assert got == sorted(PAGES)  # reference behavior: everything reachable


def test_crawl_respects_meta_robots(spark, tmp_path):
    got = _run(spark, tmp_path, "rep", respect_meta_robots=True)
    # /closed (rel=nofollow link) and /never (page-level nofollow parent)
    # are never enqueued; /open is still crawled (noindex != nofollow) and
    # its /leaf link still follows
    assert got == sorted(
        ["http://h/", "http://h/open", "http://h/leaf", "http://h/island"]
    )


# ---------------------------------------------------------------------------
# <link rel="canonical">: parsing, extraction column, rewriter seam
# ---------------------------------------------------------------------------

from crawler_spark.core.text import extract_canonical_url


@pytest.mark.parametrize(
    "html, want",
    [
        ("<html><head></head><body>x</body></html>", None),
        ('<link rel="canonical" href="http://h/x">', "http://h/x"),
        # relative href resolves against the page URL
        ('<link rel="canonical" href="/x">', "http://h/x"),
        # fragment strips through normalize_url
        ('<link rel="canonical" href="http://h/x#frag">', "http://h/x"),
        # rel token list, case-insensitive
        ('<link rel="Canonical alternate" href="/x">', "http://h/x"),
        # first canonical in document order wins
        (
            '<link rel="canonical" href="/first">'
            '<link rel="canonical" href="/second">',
            "http://h/first",
        ),
        # non-canonical link elements are ignored
        ('<link rel="stylesheet" href="/a.css">', None),
        # malformed target -> None, not a bogus alias edge
        ('<link rel="canonical" href="mailto:a@b">', None),
    ],
)
def test_extract_canonical_url(html, want):
    soup = parse_html(f"<html><head>{html}</head><body>b</body></html>")
    assert extract_canonical_url(soup, "http://h/page") == want


CANON_PAGES = {
    "http://h/": (
        '<html><head><title>root</title></head><body>'
        '<a href="/alias">a</a><a href="/plain">p</a></body></html>'
    ),
    # /alias declares /real as canonical
    "http://h/alias": (
        '<html><head><title>alias</title>'
        '<link rel="canonical" href="http://h/real"></head>'
        "<body>dup</body></html>"
    ),
    "http://h/real": (
        '<html><head><title>real</title>'
        '<link rel="canonical" href="http://h/real"></head>'
        "<body>canonical body</body></html>"
    ),
    "http://h/plain": "<html><head><title>plain</title></head><body>q</body></html>",
}


def test_extract_emits_canonical_column(spark):
    from crawler_spark.operators.extract import extract_pages

    ext = extract_pages(_corpus(spark, CANON_PAGES), carry=False)
    rows = {r["url"]: r["canonical_url"] for r in ext.collect()}
    assert rows["http://h/alias"] == "http://h/real"
    assert rows["http://h/real"] == "http://h/real"  # self-canonical kept
    assert rows["http://h/plain"] is None


def test_canonical_rewriter_collapses_aliases_in_crawl(spark, tmp_path):
    from crawler_spark.frontier.redirects import canonical_url_rewriter
    from crawler_spark.operators.extract import extract_pages

    pages = _corpus(spark, CANON_PAGES)
    ext = extract_pages(pages, carry=False)
    rewriter = canonical_url_rewriter(ext)

    res = crawl(
        spark,
        pages,
        ["http://h/"],
        config=CrawlConfig(depth=2, url_rewriter=rewriter),
        run_dir=str(tmp_path / "canon"),
    )
    urls = sorted(r["url"] for r in res.pages(spark).select("url").collect())
    # the /alias link was rewritten to /real before the seen anti-join:
    # the alias URL is never fetched, the canonical page is
    assert "http://h/alias" not in urls
    assert "http://h/real" in urls and "http://h/plain" in urls

    # no rewriter: the alias IS fetched (exact reference behavior)
    base = crawl(
        spark, pages, ["http://h/"],
        config=CrawlConfig(depth=2),
        run_dir=str(tmp_path / "canon_base"),
    )
    burls = sorted(r["url"] for r in base.pages(spark).select("url").collect())
    assert "http://h/alias" in burls


# --- <html lang> declared-language column -----------------------------------

import pytest as _pytest

from crawler_spark.core.text import extract_html_lang


@_pytest.mark.parametrize(
    "html, want",
    [
        ('<html lang="EN-us"><body>x</body></html>', "en-us"),
        ('<html XML:LANG="fr"><body>x</body></html>', "fr"),
        ('<html lang=" de "><body>x</body></html>', "de"),
        ('<html lang=""><body>x</body></html>', None),
        ('<html lang="   "><body>x</body></html>', None),
        ("<html><body>x</body></html>", None),
        ("<p>no html element</p>", None),
        # first html element decides; lang beats xml:lang when both set
        ('<html lang="ja" xml:lang="ko"><body>x</body></html>', "ja"),
    ],
)
def test_extract_html_lang(html, want):
    from crawler_spark.core.htmlparse import parse_html

    assert extract_html_lang(parse_html(html)) == want


def test_extract_emits_html_lang_column(spark):
    from crawler_spark.operators.extract import extract_pages

    pages = {
        "http://h/en": '<html lang="en"><head><title>t</title></head><body>x</body></html>',
        "http://h/none": "<html><head><title>t</title></head><body>x</body></html>",
    }
    ext = extract_pages(_corpus(spark, pages), carry=False)
    rows = {r["url"]: r["html_lang"] for r in ext.collect()}
    assert rows == {"http://h/en": "en", "http://h/none": None}
