"""Anchor-text extraction + inbound-anchor aggregation.

Extraction parity is proven against an independent pure-Python replay
(regex over the datagen corpus whose anchors are flat by construction,
plus hand-written nested/quirk cases against the parser directly);
aggregation is proven by exact pure-Python groupby replay and a
partition-invariance check.
"""

import re
from collections import Counter, defaultdict

import pytest

from crawler_spark.core import clean_text, normalize_url, parse_html
from crawler_spark.core.text import extract_links_with_text


def test_extract_pairs_nested_markup():
    html = (
        '<p><a href="/x"> Hello <b>big</b>\n world </a>'
        '<a href="#frag">self</a>'
        '<a href="mailto:u@h">drop</a>'
        '<a name="no-href">drop</a>'
        '<a href="http://other.test/y"></a></p>'
    )
    pairs = extract_links_with_text(parse_html(html), "http://h.test/base")
    assert pairs == [
        ("http://h.test/x", "Hello big world"),
        ("http://h.test/base", "self"),  # fragment -> base, frontier quirk
        ("http://other.test/y", ""),
    ]


def test_extract_keeps_every_occurrence():
    html = '<a href="/x">one</a><a href="/x">one</a><a href="/x">two</a>'
    pairs = extract_links_with_text(parse_html(html), "http://h.test/")
    assert len(pairs) == 3
    assert Counter(a for _, a in pairs) == {"one": 2, "two": 1}


def test_extraction_matches_regex_replay_on_corpus(corpus_rows_mem):
    """Datagen anchors are flat (<a href="...">text</a>), so a regex is an
    independent ground-truth implementation on this corpus."""
    pat = re.compile(r'<a href="([^"]*)">(.*?)</a>', re.S)
    checked = 0
    for r in corpus_rows_mem:
        html = r["html"]
        if isinstance(html, bytes):
            html = html.decode("utf-8")
        expected = []
        for href, text in pat.findall(html):
            n = normalize_url(r["url"], href)
            if n:
                expected.append((n, clean_text(text)))
        got = extract_links_with_text(parse_html(html), r["url"])
        assert got == expected
        checked += len(expected)
    assert checked > 100  # the corpus genuinely exercises this


@pytest.fixture(scope="module")
def link_rows():
    rows = []
    for i in range(200):
        src = f"http://s{i % 7}.test/p{i}"
        dst = f"http://t.test/d{i % 13}"
        anchor = f"anchor {i % 5}"
        rows.append((src, dst, anchor))
        if i % 3 == 0:  # duplicate edges with identical anchors
            rows.append((src, dst, anchor))
    return rows


def _replay(rows, sample_k=3):
    by_dst = defaultdict(list)
    for src, dst, anchor in rows:
        by_dst[dst].append((src, anchor))
    out = {}
    for dst, pairs in by_dst.items():
        cnt = Counter(a for _, a in pairs)
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        out[dst] = {
            "n_anchors": len(pairs),
            "n_unique_anchors": len(cnt),
            "top_anchor": ranked[0][0],
            "top_anchor_count": ranked[0][1],
            "anchor_sample": "\x1f".join(a for a, _ in ranked[:sample_k]),
            "n_src_urls": len({s for s, _ in pairs}),
        }
    return out


def test_anchor_stats_match_pure_python(spark, link_rows):
    from crawler_spark.operators.anchors import anchor_text_stats

    df = spark.createDataFrame(
        link_rows, "src_url string, dst_url string, anchor string"
    )
    got = {r["dst_url"]: r.asDict() for r in anchor_text_stats(df).collect()}
    want = _replay(link_rows)
    assert set(got) == set(want)
    for dst, w in want.items():
        g = got[dst]
        for k, v in w.items():
            assert g[k] == v, (dst, k, g[k], v)


def test_anchor_stats_partition_invariance(spark, link_rows):
    from crawler_spark.operators.anchors import anchor_text_stats

    df = spark.createDataFrame(
        link_rows, "src_url string, dst_url string, anchor string"
    )
    a = sorted(map(tuple, anchor_text_stats(df.repartition(1)).collect()))
    b = sorted(map(tuple, anchor_text_stats(df.repartition(13)).collect()))
    assert a == b


def test_anchor_stats_plan_is_jvm_only(spark, link_rows):
    """The aggregation path must be pure JVM — Python appears only in the
    html-parsing extraction kernel, never after the link stream exists."""
    from crawler_spark.operators.anchors import anchor_text_stats

    df = spark.createDataFrame(
        link_rows, "src_url string, dst_url string, anchor string"
    )
    plan = anchor_text_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_host_anchor_relevance_matches_replay(spark):
    from crawler_spark.core.text import derive_keywords
    from crawler_spark.operators.anchors import host_anchor_relevance

    instructions = "Find crawl pipeline documentation about robots"
    rows = [
        ("http://a.test/1", "http://t1.test/x", "crawl pipeline docs"),
        ("http://a.test/2", "http://t1.test/y", "robots guide"),
        ("http://a.test/3", "http://t2.test/x", "cooking recipes"),
        ("http://a.test/4", "http://t2.test/y", "PIPELINE"),  # case-folds
        ("http://a.test/5", "http://t1.test/x", "crawl pipeline docs"),  # dup
    ]
    df = spark.createDataFrame(rows, "src_url string, dst_url string, anchor string")
    got = {
        r["dst_host"]: r["anchor_relevance"]
        for r in host_anchor_relevance(df, instructions).collect()
    }
    kws = derive_keywords(instructions)
    blobs = {"t1.test": "crawl pipeline docs \x1f robots guide",
             "t2.test": "cooking recipes \x1f pipeline"}
    want = {
        h: sum(1 for k in kws if k in blob) / len(kws) for h, blob in blobs.items()
    }
    assert got == want


def test_host_anchor_relevance_no_keywords(spark):
    from crawler_spark.operators.anchors import host_anchor_relevance

    df = spark.createDataFrame(
        [("s", "http://t.test/x", "hi")], "src_url string, dst_url string, anchor string"
    )
    got = host_anchor_relevance(df, "the and of").collect()
    assert got[0]["anchor_relevance"] == 0.5


def test_anchor_scorer_broadcasts_and_scores(spark):
    from crawler_spark.operators.anchors import (
        anchor_priority_scorer,
        host_anchor_relevance,
    )

    links = spark.createDataFrame(
        [("s", "http://hub.test/x", "crawl pipeline documentation robots")],
        "src_url string, dst_url string, anchor string",
    )
    hr = host_anchor_relevance(links, "Find crawl pipeline documentation about robots")
    cand = spark.createDataFrame(
        [
            ("u1", "hub.test", 1, 0, 0, 0.5),
            ("u2", "unknown.test", 1, 0, 1, 0.5),
        ],
        "url string, host string, depth int, parent_seq long, "
        "link_pos int, priority double",
    )
    out = anchor_priority_scorer(hr)(cand)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    got = {r["url"]: r["priority"] for r in out.collect()}
    assert got["u1"] == 1.0       # all 4 keywords present
    assert got["u2"] == 0.5       # unknown host keeps default


def test_end_to_end_over_corpus(spark, corpus_parquet):
    from crawler_spark.operators.anchors import anchor_text_stats, extract_anchors

    pages = spark.read.parquet(corpus_parquet)
    links = extract_anchors(pages)
    stats = anchor_text_stats(links).collect()
    assert sum(r["n_anchors"] for r in stats) == links.count()
    # hottest target's top anchor is deterministic
    top = max(stats, key=lambda r: (r["n_anchors"], r["dst_url"]))
    again = anchor_text_stats(extract_anchors(pages)).collect()
    top2 = max(again, key=lambda r: (r["n_anchors"], r["dst_url"]))
    assert top == top2
