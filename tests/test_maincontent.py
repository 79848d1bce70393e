"""Boilerpipe-style main-content extraction (operators/maincontent.py):
segmentation golden cases, classifier threshold boundaries vs the
pure-Python replay, end-to-end strip, partition invariance, plan pins."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.core.htmlparse import parse_html
from crawler_spark.core.text import extract_text_blocks
from crawler_spark.operators.maincontent import (
    classify_blocks_python,
    keep_blocks_expr,
    main_content,
    segment_blocks,
)


class TestSegmentation:
    def test_blocks_golden(self):
        h = """<html><head><title>t</title><script>var x = 'w w w';</script></head>
        <body><div><a href="/">Home</a> <a href="/a">About</a></div>
        <p>Some long paragraph with <b>bold</b> and <a href="/x">a link</a> inside.</p>
        <p>   </p>
        <p>line one<br>line two</p>
        <ul><li>item one</li><li>item two</li></ul>
        <div>footer <a href="/p">privacy</a></div></body></html>"""
        assert extract_text_blocks(parse_html(h)) == [
            ("Home About", 2, 2),
            ("Some long paragraph with bold and a link inside.", 9, 2),
            ("line one", 2, 0),
            ("line two", 2, 0),
            ("item one", 2, 0),
            ("item two", 2, 0),
            ("footer privacy", 2, 1),
        ]

    def test_inline_markup_does_not_split(self):
        h = "<p>a <b>b</b> <i>c</i> <span>d <em>e</em></span> f</p>"
        assert extract_text_blocks(parse_html(h)) == [("a b c d e f", 6, 0)]

    def test_nested_anchor_words_counted_once(self):
        h = '<p>x <a href="/"><b>y z</b></a> w</p>'
        assert extract_text_blocks(parse_html(h)) == [("x y z w", 4, 2)]

    def test_empty_and_nontext_dropped(self):
        h = "<div></div><style>p{}</style><noscript>no js words</noscript><p>only</p>"
        assert extract_text_blocks(parse_html(h)) == [("only", 1, 0)]

    def test_whitespace_normalized(self):
        h = "<p>  a\n\t b   c  </p>"
        assert extract_text_blocks(parse_html(h)) == [("a b c", 3, 0)]


def _blocks(spec):
    """spec: list of (n_words, n_linked) -> block tuples with synthetic text."""
    return [(" ".join(["w"] * nw), nw, nl) for nw, nl in spec]


class TestClassifierReplay:
    # threshold boundaries of the published tree: 16/15/4 (low prev ld),
    # 40/17 (high prev ld), densities 0.333333 / 0.555556
    CASES = [
        [(3, 3), (17, 0), (2, 0)],          # high-prev-ld gate then continuation
        [(3, 3), (41, 0), (2, 0)],          # 41 > 40 passes the strict gate
        [(3, 3), (40, 0), (18, 0)],         # next 18 > 17 rescues
        [(3, 3), (40, 0), (17, 17)],        # linked next: still rescues (count rule)
        [(5, 0), (16, 0), (2, 0)],          # 16 not > 16, prev 5 > 4 rescues
        [(4, 0), (16, 0), (16, 0)],         # next 16 > 15 rescues
        [(4, 0), (16, 0), (15, 0)],         # nothing rescues
        [(17, 0)],                          # single block, zero neighbors
        [(16, 0)],
        [(3, 1), (20, 0)],                  # prev ld exactly 1/3: > 0.333333 holds
        [(9, 5), (20, 0)],                  # prev ld 5/9 = 0.5556: > 0.555556 falls low
        [(18, 6), (2, 0)],                  # curr ld exactly 1/3 is boilerplate
        [(18, 5), (2, 0)],                  # just under: survives via 18 > 16
        [],
    ]

    def test_expr_matches_python(self, spark):
        rows = [(i, _blocks(s)) for i, s in enumerate(self.CASES)]
        df = spark.createDataFrame(
            rows,
            "id int, blocks array<struct<text string, n_words int, n_linked int>>",
        )
        got = {
            r["id"]: r["k"]
            for r in df.select("id", F.expr(keep_blocks_expr()).alias("k")).collect()
        }
        for i, s in enumerate(self.CASES):
            assert got[i] == classify_blocks_python(_blocks(s)), f"case {i}: {s}"

    def test_known_verdicts(self):
        k = classify_blocks_python(_blocks([(3, 3), (41, 0), (2, 0)]))
        assert k == [False, True, True]
        # middle block: not >16 words, next 15 not >15, prev 4 not >4 —
        # boilerplate; its neighbors are each rescued (next>15 / prev>4)
        k = classify_blocks_python(_blocks([(4, 0), (16, 0), (15, 0)]))
        assert k == [True, False, True]


class TestEndToEnd:
    HTML = """<html><body>
    <div><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></div>
    <p>{p1}</p><p>{p2}</p>
    <div><a href="/p">Privacy</a> <a href="/t">Terms</a> <a href="/i">Imprint</a></div>
    </body></html>"""

    def test_article_survives_nav_footer_stripped(self, spark):
        p1 = " ".join(f"word{i}" for i in range(45))
        p2 = " ".join(f"tail{i}" for i in range(20))
        df = spark.createDataFrame(
            [("u", self.HTML.format(p1=p1, p2=p2).encode())],
            "url string, html binary",
        )
        r = main_content(df).collect()[0]
        assert r["n_blocks"] == 4
        assert r["n_content_blocks"] == 2
        assert r["content_words"] == 65
        assert r["main_text"] == p1 + "\n\n" + p2

    def test_all_boilerplate_page(self, spark):
        df = spark.createDataFrame(
            [("u", self.HTML.format(p1="a b", p2="c d").encode())],
            "url string, html binary",
        )
        r = main_content(df).collect()[0]
        assert r["n_content_blocks"] == 0 and r["main_text"] == ""

    def test_null_html_empty_row_kept(self, spark):
        df = spark.createDataFrame([("u", None)], "url string, html binary")
        r = main_content(df).collect()[0]
        assert (r["n_blocks"], r["main_text"]) == (0, "")

    def test_partition_invariance(self, spark, corpus_parquet):
        pages = spark.read.parquet(corpus_parquet)
        base = sorted(map(tuple, main_content(pages.coalesce(1)).collect()))
        alt = sorted(map(tuple, main_content(pages.repartition(7)).collect()))
        assert base == alt and len(base) > 0

    def test_plan_single_python_stage(self, spark, corpus_parquet):
        pages = spark.read.parquet(corpus_parquet)
        plan = (
            main_content(pages)._jdf.queryExecution().executedPlan().toString()
        )
        # segmentation is the only Python: exactly one Arrow mapInPandas
        # node, no row-at-a-time eval, no exchange (row-local operator)
        assert plan.count("MapInPandas") == 1
        assert "BatchEvalPython" not in plan
        assert "Exchange" not in plan


def test_segment_blocks_charset_ladder(spark):
    """A Shift_JIS page with a transport charset hint decodes through the
    same ladder as the extract path; without the hint it mojibakes."""
    jp = "これはテストです"
    html = f"<p>{jp} words here</p>".encode("shift_jis")
    df = spark.createDataFrame(
        [("u", html, "shift_jis")], "url string, html binary, charset string"
    )
    from crawler_spark.operators.maincontent import segment_blocks

    with_cs = segment_blocks(df, charset_col="charset").collect()[0]["blocks"]
    assert jp in with_cs[0]["text"]
    without = segment_blocks(df).collect()[0]["blocks"]
    assert jp not in (without[0]["text"] if without else "")
