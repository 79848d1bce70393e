"""Unit tests for the pure extraction core (no Spark).

Each case pins a reference behavior cited in crawler_spark.core docstrings.
"""

from crawler_spark.core.htmlparse import parse_html
from crawler_spark.core.text import (
    basic_extraction,
    clean_text,
    extract_links,
    extract_structured_markdown,
    extract_title,
    keyword_relevance,
)
from crawler_spark.core.urls import normalize_url


def md(html: str) -> str:
    return extract_structured_markdown(parse_html(html))


class TestCleanText:
    def test_collapses_unicode_whitespace(self):
        # Python \s is Unicode: NBSP, ideographic space, NEL all collapse
        assert clean_text("a b　cd  e\t\nf") == "a b c d e f"

    def test_strip(self):
        assert clean_text("  x  ") == "x"


class TestTitle:
    def test_title_tag(self):
        assert extract_title(parse_html("<title> A  B </title><h1>H</h1>")) == "A B"

    def test_h1_fallback(self):
        assert extract_title(parse_html("<body><h1> H  1 </h1></body>")) == "H 1"

    def test_no_title_found(self):
        assert extract_title(parse_html("<p>x</p>")) == "No title found"

    def test_whitespace_only_title_is_truthy_yields_empty(self):
        # reference quirk: raw .text "  " is truthy -> clean_text -> ""
        assert extract_title(parse_html("<title>  </title><h1>H</h1>")) == ""

    def test_empty_title_falls_to_h1(self):
        assert extract_title(parse_html("<title></title><h1>H</h1>")) == "H"

    def test_entity_decoding(self):
        assert extract_title(parse_html("<title>A &amp; B</title>")) == "A & B"


class TestMarkdown:
    def test_heading_levels(self):
        assert md("<h1>a</h1><h2>b</h2><h3>c</h3>") == "# a\n\n## b\n\n### c"

    def test_ul_ol_emit_nothing_but_li_does(self):
        # ul/ol matched but no branch (enhanced_crawler.py:95-106)
        assert md("<ul><li>x</li><li>y</li></ul>") == "- x\n\n- y"

    def test_nested_p_in_li_emits_twice(self):
        out = md("<ol><li><p>inner</p></li></ol>")
        assert out == "- inner\n\ninner"

    def test_code_in_pre_double_fence(self):
        out = md("<pre><code>x = 1</code></pre>")
        assert out == "```\nx = 1\n```\n\n```\nx = 1\n```"

    def test_get_text_separator_and_strip(self):
        # text nodes stripped individually then joined with single spaces
        out = md("<p>  a  <b> b </b>  c  </p>")
        assert out == "a b c"

    def test_empty_tags_skipped(self):
        assert md("<p></p><p>   </p><h2>k</h2>") == "## k"

    def test_document_order(self):
        out = md("<p>one</p><h2>two</h2><p>three</p>")
        assert out == "one\n\n## two\n\nthree"

    def test_unclosed_p_nests(self):
        # html.parser builder: second <p> nests inside the first (no implied
        # end tags), so outer p's get_text includes the inner text
        out = md("<p>a<p>b</p></p>")
        assert out == "a b\n\nb"

    def test_unicode_whitespace_cleaned(self):
        assert md("<p>a  b</p>") == "a b"

    def test_stray_end_tag_pops_all(self):
        # bs4 _popToTag quirk: unmatched </div> closes every open tag
        out = md("<p>a</div>b</p><p>c</p>")
        assert out == "a\n\nc"


class TestLinks:
    BASE = "https://h0.example.test/p1"

    def test_relative_absolute_fragment(self):
        html = (
            '<a href="/p2">x</a>'
            '<a href="https://h1.example.test/p3">y</a>'
            '<a href="#frag">z</a>'
            '<a href="p4#sec">w</a>'
        )
        links = extract_links(parse_html(html), self.BASE)
        assert links == [
            "https://h0.example.test/p2",
            "https://h1.example.test/p3",
            "https://h0.example.test/p1",  # fragment-only -> self, no frag
            "https://h0.example.test/p4",
        ]

    def test_drop_non_http(self):
        html = '<a href="mailto:a@b">m</a><a href="javascript:void(0)">j</a><a href="/ok">k</a>'
        assert extract_links(parse_html(html), self.BASE) == [
            "https://h0.example.test/ok"
        ]

    def test_order_preserving_dedup(self):
        html = '<a href="/a">1</a><a href="/b">2</a><a href="/a#x">3</a>'
        assert extract_links(parse_html(html), self.BASE) == [
            "https://h0.example.test/a",
            "https://h0.example.test/b",
        ]

    def test_href_entity_decoded(self):
        html = '<a href="/p?a=1&amp;b=2">q</a>'
        assert extract_links(parse_html(html), self.BASE) == [
            "https://h0.example.test/p?a=1&b=2"
        ]


class TestNormalizeUrl:
    def test_scheme_filter(self):
        assert normalize_url("https://h/x", "ftp://h/y") is None
        assert normalize_url("https://h/x", "mailto:a@b") is None

    def test_no_netloc(self):
        assert normalize_url("notaurl", "alsonot") is None

    def test_fragment_stripped(self):
        assert normalize_url("https://h/a", "https://h/b#c") == "https://h/b"

    def test_value_error_returns_none(self):
        # urlparse raises ValueError on malformed IPv6 brackets; the huge-port
        # case does NOT raise (``.port`` is never accessed) and passes through
        assert normalize_url("https://h/a", "https://[bad/b") is None
        assert (
            normalize_url("https://h/a", "https://h:99999999999999/b")
            == "https://h:99999999999999/b"
        )


class TestBasicExtraction:
    def test_thresholds_and_truncation(self):
        long_p = "x" * 60
        html = (
            f"<h1>T</h1><h2>S</h2><p>{long_p}</p><p>short</p>"
            "<li>a list item long enough</li><li>tiny</li>"
        )
        out = basic_extraction(html, "T", "https://h/x")
        assert out["paragraphs"] == [long_p]
        assert out["key_points"] == ["T", "S"]
        assert out["list_items"] == ["a list item long enough"]
        assert out["summary"] == "Page titled 'T' with 1 paragraphs and 2 headings."
        assert out["relevance_score"] == 0.5


class TestKeywordRelevance:
    def test_no_keywords(self):
        score, reason = keyword_relevance("c", "t", "get the a an")
        assert (score, reason) == (0.5, "No specific keywords found in instructions")

    def test_scoring_bands(self):
        # one keyword, in title and content: (3+1)/4 = 1.0
        s, r = keyword_relevance("pricing info", "Pricing page", "pricing")
        assert s == 1.0 and r == "High keyword match in title and content"
        # one keyword, content only: 1/4 = 0.25
        s, r = keyword_relevance("pricing info", "Other", "pricing")
        assert s == 0.25 and r == "Low keyword match"

    def test_substring_not_word_boundary(self):
        s, _ = keyword_relevance("subpricing", "x", "pricing")
        assert s == 0.25

    def test_stopword_and_len_filter(self):
        # "find" is a stopword; "few" is len 3 -> dropped
        s, r = keyword_relevance("", "", "find few")
        assert (s, r) == (0.5, "No specific keywords found in instructions")
