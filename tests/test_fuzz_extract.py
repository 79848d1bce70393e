"""Property fuzz over the extraction core: arbitrary bytes/strings into
`parse_html`/`extract_page`/`build_page_record` must never raise, must be
deterministic, and must keep their output contracts — the executor-side
guarantee that one hostile page cannot kill an Arrow batch (the same
stance the sitemap parser and WARC reader take).

Pure single-node tests (no Spark session): the extraction kernel is the
shared-verbatim `core/` code that the Spark UDFs call.
"""

from hypothesis import given, settings, strategies as st

from crawler_spark.core.page import build_page_record
from crawler_spark.core.text import basic_extraction, clean_text, extract_page
from crawler_spark.core.htmlparse import parse_html
from crawler_spark.core.urls import normalize_url

_SETTINGS = dict(max_examples=200, deadline=None)

# byte soup, html-ish fragments, and pathological nesting
_html_like = st.one_of(
    st.binary(max_size=2048),
    st.text(max_size=2048),
    st.from_regex(
        r"(<(a|p|ul|ol|li|h1|title|div)( href='[^']{0,30}')?>[a-z ]{0,20}"
        r"(</(a|p|ul|ol|li|h1|title|div)>)?){0,30}",
        fullmatch=True,
    ),
    st.just(None),
    st.builds(lambda s, n: ("<ul>" * n) + s + ("</li>" * n),
              st.text(max_size=50), st.integers(0, 60)),
)


@given(html=_html_like)
@settings(**_SETTINGS)
def test_extract_page_total_and_deterministic(html):
    t1, l1, m1 = extract_page(html, "https://h.example/x")
    t2, l2, m2 = extract_page(html, "https://h.example/x")
    assert (t1, l1, m1) == (t2, l2, m2)
    assert isinstance(t1, str) and isinstance(m1, str)
    assert isinstance(l1, list) and all(isinstance(x, str) for x in l1)
    assert len(l1) == len(set(l1))  # per-page dedup contract


@given(html=_html_like)
@settings(**_SETTINGS)
def test_build_page_record_contract(html):
    rec = build_page_record(html, "https://h.example/x", None, "2026-01-01")
    assert rec["url"] == "https://h.example/x"
    assert len(rec["links"]) <= 20
    assert 0.0 <= rec["relevance"]["score"] <= 1.0
    if "markdown" in rec:
        assert isinstance(rec["markdown"], str)


@given(html=_html_like)
@settings(**_SETTINGS)
def test_basic_extraction_total(html):
    soup = parse_html(html)
    out = basic_extraction(html, "t", "https://h.example/x", soup=soup)
    assert isinstance(out, dict)


@given(s=st.text(max_size=500))
@settings(**_SETTINGS)
def test_clean_text_idempotent(s):
    once = clean_text(s)
    assert clean_text(once) == once
    assert "  " not in once


@given(base=st.text(max_size=80), href=st.text(max_size=120))
@settings(**_SETTINGS)
def test_normalize_url_total(base, href):
    out = normalize_url(base, href)
    assert out is None or isinstance(out, str)


@given(html=_html_like)
@settings(**_SETTINGS)
def test_text_blocks_total_deterministic_and_consistent(html):
    """extract_text_blocks never raises on hostile input, is deterministic,
    and every block keeps its internal contract: non-empty single-spaced
    text, n_words == len(text.split()), 0 <= n_linked <= n_words."""
    from crawler_spark.core.text import extract_text_blocks

    soup = parse_html(html)
    b1 = extract_text_blocks(soup)
    b2 = extract_text_blocks(parse_html(html))
    assert b1 == b2
    for text, nw, nl in b1:
        assert text == " ".join(text.split()) and text
        assert nw == len(text.split())
        assert 0 <= nl <= nw


@given(html=_html_like)
@settings(**_SETTINGS)
def test_classifier_total_on_fuzzed_blocks(html):
    """The block classifier consumes whatever the segmenter emits."""
    from crawler_spark.core.text import extract_text_blocks
    from crawler_spark.operators.maincontent import classify_blocks_python

    blocks = extract_text_blocks(parse_html(html))
    keep = classify_blocks_python(blocks)
    assert len(keep) == len(blocks) and all(isinstance(k, bool) for k in keep)


@given(html=_html_like)
@settings(**_SETTINGS)
def test_html_lang_total_and_shaped(html):
    from crawler_spark.core.text import extract_html_lang

    v = extract_html_lang(parse_html(html))
    assert v is None or (isinstance(v, str) and v == v.strip().lower() and v)
