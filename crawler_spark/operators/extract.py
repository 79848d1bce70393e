"""Vectorized page-extraction operators (Arrow pandas UDFs / mapInPandas).

The kernels call the pure functions in ``crawler_spark.core`` — the same
code the single-node oracle runs — so Spark output is byte-identical to the
oracle by construction (the input_hint's per-row invariant). No per-row
Python at the DataFrame API surface; everything crosses the JVM<->Python
boundary as Arrow batches.

Reference semantics: enhanced_crawler.py:196-239 (per-page pipeline),
ai_processor.py:101-150 (+:233-278 for basic extraction).
"""

from __future__ import annotations

from datetime import timezone as _tz
from typing import Iterator, Optional

import pandas as pd

_UTC = _tz.utc
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.core.page import RELEVANCE_GATE, missing_page_error
from crawler_spark.core.text import (
    basic_extraction,
    extract_link_rels,
    extract_page,
    extract_canonical_url,
    extract_html_lang,
    extract_text_blocks,
    extract_robots_directives,
    relevance,
)
from crawler_spark.core.urls import get_domain
from crawler_spark.operators.maincontent import classify_blocks_python

# Page-record schema: the reference's conditional dict keys become nullable
# columns (SURVEY §1.2). `markdown`/`extracted` are null when gated (<0.3),
# everything but url/error is null on error rows. `extracted_data` is the
# LLM-path slot (ai_processor.py:201 prompt contract, object format -> map);
# the deterministic default extractor leaves it null, exactly like the
# reference's _basic_extraction result (ai_processor.py:270-278) has no
# extracted_data key.
EXTRACTED_TYPE = T.StructType(
    [
        T.StructField("source_url", T.StringType()),
        T.StructField("source_title", T.StringType()),
        T.StructField("summary", T.StringType()),
        T.StructField("key_points", T.ArrayType(T.StringType())),
        T.StructField("relevance_score", T.DoubleType()),
        T.StructField("paragraphs", T.ArrayType(T.StringType())),
        T.StructField("list_items", T.ArrayType(T.StringType())),
        T.StructField("extracted_data", T.MapType(T.StringType(), T.StringType())),
    ]
)

RELEVANCE_TYPE = T.StructType(
    [
        T.StructField("score", T.DoubleType()),
        T.StructField("reason", T.StringType()),
    ]
)

PAGE_RECORD_FIELDS = [
    T.StructField("url", T.StringType(), False),
    T.StructField("title", T.StringType()),
    T.StructField("markdown", T.StringType()),
    T.StructField("links", T.ArrayType(T.StringType())),
    # link_hosts[i] = urlparse(links[i]).netloc, computed where the urls
    # already sit in Python — so the wave-expand hot path (millions of
    # candidate rows) never needs a per-link Python UDF
    T.StructField("link_hosts", T.ArrayType(T.StringType())),
    T.StructField("relevance", RELEVANCE_TYPE),
    T.StructField("extracted", EXTRACTED_TYPE),
    T.StructField("error", T.StringType()),
    T.StructField("timestamp", T.StringType()),
    # REP meta directives (beyond the reference): page-level noindex/
    # nofollow from <meta name="robots">, and per-link rel=nofollow flags
    # index-aligned with links[:20] — the frontier's respect_meta_robots
    # policy and the index/export sinks read these instead of re-parsing
    T.StructField("robots_noindex", T.BooleanType()),
    T.StructField("robots_nofollow", T.BooleanType()),
    T.StructField("link_nofollow", T.ArrayType(T.BooleanType())),
    # <link rel="canonical"> declared alias target (beyond the reference):
    # null when absent/malformed; feeds redirects.canonical_url_rewriter
    # (in-HTML alias collapse, the declarative twin of redirect chains)
    T.StructField("canonical_url", T.StringType()),
    # <html lang> declared-language tag (beyond the reference): lowercased
    # BCP-47 or null; the precision signal to cross-check lang_id against
    T.StructField("html_lang", T.StringType()),
    # boilerpipe main text (operators/maincontent.py semantics, computed on
    # the SAME parse when CrawlConfig.extract_main_content is set; null
    # otherwise) — the structural boilerplate strip riding the crawl
    T.StructField("main_text", T.StringType()),
]

_CARRY_COLS = ["seq", "wave", "depth", "parent_seq", "link_pos", "host"]


def page_record_schema(carry: bool = True) -> T.StructType:
    fields = list(PAGE_RECORD_FIELDS)
    if carry:
        fields = [
            T.StructField("seq", T.LongType()),
            T.StructField("wave", T.IntegerType()),
            T.StructField("depth", T.IntegerType()),
            T.StructField("parent_seq", T.LongType()),
            T.StructField("link_pos", T.IntegerType()),
            T.StructField("host", T.StringType()),
        ] + fields
    return T.StructType(fields)


def _llm_text_content(soup, max_chars: int = 8000) -> str:
    """The LLM-path page text: ``get_text('\\n', strip=True)`` truncated to
    8000 chars with a literal ``...`` appended — the P11 truncation quirk
    (reference ai_processor.py:178-184) reproduced exactly."""
    text_content = soup.get_text(separator="\n", strip=True)
    if len(text_content) > max_chars:
        text_content = text_content[:max_chars] + "..."
    return text_content


def _apply_structured_extractor(
    extractor, soup, title: str, url: str, instructions: Optional[str]
) -> dict:
    """Run a pluggable structured extractor and normalize its result into
    EXTRACTED_TYPE.

    The extractor sees ``(text_content, title, url, instructions)`` — the
    same inputs the reference feeds its LLM prompt
    (ai_processor.py:186-205), with ``instructions or "Extract main
    content"`` (enhanced_crawler.py:213) — and returns a dict with any of
    summary / key_points / relevance_score / extracted_data. source_url and
    source_title are stamped on afterwards (ai_processor.py:227-229);
    extracted_data values coerce to strings (map<string,string> column).
    A model-backed extractor plugs in here; the engine never calls one
    itself (determinism).
    """
    result = extractor(
        _llm_text_content(soup), title, url, instructions or "Extract main content"
    )
    result = dict(result or {})
    ed = result.get("extracted_data")
    return {
        "source_url": url,
        "source_title": title,
        "summary": result.get("summary"),
        "key_points": [str(p) for p in result.get("key_points") or []] or None,
        "relevance_score": (
            float(result["relevance_score"])
            if result.get("relevance_score") is not None
            else None
        ),
        "paragraphs": None,
        "list_items": None,
        "extracted_data": (
            {str(k): str(v) for k, v in ed.items()} if ed else None
        ),
    }


def _extract_batch(
    pdf: pd.DataFrame, instructions: Optional[str], structured_extractor=None,
    main_content: bool = False,
) -> pd.DataFrame:
    """One Arrow batch of fetched frontier rows -> page-record rows."""
    n = len(pdf)
    out = {
        "title": [None] * n,
        "markdown": [None] * n,
        "links": [None] * n,
        "link_hosts": [None] * n,
        "relevance": [None] * n,
        "extracted": [None] * n,
        "error": [None] * n,
        "timestamp": [None] * n,
        "robots_noindex": [None] * n,
        "robots_nofollow": [None] * n,
        "link_nofollow": [None] * n,
        "canonical_url": [None] * n,
        "html_lang": [None] * n,
        "main_text": [None] * n,
    }
    htmls = pdf["html"].tolist()
    urls = pdf["url"].tolist()
    # deterministic timestamp: the page's warc_ts as Python isoformat — the
    # substitute for the reference's datetime.now(...).isoformat() at
    # enhanced_crawler.py:225/:236 (the one wall-clock field we replace)
    tss = pdf["warc_ts"].tolist() if "warc_ts" in pdf.columns else [None] * n
    # transport charset hints (sources/warc.py's `charset` column): when the
    # column rides along, bytes decode via the BOM/hint/meta-sniff ladder —
    # the real-archive path; absent, the UTF-8 input contract holds and the
    # byte-pinned extraction bytes are unchanged
    charsets = (
        [c if isinstance(c, str) else None for c in pdf["charset"].tolist()]
        if "charset" in pdf.columns
        else [None] * n
    )

    from crawler_spark.core.htmlparse import parse_html

    for i in range(n):
        html = htmls[i]
        url = urls[i]
        if html is None:
            out["error"][i] = missing_page_error(url)
            continue
        # one parse feeds title/links/markdown AND basic_extraction — the
        # reference parses twice (enhanced_crawler.py:196, ai_processor.py:247)
        # with byte-identical results; parsing is the crawl's dominant CPU
        # cost, so don't pay it twice
        soup = parse_html(html, charset=charsets[i])
        title, links, markdown = extract_page(html, url, soup=soup)
        score, reason = relevance(markdown, title, instructions)
        out["title"][i] = title
        out["links"][i] = links[:20]  # P8: stored AND used for enqueue
        out["link_hosts"][i] = [get_domain(u) for u in links[:20]]
        noindex, nofollow = extract_robots_directives(soup)
        out["robots_noindex"][i] = noindex
        out["robots_nofollow"][i] = nofollow
        out["link_nofollow"][i] = extract_link_rels(soup, url)[:20]
        out["canonical_url"][i] = extract_canonical_url(soup, url)
        out["html_lang"][i] = extract_html_lang(soup)
        out["relevance"][i] = {"score": float(score), "reason": reason}
        ts = tss[i]
        if ts is None or pd.isna(ts):
            out["timestamp"][i] = ""
        else:
            dt = ts.to_pydatetime()
            if dt.tzinfo is None:
                # Arrow hands pandas UDFs session-local (UTC) naive values
                dt = dt.replace(tzinfo=_UTC)
            out["timestamp"][i] = dt.isoformat()
        if score >= RELEVANCE_GATE:
            out["markdown"][i] = markdown
            if main_content:
                # same parse, one linear block walk + the published tree;
                # gated WITH markdown so the main-text training path sees
                # exactly the pages the reference-exact path admits
                blocks = extract_text_blocks(soup)
                keep = classify_blocks_python(blocks)
                out["main_text"][i] = "\n\n".join(
                    b[0] for b, k in zip(blocks, keep) if k
                )
            if structured_extractor is not None:
                out["extracted"][i] = _apply_structured_extractor(
                    structured_extractor, soup, title, url, instructions
                )
            else:
                out["extracted"][i] = {
                    **basic_extraction(html, title, url, soup=soup),
                    "extracted_data": None,
                }

    res = pd.DataFrame({"url": urls, **out})
    for c in _CARRY_COLS:
        if c in pdf.columns:
            res[c] = pdf[c].values
    return res


def indexable(pages: DataFrame) -> DataFrame:
    """Drop ``<meta name="robots" content="noindex">`` pages — the filter
    export/index/RAG sinks apply when honoring REP meta directives (the
    frontier half, nofollow, lives in ``CrawlConfig.respect_meta_robots``;
    noindex pages are still CRAWLED for their links, just not published)."""
    if "robots_noindex" not in pages.columns:
        return pages
    return pages.filter(~F.coalesce(F.col("robots_noindex"), F.lit(False)))


def extract_pages(
    fetched: DataFrame,
    instructions: Optional[str] = None,
    carry: bool = True,
    structured_extractor=None,
    main_content: bool = False,
) -> DataFrame:
    """(url, html[, ts_iso, carry-cols]) -> page records via mapInPandas.

    One HTML parse serves title+links+markdown+basic-extraction (the
    reference parses twice — enhanced_crawler.py:196 and
    ai_processor.py:247 — we parse once per purpose inside core; outputs
    are identical). The fat ``html`` binary dies inside this operator:
    downstream stages never shuffle it.

    ``structured_extractor`` is the LLM-path seam (see
    _apply_structured_extractor); None keeps the deterministic
    basic-extraction bytes.
    """
    schema = page_record_schema(carry=carry)
    names = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = _extract_batch(
                pdf, instructions, structured_extractor, main_content
            )
            yield res[[c for c in names if c in res.columns]]

    return fetched.mapInPandas(run, schema=schema)


@F.pandas_udf(T.StringType())
def domain_of(urls: pd.Series) -> pd.Series:
    """Vectorized ``urlparse(url).netloc`` (reference utils.py:89-91).

    A pandas UDF rather than ``parse_url(url,'HOST')`` because urllib's
    netloc keeps port and userinfo while Spark's HOST does not — P6 caveat.
    """
    return urls.map(lambda u: get_domain(u) if u is not None else None)


@F.pandas_udf(T.BooleanType())
def robots_allows_udf(paths: pd.Series, prefixes: pd.Series) -> pd.Series:
    """True when the URL path starts with none of the disallow prefixes.

    Null/empty prefix list = fully allowed (north_rule J6 operator)."""
    out = []
    for path, prefix_list in zip(paths.tolist(), prefixes.tolist()):
        if prefix_list is None or len(prefix_list) == 0:
            out.append(True)
        else:
            p = path if path else "/"
            out.append(not any(p.startswith(pre) for pre in prefix_list))
    return pd.Series(out)


@F.pandas_udf(T.StringType())
def url_path_of(urls: pd.Series) -> pd.Series:
    """Vectorized ``urlparse(url).path`` (exact urllib semantics)."""
    from urllib.parse import urlparse

    return urls.map(lambda u: urlparse(u).path if u is not None else None)
