"""The per-page pipeline: fetch-result -> page record.

Transcribes the deterministic (no-LLM) path of the reference's
``scrape_page`` (/root/reference/crawler/enhanced_crawler.py:155-250):
parse once, extract title/links/markdown, relevance-gate at 0.3, attach
basic extraction when relevant. The network fetch is replaced by corpus
lookup (engine side: a join against the pages table); a missing URL
produces the reference's CrawlingError-shaped error row
(enhanced_crawler.py:244-247 + exceptions.py:7-12).

Shared verbatim by the single-node oracle and the Spark mapInPandas kernel.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

from crawler_spark.core.text import basic_extraction, extract_page, relevance

MISSING_PAGE_MESSAGE = "URL not found in corpus"
RELEVANCE_GATE = 0.3  # enhanced_crawler.py:208


def missing_page_error(url: str, message: str = MISSING_PAGE_MESSAGE) -> str:
    """Error string for a fetch miss, layered exactly like the reference:
    CrawlingError wraps as "Failed to crawl {url}: {msg}" (exceptions.py:11),
    then scrape_page prefixes "Failed to crawl page: " (enhanced_crawler.py:247).
    """
    return f"Failed to crawl page: Failed to crawl {url}: {message}"


def build_page_record(
    html: Union[str, bytes, None],
    url: str,
    instructions: Optional[str],
    timestamp: str,
) -> Dict:
    """Page record for a successfully fetched page.

    Reference enhanced_crawler.py:196-239. ``timestamp`` is supplied by the
    caller (the engine uses the page's ``warc_ts``, never wall-clock — the
    reference's ``datetime.now`` at :225/:236 is the one deliberately
    non-deterministic field we replace).
    """
    title, links, structured_markdown = extract_page(html, url)
    score, reason = relevance(structured_markdown, title, instructions)

    if score >= RELEVANCE_GATE:
        return {
            "url": url,
            "title": title,
            "markdown": structured_markdown,
            "links": links[:20],
            "relevance": {"score": score, "reason": reason},
            "ai_extracted_content": basic_extraction(html, title, url),
            "timestamp": timestamp,
        }
    return {
        "url": url,
        "title": title,
        "links": links[:20],
        "relevance": {"score": score, "reason": reason},
        "timestamp": timestamp,
    }


def build_error_record(url: str, message: str = MISSING_PAGE_MESSAGE) -> Dict:
    """Error row — reference enhanced_crawler.py:247."""
    return {"url": url, "error": missing_page_error(url, message)}
