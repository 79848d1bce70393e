"""Pure-Python semantic core (no Spark imports).

Single source of truth for every byte-sensitive transform: the single-node
test oracle (tests/oracle.py) and the Spark pandas-UDF wrappers
(crawler_spark.operators.extract) both call these functions, so
oracle/engine byte-identity holds by construction. Reference semantics are
cited per function as /root/reference file:line.
"""

from crawler_spark.core.htmlparse import MiniSoup, parse_html
from crawler_spark.core.urls import get_domain, normalize_url
from crawler_spark.core.text import (
    basic_extraction,
    chunk_content,
    chunk_text,
    clean_text,
    extract_links,
    extract_links_with_text,
    extract_page,
    extract_structured_markdown,
    extract_title,
    keyword_relevance,
)

__all__ = [
    "MiniSoup",
    "parse_html",
    "normalize_url",
    "get_domain",
    "clean_text",
    "extract_title",
    "extract_links",
    "extract_links_with_text",
    "extract_structured_markdown",
    "extract_page",
    "basic_extraction",
    "keyword_relevance",
    "chunk_content",
    "chunk_text",
]
