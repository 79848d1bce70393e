"""Per-page deterministic extraction functions.

Each function reproduces the observable behavior of the cited reference code
(/root/reference), quirks included. These run inside Arrow-batched pandas
UDFs on the Spark side and directly in the single-node test oracle — the
same bytes come out of both by construction.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple, Union

from crawler_spark.core.htmlparse import MiniSoup, parse_html
from crawler_spark.core.urls import normalize_url

_WS_RE = re.compile(r"\s+")  # Python re: Unicode \s (NBSP, ideographic space, ...)


def clean_text(text: str) -> str:
    """Collapse all Unicode whitespace runs to single spaces and strip.

    Reference crawler/utils.py:39-45. Kept in Python (not Spark
    ``regexp_replace``) because Java's ``\\s`` is ASCII-only.
    """
    return _WS_RE.sub(" ", text).strip()


def extract_title(soup: MiniSoup) -> str:
    """First <title> text, else first <h1>, else "No title found".

    Reference crawler/enhanced_crawler.py:68-75. Note the reference checks
    truthiness of the raw ``.text`` but returns ``clean_text(...)`` — a
    whitespace-only title is truthy raw, so it yields "" (not the h1
    fallback); reproduced exactly.
    """
    title_tag = soup.find("title")
    if title_tag is not None and title_tag.text:
        return clean_text(title_tag.text)
    h1_tag = soup.find("h1")
    if h1_tag is not None and h1_tag.text:
        return clean_text(h1_tag.text)
    return "No title found"


_REL_SPLIT = re.compile(r"[,\s]+")


def extract_robots_directives(soup: MiniSoup) -> Tuple[bool, bool]:
    """``(noindex, nofollow)`` from ``<meta name="robots" content=...>``.

    Beyond the reference (it has no robots-meta handling); semantics follow
    the de-facto REP meta standard: tokens are comma/space separated and
    case-insensitive, ``none`` means both directives, multiple robots metas
    OR together (the conservative/restrictive union every major crawler
    applies when directives conflict).
    """
    noindex = nofollow = False
    for m in soup.find_all("meta"):
        if (m.get("name") or "").strip().lower() != "robots":
            continue
        toks = {
            t.strip().lower()
            for t in _REL_SPLIT.split(m.get("content") or "")
        }
        if "none" in toks:
            noindex = nofollow = True
        noindex = noindex or "noindex" in toks
        nofollow = nofollow or "nofollow" in toks
    return noindex, nofollow


def extract_link_rels(soup: MiniSoup, base_url: str) -> List[bool]:
    """Per-link ``rel=nofollow`` flags, index-aligned with
    :func:`extract_links`' output: the same document-order walk and
    first-wins dedup, so ``flags[i]`` describes ``links[i]`` — and when a
    URL appears more than once, the FIRST occurrence's rel decides (the
    same survivor extract_links keeps)."""
    flags: List[bool] = []
    seen = set()
    for a_tag in soup.find_all("a", href=True):
        normalized = normalize_url(base_url, a_tag["href"])
        if normalized and normalized not in seen:
            seen.add(normalized)
            toks = {
                t.strip().lower()
                for t in _REL_SPLIT.split(a_tag.get("rel") or "")
            }
            flags.append("nofollow" in toks)
    return flags


def extract_canonical_url(soup: MiniSoup, base_url: str) -> Optional[str]:
    """The page's declared canonical URL from ``<link rel="canonical"
    href=...>``, or ``None``.

    Beyond the reference (no link-element handling); semantics follow
    production-crawler convention: the FIRST canonical link element in
    document order decides (later ones are author mistakes every major
    indexer ignores), ``rel`` is a case-insensitive space/comma-separated
    token list (``rel="canonical alternate"`` still counts), the href
    resolves relative to the page URL through the same
    :func:`normalize_url` gate as extracted links — so fragments strip and
    non-http(s) or malformed hrefs yield ``None`` rather than a bogus
    alias edge."""
    for link_tag in soup.find_all("link", href=True):
        toks = {
            t.strip().lower()
            for t in _REL_SPLIT.split(link_tag.get("rel") or "")
        }
        if "canonical" in toks:
            return normalize_url(base_url, link_tag["href"])
    return None


def extract_html_lang(soup: MiniSoup) -> Optional[str]:
    """The page's declared language from ``<html lang>`` (fallback
    ``xml:lang``), lowercased BCP-47 tag, or ``None``.

    Beyond the reference (no language handling anywhere); the declared
    tag is the cheap high-precision signal CC-style pipelines cross-check
    against content language-ID (`operators/text_analysis.lang_id`) —
    agreement boosts confidence, disagreement flags mislabeled or
    template-translated pages. Empty/whitespace values are ``None``;
    case folds because BCP-47 comparison is case-insensitive."""
    el = soup.find("html")
    if el is None:
        return None
    v = el.get("lang") or el.get("xml:lang")
    if not v or not v.strip():
        return None
    return v.strip().lower()


_FEED_TYPES = {"application/rss+xml", "application/atom+xml"}


def extract_feed_links(soup: MiniSoup, base_url: str) -> List[str]:
    """RSS/Atom feed URLs autodiscovered from ``<link rel="alternate"
    type="application/rss+xml|atom+xml" href=...>`` elements, in document
    order with first-wins dedup — the bootstrap half of
    `frontier/feeds.py` (a crawl discovers its own feed list from the
    pages it already fetched). Hrefs resolve through :func:`normalize_url`
    like every other extracted link."""
    out: List[str] = []
    seen = set()
    for link_tag in soup.find_all("link", href=True):
        toks = {
            t.strip().lower()
            for t in _REL_SPLIT.split(link_tag.get("rel") or "")
        }
        mime = (link_tag.get("type") or "").strip().lower()
        if "alternate" in toks and mime in _FEED_TYPES:
            normalized = normalize_url(base_url, link_tag["href"])
            if normalized and normalized not in seen:
                seen.add(normalized)
                out.append(normalized)
    return out


def extract_links(soup: MiniSoup, base_url: str) -> List[str]:
    """All <a href> in document order -> normalized, order-preserving dedup.

    Reference crawler/enhanced_crawler.py:77-86.
    """
    links: List[str] = []
    seen = set()
    for a_tag in soup.find_all("a", href=True):
        normalized = normalize_url(base_url, a_tag["href"])
        if normalized and normalized not in seen:
            seen.add(normalized)
            links.append(normalized)
    return links


def extract_links_with_text(soup: MiniSoup, base_url: str) -> List[tuple]:
    """All ``<a href>`` in document order -> ``(normalized_url, anchor_text)``.

    Same traversal and normalization as :func:`extract_links` (reference
    crawler/enhanced_crawler.py:77-86) but keeps EVERY occurrence — no
    first-wins dedup — and pairs each link with its anchor text
    (``get_text(" ", strip=True)`` over the <a> subtree, then
    :func:`clean_text`). Multiplicity is an aggregation concern: inbound
    anchor-text statistics need the raw (src, dst, anchor) stream, not the
    per-page deduped link list the crawl frontier uses.
    """
    pairs: List[tuple] = []
    for a_tag in soup.find_all("a", href=True):
        normalized = normalize_url(base_url, a_tag["href"])
        if normalized:
            pairs.append((normalized, clean_text(a_tag.get_text(" ", strip=True))))
    return pairs


def extract_structured_markdown(soup: MiniSoup) -> str:
    """Document-order h1/h2/h3/p/ul/ol/li/pre/code -> markdown lines.

    Reference crawler/enhanced_crawler.py:88-107 — quirks reproduced:
    ``ul``/``ol`` are matched but have no emit branch (they contribute
    nothing); nested elements emit twice (a ``p`` inside ``li`` appears in
    the li line and as its own line; ``code`` inside ``pre`` yields two
    fenced blocks); text is ``get_text(" ", strip=True)`` then
    ``clean_text``; empties skipped; joined with a blank line.
    """
    lines: List[str] = []
    for tag in soup.find_all(["h1", "h2", "h3", "p", "ul", "ol", "li", "pre", "code"]):
        name = tag.name.lower()
        # memoized (sep=" ", strip=True) text: nested tags (li>p, pre>code)
        # re-read overlapping subtrees
        text = clean_text(tag.get_text_sep_strip())
        if not text:
            continue
        if name == "h1":
            lines.append(f"# {text}")
        elif name == "h2":
            lines.append(f"## {text}")
        elif name == "h3":
            lines.append(f"### {text}")
        elif name == "p":
            lines.append(text)
        elif name == "li":
            lines.append(f"- {text}")
        elif name == "pre" or name == "code":
            lines.append(f"```\n{text}\n```")
    return "\n\n".join(lines)


def extract_page(
    html: Union[str, bytes, None], url: str, soup: Optional[MiniSoup] = None
) -> Tuple[str, List[str], str]:
    """One parse, three outputs: (title, links, structured_markdown).

    Mirrors the per-page sequence at reference enhanced_crawler.py:196-199.
    Pass ``soup`` to reuse an existing parse (the reference parses each page
    twice — here and in ai_processor — which costs nothing semantically but
    doubles the dominant CPU cost of a crawl; output is byte-identical
    either way since it is the same parser over the same bytes).
    """
    soup = soup if soup is not None else parse_html(html)
    return (
        extract_title(soup),
        extract_links(soup, base_url=url),
        extract_structured_markdown(soup),
    )


def basic_extraction(
    html: Union[str, bytes, None], title: str, url: str,
    soup: Optional[MiniSoup] = None,
) -> Dict:
    """Deterministic (no-LLM) structured-content extraction.

    Reference crawler/ai_processor.py:233-278: paragraphs with
    ``len(p.text.strip()) > 50``, headings h1-h3 (non-empty), list items
    with ``len > 10``; summary counts; headings[:5] as key_points;
    paragraphs[:10]; list_items[:20]; relevance_score fixed 0.5.
    Pass ``soup`` to reuse an existing parse (see extract_page).
    """
    soup = soup if soup is not None else parse_html(html)

    paragraphs = []
    for p in soup.find_all("p"):
        stripped = p.text.strip()
        if p.text and len(stripped) > 50:
            paragraphs.append(stripped)

    headings = []
    for h in soup.find_all(["h1", "h2", "h3"]):
        stripped = h.text.strip()
        if h.text and len(stripped) > 0:
            headings.append(stripped)

    summary = f"Page titled '{title}' with {len(paragraphs)} paragraphs and {len(headings)} headings."

    list_items = []
    for li in soup.find_all("li"):
        stripped = li.text.strip()
        if li.text and len(stripped) > 10:
            list_items.append(stripped)

    return {
        "source_url": url,
        "source_title": title,
        "summary": summary,
        "key_points": headings[:5],
        "relevance_score": 0.5,
        "paragraphs": paragraphs[:10],
        "list_items": list_items[:20],
    }


# 26-word stopword set — reference crawler/ai_processor.py:119-124, verbatim
# as data (it is the observable contract, not code).
STOPWORDS = frozenset(
    {
        "a", "an", "the", "and", "or", "but", "if", "because", "as", "what",
        "when", "where", "how", "is", "are", "was", "were", "be", "been",
        "being", "have", "has", "had", "do", "does", "did", "to", "from",
        "in", "out", "get", "find", "extract", "information", "about",
    }
)


def derive_keywords(instructions: str) -> List[str]:
    """Lowercase whitespace split; keep len>3 and not-stopword.

    Reference crawler/ai_processor.py:126-127.
    """
    return [w for w in instructions.lower().split() if len(w) > 3 and w not in STOPWORDS]


def keyword_relevance(content: str, title: str, instructions: str) -> Tuple[float, str]:
    """Keyword-count relevance score with banded reasons.

    Reference crawler/ai_processor.py:101-150: substring (not word-boundary)
    matching against lowercased title/content; score
    ``(3*title_matches + content_matches) / (4*len(keywords))`` clamped to
    [0,1]; empty keywords -> (0.5, "No specific keywords found in
    instructions"); bands >0.7 / >0.4 / else.
    """
    content_lower = content.lower()
    title_lower = title.lower()
    keywords = derive_keywords(instructions)
    if not keywords:
        return (0.5, "No specific keywords found in instructions")

    title_matches = sum(1 for kw in keywords if kw in title_lower)
    content_matches = sum(1 for kw in keywords if kw in content_lower)
    score = (title_matches * 3 + content_matches) / (len(keywords) * 4)
    score = min(max(score, 0.0), 1.0)

    if score > 0.7:
        reason = "High keyword match in title and content"
    elif score > 0.4:
        reason = "Moderate keyword match"
    else:
        reason = "Low keyword match"
    return (score, reason)


def relevance(
    markdown: str, title: str, instructions: Optional[str]
) -> Tuple[float, str]:
    """Relevance gate input: 5000-char sample when instructed, else (1.0,
    "No instructions"). Reference enhanced_crawler.py:201-206."""
    if not instructions:
        return (1.0, "No instructions")
    return keyword_relevance(markdown[:5000], title, instructions)


def chunk_content(content: str, chunk_size: int = 1000, overlap: int = 100) -> List[str]:
    """Overlapping RAG chunker — reference enhanced_crawler.py:410-446.

    Break preference inside [start, start+size): last "\\n\\n", else last
    ". ", else last " ", else hard cut at end; a found break advances past
    one char (``break_point += 1``); next window starts at
    ``break_point - overlap`` — which may go NEGATIVE (the reference then
    relies on Python's negative-index ``rfind``/slice semantics, typically
    emitting an empty chunk and recovering); transcribed as-is.

    One deviation: when the next start lands in ``[0, start]`` the reference
    re-finds the same break forever (provable fixpoint — it never returns on
    such input). We force a one-char advance there, plus an absolute
    iteration fuse; tests pin both the literal behavior and the guard.
    """
    chunks: List[str] = []
    start = 0
    content_length = len(content)
    fuse = 4 * content_length + 16

    while start < content_length:
        fuse -= 1
        end = start + chunk_size
        if end >= content_length:
            chunks.append(content[start:])
            break

        break_point = content.rfind("\n\n", start, end)
        if break_point == -1:
            break_point = content.rfind(". ", start, end)
        if break_point == -1:
            break_point = content.rfind(" ", start, end)
        if break_point == -1:
            break_point = end
        else:
            break_point += 1  # include the space/period

        chunks.append(content[start:break_point])
        next_start = break_point - overlap
        if (0 <= next_start <= start) or fuse <= 0:
            # reference fixpoint: same window, same break, forever — force
            # minimal forward progress (documented deviation; the reference
            # emits nothing at all here because it never returns)
            next_start = start + 1
        start = next_start

    return chunks


def chunk_text(text: str, chunk_size: int = 5000) -> List[str]:
    """Non-overlapping chunker — reference crawler/utils.py:47-87 (defined
    there but never called; kept as a second strategy flag)."""
    chunks: List[str] = []
    start = 0
    text_length = len(text)

    while start < text_length:
        end = min(start + chunk_size, text_length)
        if end < text_length:
            paragraph_break = text.rfind("\n\n", start, end)
            if paragraph_break != -1:
                end = paragraph_break + 2
            else:
                sentence_break = text.rfind(". ", start, end)
                if sentence_break != -1:
                    end = sentence_break + 2
                else:
                    space_break = text.rfind(" ", start, end)
                    if space_break != -1:
                        end = space_break + 1
        chunks.append(text[start:end])
        start = end

    return chunks


# --- block segmentation (boilerpipe-style main-content extraction) --------

# Block-level tags end the current text block; everything else (a, b, i,
# em, span, code, ...) flows inline. Void separators (br, hr) split too.
_BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd table thead tbody tfoot tr "
    "td th blockquote pre article section header footer nav aside main "
    "figure figcaption form fieldset address center hr br".split()
)
# Subtrees that contribute no visible words at all.
_NONTEXT_TAGS = frozenset("script style noscript template head title svg".split())


def extract_text_blocks(soup) -> List[tuple]:
    """Segment a parsed page into visible text blocks.

    Returns ``[(text, n_words, n_linked_words), ...]`` in document order —
    the shallow-feature input of boilerpipe-style boilerplate detection
    (Kohlschuetter, Fankhauser, Nejdl — WSDM 2010). A *block* is the text
    between block-level tag boundaries; inline markup (``<a>``, ``<b>``,
    ``<span>``, ...) does not split. Words are whitespace tokens, joined
    back with single spaces; a word is *linked* when its text node sits
    inside an ``<a>`` subtree. Empty blocks are dropped, so ``n_words >= 1``
    always.

    One linear pass over the parser's flat pre-order node list — O(nodes),
    no recursion, no re-reading of subtrees.
    """
    from crawler_spark.core.htmlparse import Element

    doc = soup._doc
    end = soup._end
    blocks: List[tuple] = []
    words: List[str] = []
    linked = 0

    def flush() -> None:
        nonlocal linked
        if words:
            blocks.append((" ".join(words), len(words), linked))
            words.clear()
            linked = 0

    end_stack: List[int] = []
    link_until = -1
    i = soup._pos + 1
    while i < end:
        while end_stack and end_stack[-1] <= i:
            end_stack.pop()
            flush()
        node = doc[i]
        if node.__class__ is str:
            in_link = i < link_until
            for w in node.split():
                words.append(w)
                if in_link:
                    linked += 1
            i += 1
            continue
        name = node.name
        if name in _NONTEXT_TAGS:
            i = node._end
            continue
        if name in _BLOCK_TAGS:
            flush()
            end_stack.append(node._end)
        elif name == "a":
            link_until = max(link_until, node._end)
        i += 1
    flush()
    return blocks
