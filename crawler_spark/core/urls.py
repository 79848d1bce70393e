"""URL normalization and domain helpers.

Reproduces the observable semantics of /root/reference/crawler/utils.py:17-37
(``normalize_url``) and :89-95 (``get_domain``/``is_same_domain``), including
the exact ``urlparse(...)._replace(fragment="").geturl()`` round-trip quirks
(e.g. ``http://h/p#`` -> ``http://h/p``; empty path preserved as-is).
"""

from __future__ import annotations

from typing import Optional
from urllib.parse import urljoin, urlparse


def normalize_url(base_url: str, link: str) -> Optional[str]:
    """Absolute-ize ``link`` against ``base_url``; keep only http(s) URLs
    with a netloc; strip the #fragment; None otherwise.

    Semantics of reference utils.py:17-37 (ValueError -> None included).
    """
    try:
        absolute_url = urljoin(base_url, link)
        parsed = urlparse(absolute_url)
        if parsed.scheme in ("http", "https") and parsed.netloc:
            return parsed._replace(fragment="").geturl()
        return None
    except ValueError:
        return None


def get_domain(url: str) -> str:
    """``urlparse(url).netloc`` — reference utils.py:89-91."""
    return urlparse(url).netloc


def is_same_domain(url1: str, url2: str) -> bool:
    """Reference utils.py:93-95."""
    return get_domain(url1) == get_domain(url2)


def canonical_url_expr(col: str) -> str:
    """SQL expression: aggressive URL canonicalization for dedup keys.

    At frontier scale the same page hides behind scheme/host case, tracking
    parameters, and query-parameter order — canonicalizing before hashing
    collapses those families into one seen-set entry. Rules (deliberately
    string-level so the whole thing is one JVM/DuckDB-portable expression,
    no Python):

    - drop the ``#fragment``;
    - lowercase the scheme and the host:port;
    - drop tracking parameters (``utm_*`` prefixes and the click ids
      ``fbclid``/``gclid``/``msclkid``);
    - sort the surviving query parameters bytewise (order-insensitive
      equality) and drop the ``?`` when none survive.

    Input must be an absolute http(s) URL as produced by
    ``normalize_url`` (the expression assumes one ``://``); path case and
    ports are preserved — case-sensitive paths are common, so collapsing
    them would merge distinct pages.
    """
    u = f"split_part({col}, '#', 1)"
    scheme = f"lower(split_part({u}, '://', 1))"
    rest = f"split_part({u}, '://', 2)"
    hostport = f"split_part(split_part({rest}, '/', 1), '?', 1)"
    after = f"substring({rest}, length({hostport}) + 1)"
    path = f"split_part({after}, '?', 1)"
    q = f"CASE WHEN instr({after}, '?') > 0 THEN substring({after}, instr({after}, '?') + 1) ELSE '' END"
    keep = (
        f"filter(split({q}, '&'), p -> p <> '' "
        f"AND substring(p, 1, 4) <> 'utm_' "
        f"AND NOT split_part(p, '=', 1) IN ('fbclid', 'gclid', 'msclkid'))"
    )
    q2 = f"array_join(array_sort({keep}), '&')"
    return (
        f"concat({scheme}, '://', lower({hostport}), {path}, "
        f"CASE WHEN {q2} = '' THEN '' ELSE concat('?', {q2}) END)"
    )


def surt_key_expr(col: str) -> str:
    """SQL expression: SURT key (Sort-friendly URI Reordering Transform).

    The key format of web-archive CDX(-J) indexes: the host is reversed
    label-by-label and comma-joined so that a lexicographic sort groups a
    whole registrable domain (``com,example``, ``com,example,shop``, ...)
    into one contiguous run — which is what makes a 100 TB archive's index
    binary-searchable by host/domain prefix. ``https://www.Shop.Example.com
    :443/A/b?B=2&a=1`` -> ``com,example,shop)/a/b?a=1&b=2``.

    Rules (deliberately string-level, one JVM/DuckDB-portable expression,
    no Python — the same stance as :func:`canonical_url_expr`):

    - drop the ``#fragment`` and the scheme;
    - lowercase everything (host, path, and query — archive keys are
      case-folded wholesale, unlike :func:`canonical_url_expr` which
      preserves path case for live-crawl identity);
    - drop a default ``:80``/``:443`` port; keep any other port attached
      after the reversed host (``com,example:8080)/``);
    - strip one leading ``www.`` label when at least two labels remain;
    - reverse the host labels, join with ``,``;
    - empty path becomes ``/``;
    - query parameters split on ``&``, empties dropped, sorted bytewise,
      re-joined (order-insensitive equality), ``?`` dropped when none
      survive.

    Input contract: an absolute http(s) URL as produced by
    ``normalize_url`` (one ``://``).
    """
    u = f"split_part({col}, '#', 1)"
    rest = f"split_part({u}, '://', 2)"
    hostport_raw = f"split_part(split_part({rest}, '/', 1), '?', 1)"
    after = f"substring({rest}, length({hostport_raw}) + 1)"
    hp = f"regexp_replace(lower({hostport_raw}), ':(80|443)$', '')"
    host = f"split_part({hp}, ':', 1)"
    port = (
        f"CASE WHEN instr({hp}, ':') > 0 "
        f"THEN substring({hp}, instr({hp}, ':')) ELSE '' END"
    )
    host2 = (
        f"CASE WHEN {host} LIKE 'www.%.%' "
        f"THEN substring({host}, 5) ELSE {host} END"
    )
    rev = f"array_join(reverse(split({host2}, '[.]')), ',')"
    path = f"lower(split_part({after}, '?', 1))"
    path2 = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    q = (
        f"CASE WHEN instr({after}, '?') > 0 "
        f"THEN lower(substring({after}, instr({after}, '?') + 1)) "
        f"ELSE '' END"
    )
    keep = f"filter(split({q}, '&'), p -> p <> '')"
    q2 = f"array_join(array_sort({keep}), '&')"
    return (
        f"concat({rev}, {port}, ')', {path2}, "
        f"CASE WHEN {q2} = '' THEN '' ELSE concat('?', {q2}) END)"
    )


# Two-label public suffixes a crawler meets constantly. Deliberately a
# compact built-in subset of the PSL (the full list is a data file a
# deployment can swap in): enough that co.uk/com.au-style hosts group by
# the actual registrant instead of by country registry.
TWO_LABEL_SUFFIXES = [
    "ac.uk", "co.uk", "gov.uk", "org.uk",
    "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au",
    "com.ar", "com.br", "com.cn", "com.hk", "com.mx",
    "com.sg", "com.tr", "com.tw",
    "co.in", "co.kr", "co.nz", "co.za",
]


def registrable_domain_expr(host_col: str) -> str:
    """SQL expression: registrable domain (eTLD+1) of a lowercase host.

    The grouping key politeness, reputation, and mirror detection should
    really use: ``a.shop.example.co.uk`` and ``b.example.co.uk`` are one
    registrant, while plain last-two-labels grouping would call them
    ``co.uk`` — merging every UK company into one politeness bucket.

    Rules (pure JVM/DuckDB-portable string expression, no Python):
    - IPv4 literals pass through unchanged;
    - one- or two-label hosts pass through unchanged;
    - if the last two labels are a known two-label public suffix
      (``TWO_LABEL_SUFFIXES``), keep the last three labels;
    - otherwise keep the last two.

    Input contract: an already-lowercased bare host (no scheme, port, or
    path) — what ``canonical_url_expr``'s host step or
    ``parse_url(url, 'HOST')`` produce.
    """
    parts = f"split({host_col}, '[.]')"
    last2 = (
        f"concat(element_at({parts}, -2), '.', element_at({parts}, -1))"
    )
    last3 = f"concat(element_at({parts}, -3), '.', {last2})"
    inlist = ", ".join(f"'{s}'" for s in TWO_LABEL_SUFFIXES)
    return (
        f"CASE WHEN {host_col} rlike '^[0-9]+(\\\\.[0-9]+){{3}}$' THEN {host_col} "
        f"WHEN size({parts}) <= 2 THEN {host_col} "
        f"WHEN {last2} IN ({inlist}) THEN {last3} "
        f"ELSE {last2} END"
    )
