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
