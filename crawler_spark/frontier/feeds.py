"""RSS/Atom feed ingestion: feed XML bodies -> dated seed URLs for the
frontier, plus in-HTML feed autodiscovery.

The reference crawler has no feed support (its seeds are hand-typed
URLs); production crawls poll feeds because they are the freshest
publisher-declared change signal there is — a feed entry IS "this URL
changed at this time", hours ahead of any sitemap ``lastmod`` and days
ahead of the observed-change estimator (`frontier/recrawl.py`). Same
dataflow contract as `sitemaps.py` / `robots.py`: a fetch layer stores
raw bodies alongside the corpus, this module turns them into engine
tables — parsing is a pure function per body running in Arrow-batched
``mapInPandas``, and every hostile-input refusal the sitemap parser
applies (DTD/entity bombs, oversized bodies, malformed XML -> no rows,
never a dead batch) applies here unchanged.

Contract:
- ``parse_feed`` handles RSS 2.0 (``<rss><channel><item>``: ``<link>``
  text, ``<title>``, RFC-822 ``<pubDate>``) and Atom (``<feed><entry>``:
  first ``<link href>`` whose ``rel`` is absent or ``alternate``,
  ``<title>``, ISO-8601 ``<updated>``/``<published>``), namespace- and
  case-tolerant; unparseable dates yield a null timestamp, never a dead
  entry.
- ``feed_entries`` maps a bodies table ``(host, body)`` to exploded
  ``(host, feed_kind, url, title, published_ts)``.
- ``feed_seeds`` dedups to one row per URL with the NEWEST
  ``published_ts`` (deterministic window, not ``dropDuplicates``) —
  ready for ``bfs.crawl`` seeds and for freshness-ranked frontier
  priority.
- ``extract_feed_links`` (re-exported from `core/text.py` semantics) is
  the autodiscovery half: ``<link rel="alternate" type="application/
  rss+xml|atom+xml" href>`` elements in a crawled page, so a crawl can
  bootstrap its own feed list.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.frontier.sitemaps import _SITEMAP_MAX_CHARS, _XML_DTD_RE, _local

FEED_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("feed_kind", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("published_ts", T.TimestampType()),
    ]
)


def _parse_rfc822(value: Optional[str]) -> Optional[datetime]:
    if not value or not value.strip():
        return None
    try:
        dt = parsedate_to_datetime(value.strip())
    except Exception:  # noqa: BLE001 — bad dates are null, not fatal
        return None
    return _to_utc_naive(dt)


def _parse_iso8601(value: Optional[str]) -> Optional[datetime]:
    if not value or not value.strip():
        return None
    try:
        dt = datetime.fromisoformat(value.strip().replace("Z", "+00:00"))
    except Exception:  # noqa: BLE001
        return None
    return _to_utc_naive(dt)


def _to_utc_naive(dt: Optional[datetime]) -> Optional[datetime]:
    """Session timezone is UTC repo-wide: timestamps cross into Spark as
    naive UTC values (the same convention the datagen corpus uses)."""
    if dt is None:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def _text_of(el) -> Optional[str]:
    return el.text.strip() if el is not None and el.text and el.text.strip() else None


def parse_feed(
    xml_text: Optional[str],
) -> List[Tuple[str, str, Optional[str], Optional[datetime]]]:
    """(feed_kind, url, title, published_ts) entries of one feed document
    — pure function. Entries without a resolvable link are skipped;
    anything unparseable, oversized, or carrying DTD/entity declarations
    yields ``[]`` (same refusal set as ``parse_sitemap``)."""
    if not xml_text:
        return []
    if len(xml_text) > _SITEMAP_MAX_CHARS or _XML_DTD_RE.search(xml_text):
        return []
    try:
        root = ET.fromstring(xml_text)
    except Exception:  # noqa: BLE001 — hostile bodies are skipped
        return []
    root_kind = _local(root.tag)
    out: List[Tuple[str, str, Optional[str], Optional[datetime]]] = []
    if root_kind == "rss":
        for channel in root:
            if _local(channel.tag) != "channel":
                continue
            for item in channel:
                if _local(item.tag) != "item":
                    continue
                link = title = pub = None
                for c in item:
                    tag = _local(c.tag)
                    if tag == "link" and link is None:
                        link = _text_of(c)
                    elif tag == "title" and title is None:
                        title = _text_of(c)
                    elif tag == "pubdate" and pub is None:
                        pub = _text_of(c)
                if link:
                    out.append(("rss", link, title, _parse_rfc822(pub)))
    elif root_kind == "feed":
        for entry in root:
            if _local(entry.tag) != "entry":
                continue
            link = title = stamp = None
            published = updated = None
            for c in entry:
                tag = _local(c.tag)
                if tag == "link" and link is None:
                    rel = (c.get("rel") or "alternate").strip().lower()
                    href = (c.get("href") or "").strip()
                    if rel == "alternate" and href:
                        link = href
                elif tag == "title" and title is None:
                    title = _text_of(c)
                elif tag == "updated":
                    updated = _text_of(c)
                elif tag == "published":
                    published = _text_of(c)
            stamp = updated if updated is not None else published
            if link:
                out.append(("atom", link, title, _parse_iso8601(stamp)))
    return out


def feed_entries(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Exploded ``(host, feed_kind, url, title, published_ts)`` rows from
    a feed-bodies table — Arrow-batched, one parse per body, scales with
    the bodies table's partitioning."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                for kind, url, title, ts in parse_feed(body):
                    rows.append((host, kind, url, title, ts))
            yield pd.DataFrame(
                rows,
                columns=["host", "feed_kind", "url", "title", "published_ts"],
            )

    return bodies.select(host_col, body_col).mapInPandas(gen, FEED_ENTRY_SCHEMA)


def feed_seeds(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """One seed row per URL with the newest ``published_ts`` across every
    feed that mentions it (a syndicated post appears in many feeds; the
    newest stamp is the freshness signal). Deterministic newest-wins via a
    window keyed ``(published_ts desc nulls last, host, feed_kind)`` —
    never ``dropDuplicates``. Output ``(url, host, published_ts)`` ready
    for ``bfs.crawl`` seeds or a freshness-ranked priority scorer."""
    from pyspark.sql import Window

    e = feed_entries(bodies, host_col, body_col)
    w = Window.partitionBy("url").orderBy(
        F.col("published_ts").desc_nulls_last(), "host", "feed_kind"
    )
    return (
        e.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("url", "host", "published_ts")
    )
