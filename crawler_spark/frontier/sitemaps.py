"""Sitemap ingestion: robots ``Sitemap:`` pointers and sitemap XML bodies
-> seed URLs for the frontier.

The reference crawler has no sitemap support (its seeds are hand-typed
URLs); real crawls bootstrap their frontiers from sitemaps, so this is a
north_rule-spirit source addition alongside robots.txt. Same dataflow
contract as robots.py: a fetch layer stores raw bodies alongside the
corpus, this module turns them into engine tables — parsing is a pure
function per body running in Arrow-batched ``mapInPandas``.

Contract:
- ``sitemap_lines`` extracts ``Sitemap:`` URLs from a robots.txt body
  (case-insensitive directive, ignores grouping — the RFC puts Sitemap
  outside agent groups).
- ``parse_sitemap`` handles both document kinds, namespace-tolerant:
  ``<urlset><url><loc>`` entries become ``('url', loc)`` rows and
  ``<sitemapindex><sitemap><loc>`` entries become ``('sitemap', loc)``
  rows. Malformed XML yields no rows (a crawl never dies on one bad
  sitemap).
- ``sitemap_entries`` maps a bodies table ``(host, body)`` to exploded
  ``(host, kind, loc)``; ``sitemap_seeds`` filters to ``kind='url'`` —
  index resolution is the fetch layer's loop (fetch the ``sitemap`` rows,
  append their bodies, re-run), mirroring how the crawl loop itself
  iterates waves.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import types as T

ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("loc", T.StringType()),
    ]
)


def sitemap_lines(robots_text: Optional[str]) -> List[str]:
    """``Sitemap:`` URLs from a robots.txt body — pure function."""
    if not robots_text:
        return []
    out: List[str] = []
    for raw in robots_text.splitlines():
        line = raw.split("#", 1)[0].strip()
        field, sep, value = line.partition(":")
        if sep and field.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return out


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


# DTD / entity declarations never appear in legitimate sitemaps; refusing
# them outright blocks entity-expansion (billion-laughs) bombs that expat
# < 2.4.1 would otherwise inflate inside an executor's mapInPandas batch.
_XML_DTD_RE = re.compile(r"<!\s*(?:DOCTYPE|ENTITY)", re.IGNORECASE)

# One sitemap file is capped at 50 MB uncompressed by the protocol
# (sitemaps.org); anything larger is hostile or corrupt — skip it.
_SITEMAP_MAX_CHARS = 50 * 1024 * 1024


def parse_sitemap(xml_text: Optional[str]) -> List[Tuple[str, str]]:
    """(kind, loc) entries of one sitemap document — pure function.

    kind is ``'url'`` for urlset entries, ``'sitemap'`` for index
    entries; anything unparseable, oversized, or carrying DTD/entity
    declarations yields ``[]`` — untrusted web XML must never be able to
    kill (ParseError) or blow up (entity expansion) a whole batch.
    """
    if not xml_text:
        return []
    if len(xml_text) > _SITEMAP_MAX_CHARS or _XML_DTD_RE.search(xml_text):
        return []
    try:
        root = ET.fromstring(xml_text)
    except Exception:  # noqa: BLE001 — any hostile body is just skipped
        return []
    root_kind = _local(root.tag)
    if root_kind == "urlset":
        kind, child_tag = "url", "url"
    elif root_kind == "sitemapindex":
        kind, child_tag = "sitemap", "sitemap"
    else:
        return []
    out: List[Tuple[str, str]] = []
    for child in root:
        if _local(child.tag) != child_tag:
            continue
        for loc in child:
            if _local(loc.tag) == "loc" and loc.text and loc.text.strip():
                out.append((kind, loc.text.strip()))
    return out


def sitemap_entries(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Exploded ``(host, kind, loc)`` rows from a bodies table."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                for kind, loc in parse_sitemap(body):
                    rows.append((host, kind, loc))
            yield pd.DataFrame(rows, columns=["host", "kind", "loc"])

    return bodies.select(host_col, body_col).mapInPandas(gen, ENTRY_SCHEMA)


def sitemap_seeds(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Seed URLs (``kind='url'`` entries) ready for ``bfs.crawl``."""
    from pyspark.sql import functions as F

    return (
        sitemap_entries(bodies, host_col, body_col)
        .filter(F.col("kind") == "url")
        .select(F.col("loc").alias("url"), "host")
    )


HINT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("lastmod", T.StringType()),
        T.StructField("changefreq", T.StringType()),
        T.StructField("priority", T.DoubleType()),
    ]
)

# sitemaps.org changefreq vocabulary -> a revisit interval in seconds.
# "always" still floors at an hour (a crawler that refetches a page more
# often than that is impolite by every published guideline); "never" maps
# to None and takes the schedule's max bound.
_CHANGEFREQ_SEC = {
    "always": 3600,
    "hourly": 3600,
    "daily": 86_400,
    "weekly": 7 * 86_400,
    "monthly": 30 * 86_400,
    "yearly": 365 * 86_400,
    "never": None,
}


def parse_sitemap_hints(
    xml_text: Optional[str],
) -> List[Tuple[str, Optional[str], Optional[str], Optional[float]]]:
    """Per-URL freshness hints of one urlset document:
    ``(loc, lastmod, changefreq, priority)`` — the optional sitemap
    fields the seed extractor drops. Same hostile-input contract as
    :func:`parse_sitemap` (DTD/oversize/malformed -> ``[]``); index
    documents carry no hints and yield ``[]``.
    """
    if not xml_text:
        return []
    if len(xml_text) > _SITEMAP_MAX_CHARS or _XML_DTD_RE.search(xml_text):
        return []
    try:
        root = ET.fromstring(xml_text)
    except Exception:  # noqa: BLE001
        return []
    if _local(root.tag) != "urlset":
        return []
    out = []
    for child in root:
        if _local(child.tag) != "url":
            continue
        loc, lastmod, changefreq, priority = None, None, None, None
        for f in child:
            t, v = _local(f.tag), (f.text or "").strip()
            if not v:
                continue
            if t == "loc":
                loc = v
            elif t == "lastmod":
                lastmod = v
            elif t == "changefreq":
                changefreq = v.lower()
            else:
                if t == "priority":
                    try:
                        priority = float(v)
                    except ValueError:
                        priority = None
        if loc:
            out.append((loc, lastmod, changefreq, priority))
    return out


def sitemap_hints(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Exploded ``(host, url, lastmod, changefreq, priority)`` hint rows
    from a bodies table — Arrow-batched, one pure parse per body."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                for loc, lm, cf, pr in parse_sitemap_hints(body):
                    rows.append((host, loc, lm, cf, pr))
            yield pd.DataFrame(
                rows,
                columns=["host", "url", "lastmod", "changefreq", "priority"],
            )

    return bodies.select(host_col, body_col).mapInPandas(gen, HINT_SCHEMA)


def hints_schedule(
    hints: DataFrame,
    asof_ts,
    min_interval_sec: int = 3600,
    max_interval_sec: int = 30 * 24 * 3600,
) -> DataFrame:
    """Turn sitemap hints into the recrawl-schedule shape
    ``(url, interval_sec, next_fetch_ts)`` — the publisher-declared
    counterpart of ``frontier/recrawl.py``'s observed-change estimator,
    and the cold-start schedule for URLs with no fetch lineage yet
    (feed the union to ``recrawl.due_url_hashes`` -> cuckoo deletes).

    ``interval_sec`` = the changefreq mapping clamped to the caller's
    bounds (missing/unknown changefreq -> ``max_interval_sec``, the same
    no-evidence default the estimator uses). ``next_fetch_ts`` counts
    from ``lastmod`` when the document declares one, else from
    ``asof_ts`` (explicit argument — determinism contract, no wall
    clock). Duplicate urls across sitemap files keep the soonest fetch.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    pairs = [
        x
        for cf, sec in sorted(_CHANGEFREQ_SEC.items())
        if sec is not None
        for x in (F.lit(cf), F.lit(int(sec)))
    ]
    cmap = F.create_map(*pairs)
    iv = F.least(
        F.greatest(
            F.coalesce(
                cmap[F.col("changefreq")],
                F.lit(int(max_interval_sec)),
            ),
            F.lit(int(min_interval_sec)),
        ),
        F.lit(int(max_interval_sec)),
    )
    base = F.coalesce(
        F.to_timestamp("lastmod"), F.lit(asof_ts).cast("timestamp")
    )
    out = hints.select(
        "url",
        iv.cast("long").alias("interval_sec"),
        F.timestamp_seconds(
            F.unix_timestamp(base) + iv.cast("long")
        ).alias("next_fetch_ts"),
    )
    w = F.row_number().over(
        Window.partitionBy("url").orderBy("next_fetch_ts", "interval_sec")
    )
    return out.withColumn("_rk", w).filter(F.col("_rk") == 1).drop("_rk")
