"""Inbound anchor-text aggregation over the crawl link stream.

Anchor text — the words other pages use when linking to a URL — is a
classic crawl-prioritization and retrieval signal (it is how search
engines describe pages they have not fetched yet, and anchor corpora like
ORCAS are built exactly this way). The reference crawler extracts hrefs
only (enhanced_crawler.py:77-86); this module goes beyond it with the
standard web-corpus shape:

1. ``extract_anchors``: pages -> exploded ``(src_url, dst_url, anchor)``
   stream. Parsing runs in the same Arrow-batched ``mapInPandas`` style as
   the page-extraction kernel — one ``parse_html`` per page, every
   ``<a href>`` occurrence kept (no first-wins dedup: multiplicity IS the
   signal), hrefs normalized with the same ``normalize_url`` the frontier
   uses, anchor text ``get_text(" ", strip=True)`` + ``clean_text``.

2. ``anchor_text_stats``: the aggregation. Scale shape (the part that must
   survive 100 TB): the raw stream first combines on ``(dst, anchor)`` —
   map-side partial aggregation collapses the billions-of-rows link stream
   to unique (target, anchor-string) pairs before any wide exchange, so a
   hot target (every site's homepage) costs proportional to its *distinct*
   anchor vocabulary, not its inbound-edge count. Distinct-source counting
   is a separate ``(dst, src_host)``-combined aggregate joined back on
   ``dst`` — never a ``collect_set`` of sources into one row. Top-anchor
   selection is a bounded per-``dst`` window over the already-collapsed
   pair table with a deterministic tie-break (count desc, anchor asc).
   Everything is JVM expression code; Python touches only the HTML bytes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

ANCHOR_SCHEMA = T.StructType(
    [
        T.StructField("src_url", T.StringType(), False),
        T.StructField("dst_url", T.StringType(), False),
        T.StructField("anchor", T.StringType(), False),
    ]
)


def extract_anchors(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages(url, html) -> one row per ``<a href>`` occurrence.

    Arrow-batched; one parse per page feeds all its anchors. Pages with
    NULL/unparseable html contribute no rows (the crawl records the error
    elsewhere); fragment-only and non-http(s) hrefs are dropped by
    ``normalize_url`` exactly as on the frontier path.
    """
    src = pages.select(
        F.col(url_col).alias("src_url"),
        F.col(html_col).cast("binary").alias("html"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from crawler_spark.core.htmlparse import parse_html
        from crawler_spark.core.text import extract_links_with_text

        for pdf in batches:
            srcs, dsts, anchors = [], [], []
            for url, html in zip(pdf["src_url"].tolist(), pdf["html"].tolist()):
                if html is None:
                    continue
                for dst, anchor in extract_links_with_text(parse_html(html), url):
                    srcs.append(url)
                    dsts.append(dst)
                    anchors.append(anchor)
            yield pd.DataFrame(
                {"src_url": srcs, "dst_url": dsts, "anchor": anchors}
            )

    return src.mapInPandas(run, schema=ANCHOR_SCHEMA)


def anchor_text_stats(
    links: DataFrame,
    dst_col: str = "dst_url",
    src_col: str = "src_url",
    anchor_col: str = "anchor",
    sample_k: int = 3,
) -> DataFrame:
    """Per-target inbound anchor statistics.

    Output per ``dst_url``: ``n_anchors`` (inbound occurrences),
    ``n_unique_anchors`` (distinct anchor strings), ``n_src_urls``
    (distinct linking pages), ``top_anchor``/``top_anchor_count`` (modal
    anchor, ties broken lexicographically — deterministic at any
    parallelism), and ``anchor_sample`` (the ``sample_k`` most frequent
    anchors in rank order, '\\x1f'-joined so the row stays hashable).

    Two aggregation exchanges plus one ``dst``-keyed join; both aggregates
    partially combine map-side, so per-row state is bounded by the distinct
    (dst, anchor) / (dst, src) vocabularies, never by raw edge count.
    """
    dst, src, anc = F.col(dst_col), F.col(src_col), F.col(anchor_col)

    per_pair = links.groupBy(dst.alias("dst_url"), anc.alias("anchor")).agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("dst_url").orderBy(
        F.col("cnt").desc(), F.col("anchor").asc()
    )
    ranked = per_pair.withColumn("rn", F.row_number().over(w))
    stats = ranked.groupBy("dst_url").agg(
        F.sum("cnt").alias("n_anchors"),
        F.count("*").alias("n_unique_anchors"),
        F.max(F.when(F.col("rn") == 1, F.col("anchor"))).alias("top_anchor"),
        F.max(F.when(F.col("rn") == 1, F.col("cnt"))).alias("top_anchor_count"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("rn") <= sample_k,
                            F.struct(F.col("rn"), F.col("anchor")),
                        )
                    )
                ),
                lambda s: s["anchor"],
            ),
            "\x1f",
        ).alias("anchor_sample"),
    )
    srcs = links.groupBy(dst.alias("dst_url")).agg(
        F.countDistinct(src).alias("n_src_urls")
    )
    return stats.join(srcs, "dst_url")


def host_anchor_relevance(
    links: DataFrame,
    instructions: str,
    dst_col: str = "dst_url",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Per-destination-HOST anchor relevance vs instruction keywords.

    Focused-crawling signal (Chakrabarti et al. 1999): how other pages
    describe a host predicts whether its unfetched pages are on-topic.
    Keywords come from the reference's ``derive_keywords`` rule (len > 3,
    26-stopword set — ai_processor.py:126-127); the score per host is the
    fraction of keywords appearing as substrings in the host's inbound
    anchor text, matching the reference's substring (not word-boundary)
    convention.

    Aggregated at HOST granularity deliberately: a URL-keyed table is
    frontier-sized and could never broadcast, while hosts are bounded —
    the output drops into the same broadcast-scorer seam PageRank uses.
    Matching runs as JVM ``contains`` expressions over one concatenated
    distinct-anchor string per host; the keyword list is a driver-side
    literal (instructions are always small).
    """
    from crawler_spark.core.text import derive_keywords

    keywords = derive_keywords(instructions)
    host = F.parse_url(F.col(dst_col), F.lit("HOST")).alias("dst_host")
    per_host = (
        links.select(host, F.lower(F.col(anchor_col)).alias("anchor"))
        .distinct()
        .groupBy("dst_host")
        .agg(F.concat_ws(" \x1f ", F.sort_array(F.collect_set("anchor"))).alias("_blob"))
    )
    if not keywords:
        return per_host.select(
            "dst_host", F.lit(0.5).alias("anchor_relevance")
        )
    hits = sum(
        (F.col("_blob").contains(F.lit(kw))).cast("int") for kw in keywords
    )
    return per_host.select(
        "dst_host", (hits / F.lit(len(keywords))).alias("anchor_relevance")
    )


def anchor_priority_scorer(host_relevance: DataFrame):
    """Adapt :func:`host_anchor_relevance` output into the W3
    ``CrawlConfig.priority_scorer`` seam — identical broadcast shape to
    ``pagerank_priority_scorer`` (`operators/graph.py`): the table is
    host-count-sized, the frontier never shuffles for scoring, unknown
    hosts keep the default priority."""
    table = host_relevance.select(
        F.col("dst_host").alias("_ar_host"),
        F.col("anchor_relevance").alias("_ar_score"),
    )

    def scorer(new_rows: DataFrame) -> DataFrame:
        return (
            new_rows.join(
                F.broadcast(table),
                new_rows["host"] == table["_ar_host"],
                "left",
            )
            .withColumn(
                "priority", F.coalesce(F.col("_ar_score"), F.col("priority"))
            )
            .drop("_ar_host", "_ar_score")
        )

    return scorer
