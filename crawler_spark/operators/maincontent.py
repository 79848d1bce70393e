"""Boilerpipe-style main-content extraction (block-level boilerplate strip).

"Boilerplate Detection using Shallow Text Features" (Kohlschuetter,
Fankhauser, Nejdl — WSDM 2010): segment the page into text blocks, then
classify each block as content or boilerplate from just three shallow
features — its own link density, and the word counts / link density of
the neighboring blocks. This is the *structural* half of boilerplate
removal: `filters.host_boilerplate_lines` removes lines because they
repeat across a host; this removes navigation/footer/sidebar blocks from
a single page with no corpus statistics at all, which is exactly what a
crawler needs on the first page it ever sees from a host. The reference's
extractor keeps full structured markdown (crawler/utils.py); the
north-star's "boilerplate stripping" step is this operator.

Split of work (the 100 TB shape):

- **Segmentation** is the only Python: one Arrow-batched ``mapInPandas``
  pass, one parse per page (same kernel budget as the extract path),
  emitting a bounded ``array<struct<text, n_words, n_linked>>`` column.
- **Classification** is pure JVM: the published decision tree
  (boilerpipe's ``NumWordsRulesClassifier``, the core of its
  DefaultExtractor) evaluated as a higher-order ``transform`` over the
  block array with ``element_at`` neighbor lookups. Link-density
  thresholds (0.333333 / 0.555556 — the literals in the published
  classifier) compare via integer cross-multiplication
  (``n_linked * 1e6 > t * n_words``) so both engines decide identically
  with no float division anywhere.
- Row-local throughout: zero shuffles, zero joins; the operator
  pipelines inside the extraction scan.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOCKS_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("text", T.StringType(), False),
            T.StructField("n_words", T.IntegerType(), False),
            T.StructField("n_linked", T.IntegerType(), False),
        ]
    )
)


def classify_blocks_python(
    blocks: List[Tuple[str, int, int]],
) -> List[bool]:
    """Pure-Python twin of `keep_blocks_expr` — the test oracle and the
    citable form of boilerpipe's NumWordsRulesClassifier. Boundary blocks
    see an all-zero neighbor, matching the published classifier's empty
    start/end blocks."""
    out = []
    n = len(blocks)
    for i in range(n):
        _, cw, cl = blocks[i]
        pw, pl = (blocks[i - 1][1], blocks[i - 1][2]) if i > 0 else (0, 0)
        xw = blocks[i + 1][1] if i + 1 < n else 0
        if cl * 1000000 > 333333 * cw:
            out.append(False)
        elif pl * 1000000 > 555556 * pw:
            out.append(cw > 40 or xw > 17)
        else:
            out.append(cw > 16 or xw > 15 or pw > 4)
    return out


def keep_blocks_expr(col: str = "blocks") -> str:
    """SQL expression: ``array<boolean>`` content flags for a block array.

    The NumWordsRulesClassifier tree as one ``transform`` HOF; neighbor
    features come from ``element_at`` (transform's index is 0-based,
    element_at 1-based, so ``i`` is the previous block and ``i + 2`` the
    next). All comparisons are exact integer arithmetic.
    """
    pw = f"coalesce((CASE WHEN i >= 1 THEN element_at({col}, i) END).n_words, 0)"
    pl = f"coalesce((CASE WHEN i >= 1 THEN element_at({col}, i) END).n_linked, 0)"
    xw = (
        f"coalesce((CASE WHEN i + 2 <= size({col}) "
        f"THEN element_at({col}, i + 2) END).n_words, 0)"
    )
    return (
        f"transform({col}, (b, i) -> "
        f"CASE WHEN b.n_linked * 1000000 > 333333 * b.n_words THEN false "
        f"WHEN {pl} * 1000000 > 555556 * {pw} "
        f"THEN b.n_words > 40 OR {xw} > 17 "
        f"ELSE b.n_words > 16 OR {xw} > 15 OR {pw} > 4 END)"
    )


def segment_blocks(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    charset_col: str = None,
) -> DataFrame:
    """pages(url, html) -> (url, blocks) — the Python-side segmentation.

    Arrow-batched, one ``parse_html`` + one linear node scan per page.
    NULL/unparseable html yields an empty block array (never a dropped
    row — downstream joins must see every fetched URL). ``charset_col``
    names the transport charset hint (the WARC reader's ``charset``
    column): bytes then decode through the same BOM/hint/meta-sniff
    ladder as the extract path, so main-content records of a Shift_JIS
    page match its extraction records instead of UTF-8 mojibake.
    """
    cols = [
        F.col(url_col).alias("url"),
        F.col(html_col).cast("binary").alias("html"),
    ]
    if charset_col is not None:
        cols.append(F.col(charset_col).alias("_charset"))
    src = pages.select(*cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from crawler_spark.core.htmlparse import parse_html
        from crawler_spark.core.text import extract_text_blocks

        for pdf in batches:
            charsets = (
                [c if isinstance(c, str) else None
                 for c in pdf["_charset"].tolist()]
                if "_charset" in pdf.columns
                else [None] * len(pdf)
            )
            out = []
            for html, cs in zip(pdf["html"].tolist(), charsets):
                if html is None:
                    out.append([])
                    continue
                out.append(
                    [
                        {"text": t, "n_words": w, "n_linked": l}
                        for t, w, l in extract_text_blocks(
                            parse_html(html, charset=cs)
                        )
                    ]
                )
            yield pd.DataFrame({"url": pdf["url"], "blocks": out})

    return src.mapInPandas(
        run,
        schema=T.StructType(
            [
                T.StructField("url", T.StringType(), False),
                T.StructField("blocks", BLOCKS_SCHEMA, False),
            ]
        ),
    )


def main_content(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    charset_col: str = None,
) -> DataFrame:
    """pages(url, html) -> per-page main text + block statistics.

    Columns: ``n_blocks``, ``n_content_blocks``, ``content_words`` (word
    mass surviving the strip), and ``main_text`` (kept blocks joined with
    blank lines, document order). Pages that are all boilerplate (or
    empty) return ``main_text = ''`` — callers gate on ``content_words``.
    """
    d = segment_blocks(
        pages, url_col=url_col, html_col=html_col, charset_col=charset_col
    )
    d = d.withColumn("keep", F.expr(keep_blocks_expr("blocks")))
    return d.select(
        "url",
        F.size("blocks").alias("n_blocks"),
        F.expr("size(filter(keep, k -> k))").alias("n_content_blocks"),
        F.expr(
            "aggregate(zip_with(blocks, keep, (b, k) -> "
            "CASE WHEN k THEN b.n_words ELSE 0 END), 0, (acc, x) -> acc + x)"
        ).alias("content_words"),
        F.expr(
            "array_join(filter(zip_with(blocks, keep, (b, k) -> "
            "CASE WHEN k THEN b.text END), t -> t IS NOT NULL), '\\n\\n')"
        ).alias("main_text"),
    )
