"""Markdown / JSON export sinks.

``export_to_markdown`` reproduces the reference's report layout
(/root/reference/crawler/enhanced_crawler.py:448-492) exactly: meta header,
then per page (in visit order) the Summary / Key Points / Extracted Data /
Content / Links(top-10) sections, separated by ``\\n---\\n``.

The per-page section rendering runs distributed (a pandas UDF builds each
page's block); only the final ordered concatenation happens driver-side —
a markdown report is a single small text artifact by construction.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _render_page(idx: int, page: Dict) -> str:
    """One page's markdown block — transcribed from enhanced_crawler.py:458-490."""
    out = []
    # reference: error records lack the 'title' key entirely -> 'No Title';
    # success records always carry it, even when it is "" (whitespace-only
    # title quirk) — so "" must print as "", not 'No Title'
    if page.get("error") is not None or page.get("title") is None:
        title = "No Title"
    else:
        title = page["title"]
    out.append(f"## Page {idx + 1}: {title}\n\n")
    out.append(f"**URL:** {page['url']}\n\n")

    if page.get("error") is not None:
        out.append(f"**Error:** {page['error']}\n\n")
    else:
        ex = page.get("extracted")
        if ex is not None:
            if ex.get("summary") is not None:
                out.append(f"### Summary\n\n{ex['summary']}\n\n")
            if ex.get("key_points"):
                out.append("### Key Points\n\n")
                for point in ex["key_points"]:
                    out.append(f"- {point}\n")
                out.append("\n")
            # LLM-path extracted_data map (enhanced_crawler.py:474-478);
            # the deterministic extractor leaves it null, so the section is
            # omitted exactly like the reference omits missing/empty maps
            if ex.get("extracted_data"):
                out.append("### Extracted Data\n\n")
                for key, value in ex["extracted_data"].items():
                    out.append(f"- **{key}:** {value}\n")
                out.append("\n")

        if page.get("markdown"):
            out.append("### Content\n\n")
            out.append(page["markdown"] + "\n\n")

        if page.get("links"):
            out.append("### Links\n\n")
            for link in page["links"][:10]:
                out.append(f"- [{link}]({link})\n")
            out.append("\n")

    out.append("\n---\n\n")
    return "".join(out)


_BLOCK_SCHEMA = T.StructType(
    [T.StructField("seq", T.LongType()), T.StructField("block", T.StringType())]
)


# The report is a single human-readable document the driver must assemble,
# so its row count is a DRIVER-MEMORY bound, not a cluster bound. 100k
# rendered blocks ~ a few hundred MB — far past any report a human reads
# (the reference's golden artifact is 18 pages). Above the cap the sink
# refuses loudly instead of OOM-ing the driver; callers that really want a
# corpus-sized export should use export_to_json (distributed write).
MAX_REPORT_PAGES = 100_000


def export_markdown_string(
    pages: DataFrame,
    meta: Optional[Dict] = None,
    max_report_pages: int = MAX_REPORT_PAGES,
) -> str:
    """Render the full report. Page blocks render in executors; the driver
    only sorts and joins the per-page strings.

    Raises ``ValueError`` when ``pages`` holds more than
    ``max_report_pages`` rows — the collect below is driver-sized by
    design (S4 is a small-result export, bounded by ``max_pages`` in
    every reference workflow)."""
    meta = meta or {}
    # bound the guard's own cost: limit(cap+1) short-circuits the scan at
    # cap+1 rows instead of executing the full upstream DAG twice
    n = pages.limit(max_report_pages + 1).count()
    if n > max_report_pages:
        raise ValueError(
            f"markdown report sink refuses >{max_report_pages} pages "
            f"(max_report_pages={max_report_pages}): the report is "
            "assembled driver-side; use export_to_json for corpus-sized "
            "output or raise max_report_pages explicitly"
        )

    def render(it):
        for pdf in it:
            recs = pdf.to_dict("records")
            yield pd.DataFrame(
                {
                    "seq": [r.get("seq") for r in recs],
                    "block": [_render_block_row(r) for r in recs],
                }
            )

    blocks = pages.mapInPandas(render, schema=_BLOCK_SCHEMA)
    rows = blocks.orderBy("seq").collect()

    header = (
        f"# Crawler Results: {meta.get('url', '')}\n\n"
        f"- **Instructions:** {meta.get('instructions')}\n"
        f"- **Depth:** {meta.get('depth')}\n"
        f"- **Pages Crawled:** {meta.get('pages_crawled', len(rows))}\n"
        f"- **Timestamp:** {meta.get('timestamp', '')}\n\n"
    )
    # blocks carry their own numbering via seq order; re-number here since
    # the reference numbers by enumerate() over the visit-ordered list
    bodies = []
    for i, r in enumerate(rows):
        block = r["block"]
        # the executor rendered "## Page ?:" — patch the ordinal now that the
        # global order is known
        bodies.append(block.replace("## Page ?:", f"## Page {i + 1}:", 1))
    return header + "".join(bodies)


def _render_block_row(rec: Dict) -> str:
    # struct columns arrive as dicts from to_dict("records"); lists as
    # numpy arrays — normalize
    page = dict(rec)
    for k in ("links",):
        v = page.get(k)
        if v is not None and not isinstance(v, list):
            page[k] = list(v)
    ex = page.get("extracted")
    if ex is not None:
        ex = dict(ex)
        for k in ("key_points", "paragraphs", "list_items"):
            if ex.get(k) is not None and not isinstance(ex[k], list):
                ex[k] = list(ex[k])
        page["extracted"] = ex
    block = _render_page(0, page)
    # neutralize the ordinal; patched in export_markdown_string once the
    # global visit order is known
    return block.replace("## Page 1:", "## Page ?:", 1)


def render_markdown_report(pages: list, meta: Optional[Dict] = None) -> str:
    """Driver-side report rendering over already-collected page dicts — the
    service-surface path (reference api/main.py:104-119 hands the posted
    page list back to export_to_markdown). Identical bytes to
    export_markdown_string over the equivalent DataFrame."""
    meta = meta or {}
    header = (
        f"# Crawler Results: {meta.get('url', '')}\n\n"
        f"- **Instructions:** {meta.get('instructions')}\n"
        f"- **Depth:** {meta.get('depth')}\n"
        f"- **Pages Crawled:** {meta.get('pages_crawled', len(pages))}\n"
        f"- **Timestamp:** {meta.get('timestamp', '')}\n\n"
    )
    return header + "".join(_render_page(i, _service_page(p)) for i, p in enumerate(pages))


def _service_page(page: Dict) -> Dict:
    """Posted service dicts use the reference's conditional-key shape
    ('ai_extracted_content', keys absent instead of null) — adapt to the
    engine's nullable-column shape _render_page expects."""
    p = dict(page)
    if "extracted" not in p:
        p["extracted"] = p.get("ai_extracted_content")
    return p


def export_to_markdown(pages: DataFrame, filepath: str, meta: Optional[Dict] = None) -> None:
    content = export_markdown_string(pages, meta=meta)
    os.makedirs(os.path.dirname(os.path.abspath(filepath)), exist_ok=True)
    with open(filepath, "w", encoding="utf-8") as f:
        f.write(content)


def export_to_json(pages: DataFrame, dirpath: str) -> None:
    """JSON sink (reference api/main.py:104-106): one JSON object per page,
    distributed write."""
    pages.orderBy("seq").write.mode("overwrite").json(dirpath)
