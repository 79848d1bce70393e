"""Golden byte-identity: Spark extract_pages output == oracle, compared as
UTF-8 content (the north-rule per-row invariant)."""

from pyspark.sql import functions as F

from crawler_spark.core.page import build_page_record
from crawler_spark.operators.extract import extract_pages


def test_extract_pages_byte_identity(spark, corpus_parquet, corpus_rows_mem):
    pages = spark.read.parquet(corpus_parquet)
    parsed = extract_pages(pages.select("url", "html", "warc_ts"), carry=False)
    got = {r["url"]: r.asDict(recursive=True) for r in parsed.collect()}

    assert len(got) == len(corpus_rows_mem)
    for row in corpus_rows_mem:
        oracle = build_page_record(
            row["html"], row["url"], None, timestamp=row["warc_ts"].isoformat()
        )
        g = got[row["url"]]
        assert g["error"] is None
        assert g["title"] == oracle["title"]
        assert g["markdown"] == oracle["markdown"]  # byte identity target
        assert g["markdown"] == row["text"]  # and equals the corpus text col
        assert g["links"] == oracle["links"]
        assert g["relevance"]["score"] == oracle["relevance"]["score"]
        assert g["timestamp"] == oracle["timestamp"]
        ex = oracle["ai_extracted_content"]
        gex = g["extracted"]
        for k in ("source_url", "source_title", "summary", "key_points",
                  "relevance_score", "paragraphs", "list_items"):
            assert gex[k] == ex[k], k


def test_extract_missing_html_error_row(spark):
    df = spark.createDataFrame(
        [("https://h/x", None)], "url string, html binary"
    )
    out = extract_pages(df, carry=False).collect()[0]
    assert out["error"] == (
        "Failed to crawl page: Failed to crawl https://h/x: URL not found in corpus"
    )
    assert out["title"] is None and out["links"] is None


def test_relevance_gate_nulls_markdown(spark, corpus_parquet):
    pages = spark.read.parquet(corpus_parquet)
    parsed = extract_pages(
        pages.select("url", "html", "warc_ts"),
        instructions="zzzznonexistent relevance keyword qqqq",
        carry=False,
    )
    rows = parsed.collect()
    gated = [r for r in rows if r["relevance"]["score"] < 0.3]
    assert gated, "should exercise the <0.3 gate"
    for r in gated:
        assert r["markdown"] is None and r["extracted"] is None
        assert r["title"] is not None and r["links"] is not None


def test_no_html_column_shuffled_downstream(spark, corpus_parquet):
    # the plan after extraction must not carry the binary column
    pages = spark.read.parquet(corpus_parquet)
    parsed = extract_pages(pages.select("url", "html", "warc_ts"), carry=False)
    assert "html" not in parsed.columns


def test_structured_extractor_seam(spark):
    """LLM-path seam: a pluggable extractor fills extracted_data / summary /
    key_points, gets source_url/source_title stamped on
    (ai_processor.py:227-229), and sees the [:8000]+'...' truncated
    text_content (P11 quirk, ai_processor.py:182-184)."""
    from crawler_spark.operators.extract import extract_pages

    def fake_extractor(text_content, title, url, instructions):
        # runs in the executor: report observed inputs through the output
        return {
            "summary": f"about {title}",
            "key_points": ["p1", "p2"],
            "relevance_score": 0.9,
            "extracted_data": {
                "price": "42",
                "color": "red",
                "text_len": str(len(text_content)),
                "text_tail": text_content[-3:],
                "instr": instructions,
            },
        }

    big_body = "word " * 3000  # get_text >> 8000 chars -> truncation fires
    html = f"<html><head><title>T1</title></head><body><p>{big_body}</p></body></html>"
    df = spark.createDataFrame(
        [("https://h/x", bytearray(html.encode()))], "url string, html binary"
    )
    out = extract_pages(
        df, instructions=None, carry=False, structured_extractor=fake_extractor
    ).collect()[0]
    ex = out["extracted"]
    assert ex["source_url"] == "https://h/x" and ex["source_title"] == "T1"
    assert ex["summary"] == "about T1"
    assert ex["key_points"] == ["p1", "p2"]
    assert ex["relevance_score"] == 0.9
    ed = dict(ex["extracted_data"])
    assert ed["price"] == "42" and ed["color"] == "red"
    assert ex["paragraphs"] is None and ex["list_items"] is None
    assert ed["text_len"] == "8003" and ed["text_tail"] == "..."
    assert ed["instr"] == "Extract main content"  # enhanced_crawler.py:213 default


def test_default_extractor_leaves_extracted_data_null(spark, corpus_parquet):
    from crawler_spark.operators.extract import extract_pages

    df = spark.read.parquet(corpus_parquet).limit(5)
    for r in extract_pages(df, carry=False).collect():
        assert r["extracted"]["extracted_data"] is None


def test_extracted_data_renders_in_markdown_export(spark):
    from crawler_spark.operators.extract import extract_pages
    from crawler_spark.sinks.export import export_markdown_string

    def fake_extractor(text_content, title, url, instructions):
        return {"summary": "s", "extracted_data": {"k1": "v1", "k2": "v2"}}

    html = "<html><head><title>T</title></head><body><p>hello</p></body></html>"
    df = spark.createDataFrame(
        [("https://h/x", bytearray(html.encode()))], "url string, html binary"
    )
    pages = extract_pages(
        df, carry=False, structured_extractor=fake_extractor
    ).withColumn("seq", F.lit(0))
    report = export_markdown_string(pages, meta={"url": "t", "depth": 0})
    # reference layout enhanced_crawler.py:474-478
    assert "### Extracted Data\n\n- **k1:** v1\n- **k2:** v2\n\n" in report


def test_relevance_gate_also_nulls_main_text(spark, corpus_parquet):
    """main_text is gated WITH markdown: a sub-gate page must not leak a
    populated main_text into the --main-content training path."""
    pages = spark.read.parquet(corpus_parquet)
    parsed = extract_pages(
        pages.select("url", "html", "warc_ts"),
        instructions="zzzznonexistent relevance keyword qqqq",
        carry=False,
        main_content=True,
    )
    rows = parsed.collect()
    gated = [r for r in rows if r["relevance"]["score"] < 0.3]
    assert gated
    assert all(r["main_text"] is None for r in gated)
    # no instructions -> fixed 0.5 score, everything passes the gate
    open_rows = extract_pages(
        pages.select("url", "html", "warc_ts"), carry=False, main_content=True
    ).collect()
    assert open_rows and all(r["main_text"] is not None for r in open_rows)
