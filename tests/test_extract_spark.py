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
