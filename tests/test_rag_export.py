"""Spark RAG materialization + markdown export vs the oracle transcriptions."""

import pytest

from crawler_spark.datagen import default_seeds
from crawler_spark.frontier import CrawlConfig, crawl
from crawler_spark.sinks import build_rag_documents, export_markdown_string
from tests.oracle import wave_crawl
from tests.oracle_rag import reference_export_markdown, reference_rag_documents


@pytest.fixture(scope="module")
def crawl_pair(spark, corpus_parquet, corpus_dict, corpus_ts, corpus_spec, tmp_path_factory):
    seeds = [s["url"] for s in default_seeds(corpus_spec)]
    cfg = CrawlConfig(depth=1, instructions="crawl frontier spark politeness")
    pages = spark.read.parquet(corpus_parquet)
    result = crawl(
        spark, pages, seeds, config=cfg,
        run_dir=str(tmp_path_factory.mktemp("ragrun")),
    )
    oracle = wave_crawl(
        corpus_dict, seeds, instructions=cfg.instructions, depth=1,
        corpus_ts=corpus_ts,
    )
    return result, oracle


def test_rag_documents_match_reference(spark, crawl_pair):
    result, oracle = crawl_pair
    ref_docs = reference_rag_documents(oracle)
    assert ref_docs, "scenario should produce rag chunks"

    got = (
        build_rag_documents(result.pages(spark))
        .orderBy("page_seq", "kind_order", "point_index", "chunk_index")
        .collect()
    )
    assert len(got) == len(ref_docs)
    for g, r in zip(got, ref_docs):
        assert g["chunk_type"] == r["chunk_type"]
        assert g["content"] == r["content"]
        md = r["metadata"]
        assert g["source_url"] == md["source_url"]
        assert g["source_title"] == md["source_title"]
        assert g["relevance_score"] == md["relevance_score"]
        assert g["timestamp"] == md["timestamp"]
        if r["chunk_type"] == "key_point":
            assert g["point_index"] == md["point_index"]
        if r["chunk_type"] == "content":
            assert g["chunk_index"] == md["chunk_index"]


def test_export_markdown_matches_reference(spark, crawl_pair, corpus_spec):
    result, oracle = crawl_pair
    # oracle pages in reference dict shape
    ref_pages = [
        {k: v for k, v in p.items() if not k.startswith("_")} for p in oracle["pages"]
    ]
    seeds = [s["url"] for s in default_seeds(corpus_spec)]
    meta = {
        "url": seeds[0],
        "instructions": "crawl frontier spark politeness",
        "depth": 1,
        "pages_crawled": len(ref_pages),
        "timestamp": "",
    }
    ref_md = reference_export_markdown({"meta": meta, "pages": ref_pages})
    got_md = export_markdown_string(result.pages(spark), meta=meta)
    assert got_md == ref_md  # byte-identical report


def test_export_markdown_refuses_over_cap(spark, crawl_pair):
    """The report is assembled driver-side (S4 small-result export) — an
    uncapped collect against a corpus-sized pages table would OOM the
    driver, so above max_report_pages the sink must refuse loudly."""
    import pytest

    result, _ = crawl_pair
    pages = result.pages(spark)
    with pytest.raises(ValueError, match="max_report_pages"):
        export_markdown_string(pages, meta={}, max_report_pages=2)


# ---------------------------------------------------------------------------
# corpus data card (sinks/datacard.py)
# ---------------------------------------------------------------------------


def test_data_card_markdown_golden(spark, tmp_path):
    from crawler_spark.sinks.datacard import (
        corpus_card_stats,
        render_data_card,
        write_data_card,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en", "a.test"),
            (2, "alpha beta", "en", "a.test"),
            (3, "uno dos", "es", "b.test"),
            (4, "alpha beta", "en", "b.test"),  # exact dup of doc 2
        ],
        "doc_id long, text string, lang string, source string",
    )
    md = render_data_card(corpus_card_stats(df, top_sources=5), "tiny")
    expected = (
        "# Data Card: tiny\n"
        "\n## Volume\n\n"
        "- **docs:** 4\n"
        "- **tokens:** 9\n"
        "- **chars:** 43\n"
        "- **sources:** 2\n"
        "- **languages:** 2\n"
        "\n## Tokens per document\n\n"
        "- **p50:** 2.0000\n"
        "- **p90:** 3.0000\n"
        "- **p99:** 3.0000\n"
        "\n## Languages\n\n"
        "- **en:** docs=3 share=0.7500\n"
        "- **es:** docs=1 share=0.2500\n"
        "\n## Sources (top by tokens)\n\n"
        "- **a.test:** docs=2 tokens=5 share=0.5556 dup=0.0000\n"
        "- **b.test:** docs=2 tokens=4 share=0.4444 dup=0.0000\n"
        "\n## Duplication\n\n"
        "- **exact_dup_frac:** 0.2500\n"
        "- **distinct_tokens_est:** 5.024574\n"
    )
    assert md == expected
    # writer round-trip through the storage-agnostic fs helper
    p = str(tmp_path / "card.md")
    out = write_data_card(df, p, name="tiny", top_sources=5)
    with open(p) as f:
        assert f.read() == out == md


def test_data_card_partition_invariant_and_lang_fallback(spark):
    from crawler_spark.sinks.datacard import corpus_card_stats

    df = spark.createDataFrame(
        [(i, f"the and of word{i}", "s" + str(i % 3)) for i in range(30)],
        "doc_id long, text string, source string",
    )  # no lang column -> falls back to lang_id
    a = sorted(
        (r.ord, r.section, r.k, r.v)
        for r in corpus_card_stats(df, lang_col=None).collect()
    )
    b = sorted(
        (r.ord, r.section, r.k, r.v)
        for r in corpus_card_stats(df.repartition(7), lang_col=None).collect()
    )
    assert a == b
    assert any(s == "language" for _, s, _, _ in a)
