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
