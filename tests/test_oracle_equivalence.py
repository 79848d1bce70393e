"""Prove the wave (depth-synchronous) formulation == the reference FIFO
loop on the synthetic corpus, across the scenario matrix (depth, max_pages,
follow_external). This is the semantic bridge that lets the Spark engine be
tested against ``wave_crawl`` alone."""

import math

import pytest

from crawler_spark.datagen.webgen import CorpusSpec, corpus_rows, default_seeds
from tests.oracle import reference_crawl, wave_crawl

SPEC = CorpusSpec(n_pages=120, n_hosts=6, seed=42)


@pytest.fixture(scope="module")
def corpus():
    rows = corpus_rows(SPEC)
    return {r["url"]: r["html"] for r in rows}


@pytest.fixture(scope="module")
def seed_url():
    return default_seeds(SPEC)[0]["url"]


@pytest.mark.parametrize("depth", [0, 1, 2, 3])
@pytest.mark.parametrize("max_pages", [1, 7, 20, math.inf])
@pytest.mark.parametrize("follow_external", [False, True])
def test_wave_equals_reference(corpus, seed_url, depth, max_pages, follow_external):
    ref = reference_crawl(
        corpus, seed_url, instructions=None, depth=depth,
        follow_external_links=follow_external, max_pages=max_pages,
    )
    wav = wave_crawl(
        corpus, [seed_url], instructions=None, depth=depth,
        follow_external_links=follow_external, max_pages=max_pages,
    )
    ref_order = [p["url"] for p in ref["pages"]]
    wav_order = [u for (_, u, _) in wav["visit_log"]]
    assert wav_order == ref_order
    # seen set: reference marks visited at pop time (errors included)
    assert wav["seen"] == set(ref_order)
    # page records byte-identical (timestamps are both corpus-driven -> "")
    for rp, wp in zip(ref["pages"], wav["pages"]):
        wp_clean = {k: v for k, v in wp.items() if not k.startswith("_")}
        assert wp_clean == rp


def test_instructions_gate_relevance(corpus, seed_url):
    ref = reference_crawl(corpus, seed_url, instructions="crawl frontier spark politeness", depth=1)
    wav = wave_crawl(corpus, [seed_url], instructions="crawl frontier spark politeness", depth=1, max_pages=100)
    assert [p["url"] for p in ref["pages"]] == [u for (_, u, _) in wav["visit_log"]]
    gated = [p for p in ref["pages"] if "relevance" in p and p["relevance"]["score"] < 0.3]
    assert gated, "scenario should exercise the <0.3 gate"
    for p in gated:
        assert "markdown" not in p and "ai_extracted_content" not in p


def test_error_pages_counted(corpus, seed_url):
    # missing URLs (dangling links) must appear as error rows and count
    ref = reference_crawl(corpus, seed_url, depth=2, max_pages=math.inf)
    errors = [p for p in ref["pages"] if "error" in p]
    assert errors, "corpus should contain dangling links at depth 2"
    for e in errors:
        assert e["error"].startswith(f"Failed to crawl page: Failed to crawl {e['url']}: ")
    wav = wave_crawl(corpus, [seed_url], depth=2)
    wav_errors = [p for p in wav["pages"] if "error" in p]
    assert [e["url"] for e in errors] == [e["url"] for e in wav_errors]


def test_politeness_defers_not_drops(corpus, seed_url):
    free = wave_crawl(corpus, [seed_url], depth=2)
    budget = wave_crawl(corpus, [seed_url], depth=2, host_budget={"*": 3})
    # same final seen set (every deferred URL is eventually visited)...
    assert budget["seen"] == free["seen"]
    # ...but more waves and a different order
    assert budget["meta"]["waves"] >= free["meta"]["waves"]
    # per-wave per-host cap respected
    from collections import Counter
    from crawler_spark.core.urls import get_domain
    per_wave_host = Counter()
    for p in budget["pages"]:
        per_wave_host[(p["_wave"], get_domain(p["url"]))] += 1
    assert max(per_wave_host.values()) <= 3


def test_robots_filters_frontier(corpus, seed_url):
    robots = {"h0.example.test": ["/private"]}
    wav = wave_crawl(corpus, [seed_url], depth=3, robots=robots)
    assert wav["pages"], "crawl should still visit allowed pages"
    for (_, url, _) in wav["visit_log"]:
        assert not url.startswith("https://h0.example.test/private")
