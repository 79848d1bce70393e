"""Bloom sidecar: zero false negatives, sane FP rate, and crawl-result
equivalence with the prefilter on vs off."""

import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.frontier.bloom import (
    BloomConfig,
    build_blobs,
    merge_blobs,
    probe_maybe_seen,
    split_by_bloom,
)

CFG = BloomConfig(n_buckets=8, m_bits=1 << 14, n_hashes=5)


@pytest.fixture(scope="module")
def hashes(spark):
    rng = np.random.RandomState(7)
    vals = rng.randint(-(2**63), 2**63 - 1, size=2000, dtype=np.int64)
    seen = [(int(v),) for v in vals[:1000]]
    unseen = [(int(v),) for v in vals[1000:]]
    return (
        spark.createDataFrame(seen, "url_hash long"),
        spark.createDataFrame(unseen, "url_hash long"),
    )


class TestBloomCore:
    def test_no_false_negatives(self, spark, hashes):
        seen, _ = hashes
        blobs = build_blobs(seen, CFG)
        maybe = {r["url_hash"] for r in probe_maybe_seen(seen, blobs, CFG).collect()}
        inserted = {r["url_hash"] for r in seen.collect()}
        assert inserted <= maybe  # every inserted hash must probe positive

    def test_false_positive_rate_sane(self, spark, hashes):
        seen, unseen = hashes
        blobs = build_blobs(seen, CFG)
        fp = probe_maybe_seen(unseen, blobs, CFG).count()
        # 1000 items in 8x16384 bits at k=5 -> expected FP well under 5%
        assert fp / 1000 < 0.05

    def test_merge_is_union(self, spark, hashes):
        seen, unseen = hashes
        a = build_blobs(seen, CFG)
        b = build_blobs(unseen, CFG)
        merged = merge_blobs(a, b)
        everything = seen.unionByName(unseen)
        maybe = probe_maybe_seen(everything, merged, CFG).count()
        assert maybe == 2000  # no false negatives across the union

    def test_split_definite_new_is_exact(self, spark, hashes):
        seen, unseen = hashes
        blobs = build_blobs(seen, CFG)
        cand = seen.unionByName(unseen).withColumn("payload", F.lit("x"))
        definite, suspect = split_by_bloom(cand, blobs, CFG)
        inserted = {r["url_hash"] for r in seen.collect()}
        # nothing Bloom calls definitely-new may actually be seen
        assert all(
            r["url_hash"] not in inserted for r in definite.collect()
        )
        # split is a partition of the candidates
        assert definite.count() + suspect.count() == cand.count()
        assert "payload" in definite.columns and "payload" in suspect.columns


class TestBloomCrawlEquivalence:
    def test_bloom_on_off_identical(self, spark, corpus_parquet, corpus_spec):
        from crawler_spark.datagen import default_seeds
        from crawler_spark.frontier.bfs import CrawlConfig, crawl

        corpus = spark.read.parquet(corpus_parquet)
        seeds = [s["url"] for s in default_seeds(corpus_spec, n_seeds=2)]

        def visit_list(use_bloom):
            cfg = CrawlConfig(
                depth=2,
                max_pages=60,
                host_budget={"*": 7},
                use_bloom=use_bloom,
                bloom=BloomConfig(n_buckets=8, m_bits=1 << 12, n_hashes=4),
            )
            res = crawl(
                spark, corpus, seeds, cfg,
                run_dir=tempfile.mkdtemp(prefix="bloom_eq_"),
            )
            rows = res.pages(spark).select("seq", "url", "depth").collect()
            return sorted((r["seq"], r["url"], r["depth"]) for r in rows)

        assert visit_list(True) == visit_list(False)
