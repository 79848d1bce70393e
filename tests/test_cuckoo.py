"""Cuckoo-filter sidecar: zero false negatives, deletion makes URLs probe
as new again, deterministic table bytes at any parallelism, and the same
split contract as the Bloom sidecar."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.frontier.cuckoo import (
    CuckooConfig,
    build_tables,
    delete_hashes,
    merge_tables,
    probe_maybe_seen,
    split_by_cuckoo,
)

CFG = CuckooConfig(n_shards=8, n_buckets=1 << 9, slots_per_bucket=4)


@pytest.fixture(scope="module")
def hashes(spark):
    rng = np.random.RandomState(11)
    vals = np.unique(
        rng.randint(-(2**63), 2**63 - 1, size=2200, dtype=np.int64)
    )[:2000]
    seen = [(int(v),) for v in vals[:1000]]
    unseen = [(int(v),) for v in vals[1000:]]
    return (
        spark.createDataFrame(seen, "url_hash long"),
        spark.createDataFrame(unseen, "url_hash long"),
    )


class TestCuckooCore:
    def test_no_false_negatives(self, spark, hashes):
        seen, _ = hashes
        tables = build_tables(seen, CFG)
        maybe = {r["url_hash"] for r in probe_maybe_seen(seen, tables, CFG).collect()}
        inserted = {r["url_hash"] for r in seen.collect()}
        assert inserted <= maybe  # overflow list keeps this exact even when full

    def test_false_positive_rate_sane(self, spark, hashes):
        seen, unseen = hashes
        tables = build_tables(seen, CFG)
        fp = probe_maybe_seen(unseen, tables, CFG).count()
        # 16-bit fingerprints, 2 buckets x 4 slots checked -> FP ~ 8/2^16
        assert fp / 1000 < 0.01

    def test_delete_makes_urls_new_again(self, spark, hashes):
        seen, _ = hashes
        tables = build_tables(seen, CFG)
        dels = seen.filter(F.col("url_hash") % 2 == 0)
        kept = seen.filter(F.col("url_hash") % 2 != 0)
        after = delete_hashes(tables, dels, CFG)
        maybe = {r["url_hash"] for r in probe_maybe_seen(seen, after, CFG).collect()}
        kept_set = {r["url_hash"] for r in kept.collect()}
        del_set = {r["url_hash"] for r in dels.collect()}
        # hard guarantee: kept items never become false negatives
        assert kept_set <= maybe
        # deleted items probe as new again, modulo rare fingerprint
        # collisions with a kept item in the same bucket pair
        still = del_set & maybe
        assert len(still) / max(len(del_set), 1) < 0.02
        # n_items accounting survives the delete pass
        n_after = sum(r["n_items"] for r in after.collect())
        assert n_after == seen.count() - dels.count()

    def test_table_bytes_partition_invariant(self, spark, hashes):
        seen, _ = hashes
        a = {
            r["shard"]: (bytes(r["table"]), bytes(r["overflow"]))
            for r in build_tables(seen.repartition(1), CFG).collect()
        }
        b = {
            r["shard"]: (bytes(r["table"]), bytes(r["overflow"]))
            for r in build_tables(seen.repartition(7), CFG).collect()
        }
        assert a == b

    def test_overflow_keeps_contract_when_overloaded(self, spark, hashes):
        seen, _ = hashes
        tiny = CuckooConfig(n_shards=2, n_buckets=32, slots_per_bucket=4,
                            max_kicks=20)
        tables = build_tables(seen, tiny)  # 1000 items into 2x128 slots
        over_lens = [
            len(np.frombuffer(r["overflow"], dtype=np.int64))
            for r in tables.collect()
        ]
        assert sum(over_lens) > 0  # genuinely overloaded
        maybe = {r["url_hash"] for r in probe_maybe_seen(seen, tables, tiny).collect()}
        inserted = {r["url_hash"] for r in seen.collect()}
        assert inserted <= maybe  # still zero false negatives

    def test_merge_is_union_and_side_order_invariant(self, spark, hashes):
        seen, _ = hashes
        wave_a = seen.filter(F.col("url_hash") % 3 == 0)
        wave_b = seen.filter(F.col("url_hash") % 3 != 0)
        ta, tb = build_tables(wave_a, CFG), build_tables(wave_b, CFG)
        ab = merge_tables(ta, tb, CFG)
        # union semantics: every item from either wave still probes positive
        maybe = {r["url_hash"] for r in probe_maybe_seen(seen, ab, CFG).collect()}
        assert {r["url_hash"] for r in seen.collect()} <= maybe
        # merged bytes identical regardless of which side is which
        ba = merge_tables(tb, ta, CFG)
        key = lambda df: {  # noqa: E731
            r["shard"]: (bytes(r["table"]), bytes(r["overflow"]),
                         bytes(r["overflow_fp"]), r["n_items"])
            for r in df.collect()
        }
        assert key(ab) == key(ba)

    def test_merge_overloaded_displaces_to_fp_overflow_without_misses(
        self, spark, hashes
    ):
        seen, _ = hashes
        tiny = CuckooConfig(n_shards=2, n_buckets=64, slots_per_bucket=4,
                            max_kicks=20)
        # two waves each ~full for 2x256 slots; the merge cannot place
        # everything and must displace entries into overflow_fp. Split on
        # mod 5 — independent of the mod-2 shard key, so both waves land
        # in both shards (a parity split would segregate waves by shard
        # and the merge would never see combined load)
        wave_a = seen.filter(F.pmod(F.col("url_hash"), F.lit(5)) < 2)
        wave_b = seen.filter(F.pmod(F.col("url_hash"), F.lit(5)) >= 2)
        merged = merge_tables(
            build_tables(wave_a, tiny), build_tables(wave_b, tiny), tiny
        )
        fp_lens = [
            len(np.frombuffer(r["overflow_fp"], dtype=np.int64))
            for r in merged.collect()
        ]
        assert sum(fp_lens) > 0  # displacement actually happened
        maybe = {r["url_hash"]
                 for r in probe_maybe_seen(seen, merged, tiny).collect()}
        assert {r["url_hash"] for r in seen.collect()} <= maybe  # no FN
        # deletes still work against a merged table set
        dels = seen.limit(100)
        after = delete_hashes(merged, dels, tiny)
        kept = seen.join(dels, "url_hash", "left_anti")
        maybe2 = {r["url_hash"]
                  for r in probe_maybe_seen(seen, after, tiny).collect()}
        assert {r["url_hash"] for r in kept.collect()} <= maybe2

    def test_split_contract_matches_bloom_sidecar(self, spark, hashes):
        seen, unseen = hashes
        tables = build_tables(seen, CFG)
        cand = seen.limit(200).unionByName(unseen.limit(200))
        new, suspect = split_by_cuckoo(cand, tables, CFG)
        new_set = {r["url_hash"] for r in new.collect()}
        sus_set = {r["url_hash"] for r in suspect.collect()}
        cand_set = {r["url_hash"] for r in cand.collect()}
        assert new_set | sus_set == cand_set and not (new_set & sus_set)
        seen_set = {r["url_hash"] for r in seen.limit(200).collect()}
        assert not (new_set & seen_set)  # no seen item escapes as new


class TestRecrawlLifecycle:
    def test_delete_aged_then_refetch_end_to_end(
        self, spark, corpus_parquet, corpus_spec, tmp_path
    ):
        """The recrawl flow the cuckoo sidecar exists for: crawl once, build
        the filter from the committed seen set, delete the aged slice (here:
        everything fetched in wave 0), verify exactly that slice probes as
        definitely-new again, then refetch it with a depth-0 crawl and check
        the refetched pages carry identical extracted content."""
        from crawler_spark.datagen import default_seeds
        from crawler_spark.frontier import CrawlConfig, crawl

        pages = spark.read.parquet(corpus_parquet)
        seeds = [s["url"] for s in default_seeds(corpus_spec)]
        res = crawl(spark, pages, seeds, config=CrawlConfig(depth=2),
                    run_dir=str(tmp_path / "first"))
        crawled = res.pages(spark).select("url", "wave", "title", "markdown")
        seen = crawled.select(F.xxhash64("url").alias("url_hash"), "wave")

        cfg = CuckooConfig(n_shards=8, n_buckets=1 << 10)
        tables = build_tables(seen.select("url_hash"), cfg)
        aged = seen.filter(F.col("wave") == 0).select("url_hash")
        fresh = seen.filter(F.col("wave") != 0).select("url_hash")
        after = delete_hashes(tables, aged, cfg)

        new, suspect = split_by_cuckoo(seen.select("url_hash"), after, cfg)
        new_set = {r["url_hash"] for r in new.collect()}
        aged_set = {r["url_hash"] for r in aged.collect()}
        fresh_set = {r["url_hash"] for r in fresh.collect()}
        # every fresh URL still guarded by the filter; the aged slice (minus
        # rare fingerprint collisions with a fresh entry) probes new again
        assert not (new_set & fresh_set)
        assert len(aged_set - new_set) <= max(1, len(aged_set) // 50)

        # refetch exactly the probe-new slice with a depth-0 crawl
        refetch_urls = [
            r["url"]
            for r in crawled.withColumn("url_hash", F.xxhash64("url"))
            .join(new.select("url_hash"), "url_hash", "left_semi")
            .select("url")
            .collect()
        ]
        res2 = crawl(spark, pages, refetch_urls,
                     config=CrawlConfig(depth=0),
                     run_dir=str(tmp_path / "refetch"))
        refetched = {
            r["url"]: (r["title"], r["markdown"])
            for r in res2.pages(spark).select("url", "title", "markdown").collect()
        }
        original = {
            r["url"]: (r["title"], r["markdown"])
            for r in crawled.collect()
        }
        assert set(refetched) == set(refetch_urls)
        for u, tm in refetched.items():
            assert tm == original[u]  # byte-identical re-extraction
