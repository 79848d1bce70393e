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
