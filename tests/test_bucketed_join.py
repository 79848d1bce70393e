"""Bucketed-table co-location: the storage-level answer to the seen-join
shuffle once the seen set outgrows broadcasts.

At 10^10 URLs the per-wave exact seen anti-join shuffles the candidate
set against the seen table every wave. Bucketing both tables by the join
key (``bucketBy(url_hash)`` + ``sortBy``) makes Spark read both sides
already co-partitioned: the sort-merge join runs with NO Exchange on the
bucketed sides — each wave pays a scan, never a reshuffle of the
ever-growing seen table. This is the Iceberg `bucket(url_hash)` layout
from SURVEY §1.2 expressed through Spark's bucketed catalog tables; the
test pins the plan shape so the claim stays true.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS seen_b")
    spark.sql("DROP TABLE IF EXISTS cand_b")
    seen = spark.range(0, 5_000).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash"),
        F.concat(F.lit("https://h/"), F.col("id")).alias("url"),
    )
    cand = spark.range(2_500, 7_500).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash"),
        F.lit(1).alias("depth"),
    )
    (seen.write.mode("overwrite").bucketBy(8, "url_hash").sortBy("url_hash")
         .saveAsTable("seen_b"))
    (cand.write.mode("overwrite").bucketBy(8, "url_hash").sortBy("url_hash")
         .saveAsTable("cand_b"))
    yield spark.table("seen_b"), spark.table("cand_b")
    spark.sql("DROP TABLE IF EXISTS seen_b")
    spark.sql("DROP TABLE IF EXISTS cand_b")


def test_bucketed_seen_anti_join_has_no_exchange(spark, bucketed_pair):
    seen, cand = bucketed_pair
    # force the sort-merge path (broadcast would hide the bucket benefit)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        unseen = cand.join(
            seen.select("url_hash"), "url_hash", "left_anti"
        )
        plan = unseen._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan and "LeftAnti" in plan
        # co-located buckets: neither side reshuffles
        assert "Exchange hashpartitioning" not in plan
        # and the answer is right: 2500..4999 are seen, 5000..7499 are not
        assert unseen.count() == 2_500
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_same_join_shuffles_both_sides(spark):
    """Control: the identical join over plain (non-bucketed) frames shows
    the Exchanges bucketing removes — the delta IS the claim."""
    plain_seen = spark.range(0, 5_000).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash")
    )
    plain_cand = spark.range(2_500, 7_500).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash"),
        F.lit(1).alias("depth"),
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            plain_cand.join(plain_seen, "url_hash", "left_anti")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") >= 2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
