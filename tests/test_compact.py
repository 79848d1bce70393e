"""Small-file compaction (sinks/compact.py): metadata-only planning via
the shard prefix-sum, large-file passthrough, and the one-shuffle
rewrite's exact row preservation. DuckDB value parity runs via the gate
entry (`compact_plan_docs`)."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.sinks.compact import (
    compact_parquet,
    file_stats,
    plan_compaction,
)


@pytest.fixture(scope="module")
def small_table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("compact") / "small")
    spark.range(4000).withColumn("v", F.expr("id * 2")).repartition(
        40
    ).write.parquet(path)
    return path


def test_file_stats_counts_and_bytes(spark, small_table):
    st = file_stats(spark, small_table).collect()
    assert len(st) == 40
    assert sum(r.n_rows for r in st) == 4000
    assert all(r.bytes > 0 for r in st)


def test_plan_balances_bytes_and_is_partition_invariant(spark, small_table):
    st = file_stats(spark, small_table)
    target = 30_000
    plan = plan_compaction(st, target_bytes=target)
    per_bin = plan.groupBy("bin").agg(
        F.sum("bytes").alias("b"), F.count("*").alias("files")
    ).collect()
    assert all(r.bin >= 0 for r in per_bin)
    max_file = max(r.bytes for r in st.collect())
    # contiguous-block rule: every bin except the tail overshoots by
    # less than one file
    full = [r for r in per_bin if r.b >= target]
    assert all(r.b < target + max_file for r in full)
    a = sorted((r.path, r.bin) for r in plan.collect())
    b = sorted(
        (r.path, r.bin)
        for r in plan_compaction(st.repartition(7), target_bytes=target).collect()
    )
    assert a == b


def test_plan_small_only_leaves_large_files_alone(spark):
    st = spark.createDataFrame(
        [("a", 10, 100), ("b", 10, 120), ("c", 10, 90_000)],
        "path string, n_rows long, bytes long",
    )
    plan = {r.path: r.bin for r in plan_compaction(
        st, target_bytes=1000, small_only_below=50_000
    ).collect()}
    assert plan["c"] == -1
    assert plan["a"] >= 0 and plan["b"] >= 0


def test_compact_preserves_rows_and_reduces_files(spark, small_table, tmp_path):
    out = str(tmp_path / "compacted")
    compact_parquet(spark, small_table, out, target_bytes=30_000)
    a = spark.read.parquet(small_table).agg(
        F.count("*"), F.sum("v"), F.sum(F.expr("id * id"))
    ).first()
    b = spark.read.parquet(out).agg(
        F.count("*"), F.sum("v"), F.sum(F.expr("id * id"))
    ).first()
    assert a == b
    n_out = file_stats(spark, out).count()
    assert n_out < 40 / 4  # 40 tiny files collapse to a handful


def test_compact_large_passthrough_keeps_own_file(spark, tmp_path):
    src = str(tmp_path / "mixed")
    spark.range(0, 200).withColumn("v", F.lit("s")).repartition(8).write.parquet(src)
    big = spark.range(10_000, 60_000).withColumn(
        "v", F.expr("repeat('x', 64)")
    )
    big.coalesce(1).write.mode("append").parquet(src)
    st = file_stats(spark, src)
    big_bytes = max(r.bytes for r in st.collect())
    out = str(tmp_path / "mixed_out")
    plan = compact_parquet(
        spark, src, out, target_bytes=50_000, small_only_below=big_bytes
    )
    assert plan.where("bin = -1").count() == 1
    a = spark.read.parquet(src).agg(F.count("*"), F.min("id"), F.max("id")).first()
    b = spark.read.parquet(out).agg(F.count("*"), F.min("id"), F.max("id")).first()
    assert a == b


def test_compact_multisplit_large_file_preserves_row_order(spark, tmp_path):
    """A passthrough file LARGER than maxPartitionBytes is read as several
    splits; Spark orders read partitions by split size, not byte offset,
    so read-order ids alone are not a contract. The (bin, _cpath,
    input_file_block_start(), _cidx) sort key must restore the file's
    original row order in the rewrite."""
    import glob

    import pyarrow.parquet as pq

    src = str(tmp_path / "bigsrc")
    (
        spark.range(120_000)
        .withColumn("v", F.expr("repeat('y', 40)"))
        .coalesce(1)
        .sortWithinPartitions("id")
        .write.option("parquet.block.size", 64 * 1024)  # many row groups
        .parquet(src)
    )
    out = str(tmp_path / "bigout")
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_cost = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try:
        assert spark.read.parquet(src).rdd.getNumPartitions() > 4
        compact_parquet(spark, src, out, target_bytes=10**9)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", old_cost)
    ids = []
    for f in sorted(glob.glob(out + "/*.parquet")):
        ids += pq.read_table(f, columns=["id"]).column("id").to_pylist()
    assert len(ids) == 120_000
    assert ids == sorted(ids)  # original (sorted) row order survived
