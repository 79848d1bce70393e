"""Small-file compaction for parquet table directories (the OPTIMIZE /
rewrite-data-files maintenance pass).

Why in a crawl engine: a wave-committed crawl appends files every wave,
and a year of waves leaves the pages table as millions of small files —
at 100 TB the scan cost is then dominated by per-file open/footer
overhead and the driver's split planning, not bytes. Compaction rewrites
many small files into ~target-size ones without changing a row.

Scale shape: the PLAN is pure metadata — one row per file (path, bytes),
assigned to output bins by the same two-level distributed prefix sum the
trainer shards use (`sinks/shards.token_balanced_shards` with bytes as
the balanced quantity — deterministic, partition-invariant, no global
window). The REWRITE is one shuffle: rows tag themselves with their
file's bin via ``input_file_name`` + a broadcast of the file->bin map
(files-count rows, not data rows), then ``repartitionByRange(bin)``
writes each bin as one task. No global sort, no driver collect of data.

The reference has no storage layer (one Python dict per crawl,
`/root/reference/crawler/enhanced_crawler.py:290-301`); this is engine
scale surface alongside the Z-order/Hilbert layout writer — compaction
preserves whatever key order each input file already has per bin.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def file_stats(spark: SparkSession, path: str) -> DataFrame:
    """One row per data file under ``path``: ``(path, n_rows, bytes)``.

    Row counts come from a metadata-only grouping on ``input_file_name``
    (parquet count pushdown keeps this scan footer-bound); byte sizes
    from the Hadoop FileSystem listing (works for any URI scheme Spark
    can read), joined on the exact path string."""
    sc = spark.sparkContext
    jvm = sc._jvm
    hconf = sc._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    it = fs.listFiles(jpath, True)
    sizes = []
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        name = os.path.basename(p)
        if name.startswith(("_", ".")):
            continue
        sizes.append((p, int(st.getLen())))
    size_df = spark.createDataFrame(sizes, "path string, bytes long")
    rows = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("path"))
        .agg(F.count("*").cast("bigint").alias("n_rows"))
    )
    # input_file_name renders file:///p while the FS listing renders
    # file:/p — join on a slash-normalized form. LEFT join FROM the
    # listing: a zero-row data file never appears in the grouped scan,
    # but it must still be planned (and compacted away) — coalesce its
    # count to 0. Keep the scan's path spelling when present (it is what
    # the rewrite's input_file_name will produce); fall back to the
    # listing's for empty files (they contribute no rows to tag anyway).
    norm = "regexp_replace(path, '^file:/+', 'file:/')"
    return (
        size_df.withColumn("_np", F.expr(norm))
        .withColumnRenamed("path", "_lpath")
        .join(rows.withColumn("_np", F.expr(norm)), "_np", "left")
        .select(
            F.coalesce("path", "_lpath").alias("path"),
            F.coalesce("n_rows", F.lit(0)).cast("bigint").alias("n_rows"),
            "bytes",
        )
    )


def plan_compaction(
    stats: DataFrame, target_bytes: int, small_only_below: Optional[int] = None
) -> DataFrame:
    """Assign each file a compaction ``bin`` (int, dense from 0): the
    byte-balanced contiguous-block rule over hash-ordered files — the
    shard assignment applied to file metadata, so bins hold
    ~``target_bytes`` each, deterministically at any partitioning.

    ``small_only_below`` (bytes) leaves already-large files alone: they
    keep ``bin = -1`` (rewritten-in-place never; the rewrite step copies
    them through untouched groups). Output: stats + ``bin``."""
    from crawler_spark.sinks.shards import token_balanced_shards

    small = (
        stats
        if small_only_below is None
        else stats.where(F.col("bytes") < int(small_only_below))
    )
    planned = token_balanced_shards(
        small.withColumn("_b", F.col("bytes")),
        tokens_per_shard=int(target_bytes),
        id_col="path",
        tokens_col="_b",
    ).select("path", F.col("shard").cast("int").alias("bin"))
    out = stats.join(planned, "path", "left").select(
        "path", "n_rows", "bytes",
        F.coalesce(F.col("bin"), F.lit(-1)).cast("int").alias("bin"),
    )
    return out


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int,
    small_only_below: Optional[int] = None,
) -> DataFrame:
    """Rewrite ``path`` into ``out_path`` with ~``target_bytes`` files:
    plan over metadata, broadcast the file->bin map, tag every row by
    its source file, one range-repartition on the bin, write. Large
    files (``bin = -1``) keep a bin of their own (one task each — a
    straight copy). Returns the plan with per-bin output counts.

    Rows are preserved exactly (count and content — asserted in tests);
    within-bin row order follows input file order — enforced by an
    explicit within-partition sort on (bin, source file, read-order id),
    since shuffle fetch order alone would NOT guarantee it — so a
    layout-sorted table stays sorted per output file when compacted
    bin-contiguously.
    """
    plan = plan_compaction(
        file_stats(spark, path), target_bytes, small_only_below
    ).persist()
    n_bins = plan.agg(F.max("bin")).first()[0]
    n_bins = int(n_bins) + 1 if n_bins is not None and n_bins >= 0 else 0
    # large files get singleton bins after the packed ones (the window
    # runs over the large-file metadata rows only)
    w_large = plan.where("bin = -1").select(
        "path",
        (F.lit(n_bins) + F.row_number().over(Window.orderBy("path")) - 1)
        .cast("int")
        .alias("bin"),
    )
    fmap = plan.where("bin >= 0").select("path", "bin").unionByName(w_large)
    total_bins = n_bins + w_large.count()
    # _cidx: per-row read-order id carried through the shuffle. Shuffle
    # fetch order across map outputs is NOT deterministic, so without an
    # explicit within-partition sort a compaction would scramble rows
    # inside each output file and silently destroy zkey clustering.
    # _cblock: a file larger than maxPartitionBytes is read as SEVERAL
    # splits, and Spark bin-packs splits into read partitions sorted by
    # SIZE, not byte offset — so neither the partition id inside
    # monotonically_increasing_id nor the within-partition read order
    # follows file order across splits. input_file_block_start() is the
    # split's byte offset: sorting on it restores cross-split order,
    # and _cidx (monotone in read order, and read order within one
    # split IS row order) finishes the job inside each split. The
    # (bin, _cpath, _cblock, _cidx) sort therefore restores source-file
    # order (file names sort in the layout writer's range order) and
    # original row order within each file, for small and multi-split
    # files alike.
    data = (
        spark.read.parquet(path)
        .withColumn("_cpath", F.input_file_name())
        .withColumn("_cblock", F.expr("input_file_block_start()"))
        .withColumn("_cidx", F.monotonically_increasing_id())
    )
    tagged = data.join(
        F.broadcast(fmap.withColumnRenamed("path", "_cpath")), "_cpath"
    )
    (
        tagged.repartitionByRange(max(total_bins, 1), "bin", "_cpath")
        .sortWithinPartitions("bin", "_cpath", "_cblock", "_cidx")
        .drop("_cpath", "bin", "_cblock", "_cidx")
        .write.mode("overwrite")
        .parquet(out_path)
    )
    plan.unpersist(blocking=False)
    return plan
