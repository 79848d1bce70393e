"""Structured-Streaming ingest: exactly-once file-source extraction (same
bytes as batch) and watermarked per-host rate windows."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from crawler_spark.datagen import CorpusSpec, corpus_rows


@pytest.fixture(scope="module")
def split_corpus(spark, tmp_path_factory):
    """Corpus written as two separate file drops (arrival batches)."""
    base = tmp_path_factory.mktemp("stream")
    rows = corpus_rows(CorpusSpec(n_pages=60, n_hosts=4, seed=42))
    corpus_dir = str(base / "corpus")
    os.makedirs(corpus_dir)
    df = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    half1 = df.filter(F.xxhash64("url") % 2 == 0)
    half2 = df.filter(F.xxhash64("url") % 2 != 0)
    # first drop only; the second lands mid-test
    half1.coalesce(1).write.mode("append").parquet(corpus_dir)
    return {"dir": corpus_dir, "half2": half2, "df": df, "base": str(base)}


def test_stream_extract_exactly_once_and_batch_identical(spark, split_corpus):
    from crawler_spark.operators.extract import extract_pages
    from crawler_spark.streaming import stream_extract

    out = split_corpus["base"] + "/pages_out"
    ckpt = split_corpus["base"] + "/ckpt"

    q = stream_extract(spark, split_corpus["dir"], out, ckpt)
    q.awaitTermination()
    n1 = spark.read.parquet(out).count()
    assert n1 == spark.read.parquet(split_corpus["dir"]).count()

    # second file drop arrives; restart drains ONLY the new file
    split_corpus["half2"].coalesce(1).write.mode("append").parquet(
        split_corpus["dir"]
    )
    q = stream_extract(spark, split_corpus["dir"], out, ckpt)
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 60  # no reprocessing of drop 1 (exactly-once)
    assert got.select("url").distinct().count() == 60

    # byte-identity: streaming output == batch kernel over the same corpus
    batch = extract_pages(
        spark.read.parquet(split_corpus["dir"]).select("url", "warc_ts", "html"),
        carry=False,
    )
    g = {r["url"]: r for r in got.collect()}
    for b in batch.collect():
        r = g[b["url"]]
        assert r["title"] == b["title"]
        assert r["markdown"] == b["markdown"]
        assert r["links"] == b["links"]
        assert r["timestamp"] == b["timestamp"]


def test_host_rate_windows(spark, split_corpus, tmp_path):
    from crawler_spark.streaming import host_rate_stream

    agg = host_rate_stream(spark, split_corpus["dir"], window="1 minute")
    q = (
        agg.writeStream.format("memory")
        .queryName("host_rates")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rates = spark.sql("SELECT * FROM host_rates").collect()
    assert rates, "windows must materialize"
    # totals per host across windows == batch per-host counts
    from collections import defaultdict

    stream_tot = defaultdict(int)
    for r in rates:
        stream_tot[r["host"]] += r["n_pages"]
    batch = {
        r["host"]: r["n"]
        for r in spark.read.parquet(split_corpus["dir"])
        .withColumn("host", F.regexp_extract("url", r"https://([^/]+)/", 1))
        .groupBy("host")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert dict(stream_tot) == batch


def test_stream_seen_dedup_stateful(spark, split_corpus, tmp_path):
    """First arrival of a url passes; re-deliveries in LATER micro-batches
    are dropped by the applyInPandasWithState seen-state (the streaming
    analog of the frontier's J1/J2 anti-join)."""
    import os

    from crawler_spark.streaming import stream_seen_dedup

    # a corpus dir where drop 2 re-delivers some of drop 1's urls
    dup_dir = str(tmp_path / "dup_corpus")
    os.makedirs(dup_dir)
    full = split_corpus["df"]
    first = full.limit(40)
    first.coalesce(1).write.mode("append").parquet(dup_dir)

    out = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")

    def drain():
        q = (
            stream_seen_dedup(spark, dup_dir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out)

    got1 = drain()
    assert got1.count() == 40

    # drop 2: 20 duplicates of drop 1 + the 20 genuinely new urls
    dups = full.limit(20)
    rest = full.subtract(first)
    dups.unionByName(rest).coalesce(1).write.mode("append").parquet(dup_dir)
    got2 = drain()
    assert got2.count() == 60  # 40 + 20 new; 20 re-deliveries dropped
    assert got2.select("url").distinct().count() == 60


def test_host_session_windows(spark, split_corpus):
    from crawler_spark.streaming import host_session_stream

    agg = host_session_stream(spark, split_corpus["dir"], gap="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("host_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sess = spark.sql("SELECT * FROM host_sessions").collect()
    assert sess, "session windows must materialize"
    # page totals across sessions == batch per-host counts (no page is
    # lost or double-counted by the session merge)
    from collections import defaultdict

    tot = defaultdict(int)
    for r in sess:
        tot[r["host"]] += r["n_pages"]
        assert r["session_end"] > r["session_start"]
    batch = {
        r["host"]: r["n"]
        for r in spark.read.parquet(split_corpus["dir"])
        .withColumn("host", F.regexp_extract("url", r"https://([^/]+)/", 1))
        .groupBy("host")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert dict(tot) == batch
