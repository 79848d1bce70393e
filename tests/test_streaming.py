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


@pytest.mark.parametrize("impl", ["native", "pandas"])
def test_stream_seen_dedup_stateful(spark, split_corpus, tmp_path, impl):
    """First arrival of a url passes; re-deliveries in LATER micro-batches
    are dropped by the per-url_hash seen-state (the streaming analog of
    the frontier's J1/J2 anti-join) — identical semantics from the
    built-in dropDuplicates path and the custom stateful operator."""
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
            stream_seen_dedup(spark, dup_dir, impl=impl)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = q.lastProgress
        return spark.read.parquet(out), progress

    got1, _ = drain()
    assert got1.count() == 40

    # drop 2: 20 duplicates of drop 1 + the 20 genuinely new urls
    dups = full.limit(20)
    rest = full.subtract(first)
    dups.unionByName(rest).coalesce(1).write.mode("append").parquet(dup_dir)
    got2, progress = drain()
    assert got2.count() == 60  # 40 + 20 new; 20 re-deliveries dropped
    assert got2.select("url").distinct().count() == 60

    # the scale contract: state rows grow with DISTINCT urls, one row per
    # key — never a fixed bucket count hoarding grow-forever arrays
    state_ops = (progress or {}).get("stateOperators") or []
    if state_ops:
        assert state_ops[0]["numRowsTotal"] == 60


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


def test_stream_host_politeness_deferred_not_dropped(spark, split_corpus, tmp_path):
    """Budgeted admission per host per trigger: overflow rows are deferred
    into per-host state and admitted by LATER (timeout-driven) triggers —
    the batch crawl's deferred-not-dropped S3 semantics; nothing is lost,
    nothing admitted twice, and no single trigger exceeds the budget."""
    import os
    import time

    from crawler_spark.streaming import stream_host_politeness

    pol_dir = str(tmp_path / "pol_corpus")
    os.makedirs(pol_dir)
    full = split_corpus["df"]
    total = full.count()
    # one drop with everything at once — way over any per-trigger budget
    full.coalesce(1).write.mode("append").parquet(pol_dir)

    out = str(tmp_path / "pol_out")
    ckpt = str(tmp_path / "pol_ckpt")
    budget = 3

    # continuous operator: poll the sink until the backlog drains, then stop
    q = (
        stream_host_politeness(spark, pol_dir, per_host_budget=budget)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + 180
    admitted = 0
    try:
        while time.time() < deadline:
            try:
                admitted = (
                    spark.read.parquet(out).filter("status = 'admitted'").count()
                )
            except Exception:
                admitted = 0
            if admitted >= total:
                break
            time.sleep(2)
    finally:
        q.stop()
    assert admitted == total, f"deferred rows lost: {admitted}/{total}"

    got = spark.read.parquet(out)
    adm = got.filter("status = 'admitted'")
    assert adm.select("url").distinct().count() == total  # exactly once
    assert got.filter("status = 'overflow'").count() == 0  # under max_deferred

    # per-trigger budget: each micro-batch's admissions for one host land in
    # that task's output file, so (file, host) groups bound trigger batches
    per_file = (
        adm.withColumn("_f", F.input_file_name())
        .groupBy("_f", "host")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert all(r["n"] <= budget for r in per_file), per_file
    # and draining 15 pages/host at 3/trigger takes >= 5 distinct triggers
    from collections import defaultdict

    files_per_host = defaultdict(set)
    for r in per_file:
        files_per_host[r["host"]].add(r["_f"])
    assert all(len(fs) >= 2 for fs in files_per_host.values())


def test_politeness_sink_stream_storage_backlog(spark, split_corpus, tmp_path):
    """foreachBatch rate-limited sink: per-batch per-host cap holds, the
    overflow lives in a durable parquet backlog (not state), and repeated
    drains admit everything exactly once."""
    import os

    from crawler_spark.streaming import politeness_sink_stream

    src_dir = str(tmp_path / "sink_corpus")
    os.makedirs(src_dir)
    full = split_corpus["df"]
    total = full.count()
    full.coalesce(1).write.mode("append").parquet(src_dir)

    out = str(tmp_path / "sink_out")
    defer = str(tmp_path / "sink_defer")
    ckpt = str(tmp_path / "sink_ckpt")
    budget = 4

    def drain():
        q = politeness_sink_stream(
            spark, src_dir, out, defer, ckpt, per_host_budget=budget
        )
        q.awaitTermination()
        try:
            return spark.read.parquet(out)
        except Exception:
            return None

    got = drain()
    n_admitted = got.count()
    per_host = got.groupBy("host").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= budget for r in per_host)
    backlog = spark.read.parquet(defer)
    assert n_admitted + backlog.count() == total  # nothing dropped

    # each later empty drop drains another budget-per-host slice of the
    # stored backlog until the source is fully admitted, exactly once
    for _ in range(40):
        if n_admitted >= total:
            break
        full.limit(0).coalesce(1).write.mode("append").parquet(src_dir)
        got = drain()
        n_admitted = got.count()
    assert n_admitted == total
    assert got.select("url").distinct().count() == total


def test_term_rate_stream_and_ranking(spark, split_corpus):
    """Windowed term counts match the batch replay; top/trending ranking
    helpers are deterministic on the materialized table."""
    from crawler_spark.operators.dedup import tokens_expr
    from crawler_spark.streaming import (
        term_rate_stream,
        top_terms,
        trending_terms,
    )

    agg = term_rate_stream(spark, split_corpus["dir"], window="1 minute")
    q = (
        agg.writeStream.format("memory")
        .queryName("term_rates")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rates = spark.table("term_rates").cache()
    assert rates.count() > 0

    # per-term totals across windows == batch token counts
    stream_tot = {
        r["term"]: r["t"]
        for r in rates.groupBy("term").agg(F.sum("n").alias("t")).collect()
    }
    batch_tot = {
        r["term"]: r["t"]
        for r in spark.read.parquet(split_corpus["dir"])
        .select(F.explode(F.expr(tokens_expr("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("t"))
        .collect()
    }
    assert stream_tot == batch_tot

    # top_terms: per window, exactly the (n desc, term) head of the table
    top = top_terms(rates, k=3)
    for ws_row in rates.select("window_start").distinct().collect():
        ws = ws_row["window_start"]
        exp = sorted(
            (
                (-r["n"], r["term"])
                for r in rates.filter(F.col("window_start") == ws).collect()
            )
        )[:3]
        got = [
            (-r["n"], r["term"])
            for r in top.filter(F.col("window_start") == ws)
            .orderBy("rank")
            .collect()
        ]
        assert got == exp

    # trending_terms: delta vs the SAME term's previous window
    tr = {
        (r["window_start"], r["term"]): (r["prev_n"], r["delta"])
        for r in trending_terms(rates, k=10_000).collect()
    }
    by_term = {}
    for r in rates.collect():
        by_term.setdefault(r["term"], []).append((r["window_start"], r["n"]))
    for term, seq in by_term.items():
        seq.sort()
        prev = 0
        for ws, n in seq:
            assert tr[(ws, term)] == (prev, n - prev)
            prev = n
    rates.unpersist()
