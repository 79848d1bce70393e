"""Structured-Streaming ingest: continuous page extraction + host-rate
windows.

The reference has no streaming semantics (SURVEY §2.10) — its crawl loop is
synchronous batch BFS, and the engine's wave loop maps that to atomic batch
commits. What a 100 TB training-data pipeline ADDS on top is continuous
ingestion: new page files land in a directory (a WARC drop, an upstream
fetcher's output) and must flow through the same extraction kernel without
re-processing old files. That is exactly Spark's file-source + checkpoint
contract:

- ``stream_extract``: ``readStream`` over the corpus directory ->
  ``extract_pages`` (the identical Arrow kernel the batch crawl uses — same
  bytes out) -> ``writeStream`` parquet append. Exactly-once per input file
  via the streaming checkpoint; a restart resumes where it left off, the
  streaming analog of the wave-commit resume contract.
- ``host_rate_stream``: event-time windowed per-host page counts on
  ``warc_ts`` with a watermark — the politeness/rate signal as a live
  aggregation (late pages beyond the watermark are dropped from the
  window's final state, which is the correct semantics for a rate monitor).

Both run with ``trigger(availableNow=True)`` in tests (drain-and-stop) and
as continuous triggers in production.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.operators.extract import extract_pages

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def stream_extract(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    instructions: Optional[str] = None,
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
):
    """Continuously extract page records from files arriving in
    ``corpus_dir``. Returns the started StreamingQuery (caller awaits it).

    The extraction plan is the batch plan — ``extract_pages`` is
    stream-safe (stateless mapInPandas), so Catalyst runs the identical
    kernel per micro-batch and outputs are byte-identical to batch runs
    over the same files."""
    reader = spark.readStream.schema(CORPUS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(corpus_dir)
    pages = extract_pages(
        stream.select("url", "warc_ts", "html"), instructions=instructions, carry=False
    )
    writer = (
        pages.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_seen_dedup(
    spark: SparkSession,
    corpus_dir: str,
    impl: str = "native",
) -> DataFrame:
    """Streaming URL-seen dedup: the frontier's J1/J2 anti-join semantics as
    a *stateful* streaming operator — first arrival of a url passes, every
    later arrival (any micro-batch, any file drop) is dropped.

    State is keyed by ``url_hash`` itself (the same xxhash64 key the batch
    frontier uses), so the state store holds exactly ONE row per distinct
    url and shards it across partitions by key hash — state size and
    shuffle both scale with distinct urls, never with a fixed bucket
    count. (An earlier design kept one grow-forever hash array per each of
    64 buckets: at the 10^10-url design point that is ~156M longs
    deserialized and re-serialized per bucket per micro-batch — unbounded,
    quadratic, wrong. Per-key state is how Spark's state store is meant to
    shard.)

    ``impl``:

    - ``"native"`` (default, the 100 TB path): built-in streaming
      ``dropDuplicates`` on ``url_hash`` — per-key boolean state lives
      JVM-side in the state store (HDFS/RocksDB backends), no Python in
      the loop. Unbounded streams bound state with
      ``dropDuplicatesWithinWatermark`` once re-delivery has a horizon.
    - ``"pandas"``: the same semantics as a custom
      ``applyInPandasWithState`` operator (SURVEY §2.10's stateful-operator
      seam, the template for stateful logic built-ins can't express). Per
      key the state is one boolean ("emitted already").

    Returns the unstarted deduped stream of (url, url_hash, warc_ts);
    callers attach their sink. With ``trigger(availableNow=True)`` +
    checkpoint this is the streaming analog of the wave loop's
    seen-table contract: exactly-once admission per url across restarts.
    """
    stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(corpus_dir)
    keyed = stream.select(
        "url",
        F.xxhash64("url").alias("url_hash"),
        "warc_ts",
    )
    if impl == "native":
        return keyed.dropDuplicates(["url_hash"])
    if impl != "pandas":
        raise ValueError(f"impl must be 'native' or 'pandas', got {impl!r}")

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("url_hash", T.LongType()),
            T.StructField("warc_ts", T.TimestampType()),
        ]
    )
    state_schema = T.StructType([T.StructField("emitted", T.BooleanType())])

    def dedup_group(key, pdf_iter, state: "GroupState"):
        if state.exists:
            for _ in pdf_iter:  # drain: this url already passed once
                pass
            return
        first = None
        for pdf in pdf_iter:
            if first is None and len(pdf):
                # first occurrence in arrival order wins within the batch
                first = pdf.iloc[[0]][["url", "url_hash", "warc_ts"]]
        if first is not None:
            state.update((True,))
            yield first

    return keyed.groupBy("url_hash").applyInPandasWithState(
        dedup_group,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_host_politeness(
    spark: SparkSession,
    corpus_dir: str,
    per_host_budget: int = 2,
    host_budget: Optional[dict] = None,
    max_deferred: int = 10_000,
) -> DataFrame:
    """Stateful per-host politeness admission: each micro-batch admits at
    most ``budget(host)`` pages per host; overflow is DEFERRED, not dropped
    (the batch crawl's S3 semantics — enhanced_crawler.py:131-153's
    backoff-and-retry re-expressed as budgeted admission).

    ``applyInPandasWithState`` keyed by ``host``: per-key state is the
    host's deferred backlog (FIFO). Each invocation admits from the backlog
    first, then from new arrivals in order, up to the budget; the remainder
    goes back to state. Backlog rows surface when the host next receives
    data or when its processing-time timeout fires (idle hosts drain on a
    timer, not only on traffic).

    State is bounded by ``max_deferred`` per host: beyond it, rows are
    emitted immediately with ``status='overflow'`` so a caller can route
    them to the durable batch frontier instead of streaming state — at
    100 TB the backlog belongs in the frontier table, and this cap is the
    backpressure seam that keeps the state store from becoming that table.

    Output schema: (url, url_hash, host, warc_ts, status) with status in
    {'admitted', 'overflow'}. Deferred rows appear in a LATER trigger with
    status='admitted'.

    Lifecycle: this is a CONTINUOUS operator — processing-time timeouts
    keep generating no-data batches to drain backlogs, so even
    ``trigger(availableNow=True)`` will not self-terminate; callers poll
    the sink (or ``lastProgress``) and ``stop()`` when drained. For a
    drain-and-stop batch-style cadence use ``politeness_sink_stream``,
    whose backlog lives in storage instead of state.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from crawler_spark.operators.extract import domain_of

    budgets = dict(host_budget or {})
    stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(corpus_dir)
    keyed = stream.select(
        "url",
        F.xxhash64("url").alias("url_hash"),
        domain_of(F.col("url")).alias("host"),
        "warc_ts",
    )

    out_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("url_hash", T.LongType()),
            T.StructField("host", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("status", T.StringType()),
        ]
    )
    # backlog kept as parallel arrays (state schemas are flat structs);
    # timestamps as epoch micros so the tuple round-trips losslessly
    state_schema = T.StructType(
        [
            T.StructField("urls", T.ArrayType(T.StringType())),
            T.StructField("hashes", T.ArrayType(T.LongType())),
            T.StructField("ts_us", T.ArrayType(T.LongType())),
        ]
    )

    def admit_group(key, pdf_iter, state: "GroupState"):
        import pandas as pd

        host = key[0]
        budget = int(budgets.get(host, per_host_budget))
        backlog = (
            list(zip(*state.get)) if state.exists and state.get[0] else []
        )  # [(url, hash, ts_us)] FIFO
        arrivals = []
        for pdf in pdf_iter:
            for u, h, ts in zip(pdf["url"], pdf["url_hash"], pdf["warc_ts"]):
                arrivals.append((u, int(h), int(ts.value // 1_000)))
        queue = backlog + arrivals  # backlog first: FIFO across triggers
        admitted, rest = queue[:budget], queue[budget:]
        kept, overflow = rest[:max_deferred], rest[max_deferred:]
        if kept:
            state.update(
                (
                    [q[0] for q in kept],
                    [q[1] for q in kept],
                    [q[2] for q in kept],
                )
            )
            state.setTimeoutDuration(1_000)  # drain idle hosts next trigger
        elif state.exists:
            state.remove()
        rows = [(u, h, host, ts, "admitted") for u, h, ts in admitted] + [
            (u, h, host, ts, "overflow") for u, h, ts in overflow
        ]
        if rows:
            out = pd.DataFrame(
                rows, columns=["url", "url_hash", "host", "warc_ts", "status"]
            )
            out["warc_ts"] = pd.to_datetime(out["warc_ts"], unit="us")
            yield out

    return keyed.groupBy("host").applyInPandasWithState(
        admit_group,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def politeness_sink_stream(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    defer_dir: str,
    checkpoint_dir: str,
    per_host_budget: int = 2,
    available_now: bool = True,
):
    """Rate-limited sink: per micro-batch, admit at most ``per_host_budget``
    pages per host into ``out_dir``; the remainder lands in ``defer_dir``
    (a durable parquet backlog) and is merged ahead of the next batch's
    arrivals — deferred-not-dropped with the backlog in STORAGE, not in
    streaming state. This is the 100 TB shape: the backlog is just another
    table (exactly how the batch crawl carries over-budget frontier rows to
    the next wave), so it can grow to any size without touching the state
    store, and a restart resumes from the checkpoint + the backlog on disk.

    The admission rule is the batch politeness arithmetic: rank per host by
    (deferred-first, warc_ts, url) and keep rank <= budget. Returns the
    started StreamingQuery.
    """
    from pyspark.sql import Window

    stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(corpus_dir)

    def admit_batch(batch_df, batch_id):
        from crawler_spark.operators.extract import domain_of

        s = batch_df.sparkSession
        new = batch_df.select(
            "url",
            F.xxhash64("url").alias("url_hash"),
            domain_of(F.col("url")).alias("host"),
            "warc_ts",
        ).withColumn("_deferred", F.lit(1))
        try:
            backlog = s.read.parquet(defer_dir).withColumn(
                "_deferred", F.lit(0)
            )
            queue = backlog.unionByName(new)
        except Exception:  # no backlog yet
            queue = new
        w = Window.partitionBy("host").orderBy("_deferred", "warc_ts", "url")
        ranked = queue.withColumn("_rk", F.row_number().over(w))
        admitted = ranked.filter(F.col("_rk") <= per_host_budget).drop(
            "_rk", "_deferred"
        )
        deferred = ranked.filter(F.col("_rk") > per_host_budget).drop(
            "_rk", "_deferred"
        )
        admitted.write.mode("append").parquet(out_dir)
        # stage the new backlog, then swap: the read above and this write
        # target the same path, so never overwrite in place mid-plan
        staged = deferred.cache()
        staged.count()
        staged.write.mode("overwrite").parquet(defer_dir)
        staged.unpersist()

    writer = (
        stream.writeStream.foreachBatch(admit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def host_rate_stream(
    spark: SparkSession,
    corpus_dir: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Event-time per-host page counts: the live politeness/rate signal.

    Returns the unstarted aggregated streaming DataFrame — callers attach
    their sink (memory sink in tests, a metrics table in production).
    Late pages beyond the watermark no longer update their window."""
    from crawler_spark.operators.extract import domain_of

    stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(corpus_dir)
    return (
        stream.withColumn("host", domain_of(F.col("url")))
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "host")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_pages",
        )
    )


def host_session_stream(
    spark: SparkSession,
    corpus_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap sessions per host: Spark's native ``session_window``
    (dynamic-gap event-time windows) over arriving pages — the streaming
    twin of ``operators/sessions.sessionize`` (which numbers sessions for
    bounded tables). A host's session closes when no page arrives for
    ``gap``; the watermark bounds state and finalizes closed sessions.

    Returns the unstarted aggregated streaming DataFrame: one row per
    (host, session) with page count and session bounds. Update-mode sinks
    see sessions grow; append-mode sinks see only finalized ones.
    """
    from crawler_spark.operators.extract import domain_of

    stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(corpus_dir)
    return (
        stream.withColumn("host", domain_of(F.col("url")))
        .withWatermark("warc_ts", watermark)
        .groupBy(F.session_window("warc_ts", gap).alias("w"), "host")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "host",
            "n_pages",
        )
    )


def term_rate_stream(
    spark: SparkSession,
    corpus_dir: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    stopwords: Optional[list] = None,
) -> DataFrame:
    """Event-time term counts over arriving pages — the trending-topics /
    corpus-drift monitor of a continuous crawl.

    Tokens ride the same watermarked tumbling windows as
    :func:`host_rate_stream`; state is bounded by (windows in flight x
    distinct terms), and late pages beyond the watermark stop updating
    their window. Returns the unstarted aggregated stream; pair it with
    :func:`top_terms` / :func:`trending_terms` on the materialized
    metrics table (ranking needs a closed window, which is a batch
    concern by construction).
    """
    from crawler_spark.operators.dedup import tokens_expr

    stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(corpus_dir)
    toks = stream.withWatermark("warc_ts", watermark).select(
        "warc_ts", F.explode(F.expr(tokens_expr("text"))).alias("term")
    )
    if stopwords:
        toks = toks.filter(~F.col("term").isin(list(stopwords)))
    return (
        toks.groupBy(F.window("warc_ts", window).alias("w"), "term")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "term",
            "n",
        )
    )


def top_terms(term_rates: DataFrame, k: int = 10) -> DataFrame:
    """Batch helper over a materialized :func:`term_rate_stream` table:
    deterministic top-``k`` terms per window, ties broken lexically."""
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start").orderBy(F.desc("n"), "term")
    return (
        term_rates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
    )


def trending_terms(term_rates: DataFrame, k: int = 10) -> DataFrame:
    """Batch helper: per-window top-``k`` RISERS — terms ranked by count
    delta vs the same term's previous window (a term absent last window
    has delta = n). The change signal, not the raw-volume signal
    :func:`top_terms` gives."""
    from pyspark.sql import Window as W

    lag_w = W.partitionBy("term").orderBy("window_start")
    deltas = term_rates.withColumn(
        "prev_n",
        F.coalesce(F.lag("n").over(lag_w), F.lit(0)),
    ).withColumn("delta", F.col("n") - F.col("prev_n"))
    rank_w = W.partitionBy("window_start").orderBy(F.desc("delta"), "term")
    return deltas.withColumn("rank", F.row_number().over(rank_w)).filter(
        F.col("rank") <= int(k)
    )


def incremental_dedup_stream(
    spark: SparkSession,
    docs_dir: str,
    store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
):
    """Continuous cross-wave near-dup: every arriving micro-batch of
    documents probes the accumulated MinHash signature store
    (``operators/dedup.incremental_near_dups``) and then appends its own
    signatures — the streaming face of the batch incremental dedup, so a
    live crawl flags duplicates against everything ever ingested without
    re-hashing old waves.

    Exactly-once without streaming state: the store and the pairs output
    are parquet tables partitioned by ``batch_id`` written with DYNAMIC
    partition overwrite, so a replayed batch (checkpoint recovery)
    overwrites its own partition instead of double-appending, and the
    probe reads only partitions with ``batch_id < current`` — a replay
    sees exactly the store the original attempt saw. State store holds
    nothing; the signature table is just data (the same
    backlog-in-storage stance as ``politeness_sink_stream``).

    Returns the started StreamingQuery.
    """
    from crawler_spark.operators.dedup import (
        incremental_near_dups,
        minhash_signatures,
    )

    schema = spark.read.parquet(docs_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(docs_dir)

    def process(batch_df, batch_id):
        s = batch_df.sparkSession
        new_sigs = minhash_signatures(
            batch_df, text_col, id_col, num_hashes, shingle_k
        ).localCheckpoint()
        try:
            prior = (
                s.read.parquet(store_dir)
                .filter(F.col("batch_id") < F.lit(batch_id))
                .select(id_col, "minhash")
            )  # empty on a batch-0 replay: the probe degrades to new-new
        except Exception:  # store not created yet
            prior = None
        pairs, _ = incremental_near_dups(
            batch_df,
            prior,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_k=shingle_k,
            threshold=threshold,
            new_sigs=new_sigs,
        )
        dyn = {"partitionOverwriteMode": "dynamic"}
        (
            pairs.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .options(**dyn)
            .partitionBy("batch_id")
            .parquet(pairs_dir)
        )
        (
            new_sigs.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .options(**dyn)
            .partitionBy("batch_id")
            .parquet(store_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def snapshot_stream(
    spark: SparkSession,
    history_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    hash_col: str = "content_hash",
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
):
    """Continuous latest-wins snapshot: the streaming face of
    ``frontier.recrawl.latest_snapshot``. Each micro-batch of fetch
    records reduces to ONE summary row per URL — ``(url, first_ts,
    first_hash, last_ts, last_hash, n_fetches, n_changes, batch_id)`` —
    written as a parquet partition with DYNAMIC overwrite, so a replayed
    batch (checkpoint recovery) overwrites its own partition instead of
    double-counting: exactly-once with zero state-store rows, the same
    backlog-in-storage stance as ``incremental_dedup_stream``.

    ``snapshot_view`` merges the summaries on read. Per-URL change
    counting across batch boundaries needs segment order, so the merge is
    exact when each URL's fetches arrive in event-time order across
    batches (the normal shape of a fetch log: a recrawl happens after the
    previous fetch was recorded); within a batch any order is fine.

    Returns the started StreamingQuery.
    """
    schema = spark.read.parquet(history_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(history_dir)

    def process(batch_df, batch_id):
        from pyspark.sql import Window

        w_asc = Window.partitionBy(url_col).orderBy(ts_col, hash_col)
        w_all = (
            Window.partitionBy(url_col)
            .orderBy(ts_col)
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        prev = F.lag(hash_col).over(w_asc)
        summary = (
            batch_df.withColumn(
                "_chg",
                F.when(prev.isNull(), F.lit(0))
                .when(prev != F.col(hash_col), F.lit(1))
                .otherwise(F.lit(0)),
            )
            .withColumn("_rn_a", F.row_number().over(w_asc))
            .withColumn(
                "_rn_d",
                F.row_number().over(
                    Window.partitionBy(url_col).orderBy(
                        F.desc(ts_col), F.desc(hash_col)
                    )
                ),
            )
            .withColumn("n_fetches", F.count("*").over(w_all).cast("bigint"))
            .withColumn("n_changes", F.sum("_chg").over(w_all).cast("bigint"))
            .withColumn("first_ts", F.min(ts_col).over(w_all))
            .withColumn(
                "first_hash", F.first(hash_col).over(w_asc)
            )
            .filter(F.col("_rn_d") == 1)
            .select(
                F.col(url_col).alias("url"),
                "first_ts",
                "first_hash",
                F.col(ts_col).alias("last_ts"),
                F.col(hash_col).alias("last_hash"),
                "n_fetches",
                "n_changes",
            )
        )
        (
            summary.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .options(partitionOverwriteMode="dynamic")
            .partitionBy("batch_id")
            .parquet(store_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def snapshot_view(spark: SparkSession, store_dir: str) -> DataFrame:
    """Merge ``snapshot_stream`` summaries into the current-revision view:
    ``(url, content_hash, n_fetches, n_changes, warc_ts, first_fetch_ts)``
    — the same columns ``latest_snapshot`` derives from raw history
    (asserted equal in tests). The input is one row per (url, batch), so
    this reads summaries, never refetches raw rows: counters sum; latest
    is the max (last_ts, last_hash) segment; boundary transitions add 1
    change when a segment's first_hash differs from its predecessor's
    last_hash (segments ordered by (first_ts, first_hash, batch_id))."""
    from pyspark.sql import Window

    seg = spark.read.parquet(store_dir)
    w_ord = Window.partitionBy("url").orderBy(
        "first_ts", "first_hash", "batch_id"
    )
    w_all = (
        Window.partitionBy("url")
        .orderBy("first_ts")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    prev_last = F.lag("last_hash").over(w_ord)
    marked = seg.withColumn(
        "_bchg",
        F.when(prev_last.isNull(), F.lit(0))
        .when(prev_last != F.col("first_hash"), F.lit(1))
        .otherwise(F.lit(0)),
    )
    return (
        marked.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("url").orderBy(
                    F.desc("last_ts"), F.desc("last_hash"), F.desc("batch_id")
                )
            ),
        )
        .withColumn(
            "n_fetches_t", F.sum("n_fetches").over(w_all).cast("bigint")
        )
        .withColumn(
            "n_changes_t",
            (F.sum("n_changes").over(w_all) + F.sum("_bchg").over(w_all))
            .cast("bigint"),
        )
        .withColumn("first_fetch_ts", F.min("first_ts").over(w_all))
        .filter(F.col("_rn") == 1)
        .select(
            "url",
            F.col("last_hash").alias("content_hash"),
            F.col("n_fetches_t").alias("n_fetches"),
            F.col("n_changes_t").alias("n_changes"),
            F.col("last_ts").alias("warc_ts"),
            "first_fetch_ts",
        )
    )
