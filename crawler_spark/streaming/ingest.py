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
    state_hash_buckets: int = 64,
) -> DataFrame:
    """Streaming URL-seen dedup: the frontier's J1/J2 anti-join semantics as
    a *stateful* streaming operator — first arrival of a url passes, every
    later arrival (any micro-batch, any file drop) is dropped.

    State is keyed by ``(bucket, url_hash)``: the same xxhash64 key the
    batch frontier uses, pre-bucketed so the state-store shuffle partitions
    by a uniform 8-byte key rather than raw url strings (hot-host URL skew
    never concentrates state). Implemented with
    ``applyInPandasWithState`` — per group the state is one boolean
    ("emitted already"); unbounded streams would add a TTL via the
    processing-time timeout the same handle exposes.

    Returns the unstarted deduped stream of (url, url_hash, warc_ts);
    callers attach their sink. With ``trigger(availableNow=True)`` +
    checkpoint this is the streaming analog of the wave loop's
    seen-table contract: exactly-once admission per url across restarts.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(corpus_dir)
    keyed = stream.select(
        "url",
        F.xxhash64("url").alias("url_hash"),
        "warc_ts",
    ).withColumn(
        "bucket", F.pmod(F.col("url_hash"), F.lit(state_hash_buckets)).cast("int")
    )

    out_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("url_hash", T.LongType()),
            T.StructField("warc_ts", T.TimestampType()),
        ]
    )
    state_schema = T.StructType([T.StructField("seen_hashes", T.ArrayType(T.LongType()))])

    def dedup_group(key, pdf_iter, state: "GroupState"):
        import pandas as pd  # noqa: F401 (executor-side)

        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdf_iter:
            # first occurrence within the batch wins (stable arrival order)
            fresh = pdf[~pdf["url_hash"].isin(seen)]
            fresh = fresh.drop_duplicates(subset=["url_hash"], keep="first")
            seen.update(int(h) for h in fresh["url_hash"])
            if len(fresh):
                yield fresh[["url", "url_hash", "warc_ts"]]
        state.update((sorted(seen),))

    return keyed.groupBy("bucket").applyInPandasWithState(
        dedup_group,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


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
