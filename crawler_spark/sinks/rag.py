"""RAG-document materialization over committed pages.

Re-expresses the reference's ``create_rag_documents``
(/root/reference/crawler/enhanced_crawler.py:338-408) as a pure second-stage
DataFrame transform: per page, a ``summary`` chunk, then ``key_point``
chunks (posexplode -> point_index), then ``content`` chunks from the
overlapping chunker (chunk_index), assembled with unionByName in that order
with a stable (page, kind, index) sort key. Error pages contribute nothing
(:351-352); gated pages (no ai content) still contribute content chunks when
markdown exists (:355, :392) — with the deterministic extractor, relevant
pages always have both; gated pages have neither.

Runs entirely from the committed ``pages`` table — re-runnable without
re-crawling.
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.core.text import chunk_content

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("source_url", T.StringType()),
        T.StructField("chunks", T.ArrayType(T.StringType())),
    ]
)


@F.pandas_udf(T.ArrayType(T.StringType()))
def chunk_content_udf(content: pd.Series) -> pd.Series:
    """Vectorized overlapping chunker (reference enhanced_crawler.py:410-446)."""
    return content.map(lambda c: chunk_content(c) if c else None)


def build_rag_documents(pages: DataFrame) -> DataFrame:
    """pages (engine page records) -> rag_documents.

    Output: (source_url, source_title, chunk_type, content, point_index,
    chunk_index, relevance_score, timestamp, page_seq, kind_order) — the
    reference's per-page emission order is recoverable by sorting on
    (page_seq, kind_order, point_index, chunk_index).
    """
    ok = pages.filter(F.col("error").isNull())

    meta = [
        F.col("url").alias("source_url"),
        F.coalesce(F.col("title"), F.lit("")).alias("source_title"),
        F.coalesce(F.col("relevance.score"), F.lit(1.0)).alias("relevance_score"),
        F.coalesce(F.col("timestamp"), F.lit("")).alias("timestamp"),
        F.col("seq").alias("page_seq"),
    ]

    summaries = (
        ok.filter(F.col("extracted.summary").isNotNull())
        .select(
            *meta,
            F.lit("summary").alias("chunk_type"),
            F.col("extracted.summary").alias("content"),
            F.lit(None).cast("int").alias("point_index"),
            F.lit(None).cast("int").alias("chunk_index"),
        )
        .withColumn("kind_order", F.lit(0))
    )

    key_points = (
        ok.filter(F.size(F.col("extracted.key_points")) > 0)
        .select(
            *meta,
            F.posexplode(F.col("extracted.key_points")).alias("point_index", "content"),
        )
        .select(
            "source_url", "source_title", "relevance_score", "timestamp", "page_seq",
            F.lit("key_point").alias("chunk_type"),
            "content",
            "point_index",
            F.lit(None).cast("int").alias("chunk_index"),
        )
        .withColumn("kind_order", F.lit(1))
    )

    contents = (
        ok.filter(F.col("markdown").isNotNull() & (F.col("markdown") != ""))
        .select(*meta, F.posexplode(chunk_content_udf(F.col("markdown"))).alias("chunk_index", "content"))
        .select(
            "source_url", "source_title", "relevance_score", "timestamp", "page_seq",
            F.lit("content").alias("chunk_type"),
            "content",
            F.lit(None).cast("int").alias("point_index"),
            "chunk_index",
        )
        .withColumn("kind_order", F.lit(2))
    )

    return summaries.unionByName(key_points).unionByName(contents)
