from crawler_spark.streaming.ingest import (
    host_rate_stream,
    politeness_sink_stream,
    stream_host_politeness,
    host_session_stream,
    stream_extract,
    stream_seen_dedup,
    incremental_dedup_stream,
    term_rate_stream,
    top_terms,
    trending_terms,
    snapshot_stream,
    snapshot_view,
)

__all__ = [
    "stream_extract",
    "host_rate_stream",
    "stream_host_politeness",
    "politeness_sink_stream",
    "host_session_stream",
    "stream_seen_dedup",
    "incremental_dedup_stream",
    "term_rate_stream",
    "top_terms",
    "trending_terms",
    "snapshot_stream",
    "snapshot_view",
]
