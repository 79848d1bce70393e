from crawler_spark.streaming.ingest import (
    host_rate_stream,
    host_session_stream,
    stream_extract,
    stream_seen_dedup,
)

__all__ = [
    "stream_extract",
    "host_rate_stream",
    "host_session_stream",
    "stream_seen_dedup",
]
