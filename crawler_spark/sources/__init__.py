"""Input sources beyond parquet: WARC (Common Crawl's archive format)."""

from crawler_spark.sources.warc import (
    read_warc,
    read_warc_indexed,
    stream_warc,
    warc_to_pages,
    write_warc,
    write_warc_files,
)

__all__ = [
    "read_warc",
    "read_warc_indexed",
    "stream_warc",
    "warc_to_pages",
    "write_warc",
    "write_warc_files",
]
