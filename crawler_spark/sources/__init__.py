"""Input sources beyond parquet: WARC (Common Crawl's archive format) and
CDX-J (the sorted SURT-keyed index that makes an archive addressable)."""

from crawler_spark.sources.cdxj import (
    build_cdxj,
    cdxj_to_index,
    host_slice,
    read_cdxj,
    surt_prefix,
    write_cdxj,
)
from crawler_spark.sources.wet import (
    pages_to_wet_frame,
    read_wat,
    read_wet,
    write_wat,
    write_wet,
)
from crawler_spark.sources.warc import (
    read_warc,
    read_warc_indexed,
    stream_warc,
    warc_to_pages,
    write_warc,
    write_warc_files,
)

__all__ = [
    "pages_to_wet_frame",
    "read_wat",
    "read_wet",
    "write_wat",
    "write_wet",
    "build_cdxj",
    "cdxj_to_index",
    "host_slice",
    "read_cdxj",
    "surt_prefix",
    "write_cdxj",
    "read_warc",
    "read_warc_indexed",
    "stream_warc",
    "warc_to_pages",
    "write_warc",
    "write_warc_files",
]
