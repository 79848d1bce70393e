"""WET/WAT derivative archives: extracted-text and metadata sidecars.

Common Crawl publishes three artifacts per crawl: WARC (raw responses —
`sources/warc.py`), WET (``*.warc.wet.gz``: one ``WARC-Type: conversion``
record per page whose block is the EXTRACTED TEXT, no HTTP wrapper), and
WAT (``*.warc.wat.gz``: one ``WARC-Type: metadata`` record per page whose
block is a JSON envelope of page metadata — title, outlinks, sizes). Most
LLM corpus work starts from WET; link-graph work starts from WAT. This
module makes the engine both a CONSUMER (read_wet/read_wat: run curation
on someone else's crawl without re-extracting) and a PRODUCER (write_wet/
write_wat: the extract stage's archive-format sink).

Scale shape of the writers: one task writes one ``part-NNNNN`` shard of
its partition's rows — the write is ``mapInPandas`` whose OUTPUT is the
CDX-style index of what it wrote, so the sink parallelizes with the
upstream partitioning, never funnels through the driver, and hands back
exactly the artifact (an index) a downstream range-reader needs. Records
are one-gzip-member-each (the CC convention), so byte-range reads of
single records decompress standalone. Determinism: record bytes are a
pure function of the row; shard membership/order follow the input
partitioning — pre-partition (e.g. ``repartitionByRange("url")``) for a
bit-stable layout.

Readers reuse `warc.py`'s framing parser (one parser, three formats):
WET/WAT records carry the payload as the whole record block.
"""

from __future__ import annotations

import gzip
import io
import json
from datetime import datetime
from typing import Dict, Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.sources.warc import (
    _CRLF,
    _SEP,
    _format_ts,
    _records_from_raw,
)

INDEX_SCHEMA = "url string, path string, offset bigint, length bigint"

WET_SCHEMA = "url string, warc_ts timestamp, text string"
WAT_SCHEMA = (
    "url string, warc_ts timestamp, title string, links array<string>, "
    "n_bytes bigint"
)


def _derived_record_bytes(
    url: str, warc_ts: datetime, payload: bytes, record_type: str, mime: str
) -> bytes:
    """One WARC/1.0 derived record (conversion or metadata): WARC headers +
    the payload as the whole block — no HTTP wrapper, per the WET/WAT
    convention. Record IDs derive from url+ts (deterministic re-writes)."""
    import hashlib

    rid = "<urn:crawler-spark:%s>" % hashlib.md5(
        ("%s|%s|%s" % (record_type, url, warc_ts.isoformat())).encode()
    ).hexdigest()[:16]
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: " + record_type.encode() + _CRLF
        + b"WARC-Record-ID: " + rid.encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Date: " + _format_ts(warc_ts).encode() + _CRLF
        + b"Content-Type: " + mime.encode() + _CRLF
        + b"Content-Length: " + str(len(payload)).encode()
        + _SEP
    )
    return head + payload + _SEP


def _gz_member(rec: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(rec)
    return buf.getvalue()


def _write_shards(
    df: DataFrame,
    dir_path: str,
    ext: str,
    make_record,  # (pdf row namedtuple-ish) -> (url, ts, payload bytes, mime)
    record_type: str,
    compress: bool,
) -> DataFrame:
    """Shared distributed writer: partition -> one shard file; returns the
    index frame (materialize it — e.g. ``.cache()`` + count, or write to
    parquet — exactly once; re-evaluating the plan would rewrite shards,
    which is idempotent byte-wise but wasted I/O)."""
    import os

    import pandas as pd

    os.makedirs(dir_path, exist_ok=True)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(dir_path, "part-%05d%s" % (pid, ext))
        out: List[Tuple] = []
        off = 0
        f = None
        for pdf in batches:
            if len(pdf) and f is None:
                f = open(path, "wb")
            for row in pdf.itertuples(index=False):
                url, ts, payload, mime = make_record(row)
                rec = _derived_record_bytes(url, ts, payload, record_type, mime)
                if compress:
                    rec = _gz_member(rec)
                f.write(rec)
                out.append((url, path, off, len(rec)))
                off += len(rec)
        if f is not None:
            f.close()
        yield pd.DataFrame(out, columns=["url", "path", "offset", "length"])

    return df.mapInPandas(gen, schema=INDEX_SCHEMA)


def write_wet(
    df: DataFrame, dir_path: str, compress: bool = True
) -> DataFrame:
    """Distributed WET sink: ``(url, warc_ts, text)`` rows -> one
    ``part-NNNNN.warc.wet[.gz]`` shard per partition. Returns the CDX-style
    index frame of what each task wrote."""

    def mk(row):
        return (
            row.url,
            row.warc_ts.to_pydatetime() if hasattr(row.warc_ts, "to_pydatetime") else row.warc_ts,
            (row.text or "").encode("utf-8"),
            "text/plain",
        )

    ext = ".warc.wet.gz" if compress else ".warc.wet"
    return _write_shards(
        df.select("url", "warc_ts", "text"), dir_path, ext, mk, "conversion", compress
    )


def write_wat(
    df: DataFrame, dir_path: str, compress: bool = True
) -> DataFrame:
    """Distributed WAT sink: ``(url, warc_ts, title, links, n_bytes)`` rows
    -> ``part-NNNNN.warc.wat[.gz]`` shards of JSON metadata records (a
    documented envelope SUBSET: url/title/outlinks/content length — the
    fields the engine's graph and anchor operators consume)."""

    def mk(row):
        links = list(row.links) if row.links is not None else []
        blob = json.dumps(
            {
                "url": row.url,
                "title": row.title,
                "links": links,
                "n_bytes": int(row.n_bytes) if row.n_bytes is not None else 0,
            },
            sort_keys=True,
            separators=(",", ":"),
        ).encode("utf-8")
        return (
            row.url,
            row.warc_ts.to_pydatetime() if hasattr(row.warc_ts, "to_pydatetime") else row.warc_ts,
            blob,
            "application/json",
        )

    ext = ".warc.wat.gz" if compress else ".warc.wat"
    return _write_shards(
        df.select("url", "warc_ts", "title", "links", "n_bytes"),
        dir_path,
        ext,
        mk,
        "metadata",
        compress,
    )


def read_wet(spark, path: str, strict: bool = False) -> DataFrame:
    """WET scan -> ``(url, warc_ts, text)``: the pages frame for curation
    pipelines that start from someone else's extracted text (skip the
    extract stage entirely). Same binaryFile + Arrow-batched shape as
    :func:`~crawler_spark.sources.warc.read_warc`."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("content")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: List[Tuple] = []
            for raw in pdf["content"]:
                for url, ts, block, _s, _m, _c in _records_from_raw(
                    bytes(raw), strict, record_type="conversion"
                ):
                    out.append((url, ts, block.decode("utf-8", "replace")))
                    if len(out) >= 256:
                        yield _wet_pdf(out)
                        out = []
            if out:
                yield _wet_pdf(out)

    return files.mapInPandas(gen, schema=WET_SCHEMA)


def _wet_pdf(rows):
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "text"])
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"], utc=True)
    return pdf


def read_wat(spark, path: str, strict: bool = False) -> DataFrame:
    """WAT scan -> ``(url, warc_ts, title, links, n_bytes)``: the link
    graph and page metadata without the page bytes — what PageRank/HITS/
    anchor-text stages need, at ~1% of the WARC's weight. Malformed JSON
    blobs drop (lenient) or raise (``strict``)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("content")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: List[Tuple] = []
            for raw in pdf["content"]:
                for url, ts, block, _s, _m, _c in _records_from_raw(
                    bytes(raw), strict, record_type="metadata"
                ):
                    try:
                        j = json.loads(block)
                    except ValueError:
                        if strict:
                            raise
                        continue
                    out.append(
                        (
                            url,
                            ts,
                            j.get("title"),
                            [str(x) for x in j.get("links") or []],
                            int(j.get("n_bytes") or 0),
                        )
                    )
                    if len(out) >= 256:
                        yield _wat_pdf(out)
                        out = []
            if out:
                yield _wat_pdf(out)

    return files.mapInPandas(gen, schema=WAT_SCHEMA)


def _wat_pdf(rows):
    import pandas as pd

    pdf = pd.DataFrame(
        rows, columns=["url", "warc_ts", "title", "links", "n_bytes"]
    )
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"], utc=True)
    return pdf


def pages_to_wet_frame(extracted: DataFrame) -> DataFrame:
    """Adapt the extract stage's output to the WET writer's input: the
    extracted markdown is the conversion text."""
    return extracted.select(
        "url",
        F.col("timestamp").cast("timestamp").alias("warc_ts"),
        F.col("markdown").alias("text"),
    )
