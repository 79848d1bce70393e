"""WARC source: ingest Common-Crawl-style web archives into the pages table.

The reference crawls the live web (`/root/reference/crawler/web_crawler.py`
fetches with aiohttp); at 100 TB the corpus arrives as WARC files — Common
Crawl's distribution format (ISO 28500) — not as a parquet table. This module
turns `*.warc` / `*.warc.gz` files into the engine's canonical
``pages(url, warc_ts, html)`` frame, so every downstream operator (extract,
crawl replay, curation) runs unchanged on real crawl archives.

Two read paths, matching how Common Crawl is actually consumed:

- :func:`read_warc` — whole-file: ``spark.read.format("binaryFile")`` over a
  glob, one Arrow-batched ``mapInPandas`` parse per file. Parallelism is the
  file count; CC shards are ~1 GB compressed, which fits comfortably in an
  executor core's memory budget. This is the right default when you own the
  file layout.
- :func:`read_warc_indexed` — record-range reads driven by a CDX-style index
  DataFrame ``(path, offset, length)``. Common Crawl gzips EVERY RECORD AS
  ITS OWN MEMBER precisely so that a byte-range fetch decompresses standalone;
  the public CDX index carries these offsets. Parallelism is record
  granularity — the scale path when you want a sparse slice (one host, one
  language) of a 100 TB crawl without reading whole shards.

Both parsers are Arrow-batched pandas iterators (never per-row Python UDFs),
skip non-``response`` records (request/metadata/warcinfo), and count rather
than crash on malformed members: output carries no poison, and the
``_corrupt`` accumulator-style column pattern is replaced by a strict-mode
flag — ``strict=True`` raises on the first bad member (tests), the default
skips and keeps going (production: one hostile shard must not kill a batch,
the same stance as `frontier/sitemaps.py`).

The writer half (:func:`write_warc` / :func:`write_warc_files`) exists so
tests and benches can synthesize bit-deterministic archives from the datagen
corpus (no external data in this sandbox) — it emits spec-conformant WARC/1.0
response records with HTTP headers and returns the CDX index
``(url, path, offset, length)`` as it writes, exactly what a real CC fetch
would read from the cluster index.
"""

from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime, timezone
from typing import Dict, Iterable, Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"

# WARC-Date: WARC/1.0 mandates second-granularity ISO-8601 Zulu; 1.1 allows
# fractional seconds. We write seconds when the timestamp is whole (the
# datagen corpus always is) and microseconds otherwise; the parser accepts
# both, so foreign archives with fractional dates read fine.
_TS_FMT = "%Y-%m-%dT%H:%M:%SZ"
_TS_FMT_US = "%Y-%m-%dT%H:%M:%S.%fZ"

READ_SCHEMA = (
    "url string, warc_ts timestamp, html binary, "
    "warc_path string, warc_offset bigint, "
    "http_status int, mime string, charset string, digest string"
)

REVISIT_SCHEMA = (
    "url string, warc_ts timestamp, digest string, "
    "refers_url string, refers_ts timestamp, "
    "warc_path string, warc_offset bigint"
)


def payload_digest(payload: bytes) -> str:
    """``sha1:<base32>`` of the payload — the WARC-Payload-Digest
    convention (RFC 3548 base32 of SHA-1, the labelled-digest form CC and
    every mainstream WARC tool emit). Revisit records point at earlier
    captures through this string, so writer and reader must agree on it
    byte-for-byte."""
    import base64
    import hashlib

    return "sha1:" + base64.b32encode(
        hashlib.sha1(payload).digest()
    ).decode("ascii")


# ---------------------------------------------------------------------------
# writer (test/bench harness side): rows -> spec-conformant WARC bytes
# ---------------------------------------------------------------------------


def _format_ts(ts: datetime) -> str:
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
    if ts.microsecond:
        return ts.strftime(_TS_FMT_US)
    return ts.strftime(_TS_FMT)


_STATUS_REASON = {200: "OK", 301: "Moved Permanently", 302: "Found",
                  304: "Not Modified", 404: "Not Found", 410: "Gone",
                  429: "Too Many Requests", 500: "Internal Server Error",
                  503: "Service Unavailable"}


def warc_record_bytes(
    url: str,
    warc_ts: datetime,
    html: bytes,
    record_type: str = "response",
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
) -> bytes:
    """One WARC/1.0 record: WARC headers + an HTTP/1.1 response block.

    The record block (HTTP headers + body) length is the WARC
    ``Content-Length``, per ISO 28500; the two-CRLF record separator
    follows the block. ``status``/``content_type`` synthesize the non-200
    / non-HTML records a real crawl archive carries.
    """
    reason = _STATUS_REASON.get(status, "Unknown")
    http = (
        ("HTTP/1.1 %d %s" % (status, reason)).encode() + _CRLF
        + b"Content-Type: " + content_type.encode() + _CRLF
        + b"Content-Length: " + str(len(html)).encode() + _CRLF
        + _CRLF
        + html
    )
    # Record IDs must be unique per record; derive deterministically from
    # the url+ts so re-writes are byte-identical (no uuid4, no clock, and
    # not Python hash() — that is salted per process).
    import hashlib

    rid = "<urn:crawler-spark:%s>" % hashlib.md5(
        ("%s|%s" % (url, warc_ts.isoformat())).encode()
    ).hexdigest()[:16]
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: " + record_type.encode() + _CRLF
        + b"WARC-Record-ID: " + rid.encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Date: " + _format_ts(warc_ts).encode() + _CRLF
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + b"Content-Length: " + str(len(http)).encode()
        + _SEP  # last header line's CRLF + the blank line ending the header
    )
    return head + http + _SEP


def warc_revisit_bytes(
    url: str,
    warc_ts: datetime,
    digest: str,
    refers_url: str,
    refers_ts: datetime,
) -> bytes:
    """One WARC/1.0 *revisit* record (identical-payload-digest profile):
    the archive's dedup primitive — "this fetch returned bytes identical
    to an earlier capture", carrying the digest and a pointer to the
    original instead of the body. At archive scale this is most of the
    storage win: recrawls of stable pages cost ~300 bytes, not the page.
    """
    import hashlib

    rid = "<urn:crawler-spark:%s>" % hashlib.md5(
        ("revisit|%s|%s" % (url, warc_ts.isoformat())).encode()
    ).hexdigest()[:16]
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: revisit" + _CRLF
        + b"WARC-Record-ID: " + rid.encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Date: " + _format_ts(warc_ts).encode() + _CRLF
        + b"WARC-Profile: http://netpreserve.org/warc/1.0/revisit/"
          b"identical-payload-digest" + _CRLF
        + b"WARC-Payload-Digest: " + digest.encode() + _CRLF
        + b"WARC-Refers-To-Target-URI: " + refers_url.encode() + _CRLF
        + b"WARC-Refers-To-Date: " + _format_ts(refers_ts).encode() + _CRLF
        + b"Content-Length: 0"
        + _SEP
        + _SEP
    )
    return head


def write_warc(
    path: str,
    rows: Iterable[Dict],
    compress: bool = True,
    dedup_payloads: bool = False,
) -> List[Dict]:
    """Write rows ``{url, warc_ts, html}`` to one WARC file.

    With ``compress=True`` every record is its own gzip member (the Common
    Crawl convention that makes byte-range reads self-contained). With
    ``dedup_payloads=True`` a row whose payload digest was already written
    emits a *revisit* record pointing at the first capture instead of a
    second copy of the body. Returns the CDX-style index: one
    ``{url, path, offset, length}`` per record, in file order — feed it to
    :func:`read_warc_indexed`.
    """
    index: List[Dict] = []
    seen_digests: Dict[str, Tuple[str, datetime]] = {}
    with open(path, "wb") as f:
        off = 0
        for r in rows:
            if dedup_payloads:
                dg = payload_digest(r["html"])
                if dg in seen_digests:
                    ref_url, ref_ts = seen_digests[dg]
                    rec = warc_revisit_bytes(
                        r["url"], r["warc_ts"], dg, ref_url, ref_ts
                    )
                    if compress:
                        buf = io.BytesIO()
                        with gzip.GzipFile(
                            fileobj=buf, mode="wb", mtime=0
                        ) as gz:
                            gz.write(rec)
                        rec = buf.getvalue()
                    f.write(rec)
                    index.append(
                        {"url": r["url"], "path": path, "offset": off,
                         "length": len(rec)}
                    )
                    off += len(rec)
                    continue
                seen_digests[dg] = (r["url"], r["warc_ts"])
            rec = warc_record_bytes(
                r["url"], r["warc_ts"], r["html"],
                status=r.get("status", 200),
                content_type=r.get("content_type", "text/html; charset=utf-8"),
            )
            if compress:
                # mtime=0 + fixed filename-less header: bit-deterministic
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(rec)
                rec = buf.getvalue()
            f.write(rec)
            index.append(
                {"url": r["url"], "path": path, "offset": off, "length": len(rec)}
            )
            off += len(rec)
    return index


def write_warc_files(
    dir_path: str,
    rows: Iterable[Dict],
    records_per_file: int = 1000,
    compress: bool = True,
    dedup_payloads: bool = False,
) -> List[Dict]:
    """Shard rows across ``part-NNNNN.warc[.gz]`` files under ``dir_path``.

    Returns the concatenated CDX index across all shards.
    """
    import os

    os.makedirs(dir_path, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"
    index: List[Dict] = []
    buf: List[Dict] = []
    n_file = 0
    for r in rows:
        buf.append(r)
        if len(buf) == records_per_file:
            p = os.path.join(dir_path, "part-%05d%s" % (n_file, ext))
            index.extend(write_warc(p, buf, compress, dedup_payloads))
            buf, n_file = [], n_file + 1
    if buf:
        p = os.path.join(dir_path, "part-%05d%s" % (n_file, ext))
        index.extend(write_warc(p, buf, compress, dedup_payloads))
    return index


# ---------------------------------------------------------------------------
# parser core (pure bytes -> rows; shared by both read paths)
# ---------------------------------------------------------------------------


def _gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members one member at a time.

    ``zlib.decompressobj(wbits=31)`` stops at each member boundary and
    exposes the remainder via ``unused_data`` — no temp files, no whole-file
    ``gzip.decompress`` (which would silently fuse members and lose the
    record framing on truncated tails).
    """
    while data:
        obj = zlib.decompressobj(wbits=31)
        out = obj.decompress(data)
        yield out + obj.flush()
        data = obj.unused_data


def _parse_ts(s: str) -> datetime:
    fmt = _TS_FMT_US if "." in s else _TS_FMT
    return datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)


def iter_warc_record_blocks(
    data: bytes, strict: bool = False
) -> Iterator[Tuple[Dict[str, str], bytes]]:
    """Yield ``(warc_headers, block)`` for every record in a raw WARC byte
    stream — the shared framing walk under every typed parser. Malformed
    framing raises ``ValueError`` when ``strict`` else stops the member
    (one corrupt record cannot desynchronize framing because
    Content-Length is taken from the header before the body is trusted)."""
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        end_head = data.find(_SEP, pos)
        if end_head < 0 or not data.startswith(b"WARC/", pos):
            if strict:
                raise ValueError("malformed WARC header at offset %d" % pos)
            return
        headers: Dict[str, str] = {}
        for line in data[pos:end_head].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            if strict:
                raise ValueError("missing Content-Length at offset %d" % pos)
            return
        block = data[end_head + 4 : end_head + 4 + length]
        if len(block) < length:  # truncated record: never emit partial body
            if strict:
                raise ValueError("truncated record at offset %d" % pos)
            return
        pos = end_head + 4 + length + 4  # skip the record separator
        yield headers, block


def _parse_http_head(head: bytes) -> Tuple[int, str, str]:
    """(status, mime, charset) from an HTTP response head. Defaults
    ``(200, 'text/html', '')`` when a field is absent/mangled — a record
    without a parseable status line is treated as a bare-body 200 (some
    archives store bodies without the HTTP block)."""
    status, mime, charset = 200, "text/html", ""
    lines = head.split(_CRLF)
    first = lines[0].decode("latin-1", "replace") if lines else ""
    if first.startswith("HTTP/"):
        parts = first.split(None, 2)
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    for line in lines[1:]:
        k, _, v = line.decode("latin-1", "replace").partition(":")
        if k.strip().lower() == "content-type":
            v = v.strip()
            mime = v.split(";", 1)[0].strip().lower() or mime
            low = v.lower()
            at = low.find("charset=")
            if at >= 0:
                charset = low[at + 8 :].split(";", 1)[0].strip().strip('"')
            break
    return status, mime, charset


def parse_warc_records_full(
    data: bytes, strict: bool = False, record_type: str = "response"
) -> Iterator[Tuple[str, datetime, bytes, Optional[int], Optional[str], Optional[str]]]:
    """Yield ``(url, warc_ts, payload, http_status, mime, charset)`` for
    every ``record_type`` record in a raw (already-decompressed, possibly
    multi-record) WARC byte stream.

    Records of other types (warcinfo/request/metadata/...) are skipped —
    that is the spec-correct reading of a CC shard, not an error. Malformed
    framing raises ``ValueError`` when ``strict`` else stops the member (one
    corrupt record cannot desynchronize framing because Content-Length is
    taken from the header before the body is trusted).

    For ``response`` records the payload is the HTTP body (headers split
    off and mined for status/mime/charset — real CC shards carry 3xx/4xx
    and non-HTML records, and downstream stages decide with these columns
    instead of mis-ingesting); for other types (WET ``conversion``, WAT
    ``metadata``) the record block IS the payload, yielded whole, with
    ``(None, None, None)`` for the HTTP fields.
    """
    for headers, block in iter_warc_record_blocks(data, strict):
        if headers.get("warc-type") != record_type:
            continue
        try:
            url = headers["warc-target-uri"]
            ts = _parse_ts(headers["warc-date"])
        except (KeyError, ValueError):
            if strict:
                raise ValueError("bad record headers (%s)" % headers.get("warc-type"))
            continue
        if record_type == "response":
            body_at = block.find(_SEP)
            if body_at < 0:
                yield url, ts, block, 200, "text/html", ""
            else:
                status, mime, charset = _parse_http_head(block[:body_at])
                yield url, ts, block[body_at + 4 :], status, mime, charset
        else:
            yield url, ts, block, None, None, None


def parse_warc_records(
    data: bytes, strict: bool = False, record_type: str = "response"
) -> Iterator[Tuple[str, datetime, bytes]]:
    """Back-compat 3-tuple view of :func:`parse_warc_records_full`:
    ``(url, warc_ts, payload)``."""
    for url, ts, payload, _s, _m, _c in parse_warc_records_full(
        data, strict, record_type
    ):
        yield url, ts, payload


def _records_from_raw(
    raw: bytes, strict: bool, record_type: str = "response"
) -> Iterator[Tuple[str, datetime, bytes, Optional[int], Optional[str], Optional[str]]]:
    if raw[:2] == b"\x1f\x8b":
        for member in _gzip_members(raw):
            yield from parse_warc_records_full(member, strict, record_type)
    else:
        yield from parse_warc_records_full(raw, strict, record_type)


# ---------------------------------------------------------------------------
# Spark read paths
# ---------------------------------------------------------------------------


def read_warc(
    spark,
    path: str,
    strict: bool = False,
    batch_rows: int = 256,
) -> DataFrame:
    """Whole-file WARC scan -> ``(url, warc_ts, html, warc_path, warc_offset)``.

    ``binaryFile`` gives one row per file; the parse is one vectorized
    ``mapInPandas`` pass emitting Arrow batches of ``batch_rows`` records so
    a 1 GB shard never materializes as one giant batch. ``warc_offset`` is
    the record ordinal within its file (a stable tiebreak for downstream
    window dedup), not a byte offset — byte offsets belong to the index path.
    """
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: List[Tuple] = []
            for fpath, raw in zip(pdf["path"], pdf["content"]):
                for i, (url, ts, html, st, mi, ch) in enumerate(
                    _records_from_raw(bytes(raw), strict)
                ):
                    out.append(
                        (url, ts, html, fpath, i, st, mi, ch,
                         payload_digest(html))
                    )
                    if len(out) >= batch_rows:
                        yield _to_pdf(out)
                        out = []
            if out:
                yield _to_pdf(out)

    return files.mapInPandas(gen, schema=READ_SCHEMA)


def _to_pdf(rows: List[Tuple]):
    import pandas as pd

    pdf = pd.DataFrame(
        rows,
        columns=[
            "url", "warc_ts", "html", "warc_path", "warc_offset",
            "http_status", "mime", "charset", "digest",
        ],
    )
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"], utc=True)
    pdf["http_status"] = pdf["http_status"].astype("int32")
    return pdf


def read_warc_indexed(
    spark,
    index: DataFrame,
    strict: bool = False,
    partitions: Optional[int] = None,
) -> DataFrame:
    """CDX-indexed record-range reads: ``index(path, offset, length)`` ->
    the same schema as :func:`read_warc` (``warc_offset`` = the byte offset).

    Each task seeks-and-reads only its records' byte ranges — the sparse-
    slice shape: filtering the INDEX (a small parquet table; predicate
    pushdown applies) selects which bytes of a 100 TB archive are touched at
    all. Ranges are repartitioned round-robin so a filtered index with all
    hits in one shard still fans out across the cluster.

    I/O seam: ranges are opened with ``open()`` — local/NFS paths in this
    sandbox. On an object store, swap ``_open_range`` for an fsspec/boto
    range-GET; the framing logic is identical because every CC record is a
    self-contained gzip member.
    """
    import pandas as pd

    idx = index.select("path", "offset", "length")
    idx = idx.repartition(partitions) if partitions else idx

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: List[Tuple] = []
            # group by file so each file is opened once per batch, ranges
            # read in ascending offset order (sequential-friendly)
            for fpath, grp in pdf.groupby("path", sort=True):
                with open(fpath, "rb") as f:
                    for off, length in sorted(
                        zip(grp["offset"], grp["length"])
                    ):
                        f.seek(int(off))
                        raw = f.read(int(length))
                        for url, ts, html, st, mi, ch in _records_from_raw(
                            raw, strict
                        ):
                            out.append(
                                (url, ts, html, fpath, int(off), st, mi, ch,
                                 payload_digest(html))
                            )
                if len(out) >= 256:
                    yield _to_pdf(out)
                    out = []
            if out:
                yield _to_pdf(out)

    return idx.mapInPandas(gen, schema=READ_SCHEMA)


def stream_warc(
    spark,
    dir_path: str,
    strict: bool = False,
    glob: str = "*.warc*",
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Continuous WARC ingest: a streaming frame of the same schema as
    :func:`read_warc` over shards as they ARRIVE in ``dir_path``.

    The file-source checkpoint tracks which shards are already parsed, so a
    restarted query never re-ingests a shard — exactly-once at shard
    granularity, the streaming twin of the batch reader (same parser, so a
    shard yields byte-identical rows on either path; asserted in
    test_warc). ``max_files_per_trigger`` bounds per-microbatch work when
    backfilling a large directory.

    binaryFile streaming needs an explicit schema; it is fixed, so no
    sampling read is needed.
    """
    from pyspark.sql import types as T

    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    reader = (
        spark.readStream.format("binaryFile")
        .schema(schema)
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    files = reader.load(dir_path).select("path", "content")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: List[Tuple] = []
            for fpath, raw in zip(pdf["path"], pdf["content"]):
                for i, (url, ts, html, st, mi, ch) in enumerate(
                    _records_from_raw(bytes(raw), strict)
                ):
                    out.append(
                        (url, ts, html, fpath, i, st, mi, ch,
                         payload_digest(html))
                    )
                    if len(out) >= 256:
                        yield _to_pdf(out)
                        out = []
            if out:
                yield _to_pdf(out)

    return files.mapInPandas(gen, schema=READ_SCHEMA)


def warc_to_pages(warc_df: DataFrame, ok_only: bool = True) -> DataFrame:
    """Adapt a WARC read to the engine's canonical pages frame: keep
    ingestable captures (2xx HTML — redirects/errors/media belong to the
    frontier and media pipelines, not the text pipeline; ``ok_only=False``
    keeps everything), dedup repeated fetches of a URL (newest wins,
    ordinal tiebreak — the window pattern, never ``dropDuplicates`` whose
    survivor is partition-dependent) and project ``(url, warc_ts, html,
    charset)`` — the charset hint rides along so extraction can decode
    non-UTF-8 pages (absent on non-WARC pages frames; extraction treats
    that as the UTF-8 contract)."""
    from pyspark.sql import Window

    if ok_only:
        warc_df = warc_df.filter(
            (F.col("http_status") >= 200)
            & (F.col("http_status") < 300)
            & (
                F.col("mime").isin("text/html", "application/xhtml+xml")
                | F.col("mime").isNull()
            )
        )
    w = (
        Window.partitionBy("url")
        .orderBy(F.desc("warc_ts"), F.desc("warc_offset"), F.asc("warc_path"))
    )
    cols = ["url", "warc_ts", "html"] + (
        ["charset"] if "charset" in warc_df.columns else []
    )
    return (
        warc_df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*cols)
    )


def read_warc_revisits(spark, path: str, strict: bool = False) -> DataFrame:
    """Scan *revisit* records -> :data:`REVISIT_SCHEMA`: the archive's
    dedup pointers (identical-payload-digest profile). Resolution back to
    bodies is :func:`resolve_revisits` — a join, deliberately separate
    from the scan so a caller who only needs change statistics (how many
    recrawls were identical?) never touches a single page body."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: List[Tuple] = []
            for fpath, raw in zip(pdf["path"], pdf["content"]):
                members = (
                    _gzip_members(bytes(raw))
                    if bytes(raw)[:2] == b"\x1f\x8b"
                    else [bytes(raw)]
                )
                i = 0
                for member in members:
                    for headers, _block in iter_warc_record_blocks(
                        member, strict
                    ):
                        if headers.get("warc-type") != "revisit":
                            continue
                        try:
                            out.append(
                                (
                                    headers["warc-target-uri"],
                                    _parse_ts(headers["warc-date"]),
                                    headers.get("warc-payload-digest", ""),
                                    headers.get(
                                        "warc-refers-to-target-uri", ""
                                    ),
                                    _parse_ts(
                                        headers["warc-refers-to-date"]
                                    )
                                    if "warc-refers-to-date" in headers
                                    else None,
                                    fpath,
                                    i,
                                )
                            )
                        except (KeyError, ValueError):
                            if strict:
                                raise ValueError(
                                    "bad revisit headers in %s" % fpath
                                )
                            continue
                        i += 1
            pdf_out = pd.DataFrame(
                out,
                columns=[
                    "url", "warc_ts", "digest", "refers_url", "refers_ts",
                    "warc_path", "warc_offset",
                ],
            )
            pdf_out["warc_ts"] = pd.to_datetime(pdf_out["warc_ts"], utc=True)
            pdf_out["refers_ts"] = pd.to_datetime(
                pdf_out["refers_ts"], utc=True
            )
            yield pdf_out

    return files.mapInPandas(gen, schema=REVISIT_SCHEMA)


def resolve_revisits(
    responses: DataFrame, revisits: DataFrame
) -> DataFrame:
    """Fill revisit rows with their referred bodies: one equi-join on the
    payload digest.

    Shape at scale: originals first dedup to one representative body per
    digest (window, deterministic survivor — earliest capture), so the
    join's build side is one row per DISTINCT payload, not per capture;
    revisits shuffle once on the 32-byte digest key. Unresolvable
    revisits (digest absent from the response set — a foreign archive
    slice) are dropped; count them as
    ``revisits.join(responses, "digest", "left_anti")`` if the gap
    matters. Output schema == :data:`READ_SCHEMA`, so
    ``responses.unionByName(resolved)`` is the full capture stream and
    :func:`warc_to_pages` runs unchanged on it."""
    from pyspark.sql import Window

    w = Window.partitionBy("digest").orderBy(
        "warc_ts", "url", "warc_path", "warc_offset"
    )
    bodies = (
        responses.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "digest",
            F.col("html").alias("_html"),
            F.col("http_status").alias("_st"),
            F.col("mime").alias("_mi"),
            F.col("charset").alias("_ch"),
        )
    )
    return (
        revisits.join(bodies, "digest")
        .select(
            "url",
            "warc_ts",
            F.col("_html").alias("html"),
            "warc_path",
            "warc_offset",
            F.col("_st").alias("http_status"),
            F.col("_mi").alias("mime"),
            F.col("_ch").alias("charset"),
            "digest",
        )
    )


def read_warc_resolved(spark, path: str, strict: bool = False) -> DataFrame:
    """Full capture stream of an archive with revisit records: responses
    plus revisits resolved to their referred bodies, in
    :data:`READ_SCHEMA`. The stream :func:`warc_to_pages` should see when
    an archive was written with payload dedup."""
    responses = read_warc(spark, path, strict=strict)
    revisits = read_warc_revisits(spark, path, strict=strict)
    return responses.unionByName(resolve_revisits(responses, revisits))


def write_warc_shards(
    pages: DataFrame,
    dir_path: str,
    compress: bool = True,
    dedup_payloads: bool = False,
) -> DataFrame:
    """Distributed WARC sink: each task writes its partition as one
    ``part-NNNNN.warc[.gz]`` shard (record-per-gzip-member, the CC
    convention) and the mapInPandas OUTPUT is the CDX-style index
    ``(url, path, offset, length)`` of what it wrote — the sink scales
    with the upstream partitioning and never funnels through the driver
    (:func:`write_warc`/:func:`write_warc_files` are the driver-side
    harness twins; this is the production path). Materialize the returned
    index exactly once (cache+count or write to parquet) — re-evaluating
    the plan rewrites shards (byte-idempotent, wasted I/O).

    With ``dedup_payloads=True`` the dedup is GLOBAL: one shuffle on the
    payload digest (a window over ``sha1(html)``) elects the earliest
    capture per distinct payload as the stored *response*; every later
    identical capture is written as a ~300-byte *revisit* record pointing
    at the keeper (identical-payload-digest profile). That one exchange
    is the entire scale cost — at recrawl-archive scale it trades a full
    copy of every unchanged page for a pointer. Without dedup the sink is
    zero-shuffle and shard layout follows the input partitioning
    (pre-partition, e.g. ``repartitionByRange("url")``, for a bit-stable
    layout).

    Expected columns: ``url, warc_ts, html`` (+ optional ``http_status``,
    ``mime``, ``charset`` — defaulted when absent, round-tripped by
    :func:`read_warc` when present). Read the result back with
    :func:`read_warc` (responses only), :func:`read_warc_revisits`
    (pointers only), or :func:`read_warc_resolved` (full capture stream).

    The returned index carries ``(url, warc_ts, path, offset, length,
    digest, mime, status)`` — exactly what
    :func:`~crawler_spark.sources.cdxj.build_cdxj` consumes, so the CDX-J
    of a fresh archive is one projection away, no join back to the pages.
    Revisit rows index as ``mime='warc/revisit'`` (the CDX convention).
    """
    import os

    import pandas as pd

    from pyspark.sql import Window

    os.makedirs(dir_path, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    df = pages
    for col, default in (
        ("http_status", F.lit(200)),
        ("mime", F.lit("text/html")),
        ("charset", F.lit("utf-8")),
    ):
        if col not in df.columns:
            df = df.withColumn(col, default)
    base = ["url", "warc_ts", "html", "http_status", "mime", "charset"]
    if dedup_payloads:
        w = Window.partitionBy("_dig").orderBy(
            "warc_ts", "url"
        )
        df = (
            df.withColumn("_dig", F.sha1("html"))
            .withColumn("_rn", F.row_number().over(w))
            .withColumn("_ref_url", F.first("url").over(w))
            .withColumn("_ref_ts", F.first("warc_ts").over(w))
            .select(
                *base,
                (F.col("_rn") > 1).alias("_is_rev"),
                "_ref_url",
                "_ref_ts",
            )
        )
    else:
        df = df.select(
            *base,
            F.lit(False).alias("_is_rev"),
            F.lit(None).cast("string").alias("_ref_url"),
            F.lit(None).cast("timestamp").alias("_ref_ts"),
        )

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
            for url, ts, html, st, mi, ch, is_rev, ref_url, ref_ts in zip(
                pdf["url"], pdf["warc_ts"], pdf["html"],
                pdf["http_status"], pdf["mime"], pdf["charset"],
                pdf["_is_rev"], pdf["_ref_url"], pdf["_ref_ts"],
            ):
                body = bytes(html)
                ts = ts.to_pydatetime()
                dg = payload_digest(body)
                if is_rev:
                    rec = warc_revisit_bytes(
                        url, ts, dg, ref_url, ref_ts.to_pydatetime(),
                    )
                    idx_mime = "warc/revisit"
                else:
                    ct = mi + ("; charset=" + ch if ch else "")
                    rec = warc_record_bytes(
                        url, ts, body, status=int(st), content_type=ct
                    )
                    idx_mime = mi
                if compress:
                    buf = io.BytesIO()
                    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                        gz.write(rec)
                    rec = buf.getvalue()
                f.write(rec)
                out.append(
                    (url, ts, path, off, len(rec), dg, idx_mime, int(st))
                )
                off += len(rec)
        if f is not None:
            f.close()
        pdf_out = pd.DataFrame(
            out,
            columns=["url", "warc_ts", "path", "offset", "length",
                     "digest", "mime", "status"],
        )
        pdf_out["warc_ts"] = pd.to_datetime(pdf_out["warc_ts"], utc=True)
        yield pdf_out

    return df.mapInPandas(
        gen,
        schema="url string, warc_ts timestamp, path string, offset bigint, "
               "length bigint, digest string, mime string, status int",
    )
