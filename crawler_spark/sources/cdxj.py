"""CDX-J index source/sink: the lookup layer over a WARC archive.

`sources/warc.py` reads archives; this module reads and writes the INDEX
that makes a 100 TB archive addressable — CDX-J, the web-archive convention
(one text line per capture: ``<SURT key> <14-digit timestamp> <JSON blob>``,
lines sorted so a host/domain prefix is one contiguous, binary-searchable
run). The reference crawler keeps its seen-set in memory
(/root/reference/crawler/enhanced_crawler.py:61 ``self.visited``); at
archive scale the equivalent artifact is this index: "which captures exist
for this URL/host/domain" answered without touching a single WARC byte.

- :func:`build_cdxj` — index frame -> typed CDX-J rows (SURT key via the
  pure-expression :func:`~crawler_spark.core.urls.surt_key_expr`, 14-digit
  timestamp, the WARC locator triple). Everything JVM-side; no Python runs
  per row.
- :func:`write_cdxj` — range-partition by SURT key, sort within partitions,
  write text shards. Shards are globally ordered (shard i's last key <=
  shard i+1's first), so the classic CDX consumption pattern — binary
  search / merge across sorted shards — holds; at cluster scale each shard
  is one reducer's output, no single-machine sort.
- :func:`read_cdxj` — text scan -> typed frame. The two key fields split
  off the line head; the JSON blob parses with ``from_json``. Malformed
  lines drop (lenient, the `sitemaps.py` stance) or raise (``strict``).
- :func:`cdxj_to_index` — adapt to the ``(path, offset, length)`` frame
  :func:`~crawler_spark.sources.warc.read_warc_indexed` consumes: a CDX-J
  slice IS the fetch plan for a sparse read of the archive.
- :func:`surt_prefix` / :func:`host_slice` — domain/host prefix selection:
  the reason SURT keys exist. On a parquet-ized index the ``startswith``
  predicate pushes down; on sorted text shards it is a seek.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.core.urls import surt_key_expr

# JSON blob field order is fixed (spec convention: url first) and numbers
# are serialized as strings — CDX-J readers across the ecosystem expect
# string-typed offset/length, and a fixed order keeps the writer
# bit-deterministic.
_BLOB_FIELDS = ["url", "digest", "mime", "status", "length", "offset", "filename"]

CDXJ_SCHEMA = (
    "surt_key string, cdx_ts string, url string, digest string, "
    "mime string, status string, length bigint, offset bigint, "
    "filename string"
)


def build_cdxj(index: DataFrame) -> DataFrame:
    """Typed CDX-J rows from a WARC index frame.

    Input columns: ``url``, ``warc_ts`` (timestamp), ``path``, ``offset``,
    ``length``; optional ``digest``/``mime``/``status`` pass through
    (defaults: empty digest, ``text/html``, ``200`` — what
    :func:`~crawler_spark.sources.warc.write_warc` emits).

    Pure column expressions — the SURT key, the 14-digit timestamp, and
    the locator all compute JVM-side in one projection.
    """
    cols = set(index.columns)
    df = index
    if "digest" not in cols:
        df = df.withColumn("digest", F.lit(""))
    if "mime" not in cols:
        df = df.withColumn("mime", F.lit("text/html"))
    if "status" not in cols:
        df = df.withColumn("status", F.lit("200"))
    return df.select(
        F.expr(surt_key_expr("url")).alias("surt_key"),
        F.date_format("warc_ts", "yyyyMMddHHmmss").alias("cdx_ts"),
        "url",
        "digest",
        "mime",
        F.col("status").cast("string").alias("status"),
        F.col("length").cast("bigint").alias("length"),
        F.col("offset").cast("bigint").alias("offset"),
        F.col("path").alias("filename"),
    )


def cdxj_lines(cdxj: DataFrame) -> DataFrame:
    """One text line per capture: ``surt_key cdx_ts {json}``.

    The blob is built with ``to_json`` over a struct whose numeric fields
    are cast to string first (ecosystem convention), so the line is a pure
    JVM projection and byte-deterministic for a given row.
    """
    blob = F.to_json(
        F.struct(
            F.col("url"),
            F.col("digest"),
            F.col("mime"),
            F.col("status"),
            F.col("length").cast("string").alias("length"),
            F.col("offset").cast("string").alias("offset"),
            F.col("filename"),
        )
    )
    return cdxj.select(
        F.concat_ws(" ", F.col("surt_key"), F.col("cdx_ts"), blob).alias("value"),
        "surt_key",
        "cdx_ts",
    )


def write_cdxj(cdxj: DataFrame, dir_path: str, shards: Optional[int] = None) -> None:
    """Write sorted CDX-J text shards under ``dir_path``.

    ``repartitionByRange(surt_key, cdx_ts)`` + ``sortWithinPartitions``
    gives globally ordered output across shards — the property CDX
    consumers rely on (binary search within a shard, merge across) —
    without ever funnelling the index through one task. Sampling for the
    range boundaries is seeded by Spark; for a bit-stable shard LAYOUT in
    tests pass ``shards=1`` (content order is deterministic regardless).
    """
    lines = cdxj_lines(cdxj)
    n = shards or cdxj.sparkSession.sparkContext.defaultParallelism
    (
        lines.repartitionByRange(n, "surt_key", "cdx_ts")
        .sortWithinPartitions("surt_key", "cdx_ts")
        .select("value")
        .write.mode("overwrite")
        .text(dir_path)
    )


def read_cdxj(spark, path: str, strict: bool = False) -> DataFrame:
    """Text scan of CDX-J lines -> the :data:`CDXJ_SCHEMA` frame.

    The SURT key may itself contain no spaces (commas and ``)`` only), so
    the first two single-space splits are unambiguous; the remainder is
    the JSON blob. Lines whose blob fails to parse or that lack three
    fields are dropped when lenient; ``strict=True`` turns them into a
    job-failing raise via an assertion column (tests).
    """
    raw = spark.read.text(path)
    key = F.substring_index("value", " ", 1)
    ts = F.element_at(F.split(F.col("value"), " ", 3), 2)
    blob = F.expr("substring(value, length(substring_index(value, ' ', 2)) + 2)")
    parsed = raw.select(
        key.alias("surt_key"),
        ts.alias("cdx_ts"),
        F.from_json(
            blob,
            "url string, digest string, mime string, status string, "
            "length string, offset string, filename string",
        ).alias("j"),
    )
    bad = (
        F.col("j").isNull()
        | F.col("j.url").isNull()
        | ~F.col("cdx_ts").rlike("^[0-9]{14}$")
    )
    if strict:
        parsed = parsed.withColumn(
            "_ok", F.assert_true(~bad, F.concat(F.lit("malformed CDX-J line")))
        ).drop("_ok")
    else:
        parsed = parsed.filter(~bad)
    return parsed.select(
        "surt_key",
        "cdx_ts",
        F.col("j.url").alias("url"),
        F.col("j.digest").alias("digest"),
        F.col("j.mime").alias("mime"),
        F.col("j.status").alias("status"),
        F.col("j.length").cast("bigint").alias("length"),
        F.col("j.offset").cast("bigint").alias("offset"),
        F.col("j.filename").alias("filename"),
    )


def cdxj_to_index(cdxj: DataFrame) -> DataFrame:
    """Project a CDX-J frame to the ``(path, offset, length)`` index
    :func:`~crawler_spark.sources.warc.read_warc_indexed` consumes —
    filter first (host slice, status, dedup) and the filtered rows ARE
    the byte ranges fetched."""
    return cdxj.select(
        F.col("filename").alias("path"), "offset", "length", "url"
    )


def surt_prefix(host: str) -> str:
    """SURT prefix of a bare lowercase host (or registrable-domain
    suffix): ``example.com`` -> ``com,example`` — prepend-match every
    capture of the domain and all its subdomains."""
    h = host.lower()
    if h.startswith("www.") and h.count(".") >= 2:  # surt_key_expr's rule
        h = h[4:]
    return ",".join(reversed(h.split(".")))


def host_slice(cdxj: DataFrame, host: str) -> DataFrame:
    """All captures under ``host`` (and subdomains): a prefix predicate on
    the SURT key. Pushes down on parquet; is a contiguous run on sorted
    text shards."""
    p = surt_prefix(host)
    return cdxj.filter(
        F.col("surt_key").startswith(p + ")")
        | F.col("surt_key").startswith(p + ",")
        | F.col("surt_key").startswith(p + ":")
    )
