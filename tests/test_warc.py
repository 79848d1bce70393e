"""WARC source: roundtrip, indexed range reads, extraction parity.

The ground truth is the datagen corpus itself (``pages.text`` is computed by
the same extractor the reference pins byte-identically), so these tests close
the loop: corpus -> WARC bytes -> Spark read -> extract == stored text.
"""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.datagen import CorpusSpec, corpus_rows
from crawler_spark.sources.warc import (
    parse_warc_records,
    read_warc,
    read_warc_indexed,
    warc_record_bytes,
    warc_to_pages,
    write_warc,
    write_warc_files,
)

SPEC = CorpusSpec(n_pages=60, n_hosts=4, seed=7)


@pytest.fixture(scope="module")
def rows():
    return corpus_rows(SPEC)


def _key(rows_or_df):
    from datetime import timezone

    if hasattr(rows_or_df, "collect"):
        rows_or_df = [r.asDict() for r in rows_or_df.collect()]

    def _utc_naive(ts):
        if ts.tzinfo is not None:
            ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
        return ts

    return sorted(
        (r["url"], _utc_naive(r["warc_ts"]).isoformat(), bytes(r["html"]))
        for r in rows_or_df
    )


def test_roundtrip_plain_and_gzip(spark, rows, tmp_path):
    for compress, name in [(False, "a.warc"), (True, "a.warc.gz")]:
        p = str(tmp_path / name)
        idx = write_warc(p, rows, compress=compress)
        assert len(idx) == len(rows)
        got = read_warc(spark, p, strict=True)
        assert _key(got) == _key(rows)  # url+ts+byte-identical html


def test_multi_file_glob_and_pages_adapter(spark, rows, tmp_path):
    d = str(tmp_path / "shards")
    write_warc_files(d, rows, records_per_file=17)
    assert len(os.listdir(d)) == 4  # 60 rows / 17
    got = read_warc(spark, d + "/*.warc.gz", strict=True)
    assert _key(got) == _key(rows)
    pages = warc_to_pages(got)
    assert _key(pages) == _key(rows)  # no duplicate fetches -> identity


def test_pages_adapter_newest_fetch_wins(spark, rows, tmp_path):
    # refetch of the first url, 1h later, with different bytes
    import datetime as dt

    dup = dict(rows[0])
    dup["warc_ts"] = rows[0]["warc_ts"] + dt.timedelta(hours=1)
    dup["html"] = b"<html><body><h1>refetched</h1></body></html>"
    p = str(tmp_path / "b.warc.gz")
    write_warc(p, rows + [dup], compress=True)
    pages = warc_to_pages(read_warc(spark, p, strict=True))
    assert pages.count() == len(rows)
    kept = pages.filter(F.col("url") == rows[0]["url"]).collect()[0]
    assert bytes(kept["html"]) == dup["html"]


def test_indexed_reads_match_full_scan(spark, rows, tmp_path):
    d = str(tmp_path / "idx")
    index = write_warc_files(d, rows, records_per_file=13)
    idx_df = spark.createDataFrame(
        [(r["path"], r["offset"], r["length"]) for r in index],
        "path string, offset bigint, length bigint",
    )
    got = read_warc_indexed(spark, idx_df, strict=True)
    assert _key(got) == _key(rows)
    # partition invariance: record-granular fan-out reads the same rows
    wide = read_warc_indexed(spark, idx_df, strict=True, partitions=8)
    assert _key(wide) == _key(rows)


def test_indexed_sparse_slice(spark, rows, tmp_path):
    """Filtering the INDEX selects which bytes are read at all — the
    one-host slice of a big archive."""
    d = str(tmp_path / "slice")
    index = write_warc_files(d, rows, records_per_file=13)
    host = rows[0]["url"].split("/")[2]
    want = [r for r in rows if r["url"].split("/")[2] == host]
    sub = [r for r in index if r["url"].split("/")[2] == host]
    idx_df = spark.createDataFrame(
        [(r["path"], r["offset"], r["length"]) for r in sub],
        "path string, offset bigint, length bigint",
    )
    got = read_warc_indexed(spark, idx_df, strict=True)
    assert _key(got) == _key(want)


def test_extraction_parity_from_warc(spark, rows, tmp_path):
    """WARC -> extract == the corpus's stored ground-truth text, byte-equal."""
    from crawler_spark.operators.extract import extract_pages

    p = str(tmp_path / "c.warc.gz")
    write_warc(p, rows, compress=True)
    pages = warc_to_pages(read_warc(spark, p, strict=True))
    ext = extract_pages(pages.select("url", "html"), carry=False)
    truth = {r["url"]: r["text"] for r in rows}
    for r in ext.select("url", "markdown").collect():
        assert r["markdown"] == truth[r["url"]]


def test_non_response_records_skipped(rows):
    rec = warc_record_bytes(
        rows[0]["url"], rows[0]["warc_ts"], b"GET / HTTP/1.1\r\n\r\n",
        record_type="request",
    ) + warc_record_bytes(rows[1]["url"], rows[1]["warc_ts"], rows[1]["html"])
    got = list(parse_warc_records(rec, strict=True))
    assert [u for u, _, _ in got] == [rows[1]["url"]]


def test_malformed_strict_vs_lenient(rows):
    good = warc_record_bytes(rows[0]["url"], rows[0]["warc_ts"], rows[0]["html"])
    bad = good + b"NOT-A-WARC-HEADER\r\n\r\njunk"
    with pytest.raises(ValueError):
        list(parse_warc_records(bad, strict=True))
    got = list(parse_warc_records(bad, strict=False))
    assert len(got) == 1  # the good record survives, the tail is dropped


def test_truncated_gzip_tail_lenient(spark, rows, tmp_path):
    p = str(tmp_path / "t.warc.gz")
    write_warc(p, rows[:5], compress=True)
    data = open(p, "rb").read()
    open(p, "wb").write(data[: len(data) - 40])  # chop mid-member
    got = read_warc(spark, p, strict=False)
    assert got.count() == 4  # last member lost, first four intact


def test_writer_bit_deterministic(rows, tmp_path):
    p1, p2 = str(tmp_path / "d1.warc.gz"), str(tmp_path / "d2.warc.gz")
    write_warc(p1, rows, compress=True)
    write_warc(p2, rows, compress=True)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_stream_warc_incremental_and_batch_equal(spark, rows, tmp_path):
    """Shards arriving between micro-batches are each ingested exactly once,
    and the streamed rows equal the batch reader's."""
    from crawler_spark.sources.warc import stream_warc, write_warc

    d = tmp_path / "arrivals"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")
    write_warc(str(d / "s0.warc.gz"), rows[:25])

    def drain():
        q = (
            stream_warc(spark, str(d))
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    got1 = spark.read.parquet(str(tmp_path / "out"))
    assert got1.count() == 25
    write_warc(str(d / "s1.warc.gz"), rows[25:])
    drain()
    got2 = spark.read.parquet(str(tmp_path / "out"))
    assert got2.count() == len(rows)  # s0 not re-ingested, s1 appended
    assert _key(got2.select("url", "warc_ts", "html")) == _key(rows)


def test_ingest_warc_cli(spark, rows, tmp_path, monkeypatch):
    """jobs/ingest_warc.py end-to-end: shards -> pages parquet -> extract."""
    import sys

    import jobs.ingest_warc as jiw
    from crawler_spark.sources.warc import write_warc_files

    d = str(tmp_path / "shards")
    write_warc_files(d, rows, records_per_file=25)
    pages_p, ext_p = str(tmp_path / "pages"), str(tmp_path / "ext")
    mc_p = str(tmp_path / "mc")
    monkeypatch.setattr(sys, "argv", [
        "ingest_warc.py", "--input", d + "/*.warc.gz",
        "--output", pages_p, "--extract", ext_p, "--strict",
        "--drop-traps", "--trap-min-urls", "1000",
        "--main-content", mc_p,
    ])
    jiw.main()
    pages = spark.read.parquet(pages_p)
    assert _key(pages) == _key(rows)
    ext = spark.read.parquet(ext_p)
    truth = {r["url"]: r["text"] for r in rows}
    assert all(
        r["markdown"] == truth[r["url"]]
        for r in ext.select("url", "markdown").collect()
    )
    mc = spark.read.parquet(mc_p)
    assert mc.count() == pages.count()
    assert set(mc.columns) == {
        "url", "n_blocks", "n_content_blocks", "content_words", "main_text"
    }


def test_fractional_warc_date_parses(rows):
    import datetime as dt

    ts = rows[0]["warc_ts"].replace(microsecond=250000)
    rec = warc_record_bytes(rows[0]["url"], ts, rows[0]["html"])
    assert b"WARC-Date: " in rec and b".250000Z" in rec
    (url, got_ts, html) = next(iter(parse_warc_records(rec, strict=True)))
    assert got_ts == ts.replace(tzinfo=dt.timezone.utc)


def test_http_status_mime_charset_columns(spark, tmp_path):
    """Real archives carry 3xx/4xx and non-HTML records: the reader
    surfaces status/mime/charset and warc_to_pages keeps only 2xx HTML."""
    from datetime import datetime, timezone

    ts = datetime(2025, 1, 1, tzinfo=timezone.utc)
    mixed = [
        {"url": "http://a/ok", "warc_ts": ts, "html": b"<html>ok</html>"},
        {"url": "http://a/moved", "warc_ts": ts, "html": b"",
         "status": 301, "content_type": "text/html"},
        {"url": "http://a/gone", "warc_ts": ts, "html": b"nope",
         "status": 404, "content_type": "text/html; charset=utf-8"},
        {"url": "http://a/img", "warc_ts": ts, "html": b"\x89PNG",
         "content_type": "image/png"},
        {"url": "http://a/latin", "warc_ts": ts, "html": b"caf\xe9",
         "content_type": "text/html; charset=ISO-8859-1"},
    ]
    p = str(tmp_path / "mixed.warc.gz")
    write_warc(p, mixed)
    got = {r["url"]: r for r in read_warc(spark, p, strict=True).collect()}
    assert got["http://a/ok"]["http_status"] == 200
    assert got["http://a/ok"]["charset"] == "utf-8"
    assert got["http://a/moved"]["http_status"] == 301
    assert got["http://a/gone"]["http_status"] == 404
    assert got["http://a/img"]["mime"] == "image/png"
    assert got["http://a/latin"]["charset"] == "iso-8859-1"
    assert bytes(got["http://a/latin"]["html"]) == b"caf\xe9"  # bytes untouched

    pages = warc_to_pages(read_warc(spark, p, strict=True))
    kept = sorted(r["url"] for r in pages.select("url").collect())
    assert kept == ["http://a/latin", "http://a/ok"]  # 2xx html only
    everything = warc_to_pages(read_warc(spark, p, strict=True), ok_only=False)
    assert everything.count() == 5


def test_headerless_body_defaults_200_html():
    """Records whose block carries no HTTP head (bare-body archives) read
    as 200 text/html with the whole block as html."""
    from crawler_spark.sources.warc import parse_warc_records_full

    body = b"<html>bare</html>"
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:x:1>\r\n"
        b"WARC-Target-URI: http://a/\r\n"
        b"WARC-Date: 2025-01-01T00:00:00Z\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
        + body + b"\r\n\r\n"
    )
    (r,) = parse_warc_records_full(raw, strict=True)
    url, _ts, html, status, mime, charset = r
    assert (status, mime, charset) == (200, "text/html", "")
    assert html == body


def test_decode_html_ladder():
    from crawler_spark.core.htmlparse import decode_html

    # BOM wins over everything
    assert decode_html(b"\xef\xbb\xbfcaf\xc3\xa9", "iso-8859-1") == "caf\xe9"
    # transport hint
    assert decode_html(b"caf\xe9", "ISO-8859-1") == "caf\xe9"
    assert decode_html(b"\x82\xa0", "shift_jis") == "あ"
    # meta sniff when no hint
    html = b'<html><head><meta charset="windows-1251"></head>\xcf\xf0</html>'
    assert "Пр" in decode_html(html, "")
    meta2 = (b'<meta http-equiv="Content-Type" '
             b'content="text/html; charset=iso-8859-1">caf\xe9')
    assert decode_html(meta2, "").endswith("caf\xe9")
    # unknown label falls through to utf-8
    assert decode_html("café".encode(), "not-a-charset") == "café"
    # garbage never crashes
    assert "�" in decode_html(b"\xff\xfe\xfd", "utf-8")


def test_charset_decodes_through_extraction(spark, tmp_path):
    """ISO-8859-1 page in a WARC: the charset hint flows reader ->
    warc_to_pages -> extract_pages, and the markdown carries the real
    character, not mojibake."""
    from datetime import datetime, timezone

    from crawler_spark.operators.extract import extract_pages

    ts = datetime(2025, 1, 1, tzinfo=timezone.utc)
    body = "<html><head><title>Caf\xe9</title></head><body><p>au lait caf\xe9</p></body></html>".encode("iso-8859-1")
    p = str(tmp_path / "latin.warc.gz")
    write_warc(p, [{"url": "http://l/", "warc_ts": ts, "html": body,
                    "content_type": "text/html; charset=ISO-8859-1"}])
    pages = warc_to_pages(read_warc(spark, p, strict=True))
    assert "charset" in pages.columns
    ext = extract_pages(pages.select("url", "html", "warc_ts", "charset"),
                        carry=False)
    r = ext.collect()[0]
    assert r["title"] == "Caf\xe9"
    assert "caf\xe9" in r["markdown"]
    # without the hint the same bytes would mojibake to a replacement char
    ext2 = extract_pages(pages.select("url", "html"), carry=False)
    assert "�" in ext2.collect()[0]["title"]


def test_revisit_dedup_roundtrip(spark, tmp_path):
    """Payload-dedup'd archive: identical bodies write once; revisit
    records resolve back so the full capture stream equals the undeduped
    archive's, and the deduped file is materially smaller."""
    from datetime import datetime, timedelta, timezone

    from crawler_spark.sources.warc import (
        payload_digest,
        read_warc,
        read_warc_resolved,
        read_warc_revisits,
        resolve_revisits,
    )

    import hashlib

    t0 = datetime(2025, 1, 1, tzinfo=timezone.utc)
    # incompressible filler so the on-disk size comparison reflects the
    # dedup (a repeated-phrase body gzips to ~nothing per member and the
    # full archive would already be as small as the deduped one)
    filler = b"".join(
        hashlib.sha256(b"noise%d" % i).digest() for i in range(100)
    ).hex().encode()
    body_a = b"<html><body>" + filler + b"</body></html>"
    body_b = b"<html><body>changed</body></html>"
    caps = []
    for day in range(4):  # url1 never changes; url2 changes at day 2
        caps.append({"url": "http://h/stable", "warc_ts": t0 + timedelta(days=day),
                     "html": body_a})
        caps.append({"url": "http://h/vol", "warc_ts": t0 + timedelta(days=day),
                     "html": body_a if day < 2 else body_b})
    p_dedup = str(tmp_path / "d.warc.gz")
    p_full = str(tmp_path / "f.warc.gz")
    write_warc(p_dedup, caps, dedup_payloads=True)
    write_warc(p_full, caps)
    assert os.path.getsize(p_dedup) < os.path.getsize(p_full) / 2

    # 2 distinct payloads -> 2 response records, 6 revisits
    resp = read_warc(spark, p_dedup, strict=True)
    rev = read_warc_revisits(spark, p_dedup, strict=True)
    assert resp.count() == 2 and rev.count() == 6
    assert set(r["digest"] for r in rev.collect()) == {
        payload_digest(body_a), payload_digest(body_b)
    }
    r0 = rev.orderBy("warc_ts", "url").collect()[0]
    assert r0["refers_url"] == "http://h/stable"

    # resolution restores every capture byte-identically
    full = read_warc_resolved(spark, p_dedup, strict=True)
    key = lambda df: sorted(
        (r["url"], r["warc_ts"].isoformat(), bytes(r["html"]))
        for r in df.select("url", "warc_ts", "html").collect()
    )
    assert key(full) == key(read_warc(spark, p_full, strict=True))
    assert full.count() == 8

    # warc_to_pages on the resolved stream: newest capture wins per url
    pages = {r["url"]: bytes(r["html"])
             for r in warc_to_pages(full).collect()}
    assert pages == {"http://h/stable": body_a, "http://h/vol": body_b}


def test_resolve_revisits_drops_foreign_digests(spark, tmp_path):
    """A revisit whose original lives outside the read slice resolves to
    nothing (dropped, countable via anti-join) rather than poisoning."""
    from datetime import datetime, timezone

    from crawler_spark.sources.warc import (
        read_warc,
        read_warc_revisits,
        resolve_revisits,
        warc_revisit_bytes,
    )
    import gzip as gz

    ts = datetime(2025, 1, 1, tzinfo=timezone.utc)
    p = str(tmp_path / "x.warc.gz")
    write_warc(p, [{"url": "http://h/a", "warc_ts": ts, "html": b"<p>a</p>"}])
    orphan = warc_revisit_bytes(
        "http://h/b", ts, "sha1:NOSUCHDIGEST", "http://other/", ts
    )
    import io as iomod

    buf = iomod.BytesIO()
    with gz.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
        g.write(orphan)
    with open(p, "ab") as f:
        f.write(buf.getvalue())
    resp = read_warc(spark, p, strict=True)
    rev = read_warc_revisits(spark, p, strict=True)
    assert rev.count() == 1
    assert resolve_revisits(resp, rev).count() == 0
    assert rev.join(resp, "digest", "left_anti").count() == 1


def test_write_warc_shards_distributed_roundtrip(spark, rows, tmp_path):
    """Distributed sink: one shard per partition, CDX index as output,
    byte-exact roundtrip incl. status/mime/charset, and every indexed
    (offset, length) readable standalone."""
    from crawler_spark.sources.warc import write_warc_shards

    d = str(tmp_path / "shards")
    pages = spark.createDataFrame(
        [
            {
                "url": r["url"],
                "warc_ts": r["warc_ts"],
                "html": r["html"],
                "http_status": 404 if i % 7 == 0 else 200,
                "mime": "text/plain" if i % 5 == 0 else "text/html",
                "charset": "" if i % 3 == 0 else "utf-8",
            }
            for i, r in enumerate(rows)
        ]
    ).repartition(3)
    idx = write_warc_shards(pages, d).cache()
    n_idx = idx.count()
    assert n_idx == len(rows)
    assert len([p for p in os.listdir(d) if p.endswith(".warc.gz")]) == 3

    back = read_warc(spark, d + "/*.warc.gz", strict=True)
    want = sorted(
        (r["url"], bytes(r["html"]), 404 if i % 7 == 0 else 200,
         "text/plain" if i % 5 == 0 else "text/html",
         "" if i % 3 == 0 else "utf-8")
        for i, r in enumerate(rows)
    )
    got = sorted(
        (r["url"], bytes(r["html"]), r["http_status"], r["mime"],
         r["charset"])
        for r in back.collect()
    )
    assert got == want

    # the emitted index drives record-range reads identical to a full scan
    ranged = read_warc_indexed(spark, idx.select("path", "offset", "length"),
                               strict=True)
    assert _key(ranged) == _key(back)


def test_write_warc_shards_dedup_is_global(spark, tmp_path):
    """dedup_payloads crosses input partitions: duplicates placed in
    different partitions still collapse to ONE stored body, revisits point
    at the globally-earliest capture, and the resolved stream equals the
    full capture set."""
    from datetime import datetime, timedelta, timezone

    from crawler_spark.sources.warc import (
        read_warc_resolved,
        read_warc_revisits,
        write_warc_shards,
    )

    t0 = datetime(2025, 3, 1, tzinfo=timezone.utc)
    caps = [
        {"url": "http://h/p%d" % (i % 4), "warc_ts": t0 + timedelta(hours=i),
         "html": b"<html>body-%d</html>" % (i % 4)}
        for i in range(16)  # 4 distinct payloads x 4 captures each
    ]
    d = str(tmp_path / "dedup_shards")
    pages = spark.createDataFrame(caps).select(
        "url", "warc_ts", F.col("html").cast("binary").alias("html")
    ).repartition(4)
    idx = write_warc_shards(pages, d, dedup_payloads=True).cache()
    assert idx.count() == 16

    resp = read_warc(spark, d + "/*.warc.gz", strict=True)
    rev = read_warc_revisits(spark, d + "/*.warc.gz", strict=True)
    assert resp.count() == 4 and rev.count() == 12
    # every revisit refers to the globally-earliest capture of its payload
    for r in rev.collect():
        assert r["refers_ts"].replace(tzinfo=timezone.utc) == t0 + timedelta(
            hours=int(r["refers_url"].rsplit("p", 1)[1])
        )
    full = read_warc_resolved(spark, d + "/*.warc.gz", strict=True)
    assert _key(full) == _key(caps)
