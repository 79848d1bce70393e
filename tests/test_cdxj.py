"""CDX-J index source: SURT keys, sorted shards, roundtrip into range reads.

Closes the archive-addressing loop: corpus -> WARC shards + index ->
CDX-J text -> read back -> host slice -> `read_warc_indexed` fetches only
the sliced byte ranges, byte-identical to the full scan's rows.
"""

from __future__ import annotations

import glob as globmod
import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.datagen import CorpusSpec, corpus_rows
from crawler_spark.sources.cdxj import (
    build_cdxj,
    cdxj_to_index,
    host_slice,
    read_cdxj,
    surt_prefix,
    write_cdxj,
)
from crawler_spark.sources.warc import read_warc, read_warc_indexed, write_warc_files

SPEC = CorpusSpec(n_pages=60, n_hosts=4, seed=7)


@pytest.fixture(scope="module")
def rows():
    return corpus_rows(SPEC)


@pytest.fixture(scope="module")
def archive(rows, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("warc"))
    index = write_warc_files(d, rows, records_per_file=17)
    ts = {r["url"]: r["warc_ts"] for r in rows}
    for e in index:
        e["warc_ts"] = ts[e["url"]]
    return d, index


# ---------------------------------------------------------------------------
# SURT key golden cases
# ---------------------------------------------------------------------------

SURT_CASES = [
    # lowercase + reverse labels + )/ for empty path
    ("https://Example.COM", "com,example)/"),
    # www stripped only when >=2 labels remain
    ("http://www.example.com/A/B", "com,example)/a/b"),
    ("http://www.com/x", "com,www)/x"),
    # default ports drop; other ports kept after the reversed host
    ("http://example.com:80/p", "com,example)/p"),
    ("https://example.com:443/p", "com,example)/p"),
    ("http://example.com:8080/p", "com,example:8080)/p"),
    # query: lowercased, empties dropped, sorted; fragment dropped
    ("http://h.example.org/P?B=2&a=1&#frag", "org,example,h)/p?a=1&b=2"),
    ("http://h.example.org/p?", "org,example,h)/p"),
    # deep subdomain
    ("https://a.b.shop.example.co.uk/x?z=1", "uk,co,example,shop,b,a)/x?z=1"),
]


def test_surt_key_golden(spark):
    from crawler_spark.core.urls import surt_key_expr

    df = spark.createDataFrame([(u,) for u, _ in SURT_CASES], "url string")
    got = [
        r["k"]
        for r in df.select(F.expr(surt_key_expr("url")).alias("k")).collect()
    ]
    assert got == [k for _, k in SURT_CASES]


def test_surt_prefix_matches_expr(spark):
    # the Python prefix helper and the SQL expression agree on hosts
    from crawler_spark.core.urls import surt_key_expr

    hosts = ["example.com", "www.example.com", "a.b.co.uk", "www.com"]
    df = spark.createDataFrame(
        [("http://%s/" % h,) for h in hosts], "url string"
    )
    keys = [
        r["k"]
        for r in df.select(F.expr(surt_key_expr("url")).alias("k")).collect()
    ]
    for h, k in zip(hosts, keys):
        assert k.startswith(surt_prefix(h) + ")")


# ---------------------------------------------------------------------------
# build/write/read roundtrip
# ---------------------------------------------------------------------------


def test_cdxj_roundtrip_and_sorted_shards(spark, archive, tmp_path):
    d, index = archive
    idx_df = spark.createDataFrame(index)
    cdxj = build_cdxj(idx_df)
    out = str(tmp_path / "cdxj")
    write_cdxj(cdxj, out, shards=3)

    # shards are internally sorted and globally ordered
    parts = sorted(globmod.glob(os.path.join(out, "part-*")))
    assert parts
    last_key_prev = ""
    nonempty = 0
    for p in parts:
        with open(p) as f:
            lines = [ln.rstrip("\n") for ln in f if ln.strip()]
        if not lines:
            continue
        nonempty += 1
        keys = [ln.split(" ", 2)[:2] for ln in lines]
        assert keys == sorted(keys)
        assert " ".join(keys[0]) >= last_key_prev
        last_key_prev = " ".join(keys[-1])
    assert nonempty >= 1

    # read back: every typed field survives the text roundtrip
    back = read_cdxj(spark, out, strict=True)
    a = sorted(
        (r["surt_key"], r["cdx_ts"], r["url"], r["offset"], r["length"], r["filename"])
        for r in cdxj.collect()
    )
    b = sorted(
        (r["surt_key"], r["cdx_ts"], r["url"], r["offset"], r["length"], r["filename"])
        for r in back.collect()
    )
    assert a == b
    assert back.count() == len(index)


def test_cdxj_write_deterministic(spark, archive, tmp_path):
    d, index = archive
    idx_df = spark.createDataFrame(index)
    outs = []
    for name in ("c1", "c2"):
        out = str(tmp_path / name)
        write_cdxj(build_cdxj(idx_df), out, shards=1)
        (p,) = globmod.glob(os.path.join(out, "part-*"))
        with open(p, "rb") as f:
            outs.append(f.read())
    assert outs[0] == outs[1]  # byte-identical re-writes


def test_host_slice_feeds_indexed_read(spark, rows, archive, tmp_path):
    d, index = archive
    cdxj = build_cdxj(spark.createDataFrame(index))
    out = str(tmp_path / "cdxj")
    write_cdxj(cdxj, out, shards=2)
    back = read_cdxj(spark, out)

    host = sorted({r["url"].split("/")[2] for r in rows})[0]
    sliced = host_slice(back, host)
    want_urls = sorted(r["url"] for r in rows if r["url"].split("/")[2] == host)
    assert 0 < len(want_urls) < len(rows)
    assert sorted(r["url"] for r in sliced.select("url").collect()) == want_urls

    # the slice IS the fetch plan: indexed read == full-scan rows for host
    got = read_warc_indexed(spark, cdxj_to_index(sliced), strict=True)
    full = read_warc(spark, d + "/*.warc.gz", strict=True).filter(
        F.split("url", "/")[2] == host
    )
    key = lambda df: sorted(
        (r["url"], bytes(r["html"])) for r in df.select("url", "html").collect()
    )
    assert key(got) == key(full)
    assert len(key(got)) == len(want_urls)


def test_read_cdxj_lenient_drops_malformed(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    good = 'com,example)/ 20240101000000 {"url": "http://example.com/", "digest": "", "mime": "text/html", "status": "200", "length": "10", "offset": "0", "filename": "f.warc.gz"}'
    with open(p / "part-00000", "w") as f:
        f.write(good + "\n")
        f.write("com,bad)/ nottime {}\n")  # bad timestamp
        f.write("junk\n")  # no blob at all
    got = read_cdxj(spark, str(p))
    assert got.count() == 1
    r = got.collect()[0]
    assert (r["url"], r["offset"], r["length"]) == ("http://example.com/", 0, 10)


def test_ingest_cli_cdxj_in_and_derivatives_out(spark, rows, archive, tmp_path, monkeypatch):
    """jobs/ingest_warc.py with --cdxj input (host slice) and WET/WAT/CDX-J
    outputs: the full derivative-archive production path, one submit."""
    import json as jsonmod
    import sys

    import jobs.ingest_warc as jiw

    d, index = archive
    cdxj_in = str(tmp_path / "cdxj_in")
    write_cdxj(build_cdxj(spark.createDataFrame(index)), cdxj_in, shards=2)

    host = sorted({r["url"].split("/")[2] for r in rows})[1]
    n_host = sum(1 for r in rows if r["url"].split("/")[2] == host)
    pages_p = str(tmp_path / "pages")
    ext_p = str(tmp_path / "ext")
    wet_p = str(tmp_path / "wet")
    wat_p = str(tmp_path / "wat")
    cdxj_out = str(tmp_path / "cdxj_out")
    monkeypatch.setattr(sys, "argv", [
        "ingest_warc.py", "--input", "unused",
        "--cdxj", cdxj_in, "--host", host, "--strict",
        "--output", pages_p, "--extract", ext_p,
        "--write-wet", wet_p, "--write-wat", wat_p,
        "--write-cdxj", cdxj_out, "--partitions", "2",
    ])
    jiw.main()

    pages = spark.read.parquet(pages_p)
    assert pages.count() == n_host
    assert all(r["url"].split("/")[2] == host for r in pages.select("url").collect())

    # WET holds the extraction of exactly the sliced pages
    from crawler_spark.sources.wet import read_wet

    wet = read_wet(spark, wet_p + "/*.warc.wet.gz", strict=True)
    truth = {r["url"]: r["text"] for r in rows if r["url"].split("/")[2] == host}
    got = {r["url"]: r["text"] for r in wet.collect()}
    assert got == truth

    # the minted CDX-J indexes the WET archive: range reads resolve
    cdxj2 = read_cdxj(spark, cdxj_out, strict=True)
    assert cdxj2.count() == n_host
    e = cdxj2.orderBy("surt_key").collect()[0]
    import zlib

    from crawler_spark.sources.warc import parse_warc_records

    with open(e["filename"], "rb") as f:
        f.seek(e["offset"])
        raw = f.read(e["length"])
    member = zlib.decompressobj(wbits=31).decompress(raw)
    (rec,) = parse_warc_records(member, strict=True, record_type="conversion")
    assert rec[0] == e["url"]

    # WAT carries the link graph of the slice
    from crawler_spark.sources.wet import read_wat

    wat = read_wat(spark, wat_p + "/*.warc.wat.gz", strict=True)
    assert wat.count() == n_host
    assert wat.filter("size(links) > 0").count() > 0
