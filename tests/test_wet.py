"""WET/WAT derivative archives: distributed writers, readers, range reads.

Ground truth is the datagen corpus (``text`` is the byte-pinned extraction
of ``html``), so WET closes the loop corpus -> WET shards -> read_wet ==
stored text, and WAT closes extract -> WAT shards -> read_wat == the
extract stage's links/title.
"""

from __future__ import annotations

import glob as globmod
import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.datagen import CorpusSpec, corpus_rows
from crawler_spark.sources.warc import parse_warc_records
from crawler_spark.sources.wet import (
    read_wat,
    read_wet,
    write_wat,
    write_wet,
)

SPEC = CorpusSpec(n_pages=60, n_hosts=4, seed=7)


@pytest.fixture(scope="module")
def pages(spark):
    rows = corpus_rows(SPEC)
    return spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["text"]) for r in rows],
        "url string, warc_ts timestamp, text string",
    )


def _txt_key(df_or_rows):
    if hasattr(df_or_rows, "collect"):
        df_or_rows = df_or_rows.collect()
    return sorted((r["url"], r["text"]) for r in df_or_rows)


def test_wet_roundtrip_text_identical(spark, pages, tmp_path):
    d = str(tmp_path / "wet")
    # deterministic layout: range-partition by url before the sink
    idx = write_wet(pages.repartitionByRange(3, "url"), d)
    n = idx.count()  # materializes the write
    assert n == 60
    shards = globmod.glob(os.path.join(d, "part-*.warc.wet.gz"))
    assert 1 <= len(shards) <= 3
    back = read_wet(spark, d + "/*.warc.wet.gz", strict=True)
    assert _txt_key(back) == _txt_key(pages)
    # timestamps survive the WARC-Date roundtrip
    a = {r["url"]: r["warc_ts"] for r in back.collect()}
    b = {r["url"]: r["warc_ts"] for r in pages.collect()}
    assert a == b


def test_wet_index_range_reads_single_record(spark, pages, tmp_path):
    d = str(tmp_path / "wet")
    idx = write_wet(pages.repartitionByRange(2, "url"), d).collect()
    want = {r["url"]: r["text"] for r in pages.collect()}
    # every indexed (offset, length) is a standalone gzip member holding
    # exactly its record — the CC byte-range consumption pattern
    for e in idx[:7] + idx[-3:]:
        with open(e["path"], "rb") as f:
            f.seek(e["offset"])
            raw = f.read(e["length"])
        import zlib

        member = zlib.decompressobj(wbits=31).decompress(raw)
        recs = list(
            parse_warc_records(member, strict=True, record_type="conversion")
        )
        assert len(recs) == 1
        url, ts, block = recs[0]
        assert url == e["url"]
        assert block.decode("utf-8") == want[url]


def test_wet_write_deterministic(spark, pages, tmp_path):
    outs = []
    for name in ("w1", "w2"):
        d = str(tmp_path / name)
        write_wet(pages.repartitionByRange(2, "url"), d).count()
        blob = b""
        for p in sorted(globmod.glob(os.path.join(d, "part-*"))):
            with open(p, "rb") as f:
                blob += f.read()
        outs.append(blob)
    assert outs[0] == outs[1]


def test_wat_roundtrip_links_title(spark, tmp_path):
    from crawler_spark.operators.extract import extract_pages

    rows = corpus_rows(SPEC)
    pages_html = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"].decode() if isinstance(r["html"], bytes) else r["html"]) for r in rows],
        "url string, warc_ts timestamp, html string",
    )
    ext = extract_pages(pages_html, carry=False)
    wat_in = ext.join(
        pages_html.select(
            "url", "warc_ts", F.length("html").cast("bigint").alias("n_bytes")
        ),
        "url",
    ).select("url", "warc_ts", "title", "links", "n_bytes")
    d = str(tmp_path / "wat")
    idx = write_wat(wat_in.repartitionByRange(2, "url"), d)
    assert idx.count() == 60
    back = read_wat(spark, d + "/*.warc.wat.gz", strict=True)
    a = sorted(
        (r["url"], r["title"], tuple(r["links"]), r["n_bytes"])
        for r in back.collect()
    )
    b = sorted(
        (r["url"], r["title"], tuple(r["links"] or []), r["n_bytes"])
        for r in wat_in.collect()
    )
    assert a == b


def test_wat_lenient_skips_bad_json(spark, tmp_path):
    from datetime import datetime, timezone

    from crawler_spark.sources.wet import _derived_record_bytes, _gz_member

    ts = datetime(2025, 1, 1, tzinfo=timezone.utc)
    good = _derived_record_bytes(
        "http://a/", ts, b'{"url":"http://a/","title":"t","links":[],"n_bytes":3}',
        "metadata", "application/json",
    )
    bad = _derived_record_bytes(
        "http://b/", ts, b"{not json", "metadata", "application/json"
    )
    d = tmp_path / "watbad"
    d.mkdir()
    with open(d / "part-00000.warc.wat.gz", "wb") as f:
        f.write(_gz_member(good) + _gz_member(bad))
    got = read_wat(spark, str(d) + "/*.warc.wat.gz")
    assert [r["url"] for r in got.collect()] == ["http://a/"]
    with pytest.raises(Exception):
        read_wat(spark, str(d) + "/*.warc.wat.gz", strict=True).collect()
