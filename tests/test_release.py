"""jobs/release.py: pages parquet -> WARC + CDX-J + WET + WAT + manifest.

The full Common-Crawl-style release lifecycle in one submit, verified
artifact-by-artifact against the input captures: the WARC resolves back to
every capture byte-identically, the CDX-J indexes every record (revisits
as ``warc/revisit``), the WET text equals the extraction frame's markdown,
and the WAT metadata parses back to the extraction frame's links.
"""

from __future__ import annotations

import json
import os
import sys
from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from crawler_spark.datagen import CorpusSpec, corpus_rows

SPEC = CorpusSpec(n_pages=40, n_hosts=4, seed=11)


@pytest.fixture(scope="module")
def captures():
    """Corpus plus one identical recrawl per url — revisit material."""
    rows = corpus_rows(SPEC)
    caps = [
        {"url": r["url"], "warc_ts": r["warc_ts"], "html": r["html"]}
        for r in rows
    ]
    caps += [
        {"url": r["url"], "warc_ts": r["warc_ts"] + timedelta(days=1),
         "html": r["html"]}
        for r in rows[:15]  # 15 urls recrawled, unchanged -> 15 revisits
    ]
    return rows, caps


def _run(spark, caps, out_dir, pages_dir, monkeypatch, *extra):
    import jobs.release as jr

    spark.createDataFrame(caps).select(
        "url", "warc_ts", F.col("html").cast("binary").alias("html")
    ).write.mode("overwrite").parquet(pages_dir)
    monkeypatch.setattr(sys, "argv", [
        "release.py", "--pages", pages_dir, "--out", out_dir,
        "--shards", "3", *extra,
    ])
    jr.main()
    return json.loads(open(os.path.join(out_dir, "manifest.json")).read())


def test_release_end_to_end_with_revisits(spark, captures, tmp_path,
                                          monkeypatch):
    from crawler_spark.sources.cdxj import read_cdxj
    from crawler_spark.sources.warc import (
        read_warc,
        read_warc_resolved,
        read_warc_revisits,
    )
    from crawler_spark.sources.wet import read_wat, read_wet

    rows, caps = captures
    out = str(tmp_path / "rel")
    man = _run(spark, caps, out, str(tmp_path / "pages"), monkeypatch,
               "--dedup-payloads")

    # manifest counts: every capture indexed, 15 as revisits
    assert man["n_records"] == len(caps)
    assert man["n_revisits"] == 15
    assert man["n_extracted"] == len(rows)
    assert man["n_wet"] == len(rows) and man["n_wat"] == len(rows)

    # WARC: responses hold one body per distinct payload; resolution
    # restores every capture byte-identically
    warc_glob = man["warc"] + "/*.warc.gz"
    assert read_warc(spark, warc_glob, strict=True).count() == len(rows)
    assert read_warc_revisits(spark, warc_glob, strict=True).count() == 15
    full = read_warc_resolved(spark, warc_glob, strict=True)
    assert sorted(
        (r["url"], r["warc_ts"].isoformat(), bytes(r["html"]))
        for r in full.collect()
    ) == sorted(
        (c["url"],
         c["warc_ts"].astimezone(timezone.utc).replace(tzinfo=None)
         .isoformat(),
         c["html"])
        for c in caps
    )

    # CDX-J: one row per record, revisits typed, locators resolve
    cdx = read_cdxj(spark, man["cdxj"] + "/*", strict=True)
    assert cdx.count() == len(caps)
    assert cdx.filter(F.col("mime") == "warc/revisit").count() == 15
    assert cdx.filter(~F.col("filename").endswith(".warc.gz")).count() == 0

    # WET == extraction markdown (the datagen ground-truth text);
    # WAT links == extraction links
    ext = spark.read.parquet(man["extracted"])
    truth = {r["url"]: r["markdown"]
             for r in ext.select("url", "markdown").collect()}
    wet = read_wet(spark, man["wet"] + "/*.warc.wet.gz", strict=True)
    assert wet.count() == len(rows)
    assert all(r["text"] == truth[r["url"]] for r in wet.collect())
    links = {r["url"]: list(r["links"] or [])
             for r in ext.select("url", "links").collect()}
    wat = read_wat(spark, man["wat"] + "/*.warc.wat.gz", strict=True)
    assert all(
        list(r["links"] or []) == links[r["url"]] for r in wat.collect()
    )


def test_release_no_dedup_plain(spark, captures, tmp_path, monkeypatch):
    """Without --dedup-payloads every capture is a full response record;
    --plain writes uncompressed shards the same readers consume."""
    from crawler_spark.sources.warc import read_warc

    rows, caps = captures
    out = str(tmp_path / "rel2")
    man = _run(spark, caps, out, str(tmp_path / "pages2"), monkeypatch,
               "--plain")
    assert man["n_records"] == len(caps) and man["n_revisits"] == 0
    got = read_warc(spark, man["warc"] + "/*.warc", strict=True)
    assert got.count() == len(caps)
