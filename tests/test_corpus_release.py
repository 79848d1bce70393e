"""One-command corpus release (crawler_spark.pipeline.corpus_release /
jobs/corpus_release.py): the full crawl -> curate -> assemble -> shards ->
stats -> data card -> layout composition emits a complete, internally
consistent release directory, committed by an atomic release.json.

The per-source stats table is additionally value-hashed against DuckDB
via the gate entry (``release_stats_docs``)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.datagen import CorpusSpec, corpus_spark_df, default_seeds
from crawler_spark.frontier.bfs import CrawlConfig
from crawler_spark.pipeline import corpus_release, release_stats


@pytest.fixture(scope="module")
def release_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("corpus_release")
    spec = CorpusSpec(n_pages=240, n_hosts=6, seed=7)
    corpus = corpus_spark_df(spark, spec)
    out_dir = str(base / "release")
    release = corpus_release(
        spark,
        corpus,
        [d["url"] for d in default_seeds(spec)[:4]],
        CrawlConfig(depth=3, max_pages=200, host_budget={"*": 80}),
        run_dir=str(base / "run"),
        out_dir=out_dir,
        token_budget=20_000,
        tokens_per_shard=2_000,
        name="release-test",
    )
    return out_dir, release


def test_release_json_is_the_commit_point(release_dir):
    out_dir, release = release_dir
    on_disk = json.loads(open(os.path.join(out_dir, "release.json")).read())
    assert on_disk == release
    assert set(release["tables"]) == {
        "training", "shards", "shard_manifest", "stats", "layout",
        "data_card",
    }
    for rel in ("training", "shards", "manifest", "stats", "layout"):
        assert os.path.exists(os.path.join(out_dir, rel)), rel


def test_release_counts_are_internally_consistent(spark, release_dir):
    out_dir, release = release_dir
    tr = spark.read.parquet(os.path.join(out_dir, "training"))
    assert tr.count() == release["docs"] > 0
    assert tr.agg(F.sum("n_tokens")).first()[0] == release["tokens"]
    assert release["tokens"] <= 20_000  # budget respected
    manifest = spark.read.parquet(os.path.join(out_dir, "manifest"))
    m = manifest.agg(
        F.count("*"), F.sum("n_docs"), F.sum("n_tokens")
    ).first()
    assert (int(m[0]), int(m[1]), int(m[2])) == (
        release["shards"], release["docs"], release["tokens"],
    )
    stats = spark.read.parquet(os.path.join(out_dir, "stats"))
    s = stats.agg(F.sum("n_docs"), F.sum("n_tokens")).first()
    assert (int(s[0]), int(s[1])) == (release["docs"], release["tokens"])
    # every shard the stats table claims exists in the manifest
    assert stats.agg(F.max("n_shards")).first()[0] <= release["shards"]


def test_release_shards_and_layout_hold_the_same_rows(spark, release_dir):
    out_dir, release = release_dir
    tr_ids = sorted(
        r[0] for r in spark.read.parquet(
            os.path.join(out_dir, "training")
        ).select("doc_id").collect()
    )
    shard_ids = sorted(
        r[0] for r in spark.read.parquet(
            os.path.join(out_dir, "shards")
        ).select("doc_id").collect()
    )
    layout_ids = sorted(
        r[0] for r in spark.read.parquet(
            os.path.join(out_dir, "layout")
        ).select("doc_id").collect()
    )
    assert tr_ids == shard_ids == layout_ids
    card = open(os.path.join(out_dir, "DATA_CARD.md")).read()
    assert card.startswith("# Data Card: release-test")
    assert len(card.encode()) == release["data_card_bytes"]


def test_release_stats_partition_invariant(spark):
    docs = spark.createDataFrame(
        [(i, f"src{i % 3}", 1 + i % 7, 0.5 + (i % 4) / 10.0, i % 5)
         for i in range(60)],
        "doc_id long, source string, n_tokens long, quality double, shard int",
    )
    a = sorted(map(tuple, release_stats(docs).collect()))
    b = sorted(map(tuple, release_stats(docs.repartition(7)).collect()))
    assert a == b
    assert sum(r[1] for r in a) == 60
