"""Recrawl scheduling: change-rate estimation, schedule bounds, cuckoo bridge."""

from __future__ import annotations

import math
from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from crawler_spark.frontier.recrawl import (
    change_stats,
    due_url_hashes,
    recrawl_schedule,
)

T0 = datetime(2025, 6, 1, tzinfo=timezone.utc)


def _history():
    """Four URLs with distinct churn profiles, fetched every 6h for 5 waves."""
    rows = []
    for i in range(5):
        ts = T0 + timedelta(hours=6 * i)
        rows.append(("https://hot.test/a", ts, "h%d" % i))        # changes every time
        rows.append(("https://warm.test/b", ts, "w%d" % (i // 2)))  # 2 changes
        rows.append(("https://cold.test/c", ts, "c0"))            # never changes
    rows.append(("https://new.test/d", T0, "n0"))                 # single fetch
    return rows


@pytest.fixture(scope="module")
def hist_df(spark):
    return spark.createDataFrame(
        _history(), "url string, warc_ts timestamp, content_hash string"
    )


def _rate(n_intervals: int, n_changes: int, span_sec: int) -> float:
    return round(
        -math.log((n_intervals - n_changes + 0.5) / (n_intervals + 0.5))
        / (span_sec / n_intervals),
        10,
    )


def test_change_stats_exact(spark, hist_df):
    got = {r["url"]: r.asDict() for r in change_stats(hist_df).collect()}
    span = 4 * 6 * 3600
    hot = got["https://hot.test/a"]
    assert (hot["n_fetches"], hot["n_changes"], hot["span_sec"]) == (5, 4, span)
    assert hot["change_rate"] == _rate(4, 4, span)
    warm = got["https://warm.test/b"]
    assert warm["n_changes"] == 2
    assert warm["change_rate"] == _rate(4, 2, span)
    cold = got["https://cold.test/c"]
    assert cold["n_changes"] == 0 and cold["change_rate"] == 0.0
    new = got["https://new.test/d"]
    assert new["n_fetches"] == 1 and new["change_rate"] is None
    assert hot["change_rate"] > warm["change_rate"] > cold["change_rate"]


def test_schedule_bounds_and_ordering(spark, hist_df):
    sched = {
        r["url"]: r.asDict()
        for r in recrawl_schedule(
            hist_df, min_interval_sec=3600, max_interval_sec=86400 * 30,
            target_changes=0.5,
        ).collect()
    }
    # never-changed and single-fetch URLs sit at the max interval
    assert sched["https://cold.test/c"]["interval_sec"] == 86400 * 30
    assert sched["https://new.test/d"]["interval_sec"] == 86400 * 30
    # hot page re-fetches sooner than warm
    assert (
        sched["https://hot.test/a"]["interval_sec"]
        < sched["https://warm.test/b"]["interval_sec"]
    )
    assert sched["https://hot.test/a"]["interval_sec"] >= 3600
    for r in sched.values():
        want = r["last_fetch_ts"] + timedelta(seconds=r["interval_sec"])
        assert r["next_fetch_ts"] == want


def test_min_interval_clamp(spark):
    """A page changing every second pins at min_interval, not below."""
    rows = [
        ("u", T0 + timedelta(seconds=i), "h%d" % i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, content_hash string")
    r = recrawl_schedule(df, min_interval_sec=3600).collect()[0]
    assert r["interval_sec"] == 3600


def test_due_urls_and_cuckoo_lifecycle(spark, hist_df):
    """due URLs delete from the cuckoo sidecar and probe as new again."""
    from crawler_spark.frontier.cuckoo import (
        CuckooConfig,
        build_tables,
        delete_hashes,
        split_by_cuckoo,
    )

    sched = recrawl_schedule(hist_df, min_interval_sec=3600)
    # pick a clock where only the hot page is due
    hot_next = {
        r["url"]: r["next_fetch_ts"] for r in sched.collect()
    }["https://hot.test/a"]
    due = due_url_hashes(sched, hot_next)
    assert [r["url"] for r in due.collect()] == ["https://hot.test/a"]

    urls = hist_df.select("url").distinct()
    hashes = urls.select(F.xxhash64("url").alias("url_hash"))
    cfg = CuckooConfig(n_buckets=64, n_shards=2)
    tables = build_tables(hashes, cfg)
    pruned = delete_hashes(tables, due.select("url_hash"), cfg)
    new, suspect = split_by_cuckoo(hashes, pruned, cfg)
    assert [r["url_hash"] for r in new.collect()] == [
        r["url_hash"] for r in due.collect()
    ]
    assert suspect.count() == 3


def test_partition_invariance_and_plan(spark, hist_df):
    a = sorted(map(tuple, change_stats(hist_df).collect()))
    b = sorted(map(tuple, change_stats(hist_df.repartition(7)).collect()))
    assert a == b
    plan = (
        recrawl_schedule(hist_df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "mapInPandas" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# latest-wins snapshot view
# ---------------------------------------------------------------------------

from crawler_spark.frontier.recrawl import latest_snapshot


def test_latest_snapshot_picks_newest_and_counts(spark, hist_df):
    got = {r["url"]: r for r in latest_snapshot(hist_df).collect()}
    assert len(got) == 4  # one row per URL
    last = T0 + timedelta(hours=24)
    hot = got["https://hot.test/a"]
    assert (hot["content_hash"], hot["n_fetches"], hot["n_changes"]) == ("h4", 5, 4)
    assert hot["warc_ts"].replace(tzinfo=timezone.utc) == last
    assert hot["first_fetch_ts"].replace(tzinfo=timezone.utc) == T0
    warm = got["https://warm.test/b"]
    assert (warm["content_hash"], warm["n_changes"]) == ("w2", 2)
    cold = got["https://cold.test/c"]
    assert (cold["content_hash"], cold["n_fetches"], cold["n_changes"]) == ("c0", 5, 0)
    new = got["https://new.test/d"]
    assert (new["content_hash"], new["n_fetches"], new["n_changes"]) == ("n0", 1, 0)


def test_latest_snapshot_preserves_extra_columns(spark, hist_df):
    h = hist_df.withColumn("html", F.concat(F.lit("<p>"), F.col("content_hash")))
    got = {r["url"]: r["html"] for r in latest_snapshot(h).collect()}
    assert got["https://hot.test/a"] == "<p>h4"


def test_latest_snapshot_tiebreak_on_equal_ts(spark):
    # two records at the same instant: hash desc wins, deterministically
    rows = [("u", T0, "aaa"), ("u", T0, "zzz")]
    h = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, content_hash string"
    )
    got = latest_snapshot(h).collect()
    assert len(got) == 1 and got[0]["content_hash"] == "zzz"


def test_latest_snapshot_partition_invariant(spark, hist_df):
    runs = [
        sorted(
            (r["url"], r["content_hash"], r["n_fetches"], r["n_changes"])
            for r in latest_snapshot(hist_df.repartition(n)).collect()
        )
        for n in (1, 7)
    ]
    assert runs[0] == runs[1]


def test_latest_snapshot_single_exchange(spark, hist_df):
    plan = (
        latest_snapshot(hist_df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


# ---------------------------------------------------------------------------
# streaming latest-wins snapshot
# ---------------------------------------------------------------------------


def test_snapshot_stream_matches_batch_latest_snapshot(spark, tmp_path):
    """snapshot_stream + snapshot_view over two event-time-ordered drops
    reconstructs latest_snapshot over the concatenated history exactly,
    and a checkpoint-resumed second run drains only the new file."""
    from crawler_spark.streaming.ingest import snapshot_stream, snapshot_view

    hist = spark.createDataFrame(
        _history(), "url string, warc_ts timestamp, content_hash string"
    )
    # wave 1 = fetches before T0+12h, wave 2 = the rest (per-URL time order)
    cut = T0 + timedelta(hours=12)
    w1 = hist.filter(F.col("warc_ts") < cut)
    w2 = hist.filter(F.col("warc_ts") >= cut)
    hist_dir = str(tmp_path / "hist")
    w1.coalesce(1).write.mode("append").parquet(hist_dir)

    kw = dict(
        store_dir=str(tmp_path / "store"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q = snapshot_stream(spark, hist_dir, **kw)
    q.awaitTermination()
    w2.coalesce(1).write.mode("append").parquet(hist_dir)
    q = snapshot_stream(spark, hist_dir, **kw)
    q.awaitTermination()

    got = sorted(
        (
            r["url"], r["content_hash"], r["n_fetches"], r["n_changes"],
            r["warc_ts"], r["first_fetch_ts"],
        )
        for r in snapshot_view(spark, kw["store_dir"]).collect()
    )
    exp = sorted(
        (
            r["url"], r["content_hash"], r["n_fetches"], r["n_changes"],
            r["warc_ts"], r["first_fetch_ts"],
        )
        for r in latest_snapshot(hist).collect()
    )
    assert got == exp
    # one summary row per (url, batch): urls in both waves have 2 segments
    store = spark.read.parquet(kw["store_dir"])
    assert store.count() == store.select("url", "batch_id").distinct().count()
    assert store.select("batch_id").distinct().count() == 2


# ---------------------------------------------------------------------------
# snapshot_diffs: line-level change magnitude between consecutive fetches
# ---------------------------------------------------------------------------

from crawler_spark.frontier.recrawl import snapshot_diffs

T0 = datetime(2025, 1, 1, tzinfo=timezone.utc)


def _dt(h):
    return T0 + timedelta(hours=h)


def test_snapshot_diffs_hand_case(spark):
    rows = [
        # u1: three snapshots — drop a line, add two, then unchanged
        ("u1", _dt(0), "a\nb\nc"),
        ("u1", _dt(1), "b\nc\nd\ne"),
        ("u1", _dt(2), "b\nc\nd\ne"),
        # u2: single fetch -> null diff columns
        ("u2", _dt(0), "x"),
        # u3: repeats and empty lines are set-collapsed
        ("u3", _dt(0), "a\n\na\nb"),
        ("u3", _dt(1), "b\na"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    got = {(r["url"], r["ts"]): r for r in snapshot_diffs(df).collect()}

    r = got[("u1", _dt(1).replace(tzinfo=None))]
    assert (r["n_prev_lines"], r["n_lines"], r["n_common"]) == (3, 4, 2)
    assert (r["n_added"], r["n_removed"]) == (2, 1)
    assert r["line_jaccard"] == round(2 / 5, 6)
    assert r["change_frac"] == round(1 - 2 / 5, 6)

    r = got[("u1", _dt(2).replace(tzinfo=None))]
    assert r["line_jaccard"] == 1.0 and r["change_frac"] == 0.0

    r = got[("u2", _dt(0).replace(tzinfo=None))]
    assert r["prev_ts"] is None and r["line_jaccard"] is None
    assert r["n_lines"] == 1

    r = got[("u3", _dt(1).replace(tzinfo=None))]
    # {a,b} vs {b,a}: identical as sets
    assert (r["n_prev_lines"], r["n_lines"], r["n_common"]) == (2, 2, 2)
    assert r["change_frac"] == 0.0


def test_snapshot_diffs_empty_pair_is_unchanged(spark):
    rows = [("u", _dt(0), ""), ("u", _dt(1), "\n\n")]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    got = sorted(snapshot_diffs(df).collect(), key=lambda r: r["ts"])
    r = got[1]
    assert (r["n_lines"], r["n_prev_lines"], r["n_common"]) == (0, 0, 0)
    assert r["line_jaccard"] == 1.0 and r["change_frac"] == 0.0


def test_snapshot_diffs_partition_invariance_and_plan(spark):
    rows = [
        (f"u{i % 4}", _dt(i), "\n".join(f"l{j}" for j in range(i % 6 + 1)))
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    a = sorted(map(tuple, snapshot_diffs(df.repartition(1)).collect()))
    b = sorted(map(tuple, snapshot_diffs(df.repartition(9)).collect()))
    assert a == b

    out = snapshot_diffs(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan  # one window, no self-join
    assert plan.count("Exchange") <= 2  # url hash partitioning (+AQE read)
