"""Feedback-driven frontier planning (crawler_spark/frontier/adaptive.py):
adaptive per-host politeness and exact largest-remainder budget
apportionment."""

import pytest

from crawler_spark.frontier.adaptive import (
    adaptive_crawl_delay,
    adaptive_host_budgets,
    apportion_budget,
)


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "host string, latency_ms long, is_error boolean, fetch_id long"
    )


def test_delay_median_pick_and_multiplier(spark):
    # latencies 100..500: median rank = (5-1)*1//2 + 1 = 3 -> 300; x2 = 600
    log = _log(
        spark,
        [("a", 100 * i, False, i) for i in range(1, 6)],
    )
    out = adaptive_crawl_delay(log).collect()[0]
    assert out["base_ms"] == 300
    assert out["delay_ms"] == 600
    assert out["n_fetches"] == 5 and out["n_errors"] == 0


def test_delay_clamps_both_ends(spark):
    log = _log(
        spark,
        [("fast", 1, False, 1), ("slow", 60_000, False, 2)],
    )
    out = {r["host"]: r["delay_ms"] for r in adaptive_crawl_delay(log).collect()}
    assert out["fast"] == 100      # min clamp
    assert out["slow"] == 30_000   # max clamp


def test_delay_error_backoff_tiers(spark):
    # 10% errors -> x2; 25% errors -> x4; clamp still binds afterwards
    rows = [("ten", 100, i == 0, i) for i in range(10)]
    rows += [("quarter", 100, i < 3, 100 + i) for i in range(12)]
    rows += [("clean", 100, False, 200 + i) for i in range(10)]
    out = {r["host"]: r for r in adaptive_crawl_delay(_log(spark, rows)).collect()}
    assert out["clean"]["delay_ms"] == 200
    assert out["ten"]["delay_ms"] == 400
    assert out["quarter"]["delay_ms"] == 800


def test_budget_adapter_never_starves(spark):
    log = _log(spark, [("s", 60_000, False, 1), ("f", 50, False, 2)])
    budgets = {
        r["host"]: r["budget"]
        for r in adaptive_host_budgets(
            adaptive_crawl_delay(log), wave_target_sec=60
        ).collect()
    }
    assert budgets["s"] == 2      # 60000 div 30000
    assert budgets["f"] == 600    # 60000 div 100
    tiny = adaptive_host_budgets(
        adaptive_crawl_delay(log), wave_target_sec=1
    ).collect()
    assert min(r["budget"] for r in tiny) >= 1


def test_apportion_exact_sum_and_floor(spark):
    scores = spark.createDataFrame(
        [("a", 5.0), ("b", 3.0), ("c", 1.0), ("d", 0.0)],
        "host string, score double",
    )
    out = {r["host"]: r["budget"] for r in
           apportion_budget(scores, total_budget=100, floor=2).collect()}
    assert sum(out.values()) == 100
    assert all(v >= 2 for v in out.values())
    # proportional ordering preserved
    assert out["a"] > out["b"] > out["c"] > out["d"] == 2


def test_apportion_prime_total_remainders_decide(spark):
    scores = spark.createDataFrame(
        [(f"h{i}", 1.0) for i in range(7)], "host string, score double"
    )
    out = {r["host"]: r["budget"] for r in
           apportion_budget(scores, total_budget=23, floor=0).collect()}
    assert sum(out.values()) == 23
    # 23 = 7*3 + 2: equal remainders -> host-order tie-break gives the
    # two extra slots to h0, h1
    assert out["h0"] == out["h1"] == 4
    assert all(out[f"h{i}"] == 3 for i in range(2, 7))


def test_apportion_all_zero_scores(spark):
    scores = spark.createDataFrame(
        [("a", 0.0), ("b", 0.0), ("c", 0.0)], "host string, score double"
    )
    out = {r["host"]: r["budget"] for r in
           apportion_budget(scores, total_budget=10, floor=1).collect()}
    # t == 0: equal split of r=7 -> base 2 each, 1 leftover to host order
    assert sum(out.values()) == 10
    assert out["a"] == 4 and out["b"] == 3 and out["c"] == 3


def test_apportion_partition_invariance(spark):
    scores = spark.createDataFrame(
        [(f"h{i}", float((i * 13) % 7) + 0.5) for i in range(50)],
        "host string, score double",
    )
    one = sorted(apportion_budget(scores, 1009, floor=1).collect())
    many = sorted(
        apportion_budget(scores.repartition(11), 1009, floor=1).collect()
    )
    assert one == many
    assert sum(r["budget"] for r in one) == 1009


def test_apportion_raises_when_floor_exceeds_total(spark):
    scores = spark.createDataFrame(
        [(f"h{i}", 1.0) for i in range(10)], "host string, score double"
    )
    with pytest.raises(ValueError, match="cannot cover floor"):
        apportion_budget(scores, total_budget=10, floor=2).collect()


def test_apportion_huge_scores_rescale_keeps_exact_sum(spark):
    # char-mass-scale scores: score_q ~ 1e15 each; r * score_q would wrap
    # int64 without the rescale, breaking the exact-sum contract
    scores = spark.createDataFrame(
        [("a", 3.0e9), ("b", 2.0e9), ("c", 1.0e9)],
        "host string, score double",
    )
    out = {r["host"]: r["budget"] for r in
           apportion_budget(scores, total_budget=1_000_003, floor=1).collect()}
    assert sum(out.values()) == 1_000_003
    assert out["a"] > out["b"] > out["c"] > 0
    # proportions survive the rescale (within one slot of the exact share)
    assert abs(out["a"] - 1_000_000 * 3 / 6) <= 2
