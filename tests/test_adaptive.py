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


# ---------------------------------------------------------------------------
# table-valued budgets through the crawl (CrawlConfig.host_budget_df)
# ---------------------------------------------------------------------------


def test_budget_table_matches_dict_budgets(spark, corpus_parquet, corpus_spec, tmp_path):
    """A (host, budget) DataFrame must produce the BIT-identical crawl a
    driver dict of the same budgets does — the planner seam cannot change
    semantics, only where the numbers come from."""
    from crawler_spark.datagen import default_seeds
    from crawler_spark.frontier import CrawlConfig, crawl

    seeds = [s["url"] for s in default_seeds(corpus_spec)]
    pages = spark.read.parquet(corpus_parquet)
    budgets = {f"h{i}.example.test": 2 + i % 3 for i in range(3)}

    via_dict = crawl(
        spark, pages, seeds,
        config=CrawlConfig(depth=2, host_budget=dict(budgets)),
        run_dir=str(tmp_path / "dict"),
    )
    tbl = spark.createDataFrame(
        list(budgets.items()), "host string, budget int"
    )
    via_table = crawl(
        spark, pages, seeds,
        config=CrawlConfig(depth=2, host_budget_df=tbl),
        run_dir=str(tmp_path / "table"),
    )
    a = [(r["seq"], r["url"]) for r in via_dict.pages(spark).orderBy("seq").collect()]
    b = [(r["seq"], r["url"]) for r in via_table.pages(spark).orderBy("seq").collect()]
    assert a == b and len(a) > 0


def test_budget_table_composes_with_dict_via_min(spark, corpus_parquet, corpus_spec, tmp_path):
    from crawler_spark.datagen import default_seeds
    from crawler_spark.frontier import CrawlConfig, crawl

    seeds = [s["url"] for s in default_seeds(corpus_spec)]
    pages = spark.read.parquet(corpus_parquet)
    # dict says 6 everywhere; the table caps one host at 1 — the table's
    # tighter cap must win for that host only
    tbl = spark.createDataFrame(
        [("h0.example.test", 1)], "host string, budget int"
    )
    res = crawl(
        spark, pages, seeds,
        config=CrawlConfig(depth=2, host_budget={"*": 6}, host_budget_df=tbl),
        run_dir=str(tmp_path / "mix"),
    )
    rows = res.pages(spark).collect()
    per_wave_h0 = {}
    for r in rows:
        if r["host"] == "h0.example.test":
            per_wave_h0[r["wave"]] = per_wave_h0.get(r["wave"], 0) + 1
    assert per_wave_h0 and all(v <= 1 for v in per_wave_h0.values())
    # deferred, not dropped: h0 pages still arrive across later waves
    assert sum(per_wave_h0.values()) > 1


def test_plan_cli_end_to_end(spark, tmp_path, monkeypatch):
    import sys

    from jobs import plan as plan_job

    log = spark.createDataFrame(
        [("a", 200, False, 1), ("a", 400, False, 2), ("b", 50, False, 3)],
        "host string, latency_ms long, is_error boolean, fetch_id long",
    )
    sig = spark.createDataFrame(
        [("a", 1.0), ("b", 3.0)], "host string, score double"
    )
    log_p, sig_p = str(tmp_path / "log"), str(tmp_path / "sig")
    out_p = str(tmp_path / "budgets")
    log.write.parquet(log_p)
    sig.write.parquet(sig_p)
    monkeypatch.setattr(sys, "argv", [
        "plan.py", "--fetch-log", log_p, "--signals", sig_p,
        "--total-budget", "100", "--floor", "1",
        "--wave-target-sec", "60", "--out", out_p,
    ])
    plan_job.main()
    got = {r["host"]: r["budget"]
           for r in spark.read.parquet(out_p).collect()}
    # caps: a -> median 200*2=400ms -> 150/wave; b -> clamp 100ms -> 600
    # shares: floor 1 + r=98 split 1:3 -> base 24/73, leftover 1 to 'a'
    # (remainder tie, host order) -> a=26, b=74
    # plan = min(cap, share)
    assert got["a"] == 26 and got["b"] == 74
