"""OPIC (frontier/opic.py): exact python replay of the cash arithmetic,
conservation, the wave_observer seam, and the crawl-coupled end-to-end
run (reorder-without-drop, bit-deterministic)."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.frontier.opic import CASH_ONE, Opic, opic_init, opic_step


def _xx(spark, s):
    return spark.createDataFrame([(s,)], "url string").select(
        F.xxhash64("url")
    ).collect()[0][0]


def py_step(state, pages):
    """state: {h: [cash, history]}; pages: [(url_hash, [target_hash, ...])]"""
    out = {h: list(v) for h, v in state.items()}
    for h, links in pages:
        c = out.get(h, [0, 0])[0]
        out.setdefault(h, [0, 0])
        out[h][1] += c
        if links:
            share = c // len(links)
            out[h][0] = c % len(links) - c + out[h][0]
            for t in links:
                out.setdefault(t, [0, 0])[0] += share
        else:
            out[h][0] -= c
    return {h: v for h, v in out.items() if v != [0, 0]}


class TestStepReplay:
    def test_two_steps_match_python(self, spark):
        urls = [f"https://h.test/{i}" for i in range(6)]
        H = {u: _xx(spark, u) for u in urls}
        state = opic_init(spark, urls[:2])
        pystate = {H[urls[0]]: [CASH_ONE // 2, 0], H[urls[1]]: [CASH_ONE // 2, 0]}

        wave0 = [(urls[0], [urls[2], urls[3], urls[4]]), (urls[1], [urls[2]])]
        wave1 = [(urls[2], [urls[5]]), (urls[3], None), (urls[4], [urls[0]])]
        for wave in (wave0, wave1):
            pages = spark.createDataFrame(
                wave, "url string, links array<string>"
            )
            state = opic_step(state, pages)
            pystate = py_step(
                pystate,
                [(H[u], [H[t] for t in ls] if ls else None) for u, ls in wave],
            )
            got = {
                r["url_hash"]: [r["cash"], r["history"]]
                for r in state.collect()
            }
            assert got == pystate

    def test_conservation_no_dangling(self, spark):
        urls = ["https://a.test/0", "https://a.test/1"]
        state = opic_init(spark, urls)
        pages = spark.createDataFrame(
            [(urls[0], [urls[1]]), (urls[1], [urls[0]])],
            "url string, links array<string>",
        )
        for _ in range(3):
            state = opic_step(state, pages)
            tot = state.agg(F.sum("cash")).collect()[0][0]
            assert tot == 2 * (CASH_ONE // 2)

    def test_dangling_retires_cash_banks_history(self, spark):
        u = "https://a.test/only"
        state = opic_init(spark, [u])
        pages = spark.createDataFrame([(u, None)], "url string, links array<string>")
        got = opic_step(state, pages).collect()
        assert len(got) == 1
        assert got[0]["cash"] == 0 and got[0]["history"] == CASH_ONE

    def test_partition_invariance(self, spark):
        urls = [f"https://p.test/{i}" for i in range(8)]
        pages_rows = [(urls[i], [urls[(i + 1) % 8], urls[(i + 3) % 8]]) for i in range(8)]
        base = None
        for n in (1, 5):
            state = opic_init(spark, urls[:3])
            pages = spark.createDataFrame(
                pages_rows, "url string, links array<string>"
            ).repartition(n)
            got = sorted(map(tuple, opic_step(state, pages).collect()))
            if base is None:
                base = got
            assert got == base


def test_crawl_with_opic_end_to_end(spark, corpus_parquet, corpus_spec, tmp_path):
    from crawler_spark.datagen import default_seeds
    from crawler_spark.frontier import CrawlConfig, crawl

    corpus = spark.read.parquet(corpus_parquet)
    seeds = [default_seeds(corpus_spec)[0]["url"]]
    base = crawl(
        spark, corpus, seeds, CrawlConfig(depth=2),
        run_dir=str(tmp_path / "plain"),
    ).pages(spark)
    base_urls = {r["url"] for r in base.select("url").collect()}

    def run(d):
        opic = Opic(spark, seeds)
        out = crawl(
            spark, corpus, seeds,
            CrawlConfig(depth=2, wave_observer=opic.observer,
                        priority_scorer=opic.scorer),
            run_dir=str(tmp_path / d),
        ).pages(spark)
        return opic, out

    opic, out = run("opic1")
    rows = out.select("seq", "url").orderBy("seq").collect()
    # reorder-without-drop: same reachable set as the default crawl
    assert {r["url"] for r in rows} == base_urls
    # the observer ran once per wave
    assert opic.waves_observed == sorted(set(opic.waves_observed))
    assert len(opic.waves_observed) >= 2
    # importance accumulated: every crawled page banked history
    hist = {r["url_hash"]: r["history"] for r in opic.state.collect()}
    assert any(v > 0 for v in hist.values())
    # bit-deterministic: a rerun gives the identical visit order
    _, out2 = run("opic2")
    assert [tuple(r) for r in rows] == [
        tuple(r) for r in out2.select("seq", "url").orderBy("seq").collect()
    ]


def test_wave_observer_seam_counts_and_default_off(spark, corpus_parquet, corpus_spec, tmp_path):
    from crawler_spark.datagen import default_seeds
    from crawler_spark.frontier import CrawlConfig, crawl

    corpus = spark.read.parquet(corpus_parquet)
    seeds = [default_seeds(corpus_spec)[0]["url"]]
    calls = []
    crawl(
        spark, corpus, seeds,
        CrawlConfig(depth=1, wave_observer=lambda w, df: calls.append((w, df.count()))),
        run_dir=str(tmp_path / "obs"),
    )
    assert [w for w, _ in calls] == sorted({w for w, _ in calls})
    assert all(n > 0 for _, n in calls) and len(calls) >= 2


def test_opic_host_signal_feeds_composite_blend(spark, corpus_parquet, corpus_spec, tmp_path):
    """OPIC history -> (host, score) signal -> blend_host_signals: the
    exploit term of a two-signal composite, end to end."""
    from crawler_spark.datagen import default_seeds
    from crawler_spark.frontier import CrawlConfig, crawl
    from crawler_spark.frontier.opic import Opic, opic_host_signal
    from crawler_spark.operators.priority import blend_host_signals

    corpus = spark.read.parquet(corpus_parquet)
    seeds = [default_seeds(corpus_spec)[0]["url"]]
    opic = Opic(spark, seeds)
    res = crawl(
        spark, corpus, seeds,
        CrawlConfig(depth=2, wave_observer=opic.observer,
                    priority_scorer=opic.scorer),
        run_dir=str(tmp_path / "hs"),
    )
    sig = opic_host_signal(opic.state, res.seen(spark))
    rows = {r["host"]: r["score"] for r in sig.collect()}
    assert rows and max(rows.values()) == 1.0
    assert all(0 < v <= 1.0 for v in rows.values())
    flat = spark.createDataFrame(
        [(h, 0.5) for h in rows], "host string, score double"
    )
    blended = blend_host_signals({"opic": (sig, 2.0), "flat": (flat, 1.0)})
    got = {r["host"]: r["score"] for r in blended.collect()}
    for h, v in rows.items():
        assert abs(got[h] - (2.0 * v + 0.5) / 3.0) < 1e-9


def test_replay_rebuilds_state_for_resume(spark, corpus_parquet, corpus_spec, tmp_path):
    """Opic.replay over a committed run-dir reproduces the live observer's
    state bit-for-bit — the documented resume path."""
    from crawler_spark.datagen import default_seeds
    from crawler_spark.frontier import CrawlConfig, crawl
    from crawler_spark.frontier.opic import Opic

    corpus = spark.read.parquet(corpus_parquet)
    seeds = [default_seeds(corpus_spec)[0]["url"]]
    live = Opic(spark, seeds)
    crawl(
        spark, corpus, seeds,
        CrawlConfig(depth=2, wave_observer=live.observer,
                    priority_scorer=live.scorer),
        run_dir=str(tmp_path / "rp"),
    )
    rebuilt = Opic(spark, seeds)
    rebuilt.replay(spark, str(tmp_path / "rp"))
    a = sorted(map(tuple, live.state.collect()))
    b = sorted(map(tuple, rebuilt.state.collect()))
    assert a == b and len(a) > 0
    assert rebuilt.waves_observed == live.waves_observed
