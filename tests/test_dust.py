"""DUST rule mining (frontier/dust.py): pure-Python replay, planted
refutation semantics, apply-pass tie-breaks, partition invariance, and
plan-shape pins (JVM-only extraction, broadcast apply)."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from crawler_spark.frontier.dust import (
    apply_dust_rules,
    candidate_rules,
    dup_url_pairs,
    mine_dust_rules,
    url_content_keys,
)


def _lcp(a, b):
    n = 0
    for x, y in zip(a, b):
        if x != y:
            break
        n += 1
    return n


def py_mine(url_keys, min_support=2, max_df=50):
    """Reference miner: envelope rules + support + refutation counts."""
    buckets = {}
    for u, k in url_keys:
        buckets.setdefault(k, set()).add(u)
    support = Counter()
    for us in buckets.values():
        if len(us) > max_df:
            continue
        us = sorted(us)
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                u1, u2 = us[i], us[j]
                p = _lcp(u1, u2)
                r1, r2 = u1[p:], u2[p:]
                s = _lcp(r1[::-1], r2[::-1])
                a, b = r1[: len(r1) - s], r2[: len(r2) - s]
                if (len(b), b) > (len(a), a):
                    a, b = b, a
                support[(a, b)] += 1
    kept = {r: c for r, c in support.items() if c >= min_support}
    key = dict(url_keys)
    out = {}
    for (a, b), c in kept.items():
        ref = 0
        for u, k in key.items():
            if u.count(a) == 1:
                rw = u.replace(a, b)
                if rw in key and key[rw] != k:
                    ref += 1
        out[(a, b)] = (c, ref)
    return out


CORPUS = []
for g in range(8):
    CORPUS += [
        (f"https://site.test/a/{g}", g),
        (f"https://site.test/a/{g}/index.html", g),
        (f"https://m.site.test/a/{g}", g),
        (f"https://site.test/b/{g}", 5000 + g),
        (f"https://site.test/c/{g}", 5000 + g),
        (f"https://site.test/c/x{g}", 6000 + g),
        (f"https://site.test/b/x{g}", 7000 + g),
        (f"https://other.test/p/{g}?print=1", 8000 + g),
        (f"https://other.test/p/{g}", 8000 + g),
        (f"https://unique.test/q/{g}", 10000 + g),
    ]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "url string, content_key long")


def test_mine_matches_python_replay(spark, corpus_df):
    got = {
        (r["alpha"], r["beta"]): (r["support"], r["refutations"])
        for r in mine_dust_rules(corpus_df, key_col="content_key").collect()
    }
    assert got == py_mine(CORPUS)


def test_planted_rules_and_refutation(spark, corpus_df):
    rules = {
        (r["alpha"], r["beta"]): r
        for r in mine_dust_rules(corpus_df, key_col="content_key").collect()
    }
    assert rules[("/index.html", "")]["valid"]
    assert rules[("m.", "")]["valid"]
    assert rules[("?print=1", "")]["valid"]
    # /c/x{g} rewrites to the existing, different-content /b/x{g}
    assert not rules[("c", "b")]["valid"]
    assert rules[("c", "b")]["refutations"] == 8


def test_apply_collapses_aliases(spark, corpus_df):
    valid = mine_dust_rules(corpus_df, key_col="content_key").filter("valid")
    out = apply_dust_rules(corpus_df.select("url"), valid)
    rows = {r["url"]: r["canon_url"] for r in out.collect()}
    assert rows["https://site.test/a/3/index.html"] == "https://site.test/a/3"
    assert rows["https://m.site.test/a/3"] == "https://site.test/a/3"
    assert rows["https://other.test/p/3?print=1"] == "https://other.test/p/3"
    # refuted rule never applied
    assert rows["https://site.test/c/x3"] == "https://site.test/c/x3"
    assert rows["https://site.test/c/3"] == "https://site.test/c/3"
    assert len(rows) == len(CORPUS)


def test_apply_tie_breaks(spark):
    urls = spark.createDataFrame([("xaay",)], "url string")

    def best(rules):
        df = spark.createDataFrame(rules, "alpha string, beta string, support long")
        return apply_dust_rules(urls, df).collect()[0]["canon_url"]

    # support dominates
    assert best([("aa", "b", 9), ("aa", "", 5)]) == "xby"
    # equal support: more shortening wins
    assert best([("aa", "b", 5), ("aa", "", 5)]) == "xy"
    # equal support + shortening: lexicographic (alpha, beta)
    assert best([("aa", "b", 5), ("aa", "c", 5)]) == "xby"


def test_apply_no_rules_passthrough(spark, corpus_df):
    empty = spark.createDataFrame([], "alpha string, beta string, support long")
    out = apply_dust_rules(corpus_df.select("url"), empty)
    assert all(r["url"] == r["canon_url"] for r in out.collect())


def test_max_df_drops_hot_buckets(spark):
    rows = [(f"https://hot.test/{i}", 1) for i in range(12)]
    rows += [("https://a.test/p", 2), ("https://a.test/p/index.html", 2)]
    df = spark.createDataFrame(rows, "url string, content_key long")
    uk = url_content_keys(df, key_col="content_key")
    pairs = dup_url_pairs(uk, max_df=10)
    # the 12-url bucket is dropped entirely; only the pair from bucket 2 remains
    assert pairs.count() == 1


def test_partition_invariance(spark, corpus_df):
    base = sorted(
        map(tuple, mine_dust_rules(corpus_df, key_col="content_key").collect())
    )
    for n in (1, 7):
        got = sorted(
            map(
                tuple,
                mine_dust_rules(
                    corpus_df.repartition(n), key_col="content_key"
                ).collect(),
            )
        )
        assert got == base


def test_plan_shapes(spark, corpus_df):
    uk = url_content_keys(corpus_df, key_col="content_key")
    plan = candidate_rules(dup_url_pairs(uk))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rules = spark.createDataFrame(
        [("/index.html", "", 2)], "alpha string, beta string, support long"
    )
    aplan = (
        apply_dust_rules(corpus_df.select("url"), rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in aplan
    assert "BatchEvalPython" not in aplan and "ArrowEvalPython" not in aplan


def test_url_content_keys_min_wins(spark):
    df = spark.createDataFrame(
        [("u", 5), ("u", 3), ("v", 9)], "url string, content_key long"
    )
    got = {
        r["url"]: r["content_key"]
        for r in url_content_keys(df, key_col="content_key").collect()
    }
    assert got == {"u": 3, "v": 9}


class TestUrlRewriterSeam:
    def _rules(self, spark, rows):
        return spark.createDataFrame(
            rows, "alpha string, beta string, support long"
        )

    def test_rewrites_and_recomputes_host(self, spark, corpus_df):
        from crawler_spark.frontier.dust import dust_url_rewriter, mine_dust_rules

        valid = mine_dust_rules(corpus_df, key_col="content_key").filter("valid")
        rw = dust_url_rewriter(valid)
        cand = spark.createDataFrame(
            [
                ("https://m.site.test/a/3", "m.site.test"),
                ("https://site.test/a/9/index.html", "site.test"),
                ("https://site.test/c/x1", "site.test"),
            ],
            "url string, host string",
        )
        got = {r["url"]: r["host"] for r in rw(cand).collect()}
        assert got == {
            "https://site.test/a/3": "site.test",
            "https://site.test/a/9": "site.test",
            "https://site.test/c/x1": "site.test",  # refuted rule never compiled
        }

    def test_preference_matches_apply(self, spark):
        from crawler_spark.frontier.dust import apply_dust_rules, dust_url_rewriter

        rules = self._rules(
            spark, [("aa", "b", 9), ("aa", "", 5), ("xa", "z", 9)]
        )
        urls = spark.createDataFrame(
            [("https://h.test/xaay",), ("https://h.test/qaaq",)], "url string"
        )
        via_apply = {
            r["url"]: r["canon_url"]
            for r in apply_dust_rules(urls, rules).collect()
        }
        cand = urls.withColumn("host", F.lit("h.test"))
        got = {r["url"] for r in dust_url_rewriter(rules)(cand).collect()}
        assert got == set(via_apply.values())

    def test_empty_rules_identity(self, spark, corpus_df):
        from crawler_spark.frontier.dust import dust_url_rewriter

        empty = self._rules(spark, [])
        cand = corpus_df.select("url", F.lit("h").alias("host"))
        assert dust_url_rewriter(empty)(cand) is cand

    def test_max_rules_caps_compiled_set(self, spark):
        from crawler_spark.frontier.dust import dust_url_rewriter

        rules = self._rules(
            spark, [("r1", "", 9), ("r2", "", 5)]
        )
        rw = dust_url_rewriter(rules, max_rules=1)
        cand = spark.createDataFrame(
            [("https://h.test/r1", "h.test"), ("https://h.test/r2", "h.test")],
            "url string, host string",
        )
        got = {r["url"] for r in rw(cand).collect()}
        # only the top-support rule survives the cap
        assert got == {"https://h.test/", "https://h.test/r2"}


def test_crawl_dust_rewriter_collapses_aliases(
    spark, corpus_parquet, corpus_spec, tmp_path
):
    """End-to-end: mined-rule rewriter plugged into CrawlConfig.url_rewriter
    makes the crawl fetch the canonical URL instead of the alias."""
    from urllib.parse import urlparse

    from crawler_spark.core import extract_links, parse_html
    from crawler_spark.datagen import default_seeds
    from crawler_spark.frontier import CrawlConfig, crawl
    from crawler_spark.frontier.dust import dust_url_rewriter

    pages = spark.read.parquet(corpus_parquet)
    seed = default_seeds(corpus_spec)[0]["url"]
    seed_host = urlparse(seed).netloc
    seed_row = pages.filter(pages["url"] == seed).first()
    links = extract_links(parse_html(bytes(seed_row["html"])), seed)
    same_host = [u for u in links if urlparse(u).netloc == seed_host and u != seed]
    alias = same_host[0]
    terminal = (
        pages.filter(
            pages["url"].startswith(f"https://{seed_host}/")
            & ~pages["url"].isin(same_host + [seed])
        )
        .orderBy("url")
        .first()["url"]
    )
    # envelope rule alias -> terminal, exactly as the miner would emit it
    p = 0
    while p < min(len(alias), len(terminal)) and alias[p] == terminal[p]:
        p += 1
    r1, r2 = alias[p:], terminal[p:]
    s = 0
    while s < min(len(r1), len(r2)) and r1[len(r1) - 1 - s] == r2[len(r2) - 1 - s]:
        s += 1
    rules = spark.createDataFrame(
        [(r1[: len(r1) - s], r2[: len(r2) - s], 3)],
        "alpha string, beta string, support long",
    )
    out = crawl(
        spark,
        pages,
        [seed],
        config=CrawlConfig(url_rewriter=dust_url_rewriter(rules), depth=1, max_pages=20),
        run_dir=str(tmp_path / "dust_rw"),
    ).pages(spark)
    urls = {r["url"] for r in out.collect()}
    assert alias not in urls and terminal in urls


# --- duplication-aware dedup counts (operators/dedup.exact_dedup_counts) ---
# (lives here rather than test_pipeline_ops to avoid re-collecting that
# module's session fixtures for one small family)


def test_exact_dedup_counts_survivor_and_weights(spark):
    from crawler_spark.operators.dedup import exact_dedup, exact_dedup_counts
    from crawler_spark.operators.sampling import weighted_sample

    rows = [(i, "popular page body") for i in range(5)]
    rows += [(10, "rare page body"), (11, "another rare body")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r["n_copies"] for r in exact_dedup_counts(df).collect()}
    assert got == {0: 5, 10: 1, 11: 1}
    # same survivors as the plain operator
    plain = {r["doc_id"] for r in exact_dedup(df).collect()}
    assert set(got) == plain
    # copy count feeds the deterministic weighted sampler directly
    surv = exact_dedup_counts(df).withColumn(
        "w", F.col("n_copies").cast("double")
    )
    top1 = weighted_sample(surv, 1, "w").collect()
    assert len(top1) == 1  # heavy weight dominates in expectation only —
    # determinism (not distribution) is the contract being pinned here
    rerun = weighted_sample(surv, 1, "w").collect()
    assert [tuple(r) for r in top1] == [tuple(r) for r in rerun]


def test_exact_dedup_counts_partition_invariance(spark):
    from crawler_spark.operators.dedup import exact_dedup_counts

    rows = [(i, f"body {i % 4}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    base = sorted(map(tuple, exact_dedup_counts(df.coalesce(1)).collect()))
    alt = sorted(map(tuple, exact_dedup_counts(df.repartition(7)).collect()))
    assert base == alt and len(base) == 4
    assert all(r[-1] == 5 for r in base)


def test_rules_never_fire_on_multi_occurrence_urls(spark):
    """alpha occurring more than once: the rule does not apply (no
    replace-all corruption), in the apply pass, the rewriter, AND the
    refutation instance definition."""
    from crawler_spark.frontier.dust import (
        apply_dust_rules,
        dust_url_rewriter,
        refutation_counts,
    )

    rules = spark.createDataFrame(
        [("m.", "", 5)], "alpha string, beta string, support long"
    )
    urls = spark.createDataFrame(
        [("https://m.site.test/m.video.html",), ("https://m.site.test/a",)],
        "url string",
    )
    got = {r["url"]: r["canon_url"] for r in apply_dust_rules(urls, rules).collect()}
    assert got == {
        "https://m.site.test/m.video.html": "https://m.site.test/m.video.html",
        "https://m.site.test/a": "https://site.test/a",
    }
    rw = dust_url_rewriter(rules)
    cand = urls.withColumn("host", F.lit("m.site.test"))
    got2 = {r["url"] for r in rw(cand).collect()}
    assert got2 == {"https://m.site.test/m.video.html", "https://site.test/a"}
    # refutation: the double-m. url is not an instance, so a would-be
    # refuting collision through replace-all never counts
    uk = spark.createDataFrame(
        [
            ("https://m.site.test/m.video.html", 1),
            ("https://site.test/video.html", 2),
            ("https://m.site.test/a", 3),
            ("https://site.test/a", 3),
        ],
        "url string, content_key long",
    )
    refs = refutation_counts(rules, uk).collect()[0]
    assert refs["refutations"] == 0
