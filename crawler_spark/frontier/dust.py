"""DUST rule mining: learn URL rewrite rules from content-duplicate pairs.

"Do not crawl in the DUST: Different URLs with Similar Text"
(Bar-Yossef, Keidar, Schonfeld — WWW 2007). Large sites expose the same
page under many URLs (``/index.html`` suffixes, session parameters,
``m.``/``www.`` host prefixes, print views). Redirect resolution
(`frontier/redirects.py`), ``<link rel=canonical>`` rewriting
(`frontier/redirects.canonical_url_rewriter`) and mirror-host detection
(`frontier/mirrors.py`) each catch the aliases the *site declares*; DUST
mines the ones it does not — substring substitution rules *learned* from
URLs observed to serve identical content, then applied to canonicalize
unseen frontier URLs before the seen-set join. The reference crawler
(single host, 18-page runs) never meets this; at a 10^10-URL frontier
duplicate URL families are a first-order fetch-budget leak.

Algorithm (the paper's DustBuster, simplified to deterministic
substring-substitution rules):

1. **Pairs** — URLs serving identical content, from the same capped
   inverted-index join as `mirrors.py` (``content_key -> urls`` buckets,
   pairs within buckets only, hot keys dropped by ``max_df``).
2. **Envelopes** — each pair decomposes as ``prefix + alpha + suffix``
   vs ``prefix + beta + suffix`` (longest common prefix, then longest
   common suffix of the remainders). The differing middles are a
   candidate rule ``alpha -> beta``, oriented so the target is the
   shorter (tie: lexicographically smaller) side — DUST prefers
   shortening rules. Both LCP folds are pure JVM expressions — O(len)
   per pair, no Python.
3. **Support** — rules instantiated by at least ``min_support``
   distinct pairs survive; everything else (middles that embed a page
   id, one-off noise) dies in a vocabulary-sized aggregate.
4. **Refutation** — the paper's validity test: apply each surviving
   rule to every corpus URL where ``alpha`` occurs EXACTLY ONCE (a rule
   never fires on multi-occurrence URLs — substitution position would be
   ambiguous and a blanket replace-all would corrupt them); if the
   rewritten URL is a *known* URL serving *different* content, that
   instance refutes the rule. Valid rules have zero refutations. The rules table is
   always tiny and broadcast; the only corpus-sized exchange is the
   lookup join of rewritten URLs against the url->key table.
5. **Apply** — one rewrite pass per crawl cycle: each URL takes its
   single best applicable rule (support desc, shortening desc, then
   lexicographic) — deterministic, no fixed-point iteration.

Scale shape: pair generation is bucket-bounded (never all-pairs), rule
extraction is row-local JVM string folds, support/refutation aggregates
are rule-vocabulary-sized, and the apply pass is one broadcast
nested-loop probe + one url-keyed aggregate. Nothing grows faster than
(corpus + duplicate-pair count).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lcp_len(a: str, b: str) -> str:
    """SQL expression: longest-common-prefix length of string columns.

    A contiguous left fold — ``acc`` advances to ``i`` only while every
    previous position matched, so the first mismatch freezes it. O(len),
    whole-stage-codegen friendly, no Python.
    """
    n = f"least(length({a}), length({b}))"
    return (
        f"CASE WHEN {n} < 1 THEN 0 ELSE aggregate(sequence(1, {n}), 0, "
        f"(acc, i) -> CASE WHEN acc = i - 1 "
        f"AND substring({a}, i, 1) = substring({b}, i, 1) "
        f"THEN i ELSE acc END) END"
    )


def url_content_keys(
    pages: DataFrame,
    url_col: str = "url",
    key_col: Optional[str] = None,
    text_col: str = "text",
) -> DataFrame:
    """One ``(url, content_key)`` row per URL — min key wins on refetch.

    ``key_col`` names a precomputed content hash; otherwise the key is
    ``xxhash64(text)``. The min-aggregate makes the mapping a function
    even when a URL was fetched more than once with drifting bytes.
    """
    key = F.col(key_col) if key_col else F.xxhash64(F.col(text_col))
    return (
        pages.select(F.col(url_col).alias("url"), key.alias("content_key"))
        .groupBy("url")
        .agg(F.min("content_key").alias("content_key"))
    )


def dup_url_pairs(url_keys: DataFrame, max_df: int = 50) -> DataFrame:
    """Distinct URL pairs ``(u1 < u2)`` serving identical content.

    Same inverted-index shape as `mirrors.host_profiles`: pairs form only
    within a content bucket, and buckets larger than ``max_df`` URLs
    (parked templates, empty pages) are dropped by a broadcast anti-join
    so no bucket can go quadratic.
    """
    hot = (
        url_keys.groupBy("content_key")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("content_key")
    )
    capped = url_keys.join(F.broadcast(hot), "content_key", "left_anti")
    a = capped.select(F.col("content_key"), F.col("url").alias("u1"))
    b = capped.select(F.col("content_key"), F.col("url").alias("u2"))
    return (
        a.join(b, "content_key")
        .filter(F.col("u1") < F.col("u2"))
        .select("u1", "u2")
    )


def candidate_rules(pairs: DataFrame, min_support: int = 2) -> DataFrame:
    """Envelope-decompose each pair and count rule support.

    Returns ``(alpha, beta, support)`` where ``alpha -> beta`` rewrites
    the longer (tie: lexicographically greater) differing middle to the
    shorter — ``alpha`` is never empty. Only rules instantiated by at
    least ``min_support`` distinct pairs survive; the output is
    rule-vocabulary-sized.
    """
    d = pairs.withColumn("p", F.expr(_lcp_len("u1", "u2")))
    d = d.select(
        F.expr("substring(u1, p + 1)").alias("r1"),
        F.expr("substring(u2, p + 1)").alias("r2"),
    )
    d = d.withColumn("v1", F.reverse("r1")).withColumn("v2", F.reverse("r2"))
    d = d.withColumn("s", F.expr(_lcp_len("v1", "v2")))
    d = d.select(
        F.expr("substring(r1, 1, length(r1) - s)").alias("m1"),
        F.expr("substring(r2, 1, length(r2) - s)").alias("m2"),
    )
    swap = (F.length("m2") > F.length("m1")) | (
        (F.length("m2") == F.length("m1")) & (F.col("m2") > F.col("m1"))
    )
    d = d.select(
        F.when(swap, F.col("m2")).otherwise(F.col("m1")).alias("alpha"),
        F.when(swap, F.col("m1")).otherwise(F.col("m2")).alias("beta"),
    )
    return (
        d.groupBy("alpha", "beta")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= min_support)
    )


def refutation_counts(rules: DataFrame, url_keys: DataFrame) -> DataFrame:
    """Validity test: count refuting instances per rule.

    An *instance* is a corpus URL where ``alpha`` occurs exactly once
    (the only case a rule ever applies to — see the module docstring);
    rewriting it and finding a known URL with a *different* content key
    refutes the rule (rewrites landing on unknown URLs are neutral, per
    the paper). The rules side is broadcast; the rewritten-lookup join
    is the single corpus-sized exchange.
    """
    inst = url_keys.join(
        F.broadcast(rules),
        F.expr(
            "length(url) - length(replace(url, alpha, '')) = length(alpha)"
        ),
    ).select(
        "alpha",
        "beta",
        "support",
        "content_key",
        F.expr("replace(url, alpha, beta)").alias("rewritten"),
    )
    lookup = url_keys.select(
        F.col("url").alias("rewritten"), F.col("content_key").alias("rw_key")
    )
    hits = inst.join(lookup, "rewritten")
    refs = hits.groupBy("alpha", "beta").agg(
        F.sum(
            F.when(F.col("rw_key") != F.col("content_key"), 1).otherwise(0)
        ).alias("refutations")
    )
    return (
        rules.join(refs, ["alpha", "beta"], "left")
        .withColumn("refutations", F.coalesce("refutations", F.lit(0)))
        .select("alpha", "beta", "support", "refutations")
    )


def mine_dust_rules(
    pages: DataFrame,
    url_col: str = "url",
    key_col: Optional[str] = None,
    text_col: str = "text",
    max_df: int = 50,
    min_support: int = 2,
) -> DataFrame:
    """End-to-end miner: pairs -> envelopes -> support -> refutation.

    Returns ``(alpha, beta, support, refutations, valid)``; pass the
    ``valid`` slice to `apply_dust_rules`.

    The url->key table feeds three joins (pair generation, the rule
    instance probe, the rewritten-URL lookup); it is lazily
    localCheckpoint-ed so the hash+dedup scan runs once, not thrice.
    """
    uk = url_content_keys(
        pages, url_col=url_col, key_col=key_col, text_col=text_col
    ).localCheckpoint(eager=False)
    rules = candidate_rules(dup_url_pairs(uk, max_df=max_df), min_support=min_support)
    out = refutation_counts(rules, uk)
    return out.withColumn("valid", F.col("refutations") == 0)


def dust_url_rewriter(rules: DataFrame, max_rules: int = 64):
    """Adapt mined valid rules into the crawl's ``CrawlConfig.url_rewriter``
    seam — the *learned* sibling of `redirects.redirect_url_rewriter`
    (observed 3xx chains) and `redirects.canonical_url_rewriter`
    (publisher-declared). Aliases collapse BEFORE domain policy / window
    dedup / the seen anti-join, so the frontier stores one row per
    canonical URL.

    The rule table is vocabulary-sized by construction (support- and
    refutation-filtered); the top ``max_rules`` in apply-preference order
    (support desc, shortening desc, lexicographic) are collected once at
    construction — a bounded, documented driver read, like the paper's
    rule list — and compiled into one nested conditional expression. The
    rewrite is then per-row, zero-join, zero-shuffle on the frontier hot
    path, and picks exactly `apply_dust_rules`' best rule: the first
    matching rule in preference order IS the best matching rule. Applied
    once per candidate (no fixed-point), matching the apply pass.
    """
    from crawler_spark.operators.extract import domain_of

    top = (
        rules.select("alpha", "beta", "support")
        .orderBy(
            F.col("support").desc(),
            (F.length("beta") - F.length("alpha")).asc(),
            F.col("alpha"),
            F.col("beta"),
        )
        .limit(max_rules)
        .collect()
    )

    def rewriter(cand: DataFrame) -> DataFrame:
        if not top:
            return cand
        new_url = F.col("url")
        for r in reversed(top):
            a, b = F.lit(r["alpha"]), F.lit(r["beta"])
            once = (
                F.length("url") - F.length(F.replace(F.col("url"), a, F.lit("")))
            ) == F.lit(len(r["alpha"]))
            new_url = F.when(once, F.replace(F.col("url"), a, b)).otherwise(new_url)
        return (
            cand.withColumn("_dust_url", new_url)
            .withColumn(
                "host",
                F.when(
                    F.col("_dust_url") != F.col("url"),
                    domain_of(F.col("_dust_url")),
                ).otherwise(F.col("host")),
            )
            .withColumn("url", F.col("_dust_url"))
            .drop("_dust_url")
        )

    return rewriter


def apply_dust_rules(urls: DataFrame, rules: DataFrame, url_col: str = "url") -> DataFrame:
    """One canonicalization pass: best applicable rule per URL.

    Rule preference is (support desc, shortening desc, alpha, beta) — a
    total order, so the output is deterministic. A rule applies only
    where its ``alpha`` occurs exactly once (matching the mining-side
    instance definition; multi-occurrence URLs pass through rather than
    risk a corrupting multi-site substitution). URLs matching no rule
    pass through unchanged. Single pass by design (run once per crawl
    cycle); the rules table is broadcast, and the only exchange is the
    per-URL min-aggregate.
    """
    picked = urls.select(F.col(url_col).alias("url")).join(
        F.broadcast(rules.select("alpha", "beta", "support")),
        F.expr(
            "length(url) - length(replace(url, alpha, '')) = length(alpha)"
        ),
        "left",
    )
    pick = F.when(
        F.col("alpha").isNotNull(),
        F.struct(
            F.struct(
                (-F.col("support")).alias("k1"),
                (F.length("beta") - F.length("alpha")).alias("k2"),
                F.col("alpha").alias("k3"),
                F.col("beta").alias("k4"),
            ).alias("k"),
            F.expr("replace(url, alpha, beta)").alias("rw"),
        ),
    )
    return (
        picked.groupBy("url")
        .agg(F.min(pick.alias("pick")).alias("best"))
        .select(
            "url", F.coalesce(F.col("best.rw"), F.col("url")).alias("canon_url")
        )
    )
