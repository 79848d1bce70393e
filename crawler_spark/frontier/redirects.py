"""Redirect-chain resolution by pointer doubling.

A 10^10-URL frontier accumulates redirect edges (301/302/canonical) whose
chains must be collapsed to terminal URLs before dedup — otherwise the
seen-set stores every alias and the crawl re-fetches the same terminal
page through each of them. The reference follows redirects implicitly
inside its single HTTP client (aiohttp default); at cluster scale the
mapping is a *table* and resolution is a graph problem.

Shape that survives 100 TB: pointer doubling (path halving), the same
O(log chain-length) trick the connected-components operator uses — each
round composes the mapping with itself (``f <- f(f(u))``), so a chain of
length L collapses in ceil(log2 L) self-joins instead of L sequential
ones. Every round is a hash equi-join on the current target; no driver
state, no per-row Python, lineage cut per round with ``localCheckpoint``.

Contract: chains of length <= ``max_hops`` resolve to their terminal with
the exact hop count; longer chains and cycles (including self-redirects)
come back ``resolved = false`` with NULL final/hops — deferred to the
caller's policy, never silently followed forever.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    url_col: str = "url",
    redirect_col: str = "redirect_to",
    max_hops: int = 32,
) -> DataFrame:
    """``(url, redirect_to nullable)`` -> ``(url, final_url, hops, resolved)``.

    ``redirect_to IS NULL`` marks a terminal URL. A redirect target that
    never appears in ``url_col`` (dangling) is terminal by definition.
    Deterministic at any parallelism: the mapping is a function (one row
    per url; duplicate url rows must be deduped upstream), so composition
    has a single fixed point.
    """
    e = edges.select(
        F.col(url_col).alias("url"), F.col(redirect_col).alias("redirect_to")
    )
    # urls that redirect somewhere — membership decides "is my target terminal"
    sources = e.filter(F.col("redirect_to").isNotNull()).select(
        F.col("url").alias("_src")
    )

    m = (
        e.join(sources, e["redirect_to"] == sources["_src"], "left")
        .select(
            "url",
            F.coalesce("redirect_to", "url").alias("cur"),
            F.when(F.col("redirect_to").isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .cast("int")
            .alias("hops"),
            (F.col("redirect_to").isNull() | F.col("_src").isNull()).alias("done"),
        )
        .localCheckpoint(eager=False)
    )

    rounds = max(1, math.ceil(math.log2(max(2, max_hops))))
    for _ in range(rounds):
        nxt = m.select(
            F.col("url").alias("_u"),
            F.col("cur").alias("_v"),
            F.col("hops").alias("_h"),
            F.col("done").alias("_d"),
        )
        m = (
            m.join(nxt, (~F.col("done")) & (m["cur"] == nxt["_u"]), "left")
            .select(
                "url",
                F.when(F.col("done"), F.col("cur")).otherwise(F.col("_v")).alias("cur"),
                F.when(F.col("done"), F.col("hops"))
                .otherwise(F.col("hops") + F.col("_h"))
                .alias("hops"),
                F.when(F.col("done"), F.lit(True)).otherwise(F.col("_d")).alias("done"),
            )
            .localCheckpoint(eager=False)
        )

    resolved = F.col("done") & (F.col("hops") <= max_hops)
    return m.select(
        "url",
        F.when(resolved, F.col("cur")).alias("final_url"),
        F.when(resolved, F.col("hops")).alias("hops"),
        resolved.alias("resolved"),
    )


def redirect_url_rewriter(resolved: DataFrame):
    """Adapt a :func:`resolve_redirects` table into the crawl's
    ``CrawlConfig.url_rewriter`` seam.

    Candidate urls with a resolved terminal rewrite to it and get their
    ``host`` recomputed (same netloc semantics as the expand path's
    ``domain_of``); unresolved and unknown urls pass through untouched.
    The mapping joins on the candidate's url — Spark broadcasts it while
    the redirect table is small; at alias-farm scale it degrades to a
    hash join, never a collect.
    """
    from crawler_spark.operators.extract import domain_of

    table = resolved.filter(
        F.col("resolved") & F.col("final_url").isNotNull()
        & (F.col("final_url") != F.col("url"))
    ).select(F.col("url").alias("_rw_url"), F.col("final_url").alias("_rw_final"))

    def rewriter(cand: DataFrame) -> DataFrame:
        return (
            cand.join(table, cand["url"] == table["_rw_url"], "left")
            .withColumn(
                "host",
                F.when(
                    F.col("_rw_final").isNotNull(), domain_of(F.col("_rw_final"))
                ).otherwise(F.col("host")),
            )
            .withColumn("url", F.coalesce("_rw_final", "url"))
            .drop("_rw_url", "_rw_final")
        )

    return rewriter


def canonical_url_rewriter(pages: DataFrame):
    """Adapt extraction output's ``canonical_url`` column (``<link
    rel="canonical">``, `operators/extract.py`) into the crawl's
    ``CrawlConfig.url_rewriter`` seam — the in-HTML, publisher-declared
    twin of :func:`redirect_url_rewriter`'s observed redirect chains:
    candidate URLs whose page declared a different canonical rewrite to it
    BEFORE domain policy / dedup / the seen anti-join, so the seen set
    stores one row per canonical page instead of one per alias.

    One hop by convention (indexers ignore canonical-of-canonical chains;
    a page is authoritative only about itself). If chain collapse is ever
    wanted, feed the ``(url, canonical_url)`` edges through
    :func:`resolve_redirects` first and use its rewriter instead.
    """
    resolved = (
        pages.filter(
            F.col("canonical_url").isNotNull()
            & (F.col("canonical_url") != F.col("url"))
        )
        .select(
            "url",
            F.col("canonical_url").alias("final_url"),
            F.lit(True).alias("resolved"),
        )
    )
    return redirect_url_rewriter(resolved)


def rewrite_to_terminal(
    frontier: DataFrame,
    resolved: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Replace frontier URLs by their resolved terminals before dedup.

    Unresolved (cycle / over-cap) URLs pass through unchanged — the
    seen-set then naturally caps how often a trap chain is retried. Join
    is on the frontier's key; the resolved table is the redirect-edge
    table's size, not the frontier's, so Spark's size estimate (or an
    explicit broadcast by the caller) keeps the frontier side shuffle-free
    when the mapping is small.
    """
    r = resolved.select(
        F.col("url").alias("_ru"), "final_url", F.col("resolved").alias("_ok")
    )
    return (
        frontier.join(r, frontier[url_col] == r["_ru"], "left")
        .withColumn(
            url_col,
            F.when(F.col("_ok") & F.col("final_url").isNotNull(), F.col("final_url"))
            .otherwise(F.col(url_col)),
        )
        .drop("_ru", "final_url", "_ok")
    )


def compose_url_rewriters(*rewriters):
    """Chain several ``CrawlConfig.url_rewriter`` adapters into one.

    The engine now has three alias-collapse sources — observed redirect
    chains (`redirect_url_rewriter`), publisher-declared canonicals
    (`canonical_url_rewriter`), and mined DUST rules
    (`frontier.dust.dust_url_rewriter`); a production frontier runs all
    of them. Application order is left to right (redirects first is the
    conventional order: resolve the fetch alias, then normalize the
    name), each stage seeing the previous stage's output, all inside one
    wave's candidate plan — no extra actions, no shuffles beyond what the
    stages themselves add. ``None`` entries are skipped so callers can
    pass optional stages unconditionally.
    """
    stages = [r for r in rewriters if r is not None]

    def rewriter(cand):
        for r in stages:
            cand = r(cand)
        return cand

    return rewriter
