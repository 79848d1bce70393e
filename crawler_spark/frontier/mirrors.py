"""Mirror-host detection: hosts serving (mostly) the same content.

Web corpora are full of mirrors — the same site under several hostnames
(CDN aliases, country TLDs, scraped re-hosts). A frontier that treats
them as distinct hosts re-crawls the same corpus once per alias and
gives politeness budgets to each; a training pipeline double-counts the
text. The reference (single-host, 18-page runs) never meets this;
at 10^10-URL scale it is a first-order dedup problem.

Shape: the host-pair candidate join is an inverted index on content
key — identical to the n-gram Jaccard design (``ngram_jaccard_pairs``):
``(content_key -> hosts)`` buckets, pairs generated within buckets only,
with a ``max_df`` cap so boilerplate shared by thousands of hosts (404
templates, parked-domain pages) cannot blow the join up quadratically.
Everything after the per-page content key is host-cardinality-sized,
which is always tiny next to the page corpus.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_profiles(
    pages: DataFrame,
    host_col: str = "host",
    key_col: Optional[str] = None,
    text_col: str = "text",
) -> DataFrame:
    """Distinct ``(host, content_key)`` pairs — the host's content set.

    ``key_col`` names a precomputed content key (hash); when absent the
    key is ``xxhash64(text)``. The distinct combines map-side, so a host
    serving the same page a million times costs one row after the
    exchange.
    """
    key = F.col(key_col) if key_col else F.xxhash64(F.col(text_col))
    return pages.select(
        F.col(host_col).alias("host"), key.alias("content_key")
    ).distinct()


def capped_profiles(profiles: DataFrame, max_df: int) -> DataFrame:
    """Drop content keys served by more than ``max_df`` hosts.

    The hot-key table is host-pair-bounded and always broadcast — the
    profile stream anti-joins against it without shuffling.
    """
    hot = (
        profiles.groupBy("content_key")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("content_key")
    )
    return profiles.join(F.broadcast(hot), "content_key", "left_anti")


def mirror_pairs(
    profiles: DataFrame,
    min_jaccard: float = 0.8,
    max_df: Optional[int] = 1000,
) -> DataFrame:
    """Host pairs whose content-set Jaccard overlap >= ``min_jaccard``.

    ``(host_a, host_b, shared, n_a, n_b, jaccard)`` with host_a < host_b.
    ``max_df`` drops content keys served by more than that many hosts
    before pairing (the hot-shingle cap from the n-gram Jaccard operator):
    a key on D hosts contributes D*(D-1)/2 candidate rows, so the join is
    bounded by ``max_df * n_keys`` instead of quadratic in the hottest
    template. Dropping hot keys can only LOWER a pair's measured overlap
    (both sides lose the key from numerator and denominator at worst
    equally), so true mirrors — which share rare content too — survive.
    """
    p = profiles.select("host", "content_key")
    if max_df is not None:
        p = capped_profiles(p, max_df)
    p = p.localCheckpoint(eager=False)  # pairing self-joins this twice

    sizes = p.groupBy("host").agg(F.count("*").alias("n_keys"))
    a = p.select(F.col("host").alias("host_a"), "content_key")
    b = p.select(F.col("host").alias("host_b"), "content_key")
    shared = (
        a.join(b, "content_key")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col("host").alias("host_a"), F.col("n_keys").alias("n_a"))
    sb = sizes.select(F.col("host").alias("host_b"), F.col("n_keys").alias("n_b"))
    return (
        shared.join(sa, "host_a")
        .join(sb, "host_b")
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("host_a", "host_b", "shared", "n_a", "n_b", "jaccard")
    )


def mirror_groups(pairs: DataFrame) -> DataFrame:
    """Collapse mirror pairs into groups: ``(host, canonical_host)``.

    Reuses the connected-components operator (min-label + pointer
    jumping) on xxhash64 host ids; the canonical host is the
    lexicographically smallest hostname in the component — deterministic,
    so every run and every cluster size elects the same representative.
    The graph is host-pair-sized (tiny), but the distributed path is kept
    so a pathological million-alias farm still resolves without driver
    memory.
    """
    from crawler_spark.operators.dedup import connected_components

    hosts = (
        pairs.select(F.col("host_a").alias("host"))
        .union(pairs.select("host_b"))
        .distinct()
        .withColumn("hid", F.xxhash64("host"))
    )
    edges = pairs.select(
        F.xxhash64("host_a").alias("id_a"), F.xxhash64("host_b").alias("id_b")
    )
    comp = connected_components(edges)
    labeled = hosts.join(comp, hosts["hid"] == comp["id"], "left").select(
        "host", F.coalesce("comp", "hid").alias("comp")
    )
    canon = labeled.groupBy("comp").agg(F.min("host").alias("canonical_host"))
    return labeled.join(canon, "comp").select("host", "canonical_host")


def noncanonical_hosts(groups: DataFrame) -> DataFrame:
    """Hosts to drop from the frontier: every group member except its
    canonical representative. Broadcast-anti-join this against candidate
    URLs (host-cardinality-sized, like the domain blocklist)."""
    return groups.filter(F.col("host") != F.col("canonical_host")).select("host")
