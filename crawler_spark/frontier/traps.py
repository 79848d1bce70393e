"""Crawl-trap (spider-trap) detection over a URL frontier.

Real crawls die in traps, not in parsing: calendar pages that mint a new URL
for every (year, month, day), session-id query strings that make one page
look like a million, and link cycles (`/a/b/a/b/a/b/...`) that BFS will walk
to its depth limit. The reference crawler is too small to hit these (20-page
golden runs); at a 10^10-URL frontier they are the difference between
crawling the web and crawling one hostile host forever. This module adds the
standard defenses as pure column expressions + one bounded aggregation:

- :func:`flag_trap_urls` — per-URL structural flags, zero shuffle:
  ``path_depth`` (segment count), ``max_seg_repeat`` (cycle detection: the
  most-repeated path segment), ``n_params`` (query-string explosion), and
  the boolean ``trap_depth`` / ``trap_cycle`` / ``trap_params`` verdicts.
- :func:`url_skeleton_expr` — the URL's host+path with digit runs collapsed
  to ``N``: `/cal/2024/3/7` and `/cal/2024/3/8` share a skeleton, so a
  pattern that mints unbounded URLs collapses to ONE group key.
- :func:`trap_skeletons` — skeleton-explosion detection: ``groupBy(host,
  skeleton)`` (map-side partial agg; output is bounded by the number of
  DISTINCT page templates, not by URL count) keeping groups with
  ``n_urls >= min_urls``.
- :func:`filter_trapped` — drop frontier rows whose (host, skeleton) is on
  the trap list via a broadcast anti-join: the trap list is template-sized
  (small by construction), the frontier never shuffles.

Scale shape (10^10 URLs): flags are a projection inside whole-stage codegen;
the explosion agg shuffles (host, skeleton) pairs AFTER partial aggregation,
so the exchange carries one row per template per map task; the gate
anti-join broadcasts the trap list. Nothing here is per-row Python.

All expressions are deliberately regexp/HOF constructs that DuckDB replays
verbatim (the ``trap_flags_docs`` gate value-hashes both engines); host
parsing uses an explicit regexp rather than ``parse_url`` so both engines
share one definition (P6's port/userinfo caveat does not apply to
skeleton grouping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HOST_RE = "^[a-z][a-z0-9+.-]*://([^/?#]+)"
_PATH_RE = "^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY_RE = r"\\?([^#]*)"


def host_expr(url_col: str) -> str:
    return f"regexp_extract({url_col}, '{_HOST_RE}', 1)"


def path_expr(url_col: str) -> str:
    return f"regexp_extract({url_col}, '{_PATH_RE}', 1)"


def segments_expr(url_col: str) -> str:
    """Non-empty path segments as ``array<string>``."""
    return f"filter(split({path_expr(url_col)}, '/'), s -> s <> '')"


def url_skeleton_expr(url_col: str) -> str:
    """host + path with every digit run collapsed to ``N`` — the template
    identity under which calendar/pagination traps collapse to one key."""
    return (
        f"concat({host_expr(url_col)}, "
        f"regexp_replace({path_expr(url_col)}, '[0-9]+', 'N'))"
    )


def flag_trap_urls(
    df: DataFrame,
    url_col: str = "url",
    max_depth: int = 12,
    max_cycle: int = 2,
    max_params: int = 8,
) -> DataFrame:
    """Add per-URL structural trap flags; one projection, no shuffle.

    ``trap_cycle`` fires when any single path segment repeats more than
    ``max_cycle`` times (`/x/y/x/y/x/y` -> 3): the repeated-segment test is
    an O(d^2) HOF over the (short, bounded-by-max_depth-anyway) segment
    array — still JVM codegen, never Python.
    """
    segs = segments_expr(url_col)
    q = f"regexp_extract({url_col}, '{_QUERY_RE}', 1)"
    return (
        df.withColumn("path_depth", F.expr(f"size({segs})"))
        .withColumn(
            "max_seg_repeat",
            F.expr(
                f"coalesce(array_max(transform(array_distinct({segs}), "
                f"d -> size(filter({segs}, s -> s = d)))), 0)"
            ),
        )
        .withColumn(
            "n_params",
            F.expr(f"CASE WHEN {q} = '' THEN 0 ELSE size(split({q}, '&')) END"),
        )
        .withColumn("trap_depth", F.col("path_depth") > max_depth)
        .withColumn("trap_cycle", F.col("max_seg_repeat") > max_cycle)
        .withColumn("trap_params", F.col("n_params") > max_params)
    )


def trap_skeletons(
    df: DataFrame,
    url_col: str = "url",
    min_urls: int = 100,
) -> DataFrame:
    """(host, skeleton, n_urls) for templates minting >= ``min_urls`` URLs.

    The output is template-count-sized; at 10^10 URLs a host has thousands
    of templates, not billions, so this result is always broadcastable —
    that is what makes :func:`filter_trapped` cheap.
    """
    return (
        df.select(
            F.expr(host_expr(url_col)).alias("host"),
            F.expr(url_skeleton_expr(url_col)).alias("skeleton"),
        )
        .groupBy("host", "skeleton")
        .agg(F.count("*").alias("n_urls"))
        .filter(F.col("n_urls") >= min_urls)
    )


def filter_trapped(
    frontier: DataFrame,
    traps: DataFrame,
    url_col: str = "url",
    max_depth: int = 12,
    max_cycle: int = 2,
    max_params: int = 8,
) -> DataFrame:
    """Frontier gate: drop structurally-trapped URLs and URLs whose
    (host, skeleton) is on the ``traps`` list (from :func:`trap_skeletons`).

    The skeleton check is an explicitly-broadcast LEFT ANTI join — the
    frontier side never shuffles. Returns the surviving rows with the
    original columns only (flags are internal to the gate).
    """
    flagged = flag_trap_urls(frontier, url_col, max_depth, max_cycle, max_params)
    clean = flagged.filter(
        ~F.col("trap_depth") & ~F.col("trap_cycle") & ~F.col("trap_params")
    ).drop(
        "path_depth", "max_seg_repeat", "n_params",
        "trap_depth", "trap_cycle", "trap_params",
    )
    keyed = clean.withColumn("_sk", F.expr(url_skeleton_expr(url_col)))
    out = keyed.join(
        F.broadcast(traps.select(F.col("skeleton").alias("_sk")).distinct()),
        "_sk",
        "left_anti",
    )
    return out.drop("_sk")
