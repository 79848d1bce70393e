"""Single-node oracle: defines "the reference's answer" for synthetic corpora.

Two crawlers over an in-memory ``{url: html_bytes}`` corpus:

- ``reference_crawl``: a direct transcription of the reference's FIFO BFS
  loop (/root/reference/crawler/enhanced_crawler.py:252-304), quirks
  included (pop-time seen marking, in-queue linear dedup / first-enqueuer
  wins, links[:20] drives enqueueing, errors count toward max_pages, the
  P7 domain policy that never reaches third-party domains).

- ``wave_crawl``: the wave (depth-synchronous) formulation the Spark engine
  uses, extended with the north_rule's politeness semantics (per-host
  per-wave budgets, robots prefix rules; overflow defers to the next wave,
  never drops). With politeness off it must produce the identical visit
  order and seen set as ``reference_crawl`` — tests assert that, which is
  the proof that the distributed formulation preserves reference semantics.

Both share the exact per-page extraction pipeline with the Spark engine via
``crawler_spark.core``.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

from crawler_spark.core.page import build_error_record, build_page_record
from crawler_spark.core.urls import get_domain

INF = math.inf


def _timestamp_for(url: str, corpus_ts: Optional[Dict[str, str]]) -> str:
    return corpus_ts.get(url, "") if corpus_ts else ""


def scrape_page_sim(
    corpus: Dict[str, bytes],
    url: str,
    instructions: Optional[str],
    corpus_ts: Optional[Dict[str, str]] = None,
) -> Dict:
    if url not in corpus:
        return build_error_record(url)
    return build_page_record(
        corpus[url], url, instructions, timestamp=_timestamp_for(url, corpus_ts)
    )


def reference_crawl(
    corpus: Dict[str, bytes],
    seed: str,
    instructions: Optional[str] = None,
    depth: int = 1,
    follow_external_links: bool = False,
    max_pages: float = 100,
    corpus_ts: Optional[Dict[str, str]] = None,
) -> Dict:
    """Transcription of enhanced_crawler.py:252-304 (single seed)."""
    visited: set = set()
    results: List[Dict] = []
    start_domain = get_domain(seed)
    url_queue: List[Tuple[str, int]] = [(seed, 0)]

    while url_queue and len(visited) < max_pages:
        current_url, current_depth = url_queue.pop(0)
        if current_url in visited:
            continue
        visited.add(current_url)

        page_data = scrape_page_sim(corpus, current_url, instructions, corpus_ts)
        results.append(page_data)

        if current_depth < depth:
            links = page_data.get("links", [])
            current_domain = get_domain(current_url)
            for link in links:
                if link in visited or any(link == u for u, _ in url_queue):
                    continue
                link_domain = get_domain(link)
                if link_domain == current_domain or (
                    follow_external_links and link_domain == start_domain
                ):
                    url_queue.append((link, current_depth + 1))

    return {
        "meta": {
            "url": seed,
            "instructions": instructions,
            "depth": depth,
            "follow_external_links": follow_external_links,
            "pages_crawled": len(results),
        },
        "pages": results,
    }


def robots_allows(url: str, disallow_prefixes: Optional[List[str]]) -> bool:
    """Path-prefix robots rule (engine extension, SURVEY §2.3 J6)."""
    if not disallow_prefixes:
        return True
    from urllib.parse import urlparse

    path = urlparse(url).path or "/"
    return not any(path.startswith(p) for p in disallow_prefixes)


def wave_crawl(
    corpus: Dict[str, bytes],
    seeds: List[str],
    instructions: Optional[str] = None,
    depth: int = 1,
    follow_external_links: bool = False,
    max_pages: float = INF,
    robots: Optional[Dict[str, List[str]]] = None,
    host_budget: Optional[Dict[str, int]] = None,
    default_budget: float = INF,
    max_waves: int = 10_000,
    corpus_ts: Optional[Dict[str, str]] = None,
) -> Dict:
    """Wave-synchronous BFS with politeness — the engine's semantics.

    Frontier rows are (url, depth, parent_seq, link_pos); visit order within
    a wave is (parent_seq, link_pos). parent_seq is the parent's global
    visit sequence (seeds: parent_seq=-1, link_pos=seed_order), so the order
    key is globally monotone and deferred rows naturally sort before newer
    discoveries. Politeness: per host, at most budget(host) fetches per
    wave, chosen in order-key order; overflow rows carry to the next wave
    unchanged (deferred, not dropped — reference rate-limit semantics S3).
    Robots (if given) filter candidates before they ever enter the frontier;
    disallowed seeds are likewise dropped.
    """
    robots = robots or {}
    host_budget = host_budget or {}

    def budget_of(host: str) -> float:
        return host_budget.get(host, host_budget.get("*", default_budget))

    start_domains = {get_domain(s) for s in seeds}
    seen: set = set()
    visit_log: List[Tuple[int, str, int]] = []  # (seq, url, depth)
    pages: List[Dict] = []
    next_seq = 0

    # frontier rows: (parent_seq, link_pos, url, depth); duplicate seeds are
    # deduped first-order-wins (the reference pops the second copy and skips
    # it at the seen check without consuming budget — same outcome)
    frontier: List[Tuple[int, int, str, int]] = []
    _seed_seen = set()
    for i, u in enumerate(seeds):
        if u in _seed_seen or not robots_allows(u, robots.get(get_domain(u))):
            continue
        _seed_seen.add(u)
        frontier.append((-1, i, u, 0))
    # first-enqueuer-wins across waves: a deferred row keeps priority
    in_frontier = {u for (_, _, u, _) in frontier}

    wave = 0
    while frontier and len(visit_log) < max_pages and wave < max_waves:
        frontier.sort(key=lambda r: (r[0], r[1]))

        # politeness: take up to budget(host) rows per host, in order
        taken: List[Tuple[int, int, str, int]] = []
        deferred: List[Tuple[int, int, str, int]] = []
        host_counts: Dict[str, int] = {}
        for row in frontier:
            host = get_domain(row[2])
            c = host_counts.get(host, 0)
            if c < budget_of(host):
                host_counts[host] = c + 1
                taken.append(row)
            else:
                deferred.append(row)

        # global max_pages cap (order-key order — reference W2 semantics)
        remaining = max_pages - len(visit_log)
        if remaining != INF and len(taken) > remaining:
            overflow = taken[int(remaining):]
            taken = taken[: int(remaining)]
            deferred = sorted(deferred + overflow, key=lambda r: (r[0], r[1]))

        if not taken:
            break  # every remaining host has budget 0 — no progress possible

        # visit
        wave_pages: List[Dict] = []
        for parent_seq, link_pos, url, d in taken:
            seen.add(url)
            in_frontier.discard(url)
            visit_log.append((next_seq, url, d))
            page = scrape_page_sim(corpus, url, instructions, corpus_ts)
            page["_seq"], page["_depth"], page["_wave"] = next_seq, d, wave
            wave_pages.append(page)
            next_seq += 1
        pages.extend(wave_pages)

        # expand
        new_rows: List[Tuple[int, int, str, int]] = []
        for page in wave_pages:
            d = page["_depth"]
            if d >= depth:
                continue
            links = page.get("links", [])
            current_domain = get_domain(page["url"])
            for pos, link in enumerate(links):
                if link in seen or link in in_frontier:
                    continue
                link_domain = get_domain(link)
                if not (
                    link_domain == current_domain
                    or (follow_external_links and link_domain in start_domains)
                ):
                    continue
                if not robots_allows(link, robots.get(link_domain)):
                    continue
                new_rows.append((page["_seq"], pos, link, d + 1))
                in_frontier.add(link)

        # first-wins dedup among this wave's new candidates (J3): order-key
        # first occurrence. (in_frontier check above already guarantees it
        # here since we iterate in order; kept explicit in the Spark engine.)
        frontier = deferred + new_rows
        wave += 1

    return {
        "meta": {
            "seeds": list(seeds),
            "instructions": instructions,
            "depth": depth,
            "follow_external_links": follow_external_links,
            "pages_crawled": len(pages),
            "waves": wave,
        },
        "visit_log": visit_log,
        "pages": pages,
        "seen": set(seen),
    }
