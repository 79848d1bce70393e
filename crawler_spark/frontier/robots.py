"""robots.txt parsing: raw fetched bodies -> the engine's robots table.

The reference crawler has no robots handling (checked: no robots logic
anywhere in /root/reference); robots enforcement is a north_rule addition.
The wave loop consumes a prepared table in ``ROBOTS_SCHEMA`` (host,
disallow_prefixes, crawl_delay) — this module produces that table from the
raw ``robots.txt`` bodies a fetch layer stores alongside the corpus, so
the whole path is: fetch robots bodies -> ``robots_table`` -> broadcast
join + prefix filter + crawl_delay budgets (bfs.py).

Parsing semantics (the subset the engine enforces, documented here as the
contract):

- records are groups of ``User-agent`` lines followed by rules; a rule
  line binds to every agent named since the last rule line (RFC 9309
  grouping).
- only the ``*`` agent's groups apply (the engine crawls as a generic
  agent); agent matching is case-insensitive.
- ``Disallow`` with a non-empty path contributes a prefix;
  ``Disallow:`` (empty) allows everything (contributes nothing).
- ``Crawl-delay`` parses as float seconds; if several groups bind the
  agent, the LARGEST delay wins (the most conservative budget — the
  polite choice when a file is ambiguous).
- comments (``#`` to end of line) and unknown directives are ignored;
  a missing/empty/unparseable body yields no restrictions.

The parser is a pure function over one small string — it runs inside an
Arrow-batched ``mapInPandas`` (one robots body per host; the robots table
is tiny relative to the corpus and broadcasts into the frontier join).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame


def parse_robots(text: Optional[str]) -> Tuple[List[str], Optional[float]]:
    """(disallow_prefixes, crawl_delay) for agent ``*`` — pure function."""
    if not text:
        return [], None
    agents: List[str] = []
    in_rules = False  # False while collecting consecutive User-agent lines
    disallow: List[str] = []
    delay: Optional[float] = None
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_rules:
                agents = []  # a new group starts
                in_rules = False
            agents.append(value.lower())
            continue
        in_rules = True
        if "*" not in agents:
            continue
        if field == "disallow" and value:
            disallow.append(value)
        elif field == "crawl-delay":
            try:
                d = float(value)
            except ValueError:
                continue
            if d > 0:
                delay = d if delay is None else max(delay, d)
    # first occurrence wins on duplicates, order preserved
    seen = set()
    uniq = [p for p in disallow if not (p in seen or seen.add(p))]
    return uniq, delay


def robots_table(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> ROBOTS_SCHEMA rows via Arrow-batched parsing."""
    from crawler_spark.frontier.bfs import ROBOTS_SCHEMA

    src = df.select(host_col, text_col)

    def parse_batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for host, txt in zip(pdf[host_col], pdf[text_col]):
                prefixes, delay = parse_robots(txt)
                rows.append((host, prefixes, delay))
            yield pd.DataFrame(
                rows, columns=["host", "disallow_prefixes", "crawl_delay"]
            )

    return src.mapInPandas(parse_batches, schema=ROBOTS_SCHEMA)
