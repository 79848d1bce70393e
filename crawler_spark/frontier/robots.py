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


# ---------------------------------------------------------------------------
# Full RFC-9309 rule semantics: Allow + Disallow, * and $ wildcards,
# longest-match precedence. The prefix-only path above stays as the
# default (byte-compatible with rounds 1-3 crawl gates); a rules table
# produced here drops into the SAME crawl — bfs._robots_filter dispatches
# on the table's columns, and crawl_delay budgets read the same column.
# ---------------------------------------------------------------------------

ROBOTS_RULES_FIELDS = "host string, rules array<string>, crawl_delay double"


def parse_robots_rules(
    text: Optional[str],
) -> Tuple[List[str], Optional[float]]:
    """Full rule list for agent ``*``: ordered ``"A:<pattern>"`` /
    ``"D:<pattern>"`` strings (Allow / Disallow, file order) plus the
    crawl delay — the RFC-9309 superset of :func:`parse_robots` (which
    keeps only disallow prefixes). Empty-value directives are no-ops per
    the RFC; unknown directives and hostile bodies behave exactly like
    the prefix parser."""
    if not text:
        return [], None
    agents: List[str] = []
    in_rules = False
    rules: List[str] = []
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
                agents = []
                in_rules = False
            agents.append(value.lower())
            continue
        in_rules = True
        if "*" not in agents:
            continue
        if field == "disallow" and value:
            rules.append("D:" + value)
        elif field == "allow" and value:
            rules.append("A:" + value)
        elif field == "crawl-delay":
            try:
                d = float(value)
            except ValueError:
                continue
            if d > 0:
                delay = d if delay is None else max(delay, d)
    return rules, delay


def _pattern_matches(pattern: str, path: str) -> bool:
    """RFC-9309 pattern match anchored at the path start: ``*`` matches
    any character run, a TRAILING ``$`` anchors the end (a ``$`` anywhere
    else is literal, the de-facto Googlebot convention)."""
    import re as _re

    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    rx = ".*".join(_re.escape(part) for part in pattern.split("*"))
    rx = "^" + rx + ("$" if anchored else "")
    return _re.match(rx, path) is not None


def rule_allows(path: Optional[str], rules: Optional[List[str]]) -> bool:
    """RFC-9309 access decision for one path: among the matching rules
    the LONGEST pattern (octet length) wins; on a tie Allow wins; with
    no matching rule the path is allowed."""
    # len-guard, not truthiness: Arrow batches hand the rules column to
    # the UDF as numpy arrays, whose bool() is ambiguous
    if rules is None or len(rules) == 0:
        return True
    p = path if path else "/"
    best_len = -1
    best_allow = True
    for rule in rules:
        allow = rule[0] == "A"
        pattern = rule[2:]
        if not _pattern_matches(pattern, p):
            continue
        plen = len(pattern)
        if plen > best_len or (plen == best_len and allow and not best_allow):
            best_len = plen
            best_allow = allow
    return best_allow


def robots_rules_table(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> full-rules rows (``ROBOTS_RULES_FIELDS``)
    via the same Arrow-batched shape as :func:`robots_table`. Feed the
    result straight to ``bfs.crawl(robots=...)`` — the filter dispatches
    on the ``rules`` column and applies wildcard longest-match semantics;
    ``crawl_delay`` budgets work unchanged (same column name)."""
    src = df.select(host_col, text_col)

    def parse_batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for host, txt in zip(pdf[host_col], pdf[text_col]):
                rules, delay = parse_robots_rules(txt)
                rows.append((host, rules, delay))
            yield pd.DataFrame(
                rows, columns=["host", "rules", "crawl_delay"]
            )

    return src.mapInPandas(parse_batches, schema=ROBOTS_RULES_FIELDS)


def robots_rules_allows_udf():
    """Vectorized RFC-9309 decision column: built lazily (keeps this
    module importable without a JVM) — ``bfs._robots_filter`` calls this
    once per crawl and applies the returned pandas UDF."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.BooleanType())
    def _allows(paths, rules):
        out = []
        for path, rule_list in zip(paths.tolist(), rules.tolist()):
            out.append(rule_allows(path, rule_list))
        return pd.Series(out)

    return _allows
