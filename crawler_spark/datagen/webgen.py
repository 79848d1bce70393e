"""Deterministic synthetic web-corpus generator.

Emits a web graph in exactly the driver-specified input shape
``pages(url string, warc_ts timestamp, html binary, text string, lang string)``
(BASELINE.json ``input_hint``), per the FIXTURES.md schema: Zipf-skewed
hosts (h0 hot), hostile HTML cases (missing titles, nested p-in-li,
code-in-pre, unicode whitespace, entities, unclosed tags, mailto:/
javascript:/fragment links, >20 links, duplicate links), dangling links to
URLs with no corpus row, and ``text`` = the oracle's structured-markdown
extraction (the byte-identity ground truth).

Everything is a pure function of (n_pages, n_hosts, seed) — no wall-clock,
no external data.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from typing import Dict, Iterator, List, Optional, Tuple

from crawler_spark.core.text import extract_structured_markdown
from crawler_spark.core.htmlparse import parse_html

EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)

# Body-fragment template pool. {w} slots are filled with deterministic words;
# hostile cases (unicode whitespace, entities, nesting, unclosed tags) appear
# in fixed templates so every corpus exercises them.
_WORDS = (
    "crawl frontier spark shuffle partition wave politeness robots bloom "
    "filter anchor corpus markdown extract relevance chunk overlap budget "
    "host domain queue depth seed link graph page title heading paragraph "
    "data pipeline token quality language fingerprint"
).split()

_FRAGMENTS = [
    "<h2>{w0} {w1}</h2><p>{w2} {w3} {w4} {w5} {w6} {w7} {w8} {w9} {w10} {w11}.</p>",
    "<p>{w0}&nbsp;{w1}　{w2} {w3} &amp; {w4} &lt;{w5}&gt; {w6} {w7} {w8} {w9}.</p>",
    "<h3>{w0}</h3><ul><li>{w1} {w2} {w3} {w4}</li><li>{w5} {w6} {w7} {w8}</li></ul>",
    "<ol><li><p>{w0} {w1} nested paragraph inside item {w2} {w3}</p></li><li>{w4} {w5}</li></ol>",
    "<pre><code>{w0} = {w1}({w2}, {w3})\nreturn {w4}</code></pre>",
    "<p>{w0} {w1} unclosed paragraph {w2}<p>{w3} {w4} follows {w5} {w6} {w7}.</p>",
    "<h2>{w0} {w1} {w2}</h2><p></p><p>      </p><p>{w3} {w4} {w5} {w6} {w7} {w8} {w9} {w10}.</p>",
    "<p>{w0} {w1} {w2} {w3} {w4} {w5} {w6} {w7} {w8} {w9} {w10} {w11} {w12} {w13} {w14} {w15}.</p>"
    "<p>{w0} {w1} short.</p>",
    "<ul><li>{w0}</li><li>{w1} {w2} {w3} {w4} {w5} {w6}</li><li>x</li></ul>",
    "<h1>{w0} {w1} secondary heading</h1><p>{w2}   {w3}\t{w4}\n{w5} {w6} {w7} {w8} {w9}.</p>",
]

_ES_SENT = "página de ejemplo con contenido en español para pruebas deterministas"
_ES = f"<p>{_ES_SENT} {_ES_SENT} {_ES_SENT}.</p>"
_ZH_SENT = "这是一个用于测试的确定性中文页面"
_ZH = f"<p>{_ZH_SENT}。{_ZH_SENT}。</p>"


@dataclass
class CorpusSpec:
    n_pages: int = 120
    n_hosts: int = 6
    seed: int = 42
    hot_host_share: float = 0.30   # h0 takes ~30% of pages (skew driver)
    missing_link_rate: float = 0.06  # links to URLs with no corpus row
    mean_links: int = 8
    # fixed fragments per page (None = the default 2-5 random draw). Larger
    # values emulate realistic Common-Crawl page weights so benchmarks are
    # parse-bound like production, not scheduler-bound.
    frag_count: Optional[int] = None


def _host_of(page_id: int, spec: CorpusSpec, rng: random.Random) -> int:
    if rng.random() < spec.hot_host_share:
        return 0
    # Zipf-ish tail over the remaining hosts
    r = rng.random()
    h = int(spec.n_hosts ** r)
    return min(max(h, 1), spec.n_hosts - 1) if spec.n_hosts > 1 else 0


def host_name(h: int) -> str:
    return f"h{h}.example.test"


def page_url(h: int, page_id: int) -> str:
    # stable slug; some ids get a nested path for robots-prefix tests
    if page_id % 7 == 3:
        return f"https://{host_name(h)}/private/p{page_id}"
    if page_id % 5 == 2:
        return f"https://{host_name(h)}/docs/p{page_id}"
    return f"https://{host_name(h)}/p{page_id}"


def _words(rng: random.Random, n: int) -> List[str]:
    return [_WORDS[rng.randrange(len(_WORDS))] for _ in range(n)]


def _fill(template: str, rng: random.Random) -> str:
    ws = _words(rng, 16)
    return template.format(**{f"w{i}": ws[i] for i in range(16)})


def _hosts(spec: CorpusSpec) -> List[int]:
    """Host assignment for every page id — one shared rng stream so this is
    reproducible independently of html generation."""
    rng = random.Random(spec.seed)
    return [_host_of(i, spec, rng) for i in range(spec.n_pages)]


def _by_host(hosts: List[int]) -> Dict[int, List[int]]:
    out: Dict[int, List[int]] = {}
    for i, h in enumerate(hosts):
        out.setdefault(h, []).append(i)
    return out


def _page_row(i: int, spec: CorpusSpec, hosts: List[int], by_host: Dict[int, List[int]]) -> Dict:
    """One page's row — a pure function of (i, spec, host assignment), so
    pages are generatable independently on any executor (corpus_spark_df)."""
    h = hosts[i]
    if True:  # body kept at original indentation
        prng = random.Random(spec.seed * 1_000_003 + i)  # per-page stream
        lang = "en"
        if i % 17 == 5:
            lang = "es"
        elif i % 23 == 7:
            lang = "zh"

        # --- head: title variants (missing title / missing both) ----------
        parts: List[str] = ["<html><head>"]
        title_mode = i % 11
        if title_mode == 4:
            pass  # no <title>; h1 fallback
        elif title_mode == 8:
            pass  # no <title> and no <h1>: "No title found"
        else:
            tw = _words(prng, 3)
            parts.append(f"<title>Page {i} — {tw[0]} {tw[1]} {tw[2]}</title>")
        parts.append("</head><body>")
        if title_mode != 8:
            hw = _words(prng, 2)
            parts.append(f"<h1>Page {i} {hw[0]} {hw[1]}</h1>")

        # --- body fragments -----------------------------------------------
        if lang == "es":
            parts.append(_ES)
        elif lang == "zh":
            parts.append(_ZH)
        n_frag = spec.frag_count if spec.frag_count else 2 + prng.randrange(4)
        for _ in range(n_frag):
            parts.append(_fill(_FRAGMENTS[prng.randrange(len(_FRAGMENTS))], prng))

        # --- links ----------------------------------------------------------
        n_links = max(1, int(prng.gauss(spec.mean_links, 3)))
        if i % 29 == 11:
            n_links = 25  # >20: exercises links[:20] truncation
        same_host_ids = by_host.get(h, [i])
        link_hrefs: List[str] = []
        for j in range(n_links):
            kind = prng.random()
            if kind < 0.62:
                tgt = same_host_ids[prng.randrange(len(same_host_ids))]
                href = page_url(h, tgt)
                if prng.random() < 0.4:
                    # relative form of the same URL
                    href = "/" + href.split("/", 3)[3]
            elif kind < 0.72:
                oh = prng.randrange(spec.n_hosts)
                tgt = prng.randrange(spec.n_pages)
                href = page_url(oh, tgt)
            elif kind < 0.72 + spec.missing_link_rate:
                href = f"https://{host_name(h)}/missing/m{prng.randrange(10_000)}"
            elif kind < 0.84:
                href = f"#frag{j}"  # fragment-only -> normalizes to page itself
            elif kind < 0.90:
                href = f"mailto:bot{j}@example.test"  # dropped by normalize
            elif kind < 0.94:
                href = "javascript:void(0)"  # dropped by normalize
            else:
                tgt = same_host_ids[prng.randrange(len(same_host_ids))]
                href = page_url(h, tgt) + f"#section{j}"  # collides after norm
            link_hrefs.append(href)
        if link_hrefs and prng.random() < 0.5:
            link_hrefs.append(link_hrefs[0])  # duplicate link (first wins)
        for j, href in enumerate(link_hrefs):
            lw = _words(prng, 2)
            parts.append(f'<p>See <a href="{href}">{lw[0]} {lw[1]}</a> here.</p>')

        parts.append("</body></html>")
        html = "".join(parts)
        html_bytes = html.encode("utf-8")
        return {
            "url": page_url(h, i),
            "warc_ts": EPOCH + timedelta(seconds=i),
            "html": html_bytes,
            "text": extract_structured_markdown(parse_html(html_bytes)),
            "lang": lang,
        }


def corpus_rows(spec: CorpusSpec) -> List[Dict]:
    """Generate the pages table rows. Returns list of dicts with keys
    url, warc_ts (datetime UTC), html (bytes), text (str), lang (str)."""
    hosts = _hosts(spec)
    by_host = _by_host(hosts)
    return [_page_row(i, spec, hosts, by_host) for i in range(spec.n_pages)]


def corpus_spark_df(spark, spec: CorpusSpec, parallelism: Optional[int] = None):
    """Distributed corpus generation: identical rows to ``corpus_rows`` but
    produced by executors via ``mapInPandas`` over page-id ranges.

    The only sequential state is the host-assignment stream, which is cheap
    (one rng draw per page) — computed on the driver and broadcast; html
    generation and the oracle text extraction (the expensive parts) run in
    parallel. Needed for the 10^5+-page corpora of the scaling benchmarks
    — single-threaded generation is the same parse cost the crawl pays,
    paid on one core.
    """
    import pandas as pd

    hosts = _hosts(spec)
    bc = spark.sparkContext.broadcast((hosts, _by_host(hosts)))
    if parallelism is None:
        parallelism = spark.sparkContext.defaultParallelism * 2

    def gen(batches):
        h, bh = bc.value
        for pdf in batches:
            rows = [_page_row(int(i), spec, h, bh) for i in pdf["id"]]
            out = pd.DataFrame(rows)
            out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True)
            yield out[["url", "warc_ts", "html", "text", "lang"]]

    ids = spark.range(0, spec.n_pages, numPartitions=parallelism)
    return ids.mapInPandas(
        gen, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )


def write_corpus_spark(spark, path: str, spec: CorpusSpec, parallelism: Optional[int] = None) -> None:
    """Parallel variant of write_corpus: a parquet directory at ``path``."""
    corpus_spark_df(spark, spec, parallelism).write.mode("overwrite").parquet(path)


def default_seeds(spec: CorpusSpec, n_seeds: int = 2) -> List[Dict]:
    """Seed list: first page of the hot host plus first page of host 1."""
    hosts = _hosts(spec)
    seeds, used = [], set()
    order = 0
    for want_host in (0, 1, 2, 3, 4):
        for i in range(spec.n_pages):
            if hosts[i] == want_host and i not in used:
                seeds.append({"url": page_url(want_host, i), "seed_order": order})
                used.add(i)
                order += 1
                break
        if order >= n_seeds:
            break
    return seeds


def default_robots(spec: CorpusSpec) -> List[Dict]:
    """Robots rules: hot host disallows /private; last host fully disallowed;
    others open."""
    rules = []
    for h in range(spec.n_hosts):
        if h == 0:
            prefixes = ["/private"]
        elif h == spec.n_hosts - 1 and spec.n_hosts > 2:
            prefixes = ["/"]
        else:
            prefixes = []
        rules.append(
            {"host": host_name(h), "disallow_prefixes": prefixes, "crawl_delay": 0.0}
        )
    return rules


def write_corpus(path: str, spec: CorpusSpec) -> int:
    """Write pages rows to a single parquet file via pyarrow (no Spark
    needed at datagen time). Returns the row count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = corpus_rows(spec)
    table = pa.table(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us", tz="UTC")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        }
    )
    pq.write_table(table, path)
    return len(rows)
