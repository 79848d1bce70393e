"""OPIC: On-line Page Importance Computation as a crawl-coupled scorer.

(Abiteboul, Preda, Cobena — WWW 2003, "Adaptive on-line page importance
computation".) The frontier-priority algorithm *designed for crawling*:
every page holds **cash**; when a page is fetched its cash is banked
into its **history** (the importance estimate) and simultaneously
distributed equally to its out-links — so importance flows along the
crawl itself, no full link graph and no batch power iteration required.
PageRank/HITS/TrustRank (operators/graph.py) need the whole observed
graph after the fact; OPIC gives a usable importance signal *while the
frontier is still being discovered*, which is the reference's
LLM-link-scoring slot (`ai_processor.py` link prioritization) filled
with a published deterministic algorithm.

Engine shape: an `Opic` object plugs into BOTH crawl seams —
``CrawlConfig.wave_observer`` (each wave's committed page records update
the cash table) and ``CrawlConfig.priority_scorer`` (new frontier rows
read their accumulated cash). All cash arithmetic is fixed-point BIGINT
(``CASH_ONE = 2^30`` per seed unit) with integer division, so state and
crawl order are bit-deterministic at any parallelism. The cash table is
url-hash keyed (frontier-scale, exactly like the seen set), updated by
one join + one union-aggregate per wave and localCheckpoint-ed so
lineage stays flat across waves.

Deviations from the paper, chosen for determinism and documented:
- integer division leaves a remainder ``cash - outdeg * share``; it
  stays with the crawled page's own cash (total cash is conserved
  exactly) rather than going to the paper's virtual root;
- dangling pages (no out-links / error rows) bank their cash into
  history and the cash leaves circulation (no virtual root; each page
  is fetched once per crawl, so hoarding is not a concern);
- priority is the bounded monotone map ``cash / (cash + CASH_ONE)``
  of the row's current cash — [0, 1) as the W3 seam requires.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CASH_ONE = 1 << 30

_STATE_SCHEMA = "url_hash bigint, cash bigint, history bigint"


def opic_init(spark: SparkSession, seeds: Sequence[str]) -> DataFrame:
    """Seed state: each seed URL starts with ``CASH_ONE div n_seeds``."""
    seeds = list(seeds)
    if not seeds:
        return spark.createDataFrame([], _STATE_SCHEMA)
    share = CASH_ONE // len(seeds)
    return spark.createDataFrame(
        [(u,) for u in seeds], "url string"
    ).select(
        F.xxhash64("url").alias("url_hash"),
        F.lit(share).cast("bigint").alias("cash"),
        F.lit(0).cast("bigint").alias("history"),
    ).groupBy("url_hash").agg(
        F.sum("cash").alias("cash"), F.sum("history").alias("history")
    )


def opic_step(
    state: DataFrame,
    pages: DataFrame,
    url_col: str = "url",
    links_col: str = "links",
) -> DataFrame:
    """One OPIC update: the crawled ``pages`` bank and distribute cash.

    Pure function of (state, pages) — exact BIGINT throughout. Shape per
    wave: one left join of the (small) wave against the state, one
    exploded distribution stream, one union-aggregate back to
    ``(url_hash, cash, history)``. Rows whose cash and history are both
    zero are dropped so the state carries only touched URLs.
    """
    crawled = pages.select(
        F.xxhash64(F.col(url_col)).alias("h"),
        F.coalesce(F.col(links_col), F.array()).alias("links"),
    )
    cur = crawled.join(
        state.select(F.col("url_hash").alias("h"), "cash"), "h", "left"
    ).select(
        "h",
        F.coalesce("cash", F.lit(0)).cast("bigint").alias("c"),
        "links",
        F.size("links").alias("outdeg"),
    )
    # per-crawled-page deltas: bank history; cash -> children, remainder
    # kept (conserved), or fully banked-and-retired when dangling
    marks = cur.select(
        F.col("h").alias("url_hash"),
        F.when(F.col("outdeg") > 0, (F.col("c") % F.col("outdeg")) - F.col("c"))
        .otherwise(-F.col("c"))
        .alias("cash"),
        F.col("c").alias("history"),
    )
    dist = (
        cur.filter((F.col("outdeg") > 0) & (F.col("c") > 0))
        .select(
            F.expr("cast(c div outdeg as bigint)").alias("share"),
            F.explode("links").alias("target"),
        )
        .select(
            F.xxhash64("target").alias("url_hash"),
            F.col("share").alias("cash"),
            F.lit(0).cast("bigint").alias("history"),
        )
    )
    return (
        state.unionByName(marks).unionByName(dist)
        .groupBy("url_hash")
        .agg(F.sum("cash").alias("cash"), F.sum("history").alias("history"))
        .filter((F.col("cash") != 0) | (F.col("history") != 0))
    )


def opic_priority_expr(cash_col: str = "cash"):
    """priority = cash / (cash + CASH_ONE): monotone, [0, 1), exact input."""
    c = F.coalesce(F.col(cash_col), F.lit(0)).cast("double")
    return c / (c + float(CASH_ONE))


class Opic:
    """Stateful OPIC coupled to the crawl's two seams.

    Usage::

        opic = Opic(spark, seeds)
        crawl(spark, corpus, seeds,
              CrawlConfig(wave_observer=opic.observer,
                          priority_scorer=opic.scorer, ...))
        opic.state  # (url_hash, cash, history) — history IS the
                    # importance estimate; join host/url tables as needed

    The crawl loop does NOT re-run committed waves on resume, so a
    freshly constructed ``Opic`` would hold only seed state after a
    restart — call :meth:`replay` against the run-dir first; it feeds
    every committed wave's page records through the same ``opic_step``
    in wave order, which reproduces the pre-crash state exactly (the
    observer always sees the COMMITTED records, so replay and the
    original observation are the same computation). ``localCheckpoint``
    keeps the per-wave plan flat.
    """

    def __init__(self, spark: SparkSession, seeds: Sequence[str]):
        self.state = opic_init(spark, seeds).localCheckpoint(eager=True)
        self.waves_observed: List[int] = []

    def replay(self, spark: SparkSession, run_dir: str) -> None:
        """Rebuild state from a run-dir's committed waves (resume path)."""
        from crawler_spark.frontier.checkpoint import WaveCommit

        ck = WaveCommit(run_dir)
        for w in sorted(ck.committed_waves()):
            pages = ck.read_table(spark, "pages", waves=[w])
            if pages is not None:
                self.observer(w, pages)

    def observer(self, wave: int, pages: DataFrame) -> None:
        self.state = opic_step(self.state, pages).localCheckpoint(eager=True)
        self.waves_observed.append(wave)

    def scorer(self, new_rows: DataFrame) -> DataFrame:
        cash = self.state.select(
            F.col("url_hash").alias("_opic_h"), F.col("cash").alias("_opic_c")
        )
        return (
            new_rows.join(
                cash, F.xxhash64(new_rows["url"]) == cash["_opic_h"], "left"
            )
            .withColumn("priority", opic_priority_expr("_opic_c"))
            .drop("_opic_h", "_opic_c")
        )


def opic_host_signal(state: DataFrame, seen: DataFrame) -> DataFrame:
    """OPIC importance as a ``(host, score)`` signal for
    `operators/priority.blend_host_signals` — the exploit term the next
    crawl's composite scorer blends with PageRank/anchors/diversity.

    ``seen`` is the crawl's committed seen table (``url_hash``, ``host``
    columns — `WaveCommit` writes it per wave), which maps banked history
    back to hosts without storing URL strings in the OPIC state. Score is
    each host's share of total banked history, normalized to max 1.0
    (``score = host_history / max_host_history``) so the top host scores
    1 and everything else proportionally — same [0, 1] convention as the
    other signals. Hosts with zero banked history drop out (unknown to
    the blend, which treats missing as unknown, not zero).
    """
    per_host = (
        state.join(seen.select("url_hash", "host").distinct(), "url_hash")
        .groupBy("host")
        .agg(F.sum("history").alias("_h"))
        .filter(F.col("_h") > 0)
    ).localCheckpoint(eager=False)  # the max() collect and the returned
    # plan both read it — compute the join+aggregate once
    mx = per_host.agg(F.max("_h")).collect()[0][0]
    if mx is None:
        return per_host.select("host", F.lit(0.0).alias("score")).limit(0)
    return per_host.select(
        "host", (F.col("_h") / F.lit(float(mx))).alias("score")
    )
