"""The distributed BFS URL frontier — the engine's flagship operator.

Re-expresses the reference's synchronous FIFO crawl loop
(/root/reference/crawler/enhanced_crawler.py:252-304) as a driver-side wave
loop over DataFrames (SURVEY §3.1): each wave is one Spark job DAG ending in
an atomic WaveCommit. Visit order is carried in data (the
``(parent_seq, link_pos)`` order key), never in physical row order, so
results are byte-identical at any parallelism — the N-vs-4N criterion.

Per wave:

1. politeness rank  — ``row_number() over (partition by host order by
   parent_seq, link_pos) <= budget(host)``; overflow rows defer to the next
   wave unchanged (deferred-not-dropped, the reference's rate-limit
   semantics enhanced_crawler.py:131-153 mapped to token budgets).
2. global cap       — dense visit seq via scalable range-partitioned
   row_number (no global sort), cap at ``max_pages`` (reference W2,
   enhanced_crawler.py:265).
3. fetch join       — frontier x pages corpus on url (the reference's
   network fetch becomes a join per input_hint); small waves broadcast the
   frontier against the corpus scan, big waves sort-merge. Missing URLs
   become error rows that still count as visited
   (enhanced_crawler.py:244-250, :269).
4. extract          — one mapInPandas pass (Arrow-vectorized) producing the
   page record; the fat html binary never leaves this operator.
5. expand           — posexplode(links[:20]) -> domain policy filter
   (enhanced_crawler.py:282-283, quirk preserved) -> robots prefix filter
   (broadcast join) -> first-enqueuer-wins window dedup -> anti-join seen
   -> anti-join deferred (a deferred row keeps its earlier order key).
6. commit           — pages/seen/frontier parquet + manifest rename (the
   atomic commit point), with per-file lineage counters.
"""

from __future__ import annotations

import tempfile
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.core.urls import get_domain
from crawler_spark.frontier.bloom import (
    BloomConfig,
    build_blobs,
    merge_blobs,
    split_by_bloom,
)
from crawler_spark.frontier.checkpoint import WaveCommit, WaveManifest
from crawler_spark.frontier.order import assign_seq
from crawler_spark.operators.extract import (
    domain_of,
    extract_pages,
    page_record_schema,
    robots_allows_udf,
    url_path_of,
)

# DEFAULT_PRIORITY mirrors the reference's no-scorer fallback: every link
# scores a constant 0.5 and the queue degenerates to original order
# (ai_processor.py:516-521) — so the default engine reproduces reference
# visit order exactly, while a CrawlConfig.priority_scorer reorders within
# each host's politeness budget (W3 / north_rule priority queue).
DEFAULT_PRIORITY = 0.5

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("parent_seq", T.LongType()),
        T.StructField("link_pos", T.IntegerType()),
        T.StructField("priority", T.DoubleType()),
    ]
)

# the frontier's total visit order: best priority first, then BFS enqueue
# order — constant priority makes this exactly (parent_seq, link_pos).
# A function because Column construction needs an active SparkContext.
def order_key():
    return [F.desc("priority"), F.asc("parent_seq"), F.asc("link_pos")]

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType())),
        T.StructField("crawl_delay", T.DoubleType()),
    ]
)


@dataclass
class CrawlConfig:
    instructions: Optional[str] = None
    depth: int = 1
    follow_external_links: bool = False
    max_pages: Optional[int] = None
    host_budget: Dict[str, int] = field(default_factory=dict)  # "*" = default
    # table-valued budgets: a DataFrame of (host string, budget int) — the
    # scale-correct seam for planner output (frontier/adaptive.py's
    # adaptive_host_budgets / apportion_budget), where a driver dict would
    # mean collecting 10^6-10^8 hosts. Joined per wave (AQE picks the
    # strategy); composed with the dict and robots-delay budgets via min.
    # Hosts absent from the table fall back to the dict / "*" default.
    host_budget_df: Optional[object] = None
    # W3 priority queue: a pluggable scorer df -> df that sets/overwrites the
    # ``priority`` double column (higher = crawled earlier within a host's
    # budget) on candidate frontier rows (url, host, depth, parent_seq,
    # link_pos, priority). None = the reference's constant-0.5 fallback
    # (ai_processor.py:516-521), which preserves exact reference BFS order.
    priority_scorer: Optional[object] = None
    # LLM-path seam (reference ai_processor.py:152-231): a callable
    # (text_content, title, url, instructions) -> dict with summary /
    # key_points / relevance_score / extracted_data, applied to pages that
    # pass the relevance gate. None = deterministic basic extraction
    # (byte-identical to the reference's no-API-key fallback).
    structured_extractor: Optional[object] = None
    # compute the boilerpipe main_text column on the crawl's one parse
    # (operators/maincontent.py semantics); False keeps the column null
    extract_main_content: bool = False
    # adaptive-signal seam: called once per wave as observer(wave_idx,
    # committed_page_records) AFTER the wave's pages commit and BEFORE new
    # frontier rows are scored — a stateful observer (e.g. frontier/opic.py)
    # updates the state its priority_scorer reads. None = no observation.
    wave_observer: Optional[object] = None
    # URL-rewrite seam, applied to expanded candidate rows BEFORE the
    # domain policy / robots / window dedup / seen anti-join — alias urls
    # (redirect chains via frontier.redirects.redirect_url_rewriter,
    # aggressive canonicalization) collapse to their terminals first, so
    # dedup, politeness, and the seen set all operate on the rewritten
    # url. The callable sees (p_seq, parent_host, p_depth, link_pos, url,
    # host), must keep url and host mutually consistent, and may rewrite
    # but not add rows. None = identity (exact reference behavior).
    url_rewriter: Optional[object] = None
    # robots crawl_delay -> per-wave budget: a wave models this many seconds
    # of polite fetching, so a host with crawl_delay d sustains at most
    # max(1, floor(wave_target_sec / d)) fetches per wave (composed with any
    # explicit budget via min). The reference sleeps between fetches
    # (enhanced_crawler.py:131-153); in wave dataflow the sleep becomes a
    # budget. None disables delay translation.
    wave_target_sec: Optional[float] = 60.0
    # REP meta directives: when True, pages whose <meta name="robots">
    # carries nofollow contribute no frontier links, and individual
    # rel=nofollow links are dropped at expand time (noindex is a sink-side
    # concern — see operators.extract.indexable). False (default) preserves
    # exact reference behavior (the reference has no robots-meta handling).
    respect_meta_robots: bool = False
    fetch_broadcast_threshold: int = 200_000  # rows; waves below this broadcast
    max_waves: int = 10_000
    use_bloom: bool = True  # Bloom prefilter ahead of the exact seen anti-join
    bloom: BloomConfig = field(default_factory=BloomConfig)
    # broadcast the seen hash-key set into the expand anti-join while it fits
    # (8 bytes/url; 2M keys ≈ 16 MB); beyond that it stays a shuffle join
    seen_broadcast_rows: int = 2_000_000
    # seen-membership key. False (default): the exact anti-join is keyed by
    # xxhash64(url) — an accepted-collision design: at the 10^10-URL design
    # point the expected number of colliding pairs is n^2/2^65 ≈ 2.7, i.e.
    # a handful of never-crawled URLs may be wrongly treated as seen over
    # the whole crawl, in exchange for an 8-byte join key whose set
    # broadcasts at sizes the url strings never could. True: key the
    # authority join by the url string itself (collision-free); the Bloom
    # prefilter still runs on hashes, but the string key set is ~8x heavier,
    # so broadcasting stops sooner and the anti-join shuffles strings.
    seen_exact_urls: bool = False
    # OR-merge accumulated Bloom blobs into one snapshot every K waves so a
    # long crawl's probe cost stays bounded; 0 = never compact
    bloom_compact_every: int = 8
    # per-wave top-K host histogram recorded in the manifest (A5): the
    # hot-host signal that drives politeness_salt choice and skew monitoring.
    # 0 (default) disables — it costs one small job per wave, which matters
    # for micro-crawls; the spark-submit CLI turns it on by default.
    host_histogram_topk: int = 0
    # politeness skew: salt factor for the per-host budget rank. 1 = single
    # window per host (fine when no host dominates); >1 splits each host's
    # rows across `politeness_salt` buckets, takes an exact local top-budget
    # per bucket, then re-ranks the <= salt*budget survivors — identical
    # result, but a hot host's rank no longer serializes on one task. At
    # cluster scale drive this from the wave host histogram (A5 metrics).
    politeness_salt: int = 1

    def budget_default(self) -> Optional[int]:
        return self.host_budget.get("*")

    def has_politeness(self) -> bool:
        return bool(self.host_budget) or self.host_budget_df is not None


@dataclass
class CrawlResult:
    run_dir: str
    waves: int
    pages_crawled: int
    commit: WaveCommit

    def pages(self, spark: SparkSession) -> DataFrame:
        df = self.commit.read_table(spark, "pages")
        assert df is not None
        return df

    def seen(self, spark: SparkSession) -> DataFrame:
        df = self.commit.read_table(spark, "seen")
        assert df is not None
        return df

    def metrics(self) -> List[Dict]:
        return [self.commit.read_manifest(w) for w in self.commit.committed_waves()]


def _seed_frontier(
    spark: SparkSession, seeds: Sequence[str], robots: Optional[DataFrame]
) -> DataFrame:
    rows, seen = [], set()
    for i, u in enumerate(seeds):
        if u in seen:
            continue  # duplicate seeds: first order wins (pop-time skip)
        seen.add(u)
        rows.append((u, get_domain(u), 0, -1, i, DEFAULT_PRIORITY))
    df = spark.createDataFrame(rows, FRONTIER_SCHEMA)
    if robots is not None:
        df = _robots_filter(df, robots)
    return df


def _robots_filter(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop disallowed URLs before they enter the frontier (J6): broadcast
    join on host + vectorized match. Dispatches on the robots table's
    columns: a ``rules`` column (``robots.robots_rules_table``) gets the
    full RFC-9309 semantics — Allow + Disallow, ``*``/``$`` wildcards,
    longest-match precedence — while the legacy ``disallow_prefixes``
    shape keeps the byte-compatible prefix-only path."""
    if "rules" in robots.columns:
        from crawler_spark.frontier.robots import robots_rules_allows_udf

        allows = robots_rules_allows_udf()
        r = F.broadcast(robots.select("host", "rules"))
        joined = frontier.join(r, "host", "left")
        return (
            joined.filter(allows(url_path_of(F.col("url")), F.col("rules")))
            .drop("rules")
        )
    r = F.broadcast(robots.select("host", "disallow_prefixes"))
    joined = frontier.join(r, "host", "left")
    return (
        joined.filter(robots_allows_udf(url_path_of(F.col("url")), F.col("disallow_prefixes")))
        .drop("disallow_prefixes")
    )


def _error_pages(missing: DataFrame) -> DataFrame:
    """Frontier rows with no corpus page -> page-record error rows
    (reference enhanced_crawler.py:244-250 layering), as pure column
    expressions in the exact committed page schema — no extraction kernel,
    no Python."""
    from crawler_spark.core.page import MISSING_PAGE_MESSAGE

    schema = page_record_schema(carry=True)
    cols = []
    for f in schema.fields:
        if f.name == "error":
            cols.append(
                F.format_string(
                    "Failed to crawl page: Failed to crawl %s: "
                    + MISSING_PAGE_MESSAGE,
                    F.col("url"),
                ).alias("error")
            )
        elif f.name in missing.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return missing.select(*cols)




def crawl(
    spark: SparkSession,
    pages_src: DataFrame,
    seeds: Sequence[str],
    config: Optional[CrawlConfig] = None,
    robots: Optional[DataFrame] = None,
    run_dir: Optional[str] = None,
    resume: bool = False,
) -> CrawlResult:
    """Run (or resume) a crawl of ``pages_src`` from ``seeds``.

    ``pages_src`` must have columns (url, warc_ts, html, ...) — the
    input_hint corpus shape. Returns a CrawlResult handle over the committed
    run directory.
    """
    cfg = config or CrawlConfig()
    if run_dir is None:
        run_dir = tempfile.mkdtemp(prefix="crawl_run_")
    ck = WaveCommit(run_dir)

    start_hosts = sorted({get_domain(u) for u in seeds})

    # --- budget lookup plan (broadcast map; empty -> politeness disabled) ---
    budget_rows = [(h, b) for h, b in cfg.host_budget.items() if h != "*"]
    default_budget = cfg.budget_default()
    budget_tbl = None
    if cfg.host_budget_df is not None:
        budget_tbl = cfg.host_budget_df.select(
            "host", F.col("budget").cast("int").alias("_tbl_budget")
        )

    # --- resume or init -------------------------------------------------------
    last = ck.last_committed() if resume else None
    pending_blobs = None  # rebuilt-at-resume blobs not yet persisted
    if last is not None:
        m = ck.read_manifest(last)
        next_seq = m["counters"]["next_seq"]
        wave = last + 1
        frontier = ck.read_table(spark, "frontier", waves=[wave])
        if frontier is None:
            frontier = spark.createDataFrame([], FRONTIER_SCHEMA)
        # contributing bloom waves: recorded at each commit (compaction
        # collapses the list); fall back to every committed bloom table for
        # manifests written before the field existed
        bloom_waves = m["counters"].get(
            "bloom_waves",
            [
                w
                for w in ck.committed_waves()
                if "bloom" in ck.read_manifest(w).get("tables", {})
            ],
        )
        blob_paths = [
            p
            for p in (ck.table_wave_dir("bloom", w) for w in bloom_waves)
            if ck.fs.exists(p)
        ]
        blobs = spark.read.parquet(*blob_paths) if blob_paths else None
        if cfg.use_bloom:
            # coverage check: every committed seen wave must be reflected in
            # the blob set, else a URL seen in an uncovered wave (e.g. waves
            # run with use_bloom=False, or a pre-sidecar run) would probe as
            # definitely-new, bypass the exact anti-join and be re-crawled.
            # On a gap, rebuild from the full seen table and keep the rebuilt
            # blobs pending so the next wave commit persists the coverage.
            seen_waves = {
                w
                for w in ck.committed_waves()
                if "seen" in ck.read_manifest(w).get("tables", {})
            }
            if blobs is None or (seen_waves - set(bloom_waves)):
                seen_prev = ck.read_table(spark, "seen")
                if seen_prev is not None:
                    blobs = build_blobs(seen_prev.select("url_hash"), cfg.bloom)
                    pending_blobs = blobs
                    bloom_waves = []
    else:
        next_seq = 0
        wave = 0
        frontier = _seed_frontier(spark, seeds, robots)
        blobs = None
        bloom_waves: List[int] = []

    if "priority" not in frontier.columns:
        # frontier parquet committed before the priority column existed
        frontier = frontier.withColumn(
            "priority", F.lit(DEFAULT_PRIORITY).cast("double")
        )

    pages_cols = [c for c in ("url", "warc_ts", "html") if c in pages_src.columns]
    corpus = pages_src.select(*pages_cols)

    # robots crawl_delay -> per-host per-wave budget column (broadcast join).
    # One tiny driver-side probe decides whether any delay exists at all, so
    # delay-free crawls pay zero extra joins per wave.
    delays = None
    if robots is not None and cfg.wave_target_sec is not None:
        d = robots.filter(F.col("crawl_delay") > 0).select("host", "crawl_delay")
        if d.limit(1).count() > 0:
            delays = d.withColumn(
                "_delay_budget",
                F.greatest(
                    F.floor(F.lit(float(cfg.wave_target_sec)) / F.col("crawl_delay")),
                    F.lit(1),
                ).cast("int"),
            ).select("host", "_delay_budget")

    while wave < cfg.max_waves:
        if cfg.max_pages is not None and next_seq >= cfg.max_pages:
            break
        phase_sec: Dict[str, float] = {}
        _t0 = time.perf_counter()

        def _mark(name: str) -> None:
            nonlocal _t0
            now = time.perf_counter()
            phase_sec[name] = round(now - _t0, 3)
            _t0 = now

        # ---- 1. politeness: per-host budget rank --------------------------
        # effective budget = min(explicit host budget, robots-delay budget);
        # rank order is the priority queue key (priority desc, then BFS
        # enqueue order) — with the default constant priority this is the
        # exact reference BFS order.
        if cfg.has_politeness() or delays is not None:
            if budget_rows:
                bmap = F.create_map(
                    *[x for h, b in budget_rows for x in (F.lit(h), F.lit(b))]
                )
                budget_col = F.coalesce(
                    bmap[F.col("host")],
                    F.lit(default_budget).cast("int"),
                    F.lit(2_147_483_647),
                )
            else:
                budget_col = F.coalesce(
                    F.lit(default_budget).cast("int"), F.lit(2_147_483_647)
                )
            wave_in = frontier
            if delays is not None:
                wave_in = wave_in.join(F.broadcast(delays), "host", "left")
                budget_col = F.least(
                    budget_col,
                    F.coalesce(F.col("_delay_budget"), F.lit(2_147_483_647)),
                )
            if budget_tbl is not None:
                # no forced broadcast: a planner table can be 10^8 hosts —
                # AQE picks broadcast vs shuffle from actual size
                wave_in = wave_in.join(budget_tbl, "host", "left")
                budget_col = F.least(
                    budget_col,
                    F.coalesce(F.col("_tbl_budget"), F.lit(2_147_483_647)),
                )
            fcols = [f.name for f in FRONTIER_SCHEMA.fields]
            if cfg.politeness_salt > 1:
                # hot-host skew split (§4.3 #2): exact local top-budget per
                # (host, salt) bucket, then the true rank over the <=
                # salt*budget survivors — result identical to the single
                # window, but no single task sees a hot host's full frontier
                salt = F.pmod(F.xxhash64("url"), F.lit(cfg.politeness_salt))
                w_bucket = Window.partitionBy("host", "_salt").orderBy(*order_key())
                staged = wave_in.withColumn("_salt", salt).withColumn(
                    "_brank", F.row_number().over(w_bucket)
                )
                staged = staged.persist()
                survivors = staged.filter(F.col("_brank") <= budget_col)
                w_host = Window.partitionBy("host").orderBy(*order_key())
                ranked = survivors.withColumn(
                    "_hrank", F.row_number().over(w_host)
                ).persist()
                taken0 = ranked.filter(F.col("_hrank") <= budget_col).select(*fcols)
                deferred = (
                    staged.filter(F.col("_brank") > budget_col)
                    .select(*fcols)
                    .unionByName(
                        ranked.filter(F.col("_hrank") > budget_col).select(*fcols)
                    )
                )
            else:
                w_host = Window.partitionBy("host").orderBy(*order_key())
                staged = None
                ranked = wave_in.withColumn(
                    "_hrank", F.row_number().over(w_host)
                ).persist()
                taken0 = ranked.filter(F.col("_hrank") <= budget_col).select(*fcols)
                deferred = ranked.filter(F.col("_hrank") > budget_col).select(*fcols)
        else:
            ranked = None
            staged = None
            taken0 = frontier
            deferred = spark.createDataFrame([], FRONTIER_SCHEMA)

        # ---- 2. dense visit seq + global max_pages cap ---------------------
        with_seq = assign_seq(taken0, order_key(), offset=next_seq)
        wave_total = with_seq._assign_seq_total  # free from the offset pass
        if cfg.max_pages is not None:
            taken = with_seq.filter(F.col("seq") < cfg.max_pages)
            overflow = with_seq.filter(F.col("seq") >= cfg.max_pages).drop("seq")
            deferred = deferred.unionByName(overflow)
            taken_count = max(0, min(wave_total, cfg.max_pages - next_seq))
        else:
            taken = with_seq
            taken_count = wave_total

        # ---- 3. fetch join --------------------------------------------------
        taken = taken.withColumn("wave", F.lit(wave))
        _mark("rank_seq")
        if taken_count == 0:
            _cleanup(ranked, staged, with_seq)
            break

        if taken_count <= cfg.fetch_broadcast_threshold:
            # broadcast the wave against the corpus scan: one streaming pass
            # over pages (scan -> join -> extract -> parquet, nothing
            # persisted — the fat html column lives only inside this
            # pipeline); misses are recovered afterwards against the small
            # committed url set and appended as error rows (reference
            # enhanced_crawler.py:244-250), entirely JVM-side
            found = corpus.join(F.broadcast(taken), "url", "inner")
            parsed = extract_pages(found, instructions=cfg.instructions, carry=True,
                                   structured_extractor=cfg.structured_extractor,
                                   main_content=cfg.extract_main_content)
            pages_path = ck.write_table(parsed, "pages", wave)
            # miss detection is free: the write's row count (parquet
            # footers locally, one job remotely) already equals taken_count
            # when every url resolved — the read-back + anti-join + error
            # append only runs on actual misses, not once per wave
            pages_lineage = ck.lineage_of(spark, pages_path)
            if sum(e["rows"] for e in pages_lineage) < taken_count:
                found_urls = spark.read.parquet(pages_path).select("url")
                missing = taken.join(F.broadcast(found_urls), "url", "left_anti")
                _error_pages(missing).write.mode("append").parquet(pages_path)
                pages_lineage = ck.lineage_of(spark, pages_path)
        else:
            # big wave: shuffle join on url; misses surface as null html and
            # become error rows inside the extraction kernel
            fetched = taken.join(corpus, "url", "left")
            parsed = extract_pages(fetched, instructions=cfg.instructions, carry=True,
                                   structured_extractor=cfg.structured_extractor,
                                   main_content=cfg.extract_main_content)
            pages_path = ck.write_table(parsed, "pages", wave)
            pages_lineage = ck.lineage_of(spark, pages_path)
        _mark("fetch_extract_write")
        # deliberately NOT cached: each consumer (observer, seen
        # projection, host histogram, expand base) takes a COLUMN-PRUNED
        # parquet scan of the committed wave, and a persist() here
        # materializes every column (markdown included) through the block
        # store — measured at 1M pages it cut 8-core crawl throughput 34%
        # and N->4N efficiency 0.90 -> 0.70 (tools/scaling_bench.py)
        parsed_c = spark.read.parquet(pages_path)

        if cfg.wave_observer is not None:
            # the observer sees the committed records (stable parquet
            # read-back), so its state updates replay identically on resume
            cfg.wave_observer(wave, parsed_c)

        seen_wave = parsed_c.select(
            "url",
            F.xxhash64("url").alias("url_hash"),
            "seq",
            "wave",
            "depth",
            "host",
        )
        seen_path = ck.write_table(seen_wave, "seen", wave)
        _mark("seen_write")

        # Bloom sidecar: incremental — each wave commits only its own blobs
        # and the probe ORs a bucket's blobs across waves on the fly, so no
        # merge sits on the critical path; every ``bloom_compact_every``
        # waves the accumulated blobs are OR-merged into one snapshot so
        # probe cost stays bounded on long crawls.
        if cfg.use_bloom:
            wave_blobs = build_blobs(
                spark.read.parquet(seen_path).select("url_hash"), cfg.bloom
            )
            if pending_blobs is not None:
                # resume-rebuilt coverage (bloom-off waves / pre-sidecar
                # runs): fold it into this wave's blob write so the rebuild
                # is persisted once, then forgotten
                wave_blobs = merge_blobs(pending_blobs, wave_blobs)
                pending_blobs = None
                bloom_waves = []
            if (
                cfg.bloom_compact_every > 0
                and bloom_waves
                and len(bloom_waves) + 1 >= cfg.bloom_compact_every
            ):
                prev = spark.read.parquet(
                    *[ck.table_wave_dir("bloom", w) for w in bloom_waves]
                )
                to_write = merge_blobs(prev, wave_blobs)
                bloom_waves = []
            else:
                to_write = wave_blobs
            bloom_path = ck.write_table(to_write, "bloom", wave)
            bloom_waves = bloom_waves + [wave]
            blobs = spark.read.parquet(
                *[ck.table_wave_dir("bloom", w) for w in bloom_waves]
            )
        else:
            bloom_path = None
        _mark("bloom")

        # ---- 6. expand -------------------------------------------------------
        if cfg.depth > 0:
            base = parsed_c.filter(
                (F.col("depth") < cfg.depth)
                & F.col("error").isNull()
                & (F.size("links") > 0)
            )
            meta_robots = (
                cfg.respect_meta_robots
                and "robots_nofollow" in parsed_c.columns
            )
            if meta_robots:
                # REP page-level nofollow: the page's links never enter the
                # frontier (row filter — cheaper than exploding then
                # dropping every child)
                base = base.filter(
                    ~F.coalesce(F.col("robots_nofollow"), F.lit(False))
                )
            meta_cols = [
                F.col("seq").alias("p_seq"),
                F.col("host").alias("parent_host"),
                F.col("depth").alias("p_depth"),
            ]
            if "link_hosts" in parsed_c.columns:
                # hosts were computed at extraction time (where the urls
                # already sat in Python) — the expand path stays fully
                # JVM-side even at millions of candidate links
                zip_cols = ["links", "link_hosts"] + (
                    ["link_nofollow"]
                    if meta_robots and "link_nofollow" in parsed_c.columns
                    else []
                )
                cand = base.select(
                    *meta_cols,
                    F.posexplode(F.arrays_zip(*zip_cols)).alias(
                        "link_pos", "_lz"
                    ),
                )
                if len(zip_cols) == 3:
                    # REP link-level rel=nofollow: flagged links drop;
                    # links past the aligned flag array keep (conservative
                    # toward crawling, matches links[:20] truncation)
                    cand = cand.filter(
                        ~F.coalesce(F.col("_lz.link_nofollow"), F.lit(False))
                    )
                cand = cand.select(
                    "p_seq",
                    "parent_host",
                    "p_depth",
                    "link_pos",
                    F.col("_lz.links").alias("url"),
                    F.col("_lz.link_hosts").alias("host"),
                )
            else:  # pages committed before link_hosts existed
                cand = base.select(
                    *meta_cols,
                    F.posexplode("links").alias("link_pos", "url"),
                ).withColumn("host", domain_of(F.col("url")))
            if cfg.url_rewriter is not None:
                cand = cfg.url_rewriter(cand)
            # P7 domain policy (reference quirk: external never actually
            # reaches third-party domains — only seed hosts when enabled)
            policy = F.col("host") == F.col("parent_host")
            if cfg.follow_external_links:
                policy = policy | F.col("host").isin(start_hosts)
            cand = cand.filter(policy)
            if robots is not None:
                cand = _robots_filter(cand, robots)

            # first-enqueuer-wins within the wave (J3): deterministic window,
            # never bare dropDuplicates
            w_url = Window.partitionBy("url").orderBy("p_seq", "link_pos")
            cand = (
                cand.withColumn("_rn", F.row_number().over(w_url))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )

            # not already seen (J1/J2): Bloom prefilter first — definite
            # misses (most links at scale) skip the exact anti-join; Bloom
            # positives are re-checked by the exact join (the authority), so
            # false positives never drop URLs. waves 0..k inclusive: the
            # current wave's seen parquet is written but not yet
            # manifest-committed, so list it explicitly
            seen_all = ck.read_table(spark, "seen", waves=list(range(wave + 1)))
            if seen_all is not None:
                # membership is keyed by xxhash64(url) (the north_rule's
                # seen-set semantics): an 8-byte key whose set broadcasts at
                # sizes where the url strings could not. The seen row count
                # (= next_seq + this wave) is known driver-side, so the
                # broadcast decision needs no stats estimation.
                # seen_exact_urls keys the authority join by url string
                # (collision-free) instead of the 8-byte hash — see the
                # CrawlConfig field for the accepted-collision arithmetic
                key = "url" if cfg.seen_exact_urls else "url_hash"
                seen_keys = seen_all.select(key)
                broadcast_rows = cfg.seen_broadcast_rows // (
                    8 if cfg.seen_exact_urls else 1
                )
                if next_seq + taken_count <= broadcast_rows:
                    seen_keys = F.broadcast(seen_keys)
                cand = cand.withColumn("url_hash", F.xxhash64("url"))
                if cfg.use_bloom and blobs is not None:
                    definite_new, suspect = split_by_bloom(cand, blobs, cfg.bloom)
                    checked = suspect.join(seen_keys, key, "left_anti")
                    cand = definite_new.unionByName(checked).drop("url_hash")
                else:
                    cand = cand.join(seen_keys, key, "left_anti").drop(
                        "url_hash"
                    )
            # a deferred row keeps its earlier (better) order key
            cand = cand.join(deferred.select("url"), "url", "left_anti")

            new_rows = cand.select(
                "url",
                "host",
                (F.col("p_depth") + 1).alias("depth"),
                F.col("p_seq").alias("parent_seq"),
                "link_pos",
                F.lit(DEFAULT_PRIORITY).cast("double").alias("priority"),
            )
            if cfg.priority_scorer is not None:
                # W3 seam: the scorer sees (url, host, depth, parent_seq,
                # link_pos, priority) and overwrites ``priority`` — a column
                # expression or a model-backed pandas UDF both fit. Scores
                # are clamped to [0, 1] like the reference's
                # (ai_processor.py:509-514 normalization).
                new_rows = cfg.priority_scorer(new_rows)
                new_rows = new_rows.select(
                    *[f.name for f in FRONTIER_SCHEMA.fields]
                ).withColumn(
                    "priority",
                    F.least(
                        F.lit(1.0),
                        F.greatest(
                            F.lit(0.0),
                            F.coalesce(
                                F.col("priority").cast("double"),
                                F.lit(DEFAULT_PRIORITY),
                            ),
                        ),
                    ),
                )
            next_frontier = deferred.select(*[f.name for f in FRONTIER_SCHEMA.fields]).unionByName(new_rows)
        else:
            next_frontier = deferred.select(*[f.name for f in FRONTIER_SCHEMA.fields])

        frontier_path = ck.write_table(next_frontier, "frontier", wave + 1)
        _mark("expand_write")
        # deferred/overflow derive from the cached rank/seq frames; only now
        # that the frontier parquet is materialized is it safe to unpersist
        _cleanup(ranked, staged, with_seq)

        # ---- 7. manifest commit (the atomic point) -------------------------
        next_seq += taken_count
        frontier_lineage = ck.lineage_of(spark, frontier_path)
        frontier_rows = sum(e["rows"] for e in frontier_lineage)
        if cfg.host_histogram_topk > 0:
            # A5: hot-host histogram from the wave's committed seen rows
            # (orderBy+limit => TakeOrderedAndProject, no global sort).
            # The seen table is the narrow projection, so this scan reads
            # one small column — see the parsed_c no-cache note above.
            hist_rows = (
                spark.read.parquet(seen_path)
                .groupBy("host")
                .count()
                .orderBy(F.col("count").desc(), "host")
                .limit(cfg.host_histogram_topk)
                .collect()
            )
            host_histogram = {r["host"]: r["count"] for r in hist_rows}
        else:
            host_histogram = {}
        manifest = WaveManifest(
            wave=wave,
            counters={
                "taken": taken_count,
                "next_seq": next_seq,
                "frontier_next": frontier_rows,
                "phase_sec": phase_sec,
                "hosts_top": host_histogram,
                "bloom_waves": bloom_waves,
            },
            lineage={
                "pages": pages_lineage,
                "seen": ck.lineage_of(spark, seen_path),
                "frontier_next": frontier_lineage,
                **(
                    {"bloom": ck.lineage_of(spark, bloom_path)}
                    if bloom_path is not None
                    else {}
                ),
            },
            tables={
                "pages": f"pages/wave={wave}",
                "seen": f"seen/wave={wave}",
                "frontier": f"frontier/wave={wave + 1}",
                **(
                    {"bloom": f"bloom/wave={wave}"}
                    if bloom_path is not None
                    else {}
                ),
            },
            config={
                "instructions": cfg.instructions,
                "depth": cfg.depth,
                "follow_external_links": cfg.follow_external_links,
                "max_pages": cfg.max_pages,
                "host_budget": cfg.host_budget,
                "seeds": list(seeds),
            },
        )
        ck.commit(manifest)

        frontier = spark.read.parquet(frontier_path)
        wave += 1
        if frontier_rows == 0:
            break

    return CrawlResult(
        run_dir=run_dir, waves=wave, pages_crawled=next_seq, commit=ck
    )


def _cleanup(*dfs) -> None:
    for df in dfs:
        if df is None:
            continue
        cache = getattr(df, "_assign_seq_cache", None)
        if cache is not None:
            cache.unpersist()
        try:
            if df.is_cached:
                df.unpersist()
        except Exception:
            pass
