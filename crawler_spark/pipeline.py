"""End-to-end composition: crawl -> documents -> curate/decontaminate/
dedup/mix -> (optionally) packed pretraining sequences, on one run-dir.

This is the engine's whole reason to exist in one call: the reference
crawls and exports markdown for a human; a training pipeline crawls,
extracts, filters, and emits a token-budgeted training set. Every stage
here is an already-oracled operator — this module only wires the crawl's
committed pages table into the documents shape the corpus operators
expect and composes them.

Document mapping (crawled page -> documents row):
- ``doc_id``   = xxhash64(url) — the engine's canonical 8-byte page key,
- ``text``     = the extracted structured markdown (P5 output; error rows
  and sub-gate pages with NULL markdown are dropped — they carry no text),
- ``source``   = host (the mixing/reputation unit of a web corpus),
- ``n_chars``  = length(text).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def pages_to_documents(pages: DataFrame, text_col: str = "markdown") -> DataFrame:
    """Committed crawl pages -> the documents shape every corpus operator
    consumes (see module docstring for the column mapping).

    ``text_col="main_text"`` trains on the boilerpipe main-content strip
    instead of the reference-exact structured markdown — the crawl must
    have run with ``CrawlConfig.extract_main_content=True``. ``main_text``
    is populated ONLY for pages that pass the relevance gate (it is
    gated together with ``markdown`` in the extraction kernel), so both
    text sources admit the identical page population; all-boilerplate
    survivors yield '' and are additionally dropped here."""
    keep = F.col(text_col).isNotNull()
    if text_col == "main_text":
        keep = keep & (F.col(text_col) != "")
    return (
        pages.filter(F.col("error").isNull() & keep)
        .select(
            F.xxhash64("url").alias("doc_id"),
            F.col(text_col).alias("text"),
            F.col("host").alias("source"),
            F.length(text_col).cast("bigint").alias("n_chars"),
        )
    )


def crawl_to_training_set(
    spark: SparkSession,
    corpus: DataFrame,
    seeds: Sequence[str],
    crawl_config,
    run_dir: str,
    token_budget: int,
    weights: Optional[Dict[str, float]] = None,
    eval_docs: Optional[DataFrame] = None,
    min_quality: float = 0.3,
    langs: Optional[Sequence[str]] = None,
    seq_len: Optional[int] = None,
    text_source: str = "markdown",
    **assemble_kwargs,
) -> DataFrame:
    """Crawl ``corpus`` from ``seeds`` (checkpointed waves under
    ``run_dir``), then assemble the committed pages into a token-budgeted
    training set; with ``seq_len`` set, additionally assign block-packed
    sequence bins (``bin_id``/``bin_pos`` columns).

    ``weights`` defaults to uniform over the hosts that actually produced
    documents — computed inside the sampler as a single scalar count, so
    the default path never collects a host list onto the driver (web-scale
    corpora have 10^6-10^8 hosts); pass an explicit small mixture dict to
    weight source groups. ``eval_docs`` (a
    documents-shaped frame) enables benchmark decontamination; omitted,
    nothing is held out. ``langs`` defaults to None (no language gate):
    the marker-word heuristic tags synthetic/markdown-ish text 'unknown',
    and dropping a page for that is a policy choice the caller must make
    explicitly. Returns the surviving rows with full provenance
    (quality, lang_pred, n_tokens, and packing columns when requested).
    """
    from crawler_spark.frontier.bfs import crawl
    from crawler_spark.operators.curation import assemble_training_set
    from crawler_spark.operators.sampling import pack_sequences

    res = crawl(spark, corpus, list(seeds), crawl_config, run_dir=run_dir)
    docs = pages_to_documents(res.pages(spark), text_col=text_source)
    if eval_docs is None:
        eval_docs = spark.createDataFrame([], "doc_id long, text string")
    out = assemble_training_set(
        docs,
        eval_docs,
        weights,
        token_budget,
        min_quality=min_quality,
        langs=langs,
        **assemble_kwargs,
    )
    if seq_len is not None:
        out = pack_sequences(out, seq_len=seq_len, tokens_col="n_tokens")
    return out


def release_stats(sharded: DataFrame) -> DataFrame:
    """Per-source stats table of an assembled + shard-assigned training
    set — the release's gated summary surface (``release_stats_docs``).

    Exact-integer columns only (counts and token sums; shards touched per
    source), so the row set is bit-reproducible across partitionings and
    engines. One shuffle (the groupBy)."""
    return (
        sharded.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.countDistinct("shard").cast("bigint").alias("n_shards"),
            F.min("quality").alias("min_quality"),
        )
    )


def corpus_release(
    spark: SparkSession,
    corpus: DataFrame,
    seeds: Sequence[str],
    crawl_config,
    run_dir: str,
    out_dir: str,
    token_budget: int,
    tokens_per_shard: int,
    weights: Optional[Dict[str, float]] = None,
    eval_docs: Optional[DataFrame] = None,
    min_quality: float = 0.3,
    langs: Optional[Sequence[str]] = None,
    shard_format: str = "parquet",
    name: str = "corpus",
    text_source: str = "markdown",
    layout_bits: int = 5,
    layout_files: int = 16,
    **assemble_kwargs,
) -> Dict:
    """One-command corpus release: crawl -> curate -> assemble -> shards
    -> data card -> Z-order layout, emitting a complete release directory

        {out_dir}/training/      assembled training rows (parquet)
        {out_dir}/shards/        token-balanced trainer shards
        {out_dir}/manifest/      shard integrity manifest (parquet)
        {out_dir}/stats/         per-source release stats (parquet)
        {out_dir}/layout/        (n_tokens, quality)-Z-ordered copy
        {out_dir}/DATA_CARD.md   human-readable data card
        {out_dir}/release.json   the release manifest (atomic write, LAST
                                 — its existence marks a complete release,
                                 the same commit discipline as the wave
                                 manifests)

    Every stage is the library operator the individual jobs/ CLIs expose;
    this wires them into one submit. Returns the release manifest dict.
    """
    import json as _json
    import os as _os

    from crawler_spark.frontier.fs import run_fs
    from crawler_spark.sinks.datacard import write_data_card
    from crawler_spark.sinks.layout import write_zordered
    from crawler_spark.sinks.shards import token_balanced_shards, write_shards

    training = crawl_to_training_set(
        spark, corpus, seeds, crawl_config, run_dir, token_budget,
        weights=weights, eval_docs=eval_docs, min_quality=min_quality,
        langs=langs, text_source=text_source, **assemble_kwargs,
    )
    training_path = _os.path.join(out_dir, "training")
    training.write.mode("overwrite").parquet(training_path)
    # every downstream stage reads the COMMITTED training parquet (stable
    # bytes, column-pruned scans), not the live lineage — the crawl's
    # no-cache discipline applied to the release composition
    tr = spark.read.parquet(training_path)

    sharded = token_balanced_shards(
        tr, tokens_per_shard, tokens_col="n_tokens"
    )
    manifest_df = write_shards(sharded, out_dir, fmt=shard_format)
    shard_rows = manifest_df.agg(
        F.count("*").alias("shards"),
        F.sum("n_docs").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
    ).collect()[0]

    stats_path = _os.path.join(out_dir, "stats")
    release_stats(sharded).coalesce(1).write.mode("overwrite").parquet(
        stats_path
    )

    card_md = write_data_card(
        tr, _os.path.join(out_dir, "DATA_CARD.md"), name=name
    )

    layout_path = _os.path.join(out_dir, "layout")
    thresholds = write_zordered(
        tr,
        layout_path,
        dims=(("n_tokens", "cast(n_tokens as double)"),
              ("quality", "quality")),
        bits=layout_bits,
        n_files=layout_files,
    )

    release = {
        "name": name,
        "token_budget": int(token_budget),
        "tokens_per_shard": int(tokens_per_shard),
        "shards": int(shard_rows["shards"]),
        "docs": int(shard_rows["docs"]),
        "tokens": int(shard_rows["tokens"] or 0),
        "shard_format": shard_format,
        "layout_dims": ["n_tokens", "quality"],
        "layout_thresholds": thresholds,
        "data_card_bytes": len(card_md.encode("utf-8")),
        "tables": {
            "training": "training",
            "shards": "shards",
            "shard_manifest": "manifest",
            "stats": "stats",
            "layout": "layout",
            "data_card": "DATA_CARD.md",
        },
    }
    run_fs(out_dir).write_text_atomic(
        _os.path.join(out_dir, "release.json"),
        _json.dumps(release, sort_keys=True, indent=1),
    )
    return release
