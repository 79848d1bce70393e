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
