"""Deterministic corpus data card: the release-note artifact for a
training corpus (Gebru et al. 2021 "Datasheets for Datasets", the
quantitative half).

Every released corpus ships with a card answering: how big, in what
languages, from which sources, how duplicated, how long are the
documents. This sink computes those numbers as a handful of bounded
aggregations and renders one markdown artifact:

- volume: exact BIGINT counts (docs, tokens, chars, sources, languages);
- token-length percentiles from the DDSketch quantile sketch
  (`sketch.qsk_*` — bounded counter shuffle, bucket lower bounds);
- per-language and per-source tables with token shares and per-source
  exact-duplicate fractions (content-hash groupBy — the one corpus-keyed
  shuffle, carrying hashes only);
- corpus exact-duplicate fraction and an HLL distinct-token estimate
  (register tables, never a token shuffle).

Determinism contract: counts are exact integers; every ratio is
``round(x, 4)`` cast through DECIMAL so both engines print identical
strings ('0.7000', never '0.7' vs '7.0E-1'); the HLL estimate is the
sketch module's rounded-6 double through DECIMAL(20,6). The stats table
(`corpus_card_stats`) is the oracle surface (gate `data_card_docs`); the
markdown rendering is a driver-side join of those <= (5 + 3 + #langs +
top_sources + 2) rows, byte-pinned in pytest.

The reference exports a per-crawl markdown report
(`/root/reference/crawler/enhanced_crawler.py:448-492`); the data card
is the corpus-level counterpart the training pipeline needs.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import _hash60, tokens_expr

_CARD_COLS = ("ord", "section", "k", "v")


def _dec4(expr: str) -> str:
    return f"cast(cast(round({expr}, 4) as decimal(20, 4)) as string)"


def _int_s(expr: str) -> str:
    return f"cast(cast({expr} as bigint) as string)"


def corpus_card_stats(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    lang_col: Optional[str] = "lang",
    top_sources: int = 20,
) -> DataFrame:
    """The card's numbers as ordered ``(ord, section, k, v)`` rows — all
    strings, formatted identically in Spark and DuckDB (see module
    docstring). ``ord`` pins the render order; the row set is the
    deterministic value contract.

    When ``lang_col`` is absent/None the heuristic ``lang_id`` column is
    derived first. ``top_sources`` caps the per-source table (ties break
    to the lexicographically smaller source); languages are never capped
    (web corpora have dozens, not millions)."""
    from crawler_spark.operators.sketch import (
        hll_distinct,
        qsk_build,
        qsk_quantiles,
    )

    spark = docs.sparkSession
    if lang_col is None or lang_col not in docs.columns:
        from crawler_spark.operators.text_analysis import lang_id

        docs = lang_id(docs, text_col=text_col, out_col="_card_lang")
        lang_col = "_card_lang"

    base = docs.select(
        F.col(source_col).alias("_src"),
        F.col(lang_col).alias("_lang"),
        F.expr(f"size({tokens_expr(text_col)})").cast("long").alias("_tok"),
        F.expr(f"length(coalesce({text_col}, ''))").cast("long").alias("_chr"),
        F.expr(_hash60(f"coalesce({text_col}, '')")).alias("_ch"),
    )
    base = base.persist()
    vol = base.agg(
        F.count("*").alias("docs"),
        F.sum("_tok").alias("tokens"),
        F.sum("_chr").alias("chars"),
        F.countDistinct("_src").alias("sources"),
        F.countDistinct("_lang").alias("languages"),
    ).select(
        F.expr(
            "stack(5, "
            f"0L, 'volume', 'docs', {_int_s('docs')}, "
            f"1L, 'volume', 'tokens', {_int_s('tokens')}, "
            f"2L, 'volume', 'chars', {_int_s('chars')}, "
            f"3L, 'volume', 'sources', {_int_s('sources')}, "
            f"4L, 'volume', 'languages', {_int_s('languages')}"
            ") as (ord, section, k, v)"
        )
    )

    qs = qsk_quantiles(qsk_build(base, [], "_tok"), [])
    lens = qs.select(
        F.expr(
            "stack(3, "
            f"10L, 'length_tokens', 'p50', {_dec4('p50')}, "
            f"11L, 'length_tokens', 'p90', {_dec4('p90')}, "
            f"12L, 'length_tokens', 'p99', {_dec4('p99')}"
            ") as (ord, section, k, v)"
        )
    )

    tot = base.agg(
        F.sum("_tok").alias("_tot_tok"), F.count("*").alias("_tot_docs")
    )
    langs = (
        base.groupBy("_lang")
        .agg(F.count("*").alias("docs"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.lit(20).cast("long").alias("ord"),
            F.lit("language").alias("section"),
            F.col("_lang").alias("k"),
            F.expr(
                "concat('docs=', " + _int_s("docs") + ", ' share=', "
                + _dec4("docs / cast(_tot_docs as double)") + ")"
            ).alias("v"),
        )
    )

    src = (
        base.groupBy("_src")
        .agg(
            F.count("*").alias("docs"),
            F.sum("_tok").alias("tokens"),
            F.countDistinct("_ch").alias("uniq"),
        )
        .withColumn(
            "_rn",
            F.expr(
                "row_number() over (order by tokens desc, _src)"
            ),
        )
        .where(F.col("_rn") <= top_sources)
        .crossJoin(F.broadcast(tot))
        .select(
            (F.lit(30) + F.col("_rn")).cast("long").alias("ord"),
            F.lit("source").alias("section"),
            F.col("_src").alias("k"),
            F.expr(
                "concat('docs=', " + _int_s("docs")
                + ", ' tokens=', " + _int_s("tokens")
                + ", ' share=', "
                + _dec4("tokens / cast(_tot_tok as double)")
                + ", ' dup=', "
                + _dec4("(docs - uniq) / cast(docs as double)")
                + ")"
            ).alias("v"),
        )
    )

    dup = (
        base.groupBy("_ch")
        .agg(F.count("*").alias("n"))
        .agg(F.sum("n").alias("docs"), F.count("*").alias("uniq"))
        .select(
            F.expr(
                "stack(1, 1000L, 'duplication', 'exact_dup_frac', "
                + _dec4("(docs - uniq) / cast(docs as double)")
                + ") as (ord, section, k, v)"
            )
        )
    )

    toks = docs.select(
        F.explode(F.expr(tokens_expr(text_col))).alias("_t")
    )
    hll = hll_distinct(toks, [], "_t").select(
        F.expr(
            "stack(1, 1001L, 'duplication', 'distinct_tokens_est', "
            "cast(cast(round(hll_est, 6) as decimal(20, 6)) as string)"
            ") as (ord, section, k, v)"
        )
    )

    out = vol.unionByName(lens).unionByName(langs).unionByName(src)
    out = out.unionByName(dup).unionByName(hll)
    # the card is terminal and bounded (5 + 3 + #langs + top_sources + 2
    # rows): materialize NOW so the persisted base actually feeds every
    # section exactly once, then release it — returning the lazy union
    # would recompute the full scan per section after unpersist
    schema = out.schema
    rows = out.collect()
    base.unpersist(blocking=False)
    return spark.createDataFrame(rows, schema)


def render_data_card(stats: DataFrame, name: str = "corpus") -> str:
    """One markdown artifact from the stats rows. Driver-side over the
    bounded row set; byte-stable given the same stats."""
    rows = stats.orderBy("ord", "k").collect()
    by_sec: dict = {}
    for r in rows:
        by_sec.setdefault(r.section, []).append(r)
    out = [f"# Data Card: {name}"]
    titles = [
        ("volume", "Volume"),
        ("length_tokens", "Tokens per document"),
        ("language", "Languages"),
        ("source", "Sources (top by tokens)"),
        ("duplication", "Duplication"),
    ]
    for sec, title in titles:
        if sec not in by_sec:
            continue
        out.append(f"\n## {title}\n")
        for r in by_sec[sec]:
            out.append(f"- **{r.k}:** {r.v}")
    return "\n".join(out) + "\n"


def write_data_card(
    docs: DataFrame,
    path: str,
    name: str = "corpus",
    **kwargs,
) -> str:
    """Compute, render and write ``{path}`` (a single markdown file via
    the storage-agnostic run-fs helper). Returns the markdown."""
    from crawler_spark.frontier.fs import run_fs

    md = render_data_card(corpus_card_stats(docs, **kwargs), name)
    run_fs(path).write_text_atomic(path, md)
    return md
