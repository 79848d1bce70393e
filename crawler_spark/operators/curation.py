"""Composed training-data curation: quality gate -> language gate -> exact
dedup, as ONE declarative dataflow.

This is the integration the individual operators exist for: a corpus lands
(crawled pages or a documents table) and must be filtered to training-ready
text. Composing the operators as DataFrame transformations — instead of
materializing between stages — lets Catalyst collapse the quality and
language expressions into a single projection over one scan; the only
shuffle in the whole pipeline is the dedup's content-hash aggregation.
`explain()` shows: Scan -> one WholeStageCodegen (tokens/quality/lang) ->
Exchange(content_hash) -> the survivor join. That plan shape is what makes
this run at corpus scale: no intermediate writes, no second scan, no
Python.

Stage semantics (each reuses the already-oracled operator):

1. quality gate  — ``quality_score`` composite >= min_quality
2. language gate — ``lang_id`` prediction in ``langs``
3. exact dedup   — smallest id per identical content survives

``curate`` returns the surviving rows with their quality/language columns
(provenance for downstream sampling); ``curation_stats`` is the per-stage
funnel count — one aggregation pass, the monitoring signal a production
pipeline alerts on.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import exact_dedup
from crawler_spark.operators.text_analysis import lang_id, quality_score


def curate(
    docs: DataFrame,
    min_quality: float = 0.5,
    langs: Optional[Sequence[str]] = ("en",),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality -> language -> exact-dedup survivors, single dataflow.

    Output: (id, lang_pred, quality, text ...) for rows passing all gates,
    deduped to the smallest id per identical content. ``langs=None``
    disables the language gate (rows keep their ``lang_pred`` tag) — the
    right setting for corpora whose text never hits the marker-word
    heuristic (it tags them 'unknown', which is not a reason to drop).
    """
    scored = quality_score(docs, text_col)
    gated = scored.filter(F.col("quality") >= float(min_quality))
    tagged = lang_id(gated, text_col)
    kept = tagged if langs is None else tagged.filter(
        F.col("lang_pred").isin(list(langs))
    )
    return exact_dedup(kept, text_col, id_col)


def curation_stats(
    docs: DataFrame,
    min_quality: float = 0.5,
    langs: Optional[Sequence[str]] = ("en",),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stage funnel: one row (n_input, n_quality, n_lang, n_deduped).

    The first three counts come from ONE aggregation over the scored scan
    (conditional sums — no extra scans); the dedup count is the one
    aggregation the dedup itself needs anyway.
    """
    scored = lang_id(quality_score(docs, text_col), text_col)
    q_ok = F.col("quality") >= float(min_quality)
    l_ok = q_ok if langs is None else (
        q_ok & F.col("lang_pred").isin(list(langs))
    )
    funnel = scored.agg(
        F.count("*").alias("n_input"),
        F.sum(q_ok.cast("long")).alias("n_quality"),
        F.sum(l_ok.cast("long")).alias("n_lang"),
    )
    n_dedup = (
        curate(docs, min_quality, langs, text_col, id_col)
        .agg(F.count("*").alias("n_deduped"))
    )
    return funnel.crossJoin(n_dedup)


def assemble_training_set(
    docs: DataFrame,
    eval_docs: DataFrame,
    weights: Optional[dict],
    token_budget: int,
    min_quality: float = 0.5,
    langs: Optional[Sequence[str]] = ("en",),
    decon_shingle_k: int = 13,
    lsh_num_hashes: int = 16,
    lsh_bands: int = 4,
    lsh_shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """The full corpus-to-training-set pipeline as one dataflow:

    curate (quality -> language -> exact dedup)
      -> decontaminate (drop docs overlapping ``eval_docs`` n-grams)
      -> near-dup dedup (MinHash-LSH pairs -> connected components ->
         smallest id per cluster survives)
      -> token-budget mixing (per-source hash-priority sample to
         weighted shares of ``token_budget``)

    Each stage is the already-oracled operator; composing them
    declaratively lets Catalyst pipeline the projection stages and keeps
    the only shuffles the ones each stage inherently needs (content hash,
    LSH bands, component labels, source windows). Output = surviving rows
    with ``lang_pred``/``quality``/``n_tokens`` provenance.
    """
    from crawler_spark.operators.dedup import (
        minhash_lsh_pairs,
        near_dup_dedup,
    )
    from crawler_spark.operators.sampling import (
        decontaminate,
        sample_to_token_budget,
    )

    curated = curate(docs, min_quality, langs, text_col, id_col)
    clean = decontaminate(
        curated, eval_docs, text_col, id_col, shingle_k=decon_shingle_k
    )
    # Materialize the curated/decontaminated frame BEFORE fanning out into
    # LSH + join-back + sampling. Three consumers would otherwise recompute
    # the gates, and — measured — Catalyst spends ~25 s of pure DRIVER time
    # optimizing the minhash expression over the unmaterialized gate plan
    # (0.2 s over an InMemoryRelation): an Amdahl serial term that capped
    # the pipeline's N->4N scaling at 0.72. One cheap parallel count turns
    # every downstream plan into a scan of the cache.
    clean = clean.persist()
    clean.count()
    pairs = minhash_lsh_pairs(
        clean,
        text_col,
        id_col,
        num_hashes=lsh_num_hashes,
        bands=lsh_bands,
        shingle_k=lsh_shingle_k,
    )
    survivors = near_dup_dedup(clean, pairs, id_col)
    return sample_to_token_budget(
        survivors,
        weights,
        token_budget,
        source_col=source_col,
        id_col=id_col,
        text_col=text_col,
    )


def source_stats(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source reputation aggregates: ``(source, n_docs, n_chars,
    mean_quality, exact_dup_frac)``.

    RefinedWeb/C4-style pipelines gate at the *host* level before paying
    per-document costs — a source whose documents are mostly duplicates or
    mostly low-quality is dropped wholesale. One groupBy(source) shuffle;
    the quality expression fuses into the scan projection (no extra pass)
    and the duplicate count rides the same content-hash used by
    ``exact_dedup``, counted per source with an exact integer.

    Determinism: ``mean_quality`` averages values already rounded to 6
    decimals by ``quality_score``; the sum is quantized to fixed-point
    BIGINT before dividing (same trick as lm.py) so partition order can
    never change the result.
    """
    from crawler_spark.operators.dedup import content_hash

    q = quality_score(docs.select(id_col, source_col, text_col), text_col=text_col)
    h = content_hash(q, text_col=text_col)
    # per (source, content_hash): k occurrences => k - 1 redundant docs
    per_hash = h.groupBy(source_col, "content_hash").agg(
        F.count("*").alias("_k"),
        F.sum("n_chars").alias("_chars"),
        F.sum(F.expr("cast(round(quality * 1000000) as bigint)")).alias("_q_q"),
    )
    return (
        per_hash.groupBy(source_col)
        .agg(
            F.sum("_k").cast("bigint").alias("n_docs"),
            F.sum("_chars").cast("bigint").alias("n_chars"),
            F.expr(
                "round(sum(_q_q) / cast(sum(_k) as double) / 1000000, 6)"
            ).alias("mean_quality"),
            F.expr(
                "round(sum(_k - 1) / cast(sum(_k) as double), 6)"
            ).alias("exact_dup_frac"),
        )
    )


def source_reputation_filter(
    docs: DataFrame,
    min_mean_quality: float = 0.0,
    max_dup_frac: float = 1.0,
    min_docs: int = 1,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep only documents from sources that pass the reputation gates.

    The stats table is sources-sized (tiny next to the corpus), so the
    join back is an explicit broadcast — no corpus shuffle. Schema is the
    input schema plus the source's ``mean_quality`` and ``exact_dup_frac``
    (provenance for downstream sampling weights).
    """
    good = source_stats(docs, source_col, text_col, id_col).filter(
        (F.col("mean_quality") >= F.lit(min_mean_quality))
        & (F.col("exact_dup_frac") <= F.lit(max_dup_frac))
        & (F.col("n_docs") >= F.lit(min_docs))
    ).select(source_col, "mean_quality", "exact_dup_frac")
    return docs.join(F.broadcast(good), source_col)


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source drift report between two corpus snapshots (two pipeline
    runs, two crawl waves, pre-/post- a filter change): how many documents
    were added, removed, kept, or changed, and the token delta each bucket
    carries.

    This is the regression gate a production pipeline runs before
    promoting a new training set — a filter tweak that silently drops 40%
    of one language shows up HERE, not three weeks into a pretraining
    run. (The same role as dataset-card "diff" tables; e.g. the ablation
    bookkeeping in the C4 / RefinedWeb papers.)

    Semantics: rows align on ``id_col`` (full outer join); a kept id with
    different ``text`` bytes is ``changed`` (xxhash64 comparison — content
    identity, the dedup family's rule). Source attribution for removed
    docs uses the OLD row's source, for added/kept/changed the NEW row's.

    Returns one row per ``(source, status)`` with ``n_docs`` and
    ``n_tokens`` (whitespace tokens of the surviving side — old side for
    removed), statuses in {'added', 'removed', 'changed', 'kept'}.

    Scale shape: ONE full outer join on the id (both sides shuffle once on
    the key they are already commonly bucketed by — a bucketed table makes
    this exchange-free), then a group-sized aggregation; token counts are
    row-local expressions. Nothing else moves.
    """
    from crawler_spark.operators.dedup import tokens_expr

    # NULL text hashes as '' so presence (o_h IS NULL = row absent) and
    # content comparison never mix: xxhash64(NULL) would return the seed —
    # a non-null value — making a NULL-vs-'' pair diverge from any SQL
    # oracle's NULL-propagating <>
    nn_text = f"coalesce({text_col}, '')"
    tok_ct = f"size({tokens_expr(nn_text)})"
    o = old.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("o_src"),
        F.xxhash64(F.expr(nn_text)).alias("o_h"),
        F.expr(tok_ct).cast("long").alias("o_tok"),
    )
    n = new.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("n_src"),
        F.xxhash64(F.expr(nn_text)).alias("n_h"),
        F.expr(tok_ct).cast("long").alias("n_tok"),
    )
    j = o.join(n, "id", "full_outer").select(
        F.expr(
            "CASE WHEN o_h IS NULL THEN 'added' "
            "WHEN n_h IS NULL THEN 'removed' "
            "WHEN o_h <> n_h THEN 'changed' ELSE 'kept' END"
        ).alias("status"),
        F.coalesce("n_src", "o_src").alias("source"),
        F.coalesce("n_tok", "o_tok").alias("tok"),
    )
    return j.groupBy("source", "status").agg(
        F.count("*").alias("n_docs"), F.sum("tok").alias("n_tokens")
    )
