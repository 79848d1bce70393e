"""Hashed-feature linear classification + importance resampling for
corpus curation.

Two model-based selection operators modern LLM-data pipelines run after
the rule-based filters (Gopher/C4 gates, `operators/filters.py`):

1. ``nb_train`` / ``nb_score`` — a hashed Naive-Bayes text classifier in
   the spirit of fastText's linear models (Joulin et al. 2017) and the
   quality classifiers of GPT-3/LLaMA-style curation ("does this page
   look like the curated seed set?"). Features are whitespace tokens
   routed through the hashing trick (Weinberger et al. 2009) into a
   fixed ``n_buckets``-sized table, so the MODEL SIZE IS A CONSTANT —
   independent of corpus vocabulary — and the scoring join is always a
   broadcast. Training is two count aggregations; no SGD, no iteration,
   bit-deterministic.

2. ``dsir_weights`` / ``dsir_topk`` — Data Selection via Importance
   Resampling (Xie et al. 2023): score every raw document by the
   log-likelihood ratio of a hashed bigram unigram-bag model of the
   TARGET distribution vs the RAW distribution, then keep the top-k.
   This is the published, principled version of "sample raw web text to
   look like Wikipedia"; same hashed-feature machinery, same constant
   model size.

The reference repo has no classifier (its relevance gate is keyword
counting, `/root/reference/crawler/utils.py` keyword_relevance); these
are scale-path additions in SURVEY §2's text-analysis family.

Determinism contract (driver value-hash vs DuckDB): per-bucket
log-ratios are quantized to fixed-point ``cast(round(ln(...) * 1e6) as
bigint)`` and summed as BIGINT per document — partition/summation order
can never change a result (same trick as lm.py / similarity.py). The
only doubles are final per-doc averages, rounded to 6 decimals from
identical integer inputs in both engines.

Scale shape (100 TB corpus):
- training/target counts: one explode + groupBy(bucket) shuffle with
  map-side partial combine; output is ``n_buckets`` rows — constant.
- scoring: one explode, an equi-join against the ALWAYS-BROADCAST
  bucket table (every bucket row exists, so the join never drops a
  token), one groupBy(doc_id) fold with partial aggregation. The
  corpus-sized side never shuffles at token granularity beyond the
  per-doc fold, and nothing here is Python.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import _hash60, tokens_expr
from crawler_spark.operators.lm import bigrams_expr

# fixed-point scale for log-ratios: 1e-6 resolution, exact BIGINT sums
_Q = 1_000_000


def token_buckets_expr(text_col: str, n_buckets: int) -> str:
    """Hashed unigram features: ``array<bigint>`` of token buckets.

    Each token routes to ``hash60(token) % n_buckets`` — the hashing
    trick. Collisions are part of the model (both engines hash
    identically), not an error source.
    """
    toks = tokens_expr(text_col)
    return f"transform({toks}, tk -> pmod({_hash60('tk')}, {n_buckets}))"


def bigram_buckets_expr(text_col: str, n_buckets: int) -> str:
    """Hashed bigram features (DSIR's n-gram bag): buckets of
    ``hash60(prev || ' ' || cur)``. Tokens are whitespace-split, so the
    single-space separator is unambiguous."""
    bgs = bigrams_expr(text_col)
    pair = "concat(bg.prev, ' ', bg.cur)"
    return (
        f"transform({bgs}, bg -> "
        f"pmod({_hash60(pair)}, {n_buckets}))"
    )


@dataclass(frozen=True)
class NBModel:
    """A trained hashed-NB classifier: a ``n_buckets``-row table
    ``(bucket, llr_q)`` plus the quantized class-prior log-ratio.

    ``table`` contains EVERY bucket (unseen buckets carry the smoothed
    ratio ``ln((0+1)/(pos_tot+B)) - ln((0+1)/(neg_tot+B))``), so scoring
    is a total inner join — no null paths."""

    table: DataFrame
    prior_q: int
    n_buckets: int


def nb_train(
    labeled: DataFrame,
    n_buckets: int = 1024,
    text_col: str = "text",
    label_col: str = "label",
) -> NBModel:
    """Train a hashed Naive-Bayes classifier from ``(text, label 0/1)``.

    Per bucket b: ``llr(b) = ln((pos_n+1)/(pos_tot+B)) -
    ln((neg_n+1)/(neg_tot+B))`` with add-one smoothing, quantized to
    fixed-point BIGINT. Totals derive from the bucket table itself (a
    B-sized aggregation) — the corpus is exploded exactly once.

    The class prior ``ln((n_pos_docs+1)/(n_neg_docs+1))`` needs two
    driver-known scalars (the frontier's decide-from-a-count pattern) —
    one tiny agg, not a corpus collect.
    """
    spark = labeled.sparkSession
    ex = labeled.select(
        F.col(label_col).cast("int").alias("y"),
        F.explode(F.expr(token_buckets_expr(text_col, n_buckets))).alias(
            "bucket"
        ),
    )
    counts = ex.groupBy("bucket").agg(
        F.sum("y").cast("bigint").alias("pos_n"),
        F.sum(F.expr("1 - y")).cast("bigint").alias("neg_n"),
    )
    full = (
        spark.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .join(counts, "bucket", "left")
        .fillna(0, ["pos_n", "neg_n"])
    )
    tot = full.agg(
        F.sum("pos_n").alias("pt"), F.sum("neg_n").alias("nt")
    )
    table = (
        full.crossJoin(F.broadcast(tot))
        .withColumn(
            "llr_q",
            F.expr(
                f"cast(round((ln((pos_n + 1) / cast(pt + {n_buckets} as double))"
                f" - ln((neg_n + 1) / cast(nt + {n_buckets} as double)))"
                f" * {_Q}) as bigint)"
            ),
        )
        .select("bucket", "llr_q")
    )
    row = labeled.agg(
        F.sum(F.col(label_col).cast("int")).alias("np"),
        F.count("*").alias("n"),
    ).first()
    n_pos = int(row["np"] or 0)
    n_neg = int(row["n"]) - n_pos
    prior_q = int(round(math.log((n_pos + 1) / (n_neg + 1)) * _Q))
    return NBModel(table=table, prior_q=prior_q, n_buckets=n_buckets)


def nb_score(
    docs: DataFrame,
    model: NBModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document under a trained :class:`NBModel`.

    Adds ``n_feats`` (token count), ``sum_llr_q`` (exact BIGINT evidence
    sum), ``nb_margin`` (prior + evidence, nats, 6 decimals) and
    ``nb_pred`` (1 when the positive class wins). The model table is
    ``n_buckets`` rows — explicitly broadcast, so the corpus never
    shuffles to meet it; the only corpus shuffle is the per-doc fold.
    """
    ex = docs.select(
        F.col(id_col),
        F.explode(
            F.expr(token_buckets_expr(text_col, model.n_buckets))
        ).alias("bucket"),
    )
    scored = ex.join(F.broadcast(model.table), "bucket")
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_feats"),
        F.sum("llr_q").alias("sum_llr_q"),
    )
    return (
        docs.join(per_doc, id_col, "left")
        .withColumn("n_feats", F.coalesce(F.col("n_feats"), F.lit(0)))
        .withColumn(
            "sum_llr_q", F.coalesce(F.col("sum_llr_q"), F.lit(0))
        )
        .withColumn(
            "nb_margin",
            F.expr(
                f"round(({model.prior_q} + sum_llr_q) / cast({_Q} as double), 6)"
            ),
        )
        .withColumn(
            "nb_pred",
            (F.expr(f"{model.prior_q} + sum_llr_q") > 0).cast("int"),
        )
    )


def nb_classifier_gate(
    docs: DataFrame,
    seed: DataFrame,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "label",
) -> DataFrame:
    """Convenience composition: train on ``seed`` (labeled), keep the
    documents the classifier calls positive — the GPT-3/LLaMA curation
    shape ("train on curated-vs-raw, keep pages scored curated")."""
    model = nb_train(seed, n_buckets, text_col, label_col)
    return nb_score(docs, model, text_col, id_col).filter(
        F.col("nb_pred") == 1
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 8192,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR log importance weights for every raw document.

    Hashed-bigram bag model: ``lw(doc) = Σ_f ln(p_target(f)/p_raw(f))``
    over the document's bigram features, with add-one smoothing over the
    ``n_buckets``-sized feature space. Returns ``raw`` plus ``n_feats``
    and ``sum_lw_q`` (exact BIGINT) and ``log_w`` (6-decimal nats).

    Plan shape: two bucket-count shuffles (target + raw, both emitting
    B-sized tables), then one broadcast join + per-doc fold over the raw
    side. Docs with < 2 tokens have no features — weight 0, never NULL.
    """
    tgt_ex = target.select(
        F.explode(
            F.expr(bigram_buckets_expr(text_col, n_buckets))
        ).alias("bucket")
    )
    raw_ex = raw.select(
        F.col(id_col),
        F.explode(
            F.expr(bigram_buckets_expr(text_col, n_buckets))
        ).alias("bucket"),
    )
    spark = raw.sparkSession
    t_cnt = tgt_ex.groupBy("bucket").agg(F.count("*").alias("t_n"))
    r_cnt = raw_ex.groupBy("bucket").agg(F.count("*").alias("r_n"))
    full = (
        spark.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .join(t_cnt, "bucket", "left")
        .join(r_cnt, "bucket", "left")
        .fillna(0, ["t_n", "r_n"])
    )
    tot = full.agg(F.sum("t_n").alias("tt"), F.sum("r_n").alias("rt"))
    lr = (
        full.crossJoin(F.broadcast(tot))
        .withColumn(
            "lw_q",
            F.expr(
                f"cast(round((ln((t_n + 1) / cast(tt + {n_buckets} as double))"
                f" - ln((r_n + 1) / cast(rt + {n_buckets} as double)))"
                f" * {_Q}) as bigint)"
            ),
        )
        .select("bucket", "lw_q")
    )
    per_doc = (
        raw_ex.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feats"),
            F.sum("lw_q").alias("sum_lw_q"),
        )
    )
    return (
        raw.join(per_doc, id_col, "left")
        .withColumn("n_feats", F.coalesce(F.col("n_feats"), F.lit(0)))
        .withColumn("sum_lw_q", F.coalesce(F.col("sum_lw_q"), F.lit(0)))
        .withColumn(
            "log_w",
            F.expr(f"round(sum_lw_q / cast({_Q} as double), 6)"),
        )
        .withColumn(
            "avg_lw",
            F.expr(
                f"CASE WHEN n_feats > 0 THEN "
                f"round(sum_lw_q / cast(n_feats as double) / {_Q}, 6) END"
            ),
        )
    )


def dsir_topk(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = 8192,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the ``k`` raw documents most target-like under DSIR weights.

    Ranks by MEAN log-ratio per feature (``avg_lw``), not the raw sum —
    the sum is length-biased (when ratios average negative, an empty doc
    at 0 would outrank every doc with actual evidence). Docs with no
    features rank last (no evidence of target-likeness); ties break by
    exact ``sum_lw_q`` then id, so the selection is deterministic.

    ``orderBy(...).limit(k)`` compiles to ``TakeOrderedAndProject`` —
    each partition keeps a k-sized heap and the driver merges k-sized
    slices, so the global sort never materializes (the same top-k shape
    the ANN operators use)."""
    w = dsir_weights(raw, target, n_buckets, text_col, id_col)
    return w.orderBy(
        F.col("avg_lw").desc_nulls_last(),
        F.col("sum_lw_q").desc(),
        F.col(id_col).asc(),
    ).limit(int(k))
