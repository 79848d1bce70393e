"""Inverted index: positional posting lists + phrase search.

The retrieval-side counterpart of the crawl: once pages are text, the
standard corpus service is a term -> (doc, positions) index. The scale
shape matters more than the algebra:

- Postings are ROW-sharded ``(term, doc_id, tf, positions)`` — never one
  giant array row per term. A stopword's posting list is corpus-sized;
  as one row it breaks the 2 GB column limit and single-tasks every
  consumer, while as rows it spreads across partitions and every
  downstream join partially aggregates. ``term_stats`` gives the
  df/cf summary a query planner needs to start from the rarest term.
- Phrase search is a chain of doc_id equi-joins over per-term posting
  slices (the ``term = w`` filter pushes into the scan), carrying the
  match-position set as an array column and intersecting with the next
  term's positions shifted by one (``array_intersect(transform(prev,
  p -> p + 1), positions)``) — all JVM expression code, proportional to
  the phrase terms' posting sizes, never to the corpus.

Tokenization is ``tokens_expr`` — the same lowercased, empty-filtered
whitespace tokens every other text operator uses, so positions agree
with the dedup/LM/packing token space.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import tokens_expr


def posting_lists(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(term, doc_id, tf, positions)`` — positions sorted ascending.

    One shuffle keyed ``(term, doc_id)`` with map-side combine; empty and
    whitespace-only documents contribute no rows.
    """
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.expr(tokens_expr(text_col))).alias("pos", "term"),
    )
    return toks.groupBy("term", id_col).agg(
        F.count("*").alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )


def term_stats(postings: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """``(term, df, cf)``: document frequency and collection frequency."""
    return postings.groupBy("term").agg(
        F.count(id_col).alias("df"), F.sum("tf").alias("cf")
    )


def phrase_search(
    postings: DataFrame, phrase: Sequence[str], id_col: str = "doc_id"
) -> DataFrame:
    """Exact-phrase matches: ``(doc_id, n_matches, first_pos)``.

    ``first_pos`` is the token position where the first occurrence of the
    phrase starts. Single-term phrases reduce to the term's postings.
    """
    terms: List[str] = list(phrase)
    if not terms:
        raise ValueError("empty phrase")
    cur = postings.filter(F.col("term") == terms[0]).select(
        F.col(id_col), F.col("positions").alias("match_pos")
    )
    for w in terms[1:]:
        nxt = postings.filter(F.col("term") == w).select(
            F.col(id_col), F.col("positions").alias("_next")
        )
        cur = cur.join(nxt, id_col).select(
            F.col(id_col),
            F.array_intersect(
                F.transform("match_pos", lambda p: p + 1), F.col("_next")
            ).alias("match_pos"),
        ).filter(F.size("match_pos") > 0)
    k = len(terms)
    return cur.select(
        F.col(id_col),
        F.size("match_pos").cast("long").alias("n_matches"),
        (F.array_min("match_pos") - F.lit(k - 1)).cast("int").alias("first_pos"),
    )


def doc_lengths(postings: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """``(doc_id, dl)``: document length in tokens, from the postings.

    One corpus-wide shuffle keyed on the doc id — at index-build time this
    is a sidecar you persist next to the postings; ``bm25_search`` accepts
    it precomputed so per-query work never rescans the whole index.
    """
    return postings.groupBy(id_col).agg(F.sum("tf").alias("dl"))


def bm25_search(
    postings: DataFrame,
    query: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    doc_lens: DataFrame | None = None,
) -> DataFrame:
    """Okapi BM25 ranked retrieval: top-``k`` ``(doc_id, n_terms, score)``.

    Lucene's non-negative idf variant: ``ln((N - df + 0.5)/(df + 0.5) + 1)``;
    duplicate query terms collapse (query term frequency 1). Ties break on
    ascending doc id so the top-k is deterministic.

    Scale shape: the ``term IN (query)`` filter pushes into the postings
    scan, so everything downstream is proportional to the query terms'
    posting sizes — except the one join against ``doc_lens``, which is
    corpus-sized but equi-keyed (AQE turns it into a broadcast when the
    filtered side is small). ``N``/``avgdl`` stay DataFrame-side as a 1-row
    aggregate cross-joined in — no driver collect; the per-term idf table
    (≤ |query| rows) is broadcast. All expression code, no Python UDFs.
    """
    terms: List[str] = sorted(set(query))
    if not terms:
        raise ValueError("empty query")
    if doc_lens is None:
        doc_lens = doc_lengths(postings, id_col)
    qpost = postings.filter(F.col("term").isin(terms))
    g = doc_lens.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    idf = (
        qpost.groupBy("term")
        .agg(F.count(id_col).cast("double").alias("df"))
        .crossJoin(F.broadcast(g))
        .select(
            "term",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            ).alias("idf"),
            "avgdl",
        )
    )
    scored = (
        qpost.join(F.broadcast(idf), "term")
        .join(doc_lens, id_col)
        .select(
            F.col(id_col),
            (
                F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("w"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_terms"), F.sum("w").alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def rrf_fuse(
    rankings: Sequence[tuple],
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al. 2009) of ranked candidate
    lists — the standard way to combine lexical (BM25) and vector
    (cosine) retrieval without score calibration: each list contributes
    ``1 / (c + rank)`` per document and documents missing from a list
    contribute 0.

    ``rankings``: ``(df, score_col)`` pairs; each frame must carry
    ``id_col`` and a DETERMINISTIC score (the engine's rankers round to
    6 decimals — ranks derive from ``(score desc, id asc)``). Inputs
    are top-K candidate lists by construction, so the global rank
    window and the chained full-outer joins here run over bounded rows
    — never the corpus (the corpus-sized work already happened inside
    each ranker).

    Determinism: contributions add in ranking order via an explicitly
    nested expression (never a groupBy sum whose order floats), so the
    fused double is reproducible; output is top-``k`` by ``(rrf_score
    desc, id asc)`` with ``n_lists`` showing how many rankers surfaced
    the doc.
    """
    if not rankings:
        raise ValueError("no rankings to fuse")
    from pyspark.sql import Window

    ranked = []
    for i, (df, score_col) in enumerate(rankings):
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
        ranked.append(
            df.select(
                F.col(id_col),
                F.row_number().over(w).alias(f"_r{i}"),
            )
        )
    out = ranked[0]
    for i, r in enumerate(ranked[1:], start=1):
        out = out.join(r, id_col, "full_outer")
    # explicit double literals: a bare 1.0 parses as DECIMAL in both
    # engines and decimal arithmetic value-hashes differently than double
    contrib = " + ".join(
        f"coalesce(cast(1.0 as double) / ({c} + _r{i}), cast(0.0 as double))"
        for i in range(len(ranked))
    )
    n_lists = " + ".join(
        f"(CASE WHEN _r{i} IS NOT NULL THEN 1 ELSE 0 END)"
        for i in range(len(ranked))
    )
    return (
        out.select(
            id_col,
            F.expr(f"round({contrib}, 9)").alias("rrf_score"),
            F.expr(f"cast({n_lists} as int)").alias("n_lists"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col))
        .limit(k)
    )


def hybrid_search(
    postings: DataFrame,
    embeddings: DataFrame,
    terms: Sequence[str],
    query_vec: Sequence[float],
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    doc_lens: DataFrame | None = None,
) -> DataFrame:
    """Lexical + vector retrieval fused by RRF: BM25 over the positional
    index and exact cosine top-k over the embedding table, each producing
    a bounded candidate list, combined rank-wise. The two rankers keep
    their own scale shapes (term-pushdown postings scan; TakeOrdered
    cosine heap); fusion only ever sees 2k candidate rows."""
    from crawler_spark.operators.similarity import brute_force_topk

    lex = bm25_search(
        postings, terms, k=k, id_col=id_col, doc_lens=doc_lens
    ).select(F.col(id_col), F.round("score", 6).alias("score"))
    vec = brute_force_topk(
        embeddings, query_vec, k=k, id_col=vec_id_col
    ).select(F.col(vec_id_col).alias(id_col), F.col("cosine"))
    return rrf_fuse(
        [(lex, "score"), (vec, "cosine")], k=k, c=c, id_col=id_col
    )
