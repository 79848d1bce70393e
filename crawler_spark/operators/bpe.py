"""Distributed BPE tokenizer training and encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

Every LLM corpus pipeline ends at a tokenizer, and the tokenizer itself is
trained *from* the corpus — this module closes that loop (``vocab_topk`` in
``text_analysis.py`` is the seed step; this is the full merge-table
training). The reference repo has no tokenizer machinery; the operator set
here is the standard pretraining hand-off.

Scale shape — the part worth getting right:

- Training operates on the **word-frequency table, not the corpus** (the
  original algorithm's own trick). One corpus-sized shuffle builds
  ``(word, freq)``; every one of the ``n_merges`` iterations after that
  touches only the distinct-word table (vocabulary-sized, millions of rows
  at web scale — not trillions). Pair counting is a map-side-combined
  aggregation of that table; the argmax merge is a driver-known single row.
- The per-iteration merge rewrite is a pure column expression
  (``aggregate`` over the symbol array — leftmost-first non-overlapping,
  the published rule), so iterations never leave the JVM; the table is
  ``localCheckpoint``-ed every ``checkpoint_every`` rounds (the
  connected-components pattern in ``operators/dedup.py``; cadence 4
  trades one materialization job per four merge rewrites against a
  <=4-deep nested-HOF plan — at sandbox scale the two cadences measure
  the same within VM noise, at vocabulary scale fewer materializations
  of a millions-row table is the win).
- Real pipelines train on a corpus *sample*: ``sample_frac`` takes a
  deterministic hash-slice of documents (same 60-bit id hash the budget
  sampler uses) — reproducible, partition-independent, no RNG.
- Encoding (the corpus-sized half) is an Arrow-batched ``mapInPandas``
  with the rank table in a broadcast-sized Python dict — per-row greedy
  lowest-rank merging, the exact replay of training order, embarrassingly
  parallel.

Determinism: merge selection orders by ``(pair_freq DESC, left, right)``
— bit-stable at any parallelism; ties resolve lexically, never by
partition layout.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import _hash60, tokens_expr

_EOW = "</w>"


def _merge_in_word(syms, a, b):
    """Column expr: leftmost-first non-overlapping replacement of the
    adjacent symbol pair (a, b) with the fused symbol a||b."""
    acc0 = F.struct(
        F.expr("cast(array() as array<string>)").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, s):
        out, pend = acc["out"], acc["pend"]
        return (
            F.when(pend.isNull(), F.struct(out.alias("out"), s.alias("pend")))
            .when(
                (pend == a) & (s == b),
                F.struct(
                    F.concat(out, F.array(F.concat(pend, s))).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(out, F.array(pend)).alias("out"),
                    s.alias("pend"),
                )
            )
        )

    def finish(acc):
        return F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        )

    return F.aggregate(syms, acc0, step, finish)


def word_freqs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_frac: float | None = None,
) -> DataFrame:
    """The one corpus-sized pass: ``(word, freq)`` over (a deterministic
    hash-slice of) the corpus. Everything downstream is vocab-sized."""
    if sample_frac is not None:
        cut = int(sample_frac * (1 << 30))
        df = df.filter(
            F.pmod(F.expr(_hash60(f"cast({id_col} as string)")), F.lit(1 << 30))
            < F.lit(cut)
        )
    return (
        df.select(F.explode(F.expr(tokens_expr(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_frac: float | None = None,
    min_pair_freq: int = 2,
    checkpoint_every: int = 4,
) -> Tuple[List[Tuple[int, str, str]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges from the corpus.

    Returns ``(merges, symbols)``: ``merges`` is the ranked merge table
    ``[(rank, left, right), ...]`` (driver-side — it IS driver-sized by
    construction, one row per merge), and ``symbols`` the final
    ``(word, freq, syms array<string>)`` segmentation of the training
    vocabulary. Training stops early when no remaining pair reaches
    ``min_pair_freq``.
    """
    words = word_freqs(df, text_col, id_col, sample_frac)
    syms_df = words.withColumn(
        "syms",
        F.expr(
            f"concat(filter(split(word, ''), c -> c != ''), array('{_EOW}'))"
        ),
    ).localCheckpoint()

    pair_expr = (
        "CASE WHEN size(syms) < 2 THEN "
        "cast(array() as array<struct<l:string,r:string>>) "
        "ELSE transform(sequence(1, size(syms) - 1), "
        "i -> struct(syms[i-1] as l, syms[i] as r)) END"
    )
    merges: List[Tuple[int, str, str]] = []
    for rank in range(int(n_merges)):
        top = (
            syms_df.select("freq", F.explode(F.expr(pair_expr)).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top or int(top[0]["n"]) < min_pair_freq:
            break
        a, b = top[0]["l"], top[0]["r"]
        merges.append((rank, a, b))
        syms_df = syms_df.withColumn(
            "syms", _merge_in_word(F.col("syms"), F.lit(a), F.lit(b))
        )
        if (rank + 1) % checkpoint_every == 0:
            syms_df = syms_df.localCheckpoint()  # cut lineage + plan depth
    return merges, syms_df


def bpe_vocab(symbols: DataFrame) -> DataFrame:
    """Final subword vocabulary ``(subword, freq)`` from a trained
    segmentation (the table a trainer's tokenizer config embeds)."""
    return (
        symbols.select("freq", F.explode("syms").alias("subword"))
        .groupBy("subword")
        .agg(F.sum("freq").alias("freq"))
    )


def bpe_encode(
    df: DataFrame,
    merges: List[Tuple[int, str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode every document with a trained merge table: adds
    ``bpe_tokens array<string>`` and ``n_bpe_tokens``.

    Arrow-batched ``mapInPandas``; the rank dict rides the closure (one
    copy per executor, merge tables are ~10^4-10^5 entries). Greedy
    lowest-rank adjacent merging — the standard apply rule, which replays
    training segmentation exactly for in-vocabulary words.
    """
    from pyspark.sql import types as T

    ranks = {(a, b): r for r, a, b in merges}
    out_fields = df.schema.fields + [
        T.StructField("bpe_tokens", T.ArrayType(T.StringType())),
        T.StructField("n_bpe_tokens", T.IntegerType()),
    ]
    schema = T.StructType(out_fields)
    cols = [f.name for f in df.schema.fields]

    def encode_word(word: str) -> List[str]:
        syms = list(word) + [_EOW]
        while len(syms) > 1:
            best, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, best_i = r, i
            if best is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    import re

    # Java regex \s is ASCII-only; Python str.split() is Unicode-wide.
    # Match the JVM tokenizer (tokens_expr) exactly so a doc with exotic
    # whitespace (U+00A0 etc.) segments identically in train and encode.
    ws = re.compile(r"\s+", re.ASCII)

    def run(batches: Iterator) -> Iterator:
        cache: dict = {}
        for pdf in batches:
            toks, ns = [], []
            # fillna BEFORE astype: astype(str) renders a missing value as
            # the literal string 'None', which would encode to phantom
            # ('no'+'ne</w>'-ish) tokens for NULL-text documents
            for text in pdf[text_col].fillna("").astype(str):
                out: List[str] = []
                for w in ws.split(text.lower()):
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = encode_word(w)
                    out.extend(got)
                toks.append(out)
                ns.append(len(out))
            pdf = pdf[cols].copy()
            pdf["bpe_tokens"] = toks
            pdf["n_bpe_tokens"] = ns
            yield pdf

    return df.mapInPandas(run, schema=schema)


def tokenizer_stats(
    encoded: DataFrame,
    by: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group tokenizer-quality report over :func:`bpe_encode` output —
    the numbers a pretraining team actually reads before freezing a
    tokenizer (fertility and compression per source/language; e.g. the
    tokenizer sections of the BLOOM and Llama reports): a tokenizer that
    fragments one language into characters starves it of effective
    context, and the fix (retrain, resize, re-mix) happens HERE, before
    any GPU time is spent.

    Per ``by`` group:

    - ``n_docs``, ``n_words`` (whitespace tokens), ``n_bpe_tokens``,
      ``n_bytes`` (UTF-8 octets of ``text_col``),
    - ``fertility``       = bpe tokens per word (1.0 = every word in
      vocabulary; 2x+ = heavy fragmentation),
    - ``bytes_per_token`` = UTF-8 bytes compressed into each bpe token
      (higher = better compression),
    - ``pct_frag_docs``   = share of DOCS containing at least one word
      split into 2+ pieces.

    ``pct_frag_docs`` is doc-level by design: per-doc
    ``n_bpe_tokens == n_words`` iff EVERY word encoded to one piece, so
    the flag is exact and row-local; a per-WORD fragmentation rate would
    need the encoder to emit per-word piece counts (a second array) —
    deliberately not done, the doc-level signal is what the tokenizer
    reports above actually use.

    All ratios are ``round(x, 6)`` doubles from exact BIGINT sums —
    deterministic at any parallelism. One map-side-combined shuffle of
    group-sized rows; the encoded corpus is scanned once.
    """
    from crawler_spark.operators.dedup import tokens_expr

    # coalesce mirrors the encoder's fillna(''): a NULL-text doc counts 0
    # words / 0 bytes, never a NULL that silently drops out of the sums
    nn = f"coalesce({text_col}, '')"
    per_doc = encoded.select(
        F.col(by).alias("grp"),
        F.expr(f"size({tokens_expr(nn)})").cast("long").alias("w"),
        F.col("n_bpe_tokens").cast("long").alias("b"),
        F.expr(f"octet_length({nn})").cast("long").alias("nb"),
    )
    agg = per_doc.groupBy(F.col("grp").alias(by)).agg(
        F.count("*").alias("n_docs"),
        F.sum("w").alias("n_words"),
        F.sum("b").alias("n_bpe_tokens"),
        F.sum("nb").alias("n_bytes"),
        F.sum(F.expr("CASE WHEN b > w THEN 1 ELSE 0 END")).alias("_frag"),
    )
    return agg.select(
        by,
        "n_docs",
        "n_words",
        "n_bpe_tokens",
        "n_bytes",
        F.expr(
            "CASE WHEN n_words > 0 THEN "
            "round(n_bpe_tokens / cast(n_words as double), 6) END"
        ).alias("fertility"),
        F.expr(
            "CASE WHEN n_bpe_tokens > 0 THEN "
            "round(n_bytes / cast(n_bpe_tokens as double), 6) END"
        ).alias("bytes_per_token"),
        F.expr(
            "round(_frag / cast(n_docs as double), 6)"
        ).alias("pct_frag_docs"),
    )
