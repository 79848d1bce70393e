"""Token-overlap evaluation: precision/recall/F1 between text columns.

The eval primitive a training-data pipeline runs constantly: compare an
extraction variant against a reference extraction (markdown vs
main-content strip), a cleaned corpus against its raw source, generated
summaries against gold text — at corpus scale, with exact arithmetic.
This is the scoring half of what `sampling.contamination` does with
membership: there the question is "does eval text LEAK into training
data"; here it is "how much of the reference does a candidate recover,
and how much of the candidate is noise".

Semantics: token *multiset* overlap (standard token-level P/R/F1, the
ROUGE-1/chrF-word family). ``tp`` per row is ``sum over distinct tokens
of min(count_pred, count_truth)``; precision = tp/|pred|, recall =
tp/|truth|, F1 the harmonic mean; empty sides define the usual zeros
(both empty -> P=R=F1=1, one empty -> 0). Tokenization is the engine-wide
``tokens_expr`` (lowercased whitespace split, empty-token filtered) so
scores agree with every other operator's token counts.

Scale shape: tokens explode to ``(id, token, side-count)`` rows that
combine map-side before the one ``(id, token)``-keyed exchange — a hot
document costs its *distinct-token vocabulary*, not its length; the
per-id rollup rides the same shuffle's partitioning. No windows, no
Python, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import tokens_expr


def _toks(text_col: str) -> str:
    # NULL text follows the empty-text conventions (a relevance-gated
    # page's NULL markdown/main_text is "nothing extracted", not "skip
    # this row") — coalesce before tokenizing
    return tokens_expr(f"coalesce({text_col}, '')")


def ngrams_expr(text_col: str, n: int) -> str:
    """Word n-grams WITH multiplicity as an array<string> SQL expression.

    Unlike ``dedup.shingles_expr`` (distinct shingles, and a whole-text
    fallback when the doc is shorter than k — the MinHash conventions),
    this keeps every occurrence and yields ``[]`` when the doc has fewer
    than ``n`` tokens — the ROUGE-N multiset conventions. The token array
    is bound once via ``transform(array(toks), ...)`` for the same
    re-split reason documented on ``shingles_expr``.
    """
    toks = _toks(text_col)
    if n == 1:
        return toks
    return (
        f"flatten(transform(array({toks}), tk -> "
        f"CASE WHEN size(tk) < {n} THEN array() "
        f"ELSE transform(sequence(1, size(tk) - {n - 1}), "
        f"i -> concat_ws(' ', slice(tk, i, {n}))) END))"
    )


def _pair_unit_counts(
    df: DataFrame, id_col: str, parr: str, tarr: str
) -> DataFrame:
    """Per ``(id, unit)`` pred/truth occurrence counts via ONE
    side-tagged explode — both sides of a row ride the same exchange and
    the per-unit clip downstream is a ``least()`` on the two conditional
    counts, instead of one explode per side plus a sort-merge join
    (the fusion measured on the corpus eval benches; see
    ``_clipped_matches``)."""
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"concat("
                    f"transform({parr}, u -> named_struct('s', 0, 'u', u)), "
                    f"transform({tarr}, u -> named_struct('s', 1, 'u', u)))"
                )
            ).alias("su"),
        )
        .groupBy(id_col, F.col("su.u").alias("token"))
        .agg(
            F.count(F.when(F.col("su.s") == 0, True)).alias("c_pred"),
            F.count(F.when(F.col("su.s") == 1, True)).alias("c_truth"),
        )
    )


def token_prf(
    df: DataFrame,
    pred_col: str,
    truth_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-row token P/R/F1 of ``pred_col`` against ``truth_col``.

    Returns ``(id, n_pred, n_truth, tp, precision, recall, f1)`` — counts
    exact BIGINT, ratios rounded to 6dp. Every input row produces exactly
    one output row; NULL text counts as empty (the empty-side 1/0
    conventions apply, never a NULL score).
    """
    return ngram_prf(df, pred_col, truth_col, n=1, id_col=id_col)


def ngram_prf(
    df: DataFrame,
    pred_col: str,
    truth_col: str,
    n: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-row word-n-gram P/R/F1 — the ROUGE-N family (``n=1`` IS
    ``token_prf``; ``n=2`` is ROUGE-2's multiset form).

    The overlap unit is the space-joined n-gram string; a document with
    fewer than ``n`` tokens has zero n-grams and follows the empty-side
    conventions (both sides degenerate -> P=R=F1=1 — e.g. two one-token
    docs under n=2 — one side only -> 0). Same scale shape as the token
    scorer: units combine map-side before the one (id, unit) exchange, so
    a hot document costs its distinct n-gram vocabulary.
    """
    parr = ngrams_expr(pred_col, n)
    tarr = ngrams_expr(truth_col, n)
    base = df.select(
        F.col(id_col),
        F.expr(f"size({parr})").cast("bigint").alias("n_pred"),
        F.expr(f"size({tarr})").cast("bigint").alias("n_truth"),
    )
    tp = (
        _pair_unit_counts(df, id_col, parr, tarr)
        .groupBy(id_col)
        .agg(F.sum(F.least("c_pred", "c_truth")).alias("tp"))
    )
    j = base.join(tp, id_col, "left").withColumn(
        "tp", F.coalesce("tp", F.lit(0)).cast("bigint")
    )
    prec = F.when(F.col("n_pred") == 0, F.when(F.col("n_truth") == 0, 1.0).otherwise(0.0)).otherwise(
        F.col("tp") / F.col("n_pred")
    )
    rec = F.when(F.col("n_truth") == 0, F.when(F.col("n_pred") == 0, 1.0).otherwise(0.0)).otherwise(
        F.col("tp") / F.col("n_truth")
    )
    j = j.withColumn("_p", prec).withColumn("_r", rec)
    f1 = F.when((F.col("_p") + F.col("_r")) == 0, 0.0).otherwise(
        2 * F.col("_p") * F.col("_r") / (F.col("_p") + F.col("_r"))
    )
    return j.select(
        id_col,
        "n_pred",
        "n_truth",
        "tp",
        F.round("_p", 6).alias("precision"),
        F.round("_r", 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def prf_summary(scored: DataFrame, by: str = None) -> DataFrame:
    """Corpus rollup of `token_prf` output: one row with micro scores
    (token-mass-weighted: ratios of the exact global sums) and macro
    scores (unweighted means of per-row ratios). Micro is the honest
    headline for skewed document lengths; macro surfaces tail damage.
    ``by`` groups the rollup (e.g. per source host — the extraction-
    quality report shape); one map-side-combined aggregate either way."""
    g = scored.groupBy(by) if by else scored.groupBy()
    a = g.agg(
        F.count("*").alias("n_rows"),
        F.sum("tp").alias("tp"),
        F.sum("n_pred").alias("n_pred"),
        F.sum("n_truth").alias("n_truth"),
        F.avg("precision").alias("mp"),
        F.avg("recall").alias("mr"),
        F.avg("f1").alias("mf"),
    )
    micro_p = F.when(F.col("n_pred") == 0, 0.0).otherwise(F.col("tp") / F.col("n_pred"))
    micro_r = F.when(F.col("n_truth") == 0, 0.0).otherwise(F.col("tp") / F.col("n_truth"))
    a = a.withColumn("_p", micro_p).withColumn("_r", micro_r)
    micro_f = F.when((F.col("_p") + F.col("_r")) == 0, 0.0).otherwise(
        2 * F.col("_p") * F.col("_r") / (F.col("_p") + F.col("_r"))
    )
    lead = [by] if by else []
    return a.select(
        *lead,
        "n_rows",
        "tp",
        "n_pred",
        "n_truth",
        F.round("_p", 6).alias("micro_precision"),
        F.round("_r", 6).alias("micro_recall"),
        F.round(micro_f, 6).alias("micro_f1"),
        F.round("mp", 6).alias("macro_precision"),
        F.round("mr", 6).alias("macro_recall"),
        F.round("mf", 6).alias("macro_f1"),
    )


def rouge_l(
    df: DataFrame,
    pred_col: str,
    truth_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-row ROUGE-L (Lin 2004): P/R/F1 from the token-level Longest
    Common Subsequence — credits in-order coverage without the fixed
    window of :func:`ngram_prf`, so a candidate that preserves the
    reference's sentence order scores above one that shuffles it even
    when their n-gram multisets tie.

    Returns ``(id, n_pred, n_truth, lcs, precision, recall, f1)`` —
    ``lcs`` exact, ratios rounded to 6dp; empty-side conventions match
    :func:`token_prf` (both empty -> 1, one empty -> 0). Tokenization is
    the engine-wide rule (lowercased whitespace, NULL = empty).

    The LCS recurrence is a genuinely row-local dynamic program — not
    expressible as Spark column algebra — so this is the eval family's
    one Arrow-batched ``mapInPandas`` operator (the documented slow
    path; acceptable because eval pairs are sampled sets, not the 100 TB
    corpus). O(|pred| * |truth|) per row: cap inputs upstream (e.g. the
    F8 chunker) for pathological documents. Deterministic: pure
    function of the two strings, no state across rows or batches.
    """
    import re as _re

    from pyspark.sql import types as T

    ws = _re.compile(r"\s+")

    def lcs_len(a, b):
        if len(a) < len(b):
            a, b = b, a
        if not b:
            return 0
        prev = [0] * (len(b) + 1)
        for x in a:
            cur = [0]
            for j, y in enumerate(b, 1):
                cur.append(
                    prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
                )
            prev = cur
        return prev[-1]

    fields = df.schema.fields + [
        T.StructField("n_pred", T.LongType()),
        T.StructField("n_truth", T.LongType()),
        T.StructField("lcs", T.LongType()),
        T.StructField("precision", T.DoubleType()),
        T.StructField("recall", T.DoubleType()),
        T.StructField("f1", T.DoubleType()),
    ]
    schema = T.StructType(fields)
    cols = [f.name for f in df.schema.fields]

    def run(batches):
        for pdf in batches:
            np_, nt_, lc_, pr_, rc_, f1_ = [], [], [], [], [], []
            for p_txt, t_txt in zip(
                pdf[pred_col].fillna(""), pdf[truth_col].fillna("")
            ):
                p = [t for t in ws.split(p_txt.strip().lower()) if t]
                t = [t for t in ws.split(t_txt.strip().lower()) if t]
                l = lcs_len(p, t)
                if not p and not t:
                    prec = rec = f1 = 1.0
                elif not p or not t:
                    prec = rec = f1 = 0.0
                else:
                    prec, rec = l / len(p), l / len(t)
                    f1 = (
                        2 * prec * rec / (prec + rec)
                        if prec + rec > 0
                        else 0.0
                    )
                np_.append(len(p)); nt_.append(len(t)); lc_.append(l)
                pr_.append(round(prec, 6)); rc_.append(round(rec, 6))
                f1_.append(round(f1, 6))
            out = pdf[cols].copy()
            out["n_pred"], out["n_truth"], out["lcs"] = np_, nt_, lc_
            out["precision"], out["recall"], out["f1"] = pr_, rc_, f1_
            yield out

    return df.mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Corpus-level BLEU (Papineni et al. 2002)
# ---------------------------------------------------------------------------


def _tagged_grams(text_col: str, max_n: int) -> str:
    """All 1..max_n word n-grams of a text column as one array of
    ``struct(n int, g string)`` — one explode carries every order, so
    the clipped-match join is a single exchange instead of one per n."""
    arrs = [
        f"transform({ngrams_expr(text_col, n)}, "
        f"g -> named_struct('n', {n}, 'g', g))"
        for n in range(1, max_n + 1)
    ]
    return "concat(" + ", ".join(arrs) + ")"


def _clipped_matches(
    df: DataFrame, cols, gc, pred_units: str, truth_units: str, max_n: int
) -> DataFrame:
    """Per-group clipped match totals ``m1..m{max_n}`` for two tagged
    unit-array expressions. Pred and truth live in the SAME row, so both
    sides ride ONE side-tagged explode into a single ``(id, unit)``-keyed
    exchange (counts combine map-side) and the clip is a ``least()`` on
    the two conditional counts — no join, no second gram-row shuffle.
    (The earlier shape — one explode per side + a sort-merge join on
    ``(id, unit)`` — moved every gram twice and sorted both sides;
    measured 2.6× slower on the sf0.1 eval benches.)"""
    units = (
        df.select(
            *cols,
            F.explode(
                F.expr(
                    f"concat("
                    f"transform({pred_units}, u -> named_struct('s', 0, 'u', u)), "
                    f"transform({truth_units}, u -> named_struct('s', 1, 'u', u)))"
                )
            ).alias("su"),
        )
        .groupBy(*cols, F.col("su.u").alias("u"))
        .agg(
            F.count(F.when(F.col("su.s") == 0, True)).alias("c_pred"),
            F.count(F.when(F.col("su.s") == 1, True)).alias("c_truth"),
        )
    )
    return (
        units.groupBy(*gc, F.col("u.n").alias("_n"))
        .agg(F.sum(F.least("c_pred", "c_truth")).alias("_m"))
        .groupBy(*gc)
        .agg(
            *[
                F.coalesce(
                    F.sum(F.when(F.col("_n") == n, F.col("_m"))), F.lit(0)
                )
                .cast("bigint")
                .alias(f"m{n}")
                for n in range(1, max_n + 1)
            ]
        )
    )


def bleu_corpus(
    df: DataFrame,
    pred_col: str,
    truth_col: str,
    group_cols=(),
    id_col: str = "doc_id",
    max_n: int = 4,
) -> DataFrame:
    """Corpus-level BLEU of ``pred_col`` against ``truth_col`` (one
    reference per row), optionally grouped — the standard
    extraction-variant / cleanup-pass quality number next to the ROUGE
    family above. Per group: exact BIGINT clipped matches ``m1..m4`` and
    candidate totals ``h1..h4`` (``h1`` is the candidate length),
    reference length ``r_len``, modified precisions ``p1..p4``, brevity
    penalty ``bp``, and ``bleu`` = ``bp * exp(mean(ln pn))`` — zero when
    any order has no match or the candidate is empty (the standard
    unsmoothed convention). The doubles are derived from identical
    integers in both engines; ln/exp parity is already load-bearing in
    the LM gates.

    Scale shape: every n-gram order of BOTH sides rides ONE side-tagged
    explode (counts combine map-side before the single ``(id, n, gram)``
    exchange; clipping is a ``least()`` on the conditional counts — no
    join), and the group rollup is a bounded conditional aggregate. No
    windows, no Python, nothing driver-side.
    """
    gc = list(group_cols)
    cols = [id_col] + gc
    matches = _clipped_matches(
        df,
        cols,
        gc,
        _tagged_grams(pred_col, max_n),
        _tagged_grams(truth_col, max_n),
        max_n,
    )
    totals = (
        df.select(
            *gc,
            *[
                F.expr(f"size({ngrams_expr(pred_col, n)})")
                .cast("bigint")
                .alias(f"_h{n}")
                for n in range(1, max_n + 1)
            ],
            F.expr(f"size({_toks(truth_col)})").cast("bigint").alias("_r"),
        )
        .groupBy(*gc)
        .agg(
            *[
                F.sum(f"_h{n}").cast("bigint").alias(f"h{n}")
                for n in range(1, max_n + 1)
            ],
            F.sum("_r").cast("bigint").alias("r_len"),
        )
    )
    # the stitch joins two group-cardinality tables (one row per group) —
    # left to AQE on purpose: an explicit broadcast(matches) hint measured
    # 4x SLOWER inside the long-lived bench JVM (build and probe subtrees
    # execute concurrently and double the peak pressure of the heavy gram
    # pipeline), while the tiny sort-merge it avoids costs nothing
    j = (
        totals.join(matches, gc, "left")
        if gc
        else totals.crossJoin(matches)
    )
    for n in range(1, max_n + 1):
        j = j.withColumn(f"m{n}", F.coalesce(F.col(f"m{n}"), F.lit(0)).cast("bigint"))
        j = j.withColumn(
            f"p{n}",
            F.expr(
                f"round(CASE WHEN h{n} = 0 THEN cast(0.0 as double) "
                f"ELSE m{n} / h{n} END, 6)"
            ),
        )
    zero = " OR ".join(
        [f"m{n} = 0" for n in range(1, max_n + 1)] + ["h1 = 0"]
    )
    mean_ln = "(" + " + ".join(
        f"ln(m{n} / h{n})" for n in range(1, max_n + 1)
    ) + f") / {max_n}"
    bp = (
        "CASE WHEN h1 >= r_len THEN cast(1.0 as double) "
        "ELSE exp(1.0 - r_len / h1) END"
    )
    j = j.withColumn(
        "bp",
        F.expr(f"round(CASE WHEN h1 = 0 THEN cast(0.0 as double) ELSE {bp} END, 6)"),
    ).withColumn(
        "bleu",
        F.expr(
            f"round(CASE WHEN {zero} THEN cast(0.0 as double) "
            f"ELSE ({bp}) * exp({mean_ln}) END, 6)"
        ),
    )
    ordered = gc + ["r_len"] + [
        c for n in range(1, max_n + 1) for c in (f"m{n}", f"h{n}")
    ] + [f"p{n}" for n in range(1, max_n + 1)] + ["bp", "bleu"]
    return j.select(*ordered)


# ---------------------------------------------------------------------------
# Corpus-level chrF (Popović 2015)
# ---------------------------------------------------------------------------


def _tagged_char_grams(text_col: str, max_n: int) -> str:
    """All 1..max_n *character* n-grams (whitespace removed, lowercased)
    as one array of ``struct(n int, g string)`` — the normalized string
    binds ONCE via ``transform(array(s), cs -> ...)`` and every order
    rides the same explode. ``filter(sequence(...))`` yields a typed
    empty array below ``n`` chars (Spark's ``sequence(1, 0)`` counts
    DOWN, so the upper bound is clamped and over-positions filtered)."""
    s = f"regexp_replace(lower(coalesce({text_col}, '')), '\\\\s+', '')"
    per_n = ", ".join(
        f"transform(filter(sequence(1, greatest(length(cs) - {n - 1}, 1)), "
        f"i -> i + {n - 1} <= length(cs)), "
        f"i -> named_struct('n', {n}, 'g', substring(cs, i, {n})))"
        for n in range(1, max_n + 1)
    )
    return f"flatten(transform(array({s}), cs -> concat({per_n})))"


def chrf_corpus(
    df: DataFrame,
    pred_col: str,
    truth_col: str,
    group_cols=(),
    id_col: str = "doc_id",
    max_n: int = 6,
    beta: float = 2.0,
) -> DataFrame:
    """Corpus-level chrF of ``pred_col`` against ``truth_col`` (Popović
    2015; chrF2 at the default ``beta``) — the character-level member of
    the eval family (token P/R/F1, ROUGE-N, ROUGE-L, BLEU above). Robust
    where token metrics are brittle: tokenization-free, so it sees
    partial-word damage (mojibake repair, PII masking, boilerplate seams)
    that whole-token overlap scores miss.

    Conventions, pinned for the oracle: text is lowercased and ALL
    whitespace is removed before char n-grams are taken (the standard
    chrF space-insensitive form); per group and order ``n`` in
    ``1..max_n``, ``m{n}`` = clipped matches, ``h{n}`` / ``r{n}`` =
    candidate / reference totals (exact BIGINTs); ``chrp`` / ``chrr`` =
    fixed-denominator macro averages over ALL ``max_n`` orders (an order
    with an empty side contributes 0 — no sacrebleu "effective order"
    shrinking, so the number is comparable across groups); ``chrf`` =
    ``(1+β²)·P·R / (β²·P+R)``, 0 when both are 0.

    Scale shape: identical to :func:`bleu_corpus` — all orders of BOTH
    sides ride ONE side-tagged explode (counts combine map-side before
    the single ``(id, n, gram)`` exchange; clipping is a ``least()`` on
    the conditional counts — no join), group rollup is a bounded
    conditional aggregate. A hot document costs its distinct char-n-gram
    vocabulary (≤ ~6× its length), never a cross-document join. No
    windows, no Python, nothing driver-side.
    """
    gc = list(group_cols)
    cols = [id_col] + gc
    matches = _clipped_matches(
        df,
        cols,
        gc,
        _tagged_char_grams(pred_col, max_n),
        _tagged_char_grams(truth_col, max_n),
        max_n,
    )
    _plen = (
        f"length(regexp_replace(lower(coalesce({pred_col}, '')), '\\\\s+', ''))"
    )
    _tlen = (
        f"length(regexp_replace(lower(coalesce({truth_col}, '')), '\\\\s+', ''))"
    )
    totals = (
        df.select(
            *gc,
            *[
                F.expr(f"greatest({_plen} - {n - 1}, 0)")
                .cast("bigint")
                .alias(f"_h{n}")
                for n in range(1, max_n + 1)
            ],
            *[
                F.expr(f"greatest({_tlen} - {n - 1}, 0)")
                .cast("bigint")
                .alias(f"_r{n}")
                for n in range(1, max_n + 1)
            ],
        )
        .groupBy(*gc)
        .agg(
            *[
                F.sum(f"_h{n}").cast("bigint").alias(f"h{n}")
                for n in range(1, max_n + 1)
            ],
            *[
                F.sum(f"_r{n}").cast("bigint").alias(f"r{n}")
                for n in range(1, max_n + 1)
            ],
        )
    )
    # the stitch joins two group-cardinality tables (one row per group) —
    # left to AQE on purpose: an explicit broadcast(matches) hint measured
    # 4x SLOWER inside the long-lived bench JVM (build and probe subtrees
    # execute concurrently and double the peak pressure of the heavy gram
    # pipeline), while the tiny sort-merge it avoids costs nothing
    j = (
        totals.join(matches, gc, "left")
        if gc
        else totals.crossJoin(matches)
    )
    for n in range(1, max_n + 1):
        j = j.withColumn(
            f"m{n}", F.coalesce(F.col(f"m{n}"), F.lit(0)).cast("bigint")
        )
    p_terms = " + ".join(
        f"(CASE WHEN h{n} = 0 THEN 0.0 ELSE m{n} / h{n} END)"
        for n in range(1, max_n + 1)
    )
    r_terms = " + ".join(
        f"(CASE WHEN r{n} = 0 THEN 0.0 ELSE m{n} / r{n} END)"
        for n in range(1, max_n + 1)
    )
    b2 = beta * beta
    j = (
        j.withColumn("_p", F.expr(f"({p_terms}) / {max_n}"))
        .withColumn("_r", F.expr(f"({r_terms}) / {max_n}"))
        .withColumn(
            "chrf",
            F.expr(
                f"round(CASE WHEN _p + _r = 0 THEN 0.0 "
                f"ELSE (1.0 + {b2}) * _p * _r / ({b2} * _p + _r) END, 6)"
            ),
        )
        .withColumn("chrp", F.expr("round(_p, 6)"))
        .withColumn("chrr", F.expr("round(_r, 6)"))
    )
    ordered = gc + [
        c
        for n in range(1, max_n + 1)
        for c in (f"m{n}", f"h{n}", f"r{n}")
    ] + ["chrp", "chrr", "chrf"]
    return j.select(*ordered)
