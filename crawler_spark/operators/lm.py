"""Corpus-trained bigram language-model scoring (CCNet-style perplexity
filter) for training-data pipelines.

CCNet (Wenzek et al. 2020) ranks Common-Crawl documents by the perplexity
of a language model and keeps the low-perplexity head; the reference repo
has no LM, so this is a scale-path addition in the spirit of SURVEY §2's
"text analysis" family. Instead of shipping a pretrained KenLM binary
(non-deterministic dependency), the operator trains the model *on the
corpus itself* inside the same dataflow: add-one-smoothed bigram
probabilities from corpus-wide counts, scored back onto every document.
Self-perplexity is the standard model-free proxy — boilerplate and
templated spam score low (predictable), lexically incoherent noise scores
high — and the whole thing is three hash aggregations plus two key joins,
no Python, no model artifact.

Determinism contract (the driver value-hash compares against DuckDB):
each bigram's log-probability is quantized to fixed-point
``cast(round(ln(p) * 1e6) as bigint)`` and summed as BIGINT, so per-doc
sums are exact integers independent of partition/summation order (same
trick as the IVF quantizer, similarity.py). Only the final divide
produces a double, rounded to 6 decimals from identical integer inputs
in both engines.

Scale shape (100 TB corpus):
- one shuffle to count bigram frequencies (map-side partial combine),
- one shuffle to count context (prev-token) frequencies,
- two equi-joins of the exploded corpus against those count tables
  (AQE picks broadcast when the vocabulary is small enough),
- one groupBy(doc_id) to fold scores back per document.
The count tables are vocabulary-sized, not corpus-sized — the classic
n-gram-LM MapReduce shape (Brants et al. 2007, "Large Language Models in
Machine Translation").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import tokens_expr

# fixed-point scale for log-probabilities: 1e-6 resolution, exact BIGINT
# sums (a doc would need ~2^43 bigrams to overflow the 2^63 sum)
_Q = 1_000_000


def bigrams_expr(text_col: str = "text") -> str:
    """Ordered bigram structs ``(pos, prev, cur)`` as one SQL expression.

    The token array is bound once via ``transform(array(toks), ...)`` so
    the regex split runs once per row (see dedup.shingles_expr for the
    measured O(tokens^2) pitfall this avoids). Docs with < 2 tokens yield
    an empty array — Spark's ``sequence(1, 0)`` counts *down*, so the
    size guard is load-bearing, not defensive.
    """
    toks = tokens_expr(text_col)
    return (
        f"flatten(transform(array({toks}), tk -> "
        f"CASE WHEN size(tk) < 2 THEN "
        f"cast(array() as array<struct<pos:int,prev:string,cur:string>>) "
        f"ELSE transform(sequence(1, size(tk) - 1), "
        f"i -> named_struct('pos', cast(i as int), "
        f"'prev', tk[i-1], 'cur', tk[i])) END))"
    )


def lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_bigrams: int = 4_000_000,
) -> DataFrame:
    """Score every document under an add-one-smoothed bigram LM trained on
    the corpus itself.

    Returns one row per input row with:
    - ``n_bigrams``  — bigram count (0 for docs with < 2 tokens),
    - ``sum_logp_q`` — exact BIGINT sum of fixed-point log-probs,
    - ``avg_nll``    — mean negative log-likelihood per bigram (nats,
      rounded to 6 decimals; NULL when n_bigrams = 0). Perplexity is
      ``exp(avg_nll)`` — left to the caller because ``exp`` is the one
      step that is not bit-reproducible across engines.

    Plan shape: the corpus is exploded into bigrams exactly TWICE — once
    to build the count table, once to score — and context counts derive
    from the bigram table itself (``ctx_n(prev) = sum over cur of bg_n``),
    never from a third corpus pass. The per-bigram log-prob table is
    vocabulary²-bounded; when its row count (driver-known, the frontier's
    decide-from-a-count pattern) is at most ``broadcast_bigrams``, the
    scoring join broadcasts it and the corpus-sized side never shuffles —
    the difference between one bounded shuffle and shuffling every bigram
    occurrence in the corpus.
    """
    ex = (
        df.select(F.col(id_col), F.explode(F.expr(bigrams_expr(text_col))).alias("bg"))
        .select(id_col, F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))
    )
    # vocabulary size over *all* tokens (contexts and finals alike)
    vocab = (
        df.select(F.explode(F.expr(tokens_expr(text_col))).alias("t"))
        .agg(F.countDistinct("t").alias("v"))
    )
    bg_counts = ex.groupBy("prev", "cur").agg(F.count("*").alias("bg_n"))
    # ctx_n rides the bigram table (an occurrence with context `prev` IS a
    # bigram starting with `prev`): a vocabulary-sized window, no corpus pass
    w_ctx = Window.partitionBy("prev")
    logp_table = (
        bg_counts.withColumn("ctx_n", F.sum("bg_n").over(w_ctx))
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "logp_q",
            F.expr(
                f"cast(round(ln((bg_n + 1) / cast(ctx_n + v as double)) * {_Q}) as bigint)"
            ),
        )
        .select("prev", "cur", "logp_q")
        .persist()
    )
    if logp_table.count() <= broadcast_bigrams:
        logp_table = F.broadcast(logp_table)
    scored = ex.join(logp_table, ["prev", "cur"])
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.sum("logp_q").alias("sum_logp_q"),
    )
    return (
        df.join(per_doc, id_col, "left")
        .withColumn("n_bigrams", F.coalesce(F.col("n_bigrams"), F.lit(0)))
        .withColumn("sum_logp_q", F.coalesce(F.col("sum_logp_q"), F.lit(0)))
        .withColumn(
            "avg_nll",
            F.expr(
                f"CASE WHEN n_bigrams > 0 THEN "
                f"round(-sum_logp_q / cast(n_bigrams as double) / {_Q}, 6) END"
            ),
        )
    )


def trigrams_expr(text_col: str = "text") -> str:
    """Ordered trigram structs ``(w1, w2, w3)`` as one SQL expression.

    Same bind-once-via-transform shape as :func:`bigrams_expr`; docs with
    fewer than 3 tokens yield an empty array (the ``size`` guard stops
    ``sequence`` from counting down).
    """
    toks = tokens_expr(text_col)
    return (
        f"flatten(transform(array({toks}), tk -> "
        f"CASE WHEN size(tk) < 3 THEN "
        f"cast(array() as array<struct<w1:string,w2:string,w3:string>>) "
        f"ELSE transform(sequence(1, size(tk) - 2), "
        f"i -> named_struct('w1', tk[i-1], 'w2', tk[i], 'w3', tk[i+1])) "
        f"END))"
    )


def sb_score(
    df: DataFrame,
    train_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_rows: int = 4_000_000,
) -> DataFrame:
    """Score documents under a trigram Stupid Backoff LM (Brants et al.
    2007, "Large Language Models in Machine Translation") trained on
    ``train_df`` (or on ``df`` itself when ``train_df`` is None).

    Stupid Backoff is *the* web-scale n-gram model: no discounting, no
    normalized backoff weights — just relative frequencies with a fixed
    multiplier per backoff level, which is exactly what survives when the
    count tables live in a distributed store. Per trigram
    ``(w1, w2, w3)`` the score is

    - ``n3 / n2(w1,w2)``                    when the trigram was seen,
    - ``0.4 * n2(w2,w3) / n1(w2)``          else, when the bigram was seen,
    - ``0.16 * (n1(w3) + 1) / (N + V)``     else (add-one unigram floor, so
      out-of-vocabulary words score finite instead of -inf; 0.16 is the
      published alpha=0.4 applied twice, kept as one literal so both
      engines parse the identical double).

    The train/score split is the real deployment shape (CCNet trains on a
    target-domain corpus and scores crawl candidates); with
    ``train_df=None`` every scored trigram was observed, so backoff never
    fires and the score degenerates to trigram self-predictability — still
    a useful boilerplate/noise signal, flagged here so nobody mistakes it
    for a held-out perplexity.

    Determinism: per-trigram log-scores are quantized to fixed-point
    BIGINT (``round(ln(S) * 1e6)``) and summed exactly, same contract as
    :func:`lm_score`; the expression text is mirrored verbatim in the
    DuckDB oracle so the doubles agree bit-for-bit before rounding.

    Plan shape (100 TB): three count aggregations over the train corpus
    (map-side combine, tables vocabulary-bounded); the scored corpus is
    exploded twice (distinct-trigram candidates, then the scoring join).
    All model joins land on the *distinct-trigram* table — never on the
    corpus-sized exploded frame — and the finished per-trigram score table
    broadcasts when driver-known small, so the corpus side never shuffles
    on the hot path.
    """
    train = train_df if train_df is not None else df
    uni = (
        train.select(F.explode(F.expr(tokens_expr(text_col))).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("n1"))
    )
    totals = uni.agg(
        F.sum("n1").alias("n_tok"), F.count("*").alias("v")
    )
    bi = (
        train.select(F.explode(F.expr(bigrams_expr(text_col))).alias("bg"))
        .groupBy(
            F.col("bg.prev").alias("w1"), F.col("bg.cur").alias("w2")
        )
        .agg(F.count("*").alias("n2"))
    )
    tri = (
        train.select(F.explode(F.expr(trigrams_expr(text_col))).alias("tg"))
        .groupBy(
            F.col("tg.w1").alias("w1"),
            F.col("tg.w2").alias("w2"),
            F.col("tg.w3").alias("w3"),
        )
        .agg(F.count("*").alias("n3"))
    )
    ex = df.select(
        F.col(id_col), F.explode(F.expr(trigrams_expr(text_col))).alias("tg")
    ).select(
        id_col,
        F.col("tg.w1").alias("w1"),
        F.col("tg.w2").alias("w2"),
        F.col("tg.w3").alias("w3"),
    )
    # score table over the scored corpus's DISTINCT trigrams: every model
    # join is (distinct-trigrams x vocab-sized), never corpus-sized
    st = (
        ex.select("w1", "w2", "w3").distinct()
        .join(tri, ["w1", "w2", "w3"], "left")
        .join(
            bi.select("w1", "w2", F.col("n2").alias("ctx2_n")),
            ["w1", "w2"],
            "left",
        )
        .join(
            bi.select(
                F.col("w1").alias("w2"),
                F.col("w2").alias("w3"),
                F.col("n2").alias("back2_n"),
            ),
            ["w2", "w3"],
            "left",
        )
        .join(
            uni.select(F.col("t").alias("w2"), F.col("n1").alias("ctx1_n")),
            ["w2"],
            "left",
        )
        .join(
            uni.select(F.col("t").alias("w3"), F.col("n1").alias("uni3_n")),
            ["w3"],
            "left",
        )
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "logsb_q",
            F.expr(
                f"cast(CASE "
                f"WHEN n3 IS NOT NULL THEN "
                f"round(ln(n3 / cast(ctx2_n as double)) * {_Q}) "
                f"WHEN back2_n IS NOT NULL THEN "
                f"round(ln(0.4 * (back2_n / cast(ctx1_n as double))) * {_Q}) "
                f"ELSE round(ln(0.16 * ((coalesce(uni3_n, 0) + 1) "
                f"/ cast(n_tok + v as double))) * {_Q}) END as bigint)"
            ),
        )
        .select("w1", "w2", "w3", "logsb_q")
        .persist()
    )
    if st.count() <= broadcast_rows:
        st = F.broadcast(st)
    per_doc = (
        ex.join(st, ["w1", "w2", "w3"])
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_trigrams"),
            F.sum("logsb_q").alias("sum_logsb_q"),
        )
    )
    return (
        df.join(per_doc, id_col, "left")
        .withColumn("n_trigrams", F.coalesce(F.col("n_trigrams"), F.lit(0)))
        .withColumn(
            "sum_logsb_q", F.coalesce(F.col("sum_logsb_q"), F.lit(0))
        )
        .withColumn(
            "avg_nll_sb",
            F.expr(
                f"CASE WHEN n_trigrams > 0 THEN "
                f"round(-sum_logsb_q / cast(n_trigrams as double) / {_Q}, 6) "
                f"END"
            ),
        )
    )


def perplexity_filter(
    df: DataFrame,
    max_avg_nll: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style head selection: keep documents whose bigram mean NLL is
    at or below ``max_avg_nll`` (low NLL = predictable = keep). Docs too
    short to have bigrams are kept — length gating belongs to the quality
    filters, not the LM."""
    return lm_score(df, text_col=text_col, id_col=id_col).filter(
        (F.col("n_bigrams") == 0) | (F.col("avg_nll") <= F.lit(max_avg_nll))
    )


def perplexity_buckets(
    df: DataFrame,
    by: str = "lang",
    n_buckets: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    approx_bins: int | None = None,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): per ``by``
    group (per language, in the published pipeline), rank documents by
    bigram-LM mean NLL and cut the ranking into ``n_buckets`` equal-count
    buckets — ``bucket`` 1 is the most-predictable "head" slice the
    downstream mixer oversamples, the last bucket the "tail". Output:
    input rows + :func:`lm_score`'s columns + ``bucket`` (int; NULL for
    docs with no bigrams) + ``ppl_bucket`` (head/middle/tail labels when
    ``n_buckets == 3``, else the bucket number as a string; "unscored"
    for NULL).

    Exact path (default): ``ntile`` over a per-group window ordered by
    ``(avg_nll, id)`` — deterministic, and one sort per group, which is
    the published pipeline's own shape (CCNet shards and sorts per
    language). That is fine while groups are languages; it serializes
    when one group dominates.

    Approx path (``approx_bins`` set): two bounded aggregations instead
    of a sort. Pass 1 takes the per-group min/max of the fixed-point
    score, pass 2 histograms docs into ``approx_bins`` equal-width bins
    (a map-side-combined shuffle of at most ``#groups * approx_bins``
    rows regardless of corpus size); the driver turns cumulative bin
    counts into ``n_buckets - 1`` thresholds and the assignment is a
    broadcast comparison — no window, no per-group reducer, identical
    output at every parallelism. Bucket populations deviate from exact
    ntile by at most one bin's occupancy per boundary; all docs sharing
    one score land in one bucket (a property exact ntile does not have).
    """
    scored = lm_score(df, text_col=text_col, id_col=id_col)
    if approx_bins is None:
        w = Window.partitionBy(by).orderBy("avg_nll", id_col)
        ranked = scored.filter(F.col("n_bigrams") > 0).withColumn(
            "bucket", F.ntile(n_buckets).over(w)
        )
        out = scored.filter(F.col("n_bigrams") == 0).withColumn(
            "bucket", F.lit(None).cast("int")
        ).unionByName(ranked)
    else:
        # fixed-point score (bit-identical to avg_nll's rounding)
        q = f"cast(round(avg_nll * {_Q}) as bigint)"
        sc = scored.filter(F.col("n_bigrams") > 0).withColumn(
            "_q", F.expr(q)
        )
        rng = {
            r[by]: (int(r["lo"]), int(r["hi"]))
            for r in sc.groupBy(by)
            .agg(F.min("_q").alias("lo"), F.max("_q").alias("hi"))
            .collect()
        }
        if not rng:  # nothing scoreable: everyone is "unscored"
            return scored.withColumn(
                "bucket", F.lit(None).cast("int")
            ).withColumn("ppl_bucket", F.lit("unscored"))
        # equal-width bins over each group's observed range
        bin_exprs = {
            g: (
                f"least(cast((((_q - {lo}) * {int(approx_bins)}) "
                f"div {max(hi - lo + 1, 1)}) as int), {int(approx_bins) - 1})"
            )
            for g, (lo, hi) in rng.items()
        }
        whens = None
        for g, e in sorted(bin_exprs.items()):
            c = F.when(F.col(by) == g, F.expr(e))
            whens = c if whens is None else whens.when(
                F.col(by) == g, F.expr(e)
            )
        sc = sc.withColumn("_bin", whens)
        hist = (
            sc.groupBy(by, "_bin").agg(F.count("*").alias("n")).collect()
        )
        per_group: dict = {}
        total: dict = {}
        for r in hist:
            per_group.setdefault(r[by], {})[int(r["_bin"])] = int(r["n"])
            total[r[by]] = total.get(r[by], 0) + int(r["n"])
        # thresholds[g] = first bin of bucket j+1, for j in 1..n_buckets-1
        thresholds: dict = {}
        for g, bins in per_group.items():
            cuts, cum, j = [], 0, 1
            for b in sorted(bins):
                cum += bins[b]
                while j < n_buckets and cum >= (j * total[g]) / n_buckets:
                    cuts.append(b + 1)
                    j += 1
            while len(cuts) < n_buckets - 1:
                cuts.append(int(approx_bins))
            thresholds[g] = cuts
        cmap = F.create_map(
            *[
                x
                for g, cuts in sorted(thresholds.items())
                for x in (
                    F.lit(g),
                    F.array(*[F.lit(int(c)) for c in cuts]),
                )
            ]
        )
        sc = sc.withColumn(
            "bucket",
            (
                F.lit(1)
                + F.aggregate(
                    cmap[F.col(by)],
                    F.lit(0),
                    lambda acc, t: acc
                    + F.when(F.col("_bin") >= t, 1).otherwise(0),
                )
            ).cast("int"),
        ).drop("_q", "_bin")
        out = scored.filter(F.col("n_bigrams") == 0).withColumn(
            "bucket", F.lit(None).cast("int")
        ).unionByName(sc)
    label = (
        F.when(F.col("bucket").isNull(), F.lit("unscored"))
        .when(F.lit(n_buckets) == 3, F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
            F.col("bucket"),
        ))
        .otherwise(F.col("bucket").cast("string"))
    )
    return out.withColumn("ppl_bucket", label)


def kn_score(
    df: DataFrame,
    train_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_rows: int = 4_000_000,
) -> DataFrame:
    """Score documents under an interpolated Kneser-Ney bigram LM
    (Kneser & Ney 1995; Chen & Goodman 1999's interpolated form) trained
    on ``train_df`` (or on ``df`` itself when ``train_df`` is None).

    KN is the smoothing KenLM ships and CCNet's published filter actually
    uses; next to :func:`lm_score`'s add-one and :func:`sb_score`'s Stupid
    Backoff it completes the classic n-gram family. The difference that
    matters for curation: the backoff distribution is the *continuation*
    count (how many distinct contexts a word follows), so boilerplate
    tokens that appear millions of times in ONE template (high frequency,
    low continuation) stop looking probable — precisely the
    templated-spam signal raw frequency misses.

    Per bigram ``(v, w)`` with discount ``D = 0.75``:

    - ``Pc(w)   = (N1c(w) + 1) / (B + V)``        (continuation prob;
      ``N1c(w)`` = distinct contexts preceding ``w``, ``B`` = distinct
      bigram types, ``V`` = vocabulary — add-one floored so unseen
      continuations score finite, the same floor philosophy as
      ``lm_score``/``sb_score``, noted because textbook KN gives 0),
    - seen context: ``P = (max(c(vw) - D, 0) + D * N1p(v) * Pc(w)) / c(v)``
      (``N1p(v)`` = distinct continuations of ``v``),
    - unseen context (train/score split only): ``P = Pc(w)``.

    Determinism: the probability expression is written with one pinned
    literal order and mirrored verbatim in the DuckDB oracle, so the IEEE
    doubles agree bit-for-bit before the fixed-point quantization
    (``round(ln(P) * 1e6)`` summed as exact BIGINT — the lm.py contract).

    Plan shape (100 TB): identical to :func:`sb_score` — count tables are
    vocabulary-bounded aggregations of the train corpus with map-side
    combine; ``N1p``/``N1c``/``B`` all derive from the bigram-TYPE table
    (they are its group counts), never from a corpus re-pass; every model
    join lands on the scored corpus's distinct-bigram table; the finished
    score table broadcasts when driver-known small, so the corpus-sized
    side never shuffles on the hot path.
    """
    train = train_df if train_df is not None else df
    bg_types = (
        train.select(F.explode(F.expr(bigrams_expr(text_col))).alias("bg"))
        .groupBy(F.col("bg.prev").alias("v"), F.col("bg.cur").alias("w"))
        .agg(F.count("*").alias("bg_n"))
    )
    # continuation / context-diversity tables: group counts of the TYPE
    # table (vocabulary-sized), plus c(v) as the sum over its row group
    n1p = bg_types.groupBy("v").agg(
        F.count("*").alias("n1p"), F.sum("bg_n").alias("ctx_n")
    )
    n1c = bg_types.groupBy("w").agg(F.count("*").alias("n1c"))
    vocab = (
        train.select(F.explode(F.expr(tokens_expr(text_col))).alias("t"))
        .agg(F.countDistinct("t").alias("v_sz"))
    )
    totals = bg_types.agg(F.count("*").alias("bb")).crossJoin(
        F.broadcast(vocab)
    )
    ex = df.select(
        F.col(id_col), F.explode(F.expr(bigrams_expr(text_col))).alias("bg")
    ).select(
        id_col, F.col("bg.prev").alias("v"), F.col("bg.cur").alias("w")
    )
    st = (
        ex.select("v", "w").distinct()
        .join(bg_types, ["v", "w"], "left")
        .join(n1p, ["v"], "left")
        .join(n1c, ["w"], "left")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "logkn_q",
            F.expr(
                f"cast(round(ln(CASE WHEN ctx_n IS NOT NULL THEN "
                f"(greatest(cast(coalesce(bg_n, 0) as double) - 0.75, 0.0) "
                f"+ 0.75 * n1p * ((coalesce(n1c, 0) + 1) "
                f"/ cast(bb + v_sz as double))) / cast(ctx_n as double) "
                f"ELSE (coalesce(n1c, 0) + 1) / cast(bb + v_sz as double) "
                f"END) * {_Q}) as bigint)"
            ),
        )
        .select("v", "w", "logkn_q")
        .persist()
    )
    if st.count() <= broadcast_rows:
        st = F.broadcast(st)
    per_doc = (
        ex.join(st, ["v", "w"])
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("logkn_q").alias("sum_logkn_q"),
        )
    )
    return (
        df.join(per_doc, id_col, "left")
        .withColumn("n_bigrams", F.coalesce(F.col("n_bigrams"), F.lit(0)))
        .withColumn(
            "sum_logkn_q", F.coalesce(F.col("sum_logkn_q"), F.lit(0))
        )
        .withColumn(
            "avg_nll_kn",
            F.expr(
                f"CASE WHEN n_bigrams > 0 THEN "
                f"round(-sum_logkn_q / cast(n_bigrams as double) / {_Q}, 6) "
                f"END"
            ),
        )
    )
