"""Distributed suffix arrays over the token corpus (prefix doubling).

The exact counterpart of the hashed duplicate-n-gram machinery in
``dedup.py``: Lee et al. 2021 ("Deduplicating Training Data Makes
Language Models Better") build their EXACTSUBSTR pass on a suffix array,
because a suffix array answers the question n-gram hashing cannot ask —
*what is the longest substring starting here that occurs anywhere else
in the corpus?* — without fixing the length L up front.  This module
builds that structure with nothing but DataFrame joins:

- **Prefix doubling (Manber–Myers)**: after round *j* every corpus
  position carries an order-preserving rank of its ``2^j``-token prefix;
  round *j+1* pairs each position's rank with the rank ``2^j`` tokens
  ahead and re-ranks the pairs.  ``O(log max_doc_len)`` rounds, each a
  bounded equi-join plus a re-rank — never a comparison sort of whole
  suffixes, never anything quadratic.
- **Order-preserving global dense rank without a global window**
  (``order_preserving_rank``): ``Window.orderBy(...)`` funnels the
  corpus through ONE task; instead we range-repartition on the sort key,
  dense-rank *within* each (parallel) partition, and shift each
  partition's ranks by the exclusive prefix sum of the per-partition
  distinct counts — a partition-count-sized frame.  Two Exchanges,
  all partitions busy, and the result is boundary-invariant (equal keys
  always co-locate under range partitioning, and the concatenation of
  range partitions is globally sorted).  This is the rank primitive
  every doubling round uses.
- **LCP by rank-level descent**: the doubling rounds leave behind rank
  tables for every power-of-two prefix length; the longest common
  prefix of two suffixes is read off greedily from the highest level
  down (add ``2^j`` whenever the level-*j* ranks agree), so
  neighbour-LCP over the whole suffix array is ``log`` equi-joins
  against position-count-sized tables — the classic sparse-table walk,
  distributed.

Suffixes never cross document boundaries (a crawl corpus has no
meaningful cross-document substring), so every join partner is guarded
by ``pos + k < doclen`` and global position ids are
``doc_index * stride + pos`` with ``stride`` = max document length —
collision-free by construction, no corpus-wide prefix sum needed.

Scale shape: n = total corpus tokens.  Each doubling round is one
self-equi-join on a bigint key plus one re-rank (2 Exchanges);
``rounds = ceil(log2(max_doc_len))`` depends on the longest DOCUMENT,
not the corpus, so a 100 TB corpus of bounded-length pages pays the
same ~17 rounds as a 1 GB one — the shuffled bytes per round are the
position table (columns: 3 bigints), not the text.

Tokenization is ``tokens_expr`` — the same lowercased whitespace tokens
as the hashed dup-span operator, so ``sa_duplicate_spans`` is
value-identical to ``duplicate_ngram_spans`` (same oracle SQL, totally
different machinery — the hash path detects fixed-L repeats, this path
also yields the maximal repeat length per position).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import tokens_expr


def _ranked_with_count(
    df: DataFrame,
    key_cols: list,
    out_col: str,
    num_partitions: Optional[int] = None,
):
    """``(ranked_df, n_distinct)`` — the rank body shared with the public
    wrapper; the doubling loop uses the distinct count (a by-product of
    the offset computation) as its saturation test without paying a
    second full-corpus aggregation."""
    keys = [F.col(c) for c in key_cols]
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    d = (
        df.repartitionByRange(int(parts), *keys)
        .withColumn("_pid", F.spark_partition_id())
    )
    local = Window.partitionBy("_pid").orderBy(*keys)
    # MATERIALIZE before branching: the offsets below re-read _pid, and
    # _pid is only meaningful within ONE physical evaluation — AQE may
    # coalesce the range exchange differently (and the range sampler may
    # re-sample) per plan branch, silently shifting every offset. One
    # localCheckpoint pins partition ids for both consumers; it doubles as
    # the per-round lineage truncation the doubling loop needs anyway.
    d = d.withColumn("_lr", F.dense_rank().over(local)).localCheckpoint(
        eager=True
    )
    # one row per partition: distinct-key count == max local dense rank.
    # Partition-count rows — collected, prefix-summed on the driver, and
    # rejoined as a broadcast literal frame (no single-partition window).
    sizes = sorted(
        (r["_pid"], r["_nd"])
        for r in d.groupBy("_pid").agg(F.max("_lr").alias("_nd")).collect()
    )
    off, rows = 0, []
    for pid, nd in sizes:
        rows.append((pid, off))
        off += nd
    offsets = df.sparkSession.createDataFrame(
        rows or [(0, 0)], "_pid int, _off long"
    )
    ranked = (
        d.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_lr") - 1).cast("long"))
        .drop("_pid", "_lr", "_off")
    )
    return ranked, off


def order_preserving_rank(
    df: DataFrame,
    key_cols: list,
    out_col: str = "rank",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Globally dense, order-preserving 0-based rank of ``key_cols``
    without a single-partition window.

    Equal keys get equal ranks; ``k1 < k2`` (null-first Spark ordering)
    implies ``rank(k1) < rank(k2)``; ranks are dense (0..n_distinct-1).
    Plan: range-Exchange on the keys, parallel per-partition
    ``dense_rank``, then a broadcast join against the partition-offset
    frame (one row per partition, prefix-summed on the driver).
    """
    ranked, _ = _ranked_with_count(df, key_cols, out_col, num_partitions)
    return ranked


def corpus_positions(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(id_col, pos, tok, doclen, gid)`` — one row per corpus token.

    ``gid = doc_index * stride + pos`` with ``stride = max doclen``:
    unique, contiguous within a document, and ``gid + k`` never collides
    with another document because every use is guarded by
    ``pos + k < doclen``.  ``doc_index`` is an ``order_preserving_rank``
    of the distinct ids (dense even when ids are sparse), so the stride
    product cannot overflow before ``n_docs * max_doclen`` exceeds
    2^63 — beyond any real corpus.
    """
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.expr(tokens_expr(text_col))).alias("pos", "tok"),
    )
    w = Window.partitionBy(id_col)
    toks = toks.withColumn("doclen", F.count("*").over(w).cast("int"))
    dids = order_preserving_rank(
        docs.select(id_col).distinct(), [id_col], "_didx"
    )
    stride = toks.agg(F.max("doclen")).collect()[0][0] or 1
    return (
        toks.join(dids, id_col)
        .withColumn(
            "gid", (F.col("_didx") * F.lit(int(stride)) + F.col("pos")).cast("long")
        )
        .drop("_didx")
    )


def _double_once(ranked: DataFrame, k: int) -> DataFrame:
    """One prefix-doubling round: combine each position's rank with the
    rank ``k`` tokens ahead (−1 past the document end — shorter suffixes
    sort first, matching element-wise array comparison), then re-rank.
    ``ranked`` carries ``(gid, pos, doclen, r, ...)``; returns
    ``(re-ranked frame, n distinct rank classes)``."""
    partner = ranked.select(
        F.col("gid").alias("_pg"), F.col("r").alias("_pr")
    )
    paired = (
        ranked.withColumn(
            "_pg",
            F.when(
                F.col("pos") + F.lit(k) < F.col("doclen"),
                F.col("gid") + F.lit(k),
            ),
        )
        .join(partner, "_pg", "left")
        .withColumn("r2", F.coalesce(F.col("_pr"), F.lit(-1)))
        .drop("_pg", "_pr")
    )
    out, n_distinct = _ranked_with_count(paired, ["r", "r2"], "_nr")
    return out.drop("r", "r2").withColumnRenamed("_nr", "r"), n_distinct


def _doubling_ranks(
    pos0: DataFrame, target_len: Optional[int] = None, keep_levels: bool = False
):
    """Run prefix doubling from single-token ranks.

    Returns ``(ranked, prefix_len, levels)``: ``ranked`` has column ``r``
    ranking each position's prefix of ``prefix_len`` tokens (saturated —
    all rank classes singleton or document ends reached — when
    ``target_len`` is None).  With ``keep_levels``, ``levels`` is
    ``[(2^j, (gid, r) frame)]`` for the LCP descent.  Each round is
    localCheckpoint-ed: the loop is iterative and Catalyst must not
    re-derive round *j* once per later round.
    """
    # lineage per round is already truncated by the localCheckpoint inside
    # the rank primitive — each round's frame is a broadcast join over a
    # materialized relation, so no extra checkpoint here
    ranked, n_classes = _ranked_with_count(pos0, ["tok"], "r")
    ranked = ranked.drop("tok")
    agg = ranked.agg(
        F.count("*").alias("n"), F.max("doclen").alias("m")
    ).collect()[0]
    n, max_len = agg["n"], agg["m"] or 1
    levels = [(1, ranked.select("gid", "r"))]
    k = 1
    while target_len is None or k < target_len:
        if n_classes == n or k >= max_len:
            break
        ranked, n_classes = _double_once(ranked, k)
        k *= 2
        if keep_levels:
            levels.append((k, ranked.select("gid", "r")))
    return ranked, k, (levels if keep_levels else None)


def suffix_array_ranks(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(id_col, pos, sa_rank)`` — the suffix array as a rank column.

    ``sa_rank`` is the 0-based dense lexicographic rank of the suffix
    ``tokens[pos:]`` among ALL corpus suffixes (element-wise token
    comparison; a suffix that is a proper prefix of another sorts
    first).  Identical suffixes tie — exactly ``dense_rank() over
    (order by suffix)``, which is what the DuckDB oracle runs.
    """
    pos0 = corpus_positions(docs, text_col, id_col)
    ranked, _, _ = _doubling_ranks(pos0)
    # saturated prefix ranks are suffix ranks except for tied classes of
    # non-identical-length remainders: ranks stop refining once classes
    # are singleton OR k >= max doclen; at k >= doclen every prefix IS
    # the whole suffix (padded with -1), so ranks are final either way
    return ranked.select(id_col, "pos", F.col("r").alias("sa_rank"))


def max_repeat_len(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(id_col, pos, repeat_len)`` — for every corpus position, the
    length of the LONGEST substring starting there that also occurs at
    some other corpus position (0 when even the single token is unique).

    In suffix-array order the best LCP partner of a suffix is one of its
    two neighbours, so this is: rank → neighbour pairing → LCP descent
    over the power-of-two rank tables (``log`` equi-joins).  Tied rank
    classes (identical suffixes) short-circuit to the full remaining
    length without any descent.
    """
    pos0 = corpus_positions(docs, text_col, id_col)
    ranked, _, levels = _doubling_ranks(pos0, keep_levels=True)
    me = ranked.select(
        id_col, "pos", "gid", "doclen", "r",
        (F.col("doclen") - F.col("pos")).alias("_rem"),
    )
    # tie classes: identical suffixes → repeat_len = full remainder
    dup_r = (
        ranked.groupBy("r").agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= 2).select("r")
    )
    tied = me.join(dup_r, "r", "left_semi").select(
        id_col, "pos", F.col("_rem").alias("repeat_len")
    )
    # untied suffixes: LCP against rank-neighbours. Build (gid, ngid)
    # pairs for rank r -> r-1 and r -> r+1 via representative gids per
    # rank (each untied rank has exactly one gid; tied ranks may be the
    # neighbour — any member works for LCP since tied suffixes are equal,
    # min() picks one deterministically).
    reps = ranked.groupBy("r").agg(F.min("gid").alias("ngid"))
    untied = me.join(dup_r, "r", "left_anti")
    pairs = None
    for shift in (-1, 1):
        p = (
            untied.withColumn("_nr", F.col("r") + F.lit(shift))
            .join(
                reps.select(F.col("r").alias("_nr"), "ngid"), "_nr"
            )
            .select(id_col, "pos", "gid", "doclen", "ngid")
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    # greedy descent: walk levels high→low, extend the match by 2^j
    # whenever the level-j ranks of (gid+lcp, ngid+lcp) agree AND the
    # extension stays inside BOTH remainders (rem = doclen - pos; the
    # power-of-two levels reach any value <= rem exactly, binary-style,
    # so the bound never undercounts). A join miss (probe past either
    # document's end) leaves the rank null -> no extend.
    pairs = pairs.withColumn("lcp", F.lit(0).cast("long"))
    nbr_len = ranked.select(
        F.col("gid").alias("ngid"),
        (F.col("doclen") - F.col("pos")).alias("_nrem"),
    )
    pairs = pairs.join(nbr_len, "ngid")
    for k, lvl in sorted(levels, key=lambda t: -t[0]):
        a = lvl.select(F.col("gid").alias("_ga"), F.col("r").alias("_ra"))
        b = lvl.select(F.col("gid").alias("_gb"), F.col("r").alias("_rb"))
        pairs = (
            pairs.withColumn("_ga", F.col("gid") + F.col("lcp"))
            .withColumn("_gb", F.col("ngid") + F.col("lcp"))
            .join(a, "_ga", "left")
            .join(b, "_gb", "left")
            .withColumn(
                "lcp",
                F.when(
                    F.col("_ra").isNotNull()
                    & F.col("_rb").isNotNull()
                    & (F.col("_ra") == F.col("_rb"))
                    & (F.col("lcp") + F.lit(k)
                       <= F.col("doclen") - F.col("pos"))
                    & (F.col("lcp") + F.lit(k) <= F.col("_nrem")),
                    F.col("lcp") + F.lit(k),
                ).otherwise(F.col("lcp")),
            )
            .drop("_ga", "_gb", "_ra", "_rb")
            .localCheckpoint(eager=True)
        )
    best = pairs.groupBy(id_col, "pos").agg(F.max("lcp").alias("_best"))
    # positions with no rank-neighbour at all (single-suffix corpus)
    # still get a row: repeat_len 0
    untied_out = (
        untied.select(id_col, "pos")
        .join(best, [id_col, "pos"], "left")
        .select(
            id_col, "pos",
            F.coalesce(F.col("_best"), F.lit(0)).cast("int").alias("repeat_len"),
        )
    )
    return untied_out.unionByName(
        tied.select(id_col, "pos", F.col("repeat_len").cast("int"))
    )


def sa_duplicate_spans(
    docs: DataFrame,
    min_len: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal per-document token spans covered by a substring of
    ``>= min_len`` tokens that occurs at least twice corpus-wide —
    computed from the suffix array's per-position maximal repeat
    lengths, NOT from n-gram hashes.

    Value-identical to ``dedup.duplicate_ngram_spans(n=min_len,
    min_count=2)``: a position t lies in a duplicated ``min_len``-gram
    iff some start p <= t <= p + repeat_len(p) - 1 has
    ``repeat_len(p) >= min_len`` (any repeat of length m >= min_len
    contains duplicated min_len-grams at each of its first
    m - min_len + 1 offsets).  Same gaps-and-islands merge, same output
    schema ``(id_col, span_start, span_end, span_tokens)`` — the gate
    runs the hash operator's DuckDB oracle against THIS plan.
    """
    rep = max_repeat_len(docs, text_col, id_col)
    covered = (
        rep.filter(F.col("repeat_len") >= min_len)
        .select(
            id_col,
            F.explode(
                F.expr("sequence(pos, pos + repeat_len - 1)")
            ).alias("t"),
        )
        .distinct()
    )
    w = Window.partitionBy(id_col).orderBy("t")
    return (
        covered.withColumn("_grp", F.col("t") - F.row_number().over(w))
        .groupBy(id_col, "_grp")
        .agg(
            F.min("t").cast("int").alias("span_start"),
            F.max("t").cast("int").alias("span_end"),
            (F.max("t") - F.min("t") + 1).cast("int").alias("span_tokens"),
        )
        .drop("_grp")
    )
