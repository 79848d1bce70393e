"""Benchmark decontamination and token-budget corpus mixing.

Two operators every large-scale training-data pipeline needs between
"corpus is filtered" and "corpus is shipped":

1. **Decontamination** — remove (or flag) training documents that share
   long n-grams with an evaluation/benchmark set, so downstream models are
   not graded on memorized test data. The standard recipe (n-gram overlap
   against the eval set's shingle inventory) is exactly a broadcast
   semi-join at scale: the eval side is tiny (benchmarks are KBs-to-MBs),
   the training side is the 100 TB corpus, so the eval shingle set
   broadcasts and the corpus-side explode never shuffles until the
   per-document hit count's partial aggregation (which only carries
   *contaminated* shingle rows — near-zero for a clean corpus).

2. **Token-budget mixing** — given per-source weights and a total token
   budget, deterministically sample each source to its share. Selection
   priority is a seeded hash of the document id, so the sample is (a)
   reproducible across runs/cluster sizes, (b) uniform within a source,
   and (c) stable under corpus growth (new documents only displace hash
   ranks locally). Two implementations:

   - ``sample_to_token_budget`` — exact: running token sum per source over
     hash order (one window per source partition). Correct authority;
     single-reducer-per-source, so it is for source counts >> executor
     count or moderate per-source row counts.
   - ``sample_to_token_budget_approx`` — the 100 TB path: bucket the hash
     space (4096 buckets/source), aggregate token sums per bucket (one
     map-side-combined shuffle of #sources x #buckets rows), pick each
     source's bucket cutoff driver-side, and filter with a broadcast map.
     No window, no per-source serialization; budget error is bounded by
     one bucket's token mass (~budget/4096 for a uniform source).

No reference counterpart (the reference crawls; it does not assemble
training mixes) — these extend the pipeline the brief's training-data
section mandates, sharing the cross-engine hash/shingle primitives of
``operators.dedup`` so every output is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import _hash60, shingles_expr, tokens_expr


# --------------------------------------------------------------------------
# decontamination
# --------------------------------------------------------------------------

def eval_ngram_set(
    eval_docs: DataFrame, text_col: str = "text", shingle_k: int = 13
) -> DataFrame:
    """Distinct 60-bit hashes of the eval set's k-gram shingles: column
    ``g`` (bigint). Small by construction — benchmark suites are MBs — so
    callers broadcast it."""
    sh = shingles_expr(text_col, shingle_k)
    return (
        eval_docs.select(F.explode(F.expr(sh)).alias("_s"))
        .select(F.expr(_hash60("_s")).alias("g"))
        .distinct()
    )


def contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 13,
    min_overlap: int = 1,
) -> DataFrame:
    """Per-document benchmark-overlap counts.

    Output = ``docs`` + ``n_contaminated`` (distinct doc shingles that
    appear in the eval set, bigint) + ``contaminated`` (boolean,
    ``n_contaminated >= min_overlap``).

    Plan shape at scale: eval shingle hashes broadcast; the doc-side
    explode joins map-side (no shuffle of the corpus), the per-doc count
    shuffles only matched rows, and the count joins back to ``docs``
    broadcast (contaminated-doc counts are tiny next to the corpus — if a
    large fraction of the corpus overlaps the benchmark, the problem is
    upstream of this operator). Matching is on 60-bit shingle hashes, both
    sides: a collision flags at most one extra shingle per ~2^60 pairs.
    """
    sh = shingles_expr(text_col, shingle_k)
    ev = eval_ngram_set(eval_docs, text_col, shingle_k)
    doc_shingles = docs.select(
        F.col(id_col), F.explode(F.expr(sh)).alias("_s")
    ).select(id_col, F.expr(_hash60("_s")).alias("g"))
    hits = (
        doc_shingles.join(F.broadcast(ev), "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        docs.join(F.broadcast(hits), id_col, "left")
        .withColumn(
            "n_contaminated", F.coalesce(F.col("n_contaminated"), F.lit(0))
        )
        .withColumn(
            "contaminated", F.col("n_contaminated") >= F.lit(int(min_overlap))
        )
    )


def contamination_pruned(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 13,
    min_overlap: int = 1,
    bloom_cfg=None,
    broadcast_bytes: int = 64 << 20,
) -> DataFrame:
    """Bloom-pruned benchmark-overlap counts — same output as
    :func:`contamination`, different scale envelope.

    :func:`contamination` broadcasts the *exact* eval shingle-hash set,
    which caps the eval side at executor memory (fine for MB-scale
    benchmark suites, wrong once the decontamination target is itself a
    corpus — a held-out split, a licensed set, 10^9+ shingles at 8 bytes
    each). This variant broadcasts a *fixed-size* Bloom sidecar instead
    (reusing the frontier's ``frontier/bloom.py`` blobs — size is
    ``n_buckets * m_bits/8`` bytes by config, ~10 bits per eval shingle
    for ~1% FP), probes every doc shingle map-side, and sends only the
    Bloom-positive survivors — the true overlaps plus the ~1% FP floor —
    into an exact verify join against the eval table. Bloom false
    negatives are structurally impossible, and the verify join removes
    every false positive, so the result is *exactly* ``contamination``'s:
    the sketch changes the plan, never the answer.

    Plan shape at scale: corpus shingles are probed inside the scan
    (``mapInPandas`` over the blob broadcast — zero corpus shuffle) when
    the blob set fits ``broadcast_bytes``; past that the blobs stay
    partitioned and the probe becomes the cogrouped per-bucket shape
    (shuffles 16-byte ``(id, hash)`` pairs, never text). The exact
    verify join then touches suspect rows only — at a sane contamination
    rate that is a vanishing fraction of the corpus — and the per-doc
    counts join back broadcast exactly as in :func:`contamination`.
    """
    import numpy as np
    from pyspark.sql import types as T

    from crawler_spark.frontier.bloom import (
        BloomConfig,
        _test_bits,
        build_blobs,
    )

    cfg = bloom_cfg or BloomConfig()
    ev = eval_ngram_set(eval_docs, text_col, shingle_k)
    blobs = build_blobs(ev.select(F.col("g").alias("url_hash")), cfg)
    sh = shingles_expr(text_col, shingle_k)
    pairs = docs.select(
        F.col(id_col), F.explode(F.expr(sh)).alias("_s")
    ).select(id_col, F.expr(_hash60("_s")).alias("g"))
    out_schema = T.StructType([pairs.schema[id_col], pairs.schema["g"]])

    if cfg.n_buckets * (cfg.m_bits // 8) <= broadcast_bytes:
        # driver-known-small sidecar: broadcast the blobs, probe map-side
        blob_map = {
            int(r["bucket"]): np.frombuffer(r["bits"], dtype=np.uint8)
            for r in blobs.collect()
        }
        bc = docs.sparkSession.sparkContext.broadcast(blob_map)

        def probe_batches(batches):
            table = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                h = pdf["g"].to_numpy()
                buckets = h % cfg.n_buckets  # _hash60 is nonnegative
                keep = np.zeros(len(h), dtype=bool)
                for b in np.unique(buckets):
                    bits = table.get(int(b))
                    if bits is None:
                        continue  # empty bucket: definite miss
                    m = buckets == b
                    keep[m] = _test_bits(bits, h[m], cfg)
                if keep.any():
                    yield pdf.loc[keep, [id_col, "g"]]

        suspects = pairs.mapInPandas(probe_batches, schema=out_schema)
    else:
        # sidecar too big to broadcast: cogroup per bucket, blobs stay put
        bucketed = pairs.withColumn("bucket", cfg.bucket_col(F.col("g")))

        def probe(c_pdf, b_pdf):
            if len(c_pdf) == 0 or len(b_pdf) == 0:
                return c_pdf.iloc[0:0][[id_col, "g"]]
            bits = np.frombuffer(b_pdf["bits"].iloc[0], dtype=np.uint8)
            if len(b_pdf) > 1:  # pre-merge safety: OR extra blobs
                bits = bits.copy()
                for blob in b_pdf["bits"].iloc[1:]:
                    bits |= np.frombuffer(blob, dtype=np.uint8)
            keep = _test_bits(bits, c_pdf["g"].to_numpy(), cfg)
            return c_pdf.loc[keep, [id_col, "g"]]

        suspects = (
            bucketed.groupBy("bucket")
            .cogroup(blobs.groupBy("bucket"))
            .applyInPandas(probe, schema=out_schema)
        )

    hits = (
        suspects.join(ev, "g")  # exact verify: kills every Bloom FP
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        docs.join(F.broadcast(hits), id_col, "left")
        .withColumn(
            "n_contaminated", F.coalesce(F.col("n_contaminated"), F.lit(0))
        )
        .withColumn(
            "contaminated", F.col("n_contaminated") >= F.lit(int(min_overlap))
        )
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 13,
    min_overlap: int = 1,
) -> DataFrame:
    """Rows of ``docs`` whose benchmark overlap is below ``min_overlap``
    (schema unchanged — the flag columns are internal)."""
    flagged = contamination(
        docs, eval_docs, text_col, id_col, shingle_k, min_overlap
    )
    return flagged.filter(~F.col("contaminated")).drop(
        "n_contaminated", "contaminated"
    )


def semantic_contamination(
    df: DataFrame,
    eval_rows: Sequence,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    max_eval: int = 1024,
) -> DataFrame:
    """Per-vector max cosine to ANY eval-set embedding — the
    embedding-space complement of :func:`contamination`: n-gram overlap
    catches verbatim benchmark leakage, this catches paraphrased /
    re-rendered leakage that shares no 13-gram.

    ``eval_rows`` are ``(eval_id, embedding)`` pairs collected from the
    (small-by-contract) eval set. Output = ``df`` + ``max_eval_cosine``
    (double), ``nearest_eval_id`` (bigint; cosine ties break to the
    SMALLEST eval id), ``contaminated`` (``max_eval_cosine >=
    threshold``). Zero-norm corpus vectors define cosine 0.0 (never a
    NaN into the max — Spark orders NaN above every double).

    Plan shape at scale: the eval set is compiled into ONE codegen'd
    column expression (the ``nearest_centroid_expr`` pattern) — the
    corpus is scanned once, never shuffled, never joined; cost is
    ``|corpus| * |eval|`` fused multiply-adds map-side. ``max_eval``
    (default 1024) bounds the expression so codegen stays sane; for
    benchmark suites beyond that, go through the ANN path instead
    (``ivf_topk`` with eval vectors as queries) and anti-join the hits.
    Raises ``ValueError`` (loudly, never silently truncates) on an
    empty / oversized eval set or a zero-norm eval vector.
    """
    import math

    evals = list(eval_rows)
    if not evals or len(evals) > max_eval:
        raise ValueError(
            f"eval set must have 1..{max_eval} vectors, got {len(evals)}; "
            "for larger suites use the ANN path (ivf_topk) + anti-join"
        )
    from crawler_spark.operators.similarity import _dot_expr, _norm_expr

    terms = []
    for eid, emb in evals:
        norm_e = math.sqrt(sum(float(x) * float(x) for x in emb))
        if norm_e == 0.0:
            raise ValueError(f"eval vector {eid!r} has zero norm")
        elit = "array(" + ", ".join(f"{float(x)!r}d" for x in emb) + ")"
        cos = (
            f"CASE WHEN _nv = 0.0d THEN 0.0d "
            f"ELSE ({_dot_expr(vec_col, elit)}) / (_nv * {norm_e!r}d) END"
        )
        terms.append(f"named_struct('c', {cos}, 'ne', {-int(eid)}L)")
    best = f"array_max(array({', '.join(terms)}))"
    return (
        df.withColumn("_nv", F.expr(_norm_expr(vec_col)))
        .withColumn("_best", F.expr(best))
        .withColumn("max_eval_cosine", F.col("_best.c"))
        .withColumn("nearest_eval_id", (-F.col("_best.ne")).cast("bigint"))
        .withColumn(
            "contaminated", F.col("max_eval_cosine") >= F.lit(threshold)
        )
        .drop("_nv", "_best")
    )


def decontaminate_semantic(
    df: DataFrame,
    eval_rows: Sequence,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    max_eval: int = 1024,
) -> DataFrame:
    """Rows of ``df`` whose nearest eval-set embedding is below
    ``threshold`` cosine (schema unchanged — the flag columns are
    internal), mirroring :func:`decontaminate` for the embedding path."""
    flagged = semantic_contamination(
        df, eval_rows, vec_col, id_col, threshold, max_eval
    )
    return flagged.filter(~F.col("contaminated")).drop(
        "max_eval_cosine", "nearest_eval_id", "contaminated"
    )


# --------------------------------------------------------------------------
# token-budget mixing
# --------------------------------------------------------------------------

def _priority_expr(id_col: str) -> str:
    """Deterministic per-document sampling priority: 60-bit hash of the id
    string — uniform, engine-portable, independent of row order."""
    return _hash60(f"cast({id_col} as string)")


def _source_budgets(
    weights: Dict[str, float], token_budget: int
) -> Dict[str, int]:
    """weight share -> integer token budget per source (floor; a source
    absent from ``weights`` gets 0 and is dropped)."""
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to > 0")
    return {
        s: int(token_budget * (float(w) / total)) for s, w in weights.items()
    }


def sample_to_token_budget(
    docs: DataFrame,
    weights: Optional[Dict[str, float]],
    token_budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "ws_tokens",
    text_col: str = "text",
) -> DataFrame:
    """Exact mixing: per source, take documents in hash-priority order
    while the running token sum stays within the source's budget share.

    ``weights=None`` means uniform over the sources actually present:
    every source gets ``token_budget // countDistinct(source)`` tokens —
    ONE scalar aggregation, never a host list collected to the driver
    (web corpora have 10^6-10^8 hosts; the explicit-dict path is for
    caller-supplied small mixtures like {'wiki': 3, 'web': 1}).

    Output = surviving ``docs`` rows + ``n_tokens`` (the token count used
    for budgeting). If ``tokens_col`` is absent it is derived as
    whitespace-token count of ``text_col`` (same rule as
    ``text_analysis.token_count``).

    The inclusive running sum means a document is kept only if it fits
    entirely — the sample never exceeds the budget; it undershoots by at
    most one document's tokens per source.
    """
    if tokens_col not in docs.columns:
        docs = docs.withColumn(
            tokens_col,
            F.expr(f"size({tokens_expr(text_col)})"),
        )
    if weights is None:
        n_sources = docs.select(source_col).distinct().count()
        per = int(token_budget // max(n_sources, 1))
        budget_col = F.lit(per)
    else:
        budgets = _source_budgets(weights, token_budget)
        bmap = F.create_map(
            *[x for s, b in sorted(budgets.items()) for x in (F.lit(s), F.lit(b))]
        )
        docs = docs.filter(F.col(source_col).isin(list(budgets)))
        budget_col = bmap[F.col(source_col)]
    w = Window.partitionBy(source_col).orderBy("_pri", id_col)
    return (
        docs.withColumn("_pri", F.expr(_priority_expr(id_col)))
        .withColumn("_cum", F.sum(tokens_col).over(w))
        .filter(F.col("_cum") <= budget_col)
        .drop("_pri", "_cum")
        .withColumn("n_tokens", F.col(tokens_col).cast("long"))
    )


_N_BUCKETS = 4096


def sample_to_token_budget_approx(
    docs: DataFrame,
    weights: Dict[str, float],
    token_budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "ws_tokens",
    text_col: str = "text",
    n_buckets: int = _N_BUCKETS,
) -> DataFrame:
    """Scale-path mixing: bucket-histogram cutoffs instead of windows.

    Pass 1 aggregates token sums per (source, priority-bucket) — a
    map-side-combined shuffle of at most ``#sources * n_buckets`` rows
    regardless of corpus size — and the driver picks, per source, the
    largest bucket prefix whose token mass fits the budget. Pass 2 filters
    ``priority_bucket < cutoff`` with a broadcast map: no window, no
    per-source single reducer, identical output at every parallelism.

    Guarantees: never exceeds budget; undershoots by at most one bucket's
    token mass per source (~budget / n_buckets when priorities are
    uniform, which the hash makes them).

    ``weights=None`` = uniform over observed sources (one scalar count,
    like the exact sampler). Note the histogram itself is driver-collected
    (#sources x n_buckets rows): with very large host counts, cap the
    mixture granularity by bucketing hosts into source GROUPS upstream.
    """
    if tokens_col not in docs.columns:
        docs = docs.withColumn(
            tokens_col,
            F.expr(f"size({tokens_expr(text_col)})"),
        )
    if weights is None:
        n_sources = docs.select(source_col).distinct().count()
        per = int(token_budget // max(n_sources, 1))
        budgets: Dict[str, int] = {}
    else:
        budgets = _source_budgets(weights, token_budget)
        docs = docs.filter(F.col(source_col).isin(list(budgets)))
    docs = docs.withColumn(
        "_bucket", F.pmod(F.expr(_priority_expr(id_col)), F.lit(n_buckets))
    )
    hist = (
        docs.groupBy(source_col, "_bucket")
        .agg(F.sum(tokens_col).alias("_t"))
        .collect()
    )
    per_source: Dict[str, Dict[int, int]] = {}
    for r in hist:
        per_source.setdefault(r[source_col], {})[r["_bucket"]] = int(r["_t"])
    cutoffs: Dict[str, int] = {}
    for s, bmap_tokens in per_source.items():
        budget, cum, cut = budgets.get(s, per if weights is None else 0), 0, 0
        for b in sorted(bmap_tokens):
            if cum + bmap_tokens[b] > budget:
                break
            cum += bmap_tokens[b]
            cut = b + 1
        cutoffs[s] = cut
    cmap = F.create_map(
        *[
            x
            for s, c in sorted(cutoffs.items())
            for x in (F.lit(s), F.lit(c))
        ]
    )
    return (
        docs.filter(F.col("_bucket") < F.coalesce(cmap[F.col(source_col)], F.lit(0)))
        .drop("_bucket")
        .withColumn("n_tokens", F.col(tokens_col).cast("long"))
    )


def split_assign(
    docs: DataFrame,
    weights: Dict[str, float] = None,
    salt: str = "split-v1",
    id_col: str = "doc_id",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/validation/test assignment by id hash.

    Each document lands in the split whose cumulative weight interval
    contains ``hash60(salt|id) % 10000`` — so membership depends only on
    the id and the salt, never on row order, partitioning, or the rest of
    the corpus (adding documents later cannot move existing ones between
    splits, the property that keeps eval sets stable across corpus
    versions). Zero shuffle: one hash + one CASE per row.

    ``weights`` defaults to {'train': .98, 'validation': .01, 'test': .01}.
    Fractions are materialized at 1/10000 resolution (documented contract;
    mirror in the oracle).
    """
    weights = weights or {"train": 0.98, "validation": 0.01, "test": 0.01}
    total = sum(weights.values())
    acc, arms, lo = 0.0, [], 0
    items = sorted(weights.items())
    for name, frac in items:
        acc += frac / total
        hi = round(acc * 10_000)
        arms.append((name, lo, hi))
        lo = hi
    arms[-1] = (arms[-1][0], arms[-1][1], 10_000)  # close rounding gaps
    h = _hash60(f"concat('{salt}', '|', cast({id_col} as string))")
    case = " ".join(
        f"WHEN pmod({h}, 10000) >= {lo} AND pmod({h}, 10000) < {hi} "
        f"THEN '{name}'"
        for name, lo, hi in arms
    )
    return docs.withColumn(out_col, F.expr(f"CASE {case} END"))


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "ws_tokens",
    text_col: str = "text",
    shards: int = 1,
) -> DataFrame:
    """Block sequence packing: assign documents to fixed-capacity
    training sequences (bins of ``seq_len`` tokens) for LLM pretraining
    batch assembly.

    Documents are ordered deterministically within their source (hash
    priority, then id — the same rule the token-budget sampler uses) and
    assigned to bin ``floor(exclusive_running_token_sum / seq_len)``:
    consecutive blocks of ~seq_len tokens. This is the concat-and-slice
    packing used by most pretraining pipelines — every bin averages
    exactly seq_len tokens and the document order inside each bin is
    pinned; a document whose tokens straddle a block boundary belongs to
    the bin where it starts, and the writer either truncates its tail or
    treats seq_len as a soft target with headroom. (Exact first-fit
    packing needs a sequential per-source scan — the one recurrence that
    cannot parallelize past a single key — so it is deliberately not what
    this operator promises.)

    Output: input rows + ``n_tokens``, ``bin_id`` (string
    ``{source}/{k}``), ``bin_pos`` (0-based position within the bin) —
    everything a writer needs to materialize packed sequences with
    deterministic document order.

    Scale shape: one shuffle on the window key and a running-sum window —
    identical to the budget sampler. The parallel unit is
    ``(source, shard)``: with ``shards=1`` the window partitions by source
    alone (the authority ordering), and ``shards=k`` pre-splits every
    source into ``pmod(hash(id), k)`` deterministic sub-shards so ONE
    dominant source — the normal case in web corpora — packs across k
    window tasks instead of funneling through a single reducer. Bins stay
    dense and deterministic per shard (``bin_id = {{source}}/{{shard}}/{{k}}``);
    the only cost is up to ``k-1`` underfull trailing bins per source,
    which is noise when sources hold thousands of sequences.
    """
    if tokens_col not in docs.columns:
        docs = docs.withColumn(
            tokens_col,
            F.expr(f"size({tokens_expr(text_col)})"),
        )
    docs = docs.withColumn("_pri", F.expr(_priority_expr(id_col)))
    if shards > 1:
        docs = docs.withColumn(
            "_shard", F.pmod(F.col("_pri"), F.lit(shards)).cast("int")
        )
        part_cols = [source_col, "_shard"]
        bin_tag = (
            f"concat({source_col}, '/', cast(_shard as string), "
            "'/', cast(_bin as string))"
        )
    else:
        part_cols = [source_col]
        bin_tag = f"concat({source_col}, '/', cast(_bin as string))"
    w = Window.partitionBy(*part_cols).orderBy("_pri", id_col)
    docs = docs.withColumn(
        "_cum_excl",
        F.coalesce(
            F.sum(tokens_col).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    # deterministic bin index: floor(exclusive-cumsum / seq_len) counts
    # how many full sequences precede this doc in its shard's order
    docs = docs.withColumn(
        "_bin", F.expr(f"cast(floor(_cum_excl / {seq_len}) as int)")
    )
    w_bin = Window.partitionBy(*part_cols, "_bin").orderBy("_pri", id_col)
    return (
        docs.withColumn("bin_pos", F.row_number().over(w_bin) - F.lit(1))
        .withColumn("bin_id", F.expr(bin_tag))
        .withColumn("n_tokens", F.col(tokens_col).cast("long"))
        .drop("_pri", "_cum_excl", "_bin", *(["_shard"] if shards > 1 else []))
    )


def pack_sequences_firstfit(
    docs: DataFrame,
    seq_len: int = 2048,
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "ws_tokens",
    text_col: str = "text",
    shards: int = 1,
) -> DataFrame:
    """Exact first-fit packing: walk each source's documents in the
    deterministic (hash-priority, id) order and place every document in the
    FIRST bin with room for it, opening a new bin when none fits (a
    document longer than ``seq_len`` gets a bin of its own). No bin ever
    exceeds ``seq_len`` except those single-oversize-document bins — the
    hard-capacity guarantee block packing trades away.

    First-fit is a sequential recurrence (bin loads depend on every prior
    placement), so it cannot be a window function: each ``(source, shard)``
    group runs the linear scan inside one ``applyInPandas`` task. That makes
    group size the scale contract — use this for BOUNDED sources (or set
    ``shards`` so every shard fits a task comfortably) and the block packer
    for unbounded ones; shards trade packing quality for parallelism the
    same way they do in ``pack_sequences``.

    Output schema matches ``pack_sequences``: input rows + ``n_tokens``,
    ``bin_id``, ``bin_pos``.
    """
    if tokens_col not in docs.columns:
        docs = docs.withColumn(
            tokens_col,
            F.expr(f"size({tokens_expr(text_col)})"),
        )
    docs = docs.withColumn("_pri", F.expr(_priority_expr(id_col)))
    if shards > 1:
        docs = docs.withColumn(
            "_shard", F.pmod(F.col("_pri"), F.lit(shards)).cast("int")
        )
    else:
        docs = docs.withColumn("_shard", F.lit(0))

    out_fields = [f for f in docs.schema.fields if f.name not in ("_pri", "_shard")]
    from pyspark.sql import types as _T

    out_schema = _T.StructType(
        out_fields
        + [
            _T.StructField("n_tokens", _T.LongType()),
            _T.StructField("bin_id", _T.StringType()),
            _T.StructField("bin_pos", _T.IntegerType()),
        ]
    )
    out_cols = [f.name for f in out_fields]
    tag_shard = shards > 1

    def pack(pdf):
        import pandas as pd  # executor-side

        pdf = pdf.sort_values(["_pri", id_col], kind="mergesort")
        source = pdf[source_col].iloc[0] if len(pdf) else ""
        shard = int(pdf["_shard"].iloc[0]) if len(pdf) else 0
        loads: List[int] = []
        counts: List[int] = []
        bin_ids, bin_poss = [], []
        for tok in pdf[tokens_col]:
            t = int(tok)
            placed = next(
                (i for i, l in enumerate(loads) if l + t <= seq_len), None
            )
            if placed is None:
                loads.append(0)
                counts.append(0)
                placed = len(loads) - 1
            bin_ids.append(placed)
            bin_poss.append(counts[placed])
            counts[placed] += 1
            loads[placed] += t
        out = pdf[out_cols].copy()
        out["n_tokens"] = pdf[tokens_col].astype("int64")
        prefix = f"{source}/{shard}/" if tag_shard else f"{source}/"
        out["bin_id"] = [prefix + str(b) for b in bin_ids]
        out["bin_pos"] = pd.array(bin_poss, dtype="int32")
        return out

    return docs.groupBy(source_col, "_shard").applyInPandas(pack, out_schema)


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    by: Optional[str] = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, A-ES): each row gets the key ``-ln(u) / w`` from a
    hash-derived uniform ``u`` — taking the ``k`` SMALLEST keys is an
    exact weighted sample without replacement, with inclusion odds
    proportional to ``w`` at every draw. The "randomness" is the
    engine-wide 60-bit id hash, so the sample is reproducible,
    partition-independent, and identical across engines — the repo-wide
    no-RNG contract (same stance as ``split_assign`` and the budget
    samplers).

    ``by=None``: global top-k — ``orderBy(key).limit(k)``, which Spark
    executes as ``TakeOrderedAndProject`` (per-partition heaps + a
    k-sized driver merge; no global sort materializes). ``by=col``:
    stratified — k rows per group via a per-group rank window (one
    shuffle on the group key; group skew bounded by the same shard
    trick as packing if ever needed).

    Rows with non-positive weights are excluded (zero weight = zero
    inclusion probability; the A-ES key is undefined there).
    Output: the sampled input rows + ``sample_key`` (double).
    """
    h = _hash60(f"cast({id_col} as string)")
    key = (
        f"-ln((cast({h} as double) + 1.0d) / 1152921504606846977.0d) "
        f"/ cast({weight_col} as double)"
    )
    scored = docs.filter(F.col(weight_col) > 0).withColumn(
        "sample_key", F.expr(key)
    )
    if by is None:
        return scored.orderBy("sample_key", id_col).limit(int(k))
    w = Window.partitionBy(by).orderBy("sample_key", id_col)
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= int(k))
        .drop("_rk")
    )


def decontaminate_pruned(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 13,
    min_overlap: int = 1,
    bloom_cfg=None,
    broadcast_bytes: int = 64 << 20,
) -> DataFrame:
    """:func:`decontaminate` through the Bloom-pruned probe — identical
    survivors (the sketch never decides), corpus-sized eval sets allowed."""
    flagged = contamination_pruned(
        docs, eval_docs, text_col, id_col, shingle_k, min_overlap,
        bloom_cfg, broadcast_bytes,
    )
    return flagged.filter(~F.col("contaminated")).drop(
        "n_contaminated", "contaminated"
    )


def temperature_budgets(
    docs: DataFrame,
    alpha: float,
    token_budget: int,
    source_col: str = "source",
    tokens_col: str = "ws_tokens",
    text_col: str = "text",
) -> DataFrame:
    """Per-source integer token budgets for temperature-scaled mixing:
    ``budget_s ∝ c_s^alpha`` where ``c_s`` is the source's natural token
    count — the standard multilingual-pretraining resampling rule
    (alpha < 1 flattens the head, upweights the tail; alpha = 1 is
    proportional, alpha -> 0 approaches uniform).

    Everything stays DataFrame-side: counts are one groupBy, the weight
    total is a 1-row aggregate cross-joined back (no driver collect, no
    host list — same scale contract as ``sample_to_token_budget``'s
    uniform default).

    Determinism across engines: weights are integerized as
    ``w_s = floor(c_s^alpha * 2^20)`` so the weight TOTAL is an exact
    BIGINT sum (no float summation-order seam), and the final share is a
    fixed three-op double expression over identical integer inputs. For
    ``alpha`` 0.5 / 1.0 the power itself is IEEE-exact (sqrt is correctly
    rounded; identity is trivial) — the gate uses 0.5; other exponents go
    through ``pow`` (platform libm, ±1 ulp — fine for production, not for
    a value-hash oracle). Budgets are capped at ``c_s`` — a source can
    never be asked for more tokens than it has.
    """
    if tokens_col not in docs.columns:
        docs = docs.withColumn(
            tokens_col, F.expr(f"size({tokens_expr(text_col)})")
        )
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (alpha=1 is proportional)")
    counts = docs.groupBy(source_col).agg(
        F.sum(tokens_col).cast("bigint").alias("c")
    )
    if alpha == 1.0:
        wexpr = "cast(c as double)"
    elif alpha == 0.5:
        wexpr = "sqrt(cast(c as double))"
    else:
        wexpr = f"pow(cast(c as double), {float(alpha)!r})"
    wi = counts.withColumn(
        "w_int", F.expr(f"cast(floor({wexpr} * 1048576.0) as bigint)")
    )
    tot = wi.agg(F.sum("w_int").cast("bigint").alias("w_tot"))
    return wi.crossJoin(F.broadcast(tot)).select(
        source_col,
        F.expr(
            f"least(cast(floor(cast({int(token_budget)} as double) * "
            f"(cast(w_int as double) / cast(w_tot as double))) as bigint), c)"
        ).alias("budget"),
    )


def sample_temperature(
    docs: DataFrame,
    alpha: float,
    token_budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "ws_tokens",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled exact mixing: ``temperature_budgets`` feeds the
    same hash-priority inclusive-running-sum filter as
    ``sample_to_token_budget`` — kept documents fit entirely, the sample
    never exceeds a source's budget. The budget table is sources-sized and
    equi-joined (AQE broadcasts it when small)."""
    if tokens_col not in docs.columns:
        docs = docs.withColumn(
            tokens_col, F.expr(f"size({tokens_expr(text_col)})")
        )
    budgets = temperature_budgets(
        docs, alpha, token_budget, source_col, tokens_col, text_col
    )
    w = Window.partitionBy(source_col).orderBy("_pri", id_col)
    return (
        docs.join(budgets, source_col)
        .withColumn("_pri", F.expr(_priority_expr(id_col)))
        .withColumn("_cum", F.sum(tokens_col).over(w))
        .filter(F.col("_cum") <= F.col("budget"))
        .drop("_pri", "_cum", "budget")
        .withColumn("n_tokens", F.col(tokens_col).cast("long"))
    )


def sample_with_repeats(
    docs: DataFrame,
    weights: Optional[Dict[str, float]],
    token_budget: int,
    max_epochs: int = 4,
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "ws_tokens",
    text_col: str = "text",
) -> DataFrame:
    """Epoch-aware mixing for data-constrained budgets (Muennighoff et
    al. 2023): when a source's budget share EXCEEDS its token count, the
    plain sampler just takes everything once and silently under-delivers
    the mixture — this variant repeats the whole source for as many full
    epochs as fit (capped at ``max_epochs``, past which repeated data
    stops helping) and fills the remainder with the hash-priority prefix
    one more time.

    Per source with total tokens ``S`` and budget ``B``:

    - ``full_epochs = min(B div S, max_epochs)`` — every document of the
      source appears once per full epoch (``epoch`` = 1..full_epochs);
    - if ``full_epochs < max_epochs``, the remainder ``B - full_epochs*S``
      is filled by the exact sampler's inclusive-running-sum prefix in
      hash-priority order, tagged ``epoch = full_epochs + 1``;
    - a source with ``S = 0`` contributes its (zero-token) docs once via
      the remainder pass — the same keep-while-it-fits convention as
      ``sample_to_token_budget``.

    Output = ``docs`` rows + ``n_tokens`` + ``epoch`` (a document kept k
    times appears as k rows differing only in ``epoch``). Token totals
    never exceed ``B + 0`` per source; undershoot is at most one
    document's tokens (or ``B mod S`` when the epoch cap binds).

    Scale shape: one sources-sized aggregate joined back (AQE broadcasts
    it), one ``sequence``-explode for the full epochs (no shuffle), and
    the remainder window only over sources below the cap — the same
    per-source window as the exact sampler (compose with the approx
    histogram sampler upstream when a single source is shuffle-hot).
    """
    if tokens_col not in docs.columns:
        docs = docs.withColumn(
            tokens_col, F.expr(f"size({tokens_expr(text_col)})")
        )
    if weights is None:
        n_sources = docs.select(source_col).distinct().count()
        budget_col = F.lit(int(token_budget // max(n_sources, 1)))
    else:
        budgets = _source_budgets(weights, token_budget)
        bmap = F.create_map(
            *[x for s, b in sorted(budgets.items()) for x in (F.lit(s), F.lit(b))]
        )
        docs = docs.filter(F.col(source_col).isin(list(budgets)))
        budget_col = bmap[F.col(source_col)]
    me = int(max_epochs)
    totals = docs.groupBy(source_col).agg(
        F.sum(tokens_col).cast("long").alias("_S")
    )
    j = (
        docs.join(totals, source_col)
        .withColumn("_budget", budget_col.cast("long"))
        .withColumn(
            "_fe",
            F.expr(
                f"cast(least(CASE WHEN _S <= 0 THEN 0 "
                f"ELSE _budget DIV _S END, {me}) as int)"
            ),
        )
    )
    out_cols = docs.columns
    full = j.filter(F.col("_fe") >= 1).withColumn(
        "epoch", F.explode(F.expr("sequence(1, _fe)"))
    )
    w = Window.partitionBy(source_col).orderBy("_pri", id_col)
    rem = (
        j.filter(F.col("_fe") < F.lit(me))
        .withColumn("_rem", F.expr("_budget - _fe * _S"))
        .withColumn("_pri", F.expr(_priority_expr(id_col)))
        .withColumn("_cum", F.sum(tokens_col).over(w))
        .filter(F.col("_cum") <= F.col("_rem"))
        .withColumn("epoch", (F.col("_fe") + 1).cast("int"))
    )
    return (
        full.select(*out_cols, "epoch")
        .unionByName(rem.select(*out_cols, "epoch"))
        .withColumn("n_tokens", F.col(tokens_col).cast("long"))
    )


def cluster_balanced_sample(
    docs: DataFrame,
    token_budget: int,
    centroid_rows: Optional[Sequence] = None,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    tokens_col: str = "ws_tokens",
    text_col: str = "text",
    cluster_col: str = "centroid_id",
) -> DataFrame:
    """Diversity-balanced sampling over EMBEDDING clusters instead of
    source labels (D4, Tirumala et al. 2023; the cluster-then-balance
    step SemDeDup-style pipelines run after dedup): assign every document
    to its nearest centroid, then give each cluster an equal share of the
    token budget and keep documents per cluster in hash-priority order
    while the running token sum fits.

    Why this exists next to :func:`sample_to_token_budget`: source labels
    encode *provenance*, clusters encode *content* — a crawl where one
    topic dominates every host still collapses to that topic under
    per-source mixing, while per-cluster budgets cap each content region
    directly.

    ``centroid_rows`` are driver-small ``(centroid_id, c_emb)`` rows; when
    None the deterministic hash-sample-seeded quantizer
    (``similarity.ivf_centroids``) is trained on ``docs`` itself.

    Scale shape: assignment is ``similarity.nearest_centroid_expr`` — a
    literal-centroid codegen'd column expression, zero shuffle at any
    corpus size; the per-cluster budget is ONE scalar aggregation
    (``token_budget div n_clusters_present``, never a collected cluster
    list); the keep rule is the exact sampler's per-cluster window. k is
    small by construction (a mixing knob, not an ANN index), so the
    per-cluster windows parallelize across k reducers; for heavy skew the
    same ``shards=`` escape hatch as packing applies upstream.

    Returns surviving rows + ``centroid_id`` + ``n_tokens``.
    """
    from crawler_spark.operators.similarity import ivf_assign, ivf_centroids

    if centroid_rows is None:
        cents = ivf_centroids(docs, k=k, vec_col=vec_col, id_col=id_col)
        centroid_rows = [
            (r["centroid_id"], r["c_emb"]) for r in cents.collect()
        ]
    # ivf_assign IS the assignment rule — one definition shared with the
    # index path, so a tie-break/distance change can never drift
    assigned = ivf_assign(docs, centroid_rows, vec_col, out_col=cluster_col)
    return sample_to_token_budget(
        assigned,
        None,
        token_budget,
        source_col=cluster_col,
        id_col=id_col,
        tokens_col=tokens_col,
        text_col=text_col,
    )


def stratified_split(
    docs: DataFrame,
    weights: Optional[Dict[str, float]] = None,
    strata_col: str = "source",
    salt: str = "split-v1",
    id_col: str = "doc_id",
    out_col: str = "split",
) -> DataFrame:
    """EXACT-count stratified train/validation/test split: within every
    stratum (source/language/domain), each split receives its
    largest-remainder share of the stratum's rows — a 50-doc stratum at
    1% validation gets EXACTLY its apportioned row, not binomial noise.

    The complement of :func:`split_assign`: hash intervals give
    growth-stable membership (a doc's split never changes as the corpus
    grows) but only expected proportions per stratum; this gives exact
    per-stratum proportions but membership that can shift when the
    stratum's population changes (documented trade-off — use
    ``split_assign`` for frozen eval sets, this for balanced ablation
    splits over a fixed corpus snapshot).

    Mechanics (all integer, bit-stable): per stratum ``n`` rows; split
    ``j`` with quantized weight ``wq_j`` gets ``base_j = n * wq_j div W``
    plus one of the ``n - sum(base)`` leftover rows by largest remainder
    (ties by split name) — the same apportionment rule as
    ``frontier.adaptive.apportion_budget``; rows rank within the stratum
    by the engine-wide id hash and fill the splits in sorted-name
    cumulative order.

    Scale shape: one per-stratum window (the rank), one group-sized
    aggregate (stratum counts), a strata*|splits| boundaries table joined
    back on the stratum key the window already partitioned by. Nothing
    corpus-sized moves twice.
    """
    weights = weights or {"train": 0.98, "validation": 0.01, "test": 0.01}
    items = sorted(weights.items())
    wq = {name: int(round(frac * 10_000)) for name, frac in items}
    wtot = sum(wq.values())

    counts = docs.groupBy(F.col(strata_col).alias("_st")).agg(
        F.count("*").alias("_n")
    )
    # per (stratum, split): base + largest-remainder extra, then the
    # cumulative upper boundary in sorted-split order — all on the
    # strata-sized table
    splits = None
    for name in wq:
        row = counts.select(
            "_st",
            "_n",
            F.lit(name).alias("_sp"),
            F.expr(f"_n * {wq[name]} div {wtot}").alias("_base"),
            F.expr(f"_n * {wq[name]} % {wtot}").alias("_rem"),
        )
        splits = row if splits is None else splits.unionByName(row)
    w_lr = Window.partitionBy("_st").orderBy(F.desc("_rem"), "_sp")
    w_cum = Window.partitionBy("_st").orderBy("_sp").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bounds = (
        splits.withColumn(
            "_left", F.col("_n") - F.sum("_base").over(Window.partitionBy("_st"))
        )
        .withColumn("_lr", F.row_number().over(w_lr))
        .withColumn(
            "_quota",
            F.col("_base")
            + F.expr("CASE WHEN _lr <= _left THEN 1 ELSE 0 END"),
        )
        .withColumn("_hi", F.sum("_quota").over(w_cum))
        .select("_st", "_sp", (F.col("_hi") - F.col("_quota")).alias("_lo"), "_hi")
    )
    w_rank = Window.partitionBy(strata_col).orderBy(
        F.expr(_priority_expr(id_col)), id_col
    )
    ranked = docs.withColumn("_rk", F.row_number().over(w_rank))
    return (
        ranked.join(
            bounds,
            (ranked[strata_col] == bounds["_st"])
            & (F.col("_rk") > F.col("_lo"))
            & (F.col("_rk") <= F.col("_hi")),
        )
        .withColumn(out_col, F.col("_sp"))
        .drop("_st", "_sp", "_lo", "_hi", "_rk")
    )
