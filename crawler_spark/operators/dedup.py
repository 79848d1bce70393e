"""Deduplication operators for large-scale training-data pipelines.

These have no reference analog (the reference dedups only URLs); they are
the corpus-dedup layer a crawl feeds at 100 TB scale. All hot paths are
JVM-side built-ins (higher-order array functions, hash expressions) — no
Python in the per-row path except SimHash, which is a vectorized pandas UDF.

Cross-engine hash primitive: ``cast(conv(substring(md5(x),1,15),16,10) as
bigint)`` — a 60-bit stable hash computable identically in Spark SQL and
DuckDB (verified), which makes MinHash signatures oracle-checkable.

Scale notes:
- exact_dedup: one shuffle on the content hash; first-wins via min(id), not
  dropDuplicates (deterministic under any parallelism).
- minhash_lsh: band buckets shuffle on (band_id, band_hash); candidate
  pairs only materialize within buckets — never a corpus cross join.
- ngram_jaccard_pairs: exact but quadratic within inverted-index buckets;
  for verification at small scale or post-LSH re-ranking, not the 100 TB
  primary path (LSH is).
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hash60(col: str) -> str:
    """SQL fragment: stable 60-bit hash of a string expression."""
    return f"cast(conv(substring(md5({col}), 1, 15), 16, 10) as bigint)"


# one-hash MinHash permutation space: 30-bit base hash, Mersenne-prime
# modulus — products stay < 2^61, safe under ANSI 64-bit arithmetic in both
# Spark and DuckDB (identical values for the oracle pairing)
_MH_M = 1 << 30
_MH_P = (1 << 31) - 1


def _mh_params(num_hashes: int, seed: int = 42):
    """Deterministic (a, b) pairs for the linear permutations."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MH_P), rng.randrange(0, _MH_P))
        for _ in range(num_hashes)
    ]


def content_hash(df: DataFrame, text_col: str = "text", out_col: str = "content_hash") -> DataFrame:
    return df.withColumn(out_col, F.expr(_hash60(text_col)))


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: keep the smallest id per identical content.

    Deterministic first-wins (min id), one shuffle on the content hash;
    map-side partial aggregation comes free from groupBy+min. Same plan
    as `exact_dedup_counts` minus the count column (the count rides the
    identical aggregate for free) — one implementation, two surfaces.
    """
    return exact_dedup_counts(df, text_col, id_col).drop("n_copies")


def exact_dedup_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """`exact_dedup` plus an ``n_copies`` column: how many identical
    copies the surviving row stood for.

    Duplication count is a *signal*, not just waste — pipelines that
    dedup aggressively then reweight survivors by copy count (frequency
    as a crude quality/prominence prior) feed ``n_copies`` straight into
    `sampling.weighted_sample` / `sampling.temperature_budgets`. Same
    single content-hash shuffle as `exact_dedup` (the count rides the
    same aggregate), deterministic min-id survivor.
    """
    hashed = content_hash(df, text_col)
    keep = hashed.groupBy("content_hash").agg(
        F.min(id_col).alias(id_col),
        F.count("*").alias("n_copies"),
    )
    return (
        hashed.join(keep, ["content_hash", id_col], "inner")
        .drop("content_hash")
    )


def tokens_expr(text_col: str) -> str:
    """Whitespace tokenization, lowercased — shared by shingles/simhash.

    Empty tokens are filtered so empty/whitespace-only text yields ``[]``,
    matching DuckDB's ``string_split_regex`` (Spark's ``split('')`` returns
    ``['']`` — one empty token — which would diverge from every SQL oracle
    on a corpus containing empty documents).
    """
    return f"filter(split(lower(trim({text_col})), '\\\\s+'), t -> t != '')"


def tokens_expr_cased(text_col: str) -> str:
    """Original-case whitespace tokens (same boundaries as ``tokens_expr``).

    Used wherever text is *rebuilt* from tokens (e.g. duplicate-span
    stripping): detection hashes lowercased n-grams, but the surviving text
    must keep its original case — token positions align because lowercasing
    never changes token boundaries.
    """
    return f"filter(split(trim({text_col}), '\\\\s+'), t -> t != '')"


def shingles_expr(text_col: str, k: int = 3) -> str:
    """Distinct k-gram token shingles as an array<string> SQL expression.

    The token array is bound once via ``transform(array(toks), tk -> ...)``
    so the regex split runs once per row — referencing the split expression
    inside the per-shingle lambda would re-split the text for every shingle
    position (O(tokens²) per row; measured 25× slower at 500 docs and
    strictly worse at scale).
    """
    toks = tokens_expr(text_col)
    return (
        f"array_distinct(flatten(transform(array({toks}), tk -> "
        f"CASE WHEN size(tk) < {k} THEN array(concat_ws(' ', tk)) "
        f"ELSE transform(sequence(0, size(tk) - {k}), "
        f"i -> concat_ws(' ', slice(tk, i + 1, {k}))) END)))"
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, minhash array<bigint>) — min over shingles of seeded hash60.

    Entirely JVM-side: shingling and hashing run as codegen'd higher-order
    functions; no Python, no shuffle. One md5 pass hashes each shingle to a
    30-bit value; the ``num_hashes`` permutations are then cheap seeded
    linear maps ``(a_i * h + b_i) mod P`` (the classic one-hash MinHash) —
    re-running md5 per seed per shingle costs ``num_hashes``x more and
    measured ~10x slower at 16 hashes. Every intermediate array is bound
    once via ``transform(array(x), v -> ...)`` lambda binding.
    """
    sh = shingles_expr(text_col, shingle_k)
    h30 = f"transform({sh}, s -> pmod({_hash60('s')}, {_MH_M}))"
    mins = ", ".join(
        f"array_min(transform(hv, h -> pmod({a} * h + {b}, {_MH_P})))"
        for a, b in _mh_params(num_hashes)
    )
    sig = f"element_at(transform(array({h30}), hv -> array({mins})), 1)"
    return df.select(F.col(id_col), F.expr(sig).alias("minhash"))


def banded_rows(
    sigs: DataFrame,
    num_hashes: int,
    bands: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id, minhash)`` signatures -> ``(id, band_id, band_sig)`` LSH
    index rows — the layout a persisted signature store is bucketed by."""
    assert num_hashes % bands == 0
    rows_per = num_hashes // bands
    return sigs.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> concat_ws(',', slice(minhash, b * {rows_per} + 1, {rows_per})))"
            )
        ).alias("band_id", "band_sig"),
    )


def estimate_jaccard(num_hashes: int) -> str:
    """SQL expr (over columns ``sig_a``, ``sig_b``): fraction of agreeing
    minhash components — the unbiased MinHash Jaccard estimator."""
    return (
        f"round(size(filter(sequence(1, {num_hashes}), "
        f"i -> element_at(sig_a, i) = element_at(sig_b, i))) "
        f"/ cast({num_hashes} as double), 6)"
    )


def incremental_near_dups(
    new_docs: DataFrame,
    prior_sigs: Optional[DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
    new_sigs: Optional[DataFrame] = None,
):
    """Cross-wave near-duplicate detection against a persisted signature
    store — the continuous-crawl shape where re-LSH-ing the whole corpus
    every wave is the thing you cannot afford.

    ``prior_sigs`` is the accumulated ``(id, minhash)`` table from earlier
    waves (None for the first wave). Only the NEW wave is shingled and
    hashed; the band join probes new band rows against the full store, so
    per-wave cost scales with the wave, not the corpus, and band buckets
    keep the join candidate-bounded exactly as in :func:`minhash_lsh_pairs`.
    Matching is signature-estimated Jaccard (the store does not retain
    text — components agreeing / ``num_hashes``); pairs at or above
    ``threshold`` are reported with ``id_a < id_b``.

    Returns ``(pairs, all_sigs)``: the flagged pairs (new-vs-prior and
    new-vs-new) and the merged signature table to persist as the next
    wave's store. Invariant (pytest-pinned): the union of per-wave pair
    sets over any wave split equals one batch run over the whole corpus.

    Pass ``new_sigs`` to reuse already-computed wave signatures (e.g. a
    streaming sink that also writes them to the store) — ``new_docs`` is
    then ignored for hashing.
    """
    if new_sigs is None:
        new_sigs = minhash_signatures(
            new_docs, text_col, id_col, num_hashes, shingle_k
        ).localCheckpoint(eager=False)
    all_sigs = (
        new_sigs
        if prior_sigs is None
        else prior_sigs.unionByName(new_sigs)
    )
    nb = banded_rows(new_sigs, num_hashes, bands, id_col).alias("l")
    ab = banded_rows(all_sigs, num_hashes, bands, id_col).alias("r")
    cand = (
        nb.join(
            ab,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_sig") == F.col("r.band_sig"))
            & (F.col(f"l.{id_col}") != F.col(f"r.{id_col}")),
        )
        .select(
            F.least(F.col(f"l.{id_col}"), F.col(f"r.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"l.{id_col}"), F.col(f"r.{id_col}")).alias(
                "id_b"
            ),
        )
        .distinct()
    )
    sa = all_sigs.select(
        F.col(id_col).alias("id_a"), F.col("minhash").alias("sig_a")
    )
    sb = all_sigs.select(
        F.col(id_col).alias("id_b"), F.col("minhash").alias("sig_b")
    )
    pairs = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", F.expr(estimate_jaccard(num_hashes)))
        .filter(F.col("est_jaccard") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "est_jaccard")
    )
    return pairs, all_sigs


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    materialize_signatures: bool = True,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH.

    signatures -> split into ``bands`` bands of ``num_hashes/bands`` rows ->
    bucket-join on (band_id, band signature) -> distinct (a < b) pairs.
    Shuffles on band buckets only; a hot bucket is bounded by band width.
    ``materialize_signatures`` checkpoints the (id, minhash) frame so the
    shingle+md5 signature expression runs once, not once per self-join side
    (at corpus scale this is the written signature table).
    """
    assert num_hashes % bands == 0
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    if materialize_signatures:
        sigs = sigs.localCheckpoint(eager=False)

    banded = banded_rows(sigs, num_hashes, bands, id_col)
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_sig") == F.col("r.band_sig"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
    max_df: Optional[int] = None,
) -> DataFrame:
    """n-gram Jaccard similarity pairs >= threshold.

    Inverted-index join: explode distinct shingles, self-join on shingle
    (intersection counts), then |A∪B| = |A|+|B|-|A∩B|. Output
    (id_a, id_b, jaccard).

    ``max_df`` is the hot-shingle guardrail (required at corpus scale): a
    shingle contained in k documents contributes k*(k-1)/2 rows to the
    self-join, so one corpus-common shingle makes the join quadratic in
    corpus size. With ``max_df`` set, shingles whose document frequency
    exceeds it are dropped from the *index* (the join side) while per-doc
    sizes stay exact, so the reported jaccard is a lower bound that
    undercounts a pair's intersection by at most its hot shingles:
    true_jaccard - reported <= (hot shingles shared)/|A∪B|. Pairs whose
    similarity rests on non-hot shingles are unaffected; the join size is
    bounded by max_df^2 * n_shingles/max_df = max_df * n_shingles rows.
    None (default) keeps exact semantics for small corpora / post-LSH
    re-ranking.
    """
    counts = _shingle_pair_counts(df, text_col, id_col, shingle_k, max_df)
    return (
        counts.withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def _shingle_pair_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int,
    max_df: Optional[int],
) -> DataFrame:
    """Shared inverted-index pair machinery: ``(id_a, id_b, inter, na,
    nb)`` for every document pair sharing at least one (kept) shingle —
    the common core of the Jaccard and containment pair operators,
    including the ``max_df`` hot-shingle guardrail."""
    sh = shingles_expr(text_col, shingle_k)
    ex = df.select(
        F.col(id_col), F.explode(F.expr(sh)).alias("shingle")
    )
    # the exploded index feeds sizes, the DF-cap aggregation AND both sides
    # of the self-join — materialize it once instead of re-shingling per
    # consumer (at corpus scale: the written inverted-index table)
    ex = ex.localCheckpoint(eager=False)
    sizes = ex.groupBy(id_col).agg(F.count("*").alias("n_shingles"))

    index = ex
    if max_df is not None:
        # document frequency per shingle; the filter join shares the
        # self-join's `shingle` key, so the partitioning is reused
        keep = (
            ex.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("shingle")
        )
        index = ex.join(keep, "shingle")

    a = index.alias("a")
    b = index.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("nb"))
    return inter.join(sa, "id_a").join(sb, "id_b")


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
    max_df: Optional[int] = None,
) -> DataFrame:
    """n-gram CONTAINMENT pairs: ``inter / min(|A|, |B|) >= threshold`` —
    the asymmetric twin of :func:`ngram_jaccard_pairs` (Broder 1997's
    containment coefficient). Jaccard misses subset duplication between
    size-mismatched documents by construction: a page fully quoted inside
    a 10× longer page has jaccard <= 0.1 but containment 1.0. This is the
    operator that catches quote-stuffing, article-plus-boilerplate
    mirrors, and training docs embedded verbatim in longer ones.

    Output ``(id_a, id_b, containment, jaccard)`` — both coefficients, so
    a curation policy can distinguish "same document" (both high) from
    "one inside the other" (containment high, jaccard low). Same inverted
    index, same self-join bound, same ``max_df`` guardrail and lower-bound
    semantics as the Jaccard operator.
    """
    counts = _shingle_pair_counts(df, text_col, id_col, shingle_k, max_df)
    return (
        counts.withColumn(
            "containment", F.col("inter") / F.least("na", "nb")
        )
        .filter(F.col("containment") >= threshold)
        .select(
            "id_a",
            "id_b",
            F.round("containment", 6).alias("containment"),
            F.round(
                F.col("inter")
                / (F.col("na") + F.col("nb") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
    )


def near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Two-stage near-dup detection: MinHash-LSH candidate generation ->
    exact Jaccard verification — the standard production dedup shape.

    Stage 1 (`minhash_lsh_pairs`) bounds the search to band-bucket
    collisions: work scales with bucket sizes, never all-pairs. Stage 2
    verifies ONLY the candidates with exact shingle Jaccard via
    ``array_intersect`` on the per-doc distinct shingle arrays (JVM
    built-ins — the arrays join to the candidate pairs; no shingle-level
    explosion). False positives from stage 1 are filtered exactly; recall
    is stage 1's banding probability (tunable via num_hashes/bands).
    Output (id_a, id_b, jaccard >= threshold).
    """
    cand = minhash_lsh_pairs(df, text_col, id_col, num_hashes, bands, shingle_k)
    sh = df.select(
        F.col(id_col), F.expr(shingles_expr(text_col, shingle_k)).alias("_sh")
    ).localCheckpoint(eager=False)
    a = sh.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("_sa"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("_sb"))
    inter = F.size(F.array_intersect("_sa", "_sb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.round(inter / (F.size("_sa") + F.size("_sb") - inter), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash (vectorized pandas UDF — per-bit aggregation is not expressible as
# reasonable built-ins)
# ---------------------------------------------------------------------------

@F.pandas_udf(T.LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (md5-based per-token hash,
    deterministic across runs/processes).

    Arrow-batch-vectorized: each unique token in the batch is md5-hashed
    ONCE into a ±1 bit matrix, per-doc accumulation is a numpy gather-sum
    over that matrix. Bit-identical to the naive per-token loop (integer
    sums are exact and order-free); ~4x faster on natural-language batches
    where the vocabulary is far smaller than the token stream."""
    import hashlib

    import numpy as np

    docs = [t.lower().split() if t is not None else None for t in text]
    vocab: dict = {}
    doc_idx = []
    for toks in docs:
        if toks:
            doc_idx.append([vocab.setdefault(tok, len(vocab)) for tok in toks])
        else:
            doc_idx.append(None)
    if vocab:
        digests = b"".join(
            hashlib.md5(tok.encode()).digest()[:8] for tok in vocab
        )
        M = (
            np.unpackbits(np.frombuffer(digests, dtype=np.uint8))
            .reshape(len(vocab), 64)
            .astype(np.int32)
            * 2
            - 1
        )
    out = []
    for toks, idx in zip(docs, doc_idx):
        if toks is None:
            out.append(None)
            continue
        if not toks:
            out.append(0)
            continue
        acc = M[idx].sum(axis=0)
        bits = (acc > 0).astype(np.uint8)
        v = int.from_bytes(np.packbits(bits).tobytes(), "big")
        # to signed 64-bit
        out.append(v - (1 << 64) if v >= (1 << 63) else v)
    return pd.Series(out, dtype="object")


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
    materialize_signatures: bool = True,
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance <= max_hamming.

    Multi-band blocking: the 64-bit simhash splits into ``bands`` equal bit
    bands; a pair is a candidate when ANY band matches. By pigeonhole, a
    pair within Hamming distance ``bands - 1`` always agrees on at least one
    band, so recall is exact for ``max_hamming <= bands - 1`` (the round-1
    prefix-16 blocking missed near-dups whose differing bits fell in the
    prefix). The self-join shuffles on (band_id, band value) buckets only —
    never all-pairs; exact Hamming check via bit_count(xor) after distinct.
    """
    assert 64 % bands == 0
    width = 64 // bands
    sh = df.select(F.col(id_col), simhash64(F.col(text_col)).alias("simhash"))
    if materialize_signatures:
        # the self-join would otherwise run the signature UDF once per SIDE
        # (Catalyst duplicates the subplan); materializing the tiny
        # (id, simhash) frame halves the dominant cost. At corpus scale this
        # is a written signature table — localCheckpoint is its in-session
        # analog.
        sh = sh.localCheckpoint(eager=False)
    banded = sh.select(
        F.col(id_col),
        "simhash",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"(simhash >> (b * {width})) & {(1 << width) - 1})"
            )
        ).alias("band_id", "band_val"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --------------------------------------------------------------------------
# near-dup cluster resolution: pairs -> connected components -> survivors
# --------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Connected components of the undirected pair graph: (id, comp) with
    ``comp`` = the smallest id in the component.

    Min-label propagation with pointer jumping: each round (1) every node
    takes the min of its own label and its neighbors' labels, then (2)
    labels chase their own label's label (path halving). Both steps are
    shuffle-on-key joins — no driver-side graph, no single reducer — and
    the combination converges in O(log n) rounds on any component shape
    (propagation alone needs O(diameter)). One small driver action per
    round checks convergence; rounds are capped at ``max_iter`` (25 rounds
    covers components of ~2^25 nodes, far beyond any near-dup cluster).

    Per-round frames are ``localCheckpoint``-ed to cut the growing lineage
    (an iterative-join plan re-evaluates the whole history otherwise).

    Adaptive fast path: when the edge list is small (driver-known count
    ``<= local_threshold``, the same decide-from-a-count pattern as the
    frontier's broadcast joins), the graph is solved with union-find on
    the driver instead of the iterative join loop — the candidate-pair
    graph of a dedup run is orders of magnitude smaller than the corpus,
    so this is the common case, and it replaces O(log n) join rounds with
    one collect. Output is bit-identical either way (``comp`` = min id is
    algorithm-independent); ``local_threshold=0`` forces the distributed
    loop. 2M edges ≈ tens of MB on the driver — the same budget the
    broadcast joins already assume.
    """
    # the pair list is consumed twice whichever branch runs (count +
    # collect on the fast path; both union directions on the distributed
    # one) and its upstream (signatures + LSH join) is the expensive part
    # — persist so it is computed once
    pairs = pairs.persist()
    try:
        if local_threshold and pairs.count() <= local_threshold:
            return _connected_components_local(pairs, a_col, b_col)
        edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        edges = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct().localCheckpoint(eager=True)
    finally:
        pairs.unpersist()
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        # (1) min over neighborhood labels
        nbr = (
            edges.join(
                labels.select(
                    F.col("id").alias("dst"), F.col("comp").alias("dcomp")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dcomp").alias("ncomp"))
        )
        stepped = (
            labels.join(nbr, labels["id"] == nbr["src"], "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))
                ).alias("comp"),
            )
        )
        # (2) pointer jumping: comp <- comp(comp)
        jumped = (
            stepped.alias("s")
            .join(
                stepped.select(
                    F.col("id").alias("comp"), F.col("comp").alias("comp2")
                ).alias("t"),
                "comp",
                "left",
            )
            .select(
                F.col("s.id").alias("id"),
                F.coalesce(F.col("comp2"), F.col("comp")).alias("comp"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            jumped.join(labels.select("id", F.col("comp").alias("old")), "id")
            .filter(F.col("comp") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels


def _connected_components_local(
    pairs: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Driver-side union-find for small candidate graphs; same output
    contract as the distributed loop (every node that appears in a pair,
    labeled with the smallest id of its component)."""
    id_type = dict(pairs.dtypes)[a_col]
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    # one parallel job: collect(), never toLocalIterator — the iterator
    # evaluates the pair DAG one partition at a time (sequential mini-jobs
    # re-running the whole upstream per partition; measured 4x pipeline
    # slowdown at 8 cores), while the edge list is <= local_threshold rows
    # by construction and fits the driver comfortably
    for row in pairs.select(a_col, b_col).collect():
        a, b = row[0], row[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp_min: dict = {}
    roots = {x: find(x) for x in parent}
    for x, r in roots.items():
        if r not in comp_min or x < comp_min[r]:
            comp_min[r] = x
    out = [(x, comp_min[roots[x]]) for x in sorted(parent)]
    return pairs.sparkSession.createDataFrame(
        out, f"id {id_type}, comp {id_type}"
    )


def cluster_near_dups(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Assign every document its near-dup cluster id (singletons cluster
    with themselves): ``docs`` + ``cluster_id``.

    The label table only contains nodes that appear in a pair — tiny next
    to the corpus — so the join back is a broadcast, not a corpus shuffle.
    """
    comp = connected_components(pairs, a_col, b_col).select(
        F.col("id").alias(id_col), F.col("comp").alias("cluster_id")
    )
    return docs.join(F.broadcast(comp), id_col, "left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
    )


def near_dup_dedup(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Keep one document per near-dup cluster (the smallest id — the same
    deterministic first-wins rule as ``exact_dedup``); schema unchanged."""
    clustered = cluster_near_dups(docs, pairs, id_col, a_col, b_col)
    return clustered.filter(F.col("cluster_id") == F.col(id_col)).drop(
        "cluster_id"
    )


# ---------------------------------------------------------------------------
# Exact duplicate-span detection (Lee et al. 2021, "Deduplicating Training
# Data Makes Language Models Better"): find token n-grams that occur more
# than once anywhere in the corpus, merge overlapping hits into maximal
# per-document spans, and optionally strip them. The reference repo has no
# analog; this is the standard substring-level complement to the
# document-level MinHash/SimHash family above.
#
# Scale shape: one shuffle to count n-gram occurrences (map-side combine;
# the count table is n-gram-vocabulary-sized, not corpus-sized), one
# equi-join of the exploded corpus against the >= min_count survivors
# (AQE broadcasts it when small), then per-document windows over only the
# *duplicated* positions — a tiny fraction of the corpus by construction.
# Nothing is quadratic: unlike a suffix array we never materialize
# cross-document pairs, only per-position membership.
# ---------------------------------------------------------------------------


def ngram_pos_expr(text_col: str, n: int) -> str:
    """Positioned n-gram hashes ``(pos, g)`` as one SQL expression; the
    token array is bound once (see shingles_expr). Docs with < n tokens
    yield an empty array — the size guard matters because Spark's
    ``sequence(0, -1)`` counts down."""
    toks = tokens_expr(text_col)
    g = _hash60(f"concat_ws(' ', slice(tk, i + 1, {n}))")
    return (
        f"flatten(transform(array({toks}), tk -> "
        f"CASE WHEN size(tk) < {n} THEN "
        f"cast(array() as array<struct<pos:int,g:bigint>>) "
        f"ELSE transform(sequence(0, size(tk) - {n}), "
        f"i -> named_struct('pos', cast(i as int), 'g', {g})) END))"
    )


def duplicate_ngram_spans(
    df: DataFrame,
    n: int = 5,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal per-document token spans covered by n-grams that occur at
    least ``min_count`` times corpus-wide (multiplicity counts: a doc that
    repeats itself is a duplicate of itself, matching Lee et al.).

    Returns ``(id_col, span_start, span_end, span_tokens)`` with 0-based
    inclusive token indices. Overlapping/adjacent duplicated n-grams merge
    into one span via the gaps-and-islands trick (covered position minus
    its per-doc rank is constant within an island).
    """
    from pyspark.sql import Window

    ex = (
        df.select(F.col(id_col), F.explode(F.expr(ngram_pos_expr(text_col, n))).alias("ng"))
        .select(id_col, F.col("ng.pos").alias("pos"), F.col("ng.g").alias("g"))
    )
    hot = (
        ex.groupBy("g")
        .agg(F.count("*").alias("_cnt"))
        .filter(F.col("_cnt") >= min_count)
        .select("g")
    )
    covered = (
        ex.join(hot, "g")
        .select(id_col, F.explode(F.expr(f"sequence(pos, pos + {n - 1})")).alias("t"))
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


def strip_duplicate_spans(
    df: DataFrame,
    n: int = 5,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove every token covered by a corpus-duplicated n-gram and
    reassemble the remainder with single spaces, preserving the original
    token case (detection is case-insensitive; whitespace is collapsed by
    tokenization — the only normalization the rebuild applies).

    Returns one row per input row: ``(id_col, kept_text, n_tokens,
    removed_tokens)``. Spans touch a small fraction of the corpus by
    construction, so the rebuild never explodes the corpus's tokens:
    spans fold into one array per affected document (a spans-sized
    groupBy), join back on the id, and the strip itself is a per-row
    higher-order-function filter — token order is the array order, no
    re-sort, no second corpus shuffle.
    """
    spans = duplicate_ngram_spans(df, n, min_count, text_col, id_col)
    # removed token counts ride the span table (spans are disjoint and
    # maximal, so their lengths sum exactly) — recomputing them from the
    # token arrays would re-split every document's text a second time
    spans_arr = spans.groupBy(id_col).agg(
        F.expr(
            "array_sort(collect_list(named_struct("
            "'s', span_start, 'e', span_end)))"
        ).alias("_sp"),
        F.sum("span_tokens").alias("_rm"),
    )
    # Detection (duplicate_ngram_spans) hashes lowercased n-grams; the
    # rebuild keeps the surviving tokens in their ORIGINAL case — positions
    # align because lowercasing never changes whitespace token boundaries.
    # Unaffected documents (the vast majority: spans touch a small slice of
    # the corpus) take the cheap branch: one regex collapse, provably equal
    # to concat_ws(' ', tokens_expr_cased) for every input, instead of a
    # split + struct-zip + rejoin. CASE branches evaluate lazily in
    # codegen, so affected-doc work never runs for clean docs.
    toks = tokens_expr_cased(text_col)
    kept = (
        f"transform(filter(transform({toks}, (t, i) -> named_struct('t', t, 'i', i)), "
        f"x -> NOT exists(_sp, sp -> x.i >= sp.s AND x.i <= sp.e)), x -> x.t)"
    )
    return (
        df.join(spans_arr, id_col, "left")
        .select(
            F.col(id_col),
            F.expr(
                f"CASE WHEN _sp IS NULL "
                f"THEN regexp_replace(trim({text_col}), '\\\\s+', ' ') "
                f"ELSE concat_ws(' ', {kept}) END"
            ).alias("kept_text"),
            F.expr(f"size({toks})").alias("n_tokens"),
            F.expr("coalesce(_rm, 0)").cast("int").alias("removed_tokens"),
        )
    )
