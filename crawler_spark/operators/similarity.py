"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — JVM-side ``zip_with``/``aggregate``
higher-order functions (codegen'd, no Python). Two scale paths:

- LSH-bucketed search via random-hyperplane signatures (buckets shrink the
  candidate set; the same brute-force kernel re-ranks within buckets) —
  training-free, fixed memory.
- IVF-Flat (``ivf_centroids`` / ``ivf_assign`` / ``ivf_topk``): a
  data-derived coarse quantizer. The quantizer is a deterministic
  hash-sample of the corpus (the cross-engine hash60 primitive — no RNG, no
  global sort), so both engines of the correctness gate derive the *same*
  centroids; nearest-centroid assignment is a pure column expression over k
  literal vectors (scan-only, zero shuffle, codegen'd), the shape that
  survives 100 TB. Query time probes the ``nprobe`` nearest inverted lists
  and exact-reranks — at cluster scale the corpus is written partitioned by
  ``centroid_id`` so the probe is partition pruning, exactly like
  ``lsh_topk``'s bucket filter.
"""

from __future__ import annotations

import math
import random
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot_expr(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"0.0d, (acc, v) -> acc + v)"
    )


def _norm_expr(a: str) -> str:
    return f"sqrt(aggregate({a}, 0.0d, (acc, v) -> acc + cast(v as double) * cast(v as double)))"


def cosine_to_query(
    df: DataFrame,
    query: Sequence[float],
    vec_col: str = "embedding",
    out_col: str = "cosine",
) -> DataFrame:
    """Add cosine similarity to a fixed query vector. Accumulation is in
    index order (deterministic, oracle-reproducible)."""
    qlit = "array(" + ", ".join(f"{float(x)!r}d" for x in query) + ")"
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query))
    # zero-norm rows (e.g. hashed vectors of empty documents) define
    # cosine 0.0 — never a divide-by-zero under ANSI mode
    denom = f"({_norm_expr(vec_col)} * {qnorm!r}d)"
    expr = (
        f"CASE WHEN {denom} = 0.0d THEN 0.0d "
        f"ELSE {_dot_expr(vec_col, qlit)} / {denom} END"
    )
    return df.withColumn(out_col, F.expr(expr))


def brute_force_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: orderBy+limit compiles to TakeOrderedAndProject
    (per-partition heap + driver merge — no global sort)."""
    scored = cosine_to_query(df, query, vec_col)
    return (
        scored.select(id_col, F.round("cosine", 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplane_signature(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    out_col: str = "lsh_bucket",
) -> DataFrame:
    """Random-hyperplane LSH bucket id (sign pattern of n_planes dots)."""
    rng = random.Random(seed)
    planes: List[List[float]] = [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]
    bits = []
    for p in planes:
        plit = "array(" + ", ".join(f"{x!r}d" for x in p) + ")"
        bits.append(f"(CASE WHEN {_dot_expr(vec_col, plit)} >= 0 THEN '1' ELSE '0' END)")
    return df.withColumn(out_col, F.expr("concat(" + ", ".join(bits) + ")"))


def planes_for_corpus(
    n_rows: int,
    target_bucket_rows: int = 1024,
    min_planes: int = 4,
    max_planes: int = 28,
) -> int:
    """Plane count so the EXPECTED bucket holds ~target_bucket_rows.

    A fixed plane count is the classic LSH scale bug: 8 planes = 256 buckets
    forever, so within-bucket self-join work grows O((N/256)^2) with corpus
    size. Scaling planes with log2(N / target) keeps expected bucket size
    constant, making the join cost O(N * target) — linear in the corpus.
    max_planes=28 bounds signature length (268M buckets covers 10^11 rows at
    the default target).
    """
    if n_rows <= target_bucket_rows:
        return min_planes
    return max(min_planes, min(max_planes, math.ceil(math.log2(n_rows / target_bucket_rows))))


def bucket_stats(sig_df: DataFrame, bucket_col: str = "lsh_bucket") -> dict:
    """Bucket-size guardrail metrics: {n_rows, n_buckets, max_bucket_rows,
    max_bucket_fraction}. One aggregation job; at production scale run it
    per batch and alert when max_bucket_fraction stays high after a plane
    increase — that means a near-identical cluster (pre-dedup it), not an
    under-planed signature."""
    row = (
        sig_df.groupBy(bucket_col)
        .agg(F.count("*").alias("n"))
        .agg(
            F.sum("n").alias("n_rows"),
            F.count("*").alias("n_buckets"),
            F.max("n").alias("max_bucket_rows"),
        )
        .collect()[0]
    )
    n = row["n_rows"] or 0
    return {
        "n_rows": n,
        "n_buckets": row["n_buckets"],
        "max_bucket_rows": row["max_bucket_rows"],
        "max_bucket_fraction": (row["max_bucket_rows"] / n) if n else 0.0,
    }


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: Optional[int] = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    target_bucket_rows: int = 1024,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH bucket blocking
    bounds the self-join (near-identical vectors share all sign bits with
    high probability), exact cosine within buckets.

    Output (id_a, id_b, cosine) with id_a < id_b, cosine >= threshold.
    At corpus scale the join shuffles on ``lsh_bucket`` — never a cross
    join; recall is tunable via n_planes (fewer planes = bigger buckets).

    ``n_planes=None`` derives the plane count from the corpus size via
    ``planes_for_corpus`` (one driver-side count — the row count is needed
    anyway to size the shuffle), keeping expected bucket size constant as
    the corpus grows instead of letting within-bucket work go quadratic.
    """
    if n_planes is None:
        n_planes = planes_for_corpus(df.count(), target_bucket_rows)
    sig = hyperplane_signature(df, dim, n_planes, seed, vec_col)
    # norm once per ROW before the self-join, not once per PAIR inside it —
    # same accumulation order, bit-identical quotient, ~3x less float work
    # (a bucket of m rows does m norms instead of m^2)
    sig = sig.withColumn("_norm", F.expr(_norm_expr(vec_col)))
    a = sig.alias("a")
    b = sig.alias("b")
    dot = _dot_expr(f"a.{vec_col}", f"b.{vec_col}")
    return (
        a.join(
            b,
            (F.col("a.lsh_bucket") == F.col("b.lsh_bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn(
            # zero-norm vectors (empty documents) are cosine 0 to everything
            "cosine",
            F.round(
                F.when(
                    F.col("a._norm") * F.col("b._norm") == 0.0, F.lit(0.0)
                ).otherwise(
                    F.expr(f"({dot})") / (F.col("a._norm") * F.col("b._norm"))
                ),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "cosine",
        )
    )


def ivf_centroids(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_stride: Optional[int] = None,
) -> DataFrame:
    """Deterministic sample-seeded coarse quantizer for IVF-Flat.

    Classic IVF trains k-means on a sample; for cross-engine determinism
    the quantizer here *is* the sample: hash-select ~4k candidate rows with
    the hash60 primitive (``md5`` prefix as bigint — identical arithmetic
    in Spark and DuckDB, no RNG), then keep the ``k`` smallest ids via
    ``orderBy+limit`` (TakeOrderedAndProject: per-partition heap + driver
    merge, no global sort). ``centroid_id`` is the seeding row's id.
    One scan; rerunning on the same corpus rebuilds the same quantizer.
    """
    from crawler_spark.operators.dedup import _hash60

    n = df.count()
    if sample_stride is None:
        sample_stride = max(1, n // (4 * k))
    cand = df.filter(
        F.expr(f"pmod({_hash60(f'cast({id_col} as string)')}, {sample_stride}) = 0")
    )
    return cand.orderBy(id_col).limit(k).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("c_emb")
    )


def _sq_l2_expr(vec_col: str, centroid: Sequence[float]) -> str:
    clit = "array(" + ", ".join(f"{float(x)!r}d" for x in centroid) + ")"
    return (
        f"aggregate(zip_with({vec_col}, {clit}, "
        f"(x, y) -> (cast(x as double) - y) * (cast(x as double) - y)), "
        f"0.0d, (acc, v) -> acc + v)"
    )


def nearest_centroid_expr(
    centroid_rows: Sequence, vec_col: str = "embedding"
) -> str:
    """SQL expression assigning a vector to its nearest centroid: an
    ``array_min`` over ``(squared_l2, centroid_id)`` structs — lexicographic
    struct ordering gives the argmin with a deterministic id tie-break.
    Pure codegen'd column expression: assignment costs one scan, no join,
    no shuffle, at any corpus size. ``centroid_rows`` are (centroid_id,
    c_emb) rows collected from ``ivf_centroids`` (k rows — driver-small by
    construction)."""
    elems = ", ".join(
        f"named_struct('d', {_sq_l2_expr(vec_col, emb)}, 'c', {int(cid)}L)"
        for cid, emb in centroid_rows
    )
    return f"array_min(array({elems})).c"


def ivf_assign(
    df: DataFrame,
    centroid_rows: Sequence,
    vec_col: str = "embedding",
    out_col: str = "centroid_id",
) -> DataFrame:
    """Add the inverted-list id (nearest centroid) to every row. The index
    build is this plus a partitioned write on ``out_col``; list sizes are a
    single aggregation (see ``bucket_stats`` for the skew guardrail)."""
    return df.withColumn(out_col, F.expr(nearest_centroid_expr(centroid_rows, vec_col)))


def kmeans_step_sums(
    df: DataFrame,
    centroid_rows: Sequence,
    vec_col: str = "embedding",
    quant_bits: int = 20,
) -> DataFrame:
    """One Lloyd accumulation step as a DataFrame: assign every vector to
    its nearest centroid (the zero-shuffle ``ivf_assign`` expression),
    quantize each component to fixed-point ``round(v * 2^quant_bits)``
    BIGINTs, and reduce to ``(centroid_id, pos, qsum, n)`` — the exact
    integer sufficient statistics of the k-means update. All-integer
    output: associative order-free reduction, bit-identical at any
    partition count and engine-replayable (see the ``kmeans_step_docs``
    oracle). ``ivf_refine`` is this step in a loop plus the mean division.

    Shuffle shape: posexplode keys (centroid, component) with map-side
    partial sums — the shuffle carries partitions × k × dim rows, never
    the vectors."""
    scale = float(1 << quant_bits)
    cur = [(int(c), [float(x) for x in e]) for c, e in centroid_rows]
    assigned = ivf_assign(df, cur, vec_col)
    return (
        assigned.select(
            "centroid_id",
            F.posexplode(
                F.expr(
                    f"transform({vec_col}, v -> "
                    f"cast(round(cast(v as double) * {scale!r}d) as bigint))"
                )
            ).alias("pos", "q"),
        )
        .groupBy("centroid_id", "pos")
        .agg(F.sum("q").alias("qsum"), F.count("*").alias("n"))
    )


def ivf_refine(
    df: DataFrame,
    centroid_rows: Sequence,
    iters: int = 1,
    vec_col: str = "embedding",
    quant_bits: int = 20,
) -> list:
    """Deterministic Lloyd refinement of the IVF quantizer.

    Each iteration reassigns every vector to its nearest centroid (the same
    zero-shuffle expression as ``ivf_assign``) and replaces each centroid
    with its list's mean. Float means are famously parallelism-dependent
    (summation order varies with partitioning); here each component is
    quantized to fixed-point ``round(v * 2^quant_bits)`` and summed as
    64-bit integers — an associative, order-free reduction — so the refined
    quantizer is bit-identical at any partition count (the determinism
    contract every other operator in this engine keeps). Shuffle shape:
    posexplode to (centroid, component) keys with map-side partial sums —
    k*dim rows reach the driver, never the vectors.

    Safe bound: |sum| < 2^63 needs n_rows * 2^quant_bits * max|v| < 2^63,
    e.g. 10^10 rows at quant_bits=20 allows |v| up to ~8e2 — fine for
    normalized embeddings.

    Returns refined (centroid_id, components) rows; empty lists keep their
    previous centroid (classic k-means empty-cluster rule).
    """
    scale = float(1 << quant_bits)
    cur = [(int(c), [float(x) for x in e]) for c, e in centroid_rows]
    for _ in range(max(0, iters)):
        sums = kmeans_step_sums(df, cur, vec_col, quant_bits).collect()
        by_cid: dict = {}
        for r in sums:
            by_cid.setdefault(int(r["centroid_id"]), {})[int(r["pos"])] = (
                int(r["qsum"]),
                int(r["n"]),
            )
        nxt = []
        for cid, emb in cur:
            comps = by_cid.get(cid)
            if not comps:
                nxt.append((cid, emb))  # empty list: keep previous centroid
                continue
            nxt.append(
                (
                    cid,
                    [
                        (comps[i][0] / comps[i][1]) / scale
                        for i in range(len(emb))
                    ],
                )
            )
        cur = nxt
    return cur


def ivf_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_rows: Optional[Sequence] = None,
) -> DataFrame:
    """IVF-Flat approximate top-k: probe the ``nprobe`` inverted lists whose
    centroids sit nearest the query, exact cosine rerank inside them.
    ``centroid_rows`` (from a prior ``ivf_centroids(...).collect()``) skips
    the quantizer rebuild — production keeps them with the index. The probe
    filter is a literal IN over ``centroid_id``: partition-prunable when the
    corpus is written partitioned by its inverted list."""
    if centroid_rows is None:
        centroid_rows = [
            (r["centroid_id"], list(r["c_emb"]))
            for r in ivf_centroids(df, n_centroids, vec_col, id_col).collect()
        ]
    # nprobe nearest centroids to the query — k doubles in the driver, same
    # left-to-right accumulation as the executor-side expression
    def d2(emb):
        return sum((float(x) - float(y)) * (float(x) - float(y)) for y, x in zip(emb, query))

    probes = sorted(
        (d2(emb), int(cid)) for cid, emb in centroid_rows
    )[: max(1, nprobe)]
    probe_ids = sorted(c for _, c in probes)
    assigned = ivf_assign(df, centroid_rows, vec_col)
    lists = assigned.filter(F.col("centroid_id").isin(probe_ids))
    return brute_force_topk(lists, query, k, vec_col, id_col)


def lsh_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: filter to the query's LSH bucket (± multiprobe
    within Hamming distance), then exact re-rank. At corpus scale the bucket
    filter is a partition-prunable predicate when the table is written
    bucketed/partitioned by ``lsh_bucket``."""
    dim = len(query)
    with_sig = hyperplane_signature(df, dim, n_planes, seed, vec_col)

    rng = random.Random(seed)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
    qbits = "".join(
        "1" if sum(a * float(b) for a, b in zip(p, query)) >= 0 else "0"
        for p in planes
    )
    probes = {qbits}
    if multiprobe_hamming >= 1:
        for i in range(n_planes):
            flipped = qbits[:i] + ("0" if qbits[i] == "1" else "1") + qbits[i + 1:]
            probes.add(flipped)

    bucketed = with_sig.filter(F.col("lsh_bucket").isin(sorted(probes)))
    return brute_force_topk(bucketed, query, k, vec_col, id_col)


def clusters_for_corpus(n_rows: int, target_cluster_rows: int = 4096) -> int:
    """Cluster count that keeps the expected cluster size constant as the
    corpus grows — the knob that stops ``semantic_dedup``'s within-cluster
    self-join from going quadratic (same role ``planes_for_corpus`` plays
    for the LSH blocker). One driver-known count in, an int out."""
    return max(8, (max(1, n_rows) + target_cluster_rows - 1) // target_cluster_rows)


def semantic_dedup(
    df: DataFrame,
    n_clusters: Optional[int] = 8,
    threshold: float = 0.8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_rows: Optional[Sequence] = None,
    refine_iters: int = 0,
    target_cluster_rows: int = 4096,
) -> DataFrame:
    """SemDedup-style semantic near-duplicate removal (Abbas et al. 2023,
    "SemDedup: Data-efficient learning at web-scale through semantic
    deduplication"): cluster the embedding space, then compare vectors only
    WITHIN their cluster — never across the corpus — and drop every vector
    that has a same-cluster neighbor with cosine >= ``threshold`` and a
    smaller id. The reference crawler has no embedding-space dedup at all;
    this is part of the training-data-pipeline family, beyond-reference.

    Returns the input rows plus ``centroid_id`` and ``keep boolean``
    (survivor flag) — the funnel shape ``curate``/``curation_funnel`` use,
    so callers can count what semantic dedup removed per source.

    Determinism contract: the quantizer is the deterministic hash-sampled
    ``ivf_centroids`` (optionally Lloyd-refined with fixed-point integer
    means, ``refine_iters``); assignment is the literal-centroid argmin
    expression with an id tie-break; cosine accumulates in index order and
    is rounded to 6 decimals before the threshold compare (the same
    convention as ``embedding_near_dup_pairs``); the drop rule
    ("a smaller similar id exists") needs no iteration, so the survivor
    set is bit-identical at any partition count.

    Scale shape for 100 TB: the pair join shuffles on ``centroid_id`` — a
    bounded equi-join, never all-pairs. ``n_clusters=None`` derives the
    cluster count from the corpus size (``clusters_for_corpus``) so the
    expected cluster stays ~``target_cluster_rows`` rows as the corpus
    grows; ``bucket_stats`` over the assigned frame is the skew guardrail
    (a text-dup-heavy corpus can still concentrate one cluster, in which
    case raise ``n_clusters`` or pre-split hot clusters the way the
    politeness queue salts hot hosts). The assigned+norm frame is
    checkpointed once so Catalyst evaluates the k-literal argmin expression
    once, not once per self-join side (the round-2 lesson)."""
    if n_clusters is None:
        n_clusters = clusters_for_corpus(df.count(), target_cluster_rows)
    if centroid_rows is None:
        centroid_rows = [
            (r["centroid_id"], list(r["c_emb"]))
            for r in ivf_centroids(df, n_clusters, vec_col, id_col).collect()
        ]
        if refine_iters > 0:
            centroid_rows = ivf_refine(
                df, centroid_rows, iters=refine_iters, vec_col=vec_col
            )
    assigned = (
        ivf_assign(df, centroid_rows, vec_col)
        .withColumn("_norm", F.expr(_norm_expr(vec_col)))
        .localCheckpoint(eager=False)
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    dot = _dot_expr(f"a.{vec_col}", f"b.{vec_col}")
    dominated = (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn(
            "cosine",
            F.round(
                F.when(
                    F.col("a._norm") * F.col("b._norm") == 0.0, F.lit(0.0)
                ).otherwise(
                    F.expr(f"({dot})") / (F.col("a._norm") * F.col("b._norm"))
                ),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        assigned.drop("_norm")
        .join(dominated, id_col, "left")
        .withColumn("keep", F.coalesce(~F.col("_dup"), F.lit(True)))
        .drop("_dup")
    )


def pq_train(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    refine_iters: int = 0,
) -> List[List[tuple]]:
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    quantization for nearest neighbor search"): split each vector into
    ``m`` contiguous subvectors and learn ``k`` centroids per subspace.
    Combined with ``pq_encode``/``pq_topk`` this is IVF-PQ's compression
    half — a 64-dim float32 vector becomes ``m`` small codes (~16-32x
    smaller), which is what makes billion-vector ANN indexes fit a cluster.

    Training reuses the deterministic hash-sampled quantizer
    (``ivf_centroids``, the cross-engine hash60 primitive — no RNG): one
    sampled row set seeds every subspace, codes are dense 0..k-1 in
    seeding-id order, so the correctness oracle can rebuild the identical
    codebooks in SQL. ``refine_iters`` runs per-subspace deterministic
    Lloyd refinement (``ivf_refine``) for classic independent-subspace
    training when cross-engine replay is not required.

    Returns ``m`` codebooks; codebook ``j`` is ``[(code, subvector), ...]``.
    """
    seeds = ivf_centroids(df, k, vec_col, id_col).orderBy("centroid_id").collect()
    dim = len(seeds[0]["c_emb"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    books: List[List[tuple]] = []
    for j in range(m):
        sub = [
            (code, [float(x) for x in r["c_emb"][j * d_sub : (j + 1) * d_sub]])
            for code, r in enumerate(seeds)
        ]
        if refine_iters > 0:
            df_j = df.select(
                F.col(id_col),
                F.expr(f"slice({vec_col}, {j * d_sub + 1}, {d_sub})").alias(vec_col),
            )
            sub = ivf_refine(df_j, sub, iters=refine_iters, vec_col=vec_col)
        books.append([(int(c), list(e)) for c, e in sub])
    return books


def pq_encode(
    df: DataFrame,
    codebooks: Sequence[Sequence[tuple]],
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Encode every vector as ``array<bigint>`` of length ``m`` — per
    subspace, the argmin over k literal codebook entries with a code
    tie-break (the ``nearest_centroid_expr`` shape applied to a
    ``slice()`` of the vector). Pure codegen'd column expression: one
    scan, zero shuffle, no Python — the right shape for encoding 100 TB.
    The expression is O(m*k) literals; for production k=256 sizing use
    ``pq_encode_pandas`` (identical output, Arrow-batched numpy argmin)."""
    d_sub = len(codebooks[0][0][1])
    exprs = []
    for j, book in enumerate(codebooks):
        sub = f"slice({vec_col}, {j * d_sub + 1}, {d_sub})"
        elems = ", ".join(
            f"named_struct('d', {_sq_l2_expr(sub, emb)}, 'c', {int(code)}L)"
            for code, emb in book
        )
        exprs.append(f"array_min(array({elems})).c")
    return df.withColumn(out_col, F.expr("array(" + ", ".join(exprs) + ")"))


def pq_encode_pandas(
    df: DataFrame,
    codebooks: Sequence[Sequence[tuple]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "pq_code",
) -> DataFrame:
    """The k=256-scale twin of ``pq_encode``: vectorized numpy argmin over
    Arrow batches (``mapInPandas``). Bit-identical codes to the expression
    path (same float64 arithmetic, same index-order accumulation, same
    code tie-break via argmin-first-occurrence on codes sorted ascending)."""
    import numpy as np
    import pandas as pd

    d_sub = len(codebooks[0][0][1])
    mats = [
        np.array([e for _, e in sorted(book)], dtype=np.float64)
        for book in codebooks
    ]

    def encode(batches):
        for pdf in batches:
            vecs = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            codes = np.empty((len(vecs), len(mats)), dtype=np.int64)
            for j, mat in enumerate(mats):
                sub = vecs[:, j * d_sub : (j + 1) * d_sub]
                # (n, k) squared L2; argmin returns the first (smallest
                # code) on ties — matching the struct-ordering tie-break
                d2 = ((sub[:, None, :] - mat[None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, out_col: list(codes)}
            )

    return df.select(id_col, vec_col).mapInPandas(
        encode, schema=f"{id_col} long, {out_col} array<bigint>"
    )


def pq_topk(
    codes: DataFrame,
    query: Sequence[float],
    codebooks: Sequence[Sequence[tuple]],
    k: int = 10,
    code_col: str = "pq_code",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the driver computes
    one k-entry lookup table per subspace (squared L2 between the query
    subvector and each codebook entry — m*k doubles), and the scan cost per
    row is ``m`` literal-array ``element_at`` lookups plus adds. No
    decompression, no vector math on executors, zero shuffle before the
    ``TakeOrderedAndProject`` top-k — the scan shape that makes PQ the
    standard at billion-vector scale. Distances are approximate (quantized
    corpus side); rerank survivors with exact math where recall matters.
    Returns (id, adc_d2) rounded to 6 decimals, ties broken by id."""
    d_sub = len(codebooks[0][0][1])
    terms = []
    for j, book in enumerate(codebooks):
        qsub = [float(x) for x in query[j * d_sub : (j + 1) * d_sub]]
        lut = []
        for _, emb in sorted(book):
            lut.append(sum((a - float(b)) * (a - float(b)) for a, b in zip(qsub, emb)))
        arr = "array(" + ", ".join(f"{v!r}d" for v in lut) + ")"
        terms.append(
            f"element_at({arr}, cast(element_at({code_col}, {j + 1}) as int) + 1)"
        )
    dist = " + ".join(terms)
    return (
        codes.withColumn("adc_d2", F.round(F.expr(dist), 6))
        .select(id_col, "adc_d2")
        .orderBy("adc_d2", id_col)
        .limit(k)
    )


def ivfpq_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    m: int = 4,
    pq_k: int = 16,
    rerank: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_rows: Optional[Sequence] = None,
    codebooks: Optional[Sequence[Sequence[tuple]]] = None,
) -> DataFrame:
    """IVF-PQ: the composition that serves billion-vector ANN — the IVF
    coarse quantizer prunes to ``nprobe`` inverted lists (partition
    pruning when the corpus is written partitioned by ``centroid_id``),
    and within those lists the scan reads PQ CODES, not vectors
    (``pq_topk``'s LUT arithmetic — no decompression, ~16-32x less IO).
    ``rerank > 0`` exact-reranks the top ``rerank`` ADC survivors with
    full-precision cosine, the standard recall refinement; the result then
    carries ``cosine`` instead of ``adc_d2``.

    Both trained artifacts (``centroid_rows``, ``codebooks``) are
    driver-small and deterministic; production keeps them with the index
    and passes them in, skipping the rebuild scans."""
    if centroid_rows is None:
        centroid_rows = [
            (r["centroid_id"], list(r["c_emb"]))
            for r in ivf_centroids(df, n_centroids, vec_col, id_col).collect()
        ]
    if codebooks is None:
        codebooks = pq_train(df, m=m, k=pq_k, vec_col=vec_col, id_col=id_col)

    def d2(emb):
        return sum(
            (float(x) - float(y)) * (float(x) - float(y))
            for y, x in zip(emb, query)
        )

    probes = sorted((d2(emb), int(cid)) for cid, emb in centroid_rows)[
        : max(1, nprobe)
    ]
    probe_ids = sorted(c for _, c in probes)
    lists = ivf_assign(df, centroid_rows, vec_col).filter(
        F.col("centroid_id").isin(probe_ids)
    )
    fetch = max(k, rerank)
    adc = pq_topk(
        pq_encode(lists, codebooks, vec_col), query, codebooks, k=fetch,
        id_col=id_col,
    )
    if rerank <= 0:
        return adc.limit(k)
    survivors = df.join(F.broadcast(adc.select(id_col)), id_col, "left_semi")
    return brute_force_topk(survivors, query, k, vec_col, id_col)


# ---------------------------------------------------------------------------
# SQ8 scalar quantization: per-dimension 8-bit codes
# ---------------------------------------------------------------------------


def sq_params(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1 << 14,
) -> List[tuple]:
    """Per-dimension quantization ranges for SQ8 scalar quantization.

    SQ8 is the storage-side complement of PQ: each float becomes one
    byte via a per-dimension linear map (FAISS's ScalarQuantizer QT_8bit,
    Milvus/Lucene "SQ8") — 4-8x smaller vectors with near-exact recall,
    the standard first compression step before PQ's 16-32x.

    Everything is exact BIGINT arithmetic: values enter fixed point as
    ``floor(double(x) * scale)`` (float->double widening is lossless and
    both engines floor identically), then one corpus pass computes
    per-dimension min/max — a posexplode + dimension-keyed aggregate, so
    the exchange carries #dims rows. Returns ``[(mn, mx), ...]`` fixed-
    point BIGINTs, dimension order.

    Overflow envelope for `sq_topk`'s exact-BIGINT distances: each
    squared term is ``(255 * span)^2`` with ``span = (mx - mn) * scale``
    in fixed point, so the sum stays inside int64 while
    ``dims * (255 * span)^2 < 2^63`` — at the default scale (2^14) that
    is value ranges up to ~4.7 at 4k dims or ~30 at 128 dims
    (``span <= sqrt(2^63 / dims) / 255``). For wider-range embeddings
    pass a smaller ``scale`` (every operation here degrades gracefully in
    resolution, never in determinism); normalized/unit embeddings — the
    usual ANN input — are far inside the envelope.
    """
    d = df.select(F.posexplode(vec_col).alias("i", "x")).select(
        "i", F.expr(f"cast(floor(cast(x as double) * {scale}) as bigint)").alias("fx")
    )
    rows = (
        d.groupBy("i")
        .agg(F.min("fx").alias("mn"), F.max("fx").alias("mx"))
        .orderBy("i")
        .collect()
    )
    return [(int(r["mn"]), int(r["mx"])) for r in rows]


def sq_encode(
    df: DataFrame,
    params: Sequence[tuple],
    vec_col: str = "embedding",
    out_col: str = "sq_code",
    scale: int = 1 << 14,
) -> DataFrame:
    """Encode vectors as ``array<int>`` of 0..255 codes — one ``transform``
    over the vector with literal min/span arrays, integer division only:
    ``code = clamp(((fx - mn) * 255) div span)``. Pure codegen'd column
    expression: one scan, zero shuffle, no Python. Out-of-range values
    (vectors unseen at ``sq_params`` time) clamp to the edges.
    """
    mn = "array(" + ", ".join(f"{m}L" for m, _ in params) + ")"
    span = "array(" + ", ".join(f"{max(x - m, 1)}L" for m, x in params) + ")"
    return df.withColumn(
        out_col,
        F.expr(
            f"transform({vec_col}, (x, i) -> cast(least(255L, greatest(0L, "
            f"((floor(cast(x as double) * {scale}) - element_at({mn}, i + 1)) * 255) "
            f"div element_at({span}, i + 1))) as int))"
        ),
    )


def sq_topk(
    codes: DataFrame,
    query: Sequence[float],
    params: Sequence[tuple],
    k: int = 10,
    code_col: str = "sq_code",
    id_col: str = "vec_id",
    scale: int = 1 << 14,
    rerank: Optional[DataFrame] = None,
    rerank_mult: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k over SQ8 codes, exact-integer throughout.

    Distance per dimension is ``255*(qfx - mn) - code*span`` — the query
    in fixed point against the *left edge* of the code's quantization
    cell, scaled by 255 so no division happens anywhere; the squared sum
    is exact BIGINT, so ranking is bit-deterministic across engines and
    partitionings (ties by id). Zero shuffle before the
    ``TakeOrderedAndProject`` finish.

    With ``rerank`` (the original embeddings), the ADC pass keeps
    ``k * rerank_mult`` survivors and exact float cosine re-orders them —
    the standard recall-restoring pattern (same as ``ivfpq_topk``).
    Returns (id, sq_d2) or (id, cos) rounded to 6dp.
    """
    import math

    qfx = [int(math.floor(float(q) * scale)) for q in query]
    # one aggregate over the code array with literal per-dimension
    # constants: dd_j = base_j - code_j * span_j; distance = sum dd^2
    bases = "array(" + ", ".join(
        f"{255 * (qf - mn)}L" for (mn, _), qf in zip(params, qfx)
    ) + ")"
    spans = "array(" + ", ".join(f"{max(mx - mn, 1)}L" for mn, mx in params) + ")"
    dist = (
        f"aggregate(transform({code_col}, (c, i) -> "
        f"(element_at({bases}, i + 1) - cast(c as bigint) * element_at({spans}, i + 1)) * "
        f"(element_at({bases}, i + 1) - cast(c as bigint) * element_at({spans}, i + 1))"
        f"), 0L, (acc, v) -> acc + v)"
    )
    adc = codes.withColumn("sq_d2", F.expr(dist))
    if rerank is None:
        return adc.select(id_col, "sq_d2").orderBy("sq_d2", id_col).limit(k)
    survivors = adc.select(id_col, "sq_d2").orderBy("sq_d2", id_col).limit(
        k * rerank_mult
    )
    qarr = "array(" + ", ".join(f"{float(x)!r}d" for x in query) + ")"
    qn = sum(float(x) * float(x) for x in query) ** 0.5
    exact = survivors.join(rerank.select(id_col, vec_col), id_col)
    cos = (
        f"case when {_norm_expr(vec_col)} = 0d or {qn!r}d = 0d then 0d "
        f"else {_dot_expr(vec_col, qarr)} / ({_norm_expr(vec_col)} * {qn!r}d) end"
    )
    return (
        exact.withColumn("cos", F.round(F.expr(cos), 6))
        .select(id_col, "cos")
        .orderBy(F.col("cos").desc(), id_col)
        .limit(k)
    )


def srp_matrix(dim: int, out_dim: int, seed: int = 42) -> List[List[int]]:
    """Deterministic ±1 sign-projection matrix (out_dim x dim) from a
    seeded PRNG — the same bake-literals-once pattern as
    :func:`hyperplane_signature`'s planes, shared so the gate's oracle can
    embed the identical matrix."""
    rng = random.Random(seed)
    return [
        [1 if rng.random() < 0.5 else -1 for _ in range(dim)]
        for _ in range(out_dim)
    ]


def srp_project(
    df: DataFrame,
    dim: int,
    out_dim: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    out_col: str = "rp_emb",
) -> DataFrame:
    """Sign-random-projection dimensionality reduction (Achlioptas 2003's
    database-friendly Johnson-Lindenstrauss transform, ±1 entries): adds
    ``out_col array<double>`` with ``out[i] = sum_j v[j] * s[i][j]``.

    Where it sits in the ANN family: :func:`hyperplane_signature` keeps
    only the SIGN of each projection (LSH bucketing); PQ/SQ8 quantize the
    original space. SRP keeps the real-valued projections — a 4x-8x
    narrower embedding whose dot products approximate the originals'
    (JL guarantee), so downstream IVF/brute-force rerank runs on
    ``out_dim`` doubles instead of ``dim``. The standard recipe is
    coarse-search on the projection, exact rerank on the original.

    Determinism: the matrix is baked as ±1 literals (Python-side PRNG,
    one copy in the plan); each output component is one left-to-right
    ``aggregate`` fold in pinned literal order, rounded to 6 decimals —
    bit-identical across engines and partitionings. Zero shuffle: pure
    row-local expression, whole-stage codegen.
    """
    mat = srp_matrix(dim, out_dim, seed)
    comps = []
    for row in mat:
        slit = "array(" + ", ".join(f"{x}d" for x in row) + ")"
        comps.append(
            f"round(aggregate(zip_with({vec_col}, {slit}, "
            f"(x, s) -> cast(x as double) * s), 0.0d, "
            f"(acc, v) -> acc + v), 6)"
        )
    # fail fast on a dim mismatch: zip_with would otherwise pad with
    # NULLs and silently poison every component
    arr = "array(" + ", ".join(comps) + ")"
    guarded = (
        f"CASE WHEN size({vec_col}) = {int(dim)} THEN {arr} "
        f"ELSE raise_error(concat('srp_project: expected dim {int(dim)}, "
        f"got ', cast(size({vec_col}) as string))) END"
    )
    return df.withColumn(out_col, F.expr(guarded))


# ---------------------------------------------------------------------------
# Embedding-distribution divergence (corpus drift in embedding space)
# ---------------------------------------------------------------------------


def cluster_histograms(
    a: DataFrame,
    b: DataFrame,
    centroid_rows: Sequence,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-centroid exact counts of two corpora under ONE shared codebook:
    ``(centroid_id, n_a, n_b)``, every centroid present (zero-count rows
    included — the divergence below needs the full support).

    Scale shape: assignment is the zero-shuffle
    :func:`nearest_centroid_expr` scan per corpus; the only exchanges
    move k-row count tables. Works on corpora of any size ratio — the
    histograms, not the vectors, are what meet.
    """
    expr = nearest_centroid_expr(centroid_rows, vec_col)

    def counts(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(F.expr(expr).alias("centroid_id"))
            .groupBy("centroid_id")
            .agg(F.count("*").alias(out))
        )

    base = a.sparkSession.createDataFrame(
        [(int(cid),) for cid, _ in centroid_rows], "centroid_id long"
    )
    return (
        base.join(counts(a, "n_a"), "centroid_id", "left")
        .join(counts(b, "n_b"), "centroid_id", "left")
        .select(
            "centroid_id",
            F.coalesce("n_a", F.lit(0)).cast("bigint").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("bigint").alias("n_b"),
        )
    )


def embedding_divergence(
    a: DataFrame,
    b: DataFrame,
    centroid_rows: Sequence,
    vec_col: str = "embedding",
    alpha: float = 1.0,
) -> DataFrame:
    """Jensen-Shannon divergence between two corpora's embedding
    distributions, measured over a shared k-cluster quantization — the
    embedding-space drift detector next to `curation.corpus_diff`'s
    count drift: did a filter pass, a new crawl snapshot, or a sampling
    policy SHIFT the corpus, not just shrink it?

    Per cluster ``i``: ``p_i = (n_a_i + alpha) / (N_a + alpha*k)`` (and
    ``q_i`` likewise — Laplace smoothing keeps every ``ln`` finite);
    ``jsd = 0.5*Σ p ln(p/m) + 0.5*Σ q ln(q/m)`` with ``m = (p+q)/2``.
    Bounds: 0 (identical) .. ln(2) (disjoint support). One row out:
    ``(k, n_a, n_b, jsd)``. All counts exact BIGINTs; the doubles derive
    from them deterministically (the ln-parity stance of the LM gates).

    Scale shape: :func:`cluster_histograms`' two zero-shuffle scans, then
    arithmetic over k rows. Nothing corpus-sized moves.
    """
    k = len(centroid_rows)
    h = cluster_histograms(a, b, centroid_rows, vec_col)
    tot = h.agg(
        F.sum("n_a").cast("bigint").alias("n_a"),
        F.sum("n_b").cast("bigint").alias("n_b"),
    )
    terms = h.crossJoin(tot.select(
        F.col("n_a").alias("_ta"), F.col("n_b").alias("_tb")
    )).select(
        "centroid_id",
        F.expr(
            f"(n_a + {alpha!r}d) / (_ta + {alpha!r}d * {k})"
        ).alias("p"),
        F.expr(
            f"(n_b + {alpha!r}d) / (_tb + {alpha!r}d * {k})"
        ).alias("q"),
    )
    jsd = (
        "0.5d * sum(p * ln(p / ((p + q) / 2.0d))) "
        "+ 0.5d * sum(q * ln(q / ((p + q) / 2.0d)))"
    )
    return (
        terms.agg(F.expr(jsd).alias("_jsd"))
        .crossJoin(tot)
        .select(
            F.lit(k).cast("int").alias("k"),
            "n_a",
            "n_b",
            F.expr("round(_jsd, 6)").alias("jsd"),
        )
    )
