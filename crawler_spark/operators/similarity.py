"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — JVM-side ``zip_with``/``aggregate``
higher-order functions (codegen'd, no Python). Scale path: LSH-bucketed
search via random-hyperplane signatures (buckets shrink the candidate set;
the same brute-force kernel re-ranks within buckets). An IVF variant would
swap the hash for nearest-centroid assignment; hyperplane LSH avoids a
training pass and stays deterministic, which tests need.
"""

from __future__ import annotations

import math
import random
from typing import List, Sequence

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
    expr = f"{_dot_expr(vec_col, qlit)} / ({_norm_expr(vec_col)} * {qnorm!r}d)"
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


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH bucket blocking
    bounds the self-join (near-identical vectors share all sign bits with
    high probability), exact cosine within buckets.

    Output (id_a, id_b, cosine) with id_a < id_b, cosine >= threshold.
    At corpus scale the join shuffles on ``lsh_bucket`` — never a cross
    join; recall is tunable via n_planes (fewer planes = bigger buckets).
    """
    sig = hyperplane_signature(df, dim, n_planes, seed, vec_col)
    a = sig.alias("a")
    b = sig.alias("b")
    dot = _dot_expr(f"a.{vec_col}", f"b.{vec_col}")
    na = _norm_expr(f"a.{vec_col}")
    nb = _norm_expr(f"b.{vec_col}")
    return (
        a.join(
            b,
            (F.col("a.lsh_bucket") == F.col("b.lsh_bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn("cosine", F.round(F.expr(f"({dot}) / (({na}) * ({nb}))"), 6))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "cosine",
        )
    )


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
