"""Deterministic HyperLogLog cardinality sketch: build / merge / estimate
as pure Spark column math.

Why a sketch in a crawl/curation engine: at 10^10-URL scale, per-host or
per-source distinct counts (unique URLs seen, unique tokens, unique
outlink targets) are monitoring signals you want every wave, but an exact
``count(distinct ...)`` is a full shuffle of the keys themselves. An HLL
register table is ~m small ints per group, mergeable across waves with an
elementwise ``max`` — the same commutative-monoid property the Bloom
sidecar exploits, applied to cardinality instead of membership.

This implementation (Flajolet et al. 2007 HLL with the standard
small-range linear-counting correction; no sparse mode) is built to be
*bit-reproducible across engines*, which stock HLL libraries are not:

- the hash is the engine-wide md5-based ``hash60`` (dedup.py), identical
  in Spark and DuckDB;
- a register's rank comes from ``length(bin(rest))`` — integer string
  length, no float log2 at a rounding boundary;
- the indicator sum ``sum_j 2^-M_j`` is kept EXACT by scaling to
  ``S = sum_j 2^(53 - M_j)`` over BIGINTs (M_j <= 53, so each term fits;
  512 registers * 2^53 < 2^63) — summation order cannot change it;
- only the final estimate divides doubles (identical integer inputs),
  rounded to 6 decimals.

Scale shape: one groupBy((key, bucket)) with map-side partial ``max`` —
the shuffle carries at most ``groups * m`` rows regardless of input size —
then a groups-sized groupBy(key). Merging two sketch tables is the same
groupBy-max, so per-wave sketches compose without rescanning history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import _hash60

# 2^P registers per sketch. P=9 (m=512) keeps the standard error
# ~1.04/sqrt(m) ≈ 4.6% while a whole register table is ~512 rows/group.
HLL_P = 9
HLL_M = 1 << HLL_P
# hash60 yields 60 bits: P index bits + 51 rank bits; a zero remainder
# means 51 leading zeros -> rank 52. Scale exponent 53 keeps 2^(53 - M_j)
# a positive BIGINT for every attainable rank.
_RANK_MAX = 53
# alpha_m for m >= 128 (Flajolet et al. 2007, fig. 3)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def alpha_for_m(m: int) -> float:
    """Published bias constants (Flajolet et al. 2007, fig. 3): exact
    values for the small register counts, the asymptotic formula above
    128. Small m matters for HyperBall, where the per-NODE register
    table is the dominant state and the paper itself runs m = 16-64."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_rank_expr(hash_col: str, p: int = HLL_P) -> str:
    """Rank from a 60-bit hash column. ``shiftright`` keeps the remainder
    exact — ``h / m`` would round through a double and corrupt hashes
    above 2^53. (The DuckDB oracle mirrors this with ``h // m``.)"""
    rest = f"shiftright({hash_col}, {p})"
    return (
        f"CASE WHEN {rest} = 0 THEN {60 - p + 1} "
        f"ELSE {60 - p} - length(bin({rest})) + 1 END"
    )


def hll_registers(
    df: DataFrame,
    key_cols: list,
    value_expr: str,
    p: int = HLL_P,
) -> DataFrame:
    """Sketch register table ``key_cols + (bucket, rank)`` for the values
    of ``value_expr`` (a SQL string expression) within each key group.

    One shuffle, map-side combined to <= m rows per group. Registers for
    empty buckets are implicit (rank 0) — ``hll_estimate`` accounts for
    them, and implicit-zero tables merge correctly (max with nothing is
    the other side). ``p`` (m = 2^p registers) defaults to the module
    standard; pass a smaller p when the KEY cardinality is the scale
    driver (HyperBall: one sketch per node) and ~10% error is fine.
    """
    h = _hash60(value_expr)
    return (
        df.select(
            *key_cols,
            F.expr(f"pmod({h}, {1 << p})").cast("int").alias("bucket"),
            F.expr(hll_rank_expr(f"({h})", p)).cast("int").alias("rank"),
        )
        .groupBy(*key_cols, "bucket")
        .agg(F.max("rank").alias("rank"))
    )


def hll_merge(a: DataFrame, b: DataFrame, key_cols: list) -> DataFrame:
    """Merge two register tables (same keys/space): elementwise max.
    ``merge(build(A), build(B)) == build(A UNION B)`` exactly — the
    property the per-wave composition relies on; asserted in tests."""
    return (
        a.unionByName(b)
        .groupBy(*key_cols, "bucket")
        .agg(F.max("rank").alias("rank"))
    )


def hll_estimate(
    registers: DataFrame, key_cols: list, p: int = HLL_P
) -> DataFrame:
    """Cardinality estimate per key from a register table.

    Output: ``key_cols + (hll_s bigint, hll_zero_buckets int, hll_est
    double)``. ``hll_s`` is the exact scaled indicator sum — the
    cross-engine anchor the oracle compares bit-for-bit; ``hll_est``
    applies alpha bias correction (``alpha_for_m``) and the small-range
    linear-counting switch, rounded to 6 decimals. ``p`` must match the
    build's.
    """
    m = 1 << p
    per_key = registers.groupBy(*key_cols).agg(
        F.sum(F.expr(f"cast(pow(2, {_RANK_MAX} - rank) as bigint)")).alias("_s_used"),
        F.count("*").cast("int").alias("_used"),
    )
    zeros = f"({m} - _used)"
    s = f"(_s_used + cast({zeros} as bigint) * cast(pow(2, {_RANK_MAX}) as bigint))"
    # alpha is cast to double explicitly: both engines otherwise parse the
    # decimal literal as DECIMAL and run (or overflow) fixed-point math
    raw = (
        f"(cast({alpha_for_m(m)!r} as double) * {m} * {m} "
        f"* pow(2, {_RANK_MAX}) / {s})"
    )
    est = (
        f"CASE WHEN {raw} <= 2.5 * {m} AND {zeros} > 0 "
        f"THEN {m} * ln({m} / cast({zeros} as double)) "
        f"ELSE {raw} END"
    )
    return per_key.select(
        *key_cols,
        F.expr(s).alias("hll_s"),
        F.expr(zeros).alias("hll_zero_buckets"),
        F.expr(f"round({est}, 6)").alias("hll_est"),
    )


def hll_distinct(
    df: DataFrame, key_cols: list, value_expr: str
) -> DataFrame:
    """Convenience: build + estimate in one call (per-key approximate
    distinct count of ``value_expr``)."""
    return hll_estimate(hll_registers(df, key_cols, value_expr), key_cols)


# ---------------------------------------------------------------------------
# exact heavy hitters via a Misra-Gries candidate pre-pass
# ---------------------------------------------------------------------------


def mg_candidates(df: DataFrame, key_expr: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries frequent-item summaries (Misra & Gries
    1982): at most ``capacity`` candidate keys per partition, one column
    ``k string``, NULL keys dropped.

    Why not ``groupBy(key).count()`` straight away: when keys are
    near-unique (URLs, outlink targets) the count table is itself
    corpus-sized and the "find the top hosts" monitoring query shuffles
    every distinct key. MG bounds the kept state to ``capacity`` entries
    per partition with the classic guarantee: any key whose count within a
    partition exceeds ``n_p / (capacity + 1)`` survives that partition's
    summary, so the union over partitions is a superset of every key with
    global count > N / (capacity + 1). That superset is what the exact
    second pass in :func:`heavy_hitters` counts.

    The summary *content* is stream-order-dependent (inherent to MG);
    downstream exactness does not rely on it — see the certification rule
    in :func:`heavy_hitters`.
    """
    import pandas as pd

    keyed = df.select(F.expr(key_expr).cast("string").alias("k"))

    def mg(batches):
        counts: dict = {}
        for pdf in batches:
            for key in pdf["k"]:
                if key is None:
                    continue
                if key in counts:
                    counts[key] += 1
                elif len(counts) < capacity:
                    counts[key] = 1
                else:
                    dead = []
                    for kk in counts:
                        counts[kk] -= 1
                        if counts[kk] == 0:
                            dead.append(kk)
                    for kk in dead:
                        del counts[kk]
        yield pd.DataFrame({"k": list(counts.keys())})

    return keyed.mapInPandas(mg, "k string")


def heavy_hitters(
    df: DataFrame,
    key_expr: str,
    k: int,
    capacity: int = 4096,
) -> DataFrame:
    """Exact top-``k`` keys by frequency without ever shuffling the full
    distinct-key table, with a self-certifying exactness flag.

    Two passes over the input, both scan-shaped:

    1. candidate generation — :func:`mg_candidates`, at most
       ``partitions * capacity`` rows total (driver-known bounded, so the
       candidate set broadcasts);
    2. exact verification — broadcast semi-join of the corpus against the
       candidates, then ``groupBy(key).count()`` over *candidate rows
       only* (map-side combined; the shuffle carries at most the candidate
       keys, never the corpus's distinct-key set).

    Output: ``(k, n_exact, rank, certified)`` for ranks 1..k, ordered by
    ``(n_exact desc, k asc)`` — the tie-break makes the output
    deterministic and engine-portable. ``certified`` is one boolean for
    the whole result: true iff exactly ``k`` rows were returned AND the
    k-th selected exact count strictly exceeds ``N / (capacity + 1)``, in
    which case MG's superset guarantee proves no non-candidate key can
    outrank the selection — the top-k is exact *and* independent of
    partitioning/stream order. Fewer than ``k`` surviving candidates never
    certify: a key the summaries dropped (count <= N/(capacity+1)) could
    legitimately hold one of the unfilled ranks. When false the result is
    best-effort (capacity was too small for this skew profile); callers
    that need certainty re-run with a larger capacity.

    The final ranking window orders a candidate-sized frame (bounded by
    construction) — the corpus itself is never globally sorted.
    """
    cand = mg_candidates(df, key_expr, capacity).distinct()
    keyed = df.select(F.expr(key_expr).cast("string").alias("k")).where(
        F.col("k").isNotNull()
    )
    exact = (
        keyed.join(F.broadcast(cand), "k")
        .groupBy("k")
        .agg(F.count("*").alias("n_exact"))
    )
    w = Window.orderBy(F.desc("n_exact"), F.asc("k"))
    topk = (
        exact.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )
    total = keyed.agg(F.count("*").alias("_n_total"))
    w_all = Window.partitionBy(F.lit(1))
    return (
        topk.crossJoin(F.broadcast(total))
        .withColumn(
            "certified",
            (F.count("*").over(w_all) == k)
            & (
                F.min("n_exact").over(w_all) * (capacity + 1)
                > F.col("_n_total")
            ),
        )
        .drop("_n_total")
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------
# The frequency-estimation counterpart of the HLL above and the MG pass in
# heavy_hitters: "how often does THIS key occur" for keys you name later,
# from state that is depth*width counters regardless of corpus size. In the
# crawl/curation engine that is the per-wave shape for term-frequency,
# outlink-target, and host-hit monitoring where the distinct-key table is
# itself corpus-sized but the queries arrive after the scan is gone.
#
# Deterministic and engine-portable by construction: the d row-hashes are
# the engine-wide md5 hash60 with a per-row tag ('cms{r}|' prefix), counters
# are exact BIGINTs (groupBy count, merge is groupBy sum — commutative
# monoid like the HLL registers and the Bloom sidecar), and the estimate is
# a min over integers. No floats anywhere, so partitioning, stream order,
# and engine cannot change a single output value. Standard CMS guarantee:
# est >= true count always; est <= true + eps*N with prob 1-delta for
# width = ceil(e/eps), depth = ceil(ln(1/delta)).

CMS_DEPTH = 4
CMS_WIDTH = 2048


def cms_bucket_expr(key_col: str, row: int, width: int = CMS_WIDTH) -> str:
    """Bucket index of ``key_col`` in sketch row ``row`` — hash60 of the
    row-tagged key, modulo ``width`` (hash60 is non-negative, plain ``%``
    is safe and matches the DuckDB oracle)."""
    tagged = f"concat('cms{row}|', {key_col})"
    return f"{_hash60(tagged)} % {width}"


def _cms_probes(keyed: DataFrame, depth: int, width: int) -> DataFrame:
    """``(k, row, bucket)`` — one probe row per key occurrence per hash row."""
    return keyed.select(
        "k",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        F.expr(cms_bucket_expr("k", r, width))
                        .cast("int")
                        .alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("k", "rb.row", "rb.bucket")


def cms_build(
    df: DataFrame,
    key_expr: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch: ``(row, bucket, cnt)``, at most ``depth * width``
    rows. One groupBy with map-side combine — the shuffle carries bounded
    counter rows, never the corpus's distinct keys. NULL keys are dropped
    (same contract as heavy_hitters)."""
    keyed = df.select(F.expr(key_expr).cast("string").alias("k")).where(
        F.col("k").isNotNull()
    )
    return (
        _cms_probes(keyed, depth, width)
        .groupBy("row", "bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Elementwise-sum merge: build(X) ⊎ build(Y) == build(X ∪ Y) exactly,
    so per-wave sketches compose without rescanning history."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "k",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point queries: ``(k, cms_count)`` for each distinct key in ``keys``.

    The sketch is depth*width rows by construction — always the broadcast
    side; probe rows are |keys| * depth. A bucket the sketch never touched
    counts 0 (left join + coalesce), so never-seen keys estimate 0."""
    probes = _cms_probes(
        keys.select(F.col(key_col).cast("string").alias("k"))
        .where(F.col("k").isNotNull())
        .distinct(),
        depth,
        width,
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("k")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("cms_count")
        )
    )
