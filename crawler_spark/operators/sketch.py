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


def hll_overlap(
    a: DataFrame, b: DataFrame, key_cols: list, p: int = HLL_P
) -> DataFrame:
    """Distinct-set overlap between two sketched populations, per key,
    without ever shuffling the values themselves: |A|, |B| and |A ∪ B|
    come from the two register tables and their elementwise-max merge,
    |A ∩ B| by inclusion-exclusion (clamped at 0 — the estimator can go
    slightly negative on near-disjoint sets), plus the Jaccard estimate
    ``∩ / ∪``.

    The crawl-scale use: overlap between two snapshots' URL-seen sets,
    shared vocabulary between two sources, eval-vs-train id leakage —
    each a 10^8+-distinct question answered by joining three
    ``groups * m``-row tables. Inclusion-exclusion inherits both
    sketches' error, so ``jaccard_est`` on small intersections is a
    signal, not a measurement (the exact twins are the anti-join /
    intersect operators); tests bound the error on known overlaps.

    Inputs are ``hll_registers`` outputs built with the same ``p`` and
    the same value domain. Keys present in only one side estimate the
    other side as empty (zero registers — the implicit-zero contract).
    Output: ``key_cols + (hll_s_a, hll_s_b, hll_s_union bigint,
    est_a, est_b, est_union, est_intersect, jaccard_est double)``.
    """

    def _est(regs: DataFrame, suffix: str) -> DataFrame:
        e = hll_estimate(regs, key_cols, p)
        return e.select(
            *key_cols,
            F.col("hll_s").alias(f"hll_s_{suffix}"),
            F.col("hll_est").alias(f"est_{suffix}"),
        )

    if p >= 10:
        # the empty-sketch anchor below is m * 2^_RANK_MAX = 2^(p+53),
        # which overflows BIGINT already at p = 10 (2^63 > 2^63-1) — the
        # fillna would wrap. All engine call sites use p <= 9; larger
        # register files belong to hll_estimate directly, not the
        # overlap anchor.
        raise ValueError(
            f"hll_overlap supports p <= 9 (empty-sketch anchor 2^(p+53) "
            f"must fit BIGINT); got p={p}"
        )
    ea = _est(a, "a")
    eb = _est(b, "b")
    eu = _est(hll_merge(a, b, key_cols), "union")
    m = 1 << p
    # a key absent from one side is an empty sketch there: est 0, exact
    # anchor = all-zero registers (m * 2^RANK_MAX)
    empty_s = m * (1 << _RANK_MAX)
    joined = (
        eu.join(ea, key_cols, "left")
        .join(eb, key_cols, "left")
        .fillna({"est_a": 0.0, "est_b": 0.0})
        .fillna({"hll_s_a": empty_s, "hll_s_b": empty_s})
    )
    inter = "greatest(est_a + est_b - est_union, cast(0.0 as double))"
    return joined.select(
        *key_cols,
        "hll_s_a",
        "hll_s_b",
        F.col("hll_s_union"),
        "est_a",
        "est_b",
        "est_union",
        F.expr(f"round({inter}, 6)").alias("est_intersect"),
        F.expr(
            f"round(CASE WHEN est_union > 0.0 THEN {inter} / est_union "
            f"ELSE cast(0.0 as double) END, 6)"
        ).alias("jaccard_est"),
    )


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


# ---------------------------------------------------------------------------
# Log-histogram quantile sketch (DDSketch-style buckets, exact-integer math)
# ---------------------------------------------------------------------------
# The order-statistics counterpart of the HLL / CMS / MG trio above: "what
# is the p50/p90/p99 of THIS per-document measure, per source" — document
# length, token count, quality-score-as-micros — without a per-key global
# sort. At 10^10 documents an exact percentile is a full shuffle + sort of
# the measure column per key; this sketch's state is at most
# 53 * QSK_SUBBUCKETS + 1 counter rows per key, mergeable across waves with
# a plain counter sum (the same commutative-monoid contract as the other
# sketches, so per-wave sketches compose without rescanning history).
#
# Bucketing (Masson et al. 2019's DDSketch idea, re-based to powers of two
# so every boundary is EXACT in both engines): a value v >= 1 lands in
# octave L = length(bin(v)) (v in [2^(L-1), 2^L)) and sub-bucket
# sub = floor(v * k / 2^(L-1)) - k in [0, k-1] — all BIGINT shifts, no
# float log. Bucket 0 holds v = 0 exactly. The reported quantile is the
# LOWER BOUND of the bucket containing the target rank:
#   lo = (k + sub) * 2^(L-1) / k
# which for power-of-two k is an exact double, and satisfies
#   lo <= true_quantile < lo * (1 + 1/k)
# i.e. a one-sided relative error of at most 1/k (12.5% at the default
# k = 8; callers needing 6% pass k = 16). Values are clamped to
# [0, 2^53) — the envelope where v * k stays a safe BIGINT and doubles
# are exact; per-document char/token/byte measures sit far inside it.
#
# Determinism: bucket indices, counters, cumulative ranks and the
# rank-selection rule (cum * den >= n * num, an integer cross-multiply —
# never a float ceil) are all integer; the only doubles are the final
# bucket lower bounds, computed from identical integers in both engines.

QSK_SUBBUCKETS = 8
QSK_VALUE_CAP = (1 << 53) - 1
#: default quantile set: (output column, numerator, denominator) — kept
#: rational so the target rank ceil(q * n) is the exact integer test
#: cum * den >= n * num.
QSK_DEFAULT_QS = (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))


def qsk_bucket_expr(value_col: str, k: int = QSK_SUBBUCKETS) -> str:
    """Bucket index of a non-negative BIGINT column. 0 for v <= 0, else
    ``(L-1)*k + sub + 1``. ``shiftright`` keeps the sub-bucket exact —
    dividing through a double would corrupt values above 2^53 (the same
    trap hll_rank_expr documents); the cap keeps ``v * k`` in BIGINT."""
    v = f"least(greatest(cast({value_col} as bigint), 0), {QSK_VALUE_CAP})"
    octave = f"length(bin({v}))"
    sub = f"shiftright({v} * {k}, {octave} - 1) - {k}"
    return (
        f"CASE WHEN {v} <= 0 THEN 0 "
        f"ELSE ({octave} - 1) * {k} + {sub} + 1 END"
    )


def qsk_value_expr(bucket_col: str, k: int = QSK_SUBBUCKETS) -> str:
    """Lower bound of bucket ``bucket_col`` as an exact double:
    ``(k + sub) * 2^(L-1) / k`` — (k + sub) <= 2k - 1 is exact, 2^(L-1)
    is exact for L <= 53, and dividing by a power-of-two k is exact."""
    octm1 = f"(({bucket_col} - 1) div {k})"
    sub = f"(({bucket_col} - 1) % {k})"
    return (
        f"CASE WHEN {bucket_col} = 0 THEN cast(0.0 as double) "
        f"ELSE cast({k} + {sub} as double) "
        f"* power(cast(2.0 as double), cast({octm1} as double)) / {k} END"
    )


def qsk_build(
    df: DataFrame,
    key_cols: list,
    value_expr: str,
    k: int = QSK_SUBBUCKETS,
) -> DataFrame:
    """Build the sketch: ``(key..., qbucket, cnt)``. One groupBy with
    map-side combine — the shuffle carries at most
    ``groups * (53 * k + 1)`` counter rows regardless of input size.
    NULL measures are dropped (same contract as the other sketches);
    negative measures clamp into bucket 0 with the zeros."""
    base = df.select(
        *key_cols, F.expr(value_expr).cast("bigint").alias("_v")
    ).where(F.col("_v").isNotNull())
    return (
        base.select(
            *key_cols,
            F.expr(qsk_bucket_expr("_v", k)).cast("int").alias("qbucket"),
        )
        .groupBy(*key_cols, "qbucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def qsk_merge(a: DataFrame, b: DataFrame, key_cols: list) -> DataFrame:
    """Counter-sum merge: build(X) ⊎ build(Y) == build(X ∪ Y) exactly."""
    return (
        a.unionByName(b)
        .groupBy(*key_cols, "qbucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def qsk_quantiles(
    sketch: DataFrame,
    key_cols: list,
    qs=QSK_DEFAULT_QS,
    k: int = QSK_SUBBUCKETS,
) -> DataFrame:
    """Per-key quantile estimates: ``(key..., n, <label>...)`` with one
    double column per requested quantile (the bucket lower bound — an
    under-estimate by at most a factor 1 + 1/k).

    The rank scan windows over PER-KEY BUCKET ROWS (<= 53k + 1 of them),
    never corpus rows, so the "window per key" shape that is a skew trap
    on documents is safe here by construction. Quantile q = num/den picks
    the bucket holding the ceil(q * n)-th smallest value via the integer
    cross-multiply ``cum * den >= n * num``."""
    wp = Window.partitionBy(*key_cols)
    wc = wp.orderBy("qbucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = sketch.withColumn("_cum", F.sum("cnt").over(wc)).withColumn(
        "_n", F.sum("cnt").over(wp)
    )
    val = F.expr(qsk_value_expr("qbucket", k))
    return cum.groupBy(*key_cols).agg(
        F.max("_n").cast("bigint").alias("n"),
        *[
            F.min(
                F.when(
                    F.col("_cum") * F.lit(den) >= F.col("_n") * F.lit(num),
                    val,
                )
            ).alias(label)
            for label, num, den in qs
        ],
    )


def qsk_threshold_filter(
    df: DataFrame,
    key_cols: list,
    value_expr: str,
    num: int,
    den: int,
    k: int = QSK_SUBBUCKETS,
) -> DataFrame:
    """Keep rows whose measure is >= their key's sketched q = num/den
    quantile — the scale path for "top (1-q) fraction per source" gates
    (e.g. drop the shortest half per host). The exact counterpart is a
    per-key rank window over the CORPUS (one reducer per hot key); this
    path is sketch (bounded shuffle) + threshold broadcast join + scan
    filter, so no corpus-sized shuffle at all.

    The threshold is the sketch's bucket lower bound, so the kept set is
    a superset of the exact top-(1-q) cut by at most one bucket's worth
    of relative slack (1/k). Deterministic: same input -> same threshold
    -> same survivors, regardless of partitioning."""
    th = qsk_quantiles(
        qsk_build(df, key_cols, value_expr, k),
        key_cols,
        qs=(("_qsk_th", num, den),),
        k=k,
    ).select(*key_cols, "_qsk_th")
    return (
        df.join(F.broadcast(th), key_cols, "left")
        .where(
            F.expr(value_expr).cast("double")
            >= F.coalesce(F.col("_qsk_th"), F.lit(0.0))
        )
        .drop("_qsk_th")
    )
