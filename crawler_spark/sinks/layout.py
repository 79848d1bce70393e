"""Z-order (Morton) multi-column layout keys + a file-skipping report.

Why this belongs in a 100 TB crawl/curation engine: at that scale the
dominant cost of every downstream query is the scan, and Parquet/Iceberg
readers skip whole files and row groups from min/max footer stats — but
stats only prune when the *layout clusters* the filtered columns. Sorting
by one column prunes that one column; interleaving the bits of k
bucketized columns (Morton / Z-order) gives every interleaved column
locality at once, so multi-predicate reads (host AND doc length AND
date) prune files on all of them. This is the mechanism behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``, re-expressed as pure column math +
one ``repartitionByRange`` (the shuffle IS the layout being built — there
is no extra one).

Determinism/exactness contract (the house rules):

- per-dimension bucket boundaries are *equi-depth* thresholds taken from
  the DDSketch-style quantile sketch (``sketch.qsk_*``) — exact-integer
  counters, value = bucket lower bound, so the thresholds are
  bit-reproducible across engines and across partitionings;
- the sketch collapses to <= 53k+1 counter rows before the one-row
  collect, so the driver never sees data, only ~2^bits literal doubles
  per dimension (driver-known small, like the IVF centroid tables);
- bucketize is an unrolled literal-comparison sum and the Morton
  interleave is unrolled shift/AND arithmetic — zero joins, zero
  Exchange, whole-stage-codegen'd; the DuckDB oracle replays the same
  integer expressions term for term.

The reference has no storage layer at all (results live in one Python
dict, `/root/reference/crawler/enhanced_crawler.py:290-301`); this module
is part of the engine's scale surface, not reference parity.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.operators.sketch import QSK_SUBBUCKETS, qsk_build, qsk_quantiles

# (name, value_expr) pairs; the expr must be numeric (cast to double for
# threshold comparison) and SHOULD be non-negative — qsk clamps negatives
# into bucket 0, so negative values all land in z-bucket 0.
Dims = Sequence[Tuple[str, str]]


def dim_thresholds(
    df: DataFrame, value_expr: str, bits: int, k: int = QSK_SUBBUCKETS
) -> List[float]:
    """``2^bits - 1`` equi-depth thresholds for one dimension: the
    sketched ``i / 2^bits`` quantiles (bucket lower bounds — exact
    doubles) for i = 1 .. 2^bits - 1.

    One bounded-shuffle sketch pass; the collect moves exactly one row.
    Skewed dimensions may repeat a threshold — buckets then collapse,
    which only *wastes* key bits, never misorders them. Empty input
    yields all-zero thresholds (every row would key to bucket
    ``2^bits - 1``; vacuous on no rows).
    """
    den = 1 << bits
    qs = tuple((f"t{i}", i, den) for i in range(1, den))
    rows = qsk_quantiles(qsk_build(df, [], value_expr, k), [], qs=qs, k=k).collect()
    if not rows:
        return [0.0] * (den - 1)
    r = rows[0].asDict()
    return [float(r[f"t{i}"] if r[f"t{i}"] is not None else 0.0) for i in range(1, den)]


def bucket_count_expr(value_expr: str, thresholds: Sequence[float]) -> str:
    """Equi-depth bucket id of ``value_expr``: the count of thresholds at
    or below the value — no join against a boundary table. NULL values
    compare false at every node and land in bucket 0.

    Emitted as a binary-search CASE tree (``bits`` comparisons per
    evaluation) rather than a literal-comparison sum: downstream key
    expressions (Morton bits, the Hilbert walk) reference the bucket
    many times and Spark's codegen re-evaluates a projected column per
    reference — a linear 2^bits-term sum measured 10x slower through the
    interleave than this tree (BENCH.md, round-3 tenth wave)."""
    v = f"cast({value_expr} as double)"

    def tree(lo: int, hi: int) -> str:
        # bucket given thresholds[:lo] <= value and thresholds[hi:] > it
        if lo >= hi:
            return str(lo)
        mid = (lo + hi) // 2
        return (
            f"(CASE WHEN {v} >= {thresholds[mid]!r} "
            f"THEN {tree(mid + 1, hi)} ELSE {tree(lo, mid)} END)"
        )

    return f"cast({tree(0, len(thresholds))} as bigint)"


def morton_expr(bucket_cols: Sequence[str], bits: int) -> str:
    """Morton interleave of ``len(bucket_cols)`` bucket ids of ``bits``
    bits each: output bit ``i*D + (D-1-j)`` is bit ``i`` of column ``j``,
    so earlier columns take the more significant bit of each group.
    Unrolled shift/AND/multiply arithmetic — exact BIGINT everywhere
    (``bits * D`` <= 30 in any sane layout), identical in DuckDB with
    ``>>``/``&``."""
    d = len(bucket_cols)
    terms = []
    for i in range(bits - 1, -1, -1):
        for j, c in enumerate(bucket_cols):
            pos = i * d + (d - 1 - j)
            terms.append(f"((shiftright({c}, {i}) & 1) * cast({1 << pos} as bigint))")
    return "(" + " + ".join(terms) + ")"


def _qsk_lower_bound(qbucket: int, k: int) -> float:
    """Python replica of ``sketch.qsk_value_expr`` — (k + sub) and
    2^octave are exact, the divide is by a power of two, so the double
    is bit-identical to the SQL expression's."""
    if qbucket == 0:
        return 0.0
    return float(k + (qbucket - 1) % k) * 2.0 ** ((qbucket - 1) // k) / k


def dims_thresholds(
    df: DataFrame, dims: Dims, bits: int, k: int = QSK_SUBBUCKETS
) -> Dict[str, List[float]]:
    """Every dimension's thresholds from ONE corpus scan: each row stacks
    into ``(dim, value)`` pairs, one (dim, bucket) sketch groupBy carries
    ``n_dims * (53k+1)`` counter rows. The rank pick then runs on the
    DRIVER over those collected counters — planning the 2^bits-agg
    quantile expression in Catalyst measured ~10 s of pure serial driver
    time at any data size, while the counter table is a few hundred rows
    (the same driver-side-over-bounded-rows pattern as the IVF centroid
    tables). The pick replays ``qsk_quantiles``' integer cross-multiply
    rule and ``qsk_value_expr``'s lower-bound double exactly — identical
    values to per-dim ``dim_thresholds`` (asserted in tests, which keeps
    the python pick pinned against the SQL pick)."""
    den = 1 << bits
    stacked = df.select(
        F.expr(
            f"stack({len(dims)}, "
            + ", ".join(f"'{n}', cast({e} as bigint)" for n, e in dims)
            + ") as (_dim, _v)"
        )
    )
    counters = qsk_build(stacked, ["_dim"], "_v", k).collect()
    per_dim: Dict[str, List] = {}
    for r in counters:
        per_dim.setdefault(r["_dim"], []).append((r["qbucket"], r["cnt"]))
    th = {}
    for name, _ in dims:
        buckets = sorted(per_dim.get(name, []))
        n = sum(c for _, c in buckets)
        picks = []
        for i in range(1, den):
            val = 0.0
            cum = 0
            for qb, c in buckets:
                cum += c
                if cum * den >= n * i:
                    val = _qsk_lower_bound(qb, k)
                    break
            picks.append(val)
        th[name] = picks
    return th


def zorder_keys(
    df: DataFrame, dims: Dims, bits: int = 6, k: int = QSK_SUBBUCKETS
) -> Tuple[DataFrame, Dict[str, List[float]]]:
    """Add per-dimension bucket columns ``zb_<name>`` and the interleaved
    ``zkey`` column. Returns ``(keyed_df, thresholds_by_dim)`` — pass the
    thresholds to key another frame identically (e.g. the next crawl
    wave) via ``zorder_keys_with``. Thresholds for all dims come from a
    single scan (``dims_thresholds``)."""
    th = dims_thresholds(df, dims, bits, k)
    return zorder_keys_with(df, dims, th, bits), th


def zorder_keys_with(
    df: DataFrame, dims: Dims, thresholds: Dict[str, List[float]], bits: int = 6
) -> DataFrame:
    """Key ``df`` with precomputed thresholds (zero actions, zero
    shuffles — a pure projection)."""
    out = df
    for name, expr in dims:
        out = out.withColumn(f"zb_{name}", F.expr(bucket_count_expr(expr, thresholds[name])))
    zk = morton_expr([f"zb_{name}" for name, _ in dims], bits)
    return out.withColumn("zkey", F.expr(zk))


def _stat_aggs(dims: Dims):
    """Footer-stat agg list shared by the model report and the
    real-written-file reader: row count + min/max of every dim value."""
    aggs = [F.count("*").cast("bigint").alias("n_rows")]
    for name, expr in dims:
        v = f"cast({expr} as double)"
        aggs.append(F.min(F.expr(v)).alias(f"min_{name}"))
        aggs.append(F.max(F.expr(v)).alias(f"max_{name}"))
    return aggs


def hilbert_keys_with(
    df: DataFrame,
    dims: Dims,
    thresholds: Dict[str, List[float]],
    bits: int = 6,
    out_col: str = "hkey",
) -> DataFrame:
    """Hilbert-curve key over exactly two bucketized dimensions (the
    curve Delta's OPTIMIZE clusters by): unlike Morton, consecutive keys
    are always grid neighbors, so a key-range file holds a tighter box
    of the value space — measurably fewer files scanned for 2-D range
    predicates (asserted in tests against the Morton layout).

    The classic per-level rotate/reflect walk (s = 2^i descending) is
    unrolled into ``bits`` integer CASE/shift column updates — exact
    BIGINT arithmetic end to end, replayed level-for-level by the DuckDB
    oracle. Two dims only (the standard 2-D curve); use Morton for
    higher dimensionality."""
    if len(dims) != 2:
        raise ValueError("hilbert_keys_with is 2-D; use zorder keys for "
                         f"{len(dims)} dims")
    out = df
    for name, expr in dims:
        out = out.withColumn(
            f"zb_{name}", F.expr(bucket_count_expr(expr, thresholds[name]))
        )
    n = 1 << bits
    out = (
        out.withColumn("_hx", F.col(f"zb_{dims[0][0]}"))
        .withColumn("_hy", F.col(f"zb_{dims[1][0]}"))
        .withColumn("_hd", F.lit(0).cast("bigint"))
    )
    for i in range(bits - 1, -1, -1):
        s2 = 1 << (2 * i)
        rx = f"((shiftright(_hx, {i}) & 1))"
        ry = f"((shiftright(_hy, {i}) & 1))"
        quad = (
            f"(CASE WHEN {rx} = 1 AND {ry} = 1 THEN 2 "
            f"WHEN {rx} = 1 THEN 3 WHEN {ry} = 1 THEN 1 ELSE 0 END)"
        )
        nx = (
            f"CASE WHEN {ry} = 0 THEN "
            f"(CASE WHEN {rx} = 1 THEN {n - 1} - _hy ELSE _hy END) "
            f"ELSE _hx END"
        )
        ny = (
            f"CASE WHEN {ry} = 0 THEN "
            f"(CASE WHEN {rx} = 1 THEN {n - 1} - _hx ELSE _hx END) "
            f"ELSE _hy END"
        )
        out = (
            out.withColumn(
                "_hd",
                F.expr(f"_hd + cast({s2} as bigint) * {quad}"),
            )
            .withColumn("_nx", F.expr(nx))
            .withColumn("_ny", F.expr(ny))
            .withColumn("_hx", F.col("_nx"))
            .withColumn("_hy", F.col("_ny"))
            .drop("_nx", "_ny")
        )
    return out.withColumn(out_col, F.col("_hd")).drop("_hx", "_hy", "_hd")


def hilbert_keys(
    df: DataFrame, dims: Dims, bits: int = 6, k: int = QSK_SUBBUCKETS
) -> Tuple[DataFrame, Dict[str, List[float]]]:
    """`zorder_keys`' Hilbert twin: one-scan batched thresholds, then the
    unrolled curve walk. Returns ``(keyed_df, thresholds_by_dim)``."""
    th = dims_thresholds(df, dims, bits, k)
    return hilbert_keys_with(df, dims, th, bits), th


def layout_report(
    keyed: DataFrame, dims: Dims, n_files: int, bits: int, key_col: str = "zkey"
) -> DataFrame:
    """Model the written layout's footer stats: file id = ``zkey div
    ceil(keyspace / n_files)`` (what range-partitioning the keyspace
    evenly produces), then per-file row count and min/max of every
    dimension VALUE — exactly the stats a Parquet/Iceberg reader prunes
    with. One groupBy to ``n_files`` rows."""
    keyspace = 1 << (bits * len(dims))
    per = -(-keyspace // n_files)
    return (
        keyed.withColumn("file_id", F.expr(f"cast({key_col} div {per} as bigint)"))
        .groupBy("file_id")
        .agg(*_stat_aggs(dims))
    )


def scan_flags(
    report: DataFrame, predicates: Sequence[Tuple[str, float, float]]
) -> DataFrame:
    """Mark which model files a conjunctive range scan must read:
    ``scanned`` is true iff every ``(dim, lo, hi)`` interval intersects
    the file's [min, max] — the reader's footer-pruning decision,
    evaluated on the report rows (n_files of them, never the corpus)."""
    cond = F.lit(True)
    for name, lo, hi in predicates:
        cond = cond & (F.col(f"max_{name}") >= float(lo)) & (
            F.col(f"min_{name}") <= float(hi)
        )
    return report.withColumn("scanned", cond)


def write_zordered(
    df: DataFrame,
    path: str,
    dims: Dims,
    bits: int = 6,
    n_files: int = 16,
    mode: str = "overwrite",
    curve: str = "morton",
) -> Dict[str, List[float]]:
    """Write ``df`` curve-clustered: key, range-repartition on the key
    (the only shuffle — it IS the clustering), sort within each file so
    row groups inherit the locality too, drop the helper columns, write
    parquet. ``curve='morton'`` (any dimensionality) or ``'hilbert'``
    (2-D, tighter boxes). Returns the thresholds for keying future
    appends the same way.

    Note Spark's range partitioner samples the key column to pick file
    boundaries, so the file *split points* are not part of the
    determinism contract — the row->key mapping and the total content
    are (asserted in tests); the skipping REPORT above uses the even
    keyspace split instead for exact cross-engine replay."""
    if curve == "morton":
        keyed, th = zorder_keys(df, dims, bits)
        key = "zkey"
    elif curve == "hilbert":
        keyed, th = hilbert_keys(df, dims, bits)
        key = "hkey"
    else:
        raise ValueError(f"unknown curve: {curve!r}")
    helper = [f"zb_{name}" for name, _ in dims]
    (
        keyed.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .drop(*helper)
        .write.mode(mode)
        .parquet(path)
    )
    return th


def written_file_stats(spark, path: str, stat_exprs: Dims) -> DataFrame:
    """Per actual written file min/max stats, read back from the data
    itself (``input_file_name`` grouping) — lets tests assert the real
    layout prunes like the model says it should."""
    df = spark.read.parquet(path).withColumn("_file", F.input_file_name())
    return df.groupBy("_file").agg(*_stat_aggs(stat_exprs))


def read_pruned(
    spark,
    path: str,
    predicates: Sequence[Tuple[str, str, float, float]],
    stats: Optional[DataFrame] = None,
):
    """Read only the files a conjunctive range scan needs: file-LIST
    pruning from footer-style stats, above and before Spark's own
    row-group pruning. Each predicate is ``(name, value_expr, lo, hi)``.

    The reader half of ``write_zordered``: per-file min/max (computed
    once via ``written_file_stats`` and reusable via ``stats`` — persist
    it as a manifest sidecar for repeated queries), the prune decision
    on those n_files rows, then a parquet read of the surviving file
    list with the RESIDUAL filter applied (file stats admit a superset;
    the filter is the authority — equality with the full scan is
    asserted in tests). Returns ``(df, n_scanned, n_total)``.

    At 100 TB this is the manifest-level pruning an Iceberg reader does
    from its metadata tree, expressed over plain parquet directories."""
    dims = [(name, expr) for name, expr, _, _ in predicates]
    st = stats if stats is not None else written_file_stats(spark, path, dims)
    flagged = scan_flags(
        st, [(name, lo, hi) for name, _, lo, hi in predicates]
    )
    rows = flagged.select("_file", "scanned").collect()
    keep = [r._file for r in rows if r.scanned]
    cond = " AND ".join(
        f"(cast({expr} as double) >= {float(lo)!r} "
        f"AND cast({expr} as double) <= {float(hi)!r})"
        for _, expr, lo, hi in predicates
    )
    if not keep:
        return (
            spark.read.parquet(path).where(F.expr(cond)).limit(0),
            0,
            len(rows),
        )
    return spark.read.parquet(*keep).where(F.expr(cond)), len(keep), len(rows)


def layout_health(stats: DataFrame, dims: Dims) -> DataFrame:
    """Clustering-quality report over a stats table (model or real): per
    dimension, the mean and max file span as a fraction of the global
    value range — 1/n_files-ish when perfectly clustered, ~1.0 when every
    file spans the whole dimension (the OPTIMIZE trigger signal: track
    it across appended waves and recluster when it degrades past a
    threshold). One aggregate over n_files rows; output one row per
    dimension ``(dim, n_files, mean_span_frac, max_span_frac)``, spans
    rounded to 6 decimals, degenerate global range -> 0 spans."""
    outs = []
    for name, _ in dims:
        span = f"(max_{name} - min_{name})"
        outs.append(
            stats.agg(
                F.count("*").cast("bigint").alias("n_files"),
                F.min(f"min_{name}").alias("_glo"),
                F.max(f"max_{name}").alias("_ghi"),
                F.sum(F.expr(span)).alias("_spans"),
                F.max(F.expr(span)).alias("_maxspan"),
            ).select(
                F.lit(name).alias("dim"),
                "n_files",
                F.expr(
                    "round(CASE WHEN _ghi > _glo THEN "
                    "_spans / n_files / (_ghi - _glo) "
                    "ELSE cast(0.0 as double) END, 6)"
                ).alias("mean_span_frac"),
                F.expr(
                    "round(CASE WHEN _ghi > _glo THEN "
                    "_maxspan / (_ghi - _glo) "
                    "ELSE cast(0.0 as double) END, 6)"
                ).alias("max_span_frac"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
