"""Deterministic token-balanced training-shard assignment and writer —
the last stage of a pretraining-data pipeline (pack -> SHARD -> feed the
trainer).

Trainers consume a corpus as a fixed set of shards with roughly equal
token counts: balanced shards mean balanced data-loader workers, and a
deterministic doc->shard mapping means a re-run of the pipeline
reproduces byte-identical shards (the property every ablation
comparison silently relies on). The reference repo stops at export;
this sink is the scale-path continuation of the packing operators in
``operators/sampling.py``.

Shard rule: order documents by the deterministic total order
``(pri mod groups, pri, id)`` where ``pri`` is the engine-wide 60-bit
md5 id hash (the same priority the budget sampler and packers use) —
a hash-shuffled order, so consecutive documents are an unbiased corpus
sample — take the exclusive running token sum in that order, and assign
``shard = cum_tokens div tokens_per_shard``. Every shard is a contiguous
token block of that shuffled order: balanced to within one document's
tokens, independent of input partitioning, and stable under re-runs with
the same ``(tokens_per_shard, groups)`` config.

Scale shape (the interesting part): a single global running sum would be
one reducer. Instead the classic two-level distributed prefix sum: the
leading ``pmod(pri, groups)`` term makes each segment a window-partition
key (hash-derived, so segments are balanced), within-segment running
sums get ``groups``-way window parallelism, and each segment is offset
by the exclusive prefix of the segment totals — a ``groups``-sized frame
whose window runs in one tiny task and broadcasts back. Total cost: one shuffle on the segment key plus
a broadcast join; no corpus-sized global sort, no single-reducer window.
The division is integer ``div`` on BIGINTs, exact past 2^53 tokens where
double division would start mis-assigning boundary documents.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import _hash60, tokens_expr
from crawler_spark.operators.sampling import _priority_expr


def token_balanced_shards(
    docs: DataFrame,
    tokens_per_shard: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str = "ws_tokens",
    groups: int = 64,
) -> DataFrame:
    """Assign every document a deterministic ``shard`` (int, dense from 0)
    so that shards hold contiguous ~``tokens_per_shard`` blocks of the
    hash-ordered corpus.

    Output: input rows + ``n_tokens`` (bigint; computed from ``text_col``
    when ``tokens_col`` is absent) and ``shard``. Deterministic and
    partition-invariant: the assignment depends only on ids and token
    counts, never on physical layout.
    """
    if tokens_col not in docs.columns:
        docs = docs.withColumn(
            tokens_col, F.expr(f"size({tokens_expr(text_col)})")
        )
    docs = (
        docs.withColumn("n_tokens", F.col(tokens_col).cast("long"))
        .withColumn("_pri", F.expr(_priority_expr(id_col)))
        .withColumn("_g", F.pmod(F.col("_pri"), F.lit(groups)).cast("int"))
    )
    w_in = Window.partitionBy("_g").orderBy("_pri", id_col)
    docs = docs.withColumn(
        "_cum_in",
        F.coalesce(
            F.sum("n_tokens").over(
                w_in.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    # segment-total prefix offsets: a `groups`-sized frame — the one
    # unpartitioned window in this plan runs over <= `groups` rows
    w_g = Window.orderBy("_g")
    offsets = (
        docs.groupBy("_g")
        .agg(F.sum("n_tokens").alias("_g_tokens"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_g_tokens").over(
                    w_g.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_g", "_offset")
    )
    return (
        docs.join(F.broadcast(offsets), "_g")
        .withColumn(
            "shard",
            F.expr(
                f"cast((_offset + _cum_in) div {int(tokens_per_shard)} as int)"
            ),
        )
        .drop("_pri", "_g", "_cum_in", "_offset")
    )


def shard_manifest(sharded: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-shard manifest: ``(shard, n_docs, n_tokens, id_checksum)``.

    ``id_checksum`` is the BIGINT XOR of each member's 60-bit id hash —
    order-free and overflow-free at any shard size (a plain sum of 60-bit
    hashes overflows BIGINT past ~16 members under ANSI arithmetic), so
    two shard sets are content-identical iff their manifests match
    row-for-row (the integrity check a resumed or re-sharded pipeline
    compares before trusting existing output). Ids are unique within a
    shard, so XOR's pair-cancellation blind spot cannot fire.
    """
    return (
        sharded.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.expr(
                f"bit_xor({_hash60(f'cast({id_col} as string)')})"
            ).alias("id_checksum"),
        )
        .orderBy("shard")
    )


def write_shards(
    sharded: DataFrame,
    path: str,
    id_col: str = "doc_id",
    fmt: str = "parquet",
) -> DataFrame:
    """Materialize assigned shards as ``{path}/shards/shard=N/`` files
    plus a ``{path}/manifest/`` parquet, and return the manifest.

    ``fmt`` is ``parquet`` (default) or ``json`` — JSONL is the lingua
    franca trainer ingest format; the manifest stays parquet either way
    (it is the integrity contract, not training data).

    ``repartitionByRange`` on the shard id lines partitions up with shard
    boundaries so each shard directory lands as one file in the common
    case (a directory may still split when a shard outgrows a task — the
    manifest, not the file count, is the contract). The shard count read
    back for the range partitioner is a driver-known scalar (same
    decide-from-a-count pattern as the frontier's broadcast decisions).
    """
    if fmt not in ("parquet", "json"):
        raise ValueError(f"unsupported shard format: {fmt!r}")
    n_shards = sharded.agg(F.max("shard")).first()[0]
    n_shards = int(n_shards) + 1 if n_shards is not None else 1
    (
        sharded.repartitionByRange(n_shards, "shard", id_col)
        .write.partitionBy("shard")
        .mode("overwrite")
        .format(fmt)
        .save(os.path.join(path, "shards"))
    )
    manifest = shard_manifest(sharded, id_col)
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "manifest")
    )
    return manifest
