"""Partitioned Bloom-filter sidecar for the URL-seen set (north_rule §2.11).

The 10^10-URL frontier cannot afford a full shuffle of every candidate link
against the seen table each wave. This sidecar keys the ``xxhash64(url)``
space into ``n_buckets`` hash buckets, each holding a fixed-size Bloom
bitarray blob. Candidates are probed vectorized (numpy over Arrow batches);
definite misses — the overwhelming majority of links on a growing crawl —
skip the exact anti-join entirely. Bloom positives still go through the
exact ``left_anti`` join, which remains the authority, so false positives
never drop URLs and false negatives are structurally impossible (every
inserted hash sets its bits before the wave commits).

Scale design:
- build: one ``applyInPandas`` pass over the wave's seen hashes grouped by
  bucket — shuffle size = 8 bytes/url, never the url strings.
- merge: blobs OR per bucket (waves accumulate monotonically).
- probe: cogrouped ``applyInPandas`` (candidates × blobs per bucket) — the
  blob set is ``n_buckets × m_bits/8`` bytes total and stays partitioned;
  nothing is broadcast, so sizing to 10^10 urls (e.g. 4096 buckets × 256 MiB
  bits at 10 bits/url) only changes config numbers, not the plan shape.
- no wall-clock, no randomness: bit positions derive from the url_hash via
  double hashing, so blobs are byte-identical at any parallelism.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOB_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("bits", T.BinaryType()),
        T.StructField("n_items", T.LongType()),
    ]
)

_PROBE_SCHEMA = T.StructType([T.StructField("url_hash", T.LongType(), False)])


@dataclass(frozen=True)
class BloomConfig:
    """Sizing. Defaults suit the sandbox corpus; at 10^10 urls use e.g.
    n_buckets=4096, m_bits=2**31 (≈0.9% FP at 10 bits/url)."""

    n_buckets: int = 64
    m_bits: int = 1 << 16  # bits per bucket blob (power of two)
    n_hashes: int = 5

    def bucket_col(self, hash_col) -> F.Column:
        return F.pmod(hash_col, F.lit(self.n_buckets)).cast("int")


def _positions(hashes: np.ndarray, cfg: BloomConfig) -> Iterator[np.ndarray]:
    """Double-hashing bit positions for a uint64 hash array."""
    h = hashes.astype(np.uint64)
    m = np.uint64(cfg.m_bits)
    h1 = h % m
    h2 = ((h >> np.uint64(17)) | np.uint64(1)) % m
    for i in range(cfg.n_hashes):
        yield (h1 + np.uint64(i) * h2) % m


def _set_bits(bits: np.ndarray, hashes: np.ndarray, cfg: BloomConfig) -> None:
    for pos in _positions(hashes, cfg):
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)))


def _test_bits(bits: np.ndarray, hashes: np.ndarray, cfg: BloomConfig) -> np.ndarray:
    out = np.ones(len(hashes), dtype=bool)
    for pos in _positions(hashes, cfg):
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        mask = np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8))
        out &= (byte & mask) != 0
    return out


def build_blobs(hashes: DataFrame, cfg: BloomConfig) -> DataFrame:
    """``(url_hash long)`` -> blob rows, one per non-empty bucket."""
    bucketed = hashes.select(
        F.col("url_hash"), cfg.bucket_col(F.col("url_hash")).alias("bucket")
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(cfg.m_bits // 8, dtype=np.uint8)
        h = pdf["url_hash"].to_numpy()
        _set_bits(bits, h, cfg)
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "bits": [bits.tobytes()],
                "n_items": [len(h)],
            }
        )

    return bucketed.groupBy("bucket").applyInPandas(build, schema=BLOB_SCHEMA)


def merge_blobs(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-union two blob sets (monotone accumulation across waves)."""
    both = a.unionByName(b)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.frombuffer(pdf["bits"].iloc[0], dtype=np.uint8).copy()
        for blob in pdf["bits"].iloc[1:]:
            acc |= np.frombuffer(blob, dtype=np.uint8)
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "bits": [acc.tobytes()],
                "n_items": [int(pdf["n_items"].sum())],
            }
        )

    return both.groupBy("bucket").applyInPandas(merge, schema=BLOB_SCHEMA)


def probe_maybe_seen(
    candidates: DataFrame, blobs: DataFrame, cfg: BloomConfig
) -> DataFrame:
    """``(url_hash)`` candidates -> the subset that MIGHT be seen.

    Cogrouped per bucket: candidate hashes meet only their bucket's blob.
    A bucket with no blob returns nothing (definite miss). The complement
    (anti-join on the result) is guaranteed-unseen.
    """
    cand = candidates.select(
        F.col("url_hash"), cfg.bucket_col(F.col("url_hash")).alias("bucket")
    ).dropDuplicates(["url_hash"])

    def probe(cand_pdf: pd.DataFrame, blob_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(cand_pdf) == 0 or len(blob_pdf) == 0:
            return pd.DataFrame({"url_hash": pd.Series([], dtype="int64")})
        bits = np.frombuffer(blob_pdf["bits"].iloc[0], dtype=np.uint8)
        if len(blob_pdf) > 1:  # pre-merge safety: OR extra blobs
            bits = bits.copy()
            for blob in blob_pdf["bits"].iloc[1:]:
                bits |= np.frombuffer(blob, dtype=np.uint8)
        h = cand_pdf["url_hash"].to_numpy()
        hit = _test_bits(bits, h, cfg)
        return pd.DataFrame({"url_hash": h[hit]})

    return (
        cand.groupBy("bucket")
        .cogroup(blobs.groupBy("bucket"))
        .applyInPandas(probe, schema=_PROBE_SCHEMA)
    )


def split_by_bloom(
    candidates: DataFrame,
    blobs: DataFrame,
    cfg: BloomConfig,
    hash_col: str = "url_hash",
) -> Tuple[DataFrame, DataFrame]:
    """Split candidate rows into (definitely_new, maybe_seen) by Bloom probe.

    ``definitely_new`` rows can skip the exact seen anti-join; ``maybe_seen``
    rows must still be checked (Bloom false positives).
    """
    maybe = probe_maybe_seen(
        candidates.select(F.col(hash_col).alias("url_hash")), blobs, cfg
    ).withColumnRenamed("url_hash", hash_col)
    definite_new = candidates.join(maybe, hash_col, "left_anti")
    suspect = candidates.join(maybe, hash_col, "left_semi")
    return definite_new, suspect
