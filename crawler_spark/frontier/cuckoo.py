"""Partitioned cuckoo-filter sidecar for the URL-seen set (north_rule §2.11).

The Bloom sidecar (``bloom.py``) answers "maybe seen / definitely new" but
cannot forget: once a URL's bits are set they stay set, so a recrawl
schedule ("fetch this URL again next week") has to rebuild the whole
filter. A cuckoo filter (Fan et al. 2014, "Cuckoo Filter: Practically
Better Than Bloom") stores per-item FINGERPRINTS in a bucketed slot table,
which makes **deletion** a first-class operation — remove the fingerprint
and the URL probes as new again — while keeping Bloom-class space (~16
bits/url at 4 slots/bucket) and the same no-false-negative contract for
items currently in the set.

Same partitioned plan shape as the Bloom sidecar:
- build: ``applyInPandas`` over wave hashes grouped by shard — shuffle is
  8 bytes/url, never URL strings. Hashes are ``np.unique``-sorted inside
  each shard group before insertion, so the table bytes are byte-identical
  at any parallelism (pandas group row order is not deterministic; the
  sort makes it irrelevant).
- delete: cogrouped ``applyInPandas`` (tables × delete-hashes per shard);
  removes ONE fingerprint copy per deleted hash. Only delete hashes that
  were actually inserted — deleting a never-inserted hash can evict an
  unrelated item's identical fingerprint (the standard cuckoo-filter
  contract; the crawl only deletes from its own committed seen set).
- probe: cogrouped per shard, vectorized fingerprint compare against both
  candidate buckets — nothing is broadcast, so sizing to 10^10 urls
  (e.g. 4096 shards × 2^26 buckets × 4 slots) changes config numbers,
  not the plan shape.
- inserts use a bulk vectorized fast path (free-slot fill per bucket
  index) and fall back to the sequential kick loop only for the residue
  that collides; items that still fail after ``max_kicks`` go to an exact
  per-shard overflow list inside the blob, so false negatives stay
  structurally impossible even at pathological load factors.
- no wall-clock, no randomness: fingerprints/buckets derive from
  ``xxhash64(url)``; the kick victim is chosen by a deterministic rotation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("table", T.BinaryType()),     # uint16 slots, row-major
        T.StructField("overflow", T.BinaryType()),  # int64 hashes, exact
        # entries displaced during merge, packed (fp << 32) | bucket1 —
        # probed with the same (bucket, fingerprint) semantics as the table
        T.StructField("overflow_fp", T.BinaryType()),
        T.StructField("n_items", T.LongType()),
    ]
)

_PROBE_SCHEMA = T.StructType([T.StructField("url_hash", T.LongType(), False)])


@dataclass(frozen=True)
class CuckooConfig:
    """Sizing. Defaults suit the sandbox corpus; at 10^10 urls use e.g.
    n_shards=4096, n_buckets=1 << 22 (≈16.7M slots/shard at 4/bucket,
    ~0.95 load headroom, ~2 bytes/url)."""

    n_shards: int = 64
    n_buckets: int = 1 << 10   # cuckoo buckets per shard (power of two)
    slots_per_bucket: int = 4
    max_kicks: int = 500

    def shard_col(self, hash_col) -> F.Column:
        return F.pmod(hash_col, F.lit(self.n_shards)).cast("int")


def _fingerprints(h: np.ndarray) -> np.ndarray:
    """16-bit fingerprints from the hash high bits; 0 is reserved for
    'empty slot', so a 0 fingerprint is bumped to 1."""
    fp = ((h.astype(np.uint64) >> np.uint64(32)) & np.uint64(0xFFFF)).astype(
        np.uint16
    )
    fp[fp == 0] = 1
    return fp


def _bucket1(h: np.ndarray, cfg: CuckooConfig) -> np.ndarray:
    return (h.astype(np.uint64) & np.uint64(cfg.n_buckets - 1)).astype(np.int64)


def _alt_bucket(b: np.ndarray, fp: np.ndarray, cfg: CuckooConfig) -> np.ndarray:
    """Partial-key cuckoo hashing: i2 = i1 XOR hash(fp). XOR keeps the map
    involutive (i1 = i2 XOR hash(fp)), so either bucket recovers the other
    from the stored fingerprint alone."""
    mix = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(
        cfg.n_buckets - 1
    )
    return (b.astype(np.uint64) ^ mix).astype(np.int64)


def _bulk_fill(
    table: np.ndarray, buckets: np.ndarray, fps: np.ndarray, cfg: CuckooConfig
) -> np.ndarray:
    """Vectorized free-slot fill over a left-packed table (which building
    from empty produces): pair j lands in slot ``occupancy(bucket) +
    rank-of-j-within-its-bucket`` when that is still a valid slot index.
    Returns the mask of pairs that did NOT fit (the kick-loop residue).
    Deterministic: ranks follow the (sorted-hash) input order."""
    n = len(buckets)
    if n == 0:
        return np.zeros(0, dtype=bool)
    occ = (table[buckets] != 0).sum(axis=1)
    order = np.argsort(buckets, kind="stable")
    sb = buckets[order]
    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    new_run[1:] = sb[1:] != sb[:-1]
    run_start = np.maximum.accumulate(np.where(new_run, np.arange(n), 0))
    rank = np.arange(n) - run_start
    slots = occ[order] + rank
    fits = slots < cfg.slots_per_bucket
    table[sb[fits], slots[fits]] = fps[order[fits]]
    leftover = np.zeros(n, dtype=bool)
    leftover[order[~fits]] = True
    return leftover


def _insert_with_kicks(
    table: np.ndarray, b: int, fp: int, cfg: CuckooConfig
) -> bool:
    """Sequential cuckoo insert with deterministic eviction rotation."""
    cur_b, cur_fp = b, fp
    for kick in range(cfg.max_kicks):
        row = table[cur_b]
        free = np.nonzero(row == 0)[0]
        if len(free):
            row[free[0]] = cur_fp
            return True
        alt = int(
            _alt_bucket(np.array([cur_b]), np.array([cur_fp], np.uint16), cfg)[0]
        )
        arow = table[alt]
        afree = np.nonzero(arow == 0)[0]
        if len(afree):
            arow[afree[0]] = cur_fp
            return True
        # evict deterministically: slot rotates with the kick count
        slot = kick % cfg.slots_per_bucket
        victim = int(arow[slot])
        arow[slot] = cur_fp
        cur_b, cur_fp = int(
            _alt_bucket(np.array([alt]), np.array([victim], np.uint16), cfg)[0]
        ), victim
    return False


def _insert_all(
    table: np.ndarray, h: np.ndarray, cfg: CuckooConfig
) -> np.ndarray:
    """Insert hashes (already unique-sorted); returns hashes that
    overflowed. Bulk path first, kick loop for the residue."""
    fps = _fingerprints(h)
    b1 = _bucket1(h, cfg)
    leftover = _bulk_fill(table, b1, fps, cfg)
    over = []
    idx = np.nonzero(leftover)[0]
    for j in idx:
        if not _insert_with_kicks(table, int(b1[j]), int(fps[j]), cfg):
            over.append(int(h[j]))
    return np.array(over, dtype=np.int64)


def _lookup(table: np.ndarray, h: np.ndarray, cfg: CuckooConfig) -> np.ndarray:
    """Vectorized membership: fingerprint present in bucket1 or bucket2."""
    if len(h) == 0:
        return np.zeros(0, dtype=bool)
    fps = _fingerprints(h)
    b1 = _bucket1(h, cfg)
    b2 = _alt_bucket(b1, fps, cfg)
    return ((table[b1] == fps[:, None]).any(axis=1)) | (
        (table[b2] == fps[:, None]).any(axis=1)
    )


def build_tables(hashes: DataFrame, cfg: CuckooConfig) -> DataFrame:
    """``(url_hash long)`` -> table rows, one per non-empty shard."""
    sharded = hashes.select(
        F.col("url_hash"), cfg.shard_col(F.col("url_hash")).alias("shard")
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        table = np.zeros((cfg.n_buckets, cfg.slots_per_bucket), dtype=np.uint16)
        h = np.unique(pdf["url_hash"].to_numpy())  # sort => deterministic
        over = _insert_all(table, h, cfg)
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "table": [table.tobytes()],
                "overflow": [over.tobytes()],
                "overflow_fp": [b""],
                "n_items": [len(h)],
            }
        )

    return sharded.groupBy("shard").applyInPandas(build, schema=TABLE_SCHEMA)


def _pack_fp(bkt: int, fp: int) -> int:
    return (int(fp) << 32) | int(bkt)


def merge_tables(a: DataFrame, b: DataFrame, cfg: CuckooConfig) -> DataFrame:
    """Union two table sets per shard (waves accumulate, like
    ``bloom.merge_blobs``). Cuckoo tables cannot be OR-merged bit-wise;
    instead the merged table is REBUILT from both sides' stored entries —
    possible without the original hashes because partial-key hashing lets
    a (bucket, fingerprint) pair recover its alternate bucket. Entries are
    re-inserted in sorted (bucket, fp) order, so the merged bytes are
    deterministic regardless of which side each entry came from; the
    shuffle carries fixed-size table blobs, never the per-url hash stream.

    An entry that can no longer be placed after the merge (both of its
    buckets full) moves to ``overflow_fp`` packed as ``(fp << 32) |
    bucket1``; probes match it with the same (bucket, fingerprint)
    semantics as a table slot, so the no-false-negative contract survives
    (a displaced entry can add false positives, never misses). Size the
    table so cumulative load stays under ~90% and this path stays empty.
    Exact overflow hashes and prior overflow_fp entries from both inputs
    concatenate and dedupe."""
    both = a.unionByName(b)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        entries = []  # (bucket, fp) pairs from every input table
        overs, over_fps = [], []
        n = 0
        for tb, ob, ofb, ni in zip(
            pdf["table"], pdf["overflow"], pdf["overflow_fp"], pdf["n_items"]
        ):
            t = np.frombuffer(tb, dtype=np.uint16).reshape(
                cfg.n_buckets, cfg.slots_per_bucket
            )
            bidx, sidx = np.nonzero(t)
            entries.append(np.stack([bidx, t[bidx, sidx].astype(np.int64)], 1))
            overs.append(np.frombuffer(ob, dtype=np.int64))
            over_fps.append(np.frombuffer(ofb or b"", dtype=np.int64))
            n += int(ni)
        pairs = np.concatenate(entries) if entries else np.zeros((0, 2), np.int64)
        # sorted order => deterministic table bytes
        order = np.lexsort((pairs[:, 1], pairs[:, 0]))
        pairs = pairs[order]
        table = np.zeros((cfg.n_buckets, cfg.slots_per_bucket), dtype=np.uint16)
        ofp = set(int(v) for arr in over_fps for v in arr)
        for bkt, fp in pairs:
            if not _insert_with_kicks(table, int(bkt), int(fp), cfg):
                ofp.add(_pack_fp(int(bkt), int(fp)))
        over = np.unique(np.concatenate(overs)) if overs else np.zeros(0, np.int64)
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "table": [table.tobytes()],
                "overflow": [over.tobytes()],
                "overflow_fp": [np.array(sorted(ofp), dtype=np.int64).tobytes()],
                "n_items": [n],
            }
        )

    return both.groupBy("shard").applyInPandas(merge, schema=TABLE_SCHEMA)


def delete_hashes(
    tables: DataFrame, hashes: DataFrame, cfg: CuckooConfig
) -> DataFrame:
    """Remove previously-inserted hashes; their URLs probe as new again.

    Cogrouped per shard. Each delete removes ONE matching fingerprint copy
    (bucket1 first, then bucket2, then the exact overflow list). Deleting a
    hash that was never inserted is the caller's contract violation (it can
    strip an unrelated colliding fingerprint) — the crawl deletes only from
    its own committed seen set, where membership is exact.
    """
    dels = hashes.select(
        F.col("url_hash"), cfg.shard_col(F.col("url_hash")).alias("shard")
    )

    def drop(tab_pdf: pd.DataFrame, del_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(tab_pdf) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype=t)
                 for c, t in (("shard", "int32"), ("table", "object"),
                              ("overflow", "object"), ("overflow_fp", "object"),
                              ("n_items", "int64"))}
            )
        table = np.frombuffer(tab_pdf["table"].iloc[0], dtype=np.uint16).reshape(
            cfg.n_buckets, cfg.slots_per_bucket
        ).copy()
        over = list(np.frombuffer(tab_pdf["overflow"].iloc[0], dtype=np.int64))
        ofp = list(np.frombuffer(tab_pdf["overflow_fp"].iloc[0] or b"",
                                 dtype=np.int64))
        n = int(tab_pdf["n_items"].iloc[0])
        h = np.unique(del_pdf["url_hash"].to_numpy()) if len(del_pdf) else []
        for hv in h:
            arr = np.array([hv], dtype=np.int64)
            fp = int(_fingerprints(arr)[0])
            b1 = int(_bucket1(arr, cfg)[0])
            b2 = int(_alt_bucket(np.array([b1]), np.array([fp], np.uint16), cfg)[0])
            removed = False
            for b in (b1, b2):
                hits = np.nonzero(table[b] == fp)[0]
                if len(hits):
                    table[b][hits[0]] = 0
                    removed = True
                    break
            if not removed and int(hv) in over:
                over.remove(int(hv))
                removed = True
            if not removed:
                for b in (b1, b2):
                    packed = _pack_fp(b, fp)
                    if packed in ofp:
                        ofp.remove(packed)
                        removed = True
                        break
            if removed:
                n -= 1
        return pd.DataFrame(
            {
                "shard": [int(tab_pdf["shard"].iloc[0])],
                "table": [table.tobytes()],
                "overflow": [np.array(over, dtype=np.int64).tobytes()],
                "overflow_fp": [np.array(ofp, dtype=np.int64).tobytes()],
                "n_items": [n],
            }
        )

    return (
        tables.groupBy("shard")
        .cogroup(dels.groupBy("shard"))
        .applyInPandas(drop, schema=TABLE_SCHEMA)
    )


def probe_maybe_seen(
    candidates: DataFrame, tables: DataFrame, cfg: CuckooConfig
) -> DataFrame:
    """``(url_hash)`` candidates -> the subset that MIGHT be in the set.

    Cogrouped per shard; a shard with no table returns nothing (definite
    miss). Fingerprint collisions give Bloom-style false positives, which
    the exact anti-join downstream resolves; false negatives cannot happen
    for items inserted and not deleted (overflow list is exact).
    """
    cand = candidates.select(
        F.col("url_hash"), cfg.shard_col(F.col("url_hash")).alias("shard")
    ).dropDuplicates(["url_hash"])

    def probe(cand_pdf: pd.DataFrame, tab_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(cand_pdf) == 0 or len(tab_pdf) == 0:
            return pd.DataFrame({"url_hash": pd.Series([], dtype="int64")})
        table = np.frombuffer(tab_pdf["table"].iloc[0], dtype=np.uint16).reshape(
            cfg.n_buckets, cfg.slots_per_bucket
        )
        over = np.frombuffer(tab_pdf["overflow"].iloc[0], dtype=np.int64)
        ofp = np.frombuffer(tab_pdf["overflow_fp"].iloc[0] or b"",
                            dtype=np.int64)
        h = cand_pdf["url_hash"].to_numpy()
        hit = _lookup(table, h, cfg)
        if len(over):
            hit |= np.isin(h, over)
        if len(ofp):
            # merge-displaced entries: match (bucket, fingerprint) exactly
            # like a table slot would
            pfp = ((ofp >> np.int64(32)) & np.int64(0xFFFF)).astype(np.uint16)
            pbkt = (ofp & np.int64(cfg.n_buckets - 1)).astype(np.int64)
            cfp = _fingerprints(h)
            cb1 = _bucket1(h, cfg)
            cb2 = _alt_bucket(cb1, cfp, cfg)
            m = (cfp[:, None] == pfp[None, :]) & (
                (cb1[:, None] == pbkt[None, :]) | (cb2[:, None] == pbkt[None, :])
            )
            hit |= m.any(axis=1)
        return pd.DataFrame({"url_hash": h[hit]})

    return (
        cand.groupBy("shard")
        .cogroup(tables.groupBy("shard"))
        .applyInPandas(probe, schema=_PROBE_SCHEMA)
    )


def split_by_cuckoo(
    candidates: DataFrame,
    tables: DataFrame,
    cfg: CuckooConfig,
    hash_col: str = "url_hash",
) -> Tuple[DataFrame, DataFrame]:
    """Split candidate rows into (definitely_new, maybe_seen) — the same
    contract as ``bloom.split_by_bloom``, so the sidecars are drop-in
    alternates; this one additionally supports ``delete_hashes`` for
    recrawl scheduling."""
    maybe = probe_maybe_seen(
        candidates.select(F.col(hash_col).alias("url_hash")), tables, cfg
    ).withColumnRenamed("url_hash", hash_col)
    definite_new = candidates.join(maybe, hash_col, "left_anti")
    suspect = candidates.join(maybe, hash_col, "left_semi")
    return definite_new, suspect
