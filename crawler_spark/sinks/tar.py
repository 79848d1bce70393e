"""Deterministic WebDataset-style tar shards for trainer hand-off.

Why a tar sink in a crawl/curation engine: sequence-streaming trainer
loaders (WebDataset and its descendants) ingest *tar shards* — one
archive per shard, members read sequentially, no per-record seeks — from
any storage that serves bytes. ``sinks/shards.py`` balances the corpus
into token-equal shards and writes parquet/JSONL; this sink renders each
shard as ONE reproducible tar blob so the training job consumes the
corpus without a parquet reader in the loader path.

Determinism contract: fixed USTAR headers (mtime 0, uid/gid 0, empty
uname/gname, mode 0644), members in the engine's hash order (the same
``(hash-priority, id)`` total order the shard assignment used), text
payload UTF-8 (NULL text encodes as the empty member, never the string
'None'). Byte-identical blobs at any partitioning or cluster size —
asserted in tests by comparing whole-archive md5s across layouts.

Scale shape: one ``applyInPandas`` per shard group — per-task state is
one shard, whose byte size the upstream token budget bounds (the same
group-fits-in-memory contract every applyInPandas operator documents).
Blobs are written from the mapInPandas tasks; the driver only ever sees
the n_shards-row manifest. Writing uses plain file I/O, so the target
must be POSIX-visible (local disk, NFS, FUSE-mounted object store); for
direct object-store URIs use the parquet/JSONL writer (`write_shards`)
or front this sink with a mount — documented seam, refuses loudly.

The reference's export family stops at markdown/JSON files
(`/root/reference/crawler/enhanced_crawler.py:448-492`); this is the
training hand-off the pipeline side of the engine adds beyond it.
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile
from typing import Iterable, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BLOB_SCHEMA = "shard int, n_members bigint, n_bytes bigint, md5 string, tar binary"
_MANIFEST_SCHEMA = "shard int, path string, n_members bigint, n_bytes bigint, md5 string"


def tar_bytes_for(members: Sequence[Tuple[str, bytes]]) -> bytes:
    """One deterministic USTAR archive from ``(name, payload)`` members,
    in the given order. Every header field that tarfile would otherwise
    take from the environment (mtime, uid, gid, names, mode) is pinned."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            info.uid = 0
            info.gid = 0
            info.uname = ""
            info.gname = ""
            info.mode = 0o644
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def tar_shards(
    sharded: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ext: str = "txt",
) -> DataFrame:
    """Render each assigned shard as one tar blob.

    Input: `token_balanced_shards` output (any frame with ``shard`` +
    id/text columns). Output: ``(shard, n_members, n_bytes, md5, tar)``
    — one row per shard. Member names are ``{id:012d}.{ext}`` in the
    engine's ``(hash-priority, id)`` order, so the blob is a pure
    function of the shard's membership.
    """
    from crawler_spark.operators.sampling import _priority_expr

    # integer ids keep the zero-padded WebDataset key convention; string
    # ids (URLs) pass through as the member basename — validated so a
    # path separator can never smuggle a directory into the archive
    pad = dict(sharded.dtypes)[id_col] in ("tinyint", "smallint", "int", "bigint")
    base = sharded.select(
        F.col("shard").cast("int").alias("shard"),
        F.col(id_col).cast("string").alias("_mid"),
        F.col(text_col).cast("string").alias("_mtext"),
        F.expr(_priority_expr(id_col)).alias("_ord"),
    )

    def _emit(pdf: pd.DataFrame) -> pd.DataFrame:
        # zero-padding first keeps the (hash, id) tie-break numeric for
        # integer ids even though _mid travels as a string
        pdf = pdf.assign(
            _name=[
                (f"{int(i):012d}.{ext}" if pad else f"{i}.{ext}")
                for i in pdf["_mid"]
            ]
        ).sort_values(["_ord", "_name"], kind="mergesort")
        bad = [
            n for n in pdf["_name"]
            if "/" in n or "\x00" in n or n.startswith(".")
        ]
        if bad:
            raise ValueError(
                f"id values unusable as tar member names: {bad[:3]!r}"
            )
        members = [
            (
                name,
                ("" if t is None else str(t)).encode("utf-8"),
            )
            for name, t in zip(pdf["_name"], pdf["_mtext"])
        ]
        blob = tar_bytes_for(members)
        return pd.DataFrame(
            [
                {
                    "shard": int(pdf["shard"].iloc[0]),
                    "n_members": len(members),
                    "n_bytes": len(blob),
                    "md5": hashlib.md5(blob).hexdigest(),
                    "tar": blob,
                }
            ]
        )

    return base.groupBy("shard").applyInPandas(_emit, _BLOB_SCHEMA)


def write_tar_shards(
    sharded: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ext: str = "txt",
) -> DataFrame:
    """Write ``{path}/shard-NNNNNN.tar`` per shard plus a
    ``{path}/manifest/`` parquet of ``(shard, path, n_members, n_bytes,
    md5)``; returns the manifest. The blobs never pass through the
    driver — each writer task streams its shard's bytes straight to
    storage and emits one manifest row."""
    if "://" in path and not path.startswith("file://"):
        raise ValueError(
            "write_tar_shards writes with POSIX file I/O; mount the "
            f"object store or use write_shards for {path!r}"
        )
    tgt = path[len("file://"):] if path.startswith("file://") else path
    os.makedirs(tgt, exist_ok=True)

    def _write(batches: Iterable[pd.DataFrame]):
        from pyspark import TaskContext

        tc = TaskContext.get()
        attempt = tc.taskAttemptId() if tc is not None else os.getpid()
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                p = os.path.join(tgt, f"shard-{int(r.shard):06d}.tar")
                # attempt-unique temp + atomic rename: a speculative or
                # zombie duplicate attempt can never interleave into the
                # final file, and a killed job leaves only .tmp litter
                tmp = f"{p}.{attempt}.tmp"
                with open(tmp, "wb") as f:
                    f.write(r.tar)
                os.replace(tmp, p)
                rows.append(
                    {
                        "shard": int(r.shard),
                        "path": p,
                        "n_members": int(r.n_members),
                        "n_bytes": int(r.n_bytes),
                        "md5": r.md5,
                    }
                )
            yield pd.DataFrame(rows, columns=["shard", "path", "n_members", "n_bytes", "md5"])

    manifest = tar_shards(sharded, id_col, text_col, ext).mapInPandas(
        _write, _MANIFEST_SCHEMA
    )
    spark = sharded.sparkSession
    # repartition (a shuffle barrier), never coalesce: coalesce(1) would
    # collapse the render+write stage itself into one task and serialize
    # every shard through it — the shuffle keeps the writes parallel and
    # only the tiny manifest rows converge on one writer
    man_path = "file://" + os.path.abspath(os.path.join(tgt, "manifest"))
    manifest.repartition(1).write.mode("overwrite").parquet(man_path)
    return spark.read.parquet(man_path)
