"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
signatures, partitioning — is real and tested; the actual media decode is
STUBBED (no image/audio libraries in this container): ``decode_stub``
raises NotImplementedError unless ``deterministic_fake=True``, in which
case it derives fake-but-stable features from the bytes (so the pipeline
shape is exercised end-to-end without pretending to decode).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),      # image | audio | video
        T.StructField("payload", T.BinaryType()),   # opaque encoded bytes
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("width", T.IntegerType()),      # image/video only
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),  # audio/video only
        T.StructField("feature", T.ArrayType(T.FloatType())),  # 8-dim stub
    ]
)


def decode_stub(payload: bytes, kind: str, deterministic_fake: bool = False) -> dict:
    """The decode seam. Real implementation would dispatch to PIL/ffmpeg;
    this container has neither, so either fake deterministically or refuse
    loudly (never silently return wrong features)."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in this "
            "environment; pass deterministic_fake=True for pipeline testing"
        )
    h = hashlib.sha1(payload).digest()
    dims = (h[0] % 64 + 1, h[1] % 64 + 1) if kind in ("image", "video") else (None, None)
    duration = (int.from_bytes(h[2:4], "big") if kind in ("audio", "video") else None)
    feature = [round(b / 255.0, 6) for b in h[4:12]]
    return {
        "n_bytes": len(payload),
        "sha1": h.hex(),
        "width": dims[0],
        "height": dims[1],
        "duration_ms": duration,
        "feature": feature,
    }


def extract_media_features(
    media: DataFrame, deterministic_fake: bool = False, batch_hint: int = 256
) -> DataFrame:
    """mapInPandas over (media_id, kind, payload): the binary column enters
    Python as Arrow buffers (zero-copy), features come back as small typed
    columns — the payload never flows further downstream.

    At scale: repartition upstream by media_id so batches are size-bounded;
    Arrow batch size is capped by spark.sql.execution.arrow.maxRecordsPerBatch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(p, k, deterministic_fake)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "sha1": [f["sha1"] for f in feats],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "duration_ms": [f["duration_ms"] for f in feats],
                    "feature": [f["feature"] for f in feats],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms) —
    the explode/posexplode side of frame extraction, computable without
    decoding (duration from metadata). The decode of each frame would slot
    into extract_media_features' seam."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn("duration_ms", F.col("meta")["duration_ms"].cast("int"))
        .filter(F.col("duration_ms").isNotNull())
        .select(
            "media_id",
            F.posexplode(
                F.expr(f"sequence(0, greatest(duration_ms - 1, 0), {every_ms})")
            ).alias("frame_index", "frame_ts_ms"),
        )
    )
