"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Image dimensions are REAL: PNG/GIF/JPEG headers are parsed in pure stdlib
(no PIL needed — width/height live in the first bytes of each format).
Audio/video decode needs codecs this container doesn't have, so those
features are either an explicit ``NotImplementedError`` or — with
``deterministic_fake=True`` — stable values derived from the payload's md5
(so the pipeline shape is exercised end-to-end without pretending to
decode). The Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
signatures, partitioning — is real and tested either way.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator, Optional, Tuple

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
        T.StructField("content_md5", T.StringType()),
        T.StructField("width", T.IntegerType()),      # image/video only
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),  # audio/video only
        T.StructField("feature", T.ArrayType(T.DoubleType())),  # 8-dim stub
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_image_dims(payload: bytes) -> Optional[Tuple[int, int]]:
    """(width, height) from PNG / GIF87a/89a / JPEG headers, else None.

    Pure stdlib: PNG keeps dims in the IHDR chunk at fixed offset 16 (CRC
    not validated — a truncated-but-headed file still reports dims, which is
    the useful behavior for corpus triage); GIF in the logical screen
    descriptor (little-endian u16 at offset 6); JPEG in the first SOFn
    segment (big-endian, height before width).
    """
    if len(payload) >= 24 and payload[:8] == _PNG_SIG and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return (w, h)
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return (w, h)
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker in _JPEG_SOF:
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return (w, h)
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return None
    return None


def decode_payload(payload: bytes, kind: str, deterministic_fake: bool = False) -> dict:
    """The decode seam.

    Images: dimensions come from the real header parse; an unparseable
    image either raises (default) or falls back to md5-derived fake dims.
    Audio/video: no codecs in this container — refuse loudly or fake
    deterministically (never silently return wrong features). Image
    features derive from the parsed dims (a real embedding model slots in
    here); audio/video fake features derive from the payload md5.
    """
    md5d = hashlib.md5(payload).digest()
    out = {
        "n_bytes": len(payload),
        "content_md5": md5d.hex(),
        "width": None,
        "height": None,
        "duration_ms": None,
        "feature": None,
    }
    if kind == "image":
        dims = parse_image_dims(payload)
        if dims is None:
            if not deterministic_fake:
                raise NotImplementedError(
                    "unparseable image payload (not PNG/GIF/JPEG); pass "
                    "deterministic_fake=True for pipeline testing"
                )
            dims = (md5d[0] % 64 + 1, md5d[1] % 64 + 1)
        out["width"], out["height"] = int(dims[0]), int(dims[1])
        # odd denominators: k/255 and k/65025 can never land on the 5e-7
        # rounding grid (k*2e6 is even, 255*odd is odd), so %.6f renders
        # identically under Java HALF_UP and C round-half-even — power-of-two
        # denominators hit exact ties (e.g. 672/4096 = 0.1640625)
        out["feature"] = [
            dims[0] / 255.0, dims[1] / 255.0, (dims[0] * dims[1]) / 65025.0,
            0.0, 0.0, 0.0, 0.0, 0.0,
        ]
    else:
        if not deterministic_fake:
            raise NotImplementedError(
                "audio/video decode requires codec libraries not present in "
                "this environment; pass deterministic_fake=True for pipeline "
                "testing"
            )
        if kind == "video":
            out["width"] = md5d[0] % 64 + 1
            out["height"] = md5d[1] % 64 + 1
        out["duration_ms"] = int.from_bytes(md5d[2:4], "big")
        out["feature"] = [b / 255.0 for b in md5d[4:12]]
    return out


# back-compat name (round-1 API); the image path is no longer a stub
decode_stub = decode_payload


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
                decode_payload(p, k, deterministic_fake)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "content_md5": [f["content_md5"] for f in feats],
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
