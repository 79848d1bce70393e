"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Container metadata is REAL across all three kinds, parsed in pure stdlib:
PNG/GIF/JPEG dimensions live in the first bytes of each format; WAV
(RIFF/WAVE) carries channels/sample-rate/byte-rate in its ``fmt `` chunk
and duration via the declared ``data`` size; MP4 (ISO-BMFF) carries
duration in ``moov/mvhd`` and track dimensions in ``moov/trak/tkhd``.
Actual SAMPLE decode (pixels, PCM, frames) needs codec libraries this
container doesn't have, so payloads whose container can't be parsed are
either an explicit ``NotImplementedError`` or — with
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
        T.StructField("sample_rate", T.IntegerType()),  # audio (real parse) only
        T.StructField("channels", T.IntegerType()),     # audio (real parse) only
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


def parse_wav_meta(payload: bytes) -> Optional[Tuple[int, int, int]]:
    """(channels, sample_rate, duration_ms) from a RIFF/WAVE header, else None.

    Pure stdlib chunk walk: ``fmt `` carries channels (u16 LE), sample rate
    and byte rate (u32 LE); the declared ``data`` chunk size over the byte
    rate gives duration. Like ``parse_image_dims``, this is corpus-triage
    parsing — the data body need not be present (a header-only or truncated
    file still reports its declared duration), and a malformed chunk walk
    returns None rather than raising.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    channels = sample_rate = byte_rate = data_size = None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (csize,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if cid == b"fmt " and i + 24 <= len(payload):
            channels, sample_rate, byte_rate = struct.unpack(
                "<HII", payload[i + 10 : i + 20]
            )
        elif cid == b"data":
            data_size = csize
            break  # fmt precedes data in well-formed WAV; stop at the body
        i += 8 + csize + (csize & 1)  # chunks are word-aligned
    if not channels or not sample_rate or not byte_rate or data_size is None:
        return None
    return (channels, sample_rate, data_size * 1000 // byte_rate)


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (box_type, payload_start, payload_end) for ISO-BMFF boxes laid
    out in buf[start:end]; stops (never raises) on a malformed size."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", buf[i : i + 4])
        btype = buf[i + 4 : i + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if i + 16 > end:
                return
            (size,) = struct.unpack(">Q", buf[i + 8 : i + 16])
            hdr = 16
        if size < hdr or i + size > end:
            return
        yield btype, i + hdr, i + size
        i += size


def parse_mp4_meta(payload: bytes) -> Optional[Tuple[Optional[int], Optional[int], Optional[int]]]:
    """(width, height, duration_ms) from an MP4/ISO-BMFF ``moov`` box, else
    None when no usable moov is present.

    mvhd (version 0 or 1) gives timescale+duration -> duration_ms; the
    first ``trak/tkhd`` with a nonzero width gives the 16.16-fixed track
    dimensions. Sample tables are never touched — this is container
    metadata, not a decode.
    """
    if len(payload) < 16:
        return None
    width = height = duration_ms = None
    for btype, ps, pe in _iter_boxes(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        for ityp, is_, ie in _iter_boxes(payload, ps, pe):
            if ityp == b"mvhd" and ie - is_ >= 20:
                ver = payload[is_]
                if ver == 1 and ie - is_ >= 32:
                    ts, = struct.unpack(">I", payload[is_ + 20 : is_ + 24])
                    dur, = struct.unpack(">Q", payload[is_ + 24 : is_ + 32])
                else:
                    ts, dur = struct.unpack(">II", payload[is_ + 12 : is_ + 20])
                if ts:
                    duration_ms = int(dur * 1000 // ts)
            elif ityp == b"trak" and width is None:
                for ttyp, ts_, te in _iter_boxes(payload, is_, ie):
                    if ttyp != b"tkhd":
                        continue
                    ver = payload[ts_]
                    off = ts_ + (88 if ver == 1 else 76)
                    if off + 8 <= te:
                        w_fx, h_fx = struct.unpack(
                            ">II", payload[off : off + 8]
                        )
                        if w_fx:
                            width, height = w_fx >> 16, h_fx >> 16
                    break
    if width is None and duration_ms is None:
        return None
    return (width, height, duration_ms)


def make_wav_bytes(
    sample_rate: int = 8000,
    channels: int = 1,
    bits: int = 16,
    n_samples: int = 0,
    header_only: bool = False,
) -> bytes:
    """Deterministic RIFF/WAVE bytes (silence) for tests and synthetic
    corpora; ``header_only=True`` declares the data size without emitting
    the body — the triage-parse contract ``parse_wav_meta`` supports."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data_size = n_samples * block_align
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, block_align, bits
    )
    data = b"data" + struct.pack("<I", data_size)
    if not header_only:
        data += b"\x00" * data_size
    return b"RIFF" + struct.pack("<I", 4 + len(fmt) + 8 + data_size) + b"WAVE" + fmt + data


def make_mp4_bytes(
    width: int, height: int, duration_ms: int, timescale: int = 1000
) -> bytes:
    """Deterministic minimal MP4 (ftyp + moov/mvhd + moov/trak/tkhd) whose
    container metadata round-trips through ``parse_mp4_meta``."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"                     # version 0 + flags
        + struct.pack(">II", 0, 0)              # creation/modification
        + struct.pack(">II", timescale, duration_ms * timescale // 1000)
        + b"\x00" * 80,                         # rate..next_track_id
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07"                     # version 0 + enabled flags
        + struct.pack(">III", 0, 0, 1)          # creation/modification/track
        + b"\x00" * 4
        + struct.pack(">I", duration_ms * timescale // 1000)
        + b"\x00" * 52                          # reserved/layer/volume/matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    return box(b"ftyp", b"isomisom") + box(b"moov", mvhd + box(b"trak", tkhd))


def decode_payload(payload: bytes, kind: str, deterministic_fake: bool = False) -> dict:
    """The decode seam.

    All three kinds parse REAL container metadata first: image dims from
    PNG/GIF/JPEG headers, audio channels/rate/duration from RIFF/WAVE,
    video dims/duration from MP4 moov boxes. A payload whose container
    can't be parsed (other codecs, corrupt bytes) either raises (default)
    or — with ``deterministic_fake=True`` — falls back to stable
    md5-derived values, never silently-wrong features. Features derive
    from the parsed metadata (a real embedding model slots in here); fake
    features derive from the payload md5.
    """
    md5d = hashlib.md5(payload).digest()
    out = {
        "n_bytes": len(payload),
        "content_md5": md5d.hex(),
        "width": None,
        "height": None,
        "duration_ms": None,
        "sample_rate": None,
        "channels": None,
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
        return out
    if kind == "audio":
        meta = parse_wav_meta(payload)
        if meta is not None:
            ch, sr, dur = meta
            out["channels"], out["sample_rate"] = int(ch), int(sr)
            out["duration_ms"] = int(dur)
            # same odd-denominator rounding-grid trick as the image path
            out["feature"] = [
                ch / 255.0, (sr % 255) / 255.0, (dur % 65025) / 65025.0,
                0.0, 0.0, 0.0, 0.0, 0.0,
            ]
            return out
    elif kind == "video":
        meta = parse_mp4_meta(payload)
        if meta is not None:
            w, h, dur = meta
            out["width"] = None if w is None else int(w)
            out["height"] = None if h is None else int(h)
            out["duration_ms"] = None if dur is None else int(dur)
            out["feature"] = [
                (w or 0) / 255.0, (h or 0) / 255.0,
                ((w or 0) * (h or 0)) / 65025.0,
                ((dur or 0) % 65025) / 65025.0,
                0.0, 0.0, 0.0, 0.0,
            ]
            return out
    if not deterministic_fake:
        raise NotImplementedError(
            f"unparseable {kind} payload (audio expects RIFF/WAVE, video "
            "expects MP4/ISO-BMFF; sample decode needs codec libraries not "
            "present in this environment); pass deterministic_fake=True "
            "for pipeline testing"
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
                    "sample_rate": [f["sample_rate"] for f in feats],
                    "channels": [f["channels"] for f in feats],
                    "feature": [f["feature"] for f in feats],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumb_width", T.IntegerType()),
        T.StructField("thumb_height", T.IntegerType()),
        T.StructField("thumb_payload", T.BinaryType()),
        T.StructField("thumb_is_fake", T.BooleanType()),
    ]
)


def thumbnail_dims(w: int, h: int, max_dim: int) -> Tuple[int, int]:
    """Fit (w, h) inside a max_dim square, aspect preserved, never upscaled.

    Pure integer arithmetic (``(side * max_dim) // longest``, floored,
    min 1) so every engine and every worker computes identical targets —
    no float scale factor to round differently.
    """
    longest = max(w, h)
    if longest <= max_dim:
        return (w, h)
    return (max(1, (w * max_dim) // longest), max(1, (h * max_dim) // longest))


def resize_images(
    media: DataFrame,
    max_dim: int = 256,
    deterministic_fake: bool = False,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Image thumbnail pass: real geometry, stubbed pixel resample.

    The Spark plumbing is the real 100 TB shape — Arrow-batched
    ``mapInPandas`` over the binary column, fat payload dies inside the
    kernel, small typed rows come back. Per image: source dims from the
    REAL PNG/GIF/JPEG header parse; target dims from :func:`thumbnail_dims`
    (exact integer letterbox fit). The pixel resample itself needs codec
    libraries absent from this environment, so ``thumb_payload`` is a
    deterministic md5-derived placeholder (16 bytes keyed on payload +
    target dims) flagged ``thumb_is_fake = true`` — a real decoder slots
    into ``_fake_thumb`` and flips the flag. Unparseable headers raise
    (default) or take the md5 fake-dims path, same contract as
    :func:`decode_payload`.
    """

    def _fake_thumb(payload: bytes, tw: int, th: int) -> bytes:
        return hashlib.md5(
            payload + b"|thumb|" + struct.pack(">II", tw, th)
        ).digest()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, tws, ths, pays = [], [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                dims = parse_image_dims(payload)
                if dims is None:
                    if not deterministic_fake:
                        raise NotImplementedError(
                            "unparseable image payload (not PNG/GIF/JPEG); "
                            "pass deterministic_fake=True for pipeline testing"
                        )
                    d = hashlib.md5(payload).digest()
                    dims = (d[0] % 64 + 1, d[1] % 64 + 1)
                w, h = int(dims[0]), int(dims[1])
                tw, th = thumbnail_dims(w, h, max_dim)
                ids.append(mid)
                ws.append(w)
                hs.append(h)
                tws.append(tw)
                ths.append(th)
                pays.append(_fake_thumb(payload, tw, th))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": ws,
                    "height": hs,
                    "thumb_width": tws,
                    "thumb_height": ths,
                    "thumb_payload": pays,
                    "thumb_is_fake": [True] * len(ids),
                }
            )

    return media.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(run, schema=RESIZE_SCHEMA)


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
