"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side machinery (schemas, batching, partition sizing, UDF
signatures) is real and tested. Container-formats decoding is split in
two tiers:

- **Header decoding is REAL**: :func:`image_dimensions` parses PNG IHDR,
  JPEG SOF0/SOF2 (walking APPn/quantization segments), and GIF logical
  screen descriptors with pure Python over the first KB of bytes — no
  media library needed; :func:`encode_image_header` is the independent
  writer used to build test/fixture bytes.
- **Pixel decoding (feature extraction, resize, frame sampling) is
  stubbed**: those need image/audio codecs not present in this
  environment, so each raises ``NotImplementedError`` unless
  ``deterministic_fake=True``, which produces seeded fake features so
  the distributed plumbing can be exercised end-to-end.

Scale notes: binary payloads never pass through Python row-at-a-time —
``mapInPandas`` streams Arrow record batches; ``spark.sql.execution.arrow.
maxRecordsPerBatch`` bounds batch memory; repartition before decode so one
task's batch of blobs fits the executor (e.g. 64 MB blobs -> small
``maxRecordsPerBatch``).
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image | audio | video
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("feature_dim", T.IntegerType(), True),
        T.StructField("content_sha256", T.StringType(), True),
    ]
)


def _fake_feature(content: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-feature from the content hash (stands in for a
    real image/audio encoder)."""
    digest = hashlib.sha256(content or b"").digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.RandomState(seed)
    v = rng.normal(size=dim).astype(np.float32)
    return v / np.linalg.norm(v)


def extract_features(
    df: DataFrame,
    dim: int = 64,
    deterministic_fake: bool = False,
    batch_size_hint: Optional[int] = None,
) -> DataFrame:
    """Binary content -> feature vectors via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "Real media decoding requires image/audio libraries not present "
                    "in this environment; pass deterministic_fake=True for plumbing tests."
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [
                        _fake_feature(c if c is not None else b"", dim).tolist()
                        for c in pdf["content"]
                    ],
                    "feature_dim": dim,
                    "content_sha256": [
                        hashlib.sha256(c if c is not None else b"").hexdigest()
                        for c in pdf["content"]
                    ],
                }
            )
            yield out

    if batch_size_hint:
        # Size tasks so one task holds ~batch_size_hint blobs. count()
        # column-prunes to a scan-only aggregate on a plain source, but it
        # DOES execute any upstream joins/filters a second time — callers
        # with an expensive upstream plan should persist it first (or
        # repartition themselves and skip the hint). Avoids touching .rdd
        # (which would break AQE pipelining) and the degenerate
        # 1-blob-per-task / all-blobs-in-one-task shapes for huge payloads.
        n_rows = df.count()
        target = max(1, -(-n_rows // batch_size_hint))  # ceil division
        df = df.repartition(target)
    return df.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_images(
    df: DataFrame, width: int, height: int, deterministic_fake: bool = False
) -> DataFrame:
    """Image resize plumbing (stubbed decode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError("Image decoding not available in this environment.")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    # fake "resize": truncate/pad content to width*height bytes
                    "content": [
                        (c or b"")[: width * height].ljust(width * height, b"\0")
                        for c in pdf["content"]
                    ],
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(
    df: DataFrame, every_n_ms: int = 1000, deterministic_fake: bool = False
) -> DataFrame:
    """Video frame sampling plumbing (stubbed decode): one output row per
    sampled frame — a flatMap-shaped mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError("Video decoding not available in this environment.")
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                duration = int(row.get("duration_ms") or 0)
                n_frames = max(1, duration // every_n_ms)
                content = row["content"] or b""
                for i in range(n_frames):
                    ids.append(row["media_id"])
                    idxs.append(i)
                    frames.append(hashlib.sha256(content + i.to_bytes(4, "big")).digest())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(run, FRAME_SCHEMA)


DIMENSIONS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("image_format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# SOF markers that carry frame dimensions: baseline/extended/progressive/
# lossless and their differential + arithmetic variants — everything in
# 0xC0-0xCF except DHT (C4), JPG (C8), DAC (CC)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_image_header(content: Optional[bytes]):
    """(format, width, height) from the first bytes of a PNG/JPEG/GIF
    payload; (None, None, None) when the magic is unrecognized or the
    header is truncated/corrupt. Pure Python, needs only ~the first KB —
    the cheap metadata pass a 100 TB multimodal pipeline runs BEFORE
    deciding what to ship to GPU decoders."""
    b = content or b""
    if b.startswith(_PNG_SIG) and len(b) >= 24 and b[12:16] == b"IHDR":
        return (
            "png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if b.startswith(b"\xff\xd8"):
        # walk segments: each is FF <marker> <len_hi> <len_lo> <payload>
        p = 2
        n = len(b)
        while p + 4 <= n:
            if b[p] != 0xFF:
                return (None, None, None)  # desynchronized stream
            marker = b[p + 1]
            if marker == 0xD9 or marker == 0xDA:  # EOI / start of scan
                break
            seg_len = int.from_bytes(b[p + 2 : p + 4], "big")
            if seg_len < 2:
                return (None, None, None)
            if marker in _JPEG_SOF:
                if p + 9 > n:
                    return (None, None, None)
                height = int.from_bytes(b[p + 5 : p + 7], "big")
                width = int.from_bytes(b[p + 7 : p + 9], "big")
                return ("jpeg", width, height)
            p += 2 + seg_len
        return (None, None, None)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return (
            "gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    return (None, None, None)


def encode_image_header(fmt: str, width: int, height: int) -> bytes:
    """Independent writer for minimal-but-well-formed image headers (the
    fixture side of the parse round-trip — struct-packed from the format
    specs, sharing no code with :func:`parse_image_header`): a PNG
    signature + CRC'd IHDR chunk, a JPEG SOI + APP0(JFIF) + SOF0 prefix
    (the APP0 forces the parser to actually walk segments), or a GIF89a
    logical screen descriptor."""
    import struct
    import zlib

    if fmt == "png":
        ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
        chunk = b"IHDR" + ihdr
        return (
            _PNG_SIG
            + struct.pack(">I", len(ihdr))
            + chunk
            + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
        )
    if fmt == "jpeg":
        app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
        sof0 = struct.pack(">BHHB", 8, height, width, 3) + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
        return (
            b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
            + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
        )
    if fmt == "gif":
        return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00"
    raise ValueError(f"unknown image format: {fmt!r}")


def image_dimensions(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """REAL header decode over a binary column: (id, image_format, width,
    height) via Arrow-batched ``mapInPandas`` — blobs stream through in
    record batches, never row-at-a-time Python. Unrecognized/corrupt
    payloads yield NULL columns rather than failing the task (at 100 TB
    some blobs are always mangled; route NULLs to quarantine downstream).

    Scale: this is a pure map — no shuffle; bound task memory for huge
    blobs with ``spark.sql.execution.arrow.maxRecordsPerBatch`` exactly
    as :func:`extract_features` documents."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_image_header(c) for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "image_format": pd.array([p[0] for p in parsed], dtype="string"),
                    "width": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "height": pd.array([p[2] for p in parsed], dtype="Int32"),
                }
            )

    return df.mapInPandas(run, DIMENSIONS_SCHEMA)


def make_fake_media_df(spark, n: int = 16, media_type: str = "image") -> DataFrame:
    """Deterministic synthetic media table for plumbing tests."""
    rows = [
        (
            i,
            hashlib.sha256(f"media-{i}".encode()).digest() * 4,
            media_type,
            f"{media_type}/fake",
            64,
            48,
            5000 if media_type == "video" else None,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
