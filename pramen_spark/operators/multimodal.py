"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side machinery (schemas, batching, partition sizing, UDF
signatures) is real and tested; the actual media decoding is stubbed
because media libraries are not available in this environment — each
decode function raises ``NotImplementedError`` unless
``deterministic_fake=True``, which produces seeded fake features so the
distributed plumbing can be exercised end-to-end.

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
