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
- **PNG pixel decoding is REAL** (round 9): :func:`decode_png` is a
  stdlib-only decoder — zlib-inflated IDAT, per-scanline unfilter of all
  five PNG filter types (None/Sub/Up/Average/Paeth) for 8-bit gray, RGB
  and RGBA, no interlace — and :func:`encode_png` is the independent
  spec-packed writer (forward filtering, shares no code with the
  decoder) used for fixtures. :func:`image_pixel_stats`,
  :func:`extract_features` and :func:`resize_images` compute real pixel
  statistics / histogram features / nearest-neighbor resizes on PNG
  payloads.
- **JPEG/GIF pixel decoding and video frame extraction stay stubbed**:
  entropy-coded JPEG and LZW GIF need codecs not present in this
  environment. ``extract_features(hash_fallback=True)`` substitutes a
  documented content-hash pseudo-feature for non-PNG payloads so mixed
  corpora can still run the plumbing; ``sample_frames`` remains
  plumbing-only behind ``deterministic_fake=True``.

Scale notes: binary payloads never pass through Python row-at-a-time —
``mapInPandas`` streams Arrow record batches; ``spark.sql.execution.arrow.
maxRecordsPerBatch`` bounds batch memory; repartition before decode so one
task's batch of blobs fits the executor (e.g. 64 MB blobs -> small
``maxRecordsPerBatch``).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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


def _hash_fallback_feature(content: bytes, dim: int) -> np.ndarray:
    """Documented stand-in feature for formats whose pixel codecs are not
    in this environment (JPEG entropy decode, GIF LZW): a deterministic
    unit vector seeded by the content hash, so mixed-format corpora can
    run the full distributed plumbing with PNG payloads getting REAL
    features and the rest a stable placeholder."""
    digest = hashlib.sha256(content or b"").digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.RandomState(seed)
    v = rng.normal(size=dim).astype(np.float32)
    return v / np.linalg.norm(v)


def _png_histogram_feature(px: np.ndarray, dim: int) -> np.ndarray:
    """REAL pixel feature: L2-normalized brightness histogram. Per pixel,
    brightness = r+g+b (gray counts ×3) in [0, 765]; binned into ``dim``
    equal-width buckets. Deterministic, rotation-invariant-ish, and
    cheap — the classic pre-embedding dedup/curation signal."""
    p = px.astype(np.int32)
    if p.shape[2] == 1:
        luma = p[:, :, 0] * 3
    else:
        luma = p[:, :, 0] + p[:, :, 1] + p[:, :, 2]
    bins = np.clip((luma.ravel() * dim) // 766, 0, dim - 1)
    hist = np.bincount(bins, minlength=dim).astype(np.float32)
    norm = float(np.linalg.norm(hist))
    return hist / norm if norm > 0 else hist


def extract_features(
    df: DataFrame,
    dim: int = 64,
    hash_fallback: bool = False,
    batch_size_hint: Optional[int] = None,
) -> DataFrame:
    """Binary content -> feature vectors via Arrow-batched mapInPandas.

    PNG payloads are decoded for REAL (:func:`decode_png`) and produce a
    brightness-histogram feature; other formats use the documented
    content-hash stand-in when ``hash_fallback=True`` and raise
    ``NotImplementedError`` otherwise (JPEG/GIF pixel codecs are not in
    this environment)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for c in pdf["content"]:
                content = c if c is not None else b""
                px = decode_png(content)
                if px is not None:
                    feats.append(_png_histogram_feature(px, dim).tolist())
                elif hash_fallback:
                    feats.append(_hash_fallback_feature(content, dim).tolist())
                else:
                    raise NotImplementedError(
                        "non-PNG pixel decode needs codecs not present in this "
                        "environment; pass hash_fallback=True to give non-PNG "
                        "payloads a deterministic placeholder feature."
                    )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
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


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL nearest-neighbor resize for PNG payloads: decode, resample
    via index mapping ``src = floor(dst * src_extent / dst_extent)``,
    re-encode as PNG (filter 0 — the output of a resize is usually
    consumed immediately, so spend no cycles on filter search).

    Non-PNG payloads yield a NULL content row (quarantine downstream)
    rather than failing the task — at 100 TB some blobs are always in a
    format the CPU tier can't decode. Pure map, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_content = []
            for c in pdf["content"]:
                px = decode_png(c)
                if px is None:
                    out_content.append(None)
                    continue
                h, w, _ = px.shape
                ys = (np.arange(height) * h) // height
                xs = (np.arange(width) * w) // width
                out_content.append(
                    encode_png(px[ys][:, xs], filter_for_row=lambda y: 0)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": out_content,
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


# ---------------------------------------------------------------------------
# Real PNG pixel codec (stdlib only — zlib + struct + numpy).
#
# Scope: 8-bit grayscale (color type 0), RGB (2) and RGBA (6), no
# interlace — the shapes a curation pipeline actually materializes as
# intermediate tensors. Reference behavior parity: the reference treats
# media as opaque payloads handed to external toolchains; here the decode
# itself is in-engine so pixel-level curation metrics stay distributed.
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def decode_png(content: Optional[bytes]) -> Optional[np.ndarray]:
    """Decode an 8-bit non-interlaced gray/RGB/RGBA PNG to a (H, W, C)
    uint8 array, or None when the payload is not such a PNG (wrong magic,
    unsupported bit depth/color type/interlace, or corrupt stream).

    Pure stdlib: walks chunks, zlib-inflates the concatenated IDAT
    stream, then unfilters each scanline (PNG filters 0-4). The two
    sequential filters (Average, Paeth) run a per-byte Python loop —
    bounded by row width; None/Up are vectorized and Sub uses the
    cumsum-mod-256 identity, so typical streams stay numpy-speed."""
    b = content or b""
    if not b.startswith(_PNG_SIG):
        return None
    pos, n = 8, len(b)
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    try:
        while pos + 8 <= n:
            clen = int.from_bytes(b[pos : pos + 4], "big")
            ctype = b[pos + 4 : pos + 8]
            data = b[pos + 8 : pos + 8 + clen]
            if len(data) < clen:
                return None
            if ctype == b"IHDR":
                width, height = struct.unpack(">II", data[:8])
                bit_depth, color_type = data[8], data[9]
                interlace = data[12]
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
            pos += 12 + clen  # len + type + data + crc
        if (
            width is None
            or bit_depth != 8
            or color_type not in _PNG_CHANNELS
            or interlace != 0
            or not idat
        ):
            return None
        ch = _PNG_CHANNELS[color_type]
        raw = zlib.decompress(bytes(idat))
    except (zlib.error, struct.error):
        return None
    stride = width * ch
    if len(raw) != height * (stride + 1):
        return None
    out = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype = row[0]
        filt = np.frombuffer(row, dtype=np.uint8, offset=1).astype(np.int32)
        if ftype == 0:
            recon = filt
        elif ftype == 2:  # Up
            recon = (filt + prior) % 256
        elif ftype == 1:  # Sub: cumsum along each channel offset, mod 256
            recon = filt.copy()
            for c in range(ch):
                recon[c::ch] = np.cumsum(filt[c::ch].astype(np.int64)) % 256
        elif ftype == 3:  # Average — sequential in x (plain lists: ~20x
            # faster than per-element numpy indexing in the hot loop)
            fl = row[1:]
            pr = prior.tolist()
            rl = [0] * stride
            for x in range(stride):
                a = rl[x - ch] if x >= ch else 0
                rl[x] = (fl[x] + ((a + pr[x]) >> 1)) & 0xFF
            recon = np.array(rl, dtype=np.int32)
        elif ftype == 4:  # Paeth — sequential in x
            fl = row[1:]
            pr = prior.tolist()
            rl = [0] * stride
            for x in range(stride):
                a = rl[x - ch] if x >= ch else 0
                b_ = pr[x]
                c_ = pr[x - ch] if x >= ch else 0
                p = a + b_ - c_
                pa = p - a if p >= a else a - p
                pb = p - b_ if p >= b_ else b_ - p
                pc = p - c_ if p >= c_ else c_ - p
                pred = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c_)
                rl[x] = (fl[x] + pred) & 0xFF
            recon = np.array(rl, dtype=np.int32)
        else:
            return None
        out[y] = recon.astype(np.uint8)
        prior = recon
    return out.reshape(height, width, ch)


def encode_png(pixels: np.ndarray, filter_for_row=None) -> bytes:
    """Independent PNG writer for fixtures (spec-packed, shares no logic
    with :func:`decode_png` — forward filtering here, inverse filtering
    there, so a round-trip proves both). ``pixels`` is (H, W) gray or
    (H, W, C) with C in {1, 3, 4}; ``filter_for_row(y) -> 0..4`` picks
    the per-scanline filter (default cycles y % 5 to exercise all
    five)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    if filter_for_row is None:
        filter_for_row = lambda y: y % 5  # noqa: E731
    flat = px.reshape(h, w * ch).astype(np.int16)
    zeros = np.zeros(w * ch, dtype=np.int16)
    lines = bytearray()
    prior = zeros
    for y in range(h):
        raw = flat[y]
        left = np.concatenate([np.zeros(ch, dtype=np.int16), raw[:-ch]])
        up_left = np.concatenate([np.zeros(ch, dtype=np.int16), prior[:-ch]])
        f = int(filter_for_row(y))
        if f == 0:
            filt = raw
        elif f == 1:
            filt = raw - left
        elif f == 2:
            filt = raw - prior
        elif f == 3:
            filt = raw - ((left + prior) >> 1)
        elif f == 4:
            p = left + prior - up_left
            pa, pb, pc = (
                np.abs(p - left),
                np.abs(p - prior),
                np.abs(p - up_left),
            )
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, up_left)
            )
            filt = raw - pred
        else:
            raise ValueError(f"bad PNG filter type {f}")
        lines.append(f)
        lines += (filt % 256).astype(np.uint8).tobytes()
        prior = raw

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + chunk(b"IEND", b"")
    )


PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_pixels", T.LongType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
        T.StructField("sum_luma3", T.LongType(), True),
        T.StructField("sum_luma3_sq", T.LongType(), True),
    ]
)


def image_pixel_stats(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """REAL pixel statistics over PNG payloads: per image, exact integer
    channel sums plus the (r+g+b) sum and sum-of-squares (brightness
    moments with denominator 3n), decoded by :func:`decode_png` inside
    Arrow-batched ``mapInPandas``. Gray images count their single channel
    as all three; undecodable payloads yield NULL stats (quarantine
    downstream, never fail the task).

    Integer sums travel; means/stds are derived by the caller — exact
    aggregation, engine-portable rounding, no float accumulation order
    dependence. Scale: pure map, no shuffle; this is the CPU-tier pixel
    pass a 100 TB pipeline runs to gate what reaches GPU decoders."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                px = decode_png(content)
                if px is None:
                    rows.append((int(mid),) + (None,) * 8)
                    continue
                h, w, ch = px.shape
                p = px.astype(np.int64)
                if ch == 1:
                    r = g = b = p[:, :, 0]
                else:
                    r, g, b = p[:, :, 0], p[:, :, 1], p[:, :, 2]
                luma3 = r + g + b
                rows.append(
                    (
                        int(mid),
                        w,
                        h,
                        w * h,
                        int(r.sum()),
                        int(g.sum()),
                        int(b.sum()),
                        int(luma3.sum()),
                        int((luma3 * luma3).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "n_pixels",
                    "sum_r",
                    "sum_g",
                    "sum_b",
                    "sum_luma3",
                    "sum_luma3_sq",
                ],
            ).astype(
                {
                    "width": "Int32",
                    "height": "Int32",
                    "n_pixels": "Int64",
                    "sum_r": "Int64",
                    "sum_g": "Int64",
                    "sum_b": "Int64",
                    "sum_luma3": "Int64",
                    "sum_luma3_sq": "Int64",
                }
            )

    return df.mapInPandas(run, PIXEL_STATS_SCHEMA)


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
