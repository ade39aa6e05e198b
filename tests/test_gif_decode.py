"""GIF LZW pixel decode (operators/multimodal.py): the decoder must
invert the independent spec-packed encoder bit-exactly across code
widths, table overflow, and container features (extensions, local color
tables), and plug into the shared image_pixel_stats / extract_features /
resize_images Arrow paths via decode_image dispatch."""

import numpy as np
import pytest

from pramen_spark.operators.multimodal import (
    _gif_lzw_decode,
    _gif_lzw_encode,
    decode_gif,
    decode_image,
    decode_png,
    encode_gif,
    encode_png,
)

PAL256 = np.stack(
    [
        (np.arange(256) * 7) % 256,
        (np.arange(256) * 11) % 256,
        (np.arange(256) * 13) % 256,
    ],
    axis=1,
).astype(np.uint8)


@pytest.fixture(scope="module")
def spark():
    from pramen_spark.session import build_session

    return build_session(
        master="local[4]", extra_conf={"spark.sql.shuffle.partitions": "4"}
    )


class TestLzw:
    @pytest.mark.parametrize("mcs", [2, 4, 8])
    def test_random_round_trips(self, mcs):
        rng = np.random.RandomState(7 + mcs)
        nsym = 1 << mcs
        for length in (0, 1, 5, 100, 3000):
            seq = rng.randint(0, nsym, size=length).tolist()
            assert _gif_lzw_decode(_gif_lzw_encode(seq, mcs), mcs) == seq

    def test_table_overflow_emits_clear_and_stays_aligned(self, subtests=None):
        # a long random 8-bit stream exceeds 4096 table entries, forcing
        # the encoder's clear+reset and the decoder's deferred-clear path
        rng = np.random.RandomState(3)
        seq = rng.randint(0, 256, size=30000).tolist()
        assert _gif_lzw_decode(_gif_lzw_encode(seq, 8), 8) == seq

    def test_runs_stress_kwkwk_and_width_bumps(self):
        for mcs in (2, 8):
            nsym = 1 << mcs
            seq = []
            for i in range(2000):
                seq += [i % nsym] * (1 + i % 7)
            assert _gif_lzw_decode(_gif_lzw_encode(seq, mcs), mcs) == seq

    def test_end_code_width_bump_at_power_of_two(self):
        # the decoder's final table add (made when it reads the flushed
        # last code) can land exactly on 1 << code_size, widening the
        # code the END code is read at; the encoder must mirror that
        # bump or the end code is emitted one bit short and the stream
        # is misread as truncated. [0,0,0,0] at mcs=2 is the minimal
        # trigger (post-flush next_code == 8 == 1 << 3).
        assert _gif_lzw_decode(_gif_lzw_encode([0, 0, 0, 0], 2), 2) == [0, 0, 0, 0]
        # broader deterministic sweep across the same boundary family:
        # runs of a single symbol hit every power-of-two add position
        for mcs in (2, 3, 8):
            for n in range(1, 80):
                seq = [1] * n
                assert _gif_lzw_decode(_gif_lzw_encode(seq, mcs), mcs) == seq

    def test_truncated_stream_is_none(self):
        enc = _gif_lzw_encode(list(range(100)), 8)
        assert _gif_lzw_decode(enc[: len(enc) // 2], 8) is None

    def test_first_code_after_clear_must_be_root(self):
        # width 9 after a 256-symbol alphabet; code 300 right after clear
        acc = 256 | (300 << 9)  # clear, then a non-root code
        data = bytes([(acc >> (8 * i)) & 0xFF for i in range(3)])
        assert _gif_lzw_decode(data, 8) is None


class TestGifContainer:
    @pytest.mark.parametrize("shape", [(9, 9), (32, 17), (1, 1), (48, 64)])
    def test_palette_round_trip(self, shape):
        h, w = shape
        rng = np.random.RandomState(h * 100 + w)
        idx = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        px = decode_gif(encode_gif(idx, PAL256))
        assert px is not None and px.shape == (h, w, 3)
        assert np.array_equal(px, PAL256[idx.astype(int)])

    def test_small_palette(self):
        pal4 = np.array(
            [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
        )
        idx = np.random.RandomState(5).randint(0, 4, size=(20, 30)).astype(np.uint8)
        assert np.array_equal(
            decode_gif(encode_gif(idx, pal4)), pal4[idx.astype(int)]
        )

    def test_corrupt_and_foreign_payloads_are_none(self):
        blob = encode_gif(np.zeros((4, 4), dtype=np.uint8), PAL256)
        assert decode_gif(None) is None
        assert decode_gif(b"GIF89a") is None
        assert decode_gif(blob[:30]) is None
        assert decode_gif(b"\x89PNG junk") is None
        assert decode_gif(b"\xff\xd8\xff\xe0 jpeg-ish") is None

    @pytest.mark.parametrize("h", [1, 2, 4, 7, 8, 9, 16, 33])
    def test_interlaced_round_trip(self, h):
        rng = np.random.RandomState(h)
        idx = rng.randint(0, 256, size=(h, 11)).astype(np.uint8)
        px = decode_gif(encode_gif(idx, PAL256, interlace=True))
        assert np.array_equal(px, PAL256[idx.astype(int)])

    def test_interlace_order_is_4_pass_spec(self):
        from pramen_spark.operators.multimodal import _gif_interlace_order

        assert _gif_interlace_order(10) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
        for h in range(1, 50):
            o = _gif_interlace_order(h)
            assert sorted(o) == list(range(h))

    def test_deinterlace_is_order_sensitive(self):
        # clearing the flag on an interlaced payload must change the
        # row-delta statistic (sums alone are permutation-invariant)
        idx = (np.arange(80, dtype=np.uint8).reshape(16, 5) * 3) % 256
        blob = bytearray(encode_gif(idx, PAL256, interlace=True))
        pos = 13 + 768 + 8
        assert blob[pos] == 0x2C and blob[pos + 9] & 0x40
        right = decode_gif(bytes(blob))
        blob[pos + 9] &= ~0x40
        wrong = decode_gif(bytes(blob))
        assert np.array_equal(right, PAL256[idx.astype(int)])
        luma_r = right.astype(np.int64).sum(axis=2)
        luma_w = wrong.astype(np.int64).sum(axis=2)
        assert luma_r.sum() == luma_w.sum()  # sums can't tell them apart
        d = lambda m: int(np.abs(np.diff(m, axis=0)).sum())  # noqa: E731
        assert d(luma_r) != d(luma_w)  # the row-delta statistic can

    def test_decode_image_dispatch(self):
        idx = np.arange(64, dtype=np.uint8).reshape(8, 8)
        gif_px = decode_image(encode_gif(idx, PAL256))
        assert np.array_equal(gif_px, PAL256[idx.astype(int)])
        png = encode_png(np.full((3, 3, 3), 7, dtype=np.uint8))
        assert np.array_equal(decode_image(png), decode_png(png))
        assert decode_image(b"not an image") is None


def _gif_media_df(spark, n=5):
    import pandas as pd
    from pyspark.sql import types as T

    rows = []
    for i in range(n):
        rng = np.random.RandomState(i)
        idx = rng.randint(0, 256, size=(10 + i, 12)).astype(np.uint8)
        rows.append((i, bytearray(encode_gif(idx, PAL256)), idx))
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    df = spark.createDataFrame([(m, c) for m, c, _ in rows], schema)
    return df, {m: idx for m, _, idx in rows}


class TestSparkPaths:
    def test_image_pixel_stats_on_gif(self, spark):
        from pramen_spark.operators.multimodal import image_pixel_stats

        df, idxs = _gif_media_df(spark)
        got = {r.media_id: r for r in image_pixel_stats(df).collect()}
        for m, idx in idxs.items():
            px = PAL256[idx.astype(int)].astype(np.int64)
            r = got[m]
            assert (r.width, r.height) == (idx.shape[1], idx.shape[0])
            assert r.sum_r == int(px[:, :, 0].sum())
            assert r.sum_g == int(px[:, :, 1].sum())
            assert r.sum_b == int(px[:, :, 2].sum())

    def test_extract_features_real_for_gif(self, spark):
        from pramen_spark.operators.multimodal import extract_features

        df, _ = _gif_media_df(spark, n=3)
        # no hash_fallback needed: GIF decodes for real now
        feats = extract_features(df, dim=16).collect()
        assert len(feats) == 3
        for r in feats:
            v = np.array(r.feature)
            assert abs(float(np.sqrt((v * v).sum())) - 1.0) < 1e-5

    def test_resize_gif_comes_out_png(self, spark):
        from pramen_spark.operators.multimodal import resize_images

        df, idxs = _gif_media_df(spark, n=2)
        out = {r.media_id: r for r in resize_images(df, 4, 3).collect()}
        for m, idx in idxs.items():
            src = PAL256[idx.astype(int)]
            got = decode_png(bytes(out[m].content))
            h, w, _ = src.shape
            ys = (np.arange(3) * h) // 3
            xs = (np.arange(4) * w) // 4
            assert np.array_equal(got, src[ys][:, xs])
