"""Uncompressed-AVI frame decode (operators/multimodal.py): the RIFF
walker must invert the independent spec-packed writer pixel-exactly
(stride padding, bottom-up rows, BGR order), sample_frames must decode
real AVIs at the stream's own frame rate, and undecodable payloads must
quarantine, not fail."""

import numpy as np
import pytest

from pramen_spark.operators.multimodal import (
    decode_avi_frames,
    decode_png,
    encode_avi,
    make_fake_media_df,
    sample_frames,
    video_frame_stats,
)


@pytest.fixture(scope="module")
def spark():
    from pramen_spark.session import build_session

    return build_session(
        master="local[4]", extra_conf={"spark.sql.shuffle.partitions": "4"}
    )


def _frames(seed, n, h, w):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8) for _ in range(n)]


class TestAviRoundTrip:
    @pytest.mark.parametrize("shape", [(8, 8, 1), (9, 13, 4), (16, 6, 3), (1, 1, 2)])
    def test_pixel_exact(self, shape):
        h, w, n = shape
        fs = _frames(h * 100 + w, n, h, w)
        got, uspf = decode_avi_frames(encode_avi(fs, us_per_frame=40000))
        assert uspf == 40000 and len(got) == n
        for a, b in zip(fs, got):
            assert np.array_equal(a, b)

    def test_odd_width_exercises_stride_padding(self):
        # 3*w not divisible by 4 -> per-row padding bytes must be skipped
        for w in (5, 6, 7):
            fs = _frames(w, 2, 4, w)
            got, _ = decode_avi_frames(encode_avi(fs))
            assert np.array_equal(np.stack(fs), np.stack(got))

    def test_corrupt_and_foreign_payloads_are_none(self):
        blob = encode_avi(_frames(0, 1, 4, 4))
        assert decode_avi_frames(None) is None
        assert decode_avi_frames(b"RIFF\x00\x00\x00\x00WAVE") is None
        assert decode_avi_frames(blob[:40]) is None
        assert decode_avi_frames(b"\x89PNG not avi") is None

    def test_encoder_guards_degenerate_inputs(self):
        import pytest

        with pytest.raises(ValueError, match="non-empty"):
            encode_avi([])
        # us_per_frame=0 or > 1e6 must not divide-by-zero / write rate 0
        for us in (0, 2_000_000):
            blob = encode_avi(_frames(9, 1, 4, 4), us_per_frame=us)
            got, _ = decode_avi_frames(blob)
            assert len(got) == 1

    def test_compressed_flag_is_quarantined(self):
        blob = bytearray(encode_avi(_frames(1, 1, 4, 4)))
        pos = blob.index(b"strf") + 8
        blob[pos + 16 : pos + 20] = b"MJPG"  # biCompression != BI_RGB
        assert decode_avi_frames(bytes(blob)) is None


def _avi_media_df(spark, n=3):
    from pyspark.sql import types as T

    rows, truth = [], {}
    for i in range(n):
        fs = _frames(i, 2 + i, 6, 7)
        rows.append((i, bytearray(encode_avi(fs, us_per_frame=500000))))
        truth[i] = fs
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    return spark.createDataFrame(rows, schema), truth


class TestSparkPaths:
    def test_sample_frames_real_avi_png_out(self, spark):
        df, truth = _avi_media_df(spark)
        # 500 ms/frame, sample every 1000 ms -> every second frame
        out = sample_frames(df, every_n_ms=1000).collect()
        by_media = {}
        for r in out:
            by_media.setdefault(r.media_id, {})[r.frame_idx] = bytes(r.frame)
        for m, fs in truth.items():
            n_samples = max(1, len(fs) // 2)
            assert set(by_media[m]) == set(range(n_samples))
            for k, blob in by_media[m].items():
                assert np.array_equal(decode_png(blob), fs[2 * k])

    def test_sample_frames_non_avi_still_needs_fake(self, spark):
        media = make_fake_media_df(spark, n=2, media_type="video")
        with pytest.raises(Exception, match="NotImplementedError|compressed"):
            sample_frames(media, every_n_ms=1000).collect()
        out = sample_frames(media, every_n_ms=1000, deterministic_fake=True).collect()
        assert len(out) == 10  # 5000 ms / 1000 ms x 2 videos

    def test_video_frame_stats_exact_moments(self, spark):
        df, truth = _avi_media_df(spark)
        got = {r.media_id: r for r in video_frame_stats(df).collect()}
        for m, fs in truth.items():
            p = np.stack(fs).astype(np.int64)
            r = got[m]
            assert (r.width, r.height, r.n_frames) == (7, 6, len(fs))
            assert r.n_pixels == len(fs) * 42
            assert r.sum_r == int(p[..., 0].sum())
            luma3 = p.sum(axis=-1)
            assert r.sum_luma3 == int(luma3.sum())
            assert r.sum_luma3_sq == int((luma3 * luma3).sum())

    def test_video_frame_stats_quarantines_undecodable(self, spark):
        media = make_fake_media_df(spark, n=2, media_type="video")
        out = video_frame_stats(media, content_col="content").collect()
        assert all(r.n_pixels is None for r in out)


class TestHardenedWalk:
    def _audio_strl(self):
        import struct

        # a 'auds' strl with a 30-byte WAVEFORMATEX-ish strf whose
        # wBitsPerSample (offset 14) is 0 — must NOT clobber the video gate
        strh = b"auds" + b"\x00" * 52
        strf = struct.pack("<HHIIHHH", 85, 2, 44100, 176400, 4, 0, 8) + b"\x00" * 12

        def chunk(fourcc, data):
            return fourcc + len(data).to_bytes(4, "little") + data + (
                b"\x00" if len(data) & 1 else b""
            )

        strl = b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
        return chunk(b"LIST", strl)

    def test_audio_stream_strf_does_not_clobber_video(self):
        blob = bytearray(encode_avi(_frames(2, 2, 4, 4)))
        # splice the audio strl into hdrl, after the video strl
        hdrl_pos = blob.index(b"hdrl")
        hdrl_size_pos = hdrl_pos - 4
        hdrl_size = int.from_bytes(blob[hdrl_size_pos:hdrl_pos + 4][:4], "little")
        audio = self._audio_strl()
        insert_at = hdrl_pos + hdrl_size  # end of hdrl LIST data
        blob[insert_at:insert_at] = audio
        blob[hdrl_size_pos:hdrl_pos] = (hdrl_size + len(audio)).to_bytes(4, "little")
        riff_size = int.from_bytes(blob[4:8], "little") + len(audio)
        blob[4:8] = riff_size.to_bytes(4, "little")
        decoded = decode_avi_frames(bytes(blob))
        assert decoded is not None, "audio strf clobbered the video gate"
        fs, _ = decoded
        assert len(fs) == 2 and np.array_equal(fs[0], _frames(2, 2, 4, 4)[0])

    def test_zero_frame_avi_quarantines_in_sample_frames(self, spark):
        import struct
        from pyspark.sql import types as T

        blob = bytearray(encode_avi(_frames(0, 1, 4, 4)))
        movi_pos = blob.index(b"movi")
        movi_size = int.from_bytes(blob[movi_pos - 4 : movi_pos], "little")
        # truncate the movi list to just its 'movi' tag (no frame chunks)
        del blob[movi_pos + 4 : movi_pos + movi_size]
        blob[movi_pos - 4 : movi_pos] = (4).to_bytes(4, "little")
        blob[4:8] = (len(blob) - 8).to_bytes(4, "little")
        decoded = decode_avi_frames(bytes(blob))
        assert decoded is not None and decoded[0] == []
        schema = T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), True),
            ]
        )
        df = spark.createDataFrame([(0, bytearray(blob))], schema)
        out = sample_frames(df, every_n_ms=1000).collect()
        assert out == []  # zero rows, no task failure


class TestMotionJpeg:
    """Round 11: 'MJPG' AVIs decode frame-by-frame through the real
    JPEG codec — the compressed-video descope narrows to inter-frame
    codecs."""

    def _mjpeg(self, rng, w, h, nf, progressive_odd=True):
        import numpy as np

        from pramen_spark.operators.multimodal import (
            encode_avi_mjpeg,
            encode_jpeg,
            encode_jpeg_progressive,
            jpeg_reference_pixels,
        )

        mx, my = -(-w // 8), -(-h // 8)
        q = rng.randint(1, 25, size=(8, 8))
        blobs, refs = [], []
        for f in range(nf):
            lv = [np.zeros((my, mx, 8, 8), np.int64)]
            mask = rng.rand(*lv[0].shape) < 0.2
            lv[0][mask] = rng.randint(-25, 26, size=int(mask.sum()))
            enc = (
                encode_jpeg_progressive
                if (progressive_odd and f % 2)
                else encode_jpeg
            )
            blobs.append(enc(lv, w, h, [q]))
            refs.append(
                np.repeat(jpeg_reference_pixels(lv, [q], w, h), 3, axis=2)
            )
        return encode_avi_mjpeg(blobs, w, h, us_per_frame=33333), refs

    def test_round_trips_mixed_storage_modes(self):
        import numpy as np

        from pramen_spark.operators.multimodal import decode_avi_frames

        rng = np.random.RandomState(71)
        for w, h, nf in [(8, 8, 1), (13, 9, 3), (24, 17, 4)]:
            avi, refs = self._mjpeg(rng, w, h, nf)
            got = decode_avi_frames(avi)
            assert got is not None and got[1] == 33333
            assert len(got[0]) == nf
            for a, b in zip(got[0], refs):
                assert np.array_equal(a, b)

    def test_corrupt_or_mismatched_frames_quarantine(self):
        import numpy as np

        from pramen_spark.operators.multimodal import (
            decode_avi_frames,
            encode_avi_mjpeg,
        )

        rng = np.random.RandomState(72)
        avi, _ = self._mjpeg(rng, 16, 16, 2)
        # re-wrap the first frame's JPEG truncated: whole AVI quarantines
        from pramen_spark.operators.multimodal import encode_jpeg

        lv = [np.zeros((2, 2, 8, 8), np.int64)]
        good = encode_jpeg(lv, 16, 16, [np.full((8, 8), 10, np.int64)])
        assert decode_avi_frames(encode_avi_mjpeg([good[:12]], 16, 16)) is None
        # header/frame dimension mismatch quarantines too
        assert decode_avi_frames(encode_avi_mjpeg([good], 17, 16)) is None

    def test_sample_frames_consumes_mjpeg(self, spark):
        """sample_frames needs no MJPEG-specific code: decode_avi_frames
        hands it real frames, which come out PNG-encoded."""
        import numpy as np

        from pramen_spark.operators.multimodal import (
            decode_png,
            sample_frames,
        )
        from pyspark.sql import types as T

        rng = np.random.RandomState(73)
        avi, refs = self._mjpeg(rng, 16, 8, 2)
        schema = T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), True),
            ]
        )
        df = spark.createDataFrame([(1, bytearray(avi))], schema)
        rows = sample_frames(df, every_n_ms=33).collect()
        assert rows, "no frames sampled from the MJPEG stream"
        got = decode_png(bytes(rows[0]["frame"]))
        assert np.array_equal(got, refs[rows[0]["frame_idx"]])
