"""PCM WAV decode (operators/multimodal.py): the RIFF/WAVE walker must
invert the independent spec-packed writer sample-exactly (endianness,
8-bit unsigned offset, channel interleave), and audio_sample_stats must
reduce exact moments while quarantining undecodable payloads."""

import numpy as np
import pytest

from pramen_spark.operators.multimodal import (
    audio_sample_stats,
    decode_wav,
    encode_wav,
    make_fake_media_df,
)


@pytest.fixture(scope="module")
def spark():
    from pramen_spark.session import build_session

    return build_session(
        master="local[4]", extra_conf={"spark.sql.shuffle.partitions": "4"}
    )


class TestWavRoundTrip:
    @pytest.mark.parametrize(
        "shape", [(100, 1, 16), (777, 2, 16), (50, 1, 8), (3, 4, 16)]
    )
    def test_sample_exact(self, shape):
        n, ch, bits = shape
        lo, hi = (-32768, 32767) if bits == 16 else (-128, 127)
        s = np.random.RandomState(n).randint(lo, hi, size=(n, ch))
        got, rate = decode_wav(encode_wav(s, sample_rate=22050, bits=bits))
        assert rate == 22050 and got.shape == (n, ch)
        assert np.array_equal(got, s)

    def test_zero_frame_clip(self):
        got, rate = decode_wav(encode_wav(np.zeros((0, 1), dtype=int)))
        assert got.shape == (0, 1) and rate == 16000

    def test_corrupt_and_foreign_payloads_are_none(self):
        blob = encode_wav(np.zeros((8, 1), dtype=int))
        assert decode_wav(None) is None
        assert decode_wav(b"RIFF\x00\x00\x00\x00AVI ") is None
        assert decode_wav(blob[:20]) is None
        assert decode_wav(b"\x89PNG not wav") is None

    def test_non_pcm_format_tag_is_quarantined(self):
        blob = bytearray(encode_wav(np.zeros((8, 1), dtype=int)))
        pos = blob.index(b"fmt ") + 8
        blob[pos : pos + 2] = (3).to_bytes(2, "little")  # IEEE float
        assert decode_wav(bytes(blob)) is None

    def test_extension_chunk_skipped(self):
        # a LIST/INFO chunk before data must not derail the walk
        s = np.arange(-50, 50, dtype=int)[:, None]
        blob = bytearray(encode_wav(s))
        info = b"LIST" + (8).to_bytes(4, "little") + b"INFOtest"
        data_pos = blob.index(b"data")
        blob[data_pos:data_pos] = info
        blob[4:8] = (len(blob) - 8).to_bytes(4, "little")
        got, _ = decode_wav(bytes(blob))
        assert np.array_equal(got, s)


class TestSparkPath:
    def test_exact_moments_and_zero_crossings(self, spark):
        from pyspark.sql import types as T

        rows, truth = [], {}
        for i in range(4):
            t = np.arange(64 + i, dtype=np.int64)
            s = ((i * 13 + 3 * t * t + 7 * t) % 4001) - 2000
            rows.append((i, bytearray(encode_wav(s, sample_rate=8000))))
            truth[i] = s
        schema = T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), True),
            ]
        )
        df = spark.createDataFrame(rows, schema)
        got = {r.media_id: r for r in audio_sample_stats(df).collect()}
        for i, s in truth.items():
            r = got[i]
            neg = s < 0
            assert (r.sample_rate, r.n_channels, r.n_frames) == (8000, 1, len(s))
            assert r.sum_amp == int(s.sum())
            assert r.sum_amp_sq == int((s * s).sum())
            assert r.peak_amp == int(np.abs(s).max())
            assert r.zero_crossings == int((neg[1:] != neg[:-1]).sum())

    def test_quarantines_undecodable(self, spark):
        media = make_fake_media_df(spark, n=2, media_type="audio")
        out = audio_sample_stats(media, content_col="content").collect()
        assert all(r.n_frames is None for r in out)

    def test_second_fmt_chunk_cannot_overwrite_the_gate(self):
        # a trailing junk float fmt chunk must not quarantine a valid clip,
        # and a crafted PCM fmt after a float one must not pass the gate
        s = np.arange(-20, 20, dtype=int)[:, None]
        blob = bytearray(encode_wav(s))
        junk_fmt = (
            b"fmt " + (16).to_bytes(4, "little")
            + (3).to_bytes(2, "little") + b"\x00" * 14
        )
        blob += junk_fmt
        blob[4:8] = (len(blob) - 8).to_bytes(4, "little")
        got, _ = decode_wav(bytes(blob))
        assert np.array_equal(got, s)

        float_first = bytearray(encode_wav(s))
        pos = float_first.index(b"fmt ") + 8
        float_first[pos : pos + 2] = (3).to_bytes(2, "little")
        pcm_fmt = (
            b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + (16000).to_bytes(4, "little") + (32000).to_bytes(4, "little")
            + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        )
        float_first += pcm_fmt
        float_first[4:8] = (len(float_first) - 8).to_bytes(4, "little")
        assert decode_wav(bytes(float_first)) is None
