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
    encode_wav_adpcm,
    make_fake_media_df,
    pack_wav_adpcm,
)


def _ref_ima_decode(data: bytes, block_align: int, channels: int = 1):
    """Reference IMA ADPCM decoder written from the published algorithm
    independently of the implementation under test: bit-3 sign, bits
    2..0 select step fractions via the equivalent multiply-accumulate
    form diff = ((2*code+1) * step) >> 3 with the exact truncation
    pattern expanded manually. Stereo follows the standard MS layout:
    per-channel 4-byte headers, then 4-byte words alternating
    channels. Returns a list of per-channel sample lists."""
    STEP = [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ]
    ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]
    out = [[] for _ in range(channels)]
    pred = [0] * channels
    index = [0] * channels
    for off in range(0, len(data), block_align):
        blk = data[off : off + block_align]
        for c in range(channels):
            pred[c] = int.from_bytes(
                blk[4 * c : 4 * c + 2], "little", signed=True
            )
            index[c] = blk[4 * c + 2]
            out[c].append(pred[c])
        body = blk[4 * channels :]
        for w in range(0, len(body), 4):
            c = (w // 4) % channels
            nibbles = []
            for byte in body[w : w + 4]:
                nibbles += [byte & 15, byte >> 4]
            for code in nibbles:
                step = STEP[index[c]]
                mag = code & 7
                # selected step fractions, each truncated separately
                delta = (
                    step // 8
                    + (step // 4 if mag & 1 else 0)
                    + (step // 2 if mag & 2 else 0)
                    + (step if mag & 4 else 0)
                )
                pred[c] += -delta if code & 8 else delta
                pred[c] = max(-32768, min(32767, pred[c]))
                index[c] = max(0, min(88, index[c] + ADJ[mag]))
                out[c].append(pred[c])
    return out


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


class TestAdpcm:
    """IMA ADPCM (format tag 0x11), round-12 close of the
    compressed-audio descope: the exactly-integer predictor recurrence
    must match an independently-written reference decoder bit-for-bit,
    the quantizing encoder must round-trip within the codec's step
    error, and corrupt streams must quarantine."""

    def _wave(self, n=3000, seed=7):
        rng = np.random.RandomState(seed)
        t = np.arange(n)
        x = 11000 * np.sin(t / 19.0) + 2500 * np.sin(t / 6.0)
        return (x + rng.randint(-200, 200, n)).astype(np.int64)

    def test_decode_matches_independent_reference(self):
        x = self._wave()
        blob = encode_wav_adpcm(x, sample_rate=8000, block_align=64)
        got, rate = decode_wav(blob)
        data_pos = blob.index(b"data")
        size = int.from_bytes(blob[data_pos + 4 : data_pos + 8], "little")
        ref = _ref_ima_decode(blob[data_pos + 8 : data_pos + 8 + size], 64)
        assert rate == 8000
        # the raw reference decode includes the encoder's tail-padding
        # phantom sample; the fact chunk trims it to the true length
        assert got.shape == (len(x), 1)
        assert got[:, 0].tolist() == ref[0][: len(x)]

    def test_pack_decode_is_the_seeded_recurrence(self):
        nibs = [(7 * i * i + 3 * i) % 16 for i in range(1, 201)]
        blob = pack_wav_adpcm(nibs, predictor=-1234, step_index=30)
        got, rate = decode_wav(blob)
        assert rate == 16000 and got.shape == (201, 1)
        data_pos = blob.index(b"data")
        size = int.from_bytes(blob[data_pos + 4 : data_pos + 8], "little")
        ref = _ref_ima_decode(blob[data_pos + 8 : data_pos + 8 + size], size)
        assert got[:, 0].tolist() == ref[0]

    def test_roundtrip_error_is_codec_bounded(self):
        x = self._wave(n=4000, seed=11)
        dec, _ = decode_wav(encode_wav_adpcm(x, block_align=256))
        # the fact chunk trims encoder tail padding: length-EXACT
        assert dec.shape == (len(x), 1)
        d = dec[: len(x), 0].astype(np.int64)
        err = np.abs(d - x)
        # IMA ADPCM tracks within the current step size; transients can
        # overshoot a few steps while the index adapts
        assert err.max() < 8000
        assert float(np.sqrt((err.astype(float) ** 2).mean())) < 800.0

    def test_multiblock_headers_restate_samples_verbatim(self):
        x = self._wave(n=1000, seed=3)
        block_align = 36
        spb = (block_align - 4) * 2 + 1
        dec, _ = decode_wav(encode_wav_adpcm(x, block_align=block_align))
        d = dec[:, 0]
        for k in range(0, len(x), spb):
            assert d[k] == x[k]  # block-leading sample stored verbatim

    def test_corrupt_step_index_quarantines(self):
        blob = bytearray(encode_wav_adpcm(self._wave(n=100)))
        i = blob.index(b"data") + 8 + 2  # first block's step index
        blob[i] = 89  # outside the 0..88 table
        assert decode_wav(bytes(blob)) is None

    def test_truncated_block_header_quarantines(self):
        # shrink the data chunk so the walk leaves a 2-byte header tail
        x = self._wave(n=200)
        blob = encode_wav_adpcm(x, block_align=52)
        data_pos = blob.index(b"data")
        size = int.from_bytes(blob[data_pos + 4 : data_pos + 8], "little")
        cut = (size // 52) * 52 + 2  # one full block + header fragment
        out = bytearray(blob[: data_pos + 8 + cut])
        out[data_pos + 4 : data_pos + 8] = cut.to_bytes(4, "little")
        out[4:8] = (len(out) - 8).to_bytes(4, "little")
        assert decode_wav(bytes(out)) is None

    def test_stereo_decode_matches_independent_reference(self):
        left = self._wave(n=2000, seed=21)
        right = self._wave(n=2000, seed=22) // 2
        x = np.stack([left, right], axis=1)
        blob = encode_wav_adpcm(x, sample_rate=22050, block_align=72)
        got, rate = decode_wav(blob)
        assert rate == 22050 and got.shape[1] == 2
        data_pos = blob.index(b"data")
        size = int.from_bytes(blob[data_pos + 4 : data_pos + 8], "little")
        ref = _ref_ima_decode(
            blob[data_pos + 8 : data_pos + 8 + size], 72, channels=2
        )
        n = got.shape[0]
        assert got[:, 0].tolist() == ref[0][:n]
        assert got[:, 1].tolist() == ref[1][:n]

    def test_stereo_roundtrip_per_channel(self):
        left = self._wave(n=1500, seed=31)
        right = -self._wave(n=1500, seed=32)
        x = np.stack([left, right], axis=1)
        dec, _ = decode_wav(encode_wav_adpcm(x, block_align=136))
        assert dec.shape == x.shape  # fact chunk trims tail padding
        d = dec[: len(x)].astype(np.int64)
        for c in range(2):
            err = np.abs(d[:, c] - x[:, c])
            assert err.max() < 8000
            assert float(np.sqrt((err.astype(float) ** 2).mean())) < 800.0
        # block-leading samples stored verbatim per channel
        spb = (136 - 8) * 2 // 2 + 1
        for k in range(0, len(x), spb):
            assert d[k, 0] == x[k, 0] and d[k, 1] == x[k, 1]

    def test_three_channel_adpcm_is_out_of_scope(self):
        blob = bytearray(encode_wav_adpcm(self._wave(n=64)))
        pos = blob.index(b"fmt ") + 8 + 2
        blob[pos : pos + 2] = (3).to_bytes(2, "little")
        assert decode_wav(bytes(blob)) is None

    def test_fact_chunk_trims_only_padding(self):
        # odd length forces final-byte padding; fact restores exactness
        x = self._wave(n=777, seed=41)
        blob = encode_wav_adpcm(x, block_align=64)
        dec, _ = decode_wav(blob)
        assert dec.shape == (777, 1)
        # a clip whose fact exceeds the decoded length is left alone
        # (truncated data chunk: decode what exists)
        mut = bytearray(blob)
        fpos = mut.index(b"fact") + 8
        mut[fpos : fpos + 4] = (10_000).to_bytes(4, "little")
        dec2, _ = decode_wav(bytes(mut))
        assert dec2.shape[0] >= 777  # untrimmed, not padded

    def test_encoder_rejects_bad_block_align(self):
        x = np.stack([self._wave(n=64), self._wave(n=64)], axis=1)
        with pytest.raises(ValueError, match="block_align"):
            encode_wav_adpcm(x, block_align=70)  # (70-8) % 8 != 0

    def test_pack_rejects_bad_streams(self):
        with pytest.raises(ValueError, match="even"):
            pack_wav_adpcm([1, 2, 3], 0, 0)
        with pytest.raises(ValueError, match="4-bit"):
            pack_wav_adpcm([1, 16], 0, 0)
        with pytest.raises(ValueError, match="seed state"):
            pack_wav_adpcm([1, 2], 0, 89)

    def test_audio_stats_consumes_adpcm(self, spark):
        from pyspark.sql import types as T

        x = self._wave(n=500, seed=5)
        blob = encode_wav_adpcm(x, sample_rate=8000)
        df = spark.createDataFrame(
            [(1, bytearray(blob))],
            T.StructType(
                [
                    T.StructField("media_id", T.LongType(), False),
                    T.StructField("content", T.BinaryType(), True),
                ]
            ),
        )
        row = audio_sample_stats(df).collect()[0]
        dec, _ = decode_wav(blob)
        ch0 = dec[:, 0].astype(np.int64)
        assert row.sample_rate == 8000 and row.n_frames == len(ch0)
        assert row.sum_amp == int(ch0.sum())
        assert row.peak_amp == int(np.abs(ch0).max())


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


class TestAdpcmProperties:
    """Property-based cross-checks: the implementation must agree with
    the independently-written reference decoder on ARBITRARY streams,
    not just the sine fixtures."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.binary(min_size=4, max_size=400),
        st.sampled_from([8, 12, 36, 64]),
    )
    @settings(max_examples=120, deadline=None)
    def test_mono_decode_matches_reference_on_random_bytes(
        self, data, block_align
    ):
        from pramen_spark.operators.multimodal import _adpcm_decode

        # clamp every block header's step index into the table so the
        # stream is valid (invalid indices are the quarantine test's job)
        buf = bytearray(data)
        for off in range(0, len(buf), block_align):
            if off + 3 <= len(buf):
                buf[off + 2] %= 89
        # drop a truncated final header (decode quarantines those)
        if len(buf) % block_align and len(buf) % block_align < 4:
            buf = buf[: len(buf) - (len(buf) % block_align)]
        if not buf:
            return
        got = _adpcm_decode(bytes(buf), block_align, 1)
        ref = _ref_ima_decode(bytes(buf), block_align)
        assert got is not None
        assert got[:, 0].tolist() == ref[0]

    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=1,
            max_size=600,
        ),
        st.sampled_from([12, 64, 256]),
    )
    @settings(max_examples=60, deadline=None)
    def test_mono_roundtrip_is_step_bounded(self, xs, block_align):
        import numpy as np

        x = np.array(xs, dtype=np.int64)
        dec, _ = decode_wav(encode_wav_adpcm(x, block_align=block_align))
        assert dec.shape == (len(x), 1)
        # every block-leading sample is verbatim; in between, the
        # decoder tracks within the codec's worst-case step envelope
        spb = (block_align - 4) * 2 + 1
        for k in range(0, len(x), spb):
            assert dec[k, 0] == x[k]
        # reconstruction always stays in int16 range (clamped recurrence)
        assert int(np.abs(dec).max()) <= 32768

    @given(
        st.lists(st.integers(min_value=0, max_value=15), min_size=2,
                 max_size=300).filter(lambda v: len(v) % 2 == 0),
        st.integers(min_value=-32768, max_value=32767),
        st.integers(min_value=0, max_value=88),
    )
    @settings(max_examples=80, deadline=None)
    def test_pack_decode_replays_seeded_recurrence(self, nibs, pred0, idx0):
        from pramen_spark.operators.multimodal import _adpcm_step_nibble

        got, _ = decode_wav(pack_wav_adpcm(nibs, pred0, idx0))
        pred, idx = pred0, idx0
        ref = [pred]
        for nb in nibs:
            pred, idx = _adpcm_step_nibble(nb, pred, idx)
            ref.append(pred)
        assert got[:, 0].tolist() == ref
