"""Baseline JPEG codec (operators/multimodal.py): the decoder must
invert the independent spec-packed encoder exactly — canonical Huffman
entropy coding, zigzag, DC prediction, run-length ZRL/EOB, restart
markers, dequantize + IDCT rounding, YCbCr conversion — as pinned by an
einsum-form numpy reference that shares no code with either side, and
plug into the shared image_pixel_stats / extract_features /
resize_images Arrow paths via decode_image dispatch. The rounding-margin
sweep is the guard the SQL oracle of image_pixel_stats_jpeg depends on:
every fixture pre-round value must sit far enough from a .5 boundary
that numpy and DuckDB doubles round identically."""

import time

import numpy as np
import pytest

from pramen_spark.operators.multimodal import (
    _JPEG_ENC_ZIGZAG,
    _JPEG_IDCT_B,
    _JPEG_ZIGZAG,
    _jpeg_enc_huff,
    _JPEG_ENC_AC_CHROMA,
    _JPEG_ENC_AC_LUMA,
    _JPEG_ENC_DC_CHROMA,
    _JPEG_ENC_DC_LUMA,
    decode_image,
    decode_jpeg,
    encode_jpeg,
    jpeg_reference_pixels,
)


@pytest.fixture(scope="module")
def spark():
    from pramen_spark.session import build_session

    return build_session(
        master="local[4]", extra_conf={"spark.sql.shuffle.partitions": "4"}
    )


def _random_fixture(
    rng, w, h, ncomp, density=0.15, lo=-40, hi=41, sampling=None
):
    s = list(sampling) if sampling else [(1, 1)] * ncomp
    hmax = max(a for a, _ in s)
    vmax = max(b for _, b in s)
    mx, my = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    lv = []
    for hs, vs in s:
        a = np.zeros((my * vs, mx * hs, 8, 8), np.int64)
        mask = rng.rand(*a.shape) < density
        a[mask] = rng.randint(lo, hi, size=int(mask.sum()))
        lv.append(a)
    qts = [rng.randint(1, 30, size=(8, 8)) for _ in range(1 if ncomp == 1 else 2)]
    return lv, qts


class TestTables:
    def test_zigzag_derivations_agree(self):
        # decoder walks the diagonal, encoder sorts by (anti-diagonal,
        # direction); both must land on the one spec constant
        assert _JPEG_ENC_ZIGZAG == _JPEG_ZIGZAG
        assert sorted(_JPEG_ZIGZAG) == list(range(64))

    @pytest.mark.parametrize(
        "spec,nsyms",
        [
            (_JPEG_ENC_DC_LUMA, 12),
            (_JPEG_ENC_DC_CHROMA, 12),
            # 162 baseline AC symbols + 14 progressive EOBn symbols
            (_JPEG_ENC_AC_LUMA, 176),
            (_JPEG_ENC_AC_CHROMA, 176),
        ],
    )
    def test_huffman_specs_are_prefix_valid(self, spec, nsyms):
        codes, dht = _jpeg_enc_huff(spec)
        assert len(codes) == nsyms
        # Kraft strictly < 1 => prefix-decodable AND the all-ones padding
        # code can never decode as a symbol
        kraft = sum(2.0 ** -ln for _, ln in codes.values())
        assert kraft < 1.0
        for sym, (code, ln) in codes.items():
            assert code != (1 << ln) - 1, f"all-ones code for {sym:#x}"
        # codes must be prefix-free
        as_bits = {format(c, f"0{ln}b") for c, ln in codes.values()}
        assert len(as_bits) == nsyms
        for a in as_bits:
            for b in as_bits:
                assert a == b or not b.startswith(a)

    def test_idct_basis_is_orthonormal(self):
        # the alpha/2 scaling makes the basis orthonormal: B @ B.T = I,
        # so the IDCT B.T @ F @ B exactly inverts the matching DCT
        assert np.allclose(_JPEG_IDCT_B @ _JPEG_IDCT_B.T, np.eye(8))


class TestRoundTrip:
    def test_fuzz_gray_and_color_vs_reference(self):
        rng = np.random.RandomState(11)
        for trial in range(120):
            w, h = rng.randint(1, 30), rng.randint(1, 30)
            ncomp = int(rng.choice([1, 3]))
            ri = int(rng.choice([0, 0, 1, 2, 5]))
            lv, qts = _random_fixture(rng, w, h, ncomp)
            blob = encode_jpeg(lv, w, h, qts, restart_interval=ri)
            got = decode_jpeg(blob)
            ref = jpeg_reference_pixels(lv, qts, w, h)
            assert got is not None, (trial, w, h, ncomp, ri)
            assert got.shape == ref.shape
            assert np.array_equal(got, ref), (trial, w, h, ncomp, ri)

    def test_extreme_levels_hit_both_clamps(self):
        # a huge positive DC saturates at 255, a huge negative at 0
        q = np.full((8, 8), 255, np.int64)
        for dc, want in ((1000, 255), (-1000, 0)):
            lv = np.zeros((1, 1, 8, 8), np.int64)
            lv[0, 0, 0, 0] = dc
            px = decode_jpeg(encode_jpeg([lv], 8, 8, [q]))
            assert px is not None and (px == want).all()

    def test_zrl_and_eob_paths_fire(self):
        # nonzero at zigzag scan positions 1 and then >17 apart forces a
        # ZRL (16-zero run) symbol; trailing zeros force EOB
        lv = np.zeros((1, 1, 8, 8), np.int64)
        lv.reshape(-1)[_JPEG_ZIGZAG[1]] = 3
        lv.reshape(-1)[_JPEG_ZIGZAG[20]] = -2
        q = np.full((8, 8), 16, np.int64)
        blob = encode_jpeg([lv], 8, 8, [q])
        ref = jpeg_reference_pixels([lv], [q], 8, 8)
        assert np.array_equal(decode_jpeg(blob), ref)

    def test_dc_prediction_across_blocks_and_restarts(self):
        # DC levels vary per block; with restart_interval=1 every MCU
        # resets the predictor — both paths must agree with the reference
        rng = np.random.RandomState(5)
        w = h = 24
        lv, qts = _random_fixture(rng, w, h, 3, density=0.05)
        for ri in (0, 1, 3):
            blob = encode_jpeg(lv, w, h, qts, restart_interval=ri)
            assert np.array_equal(
                decode_jpeg(blob), jpeg_reference_pixels(lv, qts, w, h)
            )

    @pytest.mark.parametrize(
        "sampling",
        [
            [(2, 2), (1, 1), (1, 1)],  # 4:2:0 — the real-world default
            [(2, 1), (1, 1), (1, 1)],  # 4:2:2
            [(1, 2), (1, 1), (1, 1)],
            [(2, 2), (2, 1), (1, 1)],  # mixed factors per component
        ],
    )
    def test_fuzz_subsampled_vs_reference(self, sampling):
        rng = np.random.RandomState(sum(h * 4 + v for h, v in sampling))
        for trial in range(30):
            w, h = rng.randint(1, 40), rng.randint(1, 40)
            ri = int(rng.choice([0, 1, 3]))
            lv, qts = _random_fixture(rng, w, h, 3, sampling=sampling)
            blob = encode_jpeg(lv, w, h, qts, restart_interval=ri, sampling=sampling)
            got = decode_jpeg(blob)
            ref = jpeg_reference_pixels(lv, qts, w, h, sampling=sampling)
            assert got is not None and np.array_equal(got, ref), (
                trial, w, h, sampling, ri,
            )

    def test_chroma_upsample_is_nearest_replication(self):
        # one nonzero chroma block: every 2x2 frame cell must share its
        # chroma sample with the half-grid source pixel
        lv = [
            np.zeros((2, 2, 8, 8), np.int64),
            np.zeros((1, 1, 8, 8), np.int64),
            np.zeros((1, 1, 8, 8), np.int64),
        ]
        lv[2][0, 0, 0, 1] = 9  # horizontal-frequency Cr ripple
        q = np.full((8, 8), 20, np.int64)
        blob = encode_jpeg(
            lv, 16, 16, [q, q], sampling=[(2, 2), (1, 1), (1, 1)]
        )
        px = decode_jpeg(blob).astype(np.int64)
        for y in range(0, 16, 2):
            for x in range(0, 16, 2):
                cell = px[y : y + 2, x : x + 2]
                assert (cell == cell[0, 0]).all()

    def test_restart_marker_count_scales_with_interval(self):
        rng = np.random.RandomState(6)
        lv, qts = _random_fixture(rng, 32, 32, 1)  # 16 MCUs
        blob = encode_jpeg(lv, 32, 32, qts, restart_interval=2)
        rst = sum(
            1
            for i in range(len(blob) - 1)
            if blob[i] == 0xFF and 0xD0 <= blob[i + 1] <= 0xD7
        )
        assert rst == 7  # 16 MCUs / 2 per chunk -> 8 chunks -> 7 markers


class TestProgressive:
    """SOF2 scans (round 11): spectral selection + successive
    approximation must accumulate to EXACTLY the pixels the baseline
    encoding of the same levels produces — the decisive property that
    lets one SQL oracle cover both storage modes."""

    def test_fuzz_vs_reference_and_vs_baseline(self):
        from pramen_spark.operators.multimodal import (
            encode_jpeg_progressive,
        )

        rng = np.random.RandomState(41)
        for trial in range(60):
            w, h = rng.randint(1, 36), rng.randint(1, 36)
            ncomp = int(rng.choice([1, 3]))
            al = int(rng.choice([1, 1, 2]))
            lv, qts = _random_fixture(
                rng, w, h, ncomp, density=float(rng.choice([0.05, 0.3]))
            )
            prog = decode_jpeg(encode_jpeg_progressive(lv, w, h, qts, al=al))
            base = decode_jpeg(encode_jpeg(lv, w, h, qts))
            ref = jpeg_reference_pixels(lv, qts, w, h)
            assert prog is not None and np.array_equal(prog, ref), (
                trial, w, h, ncomp, al,
            )
            assert np.array_equal(base, prog)

    def test_eob_run_batching_exercised(self):
        """A mostly-empty coefficient field forces EOBn symbols with
        run length > 1 (the batched end-of-band path on both sides)."""
        from pramen_spark.operators.multimodal import (
            encode_jpeg_progressive,
        )

        lv = [np.zeros((4, 4, 8, 8), np.int64)]
        lv[0][0, 0, 0, 0] = 9
        lv[0][3, 3, 2, 2] = -7  # one late AC so band scans aren't all-EOB
        q = np.full((8, 8), 16, np.int64)
        blob = encode_jpeg_progressive(lv, 32, 32, [q])
        ref = jpeg_reference_pixels(lv, [q], 32, 32)
        assert np.array_equal(decode_jpeg(blob), ref)

    def test_refinement_correction_bits_across_eob_runs(self):
        """History coefficients inside EOB-covered blocks receive their
        correction bits in block order — odd magnitudes everywhere make
        every correction bit 1-valued and position-sensitive."""
        from pramen_spark.operators.multimodal import (
            encode_jpeg_progressive,
        )

        rng = np.random.RandomState(43)
        lv = [np.zeros((3, 3, 8, 8), np.int64)]
        # odd values >= 3: history in the al=1 first scan, correction
        # bit 1 in the refinement; scattered zeros exercise runs
        mask = rng.rand(3, 3, 8, 8) < 0.4
        lv[0][mask] = rng.choice([-9, -5, -3, 3, 5, 7], size=int(mask.sum()))
        q = np.full((8, 8), 11, np.int64)
        blob = encode_jpeg_progressive(lv, 24, 24, [q])
        assert np.array_equal(
            decode_jpeg(blob), jpeg_reference_pixels(lv, [q], 24, 24)
        )

    def test_progressive_subsampled_frame_rejected(self):
        # progressive scope is 1x1 sampling; a crafted SOF2 with 2x2
        # factors quarantines
        from pramen_spark.operators.multimodal import (
            encode_jpeg_progressive,
        )

        rng = np.random.RandomState(44)
        lv, qts = _random_fixture(rng, 16, 16, 3)
        blob = bytearray(encode_jpeg_progressive(lv, 16, 16, qts))
        i = blob.find(b"\xff\xc2")
        blob[i + 4 + 6 + 1] = 0x22
        assert decode_jpeg(bytes(blob)) is None


class TestQuarantine:
    """Out-of-scope or corrupt payloads decode to None, never raise."""

    def _blob(self):
        lv = np.zeros((1, 1, 8, 8), np.int64)
        lv[0, 0, 0, 0] = 4
        return encode_jpeg([lv], 8, 8, [np.full((8, 8), 10, np.int64)])

    def test_truncations_never_raise(self):
        blob = self._blob()
        for cut in range(0, len(blob), 7):
            out = decode_jpeg(blob[:cut])
            assert out is None or isinstance(out, np.ndarray)

    def test_progressive_marker_with_baseline_scan_rejected(self):
        # flipping SOF0 -> SOF2 without rewriting the scan script leaves
        # a full-band (Ss=0, Se=63) scan that is invalid progressive
        blob = bytearray(self._blob())
        i = blob.find(b"\xff\xc0")
        blob[i + 1] = 0xC2  # SOF2: progressive
        assert decode_jpeg(bytes(blob)) is None

    def test_lossless_sof_rejected(self):
        blob = bytearray(self._blob())
        i = blob.find(b"\xff\xc0")
        blob[i + 1] = 0xC3  # SOF3: lossless
        assert decode_jpeg(bytes(blob)) is None

    def test_oversampled_rejected(self):
        # 1x/2x factors are in scope (4:4:4/4:2:0/4:2:2); 3x+ is not
        blob = bytearray(self._blob())
        i = blob.find(b"\xff\xc0")
        # sampling byte of component 1 sits 9 bytes into the SOF payload
        blob[i + 4 + 6 + 1] = 0x31  # 3x1
        assert decode_jpeg(bytes(blob)) is None

    def test_sixteen_bit_quant_table_rejected(self):
        blob = bytearray(self._blob())
        i = blob.find(b"\xff\xdb")
        blob[i + 4] |= 0x10  # Pq=1
        assert decode_jpeg(bytes(blob)) is None

    def test_fill_bytes_before_markers_accepted(self):
        # B.1.1.2: markers may be preceded by any number of 0xFF fill
        # bytes; real encoders emit them, so they must not quarantine
        blob = bytearray(self._blob())
        i = blob.find(b"\xff\xc4")
        blob[i:i] = b"\xff\xff\xff"
        got = decode_jpeg(bytes(blob))
        assert got is not None and np.array_equal(
            got, decode_jpeg(self._blob())
        )

    def test_garbage_and_header_only(self):
        assert decode_jpeg(None) is None
        assert decode_jpeg(b"") is None
        assert decode_jpeg(b"\xff\xd8\xff\xd9") is None
        assert decode_jpeg(b"not a jpeg at all") is None

    @pytest.mark.parametrize("sof", [0xC0, 0xC2])
    def test_crafted_giant_sof_quarantines_before_allocation(self, sof):
        """Advice r11: a ~30-byte crafted SOF claiming 65535x65535x3
        demands ~50 GB of planes (baseline) / coefficient arrays
        (progressive, allocated AT the SOF) — the header-size guard
        must quarantine to None BEFORE any allocation, same contract
        commit 218f08a pinned for decode_png."""
        payload = bytes([8]) + (65535).to_bytes(2, "big") * 2 + bytes([3])
        for cid in (1, 2, 3):
            payload += bytes([cid, 0x11, 0])
        blob = (
            b"\xff\xd8"
            + bytes([0xFF, sof])
            + (len(payload) + 2).to_bytes(2, "big")
            + payload
        )
        t0 = time.monotonic()
        assert decode_jpeg(blob) is None
        # the guard fires at header parse: decode returns immediately,
        # long before a ~50 GB zero-fill (or swap thrash) could finish
        assert time.monotonic() - t0 < 1.0

    def test_memory_error_is_quarantined_not_raised(self, monkeypatch):
        """Backstop behind the SOF guard: if an allocation still blows
        up, the decoder's never-fail-the-task contract holds."""
        import pramen_spark.operators.multimodal as mm

        blob = self._blob()

        def boom(*a, **k):
            raise MemoryError("simulated executor OOM")

        monkeypatch.setattr(mm.np, "zeros", boom)
        assert decode_jpeg(blob) is None

    def test_baseline_nonzero_successive_approx_rejected(self):
        """Advice r11: baseline SOS must carry Ah = Al = 0 (B.2.3); a
        stream with a nonzero approximation byte decodes to WRONG
        pixels if the byte is ignored, so it must quarantine."""
        base = self._blob()
        i = base.find(b"\xff\xda")
        ns = base[i + 4]
        approx_at = i + 5 + 2 * ns + 2  # after Ss, Se
        assert base[approx_at] == 0  # encoder writes a true baseline scan
        for bad in (0x10, 0x01, 0x21):  # Ah=1 / Al=1 / both
            blob = bytearray(base)
            blob[approx_at] = bad
            assert decode_jpeg(bytes(blob)) is None

    def test_refinement_run_past_band_quarantines(self):
        """Advice r11: a newly-significant AC refinement coefficient
        whose zero-run passes the band end is a data error (libjpeg
        rejects it) — it must raise so the stream quarantines, not
        silently drop the coefficient and decode garbage."""
        from pramen_spark.operators.multimodal import (
            _JpegBitReader,
            _jpeg_decode_tables,
            _jpeg_prog_ac_refine,
        )

        # single 1-bit code '0' -> symbol 0xF1: run 15, magnitude 1
        tab = _jpeg_decode_tables([1] + [0] * 15, bytes([0xF1]))
        reader = _JpegBitReader(b"\x40")  # code bit 0, then sign bit 1
        row = np.zeros(64, dtype=np.int32)
        with pytest.raises(ValueError, match="overruns the band"):
            # band 1..2 is narrower than the 15-zero run: k walks past
            # se with the new coefficient still unplaced
            _jpeg_prog_ac_refine(reader, tab, row, 1, 2, 0, 0)


class TestOracleRoundingMargin:
    """The guard the image_pixel_stats_jpeg SQL oracle stands on: over
    the FULL fixture period (base = id + 2bx + 3by + 5c is consumed mod
    lcm(11,9,7) = 693), every pre-round IDCT output and every pre-round
    RGB-conversion value keeps a safe distance from the .5 boundary, so
    floor(x+0.5) in numpy float64 and DuckDB double cannot disagree
    (cross-engine noise is ~1e-13)."""

    def test_full_period_margin(self):
        from pramen_spark.queries.curation_advanced import (
            _JPEG_FIX_QC,
            _JPEG_FIX_QY,
            _jpeg_fixture_blocks,
        )

        qy = np.array(_JPEG_FIX_QY, np.float64)
        qc = np.array(_JPEG_FIX_QC, np.float64)

        def plane(base, q):
            f = _jpeg_fixture_blocks(base, 1, 1, 0)[0, 0].astype(np.float64)
            return _JPEG_IDCT_B.T @ (f * q) @ _JPEG_IDCT_B + 128.0

        def margin(v):
            return float(np.abs((v + 0.5) - np.round(v + 0.5)).min())

        m_idct = 1.0
        chroma_vals: set = set()
        for b in range(693):
            m_idct = min(m_idct, margin(plane(b, qy)), margin(plane(b, qc)))
            cplane = np.clip(np.floor(plane(b, qc) + 0.5), 0, 255)
            chroma_vals.update(np.unique(cplane).astype(int).tolist())
        assert m_idct > 1e-6, f"IDCT rounding margin too tight: {m_idct}"
        # RGB conversion: Y is an integer, so the pre-round fraction of
        # each channel depends only on the chroma value(s). Sweeping the
        # full REACHABLE chroma set covers every (Y, Cb, Cr) pairing any
        # sampling layout (4:4:4 same-position OR 4:2:0 half-grid,
        # where Y and chroma bases decouple) can produce.
        s = np.array(sorted(chroma_vals), np.float64) - 128.0
        cb, cr = np.meshgrid(s, s)
        m_r = margin(1.402 * s)
        m_b = margin(1.772 * s)
        m_g = margin(-0.344136 * cb - 0.714136 * cr)
        assert min(m_r, m_b, m_g) > 1e-5, (
            f"RGB rounding margins too tight: r={m_r} g={m_g} b={m_b} "
            f"over {len(s)} reachable chroma values"
        )

    def test_fixture_levels_fit_huffman_categories(self):
        for b in range(693):
            blocks = _fixture_all_levels(b)
            assert abs(int(blocks[0, 0, 0, 0])) <= 2047  # DC cat <= 11
            ac = blocks.copy()
            ac[:, :, 0, 0] = 0
            assert np.abs(ac).max() <= 1023  # AC cat <= 10


def _fixture_all_levels(base):
    from pramen_spark.queries.curation_advanced import _jpeg_fixture_blocks

    return _jpeg_fixture_blocks(base, 1, 1, 0)


class TestSparkIntegration:
    def test_image_pixel_stats_over_mixed_formats(self, spark):
        """JPEG blobs flow through the same Arrow decode pass as PNG, and
        an out-of-scope payload quarantines as NULL stats."""
        from pramen_spark.operators.multimodal import (
            encode_png,
            image_pixel_stats,
        )

        rng = np.random.RandomState(3)
        lv, qts = _random_fixture(rng, 12, 9, 3)
        jpeg = encode_jpeg(lv, 12, 9, qts)
        ref = jpeg_reference_pixels(lv, qts, 12, 9)
        png_px = rng.randint(0, 256, size=(5, 7, 3)).astype(np.uint8)
        rows = [
            (1, bytearray(jpeg)),
            (2, bytearray(encode_png(png_px))),
            (3, bytearray(b"\xff\xd8\xff\xd9garbage")),
        ]
        df = spark.createDataFrame(rows, "media_id long, content binary")
        got = {
            r["media_id"]: r for r in image_pixel_stats(df).collect()
        }
        assert got[1]["sum_r"] == int(ref[:, :, 0].astype(np.int64).sum())
        assert got[1]["width"] == 12 and got[1]["height"] == 9
        assert got[2]["sum_g"] == int(png_px[:, :, 1].astype(np.int64).sum())
        assert got[3]["sum_r"] is None  # quarantined, not failed

    def test_extract_features_jpeg_is_real_not_fallback(self, spark):
        """A decodable JPEG must produce the brightness-histogram feature
        (identical to the one computed from its reference pixels), NOT
        the content-hash placeholder."""
        from pramen_spark.operators.multimodal import (
            _png_histogram_feature,
            extract_features,
        )

        rng = np.random.RandomState(4)
        lv, qts = _random_fixture(rng, 16, 16, 3)
        jpeg = encode_jpeg(lv, 16, 16, qts)
        ref = jpeg_reference_pixels(lv, qts, 16, 16)
        df = spark.createDataFrame(
            [(1, bytearray(jpeg))], "media_id long, content binary"
        )
        row = extract_features(df, dim=16).collect()[0]
        want = _png_histogram_feature(ref, 16)
        assert np.allclose(np.array(row["feature"], np.float32), want)

    def test_resize_consumes_jpeg(self, spark):
        from pramen_spark.operators.multimodal import (
            decode_png,
            resize_images,
        )

        rng = np.random.RandomState(8)
        lv, qts = _random_fixture(rng, 10, 10, 1)
        jpeg = encode_jpeg(lv, 10, 10, qts)
        ref = jpeg_reference_pixels(lv, qts, 10, 10)
        df = spark.createDataFrame(
            [(1, bytearray(jpeg))], "media_id long, content binary"
        )
        out = resize_images(df, 5, 5).collect()[0]
        got = decode_png(bytes(out["content"]))
        ys = (np.arange(5) * 10) // 5
        assert np.array_equal(got, ref[ys][:, ys])

    def test_decode_image_dispatch(self):
        rng = np.random.RandomState(9)
        lv, qts = _random_fixture(rng, 8, 8, 1)
        blob = encode_jpeg(lv, 8, 8, qts)
        assert decode_image(blob) is not None
        assert decode_image(b"RIFFxxxxWEBP") is None
