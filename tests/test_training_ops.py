"""Training-data operator tests: dedup, similarity, text analysis,
multimodal plumbing."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pramen_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    simhash_near_dups,
)
from pramen_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dups,
    lsh_topk,
    random_hyperplanes,
)
from pramen_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint,
    language_id,
    quality_score,
    token_count,
)
from pramen_spark.operators.multimodal import (
    extract_features,
    make_fake_media_df,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (4, "completely different content about spark engines and data"),
        (5, "el perro corre por el parque y la casa es grande"),
        (6, "der hund läuft durch den park und das haus ist nicht klein"),
        (7, "le chien court dans le parc et les maisons est une belle"),
        (8, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestExactDedup:
    def test_groups(self, docs):
        out = exact_dedup(docs).collect()
        # 1 and 3 collapse
        by_count = {r["doc_id"]: r["dup_count"] for r in out}
        assert by_count[1] == 2
        assert len(out) == 7


class TestShinglesAndMinhash:
    def test_shingles(self, spark):
        df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
        out = {r["shingle"] for r in shingles(df, "doc_id", "text", 3).collect()}
        assert out == {"a b c", "b c d"}

    def test_signature_shape_and_determinism(self, docs):
        sigs1 = minhash_signatures(docs, num_hashes=16).collect()
        sigs2 = minhash_signatures(docs, num_hashes=16).collect()
        assert {len(r["signature"]) for r in sigs1} == {16}
        assert sorted((r["doc_id"], tuple(r["signature"])) for r in sigs1) == sorted(
            (r["doc_id"], tuple(r["signature"])) for r in sigs2
        )

    def test_exact_dups_have_identical_signatures(self, docs):
        sigs = {r["doc_id"]: tuple(r["signature"]) for r in minhash_signatures(docs).collect()}
        assert sigs[1] == sigs[3]

    def test_minhash_dedup_finds_near_dups(self, docs):
        pairs = minhash_dedup(docs, num_hashes=64, num_bands=16, threshold=0.5).collect()
        found = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (1, 3) in found  # exact dup: est_jaccard = 1.0
        assert (1, 2) in found or (2, 3) in found  # near dup
        assert not any({a, b} == {1, 4} for a, b in found)

    def test_lsh_candidates_bucket_join(self, docs):
        sigs = minhash_signatures(docs, num_hashes=16)
        cand = minhash_lsh_candidates(sigs, num_bands=4, rows_per_band=4).collect()
        assert any({r["id_a"], r["id_b"]} == {1, 3} for r in cand)

    def test_bucket_cap_bounds_adversarial_corpus(self, spark):
        """200 near-identical docs (one boilerplate text) — every band
        bucket holds all 200 ids; with max_bucket_size the quadratic pair
        explosion is skipped entirely."""
        docs = spark.createDataFrame(
            [(i, "the same boilerplate text repeated everywhere forever") for i in range(200)],
            "doc_id long, text string",
        )
        sigs = minhash_signatures(docs, num_hashes=16)
        capped = minhash_lsh_candidates(
            sigs, num_bands=4, rows_per_band=4, max_bucket_size=100
        )
        assert capped.count() == 0  # all buckets over the cap -> dropped
        uncapped = minhash_lsh_candidates(sigs, num_bands=4, rows_per_band=4)
        assert uncapped.count() == 200 * 199 // 2

    def test_minhash_dedup_with_guards_still_finds_dups(self, docs):
        pairs = minhash_dedup(docs, num_hashes=64, num_bands=16, threshold=0.5,
                              max_bucket_size=100, max_shingle_freq=100).collect()
        assert any({r["id_a"], r["id_b"]} == {1, 3} for r in pairs)


class TestNgramJaccard:
    def test_exact_pairs(self, docs):
        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, shingle_size=3, threshold=0.1).collect()
        }
        assert pairs[(1, 3)] == 1.0
        assert 0.4 < pairs[(1, 2)] < 1.0

    def test_threshold_filters(self, docs):
        pairs = ngram_jaccard_pairs(docs, shingle_size=3, threshold=0.99).collect()
        assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 3)}

    def test_shingle_freq_guard_drops_boilerplate(self, spark):
        """One shingle shared by every doc: with the guard the group is
        dropped and no quadratic pair set is generated."""
        docs = spark.createDataFrame(
            [(i, f"common shared prefix unique{i} tail{i}") for i in range(50)],
            "doc_id long, text string",
        )
        capped = ngram_jaccard_pairs(docs, shingle_size=3, threshold=0.01,
                                     max_shingle_freq=10)
        assert capped.count() == 0
        uncapped = ngram_jaccard_pairs(docs, shingle_size=3, threshold=0.01)
        assert uncapped.count() == 50 * 49 // 2  # 'common shared prefix' links all


class TestNgramContainment:
    def test_contained_doc_flagged(self, spark):
        from pramen_spark.operators.dedup import ngram_containment

        corpus = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta eta theta"),
                (2, "totally different words here with no overlap at all"),
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon")],
            "bench_id long, text string",
        )
        rows = {
            (r["doc_id"], r["bench_id"]): r["containment"]
            for r in ngram_containment(corpus, bench, threshold=0.5).collect()
        }
        # every benchmark 3-gram appears in doc 1 -> containment 1.0
        assert rows == {(1, 100): 1.0}

    def test_directional_not_symmetric(self, spark):
        """A short benchmark fully inside a long doc scores 1.0 even though
        the doc's own shingles are mostly NOT in the benchmark."""
        from pramen_spark.operators.dedup import ngram_containment

        corpus = spark.createDataFrame(
            [(1, "x y z " + " ".join(f"w{i}" for i in range(50)))],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame([(9, "x y z")], "bench_id long, text string")
        out = ngram_containment(corpus, bench, threshold=0.99).collect()
        assert [(r["doc_id"], r["bench_id"], r["containment"]) for r in out] == [
            (1, 9, 1.0)
        ]

    def test_shingle_freq_guard(self, spark):
        """A boilerplate shingle in every corpus doc is dropped before the
        join; matches through it disappear, rarer shingles still count."""
        from pramen_spark.operators.dedup import ngram_containment

        corpus = spark.createDataFrame(
            [(i, f"common shared prefix unique{i} tail{i}") for i in range(30)],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(100, "common shared prefix")], "bench_id long, text string"
        )
        capped = ngram_containment(corpus, bench, threshold=0.01, max_shingle_freq=5)
        assert capped.count() == 0
        uncapped = ngram_containment(corpus, bench, threshold=0.99)
        assert uncapped.count() == 30  # all docs fully contain the benchmark


class TestRepetitionStats:
    def test_fractions(self, spark):
        from pramen_spark.operators.text import repetition_stats

        df = spark.createDataFrame(
            [(1, "a a a a b"), (2, "u v w x y"), (3, "solo")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
        assert set(rows) == {1, 2}  # <2 tokens dropped
        r1 = rows[1]
        assert r1["n_words"] == 5
        assert abs(r1["dup_word_frac"] - 0.6) < 1e-9  # 2 distinct of 5
        # bigrams: "a a" x3, "a b" -> 2 distinct of 4
        assert abs(r1["dup_bigram_frac"] - 0.5) < 1e-9
        assert rows[2]["dup_word_frac"] == 0.0
        assert rows[2]["dup_bigram_frac"] == 0.0


class TestSimhash:
    def test_exact_dups_same_fingerprint(self, docs):
        fps = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
        assert fps[1] == fps[3]

    def test_near_dups_close_hamming(self, docs):
        pairs = simhash_near_dups(docs, max_hamming=16, num_blocks=32).collect()
        by_pair = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
        assert by_pair.get((1, 3)) == 0
        assert (1, 2) in by_pair


class TestSimilarity:
    @pytest.fixture(scope="class")
    def embeddings(self, spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def test_bruteforce_topk(self, embeddings):
        query = embeddings.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        out = cosine_topk(embeddings, query, k=5)
        rows = out.collect()
        assert len(rows) == 10  # 2 queries x 5
        # self-similarity rank 1
        top = {r["query_id"]: r["vec_id"] for r in rows if r["rank"] == 1}
        assert top == {0: 0, 1: 1}

    def test_lsh_recall_against_bruteforce(self, embeddings):
        query = embeddings.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = {r["vec_id"] for r in cosine_topk(embeddings, query, k=10).collect()}
        approx = {
            r["vec_id"]
            for r in lsh_topk(
                embeddings, query, k=10, num_planes=4, dim=64, multi_probe=2
            ).collect()
        }
        recall = len(exact & approx) / 10
        assert recall >= 0.6, f"LSH recall too low: {recall} ({exact} vs {approx})"

    def test_hyperplanes_deterministic(self):
        assert random_hyperplanes(8, 4, seed=7) == random_hyperplanes(8, 4, seed=7)

    def test_ivf_full_probe_equals_bruteforce(self, embeddings):
        """nprobe == nlist probes every cell -> IVF must reproduce exact
        brute-force top-k bit-for-bit (same scoring, same tie-break)."""
        from pramen_spark.operators.similarity import ivf_topk

        query = embeddings.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = sorted(
            (r["query_id"], r["rank"], r["vec_id"])
            for r in cosine_topk(embeddings, query, k=5).collect()
        )
        full = sorted(
            (r["query_id"], r["rank"], r["vec_id"])
            for r in ivf_topk(embeddings, query, k=5, nlist=8, nprobe=8).collect()
        )
        assert full == exact

    def test_ivf_partial_probe_recall(self, embeddings):
        from pramen_spark.operators.similarity import ivf_topk

        query = embeddings.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = {r["vec_id"] for r in cosine_topk(embeddings, query, k=10).collect()}
        approx = {
            r["vec_id"]
            for r in ivf_topk(embeddings, query, k=10, nlist=16, nprobe=4).collect()
        }
        recall = len(exact & approx) / 10
        assert recall >= 0.5, f"IVF recall too low: {recall}"
        # self-match always survives: the query's own cell is its top probe
        assert 0 in approx

    def test_ivf_deterministic(self, embeddings):
        from pramen_spark.operators.similarity import ivf_topk

        query = embeddings.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        a = [(r["rank"], r["vec_id"]) for r in
             ivf_topk(embeddings, query, k=5, nlist=8, nprobe=2).collect()]
        b = [(r["rank"], r["vec_id"]) for r in
             ivf_topk(embeddings, query, k=5, nlist=8, nprobe=2).collect()]
        assert a == b and len(a) == 5


class TestTextOps:
    def test_token_count(self, docs):
        out = {r["doc_id"]: r["n_tokens"] for r in token_count(docs).collect()}
        assert out[1] == 9

    def test_bpe_ish(self, docs):
        out = {r["doc_id"]: r["est_bpe_tokens"] for r in bpe_ish_token_count(docs).collect()}
        assert out[1] >= 9  # at least one chunk per word

    def test_quality_score_range(self, docs):
        for r in quality_score(docs.filter("doc_id < 8")).collect():
            assert 0.0 <= r["quality_score"] <= 1.0
            assert r["stopword_ratio"] >= 0.0

    def test_language_id(self, docs):
        out = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
        assert out[1] == "en"
        assert out[5] == "es"
        assert out[6] == "de"
        assert out[7] == "fr"

    def test_fingerprint_stability(self, docs):
        a = {r["doc_id"]: r["fingerprint"] for r in fingerprint(docs).collect()}
        assert a[1] == a[3]
        assert a[1] != a[2]


def _png_media_df(spark, n=6):
    """Real PNG payloads through the MEDIA_SCHEMA shape."""
    import numpy as np

    from pramen_spark.operators.multimodal import MEDIA_SCHEMA, encode_png

    rows = []
    for i in range(n):
        w, h = 5 + i, 4 + (i % 3)
        rng = np.random.RandomState(100 + i)
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        rows.append((i, encode_png(px), "image", "image/png", w, h, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


class TestMultimodalPlumbing:
    def test_feature_extraction_real_png(self, spark):
        media = _png_media_df(spark, n=6)
        feats = extract_features(media, dim=16).collect()
        assert len(feats) == 6
        assert {len(r["feature"]) for r in feats} == {16}
        # real histogram features are L2-normalized and deterministic
        import math

        for r in feats:
            assert abs(math.sqrt(sum(v * v for v in r["feature"])) - 1.0) < 1e-5
        feats2 = extract_features(_png_media_df(spark, n=6), dim=16).collect()
        assert {r["media_id"]: r["feature"] for r in feats} == {
            r["media_id"]: r["feature"] for r in feats2
        }

    def test_feature_extraction_non_png_fallback(self, spark):
        media = make_fake_media_df(spark, n=4)  # hash blobs, not PNGs
        with pytest.raises(Exception, match="NotImplementedError|codecs"):
            extract_features(media, dim=8).collect()
        feats = extract_features(media, dim=8, hash_fallback=True).collect()
        assert len(feats) == 4 and {len(r["feature"]) for r in feats} == {8}

    def test_resize_real_nearest_neighbor(self, spark):
        import numpy as np

        from pramen_spark.operators.multimodal import decode_png

        media = _png_media_df(spark, n=4)
        out = resize_images(media, 3, 2).collect()
        originals = {r["media_id"]: r["content"] for r in media.collect()}
        for r in out:
            src = decode_png(originals[r["media_id"]])
            got = decode_png(bytes(r["content"]))
            assert got.shape == (2, 3, 3)
            h, w, _ = src.shape
            ys = (np.arange(2) * h) // 2
            xs = (np.arange(3) * w) // 3
            assert np.array_equal(got, src[ys][:, xs])

    def test_resize_non_png_yields_null(self, spark):
        media = make_fake_media_df(spark, n=2)
        out = resize_images(media, 4, 4).collect()
        assert all(r["content"] is None for r in out)

    def test_frame_sampling_flatmap(self, spark):
        media = make_fake_media_df(spark, n=3, media_type="video")
        out = sample_frames(media, every_n_ms=1000, deterministic_fake=True).collect()
        assert len(out) == 15  # 5000ms / 1000ms x 3 videos
        assert {r["frame_idx"] for r in out} == {0, 1, 2, 3, 4}


class TestPngPixelCodec:
    """decode_png must pixel-exactly invert the independent spec-packed
    encoder for every filter type and channel count; pixel stats must be
    integer-exact; garbage degrades to None/NULL, never task failure."""

    def test_round_trip_every_filter_and_channel(self):
        import numpy as np

        from pramen_spark.operators.multimodal import decode_png, encode_png

        rng = np.random.RandomState(7)
        for ch in (1, 3, 4):
            for h, w in [(1, 1), (5, 9), (17, 23)]:
                px = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
                for f in (None, 0, 1, 2, 3, 4):
                    pick = None if f is None else (lambda y, f=f: f)
                    back = decode_png(encode_png(px, filter_for_row=pick))
                    assert back is not None and np.array_equal(back, px), (ch, h, w, f)

    def test_adam7_interlace_round_trips(self):
        """Round 11: the Adam7 layout (7 independently-filtered passes
        scattered at per-pass offsets/strides) must invert exactly for
        every channel count, including dims where late passes are empty
        and dims smaller than one 8x8 tile."""
        import numpy as np

        from pramen_spark.operators.multimodal import decode_png, encode_png

        rng = np.random.RandomState(11)
        for ch in (1, 3, 4):
            for h, w in [(1, 1), (1, 9), (9, 1), (2, 3), (5, 9), (17, 23), (32, 8)]:
                px = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
                back = decode_png(encode_png(px, interlace=True))
                assert back is not None and np.array_equal(back, px), (ch, h, w)

    def test_palette_round_trips_including_interlaced(self):
        """Round 11: color-type-3 images decode through the PLTE lookup
        to RGB; out-of-range indices are a decode-time quarantine."""
        import numpy as np

        from pramen_spark.operators.multimodal import decode_png, encode_png

        rng = np.random.RandomState(13)
        for npal in (2, 17, 256):
            pal = rng.randint(0, 256, size=(npal, 3)).astype(np.uint8)
            idx = rng.randint(0, npal, size=(11, 7)).astype(np.uint8)
            for inter in (False, True):
                back = decode_png(encode_png(idx, palette=pal, interlace=inter))
                assert back is not None and np.array_equal(back, pal[idx])
        # an index beyond the palette is rejected at encode time...
        with __import__("pytest").raises(ValueError):
            encode_png(np.array([[5]], np.uint8), palette=pal[:3])
        # ...and a crafted file with one quarantines at decode time
        blob = bytearray(encode_png(np.array([[1]], np.uint8), palette=pal[:4]))
        i = blob.find(b"PLTE")
        # shrink the PLTE length to 1 entry so index 1 overruns it
        blob[i - 4 : i] = (3).to_bytes(4, "big")
        assert decode_png(bytes(blob)) is None

    def test_decoder_rejects_garbage(self):
        import numpy as np

        from pramen_spark.operators.multimodal import decode_png, encode_png

        assert decode_png(None) is None
        assert decode_png(b"\xff\xd8 not a png") is None
        full = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
        assert decode_png(full[:20]) is None  # truncated mid-IHDR
        corrupt = full[:-8] + b"XXXXXXXX"  # mangled IEND tail is tolerated
        assert decode_png(corrupt) is not None
        # interlaced stream with a truncated last pass
        inter = encode_png(np.zeros((16, 16, 3), dtype=np.uint8), interlace=True)
        assert decode_png(inter) is not None

    def test_crafted_headers_quarantine_without_allocation(self):
        """Review r11: a tiny PNG claiming 2^30 x 2^30 dims (or a zlib
        bomb) must return None — the expected inflated size is derived
        from the header and bounded BEFORE decompressing or allocating,
        so one malformed web-crawl blob cannot OOM a Spark task."""
        import struct
        import zlib

        import numpy as np

        from pramen_spark.operators.multimodal import _PNG_SIG, decode_png

        def chunk(t, d):
            return (
                struct.pack(">I", len(d))
                + t
                + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )

        for interlace in (0, 1):
            ihdr = struct.pack(">IIBBBBB", 1 << 30, 1 << 30, 8, 6, 0, 0, interlace)
            evil = (
                _PNG_SIG
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"\0" * 100))
                + chunk(b"IEND", b"")
            )
            assert decode_png(evil) is None
        # zlib bomb: small IDAT inflating far past the declared 4x4 size
        bomb = (
            _PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\0" * (1 << 26)))
            + chunk(b"IEND", b"")
        )
        assert decode_png(bomb) is None

    def test_pixel_stats_integer_exact(self, spark):
        import numpy as np

        from pramen_spark.operators.multimodal import (
            encode_png,
            image_pixel_stats,
        )
        from pramen_spark.operators.multimodal import MEDIA_SCHEMA

        px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        rows = [(1, encode_png(px), "image", "image/png", 3, 2, None),
                (2, b"not a png", "image", "image/jpeg", None, None, None)]
        media = spark.createDataFrame(rows, MEDIA_SCHEMA)
        out = {r["media_id"]: r for r in image_pixel_stats(media).collect()}
        p = px.astype(int)
        assert out[1]["n_pixels"] == 6
        assert out[1]["sum_r"] == int(p[:, :, 0].sum())
        assert out[1]["sum_g"] == int(p[:, :, 1].sum())
        assert out[1]["sum_b"] == int(p[:, :, 2].sum())
        luma = p.sum(axis=2)
        assert out[1]["sum_luma3"] == int(luma.sum())
        assert out[1]["sum_luma3_sq"] == int((luma * luma).sum())
        assert out[2]["sum_r"] is None  # quarantine, not failure


class TestImageHeaderDecode:
    """The REAL decode tier: pure-Python header parsing must invert the
    independent spec-packed writer for all three formats and degrade to
    NULLs (never task failure) on garbage."""

    def test_round_trip_all_formats(self):
        from pramen_spark.operators.multimodal import (
            encode_image_header,
            parse_image_header,
        )

        for fmt, w, h in [
            ("png", 1, 1), ("png", 65535, 3), ("jpeg", 640, 480),
            ("jpeg", 1, 65535), ("gif", 320, 200), ("gif", 1, 1),
        ]:
            assert parse_image_header(encode_image_header(fmt, w, h)) == (fmt, w, h)

    def test_jpeg_walker_skips_leading_segments(self):
        """Real JPEGs bury SOF behind APPn/DQT/COM segments — the walker
        must skip arbitrarily many before finding the frame header."""
        import struct

        from pramen_spark.operators.multimodal import parse_image_header

        com = b"some comment"
        dqt = bytes(65)
        sof2 = struct.pack(">BHHB", 8, 77, 99, 3) + bytes(9)  # progressive
        b = (
            b"\xff\xd8"
            + b"\xff\xfe" + struct.pack(">H", len(com) + 2) + com
            + b"\xff\xdb" + struct.pack(">H", len(dqt) + 2) + dqt
            + b"\xff\xc2" + struct.pack(">H", len(sof2) + 2) + sof2
        )
        assert parse_image_header(b) == ("jpeg", 99, 77)

    def test_garbage_and_truncation_yield_nulls(self):
        from pramen_spark.operators.multimodal import (
            encode_image_header,
            parse_image_header,
        )

        assert parse_image_header(None) == (None, None, None)
        assert parse_image_header(b"") == (None, None, None)
        assert parse_image_header(b"not an image at all") == (None, None, None)
        # right magic, truncated before the dimensions
        assert parse_image_header(encode_image_header("png", 5, 5)[:20]) == (
            None, None, None,
        )
        assert parse_image_header(b"\xff\xd8\xff") == (None, None, None)
        # desynchronized JPEG stream (segment byte not 0xFF)
        assert parse_image_header(b"\xff\xd8\x00\x00\x00\x00") == (None, None, None)

    def test_image_dimensions_distributed(self, spark):
        from pramen_spark.operators.multimodal import (
            encode_image_header,
            image_dimensions,
        )

        rows = [
            (1, encode_image_header("png", 10, 20)),
            (2, encode_image_header("jpeg", 30, 40)),
            (3, encode_image_header("gif", 50, 60)),
            (4, b"garbage"),
            (5, None),
        ]
        df = spark.createDataFrame(rows, "media_id long, content binary")
        got = {
            r.media_id: (r.image_format, r.width, r.height)
            for r in image_dimensions(df).collect()
        }
        assert got == {
            1: ("png", 10, 20),
            2: ("jpeg", 30, 40),
            3: ("gif", 50, 60),
            4: (None, None, None),
            5: (None, None, None),
        }


class TestEmbeddingNearDups:
    @pytest.fixture(scope="class")
    def embeddings(self, spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def test_exact_pairs_symmetric_threshold(self, embeddings):
        pairs = embedding_near_dups(embeddings, threshold=0.4).collect()
        assert len(pairs) > 0
        for r in pairs:
            assert r["id_a"] < r["id_b"]
            assert r["cosine"] >= 0.4

    def test_identical_vectors_are_found(self, spark, embeddings):
        # duplicate vec 0 under a new id: cosine 1.0 must surface
        dup = embeddings.filter(F.col("vec_id") == 0).withColumn(
            "vec_id", F.lit(100000).cast("long")
        )
        out = embedding_near_dups(embeddings.unionByName(dup), threshold=0.999)
        rows = [(r["id_a"], r["id_b"]) for r in out.collect()]
        assert (0, 100000) in rows

    def test_lsh_subset_of_exact(self, embeddings):
        exact = {(r["id_a"], r["id_b"]) for r in embedding_near_dups(embeddings, threshold=0.4).collect()}
        lsh = {(r["id_a"], r["id_b"]) for r in embedding_near_dups(
            embeddings, threshold=0.4, num_planes=2, dim=64).collect()}
        assert lsh <= exact
        assert len(lsh) > 0

    def test_lsh_high_threshold_recall(self, spark, embeddings):
        # identical vectors always share every LSH bucket -> recall 1.0 at
        # cosine ~1 regardless of num_planes
        dup = embeddings.filter(F.col("vec_id") < 3).withColumn(
            "vec_id", (F.col("vec_id") + 200000).cast("long")
        )
        out = embedding_near_dups(
            embeddings.unionByName(dup), threshold=0.999, num_planes=8, dim=64
        )
        got = {(r["id_a"], r["id_b"]) for r in out.collect()}
        assert {(0, 200000), (1, 200001), (2, 200002)} <= got

    def test_blocked_matmul_matches_unblocked(self, embeddings):
        """Strip size smaller than any bucket: identical pairs, so the
        memory-bounded path is a pure implementation detail."""
        from pramen_spark.operators.similarity import (
            _bucketed_pairs_blockwise,
            lsh_bucket,
            random_hyperplanes,
            unit_embeddings,
        )

        planes = random_hyperplanes(64, 2)
        bucketed = lsh_bucket(embeddings, planes)
        units = unit_embeddings(bucketed.select("vec_id", "embedding", "bucket"),
                                id_col="vec_id").join(
            bucketed.select("vec_id", "bucket"), "vec_id"
        ).select(F.col("vec_id").alias("id"), "bucket", "u")
        big = {(r["id_a"], r["id_b"]) for r in
               _bucketed_pairs_blockwise(units, 0.4, block_rows=10_000).collect()}
        small = {(r["id_a"], r["id_b"]) for r in
                 _bucketed_pairs_blockwise(units, 0.4, block_rows=7).collect()}
        assert big == small and len(big) > 0

    def test_bucket_cap_drops_degenerate_bucket(self, spark):
        """200 identical embeddings collapse into one sign-pattern bucket;
        the cap drops it so the O(b^2) multiply never runs."""
        base = [float(i % 7 - 3) for i in range(16)]
        rows = [(i, base) for i in range(200)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        capped = embedding_near_dups(
            df, threshold=0.9, num_planes=4, dim=16, max_bucket_size=100
        )
        assert capped.count() == 0
        uncapped = embedding_near_dups(df, threshold=0.9, num_planes=4, dim=16)
        assert uncapped.count() == 200 * 199 // 2


class TestAsofJoin:
    @pytest.fixture(scope="class")
    def frames(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

        def ts(m):
            return t0 + dt.timedelta(minutes=m)

        left = spark.createDataFrame(
            [(1, 1, ts(10)), (2, 1, ts(20)), (3, 2, ts(5))],
            "lid long, k long, ts timestamp",
        )
        right = spark.createDataFrame(
            [(100, 1, ts(10)), (101, 1, ts(15)), (102, 2, ts(7))],
            "rid long, k long, ts timestamp",
        )
        return left, right

    def test_backward_matches_latest_at_or_before(self, frames):
        from pramen_spark.operators.asof import asof_join

        left, right = frames
        out = {r["lid"]: r["rid"] for r in asof_join(left, right, by=["k"]).collect()}
        # lid 1 @10 matches rid 100 @10 (ties included); lid 2 @20 -> rid 101 @15
        # lid 3 @5 has no earlier purchase -> null
        assert out == {1: 100, 2: 101, 3: None}

    def test_forward_matches_earliest_at_or_after(self, frames):
        from pramen_spark.operators.asof import asof_join

        left, right = frames
        out = {
            r["lid"]: r["rid"]
            for r in asof_join(left, right, by=["k"], direction="forward").collect()
        }
        assert out == {1: 100, 2: None, 3: 102}

    def test_tolerance_nulls_distant_matches(self, frames):
        from pramen_spark.operators.asof import asof_join

        left, right = frames
        out = {
            r["lid"]: r["rid"]
            for r in asof_join(
                left, right, by=["k"], tolerance_seconds=120
            ).collect()
        }
        # lid 2 @20 matched rid 101 @15: 5 min > 2 min tolerance -> nulled
        assert out == {1: 100, 2: None, 3: None}

    def test_no_by_key_global_asof(self, spark, frames):
        from pramen_spark.operators.asof import asof_join

        left, right = frames
        out = asof_join(left, right).collect()
        assert all(r["ts_right"] is not None for r in out if r["lid"] != 3)


class TestRangeJoin:
    @pytest.fixture(scope="class")
    def frames(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

        def ts(m):
            return t0 + dt.timedelta(minutes=m)

        points = spark.createDataFrame(
            [(1, 1, ts(5)), (2, 1, ts(65)), (3, 1, ts(200)), (4, 2, ts(5))],
            "pid long, k long, ts timestamp",
        )
        # interval 10 spans two 1-hour bins (minutes 0..70)
        intervals = spark.createDataFrame(
            [(10, 1, ts(0), ts(70)), (11, 2, ts(100), ts(110))],
            "ivid long, k long, start timestamp, end timestamp",
        )
        return points, intervals

    def test_inner_containment(self, frames):
        from pramen_spark.operators.rangejoin import range_join

        points, intervals = frames
        out = {(r["pid"], r["ivid"]) for r in range_join(
            points, intervals, by=["k"], bin_seconds=3600).collect()}
        assert out == {(1, 10), (2, 10)}  # pid 2 in the interval's 2nd bin

    def test_left_keeps_unmatched(self, frames):
        from pramen_spark.operators.rangejoin import range_join

        points, intervals = frames
        rows = range_join(points, intervals, by=["k"], bin_seconds=3600,
                          how="left", point_id_col="pid").collect()
        got = {r["pid"]: r["ivid"] for r in rows}
        assert got == {1: 10, 2: 10, 3: None, 4: None}
        assert len(rows) == 4  # no duplicate null rows

    def test_left_requires_id(self, frames):
        from pramen_spark.operators.rangejoin import range_join

        points, intervals = frames
        with pytest.raises(ValueError, match="point_id_col"):
            range_join(points, intervals, how="left")

    def test_small_bins_same_result(self, frames):
        from pramen_spark.operators.rangejoin import range_join

        points, intervals = frames
        big = {(r["pid"], r["ivid"]) for r in range_join(
            points, intervals, by=["k"], bin_seconds=3600).collect()}
        small = {(r["pid"], r["ivid"]) for r in range_join(
            points, intervals, by=["k"], bin_seconds=60).collect()}
        assert big == small


class TestSampling:
    @pytest.fixture(scope="class")
    def docs_df(self, spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/documents.parquet")

    def test_hash_sample_deterministic(self, docs_df):
        from pramen_spark.operators.sampling import hash_sample

        a = {r["doc_id"] for r in hash_sample(docs_df, 0.3, "doc_id").collect()}
        b = {r["doc_id"] for r in hash_sample(
            docs_df.repartition(7), 0.3, "doc_id").collect()}
        assert a == b  # invariant to partitioning
        n = docs_df.count()
        assert 0.2 * n < len(a) < 0.4 * n

    def test_salt_gives_independent_samples(self, docs_df):
        from pramen_spark.operators.sampling import hash_sample

        a = {r["doc_id"] for r in hash_sample(docs_df, 0.3, "doc_id", salt="x").collect()}
        b = {r["doc_id"] for r in hash_sample(docs_df, 0.3, "doc_id", salt="y").collect()}
        assert a != b
        # independence: overlap ~ 0.3 * 0.3 of the corpus, not ~0.3
        assert len(a & b) < 0.2 * docs_df.count()

    def test_hash_split_disjoint_and_total(self, docs_df):
        from pramen_spark.operators.sampling import hash_split

        out = hash_split(docs_df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        counts = {r["split"]: r["n"] for r in
                  out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
        n = docs_df.count()
        assert sum(counts.values()) == n  # total coverage, disjoint by CASE
        assert counts["train"] > counts["val"]
        assert counts["train"] > 0.7 * n

    def test_split_fractions_must_sum_to_one(self, docs_df):
        from pramen_spark.operators.sampling import hash_split

        with pytest.raises(ValueError, match="sum to 1"):
            hash_split(docs_df, "doc_id", {"a": 0.5, "b": 0.4})

    def test_stratified_fractions(self, spark):
        from pramen_spark.operators.sampling import stratified_hash_sample

        df = spark.range(2000).selectExpr(
            "id", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS s"
        )
        out = stratified_hash_sample(df, "s", {"a": 0.5, "b": 0.1}, "id")
        counts = {r["s"]: r["n"] for r in
                  out.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert 400 < counts["a"] < 600
        assert 50 < counts["b"] < 150

    def test_length_histogram_buckets(self, spark):
        from pramen_spark.operators.sampling import length_histogram

        df = spark.createDataFrame(
            [(1, " ".join(["w"] * 10)), (2, " ".join(["w"] * 60)), (3, "w")],
            "doc_id long, text string",
        )
        out = {(r["bucket_lo"], r["n_docs"])
               for r in length_histogram(df, "text", bucket_width=50).collect()}
        assert out == {(0, 2), (50, 1)}


class TestSequencePacking:
    @pytest.fixture(scope="class")
    def packed(self, spark, sf_dir):
        from pramen_spark.operators.packing import pack_sequences

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return pack_sequences(docs, budget=512, num_shards=8), docs

    def test_every_doc_assigned_once(self, packed):
        assignments, docs = packed
        assert assignments.count() == docs.count()
        assert assignments.select("doc_id").distinct().count() == docs.count()

    def test_no_pack_exceeds_budget(self, packed):
        from pyspark.sql import functions as F

        assignments, _ = packed
        over = (
            assignments.filter(~F.col("truncated"))
            .groupBy("pack_id").agg(F.sum("n_tokens").alias("tokens"))
            .filter(F.col("tokens") > 512)
        )
        assert over.count() == 0

    def test_truncated_iff_oversized(self, packed):
        from pyspark.sql import functions as F

        assignments, _ = packed
        bad = assignments.filter(
            F.col("truncated") != (F.col("n_tokens") > 512)
        )
        assert bad.count() == 0

    def test_deterministic_across_partitioning(self, spark, sf_dir):
        from pramen_spark.operators.packing import pack_sequences

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = {(r["doc_id"], r["pack_id"])
             for r in pack_sequences(docs, budget=512, num_shards=8).collect()}
        b = {(r["doc_id"], r["pack_id"])
             for r in pack_sequences(
                 docs.repartition(13), budget=512, num_shards=8).collect()}
        assert a == b

    def test_fill_ratio_reasonable(self, spark, packed):
        from pramen_spark.operators.packing import pack_stats
        from pyspark.sql import functions as F

        assignments, _ = packed
        stats = pack_stats(assignments, budget=512)
        # FFD on many docs per shard should fill packs well; all but the
        # tail pack of each shard should be >50% full on average.
        avg = stats.agg(F.avg("fill_ratio")).collect()[0][0]
        assert avg > 0.5


class TestGopherQualityFilter:
    def test_rules_fire_individually(self, spark):
        from pramen_spark.operators.text import gopher_quality_filter

        good = " ".join(
            ["the quick brown fox jumps over that lazy dog with vigor"] * 6
        )  # 60 words, mean len ~4, no symbols/bullets, stopwords present
        docs = [
            (1, good),
            (2, "too short to pass the word count rule with these few"),
            (3, " ".join(["####"] * 60)),  # symbol ratio + no stopwords
            (4, "\n".join(["- bullet point of the list"] * 30)),  # bullets
            (5, good.replace("the", "123").replace("that", "456")
                    .replace("with", "789")),  # kills required stopwords
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        out = {r.doc_id: r for r in gopher_quality_filter(df).collect()}
        assert out[1].keep
        assert not out[2].keep and out[2].n_words < 50
        assert not out[3].keep and out[3].symbol_ratio > 0.1
        assert not out[4].keep and out[4].bullet_line_frac > 0.9
        assert not out[5].keep and out[5].n_required_stopwords < 2

    def test_measurements_exact(self, spark):
        from pramen_spark.operators.text import gopher_quality_filter

        df = spark.createDataFrame(
            [(1, "The cat and the dog ...\n- item one of two\nplain tail")],
            ["doc_id", "text"],
        )
        r = gopher_quality_filter(df).collect()[0]
        assert r.n_words == 13
        assert r.n_required_stopwords == 3  # the, and, of
        assert abs(r.bullet_line_frac - 1 / 3) < 1e-12
        assert abs(r.ellipsis_line_frac - 1 / 3) < 1e-12


class TestCanonicalizeUrls:
    def test_rules(self, spark):
        from pramen_spark.operators.text import canonicalize_urls

        cases = [
            (1, "HTTP://Host.COM:80/p/?utm_source=x#top", "http://host.com/p"),
            (2, "https://a.com:443/x/", "https://a.com/x"),
            (3, "https://a.com/x?a=1&utm_b=2&c=3", "https://a.com/x?a=1&c=3"),
            (4, "https://a.com/x?utm_a=1", "https://a.com/x"),
            (5, "https://a.com/x?fbclid=9&q=2", "https://a.com/x?q=2"),
            (6, "http://a.com:8080/x", "http://a.com:8080/x"),  # non-default port kept
            (7, "not a url", "not a url"),  # passthrough
            (8, "https://A.com", "https://a.com"),
        ]
        df = spark.createDataFrame(
            [(i, u) for i, u, _ in cases], ["doc_id", "url"]
        )
        got = {
            r.doc_id: r.canonical_url
            for r in canonicalize_urls(df).collect()
        }
        for i, _, want in cases:
            assert got[i] == want, (i, got[i], want)


class TestGopherFilterCrossEngine:
    """Property-based Spark-vs-DuckDB parity for the gopher filter: the
    oracle must agree on GENERATED text, not just the fixed corpus — this
    fuzzes the shared regex/tokenizer semantics (whitespace split, line
    split, bullet/ellipsis/symbol patterns) across both engines.

    Alphabet is printable-ASCII words plus the two unicode marks the rules
    reference (•, …): Java regex and RE2 agree there; full-unicode
    casefolding parity is out of scope by design."""

    WORDS = [
        "the", "of", "and", "to", "with", "zebra", "##", "...", "x",
        "- item", "• dot", "end…", "tail...", "a#b", "", "  ",
    ]

    @given(
        texts=st.lists(
            st.lists(st.sampled_from(WORDS), min_size=1, max_size=40)
            .map(" ".join)
            .map(lambda s: s.replace("- item", "\n- item").replace("end…", "end…\n")),
            min_size=1,
            max_size=5,
        )
    )
    @settings(max_examples=10, deadline=None)
    def test_matches_duckdb_oracle(self, spark, texts):
        import duckdb
        import pandas as pd

        from pramen_spark.operators.text import gopher_quality_filter
        from pramen_spark.queries.catalog import QUERIES

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        got = {
            r.doc_id: r.asDict() for r in gopher_quality_filter(df).collect()
        }
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        )
        cur = con.execute(QUERIES["gopher_quality_filter"].oracle)
        cols = [d[0] for d in cur.description]
        for row in cur.fetchall():
            want = dict(zip(cols, row))
            have = got[want["doc_id"]]
            for c in cols:
                assert have[c] == want[c], (want["doc_id"], c, have[c], want[c])
        con.close()


class TestDedupRepresentatives:
    def test_keep_one_per_cluster(self, spark):
        from pramen_spark.operators.graph import (
            connected_components,
            dedup_representatives,
        )

        docs = spark.createDataFrame(
            [(i,) for i in range(1, 8)], ["doc_id"]
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"]
        )
        comps = connected_components(pairs, src="id_a", dst="id_b")
        out = {
            r.doc_id: (r.component, r.keep)
            for r in dedup_representatives(docs, comps).collect()
        }
        assert out == {
            1: (1, True), 2: (1, False), 3: (1, False),
            4: (4, True), 5: (5, True), 6: (5, False), 7: (7, True),
        }


class TestConnectedComponents:
    def test_min_label_components(self, spark):
        from pramen_spark.operators.graph import (
            connected_components,
            dedup_cluster_sizes,
        )

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6), (7, 7), (10, 9), (3, 4)], ["src", "dst"]
        )
        cc = connected_components(edges)
        got = sorted((r.vertex, r.component) for r in cc.collect())
        assert got == [
            (1, 1), (2, 1), (3, 1), (4, 1),
            (5, 5), (6, 5), (7, 7), (9, 9), (10, 9),
        ]
        sizes = sorted(
            (r.component, r.n_members) for r in dedup_cluster_sizes(cc).collect()
        )
        assert sizes == [(1, 4), (5, 2), (7, 1), (9, 2)]

    def test_long_chain_converges(self, spark):
        from pramen_spark.operators.graph import connected_components

        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(20)], ["src", "dst"]
        )
        # force the distributed path: a 20-hop chain is the worst case for
        # per-round propagation (driver union-find would shortcut it)
        cc = connected_components(chain, max_iter=30, driver_max_edges=0)
        assert all(r.component == 0 for r in cc.collect())

    def test_nonconvergence_raises(self, spark):
        import pytest as _pytest
        from pramen_spark.operators.graph import connected_components

        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(10)], ["src", "dst"]
        )
        with _pytest.raises(RuntimeError, match="did not converge"):
            # driver_max_edges=0 forces the distributed propagation path
            # (driver union-find always converges)
            connected_components(chain, max_iter=2, driver_max_edges=0)

    def test_distributed_path_matches_driver_path(self, spark):
        from pramen_spark.operators.graph import connected_components

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6), (7, 7), (10, 9), (3, 4), (4, 1)],
            ["src", "dst"],
        )
        via_driver = sorted(
            (r.vertex, r.component)
            for r in connected_components(edges).collect()
        )
        via_propagation = sorted(
            (r.vertex, r.component)
            for r in connected_components(edges, driver_max_edges=0).collect()
        )
        assert via_driver == via_propagation

    def test_driver_cap_configurable_via_session_conf(self, spark):
        """The union-find edge cap must honor
        spark.pramen.dedup.driverMaxEdges (settable from workflow config's
        spark.conf block); the explicit argument wins over the conf."""
        from pramen_spark.operators.graph import (
            DRIVER_MAX_EDGES_CONF,
            connected_components,
        )

        edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
        spark.conf.set(DRIVER_MAX_EDGES_CONF, "0")
        try:
            # conf=0 forces the distributed path; results identical
            out = sorted(
                (r.vertex, r.component)
                for r in connected_components(edges).collect()
            )
            assert out == [(1, 1), (2, 1), (3, 1)]
            # explicit argument overrides the conf
            out2 = sorted(
                (r.vertex, r.component)
                for r in connected_components(
                    edges, driver_max_edges=1_000_000
                ).collect()
            )
            assert out2 == out
        finally:
            spark.conf.unset(DRIVER_MAX_EDGES_CONF)

    def test_null_edges_dropped(self, spark):
        from pramen_spark.operators.graph import connected_components

        edges = spark.createDataFrame(
            [(1, 2), (None, 3), (4, None)], "src: bigint, dst: bigint"
        )
        got = sorted((r.vertex, r.component) for r in connected_components(edges).collect())
        assert got == [(1, 1), (2, 1)]


class TestMixtureWeights:
    def test_binding_source_and_exact_mixture(self, spark):
        from pramen_spark.operators.sampling import mixture_weights

        # src_a: 1000 tokens, src_b: 100, src_c: 400 (noise, share 0)
        docs = [
            (1, "a", " ".join(["w"] * 1000)),
            (2, "b", " ".join(["w"] * 100)),
            (3, "c", " ".join(["w"] * 400)),
        ]
        df = spark.createDataFrame(docs, ["doc_id", "source", "text"])
        out = {
            r.source: r
            for r in mixture_weights(
                df, {"a": 0.5, "b": 0.5}, group_col="source"
            ).collect()
        }
        # b is binding: 100 tokens at share 0.5 -> budget 200
        assert out["b"].sample_rate == 1.0
        assert out["a"].sample_rate == 100.0 / 1000.0
        assert out["a"].sampled_tokens == out["b"].sampled_tokens == 100.0
        assert out["c"].sample_rate == 0.0 and out["c"].sampled_tokens == 0.0
        # realized mixture matches target shares exactly
        total = sum(r.sampled_tokens for r in out.values())
        assert abs(out["a"].sampled_tokens / total - 0.5) < 1e-12

    def test_no_rate_exceeds_one(self, spark):
        from pramen_spark.operators.sampling import mixture_weights

        docs = [(i, f"s{i % 4}", " ".join(["w"] * (10 + i))) for i in range(20)]
        df = spark.createDataFrame(docs, ["doc_id", "source", "text"])
        rates = [
            r.sample_rate
            for r in mixture_weights(
                df, {"s0": 0.7, "s1": 0.1, "s2": 0.1, "s3": 0.1},
                group_col="source",
            ).collect()
        ]
        assert all(0.0 <= r <= 1.0 for r in rates)
        assert any(r == 1.0 for r in rates)  # something must bind


class TestTokenBudgetMix:
    def _docs(self, spark):
        rows = [
            (i, "en" if i % 2 == 0 else "de", " ".join(["w"] * (3 + i % 7)))
            for i in range(60)
        ]
        return spark.createDataFrame(rows, ["doc_id", "lang", "text"])

    def test_budget_respected_and_cumsum_exact(self, spark):
        from pramen_spark.operators.sampling import sample_to_token_budget

        out = sample_to_token_budget(
            self._docs(spark), {"en": 40, "de": 25}, num_buckets=8
        ).collect()
        by_lang = {}
        for r in out:
            by_lang.setdefault(r.lang, []).append(r)
        for lang, budget in [("en", 40), ("de", 25)]:
            assert max(r.cum_tokens for r in by_lang[lang]) <= budget
            assert sum(r.n_tokens for r in by_lang[lang]) == max(
                r.cum_tokens for r in by_lang[lang]
            )

    def test_bucketed_equals_single_bucket(self, spark):
        """The scalable bucketed plan must select the identical set as a
        single-bucket (i.e. naive-order) run."""
        from pramen_spark.operators.sampling import sample_to_token_budget

        d = self._docs(spark)
        a = {(r.doc_id, r.cum_tokens) for r in
             sample_to_token_budget(d, {"en": 40, "de": 25}, num_buckets=16).collect()}
        b = {(r.doc_id, r.cum_tokens) for r in
             sample_to_token_budget(d, {"en": 40, "de": 25}, num_buckets=1).collect()}
        assert a == b and a

    def test_deterministic_across_partitioning(self, spark):
        from pramen_spark.operators.sampling import sample_to_token_budget

        d = self._docs(spark)
        a = {r.doc_id for r in sample_to_token_budget(d, {}, default_budget=30).collect()}
        b = {r.doc_id for r in
             sample_to_token_budget(d.repartition(13), {}, default_budget=30).collect()}
        assert a == b and a

    def test_zero_budget_group_empty(self, spark):
        from pramen_spark.operators.sampling import sample_to_token_budget

        out = sample_to_token_budget(self._docs(spark), {"en": 40}, default_budget=0)
        assert {r.lang for r in out.collect()} == {"en"}


class TestPiiRedaction:
    def test_redacts_and_counts_each_kind(self, spark):
        from pramen_spark.operators.text import redact_pii

        df = spark.createDataFrame(
            [
                (1, "mail a.b+c@ex-ample.co.uk then 10.20.30.40 and 123-45-6789 call (555) 123-4567 done"),
                (2, "no pii here at all"),
                (3, "two mails x@y.io z@w.net one ip 1.2.3.4"),
            ],
            ["doc_id", "text"],
        )
        out = {r.doc_id: r for r in redact_pii(df).collect()}
        r1 = out[1]
        assert (r1.n_email, r1.n_ipv4, r1.n_ssn, r1.n_phone) == (1, 1, 1, 1)
        assert r1.n_pii_total == 4
        assert "<EMAIL>" in r1.text and "<IPV4>" in r1.text
        assert "<SSN>" in r1.text and "<PHONE>" in r1.text
        assert "a.b+c@" not in r1.text and "10.20.30.40" not in r1.text
        r2 = out[2]
        assert r2.n_pii_total == 0 and r2.text == "no pii here at all"
        r3 = out[3]
        assert (r3.n_email, r3.n_ipv4) == (2, 1)

    def test_ssn_redacted_before_phone_cannot_eat_it(self, spark):
        """The SSN pattern (ddd-dd-dddd) must win over the phone pattern
        for SSN-shaped strings — pattern order in PII_PATTERNS."""
        from pramen_spark.operators.text import redact_pii

        df = spark.createDataFrame([(1, "ssn 987-65-4321 end")], ["doc_id", "text"])
        r = redact_pii(df).collect()[0]
        assert r.n_ssn == 1 and r.n_phone == 0
        assert "<SSN>" in r.text


class TestDomainHistogram:
    def test_extracts_and_aggregates_domains(self, spark):
        from pramen_spark.operators.text import domain_histogram, url_domains

        df = spark.createDataFrame(
            [
                (1, "see https://A.example.com/x and http://b.org/y"),
                (2, "again https://a.EXAMPLE.com plain text"),
                (3, "no urls"),
            ],
            ["doc_id", "text"],
        )
        doms = {(r.doc_id, r.domain) for r in url_domains(df).collect()}
        assert doms == {(1, "a.example.com"), (1, "b.org"), (2, "a.example.com")}
        hist = {r.domain: (r.n_mentions, r.n_docs) for r in domain_histogram(df).collect()}
        assert hist == {"a.example.com": (2, 2), "b.org": (1, 1)}


class TestLineDedup:
    def test_strips_boilerplate_keeps_unique(self, spark):
        from pramen_spark.operators.dedup import line_dedup

        docs = [
            (1, "HEADER\nalpha one\nFOOTER"),
            (2, "HEADER\nbeta two\nFOOTER"),
            (3, "HEADER\ngamma three\nFOOTER"),
            (4, "HEADER\nalpha one\nFOOTER"),  # body dup of doc 1 (2 docs: kept)
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        out = {r.doc_id: r for r in line_dedup(df, max_line_docs=2).collect()}
        # HEADER/FOOTER occur in 4 docs -> stripped everywhere
        assert out[1].text == "alpha one" and out[2].text == "beta two"
        assert out[1].n_lines_kept == 1 and out[1].n_lines_removed == 2
        # a line in exactly 2 docs survives the default threshold
        assert out[4].text == "alpha one"

    def test_fully_boilerplate_doc_drops_out(self, spark):
        from pramen_spark.operators.dedup import line_dedup

        docs = [(i, "SAME\nSAME2") for i in range(1, 5)]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        assert line_dedup(df, max_line_docs=2).count() == 0

    def test_regex_metachar_separator(self, spark):
        # line_sep is a LITERAL: '|' must split on pipes (F.split takes a
        # regex, so the separator is escaped) and rejoin with pipes
        from pramen_spark.operators.dedup import line_dedup

        docs = [
            (1, "keep1|BOILER|keep2"),
            (2, "BOILER|x"),
            (3, "BOILER|y"),
            (4, "BOILER|z"),
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        out = {
            r.doc_id: r
            for r in line_dedup(df, max_line_docs=2, line_sep="|").collect()
        }
        assert out[1].text == "keep1|keep2"
        assert out[1].n_lines_kept == 2 and out[1].n_lines_removed == 1
        assert out[2].text == "x"

    def test_order_preserved_across_many_lines(self, spark):
        from pramen_spark.operators.dedup import line_dedup

        body = "\n".join(f"line {i}" for i in range(25))
        df = spark.createDataFrame(
            [(1, f"BOILER\n{body}"), (2, "BOILER\nx"), (3, "BOILER\ny")],
            ["doc_id", "text"],
        )
        out = {r.doc_id: r for r in line_dedup(df, max_line_docs=2).collect()}
        assert out[1].text == body  # 25 lines back in original order
        assert out[1].n_lines_removed == 1


class TestParagraphDedup:
    def test_keep_first_occurrence_only(self, spark):
        from pramen_spark.operators.dedup import paragraph_dedup

        docs = [
            (1, "shared intro\n\nbody one"),
            (2, "shared intro\n\nbody two"),
            (3, "body one\n\nbody three"),  # "body one" first seen in doc 1
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        out = {r.doc_id: r for r in paragraph_dedup(df).collect()}
        # doc 1 is the global first occurrence of both its paragraphs
        assert out[1].text == "shared intro\n\nbody one"
        assert out[1].n_paras_kept == 2 and out[1].n_paras_removed == 0
        # later copies are removed, unlike line_dedup's strip-everywhere
        assert out[2].text == "body two"
        assert out[2].n_paras_removed == 1
        assert out[3].text == "body three"

    def test_fully_duplicate_doc_drops_out(self, spark):
        from pramen_spark.operators.dedup import paragraph_dedup

        docs = [(1, "a\n\nb"), (2, "a\n\nb"), (3, "b\n\na")]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        out = {r.doc_id: r for r in paragraph_dedup(df).collect()}
        assert 2 not in out  # every paragraph already seen in doc 1
        assert out[1].text == "a\n\nb"
        # doc 3 re-orders the same paragraphs -> both already seen
        assert 3 not in out

    def test_within_doc_repeat_collapses(self, spark):
        from pramen_spark.operators.dedup import paragraph_dedup

        df = spark.createDataFrame(
            [(1, "x\n\nx\n\ny")], ["doc_id", "text"]
        )
        row = paragraph_dedup(df).collect()[0]
        assert row.text == "x\n\ny"
        assert row.n_paras_kept == 2 and row.n_paras_removed == 1

    def test_no_duplicates_is_identity(self, spark):
        from pramen_spark.operators.dedup import paragraph_dedup

        docs = [(i, f"alpha {i}\n\nbeta {i}") for i in range(1, 6)]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        out = {r.doc_id: r for r in paragraph_dedup(df).collect()}
        assert len(out) == 5
        for i in range(1, 6):
            assert out[i].text == f"alpha {i}\n\nbeta {i}"
            assert out[i].n_paras_removed == 0


class TestMinhashDedupAgainst:
    SEEN = [
        (1, "the quick brown fox jumps over the lazy dog again and again today"),
        (2, "completely different content about spark physical plans and shuffles"),
    ]
    BATCH = [
        (10, "the quick brown fox jumps over the lazy dog again and again today"),
        (11, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
        (12, "novel text that resembles nothing else in this tiny corpus at all"),
        (13, "novel text that resembles nothing else in this tiny corpus at all"),
        (14, "another unique document with its own words and phrasing entirely"),
    ]

    def _frames(self, spark):
        return (
            spark.createDataFrame(self.SEEN, ["doc_id", "text"]),
            spark.createDataFrame(self.BATCH, ["doc_id", "text"]),
        )

    def test_drops_index_near_dups_and_batch_dups(self, spark):
        from pramen_spark.operators.dedup import (
            minhash_dedup_against,
            minhash_signatures,
        )

        seen, batch = self._frames(spark)
        idx = minhash_signatures(seen, num_hashes=64)
        out = minhash_dedup_against(
            batch, idx, num_hashes=64, num_bands=32, threshold=0.5
        )
        # 10 = exact dup of 1; 11 = near dup of 1; 13 = within-batch dup of 12
        assert sorted(r.doc_id for r in out.collect()) == [12, 14]
        assert "signature" in out.columns  # survivors carry their index rows

    def test_exact_mode_matches_estimate_here(self, spark):
        from pramen_spark.operators.dedup import (
            minhash_dedup_against,
            minhash_signatures,
        )

        seen, batch = self._frames(spark)
        idx = minhash_signatures(seen, num_hashes=64)
        exact = minhash_dedup_against(
            batch, idx, num_hashes=64, num_bands=32, threshold=0.5,
            verify="exact", seen_text=seen,
        )
        assert sorted(r.doc_id for r in exact.collect()) == [12, 14]

    def test_chained_runs_admit_each_content_once(self, spark):
        """Run 2's survivors append to the index; run 3 of all-seen text
        admits nothing."""
        from pramen_spark.operators.dedup import (
            minhash_dedup_against,
            minhash_signatures,
        )

        seen, batch = self._frames(spark)
        idx = minhash_signatures(seen, num_hashes=64)
        out = minhash_dedup_against(
            batch, idx, num_hashes=64, num_bands=32, threshold=0.5
        )
        idx2 = idx.unionByName(out.select("doc_id", "signature"))
        rerun = spark.createDataFrame(
            [(20, self.BATCH[2][1]), (21, self.SEEN[1][1])], ["doc_id", "text"]
        )
        out2 = minhash_dedup_against(
            rerun, idx2, num_hashes=64, num_bands=32, threshold=0.5
        )
        assert out2.count() == 0

    def test_exact_requires_seen_text(self, spark):
        from pramen_spark.operators.dedup import minhash_dedup_against

        seen, batch = self._frames(spark)
        with pytest.raises(ValueError, match="seen_text"):
            minhash_dedup_against(batch, seen, verify="exact")


class TestNgramNovelty:
    def test_shared_grams_lower_novelty(self, spark):
        from pramen_spark.operators.dedup import ngram_novelty

        docs = [
            (1, "a b c d"),            # grams: "a b c", "b c d"
            (2, "x a b c y"),          # shares "a b c" with doc 1
            (3, "p q r s t"),          # fully novel
            (4, "zz"),                 # too short: no grams, drops out
        ]
        out = {
            r.doc_id: r
            for r in ngram_novelty(
                spark.createDataFrame(docs, ["doc_id", "text"]), n=3
            ).collect()
        }
        assert out[1].n_grams == 2 and out[1].n_novel == 1
        assert out[1].novelty_ratio == 0.5
        assert out[2].n_grams == 3 and out[2].n_novel == 2
        assert out[3].novelty_ratio == 1.0
        assert 4 not in out

    def test_within_doc_repeat_counts_once(self, spark):
        """Per-doc grams are DISTINCT: a doc repeating its own gram does
        not raise that gram's corpus doc-frequency above 1."""
        from pramen_spark.operators.dedup import ngram_novelty

        df = spark.createDataFrame([(1, "a b c a b c")], ["doc_id", "text"])
        row = ngram_novelty(df, n=3).collect()[0]
        # distinct grams: "a b c", "b c a", "c a b" -> all df=1
        assert row.n_grams == 3 and row.novelty_ratio == 1.0


class TestSnapshotDiff:
    def test_all_four_statuses(self, spark):
        from pramen_spark.operators.drift import snapshot_diff

        old = spark.createDataFrame(
            [(1, "same"), (2, "will change"), (3, "will vanish")],
            ["doc_id", "text"],
        )
        new = spark.createDataFrame(
            [(1, "same"), (2, "changed!"), (4, "brand new")],
            ["doc_id", "text"],
        )
        got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
        assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}

    def test_identical_snapshots_all_unchanged(self, spark):
        from pramen_spark.operators.drift import snapshot_diff

        d = spark.createDataFrame([(i, f"t{i}") for i in range(20)], ["doc_id", "text"])
        out = snapshot_diff(d, d).collect()
        assert len(out) == 20 and all(r.status == "unchanged" for r in out)


class TestHashLedgerBucketing:
    def test_ledger_side_joins_without_exchange(self, spark):
        """The persisted ledger is bucketed by text_hash: the incremental
        anti-join must shuffle ONLY the new batch — at 100 TB reshuffling
        the ledger every batch is the scale killer."""
        import re

        from pramen_spark.operators.dedup import dedup_against, persist_hash_ledger

        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.sql("DROP TABLE IF EXISTS ledger_bucket_test")
        try:
            docs = spark.createDataFrame(
                [(i, f"text {i % 300}") for i in range(400)], ["doc_id", "text"]
            )
            persist_hash_ledger(
                docs.filter("doc_id < 200"), "ledger_bucket_test", n_buckets=8
            )
            batch = docs.filter("doc_id >= 200")
            out = dedup_against(
                batch, spark.table("ledger_bucket_test"), seen_hash_col="text_hash"
            )
            plan = out._sc._jvm.PythonSQLUtils.explainString(
                out._jdf.queryExecution(), "formatted"
            )
            assert "Bucketed: true" in plan, plan
            # exactly one exchange: the batch side; ledger streams in place
            assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
            # correctness unchanged: texts 0..299 exist in doc_id<200 for
            # ids 200..299's texts (200..299 % 300); fresh = 100 new texts
            got = sorted(r.doc_id for r in out.collect())
            want = sorted(
                i for i in range(200, 400) if (i % 300) >= 200 and i == (i % 300)
            )
            assert got == want, (got[:10], want[:10])
        finally:
            spark.sql("DROP TABLE IF EXISTS ledger_bucket_test")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)

    def test_append_extends_same_bucket_spec(self, spark):
        """Chained runs: run N's fresh hashes append into the ledger; run
        N+1 must not re-admit anything from run N."""
        from pramen_spark.operators.dedup import dedup_against, persist_hash_ledger

        spark.sql("DROP TABLE IF EXISTS ledger_chain_test")
        try:
            b1 = spark.createDataFrame(
                [(1, "alpha"), (2, "beta")], ["doc_id", "text"]
            )
            persist_hash_ledger(b1, "ledger_chain_test", n_buckets=4)
            b2 = spark.createDataFrame(
                [(3, "alpha"), (4, "gamma"), (5, "gamma")], ["doc_id", "text"]
            )
            fresh2 = dedup_against(b2, spark.table("ledger_chain_test"),
                                   seen_hash_col="text_hash")
            assert sorted(r.doc_id for r in fresh2.collect()) == [4]
            # append run-2 survivors, then a run-3 batch of all-seen texts
            persist_hash_ledger(fresh2, "ledger_chain_test", n_buckets=4,
                                hash_col="text_hash")
            b3 = spark.createDataFrame(
                [(6, "gamma"), (7, "beta")], ["doc_id", "text"]
            )
            fresh3 = dedup_against(b3, spark.table("ledger_chain_test"),
                                   seen_hash_col="text_hash")
            assert fresh3.count() == 0
        finally:
            spark.sql("DROP TABLE IF EXISTS ledger_chain_test")


class TestSubstringDedup:
    def test_later_copies_of_span_removed(self, spark):
        from pramen_spark.operators.dedup import substring_dedup

        docs = [
            (1, "a b c d e unique one"),
            (2, "pre two a b c d e post two"),
            (3, "three a b c d e and a b c d e again"),
            (4, "nothing shared here at all"),
        ]
        out = {
            r.doc_id: r
            for r in substring_dedup(
                spark.createDataFrame(docs, ["doc_id", "text"]), n=5
            ).collect()
        }
        assert out[1].text == "a b c d e unique one"  # first copy keeps
        assert out[2].text == "pre two post two" and out[2].n_tokens_removed == 5
        # both of doc 3's copies are later than doc 1's
        assert out[3].text == "three and again" and out[3].n_tokens_removed == 10
        assert out[4].n_tokens_removed == 0

    def test_long_run_fully_covered_by_overlapping_grams(self, spark):
        from pramen_spark.operators.dedup import substring_dedup

        run = " ".join(f"w{i}" for i in range(12))
        docs = [(1, f"{run} one"), (2, f"two {run}")]
        out = {
            r.doc_id: r
            for r in substring_dedup(
                spark.createDataFrame(docs, ["doc_id", "text"]), n=4
            ).collect()
        }
        assert out[1].text == f"{run} one"
        assert out[2].text == "two" and out[2].n_tokens_removed == 12

    def test_fully_duplicate_doc_drops_out(self, spark):
        from pramen_spark.operators.dedup import substring_dedup

        docs = [(1, "x y z w v"), (2, "x y z w v")]
        out = {
            r.doc_id: r
            for r in substring_dedup(
                spark.createDataFrame(docs, ["doc_id", "text"]), n=5
            ).collect()
        }
        assert out[1].text == "x y z w v" and 2 not in out

    def test_short_docs_pass_through(self, spark):
        from pramen_spark.operators.dedup import substring_dedup

        docs = [(1, "too short"), (2, "too short"), (3, "")]
        out = {
            r.doc_id: r
            for r in substring_dedup(
                spark.createDataFrame(docs, ["doc_id", "text"]), n=8
            ).collect()
        }
        # below the n-gram floor nothing is marked; empty doc drops out
        assert out[1].text == "too short" and out[2].text == "too short"
        assert 3 not in out

    @staticmethod
    def _ref(docs, n):
        """Sequential reference: global keep-first over (doc_id, pos)."""
        seen = set()
        out = {}
        for i, text in sorted(docs):
            t = text.split()
            marked = set()
            for p in range(max(0, len(t) - n + 1)):
                g = " ".join(t[p : p + n])
                if g in seen:
                    marked.update(range(p, p + n))
                else:
                    seen.add(g)
            kept = [tok for j, tok in enumerate(t) if j not in marked]
            if kept:
                out[i] = (" ".join(kept), len(kept), len(t) - len(kept))
        return out

    @given(
        docs=st.lists(
            st.lists(
                st.sampled_from(["a", "b", "c", "dd", "e1"]), min_size=0, max_size=14
            ).map(" ".join),
            min_size=1,
            max_size=8,
        )
    )
    @settings(max_examples=15, deadline=None)
    def test_matches_sequential_reference(self, spark, docs):
        from pramen_spark.operators.dedup import substring_dedup

        rows = [(i, t) for i, t in enumerate(docs)]
        got = {
            r.doc_id: (r.text, r.n_tokens_kept, r.n_tokens_removed)
            for r in substring_dedup(
                spark.createDataFrame(rows, "doc_id long, text string"), n=3
            ).collect()
        }
        assert got == self._ref(rows, 3)


class TestValidateExpectations:
    def test_all_rule_kinds_count_violations(self, spark):
        from pramen_spark.operators.validation import validate_expectations

        df = spark.createDataFrame(
            [
                (1, "en", 5, "hello"),
                (1, "EN", -1, "x"),        # dup id, bad lang, out of range
                (None, "de", 3, "abc"),    # null id
                (4, "fr", 2, "ab"),
            ],
            ["id", "lang", "n", "text"],
        )
        out = {
            r.rule: r
            for r in validate_expectations(
                df,
                [
                    ("id_not_null", "not_null", {"col": "id"}),
                    ("id_unique", "unique", {"col": "id"}),
                    ("n_in_range", "in_range", {"col": "n", "lo": 0, "hi": 10}),
                    ("lang_iso2", "matches", {"col": "lang", "pattern": r"^[a-z]{2}$"}),
                    ("len_matches", "predicate", {"sql": "n = length(text)"}),
                ],
            ).collect()
        }
        assert out["id_not_null"].violations == 1 and not out["id_not_null"].passed
        # 4 rows, 3 distinct id values (1, None, 4) -> 1 duplicate
        assert out["id_unique"].violations == 1
        assert out["n_in_range"].violations == 1
        assert out["lang_iso2"].violations == 1
        # rows where n != length(text): (1,5,'hello') ok, (1,-1,'x') bad,
        # (None,3,'abc') ok, (4,2,'ab') ok
        assert out["len_matches"].violations == 1

    def test_clean_input_passes_all(self, spark):
        from pramen_spark.operators.validation import validate_expectations

        df = spark.createDataFrame([(1, 2), (2, 3)], ["a", "b"])
        out = validate_expectations(
            df,
            [
                ("a_not_null", "not_null", {"col": "a"}),
                ("a_unique", "unique", {"col": "a"}),
                ("a_lt_b", "predicate", {"sql": "a < b"}),
            ],
        ).collect()
        assert all(r.passed and r.violations == 0 for r in out)
        assert [r.rule for r in out] == ["a_not_null", "a_unique", "a_lt_b"]

    def test_unknown_kind_raises(self, spark):
        from pramen_spark.operators.validation import validate_expectations

        df = spark.createDataFrame([(1,)], ["a"])
        with pytest.raises(ValueError):
            validate_expectations(df, [("x", "nope", {})])

    def test_matches_is_full_string(self, spark):
        """An UNANCHORED pattern must still match the full string — rlike
        alone is a substring search, which silently under-counts."""
        from pramen_spark.operators.validation import validate_expectations

        df = spark.createDataFrame(
            [("ab",), ("xxabxx",), ("ab ab",)], ["lang"]
        )
        out = validate_expectations(
            df, [("shape", "matches", {"col": "lang", "pattern": "[a-z]{2}"})]
        ).collect()
        # only "ab" is a full-string match; the other two violate
        assert out[0].violations == 2

    def test_rule_name_injection_rejected(self, spark):
        """Rule names reach a SQL pivot expression; quotes/backticks from
        config must be rejected, not interpolated."""
        from pramen_spark.operators.validation import validate_expectations

        df = spark.createDataFrame([(1,)], ["a"])
        for bad in ("x', a), ('y", "x`), (`a", "a b", ""):
            with pytest.raises(ValueError, match="rule name"):
                validate_expectations(df, [(bad, "not_null", {"col": "a"})])


class TestDedupAgainst:
    def test_anti_join_and_within_batch_collapse(self, spark):
        from pramen_spark.operators.dedup import dedup_against

        seen = spark.createDataFrame(
            [(1, "already ingested"), (2, "old news")], ["doc_id", "text"]
        )
        batch = spark.createDataFrame(
            [
                (10, "already ingested"),  # seen before -> dropped
                (11, "brand new"),
                (12, "brand new"),  # within-batch dup -> keep-min (11)
                (13, "also new"),
            ],
            ["doc_id", "text"],
        )
        out = dedup_against(batch, seen).collect()
        assert sorted(r.doc_id for r in out) == [11, 13]
        assert all(len(r.text_hash) == 64 for r in out)

    def test_hash_ledger_input(self, spark):
        from pyspark.sql import functions as F

        from pramen_spark.operators.dedup import dedup_against

        prior = spark.createDataFrame([("x",), ("y",)], ["text"]).select(
            F.sha2("text", 256).alias("h")
        )
        batch = spark.createDataFrame(
            [(1, "x"), (2, "z")], ["doc_id", "text"]
        )
        out = dedup_against(batch, prior, seen_hash_col="h").collect()
        assert [r.doc_id for r in out] == [2]

    def test_chained_runs_admit_each_content_once(self, spark):
        from pramen_spark.operators.dedup import dedup_against

        run1 = spark.createDataFrame([(1, "a"), (2, "b")], ["doc_id", "text"])
        empty = run1.filter("doc_id < 0")
        kept1 = dedup_against(run1, empty)
        run2 = spark.createDataFrame([(3, "b"), (4, "c")], ["doc_id", "text"])
        ledger = kept1.select("text_hash")
        kept2 = dedup_against(run2, ledger, seen_hash_col="text_hash")
        assert sorted(r.doc_id for r in kept2.collect()) == [4]


class TestUpsampleToEpochs:
    def test_integer_epochs_exact_copies(self, spark):
        from pramen_spark.operators.sampling import upsample_to_epochs

        df = spark.createDataFrame(
            [(i, "a" if i < 10 else "b") for i in range(20)],
            ["doc_id", "source"],
        )
        out = upsample_to_epochs(df, {"a": 3.0, "b": 1.0}, key_col="doc_id").collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r.source, []).append(r)
        assert len(by_src["a"]) == 30 and len(by_src["b"]) == 10
        # copy indices are 0..n-1 per document
        copies = sorted(r.copy_idx for r in by_src["a"] if r.doc_id == 0)
        assert copies == [0, 1, 2]

    def test_fractional_epochs_replicate_right_fraction(self, spark):
        from pramen_spark.operators.sampling import upsample_to_epochs

        df = spark.createDataFrame(
            [(i, "a") for i in range(400)], ["doc_id", "source"]
        )
        out = upsample_to_epochs(df, {"a": 1.5}).collect()
        # ~50% of docs get the extra copy (hash-chosen); tolerance for 400 keys
        assert 560 <= len(out) <= 640
        a = sorted((r.doc_id, r.copy_idx) for r in out)
        b = sorted(
            (r.doc_id, r.copy_idx)
            for r in upsample_to_epochs(df, {"a": 1.5}).collect()
        )
        assert a == b  # deterministic

    def test_zero_epochs_drops_group(self, spark):
        from pramen_spark.operators.sampling import upsample_to_epochs

        df = spark.createDataFrame(
            [(1, "keep"), (2, "drop")], ["doc_id", "source"]
        )
        out = upsample_to_epochs(df, {"keep": 1.0, "drop": 0.0}).collect()
        assert [r.doc_id for r in out] == [1]


class TestSemDedup:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, ["vec_id", "embedding"])

    def test_single_cluster_keep_first(self, spark):
        from pramen_spark.operators.similarity import semdedup

        rows = [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.01, 0.0, 0.0]),  # near-dup of 1 -> dropped
            (3, [0.0, 1.0, 0.0, 0.0]),   # orthogonal -> kept
            (4, [0.0, 1.0, 0.01, 0.0]),  # near-dup of 3 -> dropped
        ]
        out = {
            r.vec_id: r.keep
            for r in semdedup(self._df(spark, rows), threshold=0.95, nlist=1).collect()
        }
        assert out == {1: True, 2: False, 3: True, 4: False}

    def test_clustered_run_is_deterministic(self, spark):
        import numpy as np

        from pramen_spark.operators.similarity import semdedup

        rng = np.random.RandomState(7)
        rows = [(i, (rng.normal(size=8)).tolist()) for i in range(60)]
        df = self._df(spark, rows)
        a = sorted(semdedup(df, threshold=0.9, nlist=4).collect())
        b = sorted(semdedup(df, threshold=0.9, nlist=4).collect())
        assert a == b
        assert len(a) == 60
        # cells are within range and every vector got a verdict
        assert {r.cell for r in a} <= set(range(4))

    def test_max_cluster_size_guard_keeps_all(self, spark):
        from pramen_spark.operators.similarity import semdedup

        rows = [(i, [1.0, float(i) * 1e-4, 0.0, 0.0]) for i in range(10)]
        out = semdedup(
            self._df(spark, rows), threshold=0.95, nlist=1, max_cluster_size=5
        ).collect()
        # oversized cluster skips scoring: conservative keep-everything
        assert all(r.keep for r in out)


class TestShardExport:
    def test_assignment_deterministic_and_complete(self, spark):
        from pramen_spark.operators.sampling import assign_shards

        df = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(200)], ["doc_id", "text"]
        )
        a = {r.doc_id: r.shard_id for r in assign_shards(df, 8).collect()}
        b = {r.doc_id: r.shard_id for r in assign_shards(df, 8).collect()}
        assert a == b
        assert set(a.values()) <= set(range(8))
        # every shard gets some docs at this size (uniform hash)
        assert len(set(a.values())) == 8

    def test_writer_round_trip(self, spark, tmp_path):
        import os

        from pramen_spark.sinks.shard_sink import write_training_shards

        df = spark.createDataFrame(
            [(i, f"text {i}") for i in range(100)], ["doc_id", "text"]
        )
        out = str(tmp_path / "shards")
        n = write_training_shards(df, out, n_shards=4)
        assert n == 100
        dirs = sorted(
            d for d in os.listdir(out) if d.startswith("shard_id=")
        )
        assert dirs == [f"shard_id={i}" for i in range(4)]
        back = spark.read.parquet(out)
        assert back.count() == 100
        assert {r.doc_id for r in back.select("doc_id").collect()} == set(range(100))

    def test_append_counts_only_new_rows(self, spark, tmp_path):
        """'rows written' must be THIS call's rows: a post-write re-read
        would include pre-existing rows under mode='append'."""
        from pramen_spark.sinks.shard_sink import write_training_shards

        out = str(tmp_path / "shards")
        df1 = spark.createDataFrame([(i, f"t{i}") for i in range(60)], ["doc_id", "text"])
        df2 = spark.createDataFrame([(i, f"t{i}") for i in range(60, 100)], ["doc_id", "text"])
        assert write_training_shards(df1, out, n_shards=4) == 60
        assert write_training_shards(df2, out, n_shards=4, mode="append") == 40
        assert spark.read.parquet(out).count() == 100

    def test_empty_input_writes_zero(self, spark, tmp_path):
        """An empty write leaves no parquet data files; the count must not
        depend on re-reading them."""
        from pramen_spark.sinks.shard_sink import write_training_shards

        df = spark.createDataFrame([], "doc_id long, text string")
        n = write_training_shards(df, str(tmp_path / "empty"), n_shards=4)
        assert n == 0

    def test_sink_contract(self, spark, tmp_path):
        import datetime as dt

        from pramen_spark.sinks import ShardSink

        df = spark.createDataFrame(
            [(i, f"text {i}") for i in range(50)], ["doc_id", "text"]
        )
        sink = ShardSink(spark, {"path": str(tmp_path), "shards": 2})
        n = sink.send(df, "corpus", dt.date(2026, 8, 14), {})
        assert n == 50
        back = spark.read.parquet(str(tmp_path / "corpus" / "2026-08-14"))
        assert back.count() == 50


class TestQualityClassifier:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_score_shape_and_determinism(self, spark):
        from pramen_spark.operators.text import quality_classifier_score

        df = self._df(spark, [(1, "the quick brown fox"), (2, "lorem ipsum dolor sit amet")])
        a = {r.doc_id: r for r in quality_classifier_score(df).collect()}
        b = {r.doc_id: r for r in quality_classifier_score(df.repartition(7)).collect()}
        for i in (1, 2):
            assert a[i].quality_score == b[i].quality_score  # order/partition invariant
            assert 0.0 < a[i].quality_score < 1.0
            # unigrams + bigrams
        assert a[1].n_features == 4 + 3
        assert a[2].n_features == 5 + 4

    def test_empty_and_single_token(self, spark):
        from pramen_spark.operators.text import quality_classifier_score

        df = self._df(spark, [(1, ""), (2, "   "), (3, "word"), (4, "!!!")])
        out = {r.doc_id: r for r in quality_classifier_score(df, bias=0.0).collect()}
        for i in (1, 2, 4):  # no features -> sigmoid(bias) = 0.5
            assert out[i].n_features == 0 and out[i].quality_score == 0.5
        assert out[3].n_features == 1

    def test_bias_shifts_scores(self, spark):
        from pramen_spark.operators.text import quality_classifier_score

        df = self._df(spark, [(1, "some ordinary text here")])
        lo = quality_classifier_score(df, bias=-2.0).collect()[0].quality_score
        hi = quality_classifier_score(df, bias=2.0).collect()[0].quality_score
        assert lo < 0.3 < 0.7 < hi

    def test_custom_weights_table(self, spark):
        """A trained table (bucket -> weight) drives the score; buckets
        absent from the table contribute 0."""
        from pramen_spark.operators.text import quality_classifier_score

        df = self._df(spark, [(1, "good good"), (2, "zzqx zzqx")])
        # find the buckets the features land in, then weight them apart
        feats = quality_classifier_score(df)  # default run to smoke
        assert feats.count() == 2
        import hashlib

        def bucket(t, B=1024):
            return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % B

        w = {bucket("good"): 4.0, bucket("good_good"): 4.0,
             bucket("zzqx"): -4.0, bucket("zzqx_zzqx"): -4.0}
        out = {r.doc_id: r for r in
               quality_classifier_score(df, weights=w).collect()}
        assert out[1].keep and out[1].quality_score > 0.9
        assert not out[2].keep and out[2].quality_score < 0.1

    def test_threshold_gates_keep(self, spark):
        from pramen_spark.operators.text import quality_classifier_score

        df = self._df(spark, [(1, "anything at all")])
        keep_all = quality_classifier_score(df, threshold=0.0).collect()[0]
        keep_none = quality_classifier_score(df, threshold=1.01).collect()[0]
        assert keep_all.keep and not keep_none.keep


class TestQualityClassifierCrossEngine:
    """Property-based Spark-vs-DuckDB parity for the classifier: the
    oracle must agree on GENERATED text — fuzzes the shared tokenizer
    (lowercase, non-alnum collapse), the md5 bucket hash, and the exact
    integer weight fold across both engines."""

    WORDS = ["the", "Fox", "123", "a-b", "x!", "", "  ", "Über", "naïve", "##"]

    @given(
        texts=st.lists(
            st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join),
            min_size=1,
            max_size=5,
        )
    )
    @settings(max_examples=10, deadline=None)
    def test_matches_duckdb_oracle(self, spark, texts):
        import duckdb
        import pandas as pd

        from pramen_spark.operators.text import quality_classifier_score
        from pramen_spark.queries.catalog import QUERIES

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {
            r.doc_id: r.asDict()
            for r in quality_classifier_score(df).collect()
        }
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        )
        cur = con.execute(QUERIES["quality_classifier"].oracle)
        cols = [d[0] for d in cur.description]
        for row in cur.fetchall():
            want = dict(zip(cols, row))
            have = got[want["doc_id"]]
            for c in cols:
                assert have[c] == want[c], (want["doc_id"], c, have[c], want[c])
        con.close()


class TestCharLmScore:
    def test_outlier_scores_higher_than_typical(self, spark):
        from pramen_spark.operators.text import char_lm_score

        typical = [
            (i, f"the quick brown fox jumps over the lazy dog number {i}")
            for i in range(1, 9)
        ]
        docs = typical + [(99, "zq xv qz jx vq zx qj xq vz jq")]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        out = {r.doc_id: r.bits_per_char for r in char_lm_score(df).collect()}
        typical_max = max(out[i] for i in range(1, 9))
        assert out[99] > typical_max  # gibberish is atypical under the corpus LM

    def test_deterministic_and_short_docs_excluded(self, spark):
        from pramen_spark.operators.text import char_lm_score

        docs = [(1, "hello world"), (2, "hello there"), (3, "x")]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        a = sorted(char_lm_score(df).collect())
        b = sorted(char_lm_score(df).collect())
        assert a == b
        ids = {r.doc_id for r in a}
        assert ids == {1, 2}  # single-char doc has no bigrams

    def test_bigram_count_matches_capped_length(self, spark):
        from pramen_spark.operators.text import char_lm_score

        df = spark.createDataFrame([(1, "abcdefghij")], ["doc_id", "text"])
        row = char_lm_score(df, max_chars=5).collect()[0]
        assert row.n_bigrams == 4  # 5 chars -> 4 transitions


class TestChunkDocuments:
    def test_windows_and_overlap(self, spark):
        from pramen_spark.operators.text import chunk_documents

        df = spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(10))), (2, "short doc")],
            ["doc_id", "text"],
        )
        out = chunk_documents(df, chunk_tokens=6, overlap_tokens=2)
        rows = sorted(
            ((r.doc_id, r.chunk_id, r.text, r.n_tokens) for r in out.collect())
        )
        # doc 1: 10 tokens, stride 4 -> starts 0, 4 -> chunks of 6 and 6
        assert rows[0] == (1, 0, "w0 w1 w2 w3 w4 w5", 6)
        assert rows[1] == (1, 1, "w4 w5 w6 w7 w8 w9", 6)
        # doc 2: shorter than one chunk -> exactly one (short) chunk
        assert rows[2] == (2, 0, "short doc", 2)

    def test_case_and_content_preserved(self, spark):
        from pramen_spark.operators.text import chunk_documents

        df = spark.createDataFrame([(1, "Hello WORLD Mixed Case")], ["doc_id", "text"])
        r = chunk_documents(df, chunk_tokens=10, overlap_tokens=0).collect()[0]
        assert r.text == "Hello WORLD Mixed Case"

    def test_overlap_must_be_smaller(self, spark):
        import pytest as _pytest

        from pramen_spark.operators.text import chunk_documents

        df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        with _pytest.raises(ValueError):
            chunk_documents(df, chunk_tokens=4, overlap_tokens=4)


class TestCurationProperties:
    """Property-based invariants (hypothesis) for the newest curation
    operators, mirroring the reference's property-test strategy
    (SURVEY.md §5)."""

    @staticmethod
    def _docs(spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )

    @given(
        texts=st.lists(
            st.lists(
                st.sampled_from(["alpha", "beta", "gamma", "delta", "X1", "y2"]),
                min_size=1,
                max_size=30,
            ).map(" ".join),
            min_size=1,
            max_size=6,
        ),
        chunk=st.integers(min_value=2, max_value=8),
        overlap=st.integers(min_value=0, max_value=3),
    )
    @settings(max_examples=12, deadline=None)
    def test_chunks_reassemble_to_original_tokens(self, spark, texts, chunk, overlap):
        """Dropping each chunk's leading overlap and concatenating in
        chunk order must reproduce the document's exact token stream."""
        from pramen_spark.operators.text import chunk_documents

        if overlap >= chunk:
            overlap = chunk - 1
        out = chunk_documents(
            self._docs(spark, texts), chunk_tokens=chunk, overlap_tokens=overlap
        ).collect()
        by_doc = {}
        for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_id)):
            toks = r.text.split(" ") if r.text else []
            assert r.n_tokens == len(toks) <= chunk
            prev = by_doc.setdefault(r.doc_id, [])
            prev.extend(toks if r.chunk_id == 0 else toks[overlap:])
        for i, t in enumerate(texts):
            assert by_doc[i] == t.split(" "), (i, t)

    @given(
        texts=st.lists(
            st.lists(
                st.sampled_from(["common line", "rare", "mid text", "zz"]),
                min_size=1,
                max_size=5,
            ).map("\n".join),
            min_size=1,
            max_size=6,
        ),
        k=st.integers(min_value=1, max_value=3),
    )
    @settings(max_examples=12, deadline=None)
    def test_line_dedup_is_a_subsequence_filter(self, spark, texts, k):
        """Every output doc's lines must be exactly the input lines whose
        corpus doc-frequency is <= k, in original order."""
        from pramen_spark.operators.dedup import line_dedup

        out = {r.doc_id: r for r in line_dedup(
            self._docs(spark, texts), max_line_docs=k
        ).collect()}
        dfreq = {}
        for t in texts:
            for line in set(t.split("\n")):
                dfreq[line] = dfreq.get(line, 0) + 1
        for i, t in enumerate(texts):
            lines = t.split("\n")
            expect = [l for l in lines if dfreq[l] <= k]
            if not expect:
                assert i not in out
            else:
                assert out[i].text.split("\n") == expect
                assert out[i].n_lines_kept == len(expect)
                assert out[i].n_lines_removed == len(lines) - len(expect)

    @given(
        pii_kind=st.sampled_from(["email", "ipv4", "ssn", "phone"]),
        n_specimens=st.integers(min_value=0, max_value=4),
    )
    @settings(max_examples=12, deadline=None)
    def test_redaction_removes_every_specimen(self, spark, pii_kind, n_specimens):
        specimen = {
            "email": "user@example.com",
            "ipv4": "192.168.1.77",
            "ssn": "123-45-6789",
            "phone": "(555) 123-4567",
        }[pii_kind]
        from pramen_spark.operators.text import redact_pii

        text = " filler ".join([specimen] * n_specimens) or "clean"
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        r = redact_pii(df).collect()[0]
        assert r[f"n_{pii_kind}"] == n_specimens
        assert specimen not in r.text or n_specimens == 0


class TestParagraphDedupProperties:
    """Property-based invariants for keep-first passage dedup, mirroring
    the reference's property-test strategy (SURVEY.md §5)."""

    @staticmethod
    def _docs(spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )

    @given(
        texts=st.lists(
            st.lists(
                st.sampled_from(["shared para", "rare", "mid text", "zz", "qq"]),
                min_size=1,
                max_size=5,
            ).map("\n\n".join),
            min_size=1,
            max_size=6,
        )
    )
    @settings(max_examples=12, deadline=None)
    def test_keep_first_matches_python_reference(self, spark, texts):
        """Output must equal the sequential keep-first filter: a paragraph
        survives iff its (doc_id, pos) is the globally smallest occurrence."""
        from pramen_spark.operators.dedup import paragraph_dedup

        out = {
            r.doc_id: r
            for r in paragraph_dedup(self._docs(spark, texts)).collect()
        }
        seen = {}
        for i, t in enumerate(texts):
            for pos, p in enumerate(t.split("\n\n")):
                seen.setdefault(p, (i, pos))
        for i, t in enumerate(texts):
            paras = t.split("\n\n")
            expect = [p for pos, p in enumerate(paras) if seen[p] == (i, pos)]
            removed = len(paras) - len(expect)
            if not expect:
                assert i not in out
                continue
            assert out[i].text == "\n\n".join(expect), (i, t)
            assert out[i].n_paras_kept == len(expect)
            assert out[i].n_paras_removed == removed
        # global invariant: every distinct paragraph survives exactly once
        kept_all = [
            p for r in out.values() for p in r.text.split("\n\n")
        ]
        assert sorted(set(kept_all)) == sorted(kept_all)


class TestBucketGapfill:
    def test_gaps_filled_and_locf(self, spark):
        import datetime as dt

        from pramen_spark.operators.timegrid import bucket_gapfill

        T = dt.datetime
        rows = [
            (1, T(2024, 1, 1, 0, 15), 10.0),
            (1, T(2024, 1, 1, 0, 45), 5.0),   # same bucket as above
            (1, T(2024, 1, 1, 3, 10), 2.0),   # hours 1 and 2 are gaps
            (2, T(2024, 1, 1, 5, 0), 7.0),    # single-bucket key
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
        out = {
            (r.user_id, r.bucket_ts.hour): r
            for r in bucket_gapfill(df).collect()
        }
        # key 1 spans hours 0..3 -> 4 rows; key 2 has 1 row
        assert len(out) == 5
        assert out[(1, 0)].n_events == 2 and out[(1, 0)].total_value == 15.0
        assert out[(1, 1)].n_events == 0 and out[(1, 1)].total_value is None
        assert out[(1, 1)].value_locf == 15.0  # carried forward
        assert out[(1, 2)].value_locf == 15.0
        assert out[(1, 3)].total_value == 2.0 and out[(1, 3)].value_locf == 2.0
        assert out[(2, 5)].n_events == 1

    def test_no_locf_mode(self, spark):
        import datetime as dt

        from pramen_spark.operators.timegrid import bucket_gapfill

        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1, 0), 1.0), (1, dt.datetime(2024, 1, 1, 2), 3.0)],
            ["user_id", "ts", "value"],
        )
        out = bucket_gapfill(df, locf=False)
        assert "value_locf" not in out.columns
        assert out.count() == 3  # hours 0,1,2


class TestDriftPsi:
    def test_identical_distributions_have_zero_psi(self, spark):
        from pramen_spark.operators.drift import psi

        df = spark.createDataFrame([(float(i % 10),) for i in range(100)], ["v"])
        out = psi(df, df, "v", lo=0.0, hi=10.0, num_buckets=5).collect()
        assert len(out) == 5
        assert all(r.psi_term == 0.0 for r in out)
        assert all(r.ref_rate == r.cur_rate for r in out)

    def test_shifted_distribution_is_flagged(self, spark):
        from pramen_spark.operators.drift import psi

        ref = spark.createDataFrame([(1.0,)] * 90 + [(9.0,)] * 10, ["v"])
        cur = spark.createDataFrame([(1.0,)] * 10 + [(9.0,)] * 90, ["v"])
        out = psi(ref, cur, "v", lo=0.0, hi=10.0, num_buckets=5).collect()
        total = sum(r.psi_term for r in out)
        assert total > 0.25  # canonical "drifted" threshold
        # every term is non-negative by construction of (q-p)ln(q/p)
        assert all(r.psi_term >= 0 for r in out)

    def test_out_of_range_clamps_and_nulls_drop(self, spark):
        from pramen_spark.operators.drift import value_histogram

        df = spark.createDataFrame(
            [(-5.0,), (0.5,), (99.0,), (None,)], ["v"]
        )
        out = {r.bucket: r.n for r in value_histogram(df, "v", 0.0, 10.0, 5).collect()}
        assert out == {0: 2, 4: 1}  # -5 clamps low, 99 clamps high, NULL gone


class TestValidationCrossEngine:
    """Property-based Spark-vs-DuckDB parity for the expectations
    validator on NULL-heavy generated data — the fixed corpus is clean,
    so the real-data oracle never exercises the NULL paths (not-null
    counting, NULL-as-a-value uniqueness, NULL range/regex violations)."""

    @given(
        rows=st.lists(
            st.tuples(
                st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
                st.one_of(st.none(), st.integers(min_value=-5, max_value=15)),
                st.one_of(st.none(), st.sampled_from(["en", "EN", "de", "x", ""])),
            ),
            min_size=1,
            max_size=25,
        )
    )
    @settings(max_examples=15, deadline=None)
    def test_matches_duckdb_reference(self, spark, rows):
        import duckdb
        import pandas as pd

        from pramen_spark.operators.validation import validate_expectations

        df = spark.createDataFrame(rows, "id long, n long, lang string")
        got = {
            r.rule: (r.violations, r.passed)
            for r in validate_expectations(
                df,
                [
                    ("id_not_null", "not_null", {"col": "id"}),
                    ("id_unique", "unique", {"col": "id"}),
                    ("n_in_range", "in_range", {"col": "n", "lo": 0, "hi": 10}),
                    ("lang_iso2", "matches", {"col": "lang", "pattern": r"^[a-z]{2}$"}),
                ],
            ).collect()
        }
        con = duckdb.connect()
        con.register(
            "t",
            pd.DataFrame(rows, columns=["id", "n", "lang"]).astype(
                {"id": "Int64", "n": "Int64"}
            ),
        )
        ref = con.execute(
            """
            SELECT
              CAST(SUM(CASE WHEN id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
              CAST(COUNT(*) - COUNT(DISTINCT id)
                   - MAX(CASE WHEN id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
              CAST(SUM(CASE WHEN n IS NULL OR n < 0 OR n > 10
                            THEN 1 ELSE 0 END) AS BIGINT),
              CAST(SUM(CASE WHEN lang IS NULL
                            OR NOT regexp_matches(lang, '^[a-z]{2}$')
                            THEN 1 ELSE 0 END) AS BIGINT)
            FROM t
            """
        ).fetchone()
        expect = dict(
            zip(["id_not_null", "id_unique", "n_in_range", "lang_iso2"], ref)
        )
        for rule, want in expect.items():
            assert got[rule] == (want, want == 0), (rule, got[rule], want, rows)


class TestUpsampleCrossEngine:
    """Property-based Spark-vs-DuckDB parity for epoch upsampling: the
    md5 hash-unit, the fractional-copy threshold, and the copy-index
    expansion must agree across engines for arbitrary epoch weights."""

    @given(
        n_docs=st.integers(min_value=1, max_value=40),
        e10=st.integers(min_value=0, max_value=35),  # epochs x10: 0.0..3.5
    )
    @settings(max_examples=15, deadline=None)
    def test_matches_duckdb_reference(self, spark, n_docs, e10):
        import duckdb
        import pandas as pd

        from pramen_spark.operators.sampling import upsample_to_epochs

        e = e10 / 10.0
        df = spark.createDataFrame(
            [(i, "s") for i in range(n_docs)], ["doc_id", "source"]
        )
        got = sorted(
            (r.doc_id, r.copy_idx)
            for r in upsample_to_epochs(df, {"s": e}).collect()
        )
        con = duckdb.connect()
        con.register(
            "t", pd.DataFrame({"doc_id": list(range(n_docs))})
        )
        ref = sorted(
            tuple(r)
            for r in con.execute(
                f"""
                WITH c AS (
                    SELECT doc_id,
                           CAST(floor({e}) + CASE WHEN
                               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'epoch'), 1, 8))::BIGINT
                                   / 4294967296.0 < {e} - floor({e})
                               THEN 1 ELSE 0 END AS BIGINT) AS n_copies
                    FROM t
                )
                SELECT doc_id, CAST(i AS INTEGER) AS copy_idx
                FROM (SELECT doc_id, unnest(range(n_copies)) AS i
                      FROM c WHERE n_copies > 0)
                """
            ).fetchall()
        )
        assert got == ref, (e, got[:5], ref[:5])


class TestSpreadInput:
    def test_narrow_input_spreads_to_parallelism(self, spark):
        from pramen_spark.operators.partitioning import spread_input

        df = spark.createDataFrame(
            [(i, f"t{i}") for i in range(50)], ["doc_id", "text"]
        ).coalesce(1)
        out = spread_input(df, "doc_id")
        assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
        assert out.count() == 50

    def test_wide_input_is_untouched(self, spark):
        from pramen_spark.operators.partitioning import spread_input

        df = spark.createDataFrame(
            [(i,) for i in range(50)], ["doc_id"]
        ).repartition(spark.sparkContext.defaultParallelism + 4, "doc_id")
        assert spread_input(df, "doc_id") is df  # strict no-op, same object

    def test_explicit_min_partitions(self, spark):
        from pramen_spark.operators.partitioning import spread_input

        df = spark.createDataFrame([(i,) for i in range(10)], ["doc_id"]).coalesce(1)
        out = spread_input(df, "doc_id", min_partitions=7)
        assert out.rdd.getNumPartitions() == 7


class TestMaterializeMixture:
    def test_upsample_and_downsample_in_one_call(self, spark):
        from pramen_spark.operators.sampling import materialize_mixture

        # group a: 10 docs x 10 tokens = 100 tokens; group b same
        rows = [(i, "a" if i < 10 else "b", "w " * 9 + "w") for i in range(20)]
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        # budget 300 at 80/20: e_a = 240/100 = 2.4 (up), e_b = 60/100 = 0.6 (down)
        out = materialize_mixture(
            df, {"a": 0.8, "b": 0.2}, total_tokens=300.0
        ).collect()
        n_a = sum(1 for r in out if r.source == "a")
        n_b = sum(1 for r in out if r.source == "b")
        # a: every doc 2 or 3 copies -> 20..30 rows; b: subset of 10 docs
        assert 20 <= n_a <= 30 and 0 < n_b < 10
        # per-doc copy indices are dense from 0
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r.copy_idx)
        for doc, idxs in by_doc.items():
            assert sorted(idxs) == list(range(len(idxs))), (doc, idxs)

    def test_absent_group_drops_and_deterministic(self, spark):
        from pramen_spark.operators.sampling import materialize_mixture

        rows = [(i, "a" if i % 2 else "junk", "x y z") for i in range(30)]
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        a = sorted((r.doc_id, r.copy_idx) for r in
                   materialize_mixture(df, {"a": 1.0}, 30.0).collect())
        b = sorted((r.doc_id, r.copy_idx) for r in
                   materialize_mixture(df, {"a": 1.0}, 30.0).collect())
        assert a == b
        assert all(doc % 2 for doc, _ in a)  # junk group gone

    def test_realized_tokens_near_budget(self, spark):
        from pramen_spark.operators.sampling import materialize_mixture

        rows = [(i, "a", "t " * 19 + "t") for i in range(200)]  # 20 tokens each
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        out = materialize_mixture(df, {"a": 1.0}, total_tokens=2000.0).collect()
        realized = sum(r.n_tokens for r in out)
        assert 1600 <= realized <= 2400  # within ~20% of budget at 200 keys


class TestBM25:
    @pytest.fixture(scope="class")
    def scored(self, spark):
        rows = [
            (1, "spark spark spark engine engine"),
            (2, "spark engine"),
            (3, "rare engine word word word word word word"),
            (4, "nothing matching here at all"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        from pramen_spark.operators.text import bm25_scores

        out = bm25_scores(df, ["spark", "rare"])
        return {r.doc_id: r.bm25 for r in out.collect()}

    def test_only_matching_docs_scored(self, scored):
        assert set(scored) == {1, 2, 3}

    def test_higher_tf_scores_higher(self, scored):
        # doc 1 repeats 'spark'; doc 2 mentions it once (similar lengths)
        assert scored[1] > scored[2]

    def test_rarer_term_outscores_common(self, scored):
        # 'rare' appears in 1/4 docs, 'spark' in 2/4: one hit of 'rare'
        # must outweigh one hit of 'spark' net of the length penalty —
        # doc 3 is LONGER than doc 2, so only idf can explain a win
        assert scored[3] > scored[2]

    def test_scores_positive(self, scored):
        assert all(v > 0 for v in scored.values())


def _winnow_reference(text: str, k: int, w: int) -> tuple[int, set]:
    """Sequential winnowing reference (Schleimer et al. fig. 5 semantics
    as implemented: min hash per window of w consecutive k-gram hashes)."""
    import hashlib

    s = text.lower()
    grams = [s[i : i + k] for i in range(len(s) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    fps = {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}
    return len(hs), fps


class TestWinnowing:
    K, W = 4, 3

    def _run(self, spark, rows):
        from pramen_spark.operators.text import winnow_fingerprints

        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = winnow_fingerprints(df, k=self.K, w=self.W, prefix_chars=200)
        return {r.doc_id: r for r in out.collect()}

    def test_matches_sequential_reference(self, spark):
        rows = [
            (1, "abcdefghijabcdefghij"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "aaaaaaaaaaaaaaaa"),
            (4, "spark catalyst tungsten adaptive execution"),
        ]
        got = self._run(spark, rows)
        for doc_id, text in rows:
            n_grams, fps = _winnow_reference(text, self.K, self.W)
            assert got[doc_id].n_grams == n_grams, doc_id
            assert got[doc_id].n_fingerprints == len(fps), doc_id
            assert got[doc_id].min_fingerprint == min(fps), doc_id

    def test_shared_span_guarantee(self, spark):
        # any shared substring of length >= k + w - 1 must contribute a
        # shared fingerprint (the winnowing guarantee) — check via the
        # reference sets on documents embedding a common span
        span = "xqzjvkwpyt"  # len 10 >= 4 + 3 - 1
        _, fps_a = _winnow_reference(f"left pad {span} tail a", self.K, self.W)
        _, fps_b = _winnow_reference(f"other beginning {span} z", self.K, self.W)
        assert fps_a & fps_b

    def test_short_docs_dropped(self, spark):
        got = self._run(spark, [(1, "abcde"), (2, "abcdefgh")])
        assert 1 not in got  # len 5 < k + w - 1 = 6
        assert 2 in got


class TestLeakageSafeSplit:
    @pytest.fixture(scope="class")
    def split_out(self, spark):
        from pramen_spark.operators.sampling import leakage_safe_split

        docs = spark.createDataFrame(
            [(i,) for i in range(1, 21)], "doc_id long"
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (7, 9), (10, 11)], "id_a long, id_b long"
        )
        out = leakage_safe_split(
            docs, pairs, {"train": 0.7, "eval": 0.3}, id_col="doc_id"
        )
        return {r.doc_id: (r.cluster_label, r.split) for r in out.collect()}

    def test_every_doc_assigned_once(self, split_out):
        assert set(split_out) == set(range(1, 21))

    def test_cluster_members_share_split(self, split_out):
        for cluster in ([1, 2, 3], [7, 9], [10, 11]):
            labels = {split_out[d][0] for d in cluster}
            sides = {split_out[d][1] for d in cluster}
            assert labels == {min(cluster)}, cluster
            assert len(sides) == 1, cluster

    def test_singletons_match_plain_hash_split(self, spark, split_out):
        from pramen_spark.operators.sampling import hash_split

        singles = [d for d in range(1, 21) if d not in {1, 2, 3, 7, 9, 10, 11}]
        docs = spark.createDataFrame([(d,) for d in singles], "doc_id long")
        plain = {
            r.doc_id: r.split
            for r in hash_split(docs, "doc_id", {"train": 0.7, "eval": 0.3}).collect()
        }
        for d in singles:
            assert split_out[d][0] == d
            assert split_out[d][1] == plain[d], d

    def test_both_sides_used(self, split_out):
        assert {s for _, s in split_out.values()} == {"train", "eval"}


class TestProfileColumns:
    @pytest.fixture(scope="class")
    def profiled(self, spark):
        from pramen_spark.operators.validation import profile_columns

        df = spark.createDataFrame(
            [
                (1, "alpha", None),
                (2, "beta", 5.0),
                (3, None, 5.0),
                (4, "alpha", 7.5),
            ],
            "id long, name string, score double",
        )
        return {r.col_name: r for r in profile_columns(df).collect()}

    def test_all_columns_profiled(self, profiled):
        assert set(profiled) == {"id", "name", "score"}
        assert all(r.n_rows == 4 for r in profiled.values())

    def test_null_counts(self, profiled):
        assert profiled["id"].n_null == 0
        assert profiled["name"].n_null == 1
        assert profiled["score"].n_null == 1

    def test_distinct_counts_exclude_null(self, profiled):
        assert profiled["id"].n_distinct == 4
        assert profiled["name"].n_distinct == 2
        assert profiled["score"].n_distinct == 2

    def test_min_max_stringified(self, profiled):
        assert (profiled["id"].min_value, profiled["id"].max_value) == ("1", "4")
        assert (profiled["name"].min_value, profiled["name"].max_value) == (
            "alpha",
            "beta",
        )
        assert (profiled["score"].min_value, profiled["score"].max_value) == (
            "5.0",
            "7.5",
        )

    def test_column_subset_and_approx(self, spark):
        from pramen_spark.operators.validation import profile_columns

        df = spark.createDataFrame([(i, str(i)) for i in range(50)], "a long, b string")
        out = profile_columns(df, columns=["a"], exact_distinct=False).collect()
        assert [r.col_name for r in out] == ["a"]
        # HLL estimate within its documented ~2% envelope at n=50
        assert abs(out[0].n_distinct - 50) <= 3


class TestFunnelOrdering:
    def test_out_of_order_stage_not_counted(self, spark, sf_dir):
        """A user who purchased BEFORE viewing must not reach the
        purchase stage: the funnel is sequence-sensitive."""
        from pramen_spark.queries.catalog import QUERIES
        import datetime as dt

        # tiny inline reimplementation of the catalog funnel on crafted rows
        t0 = dt.datetime(2024, 1, 1)

        def ts(h):
            return t0 + dt.timedelta(hours=h)

        rows = [
            (1, "signup", ts(0)), (1, "view", ts(1)), (1, "purchase", ts(2)),
            (2, "signup", ts(0)), (2, "purchase", ts(1)), (2, "view", ts(2)),
            (3, "view", ts(0)), (3, "purchase", ts(1)),  # never signed up
        ]
        e = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
        s1 = (e.filter(F.col("event_type") == "signup")
              .groupBy("user_id").agg(F.min("ts").alias("t1")))
        s2 = (e.filter(F.col("event_type") == "view").join(s1, "user_id")
              .filter(F.col("ts") > F.col("t1"))
              .groupBy("user_id").agg(F.min("ts").alias("t2")))
        s3 = (e.filter(F.col("event_type") == "purchase").join(s2, "user_id")
              .filter(F.col("ts") > F.col("t2"))
              .groupBy("user_id").agg(F.min("ts").alias("t3")))
        assert s1.count() == 2      # users 1, 2
        assert s2.count() == 2      # user 2's view is after signup
        assert s3.count() == 1      # only user 1 purchased after viewing


class TestApplyCdc:
    @pytest.fixture(scope="class")
    def merged(self, spark):
        from pramen_spark.operators.cdc import apply_cdc

        snap = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
            "k long, attr string, val double",
        )
        changes = spark.createDataFrame(
            [
                (2, "b2", 21.0, "U", 1),   # update
                (3, "c2", 31.0, "U", 1),   # update...
                (3, "c2", 31.0, "D", 2),   # ...then delete (delete wins)
                (4, "d2", 41.0, "D", 1),   # delete...
                (4, "d3", 42.0, "U", 2),   # ...then re-insert (update wins)
                (9, "new", 90.0, "I", 1),  # insert
            ],
            "k long, attr string, val double, op string, seq int",
        )
        out = apply_cdc(snap, changes, ["k"], "seq")
        return {r.k: (r.attr, r.val) for r in out.collect()}

    def test_untouched_passthrough(self, merged):
        assert merged[1] == ("a", 10.0)

    def test_update_applied(self, merged):
        assert merged[2] == ("b2", 21.0)

    def test_delete_beats_earlier_update(self, merged):
        assert 3 not in merged

    def test_update_beats_earlier_delete(self, merged):
        assert merged[4] == ("d3", 42.0)

    def test_insert_new_key(self, merged):
        assert merged[9] == ("new", 90.0)

    def test_chained_batches_compose(self, spark):
        from pramen_spark.operators.cdc import apply_cdc

        snap = spark.createDataFrame([(1, 1.0)], "k long, v double")
        b1 = spark.createDataFrame([(1, 2.0, "U", 1), (2, 5.0, "U", 1)],
                                   "k long, v double, op string, seq int")
        b2 = spark.createDataFrame([(1, 0.0, "D", 2)],
                                   "k long, v double, op string, seq int")
        s2 = apply_cdc(apply_cdc(snap, b1, ["k"], "seq"), b2, ["k"], "seq")
        assert {r.k: r.v for r in s2.collect()} == {2: 5.0}


class TestScd2History:
    def test_versions_open_on_change_only(self, spark):
        from pramen_spark.operators.cdc import scd2_history
        import datetime as dt

        d = dt.date
        obs = spark.createDataFrame(
            [
                (1, "bronze", d(2024, 1, 1), 10),
                (1, "bronze", d(2024, 2, 1), 11),  # no change: collapses
                (1, "gold", d(2024, 3, 1), 12),
                (1, "gold", d(2024, 4, 1), 13),    # no change: collapses
                (2, "silver", d(2024, 1, 5), 20),
            ],
            "k long, tier string, day date, src_id long",
        )
        out = scd2_history(obs, ["k"], ["tier"], "day", tiebreak_cols=["src_id"])
        rows = sorted(
            ((r.k, r.tier, r.effective_from, r.effective_to, r.is_current)
             for r in out.collect())
        )
        assert rows == [
            (1, "bronze", d(2024, 1, 1), d(2024, 3, 1), False),
            (1, "gold", d(2024, 3, 1), None, True),
            (2, "silver", d(2024, 1, 5), None, True),
        ]

    def test_reverting_attribute_reopens_version(self, spark):
        from pramen_spark.operators.cdc import scd2_history
        import datetime as dt

        d = dt.date
        obs = spark.createDataFrame(
            [(1, "a", d(2024, 1, 1), 1), (1, "b", d(2024, 2, 1), 2),
             (1, "a", d(2024, 3, 1), 3)],
            "k long, tier string, day date, src_id long",
        )
        out = scd2_history(obs, ["k"], ["tier"], "day", tiebreak_cols=["src_id"])
        assert out.count() == 3  # a, b, a again — three versions


class TestMergeAggState:
    def test_chained_merges_equal_one_shot(self, spark):
        from pramen_spark.operators.cdc import merge_agg_state

        df = spark.createDataFrame(
            [(i % 3, float(i), i % 10) for i in range(100)],
            "g int, x double, d int",
        )
        state = None
        for i in range(4):
            state = merge_agg_state(
                state, df.filter(F.col("d") % 4 == i),
                group_cols=["g"], sum_cols=["x"], min_cols=["x"], max_cols=["x"],
            )
        got = {r.g: (r.n_rows, r.sum_x, r.min_x, r.max_x) for r in state.collect()}
        want = {
            r.g: (r.n_rows, r.sum_x, r.min_x, r.max_x)
            for r in df.groupBy("g").agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("x").alias("sum_x"),
                F.min("x").alias("min_x"),
                F.max("x").alias("max_x"),
            ).collect()
        }
        assert got == want

    def test_none_state_is_plain_aggregate(self, spark):
        from pramen_spark.operators.cdc import merge_agg_state

        df = spark.createDataFrame([(1, 2.0), (1, 3.0)], "g int, x double")
        out = merge_agg_state(None, df, ["g"], sum_cols=["x"]).collect()
        assert len(out) == 1 and out[0].n_rows == 2 and out[0].sum_x == 5.0


class TestMergeAggStateJoin:
    def test_join_merge_equals_union_merge(self, spark):
        from pramen_spark.operators.cdc import merge_agg_state, merge_agg_state_join

        df = spark.createDataFrame(
            [(i % 5, float(i), i % 10) for i in range(120)],
            "g int, x double, d int",
        )
        kw = dict(group_cols=["g"], sum_cols=["x"], min_cols=["x"], max_cols=["x"])
        state = merge_agg_state(None, df.filter("d < 5"), **kw)
        via_union = merge_agg_state(state, df.filter("d >= 5"), **kw)
        via_join = merge_agg_state_join(state, df.filter("d >= 5"), **kw)
        key = lambda r: (r.g, r.n_rows, r.sum_x, r.min_x, r.max_x)
        assert sorted(map(key, via_union.collect())) == sorted(
            map(key, via_join.collect())
        )

    def test_one_sided_groups_pass_through(self, spark):
        from pramen_spark.operators.cdc import merge_agg_state, merge_agg_state_join

        old = spark.createDataFrame([(1, 2.0), (1, 4.0)], "g int, x double")
        new = spark.createDataFrame([(2, 10.0)], "g int, x double")
        state = merge_agg_state(None, old, ["g"], sum_cols=["x"], min_cols=["x"])
        merged = merge_agg_state_join(
            state, new, ["g"], sum_cols=["x"], min_cols=["x"]
        )
        got = {r.g: (r.n_rows, r.sum_x, r.min_x) for r in merged.collect()}
        assert got == {1: (2, 6.0, 2.0), 2: (1, 10.0, 10.0)}

    def test_null_sums_preserved_across_merge(self, spark):
        from pramen_spark.operators.cdc import merge_agg_state, merge_agg_state_join

        old = spark.createDataFrame([(1, None)], "g int, x double")
        new = spark.createDataFrame([(1, None), (2, 3.0)], "g int, x double")
        state = merge_agg_state(None, old, ["g"], sum_cols=["x"])
        merged = merge_agg_state_join(state, new, ["g"], sum_cols=["x"])
        got = {r.g: (r.n_rows, r.sum_x) for r in merged.collect()}
        # group 1 saw only NULLs in both batches: SUM stays NULL (as the
        # one-shot SUM over the union would be); counts still add
        assert got == {1: (2, None), 2: (1, 3.0)}


class TestAggStateBucketing:
    def test_state_side_merges_without_exchange(self, spark):
        """The persisted state is bucketed by the group columns: folding a
        batch must shuffle ONLY the batch partials — re-exchanging the
        whole state per batch is the scale killer merge_agg_state's
        docstring warns about.

        Runs in a fresh sibling session (shared catalog, independent
        conf) with the bucketed-read confs pinned: the assertion is about
        THIS plan shape, not about whichever conf a previously-run test
        happened to leave behind (the full-suite flake round 8 hit)."""
        import re

        from pramen_spark.operators.cdc import (
            merge_agg_state,
            merge_agg_state_join,
            persist_agg_state,
        )

        s = spark.newSession()
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        s.conf.set("spark.sql.shuffle.partitions", "4")
        s.conf.set("spark.sql.sources.bucketing.enabled", "true")
        s.conf.set("spark.sql.sources.bucketing.autoBucketedScanEnabled", "true")
        s.sql("DROP TABLE IF EXISTS agg_state_bucket_test")
        try:
            df = s.createDataFrame(
                [(i % 40, float(i)) for i in range(400)], "g int, x double"
            )
            state = merge_agg_state(
                None, df.filter("x < 200"), ["g"], sum_cols=["x"]
            )
            persist_agg_state(state, "agg_state_bucket_test", ["g"], n_buckets=4)
            merged = merge_agg_state_join(
                s.table("agg_state_bucket_test"),
                df.filter("x >= 200"),
                ["g"],
                sum_cols=["x"],
            )
            plan = merged._sc._jvm.PythonSQLUtils.explainString(
                merged._jdf.queryExecution(), "formatted"
            )
            assert "Bucketed: true" in plan, plan
            # exchanges touch the batch side only (its partial agg, plus
            # possibly a re-bucketing to the state's bucket count); the
            # state scan itself must feed the join with no exchange above it
            n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
            assert n_exchanges <= 2, plan
            # correctness: equals the one-shot aggregate
            want = {
                (r.g, r.n_rows, r.sum_x)
                for r in df.groupBy("g")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_rows"),
                    F.sum("x").alias("sum_x"),
                )
                .collect()
            }
            got = {(r.g, r.n_rows, r.sum_x) for r in merged.collect()}
            assert got == want
        finally:
            s.sql("DROP TABLE IF EXISTS agg_state_bucket_test")


class TestCdcFuzz:
    """Property-based equivalence of the distributed CDC appliers against
    sequential in-memory references: random change logs, any batch split."""

    @given(
        data=st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=6),       # key
                st.integers(min_value=0, max_value=3),       # attr value
                st.sampled_from(["U", "D"]),                 # op
            ),
            min_size=0,
            max_size=15,
        )
    )
    @settings(max_examples=12, deadline=None)
    def test_apply_cdc_matches_sequential(self, spark, data):
        from pramen_spark.operators.cdc import apply_cdc

        snap_rows = [(k, -1) for k in range(1, 4)]  # keys 1-3 pre-exist
        changes = [(k, v, op, seq) for seq, (k, v, op) in enumerate(data, 1)]

        # sequential reference: replay in sequence order
        state = dict(snap_rows)
        for k, v, op, _seq in changes:
            if op == "D":
                state.pop(k, None)
            else:
                state[k] = v

        snap = spark.createDataFrame(snap_rows, "k long, v long")
        if changes:
            ch = spark.createDataFrame(changes, "k long, v long, op string, seq long")
            out = apply_cdc(snap, ch, ["k"], "seq")
        else:
            out = snap
        assert {r.k: r.v for r in out.collect()} == state

    @given(
        obs=st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=3),   # key
                st.integers(min_value=0, max_value=2),   # attr
            ),
            min_size=1,
            max_size=12,
        )
    )
    @settings(max_examples=12, deadline=None)
    def test_scd2_matches_sequential(self, spark, obs):
        from pramen_spark.operators.cdc import scd2_history
        import datetime as dt

        rows = [
            (k, f"a{v}", dt.date(2024, 1, 1) + dt.timedelta(days=i), i)
            for i, (k, v) in enumerate(obs)
        ]
        # sequential reference: per key in (date, id) order, version opens
        # on first observation or attribute change; effective_to = next open
        per_key: dict = {}
        for k, a, d, i in sorted(rows, key=lambda r: (r[2], r[3])):
            per_key.setdefault(k, [])
            if not per_key[k] or per_key[k][-1][0] != a:
                per_key[k].append((a, d))
        want = set()
        for k, versions in per_key.items():
            for j, (a, d) in enumerate(versions):
                nxt = versions[j + 1][1] if j + 1 < len(versions) else None
                want.add((k, a, d, nxt, nxt is None))

        df = spark.createDataFrame(rows, "k long, attr string, day date, src long")
        out = scd2_history(df, ["k"], ["attr"], "day", tiebreak_cols=["src"])
        got = {
            (r.k, r.attr, r.effective_from, r.effective_to, r.is_current)
            for r in out.collect()
        }
        assert got == want

    @given(
        obs=st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=3),   # key
                st.integers(min_value=0, max_value=2),   # attr
            ),
            min_size=1,
            max_size=14,
        ),
        cuts=st.sets(st.integers(min_value=1, max_value=13), max_size=3),
    )
    @settings(max_examples=15, deadline=None)
    def test_scd2_merge_chained_equals_one_shot(self, spark, obs, cuts):
        """THE half-open-interval property: date-split batches folded with
        scd2_merge reproduce the one-shot scd2_history over the full log —
        including collapse of an unchanged attribute across the batch
        boundary and closing of the open version by the first change."""
        from pramen_spark.operators.cdc import scd2_history, scd2_merge
        import datetime as dt

        rows = [
            (k, f"a{v}", dt.date(2024, 1, 1) + dt.timedelta(days=i), i)
            for i, (k, v) in enumerate(obs)
        ]
        df = spark.createDataFrame(rows, "k long, attr string, day date, src long")
        one_shot = scd2_history(df, ["k"], ["attr"], "day", tiebreak_cols=["src"])
        want = {
            (r.k, r.attr, r.effective_from, r.effective_to, r.is_current)
            for r in one_shot.collect()
        }

        # split the log at the cut indices: batch i holds days in
        # [cut_{i-1}, cut_i) — strictly date-ordered, the precondition
        bounds = sorted(cuts | {len(rows)})
        state = None
        lo = 0
        for hi in bounds:
            batch = df.filter((F.col("src") >= lo) & (F.col("src") < hi))
            if batch.count() == 0:
                lo = hi
                continue
            state = scd2_merge(state, batch, ["k"], ["attr"], "day",
                               tiebreak_cols=["src"])
            lo = hi
        got = {
            (r.k, r.attr, r.effective_from, r.effective_to, r.is_current)
            for r in state.collect()
        }
        assert got == want

    def test_scd2_merge_collapses_unchanged_across_boundary(self, spark):
        """A batch re-observing the open version's attributes must NOT
        open a new version — the exact spot half-open-interval bugs live."""
        from pramen_spark.operators.cdc import scd2_history, scd2_merge
        import datetime as dt

        d = lambda i: dt.date(2024, 1, i)
        b1 = spark.createDataFrame(
            [(1, "x", d(1), 0), (1, "y", d(2), 1)], "k long, attr string, day date, src long"
        )
        b2 = spark.createDataFrame(
            [(1, "y", d(3), 2), (1, "z", d(4), 3), (2, "w", d(5), 4)],
            "k long, attr string, day date, src long",
        )
        state = scd2_merge(None, b1, ["k"], ["attr"], "day", tiebreak_cols=["src"])
        state = scd2_merge(state, b2, ["k"], ["attr"], "day", tiebreak_cols=["src"])
        got = {
            (r.k, r.attr, r.effective_from, r.effective_to, r.is_current)
            for r in state.collect()
        }
        assert got == {
            (1, "x", d(1), d(2), False),
            (1, "y", d(2), d(4), False),   # NOT re-opened at d(3)
            (1, "z", d(4), None, True),
            (2, "w", d(5), None, True),
        }

    def test_leakage_split_empty_pairs_degrades_to_hash_split(self, spark):
        from pramen_spark.operators.sampling import hash_split, leakage_safe_split

        docs = spark.createDataFrame([(i,) for i in range(1, 11)], "doc_id long")
        pairs = spark.createDataFrame([], "id_a long, id_b long")
        out = {
            r.doc_id: r.split
            for r in leakage_safe_split(docs, pairs, {"train": 0.8, "eval": 0.2}).collect()
        }
        plain = {
            r.doc_id: r.split
            for r in hash_split(docs, "doc_id", {"train": 0.8, "eval": 0.2}).collect()
        }
        assert out == plain


class TestReconcileTables:
    def _run(self, spark, left_rows, right_rows, **kw):
        from pramen_spark.operators.reconcile import reconcile_tables

        schema = "k long, v string"
        left = spark.createDataFrame(left_rows, schema)
        right = spark.createDataFrame(right_rows, schema)
        return reconcile_tables(left, right, ["k"], ["v"], **kw).collect()

    def test_identical_tables_all_match(self, spark):
        rows = [(i, f"v{i}") for i in range(40)]
        out = self._run(spark, rows, rows, num_buckets=8)
        assert out and all(r.match for r in out)
        assert sum(r.n_left for r in out) == 40

    def test_changed_row_flips_exactly_its_bucket(self, spark):
        rows = [(i, f"v{i}") for i in range(40)]
        drifted = [(k, "CHANGED" if k == 7 else v) for k, v in rows]
        out = self._run(spark, rows, drifted, num_buckets=8)
        bad = [r for r in out if not r.match]
        assert len(bad) == 1
        # counts agree — only the digest exposes the value change
        assert bad[0].n_left == bad[0].n_right
        assert bad[0].digest_left != bad[0].digest_right

    def test_missing_row_changes_count(self, spark):
        rows = [(i, f"v{i}") for i in range(40)]
        out = self._run(spark, rows, rows[:-1], num_buckets=8)
        bad = [r for r in out if not r.match]
        assert len(bad) == 1
        assert bad[0].n_left == bad[0].n_right + 1

    def test_row_order_irrelevant(self, spark):
        rows = [(i, f"v{i}") for i in range(30)]
        out_a = {r.bucket: (r.digest_left, r.digest_right)
                 for r in self._run(spark, rows, list(reversed(rows)), num_buckets=4)}
        assert all(dl == dr for dl, dr in out_a.values())

    def test_null_value_distinct_from_empty(self, spark):
        out = self._run(spark, [(1, None)], [(1, "")], num_buckets=2)
        assert not any(r.match for r in out if r.n_left or r.n_right)


class TestQuantizeEmbeddings:
    @pytest.fixture(scope="class")
    def out(self, spark):
        from pramen_spark.operators.similarity import quantize_embeddings

        rows = [
            (1, [1.0, -0.5, 0.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),          # all-zero vector
            (3, [-2.0, 2.0, 1.0, -1.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        return {r.vec_id: r for r in quantize_embeddings(df).collect()}

    def test_extremes_hit_127(self, out):
        assert max(abs(v) for v in out[1].qvec) == 127
        assert list(out[3].qvec) == [-127, 127, 64, -64]

    def test_zero_vector_zero_scale(self, out):
        assert out[2].scale == 0.0
        assert list(out[2].qvec) == [0, 0, 0, 0]
        assert out[2].max_abs_err == 0.0

    def test_error_bound_half_scale(self, out):
        for r in out.values():
            assert r.max_abs_err <= r.scale / 2 + 1e-9, r

    def test_err_uses_unrounded_scale(self, spark):
        """Regression: the published scale is rounded for display, but
        qvec/max_abs_err must be computed against the UNROUNDED scale —
        a same-projection lateral alias once bound the lambda's 'scale'
        reference to the rounded column, shifting every error value."""
        import math
        from pramen_spark.operators.similarity import quantize_embeddings

        vec = [0.010725324, 0.3023430131]  # scale with a long tail
        df = spark.createDataFrame(
            [(1, vec)], "vec_id long, embedding array<float>"
        )
        r = quantize_embeddings(df).collect()[0]
        true_scale = max(abs(x) for x in [float(np_f32(v)) for v in vec]) / 127.0
        errs = [
            abs(float(np_f32(x)) - round(float(np_f32(x)) / true_scale) * true_scale)
            for x in vec
        ]
        assert math.isclose(r.max_abs_err, round(max(errs), 6), abs_tol=1e-9)


def np_f32(x):
    import numpy as np

    return np.float32(x)


def _pagerank_reference(edge_list, d=0.85, n_iter=10):
    verts = sorted({v for e in edge_list for v in e})
    n = len(verts)
    deg = {}
    for a, _b in edge_list:
        deg[a] = deg.get(a, 0) + 1
    r = {v: 1.0 / n for v in verts}
    for _ in range(n_iter):
        dangling = sum(r[v] for v in verts if v not in deg)
        contrib = {v: 0.0 for v in verts}
        for a, b in edge_list:
            contrib[b] += r[a] / deg[a]
        r = {
            v: (1 - d) / n + d * (contrib[v] + dangling / n)
            for v in verts
        }
    return r


class TestPagerank:
    def _run(self, spark, edge_list, **kw):
        from pramen_spark.operators.graph import pagerank

        edges = spark.createDataFrame(edge_list, "src long, dst long")
        return {r.vertex: r.rank for r in pagerank(edges, **kw).collect()}

    def test_matches_sequential_reference(self, spark):
        edge_list = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (1, 2)]  # dup edge
        got = self._run(spark, edge_list)
        want = _pagerank_reference(edge_list)
        assert set(got) == set(want)
        for v in want:
            assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])

    def test_ranks_sum_to_one(self, spark):
        got = self._run(spark, [(1, 2), (2, 3), (5, 6)])
        assert abs(sum(got.values()) - 1.0) < 1e-9

    def test_all_dangling_targets_uniform_chain(self, spark):
        # star: one hub points at 3 sinks; sinks are dangling and must
        # redistribute, leaving the hub above (1-d)/n
        got = self._run(spark, [(0, 1), (0, 2), (0, 3)], n_iter=10)
        assert got[1] == got[2] == got[3]
        assert got[1] > got[0] > 0.0375  # sinks beat the hub; hub beats base

    def test_iteration_count_matters(self, spark):
        e = [(1, 2), (2, 1), (1, 3)]
        r2 = self._run(spark, e, n_iter=2)
        r10 = self._run(spark, e, n_iter=10)
        assert any(abs(r2[v] - r10[v]) > 1e-6 for v in r2)

    def test_driver_and_distributed_paths_agree(self, spark):
        # driver_max_edges=0 forces the distributed loop; the default cap
        # takes the numpy driver path — both must produce the same ranks
        # (to FP reassociation, absorbed well below the catalog's round(8))
        e = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (1, 2), (5, 1)]
        fast = self._run(spark, e)
        dist = self._run(spark, e, driver_max_edges=0)
        assert set(fast) == set(dist)
        for v in fast:
            assert abs(fast[v] - dist[v]) < 1e-12, (v, fast[v], dist[v])

    def test_distributed_path_matches_reference(self, spark):
        edge_list = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (1, 2)]
        got = self._run(spark, edge_list, driver_max_edges=0)
        want = _pagerank_reference(edge_list)
        for v in want:
            assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])


class TestHitsPathParity:
    def test_driver_and_distributed_paths_agree(self, spark):
        from pramen_spark.operators.graph import hits

        e = [(1, 10), (1, 11), (2, 10), (3, 11), (3, 12), (2, 10)]
        edges = spark.createDataFrame(e, "src long, dst long")
        fast = {r.vertex: (r.hub, r.authority) for r in hits(edges).collect()}
        dist = {
            r.vertex: (r.hub, r.authority)
            for r in hits(edges, driver_max_edges=0).collect()
        }
        assert set(fast) == set(dist)
        for v in fast:
            assert abs(fast[v][0] - dist[v][0]) < 1e-12, (v, fast[v], dist[v])
            assert abs(fast[v][1] - dist[v][1]) < 1e-12, (v, fast[v], dist[v])


class TestMergeDistinctState:
    def test_chained_sketches_estimate_union(self, spark):
        from pramen_spark.operators.cdc import (
            estimate_distinct,
            merge_distinct_state,
        )

        # 300 keys, overlapping across batches: naive per-batch distinct
        # sums would double-count; the merged sketch must not
        df = spark.createDataFrame(
            [(i % 2, i % 300) for i in range(1000)], "g int, k int"
        )
        state = None
        for i in range(4):
            state = merge_distinct_state(
                state, df.filter(F.col("k") % 4 == i), ["g"], "k"
            )
        est = {r.g: r.n_distinct_est for r in estimate_distinct(state).collect()}
        exact = {
            r.g: r.n
            for r in df.groupBy("g")
            .agg(F.countDistinct("k").alias("n"))
            .collect()
        }
        for g in exact:
            assert abs(est[g] - exact[g]) <= 0.05 * exact[g], (g, est[g], exact[g])

    def test_batch_split_invariance(self, spark):
        from pramen_spark.operators.cdc import (
            estimate_distinct,
            merge_distinct_state,
        )

        df = spark.createDataFrame([(0, i) for i in range(500)], "g int, k int")
        a = merge_distinct_state(
            merge_distinct_state(None, df.filter("k < 100"), ["g"], "k"),
            df.filter("k >= 100"),
            ["g"],
            "k",
        )
        b = merge_distinct_state(None, df, ["g"], "k")
        ea = estimate_distinct(a).collect()[0].n_distinct_est
        eb = estimate_distinct(b).collect()[0].n_distinct_est
        # a UNIONED sketch loses the single-sketch sparse-mode exactness
        # (Datasketches HLL_4 union goes through the estimator), so split
        # invariance holds within the error envelope, not bitwise
        assert abs(ea - 500) <= 25 and abs(eb - 500) <= 25, (ea, eb)


class TestPagerankEdgeCases:
    def test_empty_edges_returns_empty(self, spark):
        from pramen_spark.operators.graph import pagerank

        edges = spark.createDataFrame([], "src long, dst long")
        out = pagerank(edges)
        assert out.columns == ["vertex", "rank"]
        assert out.count() == 0


class TestWeightedSampleTopk:
    def test_deterministic_across_partitioning(self, spark):
        from pramen_spark.operators.sampling import weighted_sample_topk

        df = spark.createDataFrame(
            [(i, float(1 + i % 7)) for i in range(200)], "k long, w double"
        )
        a = {r.k for r in weighted_sample_topk(df, "w", 30, "k").collect()}
        b = {r.k for r in weighted_sample_topk(
            df.repartition(13), "w", 30, "k").collect()}
        assert a == b and len(a) == 30

    def test_weight_proportional_inclusion(self, spark):
        from pramen_spark.operators.sampling import weighted_sample_topk

        # two strata: keys 0-99 weight 1, keys 100-199 weight 10; across
        # many salts the heavy stratum must dominate the sample
        df = spark.createDataFrame(
            [(i, 1.0 if i < 100 else 10.0) for i in range(200)],
            "k long, w double",
        )
        heavy = 0
        for salt in ("s1", "s2", "s3", "s4"):
            got = weighted_sample_topk(df, "w", 40, "k", salt=salt).collect()
            heavy += sum(1 for r in got if r.k >= 100)
        # E[heavy share] >> 50%; 4x40 draws make < 60% astronomically unlikely
        assert heavy / 160 > 0.6

    def test_nonpositive_weights_excluded(self, spark):
        from pramen_spark.operators.sampling import weighted_sample_topk

        df = spark.createDataFrame(
            [(1, 0.0), (2, -3.0), (3, 5.0)], "k long, w double"
        )
        got = {r.k for r in weighted_sample_topk(df, "w", 10, "k").collect()}
        assert got == {3}

    def test_grouped_k_per_group(self, spark):
        from pramen_spark.operators.sampling import weighted_sample_topk

        df = spark.createDataFrame(
            [(i, "g" + str(i % 3), 1.0 + i) for i in range(90)],
            "k long, g string, w double",
        )
        got = weighted_sample_topk(df, "w", 5, "k", group_cols=["g"]).collect()
        from collections import Counter
        assert Counter(r.g for r in got) == {"g0": 5, "g1": 5, "g2": 5}


def _hits_reference(edge_list, n_iter=8):
    verts = sorted({v for e in edge_list for v in e})
    h = {v: 1.0 for v in verts}
    a = {}
    for _ in range(n_iter):
        a = {v: 0.0 for v in verts}
        for u, v in edge_list:
            a[v] += h[u]
        mx = max(a.values())
        a = {v: x / mx for v, x in a.items()}
        h = {v: 0.0 for v in verts}
        for u, v in edge_list:
            h[u] += a[v]
        mx = max(h.values())
        h = {v: x / mx for v, x in h.items()}
    return h, a


class TestHits:
    def test_matches_sequential_reference(self, spark):
        from pramen_spark.operators.graph import hits

        edge_list = [(1, 10), (1, 11), (2, 10), (3, 11), (3, 12), (2, 10)]
        edges = spark.createDataFrame(edge_list, "src long, dst long")
        got = {r.vertex: (r.hub, r.authority) for r in hits(edges).collect()}
        h, a = _hits_reference(edge_list)
        assert set(got) == set(h)
        for v in h:
            assert abs(got[v][0] - h[v]) < 1e-12, ("hub", v)
            assert abs(got[v][1] - a[v]) < 1e-12, ("auth", v)

    def test_bipartite_roles(self, spark):
        from pramen_spark.operators.graph import hits

        # left side points right: hubs live left, authorities right
        edges = spark.createDataFrame(
            [(1, 10), (1, 11), (2, 10)], "src long, dst long"
        )
        got = {r.vertex: r for r in hits(edges).collect()}
        assert got[1].hub == 1.0          # strongest hub normalizes to 1
        assert got[10].authority == 1.0   # strongest authority likewise
        assert got[10].hub == 0.0 and got[1].authority == 0.0

    def test_empty_edges(self, spark):
        from pramen_spark.operators.graph import hits

        edges = spark.createDataFrame([], "src long, dst long")
        assert hits(edges).count() == 0


class TestReconcileDrilldown:
    def test_descent_touches_only_bad_buckets(self, spark):
        from pramen_spark.operators.reconcile import (
            bucket_expr,
            reconcile_drilldown,
        )
        from pyspark.sql import functions as SF

        rows = [(i, f"v{i}") for i in range(200)]
        drifted = [(k, "X" if k == 42 else v) for k, v in rows]
        left = spark.createDataFrame(rows, "k long, v string")
        right = spark.createDataFrame(drifted, "k long, v string")
        out = reconcile_drilldown(
            left, right, ["k"], ["v"], coarse_buckets=4, fine_buckets=64
        ).collect()
        # output covers exactly the rows of the ONE damaged coarse bucket
        bad_coarse = left.filter(SF.col("k") == 42).select(
            bucket_expr(["k"], 4).alias("b")
        ).collect()[0].b
        n_in_bad = left.filter(bucket_expr(["k"], 4) == bad_coarse).count()
        assert sum(r.n_left for r in out) == n_in_bad
        fine_bad = [r for r in out if not r.match]
        assert len(fine_bad) == 1 and fine_bad[0].n_left == fine_bad[0].n_right

    def test_identical_tables_empty_descent(self, spark):
        from pramen_spark.operators.reconcile import reconcile_drilldown

        rows = [(i, f"v{i}") for i in range(50)]
        df = spark.createDataFrame(rows, "k long, v string")
        out = reconcile_drilldown(df, df, ["k"], ["v"], 4, 64)
        assert out.count() == 0


class TestPrefixFilterJaccard:
    def test_equals_cooccurrence_pairs(self, spark, docs):
        from pramen_spark.operators.dedup import (
            ngram_jaccard_pairs,
            prefix_filter_jaccard_pairs,
        )

        for t in (0.2, 0.5, 0.8):
            a = sorted(map(str, prefix_filter_jaccard_pairs(docs, threshold=t).collect()))
            b = sorted(map(str, ngram_jaccard_pairs(docs, threshold=t).collect()))
            assert a == b, (t, a, b)

    def test_freq_cap_mirrors_cooccurrence(self, spark, docs):
        from pramen_spark.operators.dedup import (
            ngram_jaccard_pairs,
            prefix_filter_jaccard_pairs,
        )

        a = sorted(
            map(str, prefix_filter_jaccard_pairs(docs, threshold=0.3, max_shingle_freq=2).collect())
        )
        b = sorted(
            map(str, ngram_jaccard_pairs(docs, threshold=0.3, max_shingle_freq=2).collect())
        )
        assert a == b

    def test_prefix_explodes_fewer_shingles_than_full(self, spark, docs):
        """The point of the algorithm: at a high threshold the exploded
        prefix stream must be strictly smaller than the full shingle
        stream co-occurrence pairing explodes."""
        from pramen_spark.operators.dedup import hashed_shingles
        from pyspark.sql import functions as F

        base = hashed_shingles(docs, "doc_id", "text", 3)
        full = base.count()
        t = 0.8
        docs_arr = base.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        prefix_total = docs_arr.select(
            F.sum(
                F.col("n") - F.ceil(F.lit(t) * F.col("n")).cast("int") + 1
            ).alias("s")
        ).collect()[0].s
        assert prefix_total < full
