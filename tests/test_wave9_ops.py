"""Unit tests for the round-8 wave-9 operators: mutual information,
embedding covariance, distributed k-means steps, blocked edit-distance
pairs, and DP-noised counts."""

import math

import pytest

from pyspark.sql import functions as F


class TestMutualInformation:
    def test_independent_columns_zero_mi(self, spark):
        from pramen_spark.operators.drift import mutual_information

        # x and y independent and uniform: every cell has PMI 0
        rows = [(x, y) for x in ("a", "b") for y in (0, 1) for _ in range(5)]
        df = spark.createDataFrame(rows, "x string, y long")
        out = mutual_information(df, "x", "y").collect()
        assert len(out) == 4
        for r in out:
            assert r["pmi"] == pytest.approx(0.0)
            assert r["mi_contrib"] == pytest.approx(0.0)

    def test_perfect_dependence_mi_is_entropy(self, spark):
        from pramen_spark.operators.drift import mutual_information

        # y == x: MI = H(X) = 1 bit for a uniform binary x
        rows = [("a", 0)] * 4 + [("b", 1)] * 4
        df = spark.createDataFrame(rows, "x string, y long")
        out = mutual_information(df, "x", "y").collect()
        assert sum(r["mi_contrib"] for r in out) == pytest.approx(1.0, abs=1e-6)
        for r in out:
            assert r["pmi"] == pytest.approx(1.0)

    def test_cell_counts(self, spark):
        from pramen_spark.operators.drift import mutual_information

        rows = [("a", 0)] * 3 + [("a", 1)] * 1 + [("b", 1)] * 4
        df = spark.createDataFrame(rows, "x string, y long")
        got = {
            (r["x"], r["y"]): r["n_xy"]
            for r in mutual_information(df, "x", "y").collect()
        }
        assert got == {("a", 0): 3, ("a", 1): 1, ("b", 1): 4}


class TestCovarianceMatrix:
    def test_matches_manual_covariance(self, spark):
        from pramen_spark.operators.similarity import covariance_matrix

        vecs = [[1.0, 2.0], [3.0, 4.0], [5.0, 9.0]]
        df = spark.createDataFrame(
            [(v,) for v in vecs], "embedding array<double>"
        )
        got = {
            (r["i"], r["j"]): r["cov"]
            for r in covariance_matrix(df, "embedding", (1, 2)).collect()
        }
        xs = [v[0] for v in vecs]
        ys = [v[1] for v in vecs]
        mx, my = sum(xs) / 3, sum(ys) / 3

        def cov(a, b, ma, mb):
            return sum((u - ma) * (w - mb) for u, w in zip(a, b)) / 3

        assert got[(1, 1)] == pytest.approx(cov(xs, xs, mx, mx), abs=1e-6)
        assert got[(1, 2)] == pytest.approx(cov(xs, ys, mx, my), abs=1e-6)
        assert got[(2, 2)] == pytest.approx(cov(ys, ys, my, my), abs=1e-6)
        assert (2, 1) not in got  # upper triangle only


class TestKmeans:
    def _mk(self, spark):
        pts = [
            (0, [0.0, 0.0]), (1, [0.2, 0.0]), (2, [0.0, 0.2]),
            (3, [10.0, 10.0]), (4, [10.2, 10.0]),
        ]
        return spark.createDataFrame(pts, "vec_id long, embedding array<double>")

    def _seeds(self, spark):
        return spark.createDataFrame(
            [(1, [0.0, 0.0]), (2, [10.0, 10.0])],
            "cid long, cvec array<double>",
        )

    def test_assignment_nearest_and_dist(self, spark):
        from pramen_spark.operators.similarity import kmeans_assign

        got = {
            r["vec_id"]: (r["cid"], r["dist2"])
            for r in kmeans_assign(self._mk(spark), self._seeds(spark)).collect()
        }
        assert got[0] == (1, 0.0)
        assert got[3] == (2, 0.0)
        assert got[1][0] == 1 and got[1][1] == pytest.approx(0.04)
        assert got[4][0] == 2

    def test_step_reestimates_centroids(self, spark):
        from pramen_spark.operators.similarity import kmeans_step

        got = {
            r["cluster_id"]: r
            for r in kmeans_step(
                self._mk(spark), self._seeds(spark), report_dims=(1, 2)
            ).collect()
        }
        assert got[1]["n_members"] == 3 and got[2]["n_members"] == 2
        assert got[1]["c1"] == pytest.approx((0.0 + 0.2 + 0.0) / 3, abs=1e-6)
        assert got[1]["c2"] == pytest.approx(0.2 / 3, abs=1e-6)
        assert got[2]["c1"] == pytest.approx(10.1, abs=1e-6)
        assert got[1]["inertia"] == pytest.approx(0.08, abs=1e-4)

    def test_tie_breaks_to_lowest_cid(self, spark):
        from pramen_spark.operators.similarity import kmeans_assign

        df = spark.createDataFrame(
            [(0, [5.0, 5.0])], "vec_id long, embedding array<double>"
        )
        got = kmeans_assign(df, self._seeds(spark)).collect()[0]
        assert got["cid"] == 1  # equidistant -> lowest centroid id

    def test_empty_centroids_raises(self, spark):
        from pramen_spark.operators.similarity import kmeans_assign

        empty = spark.createDataFrame([], "cid long, cvec array<double>")
        with pytest.raises(ValueError, match="empty"):
            kmeans_assign(self._mk(spark), empty)


class TestEditDistancePairs:
    def test_finds_small_edits_within_block(self, spark):
        from pramen_spark.operators.dedup import edit_distance_pairs

        base = "the quick brown fox jumps over the lazy dog " * 3
        rows = [
            (1, base, "en"),
            (2, base.replace("lazy", "hazy", 1), "en"),  # 1 edit, same prefix
            (3, "zzz " + base, "en"),  # same content, different prefix
            (4, base, "de"),  # same text, different lang block
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        got = {
            (r["id_a"], r["id_b"]): r["edit_dist"]
            for r in edit_distance_pairs(df, max_dist=40).collect()
        }
        assert got == {(1, 2): 1}

    def test_threshold_filters(self, spark):
        from pramen_spark.operators.dedup import edit_distance_pairs

        prefix = "common prefix here: "
        rows = [
            (1, prefix + "a" * 50, "en"),
            (2, prefix + "b" * 50, "en"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        assert edit_distance_pairs(df, max_dist=40).count() == 0
        assert (
            edit_distance_pairs(df, max_dist=60).collect()[0]["edit_dist"] == 50
        )


class TestDpNoisyCounts:
    def test_noise_is_deterministic_and_bounded(self, spark):
        from pramen_spark.operators.validation import dp_noisy_counts

        rows = [(s,) for s in ["a"] * 10 + ["b"] * 20 + ["c"] * 5]
        df = spark.createDataFrame(rows, "seg string")
        a = {r["seg"]: r for r in dp_noisy_counts(df, ["seg"], epsilon=1.0).collect()}
        b = {r["seg"]: r for r in dp_noisy_counts(df, ["seg"], epsilon=1.0).collect()}
        assert {k: v["n_noisy"] for k, v in a.items()} == {
            k: v["n_noisy"] for k, v in b.items()
        }
        assert a["a"]["n_true"] == 10
        for r in a.values():
            assert r["n_noisy"] != r["n_true"]  # noise actually applied
            # Laplace(1) noise beyond 15 has probability ~e^-15
            assert abs(r["n_noisy"] - r["n_true"]) < 15

    def test_different_seed_different_noise(self, spark):
        from pramen_spark.operators.validation import dp_noisy_counts

        df = spark.createDataFrame([("a",)] * 7, "seg string")
        n1 = dp_noisy_counts(df, ["seg"], seed="s1").collect()[0]["n_noisy"]
        n2 = dp_noisy_counts(df, ["seg"], seed="s2").collect()[0]["n_noisy"]
        assert n1 != n2

    def test_epsilon_scales_noise(self, spark):
        from pramen_spark.operators.validation import dp_noisy_counts

        df = spark.createDataFrame([("a",)] * 7, "seg string")
        n1 = dp_noisy_counts(df, ["seg"], epsilon=1.0).collect()[0]["n_noisy"]
        n01 = dp_noisy_counts(df, ["seg"], epsilon=0.1).collect()[0]["n_noisy"]
        # same uniform, 10x scale: deviation from the true count is 10x
        assert (n01 - 7) == pytest.approx(10 * (n1 - 7), abs=1e-4)
