"""Unit tests for the round-8 wave-13 operators: calibration bins,
NDCG@k, Wilson proportion CI, embedding health audit, Zipf slope."""

import math

import pytest

from pyspark.sql import functions as F


class TestCalibrationBins:
    def test_perfectly_calibrated_bins_have_zero_gap(self, spark):
        from pramen_spark.operators.evalmetrics import calibration_bins

        # bin 0.2: 10 rows, 2 positives; bin 0.8: 10 rows, 8 positives
        rows = [(0.25, 1 if i < 2 else 0) for i in range(10)] + [
            (0.85, 1 if i < 8 else 0) for i in range(10)
        ]
        df = spark.createDataFrame(rows, "p double, y int")
        got = {r["bin"]: r for r in calibration_bins(df, "p", "y").collect()}
        assert got[2]["n"] == 10
        assert got[2]["frac_pos"] == pytest.approx(0.2)
        assert got[2]["gap"] == pytest.approx(0.05)  # |0.25 - 0.2|
        assert got[8]["gap"] == pytest.approx(0.05)

    def test_probability_one_folds_into_top_bin(self, spark):
        from pramen_spark.operators.evalmetrics import calibration_bins

        df = spark.createDataFrame([(1.0, 1), (0.95, 1)], "p double, y int")
        got = calibration_bins(df, "p", "y").collect()
        assert len(got) == 1 and got[0]["bin"] == 9 and got[0]["n"] == 2


class TestNdcgAtK:
    def _dfs(self, spark):
        # ideal: items a(1.0), b(0.8), c(0.5) at ranks 1..3
        ideal = spark.createDataFrame(
            [(1, "a", 1.0, 1), (1, "b", 0.8, 2), (1, "c", 0.5, 3)],
            "query_id long, vec_id string, cosine double, rank int",
        )
        return ideal

    def test_perfect_ranking_ndcg_one(self, spark):
        from pramen_spark.operators.evalmetrics import ndcg_at_k

        ideal = self._dfs(spark)
        r = ndcg_at_k(ideal, ideal, k=3).collect()[0]
        assert r["ndcg"] == pytest.approx(1.0)

    def test_swapped_ranking_penalized(self, spark):
        from pramen_spark.operators.evalmetrics import ndcg_at_k

        ideal = self._dfs(spark)
        ranked = spark.createDataFrame(
            [(1, "c", 0.5, 1), (1, "b", 0.8, 2), (1, "a", 1.0, 3)],
            "query_id long, vec_id string, cosine double, rank int",
        )
        r = ndcg_at_k(ranked, ideal, k=3).collect()[0]
        dcg = 0.5 / math.log2(2) + 0.8 / math.log2(3) + 1.0 / math.log2(4)
        idcg = 1.0 / math.log2(2) + 0.8 / math.log2(3) + 0.5 / math.log2(4)
        assert r["ndcg"] == pytest.approx(dcg / idcg, abs=1e-5)
        assert r["ndcg"] < 1.0

    def test_missing_item_gains_zero(self, spark):
        from pramen_spark.operators.evalmetrics import ndcg_at_k

        ideal = self._dfs(spark)
        ranked = spark.createDataFrame(
            [(1, "a", 1.0, 1), (1, "zzz", 0.9, 2), (1, "b", 0.8, 3)],
            "query_id long, vec_id string, cosine double, rank int",
        )
        r = ndcg_at_k(ranked, ideal, k=3).collect()[0]
        dcg = 1.0 / math.log2(2) + 0.0 + 0.8 / math.log2(4)
        assert r["dcg"] == pytest.approx(dcg, abs=1e-5)


class TestProportionCi:
    def test_wilson_matches_closed_form(self, spark):
        from pramen_spark.operators.drift import proportion_ci

        rows = [("a", True)] * 8 + [("a", False)] * 2
        df = spark.createDataFrame(rows, "grp string, s boolean")
        r = proportion_ci(df, "grp", "s").collect()[0]
        n, p, z = 10, 0.8, 1.96
        denom = 1 + z * z / n
        center = p + z * z / (2 * n)
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        assert r["rate"] == pytest.approx(0.8)
        assert r["ci_lo"] == pytest.approx((center - half) / denom, abs=1e-5)
        assert r["ci_hi"] == pytest.approx((center + half) / denom, abs=1e-5)

    def test_extreme_rates_stay_in_unit_interval(self, spark):
        from pramen_spark.operators.drift import proportion_ci

        rows = [("all", True)] * 5 + [("none", False)] * 5
        df = spark.createDataFrame(rows, "grp string, s boolean")
        got = {r["grp"]: r for r in proportion_ci(df, "grp", "s").collect()}
        assert 0.0 <= got["all"]["ci_lo"] < 1.0 and got["all"]["ci_hi"] == 1.0
        assert got["none"]["ci_lo"] == 0.0 and 0.0 < got["none"]["ci_hi"] <= 1.0


class TestEmbeddingHealthAudit:
    def test_flags_nan_zero_and_dim_drift(self, spark):
        from pramen_spark.operators.similarity import embedding_health_audit

        rows = [
            (0, [3.0, 4.0]),          # norm 5
            (0, [0.0, 0.0]),          # zero norm
            (0, [float("nan"), 1.0]), # NaN
            (1, [1.0, 0.0, 0.0]),     # dim drift in label 1
            (1, [0.0, 2.0]),
        ]
        df = spark.createDataFrame(rows, "label int, embedding array<double>")
        got = {
            r["label"]: r for r in embedding_health_audit(df).collect()
        }
        assert got[0]["n_vecs"] == 3
        assert got[0]["n_zero_norm"] == 1 and got[0]["n_nan"] == 1
        assert got[0]["norm_max"] == pytest.approx(5.0)
        assert got[0]["norm_min"] == pytest.approx(0.0)
        assert (got[1]["dim_min"], got[1]["dim_max"]) == (2, 3)
        assert got[1]["n_nan"] == 0


class TestZipfSlope:
    def test_exact_zipf_corpus_slope_minus_one(self, spark):
        from pramen_spark.operators.text import zipf_slope

        # token_i appears round(120/i) times: freq ~ 1/rank exactly-ish
        words = []
        for i in range(1, 13):
            words += [f"w{i:02d}"] * (120 // i)
        df = spark.createDataFrame(
            [(1, " ".join(words))], "doc_id long, text string"
        )
        r = zipf_slope(df, top_k=12).collect()[0]
        assert r["n_tokens_fit"] == 12
        assert r["slope"] == pytest.approx(-1.0, abs=0.05)
        assert r["r2"] > 0.99

    def test_uniform_corpus_flat_slope(self, spark):
        from pramen_spark.operators.text import zipf_slope

        words = [f"u{i}" for i in range(20)] * 5
        df = spark.createDataFrame(
            [(1, " ".join(words))], "doc_id long, text string"
        )
        r = zipf_slope(df, top_k=20).collect()[0]
        assert r["slope"] == pytest.approx(0.0, abs=1e-6)
        assert r["r2"] is None  # zero y-variance -> undefined fit quality
