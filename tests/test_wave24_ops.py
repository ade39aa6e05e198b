"""Unit tests for the round-8 wave-24 operators: odds ratio, McNemar,
Lorenz curve, peer z-score."""

import math

import pytest

from pyspark.sql import functions as F


class TestOddsRatio:
    def test_hand_computed(self, spark):
        from pramen_spark.operators.drift import odds_ratio

        # a=10 exp+pos, b=20 exp+neg, c=5 unexp+pos, d=40 unexp+neg
        rows = (
            [(1, 1)] * 10 + [(1, 0)] * 20 + [(0, 1)] * 5 + [(0, 0)] * 40
        )
        df = spark.createDataFrame(rows, "e int, o int")
        r = odds_ratio(df, F.col("e") == 1, F.col("o") == 1).collect()[0]
        assert (r["n_exp_pos"], r["n_exp_neg"]) == (10, 20)
        # OR = (10*40)/(20*5) = 4
        assert r["odds_ratio"] == 4.0
        se = math.sqrt(1 / 10 + 1 / 20 + 1 / 5 + 1 / 40)
        assert r["ci_lo"] == pytest.approx(
            round(math.exp(math.log(4) - 1.96 * se), 6), abs=1e-6
        )
        assert r["ci_lo"] < 4.0 < r["ci_hi"]

    def test_empty_cell_null(self, spark):
        from pramen_spark.operators.drift import odds_ratio

        rows = [(1, 1), (0, 0)]  # b and c empty
        df = spark.createDataFrame(rows, "e int, o int")
        r = odds_ratio(df, F.col("e") == 1, F.col("o") == 1).collect()[0]
        assert r["odds_ratio"] is None


class TestMcnemar:
    def test_symmetric_disagreement(self, spark):
        from pramen_spark.operators.evalmetrics import mcnemar_test

        rows = [(1, 0)] * 5 + [(0, 1)] * 5 + [(1, 1)] * 10
        df = spark.createDataFrame(rows, "y int, p int")
        r = mcnemar_test(df, F.col("y") == 1, F.col("p") == 1).collect()[0]
        assert r["n_b"] == 5 and r["n_c"] == 5
        assert r["chi2"] == 0.0

    def test_one_sided_disagreement(self, spark):
        from pramen_spark.operators.evalmetrics import mcnemar_test

        rows = [(1, 0)] * 9 + [(0, 1)] * 1 + [(0, 0)] * 5
        df = spark.createDataFrame(rows, "y int, p int")
        r = mcnemar_test(df, F.col("y") == 1, F.col("p") == 1).collect()[0]
        # chi2 = (9-1)^2/10 = 6.4
        assert r["chi2"] == pytest.approx(6.4)

    def test_no_disagreement_null(self, spark):
        from pramen_spark.operators.evalmetrics import mcnemar_test

        df = spark.createDataFrame([(1, 1), (0, 0)], "y int, p int")
        r = mcnemar_test(df, F.col("y") == 1, F.col("p") == 1).collect()[0]
        assert r["chi2"] is None


class TestLorenzCurve:
    def test_perfect_equality_diagonal(self, spark):
        from pramen_spark.operators.finance import lorenz_curve

        rows = [(str(i), 10.0) for i in range(10)]
        df = spark.createDataFrame(rows, "k string, v double")
        out = {r["bucket"]: r for r in lorenz_curve(
            df, "k", F.col("v").cast("decimal(18,2)"), n_buckets=5
        ).collect()}
        # equal values: cum_share is the diagonal k/5
        for b in range(1, 6):
            assert out[b]["cum_share"] == pytest.approx(b / 5)
            assert out[b]["n_keys"] == 2

    def test_concentration(self, spark):
        from pramen_spark.operators.finance import lorenz_curve

        # 4 small + 1 whale: bottom 80% of entities hold 4/104 of value
        rows = [("a", 1.0), ("b", 1.0), ("c", 1.0), ("d", 1.0),
                ("w", 100.0)]
        df = spark.createDataFrame(rows, "k string, v double")
        out = {r["bucket"]: r for r in lorenz_curve(
            df, "k", F.col("v").cast("decimal(18,2)"), n_buckets=5
        ).collect()}
        assert out[4]["cum_share"] == pytest.approx(round(4 / 104, 6))
        assert out[5]["cum_share"] == 1.0


class TestPeerZscore:
    def test_flags_only_peer_outliers(self, spark):
        from pramen_spark.operators.skew import peer_zscore

        rows = (
            [("g1", f"e{i}", 10.0) for i in range(5)]
            + [("g1", "spike", 30.0)]
            + [("g2", f"f{i}", float(i)) for i in range(6)]
        )
        df = spark.createDataFrame(rows, "g string, e string, v double")
        out = peer_zscore(df, "g", "e", "v", threshold=2.0).collect()
        assert [r["entity"] for r in out] == ["spike"]
        assert out[0]["z"] > 2.0

    def test_singleton_group_not_flagged(self, spark):
        from pramen_spark.operators.skew import peer_zscore

        df = spark.createDataFrame(
            [("solo", "only", 99.0)], "g string, e string, v double"
        )
        assert peer_zscore(df, "g", "e", "v").count() == 0
