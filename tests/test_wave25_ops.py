"""Unit tests for the round-8 wave-25 operators: Little's law audit,
gains curve, two-proportion z-test."""

import math

import pytest

from pyspark.sql import functions as F


class TestLittlesLawAudit:
    DAY = 86_400_000_000

    def test_single_day_identity(self, spark):
        from pramen_spark.operators.sequences import littles_law_audit

        # two sessions inside one day: identity holds exactly
        rows = [(0, 3_600_000_000 - 1), (0, 7_200_000_000 - 1)]
        df = spark.createDataFrame(rows, "s long, e long")
        r = littles_law_audit(df, "s", "e").collect()[0]
        assert r["n_arrivals"] == 2
        # busy = 1h + 2h = 3h -> L = 3/24 = 0.125
        assert r["l_measured"] == pytest.approx(0.125)
        assert r["l_predicted"] == pytest.approx(0.125)

    def test_midnight_span_diverges(self, spark):
        from pramen_spark.operators.sequences import littles_law_audit

        # session spans into day 2: arrival day carries full duration
        # in the prediction, but measured busy time splits
        rows = [(self.DAY - 3_600_000_000, self.DAY + 3_600_000_000 - 1)]
        df = spark.createDataFrame(rows, "s long, e long")
        out = {str(r["day"]): r for r in
               littles_law_audit(df, "s", "e").collect()}
        d1, d2 = out["1970-01-01"], out["1970-01-02"]
        assert d1["l_measured"] == pytest.approx(1 / 24, abs=1e-6)
        assert d1["l_predicted"] == pytest.approx(2 / 24, abs=1e-6)
        assert d2["n_arrivals"] == 0
        assert d2["l_measured"] == pytest.approx(1 / 24, abs=1e-6)
        assert d2["l_predicted"] is None  # no arrivals that day


class TestGainsCurve:
    def test_perfect_ranking(self, spark):
        from pramen_spark.operators.evalmetrics import gains_curve

        # scores 0..99, positives are the top 20 scores
        rows = [(float(i), 1 if i >= 80 else 0) for i in range(100)]
        df = spark.createDataFrame(rows, "s double, y int")
        out = {r["bin"]: r for r in gains_curve(
            df, F.col("s"), F.col("y") == 1, bins=10
        ).collect()}
        # top two deciles capture everything
        assert out[10]["cum_capture"] == 0.5
        assert out[9]["cum_capture"] == 1.0
        assert out[1]["cum_capture"] == 1.0
        assert out[5]["n_pos"] == 0

    def test_random_scores_flat_capture(self, spark):
        from pramen_spark.operators.evalmetrics import gains_curve

        # label independent of score: each bin captures ~its share
        rows = [(float(i), i % 2) for i in range(100)]
        df = spark.createDataFrame(rows, "s double, y int")
        out = {r["bin"]: r for r in gains_curve(
            df, F.col("s"), F.col("y") == 1, bins=2
        ).collect()}
        assert out[2]["capture"] == 0.5
        assert out[1]["cum_capture"] == 1.0


class TestTwoProportionZtest:
    def test_hand_computed(self, spark):
        from pramen_spark.operators.drift import two_proportion_ztest

        # group 1: 30/100 ; group 2: 20/100
        rows = ([(1, 1)] * 30 + [(1, 0)] * 70
                + [(0, 1)] * 20 + [(0, 0)] * 80)
        df = spark.createDataFrame(rows, "g int, o int")
        r = two_proportion_ztest(
            df, F.col("g") == 1, F.col("o") == 1
        ).collect()[0]
        assert (r["n_1"], r["x_1"], r["n_2"], r["x_2"]) == (100, 30, 100, 20)
        pool = 50 / 200
        z = (0.3 - 0.2) / math.sqrt(pool * (1 - pool) * (1 / 100 + 1 / 100))
        assert r["z"] == pytest.approx(round(z, 6), abs=1e-6)

    def test_equal_rates_zero(self, spark):
        from pramen_spark.operators.drift import two_proportion_ztest

        rows = [(1, 1), (1, 0), (0, 1), (0, 0)]
        df = spark.createDataFrame(rows, "g int, o int")
        r = two_proportion_ztest(
            df, F.col("g") == 1, F.col("o") == 1
        ).collect()[0]
        assert r["z"] == 0.0

    def test_empty_group_null(self, spark):
        from pramen_spark.operators.drift import two_proportion_ztest

        df = spark.createDataFrame([(1, 1), (1, 0)], "g int, o int")
        r = two_proportion_ztest(
            df, F.col("g") == 1, F.col("o") == 1
        ).collect()[0]
        assert r["z"] is None
