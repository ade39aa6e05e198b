"""Unit tests for the round-8 wave-23 operators: one-way ANOVA,
XmR control chart, seasonal factors, grouped OLS."""

import math

import pytest

from pyspark.sql import functions as F


class TestAnovaOneway:
    def test_hand_computed(self, spark):
        from pramen_spark.operators.drift import anova_oneway

        # groups: a = [1,2,3], b = [4,5,6] -> classic separable case
        rows = [("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 6)]
        df = spark.createDataFrame(rows, "g string, v int")
        r = anova_oneway(df, "g", F.col("v")).collect()[0]
        assert r["k"] == 2 and r["n"] == 6
        # grand mean 3.5; SSB = 3*(2-3.5)^2 + 3*(5-3.5)^2 = 13.5
        # SSW = 2 + 2 = 4 ; F = (13.5/1)/(4/4) = 13.5
        assert r["ss_between"] == pytest.approx(13.5, abs=1e-6)
        assert r["ss_within"] == pytest.approx(4.0, abs=1e-6)
        assert r["f_stat"] == pytest.approx(13.5, abs=1e-6)

    def test_identical_groups_zero_f(self, spark):
        from pramen_spark.operators.drift import anova_oneway

        rows = [("a", 1), ("a", 3), ("b", 1), ("b", 3)]
        df = spark.createDataFrame(rows, "g string, v int")
        r = anova_oneway(df, "g", F.col("v")).collect()[0]
        assert r["f_stat"] == pytest.approx(0.0, abs=1e-6)


class TestControlChart:
    def test_limits_and_violation(self, spark):
        from pramen_spark.operators.anomaly import control_chart

        vals = [10.0, 10.0, 10.0, 10.0, 50.0]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "t int, v double"
        )
        r = control_chart(df, "v", "t").collect()[0]
        # mean 18; mR = [0,0,0,40] -> mrbar 10 -> ucl 44.6, lcl -8.6
        assert r["mean"] == 18.0 and r["mr_bar"] == 10.0
        assert r["ucl"] == pytest.approx(44.6)
        assert r["lcl"] == pytest.approx(-8.6)
        assert r["n_violations"] == 1

    def test_stable_series_no_violations(self, spark):
        from pramen_spark.operators.anomaly import control_chart

        df = spark.createDataFrame(
            [(i, 5.0 + (i % 2)) for i in range(10)], "t int, v double"
        )
        assert control_chart(df, "v", "t").collect()[0]["n_violations"] == 0


class TestSeasonalFactors:
    def test_pure_weekly_cycle(self, spark):
        from pramen_spark.operators.timegrid import seasonal_factors

        # 21 consecutive days: value = weekday index (0..6 repeating).
        # The centered MA(7) is the constant 3, so factors = dow - 3.
        rows = []
        for i in range(21):
            d = f"2024-01-{i + 1:02d}"  # 2024-01-01 is a Monday
            rows.append((d, float(i % 7)))
        df = spark.createDataFrame(rows, "d string, v double").select(
            F.to_date("d").alias("d"), "v"
        )
        out = {r["dow"]: r for r in
               seasonal_factors(df, "v", "d", period=7).collect()}
        for dow in range(7):
            assert out[dow]["factor"] == pytest.approx(dow - 3.0, abs=1e-6)
        # edges trimmed: 21 days - 3 head - 3 tail = 15 rows total
        assert sum(r["n"] for r in out.values()) == 15


class TestOlsByGroup:
    def test_per_group_lines(self, spark):
        from pramen_spark.operators.drift import ols_by_group

        rows = []
        for x in range(6):
            rows.append(("up", float(x), 2.0 * x + 1.0))
            rows.append(("down", float(x), -3.0 * x + 10.0))
        df = spark.createDataFrame(rows, "g string, x double, y double")
        out = {r["grp"]: r for r in
               ols_by_group(df, "g", F.col("x"), F.col("y")).collect()}
        assert out["up"]["slope"] == 2.0 and out["up"]["intercept"] == 1.0
        assert out["down"]["slope"] == -3.0 and out["down"]["r2"] == 1.0

    def test_flat_group_null_r2(self, spark):
        from pramen_spark.operators.drift import ols_by_group

        rows = [("flat", float(x), 7.0) for x in range(4)]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        r = ols_by_group(df, "g", F.col("x"), F.col("y")).collect()[0]
        assert r["slope"] == 0.0 and r["r2"] is None
