"""Unit tests for the round-8 wave-18 operators: cohort LTV triangle,
new-vs-returning split, Wald-Wolfowitz runs test, Grubbs outlier test,
seasonal-naive forecast backtest."""

import math

import pytest

from pyspark.sql import functions as F


class TestCohortLtv:
    def test_triangle_and_cumulative(self, spark):
        from pramen_spark.operators.features import cohort_ltv

        rows = [
            # cust 1: first in Jan, again in Mar
            (1, "2024-01-10", 100.0),
            (1, "2024-03-05", 50.0),
            # cust 2: first in Jan too
            (2, "2024-01-20", 10.0),
            # cust 3: first in Feb
            (3, "2024-02-01", 7.0),
        ]
        df = spark.createDataFrame(rows, "c long, d string, amt double")
        out = {
            (str(r["cohort_month"]), r["month_offset"]): r
            for r in cohort_ltv(
                df, "c", F.to_date("d"), F.col("amt").cast("decimal(18,2)")
            ).collect()
        }
        jan0 = out[("2024-01-01", 0)]
        assert jan0["n_active"] == 2 and jan0["revenue"] == 110.0
        jan2 = out[("2024-01-01", 2)]
        assert jan2["n_active"] == 1 and jan2["revenue"] == 50.0
        assert jan2["cum_revenue"] == 160.0
        feb0 = out[("2024-02-01", 0)]
        assert feb0["revenue"] == 7.0 and feb0["cum_revenue"] == 7.0

    def test_year_rollover_offset(self, spark):
        from pramen_spark.operators.features import cohort_ltv

        rows = [(1, "2023-12-15", 1.0), (1, "2024-01-15", 2.0)]
        df = spark.createDataFrame(rows, "c long, d string, amt double")
        offs = {
            r["month_offset"]: r
            for r in cohort_ltv(
                df, "c", F.to_date("d"), F.col("amt").cast("decimal(18,2)")
            ).collect()
        }
        assert set(offs) == {0, 1}
        assert str(offs[0]["cohort_month"]) == "2023-12-01"


class TestNewVsReturning:
    def test_split(self, spark):
        from pramen_spark.operators.sequences import new_vs_returning

        day = 86_400_000_000
        rows = [
            (1, 0 * day + 5), (1, 1 * day + 5),   # new day0, returns day1
            (2, 1 * day + 9),                      # new day1
            (2, 1 * day + 10),                     # same day, still one row
        ]
        df = spark.createDataFrame(rows, "user_id long, us long").select(
            "user_id", F.timestamp_micros(F.col("us")).alias("ts")
        )
        out = {
            str(r["day"]): r
            for r in new_vs_returning(df, "user_id", "ts").collect()
        }
        d0, d1 = out["1970-01-01"], out["1970-01-02"]
        assert (d0["n_users"], d0["n_new"], d0["n_returning"]) == (1, 1, 0)
        assert (d1["n_users"], d1["n_new"], d1["n_returning"]) == (2, 1, 1)


class TestRunsTest:
    def _df(self, spark, vals):
        return spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)], "t int, v double"
        )

    def test_alternating_counts(self, spark):
        from pramen_spark.operators.anomaly import runs_test

        # 1,9 alternating: median 5, every step flips sign -> runs = n
        r = runs_test(self._df(spark, [1, 9, 1, 9, 1, 9]), "v", "t").collect()[0]
        assert (r["n_pos"], r["n_neg"], r["n_runs"]) == (3, 3, 6)
        assert r["z"] > 0  # more runs than expected

    def test_clustered_two_runs(self, spark):
        from pramen_spark.operators.anomaly import runs_test

        r = runs_test(self._df(spark, [1, 1, 1, 9, 9, 9]), "v", "t").collect()[0]
        assert r["n_runs"] == 2
        assert r["z"] < 0  # fewer runs than expected

    def test_median_equal_values_drop(self, spark):
        from pramen_spark.operators.anomaly import runs_test

        # median of [1,5,5,9] interpolates to 5 -> the two 5s drop
        r = runs_test(self._df(spark, [1, 5, 5, 9]), "v", "t").collect()[0]
        assert r["n_pos"] == 1 and r["n_neg"] == 1 and r["n_runs"] == 2


class TestGrubbsTest:
    def test_finds_the_outlier(self, spark):
        from pramen_spark.operators.anomaly import grubbs_test

        vals = [10.0, 11.0, 9.0, 10.5, 9.5, 100.0]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "t int, v double"
        )
        r = grubbs_test(df, "v", "t").collect()[0]
        assert r["at"] == 5 and r["value"] == 100.0 and r["n"] == 6
        # hand check: mean = 25, sd = sqrt(sum((v-25)^2)/5)
        mean = sum(vals) / 6
        sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / 5)
        assert r["g_stat"] == pytest.approx((100 - mean) / sd, abs=1e-6)

    def test_tie_breaks_to_later_order(self, spark):
        from pramen_spark.operators.anomaly import grubbs_test

        df = spark.createDataFrame(
            [(0, 0.0), (1, 10.0), (2, 0.0)], "t int, v double"
        )
        # 0.0 rows tie on deviation; later t wins deterministically
        r = grubbs_test(df, "v", "t").collect()[0]
        assert r["at"] in (1, 2)  # 10 deviates most from mean 10/3... check
        # mean = 10/3; dev(10) = 20/3 > dev(0) = 10/3 -> at == 1
        assert r["at"] == 1


class TestForecastBacktest:
    def test_perfect_seasonal_zero_error(self, spark):
        from pramen_spark.operators.timegrid import forecast_backtest

        # period-2 series scored with season=2: lag-2 forecast is exact
        vals = [5.0, 8.0] * 5
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "t int, v double"
        )
        r = forecast_backtest(df, "v", "t", season=2).collect()[0]
        assert r["n"] == 8
        assert r["mae"] == 0.0 and r["rmse"] == 0.0 and r["mape"] == 0.0

    def test_constant_offset_error(self, spark):
        from pramen_spark.operators.timegrid import forecast_backtest

        # strictly increasing by 3 with season=1: every error is 3
        df = spark.createDataFrame(
            [(i, 10.0 + 3.0 * i) for i in range(5)], "t int, v double"
        )
        r = forecast_backtest(df, "v", "t", season=1).collect()[0]
        assert r["n"] == 4
        assert r["mae"] == 3.0 and r["rmse"] == 3.0
        assert r["mape"] == pytest.approx(
            round(sum(3 / (10 + 3 * i) for i in range(1, 5)) / 4, 6), abs=1e-6
        )
