"""Unit tests for the round-8 wave-17 operators: Theil-Sen trend,
WOE/IV binning, inverted-index posting lists, activity streaks,
histogram-exact Spearman."""

import math

import pytest

from pyspark.sql import functions as F


class TestTheilSen:
    def test_exact_line(self, spark):
        from pramen_spark.operators.timegrid import theil_sen

        # y = 3x + 7 on days 0..4: every pairwise slope is 3
        rows = [(f"1970-01-0{i + 1}", 7.0 + 3.0 * i) for i in range(5)]
        df = spark.createDataFrame(rows, "d string, v double").select(
            F.to_date("d").alias("d"), "v"
        )
        r = theil_sen(df, "v", "d").collect()[0]
        assert r["n_points"] == 5
        assert r["n_pairs"] == 10
        assert r["slope"] == 3.0
        assert r["intercept"] == 7.0

    def test_outlier_resistance(self, spark):
        from pramen_spark.operators.timegrid import theil_sen

        # y = x except one wild outlier; median slope stays 1
        rows = [("1970-01-01", 0.0), ("1970-01-02", 1.0),
                ("1970-01-03", 2.0), ("1970-01-04", 3.0),
                ("1970-01-05", 1000.0)]
        df = spark.createDataFrame(rows, "d string, v double").select(
            F.to_date("d").alias("d"), "v"
        )
        r = theil_sen(df, "v", "d").collect()[0]
        assert abs(r["slope"] - 1.0) < 1.0  # OLS would be ~+199

    def test_driver_and_distributed_paths_agree(self, spark):
        from pramen_spark.operators.timegrid import theil_sen

        # irregular grid with ties in y, a null value, and a gap —
        # driver_max_points=0 forces the distributed pair join; the
        # default takes the numpy driver path. Same rounded row.
        rows = [
            ("2020-01-01", 5.0), ("2020-01-02", 7.5), ("2020-01-03", 7.5),
            ("2020-01-05", None), ("2020-01-08", 11.25), ("2020-01-09", 3.0),
            ("2020-01-13", 19.0),
        ]
        df = spark.createDataFrame(rows, "d string, v double").select(
            F.to_date("d").alias("d"), "v"
        )
        fast = theil_sen(df, "v", "d").collect()[0]
        dist = theil_sen(df, "v", "d", driver_max_points=0).collect()[0]
        assert fast.asDict() == dist.asDict()


class TestWoeIv:
    def test_perfect_separation_nulls(self, spark):
        from pramen_spark.operators.features import woe_iv

        # low values never positive, high always: end bins have a zero
        # side -> NULL woe by the explicit guard
        rows = [(float(i), 1 if i >= 50 else 0) for i in range(100)]
        df = spark.createDataFrame(rows, "v double, y int")
        out = {r["bin"]: r for r in
               woe_iv(df, "v", F.col("y") == 1, bins=2).collect()}
        assert set(out) == {1, 2}
        assert out[1]["woe"] is None and out[2]["woe"] is None
        assert out[1]["n_pos"] == 0 and out[2]["n_pos"] == 50

    def test_balanced_bins_zero_woe(self, spark):
        from pramen_spark.operators.features import woe_iv

        # same pos rate in both bins -> WOE 0, IV 0
        rows = [(float(i), i % 2) for i in range(40)]
        df = spark.createDataFrame(rows, "v double, y int")
        for r in woe_iv(df, "v", F.col("y") == 1, bins=2).collect():
            assert r["woe"] == 0.0
            assert r["iv_component"] == 0.0


class TestPostingLists:
    def test_df_and_sorted_truncation(self, spark):
        from pramen_spark.operators.text import posting_lists

        rows = [(3, "apple banana"), (1, "apple"), (2, "apple  cherry")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["token"]: r for r in
               posting_lists(df, min_df=1, max_postings=2).collect()}
        assert out["apple"]["doc_freq"] == 3
        assert out["apple"]["postings"] == [1, 2]  # smallest ids kept
        assert out["banana"]["postings"] == [3]
        assert out["cherry"]["postings"] == [2]

    def test_min_df_prunes(self, spark):
        from pramen_spark.operators.text import posting_lists

        rows = [(1, "common rare"), (2, "common")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        toks = {r["token"] for r in posting_lists(df, min_df=2).collect()}
        assert toks == {"common"}

    def test_dup_tokens_one_doc_once(self, spark):
        from pramen_spark.operators.text import posting_lists

        df = spark.createDataFrame(
            [(7, "echo echo echo")], "doc_id long, text string"
        )
        r = posting_lists(df, min_df=1).collect()[0]
        assert r["doc_freq"] == 1 and r["postings"] == [7]


class TestActivityStreaks:
    def test_streak_shapes(self, spark):
        from pramen_spark.operators.sequences import activity_streaks

        day = 86_400_000_000
        def ts(d):
            return d * day + 12 * 3_600_000_000  # noon on day d

        rows = (
            [(1, ts(0)), (1, ts(1)), (1, ts(2)), (1, ts(5))]  # 3-run + 1
            + [(2, ts(10))]  # single day
            + [(3, ts(0)), (3, ts(0) + 1)]  # two events same day
        )
        df = spark.createDataFrame(rows, "user_id long, us long").select(
            "user_id", F.timestamp_micros(F.col("us")).alias("ts")
        )
        out = {r["user"]: r for r in
               activity_streaks(df, "user_id", "ts").collect()}
        assert out[1]["longest_streak"] == 3
        assert out[1]["n_streaks"] == 2
        assert out[1]["n_active_days"] == 4
        assert out[2]["longest_streak"] == 1
        assert out[3]["n_active_days"] == 1


class TestSpearman:
    def test_perfect_monotone(self, spark):
        from pramen_spark.operators.drift import spearman

        rows = [(float(i), float(i * i)) for i in range(10)]
        df = spark.createDataFrame(rows, "x double, y double")
        r = spearman(df, "x", "y").collect()[0]
        assert r["rho"] == 1.0 and r["n"] == 10

    def test_reversed(self, spark):
        from pramen_spark.operators.drift import spearman

        rows = [(float(i), float(-i)) for i in range(10)]
        df = spark.createDataFrame(rows, "x double, y double")
        assert spearman(df, "x", "y").collect()[0]["rho"] == -1.0

    def test_ties_match_scipy_formula(self, spark):
        from pramen_spark.operators.drift import spearman

        # hand-computed tie-aware case: x has a tie
        xs = [1.0, 2.0, 2.0, 3.0]
        ys = [10.0, 20.0, 30.0, 40.0]
        # ranks x: 1, 2.5, 2.5, 4 ; ranks y: 1,2,3,4
        # pearson(rx, ry) = cov/sd: computed by hand = 0.9486832980505138
        df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
        r = spearman(df, "x", "y").collect()[0]
        assert r["rho"] == pytest.approx(0.948683, abs=1e-6)

    def test_constant_column_null(self, spark):
        from pramen_spark.operators.drift import spearman

        df = spark.createDataFrame(
            [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, y double"
        )
        assert spearman(df, "x", "y").collect()[0]["rho"] is None
