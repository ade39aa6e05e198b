"""Unit tests for the round-8 wave-16 operators: 2-D skyline, interval
concurrency sweep, autocorrelation, Herfindahl index, Kaplan-Meier."""

import pytest

from pyspark.sql import functions as F


class TestSkyline2d:
    def test_frontier_and_ties(self, spark):
        from pramen_spark.operators.features import skyline_2d

        rows = [
            ("a", 1.0, 5),
            ("b", 2.0, 10),
            ("b2", 2.0, 10),  # equal twin of b: both survive
            ("c", 3.0, 10),  # dominated by b (cheaper, equal gain)
            ("d", 3.0, 9),  # dominated by b
            ("e", 0.5, 1),  # cheapest: on the frontier
        ]
        df = spark.createDataFrame(rows, "id string, cost double, gain int")
        got = sorted(
            r["id"] for r in skyline_2d(df, "cost", "gain").collect()
        )
        assert got == ["a", "b", "b2", "e"]

    def test_same_cost_strictly_better_dominates(self, spark):
        from pramen_spark.operators.features import skyline_2d

        df = spark.createDataFrame(
            [("x", 1.0, 3), ("y", 1.0, 4)], "id string, cost double, gain int"
        )
        got = [r["id"] for r in skyline_2d(df, "cost", "gain").collect()]
        assert got == ["y"]

    def test_single_row(self, spark):
        from pramen_spark.operators.features import skyline_2d

        df = spark.createDataFrame(
            [("only", 9.0, 1)], "id string, cost double, gain int"
        )
        assert skyline_2d(df, "cost", "gain").count() == 1


class TestIntervalConcurrency:
    DAY_US = 86_400_000_000

    def _run(self, spark, intervals):
        from pramen_spark.operators.sequences import interval_concurrency

        df = spark.createDataFrame(intervals, "s long, e long")
        return {
            str(r["day"]): (r["n_intervals"], r["max_concurrent"])
            for r in interval_concurrency(df, "s", "e").collect()
        }

    def test_overlap_and_touch(self, spark):
        # two overlapping + one touching at a single microsecond (closed
        # intervals: touching counts as concurrent)
        out = self._run(
            spark,
            [(0, 100), (50, 150), (150, 200)],
        )
        # [0,100]+[50,150] overlap; [50,150]+[150,200] touch at 150
        # (closed intervals -> concurrent); never all three at once
        assert out["1970-01-01"] == (3, 2)

    def test_zero_duration_registers(self, spark):
        out = self._run(spark, [(10, 10)])
        assert out["1970-01-01"] == (1, 1)

    def test_disjoint(self, spark):
        out = self._run(spark, [(0, 10), (20, 30)])
        assert out["1970-01-01"] == (2, 1)

    def test_midnight_span_counts_in_both_days(self, spark):
        out = self._run(
            spark, [(self.DAY_US - 50, self.DAY_US + 50), (10, 20)]
        )
        assert out["1970-01-01"] == (2, 1)
        assert out["1970-01-02"] == (1, 1)


class TestAutocorrelation:
    def test_alternating_series(self, spark):
        from pramen_spark.operators.timegrid import autocorrelation

        rows = [(i, float(1 + (i % 2))) for i in range(8)]  # 1,2,1,2,...
        df = spark.createDataFrame(rows, "t int, v double")
        got = {
            r["lag"]: (r["n"], r["acf"])
            for r in autocorrelation(df, "v", "t", max_lag=2).collect()
        }
        assert got[1] == (7, -1.0)
        assert got[2] == (6, 1.0)

    def test_constant_series_null_acf(self, spark):
        from pramen_spark.operators.timegrid import autocorrelation

        df = spark.createDataFrame(
            [(i, 5.0) for i in range(6)], "t int, v double"
        )
        rows = autocorrelation(df, "v", "t", max_lag=1).collect()
        assert rows[0]["acf"] is None  # zero variance: 0/0


class TestHerfindahlIndex:
    def test_monopoly_and_duopoly(self, spark):
        from pramen_spark.operators.skew import herfindahl_index

        rows = [
            ("mono", "s1", 100.0),
            ("duo", "s1", 50.0),
            ("duo", "s2", 50.0),
            ("duo", "s2", 0.0),  # same entity, second txn
        ]
        df = spark.createDataFrame(rows, "g string, ent string, v double")
        got = {
            r["grp"]: r
            for r in herfindahl_index(
                df, "g", "ent", F.col("v").cast("decimal(18,2)")
            ).collect()
        }
        assert got["mono"]["hhi"] == 1.0
        assert got["mono"]["top_share"] == 1.0
        assert got["mono"]["n_entities"] == 1
        assert got["duo"]["hhi"] == 0.5
        assert got["duo"]["top_share"] == 0.5
        assert got["duo"]["n_entities"] == 2

    def test_uneven_shares_exact(self, spark):
        from pramen_spark.operators.skew import herfindahl_index

        # shares 0.75 / 0.25 -> hhi = 0.5625 + 0.0625 = 0.625
        df = spark.createDataFrame(
            [("g", "a", 75.0), ("g", "b", 25.0)],
            "g string, ent string, v double",
        )
        r = herfindahl_index(
            df, "g", "ent", F.col("v").cast("decimal(18,2)")
        ).collect()[0]
        assert r["hhi"] == 0.625
        assert r["top_share"] == 0.75


class TestKaplanMeier:
    def test_textbook_curve(self, spark):
        from pramen_spark.operators.evalmetrics import kaplan_meier

        # subjects: event@1, event@2, censored@2, event@3
        df = spark.createDataFrame(
            [(1, 1), (2, 1), (2, 0), (3, 1)], "t int, ev int"
        )
        rows = {r["time"]: r for r in kaplan_meier(df, "t", "ev").collect()}
        assert rows[1]["at_risk"] == 4
        assert rows[1]["survival"] == pytest.approx(0.75)
        # censored@2 still at risk AT t=2 (events-before-censorings)
        assert rows[2]["at_risk"] == 3
        assert rows[2]["survival"] == pytest.approx(0.5)
        # last subject fails: survival pins to exact zero, no ln(0) trap
        assert rows[3]["at_risk"] == 1
        assert rows[3]["survival"] == 0.0

    def test_censored_only_times_absent(self, spark):
        from pramen_spark.operators.evalmetrics import kaplan_meier

        df = spark.createDataFrame(
            [(1, 1), (5, 0), (9, 0)], "t int, ev int"
        )
        out = kaplan_meier(df, "t", "ev").collect()
        assert [r["time"] for r in out] == [1]
        assert out[0]["survival"] == pytest.approx(round(2 / 3, 6))

    def test_no_events_empty(self, spark):
        from pramen_spark.operators.evalmetrics import kaplan_meier

        df = spark.createDataFrame([(4, 0), (7, 0)], "t int, ev int")
        assert kaplan_meier(df, "t", "ev").count() == 0
