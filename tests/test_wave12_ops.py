"""Unit tests for the round-8 wave-12 operators: exact AUC, Gini
coefficient, temporal embargo split, overdispersion, and weekday
seasonality."""

import datetime

import pytest

from pyspark.sql import functions as F


class TestAuc:
    def _run(self, spark, pairs):
        from pramen_spark.operators.evalmetrics import auc

        df = spark.createDataFrame(pairs, "s double, y int")
        return auc(df, "s", "y").collect()[0]

    def test_perfect_separation(self, spark):
        r = self._run(spark, [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)])
        assert (r["n_pos"], r["n_neg"], r["auc"]) == (2, 2, 1.0)

    def test_inverted_scores(self, spark):
        r = self._run(spark, [(4.0, 0), (3.0, 0), (2.0, 1), (1.0, 1)])
        assert r["auc"] == 0.0

    def test_random_interleaving(self, spark):
        # pos at 2,4; neg at 1,3: pairs (2>1),(2<3),(4>1),(4>3) -> 3/4
        r = self._run(spark, [(1.0, 0), (2.0, 1), (3.0, 0), (4.0, 1)])
        assert r["auc"] == pytest.approx(0.75)

    def test_ties_get_half_credit(self, spark):
        r = self._run(spark, [(1.0, 0), (1.0, 1)])
        assert r["auc"] == pytest.approx(0.5)

    def test_matches_sklearn_style_reference(self, spark):
        import random

        rng = random.Random(7)
        pairs = [
            (round(rng.random(), 3), 1 if rng.random() < 0.4 else 0)
            for _ in range(300)
        ]
        r = self._run(spark, pairs)
        # brute-force O(n^2) reference with half credit on ties
        pos = [s for s, y in pairs if y == 1]
        neg = [s for s, y in pairs if y == 0]
        u = sum(
            1.0 if p > q else (0.5 if p == q else 0.0)
            for p in pos for q in neg
        )
        assert r["auc"] == pytest.approx(u / (len(pos) * len(neg)), abs=1e-6)


class TestGini:
    def _run(self, spark, vals):
        from pramen_spark.operators.evalmetrics import gini

        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)], "id long, x double"
        )
        return gini(df, "x", "id").collect()[0]

    def test_perfect_equality_zero(self, spark):
        r = self._run(spark, [10.0] * 8)
        assert r["gini"] == pytest.approx(0.0)
        assert r["total"] == pytest.approx(80.0)

    def test_total_concentration_near_one(self, spark):
        n = 20
        r = self._run(spark, [0.0] * (n - 1) + [100.0])
        assert r["gini"] == pytest.approx((n - 1) / n, abs=1e-6)

    def test_known_small_case(self, spark):
        # x = [1,2,3,4]: G = 2*(1*1+2*2+3*3+4*4)/(4*10) - 5/4 = 0.25
        r = self._run(spark, [1.0, 2.0, 3.0, 4.0])
        assert r["gini"] == pytest.approx(0.25)


class TestTemporalSplit:
    def test_split_boundaries_and_embargo(self, spark):
        from pramen_spark.operators.sampling import temporal_split

        rows = [
            (i, datetime.datetime(2024, 1, d, 12))
            for i, d in enumerate([1, 5, 17, 18, 19, 20, 31])
        ]
        df = spark.createDataFrame(rows, "id long, ts timestamp")
        out = temporal_split(df, "ts", test_days=10, embargo_days=2)
        got = {r["id"]: r["split"] for r in out.collect()}
        # horizon = Jan 31; test >= Jan 22; embargo >= Jan 20
        assert got[0] == "train" and got[1] == "train"
        assert got[2] == "train" and got[3] == "train" and got[4] == "train"
        assert got[5] == "embargo"
        assert got[6] == "test"

    def test_all_columns_preserved(self, spark):
        from pramen_spark.operators.sampling import temporal_split

        df = spark.createDataFrame(
            [(1, datetime.datetime(2024, 1, 1), "x")],
            "id long, ts timestamp, payload string",
        )
        out = temporal_split(df, "ts")
        assert set(out.columns) == {"id", "ts", "payload", "split"}


class TestOverdispersion:
    def test_poisson_like_near_one_and_bursty_above(self, spark):
        from pramen_spark.operators.anomaly import overdispersion

        rows = (
            # 'flat': 4 users x 3 events each -> var 0, dispersion 0
            [("flat", u) for u in range(4) for _ in range(3)]
            # 'bursty': one user with 9, three with 1
            + [("bursty", 0)] * 9
            + [("bursty", u) for u in (1, 2, 3)]
        )
        df = spark.createDataFrame(rows, "grp string, user long")
        got = {
            r["grp"]: r for r in overdispersion(df, "grp", "user").collect()
        }
        assert got["flat"]["dispersion"] == pytest.approx(0.0)
        assert got["flat"]["overdispersed"] is False
        # bursty: counts [9,1,1,1]: mean 3, var 16 -> dispersion 16/3
        assert got["bursty"]["mean_count"] == pytest.approx(3.0)
        assert got["bursty"]["var_count"] == pytest.approx(16.0)
        assert got["bursty"]["overdispersed"] is True


class TestWeekdaySeasonality:
    def test_profile_and_index(self, spark):
        from pramen_spark.operators.timegrid import weekday_seasonality

        # Mon Jan 1 2024; two Mondays at 10, one Tuesday at 40
        rows = [
            (datetime.datetime(2024, 1, 1, 9), 10.0),
            (datetime.datetime(2024, 1, 8, 9), 10.0),
            (datetime.datetime(2024, 1, 2, 9), 40.0),
        ]
        df = spark.createDataFrame(rows, "ts timestamp, value double")
        got = {
            r["dow"]: r for r in weekday_seasonality(df, "ts", "value").collect()
        }
        assert got[0]["n"] == 2 and got[0]["mean_value"] == pytest.approx(10.0)
        assert got[1]["n"] == 1 and got[1]["mean_value"] == pytest.approx(40.0)
        assert got[0]["seasonality_index"] == pytest.approx(0.5)
        assert got[1]["seasonality_index"] == pytest.approx(2.0)
