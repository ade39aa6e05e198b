"""Unit tests for the round-8 wave-11 operators: target encoding,
rare-category collapse, churn labels, path n-grams, and Welch's t-test."""

import datetime
import math

import pytest

from pyspark.sql import functions as F


class TestTargetEncode:
    def test_shrinks_rare_toward_global_mean(self, spark):
        from pramen_spark.operators.features import target_encode

        # 'big': 100 rows of 10.0; 'tiny': 1 row of 100.0
        rows = [("big", 10.0)] * 100 + [("tiny", 100.0)]
        df = spark.createDataFrame(rows, "cat string, y double")
        got = {
            r["category"]: r
            for r in target_encode(df, "cat", "y", smoothing=10.0).collect()
        }
        gmean = (100 * 10.0 + 100.0) / 101
        assert got["big"]["n"] == 100
        assert got["big"]["enc"] == pytest.approx(
            (1000.0 + 10 * gmean) / 110, abs=1e-6
        )
        tiny = got["tiny"]["enc"]
        assert tiny == pytest.approx((100.0 + 10 * gmean) / 11, abs=1e-6)
        # shrinkage: far from the raw mean 100, close-ish to the prior
        assert tiny < 30

    def test_zero_smoothing_is_plain_mean(self, spark):
        from pramen_spark.operators.features import target_encode

        df = spark.createDataFrame(
            [("a", 2.0), ("a", 4.0), ("b", 10.0)], "cat string, y double"
        )
        got = {
            r["category"]: r["enc"]
            for r in target_encode(df, "cat", "y", smoothing=0.0).collect()
        }
        assert got["a"] == pytest.approx(3.0)
        assert got["b"] == pytest.approx(10.0)


class TestCollapseRare:
    def test_collapses_below_threshold_only(self, spark):
        from pramen_spark.operators.features import collapse_rare

        rows = [("hot",)] * 5 + [("warm",)] * 3 + [("rare",)] * 1
        df = spark.createDataFrame(rows, "cat string")
        got = (
            collapse_rare(df, "cat", min_count=3)
            .groupBy("cat")
            .count()
            .collect()
        )
        counts = {r["cat"]: r["count"] for r in got}
        assert counts == {"hot": 5, "warm": 3, "__other__": 1}

    def test_other_label_and_column_preserved(self, spark):
        from pramen_spark.operators.features import collapse_rare

        df = spark.createDataFrame(
            [("x", 1), ("y", 2)], "cat string, v long"
        )
        out = collapse_rare(df, "cat", min_count=2, other_label="<unk>")
        assert out.columns == ["cat", "v"]
        assert {r["cat"] for r in out.collect()} == {"<unk>"}


class TestChurnLabels:
    def test_labels_against_horizon(self, spark):
        from pramen_spark.operators.sequences import churn_labels

        rows = [
            (1, datetime.datetime(2024, 1, 20, 9)),
            (1, datetime.datetime(2024, 1, 2, 9)),
            (2, datetime.datetime(2024, 1, 5, 9)),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {
            r["user_id"]: r for r in churn_labels(df, inactive_days=7).collect()
        }
        assert got[1]["days_inactive"] == 0 and got[1]["churned"] is False
        assert got[2]["days_inactive"] == 15 and got[2]["churned"] is True

    def test_boundary_is_strict(self, spark):
        from pramen_spark.operators.sequences import churn_labels

        rows = [
            (1, datetime.datetime(2024, 1, 8, 0)),
            (2, datetime.datetime(2024, 1, 1, 0)),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {r["user_id"]: r for r in churn_labels(df, inactive_days=7).collect()}
        assert got[2]["days_inactive"] == 7 and got[2]["churned"] is False


class TestPathNgrams:
    def _df(self, spark, seq):
        rows = [
            (1, i, datetime.datetime(2024, 1, 1, 0, i), e)
            for i, e in enumerate(seq)
        ]
        return spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, event_type string"
        )

    def test_trigram_counts(self, spark):
        from pramen_spark.operators.sequences import path_ngrams

        out = path_ngrams(self._df(spark, ["a", "b", "c", "a", "b"]), n=3)
        got = {
            (r["step_1"], r["step_2"], r["step_3"]): r["n_paths"]
            for r in out.collect()
        }
        assert got == {("a", "b", "c"): 1, ("b", "c", "a"): 1, ("c", "a", "b"): 1}

    def test_bigrams_and_user_isolation(self, spark):
        from pramen_spark.operators.sequences import path_ngrams

        rows = [
            (1, 0, datetime.datetime(2024, 1, 1, 0, 0), "a"),
            (1, 1, datetime.datetime(2024, 1, 1, 0, 1), "b"),
            (2, 2, datetime.datetime(2024, 1, 1, 0, 2), "b"),
            (2, 3, datetime.datetime(2024, 1, 1, 0, 3), "a"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, event_type string"
        )
        got = {
            (r["step_1"], r["step_2"]): r["n_paths"]
            for r in path_ngrams(df, n=2).collect()
        }
        # no cross-user ('b','b') gram
        assert got == {("a", "b"): 1, ("b", "a"): 1}

    def test_timestamp_tie_broken_by_order_col(self, spark):
        from pramen_spark.operators.sequences import path_ngrams

        t = datetime.datetime(2024, 1, 1)
        rows = [(1, 2, t, "z"), (1, 1, t, "a")]
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, event_type string"
        )
        got = path_ngrams(df, n=2).collect()
        assert (got[0]["step_1"], got[0]["step_2"]) == ("a", "z")


class TestWelchTtest:
    def test_matches_closed_form(self, spark):
        from pramen_spark.operators.drift import welch_ttest

        a = [1.0, 2.0, 3.0, 4.0]
        b = [2.0, 4.0, 6.0, 8.0, 10.0]
        rows = [("A", v) for v in a] + [("B", v) for v in b] + [("C", 99.0)]
        df = spark.createDataFrame(rows, "arm string, v double")
        r = welch_ttest(df, "arm", "v", "A", "B").collect()[0]
        ma, mb = sum(a) / 4, sum(b) / 5
        va = sum((x - ma) ** 2 for x in a) / 3
        vb = sum((x - mb) ** 2 for x in b) / 4
        se2 = va / 4 + vb / 5
        t = (ma - mb) / math.sqrt(se2)
        dof = se2 ** 2 / ((va / 4) ** 2 / 3 + (vb / 5) ** 2 / 4)
        assert r["n_a"] == 4 and r["n_b"] == 5
        assert r["mean_a"] == pytest.approx(ma, abs=1e-6)
        assert r["t_stat"] == pytest.approx(t, abs=1e-5)
        assert r["dof"] == pytest.approx(dof, abs=1e-4)

    def test_identical_arms_t_zero(self, spark):
        from pramen_spark.operators.drift import welch_ttest

        rows = [("A", float(v)) for v in range(10)] + [
            ("B", float(v)) for v in range(10)
        ]
        df = spark.createDataFrame(rows, "arm string, v double")
        r = welch_ttest(df, "arm", "v", "A", "B").collect()[0]
        assert r["t_stat"] == pytest.approx(0.0)
        assert r["dof"] == pytest.approx(18.0, abs=1e-4)
