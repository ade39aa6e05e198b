"""Unit tests for the round-7 analytics operators: robust MAD anomaly
detection, Markov transition matrices, and the key-skew profiler."""

import math

import pytest

from pyspark.sql import functions as F


class TestMadAnomalies:
    def _run(self, spark, rows, threshold=3.0):
        from pramen_spark.operators.anomaly import mad_anomalies

        df = spark.createDataFrame(rows, "k string, x double")
        out = mad_anomalies(df, ["k"], "x", threshold=threshold)
        return {(r["k"], r["x"]): r for r in out.collect()}

    def test_flags_spike_and_keeps_body(self, spark):
        rows = [("a", float(v)) for v in [10, 11, 9, 10, 12, 10, 11, 100]]
        got = self._run(spark, rows)
        assert got[("a", 100.0)]["is_anomaly"] is True
        for v in [10.0, 11.0, 9.0, 12.0]:
            assert got[("a", v)]["is_anomaly"] is False
        # median of [9,10,10,10,11,11,12,100] = 10.5; MAD = median of
        # deviations [1.5,0.5,0.5,0.5,0.5,0.5,1.5,89.5] = 0.5
        assert got[("a", 100.0)]["median_value"] == pytest.approx(10.5)
        assert got[("a", 100.0)]["mad"] == pytest.approx(0.5)
        z = abs(100 - 10.5) / (1.4826 * 0.5)
        assert got[("a", 100.0)]["robust_z"] == pytest.approx(z)

    def test_mean_zscore_would_mask_this_spike(self, spark):
        # classic masking case: the spike inflates the stddev enough that
        # its own plain z-score stays under 3 — MAD still catches it
        vals = [10.0] * 9 + [1000.0]
        mean = sum(vals) / len(vals)
        sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / (len(vals) - 1))
        assert abs(1000.0 - mean) / sd < 3.05
        got = self._run(spark, [("a", v) for v in vals])
        assert got[("a", 1000.0)]["is_anomaly"] is True

    def test_zero_mad_constant_series(self, spark):
        rows = [("a", 5.0), ("a", 5.0), ("a", 5.0), ("a", 7.0)]
        got = self._run(spark, rows)
        # MAD = 0: equal-to-median rows are calm with z=0, deviating rows
        # are flagged with NULL z (conceptual infinity)
        assert got[("a", 5.0)]["is_anomaly"] is False
        assert got[("a", 5.0)]["robust_z"] == 0.0
        assert got[("a", 7.0)]["is_anomaly"] is True
        assert got[("a", 7.0)]["robust_z"] is None

    def test_groups_are_independent(self, spark):
        rows = [("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 50.0),
                ("b", 50.0), ("b", 50.0), ("b", 50.0), ("b", 49.0)]
        got = self._run(spark, rows)
        assert got[("a", 50.0)]["is_anomaly"] is True
        assert got[("b", 50.0)]["is_anomaly"] is False


class TestTransitionMatrix:
    def test_counts_and_probs(self, spark):
        from pramen_spark.operators.sequences import transition_matrix

        rows = [
            # user 1: a -> b -> a -> c
            (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"),
            # user 2: a -> b
            (2, 1, "a"), (2, 2, "b"),
        ]
        df = spark.createDataFrame(rows, "uid int, seq int, state string")
        out = transition_matrix(df, "uid", "state", ["seq"])
        got = {(r["src"], r["dst"]): r for r in out.collect()}
        assert got[("a", "b")]["n_transitions"] == 2
        assert got[("a", "c")]["n_transitions"] == 1
        assert got[("b", "a")]["n_transitions"] == 1
        # per-src normalization: a -> {b: 2/3, c: 1/3}
        assert got[("a", "b")]["prob"] == pytest.approx(2 / 3)
        assert got[("a", "c")]["prob"] == pytest.approx(1 / 3)
        assert got[("b", "a")]["prob"] == pytest.approx(1.0)
        # final states contribute no pair; c has no outgoing row
        assert not [k for k in got if k[0] == "c"]

    def test_tiebreak_makes_order_total(self, spark):
        from pramen_spark.operators.sequences import transition_matrix

        # two events share ts; the id tiebreak fixes the order
        rows = [(1, 10, 1, "x"), (1, 10, 2, "y"), (1, 11, 3, "z")]
        df = spark.createDataFrame(rows, "uid int, ts int, eid int, state string")
        got = {
            (r["src"], r["dst"])
            for r in transition_matrix(df, "uid", "state", ["ts", "eid"]).collect()
        }
        assert got == {("x", "y"), ("y", "z")}


class TestKeySkewProfile:
    def test_summary_values(self, spark):
        from pramen_spark.operators.validation import key_skew_profile

        # key a: 6 rows, b: 2, c: 1, d: 1  -> counts [6, 2, 1, 1]
        rows = [("a",)] * 6 + [("b",)] * 2 + [("c",), ("d",)]
        df = spark.createDataFrame(rows, "k string")
        r = key_skew_profile(df, "k").collect()[0]
        assert r["n_rows"] == 10
        assert r["n_keys"] == 4
        assert r["max_rows"] == 6
        assert r["top1_share"] == pytest.approx(0.6)
        assert r["mean_rows"] == pytest.approx(2.5)
        assert r["skew_ratio"] == pytest.approx(2.4)
        # sorted counts [1, 1, 2, 6]: p50 interpolates between 1 and 2
        assert r["p50_rows"] == pytest.approx(1.5)
        # p90: h = 0.9 * 3 = 2.7 -> 2 + 0.7 * (6 - 2) = 4.8
        assert r["p90_rows"] == pytest.approx(4.8)

    def test_uniform_key_has_ratio_one(self, spark):
        from pramen_spark.operators.validation import key_skew_profile

        rows = [(str(i % 5),) for i in range(25)]
        df = spark.createDataFrame(rows, "k string")
        r = key_skew_profile(df, "k").collect()[0]
        assert r["skew_ratio"] == pytest.approx(1.0)
        assert r["top1_share"] == pytest.approx(0.2)
