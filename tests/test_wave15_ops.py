"""Unit tests for the round-8 wave-15 operators: RFM segmentation,
Benford first-digit audit, and truncated-EWMA smoothing. (The
ship-latency and week-over-week catalog queries are pure compositions
covered by their oracle rows.)"""

import math

import pytest

from pyspark.sql import functions as F


class TestRfmScores:
    def _df(self, spark):
        rows = [
            # cust, date, amount
            (1, "2024-01-01", 10.0),
            (1, "2024-01-05", 10.0),
            (2, "2024-02-01", 100.0),
            (3, "2024-03-01", 1000.0),
            (3, "2024-03-02", 1000.0),
            (3, "2024-03-03", 1000.0),
            (4, "2024-04-01", 5000.0),
        ]
        return spark.createDataFrame(rows, "c long, d string, amt double")

    def test_components_exact(self, spark):
        from pramen_spark.operators.features import rfm_scores

        out = {
            r["customer"]: r
            for r in rfm_scores(self._df(spark), "c", "d", "amt").collect()
        }
        # horizon = 2024-04-01 (global max order date)
        assert out[4]["recency_days"] == 0
        assert out[1]["recency_days"] == 87  # 2024-01-05 .. 2024-04-01
        assert out[3]["frequency"] == 3
        assert out[3]["monetary"] == 3000.0
        assert out[1]["monetary"] == 20.0

    def test_scores_monotone_and_bounded(self, spark):
        from pramen_spark.operators.features import rfm_scores

        rows = rfm_scores(self._df(spark), "c", "d", "amt").collect()
        for r in rows:
            for k in ("r_score", "f_score", "m_score"):
                assert 1 <= r[k] <= 4
        by_c = {r["customer"]: r for r in rows}
        # most-recent customer gets the LOWEST r_score (fewest
        # thresholds exceeded); biggest spender the highest m_score
        assert by_c[4]["r_score"] == 1
        assert by_c[4]["m_score"] == 4
        assert by_c[1]["m_score"] == 1

    def test_single_customer_all_ones(self, spark):
        from pramen_spark.operators.features import rfm_scores

        df = spark.createDataFrame(
            [(9, "2024-06-01", 42.0)], "c long, d string, amt double"
        )
        r = rfm_scores(df, "c", "d", "amt").collect()[0]
        # with one customer every quartile threshold equals the value;
        # strict > exceeds none
        assert (r["r_score"], r["f_score"], r["m_score"]) == (1, 1, 1)


class TestBenfordDigitAudit:
    def test_digits_exact(self, spark):
        from pramen_spark.operators.validation import benford_digit_audit

        vals = [1.0, 19.99, 100.00, 999.99, 2500.0, 2.5, 0.5, -300.0]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        rows = {r["digit"]: r for r in benford_digit_audit(df, "x").collect()}
        # 0.5 and -300.0 are excluded (< 1)
        assert sum(r["n"] for r in rows.values()) == 6
        assert rows[1]["n"] == 3  # 1.0, 19.99, 100.00
        assert rows[9]["n"] == 1  # 999.99
        assert rows[2]["n"] == 2  # 2500.0, 2.5

    def test_power_of_ten_boundary(self, spark):
        from pramen_spark.operators.validation import benford_digit_audit

        # exact powers of ten are precisely where float log10 flips
        df = spark.createDataFrame(
            [(10.0,), (100.0,), (1000.0,), (10000.0,), (100000.0,)],
            "x double",
        )
        rows = benford_digit_audit(df, "x").collect()
        assert len(rows) == 1 and rows[0]["digit"] == 1 and rows[0]["n"] == 5
        assert rows[0]["observed_p"] == 1.0

    def test_expected_is_benford(self, spark):
        from pramen_spark.operators.validation import benford_digit_audit

        df = spark.createDataFrame([(float(d),) for d in range(1, 10)], "x double")
        rows = benford_digit_audit(df, "x").collect()
        for r in rows:
            assert r["expected_p"] == pytest.approx(
                math.log10(1 + 1 / r["digit"]), abs=1e-6
            )
            assert r["observed_p"] == pytest.approx(1 / 9, abs=1e-6)


class TestEwmaSmooth:
    def test_truncated_weights_exact(self, spark):
        from pramen_spark.operators.timegrid import ewma_smooth

        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate([8.0, 4.0, 2.0, 1.0])],
            "t long, v double",
        )
        out = {r["t"]: r["ewma"] for r in ewma_smooth(df, "v", "t").collect()}
        # t=0: just itself
        assert out[0] == 8.0
        # t=1: (4 + 8*0.5) / (1 + 0.5)
        assert out[1] == pytest.approx(8.0 / 1.5, abs=1e-6)
        # t=3: (1 + 2*.5 + 4*.25 + 8*.125) / (1+.5+.25+.125)
        assert out[3] == pytest.approx(4.0 / 1.875, abs=1e-6)

    def test_constant_series_is_identity(self, spark):
        from pramen_spark.operators.timegrid import ewma_smooth

        df = spark.createDataFrame(
            [(i, 7.0) for i in range(20)], "t long, v double"
        )
        for r in ewma_smooth(df, "v", "t").collect():
            assert r["ewma"] == pytest.approx(7.0, abs=1e-6)

    def test_partitioned_series_independent(self, spark):
        from pramen_spark.operators.timegrid import ewma_smooth

        rows = [("a", 0, 10.0), ("a", 1, 0.0), ("b", 0, 100.0), ("b", 1, 0.0)]
        df = spark.createDataFrame(rows, "k string, t long, v double")
        out = {
            (r["k"], r["t"]): r["ewma"]
            for r in ewma_smooth(
                df, "v", "t", partition_cols=("k",)
            ).collect()
        }
        # each key smooths only over its own history
        assert out[("a", 1)] == pytest.approx(5.0 / 1.5, abs=1e-6)
        assert out[("b", 1)] == pytest.approx(50.0 / 1.5, abs=1e-6)

    def test_truncation_window(self, spark):
        from pramen_spark.operators.timegrid import ewma_smooth

        # a spike more than `taps` rows back must not influence the tail
        vals = [1000.0] + [1.0] * 10
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "t long, v double"
        )
        out = {r["t"]: r["ewma"] for r in ewma_smooth(df, "v", "t", taps=3).collect()}
        assert out[10] == pytest.approx(1.0, abs=1e-6)
        # but inside the window it does
        assert out[1] > 100.0
