"""Unit tests for the round-8 wave-32 operator: bootstrap uplift CI
(the other wave-32 queries are pure compositions covered by their
oracle rows)."""

import pytest

from pyspark.sql import functions as F


class TestBootstrapUpliftCi:
    def _df(self, spark, n_t_pos, n_t_neg, n_c_pos, n_c_neg):
        rows = []
        i = 0
        for cnt, t, y in ((n_t_pos, 1, 1), (n_t_neg, 1, 0),
                          (n_c_pos, 0, 1), (n_c_neg, 0, 0)):
            for _ in range(cnt):
                rows.append((i, t, y))
                i += 1
        return spark.createDataFrame(rows, "id long, t int, y int")

    def test_point_estimate_and_bracket(self, spark):
        from pramen_spark.operators.sampling import bootstrap_uplift_ci

        # treatment 40/100, control 20/100 -> uplift 0.2
        df = self._df(spark, 40, 60, 20, 80)
        r = bootstrap_uplift_ci(
            df, F.col("t") == 1, F.col("y") == 1, "id", n_boot=50
        ).collect()[0]
        assert r["n_exp"] == 100 and r["n_unexp"] == 100
        assert r["uplift"] == pytest.approx(0.2)
        # the CI must bracket a real effect of this size
        assert r["ci_lo"] < 0.2 < r["ci_hi"]
        assert r["ci_lo"] > 0.0  # clearly significant at these counts

    def test_deterministic(self, spark):
        from pramen_spark.operators.sampling import bootstrap_uplift_ci

        df = self._df(spark, 10, 10, 10, 10)
        a = bootstrap_uplift_ci(
            df, F.col("t") == 1, F.col("y") == 1, "id", n_boot=20
        ).collect()[0]
        b = bootstrap_uplift_ci(
            df, F.col("t") == 1, F.col("y") == 1, "id", n_boot=20
        ).collect()[0]
        assert (a["ci_lo"], a["ci_hi"]) == (b["ci_lo"], b["ci_hi"])

    def test_null_effect_ci_covers_zero(self, spark):
        from pramen_spark.operators.sampling import bootstrap_uplift_ci

        df = self._df(spark, 30, 70, 30, 70)
        r = bootstrap_uplift_ci(
            df, F.col("t") == 1, F.col("y") == 1, "id", n_boot=50
        ).collect()[0]
        assert r["uplift"] == 0.0
        assert r["ci_lo"] <= 0.0 <= r["ci_hi"]
