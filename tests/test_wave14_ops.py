"""Unit tests for the round-8 wave-14 operators: feature-hash collision
audit and weighted percentiles. (The two new streaming parities are
covered by their oracle-checked catalog queries, which run the real
streams; streaming_dedup unit coverage lives in test_streaming.py.)"""

import pytest

from pyspark.sql import functions as F


class TestFeatureHashAudit:
    def test_exact_counts_and_rate(self, spark):
        from pramen_spark.operators.features import feature_hash_audit

        # duplicates in the input must not inflate n_values
        rows = [(f"tok{i}",) for i in range(50)] * 3
        df = spark.createDataFrame(rows, "t string")
        r = feature_hash_audit(df, "t", n_buckets=4096).collect()[0]
        assert r["n_values"] == 50
        assert r["n_buckets_used"] + r["n_collided"] == 50
        assert r["collision_rate"] == pytest.approx(r["n_collided"] / 50.0)
        # 50 values in 4096 buckets: collisions are rare
        assert r["n_collided"] <= 2

    def test_tiny_width_forces_collisions(self, spark):
        from pramen_spark.operators.features import feature_hash_audit

        df = spark.createDataFrame([(f"v{i}",) for i in range(100)], "t string")
        r = feature_hash_audit(df, "t", n_buckets=8).collect()[0]
        assert r["n_buckets_used"] <= 8
        assert r["n_collided"] >= 92

    def test_deterministic(self, spark):
        from pramen_spark.operators.features import feature_hash_audit

        df = spark.createDataFrame([(f"x{i}",) for i in range(200)], "t string")
        a = feature_hash_audit(df, "t", n_buckets=64).collect()[0]
        b = feature_hash_audit(df, "t", n_buckets=64).collect()[0]
        assert a == b


class TestWeightedPercentiles:
    def test_weight_shifts_the_median(self, spark):
        from pramen_spark.operators.sampling import weighted_percentiles

        # values 1..4; weight 10 on value 4 dominates
        rows = [(1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (4.0, 10.0)]
        df = spark.createDataFrame(rows, "v double, w double")
        r = weighted_percentiles(df, "v", "w", qs=(0.5,)).collect()[0]
        # total 13; cum at 4 is the first >= 6.5
        assert r["p50_weighted"] == 4.0

    def test_uniform_weights_match_lower_quantile(self, spark):
        from pramen_spark.operators.sampling import weighted_percentiles

        df = spark.createDataFrame(
            [(float(v), 1.0) for v in range(1, 11)], "v double, w double"
        )
        r = weighted_percentiles(df, "v", "w", qs=(0.5, 0.9)).collect()[0]
        # cum at v=5 is 5 >= 5.0 -> p50 = 5; cum at v=9 is 9 >= 9.0
        assert r["p50_weighted"] == 5.0
        assert r["p90_weighted"] == 9.0

    def test_duplicate_values_aggregate_weight(self, spark):
        from pramen_spark.operators.sampling import weighted_percentiles

        rows = [(1.0, 1.0), (1.0, 1.0), (1.0, 1.0), (2.0, 1.0)]
        df = spark.createDataFrame(rows, "v double, w double")
        r = weighted_percentiles(df, "v", "w", qs=(0.5,)).collect()[0]
        assert r["p50_weighted"] == 1.0
