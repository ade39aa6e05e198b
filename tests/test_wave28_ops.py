"""Unit tests for the round-8 wave-28 operators: negative sampling,
effective sample size, cross-cardinality audit, l-diversity."""

import pytest

from pyspark.sql import functions as F


class TestNegativeSamples:
    def test_determinism_and_exclusion(self, spark):
        from pramen_spark.operators.sampling import negative_samples

        pos = spark.createDataFrame(
            [(1, 10), (1, 20), (2, 10)], "u long, item long"
        )
        items = spark.createDataFrame(
            [(i,) for i in (10, 20, 30, 40, 50)], "item long"
        )
        a = negative_samples(pos, "u", "item", items, k=3).collect()
        b = negative_samples(pos, "u", "item", items, k=3).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
        pos_set = {(1, 10), (1, 20), (2, 10)}
        for r in a:
            assert (r["entity"], r["item"]) not in pos_set
            assert r["item"] in (10, 20, 30, 40, 50)
        # at most k per entity (collisions may reduce)
        from collections import Counter

        per = Counter(r["entity"] for r in a)
        assert all(v <= 3 for v in per.values())

    def test_noncontiguous_item_ids(self, spark):
        from pramen_spark.operators.sampling import negative_samples

        pos = spark.createDataFrame([(1, 100)], "u long, item long")
        items = spark.createDataFrame(
            [(100,), (5000,), (99999,)], "item long"
        )
        out = negative_samples(pos, "u", "item", items, k=5).collect()
        assert all(r["item"] in (100, 5000, 99999) for r in out)
        assert all(r["item"] != 100 for r in out)


class TestEffectiveSampleSize:
    def test_equal_weights_full_ess(self, spark):
        from pramen_spark.operators.sampling import effective_sample_size

        df = spark.createDataFrame([(5.0,)] * 8, "w double")
        r = effective_sample_size(df, F.col("w")).collect()[0]
        assert r["n"] == 8 and r["ess"] == 8.0 and r["ess_ratio"] == 1.0

    def test_one_dominant_weight(self, spark):
        from pramen_spark.operators.sampling import effective_sample_size

        # weights 1,1,1,97: ESS = 100^2 / (3 + 9409) = 1.0625...
        df = spark.createDataFrame(
            [(1.0,), (1.0,), (1.0,), (97.0,)], "w double"
        )
        r = effective_sample_size(df, F.col("w")).collect()[0]
        assert r["ess"] == pytest.approx(10000 / 9412, abs=1e-6)


class TestCrossCardinalityAudit:
    def test_full_and_partial_fill(self, spark):
        from pramen_spark.operators.validation import (
            cross_cardinality_audit,
        )

        rows = [("a", 1), ("a", 2), ("b", 1)]  # (b,2) missing
        df = spark.createDataFrame(rows, "x string, y int")
        r = cross_cardinality_audit(df, [("x", "y")]).collect()[0]
        assert r["n_a"] == 2 and r["n_b"] == 2
        assert r["n_observed"] == 3 and r["max_possible"] == 4
        assert r["fill_rate"] == 0.75


class TestLDiversityAudit:
    def test_failing_group_detected(self, spark):
        from pramen_spark.operators.validation import l_diversity_audit

        rows = [
            # group A: 3 rows, all same sensitive value -> l = 1 (fails)
            ("A", 100.0), ("A", 100.0), ("A", 100.0),
            # group B: 3 distinct values -> l = 3 (passes l=3)
            ("B", 1.0), ("B", 2.0), ("B", 3.0),
        ]
        df = spark.createDataFrame(rows, "qi string, s double")
        r = l_diversity_audit(df, ["qi"], F.col("s"), l=3).collect()[0]
        assert r["n_groups"] == 2 and r["n_failing"] == 1
        assert r["min_l"] == 1
        assert r["n_rows_exposed"] == 3
        assert r["share_failing"] == 0.5
