"""Unit tests for the round-8 wave-19 operators: OLS fit, inter-event
gaps, token burstiness, key-gap audit, set overlap."""

import math

import pytest

from pyspark.sql import functions as F


class TestOlsFit:
    def test_exact_line(self, spark):
        from pramen_spark.operators.drift import ols_fit

        # y = 2x + 5, perfect fit
        rows = [(float(x), 2.0 * x + 5.0) for x in range(10)]
        df = spark.createDataFrame(rows, "x double, y double")
        r = ols_fit(df, F.col("x"), F.col("y")).collect()[0]
        assert r["n"] == 10
        assert r["slope"] == 2.0
        assert r["intercept"] == 5.0
        assert r["r2"] == 1.0

    def test_zero_variance_x_null(self, spark):
        from pramen_spark.operators.drift import ols_fit

        df = spark.createDataFrame(
            [(1.0, 2.0), (1.0, 3.0)], "x double, y double"
        )
        r = ols_fit(df, F.col("x"), F.col("y")).collect()[0]
        assert r["slope"] is None and r["r2"] is None

    def test_nulls_dropped(self, spark):
        from pramen_spark.operators.drift import ols_fit

        df = spark.createDataFrame(
            [(1.0, 1.0), (2.0, 2.0), (None, 9.0), (3.0, None)],
            "x double, y double",
        )
        assert ols_fit(df, F.col("x"), F.col("y")).collect()[0]["n"] == 2


class TestInterEventGaps:
    def test_quartiles_exact(self, spark):
        from pramen_spark.operators.sequences import inter_event_gaps

        day = 86_400_000_000
        # user 1: events at days 0,1,3 -> gaps 1, 2; user 2: days 0,4 -> gap 4
        rows = [(1, 0, 1), (1, day, 2), (1, 3 * day, 3),
                (2, 0, 4), (2, 4 * day, 5)]
        df = spark.createDataFrame(rows, "u long, us long, id long").select(
            "u", F.timestamp_micros(F.col("us")).alias("ts"), "id"
        )
        r = inter_event_gaps(df, "u", "ts", "id").collect()[0]
        assert r["n_gaps"] == 3
        assert r["mean_days"] == pytest.approx(7 / 3, abs=1e-6)
        assert r["p50"] == 2.0  # gaps sorted: 1, 2, 4

    def test_single_event_users_no_gaps(self, spark):
        from pramen_spark.operators.sequences import inter_event_gaps

        df = spark.createDataFrame(
            [(1, 0, 1), (2, 5, 2)], "u long, us long, id long"
        ).select("u", F.timestamp_micros(F.col("us")).alias("ts"), "id")
        assert inter_event_gaps(df, "u", "ts", "id").collect()[0]["n_gaps"] == 0


class TestTokenBurstiness:
    def test_steady_vs_bursty(self, spark):
        from pramen_spark.operators.text import token_burstiness

        rows = [
            (1, "the the cat"),
            (2, "the the dog"),
            (3, "the the bird bird bird bird"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["token"]: r for r in
               token_burstiness(df, min_df=1).collect()}
        # 'the': tf = [2,2,2] -> var 0 -> burstiness 0
        assert out["the"]["doc_freq"] == 3
        assert out["the"]["mean_tf"] == 2.0
        assert out["the"]["burstiness"] == 0.0
        # 'bird': single doc tf=4 -> var 0 over its one doc
        assert out["bird"]["burstiness"] == 0.0 and out["bird"]["mean_tf"] == 4.0

    def test_min_df_filter(self, spark):
        from pramen_spark.operators.text import token_burstiness

        df = spark.createDataFrame(
            [(1, "a b"), (2, "a")], "doc_id long, text string"
        )
        toks = {r["token"] for r in token_burstiness(df, min_df=2).collect()}
        assert toks == {"a"}


class TestKeyGapAudit:
    def _run(self, spark, keys, bucket_size=10):
        from pramen_spark.operators.validation import key_gap_audit

        df = spark.createDataFrame([(k,) for k in keys], "k long")
        return key_gap_audit(df, "k", bucket_size=bucket_size).collect()[0]

    def test_contiguous_no_gaps(self, spark):
        r = self._run(spark, range(1, 11))
        assert (r["n_keys"], r["n_gaps"], r["max_gap_len"]) == (10, 0, 0)
        assert r["missing_keys"] == 0

    def test_intra_and_boundary_gaps(self, spark):
        # bucket size 10: 1..3 (b0), 8..9 (b0, gap 4), 25 (b2 — boundary
        # gap over empty bucket 1 of len 15)
        r = self._run(spark, [1, 2, 3, 8, 9, 25])
        assert r["n_gaps"] == 2
        assert r["max_gap_len"] == 15
        assert r["missing_keys"] == 25 - 1 + 1 - 6

    def test_duplicates_collapse(self, spark):
        r = self._run(spark, [5, 5, 6, 6])
        assert r["n_keys"] == 2 and r["n_gaps"] == 0


class TestSetOverlap:
    def test_known_overlap(self, spark):
        from pramen_spark.operators.itemsets import set_overlap

        rows = [("A", 1), ("A", 2), ("A", 3),
                ("B", 2), ("B", 3), ("B", 4),
                ("C", 9)]
        df = spark.createDataFrame(rows, "s string, m long")
        out = {(r["set_a"], r["set_b"]): r
               for r in set_overlap(df, "s", "m").collect()}
        ab = out[("A", "B")]
        assert ab["n_common"] == 2
        assert ab["jaccard"] == 0.5  # 2 / (3+3-2)
        assert ab["overlap_coeff"] == pytest.approx(2 / 3, abs=1e-6)
        # disjoint pairs produce no row (inner join on members)
        assert ("A", "C") not in out

    def test_duplicate_membership_dedups(self, spark):
        from pramen_spark.operators.itemsets import set_overlap

        rows = [("A", 1), ("A", 1), ("B", 1)]
        df = spark.createDataFrame(rows, "s string, m long")
        r = set_overlap(df, "s", "m").collect()[0]
        assert r["n_a"] == 1 and r["n_common"] == 1 and r["jaccard"] == 1.0
